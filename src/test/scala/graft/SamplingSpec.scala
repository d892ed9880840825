package graft

import graft.llm.Packing
import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("hashSample is deterministic, partitioning-independent, and ~rate sized") {
    val a = Sampling.hashSample(docs, Seq("doc_id"), 0.3).select("doc_id")
    val b = Sampling.hashSample(docs.repartition(13), Seq("doc_id"), 0.3)
      .select("doc_id")
    assertSameRows(a, b)
    val n = a.count().toDouble
    val total = docs.count().toDouble
    // 2^32-uniform hash: binomial stdev at n=500, p=0.3 is ~10 rows
    assert(math.abs(n / total - 0.3) < 0.1, s"sample fraction ${n / total}")
    // a sampled id is ALWAYS sampled at any higher rate (nested samples)
    val wider = Sampling.hashSample(docs, Seq("doc_id"), 0.6).select("doc_id")
    assert(a.exceptAll(wider).count() === 0)
  }

  test("different salts draw independent samples; same salt is stable") {
    val s1 = Sampling.hashSample(docs, Seq("doc_id"), 0.5, salt = "a").select("doc_id")
    val s2 = Sampling.hashSample(docs, Seq("doc_id"), 0.5, salt = "b").select("doc_id")
    assertSameRows(s1,
      Sampling.hashSample(docs, Seq("doc_id"), 0.5, salt = "a").select("doc_id"))
    val overlap = s1.intersect(s2).count().toDouble
    // independent 50% draws overlap on ~25% of the corpus, not ~50%
    assert(overlap / docs.count() < 0.4, s"salted samples too correlated: $overlap")
  }

  test("hashSplit partitions every row exactly once and is append-stable") {
    val split = Sampling.hashSplit(docs, Seq("doc_id"), 0.2)
    assert(split.count() === docs.count())
    val frac = split.filter(col("split") === "test").count().toDouble / docs.count()
    assert(math.abs(frac - 0.2) < 0.1, s"test fraction $frac")
    // append-stability: splitting HALF the corpus assigns the same labels
    val half = Sampling.hashSplit(docs.filter(col("doc_id") % 2 === 0),
      Seq("doc_id"), 0.2)
    assertSameRows(half,
      split.filter(col("doc_id") % 2 === 0))
  }

  test("capPerGroup enforces the cap, keeps small groups whole, is deterministic") {
    val capped = Sampling.capPerGroup(docs, Seq("source"), cap = 15,
      keys = Seq("doc_id"))
    val sizes = capped.groupBy("source").count().collect()
    assert(sizes.forall(_.getLong(1) <= 15))
    val orig = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    sizes.foreach { r =>
      val want = math.min(orig(r.getString(0)), 15L)
      assert(r.getLong(1) === want, s"${r.getString(0)}")
    }
    assertSameRows(capped.select("doc_id"),
      Sampling.capPerGroup(docs.repartition(7), Seq("source"), 15,
        Seq("doc_id")).select("doc_id"))
  }

  test("hashSampleWeighted: rate 0 keeps nothing, rate 1 keeps all, monotone in weight") {
    assert(Sampling.hashSampleWeighted(docs, Seq("doc_id"), lit(0.0)).count() === 0)
    assert(Sampling.hashSampleWeighted(docs, Seq("doc_id"), lit(1.0)).count()
      === docs.count())
    // out-of-range weights clamp instead of misbehaving
    assert(Sampling.hashSampleWeighted(docs, Seq("doc_id"), lit(7.5)).count()
      === docs.count())
    // a row kept at weight w is kept at any w' >= w (same hash, higher bar)
    val lo = Sampling.hashSampleWeighted(docs, Seq("doc_id"), lit(0.3)).select("doc_id")
    val hi = Sampling.hashSampleWeighted(docs, Seq("doc_id"), lit(0.7)).select("doc_id")
    assert(lo.exceptAll(hi).count() === 0)
    // constant weight r matches hashSample(r) exactly (same decision rule)
    assertSameRows(lo,
      Sampling.hashSample(docs, Seq("doc_id"), 0.3).select("doc_id"))
  }

  test("rate 1.0 keeps every row under BOTH decision rules (boundary parity)") {
    // hashSample(1.0) used to drop rows hashing exactly to ffffffff while
    // the weighted rule kept them — both must keep all now.
    assert(Sampling.hashSample(docs, Seq("doc_id"), 1.0).count() === docs.count())
    assert(Sampling.hashSplit(docs, Seq("doc_id"), 1.0)
      .filter(col("split") === "test").count() === docs.count())
    // fractional rate: floor rule means the two operators agree row-for-row
    val r = 1.0 / 3.0 // rate*2^32 is fractional — the old off-by-one zone
    assertSameRows(
      Sampling.hashSample(docs, Seq("doc_id"), r).select("doc_id"),
      Sampling.hashSampleWeighted(docs, Seq("doc_id"), lit(r)).select("doc_id"))
  }

  test("hashSampleBy applies per-stratum rates; unlisted strata use the default") {
    val got = Sampling.hashSampleBy(docs, "lang",
      Map("zh" -> 1.0, "en" -> 0.0), keys = Seq("doc_id"), defaultRate = 0.5)
    val byLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("zh") === totals("zh"))      // rate 1.0: everything
    assert(!byLang.contains("en"))             // rate 0.0: nothing
    val others = totals.keySet -- Set("zh", "en")
    val kept = others.toSeq.map(l => byLang.getOrElse(l, 0L)).sum.toDouble
    val base = others.toSeq.map(totals).sum.toDouble
    assert(math.abs(kept / base - 0.5) < 0.15, s"default-rate fraction ${kept / base}")
  }

  test("capPerGroup hot-group guard: two-stage plan, identical selection") {
    // one pathological group (3000 rows) next to a normal one; factor 10
    // at cap 20 arms the guard for it (3000 > 200)
    val hotData = (0 until 3000).map(i => ("hot", i.toLong)) ++
      (0 until 50).map(i => ("cold", 10000L + i))
    val df = hotData.toDF("g", "id")
    val guarded = Sampling.capPerGroup(df, Seq("g"), cap = 20,
      keys = Seq("id"), hotGroupFactor = 10)
    val unguarded = Sampling.capPerGroup(df, Seq("g"), cap = 20,
      keys = Seq("id"), hotGroupFactor = 0)
    // the guard is a plan change, never a sample: selections are identical
    assertSameRows(guarded.select("g", "id"), unguarded.select("g", "id"))
    assert(guarded.filter(col("g") === "hot").count() === 20)
    assert(guarded.filter(col("g") === "cold").count() === 20)
    // guarded plan pre-thins in a second window; normal-sized data keeps
    // the single-window plan
    def windows(d: org.apache.spark.sql.DataFrame): Int =
      d.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
      }.size
    assert(windows(guarded) === 2, "hot path must two-stage")
    val normal = Sampling.capPerGroup(docs, Seq("source"), cap = 15,
      keys = Seq("doc_id"), hotGroupFactor = 64)
    assert(windows(normal) === 1, "normal groups must keep the original plan")
  }

  test("capTokensPerGroup admits by budget in hash order; first row always survives") {
    val got = Sampling.capTokensPerGroup(docs, Seq("lang"), "n_chars",
      budget = 20000L, keys = Seq("doc_id"))
    // admitted prefix (everything before the last-admitted doc) is under
    // budget in every group, and nothing admissible was left out: the
    // kept set is exactly a prefix of the hash-ordered group
    val perLang = got.groupBy("lang")
      .agg(sum(col("n_chars")).as("tot"), max(col("n_chars")).as("mx"))
      .collect()
    perLang.foreach { r =>
      assert(r.getLong(1) - r.getLong(2) < 20000L,
        s"${r.getString(0)}: admitted-before-straddler must be under budget")
    }
    // deterministic + partitioning-independent
    assertSameRows(got.select("doc_id"),
      Sampling.capTokensPerGroup(docs.repartition(11), Seq("lang"), "n_chars",
        20000L, Seq("doc_id")).select("doc_id"))
    // an oversize doc still survives as its group's first row (exclusive
    // prefix 0 < budget): a quota can never empty a group
    val over = Seq(("g", 1L, 999999L)).toDF("lang", "doc_id", "n_chars")
    val kept = Sampling.capTokensPerGroup(over, Seq("lang"), "n_chars",
      budget = 100L, keys = Seq("doc_id"))
    assert(kept.count() === 1, "group's first row must survive an oversize doc")
  }

  test("capTokensPerGroup hot-group path selects the identical rows") {
    // force the bucketed-prefix-sum path on ordinary data (factor 0 can't
    // arm it, so drop the threshold by scaling: hotGroupFactor 0 vs a
    // custom tiny threshold via a big synthetic group)
    val hotData = (0 until 70000).map(i => ("hot", i.toLong, (i % 37 + 1).toLong)) ++
      (0 until 50).map(i => ("cold", 100000L + i, 10L))
    val df = hotData.toDF("lang", "doc_id", "n_chars").repartition(8)
    val guarded = Sampling.capTokensPerGroup(df, Seq("lang"), "n_chars",
      budget = 5000L, keys = Seq("doc_id"), hotGroupFactor = 64) // 70000 > 65536
    val plain = Sampling.capTokensPerGroup(df, Seq("lang"), "n_chars",
      budget = 5000L, keys = Seq("doc_id"), hotGroupFactor = 0)
    assertSameRows(guarded.select("doc_id"), plain.select("doc_id"))
    assert(guarded.columns.toSeq === df.columns.toSeq, "helper columns must not leak")
  }

  test("packSequences: bins fill to budget, offsets are exclusive prefix sums") {
    val df = Seq(
      ("en", 1L, 500L), ("en", 2L, 900L), ("en", 3L, 700L), ("en", 4L, 100L),
      ("de", 10L, 2500L), ("de", 11L, 10L)
    ).toDF("lang", "doc_id", "n")
    val got = Packing.packSequences(df, Seq("lang"), Seq("doc_id"), "n", 2000L)
      .select("lang", "doc_id", "offset", "bin")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("en", 1L, 0L, 0L), ("en", 2L, 500L, 0L),   // bin 0 holds 500+900
      ("en", 3L, 1400L, 0L),                       // starts inside bin 0, straddles
      ("en", 4L, 2100L, 1L),                       // next bin
      ("de", 10L, 0L, 0L), ("de", 11L, 2500L, 1L)  // oversize doc pushes successor
    ))
    // bins are contiguous 0..max per group
    val bins = Packing.packSequences(docs, Seq("lang"), Seq("doc_id"), "n_chars", 2000L)
    val perLang = bins.groupBy("lang").agg(
      max(col("bin")).as("mx"), countDistinct(col("bin")).as("nd")).collect()
    perLang.foreach(r => assert(r.getLong(1) === r.getLong(2) - 1,
      s"${r.getString(0)}: bins not contiguous"))
  }

  test("packSequences is deterministic when the order key has ties") {
    // every row shares order key 1 — the running sum is only defined
    // because remaining columns (id, n) act as tie-breaks
    val rows = Seq(
      ("g", 1L, 101L, 700L), ("g", 1L, 102L, 300L), ("g", 1L, 103L, 900L),
      ("g", 1L, 104L, 50L), ("g", 1L, 105L, 1200L), ("g", 1L, 106L, 400L))
    val df = rows.toDF("lang", "ok", "id", "n")
    def run(d: org.apache.spark.sql.DataFrame) =
      Packing.packSequences(d, Seq("lang"), Seq("ok"), "n", 1000L)
        .select("id", "offset", "bin")
        .as[(Long, Long, Long)].collect()
        .map { case (i, o, b) => i -> (o, b) }.toMap
    val a = run(df)
    val b = run(df.repartition(7))
    val c = run(rows.reverse.toDF("lang", "ok", "id", "n").repartition(3))
    assert(a === b, "offsets changed under repartition")
    assert(a === c, "offsets changed under input reordering")
  }

  test("exportShards concatenates bin members in offset order; zero-size ties break on text") {
    import graft.llm.Packing
    // doc_id order sizes 5,5,0,0,5 under budget 8 → offsets 0,5,10,10,10
    // → bins 0,0,1,1,1; the three offset-10 docs order by text
    // ("ccccc" < "x" < "y")
    val df = Seq(
      ("g", 1L, "aaaaa", 5L), ("g", 2L, "bbbbb", 5L),
      ("g", 3L, "x", 0L), ("g", 4L, "y", 0L),
      ("g", 5L, "ccccc", 5L)).toDF("lang", "doc_id", "text", "n")
    val packed = Packing.packSequences(df, Seq("lang"), Seq("doc_id"), "n", 8L)
    val got = Packing.exportShards(packed, Seq("lang")).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(("g", 0L)) === ((2L, 10L, "aaaaa<|eos|>bbbbb")))
    assert(got(("g", 1L)) === ((3L, 7L, "ccccc<|eos|>x<|eos|>y")))
  }

  test("writeShards: one file per (group, bin), byte-identical, idempotent, safe names") {
    import graft.llm.Packing
    // 'g/1' exercises name sanitization (URL-encoded: 'g%2F1'); '\n'
    // in a text exercises binary-faithful write (no line semantics)
    val df = Seq(
      ("g/1", 1L, "aaa\nbb", 9L), ("g/1", 2L, "ccccc", 5L),
      ("h", 3L, "dddd", 4L)).toDF("lang", "doc_id", "text", "n")
    val packed = Packing.packSequences(df, Seq("lang"), Seq("doc_id"), "n", 8L)
    val dir = tmpDir("shardw")
    val manifest = Packing.writeShards(packed, dir, Seq("lang"))
    val rows = manifest.collect().map(r =>
      r.getAs[String]("shard_file") ->
        ((r.getAs[String]("shard_text"), r.getAs[Long]("shard_bytes")))).toMap
    assert(rows.keySet === Set("shard-g%2F1-0.txt", "shard-g%2F1-1.txt",
      "shard-h-0.txt"))
    def fileBytes(name: String): Array[Byte] =
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(dir, name))
    rows.foreach { case (name, (text, nBytes)) =>
      val onDisk = fileBytes(name)
      assert(onDisk.toSeq === text.getBytes("UTF-8").toSeq,
        s"$name not byte-identical to its shard_text")
      assert(onDisk.length.toLong === nBytes)
    }
    // no stray files (tmp publications cleaned up)
    val listed = new java.io.File(dir).listFiles().map(_.getName).toSet
    assert(listed === rows.keySet, s"unexpected files: $listed")
    // deterministic rerun: same names, same bytes
    Packing.writeShards(packed, dir, Seq("lang")).collect()
    rows.foreach { case (name, (text, _)) =>
      assert(fileBytes(name).toSeq === text.getBytes("UTF-8").toSeq)
    }
  }

  test("mixtureSample: exact quotas, short strata give what they have, unweighted drop") {
    val rows = (1 to 60).map(i => (i.toLong, "en")) ++
      (61 to 90).map(i => (i.toLong, "de")) ++
      (91 to 93).map(i => (i.toLong, "fr")) ++
      (94 to 100).map(i => (i.toLong, "zh"))
    val df = rows.toDF("id", "lang")
    val got = Sampling.mixtureSample(df, "lang",
      Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25), total = 40, keys = Seq("id"))
    val byLang = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang === Map("en" -> 20L, "de" -> 10L, "fr" -> 3L)) // fr short of 10
    // quota admission is the capPerGroup rule: per-stratum hash-order prefix
    val capped = Sampling.capPerGroup(df.filter(col("lang") === "en"),
      Seq("lang"), cap = 20, keys = Seq("id"))
    assertSameRows(got.filter(col("lang") === "en"), capped)
    // hot-guard is a plan change, never a sample (en: 60 > 20·2)
    val guarded = Sampling.mixtureSample(df, "lang",
      Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25), total = 40, keys = Seq("id"),
      hotGroupFactor = 2)
    assertSameRows(got, guarded)
    // determinism: same inputs, same draw, any partitioning
    assertSameRows(got, Sampling.mixtureSample(df.repartition(7), "lang",
      Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.25), total = 40, keys = Seq("id")))
    // representation noise must not shave quotas: 100 · 0.29 is
    // 28.999999999999996 in doubles, but the en quota must be exactly 29
    val eps = Sampling.mixtureSample(df, "lang", Map("en" -> 0.29),
      total = 100, keys = Seq("id"))
    assert(eps.count() === 29)
  }

  test("mixtureQuotas: exact at any total (ulp-scale absolute epsilons fail)") {
    // 3e11 · 0.1: double arithmetic gives 30000000000.000004 or
    // ...999.999996 depending on rounding; the exact quota is 3e10.
    // ulp(3e11) ≈ 6e-5, so the old absolute 1e-6 epsilon could not
    // rescue a shaved product at this scale — BigDecimal must.
    assert(Sampling.mixtureQuotas(300000000000L, Map("en" -> 0.1))("en")
      === 30000000000L)
    assert(Sampling.mixtureQuotas(300000000000L, Map("en" -> 0.29))("en")
      === 87000000000L)
    // fractional quotas still floor, never round up
    assert(Sampling.mixtureQuotas(7, Map("en" -> 0.5))("en") === 3L)
    assert(Sampling.mixtureQuotas(1000000000001L, Map("en" -> 0.3))("en")
      === 300000000000L)
  }

  test("packSequencesFrom continues each group's line from the persisted totals") {
    val e1 = docs.filter(col("doc_id") % 2 === 0)
    val e2 = docs.filter(col("doc_id") % 2 =!= 0)
    // one-shot over the concatenated epochs: epoch marker leads the order
    val oneShot = Packing.packSequences(
      docs.withColumn("ep", col("doc_id") % 2),
      Seq("lang"), Seq("ep", "doc_id"), "n_chars", budget = 500L)
      .select("doc_id", "offset", "bin")
    val incr = Packing.packSequences(e1, Seq("lang"), Seq("doc_id"),
        "n_chars", budget = 500L)
      .select("doc_id", "offset", "bin")
      .unionByName(Packing.packSequencesFrom(e2,
        Packing.packTotals(e1, Seq("lang"), "n_chars"),
        Seq("lang"), Seq("doc_id"), "n_chars", budget = 500L)
        .select("doc_id", "offset", "bin"))
    assertSameRows(incr, oneShot)
    // a group with no standing state starts at offset zero
    val fresh = Packing.packSequencesFrom(e2,
      Packing.packTotals(e1.filter(col("lang") =!= "en"), Seq("lang"), "n_chars"),
      Seq("lang"), Seq("doc_id"), "n_chars", budget = 500L)
    val en0 = fresh.filter(col("lang") === "en").agg(min(col("offset"))).head
    assert(!en0.isNullAt(0) && en0.getLong(0) === 0L,
      "stateless group must restart at offset 0")
  }

  test("trainingOrder: total order, balanced shards, partitioning-independent") {
    val got = Sampling.trainingOrder(docs, Seq("doc_id"), numShards = 8,
      salt = "epoch1")
    // every row exactly once, every (shard, pos) unique and dense from 1
    assert(got.count() === docs.count())
    import org.apache.spark.sql.functions.{countDistinct, max => smax}
    val perShard = got.groupBy("shard")
      .agg(count(lit(1)).as("n"), countDistinct(col("pos")).as("np"),
        smax(col("pos")).as("mp"))
      .collect()
    assert(perShard.length === 8)
    perShard.foreach { r =>
      assert(r.getAs[Long]("np") === r.getAs[Long]("n"), s"pos not unique: $r")
      assert(r.getAs[Int]("mp").toLong === r.getAs[Long]("n"), s"pos not dense: $r")
    }
    // hash balance: no shard more than 3x the mean at 500 docs
    val ns = perShard.map(_.getAs[Long]("n"))
    assert(ns.max < ns.sum / 8 * 3, s"shards unbalanced: ${ns.mkString(",")}")
    // deterministic under repartitioning
    assertSameRows(got,
      Sampling.trainingOrder(docs.repartition(13), Seq("doc_id"), 8, "epoch1"))
    // a different salt is a different epoch order: some doc moves shard
    val ep2 = Sampling.trainingOrder(docs, Seq("doc_id"), 8, "epoch2")
    val moved = got.select("doc_id", "shard")
      .except(ep2.select("doc_id", "shard")).count()
    assert(moved > 0, "epoch salt did not reshuffle any document")
  }

  test("temperatureQuotas: α=0.5 flattens toward the tail, quotas sum ≤ total") {
    import spark.implicits._
    // 1600 : 400 : 100 — raw proportions 16:4:1, sqrt proportions 4:2:1
    val df = (1 to 1600).map(i => (i, "en")) ++
      (1 to 400).map(i => (i + 10000, "de")) ++
      (1 to 100).map(i => (i + 20000, "fr"))
    val q = Sampling.temperatureQuotas(df.toDF("doc_id", "lang"), "lang",
      total = 700L).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // exact: sw = floor(1e6·sqrt(n/1600)) → en 1e6, de 5e5, fr 25e4;
    // quotas = 700·sw div 175e4 → 400 / 200 / 100
    assert(q("en") === ((1600L, 1000000L, 400L)), q.toString)
    assert(q("de") === ((400L, 500000L, 200L)), q.toString)
    assert(q("fr") === ((100L, 250000L, 100L)), q.toString)
    // fr's RAW share of 700 would be 33; temperature lifted it to 100
    assert(q.values.map(_._3).sum <= 700L)
  }

  test("temperatureMixtureSample draws exactly the quota per stratum, key-stable") {
    import spark.implicits._
    val df = ((1 to 1600).map(i => (i, "en")) ++
      (1 to 400).map(i => (i + 10000, "de")) ++
      (1 to 100).map(i => (i + 20000, "fr"))).toDF("doc_id", "lang")
    val got = Sampling.temperatureMixtureSample(df, "lang", total = 700L,
      keys = Seq("doc_id"))
    val per = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // fr's quota (100) equals its size — a quota is a cap, fully drawn here
    assert(per === Map("en" -> 400L, "de" -> 200L, "fr" -> 100L), per.toString)
    // admission is a pure function of the key: repartitioning changes nothing
    assertSameRows(got,
      Sampling.temperatureMixtureSample(df.repartition(17), "lang",
        total = 700L, keys = Seq("doc_id")))
    // and equals the two-step composition through mixtureSampleQuotas
    assertSameRows(got,
      Sampling.mixtureSampleQuotas(df, "lang",
        Map("en" -> 400L, "de" -> 200L, "fr" -> 100L), Seq("doc_id")))
  }
}
