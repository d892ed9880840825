package graft

import graft.llm.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash/LSH/SimHash semantics + recall vs exact all-pairs on the
  * driver documents table. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: DataFrame =
    spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")

  test("shingles: word n-grams, short docs give empty array") {
    val df = Seq((1, "a b c d"), (2, "a b"), (3, "")).toDF("id", "t")
      .select($"id", Dedup.shingles($"t", 3).as("sh"))
    val m = df.collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    assert(m(1) === Seq("a b c", "b c d"))
    assert(m(2) === Seq.empty)
    assert(m(3) === Seq.empty)
  }

  test("minhash signature: identical texts get identical signatures") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog end"),
                 (2L, "the quick brown fox jumps over the lazy dog end"),
                 (3L, "completely different words entirely unrelated content here now"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(df, numHashes = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1) === sigs(2))
    assert(sigs(1) !== sigs(3))
    assert(sigs(1).size === 16)
  }

  test("estimated jaccard of identical signatures is 1.0") {
    val df = Seq((1L, "x y z w v u t s"), (2L, "x y z w v u t s")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(df, numHashes = 16)
    val est = sigs.toDF("id1", "s1").crossJoin(sigs.toDF("id2", "s2"))
      .filter($"id1" < $"id2")
      .select(Dedup.estimatedJaccard($"s1", $"s2")).as[Double].head()
    assert(est === 1.0)
  }

  test("signature-estimate pre-filter drops low-jaccard bucket collisions, keeps " +
       "near-threshold pairs") {
    // hand-built signatures: docs 1/2 identical (est j = 1), docs 3/4 agree
    // on exactly one full band of 4 slots (so raw banding pairs them) but
    // nowhere else (est j = 4/64 ≈ 0.06 — an accidental collision)
    val base = (0 until 64).map(_.toLong)
    val sig3 = (0 until 64).map(i => if (i < 4) 1000L + i else 2000L + i)
    val sig4 = (0 until 64).map(i => if (i < 4) 1000L + i else 3000L + i)
    val sigs = Seq((1L, base), (2L, base), (3L, sig3), (4L, sig4))
      .toDF("doc_id", "signature")
    val raw = Dedup.candidatePairs(sigs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(raw === Set((1L, 2L), (3L, 4L)))
    val kept = Dedup.prefilteredCandidates(sigs, threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept === Set((1L, 2L)), "the est-j≈0.06 collision must be dropped")
  }

  test("LSH candidates achieve full recall of true near-dups (j>=0.8) on documents") {
    // ground truth by exact all-pairs jaccard (ok at test scale only)
    val sh = docs.select($"doc_id",
      array_distinct(Dedup.shingles($"text", 3)).as("sh"))
    val truth = sh.toDF("id1", "sh1").crossJoin(sh.toDF("id2", "sh2"))
      .filter($"id1" < $"id2")
      .withColumn("j", size(array_intersect($"sh1", $"sh2")).cast("double") /
        size(array_union($"sh1", $"sh2")))
      .filter($"j" >= 0.8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture should contain near-dups")

    val found = Dedup.nearDupPairs(docs, threshold = 0.8)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found === truth) // exact verify on LSH candidates: no false pos, full recall here
  }

  test("ngramJaccardPairs equals exact all-pairs at thresholds below LSH's range") {
    // 0.5 is far below what 16x4 banding can serve with full recall —
    // prefix filtering must still be exact
    Seq(0.5, 0.7, 0.9).foreach { t =>
      val sh = docs.select($"doc_id",
        array_distinct(Dedup.shingles($"text", 3)).as("sh"))
        .filter(size($"sh") > 0)
      val truth = sh.toDF("id1", "sh1").crossJoin(sh.toDF("id2", "sh2"))
        .filter($"id1" < $"id2")
        .withColumn("j", size(array_intersect($"sh1", $"sh2")).cast("double") /
          size(array_union($"sh1", $"sh2")))
        .filter($"j" >= t)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val found = Dedup.ngramJaccardPairs(docs, threshold = t)
        .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(found === truth, s"threshold $t")
    }
  }

  test("ngram prefix filtering never joins on the corpus-wide boilerplate gram") {
    // every doc shares a boilerplate prefix phrase; the rare-first global
    // order must push those grams out of the prefixes so candidate count
    // stays near the true-pair count, not all-pairs
    val boiler = "terms and conditions apply to this document"
    val docs2 = (0 until 30).map(i =>
      (i.toLong, s"$boiler unique body $i with words ${i * 7} and ${i * 13}"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(docs2, threshold = 0.8)
    // no pair reaches 0.8 (bodies differ) — and the exact result says so
    assert(pairs.count() === 0)
  }

  test("dedupNear drops the larger id of each matched pair") {
    val pairs = Dedup.nearDupPairs(docs, threshold = 0.8)
      .select("id2").as[Long].collect().toSet
    val kept = Dedup.dedupNear(docs, threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.intersect(pairs) === Set.empty)
    assert(kept.size === docs.count() - pairs.size)
  }

  test("simhash: near-dup pairs are closer in hamming distance than random pairs") {
    val sh = Dedup.simhash(docs)
    val near = Dedup.nearDupPairs(docs, threshold = 0.8).select("id1", "id2")
    val nearDist = near
      .join(sh.toDF("id1", "h1"), "id1").join(sh.toDF("id2", "h2"), "id2")
      .select(Dedup.hamming($"h1", $"h2").cast("double")).as[Double].collect()
    val randomDist = sh.toDF("id1", "h1").limit(30)
      .crossJoin(sh.toDF("id2", "h2").limit(30))
      .filter($"id1" + 17 === $"id2") // arbitrary disjoint pairing
      .select(Dedup.hamming($"h1", $"h2").cast("double")).as[Double].collect()
    assert(nearDist.nonEmpty && randomDist.nonEmpty)
    assert(nearDist.sum / nearDist.length < randomDist.sum / randomDist.length)
  }

  test("simhashPairs chunk-banding finds all pairs within the distance bound") {
    val sh = Dedup.simhash(docs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val maxD = 3
    val truth = (for {
      (i1, h1) <- sh.toSeq; (i2, h2) <- sh.toSeq if i1 < i2
      if java.lang.Long.bitCount(h1 ^ h2) <= maxD
    } yield (i1, i2)).toSet
    val found = Dedup.simhashPairs(docs, maxDistance = maxD)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found === truth)
  }

  test("simhashPairs: zero-token docs never pair (no k²/2 blow-up, no false dups)") {
    // 1000 token-less docs (empty / whitespace / punctuation) all
    // fingerprint to 0 — without the pre-band filter they'd share all
    // four chunk buckets and emit ~500k distance-0 "pairs"
    val empty = spark.range(1000).select($"id".as("doc_id"),
      element_at(array(lit(""), lit("   "), lit("?!.,;")),
        ($"id" % 3 + 1).cast("int")).as("text"))
    val real = Seq(
      (2001L, "the quick brown fox jumps over the lazy dog"),
      (2002L, "the quick brown fox jumps over the lazy dog"),
      (2003L, "totally unrelated content about spark partitions")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(empty.unionByName(real), maxDistance = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((2001L, 2002L)),
      "only the genuine near-dup pair; token-less docs are excluded from banding")
  }

  test("connectedComponents collapses chains transitively") {
    import spark.implicits._
    // chain 1-2-3, chain 10-11, singleton edge 20-21, long chain 30..34
    val pairs = Seq((1L,2L),(2L,3L),(10L,11L),(20L,21L),
      (30L,31L),(31L,32L),(32L,33L),(33L,34L)).toDF("id1","id2")
    val comps = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(comps(1L) === 1L && comps(2L) === 1L && comps(3L) === 1L)
    assert(comps(10L) === 10L && comps(11L) === 10L)
    assert(comps(34L) === 30L)
  }

  test("star contraction finishes a 1000-node chain in O(log n) rounds") {
    import spark.implicits._
    // the worst case for one-hop propagation: diameter 999 (min-label
    // needs ~1000 one-hop iterations and throws at its default cap)
    val chain = (0L until 999L).map(i => (i, i + 1)).toDF("id1", "id2")
    val (comp, rounds) = Dedup.connectedComponentsWithRounds(chain)
    assert(rounds <= 20, s"expected O(log n) rounds for a chain, took $rounds")
    val labels = comp.as[(Long, Long)].collect()
    assert(labels.length === 1000)
    assert(labels.forall(_._2 === 0L), "every chain node labels to the min id")
    intercept[IllegalStateException] {
      Dedup.minLabelComponents(chain) // diameter >> maxIter: must refuse
    }
  }

  test("disjoint pair graphs take the 0-round fast path with min-id labels") {
    import spark.implicits._
    // no shared nodes → every component is one edge; duplicate/reversed
    // pair rows and self-loops must not defeat the endpoint-count check,
    // and the self-loop-only node 5 must still label itself
    val pairs = Seq((2L, 1L), (1L, 2L), (10L, 11L), (10L, 11L), (20L, 21L),
      (5L, 5L)).toDF("id1", "id2")
    val (comp, rounds) = Dedup.connectedComponentsWithRounds(pairs)
    assert(rounds === 0, s"expected the disjoint fast path, took $rounds rounds")
    val labels = comp.as[(Long, Long)].collect().toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 5L -> 5L))
    // a shared endpoint compensated by a self-loop node must NOT take the
    // fast path (node 3 would get two labels): [(3,1),(3,2),(4,4)] has
    // 4 distinct node ids but only 3 distinct edge endpoints
    val (comp3, _) = Dedup.connectedComponentsWithRounds(
      Seq((3L, 1L), (3L, 2L), (4L, 4L)).toDF("id1", "id2"))
    assert(comp3.as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
    // one shared node breaks disjointness → general path, same labels
    val (comp2, rounds2) = Dedup.connectedComponentsWithRounds(
      pairs.union(Seq((21L, 22L)).toDF("id1", "id2")))
    assert(rounds2 > 0)
    assert(comp2.as[(Long, Long)].collect().toMap ===
      Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 10L -> 10L, 11L -> 10L,
        20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("property: star contraction equals min-label propagation on random graphs") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import spark.implicits._
    val edgeGen = Gen.listOfN(25,
      Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))
    val prop = Prop.forAll(edgeGen) { es =>
      val pairs = es.toDF("id1", "id2")
      val star = Dedup.connectedComponents(pairs)
        .as[(Long, Long)].collect().toMap
      val prop1 = Dedup.minLabelComponents(pairs, maxIter = 64)
        .as[(Long, Long)].collect().toMap
      star == prop1
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("dedupNearTransitive keeps one survivor per component") {
    // duplicate triplet a~b, b~c by construction: same text
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta"),
      (4L, "completely different content with other words here now"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupNearTransitive(df, threshold = 0.8)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L))
  }

  test("dedupNearBest keeps the highest-priority doc per component, singletons untouched") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", 10),
      (2L, "the quick brown fox jumps over the lazy dog", 50), // best of the cluster
      (3L, "the quick brown fox jumps over the lazy dog", 50), // tie -> smaller id (2) wins
      (4L, "completely different content with other words here", 7)
    ).toDF("doc_id", "text", "q")
    val kept = Dedup.dedupNearBest(df, "q")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L))
    // min-id rule (dedupNearTransitive) would have kept 1 — the priority
    // rule must actually change the survivor
    val minId = Dedup.dedupNearTransitive(df)
      .select("doc_id").as[Long].collect().toSet
    assert(minId === Set(1L, 4L))
  }

  test("incrementalNearDupPairs equals the cross-side slice of the batch result") {
    import org.apache.spark.sql.functions.col
    val newDocs = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val inc = Dedup.incrementalNearDupPairs(newDocs, corpus, threshold = 0.8)
    // batch all-pairs, restricted to pairs crossing the split (either order)
    val batch = Dedup.nearDupPairs(docs, threshold = 0.8)
    val cross = batch
      .filter((col("id1") % 10 === 0) =!= (col("id2") % 10 === 0))
      .select(
        org.apache.spark.sql.functions.when(col("id1") % 10 === 0, col("id1"))
          .otherwise(col("id2")).as("new_id"),
        org.apache.spark.sql.functions.when(col("id1") % 10 === 0, col("id2"))
          .otherwise(col("id1")).as("old_id"),
        col("jaccard"))
    assertSameRows(inc, cross)
    // and it NEVER emits a corpus-internal or batch-internal pair
    assert(inc.filter(col("new_id") % 10 =!= 0 || col("old_id") % 10 === 0)
      .count() === 0)
  }

  test("incremental dedup against a parquet-persisted index equals the inline run") {
    import org.apache.spark.sql.functions.col
    val newDocs = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    // persist the corpus index once, read it back — the daily-run shape
    val idxPath = tmpDir("neardup_idx")
    Dedup.buildNearDupIndex(corpus).write.mode("overwrite").parquet(idxPath)
    val fromDisk = spark.read.parquet(idxPath)
    val viaIndex = Dedup.incrementalNearDupPairsWith(newDocs, fromDisk,
      threshold = 0.8)
    val inline = Dedup.incrementalNearDupPairs(newDocs, corpus, threshold = 0.8)
    assertSameRows(viaIndex, inline)
  }

  test("dedupNewBatch removes corpus near-dups AND batch-internal near-dups") {
    import org.apache.spark.sql.functions.col
    val newDocs = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
    val idx = Dedup.buildNearDupIndex(corpus).localCheckpoint()
    val kept = Dedup.dedupNewBatch(newDocs, idx, threshold = 0.8)
    // composition law: kept = newDocs − cross-dups − internal losers
    val cross = Dedup.incrementalNearDupPairsWith(newDocs, idx, threshold = 0.8)
      .select(col("new_id").as("doc_id"))
    val internal = Dedup.nearDupPairs(newDocs, threshold = 0.8)
      .select(col("id2").as("doc_id"))
    val want = newDocs.join(cross.unionByName(internal).distinct(),
      Seq("doc_id"), "left_anti")
    assertSameRows(kept.select("doc_id"), want.select("doc_id"))
    // kept batch has no remaining near-dup against corpus or itself
    assert(Dedup.incrementalNearDupPairsWith(kept, idx, threshold = 0.8)
      .count() === 0)
    assert(Dedup.nearDupPairs(kept, threshold = 0.8).count() === 0)
  }

  test("contaminationPairs finds cross-split shingle overlap, counts distinct grams") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "nothing in common with anything else at all")).toDF("doc_id", "text")
    val test = Seq(
      (10L, "the quick brown fox jumps somewhere new today"),   // shares 3 trigrams w/ 1
      (11L, "quick brown fox quick brown fox quick brown fox"), // repeats count ONCE
      (12L, "totally disjoint text body here")).toDF("doc_id", "text")
    val got = Dedup.contaminationPairs(train, test, minShared = 1)
      .as[(Long, Long, Long)].collect().toSet
    // doc 10 vs 1: "the quick brown","quick brown fox","brown fox jumps" = 3
    // doc 11 vs 1: distinct grams of 11 are {quick brown fox, brown fox quick,
    //              fox quick brown}; only the first is in doc 1 -> 1, not 3
    assert(got === Set((10L, 1L, 3L), (11L, 1L, 1L)))
    // minShared gate
    val gated = Dedup.contaminationPairs(train, test, minShared = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(gated === Set((10L, 1L, 3L)))
  }

  test("decontaminate drops exactly the contaminated train docs") {
    import spark.implicits._
    val train = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),   // leaks into test 10
      (2L, "nothing in common with anything else at all"),
      (3L, "perfectly clean training material stays put")).toDF("doc_id", "text")
    val test = Seq(
      (10L, "the quick brown fox jumps somewhere new today")).toDF("doc_id", "text")
    val clean = Dedup.decontaminate(train, test, minShared = 3)
    assert(clean.select("doc_id").as[Long].collect().toSet === Set(2L, 3L))
    // minShared above the overlap keeps everything (report-only threshold)
    assert(Dedup.decontaminate(train, test, minShared = 4).count() === 3)
    // columns pass through untouched (it's the train frame, filtered)
    assert(clean.columns.toSeq === train.columns.toSeq)
  }

  test("contaminationPairs maxTrainDocFreq drops boilerplate grams") {
    import spark.implicits._
    val boiler = "this document is confidential and proprietary"
    val train = (1L to 5L).map(i => (i, s"$boiler unique tail number $i"))
      .toDF("doc_id", "text")
    val test = Seq((10L, s"$boiler something else entirely")).toDF("doc_id", "text")
    // without the cap the boilerplate matches every train doc...
    val noisy = Dedup.contaminationPairs(train, test, minShared = 1)
    assert(noisy.count() === 5)
    // ...with it, grams present in >2 train docs are ignored
    val filtered = Dedup.contaminationPairs(train, test, minShared = 1,
      maxTrainDocFreq = Some(2))
    assert(filtered.count() === 0)
  }

  test("decontaminateWith against a persisted benchmark index equals one-shot") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val test = docs.filter(col("doc_id") % 5 === 0)
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val idxPath = java.nio.file.Files
      .createTempDirectory("graft_benchidx").toString + "/idx"
    Dedup.benchmarkIndex(test).write.parquet(idxPath)
    val idx = spark.read.parquet(idxPath)
    // full train corpus as the batch: incremental == one-shot
    assertSameRows(
      Dedup.decontaminateWith(train, idx).select("doc_id"),
      Dedup.decontaminate(train, test).select("doc_id"))
    // a daily slice: flagged iff flagged in the full run
    val batch = train.filter(col("doc_id") % 3 === 0)
    assertSameRows(
      Dedup.decontaminateWith(batch, idx).select("doc_id"),
      Dedup.decontaminate(train, test).select("doc_id")
        .filter(col("doc_id") % 3 === 0))
  }

  test("contaminationPairsWith commonGrams blocklist ignores boilerplate") {
    import spark.implicits._
    val boiler = "this document is confidential and proprietary"
    val batch = (1L to 5L).map(i => (i, s"$boiler unique tail number $i"))
      .toDF("doc_id", "text")
    val test = Seq((10L, s"$boiler something else entirely")).toDF("doc_id", "text")
    val idx = Dedup.benchmarkIndex(test)
    assert(Dedup.contaminationPairsWith(batch, idx, minShared = 1).count() === 5)
    // blocklist = the boilerplate's own shingles, as a standing table
    val cg = Dedup.benchmarkIndex(
      Seq((0L, boiler)).toDF("doc_id", "text")).select("gram")
    assert(Dedup.contaminationPairsWith(batch, idx, minShared = 1,
      commonGrams = Some(cg)).count() === 0)
  }

  test("duplicatedSpans: planted run is measured exactly, sub-threshold runs drop") {
    import spark.implicits._
    val run15 = (1 to 15).map(i => s"shared$i").mkString(" ")
    val run9 = (1 to 9).map(i => s"partial$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $run15 gamma delta"),
      (2L, s"unrelated prefix words here $run15 and a different tail"),
      (3L, s"$run9 completely different remainder text body"),
      (4L, s"another opening $run9 closing words"),
      (5L, "no overlap with anything else at all right here")
    ).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(docs, k = 4, minSpanTokens = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1),
        x.getLong(2), x.getLong(3)))
    // only the 15-token run passes minSpan=10; the 9-token run is below
    assert(r.toSeq === Seq((1L, 2L, 15L, 1L)),
      s"expected exactly the planted 15-token span, got ${r.toSeq}")
  }

  test("duplicatedSpans: periodic text reports the true longest run, once per diagonal") {
    import spark.implicits._
    // "x x x x x x" vs "x x x x x x x x": every alignment matches, but the
    // longest shared run is min(6,8)=6 tokens — the max over diagonals
    val docs = Seq(
      (1L, Seq.fill(6)("x").mkString(" ")),
      (2L, Seq.fill(8)("x").mkString(" "))).toDF("doc_id", "text")
    val r = Dedup.duplicatedSpans(docs, k = 3, minSpanTokens = 3).collect()
    assert(r.length === 1)
    assert(r.head.getLong(2) === 6L,
      s"longest shared run must be 6 tokens, got ${r.head.getLong(2)}")
  }

  test("removeDuplicatedSpans: first occurrence kept, later cut at exact edges") {
    import spark.implicits._
    val run = (1 to 12).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $run gamma delta"),
      (2L, s"prefix words $run suffix tail"),
      (3L, "untouched text with nothing shared at all here")).toDF("doc_id", "text")
    val r = Dedup.removeDuplicatedSpans(docs, k = 4, minSpanTokens = 10)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    // doc 1 is the first occurrence: normalized but uncut
    assert(r(1L) === s"alpha beta $run gamma delta")
    // doc 2 loses exactly the 12 shared tokens, neighbors survive
    assert(r(2L) === "prefix words suffix tail", r(2L))
    assert(r(3L) === "untouched text with nothing shared at all here")
  }

  test("removeDuplicatedSpans: a doc that is all duplicate comes back empty") {
    import spark.implicits._
    val run = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, s"intro $run outro"), (2L, run)).toDF("doc_id", "text")
    val r = Dedup.removeDuplicatedSpans(docs, k = 4, minSpanTokens = 10)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) === s"intro $run outro")
    assert(r(2L) === "", s"fully-duplicated doc must be emptied, got '${r(2L)}'")
  }

  test("incremental span dedup: batch cuts vs a persisted index; corpus untouched") {
    import spark.implicits._
    val run = (1 to 14).map(i => s"shared$i").mkString(" ")
    val corpus = Seq(
      (1L, s"corpus opening $run corpus closing words"),
      (2L, "a corpus doc with nothing in common here")).toDF("doc_id", "text")
    val batch = Seq(
      (100L, s"batch prefix $run batch suffix"),
      (101L, "an unrelated batch document body")).toDF("doc_id", "text")
    val path = java.nio.file.Files
      .createTempDirectory("graft_spanidx").toString + "/idx"
    Dedup.spanGramIndex(corpus, k = 4).write.parquet(path)
    val idx = spark.read.parquet(path)
    val spans = Dedup.sharedSpansAgainst(batch, idx, k = 4, minSpanTokens = 10)
      .collect()
    // exactly the planted cross-epoch run, corpus side as doc_a
    assert(spans.map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSeq ===
      Seq((1L, 100L, 14L)))
    val cleaned = Dedup.removeDuplicatedSpansAgainst(batch, idx,
      k = 4, minSpanTokens = 10)
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(cleaned(100L) === "batch prefix batch suffix", cleaned(100L))
    assert(cleaned(101L) === "an unrelated batch document body")
    // output is batch-only: the corpus is never rewritten
    assert(cleaned.keySet === Set(100L, 101L))
  }

  test("incremental span dedup equals the batch slice of the full operator") {
    // when corpus ids < batch ids and the batch has no internal spans,
    // the full operator's batch rows ARE the incremental result
    val docs = spark.read.parquet(s"$sf/documents.parquet").limit(60)
      .select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"), col("text"))
    val full = Dedup.removeDuplicatedSpans(corpus.unionByName(batch),
      k = 8, minSpanTokens = 12)
      .filter(col("doc_id") >= 1000000)
    val inc = Dedup.removeDuplicatedSpansAgainst(batch,
      Dedup.spanGramIndex(corpus), k = 8, minSpanTokens = 12)
    val batchInternal = Dedup.duplicatedSpans(batch, k = 8, minSpanTokens = 12)
    assume(batchInternal.isEmpty, "fixture grew batch-internal spans")
    assertSameRows(full, inc)
  }

  test("duplicatedSpans maxGramDocFreq drops boilerplate; a rare anchor re-seeds") {
    import spark.implicits._
    val boiler = (1 to 12).map(i => s"b$i").mkString(" ") // 12-token boilerplate
    val docs = (1L to 6L).map(i => (i, s"$boiler unique tail $i here")).toDF("doc_id", "text")
      .union(Seq((100L, s"prefix alpha $boiler rare anchor words trailing extra"),
        (101L, s"other beginning $boiler rare anchor words trailing extra")).toDF("doc_id", "text"))
    // uncapped: all 8 docs pair on the boilerplate run
    val full = Dedup.duplicatedSpans(docs, k = 4, minSpanTokens = 8)
    assert(full.count() === 8L * 7 / 2)
    // capped at 6: pure-boilerplate grams (df=8) drop, but the 100/101
    // pair still surfaces through its rare "rare anchor words" extension
    val capped = Dedup.duplicatedSpans(docs, k = 4, minSpanTokens = 8,
      maxGramDocFreq = Some(6)).collect()
    assert(capped.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((100L, 101L)),
      s"expected only the anchored pair, got ${capped.mkString(",")}")
  }

  test("streaming decontamination drops planted leaks in backfill AND tail epochs") {
    import spark.implicits._
    import graft.table.ManagedTable
    import org.apache.spark.sql.streaming.Trigger
    val leak = (1 to 6).map(i => s"evaltoken$i").mkString(" ")
    val bench = Seq((900L, s"benchmark question $leak answer"))
      .toDF("doc_id", "text")
    val idx = Dedup.benchmarkIndex(bench).localCheckpoint()
    // contaminated docs in BOTH the snapshot commit and the tail commit:
    // every micro-batch must consult the frozen index, not just batch 0
    val epoch1 = Seq(
      (1L, s"train doc copying $leak verbatim"),
      (2L, "clean training document one")).toDF("doc_id", "text")
    val epoch2 = Seq(
      (3L, s"later ingest also leaks $leak here"),
      (4L, "clean training document two")).toDF("doc_id", "text")
    val bronze = tmpDir("sdecon_bronze")
    val silver = tmpDir("sdecon_silver")
    ManagedTable(spark, bronze).write(epoch1, "APPEND", "replace")
    ManagedTable(spark, bronze).write(epoch2, "APPEND", "append")
    val appId = "sdecon_spec"
    val q = graft.streaming.StreamOps.streamTable(spark, bronze)
      .writeStream
      .option("checkpointLocation", tmpDir("sdecon_ck"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, epoch: Long) =>
        val t = ManagedTable(spark, silver)
        if (!t.lastTxnVersion(appId).exists(_ >= epoch)) {
          graft.write.Writers.append(spark, silver,
            Dedup.decontaminateWith(batch, idx, minShared = 3)
              .select("doc_id"), txn = Some((appId, epoch)))
          ()
        }
      }
      .start()
    assert(q.awaitTermination(60000), "stream did not drain")
    val kept = ManagedTable(spark, silver).read
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(2L, 4L))
    // streamed result equals the one-shot batch recompute
    val batchKept = Dedup.decontaminateWith(
      epoch1.unionByName(epoch2), idx, minShared = 3)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === batchKept.toSeq)
  }
}
