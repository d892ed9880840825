package graft

import graft.operators.Sketches
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = spark.read.parquet(s"$sf/orders.parquet")

  test("hll direct estimate lands within 5% of exact per group") {
    val exact = orders.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = Sketches.approxDistinct(orders, Seq("o_orderpriority"), "o_custkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet)
    est.foreach { case (k, e) =>
      val x = exact(k).toDouble
      assert(math.abs(e - x) / x <= 0.05, s"$k: est $e vs exact $x")
    }
  }

  test("stored sketches merge to a coarser grain without rescanning and stay accurate") {
    // Fine-grain sketches (the 'store once' artifact)...
    val fine = Sketches.hllSketch(orders,
      Seq("o_orderpriority", "o_orderstatus"), "o_custkey").cache()
    // ...rolled up two different ways after the fact.
    val byPriority = Sketches.hllMergeEstimate(fine, Seq("o_orderpriority"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = orders.groupBy("o_orderpriority")
      .agg(countDistinct(col("o_custkey")).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byPriority.foreach { case (k, e) =>
      val x = exact(k).toDouble
      assert(math.abs(e - x) / x <= 0.05, s"merged $k: est $e vs exact $x")
    }
    val global = Sketches.hllMergeEstimate(
      fine.withColumn("all", lit(1)), Seq("all")).collect().head.getLong(1)
    val exactGlobal = orders.select(countDistinct(col("o_custkey"))).head.getLong(0)
    assert(math.abs(global - exactGlobal).toDouble / exactGlobal <= 0.05)
    fine.unpersist()
  }

  test("approx_percentile stays within one tick of the exact percentile") {
    // Sketch-quantile sanity (GK sketch, accuracy 1/eps = 10000): the
    // approximate median must sit between the exact 49th and 51st
    // percentiles of the data.
    val r = orders.agg(
      expr("approx_percentile(o_totalprice, 0.5, 10000)").as("apx"),
      expr("percentile(o_totalprice, 0.49)").as("lo"),
      expr("percentile(o_totalprice, 0.51)").as("hi")).head()
    val (apx, lo, hi) = (r.getDouble(0), r.getDouble(1), r.getDouble(2))
    assert(apx >= lo && apx <= hi, s"approx median $apx outside [$lo, $hi]")
  }

  test("bloom-pruned join returns exactly the plain join's rows") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    val got = Sketches.bloomPrunedJoin(li, urgent, "l_orderkey", "o_orderkey",
      expectedItems = 10000)
    val want = li.join(urgent, li("l_orderkey") === urgent("o_orderkey"))
    assertSameRows(got, want)
  }

  test("the bloom prune drops fact rows before the join, through codegen — no UDF") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val urgent = orders.filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey")
    // build exactly as the operator does (xxhash64 over the widened key)
    // and probe through the registered native expression
    graft.expressions.MightContain.register(spark)
    val bf = urgent.select(xxhash64(col("o_orderkey").cast("long")).as("h"))
      .stat.bloomFilter("h", 10000, 0.03)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val pruned = li.filter(call_function(graft.expressions.MightContain.Name,
      lit(bos.toByteArray), xxhash64(col("l_orderkey").cast("long")))).count()
    val total = li.count()
    // ~1/5 of orders are urgent; with 3% fpp the prune must cut well below half
    assert(pruned < total / 2, s"prune kept $pruned of $total — filter inert")
    // the probe sits UNDER the join in the plan (prune before shuffle)...
    val got = Sketches.bloomPrunedJoin(li, urgent, "l_orderkey", "o_orderkey",
      expectedItems = 10000)
    val plan = got.queryExecution.optimizedPlan.toString
    val filterIdx = plan.indexOf("might_contain")
    val joinIdx = plan.indexOf("Join")
    assert(joinIdx >= 0 && filterIdx > joinIdx,
      s"expected the might_contain filter below the join node in:\n$plan")
    // ...and the fact-side probe is the native expression, not a ScalaUDF
    assert(!plan.contains("UDF"), s"interpreted UDF boundary back in:\n$plan")
    assert(!got.queryExecution.executedPlan.toString.contains("ScalaUDF"),
      "physical plan fell out of codegen into a ScalaUDF probe")
  }

  test("string keys are supported; unsupported key types fail loudly") {
    val dim = Seq("A", "B").toDF("k")
    val fact = Seq(("A", 1), ("C", 2), ("B", 3)).toDF("k2", "v")
    val got = Sketches.bloomPrunedJoin(fact, dim, "k2", "k", expectedItems = 10)
    assert(got.count() === 2)
    val bad = Seq((1.5, 1)).toDF("d", "v")
    intercept[IllegalArgumentException] {
      Sketches.bloomPrunedJoin(bad, dim, "d", "k", expectedItems = 10)
    }
  }

  test("mixed integral widths prune without false negatives (int dim vs long fact)") {
    val dimInt = Seq(1, 2).toDF("k") // IntegerType
    val factLong = Seq((1L, "x"), (3L, "y"), (2L, "z")).toDF("k2", "v") // LongType
    // both sides widen to long before hashing — a width mismatch would
    // hash differently and silently drop TRUE matches
    val got = Sketches.bloomPrunedJoin(factLong, dimInt, "k2", "k",
      expectedItems = 10)
    assert(got.select("k2").as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("heavyHitters exact regime: equals groupBy counts, zero error, any partitioning") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val got = Sketches.heavyHitters(docs, Seq("lang"), "source",
      capacity = 64, k = 3)
    assert(got.filter(col("max_err") =!= 0).count() === 0,
      "no eviction can happen below capacity — errors must be 0")
    val oracle = docs.groupBy("lang", "source").count()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lang")
          .orderBy(col("count").desc, col("source"))))
      .filter(col("rn") <= 3)
      .select(col("lang"), col("source").as("item"),
        col("count").as("est_count"), lit(0L).as("max_err"))
    assertSameRows(got, oracle)
    assertSameRows(got, Sketches.heavyHitters(docs.repartition(13),
      Seq("lang"), "source", capacity = 64, k = 3))
  }

  test("heavyHitters approximate regime: overestimates within bound, heavy items present") {
    import spark.implicits._
    // zipf-ish stream: item i appears ~ 2000/i times, 100 distinct items,
    // summary capacity only 20 — evictions guaranteed
    val rows = (1 to 100).flatMap(i => Seq.fill(2000 / i)(s"item_$i"))
    val n = rows.size.toLong
    val df = rows.toDF("item").repartition(7)
    val truth = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val hits = Sketches.heavyHitters(df.withColumn("g", lit(1)), Seq("g"),
      "item", capacity = 20, k = 20).collect()
    hits.foreach { r =>
      val (item, est, err) = (r.getAs[String]("item"),
        r.getAs[Long]("est_count"), r.getAs[Long]("max_err"))
      val t = truth(item)
      assert(est >= t, s"$item underestimated: est $est < true $t")
      assert(est - err <= t, s"$item bound broken: est $est - err $err > true $t")
    }
    // anything with true count > 2n/capacity must be tracked
    val tracked = hits.map(_.getAs[String]("item")).toSet
    truth.filter(_._2 > 2 * n / 20).keys.foreach(item =>
      assert(tracked.contains(item), s"heavy item $item lost"))
  }

  /** Exact rank error of estimate `v` for target rank ceil(p·n) over
    * sorted data: distance from the target to v's true rank interval
    * [count(< v) + 1, count(≤ v)]. */
  private def rankErr(sorted: Array[Double], v: Double, p: Double): Long = {
    val n = sorted.length
    val r = math.max(1L, math.ceil(p * n).toLong)
    val lo = sorted.count(_ < v) + 1L
    val hi = sorted.count(_ <= v).toLong
    if (r < lo) lo - r else if (r > hi) r - hi else 0L
  }

  test("GK quantiles: every estimate within eps·n ranks, any partitioning") {
    val rnd = new scala.util.Random(42)
    // heavy duplicates + a skewed tail — the adversarial shapes for GK
    val data = Array.fill(20000)(rnd.nextInt(500).toDouble) ++
      Array.fill(2000)(7.0) ++ Array.fill(500)(math.abs(rnd.nextGaussian()) * 1e6)
    val eps = 0.01
    val probs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
    val sorted = data.sorted
    for (parts <- Seq(1, 7, 32)) {
      val df = data.toSeq.toDF("v").withColumn("g", lit("all")).repartition(parts)
      val est = Sketches.approxQuantiles(df, Seq("g"), "v", probs, eps)
        .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
      for (p <- probs) {
        val e = rankErr(sorted, est(p), p)
        assert(e <= (eps * data.length).toLong,
          s"parts=$parts p=$p: rank error $e > ${eps * data.length}")
      }
    }
  }

  test("GK summaries persist per shard and merge to the corpus grain, staying in bound") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(12000)(rnd.nextDouble() * 1000)
    val eps = 0.02
    // per-shard summaries (as if persisted daily), then merged corpus-wide
    val df = data.toSeq.toDF("v")
      .withColumn("shard", (col("v") * 7919).cast("long") % 5)
      .withColumn("g", lit("all"))
    val perShard = Sketches.quantileSketch(df, Seq("g", "shard"), "v", eps)
    assert(perShard.count() === 5)
    // accuracy is fixed at the sketches' BUILD eps — merge takes none
    val merged = Sketches.quantileMergeEstimate(
      perShard.drop("shard"), Seq("g"), Seq(0.1, 0.5, 0.9))
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    val sorted = data.sorted
    for ((p, v) <- merged)
      assert(rankErr(sorted, v, p) <= (eps * data.length).toLong,
        s"merged p=$p err ${rankErr(sorted, v, p)}")
  }

  test("GK deep-merge: 200 sequential micro-batch merges keep eps·n AND bounded state") {
    val rnd = new scala.util.Random(3)
    val eps = 0.02
    val agg = new Sketches.GKQuantile(eps)
    // simulate a streaming state store: one standing buffer absorbing a
    // fresh partial per "micro-batch", 200 batches of 100 values
    var state = agg.zero
    val all = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 0 until 200) {
      var part = agg.zero
      for (_ <- 0 until 100) {
        val v = if (rnd.nextInt(5) == 0) 42.0 else rnd.nextDouble() * 1000
        part = agg.reduce(part, v); all += v
      }
      state = agg.merge(state, part)
    }
    val s = agg.finish(state)
    assert(s.n === all.size.toLong)
    // state stayed sketch-sized, not linear in batch count (200 batches
    // × ~25 tuples each would be ~5000 without the recompress)
    assert(s.tuples.size < 600,
      s"state grew to ${s.tuples.size} tuples — recompression not working")
    val sorted = all.toArray.sorted
    for (p <- Seq(0.05, 0.25, 0.5, 0.75, 0.95)) {
      val e = rankErr(sorted, Sketches.gkQuery(s.tuples, s.n, p), p)
      assert(e <= (eps * s.n).toLong, s"p=$p err $e after deep merge")
    }
  }

  test("GK rollup: 1000 shard summaries recompress to the single-summary bound") {
    val rnd = new scala.util.Random(11)
    val eps = 0.02
    val agg = new Sketches.GKQuantile(eps)
    val merger = new Sketches.GKMerge
    val all = scala.collection.mutable.ArrayBuffer.empty[Double]
    var rollup = merger.zero
    var shardTuples = 0L
    for (_ <- 0 until 1000) {
      var buf = agg.zero
      for (_ <- 0 until 30) {
        val v = rnd.nextDouble() * 1e4
        buf = agg.reduce(buf, v); all += v
      }
      val s = agg.finish(buf)
      shardTuples += s.tuples.size
      rollup = merger.reduce(rollup, s)
    }
    val s = merger.finish(rollup)
    assert(s.n === all.size.toLong && s.eps === eps)
    // pre-eps GKMerge concatenated: the buffer would be every shard's
    // tuples (30k here — tiny shards never self-compress). Recompression
    // holds it at the single-summary O((1/eps)·log(eps·n)) bound.
    assert(shardTuples === 30000L)
    assert(s.tuples.size <= 800,
      s"rollup buffer grew to ${s.tuples.size} tuples — recompression not working")
    val sorted = all.toArray.sorted
    for (p <- Seq(0.05, 0.25, 0.5, 0.75, 0.95)) {
      val e = rankErr(sorted, Sketches.gkQuery(s.tuples, s.n, p), p)
      assert(e <= (eps * s.n).toLong, s"p=$p err $e after 1000-shard rollup")
    }
  }

  test("GK exact regime: eps small enough for the data size gives exact quantiles") {
    val data = (1 to 100).map(_.toDouble)
    val df = data.toDF("v").withColumn("g", lit("all")).repartition(3)
    // threshold(2·(eps/2)·n) = floor(0.001·100) = 0 → nothing ever
    // compresses and every delta is 0: the summary IS the sorted data
    val est = Sketches.approxQuantiles(df, Seq("g"), "v",
      Seq(0.25, 0.5, 0.75, 1.0), eps = 0.001)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    assert(est === Map(0.25 -> 25.0, 0.5 -> 50.0, 0.75 -> 75.0, 1.0 -> 100.0))
  }

  test("CMS: estimates never undercount and are exact at wide width") {
    import spark.implicits._
    val rows = (1 to 400).map(i => ("g", s"item${i % 7}"))
    val df = rows.toDF("grp", "item")
    val exact = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val sk = Sketches.countMinSketch(df, Seq("grp"), "item", eps = 1e-4)
    val est = Sketches.countMinEstimate(sk, exact.keys.toSeq.sorted)
      .collect().map(r => r.getAs[String]("item") -> r.getAs[Long]("est_count"))
      .toMap
    exact.foreach { case (item, n) =>
      assert(est(item) >= n, s"CMS undercounted $item")
      assert(est(item) === n,
        s"width 27183 over 7 items must not collide: $item ${est(item)} vs $n")
    }
  }

  test("CMS: per-shard sketches merge to exactly the one-shot global sketch") {
    import spark.implicits._
    val rows = (1 to 900).map(i => (s"shard${i % 5}", s"t${i % 11}"))
    val df = rows.toDF("shard", "item").withColumn("all", lit("g"))
    val items = (0 until 11).map(i => s"t$i")
    // merge of per-shard sketches: element-wise sum → IDENTICAL table to
    // sketching the concatenated stream → identical estimates
    val merged = Sketches.countMinMerge(
      Sketches.countMinSketch(df, Seq("shard", "all"), "item"), Seq("all"))
    val direct = Sketches.countMinSketch(df, Seq("all"), "item")
    val estM = Sketches.countMinEstimate(merged, items).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    val estD = Sketches.countMinEstimate(direct, items).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(estM === estD)
    val exact = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    items.foreach(i => assert(estM(i) >= exact(i)))
  }

  test("KMV: exact (and flagged uncapped) below k; set ops exact too") {
    val a = (0 until 300).map(i => ("a", i.toLong))
    val b = (200 until 450).map(i => ("b", i.toLong))
    val df = spark.createDataFrame(a ++ b).toDF("grp", "v")
    val sk = Sketches.kmvSketch(df, Seq("grp"), "v", k = 1024).cache()
    val est = Sketches.kmvMergeEstimate(sk, Seq("grp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("a") === 300L && est("b") === 250L)
    val joined = sk.filter(col("grp") === "a")
      .select(col(Sketches.KmvCol).as("ska"))
      .crossJoin(sk.filter(col("grp") === "b")
        .select(col(Sketches.KmvCol).as("skb")))
    val r = Sketches.kmvSetEstimates(joined, "ska", "skb").collect().head
    assert(r.getAs[Long]("est_a") === 300L)
    assert(r.getAs[Long]("est_b") === 250L)
    assert(r.getAs[Long]("est_union") === 450L)
    assert(r.getAs[Long]("est_inter") === 100L)
    assert(r.getAs[Long]("est_diff_a") === 200L)
  }

  test("KMV: capped estimates land within 4 sigma; sketches are partitioning-independent") {
    val n = 20000
    val rows = (0 until n).map(i => ("g", i.toLong))
    val sketches = Seq(1, 7, 32).map { p =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, p)).toDF("grp", "v")
      Sketches.kmvSketch(df, Seq("grp"), "v", k = 256)
        .collect().head.getStruct(1)
    }
    assert(sketches.map(_.toString).distinct.size === 1,
      "k-min set of a fixed value set must not depend on partitioning")
    val s = sketches.head
    assert(s.getBoolean(2), "20k distinct must cap a k=256 sketch")
    val est = Sketches.KmvSketch(s.getInt(0), s.getLong(1), s.getBoolean(2),
      s.getSeq[Long](3)).estimate
    val tol = 4.0 / math.sqrt(256 - 2)
    assert(math.abs(est - n.toDouble) / n <= tol, s"est $est vs $n")
  }

  test("KMV: rollup of shard sketches equals the direct sketch of the union") {
    val rows = (0 until 8000).map(i => (s"shard${i % 5}", (i % 3000).toLong))
    val df = spark.createDataFrame(rows).toDF("shard", "v")
    val fine = Sketches.kmvSketch(df, Seq("shard"), "v", k = 128)
      .withColumn("all", lit(1))
    val merged = Sketches.kmvMergeEstimate(fine, Seq("all"))
      .collect().head.getLong(1)
    val direct = Sketches.kmvMergeEstimate(
      Sketches.kmvSketch(df.withColumn("all", lit(1)), Seq("all"), "v", k = 128),
      Seq("all")).collect().head.getLong(1)
    assert(merged === direct,
      s"theta union must reproduce the direct sketch: $merged vs $direct")
  }

  test("KMV: planted overlap estimated within 4 sigma through set ops") {
    val a = (0 until 3000).map(i => ("a", i.toLong))
    val b = (1500 until 4500).map(i => ("b", i.toLong))
    val sk = Sketches.kmvSketch(
      spark.createDataFrame(a ++ b).toDF("grp", "v"),
      Seq("grp"), "v", k = 256).cache()
    val joined = sk.filter(col("grp") === "a")
      .select(col(Sketches.KmvCol).as("ska"))
      .crossJoin(sk.filter(col("grp") === "b")
        .select(col(Sketches.KmvCol).as("skb")))
    val r = Sketches.kmvSetEstimates(joined, "ska", "skb").collect().head
    val tol = 4.0 / math.sqrt(256 - 2)
    def within(est: Long, x: Double): Unit =
      assert(math.abs(est - x) / x <= tol, s"est $est vs exact $x")
    within(r.getAs[Long]("est_a"), 3000)
    within(r.getAs[Long]("est_b"), 3000)
    within(r.getAs[Long]("est_union"), 4500)
    within(r.getAs[Long]("est_inter"), 1500)
    within(r.getAs[Long]("est_diff_a"), 1500)
  }

  test("CMS: estimates are partitioning-independent") {
    import spark.implicits._
    val rows = (1 to 500).map(i => ("g", s"k${i % 13}"))
    val items = (0 until 13).map(i => s"k$i")
    val ests = Seq(1, 7, 32).map { p =>
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, p)).toDF("grp", "item")
      Sketches.countMinEstimate(
        Sketches.countMinSketch(df, Seq("grp"), "item"), items)
        .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    }
    assert(ests.distinct.size === 1,
      "count_min_sketch aggregation must not depend on partitioning")
  }
}
