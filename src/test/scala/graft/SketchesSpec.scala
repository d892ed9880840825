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
}
