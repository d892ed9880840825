package graft

import graft.operators.Profiling
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {

  private val OutCols = Seq("column_name", "n_rows", "n_nonnull", "n_distinct",
    "min_value", "max_value", "p25_value", "median_value", "p75_value",
    "p95_value")

  test("profileColumns: exact counts, null handling, string-rendered extremes") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), 10),
      (2L, Some("b"), 20),
      (3L, None, 10),
      (4L, Some("a"), 30)).toDF("id", "tag", "n")
    val got = Profiling.profileColumns(df, Seq("id", "tag", "n")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5),
          Option(r.get(7)).map(_.asInstanceOf[Double]))))
      .toMap
    // median rank ⌈4·0.5⌉ = 2: id → 2.0; n sorted 10,10,20,30 → 10.0;
    // tag is non-numeric → null quantiles
    assert(got("id") === ((4L, 4L, 4L, "1", "4", Some(2.0))))
    assert(got("tag") === ((4L, 3L, 2L, "a", "b", None))) // null excluded everywhere
    assert(got("n") === ((4L, 4L, 3L, "10", "30", Some(10.0))))
  }

  test("profileColumns: exact quantiles ignore nulls, collapse duplicates, hit ⌈p·n⌉") {
    import spark.implicits._
    val df = Seq[(Long, Option[Int])](
      (1L, Some(5)), (2L, None), (3L, Some(5)), (4L, Some(9)),
      (5L, Some(1)), (6L, None)).toDF("id", "x")
    val got = Profiling.profileColumns(df, Seq("x")).collect().head
    // non-null values sorted: 1,5,5,9 (n=4) → ranks ⌈1⌉,⌈2⌉,⌈3⌉,⌈3.8⌉
    assert(got.getAs[Long]("n_nonnull") === 4L)
    assert(got.getAs[Double]("p25_value") === 1.0)
    assert(got.getAs[Double]("median_value") === 5.0)
    assert(got.getAs[Double]("p75_value") === 5.0)
    assert(got.getAs[Double]("p95_value") === 9.0)
  }

  test("profileColumns quantiles match exact rank selection on a 1..100 ramp") {
    import spark.implicits._
    val df = (1 to 100).map(i => Tuple1(i.toDouble)).toDF("v")
    val got = Profiling.profileColumns(df, Seq("v")).collect().head
    assert(got.getAs[Double]("p25_value") === 25.0)
    assert(got.getAs[Double]("median_value") === 50.0)
    assert(got.getAs[Double]("p75_value") === 75.0)
    assert(got.getAs[Double]("p95_value") === 95.0)
  }

  test("profileColumns: approx mode keeps the shape, single scan, no distinct expand") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"t${i % 7}")).toDF("id", "tag")
    val eps = 0.01
    val approx = Profiling.profileColumns(df, Seq("id", "tag"),
      exact = false, eps = eps)
    val rows = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL at this cardinality is exact-ish; shape and order must hold
    assert(approx.columns.toSeq === OutCols)
    assert(rows("tag") === 7L)
    assert(math.abs(rows("id") - 500L) <= 25L) // default rsd ≈ 5%
    // the sketched quantiles ride the same single aggregate, within eps·n
    val byName = approx.collect().map(r => r.getString(0) -> r).toMap
    assert(Option(byName("tag").get(7)) === None)
    for (((p, name), want) <- Profiling.Probs.zip(Seq(125.0, 250.0, 375.0, 475.0)))
      assert(math.abs(byName("id").getAs[Double](name) - want) <= eps * 500 + 1,
        s"sketched $name (p=$p) strayed past eps·n of $want")
    // exact mode plans a multi-distinct Expand; approx must not
    val exactPlan = Profiling.profileColumns(df, Seq("id", "tag"))
      .queryExecution.executedPlan.toString
    val approxPlan = approx.queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), "exact multi-distinct should Expand")
    assert(!approxPlan.contains("Expand"), "approx mode must stay single-pass")
  }

  test("approx mode: an all-NULL numeric column profiles to NULL quantiles, no crash") {
    import spark.implicits._
    val df = Seq[(Long, Option[Double])]((1L, None), (2L, None)).toDF("id", "x")
    val got = Profiling.profileColumns(df, Seq("x"), exact = false).collect().head
    assert(got.getAs[Long]("n_nonnull") === 0L)
    assert(Option(got.get(7)) === None)
  }

  test("profileColumns rejects unknown columns loudly") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "tag")
    val e = intercept[IllegalArgumentException](
      Profiling.profileColumns(df, Seq("id", "nope")))
    assert(e.getMessage.contains("nope"))
  }
}
