package graft

import graft.operators.Profiling
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {

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
          Option(r.get(6)).map(_.asInstanceOf[Double]))))
      .toMap
    // lower median: id rank ⌊(4+1)/2⌋ = 2 → 2.0; n sorted 10,10,20,30
    // → rank 2 → 10.0; tag is non-numeric → null median
    assert(got("id") === ((4L, 4L, 4L, "1", "4", Some(2.0))))
    assert(got("tag") === ((4L, 3L, 2L, "a", "b", None))) // null excluded everywhere
    assert(got("n") === ((4L, 4L, 3L, "10", "30", Some(10.0))))
  }

  test("profileColumns: exact median ignores nulls and collapses duplicates") {
    import spark.implicits._
    val df = Seq[(Long, Option[Int])](
      (1L, Some(5)), (2L, None), (3L, Some(5)), (4L, Some(9)),
      (5L, Some(1)), (6L, None)).toDF("id", "x")
    val got = Profiling.profileColumns(df, Seq("x")).collect().head
    // non-null values sorted: 1,5,5,9 → rank ⌊(4+1)/2⌋ = 2 → 5.0
    assert(got.getAs[Long]("n_nonnull") === 4L)
    assert(got.getAs[Double]("median_value") === 5.0)
  }

  test("profileColumns: approx mode keeps the shape, single scan, no distinct expand") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"t${i % 7}")).toDF("id", "tag")
    val approx = Profiling.profileColumns(df, Seq("id", "tag"), exact = false)
    val rows = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL at this cardinality is exact-ish; shape and order must hold
    assert(approx.columns.toSeq === Seq("column_name", "n_rows", "n_nonnull",
      "n_distinct", "min_value", "max_value", "median_value"))
    assert(rows("tag") === 7L)
    assert(math.abs(rows("id") - 500L) <= 25L) // default rsd ≈ 5%
    // the sketched median rides the same single aggregate
    val meds = approx.collect()
      .map(r => r.getString(0) -> Option(r.get(6))).toMap
    assert(meds("tag") === None)
    assert(math.abs(meds("id").get.asInstanceOf[Double] - 250.0) <= 10.0)
    // exact mode plans a multi-distinct Expand; approx must not
    val exactPlan = Profiling.profileColumns(df, Seq("id", "tag"))
      .queryExecution.executedPlan.toString
    val approxPlan = approx.queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), "exact multi-distinct should Expand")
    assert(!approxPlan.contains("Expand"), "approx mode must stay single-pass")
  }

  test("profileColumns rejects unknown columns loudly") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "tag")
    val e = intercept[IllegalArgumentException](
      Profiling.profileColumns(df, Seq("id", "nope")))
    assert(e.getMessage.contains("nope"))
  }
}
