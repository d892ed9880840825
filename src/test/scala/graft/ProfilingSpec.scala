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
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))))
      .toMap
    assert(got("id") === ((4L, 4L, 4L, "1", "4")))
    assert(got("tag") === ((4L, 3L, 2L, "a", "b"))) // null excluded everywhere
    assert(got("n") === ((4L, 4L, 3L, "10", "30")))
  }

  test("profileColumns: approx mode keeps the shape, single scan, no distinct expand") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, s"t${i % 7}")).toDF("id", "tag")
    val approx = Profiling.profileColumns(df, Seq("id", "tag"), exact = false)
    val rows = approx.collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // HLL at this cardinality is exact-ish; shape and order must hold
    assert(approx.columns.toSeq === Seq("column_name", "n_rows", "n_nonnull",
      "n_distinct", "min_value", "max_value"))
    assert(rows("tag") === 7L)
    assert(math.abs(rows("id") - 500L) <= 25L) // default rsd ≈ 5%
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
