package graft

import graft.operators.Expectations
import graft.operators.Expectations._

/** Expectations: per-rule violation counts with precise null semantics,
  * all evaluated in one scan. */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def verdicts(df: org.apache.spark.sql.DataFrame, rules: Seq[Rule]) =
    Expectations.check(df, rules).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getInt(3))).toMap

  test("each rule counts exactly its planted violations; NULLs belong to not_null only") {
    val df = Seq[(java.lang.Long, String, java.lang.Double, String)](
      (1L, "a", 10.0, "OK"),
      (1L, "b", -5.0, "OK"),    // dup id, below range
      (2L, null, 55.0, "BAD"),  // null name, above range, bad status
      (3L, "c", null, "OK"),    // null value: NOT an in_range violation
      (null, "d!", 20.0, "OK")  // null id (unique ignores), regex violation
    ).toDF("id", "name", "v", "status")
    val v = verdicts(df, Seq(
      NotNull("name"),
      Unique(Seq("id")),
      InRange("v", 0.0, 50.0),
      MatchesRegex("name", "^[a-z]+$"),
      OneOf("status", Seq("OK")),
      Satisfies("v IS NULL OR v >= -10", "v_floor")))
    assert(v(("not_null", "name")) === ((1L, 0)))
    assert(v(("unique", "id")) === ((1L, 0)), "one duplicated non-null id")
    assert(v(("in_range", "v")) === ((2L, 0)), "-5 and 55; the NULL is not counted")
    assert(v(("matches_regex", "name")) === ((1L, 0)), "'d!' only; NULL not counted")
    assert(v(("one_of", "status")) === ((1L, 0)))
    assert(v(("satisfies", "v_floor")) === ((0L, 1)))
  }

  test("satisfies treats a NULL predicate as a violation (CHECK semantics)") {
    val df = Seq[java.lang.Double](1.0, null, -2.0).toDF("x")
    val v = verdicts(df, Seq(Satisfies("x > 0", "x_pos")))
    // -2.0 fails, NULL fails (only TRUE passes), 1.0 passes
    assert(v(("satisfies", "x_pos")) === ((2L, 0)))
  }

  test("metricsProfile computes exact integer metrics in one scan") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, null), (3L, "b"))
      .toDF("id", "tag")
    val prof = Expectations.metricsProfile(df, Expectations.parseMetrics(
      "count; nulls:tag; distinct:id; distinct:tag")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(prof(("row_count", "*")) === 4L)
    assert(prof(("null_count", "tag")) === 1L)
    assert(prof(("distinct_count", "id")) === 3L)
    assert(prof(("distinct_count", "tag")) === 2L)
  }

  test("driftCheck verdicts are integer-exact at the tolerance boundary") {
    def hist(vals: Long*) = vals.map(v => ("row_count", "*", v))
      .toDF("metric", "column", "value")
    def cur(v: Long) = Seq(("row_count", "*", v)).toDF("metric", "column", "value")
    def passed(c: org.apache.spark.sql.DataFrame,
               h: org.apache.spark.sql.DataFrame, tol: Long): Int =
      Expectations.driftCheck(c, h, tol).collect().head.getAs[Int]("passed")
    // history mean 100, tol 10% -> 110 passes EXACTLY, 111 fails
    assert(passed(cur(110L), hist(90L, 100L, 110L), 100000L) === 1)
    assert(passed(cur(111L), hist(90L, 100L, 110L), 100000L) === 0)
    assert(passed(cur(90L), hist(90L, 100L, 110L), 100000L) === 1)
    assert(passed(cur(89L), hist(90L, 100L, 110L), 100000L) === 0)
    // zero history total: only zero passes (a count from nowhere IS drift)
    assert(passed(cur(0L), hist(0L, 0L), 100000L) === 1)
    assert(passed(cur(1L), hist(0L, 0L), 100000L) === 0)
    // no history rows: vacuous pass, hist_n marks it
    val v = Expectations.driftCheck(cur(7L),
      Seq(("null_count", "x", 1L)).toDF("metric", "column", "value"), 0L)
      .collect().head
    assert(v.getAs[Int]("passed") === 1 && v.getAs[Long]("hist_n") === 0L)
  }

  test("a clean table passes every rule; one scan serves all rules") {
    val df = (1 to 100).map(i => (i.toLong, s"n$i")).toDF("id", "name")
    val out = Expectations.check(df,
      Seq(NotNull("id"), Unique(Seq("id")), MatchesRegex("name", "^n\\d+$")))
    assert(out.collect().forall(_.getInt(3) === 1))
    val scans = out.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
        if r.nodeName == "LocalRelation" => r
    }
    assert(scans.size === 1, s"expected one source scan, got ${scans.size}")
  }
}
