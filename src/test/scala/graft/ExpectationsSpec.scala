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
