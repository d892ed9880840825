package graft

import graft.write.MergeEmulator
import graft.write.MergeEmulator.MatchedUpdate
import org.apache.spark.sql.functions._

/** MERGE INTO emulation semantics (mirrors Delta MERGE as used by
  * reference write.py:510-523, :985-991, :278-294). */
class MergeEmulatorSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1, "a", 10), (2, "b", 20), (3, "c", 30)).toDF("id", "v", "x")

  test("matched update, unmatched-target keep, source-only insert") {
    val source = Seq((2, "B", 200), (4, "d", 40)).toDF("id", "v", "x")
    val out = MergeEmulator.merge(
      target, source,
      col("target.id") === col("source.id"),
      Seq(MatchedUpdate(None, Map("v" -> col("source.v"), "x" -> col("source.x")))),
      Map("id" -> col("source.id"), "v" -> col("source.v"), "x" -> col("source.x")))
    val got = out.as[(Int, String, Int)].collect().toSet
    assert(got === Set((1, "a", 10), (2, "B", 200), (3, "c", 30), (4, "d", 40)))
  }

  test("conditional matched branch: only rows passing the condition update") {
    val source = Seq((1, "A", 10), (2, "b", 20)).toDF("id", "v", "x")
    val out = MergeEmulator.merge(
      target, source,
      col("target.id") === col("source.id"),
      Seq(MatchedUpdate(Some(col("target.v") =!= col("source.v")),
        Map("v" -> col("source.v")))),
      Map("id" -> col("source.id"), "v" -> col("source.v"), "x" -> col("source.x")))
    val got = out.as[(Int, String, Int)].collect().toSet
    assert(got === Set((1, "A", 10), (2, "b", 20), (3, "c", 30)))
  }

  test("first matching WHEN MATCHED branch wins") {
    val source = Seq((1, "z", 99)).toDF("id", "v", "x")
    val out = MergeEmulator.merge(
      target, source,
      col("target.id") === col("source.id"),
      Seq(
        MatchedUpdate(Some(lit(true)), Map("v" -> lit("first"))),
        MatchedUpdate(Some(lit(true)), Map("v" -> lit("second")))),
      Map("id" -> col("source.id"), "v" -> col("source.v"), "x" -> col("source.x")))
    assert(out.filter($"id" === 1).select("v").as[String].head() === "first")
  }

  test("insert columns absent from insertValues become NULL of target type") {
    val source = Seq((9, "i")).toDF("id", "v")
    val out = MergeEmulator.merge(
      target, source,
      col("target.id") === col("source.id"),
      Nil,
      Map("id" -> col("source.id"), "v" -> col("source.v")))
    val r = out.filter($"id" === 9).collect()(0)
    assert(r.isNullAt(r.fieldIndex("x")))
    // names+types preserved; nullability widens (an unmatched insert can
    // legitimately introduce NULL into a previously non-nullable column)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      target.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("multiple source rows matching one target row raise like Delta MERGE") {
    val source = Seq((2, "B1", 21), (2, "B2", 22)).toDF("id", "v", "x")
    val out = MergeEmulator.merge(
      target, source,
      col("target.id") === col("source.id"),
      Seq(MatchedUpdate(None, Map("v" -> col("source.v")))),
      Map("id" -> col("source.id"), "v" -> col("source.v"), "x" -> col("source.x")))
    val e = intercept[Exception](out.collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("MERGE cardinality violation")))
  }

  test("cardinality guard survives column pruning (fires on a subset select)") {
    val source = Seq((2, "B1", 21), (2, "B2", 22)).toDF("id", "v", "x")
    val out = MergeEmulator.merge(
      target, source,
      col("target.id") === col("source.id"),
      Seq(MatchedUpdate(None, Map("v" -> col("source.v")))),
      Map("id" -> col("source.id"), "v" -> col("source.v"), "x" -> col("source.x")))
    // consumer prunes down to one column — the guard is a filter, not a
    // rider on a data column, so it must still raise
    val e = intercept[Exception](out.select("x").collect())
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("MERGE cardinality violation")))
  }

  test("identical duplicate target rows each matching once do not raise") {
    // n_t = 2 identical target rows, one source match → 2 joined rows in
    // the group, equal to n_t: legal (Delta: many targets may match one
    // source), and both copies update
    val dupTarget = Seq((2, "b", 20), (2, "b", 20), (3, "c", 30)).toDF("id", "v", "x")
    val source = Seq((2, "B", 200)).toDF("id", "v", "x")
    val out = MergeEmulator.merge(
      dupTarget, source,
      col("target.id") === col("source.id"),
      Seq(MatchedUpdate(None, Map("v" -> col("source.v"), "x" -> col("source.x")))),
      Map("id" -> col("source.id"), "v" -> col("source.v"), "x" -> col("source.x")))
    val got = out.as[(Int, String, Int)].collect().toSeq.sorted
    assert(got === Seq((2, "B", 200), (2, "B", 200), (3, "c", 30)))
  }

  test("duplicate matches pass with failOnMultipleMatches off (documented fan-out)") {
    val source = Seq((2, "B1", 21), (2, "B2", 22)).toDF("id", "v", "x")
    val out = MergeEmulator.merge(
      target, source,
      col("target.id") === col("source.id"),
      Seq(MatchedUpdate(None, Map("v" -> col("source.v"), "x" -> col("source.x")))),
      Map("id" -> col("source.id"), "v" -> col("source.v"), "x" -> col("source.x")),
      failOnMultipleMatches = false)
    assert(out.filter($"id" === 2).count() === 2)
  }

  test("guard ignores many inserts and many unmatched targets") {
    // 100 source-only rows + 3 target-only rows: no both-present group,
    // nothing raises, all rows come through
    val source = (100 to 199).map(i => (i, s"v$i", i)).toDF("id", "v", "x")
    val out = MergeEmulator.merge(
      target, source,
      col("target.id") === col("source.id"),
      Seq(MatchedUpdate(None, Map("v" -> col("source.v")))),
      Map("id" -> col("source.id"), "v" -> col("source.v"), "x" -> col("source.x")))
    assert(out.count() === 103)
  }

  test("output schema always equals target schema") {
    val source = Seq((2, "B", 200, "extra")).toDF("id", "v", "x", "junk")
    val out = MergeEmulator.merge(
      target, source,
      col("target.id") === col("source.id"),
      Seq(MatchedUpdate(None, Map("v" -> col("source.v")))),
      Map("id" -> col("source.id"), "v" -> col("source.v")))
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      target.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }
}
