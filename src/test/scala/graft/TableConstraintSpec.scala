package graft

import graft.table.ManagedTable
import graft.write.WriteTableConstraintError
import org.apache.spark.sql.functions._

/** Persistent table constraints: Delta ADD CONSTRAINT analogue,
  * enforced on every data-adding write via the write job's own
  * Observation (no second scan), rolled back before commit. */
class TableConstraintSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String): ManagedTable = {
    val t = ManagedTable(spark, tmpDir(prefix))
    t.write((1 to 5).map(i => (i, i * 10.0)).toDF("id", "score"),
      "APPEND", "append")
    t
  }

  test("addConstraint validates existing data; violating batches roll back") {
    val t = freshTable("tc_basic")
    val c = t.addConstraint("pos_score", "range:score:0:1000")
    assert(c.constraints === Map("pos_score" -> "range:score:0:1000"))
    // conforming append works
    t.write(Seq((6, 60.0)).toDF("id", "score"), "APPEND", "append")
    assert(t.read.count() === 6)
    val dirsBefore = t.lastCommit.get.dirs
    val vBefore = t.lastCommit.get.version
    val e = intercept[WriteTableConstraintError](
      t.write(Seq((7, -5.0)).toDF("id", "score"), "APPEND", "append"))
    assert(e.getMessage.contains("pos_score"))
    // rolled back: no commit, no orphan dir in the composition, data clean
    assert(t.lastCommit.get.version === vBefore)
    assert(t.lastCommit.get.dirs === dirsBefore)
    assert(t.read.count() === 6)
    // a violating batch that pre-exists refuses the ADD itself
    val e2 = intercept[IllegalArgumentException](
      t.addConstraint("tiny", "range:score:0:15"))
    assert(e2.getMessage.contains("existing rows"))
  }

  test("not_null and check constraints gate updates and merges too") {
    val t = freshTable("tc_dml")
    t.addConstraint("score_set", "not_null:score")
    t.addConstraint("sane", "check:sane:score >= id")
    // an UPDATE that would break the check rolls back
    intercept[WriteTableConstraintError](
      t.update(Map("score" -> lit(0.5)), col("id") === 3))
    assert(t.read.filter(col("id") === 3).select("score").head.getDouble(0) === 30.0)
    // an UPDATE that keeps it passes
    t.update(Map("score" -> (col("score") + 1)), col("id") === 3)
    assert(t.read.filter(col("id") === 3).select("score").head.getDouble(0) === 31.0)
    // NULL-injecting update refuses
    intercept[WriteTableConstraintError](
      t.update(Map("score" -> lit(null).cast("double")), col("id") === 1))
  }

  test("dropConstraint lifts enforcement; constraints survive clone/restore") {
    val t = freshTable("tc_drop")
    t.addConstraint("pos", "range:score:0:1000")
    val cloneRoot = tmpDir("tc_drop_clone")
    t.cloneTo(cloneRoot)
    val clone = ManagedTable(spark, cloneRoot)
    intercept[WriteTableConstraintError](
      clone.write(Seq((9, -1.0)).toDF("id", "score"), "APPEND", "append"))
    t.dropConstraint("pos")
    t.write(Seq((9, -1.0)).toDF("id", "score"), "APPEND", "append")
    assert(t.read.count() === 6)
    t.restore(1L) // back to when "pos" was live
    intercept[WriteTableConstraintError](
      t.write(Seq((10, -2.0)).toDF("id", "score"), "APPEND", "append"))
  }

  test("unique rules refuse; rename/drop of a constrained column refuses") {
    val t = freshTable("tc_refuse")
    val e = intercept[IllegalArgumentException](
      t.addConstraint("uniq", "unique:id"))
    assert(e.getMessage.contains("merge keys"))
    t.addConstraint("pos", "range:score:0:1000")
    val e2 = intercept[IllegalArgumentException](t.renameColumn("score", "rating"))
    assert(e2.getMessage.contains("pos"))
    val e3 = intercept[IllegalArgumentException](t.dropColumn("score"))
    assert(e3.getMessage.contains("pos"))
    // unconstrained columns still rename freely
    t.renameColumn("id", "key")
    assert(t.read.columns.toSeq === Seq("key", "score"))
  }

  test("constraints hold under a column mapping and round-trip the log") {
    val t = freshTable("tc_cmap")
    t.renameColumn("score", "rating")
    t.addConstraint("pos", "range:rating:0:1000")
    intercept[WriteTableConstraintError](
      t.write(Seq((6, -3.0)).toDF("id", "rating"), "APPEND", "append"))
    t.write(Seq((6, 60.0)).toDF("id", "rating"), "APPEND", "append")
    assert(t.read.count() === 6)
    val c = ManagedTable.Commit(1L, "ADD CONSTRAINT(x)", 5L, Seq("/a"),
      Map.empty, None, "`id` INT", 0L,
      constraints = Map("x" -> "not_null:id"))
    assert(ManagedTable.Commit.fromJson(c.toJson) === c)
  }
}
