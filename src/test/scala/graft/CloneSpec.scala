package graft

import graft.table.ManagedTable
import org.apache.spark.sql.functions._

/** CLONE: zero-copy shallow clones, self-contained deep clones, and the
  * vacuum own-root guard that keeps a clone's retention from deleting
  * the source's data. */
class CloneSpec extends SparkSpec {
  import spark.implicits._

  private def mk(path: String, rows: Range): ManagedTable = {
    val t = ManagedTable(spark, path)
    t.write(rows.map(i => (i.toLong, s"v$i")).toDF("id", "s"), "APPEND", "append")
    t
  }

  test("shallow clone reads the snapshot, then diverges both ways") {
    val src = tmpDir("cl_src"); val dst = tmpDir("cl_dst")
    val t = mk(src, 1 to 10)
    val c = t.cloneTo(dst)
    assert(c.operationMetrics("cloneMode") === "shallow")
    val clone = ManagedTable(spark, dst)
    assertSameRows(clone.read, t.read)
    // zero-copy: the clone's v0 references the SOURCE's dirs
    assert(clone.lastCommit.get.dirs === t.commitAt(0L).dirs)
    // stats and byte sizes carried — no re-measure needed
    assert(clone.lastCommit.get.dirBytes === t.commitAt(0L).dirBytes)
    // divergence: writes on either side never show on the other
    t.write(Seq((11L, "v11")).toDF("id", "s"), "APPEND", "append")
    clone.write(Seq((100L, "c100")).toDF("id", "s"), "APPEND", "append")
    assert(t.read.count() === 11 && clone.read.count() === 11)
    assert(clone.read.filter(col("id") === 11L).count() === 0)
    assert(t.read.filter(col("id") === 100L).count() === 0)
  }

  test("clone as of an older version reproduces that snapshot") {
    val src = tmpDir("cl_src2"); val dst = tmpDir("cl_dst2")
    val t = mk(src, 1 to 5)
    t.write((6 to 9).map(i => (i.toLong, s"v$i")).toDF("id", "s"),
      "APPEND", "append")
    t.cloneTo(dst, asOfVersion = Some(0L))
    assert(ManagedTable(spark, dst).read.count() === 5)
  }

  test("the clone's vacuum never deletes the source's dirs (own-root guard)") {
    val src = tmpDir("cl_src3"); val dst = tmpDir("cl_dst3")
    val t = mk(src, 1 to 8)
    val clone = ManagedTable(spark, dst)
    t.cloneTo(dst)
    // replace the clone's contents: its v0 (source-owned dirs) becomes
    // vacuum-able history from the CLONE's point of view
    clone.write(Seq((1L, "replaced")).toDF("id", "s"), "OVERWRITE", "replace")
    clone.vacuum(keepLast = 1)
    // the source must be completely unharmed
    assert(t.read.count() === 8,
      "clone vacuum deleted source data — own-root guard broken")
    assert(clone.read.count() === 1)
  }

  test("deep clone is self-contained: source vacuum cannot break it") {
    val src = tmpDir("cl_src4"); val dst = tmpDir("cl_dst4")
    val t = mk(src, 1 to 6)
    t.cloneTo(dst, deep = true)
    val clone = ManagedTable(spark, dst)
    assert(clone.lastCommit.get.dirs.forall(_.contains("cl_dst4")),
      s"deep clone must own its dirs: ${clone.lastCommit.get.dirs}")
    assertSameRows(clone.read, t.read)
    // rewrite + vacuum the source away entirely
    t.write(Seq((99L, "gone")).toDF("id", "s"), "OVERWRITE", "replace")
    t.vacuum(keepLast = 1)
    assert(clone.read.count() === 6, "source vacuum broke a DEEP clone")
  }

  test("deep clone of a partitioned table keeps partition columns readable") {
    val src = tmpDir("cl_src5"); val dst = tmpDir("cl_dst5")
    val t = ManagedTable(spark, src)
    t.write((1 to 12).map(i => (i.toLong, s"p${i % 3}")).toDF("id", "p"),
      "APPEND", "append", partitionBy = Seq("p"))
    t.cloneTo(dst, deep = true)
    val clone = ManagedTable(spark, dst)
    assert(clone.read.select("p").distinct().count() === 3)
    assertSameRows(clone.read.select("id", "p"), t.read.select("id", "p"))
  }

  test("cloning onto an existing table or a vacuumed version refuses loudly") {
    val src = tmpDir("cl_src6"); val dst = tmpDir("cl_dst6")
    val t = mk(src, 1 to 3)
    t.cloneTo(dst)
    intercept[IllegalArgumentException](t.cloneTo(dst))
    t.write(Seq((4L, "x")).toDF("id", "s"), "OVERWRITE", "replace")
    t.vacuum(keepLast = 1)
    intercept[IllegalArgumentException](
      t.cloneTo(tmpDir("cl_dst7"), asOfVersion = Some(0L)))
  }
}
