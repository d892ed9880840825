package graft

import graft.table.ManagedTable
import org.apache.spark.sql.functions._

/** Partition-scoped replace over the dir-composition log — the
  * `selective_overwrite` write type the reference declares but never
  * implements (core/schemas/sources.py:85). */
class SelectiveOverwriteSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int, rows: (Int, String)*) =
    rows.toSeq.toDF("id", "v").withColumn("dt", lit(f"2026-01-$d%02d"))

  test("replaces only the partitions present in the batch") {
    val path = tmpDir("sel")
    val t = ManagedTable(spark, path)
    t.write(day(1, (1, "a"), (2, "b")).unionByName(day(2, (3, "c"))),
      "APPEND", "append", None, partitionBy = Seq("dt"))
    assert(t.read.count() === 3)

    // replace day 2 only; day 1 untouched
    val c = t.selectiveOverwrite(day(2, (30, "C"), (31, "D")), Seq("dt"))
    assert(c.operationMetrics("replacedPartitions") === "1")
    val now = t.read
    assert(now.count() === 4)
    assert(now.filter($"dt" === "2026-01-01").select("id").as[Int].collect().toSet === Set(1, 2))
    assert(now.filter($"dt" === "2026-01-02").select("id").as[Int].collect().toSet === Set(30, 31))
  }

  test("repeated selective overwrites compose; old versions stay readable") {
    val path = tmpDir("sel2")
    val t = ManagedTable(spark, path)
    t.write(day(1, (1, "a")).unionByName(day(2, (2, "b"))).unionByName(day(3, (3, "c"))),
      "APPEND", "append", None, partitionBy = Seq("dt"))
    t.selectiveOverwrite(day(2, (20, "B")), Seq("dt"))
    t.selectiveOverwrite(day(3, (30, "C")), Seq("dt"))
    val rows = t.read.select("id").as[Int].collect().toSet
    assert(rows === Set(1, 20, 30))
    // version 0 snapshot unchanged (MVCC via dir composition)
    val v0dirs = t.commitAt(0).dirs
    assert(spark.read.parquet(v0dirs: _*).count() === 3)
  }

  test("new partitions in the batch are added, not just replaced") {
    val path = tmpDir("sel3")
    val t = ManagedTable(spark, path)
    t.write(day(1, (1, "a")), "APPEND", "append", None, Seq("dt"))
    t.selectiveOverwrite(day(4, (40, "new")), Seq("dt"))
    val now = t.read
    assert(now.count() === 2)
    assert(now.select("dt").distinct().as[String].collect().toSet ===
      Set("2026-01-01", "2026-01-04"))
  }

  test("unpartitioned previous data rejects selective overwrite with a clear error") {
    val path = tmpDir("sel4")
    val t = ManagedTable(spark, path)
    t.write(Seq((1, "a")).toDF("id", "v").withColumn("dt", lit("2026-01-01")),
      "APPEND", "append", None, Nil) // NOT partitioned
    assertThrows[IllegalStateException] {
      t.selectiveOverwrite(day(1, (9, "z")), Seq("dt"))
    }
  }
}
