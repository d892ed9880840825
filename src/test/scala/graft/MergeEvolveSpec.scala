package graft

import graft.table.ManagedTable
import graft.write.{WriteOptions, Writers}
import org.apache.spark.sql.functions._

/** Merge schema evolution (Delta autoMerge analogue): new source columns
  * widen the table; carried/old dirs serve NULL for them; without the
  * option the merge fails loudly instead of silently dropping the column
  * while hashing it. */
class MergeEvolveSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = "2026-01-05 00:00:00"
  private val T1 = "2026-01-06 00:00:00"

  test("a new source column without mergeSchema fails loudly") {
    val path = tmpDir("mev_strict")
    Writers.scd1(spark, path, Seq((1, "a")).toDF("id", "v"), Seq("id"),
      WriteOptions(now = Some(T0)))
    val e = intercept[IllegalArgumentException] {
      Writers.scd1(spark, path, Seq((1, "a", "x")).toDF("id", "v", "w"),
        Seq("id"), WriteOptions(now = Some(T1)))
    }
    assert(e.getMessage.contains("w") && e.getMessage.contains("mergeSchema"))
  }

  test("scd1 evolves: matched rows take the new column, others read NULL") {
    val path = tmpDir("mev_scd1")
    Writers.scd1(spark, path,
      (0 until 10).map(i => (i, s"a$i")).toDF("id", "v"), Seq("id"),
      WriteOptions(now = Some(T0)))
    Writers.scd1(spark, path,
      Seq((3, "A3", "w3"), (42, "A42", "w42")).toDF("id", "v", "w"),
      Seq("id"), WriteOptions(now = Some(T1), mergeSchema = true))
    val t = ManagedTable(spark, path)
    val rows = t.read.select($"id", $"v", $"w").as[(Int, String, Option[String])]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(rows.size === 11)
    assert(rows(3) === (("A3", Some("w3"))), "updated row carries the new column")
    assert(rows(42) === (("A42", Some("w42"))), "inserted row carries the new column")
    assert(rows(5) === (("a5", None)), "untouched row reads NULL")
    // the committed schema is the union schema
    assert(t.lastCommit.get.schemaDdl.contains("w"))
  }

  test("evolution over a clustered table keeps the file-scoped path; old dirs serve NULL") {
    val path = tmpDir("mev_fs")
    Writers.scd1(spark, path,
      (0 until 400).map(i => (i, s"a$i")).toDF("id", "v"), Seq("id"),
      WriteOptions(now = Some(T0)))
    val t = ManagedTable(spark, path)
    t.clusterBy("id", 4)
    // narrow batch with a brand-new column → still a file-scoped merge
    Writers.scd1(spark, path,
      (10 until 20).map(i => (i, s"B$i", i * 10)).toDF("id", "v", "score"),
      Seq("id"), WriteOptions(now = Some(T1), mergeSchema = true))
    val c = t.lastCommit.get
    assert(c.operation === "MERGE(scd1)")
    assert(c.operationMetrics("numCarriedDirs").toInt >= 3,
      s"evolving merge lost the file scope: ${c.operationMetrics}")
    val now = t.read
    assert(now.count() === 400)
    assert(now.filter($"id" === 15).select($"score").as[Option[Int]].head() === Some(150))
    // rows in CARRIED (old-schema) dirs read NULL for the new column
    assert(now.filter($"id" === 300).select($"score").isEmpty === false)
    assert(now.filter($"id" === 300 && $"score".isNull).count() === 1)
    assert(now.filter($"score".isNull).count() === 390)
  }

  test("autoCompact folds small merge dirs once the snapshot crosses the threshold") {
    val path = tmpDir("mev_ac")
    val opts = WriteOptions(now = Some(T0), autoCompactMinDirs = Some(4))
    Writers.scd1(spark, path,
      (0 until 400).map(i => (i, s"a$i")).toDF("id", "v"), Seq("id"), opts)
    val t = ManagedTable(spark, path)
    t.clusterBy("id", 3)
    // each INSERT merge adds one small dir (no bucket rewritten);
    // crossing 4 dirs triggers compaction
    (1 to 3).foreach { k =>
      Writers.scd1(spark, path,
        Seq((1000 + k, s"B$k")).toDF("id", "v"), Seq("id"),
        opts.copy(now = Some(T1)))
    }
    val ops = t.history.map(_.operation)
    assert(ops.exists(_.startsWith("COMPACT")),
      s"auto-compaction never ran: $ops")
    assert(t.lastCommit.get.dirs.size <= 4,
      s"small merge dirs not folded: ${t.lastCommit.get.dirs.size}")
    // data intact after folding
    assert(t.read.count() === 403)
    (1 to 3).foreach(k =>
      assert(t.read.filter($"id" === 1000 + k && $"v" === s"B$k").count() === 1))
  }

  test("scd2 evolves: closed history keeps NULL, new active rows carry values") {
    val path = tmpDir("mev_scd2")
    Writers.scd2(spark, path,
      Seq((1, "a"), (2, "b")).toDF("id", "v"), Seq("id"),
      WriteOptions(now = Some(T0)))
    Writers.scd2(spark, path,
      Seq((1, "a2", "x1")).toDF("id", "v", "w"), Seq("id"),
      WriteOptions(now = Some(T1), mergeSchema = true))
    val t = ManagedTable(spark, path).read
    val active = t.filter(col("__metadata_active__") === "Y" && $"id" === 1)
    assert(active.select($"v", $"w").as[(String, Option[String])].head() ===
      (("a2", Some("x1"))))
    val closed = t.filter(col("__metadata_active__") =!= "Y" && $"id" === 1)
    assert(closed.select($"w").as[Option[String]].head() === None)
  }
}
