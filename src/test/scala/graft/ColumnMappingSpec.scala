package graft

import graft.table.ManagedTable
import org.apache.spark.sql.functions._

/** Column mapping: RENAME/DROP COLUMN as metadata-only commits (Delta
  * column-mapping analogue) — logical names live in the commit log,
  * physical names live in the parquet files, zero rewrites. */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(prefix: String): (String, ManagedTable) = {
    val path = tmpDir(prefix)
    val t = ManagedTable(spark, path)
    t.write((1 to 10).map(i => (i, s"v$i", i * 10.0)).toDF("id", "name", "score"),
      "APPEND", "append")
    (path, t)
  }

  test("rename is metadata-only: no dirs touched, physical file name unchanged") {
    val (_, t) = freshTable("cm_basic")
    val before = t.lastCommit.get
    val c = t.renameColumn("name", "title")
    assert(c.dirs === before.dirs, "rename must not touch data dirs")
    assert(c.columnMap === Map("title" -> "name"))
    assert(t.read.columns.toSeq === Seq("id", "title", "score"))
    assert(t.read.select("title").as[String].collect().sorted.head === "v1")
    // the parquet on disk still carries the physical name
    val raw = spark.read.parquet(before.dirs.head)
    assert(raw.columns.contains("name") && !raw.columns.contains("title"))
  }

  test("appends after a rename keep one uniform physical naming") {
    val (_, t) = freshTable("cm_append")
    t.renameColumn("name", "title")
    t.write((11 to 20).map(i => (i, s"v$i", i * 10.0)).toDF("id", "title", "score"),
      "APPEND", "append")
    assert(t.read.count() === 20)
    assert(t.read.filter(col("title") === "v15").count() === 1)
    // the new dir's files carry the PHYSICAL name too
    val newDir = t.lastCommit.get.dirs.last
    assert(spark.read.parquet(newDir).columns.contains("name"))
    // a second rename composes (title -> label, physical still "name")
    t.renameColumn("title", "label")
    assert(t.lastCommit.get.columnMap === Map("label" -> "name"))
    assert(t.read.filter(col("label") === "v3").count() === 1)
  }

  test("time travel reads each version under its own logical names") {
    val (_, t) = freshTable("cm_tt")
    val v0 = t.lastCommit.get.version
    t.renameColumn("score", "rating")
    assert(t.readAt(v0).columns.toSeq === Seq("id", "name", "score"))
    assert(t.read.columns.toSeq === Seq("id", "name", "rating"))
    assert(t.readAt(v0).agg(sum("score")).head.getDouble(0) ===
      t.read.agg(sum("rating")).head.getDouble(0))
  }

  test("DML and data skipping work under the logical names; stats re-key") {
    val (_, t) = freshTable("cm_dml")
    t.renameColumn("score", "rating")
    // stats were recorded under "score" at write time and re-keyed
    assert(t.lastCommit.get.dirStats.values.head.keySet.contains("rating"))
    assert(t.readWhere(col("rating") > 50.0).count() === 5)
    t.delete(col("rating") === 100.0)
    assert(t.read.count() === 9)
    t.update(Map("rating" -> (col("rating") * 2)), col("id") === 1)
    assert(t.read.filter(col("id") === 1).select("rating").head.getDouble(0) === 20.0)
  }

  test("re-adding a renamed-away logical name must not resurrect old bytes") {
    val (_, t) = freshTable("cm_resurrect")
    t.renameColumn("name", "title")
    // evolve: a NEW column whose logical name collides with the in-use
    // physical name "name" — must get a fresh physical name
    t.write(Seq((11, "v11", 110.0, "fresh")).toDF("id", "title", "score", "name"),
      "APPEND", "append", mergeSchema = true)
    val m = t.lastCommit.get.columnMap
    assert(m("title") === "name")
    assert(m.contains("name") && m("name") != "name",
      s"colliding new column needs a generated physical name, got $m")
    val rows = t.read.select("id", "title", "name").collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rows(11) === ("v11", "fresh"))
    assert(rows(3) === ("v3", null),
      "old dirs must read the NEW 'name' column as NULL, not the old bytes")
  }

  test("dropColumn hides the bytes; re-add reads NULL for old dirs") {
    val (_, t) = freshTable("cm_drop")
    val c = t.dropColumn("name")
    assert(c.dirs === t.commitAt(0L).dirs, "drop must not touch data dirs")
    assert(t.read.columns.toSeq === Seq("id", "score"))
    // tombstone reserves the physical name
    assert(c.columnMap.exists { case (k, v) =>
      k.startsWith("__graft_dropped_") && v == "name" })
    t.write(Seq((11, 110.0, "anew")).toDF("id", "score", "name"),
      "APPEND", "append", mergeSchema = true)
    val byId = t.read.select("id", "name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(byId(11) === "anew")
    assert(byId(2) === null, "dropped bytes resurrected through re-added name")
  }

  test("a full replace materializes logical names and clears the mapping") {
    val (_, t) = freshTable("cm_replace")
    t.renameColumn("name", "title")
    t.write(t.read, "OVERWRITE", "replace")
    assert(t.lastCommit.get.columnMap === Map.empty)
    assert(spark.read.parquet(t.lastCommit.get.dirs.head).columns.contains("title"))
    assert(t.read.filter(col("title") === "v7").count() === 1)
  }

  test("compaction under a mapping preserves the physical naming") {
    val (_, t) = freshTable("cm_compact")
    t.renameColumn("name", "title")
    t.write((11 to 15).map(i => (i, s"v$i", i * 10.0)).toDF("id", "title", "score"),
      "APPEND", "append")
    val c = t.compactDirs(maxDirBytes = 1L << 30)
    assert(c.isDefined)
    assert(t.read.count() === 15)
    assert(t.read.filter(col("title") === "v12").count() === 1)
    // folded output keeps physical names (the map still governs reads)
    assert(spark.read.parquet(t.lastCommit.get.dirs.last).columns.contains("name"))
  }

  test("deletion vectors compose with a mapping") {
    val (_, t) = freshTable("cm_dv")
    t.deleteVectors(col("score") === 30.0)
    t.renameColumn("score", "rating")
    assert(t.read.count() === 9)
    t.deleteVectors(col("rating") === 40.0)
    assert(t.read.select("id").as[Int].collect().sorted.toSeq ===
      (1 to 10).filterNot(i => i == 3 || i == 4))
  }

  test("refusals: partition columns, CDF across the rename, manifest export") {
    val path = tmpDir("cm_refuse")
    val t = ManagedTable(spark, path)
    t.write((1 to 6).map(i => (i, s"p${i % 2}")).toDF("id", "p"),
      "APPEND", "append", partitionBy = Seq("p"))
    val e1 = intercept[IllegalArgumentException](t.renameColumn("p", "q"))
    assert(e1.getMessage.contains("partition column"))
    val rv = t.renameColumn("id", "key").version
    val e2 = intercept[IllegalStateException](
      t.readChangeFeed(0L, Some(rv)).count())
    assert(e2.getMessage.contains("column mapping"))
    // ranges on either side still serve
    assert(t.readChangeFeed(0L, Some(rv - 1)).count() === 6)
    val e3 = intercept[IllegalArgumentException](
      t.exportManifest(tmpDir("cm_refuse_m")))
    assert(e3.getMessage.contains("column mapping"))
  }

  test("mapped entries stamp reader protocol 3; clone and restore carry the map") {
    val (path, t) = freshTable("cm_proto")
    val c = t.renameColumn("name", "title")
    val entry = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(s"$path/_graft_log", f"${c.version}%012d.json").toPath))
    assert(entry.contains("\"minReaderVersion\" : 3"))
    val cloneRoot = tmpDir("cm_proto_clone")
    t.cloneTo(cloneRoot)
    assert(ManagedTable(spark, cloneRoot).read.columns.contains("title"))
    t.restore(0L)
    assert(t.read.columns.toSeq === Seq("id", "name", "score"))
    assert(t.lastCommit.get.columnMap === Map.empty)
  }

  test("commit json round-trips the column map") {
    val c = ManagedTable.Commit(3L, "RENAME COLUMN(a -> b)", 123L, Seq("/a"),
      Map.empty, None, "`b` INT", 2L, columnMap = Map("b" -> "a"))
    assert(ManagedTable.Commit.fromJson(c.toJson) === c)
  }
}
