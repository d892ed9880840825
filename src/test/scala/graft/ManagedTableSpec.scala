package graft

import graft.table.ManagedTable
import org.apache.spark.sql.types._

/** Versioned parquet table layer (Delta-history-lite, reference
  * core/utils/delta.py:134-168). */
class ManagedTableSpec extends SparkSpec {
  import spark.implicits._

  test("append mode composes dirs; replace swaps the snapshot") {
    val path = tmpDir("mt")
    val t = ManagedTable(spark, path)
    t.write(Seq((1, "a")).toDF("id", "v"), "APPEND", "append")
    t.write(Seq((2, "b")).toDF("id", "v"), "APPEND", "append")
    assert(t.read.count() === 2)
    assert(t.lastCommit.get.dirs.size === 2)
    t.write(Seq((9, "z")).toDF("id", "v"), "OVERWRITE", "replace")
    assert(t.read.as[(Int, String)].collect().toSeq === Seq((9, "z")))
    assert(t.lastCommit.get.dirs.size === 1)
  }

  test("history is newest-first with operation + metrics + user metadata") {
    val path = tmpDir("mt_hist")
    val t = ManagedTable(spark, path)
    t.write(Seq(1).toDF("id"), "APPEND", "append", userMetadata = Some("""{"batch":"b1"}"""))
    t.write(Seq(2).toDF("id"), "OVERWRITE", "replace")
    val h = t.history
    assert(h.map(_.operation) === Seq("OVERWRITE", "APPEND"))
    assert(h.map(_.version) === Seq(1L, 0L))
    assert(h(1).userMetadata === Some("""{"batch":"b1"}"""))
    assert(h(0).operationMetrics("numOutputRows") === "1")
    assert(h(0).readVersion === 0L)
  }

  test("createIfNotExists bootstraps an empty readable snapshot; idempotent") {
    val path = tmpDir("mt_create")
    val t = ManagedTable(spark, path)
    val schema = StructType(Seq(StructField("id", IntegerType), StructField("v", StringType)))
    t.createIfNotExists(schema)
    t.createIfNotExists(schema) // no-op
    assert(t.read.count() === 0)
    assert(t.read.schema.fieldNames.toSeq === Seq("id", "v"))
    assert(t.latestVersion === Some(0L))
  }

  test("commit json round-trips") {
    val c = ManagedTable.Commit(3L, "MERGE(scd2)", 123L, Seq("/a", "/b"),
      Map("numOutputRows" -> "42"), Some("meta"), "`id` INT", 2L)
    assert(ManagedTable.Commit.fromJson(c.toJson) === c)
    val withCd = c.copy(changeDir = Some("/a/_change_data/x"))
    assert(ManagedTable.Commit.fromJson(withCd.toJson) === withCd)
  }

  test("readAt time-travels to any committed version") {
    val path = tmpDir("mt_tt")
    val t = ManagedTable(spark, path)
    t.write(Seq((1, "a")).toDF("id", "v"), "APPEND", "append")
    t.write(Seq((2, "b")).toDF("id", "v"), "APPEND", "append")
    t.write(Seq((9, "z")).toDF("id", "v"), "OVERWRITE", "replace")
    assert(t.readAt(0).as[(Int, String)].collect().toSeq === Seq((1, "a")))
    assert(t.readAt(1).as[(Int, String)].collect().sorted === Seq((1, "a"), (2, "b")))
    assert(t.readAt(2).as[(Int, String)].collect().toSeq === Seq((9, "z")))
    assert(t.read.collect() === t.readAt(2).collect())
  }

  test("change feed synthesizes insert/delete from the commit-log dir diff") {
    val path = tmpDir("mt_cdf_synth")
    val t = ManagedTable(spark, path)
    t.write(Seq((1, "a")).toDF("id", "v"), "APPEND", "append")
    t.write(Seq((2, "b")).toDF("id", "v"), "APPEND", "append")
    t.write(Seq((9, "z")).toDF("id", "v"), "OVERWRITE", "replace")

    val feed = t.readChangeFeed(0)
    val rows = feed.select("id", "v", "_change_type", "_commit_version")
      .as[(Int, String, String, Long)].collect().toSet
    assert(rows === Set(
      (1, "a", "insert", 0L),
      (2, "b", "insert", 1L),
      // overwrite: old dirs dropped -> deletes, new dir -> insert
      (1, "a", "delete", 2L), (2, "b", "delete", 2L), (9, "z", "insert", 2L)))

    // bounded range
    val v1 = t.readChangeFeed(1, Some(1)).select("id", "_change_type")
      .as[(Int, String)].collect().toSeq
    assert(v1 === Seq((2, "insert")))
  }

  test("change feed range validation and non-existent table fail") {
    val path = tmpDir("mt_cdf_bad")
    val t = ManagedTable(spark, path)
    intercept[IllegalStateException](t.readChangeFeed(0))
    t.write(Seq(1).toDF("id"), "APPEND", "append")
    intercept[IllegalArgumentException](t.readChangeFeed(0, Some(5)))
  }

  test("old versions remain readable after replace (MVCC-ish)") {
    val path = tmpDir("mt_mvcc")
    val t = ManagedTable(spark, path)
    t.write(Seq((1, "a")).toDF("id", "v"), "APPEND", "append")
    t.write(Seq((2, "b")).toDF("id", "v"), "OVERWRITE", "replace")
    val v0 = t.commitAt(0L)
    val old = spark.read.schema(StructType.fromDDL(v0.schemaDdl)).parquet(v0.dirs: _*)
    assert(old.as[(Int, String)].collect().toSeq === Seq((1, "a")))
  }
}
