package graft

import graft.meta.Meta
import graft.table.ManagedTable
import graft.write.{WriteOptions, Writers, WriteTableConstraintError}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end write-pattern semantics against the reference's fixture shape
  * (6-row id/name/offset table, tests/conftest.py:19-364; scenarios mirror
  * test_batch.py:43,207,337,480). */
class WritePatternsSpec extends SparkSpec {
  import spark.implicits._

  private val T0 = WriteOptions(now = Some("2026-01-01 00:00:00"))
  private val T1 = WriteOptions(now = Some("2026-02-01 00:00:00"))

  private def load0: DataFrame = Seq(
    (1, "one", 10), (2, "two", 20), (3, "three", 30),
    (4, "four", 40), (5, "five", 50), (6, "six", 60)).toDF("id", "name", "offset")

  /** id=2 changed, id=7 new, others unchanged (subset). */
  private def load1: DataFrame = Seq(
    (2, "two", 21), (3, "three", 30), (7, "seven", 70)).toDF("id", "name", "offset")

  // ------------------------------------------------------------- append

  test("append stamps valid_to and accumulates rows across loads") {
    val path = tmpDir("append")
    Writers.append(spark, path, load0, T0)
    Writers.append(spark, path, load1, T1)
    val t = ManagedTable(spark, path).read
    assert(t.count() === 9)
    assert(t.filter(col(Meta.ValidToTs).cast("string") === "2026-01-01 00:00:00").count() === 6)
    val history = ManagedTable(spark, path).history
    assert(history.map(_.version) === Seq(1L, 0L))
  }

  test("overwrite replaces the snapshot") {
    val path = tmpDir("overwrite")
    Writers.overwrite(spark, path, load0, T0)
    Writers.overwrite(spark, path, load1, T1)
    val t = ManagedTable(spark, path).read
    assert(t.count() === 3)
    assert(t.select("id").as[Int].collect().toSet === Set(2, 3, 7))
  }

  // --------------------------------------------------------------- scd1

  test("scd1: updates changed rows, inserts new, keeps unchanged") {
    val path = tmpDir("scd1")
    Writers.scd1(spark, path, load0, Seq("id"), T0)
    Writers.scd1(spark, path, load1, Seq("id"), T1)
    val t = ManagedTable(spark, path).read
    assert(t.count() === 7)
    // changed row got new value + T1 valid_to
    val r2 = t.filter($"id" === 2).collect()(0)
    assert(r2.getAs[Int]("offset") === 21)
    assert(r2.getAs[java.sql.Timestamp](Meta.ValidToTs).toString.startsWith("2026-02-01"))
    // unchanged matched row kept T0
    val r3 = t.filter($"id" === 3).collect()(0)
    assert(r3.getAs[java.sql.Timestamp](Meta.ValidToTs).toString.startsWith("2026-01-01"))
    // insert got T1 valid_from
    val r7 = t.filter($"id" === 7).collect()(0)
    assert(r7.getAs[java.sql.Timestamp](Meta.ValidFromTs).toString.startsWith("2026-02-01"))
  }

  test("scd1 with enable_change_data_feed records merge change rows (delta_source.py:198-250)") {
    val path = tmpDir("scd1_cdf")
    val cdf0 = T0.copy(enableChangeDataFeed = true)
    val cdf1 = T1.copy(enableChangeDataFeed = true)
    Writers.scd1(spark, path, load0, Seq("id"), cdf0)
    Writers.scd1(spark, path, load1, Seq("id"), cdf1)
    val t = ManagedTable(spark, path)

    // load1 vs load0: id=2 updated, id=7 inserted, id=3 matched-unchanged
    val last = t.readChangeFeed(t.latestVersion.get)
    val byType = last.groupBy("_change_type").count().as[(String, Long)]
      .collect().toMap
    assert(byType === Map("insert" -> 1L, "update_preimage" -> 1L,
      "update_postimage" -> 1L))
    val post = last.filter($"_change_type" === "update_postimage").collect()(0)
    assert(post.getAs[Int]("id") === 2 && post.getAs[Int]("offset") === 21)
    val pre = last.filter($"_change_type" === "update_preimage").collect()(0)
    assert(pre.getAs[Int]("id") === 2 && pre.getAs[Int]("offset") === 20)
    assert(last.filter($"_change_type" === "insert").collect()(0).getAs[Int]("id") === 7)

    // snapshot itself carries no tracking columns
    assert(!t.read.columns.contains("_change_type"))
  }

  test("merge without change data feed cannot serve a change feed read") {
    val path = tmpDir("scd1_nocdf")
    Writers.scd1(spark, path, load0, Seq("id"), T0)
    Writers.scd1(spark, path, load1, Seq("id"), T1)
    val t = ManagedTable(spark, path)
    val ex = intercept[IllegalStateException](
      t.readChangeFeed(t.latestVersion.get).collect())
    assert(ex.getMessage.contains("enable_change_data_feed"))
  }

  test("scd1 is idempotent: double-apply leaves one row per key (test_batch.py:207)") {
    val path = tmpDir("scd1_idem")
    Writers.scd1(spark, path, load0, Seq("id"), T0)
    Writers.scd1(spark, path, load1, Seq("id"), T1)
    val before = ManagedTable(spark, path).read.orderBy("id").collect().toSeq
    Writers.scd1(spark, path, load1, Seq("id"), T1)
    val after = ManagedTable(spark, path).read.orderBy("id").collect().toSeq
    assert(after === before)
    val t = ManagedTable(spark, path).read
    assert(t.groupBy("id").count().filter($"count" > 1).count() === 0)
  }

  test("scd1 deduplicateOnKeys collapses duplicate source keys") {
    val path = tmpDir("scd1_dupe")
    val dupes = load1.unionByName(load1)
    Writers.scd1(spark, path, dupes, Seq("id"),
      T0.copy(deduplicateOnKeys = true))
    assert(ManagedTable(spark, path).read.count() === 3)
  }

  // --------------------------------------------------------------- scd2

  private def scd2Invariants(t: DataFrame): Unit = {
    // exactly one active row per key
    val perKey = t.groupBy(Meta.KeyHash)
      .agg(sum(when(col(Meta.Active) === "Y", 1).otherwise(0)).as("n_active"))
    assert(perKey.filter($"n_active" =!= 1).count() === 0)
    // active rows carry the high-date sentinel
    assert(t.filter(col(Meta.Active) === "Y" &&
      col(Meta.ValidToTs).cast("string") =!= "9999-12-31 00:00:00").count() === 0)
    // chains contiguous: every closed row's valid_to equals some later row's valid_from
    val closed = t.filter(col(Meta.Active) === "N")
      .select(col(Meta.KeyHash), col(Meta.ValidToTs).as("vt"))
    val opens = t.select(col(Meta.KeyHash), col(Meta.ValidFromTs).as("vf"))
    val dangling = closed.join(opens,
      closed(Meta.KeyHash) === opens(Meta.KeyHash) && $"vt" === $"vf", "left_anti")
    assert(dangling.count() === 0)
  }

  test("scd2: initial load is all-active; change closes old and inserts new version") {
    val path = tmpDir("scd2")
    Writers.scd2(spark, path, load0, Seq("id"), T0)
    val t0 = ManagedTable(spark, path).read
    assert(t0.count() === 6 && t0.filter(col(Meta.Active) === "Y").count() === 6)

    Writers.scd2(spark, path, load1, Seq("id"), T1)
    val t1 = ManagedTable(spark, path).read
    assert(t1.count() === 8) // 6 original + 1 new version of id=2 + 1 new id=7
    scd2Invariants(t1)
    val v2 = t1.filter($"id" === 2).orderBy(col(Meta.ValidFromTs))
      .select($"offset", col(Meta.Active)).as[(Int, String)].collect().toSeq
    assert(v2 === Seq((20, "N"), (21, "Y")))
  }

  test("scd2 is idempotent on re-apply of the same load") {
    val path = tmpDir("scd2_idem")
    Writers.scd2(spark, path, load0, Seq("id"), T0)
    Writers.scd2(spark, path, load1, Seq("id"), T1)
    val before = ManagedTable(spark, path).read.count()
    Writers.scd2(spark, path, load1, Seq("id"), T1)
    assert(ManagedTable(spark, path).read.count() === before)
    scd2Invariants(ManagedTable(spark, path).read)
  }

  test("scd2 excludeDataColumns: excluded-col-only change closes the row (reference semantics)") {
    val path = tmpDir("scd2_excl")
    val opts0 = T0.copy(excludeDataColumns = Seq("offset"))
    Writers.scd2(spark, path, load0, Seq("id"), opts0)
    // only the excluded col changes → flag U. Reference semantics
    // (write.py:962-969): U rows carry merge_key=key_hash so they match and
    // CLOSE the active row, but only UI/I rows insert — so the key ends
    // with zero active rows. Untested upstream but it is what the code does;
    // we match it exactly.
    val refreshed = load0.withColumn("offset", $"offset" + 1)
    Writers.scd2(spark, path, refreshed, Seq("id"),
      T1.copy(excludeDataColumns = Seq("offset")))
    val t = ManagedTable(spark, path).read
    assert(t.count() === 6)
    assert(t.filter(col(Meta.Active) === "Y").count() === 0)
    assert(t.filter(col(Meta.ValidToTs).cast("string") =!= "2026-02-01 00:00:00").count() === 0)
  }

  test("scd2 history_tracking_col drives valid_from") {
    val path = tmpDir("scd2_hist")
    val src = load0.withColumn("change_ts", to_timestamp(lit("2025-06-15 12:00:00")))
    Writers.scd2(spark, path, src, Seq("id"),
      T0.copy(historyTrackingCol = Some("change_ts")))
    val t = ManagedTable(spark, path).read
    assert(t.filter(col(Meta.ValidFromTs).cast("string") =!= "2025-06-15 12:00:00").count() === 0)
  }

  test("scd2 active_record_value_mapping remaps flag values") {
    val path = tmpDir("scd2_map")
    val opts = T0.copy(activeRecordValueMapping = Map("Y" -> "1", "N" -> "0"))
    Writers.scd2(spark, path, load0, Seq("id"), opts)
    Writers.scd2(spark, path, load1, Seq("id"),
      T1.copy(activeRecordValueMapping = Map("Y" -> "1", "N" -> "0")))
    val t = ManagedTable(spark, path).read
    assert(t.select(Meta.Active).distinct().as[String].collect().toSet === Set("1", "0"))
  }

  // --------------------------------------------------------------- scd3

  test("scd3: tracked column change shifts current into prev_") {
    val path = tmpDir("scd3")
    Writers.scd3(spark, path, load0, Seq("id"), Seq("name"), T0)
    val renamed = Seq((2, "TWO", 20), (7, "seven", 70)).toDF("id", "name", "offset")
    Writers.scd3(spark, path, renamed, Seq("id"), Seq("name"), T1)
    val t = ManagedTable(spark, path).read
    assert(t.count() === 7)
    val r2 = t.filter($"id" === 2).collect()(0)
    assert(r2.getAs[String]("name") === "TWO")
    assert(r2.getAs[String]("prev_name") === "two")
    // data-only change (no column-key change) leaves prev_ null
    val r7 = t.filter($"id" === 7).collect()(0)
    assert(r7.isNullAt(r7.fieldIndex("prev_name")))
  }

  test("scd3: second rename shifts again (prev holds immediately-prior value)") {
    val path = tmpDir("scd3_again")
    Writers.scd3(spark, path, load0, Seq("id"), Seq("name"), T0)
    Writers.scd3(spark, path, Seq((2, "TWO", 20)).toDF("id", "name", "offset"),
      Seq("id"), Seq("name"), T1)
    Writers.scd3(spark, path, Seq((2, "dos", 20)).toDF("id", "name", "offset"),
      Seq("id"), Seq("name"), WriteOptions(now = Some("2026-03-01 00:00:00")))
    val r2 = ManagedTable(spark, path).read.filter($"id" === 2).collect()(0)
    assert(r2.getAs[String]("name") === "dos")
    assert(r2.getAs[String]("prev_name") === "TWO")
  }

  // ---------------------------------------------------------- constraint

  test("tableConstraint passes when all rows covered, throws otherwise") {
    val refTable = Seq(1, 2, 3, 4, 5, 6, 7).toDF("id")
    Writers.tableConstraint(load0, "t", Seq((refTable, Seq("id"))))
    val small = Seq(1, 2).toDF("id")
    assertThrows[WriteTableConstraintError] {
      Writers.tableConstraint(load0, "t", Seq((small, Seq("id"))))
    }
  }

  // ------------------------------------------------------ rename metadata

  test("rename_metadata_columns applies across a write pattern") {
    val path = tmpDir("rename")
    val opts = T0.copy(renameMetadataColumns = Map(
      Meta.KeyHash -> "kh", Meta.DataHash -> "dh",
      Meta.ValidToTs -> "vt", Meta.ValidFromTs -> "vf"))
    Writers.scd1(spark, path, load0, Seq("id"), opts)
    val cols = ManagedTable(spark, path).read.columns.toSet
    assert(Set("kh", "dh", "vt", "vf").subsetOf(cols))
    assert(!cols.contains(Meta.KeyHash))
  }

  // ---------------------------------------------- merge-condition extras

  test("useKeyAttributesInMerge: null-safe <=> conjuncts still match null keys") {
    val path = tmpDir("scd1_nullsafe")
    val withNull = Seq((Some(1), "one", 10), (None, "nokey", 20))
      .toDF("id", "name", "offset")
    Writers.scd1(spark, path, withNull, Seq("id"),
      T0.copy(useKeyAttributesInMerge = true))
    // same load again: null-keyed row must MATCH (via <=>), not duplicate
    Writers.scd1(spark, path, withNull, Seq("id"),
      T1.copy(useKeyAttributesInMerge = true))
    val t = ManagedTable(spark, path).read
    assert(t.count() === 2)
    assert(t.filter(col("id").isNull).count() === 1)
  }

  test("usePartitionColumnInMerge scopes updates to matching partition values") {
    val path = tmpDir("scd1_partcond")
    val load0p = load0.withColumn("region", expr("id % 2"))
    Writers.scd1(spark, path, load0p, Seq("id"),
      T0.copy(usePartitionColumnInMerge = Seq("region")))
    // change id=2's offset, same region value -> plain update, count stable
    val change = Seq((2, "two", 99)).toDF("id", "name", "offset")
      .withColumn("region", expr("id % 2"))
    Writers.scd1(spark, path, change, Seq("id"),
      T1.copy(usePartitionColumnInMerge = Seq("region")))
    val t = ManagedTable(spark, path).read
    assert(t.count() === 6)
    assert(t.filter(col("id") === 2).select("offset").collect()(0).getInt(0) === 99)
  }

  test("generated_cols survive the merge's target-schema projection") {
    val path = tmpDir("scd1_gencol")
    val opts = T0.copy(generatedCols = Seq(("name_upper", "upper(name)")))
    Writers.scd1(spark, path, load0, Seq("id"), opts)
    val t = ManagedTable(spark, path).read
    assert(t.columns.contains("name_upper"))
    assert(t.filter($"id" === 1).select("name_upper").as[String].head() === "ONE")
    // second load keeps the column populated for updates and inserts
    Writers.scd1(spark, path, load1, Seq("id"),
      T1.copy(generatedCols = Seq(("name_upper", "upper(name)"))))
    val t2 = ManagedTable(spark, path).read
    assert(t2.filter($"id" === 7).select("name_upper").as[String].head() === "SEVEN")
  }

  test("scd2 fixDuplicatesByKey: multi-version batch chains history (write.py:868-960)") {
    val path = tmpDir("scd2_fixdup")
    // one batch carrying three versions of key 1 + a same-data duplicate
    val batch = Seq(
      (1, "v1", 10, "2026-01-01 00:00:00"),
      (1, "v2", 11, "2026-01-02 00:00:00"),
      (1, "v2", 11, "2026-01-03 00:00:00"), // consecutive same-data -> dropped
      (1, "v3", 12, "2026-01-04 00:00:00"),
      (2, "w1", 20, "2026-01-01 00:00:00"))
      .toDF("id", "name", "offset", "ts")
      .withColumn("change_ts", to_timestamp($"ts")).drop("ts")
    val opts = T0.copy(historyTrackingCol = Some("change_ts"),
      fixDuplicatesByKey = true)
    Writers.scd2(spark, path, batch, Seq("id"), opts)
    val t = ManagedTable(spark, path).read
    // key 1: three distinct versions, chained; key 2: one active row
    val k1 = t.filter($"id" === 1).orderBy(col(Meta.ValidFromTs))
      .select($"name", col(Meta.ValidFromTs).cast("string"),
        col(Meta.ValidToTs).cast("string"), col(Meta.Active))
      .as[(String, String, String, String)].collect().toSeq
    assert(k1.map(_._1) === Seq("v1", "v2", "v3"))
    assert(k1(0)._3 === k1(1)._2) // v1.valid_to == v2.valid_from
    assert(k1(1)._3 === k1(2)._2)
    assert(k1.map(_._4) === Seq("N", "N", "Y"))
    assert(k1(2)._3 === "9999-12-31 00:00:00")
    assert(t.filter($"id" === 2 && col(Meta.Active) === "Y").count() === 1)
  }

  test("scd3 changeTracking column flags changed rows with the default value") {
    val path = tmpDir("scd3_ct")
    val src0 = load0.withColumn("chg", lit("none"))
    Writers.scd3(spark, path, src0, Seq("id"), Seq("name"), T0)
    val src1 = Seq((2, "TWO", 20, "none"), (3, "three", 30, "none"))
      .toDF("id", "name", "offset", "chg")
    Writers.scd3(spark, path, src1, Seq("id"), Seq("name"), T1,
      changeTracking = Some(("chg", Seq("name"), "renamed")))
    val t = ManagedTable(spark, path).read
    assert(t.filter($"id" === 2).select("chg").as[String].head() === "renamed")
    assert(t.filter($"id" === 3).select("chg").as[String].head() === "none")
  }
}
