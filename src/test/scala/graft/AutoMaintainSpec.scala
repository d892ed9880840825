package graft

import graft.table._
import org.apache.spark.sql.functions._

/** Layout maintenance as POLICY ([[ManagedTable.maintainLayoutIfNeeded]],
  * [[StandingView.maintainIfNeeded]], `CALL graft.maintain_auto`): the
  * WHEN of compaction/DV-purge decided from the head commit alone — a
  * continuous fold loop accrues ~2 read-overhead dirs per fold, and the
  * zero-IO debt check is what makes asking after EVERY fold affordable. */
class AutoMaintainSpec extends SparkSpec {
  import spark.implicits._

  private def frag(prefix: String, appends: Int = 5): (String, ManagedTable) = {
    val path = tmpDir(prefix)
    val t = ManagedTable(spark, path)
    (0 until appends).foreach { a =>
      t.write((1 to 10).map(i => (a * 10 + i, s"v$i")).toDF("id", "v"),
        "APPEND", "append")
    }
    (path, t)
  }

  test("maintenanceDebt prices the head commit: no listings, no data scans") {
    val (_, t) = frag("amd_debt")
    t.deleteVectors(col("id") % 7 === 0)
    ManagedTable.logEntryReads.set(0L)
    ManagedTable.logListings.set(0L)
    val d = t.maintenanceDebt()
    assert(d.smallDirs === 5, "five tiny append dirs are all under 64 MiB")
    assert(d.dvDirs === 1)
    assert(ManagedTable.logListings.get === 0L,
      "the debt check must ride the log pointers, never a listing")
    assert(ManagedTable.logEntryReads.get <= ManagedTable.LogSnapshotInterval.toLong,
      "the debt check is a head-commit resolve, not a history walk — " +
        s"read ${ManagedTable.logEntryReads.get} entries")
  }

  test("maintainLayoutIfNeeded: below thresholds lands NOTHING, past them " +
      "folds debt without changing content") {
    val (_, t) = frag("amd_iff")
    t.deleteVectors(col("id") % 7 === 0)
    val before = t.read.collect().toSet
    val v0 = t.latestVersion.get
    assert(t.maintainLayoutIfNeeded(minSmallDirs = 16, minDvDirs = 8).isEmpty)
    assert(t.latestVersion.get === v0, "a below-threshold check commits nothing")
    val landed = t.maintainLayoutIfNeeded(minSmallDirs = 3, minDvDirs = 8)
    assert(landed.nonEmpty, "5 small dirs >= 3 must trigger the fold")
    val head = t.lastCommit.get
    assert(head.dirs.size < 5, "small dirs folded")
    assert(head.dvDirs.isEmpty, "tombstones materialized by the purge")
    assert(t.read.collect().toSet === before, "maintenance never edits content")
    // debt paid: the same thresholds are now quiet
    assert(t.maintainLayoutIfNeeded(minSmallDirs = 3, minDvDirs = 8).isEmpty)
  }

  test("dv-dir threshold alone triggers (churn-heavy, append-light states)") {
    val path = tmpDir("amd_dv")
    val t = ManagedTable(spark, path)
    t.write((1 to 200).map(i => (i, s"v$i")).toDF("id", "v"), "APPEND", "append")
    (0 until 3).foreach(k => t.deleteVectors(col("id") === k * 10 + 1))
    assert(t.maintenanceDebt().dvDirs === 3)
    val landed = t.maintainLayoutIfNeeded(minSmallDirs = 100, minDvDirs = 2)
    assert(landed.nonEmpty && t.lastCommit.get.dvDirs.isEmpty)
    assert(t.read.count() === 197)
  }

  test("grid tables: only the unclustered TAIL is foldable debt — small " +
      "bucket dirs never re-trigger the policy") {
    val path = tmpDir("amd_grid")
    val t = ManagedTable(spark, path)
    t.write((1 to 400).map(i => (i, s"v$i")).toDF("id", "v"), "APPEND", "append")
    t.clusterBy("id", 8)
    assert(t.maintenanceDebt().smallDirs === 0,
      "8 small BUCKET dirs are irreducible below the bucket count — " +
        "counting them would make a clustered mart trigger forever")
    (1 to 3).foreach(k => t.write(Seq((400 + k, s"v$k")).toDF("id", "v"),
      "APPEND", "append"))
    assert(t.maintenanceDebt().smallDirs === 3, "the append tail IS debt")
    val landed = t.maintainLayoutIfNeeded(minSmallDirs = 3, minDvDirs = 8)
    assert(landed.nonEmpty, "the tail folds onto the grid")
    assert(t.maintenanceDebt().smallDirs === 0,
      "debt paid: the folded tail landed inside bucket dirs")
    assert(t.read.count() === 403)
  }

  test("thresholds that would fire on unimprovable states are refused") {
    val (_, t) = frag("amd_guard", appends = 1)
    intercept[IllegalArgumentException] {
      t.maintainLayoutIfNeeded(minSmallDirs = 1)
    }
    intercept[IllegalArgumentException] {
      t.maintainLayoutIfNeeded(minDvDirs = 0)
    }
  }

  test("view maintainIfNeeded folds state debt; watermark walks and " +
      "content see straight through") {
    val src = tmpDir("amd_vsrc")
    val st = tmpDir("amd_vst")
    val t = ManagedTable(spark, src)
    t.write((1 to 40).map(i => (i.toLong, s"doc $i text ${i % 5}"))
      .toDF("doc_id", "text"), "APPEND", "append")
    val view = new Bm25IndexView(spark, src, st, expectedDocs = 1000)
    view.initialize()
    (1 to 4).foreach { k =>
      t.write(Seq((40L + k, s"fresh doc $k")).toDF("doc_id", "text"),
        "APPEND", "append")
      view.refresh()
    }
    val wm = view.sourceVersion
    val before = view.read.collect().toSet
    val landed = view.maintainIfNeeded(minSmallDirs = 3, minDvDirs = 8)
    assert(landed.nonEmpty, "4 one-dir folds + init accrue past 3 small dirs")
    assert(view.sourceVersion === wm,
      "maintenance commits are watermark-less — the walk is unchanged")
    assert(view.read.collect().toSet === before)
  }

  test("refreshAll(autoMaintain) keeps a fold loop's dir count bounded") {
    val src = tmpDir("amd_osrc")
    val t = ManagedTable(spark, src)
    t.write((1 to 20).map(i => (i.toLong, s"doc $i body ${i % 3}"))
      .toDF("doc_id", "text"), "APPEND", "append")
    val stPath = tmpDir("amd_ost")
    val view = new Bm25IndexView(spark, src, stPath, expectedDocs = 1000)
    view.initialize()
    // 18 daily ticks: without maintenance the state would sit at ~19
    // append dirs; the default policy (16 small dirs) folds mid-loop
    (1 to 18).foreach { k =>
      t.write(Seq((100L + k, s"tick $k doc")).toDF("doc_id", "text"),
        "APPEND", "append")
      StandingViews.refreshAll(spark, Seq(view), autoMaintain = true)
    }
    val head = ManagedTable(spark, stPath).lastCommit.get
    assert(head.dirs.size < 18,
      s"auto-maintenance must fold the append tail, got ${head.dirs.size} dirs")
    assert(view.sourceVersion === t.latestVersion.get)
    // content still exact: the maintained index equals a from-scratch twin
    val twin = new Bm25IndexView(spark, src, tmpDir("amd_otwin"),
      expectedDocs = 1000)
    twin.initialize()
    assert(view.read.exceptAll(twin.read).isEmpty &&
      twin.read.exceptAll(view.read).isEmpty)
  }

  test("partitioned tables fold partition-scoped past the threshold " +
      "(compactDirs is unpartitioned-only)") {
    val path = tmpDir("amd_part")
    val t = ManagedTable(spark, path)
    (0 until 4).foreach { a =>
      t.write((1 to 20).map(i => (i, i % 2, s"v$i")).toDF("id", "p", "v"),
        "APPEND", "append", partitionBy = Seq("p"))
    }
    val before = t.read.collect().toSet
    assert(t.maintenanceDebt().smallDirs === 4)
    val landed = t.maintainLayoutIfNeeded(minSmallDirs = 3, minDvDirs = 8)
    assert(landed.nonEmpty && landed.last.operation.startsWith("OPTIMIZE"))
    assert(t.read.collect().toSet === before)
  }

  test("task outputs: auto_maintain bounds a load loop's fragmentation") {
    import graft.config.Config.OutputConf
    import graft.task.{SparkTask, TaskContext}
    val path = tmpDir("amd_task")
    val out = OutputConf(name = "sink", path = path, writeType = "scd1",
      keyAttributes = Seq("id"),
      options = Map("auto_maintain" -> "true"))
    val ctx = TaskContext(spark, "b1", None)
    // 18 loads: each merge adds a (small) result dir; the policy folds
    // at the default 16-small-dir threshold, so the sink never drifts
    // into the hundreds-of-tiny-files read shape
    (1 to 18).foreach { k =>
      SparkTask.writeOutput(ctx, out,
        Seq((k % 5, s"v$k", k)).toDF("id", "v", "load"))
    }
    val head = ManagedTable(spark, path).lastCommit.get
    assert(head.dirs.size < 18,
      s"auto_maintain must fold the load tail, got ${head.dirs.size} dirs")
    // content exact: last writer per key wins (scd1)
    val got = ManagedTable(spark, path).read
      .select(col("id"), col("load")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(got === Set((1, 16), (2, 17), (3, 18), (4, 14), (0, 15)))
  }

  test("CALL graft.maintain_auto on a PARTITIONED table takes the " +
      "partition-scoped fold (compactDirs is unpartitioned-only)") {
    val path = tmpDir("amd_sqlp")
    val t = ManagedTable(spark, path)
    (0 until 4).foreach { a =>
      t.write((1 to 20).map(i => (i, i % 2, s"v$i")).toDF("id", "p", "v"),
        "APPEND", "append", partitionBy = Seq("p"))
    }
    val before = t.read.collect().toSet
    val fired = spark.sql(
      s"CALL graft.maintain_auto('$path', ${64L << 20}, 3, 8)").head()
    assert(fired.getInt(2) === 1 && !fired.isNullAt(3))
    assert(fired.getString(3).contains("OPTIMIZE"),
      s"partitioned fold lands the OPTIMIZE analogue, got ${fired.getString(3)}")
    assert(t.read.collect().toSet === before)
  }

  test("CALL graft.maintain_auto reports debt and folds only past thresholds") {
    val (path, t) = frag("amd_sql")
    t.deleteVectors(col("id") % 9 === 0)
    val before = t.read.collect().toSet
    val quiet = spark.sql(
      s"CALL graft.maintain_auto('$path', ${64L << 20}, 16, 8)").collect()
    assert(quiet.length === 1)
    assert(quiet(0).getInt(0) === 5 && quiet(0).getInt(1) === 1)
    assert(quiet(0).getInt(2) === 0 && quiet(0).isNullAt(3),
      "below both thresholds: triggered 0, no operations")
    val fired = spark.sql(
      s"CALL graft.maintain_auto('$path', ${64L << 20}, 3, 8)").collect()
    assert(fired(0).getInt(2) === 1 && !fired(0).isNullAt(3))
    assert(fired(0).getString(3).contains("@"),
      s"operations must name landed commits, got ${fired(0).getString(3)}")
    assert(t.read.collect().toSet === before)
  }
}
