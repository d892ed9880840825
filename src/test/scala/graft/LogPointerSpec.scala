package graft

import graft.table.ManagedTable
import org.apache.hadoop.fs.Path

/** Advisory head/floor log pointers: version questions and watermark
  * walks stop listing the whole `_graft_log` directory. A once-a-second
  * micro-batch view accumulates ~31M commits/year, and every
  * `metaHistory` walk (per refresh, per search, per epoch) used to pay
  * a full directory listing of them; with the pointers a walk costs
  * O(existence probes). The pointers are ADVISORY: reads heal staleness
  * by probing actual entry files (retained versions are contiguous by
  * construction — commits append head+1, vacuum deletes an ascending
  * prefix), and a missing/corrupt pointer falls back to the listing,
  * never to a wrong answer. */
class LogPointerSpec extends SparkSpec {
  import spark.implicits._

  private def fsOf(path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writePtr(path: String, name: String, body: String): Unit = {
    val fs = fsOf(path)
    val out = fs.create(new Path(new Path(path, "_graft_log"), name), true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
  }

  /** A table whose log holds versions 0..n — one real write for
    * dirs/schema, then raw fabricated entries (no Spark job per
    * version). */
  private def fabricated(prefix: String, n: Long): (String, ManagedTable) = {
    val path = tmpDir(prefix)
    val t = ManagedTable(spark, path)
    t.write(Seq((1, "a")).toDF("id", "v"), "APPEND", "append")
    var prev = t.lastCommit.get
    (1L to n).foreach { v =>
      val c = prev.copy(version = v, readVersion = v - 1,
        timestampMs = prev.timestampMs + v, // strictly increasing
        userMetadata = Some(s"""{"n":$v}"""))
      t.writeCommit(c, Some(prev))
      prev = c
    }
    (path, t)
  }

  test("versionAsOf walks newest-first: a near-head timestamp lookup " +
      "reads O(one batch) of entries on a long history") {
    val (_, t) = fabricated("ptr_asof", 512L)
    val headTs = t.lastCommit.get.timestampMs
    ManagedTable.logEntryReads.set(0L)
    ManagedTable.logListings.set(0L)
    // "as of just before the newest commit" — resolves a version close
    // to the head without resolving the whole log
    assert(t.versionAsOf(headTs - 1) === 511L)
    assert(t.versionAsOf(headTs) === 512L)
    assert(ManagedTable.logListings.get === 0L)
    assert(ManagedTable.logEntryReads.get <=
      3L * ManagedTable.MetaWalkBatch,
      s"near-head versionAsOf must not read the whole 512-entry log, " +
        s"read ${ManagedTable.logEntryReads.get}")
    intercept[IllegalArgumentException](t.versionAsOf(0L))
  }

  test("version questions and watermark walks list the log dir ZERO " +
      "times at 2048 commits") {
    val (_, t) = fabricated("ptr_walk", 2048L)
    ManagedTable.logListings.set(0L)
    ManagedTable.logEntryReads.set(0L)
    assert(t.latestVersion.contains(2048L))
    assert(t.earliestVersion.contains(0L))
    // a walker that stops at its first match reads O(one batch) entries
    val newest = t.metaHistory.take(3).toSeq
    assert(newest.map(_.version) === Seq(2048L, 2047L, 2046L))
    assert(ManagedTable.logListings.get === 0L,
      "pointer-served walks must not list the log directory")
    assert(ManagedTable.logEntryReads.get <= ManagedTable.MetaWalkBatch.toLong,
      "a stop-at-head walk must read at most one entry batch")
  }

  test("a stale head pointer (lost race with a newer commit) heals by " +
      "probing up, still without a listing") {
    val (path, t) = fabricated("ptr_stale", 40L)
    writePtr(path, ManagedTable.HeadPtrFile, "37")
    ManagedTable.logListings.set(0L)
    assert(t.latestVersion.contains(40L))
    assert(ManagedTable.logListings.get === 0L)
  }

  test("corrupt or missing pointers fall back to the directory listing") {
    val (path, t) = fabricated("ptr_corrupt", 12L)
    writePtr(path, ManagedTable.HeadPtrFile, "not-a-number")
    ManagedTable.logListings.set(0L)
    assert(t.latestVersion.contains(12L))
    assert(ManagedTable.logListings.get >= 1L, "corrupt pointer → listing")
    val fs = fsOf(path)
    fs.delete(new Path(new Path(path, "_graft_log"),
      ManagedTable.HeadPtrFile), false)
    fs.delete(new Path(new Path(path, "_graft_log"),
      ManagedTable.FloorPtrFile), false)
    assert(t.latestVersion.contains(12L))
    assert(t.earliestVersion.contains(0L))
    // the next commit re-seeds both pointers (floor from a one-time listing)
    t.write(Seq((2, "b")).toDF("id", "v"), "APPEND", "append")
    ManagedTable.logListings.set(0L)
    assert(t.latestVersion.contains(13L))
    assert(t.earliestVersion.contains(0L))
    assert(ManagedTable.logListings.get === 0L,
      "pointers must be re-seeded by the next commit")
  }

  test("vacuum advances the floor pointer; the retained range stays " +
      "exact without a listing") {
    val (_, t) = fabricated("ptr_vacuum", 60L)
    val s = t.vacuum(5)
    assert(s.prunedVersions > 0)
    val earliest = t.earliestVersion.get
    // chain-base conservatism: the floor sits on a full-snapshot boundary
    assert(earliest % ManagedTable.LogSnapshotInterval.toLong === 0L)
    assert(earliest >= 60L - 5L - ManagedTable.LogSnapshotInterval.toLong)
    ManagedTable.logListings.set(0L)
    assert(t.latestVersion.contains(60L))
    assert(t.earliestVersion.contains(earliest))
    assert(t.metaHistory.map(_.version).toSeq ===
      (earliest to 60L).reverse)
    assert(ManagedTable.logListings.get === 0L)
    intercept[IllegalArgumentException](t.readAt(earliest - 1))
  }

  test("vacuum reports holds that trail the requested cut past the warn " +
      "threshold; sliding the pin clears the warning") {
    val (_, t) = fabricated("ptr_stale_hold", 110L)
    t.setRetentionHold("dead/view/state", 0L)
    val s = t.vacuum(1, dryRun = true)
    assert(s.prunedVersions === 0, "the hold clamps the whole cut")
    assert(s.staleHolds === Seq("dead/view/state" -> 0L),
      "a pin 109 versions behind the requested cut must be reported stale")
    // a live consumer's pin sits near the head — no warning
    t.setRetentionHold("dead/view/state", 100L)
    val s2 = t.vacuum(1, dryRun = true)
    assert(s2.staleHolds.isEmpty)
    assert(s2.prunedVersions > 0, "the slid pin releases history")
    // releasing entirely unclamps
    t.releaseRetentionHold("dead/view/state")
    assert(t.vacuum(1, dryRun = true).staleHolds.isEmpty)
  }

  test("a real write/delete/restore lifecycle keeps pointer-served " +
      "answers identical to the listing's") {
    val path = tmpDir("ptr_real")
    val t = ManagedTable(spark, path)
    (0 until 6).foreach(i =>
      t.write(Seq((i, s"v$i")).toDF("id", "v"), "APPEND", "append"))
    t.delete(org.apache.spark.sql.functions.col("id") === 2)
    t.restore(3L)
    val fs = fsOf(path)
    val listed = fs.listStatus(new Path(path, "_graft_log")).toSeq
      .map(_.getPath.getName).filter(_.endsWith(".json"))
      .map(_.stripSuffix(".json").toLong).sorted
    ManagedTable.logListings.set(0L)
    assert(t.latestVersion.contains(listed.max))
    assert(t.earliestVersion.contains(listed.min))
    assert(t.history.map(_.version) === listed.reverse)
    assert(ManagedTable.logListings.get === 0L)
    assert(t.read.count() === 4L, "restored snapshot reads through pointers")
  }
}
