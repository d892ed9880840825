package graft

import graft.streaming.StreamOps
import graft.table.ManagedTable
import graft.write.{WriteOptions, Writers}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

/** Streaming FROM a managed table (`format("graft-table")`, the Delta
  * streaming-source analogue): initial-snapshot backfill + O(new data)
  * append tail, exactly-once across restarts via version offsets,
  * loud failure on rewrite commits unless skipChangeCommits. */
class TableStreamSpec extends SparkSpec {
  import spark.implicits._

  private def append(path: String, ids: Range, v: String): Unit =
    ManagedTable(spark, path)
      .write(ids.map(i => (i, s"$v$i")).toDF("id", "v"), "APPEND", "append")

  private def seed(path: String, ids: Range, v: String): Unit =
    ManagedTable(spark, path)
      .write(ids.map(i => (i, s"$v$i")).toDF("id", "v"), "APPEND",
        if (ManagedTable(spark, path).exists) "append" else "replace")

  private def runOnce(path: String, ckpt: String, sink: String,
                      startingVersion: Option[Long] = None,
                      skipChangeCommits: Boolean = false,
                      maxVersionsPerTrigger: Option[Long] = None,
                      maxDirsPerTrigger: Option[Int] = None,
                      maxBytesPerTrigger: Option[Long] = None): Unit = {
    val q = StreamOps.streamTable(spark, path, startingVersion,
        skipChangeCommits, maxVersionsPerTrigger,
        maxDirsPerTrigger = maxDirsPerTrigger,
        maxBytesPerTrigger = maxBytesPerTrigger)
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    ()
  }

  private def sinkIds(sink: String): Seq[Int] =
    spark.read.parquet(sink).select($"id").as[Int].collect().sorted.toSeq

  test("initial snapshot backfill, then O(new data) tail across restarts") {
    val path = tmpDir("ts_tail"); val ckpt = tmpDir("ts_tail_ck")
    val sink = tmpDir("ts_tail_sink")
    seed(path, 0 until 10, "a")
    append(path, 10 until 20, "b")
    runOnce(path, ckpt, sink)
    assert(sinkIds(sink) === (0 until 20))
    // two more appends land; a restarted stream serves ONLY them
    append(path, 20 until 25, "c")
    append(path, 25 until 30, "d")
    runOnce(path, ckpt, sink)
    assert(sinkIds(sink) === (0 until 30), "tail appended exactly the new rows")
    // idle restart: nothing new, nothing duplicated
    runOnce(path, ckpt, sink)
    assert(sinkIds(sink) === (0 until 30))
  }

  test("startingVersion tails without the snapshot backfill") {
    val path = tmpDir("ts_sv"); val ckpt = tmpDir("ts_sv_ck")
    val sink = tmpDir("ts_sv_sink")
    seed(path, 0 until 10, "a")     // version 0
    append(path, 10 until 20, "b")  // version 1
    append(path, 20 until 30, "c")  // version 2
    runOnce(path, ckpt, sink, startingVersion = Some(2L))
    assert(sinkIds(sink) === (20 until 30), "only version 2's appended rows")
  }

  test("a rewrite commit fails the stream loudly; skipChangeCommits skips it") {
    val path = tmpDir("ts_chg"); val sink = tmpDir("ts_chg_sink")
    seed(path, 0 until 10, "a")
    val ckpt1 = tmpDir("ts_chg_ck1")
    runOnce(path, ckpt1, sink) // consume the snapshot
    ManagedTable(spark, path).write(
      (0 until 10).map(i => (i, s"z$i")).toDF("id", "v"), "OVERWRITE", "replace")
    append(path, 10 until 15, "b")
    val e = intercept[StreamingQueryException] { runOnce(path, ckpt1, sink) }
    assert(e.getCause.getMessage.contains("skipChangeCommits"),
      s"unexpected failure: ${e.getCause}")
    // same tail with skipChangeCommits: rewrite skipped, append served
    val ckpt2 = tmpDir("ts_chg_ck2"); val sink2 = tmpDir("ts_chg_sink2")
    runOnce(path, ckpt2, sink2) // snapshot (post-replace state)
    append(path, 15 until 18, "c")
    ManagedTable(spark, path).write(
      (0 until 5).map(i => (i, s"y$i")).toDF("id", "v"), "OVERWRITE", "replace")
    append(path, 18 until 21, "d")
    runOnce(path, ckpt2, sink2, skipChangeCommits = true)
    assert(sinkIds(sink2) === ((0 until 15) ++ (15 until 21)),
      "appends around the skipped rewrite are all served once")
  }

  test("maxVersionsPerTrigger bounds admission but completes the backlog") {
    val path = tmpDir("ts_adm"); val ckpt = tmpDir("ts_adm_ck")
    val sink = tmpDir("ts_adm_sink")
    seed(path, 0 until 5, "a")
    (1 until 6).foreach(i => append(path, i * 5 until (i + 1) * 5, "b"))
    // 6 versions; admission 2/trigger → AvailableNow drains in ≥3 batches
    val q = StreamOps.streamTable(spark, path, maxVersionsPerTrigger = Some(2L))
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    assert(sinkIds(sink) === (0 until 30))
  }

  test("readChangeFeed streams per-row changes: merge pre/postimages + append inserts") {
    val path = tmpDir("ts_cdf"); val ckpt = tmpDir("ts_cdf_ck")
    val sink = tmpDir("ts_cdf_sink")
    val opts = WriteOptions(now = Some("2026-01-05 00:00:00"),
      enableChangeDataFeed = true)
    Writers.scd1(spark, path,
      (0 until 10).map(i => (i, s"a$i")).toDF("id", "v"), Seq("id"), opts)
    val seedV = ManagedTable(spark, path).latestVersion.get
    def drain(): Unit = {
      val q = StreamOps.streamTable(spark, path, readChangeFeed = true)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      ()
    }
    // first drain pins the position as an EMPTY batch 0 (so a restart
    // tails from the first start, not from wherever the table is by then)
    drain()
    assert(spark.read.parquet(sink).count() === 0,
      "no change rows before any new commit")
    // one CDF merge (update id=1, insert id=100), one insert-only merge
    Writers.scd1(spark, path,
      Seq((1, "A1"), (100, "n100")).toDF("id", "v"), Seq("id"),
      opts.copy(now = Some("2026-01-06 00:00:00")))
    Writers.scd1(spark, path,
      (200 until 203).map(i => (i, s"z$i")).toDF("id", "v"), Seq("id"),
      opts.copy(now = Some("2026-01-07 00:00:00")))
    drain()
    val changes = spark.read.parquet(sink)
    val byType = changes.groupBy($"_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType.getOrElse("update_preimage", 0L) === 1)
    assert(byType.getOrElse("update_postimage", 0L) === 1)
    assert(byType.getOrElse("insert", 0L) === 4, s"got $byType") // 1 + 3
    assert(changes.filter($"_commit_version" <= seedV).count() === 0,
      "nothing before the stream start leaks in")
    // idle redrain: no duplicates
    drain()
    assert(spark.read.parquet(sink).count() === changes.count())
  }

  test("graft-table SINK: writeStream lands in a managed table exactly once") {
    val bronze = tmpDir("tsk_b"); val silver = tmpDir("tsk_s")
    val ckpt = tmpDir("tsk_ck")
    seed(bronze, 0 until 10, "a")
    def drain(): Unit = {
      val q = StreamOps.streamTable(spark, bronze)
        .writeStream.format("graft-table")
        .option("path", silver)
        .option("now", "2026-01-05 00:00:00")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      ()
    }
    drain()
    val t = ManagedTable(spark, silver)
    assert(t.read.count() === 10)
    append(bronze, 10 until 15, "b")
    drain()
    assert(t.read.count() === 15)
    // crash redelivery: replaying an already-committed batch id is a no-op
    val sink = new graft.streaming.TableStreamSink(spark.sqlContext, silver,
      Map("checkpointLocation" -> ckpt, "now" -> "2026-01-05 00:00:00"))
    val lastBatch = t.lastTxnVersion("graft-table-sink:" + ckpt).get
    sink.addBatch(lastBatch,
      org.apache.spark.sql.graft.StreamingFrame.mark(
        (99 until 102).map(i => (i, s"x$i")).toDF("id", "v")))
    assert(t.read.count() === 15, "replayed batch id was skipped")
  }

  test("graft-table SINK in scd1 mode merges each micro-batch on its keys") {
    val bronze = tmpDir("tsk1_b"); val silver = tmpDir("tsk1_s")
    val ckpt = tmpDir("tsk1_ck")
    seed(bronze, 0 until 5, "a")
    def drain(): Unit = {
      val q = StreamOps.streamTable(spark, bronze)
        .writeStream.format("graft-table")
        .option("path", silver)
        .option("writeType", "scd1").option("keys", "id")
        .option("now", "2026-01-05 00:00:00")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      ()
    }
    drain()
    // an upstream append with a CHANGED value for id=2 merges, not appends
    append(bronze, 2 until 3, "UPD")
    drain()
    val rows = ManagedTable(spark, silver).read
      .select($"id", $"v").as[(Int, String)].collect().toMap
    assert(rows.size === 5)
    assert(rows(2) === "UPD2")
  }

  test("graft-table SINK in Complete mode overwrites the aggregate each trigger") {
    val bronze = tmpDir("tsc_b"); val silver = tmpDir("tsc_s")
    val ckpt = tmpDir("tsc_ck")
    seed(bronze, 0 until 10, "a")
    def drain(): Unit = {
      val q = StreamOps.streamTable(spark, bronze)
        .groupBy(($"id" % 2 === 0).as("even")).count()
        .writeStream.format("graft-table")
        .outputMode("complete")
        .option("path", silver)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      ()
    }
    drain()
    val counts0 = ManagedTable(spark, silver).read
      .select($"even", $"count").as[(Boolean, Long)].collect().toMap
    assert(counts0 === Map(true -> 5L, false -> 5L))
    append(bronze, 10 until 13, "b")
    drain()
    // complete mode REPLACED the table: still two rows, updated counts
    val counts1 = ManagedTable(spark, silver).read
      .select($"even", $"count").as[(Boolean, Long)].collect().toMap
    assert(counts1 === Map(true -> 7L, false -> 6L))
  }

  test("initial snapshot backfill is served in bounded dir chunks, restartable mid-backfill") {
    val path = tmpDir("ts_bf"); val ckpt = tmpDir("ts_bf_ck")
    val sink = tmpDir("ts_bf_sink")
    // six appends → the snapshot composition has six dirs of five rows
    seed(path, 0 until 5, "a")
    (1 until 6).foreach(i => append(path, i * 5 until (i + 1) * 5, "b"))
    // each start() runs ONE micro-batch (v1 source under AvailableNow),
    // so every runOnce IS a restart: the backfill must advance by ≤2
    // dirs per batch and recover its exact position from the checkpoint
    val counts = (1 to 4).map { _ =>
      runOnce(path, ckpt, sink, maxDirsPerTrigger = Some(2))
      spark.read.parquet(sink).count()
    }
    assert(counts === Seq(10L, 20L, 30L, 30L),
      "⌈6/2⌉ = 3 bounded chunks, then idle — no loss, no duplicates")
    assert(sinkIds(sink) === (0 until 30))
    // a post-backfill append is served as the usual O(new data) tail
    append(path, 30 until 35, "c")
    runOnce(path, ckpt, sink, maxDirsPerTrigger = Some(2))
    assert(sinkIds(sink) === (0 until 35))
  }

  test("maxBytesPerTrigger bounds how many tail versions batch together") {
    val path = tmpDir("ts_byt"); val ckpt = tmpDir("ts_byt_ck")
    val sink = tmpDir("ts_byt_sink")
    seed(path, 0 until 5, "a")
    runOnce(path, ckpt, sink) // consume the snapshot
    // three tail versions of ~equal size; a 1-byte budget still admits
    // at least one version per trigger — so exactly one each
    (1 to 3).foreach(i => append(path, i * 100 until i * 100 + 5, "b"))
    val counts = (1 to 3).map { _ =>
      runOnce(path, ckpt, sink, maxBytesPerTrigger = Some(1L))
      spark.read.parquet(sink).count()
    }
    assert(counts === Seq(10L, 15L, 20L),
      "one version per byte-bounded trigger")
    // a generous budget batches the remaining backlog in one trigger
    (4 to 6).foreach(i => append(path, i * 100 until i * 100 + 5, "b"))
    runOnce(path, ckpt, sink, maxBytesPerTrigger = Some(1L << 30))
    assert(spark.read.parquet(sink).count() === 35)
  }

  test("CDF admission is byte-bounded too: large rewrite commits split across triggers") {
    val path = tmpDir("ts_cdfbyt"); val ckpt = tmpDir("ts_cdfbyt_ck")
    val sink = tmpDir("ts_cdfbyt_sink")
    seed(path, 0 until 20, "a")
    def drain(budget: Option[Long]): Long = {
      val q = StreamOps.streamTable(spark, path, readChangeFeed = true,
          maxBytesPerTrigger = budget)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      spark.read.parquet(sink).count()
    }
    drain(None) // pin position: empty batch 0
    // three UNCAPTURED rewrite commits — the feed synthesizes
    // delete-all + insert-survivors per version; each rewrite touches
    // every dir, so a 1-byte budget must admit exactly one per trigger
    // (pre-fix, CDF admission ignored bytes and all three landed at once)
    (1 to 3).foreach(i =>
      ManagedTable(spark, path).update(Map("v" -> concat($"v", lit(s"_$i"))),
        $"id" % 4 === i))
    val counts = (1 to 3).map(_ => drain(Some(1L)))
    assert(counts.head > 0 && counts(1) === 2 * counts.head &&
      counts(2) === 3 * counts.head,
      s"each byte-bounded trigger run must admit exactly one rewrite: $counts")
    // the union of bounded triggers is the complete feed
    val full = ManagedTable(spark, path)
      .readChangeFeed(ManagedTable(spark, path).latestVersion.get - 2)
    assert(spark.read.parquet(sink).count() === full.count(),
      "bounded CDF admission must still serve the whole feed")
    val byVersion = spark.read.parquet(sink)
      .groupBy($"_commit_version").count().count()
    assert(byVersion === 3L)
  }

  test("byte-bounded admission is served from the commit log: zero FS size walks") {
    val path = tmpDir("ts_logbytes"); val ckpt = tmpDir("ts_logbytes_ck")
    val sink = tmpDir("ts_logbytes_sink")
    seed(path, 0 until 10, "a")
    (1 to 3).foreach(i => append(path, i * 10 until i * 10 + 5, "b"))
    val before = ManagedTable.sizeListings.get()
    // dir- AND byte-bounded backfill, then byte-bounded tail admission:
    // every size the admission logic needs comes from Commit.dirBytes
    (1 to 6).foreach(_ => runOnce(path, ckpt, sink,
      maxDirsPerTrigger = Some(2), maxBytesPerTrigger = Some(1L)))
    assert(sinkIds(sink) ===
      ((0 until 10) ++ (10 until 15) ++ (20 until 25) ++ (30 until 35)).sorted)
    // post-backfill appends exercise the byte-bounded TAIL admission too
    (4 to 5).foreach(i => append(path, i * 10 until i * 10 + 5, "c"))
    (1 to 3).foreach(_ => runOnce(path, ckpt, sink, maxBytesPerTrigger = Some(1L)))
    assert(sinkIds(sink) ===
      ((0 until 10) ++ (1 to 5).flatMap(i => i * 10 until i * 10 + 5)).sorted)
    assert(ManagedTable.sizeListings.get() === before,
      "new-format table: admission must not walk the filesystem for sizes")
  }

  test("legacy commits without dirBytes fall back to a one-time FS listing") {
    val path = tmpDir("ts_legbytes"); val ckpt = tmpDir("ts_legbytes_ck")
    val sink = tmpDir("ts_legbytes_sink")
    seed(path, 0 until 10, "a")
    append(path, 10 until 15, "b")
    // strip the byte fields to emulate a pre-round-10 log
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    val logDir = new org.apache.hadoop.fs.Path(path, "_graft_log")
    fs.listStatus(logDir).filter(_.getPath.getName.endsWith(".json")).foreach { st =>
      val in = fs.open(st.getPath)
      val n = try m.readTree(in).asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        finally in.close()
      n.remove("dirBytes"); n.remove("addDirBytes")
      val out = fs.create(st.getPath, true)
      try out.write(m.writerWithDefaultPrettyPrinter().writeValueAsString(n)
        .getBytes("UTF-8")) finally out.close()
    }
    val before = ManagedTable.sizeListings.get()
    (1 to 3).foreach(_ => runOnce(path, ckpt, sink,
      maxDirsPerTrigger = Some(1), maxBytesPerTrigger = Some(1L)))
    assert(sinkIds(sink) === (0 until 15))
    assert(ManagedTable.sizeListings.get() > before,
      "legacy log: sizes must come from the (counted) FS fallback")
  }

  test("1200-dir backfill: bounded triggers, restart recovery, log-served sizes") {
    val path = tmpDir("ts_bigbf"); val ckpt = tmpDir("ts_bigbf_ck")
    val sink = tmpDir("ts_bigbf_sink")
    seed(path, 0 until 5, "a") // v0: one dir, 5 rows — the clone template
    val t = ManagedTable(spark, path)
    val c0 = t.lastCommit.get
    // fabricate a 1200-dir composition cheaply: clone the template dir's
    // files at the FS level and commit the clones through the REAL
    // writeCommit (which records each dir's bytes) — the admission path
    // under test sees exactly what a 1200-append table would give it
    val srcPath = new java.io.File(
      new org.apache.hadoop.fs.Path(c0.dirs.head).toUri.getPath)
    val dataRoot = srcPath.getParentFile
    val clones = (0 until 1200).map { i =>
      val d = new java.io.File(dataRoot, f"clone-$i%04d")
      assert(d.mkdirs(), s"could not create $d")
      srcPath.listFiles().foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          new java.io.File(d, f.getName).toPath)
      }
      d.getAbsolutePath
    }
    t.writeCommit(ManagedTable.Commit(1L, "APPEND",
      System.currentTimeMillis(), clones, Map.empty, None,
      c0.schemaDdl, 0L), Some(c0))
    // 1200 dirs / 400 per trigger → exactly 3 bounded chunks; every
    // runOnce is a RESTART recovering its position from the checkpoint,
    // and the byte budget keeps the byte-admission logic engaged —
    // served from the commit log, zero FS size walks at 1200-dir scale
    val before = ManagedTable.sizeListings.get()
    val counts = (1 to 4).map { _ =>
      runOnce(path, ckpt, sink, maxDirsPerTrigger = Some(400),
        maxBytesPerTrigger = Some(1L << 40))
      spark.read.parquet(sink).count()
    }
    assert(counts === Seq(2000L, 4000L, 6000L, 6000L),
      "⌈1200/400⌉ = 3 bounded chunks, then idle — no loss, no duplicates")
    assert(ManagedTable.sizeListings.get() === before,
      "1200-dir admission must be served from Commit.dirBytes")
  }

  test("restart resumes bounded admission from the checkpoint, not the table head") {
    val path = tmpDir("ts_clamp"); val ckpt = tmpDir("ts_clamp_ck")
    val sink = tmpDir("ts_clamp_sink")
    seed(path, 0 until 5, "a")
    runOnce(path, ckpt, sink) // checkpoint now at the snapshot version
    // a 5-version backlog lands while the stream is down
    (1 to 5).foreach(i => append(path, i * 10 until i * 10 + 5, "b"))
    // K=1 must hold ACROSS the restart: the first batch after restart
    // serves exactly one version, not the whole backlog
    runOnce(path, ckpt, sink, maxVersionsPerTrigger = Some(1L))
    assert(spark.read.parquet(sink).count() === 10,
      "first post-restart trigger admitted one version only")
    (1 to 4).foreach(_ => runOnce(path, ckpt, sink, maxVersionsPerTrigger = Some(1L)))
    assert(spark.read.parquet(sink).count() === 30, "backlog drained one version at a time")
  }

  test("graft-table SINK in Update mode without writeType fails loudly") {
    val bronze = tmpDir("tsu_b"); val silver = tmpDir("tsu_s")
    val ckpt = tmpDir("tsu_ck")
    seed(bronze, 0 until 10, "a")
    val e = intercept[Exception] {
      val q = StreamOps.streamTable(spark, bronze)
        .groupBy(($"id" % 2 === 0).as("even")).count()
        .writeStream.format("graft-table")
        .outputMode("update")
        .option("path", silver)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
    }
    val msg = Option(e.getCause).map(_.getMessage).getOrElse(e.getMessage)
    assert(msg.contains("writeType"), s"unexpected failure: $e")
  }

  test("a schema change since stream start fails the restart loudly") {
    val path = tmpDir("ts_sch"); val ckpt = tmpDir("ts_sch_ck")
    val sink = tmpDir("ts_sch_sink")
    seed(path, 0 until 5, "a")
    runOnce(path, ckpt, sink)
    // widen the table's schema while the stream is down
    ManagedTable(spark, path).write(
      (5 until 8).map(i => (i, s"b$i", i * 2)).toDF("id", "v", "extra"),
      "OVERWRITE", "replace")
    val e = intercept[StreamingQueryException] { runOnce(path, ckpt, sink) }
    assert(e.getCause.getMessage.contains("fresh checkpoint"),
      s"unexpected failure: ${e.getCause}")
  }

  test("vacuum past the stream checkpoint surfaces the precise error, never wrong rows") {
    val path = tmpDir("ts_vac"); val ckpt = tmpDir("ts_vac_ck")
    val sink = tmpDir("ts_vac_sink")
    seed(path, 0 until 5, "a")
    runOnce(path, ckpt, sink) // checkpoint at version 0
    // 12 more versions (a forced full log snapshot lands inside), then a
    // vacuum that keeps only the head's chain — the checkpointed tail is gone
    (1 to 12).foreach(i => append(path, i * 10 until i * 10 + 2, "b"))
    ManagedTable(spark, path).vacuum(keepLast = 1)
    val e = intercept[StreamingQueryException] { runOnce(path, ckpt, sink) }
    assert(e.getCause.getMessage.contains("vacuumed past the stream checkpoint"),
      s"unexpected failure: ${e.getCause}")
  }

  test("a pre-round-9 checkpoint without sidecar files keeps its tail semantics") {
    val path = tmpDir("ts_leg"); val ckpt = tmpDir("ts_leg_ck")
    val sink = tmpDir("ts_leg_sink")
    seed(path, 0 until 10, "a")
    runOnce(path, ckpt, sink)
    assert(sinkIds(sink) === (0 until 10))
    // simulate a legacy checkpoint: the engine's offset log survives but
    // the round-9 sidecars never existed
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sessionState.newHadoopConf())
    val srcMeta = new org.apache.hadoop.fs.Path(ckpt, "sources/0")
    fs.delete(new org.apache.hadoop.fs.Path(srcMeta, "graft-source-metadata"), false)
    fs.delete(new org.apache.hadoop.fs.Path(srcMeta, "graft-source-position"), false)
    append(path, 10 until 15, "b")
    runOnce(path, ckpt, sink)
    assert(sinkIds(sink) === (0 until 15),
      "legacy restart tails the new rows once — no re-served backfill")
  }

  test("stream joins back to dimensions: medallion bronze→silver via foreachBatch") {
    val bronze = tmpDir("ts_med_b"); val silver = tmpDir("ts_med_s")
    val ckpt = tmpDir("ts_med_ck")
    seed(bronze, 0 until 10, "a")
    val q = StreamOps.streamTable(spark, bronze)
      .withColumn("flag", col("id") % 2 === 0)
      .writeStream.foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        Writers.scd1(spark, silver, batch, Seq("id"),
          WriteOptions(now = Some("2026-01-05 00:00:00")),
          txn = Some((s"graft-stream:$ckpt", id)))
        ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val s = ManagedTable(spark, silver).read
    assert(s.count() === 10)
    assert(s.filter($"flag" === true).count() === 5)
  }

  test("CDF stream serves DV deletes from their captured change rows") {
    val path = tmpDir("ts_dvcdf"); val ckpt = tmpDir("ts_dvcdf_ck")
    val sink = tmpDir("ts_dvcdf_sink")
    val t = ManagedTable(spark, path)
    t.write((0 until 20).map(i => (i, s"v$i")).toDF("id", "v"), "APPEND", "append")
    def drain(): Unit = {
      val q = StreamOps.streamTable(spark, path, readChangeFeed = true)
        .writeStream.format("parquet")
        .option("path", sink).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      ()
    }
    drain() // pin position; nothing before the start serves
    t.deleteVectors(col("id") % 5 === 0) // captures change rows
    t.write(Seq((100, "new")).toDF("id", "v"), "APPEND", "append")
    drain()
    val changes = spark.read.parquet(sink)
    val dels = changes.filter($"_change_type" === "delete")
      .select("id").as[Int].collect().sorted
    assert(dels.toSeq === Seq(0, 5, 10, 15),
      "DV delete must stream exactly its tombstoned rows")
    assert(changes.filter($"_change_type" === "insert")
      .select("id").as[Int].collect().toSeq === Seq(100))
  }
}
