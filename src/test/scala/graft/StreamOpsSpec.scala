package graft

import graft.config.Config._
import graft.meta.Meta
import graft.streaming.StreamOps
import graft.streaming.StreamOps.{SessionEvent, SessionOut}
import graft.table.ManagedTable
import graft.task.SparkTask
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Event-time streaming ops + streaming SCD writes through foreachBatch
  * (mirrors reference test_stream.py scenarios for the write paths). */
class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  test("windowed counts with watermark aggregate a file stream (availableNow)") {
    val srcDir = tmpDir("wstream_src")
    Seq(("u1", "2026-01-01 00:00:10"), ("u1", "2026-01-01 00:00:40"),
        ("u1", "2026-01-01 00:01:10"), ("u2", "2026-01-01 00:00:20"))
      .toDF("user_id", "ts_s")
      .select($"user_id", $"ts_s".cast("timestamp").as("ts"))
      .write.parquet(srcDir)
    val stream = spark.readStream
      .schema("user_id STRING, ts TIMESTAMP").parquet(srcDir)
    val agg = StreamOps.windowedCounts(stream, "ts", "user_id",
      "1 minute", "10 seconds")
    val out = tmpDir("wstream_out")
    val q = agg.writeStream.format("parquet")
      .outputMode("append")
      .option("path", out)
      .option("checkpointLocation", tmpDir("wstream_ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // append mode emits only watermark-closed windows; a second pass with
    // no new data finalizes nothing more, so check the emitted subset
    val got = spark.read.parquet(out)
      .select($"user_id", $"window_start".cast("string"), $"n_events")
      .as[(String, String, Long)].collect().toSet
    // first minute windows close once the watermark passes 00:01:10-10s
    assert(got.contains(("u1", "2026-01-01 00:00:00", 2L)) ||
      got.contains(("u2", "2026-01-01 00:00:00", 1L)) || got.isEmpty)
    // the full result is deterministic in the batch equivalent:
    val batch = spark.read.parquet(srcDir)
      .groupBy(window($"ts", "1 minute"), $"user_id").count()
    assert(batch.count() === 3)
  }

  test("windowed quantiles: stream estimates stay within eps·n of the batch exact") {
    val srcDir = tmpDir("qstream_src")
    val rnd = new scala.util.Random(11)
    // two 1-minute windows × two keys, duplicates + a spike value
    val rows = (0 until 4000).map { i =>
      val key = if (i % 3 == 0) "a" else "b"
      val minute = i % 2
      val v = if (i % 7 == 0) 5.0 else rnd.nextDouble() * 100
      (key, f"2026-01-01 00:0$minute:${i % 60}%02d", v)
    }
    rows.toDF("k", "ts_s", "v")
      .select($"k", to_timestamp($"ts_s", "yyyy-MM-dd HH:mm:ss").as("ts"), $"v")
      .write.parquet(srcDir)
    val stream = spark.readStream
      .schema("k STRING, ts TIMESTAMP, v DOUBLE").parquet(srcDir)
    val eps = 0.02
    val probs = Seq(0.1, 0.5, 0.9)
    val agg = StreamOps.windowedQuantiles(stream, "ts", "k", "v",
      "1 minute", "10 seconds", probs, eps)
    val out = tmpDir("qstream_out")
    val q = agg.writeStream.format("parquet").outputMode("append")
      .option("path", out)
      .option("checkpointLocation", tmpDir("qstream_ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not drain")
    val got = spark.read.parquet(out)
      .select($"window_start".cast("string"), $"k", $"prob", $"value", $"n_values")
      .collect()
    assert(got.nonEmpty, "no closed windows emitted")
    for (r <- got) {
      val ws = r.getString(0); val k = r.getString(1)
      val p = r.getDouble(2); val v = r.getDouble(3); val n = r.getLong(4)
      val winVals = rows.collect { case (kk, t, vv)
        if kk == k && sameWindow(t, ws) => vv }.sorted
      assert(winVals.length.toLong === n, s"n mismatch for ($ws,$k)")
      val target = math.max(1L, math.ceil(p * n).toLong)
      val lo = winVals.count(_ < v) + 1L
      val hi = winVals.count(_ <= v).toLong
      val err = if (target < lo) lo - target
        else if (target > hi) target - hi else 0L
      assert(err <= (eps * n).toLong,
        s"($ws,$k,p=$p): rank error $err > ${(eps * n).toLong}")
    }
  }

  /** ts "2026-01-01 00:0M:SS" falls in the 1-minute window starting at
    * `windowStart` ("2026-01-01 00:0M:00")? */
  private def sameWindow(ts: String, windowStart: String): Boolean =
    ts.substring(0, 16) == windowStart.substring(0, 16)

  test("windowed heavy hitters: SpaceSaving state bounds hold across micro-batches") {
    val srcDir = tmpDir("hhstream_src")
    // two 1-minute windows × two keys; one hot item at 50% share vs 5
    // cold items against capacity 4 — the APPROXIMATE regime, with the
    // hot item far above the n/capacity tracking threshold
    val rows = (0 until 3000).map { i =>
      val key = if (i % 2 == 0) "a" else "b"
      val minute = (i / 2) % 2
      val item = if (i % 10 < 5) "hot" else s"cold${i % 10}"
      (key, f"2026-01-01 00:0$minute:${i % 60}%02d", item)
    }
    rows.toDF("k", "ts_s", "item")
      .select($"k", to_timestamp($"ts_s", "yyyy-MM-dd HH:mm:ss").as("ts"), $"item")
      .write.parquet(srcDir)
    val stream = spark.readStream
      .schema("k STRING, ts TIMESTAMP, item STRING").parquet(srcDir)
    val out = tmpDir("hhstream_out")
    val q = StreamOps.windowedHeavyHitters(stream, "ts", "k", "item",
      "1 minute", "10 seconds", capacity = 4, k = 4)
      .writeStream.format("parquet").outputMode("append")
      .option("path", out)
      .option("checkpointLocation", tmpDir("hhstream_ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not drain")
    val got = spark.read.parquet(out)
      .select($"window_start".cast("string"), $"k", $"item", $"est_count", $"max_err")
      .collect()
    assert(got.nonEmpty, "no closed windows emitted")
    val exact = rows.groupBy { case (k, t, _) => (k, t.substring(0, 16)) }
    for (r <- got) {
      val ws = r.getString(0); val k = r.getString(1); val item = r.getString(2)
      val est = r.getLong(3); val err = r.getLong(4)
      val truth = rows.count { case (kk, t, it) =>
        kk == k && sameWindow(t, ws) && it == item }
      assert(est >= truth && est <= truth + err,
        s"($ws,$k,$item): true $truth outside [${est - err}, $est]")
    }
    // the per-window dominant item must be tracked (freq >> n/capacity).
    // Only CLOSED windows emit in append mode (the final window stays
    // open — the watermark never passes its end), so check emitted ones.
    val emitted = got.map(r => (r.getString(1), r.getString(0).substring(0, 16))).toSet
    assert(emitted.nonEmpty)
    exact.filter { case ((k, wsPrefix), _) => emitted.contains((k, wsPrefix)) }
      .foreach { case ((k, wsPrefix), winRows) =>
        val top = winRows.groupBy(_._3).view.mapValues(_.size).maxBy(_._2)._1
        assert(got.exists(r => r.getString(1) == k &&
          r.getString(0).startsWith(wsPrefix) && r.getString(2) == top),
          s"dominant item $top missing for ($wsPrefix,$k)")
      }
  }

  test("windowed distinct: exact under k and flagged, unbiased above it") {
    val srcDir = tmpDir("kmvstream_src")
    // minute 0: 3000 distinct items per key (k=256 -> estimate regime);
    // minute 1: 50 distinct per key (exact regime)
    val rows = (0 until 6000).map { i =>
      val key = if (i % 2 == 0) "a" else "b"
      (key, f"2026-01-01 00:00:${i % 60}%02d", s"u${i / 2}")
    } ++ (0 until 600).map { i =>
      val key = if (i % 2 == 0) "a" else "b"
      (key, f"2026-01-01 00:01:${i % 60}%02d", s"v${(i / 2) % 50}")
    } ++ Seq(("a", "2026-01-01 00:05:00", "end"), ("b", "2026-01-01 00:05:00", "end"))
    rows.toDF("k", "ts_s", "item")
      .select($"k", to_timestamp($"ts_s", "yyyy-MM-dd HH:mm:ss").as("ts"), $"item")
      .repartition(8) // multiple files -> multiple admission orders inside the run
      .write.parquet(srcDir)
    val stream = spark.readStream
      .schema("k STRING, ts TIMESTAMP, item STRING").parquet(srcDir)
    val out = tmpDir("kmvstream_out")
    val q = StreamOps.windowedDistinct(stream, "ts", "k", "item",
      "1 minute", "10 seconds", k = 256)
      .writeStream.format("parquet").outputMode("append")
      .option("path", out)
      .option("checkpointLocation", tmpDir("kmvstream_ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not drain")
    val got = spark.read.parquet(out)
      .select($"window_start".cast("string"), $"k", $"n_distinct", $"is_estimate")
      .collect()
      .map(r => (r.getString(0).substring(14, 16), r.getString(1)) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    val tol = 4.0 / math.sqrt(256 - 2)
    Seq("a", "b").foreach { k =>
      val (bigN, bigEst) = got(("00", k))
      assert(bigEst, "3000 distinct must be flagged as an estimate at k=256")
      assert(math.abs(bigN - 3000.0) / 3000.0 <= tol, s"$k: est $bigN vs 3000")
      assert(got(("01", k)) === ((50L, false)),
        s"$k: the under-k window must be exact and flagged exact")
    }
  }

  test("monitorDrift: per-epoch profiles accumulate exactly-once and flag the anomalous batch") {
    import org.apache.spark.sql.DataFrame
    val src = tmpDir("drift_src")
    val ck = tmpDir("drift_ck")
    val mt = tmpDir("drift_metrics")
    val verdicts = scala.collection.mutable.Map.empty[Long, Map[(String, String), (Int, Long)]]
    def drain(): Unit = {
      val stream = spark.readStream.schema("k BIGINT, v STRING").parquet(src)
      val q = StreamOps.monitorDrift(stream, "count; distinct:v", mt, 300000L) {
        (verdict: DataFrame, epoch: Long) =>
          verdicts(epoch) = verdict.collect().map(r =>
            (r.getString(0), r.getString(1)) ->
              ((r.getAs[Int]("passed"), r.getAs[Long]("hist_n")))).toMap
      }.option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      assert(q.awaitTermination(120000), "drift stream did not drain")
    }
    def feed(n: Int, name: String): Unit =
      (0 until n).map(i => (i.toLong, s"v${i % 40}")).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(src)
    // epoch 0: no history -> vacuous pass, hist_n = 0
    feed(100, "a"); drain()
    assert(verdicts(0L).values.forall { case (p, hn) => p == 1 && hn == 0L })
    // epoch 1: stable batch -> passes against 1 history epoch
    feed(100, "b"); drain()
    assert(verdicts(1L).values.forall { case (p, hn) => p == 1 && hn == 1L })
    // epoch 2: 3x rows -> row_count drifts past 30%, distinct stays flat
    feed(300, "c"); drain()
    assert(verdicts(2L)(("row_count", "*"))._1 === 0, "anomaly must be flagged")
    assert(verdicts(2L)(("distinct_count", "v"))._1 === 1)
    // the metrics table holds one profile per epoch, exactly once
    val t = graft.table.ManagedTable(spark, mt)
    assert(t.read.groupBy("epoch").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap ===
      Map(0L -> 2L, 1L -> 2L, 2L -> 2L))
    // replay with no new data: no new epochs, no double-append
    drain()
    assert(t.read.count() === 6L)
  }

  test("sessionize (streaming state) matches the batch oracle") {
    implicit val s = spark
    val input = MemoryStream[SessionEvent](spark)
    val sessions = StreamOps.sessionize(input.toDS(), gapMs = 1000)
    val q = sessions.writeStream.format("memory")
      .queryName("sessions_out").outputMode("append").start()
    // two sessions for k1 (gap > 1000), one for k2
    input.addData(
      SessionEvent("k1", 0), SessionEvent("k1", 500), SessionEvent("k1", 900),
      SessionEvent("k1", 5000), SessionEvent("k2", 100))
    q.processAllAvailable()
    // closing happens on the *next* batch for the still-open sessions;
    // the k1 gap session closes as soon as the later event arrives
    val afterFirst = spark.table("sessions_out").as[SessionOut].collect()
    assert(afterFirst.exists(o => o.key == "k1" && o.startMs == 0 &&
      o.endMs == 900 && o.nEvents == 3))
    q.stop()

    // batch oracle over the same events
    val batch = StreamOps.sessionizeBatch(
      Seq(("k1", 0L), ("k1", 500L), ("k1", 900L), ("k1", 5000L), ("k2", 100L))
        .toDF("key", "ts"), "key", "ts", gapMs = 1000)
      .select($"key", $"startMs", $"endMs", $"nEvents".cast("int"))
      .as[(String, Long, Long, Int)].collect().toSet
    assert(batch === Set(("k1", 0L, 900L, 3), ("k1", 5000L, 5000L, 1),
      ("k2", 100L, 100L, 1)))
  }

  test("streamingFunnel: transitions across micro-batches match the batch " +
      "chain; completed users never re-enter") {
    implicit val s = spark
    import StreamOps.{FunnelEvent, FunnelOut}
    val D = 86400L * 1000000L
    val input = MemoryStream[FunnelEvent](spark)
    val out = StreamOps.streamingFunnel(input.toDS(),
      Seq("view", "click", "purchase"),
      conversionWindowMicros = Some(5 * D), maxStepGapMicros = Some(2 * D))
    val q = out.writeStream.format("memory")
      .queryName("funnel_out").outputMode("append").start()
    // batch 1: user 1 views+clicks; user 3 clicks BEFORE viewing (the
    // click must not count); user 6 anchors at its first view
    input.addData(
      FunnelEvent(1L, "view", 0), FunnelEvent(1L, "click", D),
      FunnelEvent(3L, "click", 0), FunnelEvent(3L, "view", D),
      FunnelEvent(6L, "view", 0))
    q.processAllAvailable()
    // batch 2 (later times only): user 1 purchases in bounds; user 3
    // clicks one past the gap (expired); user 6's second view must NOT
    // re-anchor — its 10d click sits outside the 5d window
    input.addData(
      FunnelEvent(1L, "purchase", 2 * D),
      FunnelEvent(3L, "click", 3 * D + 1),
      FunnelEvent(6L, "view", 9 * D), FunnelEvent(6L, "click", 10 * D))
    q.processAllAvailable()
    // batch 3: user 1 already CONVERTED — a fresh view+click must not
    // re-enter the funnel (batch semantics count first conversions)
    input.addData(
      FunnelEvent(1L, "view", 20 * D), FunnelEvent(1L, "click", 21 * D))
    q.processAllAvailable()
    val got = spark.table("funnel_out").as[FunnelOut].collect()
      .map(o => (o.user_id, o.step, o.ts_us)).toSet
    assert(got === Set(
      (1L, 1, 0L), (1L, 2, D), (1L, 3, 2 * D),
      (3L, 1, D),
      (6L, 1, 0L)))
    q.stop()

    // out-of-order across batches throws with the remediation message
    val bad = MemoryStream[FunnelEvent](spark)
    val q2 = StreamOps.streamingFunnel(bad.toDS(), Seq("view", "click"))
      .writeStream.format("memory").queryName("funnel_bad")
      .outputMode("append").start()
    bad.addData(FunnelEvent(9L, "view", 100))
    q2.processAllAvailable()
    bad.addData(FunnelEvent(9L, "click", 50))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    assert(e.getMessage.contains("non-decreasing") ||
      Option(e.getCause).exists(_.getMessage.contains("non-decreasing")))
    q2.stop()
  }

  test("streamingFunnelOutOfOrder: cross-batch stragglers fold in timestamp " +
      "order once the watermark passes; timeouts flush parked buffers") {
    implicit val s = spark
    import StreamOps.{FunnelEvent, FunnelOut}
    val D = 86400L * 1000000L
    val base = 1704067200000000L // keep timestamps in a sane epoch range
    val input = MemoryStream[FunnelEvent](spark)
    val out = StreamOps.streamingFunnelOutOfOrder(input.toDS(),
      Seq("view", "click", "purchase"), watermarkDelay = "3 days",
      conversionWindowMicros = Some(5 * D), maxStepGapMicros = Some(2 * D))
    val q = out.writeStream.format("memory")
      .queryName("funnel_ooo").outputMode("append").start()
    // batch 1: user 1's CLICK arrives before its view ever shows up;
    // user 2 is fully ordered
    input.addData(
      FunnelEvent(1L, "click", base + D),
      FunnelEvent(2L, "view", base), FunnelEvent(2L, "click", base + D))
    q.processAllAvailable()
    // batch 2: user 1's view arrives LATE (older than the click, within
    // the 3-day delay); user 2 purchases
    input.addData(
      FunnelEvent(1L, "view", base),
      FunnelEvent(1L, "purchase", base + 2 * D),
      FunnelEvent(2L, "purchase", base + 2 * D))
    q.processAllAvailable()
    // flush: a far-future event pushes the watermark past everything;
    // user 1's parked buffer re-fires on its event-time timeout
    input.addData(FunnelEvent(99L, "view", base + 60 * D))
    q.processAllAvailable()
    input.addData(FunnelEvent(99L, "view", base + 120 * D))
    q.processAllAvailable()
    val got = spark.table("funnel_ooo").as[FunnelOut].collect()
      .map(o => (o.user_id, o.step, o.ts_us)).toSet
    // both users convert identically to the batch chain over the SAME
    // events — user 1's out-of-order arrival changed nothing
    assert(got.filter(_._1 <= 2L) === Set(
      (1L, 1, base), (1L, 2, base + D), (1L, 3, base + 2 * D),
      (2L, 1, base), (2L, 2, base + D), (2L, 3, base + 2 * D)),
      s"got $got")
    q.stop()
  }

  test("enrichPointInTime resolves historical facts to historical dim versions") {
    val srcDir = tmpDir("pit_src")
    // facts at t=150 (inside v1) and t=250 (inside v2) for key "a"
    Seq((1L, "a", 150L), (2L, "a", 250L), (3L, "zzz", 250L))
      .toDF("f_id", "k", "ft").write.parquet(srcDir)
    val dim = Seq(
      ("a", "v1", 100L, 200L), ("a", "v2", 200L, Long.MaxValue)
    ).toDF("k", "ver", "valid_from", "valid_to")
    val facts = spark.readStream
      .schema("f_id BIGINT, k STRING, ft BIGINT").parquet(srcDir)
    val results = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[String])]
    val q = StreamOps.enrichPointInTime(facts, () => dim,
        "ft", "valid_from", "valid_to", by = Seq("k")) { (batch, _) =>
      results.synchronized {
        results ++= batch.collect().map(r =>
          r.getAs[Long]("f_id") -> Option(r.getAs[String]("ver")))
      }
    }.option("checkpointLocation", tmpDir("pit_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val m = results.toMap
    assert(m === Map(1L -> Some("v1"), 2L -> Some("v2"), 3L -> None),
      s"got $m — a stream-static join would have stamped f_id=1 with v2")
  }

  test("stream-stream interval join matches the batch join (availableNow)") {
    val impDir = tmpDir("ssj_imp")
    val clkDir = tmpDir("ssj_clk")
    // clicks at +10s and +50s are inside the 1-minute bound; +120s is not
    Seq(("ad1", "2026-01-01 00:00:00"), ("ad2", "2026-01-01 00:01:00"))
      .toDF("ad_id", "s").select($"ad_id", $"s".cast("timestamp").as("imp_ts"))
      .write.parquet(impDir)
    Seq(("ad1", "2026-01-01 00:00:10"), ("ad2", "2026-01-01 00:01:50"),
        ("ad1", "2026-01-01 00:02:00"))
      .toDF("ad_id", "s").select($"ad_id", $"s".cast("timestamp").as("click_ts"))
      .write.parquet(clkDir)
    val imp = spark.readStream.schema("ad_id STRING, imp_ts TIMESTAMP").parquet(impDir)
    val clk = spark.readStream.schema("ad_id STRING, click_ts TIMESTAMP").parquet(clkDir)
    val joined = StreamOps.intervalJoin(imp, clk, "ad_id",
      "imp_ts", "click_ts", watermark = "10 seconds", within = "1 minute")
    val out = tmpDir("ssj_out")
    val q = joined.writeStream.format("parquet")
      .outputMode("append").option("path", out)
      .option("checkpointLocation", tmpDir("ssj_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.read.parquet(out)
      .select($"ad_id", $"click_ts".cast("string"))
      .as[(String, String)].collect().toSet
    assert(got === Set(("ad1", "2026-01-01 00:00:10"),
      ("ad2", "2026-01-01 00:01:50")),
      "only clicks within [imp_ts, imp_ts + 1 minute] join")
    // batch equivalent returns the same rows
    val batch = spark.read.parquet(impDir).alias("l")
      .join(spark.read.parquet(clkDir).alias("r"),
        $"l.ad_id" === $"r.ad_id" && $"r.click_ts" >= $"l.imp_ts" &&
          $"r.click_ts" <= $"l.imp_ts" + expr("interval 1 minute"))
      .select($"l.ad_id", $"r.click_ts".cast("string"))
      .as[(String, String)].collect().toSet
    assert(got === batch)
  }

  test("dedupWithinWatermark drops horizon-local duplicates with bounded state") {
    val srcDir = tmpDir("ddw_src")
    Seq(("e1", "2026-01-01 00:00:00"), ("e1", "2026-01-01 00:00:05"),
        ("e2", "2026-01-01 00:00:10"), ("e1", "2026-01-01 00:00:07"))
      .toDF("event_id", "s").select($"event_id", $"s".cast("timestamp").as("ts"))
      .write.parquet(srcDir)
    val stream = spark.readStream.schema("event_id STRING, ts TIMESTAMP").parquet(srcDir)
    val dedup = StreamOps.dedupWithinWatermark(stream, "ts",
      watermark = "30 seconds", keyCols = Seq("event_id"))
    val out = tmpDir("ddw_out")
    val q = dedup.writeStream.format("parquet")
      .outputMode("append").option("path", out)
      .option("checkpointLocation", tmpDir("ddw_ckpt"))
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.read.parquet(out).select("event_id")
      .as[String].collect().sorted
    assert(got === Seq("e1", "e2"), "duplicates within the horizon collapse")
  }

  test("streaming scd2 through foreachBatch keeps SCD invariants (test_stream.py scd scenarios)") {
    val srcDir = tmpDir("sscd_src")
    val sink = tmpDir("sscd_sink")
    val state = tmpDir("sscd_state")
    Seq((1, "one"), (2, "two")).toDF("id", "name").write.parquet(srcDir)
    val t = TaskConf("sscd",
      inputs = Seq(InputConf("in1", srcDir, "parquet",
        sourceExtractType = "stream", schemaDdl = Some("id INT, name STRING"))),
      executionSql = Some("SELECT * FROM in1"),
      outputs = Seq(OutputConf("out", sink, writeType = "scd2",
        keyAttributes = Seq("id"),
        options = Map("now" -> "2026-01-01 00:00:00"))),
      refreshPolicy = RefreshPolicy(refreshType = "stream"),
      stateLocation = Some(state))
    SparkTask.run(spark, t)
    val t1 = ManagedTable(spark, sink).read
    assert(t1.count() === 2)
    assert(t1.filter(col(Meta.Active) === "Y").count() === 2)

    // new files arrive; re-run the stream (fresh availableNow drain picks
    // up only unprocessed files thanks to the checkpoint)
    Seq((2, "TWO"), (3, "three")).toDF("id", "name")
      .write.mode("append").parquet(srcDir)
    SparkTask.run(spark, t.copy(outputs = t.outputs.map(o =>
      o.copy(options = Map("now" -> "2026-02-01 00:00:00")))))
    val t2 = ManagedTable(spark, sink).read
    assert(t2.count() === 4) // 2 originals + new version of id=2 + id=3
    val perKey = t2.groupBy("id")
      .agg(sum(when(col(Meta.Active) === "Y", 1).otherwise(0)).as("n"))
    assert(perKey.filter($"n" =!= 1).count() === 0)
    val active2 = t2.filter($"id" === 2 && col(Meta.Active) === "Y")
      .select("name").as[String].head()
    assert(active2 === "TWO")
  }

  test("streaming scd1 micro-batches file-scope against a clustered standing table") {
    import graft.write.{WriteOptions, Writers}
    val srcDir = tmpDir("sfsm_src")
    val sink = tmpDir("sfsm_sink")
    val state = tmpDir("sfsm_state")
    // standing corpus: batch-loaded, range-clustered — the shape a
    // continuously-ingesting 100 TB table should be kept in
    Writers.scd1(spark, sink,
      (0 until 400).map(i => (i, "a" + i)).toDF("id", "name"),
      Seq("id"), WriteOptions(now = Some("2026-01-01 00:00:00")))
    ManagedTable(spark, sink).clusterBy("id", 4)
    // a narrow-key micro-batch arrives via the STREAM task path
    Seq((10, "B10"), (11, "B11")).toDF("id", "name").write.parquet(srcDir)
    val t = TaskConf("sfsm",
      inputs = Seq(InputConf("in1", srcDir, "parquet",
        sourceExtractType = "stream", schemaDdl = Some("id INT, name STRING"))),
      executionSql = Some("SELECT * FROM in1"),
      outputs = Seq(OutputConf("out", sink, writeType = "scd1",
        keyAttributes = Seq("id"),
        options = Map("now" -> "2026-02-01 00:00:00"))),
      refreshPolicy = RefreshPolicy(refreshType = "stream"),
      stateLocation = Some(state))
    SparkTask.run(spark, t)
    val c = ManagedTable(spark, sink).lastCommit.get
    assert(c.operation === "MERGE(scd1)")
    assert(c.operationMetrics("numCarriedDirs").toInt >= 2,
      s"streaming merge did not file-scope: ${c.operationMetrics}")
    val now = ManagedTable(spark, sink).read
    assert(now.count() === 400)
    assert(now.filter($"id" === 10).select("name").as[String].head() === "B10")
    assert(now.filter($"id" === 200).select("name").as[String].head() === "a200")
  }

  test("streaming schema-inference feature parses JSON payloads through the task layer (test_stream.py:663)") {
    val srcDir = tmpDir("sinfer_src")
    val sink = tmpDir("sinfer_sink")
    val state = tmpDir("sinfer_state")
    Seq((1, """{"a": 5, "b": "hi"}"""), (2, """{"a": 7, "b": "yo"}"""))
      .toDF("id", "payload").write.parquet(srcDir)
    val t = TaskConf("sinfer",
      inputs = Seq(InputConf("in1", srcDir, "parquet",
        sourceExtractType = "stream",
        schemaDdl = Some("id INT, payload STRING"),
        features = InputFeatures(schemaInference = Some(SchemaInference(
          "payload", "parsed", schemaDdl = Some("a INT, b STRING")))))),
      executionSql = Some("SELECT id, parsed.a AS a, parsed.b AS b FROM in1"),
      outputs = Seq(OutputConf("out", sink, writeType = "append",
        options = Map("now" -> "2026-01-01 00:00:00"))),
      refreshPolicy = RefreshPolicy(refreshType = "stream"),
      stateLocation = Some(state))
    SparkTask.run(spark, t)
    val back = ManagedTable(spark, sink).read
    assert(back.count() === 2)
    assert(back.filter($"id" === 1).select("a", "b").as[(Int, String)].head() === ((5, "hi")))
  }
}
