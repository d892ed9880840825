package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming operators beyond the reference's surface (the
 * reference has no event-time processing — SURVEY.md §2.8 "absent").
 * These are the streaming primitives a training-data pipeline needs:
 * watermarked tumbling/sliding window aggregation and custom stateful
 * sessionization via `flatMapGroupsWithState`.
 *
 * All operators return streaming DataFrames ready for
 * `writeStream.foreachBatch` (reusing the batch writers) or a direct
 * sink; state is bounded via watermarks / processing-time timeouts, so
 * they run indefinitely without unbounded state growth.
 */
object StreamOps {

  /** Stream FROM a managed table (Delta streaming-source analogue; see
    * [[TableStreamSource]]): default = initial-snapshot backfill + append
    * tail; `startingVersion` tails only; `skipChangeCommits` skips
    * rewrite commits instead of failing; `maxVersionsPerTrigger` /
    * `maxBytesPerTrigger` bound tail admission by versions / added
    * bytes; `maxDirsPerTrigger` bounds the initial-snapshot backfill.
    * The medallion chain: bronze `Writers.append` →
    * `streamTable(bronze)` → transform → foreachBatch merge into silver. */
  def streamTable(spark: SparkSession, path: String,
                  startingVersion: Option[Long] = None,
                  skipChangeCommits: Boolean = false,
                  maxVersionsPerTrigger: Option[Long] = None,
                  readChangeFeed: Boolean = false,
                  maxDirsPerTrigger: Option[Int] = None,
                  maxBytesPerTrigger: Option[Long] = None): DataFrame = {
    var r = spark.readStream.format("graft-table").option("path", path)
    startingVersion.foreach(v => r = r.option("startingVersion", v.toString))
    if (skipChangeCommits) r = r.option("skipChangeCommits", "true")
    maxVersionsPerTrigger.foreach(k => r = r.option("maxVersionsPerTrigger", k.toString))
    if (readChangeFeed) r = r.option("readChangeFeed", "true")
    maxDirsPerTrigger.foreach(k => r = r.option("maxDirsPerTrigger", k.toString))
    maxBytesPerTrigger.foreach(b => r = r.option("maxBytesPerTrigger", b.toString))
    r.load()
  }

  /** Tumbling (or sliding) event-time count/aggregate per key with a
    * watermark bounding state. `slide = None` → tumbling. */
  def windowedCounts(events: DataFrame, timeCol: String, keyCol: String,
                     windowDuration: String, watermark: String,
                     slide: Option[String] = None): DataFrame = {
    val w = slide match {
      case Some(s) => window(col(timeCol), windowDuration, s)
      case None => window(col(timeCol), windowDuration)
    }
    events
      .withWatermark(timeCol, watermark)
      .groupBy(w.as("window"), col(keyCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol), col("n_events"))
  }

  /** Tumbling event-time QUANTILES per key — streaming percentile
    * monitoring (latency/size/score distributions per window) without
    * sorting anything: the mergeable GK summary
    * ([[graft.operators.Sketches.GKQuantile]]) is the aggregation
    * buffer, so state per (window, key) is the
    * `O((1/eps)·log(eps·n))`-tuple summary, map-side combinable,
    * merged by the state store exactly like a sum; the watermark
    * bounds how many windows stay live. Every emitted estimate is
    * within `eps·n` ranks of that window's exact quantile (the
    * guarantee is partitioning- and micro-batch-boundary-independent,
    * pinned in StreamOpsSpec against a batch recompute). */
  def windowedQuantiles(events: DataFrame, timeCol: String, keyCol: String,
                        valueCol: String, windowDuration: String,
                        watermark: String, probs: Seq[Double],
                        eps: Double = 0.01): DataFrame = {
    import graft.operators.Sketches
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1], got $probs")
    val agg = udaf(new Sketches.GKQuantile(eps))
    events
      // NULL values are ignored (SQL-aggregate semantics; the udaf's
      // primitive Double input would crash on one)
      .filter(col(s"`$valueCol`").isNotNull)
      .withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), windowDuration).as("window"), col(keyCol))
      .agg(agg(col(s"`$valueCol`").cast("double")).as("gk"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(keyCol),
        col("gk"), explode(array(probs.map(lit): _*)).as("prob"))
      .select(col("window_start"), col("window_end"), col(keyCol), col("prob"),
        Sketches.estimateUdf(col("gk.n"), col("gk.tuples"), col("prob"))
          .as("value"),
        col("gk.n").as("n_values"))
  }

  /** Tumbling event-time DISTINCT COUNTS per key — streaming
    * cardinality monitoring (distinct users/documents/sessions per
    * window) with BOUNDED state: the mergeable KMV/theta sketch
    * ([[graft.operators.Sketches.KmvDistinct]]) is the aggregation
    * buffer, so state per (window, key) is at most `k` hashes however
    * many distinct items flow through — map-side combinable, merged
    * by the state store exactly like a sum, windows retired by the
    * watermark. While a window's distinct count stays under `k` the
    * output is EXACT and flagged `is_estimate = false` (the regime
    * the driver oracle pins — micro-batch-boundary-independent
    * because a k-min set is order-blind); above it the unbiased
    * `RSE ≈ 1/sqrt(k−2)` estimate applies per window. */
  def windowedDistinct(events: DataFrame, timeCol: String, keyCol: String,
                       itemCol: String, windowDuration: String,
                       watermark: String, k: Int = 1024): DataFrame = {
    import graft.operators.Sketches
    val agg = udaf(new Sketches.KmvDistinct(k),
      org.apache.spark.sql.Encoders.scalaLong)
    events
      .filter(col(s"`$itemCol`").isNotNull)
      .withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), windowDuration).as("window"),
        col(s"`$keyCol`"))
      .agg(agg(xxhash64(col(s"`$itemCol`").cast("string"))).as("kmv"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(s"`$keyCol`"),
        Sketches.kmvEstimateUdf(col("kmv")).as("n_distinct"),
        col("kmv.capped").as("is_estimate"))
  }

  /** Tumbling event-time HEAVY HITTERS per key — streaming top-k item
    * monitoring with BOUNDED state: the mergeable SpaceSaving summary
    * ([[graft.operators.Sketches.SpaceSaving]]) is the aggregation
    * buffer, so state per (window, key) is capped at `capacity`
    * tracked items however many distinct items flow through —
    * map-side combinable, merged by the state store exactly like a
    * sum, windows retired by the watermark. With `capacity ≥` the
    * window's distinct item count the output is EXACT
    * (`max_err` = 0) and micro-batch-boundary-independent — the
    * regime the driver oracle pins; above it SpaceSaving's
    * `true ≤ est ≤ true + max_err` guarantee applies per window.
    * Top-`k` rows emit per (window, key), ordered (count desc, item
    * asc) so ties are deterministic across engines. */
  def windowedHeavyHitters(events: DataFrame, timeCol: String, keyCol: String,
                           itemCol: String, windowDuration: String,
                           watermark: String, capacity: Int, k: Int): DataFrame = {
    import graft.operators.Sketches
    require(k >= 1 && k <= capacity, s"need 1 <= k <= capacity, got k=$k")
    val agg = udaf(new Sketches.SpaceSaving(capacity))
    events
      .filter(col(s"`$itemCol`").isNotNull)
      .withWatermark(timeCol, watermark)
      .groupBy(window(col(timeCol), windowDuration).as("window"), col(s"`$keyCol`"))
      .agg(agg(col(s"`$itemCol`").cast("string")).as("__hh__"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(s"`$keyCol`"),
        posexplode(slice(col("__hh__"), lit(1), lit(k))))
      .drop("pos")
      .select(col("window_start"), col("window_end"), col(s"`$keyCol`"),
        col("col.item"), col("col.est_count"), col("col.max_err"))
  }

  final case class SessionEvent(key: String, tsMs: Long)
  final case class SessionState(startMs: Long, lastMs: Long, n: Int)
  final case class SessionOut(key: String, startMs: Long, endMs: Long, nEvents: Int)

  /**
   * Gap-based sessionization: events for a key belong to one session
   * until a silence of `gapMs`; a session closes when a later event
   * arrives past the gap (data-driven close). Custom state via
   * `flatMapGroupsWithState` — the `KeyValueGroupedDataset` state API the
   * reference never exercises. The still-open tail session per key stays
   * in state until more data arrives; a periodic synthetic "flush" event
   * per key (or the [[sessionizeBatch]] backfill) finalizes tails.
   * (A processing-time-timeout close was tried and rejected: with the
   * default as-fast-as-possible trigger it degenerates into a continuous
   * empty-batch loop re-evaluating timeouts.)
   */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long)
                (implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq.sortBy(_.tsMs)
          var current = state.getOption
          val closed = Seq.newBuilder[SessionOut]
          sorted.foreach { e =>
            current match {
              case Some(s) if e.tsMs - s.lastMs <= gapMs =>
                current = Some(s.copy(lastMs = e.tsMs, n = s.n + 1))
              case Some(s) =>
                closed += SessionOut(key, s.startMs, s.lastMs, s.n)
                current = Some(SessionState(e.tsMs, e.tsMs, 1))
              case None =>
                current = Some(SessionState(e.tsMs, e.tsMs, 1))
            }
          }
          current.foreach(state.update)
          closed.result().iterator
      }
  }

  final case class FunnelEvent(userId: Long, eventType: String, tsUs: Long)
  final case class FunnelProgress(nextStep: Int, tprev: Long, t1: Long,
                                  lastTs: Long)
  final case class FunnelOut(user_id: Long, step: Int, event_type: String,
                             ts_us: Long)

  /**
   * STREAMING windowed funnel — [[graft.operators.EventAnalytics
   * .funnelWindowed]]'s greedy-earliest chain as per-user state over a
   * live stream: each user's [[FunnelProgress]] tracks the next
   * expected step, the previous completion time, and the step-1
   * anchor; a qualifying event (strictly later than the previous
   * completion, inside the optional per-step gap and whole-funnel
   * window) EMITS a `(user, step, ts)` transition the moment it
   * arrives — the real-time shape of funnel analytics, vs the batch
   * operator's end-of-day counts.
   *
   * State is one tiny record per user EVER seen — including completed
   * users, whose terminal record is what stops a second view from
   * re-entering the funnel and "converting" again (the batch operator
   * counts each user's FIRST conversion only; removing completed
   * state here was measurably wrong — repeat converters re-emitted).
   * Swap in a `GroupStateTimeout` eviction policy when total-user
   * state matters at your retention window.
   *
   * Ordering contract, loudly enforced: the greedy chain is
   * order-sensitive, so per-user event time must be NON-DECREASING
   * across micro-batches (within a batch the group sorts — ties break
   * toward the earlier step, matching the batch operator's strict-`>`
   * algebra). An event older than already-processed state THROWS with
   * the remediation (replay through the batch operator) rather than
   * silently producing a different funnel than the batch recompute —
   * batch-boundary invariance under ordered input is exactly what the
   * oracle proves.
   */
  def streamingFunnel(events: Dataset[FunnelEvent], steps: Seq[String],
                      conversionWindowMicros: Option[Long] = None,
                      maxStepGapMicros: Option[Long] = None)
                     (implicit spark: SparkSession): Dataset[FunnelOut] = {
    require(steps.size >= 2, s"a funnel needs at least two steps, got $steps")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    import spark.implicits._
    val stepIdx: Map[String, Int] = steps.zipWithIndex.toMap
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelProgress, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[FunnelEvent], state: GroupState[FunnelProgress]) =>
          val sorted = rows.toSeq
            .filter(e => stepIdx.contains(e.eventType))
            .sortBy(e => (e.tsUs, stepIdx(e.eventType)))
          var s = state.getOption.getOrElse(
            FunnelProgress(0, Long.MinValue, Long.MinValue, Long.MinValue))
          sorted.headOption.foreach { e =>
            require(s.lastTs == Long.MinValue || e.tsUs >= s.lastTs,
              s"streamingFunnel: user $user received an event at ${e.tsUs} " +
                s"BEFORE already-processed time ${s.lastTs} — per-user event " +
                "time must be non-decreasing across micro-batches; replay " +
                "unordered history through the batch funnel operator instead")
          }
          val out = Seq.newBuilder[FunnelOut]
          sorted.foreach { e =>
            if (s.nextStep < steps.size && e.eventType == steps(s.nextStep)) {
              val ok =
                if (s.nextStep == 0) true
                else e.tsUs > s.tprev &&
                  maxStepGapMicros.forall(g => e.tsUs <= s.tprev + g) &&
                  conversionWindowMicros.forall(w => e.tsUs <= s.t1 + w)
              if (ok) {
                out += FunnelOut(user, s.nextStep + 1, e.eventType, e.tsUs)
                s = FunnelProgress(s.nextStep + 1, e.tsUs,
                  if (s.nextStep == 0) e.tsUs else s.t1, e.tsUs)
              } else s = s.copy(lastTs = math.max(s.lastTs, e.tsUs))
            } else s = s.copy(lastTs = math.max(s.lastTs, e.tsUs))
          }
          // terminal state (nextStep == steps.size) persists: it is the
          // record that a completed user never re-enters the funnel
          state.update(s)
          out.result().iterator
      }
  }

  final case class FunnelEventTs(userId: Long, eventType: String, tsUs: Long,
                                 ts: java.sql.Timestamp)
  final case class FunnelOooState(nextStep: Int, tprev: Long, t1: Long,
                                  frontierUs: Long,
                                  pending: Seq[FunnelEvent])

  /**
   * OUT-OF-ORDER streaming funnel — [[streamingFunnel]] without its
   * non-decreasing-event-time contract: real event streams arrive out
   * of order, so this form buffers each user's events in state UNDER A
   * WATERMARK and folds them in timestamp order only once the
   * watermark passes — the standard event-time pattern every
   * production funnel engine uses. Given every event arrives within
   * `watermarkDelay` of the stream's high-water mark, the emitted
   * transitions are EXACTLY the batch chain's, independent of arrival
   * order and batch boundaries (the oracle proves this with planted
   * cross-batch stragglers).
   *
   * Mechanics per micro-batch and user group:
   *
   *   1. new events join the user's pending buffer (state);
   *   2. events at or below the current watermark fold — merged,
   *      sorted by `(ts, step index)`, run through the same greedy
   *      chain as the ordered form, transitions emitted;
   *   3. the fold FRONTIER (the watermark folded up to) persists, and
   *      an event-time timeout is set to the earliest still-pending
   *      event so the group re-fires when the watermark passes it even
   *      if no new events arrive.
   *
   * State per user: the tiny progress record plus ONLY the events
   * still above the watermark — bounded by the watermark horizon, not
   * the stream's history. An event below the already-folded frontier
   * (possible only when `watermarkDelay` under-covers the stream's
   * true lateness AND the engine's late-row filter let it through)
   * throws loudly with the remediation rather than silently diverging
   * from the batch recompute.
   */
  def streamingFunnelOutOfOrder(events: Dataset[FunnelEvent],
                                steps: Seq[String],
                                watermarkDelay: String,
                                conversionWindowMicros: Option[Long] = None,
                                maxStepGapMicros: Option[Long] = None)
                               (implicit spark: SparkSession): Dataset[FunnelOut] = {
    require(steps.size >= 2, s"a funnel needs at least two steps, got $steps")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    import spark.implicits._
    val stepIdx: Map[String, Int] = steps.zipWithIndex.toMap
    // the watermark column rides INTO the stateful operator — dropping
    // it would detach the late-row filter and event-time timeouts
    val withTs = events
      .withColumn("ts", timestamp_micros(col("tsUs")))
      .withWatermark("ts", watermarkDelay)
      .as[FunnelEventTs]
    withTs.groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelOooState, FunnelOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rowsTs: Iterator[FunnelEventTs],
         state: GroupState[FunnelOooState]) =>
          val rows = rowsTs.map(e => FunnelEvent(e.userId, e.eventType, e.tsUs))
          var s = state.getOption.getOrElse(FunnelOooState(0, Long.MinValue,
            Long.MinValue, Long.MinValue, Nil))
          val fresh = rows.filter(e => stepIdx.contains(e.eventType)).toSeq
          fresh.find(e => e.tsUs < s.frontierUs).foreach { e =>
            throw new IllegalStateException(
              s"streamingFunnelOutOfOrder: user $user received an event at " +
                s"${e.tsUs} BELOW the already-folded watermark frontier " +
                s"${s.frontierUs} — the configured watermark delay " +
                "under-covers the stream's lateness; raise it and replay " +
                "history through the batch funnel operator")
          }
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (ready, still) = (s.pending ++ fresh)
            .sortBy(e => (e.tsUs, stepIdx(e.eventType)))
            .partition(_.tsUs <= wmUs)
          val out = Seq.newBuilder[FunnelOut]
          var (next, tprev, t1) = (s.nextStep, s.tprev, s.t1)
          ready.foreach { e =>
            if (next < steps.size && e.eventType == steps(next)) {
              val ok =
                if (next == 0) true
                else e.tsUs > tprev &&
                  maxStepGapMicros.forall(g => e.tsUs <= tprev + g) &&
                  conversionWindowMicros.forall(w => e.tsUs <= t1 + w)
              if (ok) {
                out += FunnelOut(user, next + 1, e.eventType, e.tsUs)
                if (next == 0) t1 = e.tsUs
                tprev = e.tsUs
                next += 1
              }
            }
          }
          state.update(FunnelOooState(next, tprev, t1,
            math.max(s.frontierUs, wmUs), still))
          // re-fire when the watermark passes the earliest pending event
          // (timeouts clear on every invocation — re-arm each time)
          if (still.nonEmpty) {
            val earliestMs = still.map(_.tsUs).min / 1000L
            state.setTimeoutTimestamp(
              math.max(earliestMs, state.getCurrentWatermarkMs() + 1L))
          }
          out.result().iterator
      }
  }

  /**
   * Watermarked stream-stream INNER join (the enrichment shape: e.g.
   * impressions joined with their clicks): equality on `keyCol` plus a
   * bounded event-time range — the right event must fall in
   * `[left time, left time + within]`. The time bound is what lets Spark
   * compute a state-eviction frontier from the two watermarks; without
   * it, both sides' state would grow forever. Output carries the left
   * columns plus the right side's non-key columns (right's prefixed with
   * nothing — names must not collide apart from the key).
   */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   leftTimeCol: String, rightTimeCol: String,
                   watermark: String, within: String): DataFrame = {
    val l = left.withWatermark(leftTimeCol, watermark).alias("l")
    val r = right.withWatermark(rightTimeCol, watermark).alias("r")
    val joined = l.join(r,
      col(s"l.$keyCol") === col(s"r.$keyCol") &&
        col(s"r.$rightTimeCol") >= col(s"l.$leftTimeCol") &&
        col(s"r.$rightTimeCol") <=
          col(s"l.$leftTimeCol") + expr(s"interval $within"))
    val rightCols = right.columns.filterNot(_ == keyCol)
      .map(c => col(s"r.$c").as(c))
    joined.select(left.columns.map(c => col(s"l.$c").as(c)).toIndexedSeq ++
      rightCols: _*)
  }

  /**
   * Streaming deduplication bounded by the watermark: duplicates of a key
   * arriving within the watermark horizon are dropped, and per-key state
   * is evicted once the watermark passes — so state is O(keys per
   * horizon), not O(all keys ever seen) (`dropDuplicates` without the
   * watermark variant keeps state forever). The batch equivalent is a
   * plain `dropDuplicates(keys)` when each key's duplicates share the
   * horizon.
   */
  def dedupWithinWatermark(stream: DataFrame, timeCol: String,
                           watermark: String,
                           keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "dedupWithinWatermark needs at least one key")
    stream.withWatermark(timeCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }

  /**
   * Streaming point-in-time enrichment: each micro-batch of facts is
   * resolved against the SCD2 dimension version valid AT the fact's own
   * event time (via [[graft.operators.AsOfJoin.temporalLookup]]), then
   * handed to `sink`. `dim` is re-evaluated per batch, so a dimension
   * updated mid-stream applies from the next batch — while HISTORICAL
   * facts still resolve to historical versions: replaying yesterday's
   * events against today's dimension yields yesterday's attributes.
   * (A plain stream-static join would stamp every fact with the CURRENT
   * version — the feature-leakage bug this operator exists to prevent.)
   *
   * Per batch this costs the as-of's one shuffle over |batch|+|dim
   * versions in the touched keys|; state lives in the streaming engine's
   * checkpoint only (the lookup itself is stateless).
   */
  def enrichPointInTime(facts: DataFrame, dim: () => DataFrame,
                        factTime: String, validFrom: String, validTo: String,
                        by: Seq[String])
                       (sink: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    facts.writeStream.foreachBatch { (batch: DataFrame, id: Long) =>
      sink(graft.operators.AsOfJoin.temporalLookup(
        batch, dim(), factTime, validFrom, validTo, by), id)
    }
  }

  /**
   * Streaming drift monitor — the Deequ-style anomaly watch applied
   * per micro-batch: profile the batch with
   * [[graft.operators.Expectations.metricsProfile]] (integer metrics,
   * one scan of the batch), judge it against the ACCUMULATED history
   * in the `metricsTable` managed table with
   * [[graft.operators.Expectations.driftCheck]] (engine-exact
   * verdicts), hand the verdict frame to `onVerdict` (alerting /
   * gating is the caller's policy), then append this epoch's profile
   * to the metrics table EXACTLY-ONCE (txn-stamped; a replayed
   * micro-batch is recognized via `lastTxnVersion` and skipped, so
   * the history never double-counts an epoch).
   *
   * State is the metrics table itself — one row per (epoch, metric,
   * column), O(metrics) per batch however large the data — and it
   * doubles as the monitoring log: `SELECT * FROM graft.metrics` is
   * the drift history.
   */
  def monitorDrift(stream: DataFrame, metricsDsl: String,
                   metricsTable: String, tolPpm: Long)
                  (onVerdict: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.Expectations
    val metrics = Expectations.parseMetrics(metricsDsl)
    stream.writeStream.foreachBatch { (data: DataFrame, epoch: Long) =>
      val spark = data.sparkSession
      val t = graft.table.ManagedTable(spark, metricsTable)
      if (!(t.exists && t.lastTxnVersion(MonitorDriftApp).exists(epoch <= _))) {
        val batch = org.apache.spark.sql.graft.StreamingFrame.unmark(data)
        val prof = Expectations.metricsProfile(batch, metrics)
          .withColumn("epoch", lit(epoch))
          .select("epoch", "metric", "column", "value")
          .localCheckpoint()
        val history =
          if (t.exists) t.read.select("metric", "column", "value")
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            prof.drop("epoch").schema)
        onVerdict(Expectations.driftCheck(
          prof.drop("epoch"), history, tolPpm), epoch)
        graft.write.Writers.append(spark, metricsTable, prof,
          graft.write.WriteOptions(), txn = Some((MonitorDriftApp, epoch)))
        ()
      }
    }
  }

  private val MonitorDriftApp = "graft-drift-monitor"

  /** Batch (non-streaming) sessionization with identical semantics —
    * lag() over an event-time window; used as the oracle for the
    * streaming path and as the backfill implementation. */
  def sessionizeBatch(events: DataFrame, keyCol: String, tsCol: String,
                      gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol))
    events
      .withColumn("prev_ts", lag(col(tsCol), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col(tsCol) - col("prev_ts") > gapMs, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("session_id"))
      .agg(min(col(tsCol)).as("startMs"), max(col(tsCol)).as("endMs"),
        count(lit(1)).as("nEvents"))
      .drop("session_id")
  }
}
