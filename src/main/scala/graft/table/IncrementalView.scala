package graft.table

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incrementally-maintained materialized aggregate over a [[ManagedTable]]'s
 * change feed — the "materialized view refresh" a 100 TB fact table needs:
 * recomputing `GROUP BY` aggregates over the whole fact on every load is an
 * O(table) scan per refresh; this view reads ONLY the change feed of the
 * unprocessed version range and folds it into the stored aggregate state.
 *
 * ADDITIVE aggregates — `count(*)` and `sum(col)` (avg is derivable as
 * sum/cnt by the reader) — maintain by exact delta, signed by change
 * type: insert / update_postimage add, delete / update_preimage
 * subtract. Additivity is what makes the view correct under ANY
 * change-feed granularity: a dir-rewrite commit that reports "all old
 * dir rows deleted + surviving rows inserted" (this table's DML without
 * `captureChangeData`, coarser than Delta's minimal CDF) nets out to
 * exactly the same delta as a minimal per-row feed.
 *
 * `minMaxCols` adds MIN/MAX, which are NOT delta-maintainable under
 * deletes (removing the current max says nothing about the runner-up).
 * They maintain by TOUCHED-GROUP recompute instead: each refresh
 * recomputes min/max for exactly the groups present in the change-feed
 * slice, reading those groups back from the fact — via
 * [[ManagedTable.readWhere]] dir-stat skipping when the (single) group
 * key's touched set fits an IN-list, else a semi-join — and merges them
 * with untouched state rows, whose min/max carry over unread. Cost is
 * O(changed groups' rows), not O(table); a change feed is COMPLETE by
 * construction, so any later change to a group re-touches it — which is
 * also why recomputing against the CURRENT snapshot is sound mid-stream:
 * a group whose future commits differ from the watermark snapshot will
 * be touched again by exactly those commits (min/max may transiently
 * lead the additive columns while a backlog drains; they converge at the
 * head, and batch [[refresh]] always runs at the head).
 *
 * Sums are carried as `DECIMAL(28,6)` — exact integer arithmetic in
 * 10⁻⁶ units, so subtraction round-trips to zero exactly (a double
 * accumulator would drift: (a + b) − b ≠ a in floats, and a view that is
 * refreshed thousands of times compounds it). Min/max keep the source
 * column's own type (they are order statistics, not accumulations).
 *
 * State lives in its own ManagedTable (time travel, history and
 * concurrency checks for free); the last folded source version rides on
 * each state commit's `userMetadata`, so refresh is idempotent and
 * restart-safe: a re-run reads the watermark from the state's own commit
 * log and processes `(watermark, latest]` or nothing. Refresh cost is
 * O(changes in range) + O(state rows) for the state rewrite — state is
 * group-cardinality-sized, orders of magnitude below the fact; if a
 * view's group count ever rivals the fact, swap the overwrite for the
 * file-scoped scd1 merge + zero-row delete (same delta math).
 */
final class IncrementalAggView(spark: SparkSession, sourcePath: String,
                               statePath: String, groupCols: Seq[String],
                               sumCols: Seq[String],
                               minMaxCols: Seq[String] = Nil) {
  require(groupCols.nonEmpty, "IncrementalAggView needs group columns")

  private val Dec = "decimal(28,6)"
  /** IN-list cap for the touched-group readWhere path: past this the
    * predicate stops paying (and the driver collect stops being free) —
    * the semi-join path takes over. */
  private val MaxInList = 1000
  private def meta(v: Long) = Some(s"""{"sourceVersion":$v}""")
  private val MetaRe = """\{"sourceVersion":(\d+)\}""".r

  private def source = ManagedTable(spark, sourcePath)
  private def state = ManagedTable(spark, statePath)

  private def gCols = groupCols.map(c => col(s"`$c`"))
  private def mmNames =
    minMaxCols.flatMap(c => Seq(s"min_$c", s"max_$c"))

  private def grouped(df: DataFrame, sign: Column,
                      extra: Seq[Column] = Nil) =
    df.groupBy(gCols: _*)
      .agg(sum(sign).as("cnt"),
        (sumCols.map(c =>
          sum(sign * col(s"`$c`").cast(Dec)).cast(Dec).as(s"sum_$c")) ++
          extra): _*)

  private def mmAggs: Seq[Column] = minMaxCols.flatMap(c => Seq(
    min(col(s"`$c`")).as(s"min_$c"), max(col(s"`$c`")).as(s"max_$c")))

  /** The last source version folded into the state (from the state
    * table's own commit metadata). */
  def sourceVersion: Long =
    // most recent watermark-bearing commit: maintenance on the state
    // table (OPTIMIZE/ANALYZE record no watermark) is transparent, and
    // RESTORE carries the restored fold's own watermark
    CdfNetting.commitMetas(state, "agg view", statePath)
      .collectFirst { case MetaRe(v) => v.toLong }
      .getOrElse(throw new IllegalStateException(
        "no commit in the agg view state's history carries a sourceVersion " +
          "watermark — was the state table created outside the view?"))

  /** Build the state from the source's CURRENT snapshot (one full
    * scan — the only O(table) step in the view's lifetime). */
  def initialize(): Long = {
    val v = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    state.write(grouped(source.read, lit(1L), mmAggs), "VIEW_INIT",
      "replace", meta(v))
    source.setRetentionHold(statePath, v)
    v
  }

  /** The fact restricted to the touched groups: an IN-list predicate
    * through [[ManagedTable.readWhere]]'s dir-stat skipping when the
    * single group key's touched set is small (the common case — a daily
    * load touches few groups of a well-clustered fact), else a
    * group-keyed LEFT SEMI join (broadcastable: touched is
    * group-cardinality-bounded). */
  private def touchedFact(touched: DataFrame): DataFrame = {
    if (groupCols.size == 1) {
      val g = groupCols.head
      val vals = touched.limit(MaxInList + 1).collect().map(_.get(0))
      if (vals.length <= MaxInList) {
        val nonNull = vals.filter(_ != null)
        val base: Column =
          if (nonNull.isEmpty) lit(false)
          else col(s"`$g`").isin(nonNull.toIndexedSeq: _*)
        val pred =
          if (vals.contains(null)) base || col(s"`$g`").isNull else base
        return source.readWhere(pred)
      }
    }
    // null-safe semi join: NULL is a legal group key, and a plain
    // name-based equi join would silently drop its fact rows
    val t = touched.select(groupCols.map(c => col(s"`$c`").as(s"__t_$c")): _*)
    val cond = groupCols.map(c => col(s"`$c`") <=> col(s"`__t_$c`"))
      .reduce(_ && _)
    source.read.join(t, cond, "left_semi")
  }

  /** Fold a change-feed slice into the state and advance the watermark
    * to `newWatermark` — the shared delta algebra behind [[refresh]]
    * (batch range) and [[refreshStream]] (micro-batch). Race-safe
    * WITHOUT id gates (this fold has none — counts just move): the
    * fence is captured BEFORE the standing state is read, and the
    * watermark re-checks under that fence against `from` (the
    * watermark the slice was netted from), so a racing refresh that
    * already folded the whole range turns this call into a no-op, one
    * that folded a DIFFERENT range refuses loudly, and one landing
    * after the fence makes the replace fail its `expectedPrevVersion`
    * — the additive fold can never double-apply a slice. */
  private def foldDelta(cdf: DataFrame, from: Long, newWatermark: Long,
                        txn: Option[(String, Long)] = None): Unit = {
    val fence = state.latestVersion
    val w = sourceVersion
    if (w >= newWatermark) return
    require(w == from,
      s"view state advanced from $from to $w while this refresh netted " +
        "its slice — a concurrent refresh interleaved; re-run refresh()")
    val sign = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .otherwise(-1L)
    val delta = grouped(cdf, sign)
    val merged =
      if (minMaxCols.isEmpty) {
        val cur = state.read.select(
          (gCols ++ (col("cnt") +: sumCols.map(c => col(s"`sum_$c`")))): _*)
        cur.unionByName(delta)
          .groupBy(gCols: _*)
          .agg(sum(col("cnt")).as("cnt"),
            sumCols.map(c => sum(col(s"`sum_$c`")).cast(Dec).as(s"sum_$c")): _*)
          .filter(col("cnt") > 0)
      } else {
        // NULL group keys are legal groups, so the merge avoids equi
        // joins (NULL never equals NULL there) and instead tags four
        // row streams and folds them in ONE null-safe groupBy:
        //   cur   — the stored state (additive + old min/max),
        //   delta — the signed change-feed aggregate,
        //   rec   — min/max recomputed over touched groups' fact rows,
        //   touch — membership markers for the touched-group set.
        // Additive columns sum over cur+delta; min/max take rec's value
        // when the group was touched, else carry cur's — conditional
        // aggregates over the source tag, one shuffle total.
        val touched = cdf.select(gCols: _*).distinct().localCheckpoint()
        val rec = touchedFact(touched).groupBy(gCols: _*)
          .agg(mmAggs.head, mmAggs.tail: _*)
        val cur = state.read.select((gCols ++ (col("cnt") +:
          sumCols.map(c => col(s"`sum_$c`"))) ++
          mmNames.map(c => col(s"`$c`"))): _*)
          .withColumn("__src__", lit("cur"))
        val tagged = cur
          .unionByName(delta.withColumn("__src__", lit("delta")),
            allowMissingColumns = true)
          .unionByName(rec.withColumn("__src__", lit("rec")),
            allowMissingColumns = true)
          .unionByName(touched.withColumn("__src__", lit("touch")),
            allowMissingColumns = true)
        val additive = col("__src__").isin("cur", "delta")
        val isTouched = max(when(col("__src__") === "touch", 1).otherwise(0)) === 1
        def pick(c: String, agg: Column => Column) =
          when(isTouched, agg(when(col("__src__") === "rec", col(s"`$c`"))))
            .otherwise(agg(when(col("__src__") === "cur", col(s"`$c`")))).as(c)
        tagged.groupBy(gCols: _*)
          .agg(sum(when(additive, col("cnt"))).as("cnt"),
            (sumCols.map(c => sum(when(additive, col(s"`sum_$c`")))
              .cast(Dec).as(s"sum_$c")) ++
              minMaxCols.flatMap(c => Seq(
                pick(s"min_$c", min), pick(s"max_$c", max)))): _*)
          .filter(col("cnt") > 0)
      }
    state.write(merged, "VIEW_REFRESH", "replace", meta(newWatermark),
      expectedPrevVersion = fence, txnUpdate = txn)
    // pin the new watermark against source vacuum (slides forward as
    // slices fold; a crashed fold keeps the older, SAFER pin)
    source.setRetentionHold(statePath, newWatermark)
  }

  /** Fold the unprocessed change-feed range into the state. No-op (and
    * no new commit) when already current. Returns the new watermark. */
  def refresh(): Long = {
    val last = sourceVersion
    val latest = source.latestVersion.getOrElse(throw new IllegalStateException(
      s"source table $sourcePath does not exist"))
    require(latest >= last,
      s"source went backwards: watermark $last, latest $latest — was the " +
        "source table recreated? Re-initialize the view.")
    if (latest == last) return last
    foldDelta(CdfNetting.cdfSlice(source, last, latest, "agg view"),
      last, latest)
    latest
  }

  /** STREAMING maintenance: the source's CDF stream
    * (`format("graft-table")`, `readChangeFeed=true`) folds into the
    * state per micro-batch with the SAME delta algebra as [[refresh]].
    * Exactly-once: the state commit carries the (checkpoint, epoch)
    * transaction high-water, so a crash-replayed micro-batch is
    * recognized and skipped; each fold also advances the
    * `sourceVersion` watermark to the batch's max `_commit_version`
    * and drops batch rows at or below it — so batch [[refresh]] calls
    * interleave safely with BOTH a resumed checkpoint (whose replayed
    * WAL offsets overlap the refreshed range) and a re-created one.
    * Caller drains/stops the returned query. */
  def refreshStream(checkpoint: String,
                    trigger: org.apache.spark.sql.streaming.Trigger =
                      org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val appId = s"graft-view:$checkpoint"
    val start = sourceVersion + 1
    val stream = graft.streaming.StreamOps.streamTable(spark, sourcePath,
      startingVersion = Some(start), readChangeFeed = true)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        if (state.lastTxnVersion(appId).exists(_ >= epochId)) {
          // A genuinely replayed epoch re-delivers only commits the
          // watermark already covers. If this "replayed" epoch holds
          // NEWER commits, the checkpoint was DELETED and its path
          // reused: the fresh query restarted epochs at 0, this guard
          // would silently drop unseen data, and the advancing offsets
          // would lose it forever — refuse instead.
          val last = sourceVersion
          if (!batch.filter(col("_commit_version") > last).isEmpty)
            throw new IllegalStateException(
              s"view stream checkpoint '$checkpoint' was re-created: " +
                s"epoch $epochId is at or below the recorded high-water " +
                "but carries commits beyond the watermark. Use a FRESH " +
                "checkpoint path (epoch high-waters are keyed by path).")
        } else {
          // drop rows at or below the watermark: on a RESUMED checkpoint
          // after an interleaved batch refresh(), the source replays
          // from its own WAL offset — commits the batch refresh already
          // folded would otherwise double-apply. localCheckpoint so the
          // slice is read once (max + fold are two actions).
          val last = sourceVersion
          val fresh = batch.filter(col("_commit_version") > last)
            .localCheckpoint()
          val maxV = fresh.agg(max(col("_commit_version"))).head()
          if (!maxV.isNullAt(0))
            foldDelta(fresh, last, maxV.getLong(0), Some((appId, epochId)))
        }
        ()
      }
      .trigger(trigger)
      .start()
  }

  /** The maintained aggregate. */
  def read: DataFrame = state.read
}
