package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics kernels over event streams: cohort retention and
  * time-series resampling with gap fill. Both are pure integer/carried-
  * value computations — no float arithmetic ever enters, so results are
  * engine-exact — and both keep the 100 TB shape: every aggregate is a
  * hash aggregate on a bounded key space (users, (key, bin)), every
  * window partitions on a high-cardinality key, and the only sort per
  * partition is over time BINS (bounded by the time range / bin width),
  * never raw events. */
object EventAnalytics {

  val MicrosPerDay: Long = 86400L * 1000000L

  /** FLOOR division `ts // p`, matched to the DuckDB oracle's `//` for
    * ALL inputs: Spark's bare `div` truncates toward zero, so a
    * pre-1970 (negative) microsecond timestamp would land one bin high
    * and collapse with bin 0 across the epoch boundary. Subtracting
    * `pmod` (always in `[0, p)`) first makes the quotient exact-integer
    * floor division for any sign — and stays in BIGINT arithmetic
    * end-to-end (a double quotient at a period boundary can round
    * across the bin edge). */
  private def floorDivExpr(colName: String, p: Long): org.apache.spark.sql.Column =
    expr(s"(`$colName` - pmod(`$colName`, ${p}L)) div ${p}L")

  /** Classic cohort retention: users are cohorted by the period of
    * their FIRST activity, and each (cohort, offset) cell counts users
    * from that cohort active `offset` periods later. Periods are pure
    * integer FLOOR indices `ts_us // periodMicros` (correct for
    * pre-1970 timestamps too) — no calendar functions, whose
    * week-start and timezone conventions differ across engines.
    *
    * Shape: one distinct on (user, period) collapses raw events to
    * user-periods (the only pass over the events); the per-user min is
    * a hash aggregate over user-periods; the cell counts group the
    * SAME user-period rows, so `count(*)` IS `count(distinct user)`
    * with no distinct-aggregate rewrite. `retention_rate` is one
    * integer-to-double division of two exact counts. */
  def cohortRetention(events: DataFrame, tsUsCol: String = "ts_us",
                      userCol: String = "user_id",
                      periodMicros: Long = 7 * MicrosPerDay): DataFrame = {
    require(periodMicros > 0, s"periodMicros must be positive")
    val userPeriods = events.select(col(userCol).as("__user__"),
        floorDivExpr(tsUsCol, periodMicros).as("__period__"))
      .distinct()
    val cohorts = userPeriods.groupBy("__user__")
      .agg(min("__period__").as("cohort_period"))
    val sizes = cohorts.groupBy("cohort_period")
      .agg(count(lit(1)).as("n_cohort_users"))
    userPeriods.join(cohorts, Seq("__user__"))
      .groupBy(col("cohort_period"),
        (col("__period__") - col("cohort_period")).as("period_offset"))
      .agg(count(lit(1)).as("n_active_users"))
      .join(sizes, Seq("cohort_period"))
      .select(col("cohort_period"), col("period_offset"),
        col("n_active_users"), col("n_cohort_users"),
        (col("n_active_users").cast("double") / col("n_cohort_users"))
          .as("retention_rate"))
  }

  /** Time-boxed ordered funnel — conversion-window semantics on top of
    * the strict-order funnel (the knob every product-analytics engine
    * has; the plain ordered form is `Queries.funnelSteps`): a user
    * advances from step `i` to step `i+1` only on an event that is
    *
    *   - strictly later than their step-`i` completion time,
    *   - within `maxStepGapMicros` of it (when set — per-step expiry),
    *   - within `conversionWindowMicros` of their step-1 ANCHOR time
    *     (when set — the whole-funnel deadline).
    *
    * `anchorPolicy` picks the step-1 ANCHORING rule — the semantics
    * knob users of every product-analytics engine eventually ask
    * about, because a user whose FIRST step-1 event expires may still
    * have a later step-1 event that would convert:
    *
    *   - `"earliest"` (default): the anchor is the user's first
    *     step-1 event and each step completes at its earliest
    *     qualifying event — the deterministic one-pass-per-step
    *     convention several commercial engines default to;
    *   - `"any_qualifying"`: EVERY step-1 event is a candidate
    *     anchor; the greedy chain runs per (user, anchor) and a user
    *     counts at step `k` when ANY anchor's chain reaches it — the
    *     re-anchoring semantics under which a later session rescues a
    *     user the earliest anchor expired. It strictly dominates
    *     `earliest` (the earliest anchor is one of the candidates, so
    *     per-step counts are monotonically ≥), and the chain's hash
    *     aggregates stay user-keyed — anchors add one grouping
    *     column bounded by the user's own step-1 events, same shuffle
    *     count.
    *
    * Within an anchor the chain is greedy-earliest (with per-step
    * gaps, greedy can miss chains a non-greedy event choice would
    * complete — a policy every engine shares, documented here); all
    * arithmetic is integer microseconds, so results are engine-exact.
    *
    * Shape: one user-keyed hash aggregate per step, each joined to the
    * previous stage's user set — the same single hash partitioning
    * serves the whole chain, stages shrink monotonically, and the
    * 1-row per-step counts cross-join at the end (scalars, not data).
    * Output: `(step, event_type, n_users)`, one row per step. */
  def funnelWindowed(events: DataFrame, steps: Seq[String],
                     tsUsCol: String = "ts_us", userCol: String = "user_id",
                     typeCol: String = "event_type",
                     conversionWindowMicros: Option[Long] = None,
                     maxStepGapMicros: Option[Long] = None,
                     anchorPolicy: String = "earliest"): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least two steps, got $steps")
    require(steps.distinct.size == steps.size,
      s"funnel steps must be distinct, got $steps")
    conversionWindowMicros.foreach(w => require(w > 0, "window must be positive"))
    maxStepGapMicros.foreach(g => require(g > 0, "max gap must be positive"))
    val frames = anchorPolicy match {
      case "earliest" =>
        funnelStages(events, steps, tsUsCol, userCol, typeCol,
          conversionWindowMicros, maxStepGapMicros)
      case "any_qualifying" =>
        funnelStagesAnyAnchor(events, steps, tsUsCol, userCol, typeCol,
          conversionWindowMicros, maxStepGapMicros)
      case other => throw new IllegalArgumentException(
        s"anchorPolicy must be 'earliest' or 'any_qualifying', got $other")
    }
    // earliest frames hold ONE row per user (count == distinct count,
    // no distinct-aggregate rewrite); anchored frames hold one row per
    // (user, anchor) and must de-dup the user
    val anchored = anchorPolicy == "any_qualifying"
    frames.map { case (step, name, f) =>
      f.agg((if (anchored) countDistinct(col("__u__"))
             else count(lit(1))).as("n_users"))
        .select(lit(step).as("step"), lit(name).as("event_type"),
          col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** The greedy-earliest stage chain shared by [[funnelWindowed]] and
    * [[funnelConversionStats]]: one frame per step with the user's
    * completion time `__tp__`, the step-1 anchor `__t1__`, and the
    * PREVIOUS step's completion `__tprev__` (== `__tp__` at step 1). */
  private def funnelStages(events: DataFrame, steps: Seq[String],
                           tsUsCol: String, userCol: String, typeCol: String,
                           conversionWindowMicros: Option[Long],
                           maxStepGapMicros: Option[Long])
      : Seq[(Int, String, DataFrame)] = {
    val ev = events.select(col(userCol).as("__u__"), col(typeCol).as("__t__"),
      col(tsUsCol).as("__ts__"))
    var stage = ev.filter(col("__t__") === steps.head)
      .groupBy("__u__").agg(min("__ts__").as("__tp__"))
      .withColumn("__t1__", col("__tp__"))
      .withColumn("__tprev__", col("__tp__"))
    val out = scala.collection.mutable.Buffer((1, steps.head, stage))
    steps.drop(1).zipWithIndex.foreach { case (s, i) =>
      var cond = col("__ts__") > col("__tp__")
      maxStepGapMicros.foreach(g => cond = cond && col("__ts__") <= col("__tp__") + g)
      conversionWindowMicros.foreach(w => cond = cond && col("__ts__") <= col("__t1__") + w)
      stage = ev.filter(col("__t__") === s)
        .join(stage.select(col("__u__"), col("__tp__"), col("__t1__")), "__u__")
        .filter(cond)
        .groupBy("__u__")
        .agg(min("__ts__").as("__tp__"), min("__t1__").as("__t1__"),
          min("__tp__").as("__tprev__"))
      out += ((i + 2, s, stage))
    }
    out.toSeq
  }

  /** The `any_qualifying` anchor chain ([[funnelWindowed]]'s
    * re-anchoring policy): stage 1 keeps EVERY distinct step-1 event
    * time as its own anchor `__a__`, and each later stage runs the
    * greedy-earliest fold per (user, anchor) — the group key grows by
    * the anchor column, nothing else changes, so the whole chain still
    * rides one hash partitioning on the user. Anchors per user are
    * bounded by that user's own step-1 events (sessions, not corpus),
    * so the extra grouping column never explodes a partition. */
  private def funnelStagesAnyAnchor(events: DataFrame, steps: Seq[String],
                                    tsUsCol: String, userCol: String,
                                    typeCol: String,
                                    conversionWindowMicros: Option[Long],
                                    maxStepGapMicros: Option[Long])
      : Seq[(Int, String, DataFrame)] = {
    val ev = events.select(col(userCol).as("__u__"), col(typeCol).as("__t__"),
      col(tsUsCol).as("__ts__"))
    var stage = ev.filter(col("__t__") === steps.head)
      .select(col("__u__"), col("__ts__").as("__a__"))
      .distinct()
      .withColumn("__tp__", col("__a__"))
      .withColumn("__t1__", col("__a__"))
    val out = scala.collection.mutable.Buffer((1, steps.head, stage))
    steps.drop(1).zipWithIndex.foreach { case (s, i) =>
      var cond = col("__ts__") > col("__tp__")
      maxStepGapMicros.foreach(g => cond = cond && col("__ts__") <= col("__tp__") + g)
      conversionWindowMicros.foreach(w => cond = cond && col("__ts__") <= col("__t1__") + w)
      stage = ev.filter(col("__t__") === s)
        .join(stage.select(col("__u__"), col("__a__"), col("__tp__"),
          col("__t1__")), Seq("__u__"))
        .filter(cond)
        .groupBy("__u__", "__a__")
        .agg(min("__ts__").as("__tp__"), min("__t1__").as("__t1__"))
      out += ((i + 2, s, stage))
    }
    out.toSeq
  }

  /** Time-to-convert statistics per funnel transition — the metric
    * panel next to [[funnelWindowed]]'s counts: for each step `i ≥ 2`,
    * the distribution of `t_i − t_{i−1}` over converting users. All
    * engine-exact integers:
    *
    *   - `n_converted`, `min_us`, `max_us`, `sum_us` — one hash
    *     aggregate, exact at any scale;
    *   - `p50_us`, `p90_us` — DISCRETE quantiles by counting sort:
    *     deltas floor to `quantileUnitMicros` buckets (default 1 ms —
    *     the resolution knob that bounds distinct values), one
    *     `(step, bucket)` count, a cumulative window over the
    *     DISTINCT buckets (not the users), and the quantile is the
    *     smallest bucket whose cumulative count reaches `ceil(q·n)` —
    *     reported in micros, floored to the unit. Exact for the
    *     bucketed domain, deterministic in any engine, and the sort
    *     is over distinct buckets — never a per-user sort, which is
    *     what makes exact quantiles survive a 10^9-user funnel.
    *
    * Greedy-earliest semantics and both expiry knobs are exactly
    * [[funnelWindowed]]'s (shared chain). Output one row per
    * transition: `(step, event_type, n_converted, min_us, p50_us,
    * p90_us, max_us, sum_us)`; transitions nobody completed emit no
    * row (no quantile of an empty set). */
  def funnelConversionStats(events: DataFrame, steps: Seq[String],
                            tsUsCol: String = "ts_us",
                            userCol: String = "user_id",
                            typeCol: String = "event_type",
                            conversionWindowMicros: Option[Long] = None,
                            maxStepGapMicros: Option[Long] = None,
                            quantileUnitMicros: Long = 1000L): DataFrame = {
    require(quantileUnitMicros > 0, "quantileUnitMicros must be positive")
    val frames = funnelStages(events, steps, tsUsCol, userCol, typeCol,
      conversionWindowMicros, maxStepGapMicros)
    frames.drop(1).map { case (step, name, f) =>
      val deltas = f.select((col("__tp__") - col("__tprev__")).as("__d__"))
      val base = deltas.agg(count(lit(1)).as("n_converted"),
        min("__d__").as("min_us"), max("__d__").as("max_us"),
        sum("__d__").as("sum_us"))
      // counting-sort quantiles: deltas are strictly positive (strict
      // order), so div == floor division
      val hist = deltas
        .groupBy(expr(s"__d__ div ${quantileUnitMicros}L").as("__b__"))
        .agg(count(lit(1)).as("__c__"))
      val wCum = org.apache.spark.sql.expressions.Window
        .orderBy("__b__")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val cum = hist.withColumn("__cum__", sum("__c__").over(wCum))
        .crossJoin(broadcast(base.select(col("n_converted").as("__n__"))))
      // ceil(q·n) as pure integer arithmetic: k50 = (n+1) div 2,
      // k90 = (9n+9) div 10
      val quant = cum.agg(
        min(when(col("__cum__") >= expr("(__n__ + 1) div 2"),
          col("__b__") * quantileUnitMicros)).as("p50_us"),
        min(when(col("__cum__") >= expr("(9 * __n__ + 9) div 10"),
          col("__b__") * quantileUnitMicros)).as("p90_us"))
      base.filter(col("n_converted") > 0).crossJoin(broadcast(quant))
        .select(lit(step).as("step"), lit(name).as("event_type"),
          col("n_converted"), col("min_us"), col("p50_us"), col("p90_us"),
          col("max_us"), col("sum_us"))
    }.reduce(_ unionByName _)
  }

  /** Resample a (key, time, value) stream onto a regular bin grid with
    * last-observation-carried-forward gap fill — the standard
    * time-series regularization before any windowed model sees the
    * data. Three steps, all engine-exact:
    *
    *   1. per (key, bin) pick the LAST observation — row_number over
    *      (ts desc, then `tieCol` desc for a total order), never an
    *      argmax whose tie rule is engine-specific;
    *   2. build the dense spine with `sequence(min_bin, max_bin)` per
    *      key (bins are floor `ts_us // binMicros`, pure integers; spine
    *      length is the key's time span over the bin width — bounded
    *      by the calendar, not the event count);
    *   3. LOCF via `last(value, ignoreNulls) over (rows unbounded
    *      preceding..current)` ordered by bin. The carried value is an
    *      untouched copy of an input value — no arithmetic, so doubles
    *      survive hashing.
    *
    * `filled = 0` marks carried rows, `n_events` the bin's raw count.
    * Bins before a key's first observation cannot carry (no prior
    * value) and are excluded by construction since the spine starts at
    * the key's own min bin. */
  def resampleLocf(events: DataFrame, keyCol: String, tsUsCol: String,
                   valueCol: String, tieCol: String,
                   binMicros: Long = MicrosPerDay): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive")
    val binned = events.select(col(keyCol).as("key"),
      floorDivExpr(tsUsCol, binMicros).as("bin"),
      col(tsUsCol).as("__ts__"), col(tieCol).as("__tie__"),
      col(valueCol).as("__v__"))
    val wLast = Window.partitionBy(col("key"), col("bin"))
      .orderBy(col("__ts__").desc, col("__tie__").desc)
    val perBin = binned.withColumn("__rn__", row_number().over(wLast))
      .groupBy(col("key"), col("bin"))
      .agg(max(when(col("__rn__") === 1, col("__v__"))).as("last_value"),
        count(lit(1)).as("n_events"))
    val spine = perBin.groupBy("key")
      .agg(min("bin").as("__b0__"), max("bin").as("__b1__"))
      .select(col("key"),
        explode(sequence(col("__b0__"), col("__b1__"))).as("bin"))
    val wFill = Window.partitionBy(col("key")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(perBin, Seq("key", "bin"), "left")
      .select(col("key"), col("bin"),
        last(col("last_value"), ignoreNulls = true).over(wFill).as("value"),
        when(col("last_value").isNotNull, 1).otherwise(0).as("filled"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }
}
