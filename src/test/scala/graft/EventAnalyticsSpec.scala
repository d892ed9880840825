package graft

import graft.operators.EventAnalytics
import org.apache.spark.sql.functions._

/** Planted-scenario pins for the event-analytics kernels (the DuckDB
  * oracle covers cross-engine exactness; these pin the semantics). */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val W = 7 * EventAnalytics.MicrosPerDay

  test("cohortRetention: cells, sizes, and rates from hand-built activity") {
    // user 1: weeks 0, 1, 3   user 2: weeks 0, 1   user 3: week 1 only
    // cohorts: {week 0: users 1,2}, {week 1: user 3}
    val ev = Seq(
      (1L, 0L * W + 5), (1L, 1L * W + 9), (1L, 3L * W),
      (1L, 3L * W + 17), // same-period duplicate must not double-count
      (2L, 0L * W), (2L, 1L * W + 1),
      (3L, 1L * W + 2)).toDF("user_id", "ts_us")
    val got = EventAnalytics.cohortRetention(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === Map(
      (0L, 0L) -> ((2L, 2L, 1.0)),
      (0L, 1L) -> ((2L, 2L, 1.0)),
      (0L, 3L) -> ((1L, 2L, 0.5)),
      (1L, 0L) -> ((1L, 1L, 1.0))))
  }

  test("cohortRetention: pre-1970 timestamps bin by FLOOR division " +
      "(no collapse across the epoch)") {
    // user 1 active in week -1 and week 0: truncate-toward-zero would
    // put ts = -5 into bin 0 and merge both events into one cohort cell
    val ev = Seq(
      (1L, -5L), (1L, 3L),        // bins -1 and 0 under floor division
      (2L, -W - 1), (2L, -1L)     // bins -2 and -1
    ).toDF("user_id", "ts_us")
    val got = EventAnalytics.cohortRetention(ev)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === Map(
      (-1L, 0L) -> ((1L, 1L)), (-1L, 1L) -> ((1L, 1L)),
      (-2L, 0L) -> ((1L, 1L)), (-2L, 1L) -> ((1L, 1L))))
  }

  test("resampleLocf: negative-timestamp bins floor, not truncate") {
    val D = EventAnalytics.MicrosPerDay
    val ev = Seq(
      ("a", -1L, 1L, 1.0),        // bin -1 under floor (0 under truncate)
      ("a", D + 1, 2L, 2.0)       // bin 1 — bins -1..1, bin 0 carried
    ).toDF("k", "ts_us", "event_id", "v")
    val got = EventAnalytics.resampleLocf(ev, "k", "ts_us", "v", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getInt(3)))).toMap
    assert(got === Map(
      ("a", -1L) -> ((1.0, 1)),
      ("a", 0L) -> ((1.0, 0)),
      ("a", 1L) -> ((2.0, 1))))
  }

  test("cohortRetention: offset 0 always covers the whole cohort") {
    val ev0 = spark.read.parquet(s"$sf/events.parquet")
    val ev = ev0.withColumn("ts_us", Queries.eventMicros(ev0))
    val bad = EventAnalytics.cohortRetention(ev)
      .filter(col("period_offset") === 0 &&
        col("n_active_users") =!= col("n_cohort_users"))
      .count()
    assert(bad === 0L)
  }

  test("funnelWindowed: planted convert/expire sequences hit exactly the " +
      "right bounds") {
    val D = EventAnalytics.MicrosPerDay
    val ev = Seq(
      // user 1: converts fully — click 1d after view, buy 1d after click
      (1L, "view", 0L), (1L, "click", D), (1L, "purchase", 2 * D),
      // user 2: click EXACTLY at the 2d gap bound (inclusive — counts),
      // purchase EXACTLY at the next 2d gap bound and inside the window
      (2L, "view", 0L), (2L, "click", 2 * D), (2L, "purchase", 4 * D),
      // user 3: click one microsecond past the gap — expires at step 2
      (3L, "view", 0L), (3L, "click", 2 * D + 1),
      // user 4: click in time, purchase past the 5d window — step 3 lost
      (4L, "view", 0L), (4L, "click", D), (4L, "purchase", 5 * D + 1),
      // user 5: clicks in time but the only purchase PRECEDES the
      // click — strict order drops step 3
      (5L, "view", 0L), (5L, "purchase", D), (5L, "click", 2 * D),
      // user 6: greedy anchor pin — the FIRST view anchors the window,
      // so the 10d click sits outside it even though a later view at
      // 9d would have admitted it
      (6L, "view", 0L), (6L, "view", 9 * D), (6L, "click", 10 * D)
    ).toDF("user_id", "event_type", "ts_us")
    val got = EventAnalytics.funnelWindowed(ev,
        Seq("view", "click", "purchase"),
        conversionWindowMicros = Some(5 * D),
        maxStepGapMicros = Some(2 * D))
      .collect().map(r => r.getInt(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got === Map(
      1 -> (("view", 6L)),       // all six viewed
      2 -> (("click", 4L)),      // users 1, 2, 4, 5 (3 gap-expired, 6 window)
      3 -> (("purchase", 2L))))  // users 1, 2 (4 past window, 5 wrong order)
  }

  test("funnelConversionStats: counting-sort quantiles hit the exact " +
      "discrete ranks; sub-unit deltas floor to their bucket") {
    // ten users convert view→click with deltas 1..10 ms; one more user
    // converts at 1.5 ms (floors to the 1 ms bucket)
    val ev = (1 to 10).flatMap { u =>
      Seq((u.toLong, "view", 0L), (u.toLong, "click", u * 1000L))
    } ++ Seq((11L, "view", 0L), (11L, "click", 1500L))
    val got = EventAnalytics.funnelConversionStats(
        ev.toDF("user_id", "event_type", "ts_us"), Seq("view", "click"))
      .collect()
    assert(got.length === 1)
    val r = got.head
    assert(r.getInt(0) === 2 && r.getString(1) === "click")
    // n=11: k50 = 6 → sorted buckets (1,1,2,..,10) 6th = 5 ms;
    // k90 = ceil(9.9) = 10 → 10th bucket = 9 ms
    assert((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
      r.getLong(6), r.getLong(7)) ===
      ((11L, 1000L, 5000L, 9000L, 10000L, 56500L)))
  }

  test("funnelConversionStats: a transition nobody completes emits no row") {
    val ev = Seq((1L, "view", 0L), (1L, "click", 5L))
      .toDF("user_id", "event_type", "ts_us")
    val got = EventAnalytics.funnelConversionStats(ev,
      Seq("view", "click", "purchase")).collect()
    assert(got.map(_.getInt(0)).toSeq === Seq(2))
  }

  test("funnelWindowed: unbounded knobs reduce to the strict-order funnel") {
    val D = EventAnalytics.MicrosPerDay
    val ev = Seq(
      (1L, "view", 0L), (1L, "click", 100 * D), (1L, "purchase", 300 * D),
      (2L, "view", 0L)).toDF("user_id", "event_type", "ts_us")
    val got = EventAnalytics.funnelWindowed(ev,
        Seq("view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(got === Map(1 -> 2L, 2 -> 1L, 3 -> 1L))
  }

  test("resampleLocf: gaps carry the last value; ties break on the tie column") {
    val D = EventAnalytics.MicrosPerDay
    val ev = Seq(
      // key a: bins 10 and 13; bin 10 has two same-ts rows — the higher
      // event_id (tie col) must win; bins 11, 12 are carried gaps
      ("a", 10 * D + 100, 1L, 1.5),
      ("a", 10 * D + 100, 2L, 2.5),
      ("a", 13 * D, 3L, 9.0),
      // key b: single bin, no gaps
      ("b", 11 * D + 7, 4L, 4.0)
    ).toDF("k", "ts_us", "event_id", "v")
    val got = EventAnalytics.resampleLocf(ev, "k", "ts_us", "v", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getInt(3), r.getLong(4)))).toMap
    assert(got === Map(
      ("a", 10L) -> ((2.5, 1, 2L)),
      ("a", 11L) -> ((2.5, 0, 0L)),
      ("a", 12L) -> ((2.5, 0, 0L)),
      ("a", 13L) -> ((9.0, 1, 1L)),
      ("b", 11L) -> ((4.0, 1, 1L))))
  }

  test("funnelWindowed anchorPolicy: any_qualifying rescues a later anchor, " +
      "dominates earliest per step, and rejects unknown policies") {
    val D = EventAnalytics.MicrosPerDay
    val A = 1000L * D
    val ev = Seq(
      // u1: first view's chain expires (click 4d later > 2d gap), the
      // 3d view rescues it
      (1L, "view", A), (1L, "view", A + 3 * D),
      (1L, "click", A + 4 * D), (1L, "purchase", A + 4 * D + D / 2),
      // u2: converts under both policies
      (2L, "view", A), (2L, "click", A + D), (2L, "purchase", A + 2 * D),
      // u3: never converts under any anchor (no purchase)
      (3L, "view", A), (3L, "click", A + D))
      .toDF("user_id", "event_type", "ts_us")
    def counts(policy: String): Map[Int, Long] =
      EventAnalytics.funnelWindowed(ev, Seq("view", "click", "purchase"),
          conversionWindowMicros = Some(5 * D),
          maxStepGapMicros = Some(2 * D), anchorPolicy = policy)
        .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val e = counts("earliest")
    val a = counts("any_qualifying")
    assert(e === Map(1 -> 3L, 2 -> 2L, 3 -> 1L))
    assert(a === Map(1 -> 3L, 2 -> 3L, 3 -> 2L))
    (1 to 3).foreach(s => assert(a(s) >= e(s), s"dominance broken at step $s"))
    val bad = intercept[IllegalArgumentException] {
      EventAnalytics.funnelWindowed(ev, Seq("view", "click"),
        anchorPolicy = "latest")
    }
    assert(bad.getMessage.contains("anchorPolicy"))
  }

  test("resampleLocf: spine is dense per key between its own min and max bins") {
    val ev0 = spark.read.parquet(s"$sf/events.parquet")
    val ev = ev0.withColumn("ts_us", Queries.eventMicros(ev0))
    val out = EventAnalytics.resampleLocf(ev, "event_type", "ts_us",
      "value", "event_id").cache()
    val perKey = out.groupBy("key")
      .agg(count(lit(1)).as("n"), min("bin").as("b0"), max("bin").as("b1"),
        sum(when(col("value").isNull, 1).otherwise(0)).as("nulls"))
      .collect()
    perKey.foreach { r =>
      assert(r.getAs[Long]("n") === r.getAs[Long]("b1") - r.getAs[Long]("b0") + 1,
        s"key ${r.get(0)}: spine not dense")
      assert(r.getAs[Long]("nulls") === 0L,
        s"key ${r.get(0)}: LOCF left nulls (first bin always has a value)")
    }
    out.unpersist()
  }
}
