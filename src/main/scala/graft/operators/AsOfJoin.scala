package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/**
 * Point-in-time ("as-of") join: for every left row, attach the single
 * right row with the same `by` keys whose time is the closest at-or-before
 * (`backward`) or at-or-after (`forward`) the left row's time, optionally
 * within `tolerance` time units. Semantics follow pandas `merge_asof`
 * (left-outer: every left row survives; an out-of-tolerance or absent
 * match yields NULL right columns).
 *
 * Spark has no native as-of join, and expressing it as an inequality join
 * plus `row_number` forces either a broadcast-nested-loop or a sort-merge
 * join whose matching right set per left row is unbounded — at 100 TB a
 * hot key (one user with millions of events) turns that into a pair
 * explosion. This operator instead UNIONS the two sides and takes a
 * running `last(right_payload, ignoreNulls)` over one window, so the cost
 * is a single hash partition on `by` plus one sort of |L|+|R| rows per
 * key — no join node, no candidate pairs, linear in input after the sort.
 *
 * Determinism: when several right rows share the matching timestamp, the
 * one with the greatest `rightTieBreak` value wins (both directions), so
 * results are stable across retries and engines — required for the
 * hash-compared oracle, and the same policy a DuckDB
 * `row_number() ... ORDER BY t DESC, tie DESC` oracle can express.
 *
 * Time columns may be numeric (the engine-wide convention is epoch
 * microseconds, see Queries `ts_us`) or TimestampType/TimestampNTZType —
 * timestamps are compared at MICROSECOND resolution via `unix_micros`,
 * never truncated to seconds, so `tolerance` is in microseconds for
 * timestamp inputs and in the column's own units for numeric inputs.
 *
 * NULL times: a left row with a NULL time SURVIVES with NULL right
 * columns — the classic left-join stance, and what an inequality
 * left-join oracle produces (a NULL comparison never matches). A right
 * row with a NULL time is never matchable (dropped before the union); a
 * NULL time has no position on the time axis, and letting it sort first
 * would silently hand its payload to genuinely unmatched left rows.
 * (pandas `merge_asof` instead raises on NaT keys — callers wanting that
 * contract should assert non-null times before joining.)
 */
object AsOfJoin {

  /** Exact integer time for ordering/tolerance arithmetic: epoch
    * microseconds for timestamps, plain long cast for numerics. */
  private def asTicks(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType => unix_micros(c.cast(TimestampType))
    case _ => c.cast("long")
  }

  private val T = "__graft_asof_t__"
  private val Side = "__graft_asof_side__"
  private val Tb = "__graft_asof_tb__"
  private val Lp = "__graft_asof_lp__"
  private val Rp = "__graft_asof_rp__"
  private val M = "__graft_asof_m__"

  /**
   * @param leftTime      numeric time column on `left`
   * @param rightTime     numeric time column on `right` (kept in the output,
   *                      NULL when unmatched)
   * @param by            equality keys present on both sides
   * @param direction     "backward" (right.t <= left.t, default) or
   *                      "forward" (right.t >= left.t)
   * @param tolerance     max |left.t - right.t| for a match to count
   * @param rightTieBreak column on `right` breaking equal-time ties
   *                      (greatest value wins); omit only when (by, time)
   *                      is unique on the right side
   */
  def join(left: DataFrame, right: DataFrame,
           leftTime: String, rightTime: String,
           by: Seq[String],
           direction: String = "backward",
           tolerance: Option[Long] = None,
           rightTieBreak: Option[String] = None): DataFrame = {
    require(by.nonEmpty, "as-of join needs at least one `by` key")
    require(Seq("backward", "forward").contains(direction),
      s"direction must be backward|forward, got $direction")
    val leftPayload = left.columns.toSeq.filterNot(by.contains)
    val rightPayload = right.columns.toSeq.filterNot(by.contains)
    val overlap = leftPayload.intersect(rightPayload)
    require(overlap.isEmpty,
      s"non-key columns must be disjoint across sides, both have: ${overlap.mkString(", ")}")
    require(leftPayload.contains(leftTime), s"$leftTime not a left column")
    require(rightPayload.contains(rightTime), s"$rightTime not a right column")

    def q(c: String): Column = col(s"`$c`")
    val byCols = by.map(q)

    val leftTimeDt = left.schema(leftTime).dataType
    val rightTimeDt = right.schema(rightTime).dataType

    // Right rows carry __side=0 so they sort BEFORE left rows at the same
    // timestamp — that makes the match inclusive (right.t == left.t wins).
    // NULL-time RIGHT rows are dropped up front: a NULL T sorting first
    // would hand its payload to genuinely unmatched left rows. NULL-time
    // LEFT rows stay: nulls-first ordering (both directions) puts them
    // before every right row, so their running last() is NULL and they
    // surface unmatched — the left-join stance.
    val l2 = left.select(
      byCols ++ Seq(
        asTicks(q(leftTime), leftTimeDt).as(T), lit(1).as(Side), lit(0L).as(Tb),
        struct(leftPayload.map(q): _*).as(Lp)): _*)
    val r2 = right.filter(q(rightTime).isNotNull).select(
      byCols ++ Seq(
        asTicks(q(rightTime), rightTimeDt).as(T), lit(0).as(Side),
        // asTicks, not cast("long"): a timestamp tie-break must rank at
        // micros, not collapse to seconds
        rightTieBreak.map(c => asTicks(q(c), right.schema(c).dataType))
          .getOrElse(lit(0L)).as(Tb),
        struct(rightPayload.map(q): _*).as(Rp)): _*)
    val u = l2.unionByName(r2, allowMissingColumns = true)

    // backward: scan times ascending; the running last right payload at a
    // left row is the latest right row with t <= left.t. forward: scan
    // descending; the running last right payload is the EARLIEST right
    // row with t >= left.t. Tie-break ascending in both cases, so among
    // equal timestamps the greatest tie-break value is seen last and wins.
    // nulls FIRST in both directions (desc would default to nulls last),
    // so NULL-time left rows precede every right row and stay unmatched.
    val ordering: Seq[Column] =
      if (direction == "backward") Seq(col(T).asc_nulls_first, col(Side).asc, col(Tb).asc)
      else Seq(col(T).desc_nulls_first, col(Side).asc, col(Tb).asc)
    val w = Window.partitionBy(byCols: _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matchedRaw = last(col(Rp), ignoreNulls = true).over(w)

    val withMatch = u.withColumn(M, matchedRaw).filter(col(Side) === 1)
    val matchedT = asTicks(col(M).getField(rightTime), rightTimeDt)
    val withinTol: Column = tolerance match {
      case None => lit(true)
      case Some(tol) =>
        if (direction == "backward") col(T) - matchedT <= tol
        else matchedT - col(T) <= tol
    }
    val gated = withMatch.withColumn(M,
      when(col(M).isNotNull && withinTol, col(M)))

    gated.select(
      byCols ++
        leftPayload.map(c => col(Lp).getField(c).as(c)) ++
        rightPayload.map(c => col(M).getField(c).as(c)): _*)
  }

  /**
   * Point-in-time dimension lookup against versioned (SCD2-style)
   * records: for each fact row, the dimension version whose
   * `[validFrom, validTo)` interval contains the fact's time — the
   * "feature-store correct" join that never leaks a future attribute
   * into a historical fact.
   *
   * Versions per key are non-overlapping, so this is exactly a backward
   * as-of on `validFrom` plus an "is the match still open at fact time"
   * check — one shuffle, no interval explosion (validity intervals are
   * typically years long, which would defeat [[RangeJoin]]'s bucketing).
   * A fact before its key's first version (or with no version at all)
   * keeps NULL dimension columns.
   *
   * Time columns may be timestamps (compared at MICROSECOND resolution
   * via `unix_micros`) or numerics.
   */
  def temporalLookup(facts: DataFrame, dim: DataFrame,
                     factTime: String, validFrom: String, validTo: String,
                     by: Seq[String]): DataFrame = {
    val out = join(facts, dim, factTime, validFrom, by, direction = "backward")
    // evaluate the validity check ONCE before any dim column is nulled —
    // folding the raw predicate would re-resolve validTo against already
    // rewritten columns.
    val v = "__graft_temporal_valid__"
    val dimCols = dim.columns.toSeq.filterNot(by.contains)
    val validToDt = dim.schema(validTo).dataType
    val factTimeDt = facts.schema(factTime).dataType
    dimCols.foldLeft(
      out.withColumn(v,
        asTicks(col(s"`$validTo`"), validToDt) >
          asTicks(col(s"`$factTime`"), factTimeDt))) {
      (df, c) => df.withColumn(c, when(col(v), col(s"`$c`")))
    }.drop(v)
  }
}
