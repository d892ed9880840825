package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, TimestampNTZType, TimestampType}

/**
 * Bucketed range (interval) join: inner-join point rows to the interval
 * rows `[start, end)` that contain them, with optional extra equality
 * keys.
 *
 * Catalyst plans a bare inequality join as broadcast-nested-loop (or a
 * sort-merge join with per-row range scans when an equality key exists,
 * where one hot key still degenerates to all-pairs). Bucketing makes the
 * join a plain equi-join: each interval is exploded to the fixed-width
 * buckets it overlaps, each point maps to exactly ONE bucket, so every
 * qualifying (point, interval) pair meets in exactly one bucket — the
 * residual `start <= p < end` filter needs no deduplication afterwards.
 * Cost: |intervals| × avg-buckets-per-interval extra rows through one
 * shuffle; pick `bucketWidth` near the typical interval span so that
 * factor stays ~2.
 *
 * Values may be numeric (engine convention: epoch microseconds) or
 * TimestampType/TimestampNTZType — timestamps bucket at MICROSECOND
 * resolution via `unix_micros` (so `bucketWidth` is in micros for
 * them), never truncated to seconds: a second-truncated bucket id can
 * MISS a true (point, interval) pair outright near bucket edges, and
 * the residual filter cannot resurrect a pair that never met in a
 * bucket. Bucket ids use exact floor division (long arithmetic via
 * pmod), so negative values bucket correctly too.
 */
object RangeJoin {

  private val B = "__graft_bucket__"

  /** Exact integer position for bucketing: epoch micros for timestamps,
    * plain long cast for numerics. */
  private def ticks(c: Column, dt: DataType): Column = dt match {
    case TimestampType | TimestampNTZType => unix_micros(c.cast(TimestampType))
    case _ => c.cast("long")
  }

  private def floorDiv(c: Column, w: Long): Column = {
    // (c - pmod(c, w)) is an exact multiple of w with |value| <= |c|;
    // the double division is exact for |c| < 2^53 (epoch-us is ~2^51).
    val exact = c.cast("long") - pmod(c.cast("long"), lit(w))
    (exact / lit(w)).cast("long")
  }

  /**
   * @param points      side with one numeric/timestamp `pointCol`
   * @param intervals   side with numeric/timestamp `[startCol, endCol)`;
   *                    empty or inverted intervals match nothing
   * @param bucketWidth bucket size in the value's units — micros for
   *                    timestamp columns (> 0)
   * @param keys        equality keys present on both sides
   */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, startCol: String, endCol: String,
                      bucketWidth: Long, keys: Seq[String] = Nil): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def q(c: String): Column = col(s"`$c`")
    val overlap = points.columns.toSeq.filterNot(keys.contains)
      .intersect(intervals.columns.toSeq.filterNot(keys.contains))
    require(overlap.isEmpty,
      s"non-key columns must be disjoint across sides, both have: ${overlap.mkString(", ")}")
    val pointT = ticks(q(pointCol), points.schema(pointCol).dataType)
    val startT = ticks(q(startCol), intervals.schema(startCol).dataType)
    val endT = ticks(q(endCol), intervals.schema(endCol).dataType)

    val p = points.withColumn(B, floorDiv(pointT, bucketWidth))
    // end is exclusive, so the last overlapped bucket is the one holding
    // end - 1; sequence() is inclusive on both ends.
    val iv = intervals
      .filter(startT < endT)
      .withColumn(B, explode(sequence(
        floorDiv(startT, bucketWidth),
        floorDiv(endT - 1, bucketWidth))))
    p.join(iv, keys :+ B)
      .filter(q(pointCol) >= q(startCol) && q(pointCol) < q(endCol))
      .drop(B)
  }
}
