package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
 * Values must be numeric (engine convention: epoch microseconds). Bucket
 * ids use exact floor division (long arithmetic via pmod), so negative
 * values bucket correctly too.
 */
object RangeJoin {

  private val B = "__graft_bucket__"

  private def floorDiv(c: Column, w: Long): Column = {
    // (c - pmod(c, w)) is an exact multiple of w with |value| <= |c|;
    // the double division is exact for |c| < 2^53 (epoch-us is ~2^51).
    val exact = c.cast("long") - pmod(c.cast("long"), lit(w))
    (exact / lit(w)).cast("long")
  }

  /**
   * @param points      side with one numeric `pointCol`
   * @param intervals   side with numeric `[startCol, endCol)`; empty or
   *                    inverted intervals match nothing
   * @param bucketWidth bucket size in the value's units (> 0)
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

    val p = points.withColumn(B, floorDiv(q(pointCol), bucketWidth))
    // end is exclusive, so the last overlapped bucket is the one holding
    // end - 1; sequence() is inclusive on both ends.
    val iv = intervals
      .filter(q(startCol) < q(endCol))
      .withColumn(B, explode(sequence(
        floorDiv(q(startCol), bucketWidth),
        floorDiv(q(endCol).cast("long") - 1, bucketWidth))))
    p.join(iv, keys :+ B)
      .filter(q(pointCol) >= q(startCol) && q(pointCol) < q(endCol))
      .drop(B)
  }
}
