package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Sketch-based approximate operators for 100 TB-scale summaries, built on
 * Spark's codegen'd DataSketches HLL expressions plus the public
 * `DataFrameStat.bloomFilter` sketch.
 *
 * Why sketches at scale: an exact `COUNT(DISTINCT)` over a high-cardinality
 * column shuffles every distinct value (`SkewOps.saltedDistinctCount` tames
 * the skew but not the volume); an HLL register array is a few KB per
 * group REGARDLESS of cardinality, makes the aggregation fully map-side
 * combinable, and — unlike a plain `approx_count_distinct` number — the
 * sketches themselves are STORABLE and MERGEABLE: persist per-partition
 * sketches once, answer rollups at any later grain by unioning them
 * without rescanning the fact table.
 */
object Sketches {

  val SketchCol = "hll_sketch"

  /** Per-group HLL sketches of `valueCol` (binary, mergeable via
    * [[hllMergeEstimate]]). `lgK` = 12 gives ~1.6% relative standard
    * error in ~4 KB per group. */
  def hllSketch(df: DataFrame, keys: Seq[String], valueCol: String,
                lgK: Int = 12): DataFrame = {
    require(keys.nonEmpty, "hllSketch needs group keys")
    df.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(hll_sketch_agg(col(s"`$valueCol`"), lit(lgK)).as(SketchCol))
  }

  /** Roll stored sketches up to a coarser grain and estimate: unions the
    * `hll_sketch` column per `keys` group — no rescan of the base data.
    * HLL union is register-wise max, so the estimate equals what a direct
    * sketch of the union would produce at the same lgK. */
  def hllMergeEstimate(sketches: DataFrame, keys: Seq[String],
                       outCol: String = "approx_distinct"): DataFrame = {
    require(keys.nonEmpty, "hllMergeEstimate needs group keys")
    sketches.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(hll_sketch_estimate(hll_union_agg(col(SketchCol), lit(false)))
        .as(outCol))
  }

  /** One-shot per-group estimated distinct count of `valueCol`. */
  def approxDistinct(df: DataFrame, keys: Seq[String], valueCol: String,
                     lgK: Int = 12, outCol: String = "approx_distinct"): DataFrame =
    df.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(hll_sketch_estimate(hll_sketch_agg(col(s"`$valueCol`"), lit(lgK)))
        .as(outCol))

  /**
   * Join with a Bloom-filter pre-prune of the fact side: build a Bloom
   * filter over `dim`'s keys, drop fact rows that cannot match BEFORE the
   * join's shuffle, then run the real join. The result is EXACT — Bloom
   * false positives survive the prune but are eliminated by the join
   * itself, so this is purely a bytes-through-the-shuffle optimization.
   *
   * When it pays: the dim side is too big for a broadcast-hash join (so
   * Catalyst would sort-merge, shuffling the FULL fact table) yet its key
   * set fits a Bloom filter — ~1.2 MB per million keys at 3% fpp vs the
   * hundreds of MB a broadcast hash table of the same rows would take.
   * Spark's own runtime row-level filtering makes the same move when its
   * cost model dares; this operator makes it explicit and deterministic.
   *
   * The fact side keeps its name-spaced columns; dim columns come along
   * as in a plain `join(dim, fact(k) === dim(k), joinType)`.
   *
   * The probe is Spark's own codegen'd `BloomFilterMightContain` (via
   * `graft_might_contain`) over `xxhash64` of the key — no per-row Scala
   * UDF boundary on the fact side. Both sides type-normalize the key
   * (integrals widen to long) before hashing, so an `int` dim key prunes
   * a `bigint` fact key correctly; the serialized filter rides the plan
   * as a binary literal, the same shape the optimizer's own runtime
   * row-level filtering produces.
   */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame,
                      factKey: String, dimKey: String,
                      expectedItems: Long, fpp: Double = 0.03,
                      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_semi", "leftsemi").contains(joinType),
      s"bloom pruning the fact side is only sound for inner/semi joins, got $joinType")
    val (buildKey, probeKey): (Column, Column) = fact.schema(factKey).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        (col(s"`$dimKey`").cast("long"), col(s"`$factKey`").cast("long"))
      case StringType =>
        (col(s"`$dimKey`").cast("string"), col(s"`$factKey`"))
      case dt => throw new IllegalArgumentException(
        s"bloomPrunedJoin supports integral/string keys, got $dt for $factKey")
    }
    // distributed build over the hashes the probe will use (putLong of
    // xxhash64 — the contract BloomFilterMightContain's eval expects)
    val bf = dim.select(xxhash64(buildKey).as("__graft_bloom_h__"))
      .stat.bloomFilter("__graft_bloom_h__", expectedItems, fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    graft.expressions.MightContain.register(fact.sparkSession)
    val mightMatch: Column = call_function(graft.expressions.MightContain.Name,
      lit(bos.toByteArray), xxhash64(probeKey))
    val pruned = fact.filter(mightMatch).alias("__fact")
    val d = dim.alias("__dim")
    pruned.join(d, col(s"__fact.`$factKey`") === col(s"__dim.`$dimKey`"), joinType)
  }

  // ------------------------- frequent items --------------------------

  /** One tracked item: estimated count and its overestimation bound —
    * the TRUE count lies in [est_count - max_err, est_count]. */
  final case class HeavyHit(item: String, est_count: Long, max_err: Long)

  final case class SSCell(cnt: Long, err: Long)

  /** Summary state: tracked items plus `floor` — an upper bound on the
    * count any UNTRACKED item could have accumulated here (the largest
    * count ever evicted/dropped). floor = 0 ⇒ the summary is exact. */
  final case class SSBuf(floor: Long, items: Map[String, SSCell])

  /**
   * Mergeable SpaceSaving frequent-items summary (Metwally 2005; merge
   * rule per Agarwal 2012, "Mergeability of summaries"). Tracks at most
   * `capacity` items with the invariant `true ≤ est ≤ true + max_err`:
   *
   *  - insert when full evicts the min-count item (ties break on item
   *    ascending, so eviction is deterministic) and the newcomer
   *    inherits its count as both count and error — the classic rule;
   *  - merge sums per-item counts across summaries, charging an absent
   *    side's `floor` to both count and error (an item missing from a
   *    summary had at most `floor` occurrences there), then truncates
   *    back to `capacity` keeping the largest, folding the biggest
   *    dropped count into the merged floor.
   *
   * Every item with true frequency > 2·(floor bound) ≈ n/capacity is
   * guaranteed tracked. With `capacity ≥` the group's distinct count no
   * eviction ever happens, floors stay 0, and the summary is EXACT and
   * partitioning-independent — the regime the driver oracle pins; the
   * approximate regime's guarantees are property-tested in SketchesSpec.
   *
   * Why this shape at 100 TB: an exact top-k over a high-cardinality
   * column is a full (item → count) shuffle; this summary is a bounded
   * map per PARTITION, combined map-side exactly like a sum, with
   * per-group state capped at `capacity` entries however many distinct
   * items flow through.
   */
  final class SpaceSaving(capacity: Int)
      extends org.apache.spark.sql.expressions.Aggregator[String, SSBuf, Seq[HeavyHit]] {
    require(capacity >= 1, s"capacity must be >= 1, got $capacity")

    def zero: SSBuf = SSBuf(0L, Map.empty)

    private def evictMin(items: Map[String, SSCell]): (String, SSCell) =
      items.minBy { case (item, c) => (c.cnt, item) }

    def reduce(b: SSBuf, item: String): SSBuf = {
      val key = if (item == null) "" else item
      b.items.get(key) match {
        case Some(c) =>
          b.copy(items = b.items.updated(key, c.copy(cnt = c.cnt + 1)))
        case None if b.items.size < capacity =>
          b.copy(items = b.items.updated(key, SSCell(1L, 0L)))
        case None =>
          val (mItem, mCell) = evictMin(b.items)
          SSBuf(math.max(b.floor, mCell.cnt),
            (b.items - mItem).updated(key, SSCell(mCell.cnt + 1, mCell.cnt)))
      }
    }

    def merge(x: SSBuf, y: SSBuf): SSBuf = {
      if (x.items.isEmpty && x.floor == 0) return y
      if (y.items.isEmpty && y.floor == 0) return x
      val union = (x.items.keySet ++ y.items.keySet).toSeq
      val summed = union.map { item =>
        val a = x.items.getOrElse(item, SSCell(x.floor, x.floor))
        val b = y.items.getOrElse(item, SSCell(y.floor, y.floor))
        item -> SSCell(a.cnt + b.cnt, a.err + b.err)
      }
      val floor0 = x.floor + y.floor
      if (summed.size <= capacity) SSBuf(floor0, summed.toMap)
      else {
        val (keep, drop) = summed
          .sortBy { case (item, c) => (-c.cnt, item) }.splitAt(capacity)
        SSBuf(math.max(floor0, drop.map(_._2.cnt).max), keep.toMap)
      }
    }

    def finish(b: SSBuf): Seq[HeavyHit] =
      b.items.toSeq.sortBy { case (item, c) => (-c.cnt, item) }
        .map { case (item, c) => HeavyHit(item, c.cnt, c.err) }

    def bufferEncoder: org.apache.spark.sql.Encoder[SSBuf] =
      org.apache.spark.sql.Encoders.product[SSBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[Seq[HeavyHit]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  /** Per-group top-`k` frequent items via [[SpaceSaving]]: one
    * aggregation (map-side combinable, ≤ `capacity` entries of state
    * per group anywhere in the plan), then an explode of the ≤
    * `capacity`-element summary down to `k` rows per group. */
  def heavyHitters(df: DataFrame, keys: Seq[String], itemCol: String,
                   capacity: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= capacity, s"need 1 <= k <= capacity, got k=$k")
    val agg = udaf(new SpaceSaving(capacity))
    df.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(agg(col(s"`$itemCol`").cast("string")).as("__hh__"))
      .select((keys.map(c => col(s"`$c`")) :+
        posexplode(slice(col("__hh__"), lit(1), lit(k)))): _*)
      .drop("pos")
      .select((keys.map(c => col(s"`$c`")) :+ col("col.item") :+
        col("col.est_count") :+ col("col.max_err")): _*)
  }
}
