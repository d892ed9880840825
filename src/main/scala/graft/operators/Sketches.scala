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

  // ------------------------- count-min sketch -------------------------

  val CmsCol = "cms_sketch"

  /** Per-group Count-Min sketches of `itemCol` occurrence frequencies
    * (Cormode & Muthukrishnan 2005) — Spark's native `count_min_sketch`
    * aggregate (map-side combined, binary output). The frequency
    * analogue of the HLL pair: identical `(eps, confidence, seed)`
    * across shards means identical dimensions and hash rows, so stored
    * per-grain sketches ROLL UP by element-wise sum
    * ([[countMinMerge]]) without rescanning the fact table. Point
    * estimates ([[countMinEstimate]]) guarantee
    * `true ≤ est` always and `est ≤ true + eps·n` with probability
    * `confidence` — a sketch of `ceil(e/eps) × ceil(ln(1/(1-conf)))`
    * longs per group regardless of item cardinality. */
  def countMinSketch(df: DataFrame, keys: Seq[String], itemCol: String,
                     eps: Double = 1e-4, confidence: Double = 0.99,
                     seed: Int = 42): DataFrame = {
    require(keys.nonEmpty, "countMinSketch needs group keys")
    df.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(count_min_sketch(col(s"`$itemCol`").cast("string"),
        lit(eps), lit(confidence), lit(seed)).as(CmsCol))
  }

  /** Roll stored CMS binaries up to a coarser grain: element-wise sum
    * of the counter tables (exact for CMS — the merged sketch IS the
    * sketch of the concatenated stream). All inputs must share
    * `(eps, confidence, seed)`; mismatched dimensions fail loudly. */
  private[operators] def cmsMergeBytes(x: Array[Byte], y: Array[Byte]): Array[Byte] =
    if (x.isEmpty) y
    else if (y.isEmpty) x
    else {
      val cx = org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(x))
      cx.mergeInPlace(org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(y)))
      val bos = new java.io.ByteArrayOutputStream()
      cx.writeTo(bos)
      bos.toByteArray
    }

  /** Mergeable rollup aggregator over stored CMS binaries. */
  final class CountMinMerge
      extends org.apache.spark.sql.expressions.Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    def zero: Array[Byte] = Array.emptyByteArray
    def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = cmsMergeBytes(b, a)
    def merge(x: Array[Byte], y: Array[Byte]): Array[Byte] = cmsMergeBytes(x, y)
    def finish(b: Array[Byte]): Array[Byte] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      org.apache.spark.sql.Encoders.BINARY
  }

  /** [[countMinSketch]] rollup: one merged sketch per `keys` group. */
  def countMinMerge(sketches: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "countMinMerge needs group keys")
    val agg = udaf(new CountMinMerge)
    sketches.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(agg(col(CmsCol)).as(CmsCol))
  }

  /** Estimated occurrence count of each candidate item under each
    * group's sketch: one output row per (group, item). The sketch
    * deserializes ONCE per distinct binary per partition (tiny LRU —
    * group sketches repeat across the exploded item list), and the
    * estimate hashes the item's UTF-8 bytes exactly as the native
    * aggregate inserted them. Candidate items come from the caller
    * (a CMS answers point queries; harvesting candidates is
    * [[heavyHitters]]'s job — the two compose). */
  def countMinEstimate(sketches: DataFrame, items: Seq[String],
                       itemCol: String = "item",
                       outCol: String = "est_count"): DataFrame = {
    require(items.nonEmpty, "countMinEstimate needs candidate items")
    val est = udf(new ((Array[Byte], String) => Long) with Serializable {
      @transient private lazy val cache =
        new java.util.LinkedHashMap[java.nio.ByteBuffer,
            org.apache.spark.util.sketch.CountMinSketch](16, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[java.nio.ByteBuffer,
                org.apache.spark.util.sketch.CountMinSketch]): Boolean =
            size() > 64
        }
      def apply(bytes: Array[Byte], item: String): Long = {
        val sk = cache.synchronized {
          val k = java.nio.ByteBuffer.wrap(bytes)
          var v = cache.get(k)
          if (v == null) {
            v = org.apache.spark.util.sketch.CountMinSketch
              .readFrom(new java.io.ByteArrayInputStream(bytes))
            cache.put(k, v)
          }
          v
        }
        sk.estimateCount(item.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    })
    sketches
      .withColumn(itemCol, explode(lit(items.toArray)))
      .withColumn(outCol, est(col(CmsCol), col(s"`$itemCol`")))
      .drop(CmsCol)
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

  // ------------------------------------------------------- GK quantiles

  /** One GK summary tuple: `v` with rank uncertainty `[rmin, rmin+delta]`
    * where rmin is the running sum of `g`. */
  final case class GKTuple(v: Double, g: Long, delta: Long)

  /** Aggregation state: compressed sorted tuples + an unsorted insert
    * buffer (amortizes the per-item sorted insert). */
  final case class GKBuf(n: Long, tuples: Seq[GKTuple], pending: Seq[Double])

  /** Finished summary: total count + tuples + the eps it was built
    * with, as one struct so per-group summaries are storable rows
    * (mirror of the HLL sketch contract). Carrying eps is what lets a
    * SECOND-LEVEL rollup ([[GKMerge]]) recompress: without it the
    * rollup has no threshold and can only concatenate, building an
    * O(shards · 1/eps)-tuple buffer over 100 k shard summaries. */
  final case class GKSummary(n: Long, tuples: Seq[GKTuple], eps: Double)

  /** Threshold-compress a sorted tuple list right-to-left; positions
    * 0 and last never merge away (min/max stay present). */
  private[operators] def gkCompress(ts: Vector[GKTuple], th: Long): Vector[GKTuple] = {
    if (ts.length <= 2) return ts
    var out = Vector.empty[GKTuple]
    var acc = ts.last
    var i = ts.length - 2
    while (i >= 1) {
      val t = ts(i)
      if (t.g + acc.g + acc.delta <= th) acc = acc.copy(g = acc.g + t.g)
      else { out = acc +: out; acc = t }
      i -= 1
    }
    ts.head +: acc +: out
  }

  /** The delta-absorbing Greenwald–Khanna merge rule (shared by
    * [[GKQuantile.merge]] and [[GKMerge]]): each side's tuples widen by
    * the OTHER side's maximum local uncertainty max(g+delta)−1, after
    * which the sorted concatenation is a VALID summary of the union
    * (every tuple's interval covers its true rank) and recompressing it
    * with the union's threshold is safe — total uncertainty telescopes
    * to the sum over LEAF summaries regardless of merge order or depth.
    * The −1 keeps the exact regime exact: merging two uncompressed
    * summaries (all g=1, delta=0) absorbs zero. */
  private[operators] def gkAbsorbMerge(a: Seq[GKTuple], b: Seq[GKTuple],
                                       th: Long): Vector[GKTuple] = {
    val slackA = math.max(0L, a.iterator.map(t => t.g + t.delta).max - 1)
    val slackB = math.max(0L, b.iterator.map(t => t.g + t.delta).max - 1)
    val merged = (a.map(t => t.copy(delta = t.delta + slackB)) ++
      b.map(t => t.copy(delta = t.delta + slackA)))
      .sortBy(_.v).toVector
    gkCompress(merged, th)
  }

  /**
   * Mergeable Greenwald–Khanna quantile summary (Greenwald & Khanna
   * 2001; merge-without-compress rule after Agarwal 2012's mergeable-
   * summaries analysis): answers ANY rank query within `eps · n` using
   * `O((1/eps)·log(eps·n))` state per partition, built in one pass.
   *
   *  - `reduce` buffers values and flushes batches into the sorted
   *    tuple list with the classic insert (delta = successor's
   *    g + delta − 1) + compress (merge adjacent tuples while
   *    g_i + g_{i+1} + delta_{i+1} ≤ threshold);
   *  - `merge` is DELTA-ABSORBING (see its doc): each side widens by
   *    the other's max local uncertainty, making the concatenation a
   *    valid summary that is then RECOMPRESSED — uncertainty
   *    telescopes to the leaf sum ≤ Σ 2·(eps/2)·n_i = eps·n at ANY
   *    merge depth, and state stays O((1/eps)·log(eps·n)) even when a
   *    streaming state store merges partials every micro-batch. The
   *    eps/2 build threshold is the headroom that keeps the total
   *    inside eps.
   *
   * Determinism caveat, stated honestly: the summary CONTENT depends on
   * partitioning/merge order (like any GK pipeline, including Spark's
   * own approxQuantile); the `eps·n` rank GUARANTEE does not. Gate
   * cross-engine comparisons on the guarantee, not on summary bytes —
   * [[approxQuantiles]] callers who need engine-exact output should
   * verify against exact rank selection (see the quantile_sketch
   * oracle query, which does exactly that).
   */
  final class GKQuantile(eps: Double)
      extends org.apache.spark.sql.expressions.Aggregator[Double, GKBuf, GKSummary] {
    require(eps > 0.0 && eps < 0.5, s"eps must be in (0, 0.5), got $eps")
    private val epsHalf = eps / 2
    private val flushSize = math.max(8, (1.0 / eps).toInt)

    def zero: GKBuf = GKBuf(0L, Vector.empty, Vector.empty)

    private def threshold(n: Long): Long = (2 * epsHalf * n).toLong

    private def compress(ts: Vector[GKTuple], th: Long): Vector[GKTuple] =
      gkCompress(ts, th)

    /** Insert a sorted batch into sorted tuples with ONE two-pointer
      * merge pass (both sides sorted — per-element indexWhere/rebuild
      * was O(flushSize × tuples) with a full Vector copy per value on
      * the per-row hot path), then compress. Each pending value takes
      * its delta from its successor among the PRE-FLUSH tuples, which
      * is its immediate successor in the merged list too (earlier
      * pending values are ≤ it and land before it): the standard GK
      * insert. The extremes stay exact (delta 0) — a value at i == 0
      * is preceded only by exactly-counted pending inserts, and one at
      * i == len is ≥ every summarized element (the max tuple survives
      * compression), so its rank is known precisely. */
    private[operators] def flush(b: GKBuf): GKBuf = {
      if (b.pending.isEmpty) return b
      val th = threshold(b.n)
      val ts = b.tuples.toVector
      val out = Vector.newBuilder[GKTuple]
      var i = 0
      for (v <- b.pending.sorted) {
        while (i < ts.length && ts(i).v < v) { out += ts(i); i += 1 }
        if (i == ts.length || i == 0) out += GKTuple(v, 1L, 0L)
        else {
          val s = ts(i)
          out += GKTuple(v, 1L, math.max(0L, math.min(s.g + s.delta - 1, th - 1)))
        }
      }
      while (i < ts.length) { out += ts(i); i += 1 }
      GKBuf(b.n, compress(out.result(), th), Vector.empty)
    }

    def reduce(b: GKBuf, v: Double): GKBuf = {
      val nb = b.copy(n = b.n + 1, pending = b.pending :+ v)
      if (nb.pending.size >= flushSize) flush(nb) else nb
    }

    /** Delta-absorbing merge ([[gkAbsorbMerge]]): total uncertainty
      * telescopes to the leaf sum ≤ Σ 2·(eps/2)·n_i = eps·n at any
      * merge depth — this is what keeps streaming state bounded when
      * the state store merges a new partial into the buffer every
      * micro-batch (without the recompress, state grew linearly in
      * batch count). */
    def merge(x: GKBuf, y: GKBuf): GKBuf = {
      val a = flush(x); val b = flush(y)
      if (a.n == 0) return b
      if (b.n == 0) return a
      val n = a.n + b.n
      GKBuf(n, gkAbsorbMerge(a.tuples, b.tuples, threshold(n)), Vector.empty)
    }

    def finish(b: GKBuf): GKSummary = {
      val f = flush(b)
      GKSummary(f.n, f.tuples, eps)
    }

    def bufferEncoder: org.apache.spark.sql.Encoder[GKBuf] =
      org.apache.spark.sql.Encoders.product[GKBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[GKSummary] =
      org.apache.spark.sql.Encoders.product[GKSummary]
  }

  /** [[GKQuantile]] over a BOXED input that skips NULLs in the
    * aggregator itself (SQL-aggregate semantics) — for multi-column
    * single-aggregate callers like `Profiling.profileColumns`, which
    * cannot pre-filter rows per column the way [[quantileSketch]]
    * does. Register with `udaf(new GKQuantileBoxed(eps),
    * Encoders.DOUBLE)`. */
  final class GKQuantileBoxed(eps: Double)
      extends org.apache.spark.sql.expressions.Aggregator[java.lang.Double, GKBuf, GKSummary] {
    private val inner = new GKQuantile(eps)
    def zero: GKBuf = inner.zero
    def reduce(b: GKBuf, v: java.lang.Double): GKBuf =
      if (v == null) b else inner.reduce(b, v.doubleValue())
    def merge(x: GKBuf, y: GKBuf): GKBuf = inner.merge(x, y)
    def finish(b: GKBuf): GKSummary = inner.finish(b)
    def bufferEncoder: org.apache.spark.sql.Encoder[GKBuf] = inner.bufferEncoder
    def outputEncoder: org.apache.spark.sql.Encoder[GKSummary] = inner.outputEncoder
  }

  /** Rank-query a finished summary: the value whose rank interval
    * `[rmin, rmin+delta]` is nearest the target rank `ceil(p·n)`
    * (distance 0 when the interval covers it — guaranteed within
    * `eps·n` by the summary invariant). */
  private[graft] def gkQuery(tuples: Seq[GKTuple], n: Long, p: Double): Double = {
    require(tuples.nonEmpty, "empty quantile summary")
    val r = math.max(1L, math.ceil(p * n).toLong)
    var rmin = 0L
    var best = tuples.head.v
    var bestDist = Long.MaxValue
    for (t <- tuples) {
      rmin += t.g
      val rmax = rmin + t.delta
      val dist = if (r < rmin) rmin - r else if (r > rmax) r - rmax else 0L
      if (dist < bestDist) { bestDist = dist; best = t.v }
    }
    best
  }

  val QuantileCol = "gk_summary"

  /** Per-group mergeable GK summaries of `valueCol` — the quantile
    * analogue of [[hllSketch]]: persist per-shard summaries once,
    * answer corpus-wide quantiles later by merging WITHOUT rescanning
    * (one map-side-combinable aggregation; per-group state is the
    * summary, never the data). */
  def quantileSketch(df: DataFrame, keys: Seq[String], valueCol: String,
                     eps: Double = 0.01): DataFrame = {
    require(keys.nonEmpty, "quantileSketch needs group keys")
    val agg = udaf(new GKQuantile(eps))
    // NULL values are ignored, like every SQL aggregate — the udaf's
    // primitive Double input would otherwise crash on the first NULL.
    // A group that is ALL NULL disappears (it has no rank domain).
    df.filter(col(s"`$valueCol`").isNotNull)
      .groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(agg(col(s"`$valueCol`").cast("double")).as(QuantileCol))
  }

  /** Merge persisted per-shard summaries up to a coarser grain and
    * answer `probs` — the quantile analogue of [[hllMergeEstimate]].
    * The second-level merge re-uses the same concatenation rule via a
    * small JVM fold (summaries are rows, bounded state). */
  def quantileMergeEstimate(sketches: DataFrame, keys: Seq[String],
                            probs: Seq[Double]): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p > 0 && p <= 1),
      s"probs must be in (0, 1], got $probs")
    val agg = udaf(new GKMerge)
    val est = estimateUdf
    val probCol = explode(array(probs.map(lit): _*)).as("prob")
    // udaf() flattens the case-class input into (n, tuples, eps) parameters
    sketches
      .groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(agg(col(s"$QuantileCol.n"), col(s"$QuantileCol.tuples"),
        col(s"$QuantileCol.eps")).as(QuantileCol))
      .select((keys.map(c => col(s"`$c`")) :+ col(QuantileCol) :+ probCol): _*)
      .select((keys.map(c => col(s"`$c`")) :+ col("prob") :+
        est(col(s"$QuantileCol.n"), col(s"$QuantileCol.tuples"),
          col("prob")).as("value")): _*)
  }

  /** Rank-query a summary struct column: (n, tuples, prob) → value.
    * Shared by [[quantileMergeEstimate]] and the streaming
    * windowed-quantile operator. */
  private[graft] def estimateUdf =
    udf { (n: Long, ts: Seq[org.apache.spark.sql.Row], p: Double) =>
      gkQuery(ts.map(r => GKTuple(r.getDouble(0), r.getLong(1), r.getLong(2))), n, p)
    }

  /** Second-level aggregator: delta-absorbing merge of FINISHED
    * summaries, recompressed against the threshold the summaries'
    * own eps implies (`eps·n`, the same formula [[GKQuantile]] builds
    * with) — so rolling 100 k per-shard summaries to a global grain
    * keeps the buffer at the single-summary O((1/eps)·log(eps·n))
    * bound instead of O(shards · 1/eps) concatenated tuples. Merging
    * summaries of different eps is legal; the result carries (and the
    * guarantee degrades to) the max. The rank guarantee is the leaf
    * sum, same telescoping argument as [[GKQuantile.merge]]. A summary
    * with eps ≤ 0 (unknown provenance) disables recompression for the
    * whole rollup — concatenation stays valid, just unbounded. */
  final class GKMerge
      extends org.apache.spark.sql.expressions.Aggregator[GKSummary, GKSummary, GKSummary] {
    def zero: GKSummary = GKSummary(0L, Vector.empty, 0.0)
    def reduce(b: GKSummary, s: GKSummary): GKSummary = merge(b, s)
    def merge(x: GKSummary, y: GKSummary): GKSummary = {
      if (x.n == 0) y
      else if (y.n == 0) x
      else {
        val n = x.n + y.n
        val eps = if (x.eps <= 0 || y.eps <= 0) 0.0 else math.max(x.eps, y.eps)
        val ts =
          if (eps > 0) gkAbsorbMerge(x.tuples, y.tuples, (eps * n).toLong)
          else (x.tuples ++ y.tuples).sortBy(_.v).toVector
        GKSummary(n, ts, eps)
      }
    }
    def finish(b: GKSummary): GKSummary = b
    def bufferEncoder: org.apache.spark.sql.Encoder[GKSummary] =
      org.apache.spark.sql.Encoders.product[GKSummary]
    def outputEncoder: org.apache.spark.sql.Encoder[GKSummary] =
      org.apache.spark.sql.Encoders.product[GKSummary]
  }

  /** One-shot per-group approximate quantiles: build + query in one
    * aggregation pass. Every estimate is within `eps·n` ranks of
    * exact, at `O((1/eps)·log(eps·n))` state per (group, partition) —
    * vs an exact quantile's full per-group sort. */
  def approxQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
                      probs: Seq[Double], eps: Double = 0.01): DataFrame =
    quantileMergeEstimate(quantileSketch(df, keys, valueCol, eps),
      keys, probs)

  // ------------------- KMV / theta distinct sketch --------------------

  val KmvCol = "kmv_sketch"

  /** KMV distinct sketch in the theta formulation (Bar-Yossef 2002 KMV,
    * Beyer 2007 set-op estimators, Dasgupta 2016 theta sketches): a
    * threshold `theta` plus every distinct value hash STRICTLY below
    * it. `hashes` live in "u-space" — `xxhash64 ^ Long.MinValue`, so
    * SIGNED order equals unsigned order of the raw hash and the
    * fraction of the hash space below `u` is `u/2^64 + 0.5`. While a
    * group has seen fewer than `k` distinct hashes the sketch is not
    * `capped` and holds ALL of them (estimates are then EXACT);
    * capping sets `theta` to the k-th smallest hash and keeps the
    * `k−1` below it.
    *
    * Why this exists next to [[hllSketch]]: HLL only unions. The theta
    * form supports INTERSECTION and DIFFERENCE estimates
    * ([[kmvSetEstimates]]) — corpus-overlap questions ("how many
    * distinct customers/documents/tokens appear in BOTH snapshots")
    * answered from two per-shard-mergeable sketches of a few KB,
    * where the exact answer at 100 TB is a full shuffle join of both
    * fact tables. Estimate `|hashes|/theta` is unbiased with relative
    * standard error ≈ `1/sqrt(k−2)` (k=1024 → ~3%). */
  final case class KmvSketch(k: Int, thetaU: Long, capped: Boolean,
                             hashes: Seq[Long]) {
    /** Threshold as a fraction of the hash space (1.0 = uncapped). */
    def thetaFrac: Double =
      if (!capped) 1.0 else thetaU.toDouble / math.pow(2.0, 64) + 0.5
    /** Unbiased distinct estimate; EXACT while uncapped. */
    def estimate: Long = math.rint(hashes.size / thetaFrac).toLong
  }

  /** Merge two sorted-distinct u-space sequences, keeping at most
    * `cap` smallest (one two-pointer pass). */
  private[operators] def kmvMergeSorted(a: Seq[Long], b: Seq[Long],
                                        cap: Int): Vector[Long] = {
    val out = Vector.newBuilder[Long]
    var i = 0; var j = 0; var n = 0
    while (n < cap && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) {
          val v = a(i); if (j < b.length && b(j) == v) j += 1; i += 1; v
        } else { val v = b(j); j += 1; v }
      out += v; n += 1
    }
    out.result()
  }

  /** Aggregation buffer: the ≤ `k` smallest distinct u-space hashes,
    * sorted ascending. */
  final case class KmvBuf(mins: Seq[Long])

  /** Builds a [[KmvSketch]] from raw `xxhash64` values — map-side
    * combinable, O(k) state per (group, partition) regardless of
    * cardinality. The per-row hot path is O(1) for any hash at or
    * above the current k-th minimum (one comparison against the tail);
    * only the O(k·ln(n/k)) accepted inserts pay the O(k) copy. */
  final class KmvDistinct(k: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Long, KmvBuf, KmvSketch] {
    require(k >= 16, s"k must be >= 16 for a usable estimator, got $k")

    def zero: KmvBuf = KmvBuf(Vector.empty)

    def reduce(b: KmvBuf, rawHash: Long): KmvBuf = {
      val u = rawHash ^ Long.MinValue
      val m = b.mins
      if (m.length == k && u >= m.last) return b
      // binary search for the insertion point; skip exact duplicates
      var lo = 0; var hi = m.length
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (m(mid) < u) lo = mid + 1 else hi = mid
      }
      if (lo < m.length && m(lo) == u) return b
      val ins = (m.take(lo) :+ u) ++ m.drop(lo)
      KmvBuf(if (ins.length > k) ins.take(k) else ins)
    }

    def merge(x: KmvBuf, y: KmvBuf): KmvBuf =
      KmvBuf(kmvMergeSorted(x.mins, y.mins, k))

    def finish(b: KmvBuf): KmvSketch =
      if (b.mins.length == k)
        KmvSketch(k, b.mins.last, capped = true, b.mins.init)
      else KmvSketch(k, Long.MaxValue, capped = false, b.mins)

    def bufferEncoder: org.apache.spark.sql.Encoder[KmvBuf] =
      org.apache.spark.sql.Encoders.product[KmvBuf]
    def outputEncoder: org.apache.spark.sql.Encoder[KmvSketch] =
      org.apache.spark.sql.Encoders.product[KmvSketch]
  }

  /** Theta union of two sketches: threshold drops to the smaller
    * side's, both hash sets filter below it, and the result re-caps at
    * `k` if the union would exceed it — so rolling 100 k per-shard
    * sketches to a global grain stays O(k) state, and the estimate is
    * exactly what a direct sketch of the concatenated stream yields. */
  private[operators] def kmvUnion(a: KmvSketch, b: KmvSketch): KmvSketch = {
    if (a.k == 0) return b
    if (b.k == 0) return a
    require(a.k == b.k, s"cannot union KMV sketches of different k: ${a.k} vs ${b.k}")
    val k = a.k
    val thetaU = math.min(if (a.capped) a.thetaU else Long.MaxValue,
      if (b.capped) b.thetaU else Long.MaxValue)
    val merged = kmvMergeSorted(a.hashes, b.hashes, 2 * k)
      .filter(_ < thetaU)
    if (merged.length >= k)
      KmvSketch(k, merged(k - 1), capped = true, merged.take(k - 1))
    else KmvSketch(k, thetaU, capped = thetaU != Long.MaxValue, merged)
  }

  /** Mergeable rollup aggregator over stored [[KmvSketch]] rows. */
  final class KmvUnionAgg
      extends org.apache.spark.sql.expressions.Aggregator[KmvSketch, KmvSketch, KmvSketch] {
    def zero: KmvSketch = KmvSketch(0, Long.MaxValue, capped = false, Vector.empty)
    def reduce(b: KmvSketch, s: KmvSketch): KmvSketch = kmvUnion(b, s)
    def merge(x: KmvSketch, y: KmvSketch): KmvSketch = kmvUnion(x, y)
    def finish(b: KmvSketch): KmvSketch = b
    def bufferEncoder: org.apache.spark.sql.Encoder[KmvSketch] =
      org.apache.spark.sql.Encoders.product[KmvSketch]
    def outputEncoder: org.apache.spark.sql.Encoder[KmvSketch] =
      org.apache.spark.sql.Encoders.product[KmvSketch]
  }

  /** Distinct / union / intersection / difference estimates from TWO
    * sketches (Beyer 2007): cut both to the common threshold
    * `theta = min(theta_a, theta_b)`, then each set expression's
    * surviving-hash count divided by `theta` is an unbiased estimate
    * of its true cardinality. All five outputs are EXACT when neither
    * sketch ever capped. */
  private[operators] def kmvSetOps(a: KmvSketch, b: KmvSketch)
      : (Long, Long, Long, Long, Long) = {
    require(a.k == b.k, s"KMV set ops need equal k: ${a.k} vs ${b.k}")
    val thetaU = math.min(if (a.capped) a.thetaU else Long.MaxValue,
      if (b.capped) b.thetaU else Long.MaxValue)
    val thetaF =
      if (thetaU == Long.MaxValue) 1.0
      else thetaU.toDouble / math.pow(2.0, 64) + 0.5
    val sa = a.hashes.iterator.filter(_ < thetaU).toSet
    val sb = b.hashes.iterator.filter(_ < thetaU).toSet
    def est(n: Int): Long = math.rint(n / thetaF).toLong
    (est(sa.size), est(sb.size), est(sa.union(sb).size),
      est(sa.intersect(sb).size), est(sa.diff(sb).size))
  }

  private def rowToKmv(r: org.apache.spark.sql.Row): KmvSketch =
    KmvSketch(r.getInt(0), r.getLong(1), r.getBoolean(2),
      r.getSeq[Long](3))

  /** Per-group KMV sketches of `valueCol` (struct column, mergeable
    * via [[kmvMergeEstimate]] / usable pairwise via
    * [[kmvSetEstimates]]). Values hash as strings so an `int` shard
    * and a `bigint` shard of the same logical column sketch
    * identically. */
  def kmvSketch(df: DataFrame, keys: Seq[String], valueCol: String,
                k: Int = 1024): DataFrame = {
    require(keys.nonEmpty, "kmvSketch needs group keys")
    val agg = udaf(new KmvDistinct(k), org.apache.spark.sql.Encoders.scalaLong)
    df.filter(col(s"`$valueCol`").isNotNull)
      .groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(agg(xxhash64(col(s"`$valueCol`").cast("string"))).as(KmvCol))
  }

  /** Roll stored KMV sketches up to a coarser grain — the result is
    * again a `kmv_sketch` column (theta union re-capped at k), usable
    * for further rollups or [[kmvSetEstimates]]. */
  def kmvMerge(sketches: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "kmvMerge needs group keys")
    val mergeAgg = udaf(new KmvUnionAgg)
    // udaf() flattens the case-class input into its field parameters
    sketches.groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(mergeAgg(col(s"$KmvCol.k"), col(s"$KmvCol.thetaU"),
        col(s"$KmvCol.capped"), col(s"$KmvCol.hashes")).as(KmvCol))
  }

  /** Roll stored KMV sketches up to a coarser grain and estimate the
    * distinct count of the union — no rescan of the base data. */
  def kmvMergeEstimate(sketches: DataFrame, keys: Seq[String],
                       outCol: String = "approx_distinct"): DataFrame = {
    kmvMerge(sketches, keys)
      .withColumn(outCol, kmvEstimateUdf(col(KmvCol)))
      .drop(KmvCol)
  }

  /** Estimate a `kmv_sketch` struct column — shared by
    * [[kmvMergeEstimate]] and the streaming windowed-distinct
    * operator. */
  val kmvEstimateUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((r: org.apache.spark.sql.Row) => rowToKmv(r).estimate)

  /** Set-operation estimates between two sketch columns `aCol` and
    * `bCol` on each row: appends `est_a, est_b, est_union, est_inter,
    * est_diff_a` (all exact when neither side capped). The 100 TB
    * shape: sketch each corpus snapshot once at write time, answer
    * any pairwise overlap later from KBs of stored state. */
  def kmvSetEstimates(joined: DataFrame, aCol: String, bCol: String): DataFrame = {
    val ops = udf((a: org.apache.spark.sql.Row, b: org.apache.spark.sql.Row) => {
      val (ea, eb, eu, ei, ed) = kmvSetOps(rowToKmv(a), rowToKmv(b))
      (ea, eb, eu, ei, ed)
    })
    joined.withColumn("__ops__", ops(col(s"`$aCol`"), col(s"`$bCol`")))
      .withColumn("est_a", col("__ops__._1"))
      .withColumn("est_b", col("__ops__._2"))
      .withColumn("est_union", col("__ops__._3"))
      .withColumn("est_inter", col("__ops__._4"))
      .withColumn("est_diff_a", col("__ops__._5"))
      .drop("__ops__")
  }

  /** Per-group top-`k` frequent items via [[SpaceSaving]]: one
    * aggregation (map-side combinable, ≤ `capacity` entries of state
    * per group anywhere in the plan), then an explode of the ≤
    * `capacity`-element summary down to `k` rows per group. */
  def heavyHitters(df: DataFrame, keys: Seq[String], itemCol: String,
                   capacity: Int, k: Int): DataFrame = {
    require(k >= 1 && k <= capacity, s"need 1 <= k <= capacity, got k=$k")
    val agg = udaf(new SpaceSaving(capacity))
    // NULL items are ignored (SQL-aggregate semantics) — mapping them
    // to a sentinel would conflate NULL with a real category ("")
    df.filter(col(s"`$itemCol`").isNotNull)
      .groupBy(keys.map(c => col(s"`$c`")): _*)
      .agg(agg(col(s"`$itemCol`").cast("string")).as("__hh__"))
      .select((keys.map(c => col(s"`$c`")) :+
        posexplode(slice(col("__hh__"), lit(1), lit(k)))): _*)
      .drop("pos")
      .select((keys.map(c => col(s"`$c`")) :+ col("col.item") :+
        col("col.est_count") :+ col("col.max_err")): _*)
  }
}
