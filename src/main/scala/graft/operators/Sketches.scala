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
}
