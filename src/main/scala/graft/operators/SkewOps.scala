package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew mitigation operators for the cases AQE's runtime skew-join split
 * does not reach. AQE rebalances sort-merge join partitions after a
 * shuffle materializes, which covers most joins — but (a) a skewed
 * shuffle feeding an AGGREGATION is not split (skew-join optimization is
 * join-only), and (b) stream-static and nested-loop shapes never qualify.
 * Salting solves these structurally: the hot key's rows spread over
 * `saltFactor` synthetic sub-keys, so no single task owns the whole key.
 *
 * All salts are DETERMINISTIC (derived by hashing row content / sequence
 * replication, never rand()), so stage retries recompute identical rows —
 * the same failure mode the merge cardinality guard avoids.
 */
object SkewOps {

  private val Salt = "__graft_salt__"

  /**
   * Inner/left join where the LEFT side has skewed join keys and the
   * right side is too big to broadcast: left rows get a deterministic
   * salt in [0, saltFactor) from a hash over ALL left columns (a hot
   * key's many distinct rows spread across salts), the right side
   * replicates once per salt via an exploded sequence (no shuffle — the
   * explode runs map-side), and the join key becomes (keys..., salt).
   * Row-for-row equal to the unsalted join; shuffle partitions for the
   * hot key shrink by ~saltFactor. Right-side cost: saltFactor × its
   * size through the shuffle — pick saltFactor just big enough to tame
   * the hot key (8–32 in practice).
   */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 2, "saltFactor must be >= 2")
    require(keys.nonEmpty, "saltedJoin needs join keys")
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin supports inner/left joins, got $joinType " +
        "(right/full would need the salt on the other side)")
    val l = left.withColumn(Salt,
      pmod(xxhash64(left.columns.map(c => col(s"`$c`")).toIndexedSeq: _*),
        lit(saltFactor)).cast("int"))
    val r = right.withColumn(Salt,
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, keys :+ Salt, joinType).drop(Salt)
  }

  /**
   * Two-stage aggregation for skewed group keys where map-side partial
   * aggregation cannot compress — the canonical case is
   * `countDistinct`-like state that grows with the number of DISTINCT
   * values per key, so one reducer still receives the hot key's whole
   * state. Stage 1 groups by (keys, salt-from-value-hash) — the hot
   * key's distinct values spread across saltFactor partial groups —
   * stage 2 merges the partials per key.
   *
   * Provided concretely for distinct counts: returns one row per key
   * group with `n_distinct` of `valueCol`. Exact (salting partitions the
   * value space, distinct sets are disjoint across salts).
   */
  def saltedDistinctCount(df: DataFrame, keys: Seq[String],
                          valueCol: String, saltFactor: Int = 16): DataFrame = {
    require(keys.nonEmpty, "saltedDistinctCount needs group keys")
    require(saltFactor >= 2, "saltFactor must be >= 2")
    val keyCols = keys.map(c => col(s"`$c`"))
    df.withColumn(Salt,
        pmod(xxhash64(col(s"`$valueCol`")), lit(saltFactor)).cast("int"))
      .groupBy((keyCols :+ col(Salt)): _*)
      .agg(countDistinct(col(s"`$valueCol`")).as("__graft_partial__"))
      .groupBy(keyCols: _*)
      .agg(sum("__graft_partial__").as("n_distinct"))
  }
}
