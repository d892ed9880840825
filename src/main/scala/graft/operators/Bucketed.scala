package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/**
 * Co-located joins via bucketed tables: persist both sides of a
 * frequently-joined pair `bucketBy(n, key)`, and every subsequent join on
 * that key runs WITHOUT a shuffle — each task sort-merges bucket i of the
 * left with bucket i of the right. For a fact table joined daily against
 * the same dimension at 100 TB, this converts the dominant exchange
 * (re-hashing the full fact table every query) into a one-time layout
 * cost at write time.
 *
 * This intentionally rides Spark's native bucketing (catalog tables +
 * `FileSourceScanExec` reporting `HashPartitioning`) rather than a custom
 * DSv2 `SupportsReportPartitioning` scan: the built-in path is
 * vectorized, codegen'd, AQE-aware, and understood by every downstream
 * tool. The helper's value is the pairing discipline — same key, same
 * bucket count on both sides, which is what the no-shuffle plan requires
 * — plus sorted buckets so the merge needs no extra sort at read time.
 */
object Bucketed {

  /** Persist `df` as a bucketed (and bucket-sorted) external parquet
    * table. `path` keeps the data out of the default warehouse dir. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    nBuckets: Int, path: String): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    // repartition on the bucket key first: bucketBy splits EVERY write
    // task's rows across all its buckets, so an unpartitioned write emits
    // up to tasks × nBuckets files (a small-file explosion at scale).
    // repartition uses the same Murmur3 hash as the bucket spec, so each
    // task then holds exactly one bucket -> nBuckets files total.
    df.repartition(nBuckets, org.apache.spark.sql.functions.col(s"`$bucketCol`"))
      .write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)
  }

  /** Equi-join two tables previously written with [[writeBucketed]] on
    * the SAME bucket count. With matched layouts the physical plan has no
    * Exchange on either side (assert via [[isCoLocated]]). */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    leftKey: String, rightKey: String,
                    joinType: String = "inner"): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(s"`$leftKey`") === r(s"`$rightKey`"), joinType)
  }

  /** True when the join plan contains no shuffle — the co-location
    * actually engaged. Useful as a guard in pipelines that RELY on the
    * bucketed layout (a silently mismatched bucket count would still
    * return correct rows, just with the 100 TB exchange back).
    *
    * Traverses the physical plan for [[ShuffleExchangeLike]] nodes
    * (unwrapping AQE's [[AdaptiveSparkPlanExec]]) rather than string-
    * matching the plan text, which could miss a post-AQE re-plan or
    * false-trip on an incidental "Exchange" in a column name. */
  def isCoLocated(df: DataFrame): Boolean = {
    def hasShuffle(p: SparkPlan): Boolean = p match {
      case a: AdaptiveSparkPlanExec => hasShuffle(a.executedPlan)
      case _: ShuffleExchangeLike => true
      case other =>
        other.children.exists(hasShuffle) ||
          other.subqueries.exists(hasShuffle)
    }
    !hasShuffle(df.queryExecution.executedPlan)
  }
}
