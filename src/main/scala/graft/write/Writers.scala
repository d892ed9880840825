package graft.write

import graft.table.ManagedTable
import graft.table.ManagedTable.Commit
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Table constraint failure (reference: core/exception/execution.py). */
final class WriteTableConstraintError(msg: String) extends RuntimeException(msg)

/**
 * Binds the pure [[WritePatterns]] transforms to [[ManagedTable]]
 * persistence — the equivalent of the reference's write functions
 * executing Delta merges and then capturing commit stats
 * (write.py:303-317, :531-544, :997-1010, delta.py:134-168).
 *
 * `persist_dataset` / `stage_results` follow the reference
 * (write.py:81-86): DISK_ONLY persist around merges, `localCheckpoint`
 * to truncate lineage for long foreachBatch chains.
 */
object Writers {

  import MergeEmulator.{ChangeMark, PreMark}
  import org.apache.spark.sql.functions.{col, lit}

  /** Partition-scoped merge commits are active when the physical layout is
    * partitioned and every partition column participates in the merge
    * condition (`use_paritition_column_in_merge`, write.py:472-486) — only
    * then does the merge result contain the COMPLETE contents of every
    * touched partition, so the commit can be prevDirs − touched + new
    * instead of a full-table rewrite (the reference's file-skipping
    * intent, write.py:190-213). */
  private def partitionScoped(opts: WriteOptions, partitionBy: Seq[String]): Boolean =
    partitionBy.nonEmpty && partitionBy.forall(opts.usePartitionColumnInMerge.contains)

  /** Restrict the merge target to the partitions present in the source
    * batch. The distinct source partition tuples (one small job over the
    * already-staged source — O(touched partitions) rows on the driver)
    * become a literal predicate, so the target scan prunes untouched
    * partitions at PLANNING time: a one-partition merge into a 100 TB
    * table reads one partition, not 100 TB. */
  private[graft] def scopedTarget(table: ManagedTable, source: DataFrame,
                           partitionBy: Seq[String]): DataFrame = {
    val full = table.read
    val touched = source.select(partitionBy.map(col): _*).distinct().collect()
    val pred = touched.toSeq
      .map { r =>
        partitionBy.zipWithIndex.map { case (c, i) =>
          if (r.isNullAt(i)) col(c).isNull else col(c) === lit(r.get(i))
        }.reduce(_ && _)
      }
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    full.filter(pred)
  }

  /**
   * Commit a merge result, recording the change data feed when enabled
   * (the `delta.enableChangeDataFeed` analogue; reference consumes it via
   * delta_source.py:198-250). With CDF on, the merge output carries
   * [[MergeEmulator.ChangeMark]]/[[MergeEmulator.PreMark]]; one DISK_ONLY
   * persist materializes the full-outer join once and feeds BOTH the
   * snapshot write and the change-set write — at 100 TB the join is the
   * dominant cost and must never run twice.
   *
   * Partition-scoped merges (see [[partitionScoped]]) commit through
   * [[ManagedTable.selectiveOverwrite]]: untouched partitions' files are
   * carried into the new version by reference, byte-identical.
   */
  private def commitMerge(table: ManagedTable, result: DataFrame, op: String,
                          opts: WriteOptions, userMetadata: Option[String],
                          partitionBy: Seq[String]): Commit = {
    def commit(snapshot: DataFrame, change: Option[DataFrame]): Commit =
      if (partitionScoped(opts, partitionBy))
        table.selectiveOverwrite(snapshot, partitionBy, userMetadata, op, change)
      else
        table.write(snapshot, op, "replace", userMetadata, partitionBy, change)
    if (!opts.enableChangeDataFeed)
      commit(result, None)
    else {
      val tracked = result.persist(StorageLevel.DISK_ONLY)
      try {
        val snapshot = tracked.drop(ChangeMark, PreMark)
        // Delta CDF row shape: postimages + inserts keep the data columns,
        // preimages expand the saved pre-update struct
        val post = tracked.filter(col(ChangeMark).isNotNull)
          .drop(PreMark)
          .withColumnRenamed(ChangeMark, "_change_type")
        val pre = tracked.filter(col(ChangeMark) === "update_postimage")
          .select(col(s"$PreMark.*"))
          .withColumn("_change_type", lit("update_preimage"))
        commit(snapshot, Some(post.unionByName(pre)))
      } finally { tracked.unpersist(); () }
    }
  }

  /** The target frame a merge reads: the full snapshot, or only the
    * source's partitions when the merge is partition-scoped. */
  private def mergeTarget(table: ManagedTable, source: DataFrame,
                          opts: WriteOptions, partitionBy: Seq[String]): DataFrame =
    if (partitionScoped(opts, partitionBy)) scopedTarget(table, source, partitionBy)
    else table.read

  private def staged(df: DataFrame, opts: WriteOptions): DataFrame = {
    val p = if (opts.persistDataset) df.persist(StorageLevel.DISK_ONLY) else df
    if (opts.stageResults) p.localCheckpoint() else p
  }

  private def unstage(df: DataFrame, opts: WriteOptions): Unit =
    if (opts.persistDataset) { df.unpersist(); () }

  def append(spark: SparkSession, path: String, source: DataFrame,
             opts: WriteOptions = WriteOptions(),
             userMetadata: Option[String] = None,
             partitionBy: Seq[String] = Nil): Commit = {
    val df = WritePatterns.appendColumns(source, opts)
    ManagedTable(spark, path).write(df, "APPEND", "append", userMetadata, partitionBy)
  }

  def overwrite(spark: SparkSession, path: String, source: DataFrame,
                opts: WriteOptions = WriteOptions(),
                userMetadata: Option[String] = None,
                partitionBy: Seq[String] = Nil): Commit = {
    val df = WritePatterns.appendColumns(source, opts)
    ManagedTable(spark, path).write(df, "OVERWRITE", "replace", userMetadata, partitionBy)
  }

  /** Partition-scoped replace — the `selective_overwrite` write type the
    * reference declares but never implements (sources.py:85). Stamps the
    * same append metadata columns, then replaces ONLY the partitions
    * present in the batch (ManagedTable.selectiveOverwrite). */
  def selectiveOverwrite(spark: SparkSession, path: String, source: DataFrame,
                         partitionBy: Seq[String],
                         opts: WriteOptions = WriteOptions(),
                         userMetadata: Option[String] = None): Commit = {
    val df = WritePatterns.appendColumns(source, opts)
    ManagedTable(spark, path).selectiveOverwrite(df, partitionBy, userMetadata)
  }

  def scd1(spark: SparkSession, path: String, source: DataFrame, keys: Seq[String],
           opts: WriteOptions = WriteOptions(),
           userMetadata: Option[String] = None,
           partitionBy: Seq[String] = Nil): Commit = {
    val table = ManagedTable(spark, path)
    table.createIfNotExists(WritePatterns.targetSchemaFor(source, "scd1", keys, Nil, opts))
    val s = staged(source, opts)
    val result = WritePatterns.scd1(mergeTarget(table, s, opts, partitionBy), s, keys, opts)
    val c = commitMerge(table, result, "MERGE(scd1)", opts, userMetadata, partitionBy)
    unstage(s, opts); c
  }

  def scd2(spark: SparkSession, path: String, source: DataFrame, keys: Seq[String],
           opts: WriteOptions = WriteOptions(),
           userMetadata: Option[String] = None,
           partitionBy: Seq[String] = Nil): Commit = {
    val table = ManagedTable(spark, path)
    table.createIfNotExists(WritePatterns.targetSchemaFor(source, "scd2", keys, Nil, opts))
    val s = staged(source, opts)
    val result = WritePatterns.scd2(mergeTarget(table, s, opts, partitionBy), s, keys, opts)
    val c = commitMerge(table, result, "MERGE(scd2)", opts, userMetadata, partitionBy)
    unstage(s, opts); c
  }

  def scd3(spark: SparkSession, path: String, source: DataFrame, keys: Seq[String],
           columnAttributes: Seq[String],
           opts: WriteOptions = WriteOptions(),
           userMetadata: Option[String] = None,
           partitionBy: Seq[String] = Nil,
           changeTracking: Option[(String, Seq[String], String)] = None): Commit = {
    val table = ManagedTable(spark, path)
    table.createIfNotExists(
      WritePatterns.targetSchemaFor(source, "scd3", keys, columnAttributes, opts))
    val s = staged(source, opts)
    val result = WritePatterns.scd3(mergeTarget(table, s, opts, partitionBy), s, keys,
      columnAttributes, opts, changeTracking)
    val c = commitMerge(table, result, "MERGE(scd3)", opts, userMetadata, partitionBy)
    unstage(s, opts); c
  }

  /** Pre-write FK-ish constraint (write.py:1165-1189): every (table,
    * columns) dependency must cover all source rows. */
  def tableConstraint(source: DataFrame, targetName: String,
                      dependencies: Seq[(DataFrame, Seq[String])]): Unit =
    dependencies.foreach { case (ref, columns) =>
      val missing = WritePatterns.constraintViolations(source, ref, columns).count()
      if (missing > 0)
        throw new WriteTableConstraintError(
          s"Source dataframe of target table $targetName has $missing rows " +
            s"failing the table constraint on columns ${columns.mkString(",")}")
    }
}
