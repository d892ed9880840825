package graft.streaming

import graft.table.ManagedTable
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/**
 * Stream FROM a managed table — the Delta streaming-source analogue
 * (reference tables are Delta and feed downstream streams the same way;
 * reference: core/sources/delta_source.py:19-44). Registered as
 * `format("graft-table")`:
 *
 * {{{
 *   spark.readStream.format("graft-table").option("path", root).load()
 * }}}
 *
 * Offsets are TABLE VERSIONS (one `LongOffset` = highest version
 * consumed), so the checkpoint state is one number and restart recovery
 * is exact. Batch composition:
 *
 *  - default: the stream's FIRST batch is the full snapshot at the
 *    version current when the stream starts (the Delta initial-snapshot
 *    backfill), then each later version contributes exactly the data
 *    dirs its commit ADDED — an O(new data) tail read, never a rescan;
 *  - `startingVersion=N`: no snapshot backfill, tail from version N's
 *    own added dirs on;
 *  - non-append commits (merge/overwrite/DML/restore/optimize) fail the
 *    stream loudly, exactly like Delta, unless `skipChangeCommits=true`
 *    skips them (their rewrites carry dirs forward, so appended-dir
 *    diffing would misattribute rewritten history as new rows);
 *  - `maxVersionsPerTrigger=K` rate-limits admission (Delta's
 *    maxFilesPerTrigger intent) so a stream bootstrapping against a long
 *    backlog advances in bounded micro-batches.
 *
 * 100 TB shape: a batch reads ONLY the dirs added in its version range
 * under the stream's fixed start schema (later schema evolutions project
 * onto it, missing columns NULL); the driver does one log listing + one
 * bounded-concurrency commit-range resolve per trigger.
 */
final class TableStreamSource(
    sqlContext: SQLContext,
    path: String,
    options: Map[String, String]) extends Source {

  private val spark = sqlContext.sparkSession
  private val table = ManagedTable(spark, path)

  private def opt(key: String): Option[String] =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }

  private val startingVersion: Option[Long] = opt("startingVersion").map(_.toLong)
  private val skipChangeCommits: Boolean =
    opt("skipChangeCommits").exists(_.toBoolean)
  private val maxVersionsPerTrigger: Option[Long] =
    opt("maxVersionsPerTrigger").map(_.toLong)

  /** `readChangeFeed=true` streams the CHANGE FEED instead of appended
    * rows (Delta CDF streaming): each version in a batch contributes its
    * per-row changes — stored change parquet for merges, dir-diff
    * synthesis for appends/overwrites — stamped with `_change_type` /
    * `_commit_version` / `_commit_timestamp`. No snapshot backfill:
    * default tails changes AFTER the stream-start version,
    * `startingVersion=N` serves changes from version N on. */
  private val cdf: Boolean = opt("readChangeFeed").exists(_.toBoolean)

  private val startCommit = table.lastCommit.getOrElse(
    throw new IllegalStateException(
      s"managed table $path does not exist — streams need a created table"))

  /** Highest version considered already consumed before the first batch.
    * Default (snapshot) mode sets it one BELOW the start version so the
    * initial backfill is always offered, even on an idle table; CDF mode
    * tails from the stream-start version. */
  private val floor: Long = startingVersion.map(_ - 1L).getOrElse(
    if (cdf) startCommit.version else startCommit.version - 1L)

  override val schema: StructType = {
    val base = StructType.fromDDL(startCommit.schemaDdl)
    if (!cdf) base
    else base.add("_change_type", "string")
      .add("_commit_version", "long")
      .add("_commit_timestamp", "timestamp")
  }

  /** Highest version OFFERED so far (admission bookkeeping; re-synced
    * from the checkpoint via the first getBatch after restart). */
  @volatile private var offered: Long = floor

  override def getOffset: Option[V1Offset] = {
    val latest = table.latestVersion.getOrElse(return None)
    if (latest > offered) {
      val end = maxVersionsPerTrigger
        .map(k => math.min(latest, offered + math.max(1L, k))).getOrElse(latest)
      offered = end
    }
    // CDF mode pins its position even when idle: a fresh stream with no
    // new commits still logs `floor` as batch 0, so a restart tails from
    // the FIRST start, not from wherever the table is by then (Delta's
    // source does the same). Snapshot mode always has the backfill to
    // offer, so `offered > floor` holds whenever the table exists.
    if (offered > floor || cdf) Some(LongOffset(math.max(offered, floor))) else None
  }

  private def versionOf(o: V1Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val endV = versionOf(end)
    if (endV > offered) offered = endV // restart: re-sync admission floor
    val partitioned = startCommit.partitionBy.nonEmpty

    if (cdf) {
      val startV = start.map(versionOf).getOrElse(floor)
      val batch =
        if (startV >= endV)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
        else table.readChangeFeed(startV + 1L, Some(endV))
          .select(schema.fieldNames.map(org.apache.spark.sql.functions.col)
            .toIndexedSeq: _*)
      return org.apache.spark.sql.graft.StreamingFrame.mark(batch)
    }

    val dirs: Seq[String] = start match {
      case None if startingVersion.isEmpty =>
        // fresh default-mode stream: the initial backfill IS the full
        // composition at the end offset (commits between stream start and
        // first trigger are covered by the snapshot itself)
        table.commitAt(endV).dirs
      case _ =>
        val startV = start.map(versionOf).getOrElse(startingVersion.get - 1L)
        tailDirs(startV, endV)
    }

    val batch =
      if (dirs.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else table.readDirsAs(dirs.distinct, schema, partitioned)
    org.apache.spark.sql.graft.StreamingFrame.mark(batch)
  }

  /** Added dirs of versions (startV, endV]: each APPEND contributes its
    * dir-diff vs the parent; version 0 contributes its whole composition.
    * One batched commit-range resolve (parent included as diff base). */
  private def tailDirs(startV: Long, endV: Long): Seq[String] = {
    if (startV >= endV) return Nil
    val from = math.max(0L, startV)
    val byVersion = table.commitsBetween(from, endV).map(c => c.version -> c).toMap
    (startV + 1L to endV).flatMap { v =>
      byVersion.get(v) match {
        case None =>
          throw new IllegalStateException(
            s"version $v of $path was vacuumed past the stream checkpoint — " +
              "the tail cannot be reconstructed; restart the stream fresh")
        case Some(c) =>
          val op = c.operation.toUpperCase
          val isAppend = op.startsWith("APPEND") || op.startsWith("CREATE TABLE")
          if (isAppend) {
            if (v == 0L) c.dirs
            else byVersion.get(v - 1L).map(p => c.dirs.filterNot(p.dirs.toSet))
              .getOrElse(throw new IllegalStateException(
                s"cannot diff version $v of $path — parent commit vacuumed; " +
                  "restart the stream fresh"))
          } else if (skipChangeCommits) Nil
          else throw new IllegalStateException(
            s"stream over $path hit a data-changing commit at version $v " +
              s"(${c.operation}); streaming sources serve appends only — " +
              "set skipChangeCommits=true to skip rewrites, or restart " +
              "from the current snapshot")
      }
    }
  }

  override def stop(): Unit = ()

  override def toString: String = s"TableStreamSource[$path]"
}

/**
 * Managed-table streaming SINK — `writeStream.format("graft-table")`,
 * the Delta-sink analogue. Each micro-batch re-enters the batch writers
 * (append by default; `writeType=scd1|scd2` with `keys=a,b` merges), and
 * every commit carries `(appId, batchId)` in the table's txn map — the
 * same exactly-once guard the foreachBatch path uses — so a micro-batch
 * redelivered after a crash between sink commit and checkpoint advance
 * is recognized via `lastTxnVersion` and skipped, never double-written.
 * appId is keyed by the query's checkpoint location (the name of the
 * epoch sequence; a fresh checkpoint = a fresh sequence).
 */
final class TableStreamSink(
    sqlContext: SQLContext,
    path: String,
    options: Map[String, String],
    outputMode: org.apache.spark.sql.streaming.OutputMode =
      org.apache.spark.sql.streaming.OutputMode.Append()) extends org.apache.spark.sql.execution.streaming.Sink {

  private val spark = sqlContext.sparkSession
  private def opt(key: String): Option[String] =
    options.collectFirst { case (k, v) if k.equalsIgnoreCase(key) => v }

  // Complete mode re-emits the WHOLE aggregation result each trigger —
  // appending it would duplicate every group, so the default there is a
  // per-batch overwrite; Update mode's changed-rows-only batches need a
  // keyed merge, so writeType=scd1 + keys must be explicit
  private val writeType = opt("writeType").getOrElse {
    if (outputMode == org.apache.spark.sql.streaming.OutputMode.Complete()) "overwrite"
    else "append"
  }
  private val keys: Seq[String] =
    opt("keys").map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
  private val appId = "graft-table-sink:" +
    opt("checkpointLocation").getOrElse(path)
  private val writeOpts = graft.write.WriteOptions(
    now = opt("now"),
    enableChangeDataFeed = opt("enableChangeDataFeed").exists(_.toBoolean),
    // merge-mode sinks accrete one small dir per micro-batch; the
    // auto-compaction threshold keeps them self-maintaining
    autoCompactMinDirs = opt("autoCompactMinDirs").map(_.toInt),
    mergeSchema = opt("mergeSchema").exists(_.toBoolean))

  override def addBatch(batchId: Long, data: org.apache.spark.sql.DataFrame): Unit = {
    val table = ManagedTable(spark, path)
    if (table.exists && table.lastTxnVersion(appId).exists(batchId <= _)) return
    val batch = org.apache.spark.sql.graft.StreamingFrame.unmark(data)
    val txn = Some((appId, batchId))
    writeType match {
      case "append" => graft.write.Writers.append(spark, path, batch, writeOpts, txn = txn)
      case "overwrite" => graft.write.Writers.overwrite(spark, path, batch, writeOpts, txn = txn)
      case "scd1" =>
        require(keys.nonEmpty, "writeType=scd1 requires .option(\"keys\", ...)")
        graft.write.Writers.scd1(spark, path, batch, keys, writeOpts, txn = txn)
      case "scd2" =>
        require(keys.nonEmpty, "writeType=scd2 requires .option(\"keys\", ...)")
        graft.write.Writers.scd2(spark, path, batch, keys, writeOpts, txn = txn)
      case other => throw new IllegalArgumentException(
        s"graft-table sink writeType $other (append, overwrite, scd1, scd2)")
    }
    ()
  }

  override def toString: String = s"TableStreamSink[$path,$writeType]"
}

/** `format("graft-table")` registration (META-INF services). */
final class TableStreamProvider extends StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.collectFirst { case (k, v) if k.equalsIgnoreCase("path") => v }
      .getOrElse(throw new IllegalArgumentException(
        "graft-table stream requires .option(\"path\", <table root>)"))

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode):
      org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "graft-table sink: use the table's own clustering/partitioning, not partitionBy")
    new TableStreamSink(sqlContext, pathOf(parameters), parameters, outputMode)
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val path = pathOf(parameters)
    val c = ManagedTable(sqlContext.sparkSession, path).lastCommit.getOrElse(
      throw new IllegalStateException(
        s"managed table $path does not exist — streams need a created table"))
    val cdf = parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("readChangeFeed") => v.toBoolean
    }.getOrElse(false)
    val base = StructType.fromDDL(c.schemaDdl)
    val inferred =
      if (!cdf) base
      else base.add("_change_type", "string")
        .add("_commit_version", "long")
        .add("_commit_timestamp", "timestamp")
    (s"graft-table[$path]", schema.getOrElse(inferred))
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    new TableStreamSource(sqlContext, pathOf(parameters), parameters)
}
