package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic

/**
 * v1 streaming `Source.getBatch` results must carry `isStreaming = true`
 * (MicroBatchExecution asserts it before splicing the batch into the
 * trigger plan), and the only constructor for such frames is
 * `SparkSession.internalCreateDataFrame` — `private[sql]`, the same hook
 * Spark's own FileStreamSource uses. This one-object bridge lives under
 * `org.apache.spark.sql` purely to reach it; nothing else in the repo
 * depends on Spark internals this way.
 */
object StreamingFrame {
  /** Re-wrap a batch frame's physical plan as a streaming frame. */
  def mark(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }

  /** The inverse, for v1 `Sink.addBatch`: the incoming micro-batch frame
    * is streaming-planned and refuses batch writes — re-wrap its physical
    * plan as a plain batch frame (what Delta's sink does). */
  def unmark(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[classic.Dataset[org.apache.spark.sql.Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = false)
  }
}
