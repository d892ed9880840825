package graft.observability

import graft.state.StateStore
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.util.QueryExecutionListener
import java.util.concurrent.atomic.AtomicLong

/**
 * Observability listeners persisted to the task state store — native
 * ports of the reference's py4j-bridged listeners
 * (reference: core/observability/spark_listener.py:48-478). Each record
 * lands under `state/` via [[StateStore.append]], keyed the way the
 * reference keys them, so downstream tooling reads the same layout.
 */
object Listeners {

  /** Per-query plan capture (spark_listener.py:48-96): query name +
    * elapsed + the executed plan string. */
  final class GraftQueryExecutionListener(store: StateStore, taskName: String)
    extends QueryExecutionListener {
    private val n = new AtomicLong(0)

    private def record(funcName: String, qe: QueryExecution, durationNs: Long,
                       error: Option[String]): Unit = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = m.createObjectNode()
      node.put("task", taskName)
      node.put("func", funcName)
      node.put("duration_ns", durationNs)
      node.put("plan", qe.executedPlan.toString.take(20000))
      error.foreach(node.put("error", _))
      store.append(s"state_${taskName}_queries",
        s"query_${n.getAndIncrement()}.json", m.writeValueAsString(node))
    }

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      record(funcName, qe, durationNs, None)

    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      record(funcName, qe, 0L, Some(exception.toString.take(2000)))
  }

  /** Per-stage task metrics incl. shuffle/spill/GC
    * (spark_listener.py:131-371). */
  final class GraftSparkListener(store: StateStore, taskName: String)
    extends SparkListener {
    override def onStageCompleted(stage: SparkListenerStageCompleted): Unit = {
      val info = stage.stageInfo
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = m.createObjectNode()
      node.put("task", taskName)
      node.put("stage_id", info.stageId)
      node.put("name", info.name.take(500))
      node.put("num_tasks", info.numTasks)
      Option(info.taskMetrics).foreach { tm =>
        node.put("executor_run_time_ms", tm.executorRunTime)
        node.put("jvm_gc_time_ms", tm.jvmGCTime)
        node.put("shuffle_read_bytes", tm.shuffleReadMetrics.totalBytesRead)
        node.put("shuffle_write_bytes", tm.shuffleWriteMetrics.bytesWritten)
        node.put("memory_spill_bytes", tm.memoryBytesSpilled)
        node.put("disk_spill_bytes", tm.diskBytesSpilled)
        node.put("input_bytes", tm.inputMetrics.bytesRead)
        node.put("output_bytes", tm.outputMetrics.bytesWritten)
      }
      store.append(s"state_${taskName}_stages",
        s"stage_${info.stageId}.json", m.writeValueAsString(node))
    }
  }

  /** Streaming progress JSON per micro-batch (spark_listener.py:374-478). */
  final class GraftStreamingListener(store: StateStore, taskName: String)
    extends StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
      store.append(s"state_${taskName}_stream",
        s"progress_${e.progress.batchId}.json", e.progress.json)
  }

  /** Register the full trio on a session (task.py:315-341 analogue).
    * Returns an unregister thunk. */
  def register(spark: SparkSession, store: StateStore, taskName: String): () => Unit = {
    val qel = new GraftQueryExecutionListener(store, taskName)
    val sl = new GraftSparkListener(store, taskName)
    val stl = new GraftStreamingListener(store, taskName)
    spark.listenerManager.register(qel)
    spark.sparkContext.addSparkListener(sl)
    spark.streams.addListener(stl)
    () => {
      spark.listenerManager.unregister(qel)
      spark.sparkContext.removeSparkListener(sl)
      spark.streams.removeListener(stl)
    }
  }
}
