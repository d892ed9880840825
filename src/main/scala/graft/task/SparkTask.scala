package graft.task

import graft.cdc.Cdc
import graft.config.Config._
import graft.features.Features
import graft.secrets.{SecretBackend, Secrets}
import graft.sources.SourceRead
import graft.state.StateStore
import graft.write.{WriteOptions, Writers}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger
import java.util.UUID

/**
 * The execution-function surface (reference: the user-supplied Python fn,
 * core/execution/spark_task/execution_fn.py:8-196). Scala analogues for
 * all three resolution modes: a class implementing [[Transform]] resolved
 * by fully-qualified name via reflection (the "module" variant), a
 * SQL-text transform over the inputs registered as temp views, or Scala
 * source text toolbox-compiled to a Transform (the "body"/"file"
 * exec-string variant — [[SparkTask.scalaTransform]]).
 */
trait Transform {
  def apply(inputs: Map[String, DataFrame], args: Map[String, String]): Map[String, DataFrame]
}

/** Single-in single-out convenience. */
trait SimpleTransform extends Transform {
  def transform(input: DataFrame): DataFrame
  override def apply(inputs: Map[String, DataFrame],
                     args: Map[String, String]): Map[String, DataFrame] =
    Map("default" -> transform(inputs.values.head))
}

final class TaskValidationError(msgs: Seq[String])
  extends RuntimeException(msgs.mkString("; "))

/** Per-run context (reference: SparkTaskExecutionContext,
  * core/execution/spark_task/context.py): batch id + state store. */
final case class TaskContext(
    spark: SparkSession,
    batchId: String,
    state: Option[StateStore])

/**
 * The task lifecycle: build/validate → inputs (CDC pre-step → read →
 * feature post-steps) → execution → outputs (write-pattern dispatch,
 * batch or streaming foreachBatch) → persist CDC state + run stamps.
 * Mirrors the reference's `SparkTask` (core/task/spark/task.py:268-658)
 * and the Input/Executor/Output operators under
 * core/execution/operator/spark_task/.
 *
 * Everything before the output write is lazy — one Catalyst plan from
 * scan to sink, so filter/column pushdown crosses the whole task.
 */
object SparkTask {

  /** Reflection resolution of the execution class (execution_fn.py:45-115
    * analogue). The class needs a no-arg constructor. */
  def resolveTransform(fqcn: String): Transform =
    Class.forName(fqcn).getDeclaredConstructor().newInstance() match {
      case t: Transform => t
      case other => throw new IllegalArgumentException(
        s"$fqcn is not a graft.task.Transform (got ${other.getClass})")
    }

  /** SQL-text execution: inputs become temp views named by input name. */
  def sqlTransform(sql: String): Transform = new Transform {
    def apply(inputs: Map[String, DataFrame],
              args: Map[String, String]): Map[String, DataFrame] = {
      val spark = inputs.values.head.sparkSession
      inputs.foreach { case (n, df) => df.createOrReplaceTempView(n) }
      Map("default" -> spark.sql(sql))
    }
  }

  /** Exec-a-string execution: Scala source text compiled at task-build
    * time into a [[Transform]] — the JVM analogue of the reference's
    * function-body variant (`exec(func_body)` then resolve the callable,
    * execution_fn.py:181-196; the "file" variant at :158-178 is the same
    * text read from disk). Uses the Scala toolbox (scala-compiler ships
    * with Spark), so errors surface at build time with the compiler's
    * message, mirroring ExecutionFuncInitializeError. The compiled code
    * runs with full driver privileges, exactly like the reference's exec
    * — the config author is trusted. */
  def scalaTransform(code: String): Transform = {
    import scala.tools.reflect.ToolBox
    val tb = scala.reflect.runtime.universe
      .runtimeMirror(getClass.getClassLoader).mkToolBox()
    val value =
      try tb.eval(tb.parse(code))
      catch {
        case e: Throwable => throw new IllegalArgumentException(
          s"execution_code failed to compile/evaluate: ${e.getMessage}", e)
      }
    value match {
      case t: Transform => t
      case other => throw new IllegalArgumentException(
        "execution_code must evaluate to a graft.task.Transform " +
          s"(got ${if (other == null) "null" else other.getClass.getName})")
    }
  }

  /** Read one input applying CDC pre-step + feature post-steps; returns the
    * DataFrame and the CDC state to persist on success. */
  def readInput(ctx: TaskContext, in: InputConf,
                refresh: RefreshPolicy): (DataFrame, Option[Cdc.State]) = {
    // file-path CDC replaces the read path with the modified-file list
    // BEFORE the read (reference file_source.py:727-813, listing via the
    // Hadoop FileSystem instead of a Sharepoint/SFTP client)
    in.features.changeData.filter(_.changeFeatureType == "file_path_cdc_feed")
      .foreach { _ =>
        val prev = ctx.state.map(Cdc.loadState(_, in.name)).getOrElse(Cdc.State.empty)
        val startMs = prev.nextValue.flatMap(_.value).map(_.toLong)
          .getOrElse(graft.odata.ODataOffset.EarliestMs)
        val endMs = System.currentTimeMillis()
        val files = graft.sources.FileOps.modifiedFiles(
          ctx.spark.sparkContext.hadoopConfiguration, in.path, startMs, endMs)
        val df = files.map(f => SourceRead.readBatch(ctx.spark, in.copy(path = f)))
          .reduce(_ unionByName _)
        val state = Cdc.State(Some("file_modified"),
          Some(Cdc.FeatureValue(Some(endMs.toString), "integer")),
          Some(Cdc.FeatureValue(Some(startMs.toString), "integer")))
        return (Features.applyAll(df, in.features, None), Some(state))
      }

    val raw = SourceRead.readBatch(ctx.spark, in)
    val (cdcFilter, cdcState): (Option[String], Option[Cdc.State]) =
      in.features.changeData match {
        case Some(cd) if refresh.refreshType == "backfill" =>
          val (s, e) = (refresh.startValue.orElse(cd.startValue),
            refresh.endValue.orElse(cd.endValue))
          require(s.nonEmpty && e.nonEmpty,
            s"input ${in.name}: backfill requires start_value and end_value")
          val r = Cdc.backfillBounds(cd.attribute, cd.valueType, s.get, e.get)
          (r.filterExpr, r.newState)
        case Some(cd) =>
          val prev = ctx.state.map(Cdc.loadState(_, in.name)).getOrElse(Cdc.State.empty)
          val r = Cdc.attributeBounds(raw, cd.attribute, cd.valueType, prev, cd.startValue)
          (r.filterExpr, r.newState)
        case None => (None, None)
      }
    (Features.applyAll(raw, in.features, cdcFilter), cdcState)
  }

  /** A FAIL-severity output expectation failed — the write was aborted
    * BEFORE any data landed. Subscribable through [[StepResult]]'s
    * severity routing like any other step failure. */
  final class ExpectationViolation(msg: String) extends RuntimeException(msg)

  /**
   * Evaluate an output's declared expectations against the batch about
   * to be written — the reference's event-severity semantics
   * (CONTINUE/FAIL, `StepResult.Severity`) applied to data-quality
   * rules. ALL rules evaluate in one aggregate over one scan
   * ([[graft.operators.Expectations.check]]); each verdict is recorded
   * in the state store under `expectations/<output>` BEFORE any
   * severity fires, so a FAILed batch leaves its evidence. FAIL on any
   * failing rule aborts the write ([[ExpectationViolation]]); CONTINUE
   * failures only record. The gate is a pre-write scan by design — an
   * abort must happen before bytes land; a monitoring-only (all-
   * CONTINUE) rule set could instead ride `Dataset.observe` inside the
   * write pass, which is a caller-side choice, not this gate.
   */
  def checkExpectations(ctx: TaskContext, out: OutputConf,
                        df: DataFrame): Unit = {
    if (out.expectations.isEmpty) return
    import graft.operators.Expectations
    val sev = out.expectations.map(e => StepResult.Severity.parse(e.severity))
    val rules = out.expectations.map(e => Expectations.parseRules(e.rule) match {
      case Seq(one) => one
      case many => throw new TaskValidationError(Seq(
        s"output ${out.name}: each expectation entry must hold exactly one " +
          s"rule so severity is unambiguous; '${e.rule}' parsed to ${many.size}"))
    })
    val verdicts = Expectations.check(df, rules).collect()
    val json = verdicts.map { r =>
      s"""{"rule":"${r.getString(0)}","column":"${r.getString(1)}",""" +
        s""""n_violations":${r.getLong(2)},"passed":${r.getInt(3) == 1}}"""
    }.mkString("[", ",", "]")
    ctx.state.foreach(_.set("expectations", out.name,
      s"""{"batch_id":"${ctx.batchId}","verdicts":$json}"""))
    val failed = verdicts.zip(sev).filter(_._1.getInt(3) == 0)
    val aborting = failed.collect {
      case (r, StepResult.Fail) =>
        s"${r.getString(0)}(${r.getString(1)}): ${r.getLong(2)} violations"
    }
    if (aborting.nonEmpty)
      throw new ExpectationViolation(
        s"output ${out.name}: expectations failed — ${aborting.mkString("; ")}")
  }

  /** A FAIL-severity drift check tripped — the write was aborted before
    * any data landed, and the anomalous batch's profile was NOT added
    * to the history (a bad load can never poison its own baseline). */
  final class DriftViolation(msg: String) extends RuntimeException(msg)

  /**
   * Evaluate an output's declared drift monitor against the batch
   * about to be written ([[graft.operators.Expectations.metricsProfile]]
   * + [[graft.operators.Expectations.driftCheck]] — integer metrics,
   * engine-exact verdicts). Verdicts record in the state store under
   * `drift/<output>` BEFORE any severity fires; on FAIL the write
   * aborts ([[DriftViolation]]) and the profile is withheld from the
   * history; otherwise the profile appends to the metrics table
   * txn-stamped, so a replayed streaming epoch never double-counts.
   */
  def checkDrift(ctx: TaskContext, out: OutputConf, df: DataFrame,
                 txn: Option[(String, Long)] = None): Unit = {
    val d = out.drift.getOrElse(return)
    import graft.operators.Expectations
    val sev = StepResult.Severity.parse(d.severity)
    val t = graft.table.ManagedTable(ctx.spark, d.metricsPath)
    val driftTxn = txn.map { case (appId, epoch) => (s"$appId:drift", epoch) }
    if (driftTxn.exists { case (a, e) =>
        t.exists && t.lastTxnVersion(a).exists(e <= _) }) return // replayed
    val prof = Expectations.metricsProfile(df, Expectations.parseMetrics(d.metrics))
      .withColumn("epoch", org.apache.spark.sql.functions.lit(
        txn.map(_._2).getOrElse(-1L)))
      .select("epoch", "metric", "column", "value")
      .localCheckpoint()
    val history =
      if (t.exists) t.read.select("metric", "column", "value")
      else ctx.spark.createDataFrame(
        ctx.spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        prof.drop("epoch").schema)
    val verdicts = Expectations.driftCheck(prof.drop("epoch"), history,
      d.tolerancePpm).collect()
    val json = verdicts.map { r =>
      s"""{"metric":"${r.getString(0)}","column":"${r.getString(1)}",""" +
        s""""value":${r.getLong(2)},"hist_n":${r.getAs[Long]("hist_n")},""" +
        s""""passed":${r.getAs[Int]("passed") == 1}}"""
    }.mkString("[", ",", "]")
    ctx.state.foreach(_.set("drift", out.name,
      s"""{"batch_id":"${ctx.batchId}","verdicts":$json}"""))
    val drifted = verdicts.filter(_.getAs[Int]("passed") == 0)
    if (drifted.nonEmpty && sev == StepResult.Fail)
      throw new DriftViolation(
        s"output ${out.name}: drift check failed — " + drifted.map(r =>
          s"${r.getString(0)}(${r.getString(1)})=${r.getLong(2)}").mkString("; "))
    graft.write.Writers.append(ctx.spark, d.metricsPath, prof,
      graft.write.WriteOptions(), txn = driftTxn)
    ()
  }

  /** Dispatch one batch write by write_type (OutputOperator + write.py).
    *
    * `txn` makes the write EXACTLY-ONCE under foreachBatch redelivery,
    * Delta `txnAppId`/`txnVersion` style: Structured Streaming re-runs a
    * micro-batch after a crash between sink commit and checkpoint
    * advance, and a bare re-run would double-append. With `txn =
    * (appId, epochId)`, the epoch high-water rides the sink's commit
    * ATOMICALLY (same log record as the data), so a replayed epoch is
    * recognized (`lastTxnVersion`) and skipped — idempotent merges
    * included, saving their join re-run. */
  def writeOutput(ctx: TaskContext, out: OutputConf, df: DataFrame,
                  txn: Option[(String, Long)] = None): Unit = {
    val opts = WriteOptions.fromMap(out.options)
    val replayed = txn.exists { case (appId, epoch) =>
      graft.table.ManagedTable(ctx.spark, out.path)
        .lastTxnVersion(appId).exists(_ >= epoch)
    }
    if (replayed) {
      ctx.state.foreach(_.set("sink", s"${out.name}_last_write",
        s"""{"batch_id":"${ctx.batchId}","write_type":"${out.writeType}","skipped_replay_epoch":${txn.get._2}}"""))
      return
    }
    // declarative data-quality gate: a FAIL rule aborts before any write
    checkExpectations(ctx, out, df)
    checkDrift(ctx, out, df, txn)
    val meta = Some(s"""{"batch_id":"${ctx.batchId}","output_name":"${out.name}","load_type":"${out.writeType}"}""")
    out.writeType match {
      case "append" => Writers.append(ctx.spark, out.path, df, opts, meta, out.partitionBy, txn)
      case "overwrite" => Writers.overwrite(ctx.spark, out.path, df, opts, meta, out.partitionBy, txn)
      case "selective_overwrite" =>
        Writers.selectiveOverwrite(ctx.spark, out.path, df, out.partitionBy, opts, meta, txn)
      case "scd1" => Writers.scd1(ctx.spark, out.path, df, out.keyAttributes, opts, meta, out.partitionBy, txn)
      case "scd2" => Writers.scd2(ctx.spark, out.path, df, out.keyAttributes, opts, meta, out.partitionBy, txn)
      case "scd3" => Writers.scd3(ctx.spark, out.path, df, out.keyAttributes,
        out.columnAttributes, opts, meta, out.partitionBy, txn = txn)
      case other => throw new IllegalArgumentException(s"write type $other")
    }
    ctx.state.foreach(_.set("sink", s"${out.name}_last_write",
      s"""{"batch_id":"${ctx.batchId}","write_type":"${out.writeType}"}"""))
    // post-load layout maintenance as POLICY (opt-in per output): a
    // daily/hourly load cadence fragments the sink one small dir — and
    // under DV-landing deletes one tombstone dir — per load. The debt
    // decision reads the sink's head commit only (no data scan, no
    // listing — ManagedTable.maintainLayoutIfNeeded), so the every-load
    // check costs nothing until a rewrite is actually due. Broader than
    // the merge writers' inline `auto_compact_min_dirs` micro-compaction
    // (Writers.autoCompact — unpartitioned small-dir folds only): this
    // also purges deletion vectors, folds onto a persisted cluster grid,
    // and compacts partitioned sinks partition-scoped.
    if (out.options.get("auto_maintain").exists(_.toBoolean)) {
      val max = out.options.get("maintain_max_dir_bytes").map(_.toLong)
        .getOrElse(64L << 20)
      graft.table.ManagedTable(ctx.spark, out.path)
        .maintainLayoutIfNeeded(max)
      ()
    }
    // retention as POLICY (opt-in): every load commits a version, and a
    // daily/hourly sink holds every superseded version's bytes forever
    // without it. The quiet path is two pointer reads; a firing prunes
    // the slack's worth of history in one pass (vacuumIfNeeded)
    out.options.get("auto_vacuum_keep").map(_.toInt).foreach { keep =>
      val slack = out.options.get("vacuum_slack").map(_.toInt).getOrElse(16)
      graft.table.ManagedTable(ctx.spark, out.path)
        .vacuumIfNeeded(keep, slack)
      ()
    }
  }

  /** Streaming write: every micro-batch re-enters the batch writer —
    * foreachBatch reuse exactly like the reference (output.py:200-224).
    * Returns the started query so the task waits on and stops only ITS
    * OWN queries (not every active query of a shared session).
    *
    * The txn app id is the CHECKPOINT location: it names the offset/epoch
    * sequence the epoch ids come from, survives restarts of the same
    * query, and rolls over naturally when a user points the query at a
    * fresh checkpoint (epochs restart at 0 there, and so must the
    * high-water). */
  def writeStreamOutput(ctx: TaskContext, out: OutputConf, df: DataFrame,
                        stateLocation: String): org.apache.spark.sql.streaming.StreamingQuery = {
    val checkpoint = out.checkpointLocation
      .getOrElse(s"$stateLocation/checkpoints/${out.name}")
    var w = df.writeStream
      .queryName(out.name)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        writeOutput(ctx, out, batch, txn = Some((s"graft-stream:$checkpoint", epochId)))
      }
    w = out.triggerMode match {
      case Some("once") => w.trigger(Trigger.Once())
      case None | Some("availableNow") => w.trigger(Trigger.AvailableNow())
      case Some(p) if p.startsWith("processingTime=") =>
        w.trigger(Trigger.ProcessingTime(p.stripPrefix("processingTime=")))
      case Some(other) => throw new IllegalArgumentException(s"trigger $other")
    }
    w.start()
  }

  /**
   * Run a task end-to-end. Returns the output DataFrame map produced by the
   * execution (post-write reads come from the sink tables).
   */
  def run(spark: SparkSession, conf: TaskConf,
          secrets: Option[SecretBackend] = None): Map[String, DataFrame] = {
    val errs = validate(conf)
    if (errs.nonEmpty) throw new TaskValidationError(errs)

    // secrets formatted into every option string (task.py:302-314)
    val resolved = secrets match {
      case Some(b) => conf.copy(
        inputs = conf.inputs.map(i => i.copy(
          path = Secrets.format(i.path, b), options = Secrets.formatMap(i.options, b))),
        outputs = conf.outputs.map(o => o.copy(
          path = Secrets.format(o.path, b), options = Secrets.formatMap(o.options, b))))
      case None => conf
    }

    // isolated session per task run: temp views registered by sqlTransform
    // (named after input names) must not collide across concurrent tasks
    // sharing one SparkContext (PipelineRunner runs batches in parallel)
    val session = spark.newSession()
    val state = resolved.stateLocation.map(loc =>
      new StateStore(session.sparkContext.hadoopConfiguration, loc))
    val ctx = TaskContext(session, UUID.randomUUID().toString, state)

    val isStream = resolved.refreshPolicy.refreshType == "stream"
    val transform = (resolved.executionClass, resolved.executionSql,
        resolved.executionCode) match {
      case (Some(c), _, _) => resolveTransform(c)
      case (_, Some(sql), _) => sqlTransform(sql)
      case (_, _, Some(code)) => scalaTransform(code)
      case _ => throw new IllegalStateException("unreachable: validated above")
    }

    if (isStream) {
      // feature post-steps (filter/schema-inference/drop/select) apply to
      // streaming reads exactly like batch (input.py routes both through
      // the same post_do_step_features); CDC is batch-only
      val inputs = resolved.inputs.map(i => i.name ->
        Features.applyAll(SourceRead.readStream(session, i), i.features)).toMap
      val outputs = bindOutputs(transform(inputs, Map.empty), resolved.outputs)
      val stateLoc = resolved.stateLocation.getOrElse(
        java.nio.file.Files.createTempDirectory("graft_stream_state").toString)
      val started = Seq.newBuilder[org.apache.spark.sql.streaming.StreamingQuery]
      val queries =
        try outputs.map { case (out, df) =>
          val q = writeStreamOutput(ctx, out, df, stateLoc)
          started += q
          q
        } catch {
          case e: Throwable =>
            // don't leak already-running queries when a later start fails
            started.result().foreach(q => try q.stop() catch { case _: Throwable => })
            throw e
        }
      // stream completion wait (task.py:547-556) — ONLY this task's queries
      queries.foreach(_.processAllAvailable())
      queries.foreach(_.stop())
      outputs.map { case (out, df) => out.name -> df }.toMap
    } else {
      val reads = resolved.inputs.map(i => i.name -> readInput(ctx, i, resolved.refreshPolicy))
      val inputs = reads.map { case (n, (df, _)) => n -> df }.toMap
      val outputs = bindOutputs(transform(inputs, Map.empty), resolved.outputs)
      outputs.foreach { case (out, df) => writeOutput(ctx, out, df) }
      // persist CDC state only after all writes succeeded (task.py:519-544)
      for {
        st <- state
        (name, (_, Some(cdcState))) <- reads
      } Cdc.saveState(st, name, cdcState.copy(batchId = Some(ctx.batchId)))
      state.foreach(_.set("state", "pipeline_batch_load_timestamp",
        java.time.Instant.now().toString))
      outputs.map { case (out, df) => out.name -> df }.toMap
    }
  }

  /** Output-binding validation (execution.py:119-130): a single unnamed
    * result binds to a single output; a map must cover every output name. */
  private def bindOutputs(result: Map[String, DataFrame],
                          outputs: Seq[OutputConf]): Seq[(OutputConf, DataFrame)] =
    if (result.keySet == Set("default") && outputs.size == 1)
      Seq(outputs.head -> result("default"))
    else outputs.map { o =>
      o -> result.getOrElse(o.name, throw new TaskValidationError(
        Seq(s"execution produced ${result.keys.mkString(",")} but output ${o.name} expected")))
    }
}
