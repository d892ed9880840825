package graft.table

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, Literal}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

/**
 * Maintenance procedures as SQL `CALL` statements — the operational
 * surface (Delta's `VACUUM`/`OPTIMIZE`/`DESCRIBE HISTORY`/`RESTORE`
 * verbs, Iceberg's `CALL catalog.procedure(...)` spelling, which
 * Spark 4's parser supports natively):
 *
 * {{{
 *   CALL graft.history('/path/to/t')             -- the commit log as rows
 *   CALL graft.vacuum('/path', 3)                -- keep last 3 versions
 *   CALL graft.vacuum('/path', 3, true)          -- dry run
 *   CALL graft.optimize('/path')                 -- fold small dirs
 *   CALL graft.analyze('/path')                  -- recompute skipping stats
 *   CALL graft.purge_deletes('/path')            -- materialize DV deletes
 *   CALL graft.restore('/path', 2)               -- roll back to version 2
 *   CALL graft.clone('/src', '/dst')             -- zero-copy clone
 *   CALL graft.export_manifest('/path', '/out')  -- external-engine manifest
 * }}}
 *
 * Each procedure is a runnable command returning its stats as rows, so
 * `spark.sql("CALL ...")` both executes the operation and hands back
 * the numbers a pipeline wants to log. Arguments are positional
 * literals (the parser's `Call` node carries them as expressions;
 * non-literal arguments refuse loudly).
 */
object SqlProcedures {

  private[table] def metricsJson(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":"$v"""" }.mkString("{", ",", "}")

  private[table] def attr(name: String, dt: DataType): AttributeReference =
    AttributeReference(name, dt, nullable = true)()

  private[table] def litArg(e: Expression, what: String): Any = e match {
    case l: Literal if l.value != null => l.dataType match {
      case StringType => l.value.toString
      case _ => l.value
    }
    case other => throw new IllegalArgumentException(
      s"CALL argument $what must be a literal, got ${other.sql}")
  }

  private[table] def strArg(e: Expression, what: String): String =
    litArg(e, what).toString

  private[table] def longArg(e: Expression, what: String): Long =
    litArg(e, what) match {
      case i: Int => i.toLong
      case l: Long => l
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => throw new IllegalArgumentException(
        s"CALL argument $what must be an integer literal, got $other")
    }

  private[table] def doubleArg(e: Expression, what: String): Double =
    litArg(e, what) match {
      case d: Double => d
      case f: Float => f.toDouble
      case i: Int => i.toDouble
      case l: Long => l.toDouble
      case d: java.math.BigDecimal => d.doubleValue()
      case d: BigDecimal => d.toDouble
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(
        s"CALL argument $what must be a numeric literal, got $other")
    }

  private[table] def boolArg(e: Expression, what: String): Boolean =
    litArg(e, what) match {
      case b: Boolean => b
      case other => throw new IllegalArgumentException(
        s"CALL argument $what must be a boolean literal, got $other")
    }

  /** Move a managed table directory. Commit-log entries reference
    * ABSOLUTE dir paths, so a bare FS move would orphan every entry:
    * the log is rewritten first (both the plain and the fs-qualified
    * spelling of the old root), then the directory moves. Shared by
    * `ALTER TABLE ... RENAME TO` and [[GraftCatalog.renameTable]]. */
  private[table] def renameTableDir(spark: SparkSession,
                                    fromRoot: String, toRoot: String): Unit = {
    val from = new org.apache.hadoop.fs.Path(fromRoot)
    val to = new org.apache.hadoop.fs.Path(toRoot)
    val fs = from.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new org.apache.hadoop.fs.Path(from, "_graft_log")),
      s"graft table at $fromRoot does not exist")
    require(!fs.exists(to), s"rename target $toRoot already exists")
    val logDir = new org.apache.hadoop.fs.Path(from, "_graft_log")
    val entries = fs.listStatus(logDir).map(_.getPath)
      .filter(_.getName.endsWith(".json"))
    val fromUri = fs.makeQualified(from).toUri.toString
    entries.foreach { e =>
      val in = fs.open(e)
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      val rewritten = body
        .replace(fromUri, fs.makeQualified(to).toUri.toString)
        .replace(from.toString, to.toString)
      val out = fs.create(e, true)
      try out.write(rewritten.getBytes("UTF-8")) finally out.close()
    }
    Option(to.getParent).foreach(fs.mkdirs(_))
    require(fs.rename(from, to), s"filesystem rename $from -> $to failed")
  }
}

/** `CALL graft.<proc>(...)` — dispatches on the procedure name. */
final case class GraftCallCommand(proc: String, args: Seq[Expression])
  extends LeafRunnableCommand {
  import SqlProcedures._

  override val output: Seq[Attribute] = proc match {
    case "history" => Seq(
      attr("version", LongType), attr("operation", StringType),
      attr("timestamp_ms", LongType), attr("num_dirs", IntegerType),
      attr("operation_metrics", StringType), attr("user_metadata", StringType))
    case "vacuum" | "vacuum_older_than" | "vacuum_index_view" => Seq(
      attr("pruned_versions", IntegerType), attr("deleted_data_dirs", IntegerType),
      attr("deleted_change_dirs", IntegerType), attr("deleted_dv_dirs", IntegerType),
      // holders whose pin trails the requested cut by more than the warn
      // threshold ("holder@version,..."), else NULL — a forgotten hold
      // pins history forever, and this is where an operator sees it
      attr("stale_holds", StringType))
    case "optimize" | "analyze" | "purge_deletes" | "restore" | "clone" |
         "cluster_append" | "cluster_by" | "maintain" => Seq(
      attr("version", LongType), attr("operation", StringType),
      attr("operation_metrics", StringType))
    case "maintain_auto" => Seq(
      // head-commit layout debt + whether it crossed the thresholds;
      // `operations` lists the maintenance commits that landed
      // ("op@version,..."), NULL when below threshold
      attr("small_dirs", IntegerType), attr("dv_dirs", IntegerType),
      attr("triggered", IntegerType), attr("operations", StringType))
    case "vacuum_auto" | "vacuum_index_view_auto" => Seq(
      // retained-version count (two pointer reads) + whether it crossed
      // keep_last + slack; the vacuum columns mirror CALL graft.vacuum
      // and are zero/NULL on a quiet pass
      attr("retained", IntegerType), attr("triggered", IntegerType),
      attr("pruned_versions", IntegerType), attr("deleted_data_dirs", IntegerType),
      attr("deleted_change_dirs", IntegerType), attr("deleted_dv_dirs", IntegerType),
      attr("stale_holds", StringType))
    case "vacuum_older_auto" => Seq(
      // the FLOOR commit's age (the quiet-path evidence: one entry
      // read) + whether the age policy fired; vacuum columns as above
      attr("floor_age_ms", LongType), attr("triggered", IntegerType),
      attr("pruned_versions", IntegerType), attr("deleted_data_dirs", IntegerType),
      attr("deleted_change_dirs", IntegerType), attr("deleted_dv_dirs", IntegerType),
      attr("stale_holds", StringType))
    case "export_manifest" => Seq(
      attr("version", LongType), attr("num_files", IntegerType),
      attr("num_manifests", IntegerType))
    case "drift_check" => Seq(
      attr("metric", StringType), attr("column", StringType),
      attr("value", LongType), attr("hist_n", LongType),
      attr("hist_sum", LongType), attr("passed", IntegerType))
    case "init_agg_view" | "refresh_agg_view" |
         "init_bm25_view" | "refresh_bm25_view" |
         "init_phrase_view" | "refresh_phrase_view" |
         "init_ann_view" | "refresh_ann_view" |
         "init_lm_view" | "refresh_lm_view" |
         "init_nb_view" | "refresh_nb_view" |
         "init_neardup_view" | "refresh_neardup_view" |
         "init_semantic_view" | "refresh_semantic_view" |
         "init_benchmark_view" | "refresh_benchmark_view" => Seq(
      attr("source_version", LongType))
    case "init_join_view" | "refresh_join_view" => Seq(
      attr("left_version", LongType), attr("right_version", LongType))
    case "ann_view_drift" => Seq(attr("mse", DoubleType))
    case "refresh_views" => Seq(
      attr("kind", StringType), attr("state", StringType),
      attr("source_version", LongType))
    case "stream_refresh_view" => Seq(
      attr("query_id", StringType), attr("batches", LongType),
      attr("status", StringType))
    case "show_holds" | "release_hold" => Seq(
      attr("holder", StringType), attr("version", LongType))
    case other => throw new IllegalArgumentException(
      s"unknown graft procedure `$other` — supported: history, vacuum, " +
        "vacuum_older_than, " +
        "optimize, analyze, cluster_by, cluster_append, maintain, " +
        "maintain_auto, vacuum_auto, vacuum_older_auto, " +
        "vacuum_index_view_auto, purge_deletes, restore, clone, " +
        "export_manifest, drift_check, init_agg_view, refresh_agg_view, " +
        "init_join_view, refresh_join_view, init_bm25_view, " +
        "refresh_bm25_view, init_phrase_view, refresh_phrase_view, " +
        "init_ann_view, refresh_ann_view, init_lm_view, refresh_lm_view, " +
        "init_nb_view, refresh_nb_view, init_neardup_view, " +
        "refresh_neardup_view, init_semantic_view, refresh_semantic_view, " +
        "init_benchmark_view, refresh_benchmark_view, vacuum_index_view, " +
        "ann_view_drift, refresh_views, stream_refresh_view, show_holds, " +
        "release_hold")
  }


  private def commitRow(c: ManagedTable.Commit): Row =
    Row(c.version, c.operation, metricsJson(c.operationMetrics))

  private def vacuumRow(s: ManagedTable.VacuumStats): Row =
    Row(s.prunedVersions, s.deletedDataDirs, s.deletedChangeDirs,
      s.deletedDvDirs,
      if (s.staleHolds.isEmpty) null
      else s.staleHolds.map { case (h, v) => s"$h@$v" }.mkString(","))

  override def run(spark: SparkSession): Seq[Row] = {
    def table(i: Int = 0): ManagedTable =
      ManagedTable(spark, strArg(args(i), "table path"))
    proc match {
      case "history" =>
        // the optional limit bounds the log read itself (newest-first,
        // O(limit) entries) — a LIMIT clause over the result would only
        // trim rows AFTER the whole log was resolved
        require(args.size == 1 || args.size == 2,
          "CALL graft.history(path[, limit])")
        val commits =
          if (args.size == 2)
            table().historyNewest(longArg(args(1), "limit").toInt)
          else table().history
        commits.map(c => Row(c.version, c.operation, c.timestampMs,
          c.dirs.size, metricsJson(c.operationMetrics),
          c.userMetadata.orNull))
      case "vacuum" =>
        require(args.size == 2 || args.size == 3,
          "CALL graft.vacuum(path, keep_last[, dry_run])")
        val dry = args.size == 3 && boolArg(args(2), "dry_run")
        Seq(vacuumRow(table().vacuum(longArg(args(1), "keep_last").toInt,
          dryRun = dry)))
      case "vacuum_older_than" =>
        // age-based retention (Delta's VACUUM ... RETAIN semantics):
        // prune versions committed strictly before the timestamp; the
        // head always survives, and retention holds clamp here too
        require(args.size == 2 || args.size == 3,
          "CALL graft.vacuum_older_than(path, ts_ms[, dry_run])")
        val dry = args.size == 3 && boolArg(args(2), "dry_run")
        Seq(vacuumRow(table().vacuumOlderThan(longArg(args(1), "ts_ms"),
          dryRun = dry)))
      case "optimize" =>
        require(args.size == 1 || args.size == 2,
          "CALL graft.optimize(path[, max_dir_bytes])")
        val max = if (args.size == 2) longArg(args(1), "max_dir_bytes")
          else 64L << 20
        table().compactDirs(max) match {
          case Some(c) => Seq(commitRow(c))
          case None => Nil // nothing to fold — no commit
        }
      case "analyze" =>
        require(args.size == 1, "CALL graft.analyze(path)")
        Seq(commitRow(table().recomputeStats()))
      case "cluster_append" =>
        require(args.size == 1, "CALL graft.cluster_append(path)")
        table().clusterAppend().map(commitRow).toSeq
      case "cluster_by" =>
        // the HEAVY periodic re-cluster: full rewrite into range
        // buckets with a persisted grid `maintain` folds appends onto
        require(args.size == 3,
          "CALL graft.cluster_by(path, column, buckets)")
        Seq(commitRow(table().clusterBy(strArg(args(1), "column"),
          longArg(args(2), "buckets").toInt)))
      case "maintain" =>
        // routine layout maintenance: purge deletion vectors + fold the
        // append tail (clusterAppend under a persisted grid, compactDirs
        // otherwise) — one commit row per maintenance commit landed
        require(args.size == 1 || args.size == 2,
          "CALL graft.maintain(path[, max_dir_bytes])")
        val max = if (args.size == 2) longArg(args(1), "max_dir_bytes")
          else 64L << 20
        table().maintainLayout(max).map(commitRow)
      case "maintain_auto" =>
        // maintenance as POLICY: report the head-commit layout debt and
        // rewrite only past the thresholds — the decision is one
        // log-entry read (no data scan, no FS listing), so a scheduler
        // can CALL this after every load/fold and pay nothing until the
        // debt is real
        require(args.size >= 1 && args.size <= 4,
          "CALL graft.maintain_auto(path[, max_dir_bytes" +
            "[, min_small_dirs[, min_dv_dirs]]])")
        val max = if (args.size >= 2) longArg(args(1), "max_dir_bytes")
          else 64L << 20
        val minSmall = if (args.size >= 3)
          longArg(args(2), "min_small_dirs").toInt else 16
        val minDv = if (args.size >= 4)
          longArg(args(3), "min_dv_dirs").toInt else 8
        val t = table()
        val debt = t.maintenanceDebt(max)
        val triggered = debt.smallDirs >= minSmall || debt.dvDirs >= minDv
        // route through maintainLayoutIfNeeded rather than maintainLayout:
        // it owns the partitioned-table branch (compactDirs is
        // unpartitioned-only) and re-checks the same thresholds for free
        val landed =
          if (triggered) t.maintainLayoutIfNeeded(max, minSmall, minDv)
          else Nil
        Seq(Row(debt.smallDirs, debt.dvDirs, if (triggered) 1 else 0,
          if (landed.isEmpty) null
          else landed.map(c => s"${c.operation}@${c.version}").mkString(",")))
      case "vacuum_auto" =>
        // retention as POLICY: the quiet path is two pointer reads, so a
        // scheduler can CALL this after every load and pay nothing until
        // the history actually crossed keep_last + slack — then one
        // vacuum prunes the whole slack's worth of versions at once
        require(args.size == 2 || args.size == 3,
          "CALL graft.vacuum_auto(path, keep_last[, slack_versions])")
        val keep = longArg(args(1), "keep_last").toInt
        val slack = if (args.size >= 3)
          longArg(args(2), "slack_versions").toInt else 16
        val t = table()
        val retained = t.retainedVersionCount
        t.vacuumIfNeeded(keep, slack) match {
          case Some(s) => Seq(Row(retained, 1, s.prunedVersions,
            s.deletedDataDirs, s.deletedChangeDirs, s.deletedDvDirs,
            if (s.staleHolds.isEmpty) null
            else s.staleHolds.map { case (h, v) => s"$h@$v" }.mkString(",")))
          case None => Seq(Row(retained, 0, 0, 0, 0, 0, null))
        }
      case "vacuum_older_auto" =>
        // age-based retention policy (Delta's RETAIN-hours contract as
        // a WHEN): quiet asks cost the floor pointer + one entry read;
        // a firing prunes everything older than now - max_age_ms and
        // only ever fires when the cut actually reclaims something
        require(args.size == 2 || args.size == 3,
          "CALL graft.vacuum_older_auto(path, max_age_ms[, slack_ms])")
        val age = longArg(args(1), "max_age_ms")
        val slackMs = if (args.size >= 3) longArg(args(2), "slack_ms")
          else 6L * 3600 * 1000
        val t = table()
        val floorAge = t.floorAgeMs().getOrElse(throw new IllegalStateException(
          s"managed table ${strArg(args(0), "table path")} does not exist"))
        t.vacuumOlderThanIfNeeded(age, slackMs) match {
          case Some(s) => Seq(Row(floorAge, 1, s.prunedVersions,
            s.deletedDataDirs, s.deletedChangeDirs, s.deletedDvDirs,
            if (s.staleHolds.isEmpty) null
            else s.staleHolds.map { case (h, v) => s"$h@$v" }.mkString(",")))
          case None => Seq(Row(floorAge, 0, 0, 0, 0, 0, null))
        }
      case "purge_deletes" =>
        require(args.size == 1, "CALL graft.purge_deletes(path)")
        table().purgeDeletes().map(commitRow).toSeq
      case "restore" =>
        require(args.size == 2, "CALL graft.restore(path, version)")
        Seq(commitRow(table().restore(longArg(args(1), "version"))))
      case "clone" =>
        require(args.size == 2 || args.size == 3,
          "CALL graft.clone(src, dst[, deep])")
        val deep = args.size == 3 && boolArg(args(2), "deep")
        Seq(commitRow(table().cloneTo(strArg(args(1), "target path"), deep)))
      case "export_manifest" =>
        require(args.size == 2, "CALL graft.export_manifest(path, out_dir)")
        val s = table().exportManifest(strArg(args(1), "out_dir"))
        Seq(Row(s.version, s.numFiles, s.numManifests))
      // profile `path`, judge against the history in `metrics_path`,
      // APPEND the profile to the history (call-after-load semantics —
      // the caller decides what to do with failed verdicts)
      case "drift_check" =>
        require(args.size == 4,
          "CALL graft.drift_check(path, metrics_dsl, metrics_path, tol_ppm)")
        import graft.operators.Expectations
        val metricsPath = strArg(args(2), "metrics_path")
        val mt = ManagedTable(spark, metricsPath)
        val prof = Expectations.metricsProfile(table().read,
          Expectations.parseMetrics(strArg(args(1), "metrics_dsl")))
          .localCheckpoint()
        val history =
          if (mt.exists) mt.read.select("metric", "column", "value")
          else spark.createDataFrame(
            spark.sparkContext.emptyRDD[Row], prof.schema)
        val verdicts = Expectations.driftCheck(prof, history,
          longArg(args(3), "tol_ppm")).collect()
        graft.write.Writers.append(spark, metricsPath, prof,
          graft.write.WriteOptions())
        verdicts.map(r => Row(r.getString(0), r.getString(1), r.getLong(2),
          r.getAs[Long]("hist_n"), r.getAs[Long]("hist_sum"),
          r.getAs[Int]("passed"))).toSeq
      // the incremental-view family as CALL procedures — a pure-SQL
      // pipeline can initialize and maintain every standing view the
      // Scala API has (aggregate, join-aggregate, BM25 postings)
      case "init_agg_view" | "refresh_agg_view" =>
        require(args.size == 4 || args.size == 5,
          s"CALL graft.$proc(source, state, group_csv, sum_csv[, minmax_csv])")
        val view = new IncrementalAggView(spark,
          strArg(args(0), "source path"), strArg(args(1), "state path"),
          csv(args(2), "group_csv"), csv(args(3), "sum_csv"),
          if (args.size == 5) csv(args(4), "minmax_csv") else Nil)
        val v = if (proc == "init_agg_view") view.initialize() else view.refresh()
        Seq(Row(v))
      case "init_join_view" | "refresh_join_view" =>
        require(args.size == 6 || args.size == 7,
          s"CALL graft.$proc(left, right, state, keys_csv, group_csv, " +
            "sum_csv[, minmax_csv])")
        val view = new IncrementalJoinAggView(spark,
          strArg(args(0), "left path"), strArg(args(1), "right path"),
          strArg(args(2), "state path"), csv(args(3), "keys_csv"),
          csv(args(4), "group_csv"), csv(args(5), "sum_csv"),
          if (args.size == 7) csv(args(6), "minmax_csv") else Nil)
        val (vl, vr) =
          if (proc == "init_join_view") view.initialize() else view.refresh()
        Seq(Row(vl, vr))
      case "init_bm25_view" | "refresh_bm25_view" =>
        require(args.size == 2 || args.size == 3,
          s"CALL graft.$proc(source, state[, expected_docs])")
        val view = new Bm25IndexView(spark, strArg(args(0), "source path"),
          strArg(args(1), "state path"),
          expectedDocs = if (args.size == 3) longArg(args(2), "expected_docs")
            else 10000000L)
        val v = if (proc == "init_bm25_view") view.initialize() else view.refresh()
        Seq(Row(v))
      case "init_phrase_view" | "refresh_phrase_view" =>
        require(args.size == 2 || args.size == 3,
          s"CALL graft.$proc(source, state[, expected_docs])")
        val view = new PositionalIndexView(spark,
          strArg(args(0), "source path"), strArg(args(1), "state path"),
          expectedDocs = if (args.size == 3) longArg(args(2), "expected_docs")
            else 10000000L)
        val v = if (proc == "init_phrase_view") view.initialize()
          else view.refresh()
        Seq(Row(v))
      case "init_lm_view" | "refresh_lm_view" =>
        require(args.size == 2,
          s"CALL graft.$proc(source, state)")
        val view = new CorpusLmView(spark, strArg(args(0), "source path"),
          strArg(args(1), "state path"))
        val v = if (proc == "init_lm_view") view.initialize()
          else view.refresh()
        Seq(Row(v))
      case "init_benchmark_view" | "refresh_benchmark_view" =>
        require(args.size == 2 || args.size == 3,
          s"CALL graft.$proc(source, state[, shingle_n])")
        val view = new BenchmarkIndexView(spark,
          strArg(args(0), "source path"), strArg(args(1), "state path"),
          shingleN = if (args.size == 3) longArg(args(2), "shingle_n").toInt
            else 3)
        val v = if (proc == "init_benchmark_view") view.initialize()
          else view.refresh()
        Seq(Row(v))
      case "init_semantic_view" | "refresh_semantic_view" =>
        require(args.size == 2 || args.size == 3,
          s"CALL graft.$proc(source, state[, nlist])")
        val view = new SemanticIndexView(spark,
          strArg(args(0), "source path"), strArg(args(1), "state path"),
          nlist = if (args.size == 3) longArg(args(2), "nlist").toInt else 16)
        val v = if (proc == "init_semantic_view") view.initialize()
          else view.refresh()
        Seq(Row(v))
      case "init_neardup_view" | "refresh_neardup_view" =>
        require(args.size == 2 || args.size == 3,
          s"CALL graft.$proc(source, state[, expected_docs])")
        val view = new NearDupIndexView(spark,
          strArg(args(0), "source path"), strArg(args(1), "state path"),
          expectedDocs = if (args.size == 3) longArg(args(2), "expected_docs")
            else 10000000L)
        val v = if (proc == "init_neardup_view") view.initialize()
          else view.refresh()
        Seq(Row(v))
      case "init_nb_view" | "refresh_nb_view" =>
        require(args.size == 2 || args.size == 3,
          s"CALL graft.$proc(source, state[, label_col])")
        val view = new ClassifierModelView(spark,
          strArg(args(0), "source path"), strArg(args(1), "state path"),
          labelCol = if (args.size == 3) strArg(args(2), "label_col")
            else "weak_label")
        val v = if (proc == "init_nb_view") view.initialize()
          else view.refresh()
        Seq(Row(v))
      case "show_holds" | "release_hold" =>
        // retention holds: the pins CDF-maintained views register at
        // their watermarks so vacuum cannot strand them; release is the
        // explicit decommissioning step for a dropped view. Both return
        // the holds AFTER the operation, sorted by holder.
        require(args.size == (if (proc == "show_holds") 1 else 2),
          if (proc == "show_holds") "CALL graft.show_holds(path)"
          else "CALL graft.release_hold(path, holder)")
        val t = table()
        if (proc == "release_hold")
          t.releaseRetentionHold(strArg(args(1), "holder"))
        t.retentionHolds.toSeq.sortBy(_._1).map { case (h, v) => Row(h, v) }
      case "ann_view_drift" =>
        // the drift signal behind the re-initialize policy: mean squared
        // PQ reconstruction error of the CURRENT corpus under the view's
        // GOVERNING codebooks (the versions the state metadata names) —
        // watch it round-over-round and CALL init_ann_view when it
        // degrades past tolerance (FAISS's add-vs-train split as SQL)
        require(args.size == 2, "CALL graft.ann_view_drift(source, state)")
        val src = strArg(args(0), "source path")
        val view = new AnnIndexView(spark, src, strArg(args(1), "state path"))
        Seq(Row(graft.llm.Similarity.pqReconstructionError(view.codebooks,
          ManagedTable(spark, src).read)))
      case "vacuum_index_view" =>
        // retention for the WHOLE standing index — state history, bloom
        // head, and (ann/semantic) the quantizer versions retained
        // commits still name, pruned coherently (RowLocalIndexView.vacuum)
        require(args.size == 4,
          "CALL graft.vacuum_index_view(kind, source, state, keep_last)")
        val srcPath = strArg(args(1), "source path")
        val stPath = strArg(args(2), "state path")
        if (!ManagedTable(spark, stPath).exists) {
          // decommissioned view: its state is gone but its retention
          // hold would pin the SOURCE's history forever — release it
          // and say so, instead of failing on the missing state
          ManagedTable(spark, srcPath).releaseRetentionHold(stPath)
          Seq(Row(0, 0, 0, 0, s"released stale hold $stPath"))
        } else {
          val view = indexView(spark, strArg(args(0), "kind"), srcPath,
            stPath)
          Seq(vacuumRow(view.vacuum(longArg(args(3), "keep_last").toInt)))
        }
      case "vacuum_index_view_auto" =>
        // the retention POLICY for a standing view's state: quiet asks
        // are two pointer reads; a firing routes through the FAMILY's
        // clamped vacuum (state history + bloom head + named quantizer
        // versions pruned coherently, never past the newest
        // watermark-bearing commit) — CALL graft.vacuum_auto on a view
        // state would bypass that clamp, so this is the view spelling
        // the kind takes the view-list grammar's params form too, so the
        // MARTS are reachable: 'agg(group|..;sum|..)' /
        // 'join(right;keys|..;group|..;sum|..)' — their clamp keys on
        // the watermark-pair metas, which only their own vacuum knows
        require(args.size == 4 || args.size == 5,
          "CALL graft.vacuum_index_view_auto(kind[(params)], source, " +
            "state, keep_last[, slack_versions])")
        val srcPath = strArg(args(1), "source path")
        val stPath = strArg(args(2), "state path")
        val keep = longArg(args(3), "keep_last").toInt
        val slack = if (args.size >= 5)
          longArg(args(4), "slack_versions").toInt else 16
        val st = ManagedTable(spark, stPath)
        if (!st.exists) {
          ManagedTable(spark, srcPath).releaseRetentionHold(stPath)
          Seq(Row(0, 0, 0, 0, 0, 0, s"released stale hold $stPath"))
        } else {
          val view = parseViewList(spark, srcPath,
            s"${strArg(args(0), "kind")}:$stPath").head._3
          val retained = st.retainedVersionCount
          view.vacuumStateIfNeeded(keep, slack) match {
            case Some(s) => Seq(Row(retained, 1, s.prunedVersions,
              s.deletedDataDirs, s.deletedChangeDirs, s.deletedDvDirs,
              if (s.staleHolds.isEmpty) null
              else s.staleHolds.map { case (h, v) => s"$h@$v" }.mkString(",")))
            case None => Seq(Row(retained, 0, 0, 0, 0, 0, null))
          }
        }
      case "refresh_views" =>
        // ONE-PASS maintenance of the whole standing-view family: each
        // SOURCE's unprocessed change feed is read once (views may span
        // sources — corpus views and benchmark-table views in one
        // CALL), netted once per payload signature for the index/model
        // views and handed RAW to the agg/join marts
        // (StandingViews.refreshAll) — the pure-SQL spelling of the
        // daily pipeline tick.
        //   CALL graft.refresh_views('/corpus',
        //     'bm25:/s1,agg(bucket;score):/s2,
        //      join(/dim;bucket;segment;score):/s3,/bench>bm25:/s4')
        // Entry grammar: [source>]kind[(params)]:state — `source>`
        // overrides the CALL's default source; agg params are
        // group|..;sum|..[;minmax|..] csvs ('|'-separated columns),
        // join params prepend the RIGHT table path.
        // an optional third arg opts into per-pass auto-maintenance:
        // each state's layout debt is checked from its head commit
        // (zero-IO) right after its fold and rewritten only past the
        // thresholds — the daily tick then never needs a separate
        // OPTIMIZE schedule
        require(args.size == 2 || args.size == 3,
          "CALL graft.refresh_views(source, " +
            "'[src>]kind[(params)]:state[,...]'[, auto_maintain])")
        val src = strArg(args(0), "source path")
        val views = parseViewList(spark, src, strArg(args(1), "view list"))
        require(views.nonEmpty, "refresh_views needs at least one view")
        val auto = args.size == 3 && boolArg(args(2), "auto_maintain")
        val v = StandingViews.refreshAll(spark, views.map(_._3), auto)
        views.map { case (k, st, view) =>
          Row(k, st, v(view.sourceTablePath)) }
      case "stream_refresh_view" =>
        // STREAMING maintenance as SQL — a pure-SQL pipeline could
        // init/refresh/maintain/serve every standing view but not START
        // its streaming maintenance. Runs the view's CDF stream with an
        // AvailableNow drain and returns (query id, micro-batches seen,
        // status). Kinds: the index-view registry, 'lm', 'nb', 'agg'
        // (+group/sum[/minmax] csvs), 'join' (+left/right/keys/...),
        // and 'views' (one stream, N folds — StandingViews).
        val kind = strArg(args(0), "kind")
        val q: org.apache.spark.sql.streaming.StreamingQuery = kind match {
          case "lm" =>
            require(args.size == 4,
              "CALL graft.stream_refresh_view('lm', source, state, checkpoint)")
            new CorpusLmView(spark, strArg(args(1), "source path"),
              strArg(args(2), "state path"))
              .refreshStream(strArg(args(3), "checkpoint"))
          case "nb" =>
            require(args.size == 4,
              "CALL graft.stream_refresh_view('nb', source, state, checkpoint)")
            new ClassifierModelView(spark, strArg(args(1), "source path"),
              strArg(args(2), "state path"))
              .refreshStream(strArg(args(3), "checkpoint"))
          case "agg" =>
            require(args.size == 6 || args.size == 7,
              "CALL graft.stream_refresh_view('agg', source, state, " +
                "checkpoint, group_csv, sum_csv[, minmax_csv])")
            new IncrementalAggView(spark, strArg(args(1), "source path"),
              strArg(args(2), "state path"), csv(args(4), "group_csv"),
              csv(args(5), "sum_csv"),
              if (args.size == 7) csv(args(6), "minmax_csv") else Nil)
              .refreshStream(strArg(args(3), "checkpoint"))
          case "join" =>
            require(args.size == 8 || args.size == 9,
              "CALL graft.stream_refresh_view('join', left, right, state, " +
                "checkpoint, keys_csv, group_csv, sum_csv[, minmax_csv])")
            new IncrementalJoinAggView(spark, strArg(args(1), "left path"),
              strArg(args(2), "right path"), strArg(args(3), "state path"),
              csv(args(5), "keys_csv"), csv(args(6), "group_csv"),
              csv(args(7), "sum_csv"),
              if (args.size == 9) csv(args(8), "minmax_csv") else Nil)
              .refreshStream(strArg(args(4), "checkpoint"))
          case "views" =>
            // optional fifth arg opts into per-epoch auto-maintenance
            // (zero-IO debt check after each fold — see maintain_auto);
            // optional sixth opens dimension-trigger streams so a join
            // mart folds when ONLY its dimension table changed
            require(args.size >= 4 && args.size <= 6,
              "CALL graft.stream_refresh_view('views', source, " +
                "'[src>]kind[(params)]:state[,...]', checkpoint" +
                "[, auto_maintain[, dim_triggers]])")
            val src = strArg(args(1), "source path")
            val vs = parseViewList(spark, src,
              strArg(args(2), "view list")).map(_._3)
            val ck = strArg(args(3), "checkpoint")
            val auto = args.size >= 5 && boolArg(args(4), "auto_maintain")
            val dim = args.size >= 6 && boolArg(args(5), "dim_triggers")
            if (!dim && vs.map(_.sourceTablePath).distinct.size == 1)
              StandingViews.refreshStreamAll(spark, vs, ck,
                autoMaintain = auto)
            else {
              // multi-source list (or dimension triggers requested):
              // one stream per source under the CALL's checkpoint root
              // — drain the extras here, return the first for the
              // shared drain below
              val qs = StandingViews.refreshStreamAllMulti(spark, vs, ck,
                autoMaintain = auto, dimTriggers = dim).values.toSeq
              qs.tail.foreach { q =>
                val ok = q.awaitTermination(600000)
                if (!ok) { q.stop() }
                require(ok, "stream_refresh_view: a per-source drain did " +
                  "not finish within 10 minutes — the query was stopped")
              }
              qs.head
            }
          case k =>
            require(args.size == 4,
              s"CALL graft.stream_refresh_view('$k', source, state, checkpoint)")
            indexView(spark, k, strArg(args(1), "source path"),
              strArg(args(2), "state path"))
              .refreshStream(strArg(args(3), "checkpoint"))
        }
        val drained = q.awaitTermination(600000)
        if (!drained) { q.stop() }
        require(drained,
          "stream_refresh_view: the AvailableNow drain did not finish " +
            "within 10 minutes — the query was stopped")
        Seq(Row(q.id.toString, q.recentProgress.length.toLong, "drained"))
      case "init_ann_view" | "refresh_ann_view" =>
        require(args.size == 2 || args.size == 5 ||
          (proc == "refresh_ann_view" && args.size == 3),
          s"CALL graft.$proc(source, state[, nlist, m, ksub])" +
            (if (proc == "refresh_ann_view")
              " or CALL graft.refresh_ann_view(source, state, max_drift)"
             else ""))
        val view =
          if (args.size == 5)
            new AnnIndexView(spark, strArg(args(0), "source path"),
              strArg(args(1), "state path"),
              nlist = longArg(args(2), "nlist").toInt,
              m = longArg(args(3), "m").toInt,
              ksub = longArg(args(4), "ksub").toInt)
          else new AnnIndexView(spark, strArg(args(0), "source path"),
            strArg(args(1), "state path"))
        val v =
          if (proc == "init_ann_view") view.initialize()
          else if (args.size == 3)
            // the drift POLICY: fold, measure reconstruction MSE under
            // the governing codebooks, re-initialize when it exceeds
            // max_drift — FAISS's retrain-when-stale loop as one CALL
            view.refreshWithDriftPolicy(doubleArg(args(2), "max_drift"))._1
          else view.refresh()
        Seq(Row(v))
      case other => throw new IllegalArgumentException(
        s"unknown graft procedure `$other`")
    }
  }

  /** Comma-separated column list; an empty string means "no columns"
    * (sum-less count views are legal). */
  private def csv(e: Expression, what: String): Seq[String] =
    strArg(e, what).split(",").map(_.trim).filter(_.nonEmpty).toSeq

  /** Default-parameter index view of `kind` — the kind registry shared
    * by vacuum_index_view / refresh_views / stream_refresh_view. */
  private def indexView(spark: SparkSession, kind: String, src: String,
                        st: String): RowLocalIndexView = kind match {
    case "bm25" => new Bm25IndexView(spark, src, st)
    case "phrase" => new PositionalIndexView(spark, src, st)
    case "ann" => new AnnIndexView(spark, src, st)
    case "neardup" => new NearDupIndexView(spark, src, st)
    case "semantic" => new SemanticIndexView(spark, src, st)
    case "benchmark" => new BenchmarkIndexView(spark, src, st)
    case k => throw new IllegalArgumentException(
      s"unknown index-view kind `$k` — supported: bm25, phrase, " +
        "ann, neardup, semantic, benchmark")
  }

  /** Any CDF-maintained view of `kind` — the index-view registry plus
    * the additive model views, all of which fold pre-netted slices
    * (the refresh_views / multi-view-stream kind registry). */
  private def cdfView(spark: SparkSession, kind: String, src: String,
                      st: String): CdfMaintainedView = kind match {
    case "lm" => new CorpusLmView(spark, src, st)
    case "nb" => new ClassifierModelView(spark, src, st)
    case k => indexView(spark, k, src, st)
  }

  /** Any orchestratable standing view of `kind` — [[cdfView]]'s
    * registry plus the SIGNED-slice marts: `agg` takes
    * `group|..;sum|..[;minmax|..]` params and `join` prepends the
    * RIGHT table path (`right;keys|..;group|..;sum|..[;minmax|..]`).
    * Columns inside a param group separate with '|' (',' splits list
    * entries, ';' splits param groups). */
  private def standingView(spark: SparkSession, kind: String,
                           params: Option[String], src: String,
                           st: String): StandingView = {
    def cols(s: String): Seq[String] =
      s.split("\\|").map(_.trim).filter(_.nonEmpty).toSeq
    kind match {
      case "agg" =>
        val ps = params.getOrElse(throw new IllegalArgumentException(
          "agg view entries are agg(group|..;sum|..[;minmax|..]):state"))
          .split(";", -1).toSeq
        require(ps.size == 2 || ps.size == 3,
          s"agg params are group|..;sum|..[;minmax|..], got `${params.get}`")
        new IncrementalAggView(spark, src, st, cols(ps(0)), cols(ps(1)),
          if (ps.size == 3) cols(ps(2)) else Nil)
      case "join" =>
        val ps = params.getOrElse(throw new IllegalArgumentException(
          "join view entries are " +
            "join(right;keys|..;group|..;sum|..[;minmax|..]):state"))
          .split(";", -1).toSeq
        require(ps.size == 4 || ps.size == 5,
          s"join params are right;keys|..;group|..;sum|..[;minmax|..], " +
            s"got `${params.get}`")
        new IncrementalJoinAggView(spark, src, ps.head.trim, st,
          cols(ps(1)), cols(ps(2)), cols(ps(3)),
          if (ps.size == 5) cols(ps(4)) else Nil)
      case k =>
        require(params.isEmpty,
          s"view kind `$k` takes no (params), got `${params.getOrElse("")}`")
        cdfView(spark, k, src, st)
    }
  }

  /** Parse a refresh_views / multi-view-stream view list:
    * comma-separated `[source>]kind[(params)]:state` entries —
    * `source>` overrides `defaultSrc` (multi-source CALLs). Returns
    * (display kind, state, view) triples. */
  private def parseViewList(spark: SparkSession, defaultSrc: String,
                            list: String): Seq[(String, String, StandingView)] =
    list.split(",").map(_.trim).filter(_.nonEmpty).toSeq.map { s =>
      val (src, rest) = s.indexOf('>') match {
        case -1 => (defaultSrc, s)
        case i =>
          require(i > 0 && i < s.length - 1,
            s"view list entries are [src>]kind[(params)]:state, got `$s`")
          (s.substring(0, i).trim, s.substring(i + 1))
      }
      // the ':' separating kind from state comes AFTER any (params)
      val close = rest.indexOf(')')
      val colon = rest.indexOf(':', math.max(close, 0))
      require(colon > 0 && colon < rest.length - 1,
        s"view list entries are [src>]kind[(params)]:state, got `$s`")
      val kindPart = rest.substring(0, colon).trim
      val st = rest.substring(colon + 1).trim
      val (kind, params) = kindPart.indexOf('(') match {
        case -1 => (kindPart, None)
        case i =>
          require(kindPart.endsWith(")"),
            s"unterminated (params) in view list entry `$s`")
          (kindPart.substring(0, i),
            Some(kindPart.substring(i + 1, kindPart.length - 1)))
      }
      (kindPart, st, standingView(spark, kind, params, src, st))
    }
}

/** `SHOW TBLPROPERTIES graft.t [('key')]` — the stored property map
  * (or one key; absent keys answer with the standard "does not have"
  * message value, matching Spark's session-catalog behavior). */
final case class GraftShowPropertiesCommand(root: String, key: Option[String],
                                            override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val props = ManagedTable(spark, root).lastCommit.map(_.properties)
      .getOrElse(throw new IllegalStateException(
        s"graft table at $root does not exist"))
    key match {
      case Some(k) => Seq(Row(k, props.getOrElse(k,
        s"Table graft.`$root` does not have property: $k")))
      case None => props.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v) }
    }
  }
}

/** `SHOW VIEWS IN graft[.ns]` — the logical-view listing Spark's v2
  * catalog path cannot serve (graft views are descriptor files, not
  * catalog entries): every warehouse directory under the namespace
  * holding a `_graft_view.json`, name-sorted, filtered by the optional
  * `LIKE` pattern with Spark's own pattern semantics. Output matches
  * the session catalog's SHOW VIEWS shape
  * `(namespace, viewName, isTemporary)`. */
final case class GraftShowViewsCommand(ns: Seq[String],
                                       pattern: Option[String],
                                       override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val base = new org.apache.hadoop.fs.Path(
      (SqlTables.warehouse(spark) +: ns).mkString("/"))
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) throw new IllegalStateException(
      s"namespace graft${ns.map("." + _).mkString} not found under the warehouse")
    val names = fs.listStatus(base).filter(_.isDirectory).map(_.getPath)
      .filter(p => fs.exists(
        new org.apache.hadoop.fs.Path(p, "_graft_view.json")))
      .map(_.getName).toSeq.sorted
    val kept = pattern match {
      case Some(p) =>
        org.apache.spark.sql.catalyst.util.StringUtils.filterPattern(names, p)
      case None => names
    }
    kept.map(n => Row(ns.mkString("."), n, false))
  }
}

/** `DESCRIBE HISTORY graft.t` — the commit log as rows, Delta's
  * spelling for the same listing `CALL graft.history(path)` serves
  * (the statement is not in Spark's grammar, so [[GraftSqlParser]]
  * recognizes it before delegating everything else). Newest first,
  * the procedure's exact column shape. */
final case class GraftDescribeHistoryCommand(parts: Seq[String])
  extends LeafRunnableCommand {
  import SqlProcedures.attr
  override val output: Seq[Attribute] = Seq(
    attr("version", LongType), attr("operation", StringType),
    attr("timestamp_ms", LongType), attr("num_dirs", IntegerType),
    attr("operation_metrics", StringType), attr("user_metadata", StringType))
  override def run(spark: SparkSession): Seq[Row] = {
    val t = ManagedTable(spark, SqlTables.rootOf(spark, parts))
    require(t.exists, s"graft table at ${parts.mkString(".")} does not exist")
    t.history.map(c => Row(c.version, c.operation, c.timestampMs,
      c.dirs.size, SqlProcedures.metricsJson(c.operationMetrics),
      c.userMetadata.orNull))
  }
}

/** `DESCRIBE [EXTENDED] graft.t` — column rows, plus commit-log detail
  * (version, operation, partitioning, properties, constraints) under
  * EXTENDED, in the usual `# key | value` section shape. A graft VIEW
  * at the identifier describes too: its stored SQL analyzes for the
  * column rows, and EXTENDED shows the view text. */
final case class GraftDescribeCommand(root: String, isExtended: Boolean,
                                      override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val table = ManagedTable(spark, root)
    if (!table.exists) {
      GraftViews.load(spark, root).foreach { sql =>
        val analyzed = org.apache.spark.sql.classic.GraftShims.ofRows(spark,
          spark.sessionState.sqlParser.parsePlan(sql))
        val cols = analyzed.schema.fields.toSeq.map(f =>
          Row(f.name, f.dataType.simpleString, null))
        return cols ++ (if (!isExtended) Nil else Seq(
          Row("", "", null),
          Row("# Detailed View Information", "", null),
          Row("Location", root, null),
          Row("Type", "VIEW", null),
          Row("View Text", sql, null)))
      }
    }
    val c = table.lastCommit.getOrElse(
      throw new IllegalStateException(s"graft table at $root does not exist"))
    val schema = StructType.fromDDL(c.schemaDdl)
    val cols = schema.fields.toSeq.map(f =>
      Row(f.name, f.dataType.simpleString, null))
    if (!isExtended) cols
    else cols ++ Seq(
      Row("", "", null),
      Row("# Detailed Table Information", "", null),
      Row("Location", root, null),
      Row("Version", c.version.toString, null),
      Row("Last Operation", c.operation, null),
      Row("Partition By", c.partitionBy.mkString(", "), null),
      Row("Num Data Dirs", c.dirs.size.toString, null),
      Row("Deletion Vectors", c.dvDirs.size.toString, null),
      Row("Properties",
        c.properties.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k=$v" }.mkString(", "), null),
      Row("Constraints",
        c.constraints.toSeq.sortBy(_._1)
          .map { case (k, v) => s"$k: $v" }.mkString("; "), null))
  }
}

/** `SHOW CREATE TABLE graft.t` — the DDL reconstructed from the commit
  * log: columns, identity PARTITIONED BY, CONSTRAINTs, and
  * TBLPROPERTIES, in runnable `graft.`-namespace spelling. A graft
  * VIEW at the identifier answers with its `CREATE VIEW` text. */
final case class GraftShowCreateCommand(root: String, parts: Seq[String],
                                        override val output: Seq[Attribute])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val name = "graft." + (
      if (parts.size == 1 && !parts.head.contains("/")) parts.head
      else "`" + parts.mkString("/") + "`")
    val table = ManagedTable(spark, root)
    if (!table.exists) {
      GraftViews.load(spark, root).foreach { sql =>
        return Seq(Row(s"CREATE VIEW $name AS $sql"))
      }
    }
    val c = table.lastCommit.getOrElse(throw new IllegalStateException(
      s"graft table at $root does not exist"))
    val schema = StructType.fromDDL(c.schemaDdl)
    val cols = schema.fields.map(f =>
      s"  ${f.name} ${f.dataType.sql}${if (f.nullable) "" else " NOT NULL"}")
      .mkString(",\n")
    val partClause =
      if (c.partitionBy.isEmpty) ""
      else s"\nPARTITIONED BY (${c.partitionBy.mkString(", ")})"
    val consClause =
      if (c.constraints.isEmpty) ""
      else c.constraints.toSeq.sortBy(_._1).collect {
        case (n, rule) if rule.startsWith(s"check:$n:") =>
          s"\nCONSTRAINT $n CHECK (${rule.stripPrefix(s"check:$n:")})"
      }.mkString
    val propClause =
      if (c.properties.isEmpty) ""
      else "\nTBLPROPERTIES (" + c.properties.toSeq.sortBy(_._1)
        .map { case (k, v) => s"'$k' = '$v'" }.mkString(", ") + ")"
    Seq(Row(s"CREATE TABLE $name (\n$cols)$partClause$consClause$propClause"))
  }
}

/** `DROP TABLE [IF EXISTS] graft.t` — deletes the table directory. */
final case class GraftDropTableCommand(root: String, ifExists: Boolean)
  extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    val p = new org.apache.hadoop.fs.Path(root)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val exists = fs.exists(new org.apache.hadoop.fs.Path(p, "_graft_log"))
    if (exists) { fs.delete(p, true); () }
    else if (!ifExists) throw new IllegalStateException(
      s"graft table at $root does not exist (use DROP TABLE IF EXISTS)")
    Nil
  }
}

/** `ALTER TABLE graft.t RENAME TO graft.t2` — a filesystem move; the
  * commit log travels with the directory (all paths inside entries are
  * rewritten... they are ABSOLUTE, so a rename would break them — the
  * command refuses unless every logged dir lives under the root, then
  * rewrites the log in place after the move). */
final case class GraftRenameTableCommand(fromRoot: String, toRoot: String)
  extends LeafRunnableCommand {
  override def output: Seq[Attribute] = Nil
  override def run(spark: SparkSession): Seq[Row] = {
    SqlProcedures.renameTableDir(spark, fromRoot, toRoot)
    Nil
  }
}
