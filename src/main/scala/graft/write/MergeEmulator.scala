package graft.write

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * MERGE INTO emulation for plain-parquet managed tables.
 *
 * The reference delegates its SCD merges to Delta Lake's `DeltaTable.merge`
 * (reference: write.py:510-523, :985-991, :278-294). This environment ships no
 * Delta jar, so we re-express MERGE as a single **full-outer join** — the
 * Spark-first shape Catalyst can plan as one shuffle (sort-merge on the
 * extracted equi-keys, residual predicates as join filters, AQE skew-split):
 *
 *   - matched (both sides present)  -> first matching WHEN MATCHED UPDATE
 *     branch wins, else target row unchanged
 *   - target-only                   -> target row unchanged
 *   - source-only                   -> WHEN NOT MATCHED INSERT values
 *
 * At cluster scale this means the merge costs exactly one shuffle of
 * target + source on the merge key (vs two joins for the naive
 * "update-union-insert" formulation), and the output is written back
 * partition-atomically by [[graft.table.ManagedTable]].
 *
 * Semantics note: like Delta MERGE, one target row may match at most one
 * source row. Delta raises `DeltaUnsupportedOperationException` on multiple
 * matches; we do the same by default (see `failOnMultipleMatches`) — the
 * alternative, silently emitting one updated row PER matching source row,
 * turns a caller bug into data corruption. The check is a row-count window
 * over a per-target-row id computed inside the same plan (no second job);
 * callers that pre-dedupe (the reference exposes `deduplicate_onkeys`,
 * write.py:488-491) can opt out to skip the window shuffle.
 */
object MergeEmulator {

  /** One WHEN MATCHED UPDATE branch: optional extra condition + SET map
    * keyed by plain target column name. Branch order = priority order. */
  final case class MatchedUpdate(condition: Option[Column], set: Map[String, Column])

  private val TMark = "__graft_t_mark__"
  private val SMark = "__graft_s_mark__"
  private val TId = "__graft_t_id__"
  private val SId = "__graft_s_id__"

  /** Internal change-tracking columns added by `merge(trackChanges=true)`:
    * [[ChangeMark]] is `update_postimage` / `insert` / NULL (row untouched),
    * [[PreMark]] holds the pre-update target row as a struct (NULL unless
    * updated). [[graft.write.Writers]] turns them into the public
    * change-data-feed rows; they never reach a stored snapshot. */
  val ChangeMark = "__graft_change__"
  val PreMark = "__graft_pre__"

  /**
   * Emulate `MERGE INTO target USING source ON condition ...`.
   *
   * @param condition    join condition; reference columns as
   *                     `col("target.x")` / `col("source.x")`
   * @param matched      WHEN MATCHED UPDATE branches (first match wins)
   * @param insertValues WHEN NOT MATCHED INSERT values keyed by target
   *                     column name; target columns absent from the map
   *                     become NULL of the target type
   * @param trackChanges when true, append [[ChangeMark]] (which change the
   *                     merge made to this row, NULL if untouched) and
   *                     [[PreMark]] (the pre-update target row as a struct)
   *                     to the output — the raw material for a change data
   *                     feed, computed inside the same single-join
   *                     projection at zero extra shuffle cost
   * @param failOnMultipleMatches raise (inside the plan, like Delta's
   *                     cardinality check) when one target row matches
   *                     several source rows, instead of silently emitting
   *                     one updated row per match. The check rides the
   *                     merge output's first column, so it fires on any
   *                     action that consumes the full merge result (every
   *                     write path does); opt out to skip its window.
   * @return the complete post-merge table state with the target's schema
   */
  def merge(
      target: DataFrame,
      source: DataFrame,
      condition: Column,
      matched: Seq[MatchedUpdate],
      insertValues: Map[String, Column],
      trackChanges: Boolean = false,
      failOnMultipleMatches: Boolean = true): DataFrame = {

    val guard = failOnMultipleMatches
    val t0 = target.withColumn(TMark, lit(1))
    val t = (if (guard) t0.withColumn(TId, monotonically_increasing_id()) else t0)
      .alias("target")
    val s0 = source.withColumn(SMark, lit(1))
    val s = (if (guard) s0.withColumn(SId, monotonically_increasing_id()) else s0)
      .alias("source")
    val joined = t.join(s, condition, "full_outer")

    val tPresent = col(s"target.$TMark").isNotNull
    val sPresent = col(s"source.$SMark").isNotNull
    val bothPresent = tPresent && sPresent
    val insertOnly = !tPresent && sPresent

    val out0 = target.schema.fields.map { f =>
      val keep = col(s"target.${f.name}")
      val insertExpr =
        insertValues.getOrElse(f.name, lit(null)).cast(f.dataType)
      val branches: Seq[(Column, Column)] =
        matched.map { m =>
          val cond = m.condition.map(bothPresent && _).getOrElse(bothPresent)
          cond -> m.set.getOrElse(f.name, keep).cast(f.dataType)
        } :+ (insertOnly -> insertExpr)
      branches
        .foldLeft(Option.empty[Column]) {
          case (None, (c, v))      => Some(when(c, v))
          case (Some(acc), (c, v)) => Some(acc.when(c, v))
        }
        .get
        .otherwise(keep)
        .as(f.name)
    }

    // Cardinality guard: matched copies of one target row share the group
    // ("t", target id); source-only rows are singletons ("s", source id) —
    // keyed per-row so the insert side never collapses into one skewed
    // window partition. >1 rows in a both-present group = multiple source
    // matches → raise inside the plan (first output column carries the
    // check so the write's full projection always evaluates it).
    val out = if (!guard || out0.isEmpty) out0 else {
      import org.apache.spark.sql.expressions.Window
      val grp = when(tPresent, concat(lit("t"), col(s"target.$TId").cast("string")))
        .otherwise(concat(lit("s"), col(s"source.$SId").cast("string")))
      val matches = count(lit(1)).over(Window.partitionBy(grp))
      val firstName = target.schema.fields.head.name
      val checked = when(bothPresent && matches > 1,
        raise_error(concat(
          lit("MERGE cardinality violation: a target row matched "),
          matches.cast("string"),
          lit(" source rows; deduplicate the source (deduplicate_onkeys) " +
            "or set allow_duplicate_matches")))
      ).otherwise(out0.head).as(firstName)
      checked +: out0.tail
    }

    if (!trackChanges) joined.select(out.toIndexedSeq: _*)
    else {
      // same branch priority as the value projection: a row is an update
      // iff some WHEN MATCHED branch fired, an insert iff source-only
      val anyMatched = matched
        .map(m => m.condition.map(bothPresent && _).getOrElse(bothPresent))
        .reduceOption(_ || _).getOrElse(lit(false))
      val mark = when(anyMatched, lit("update_postimage"))
        .when(insertOnly, lit("insert"))
        .otherwise(lit(null).cast("string"))
      val pre = when(anyMatched,
        struct(target.schema.fields.map(f => col(s"target.${f.name}").as(f.name))
          .toIndexedSeq: _*))
      joined.select((out.toIndexedSeq :+ mark.as(ChangeMark) :+ pre.as(PreMark)): _*)
    }
  }
}
