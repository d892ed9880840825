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
 * Semantics note: like Delta MERGE, one target row should match at most one
 * source row; callers enforce/dedupe (the reference exposes
 * `deduplicate_onkeys` for this, write.py:488-491) — with multiple matches
 * Delta raises; we document the duplicate-row outcome instead of scanning
 * for it (a count-based pre-check would double the job cost).
 */
object MergeEmulator {

  /** One WHEN MATCHED UPDATE branch: optional extra condition + SET map
    * keyed by plain target column name. Branch order = priority order. */
  final case class MatchedUpdate(condition: Option[Column], set: Map[String, Column])

  private val TMark = "__graft_t_mark__"
  private val SMark = "__graft_s_mark__"

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
   * @return the complete post-merge table state with the target's schema
   */
  def merge(
      target: DataFrame,
      source: DataFrame,
      condition: Column,
      matched: Seq[MatchedUpdate],
      insertValues: Map[String, Column],
      trackChanges: Boolean = false): DataFrame = {

    val t = target.withColumn(TMark, lit(1)).alias("target")
    val s = source.withColumn(SMark, lit(1)).alias("source")
    val joined = t.join(s, condition, "full_outer")

    val tPresent = col(s"target.$TMark").isNotNull
    val sPresent = col(s"source.$SMark").isNotNull
    val bothPresent = tPresent && sPresent
    val insertOnly = !tPresent && sPresent

    val out = target.schema.fields.map { f =>
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
