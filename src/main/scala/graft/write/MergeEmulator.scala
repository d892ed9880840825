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
 * turns a caller bug into data corruption.
 *
 * How the check works (all deterministic — no `monotonically_increasing_id`,
 * whose values can shift when a stage is recomputed after executor loss):
 * target rows are keyed by `xxhash64` of the full row; a pre-join window
 * counts identical target rows per key (n_t), and a post-join window counts
 * joined rows per key (n_t × matches-per-row). The joined count exceeding
 * n_t proves some target row matched more than one source row — exact even
 * under hash collisions, because a collision inflates both counts equally
 * when every row matches at most once. The raise rides a FILTER over the
 * merge output (not a data column), so no downstream projection can prune
 * it away — any action on any subset of columns still runs the check.
 * Cost: one extra target-side shuffle (the pre-join window) plus one window
 * over the join output; callers that pre-dedupe (the reference exposes
 * `deduplicate_onkeys`, write.py:488-491) can opt out of both.
 */
object MergeEmulator {

  /** One WHEN MATCHED UPDATE branch: optional extra condition + SET map
    * keyed by plain target column name. Branch order = priority order. */
  final case class MatchedUpdate(condition: Option[Column], set: Map[String, Column])

  private val TMark = "__graft_t_mark__"
  private val SMark = "__graft_s_mark__"
  private val THash = "__graft_t_hash__"
  private val TCnt = "__graft_t_cnt__"
  private val SHash = "__graft_s_hash__"
  private val GuardCol = "__graft_guard__"

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
   *                     one updated row per match. The check is a filter
   *                     over the merge output, so it fires on ANY action
   *                     over ANY subset of the output's columns; opt out
   *                     to skip its two windows (one target-side shuffle,
   *                     one over the join output).
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

    import org.apache.spark.sql.expressions.Window
    val guard = failOnMultipleMatches && target.schema.nonEmpty
    val t0 = target.withColumn(TMark, lit(1))
    val t = (if (guard) {
      // deterministic per-row-VALUE key + count of identical target rows
      // sharing it (n_t); both recompute identically on stage retry
      val h = t0.withColumn(THash,
        xxhash64(target.columns.map(col).toIndexedSeq: _*))
      h.withColumn(TCnt, count(lit(1)).over(Window.partitionBy(col(THash))))
    } else t0).alias("target")
    val s0 = source.withColumn(SMark, lit(1))
    val s = (if (guard)
      s0.withColumn(SHash, xxhash64(source.columns.map(col).toIndexedSeq: _*))
    else s0).alias("source")
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

    val base: Seq[Column] =
      if (!trackChanges) out0.toIndexedSeq
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
        out0.toIndexedSeq :+ mark.as(ChangeMark) :+ pre.as(PreMark)
      }

    if (!guard) joined.select(base: _*)
    else {
      // Cardinality guard: all joined copies of one target-row VALUE share
      // the group ("t", row hash); source-only rows group by their own row
      // hash ("s", ...) and are never checked. The group's joined-row
      // count exceeding the pre-join identical-target count (n_t) proves
      // some target row matched >1 source rows. The raise lives in a
      // FILTER, so no downstream column pruning can drop it.
      val grp = when(tPresent, concat(lit("t"), col(s"target.$THash").cast("string")))
        .otherwise(concat(lit("s"), col(s"source.$SHash").cast("string")))
      val joinedCnt = count(lit(1)).over(Window.partitionBy(grp))
      val violated = bothPresent && joinedCnt > col(s"target.$TCnt")
      val guarded = when(violated,
        raise_error(concat(
          lit("MERGE cardinality violation: a target row matched multiple " +
            "source rows ("),
          joinedCnt.cast("string"), lit(" joined rows for "),
          col(s"target.$TCnt").cast("string"),
          lit(" target rows); deduplicate the source (deduplicate_onkeys) " +
            "or set allow_duplicate_matches"))))
        .otherwise(lit(true))
      joined.select((base :+ guarded.as(GuardCol)): _*)
        .where(col(GuardCol))
        .drop(GuardCol)
    }
  }
}
