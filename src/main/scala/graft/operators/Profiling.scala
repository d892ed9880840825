package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Column-level data profiling (the Deequ/`ANALYZE TABLE`-style summary a
 * pipeline runs before trusting a new source): one row per profiled
 * column with row/non-null/distinct counts and min/max rendered as
 * strings. Everything is computed in ONE aggregate over one scan — the
 * per-column stats are parallel aggregate expressions, and the wide
 * 1-row result is stacked to long form driver-free.
 *
 * `exact = true` (default) uses `count(DISTINCT)` — Spark plans the
 * multi-distinct aggregate via EXPAND (one shuffle per distinct column
 * set, exact results, recomputable in any engine, which the oracle
 * requires). At 100 TB profile-scale, pass `exact = false` for
 * HLL-sketched `approx_count_distinct` (single pass, mergeable, ±2%) —
 * same shape, not oracle-comparable.
 */
object Profiling {

  def profileColumns(df: DataFrame, cols: Seq[String],
                     exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val aggs = cols.flatMap { c =>
      val v = col(s"`$c`")
      Seq(
        count(v).as(s"__${c}__nonnull"),
        (if (exact) countDistinct(v) else approx_count_distinct(v))
          .as(s"__${c}__distinct"),
        min(v).cast("string").as(s"__${c}__min"),
        max(v).cast("string").as(s"__${c}__max"))
    }
    val wide = df.agg(count(lit(1)).as("__n__"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__${c}__nonnull`, `__${c}__distinct`, `__${c}__min`, `__${c}__max`"
    }.mkString(", ")
    wide.selectExpr(
      "__n__",
      s"stack(${cols.size}, $stackArgs) AS " +
        "(column_name, n_nonnull, n_distinct, min_value, max_value)")
      .select(col("column_name"), col("__n__").as("n_rows"),
        col("n_nonnull"), col("n_distinct"), col("min_value"),
        col("max_value"))
  }
}
