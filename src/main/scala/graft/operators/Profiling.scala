package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/**
 * Column-level data profiling (the Deequ/`ANALYZE TABLE`-style summary a
 * pipeline runs before trusting a new source): one row per profiled
 * column with row/non-null/distinct counts, min/max rendered as strings,
 * and an EXACT lower median for numeric columns. The count/min/max block
 * is computed in ONE aggregate over one scan — the per-column stats are
 * parallel aggregate expressions, and the wide 1-row result is stacked
 * to long form driver-free.
 *
 * `exact = true` (default) uses `count(DISTINCT)` — Spark plans the
 * multi-distinct aggregate via EXPAND (one shuffle per distinct column
 * set, exact results, recomputable in any engine, which the oracle
 * requires) — and computes medians with the same histogram-decomposed
 * rank selection as [[graft.llm.TextOps.corpusProfile]]: ALL numeric
 * columns stack into one long `(column, value)` pass, aggregate to
 * per-(column, value) counts, and the cumulative walk to rank
 * ⌊(n_nonnull+1)/2⌋ windows DISTINCT values per column (bounded by each
 * column's value domain, never its row count). One extra scan total,
 * independent of how many columns are profiled. Values order as doubles
 * — exact for integral magnitudes ≤ 2^53, i.e. every profiling case
 * that isn't already a floating column.
 *
 * At 100 TB profile-scale, pass `exact = false`: distinct counts become
 * mergeable HLL sketches (`approx_count_distinct`, ±2%) and the median a
 * mergeable `percentile_approx` sketch folded into the SAME single
 * aggregate — one scan total, no expand, no histogram pass; same shape,
 * not oracle-comparable.
 */
object Profiling {

  def profileColumns(df: DataFrame, cols: Seq[String],
                     exact: Boolean = true): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val isNum: Set[String] = cols
      .filter(c => df.schema(c).dataType.isInstanceOf[NumericType]).toSet
    val aggs = cols.flatMap { c =>
      val v = col(s"`$c`")
      Seq(
        count(v).as(s"__${c}__nonnull"),
        (if (exact) countDistinct(v) else approx_count_distinct(v))
          .as(s"__${c}__distinct"),
        min(v).cast("string").as(s"__${c}__min"),
        max(v).cast("string").as(s"__${c}__max")) ++
        (if (exact) Nil
         else Seq(
           (if (isNum(c)) percentile_approx(v.cast("double"), lit(0.5), lit(10000))
            else lit(null).cast("double")).as(s"__${c}__med")))
    }
    val wide = df.agg(count(lit(1)).as("__n__"), aggs: _*)
    val stackArgs = cols.map { c =>
      s"'$c', `__${c}__nonnull`, `__${c}__distinct`, `__${c}__min`, `__${c}__max`" +
        (if (exact) "" else s", `__${c}__med`")
    }.mkString(", ")
    val outFields = "(column_name, n_nonnull, n_distinct, min_value, max_value" +
      (if (exact) ")" else ", median_value)")
    val base = wide.selectExpr(
      "__n__", s"stack(${cols.size}, $stackArgs) AS $outFields")
    val long =
      if (!exact) base
      else if (isNum.isEmpty) base.withColumn("median_value", lit(null).cast("double"))
      else base.join(exactMedians(df, cols.filter(isNum)), Seq("column_name"), "left")
    long.select(col("column_name"), col("__n__").as("n_rows"),
      col("n_nonnull"), col("n_distinct"), col("min_value"),
      col("max_value"), col("median_value"))
  }

  /** `(column_name, median_value)` for the given numeric columns: one
    * long stack pass → per-(column, value) histogram → cumulative rank
    * walk to the lower median ⌊(n+1)/2⌋. Duplicate values collapse
    * before the window, so the sort is over distinct values per column. */
  private def exactMedians(df: DataFrame, numeric: Seq[String]): DataFrame = {
    val stackVals = numeric
      .map(c => s"'$c', CAST(`$c` AS DOUBLE)").mkString(", ")
    val hist = df
      .selectExpr(s"stack(${numeric.size}, $stackVals) AS (column_name, __v__)")
      .filter(col("__v__").isNotNull)
      .groupBy("column_name", "__v__").agg(count(lit(1)).as("__cnt__"))
    val w = Window.partitionBy("column_name").orderBy(col("__v__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nn = hist.groupBy("column_name").agg(sum("__cnt__").as("__nn__"))
    hist.withColumn("__cum__", sum(col("__cnt__")).over(w))
      .join(nn, "column_name")
      .filter(col("__cum__") >= expr("(__nn__ + 1) div 2") &&
        col("__cum__") - col("__cnt__") < expr("(__nn__ + 1) div 2"))
      .select(col("column_name"), col("__v__").as("median_value"))
  }
}
