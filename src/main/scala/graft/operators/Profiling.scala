package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/**
 * Column-level data profiling (the Deequ/`ANALYZE TABLE`-style summary a
 * pipeline runs before trusting a new source): one row per profiled
 * column with row/non-null/distinct counts, min/max rendered as strings,
 * and EXACT p25/median/p75/p95 for numeric columns. The count/min/max
 * block is computed in ONE aggregate over one scan — the per-column
 * stats are parallel aggregate expressions, and the wide 1-row result is
 * stacked to long form driver-free.
 *
 * `exact = true` (default) uses `count(DISTINCT)` — Spark plans the
 * multi-distinct aggregate via EXPAND (one shuffle per distinct column
 * set, exact results, recomputable in any engine, which the oracle
 * requires) — and computes the quantiles with the same
 * histogram-decomposed rank selection as
 * [[graft.llm.TextOps.corpusProfile]]: ALL numeric columns stack into
 * one long `(column, value)` pass, aggregate to per-(column, value)
 * counts, and the cumulative walk to each rank `⌈p·n_nonnull⌉` windows
 * DISTINCT values per column (bounded by each column's value domain,
 * never its row count). One extra scan total, independent of how many
 * columns are profiled. Values order as doubles — exact for integral
 * magnitudes ≤ 2^53, i.e. every profiling case that isn't already a
 * floating column.
 *
 * At 100 TB profile-scale, pass `exact = false`: distinct counts become
 * mergeable HLL sketches (`approx_count_distinct`, ±2%) and ALL FOUR
 * quantiles come from one mergeable [[Sketches.GKQuantile]] summary per
 * numeric column, folded into the SAME single aggregate — one scan
 * total, no expand, no histogram pass, every estimate within `eps·n`
 * ranks of exact (the column_profile driver query gates exactly this
 * against the exact mode). Same output shape, not oracle-comparable.
 */
object Profiling {

  /** The profiled quantiles, in output-column order. */
  val Probs: Seq[(Double, String)] = Seq(
    0.25 -> "p25_value", 0.5 -> "median_value",
    0.75 -> "p75_value", 0.95 -> "p95_value")

  def profileColumns(df: DataFrame, cols: Seq[String],
                     exact: Boolean = true, eps: Double = 0.01): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    cols.foreach(c => require(df.columns.contains(c), s"no such column: $c"))
    val isNum: Set[String] = cols
      .filter(c => df.schema(c).dataType.isInstanceOf[NumericType]).toSet
    val numeric = cols.filter(isNum)
    val qNames = Probs.map(_._2)
    val baseAggs = cols.flatMap { c =>
      val v = col(s"`$c`")
      Seq(
        count(v).as(s"__${c}__nonnull"),
        (if (exact) countDistinct(v) else approx_count_distinct(v))
          .as(s"__${c}__distinct"),
        min(v).cast("string").as(s"__${c}__min"),
        max(v).cast("string").as(s"__${c}__max"))
    }
    val gk = udaf(new Sketches.GKQuantileBoxed(eps), Encoders.DOUBLE)
    val gkAggs =
      if (exact) Nil
      else numeric.map(c => gk(col(s"`$c`").cast("double")).as(s"__${c}__gk"))
    val wide = df.agg(count(lit(1)).as("__n__"), (baseAggs ++ gkAggs): _*)
    // sketch mode: answer all probs from each column's summary while the
    // frame is still 1 row wide (an ALL-NULL column has an empty summary
    // — its quantiles are NULL, like every SQL aggregate over nothing)
    val wide2 =
      if (exact) wide
      else wide.select(col("*") +: (for {
        c <- numeric; (p, name) <- Probs
      } yield when(col(s"__${c}__gk.n") > 0,
        Sketches.estimateUdf(col(s"__${c}__gk.n"),
          col(s"__${c}__gk.tuples"), lit(p)))
        .as(s"__${c}__$name")): _*)
    val stackArgs = cols.map { c =>
      val base = s"'$c', `__${c}__nonnull`, `__${c}__distinct`, " +
        s"`__${c}__min`, `__${c}__max`"
      if (exact) base
      else if (isNum(c)) base + qNames.map(n => s", `__${c}__$n`").mkString
      else base + qNames.map(_ => ", CAST(NULL AS DOUBLE)").mkString
    }.mkString(", ")
    val outFields = "(column_name, n_nonnull, n_distinct, min_value, max_value" +
      (if (exact) ")" else s", ${qNames.mkString(", ")})")
    val base = wide2.selectExpr(
      "__n__", s"stack(${cols.size}, $stackArgs) AS $outFields")
    val long =
      if (!exact) base
      else if (numeric.isEmpty)
        qNames.foldLeft(base)((d, q) => d.withColumn(q, lit(null).cast("double")))
      else base.join(exactQuantiles(df, numeric), Seq("column_name"), "left")
    long.select((Seq(col("column_name"), col("__n__").as("n_rows"),
      col("n_nonnull"), col("n_distinct"), col("min_value"),
      col("max_value")) ++ qNames.map(col)): _*)
  }

  /** `(column_name, p25_value, median_value, p75_value, p95_value)` for
    * the given numeric columns: one long stack pass → per-(column,
    * value) histogram → cumulative rank walk to each `⌈p·n⌉`. Duplicate
    * values collapse before the window, so the sort is over distinct
    * values per column. */
  private def exactQuantiles(df: DataFrame, numeric: Seq[String]): DataFrame = {
    val stackVals = numeric
      .map(c => s"'$c', CAST(`$c` AS DOUBLE)").mkString(", ")
    val hist = df
      .selectExpr(s"stack(${numeric.size}, $stackVals) AS (column_name, __v__)")
      .filter(col("__v__").isNotNull)
      .groupBy("column_name", "__v__").agg(count(lit(1)).as("__cnt__"))
    val w = Window.partitionBy("column_name").orderBy(col("__v__"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nn = hist.groupBy("column_name").agg(sum("__cnt__").as("__nn__"))
    val rank: Column = ceil(col("__p__") * col("__nn__"))
    val long = hist.withColumn("__cum__", sum(col("__cnt__")).over(w))
      .join(nn, "column_name")
      .select(col("*"),
        explode(array(Probs.map(p => lit(p._1)): _*)).as("__p__"))
      .filter(col("__cum__") >= rank && col("__cum__") - col("__cnt__") < rank)
    long.groupBy("column_name")
      .agg(Probs.head match { case (p, name) =>
        max(when(col("__p__") === p, col("__v__"))).as(name) },
        Probs.tail.map { case (p, name) =>
          max(when(col("__p__") === p, col("__v__"))).as(name) }: _*)
  }
}
