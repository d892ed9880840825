package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deterministic, content-keyed sampling for training-data pipelines.
 *
 * `df.sample()` draws per-partition pseudo-random rows: re-running after a
 * repartition, an appended file, or on another engine yields a DIFFERENT
 * subset, which silently breaks train/eval hygiene (yesterday's eval doc
 * becomes today's training doc). These operators decide membership from a
 * hash of the row's OWN key, so a document's fate is a pure function of
 * its identity: stable across reruns, partitionings, engines, and
 * incremental loads — and auditable in plain SQL (the predicate is an md5
 * prefix compare any engine can recompute).
 *
 * All operators are narrow (no shuffle) except [[capPerGroup]], which
 * shuffles once on the group key.
 */
object Sampling {

  /** First 8 hex chars of md5 over salt + keys. Uniform on [0, 2^32) when
    * interpreted as hex; compared LEXICOGRAPHICALLY against a fixed-width
    * hex threshold (equivalent to the numeric compare, and portable —
    * both Spark and DuckDB emit lowercase hex md5). */
  private def keyHex(keys: Seq[String], salt: String): Column =
    substring(md5(concat_ws("|",
      (lit(salt) +: keys.map(c => col(s"`$c`").cast("string"))): _*)), 1, 8)

  private def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    f"${math.min((rate * 4294967296.0).toLong, 0xFFFFFFFFL)}%08x"
  }

  /** Keep ~`rate` of rows, chosen by key hash. Same (keys, salt) always
    * selects the same rows; change `salt` to draw an independent sample. */
  def hashSample(df: DataFrame, keys: Seq[String], rate: Double,
                 salt: String = ""): DataFrame = {
    require(keys.nonEmpty, "hashSample needs key columns")
    df.filter(keyHex(keys, salt) < lit(thresholdHex(rate)))
  }

  /** Label every row `test` (~`testFraction`) or `train` by key hash.
    * Because membership is content-keyed, a row keeps its split across
    * incremental appends and re-runs — no leakage between splits. */
  def hashSplit(df: DataFrame, keys: Seq[String], testFraction: Double,
                salt: String = "", outCol: String = "split"): DataFrame = {
    require(keys.nonEmpty, "hashSplit needs key columns")
    df.withColumn(outCol,
      when(keyHex(keys, salt) < lit(thresholdHex(testFraction)), lit("test"))
        .otherwise(lit("train")))
  }

  /** Key hash as an unsigned 32-bit long (for per-row numeric
    * thresholds; the fixed-rate operators compare hex strings instead,
    * which is equivalent and cheaper). */
  private def keyLong(keys: Seq[String], salt: String): Column =
    conv(keyHex(keys, salt), 16, 10).cast("long")

  /** Weighted Bernoulli sampling: keep each row with probability
    * `rateCol` (clamped to [0,1]), decided by its own key hash — e.g.
    * upsample high-quality documents by passing a quality score. Same
    * determinism guarantees as [[hashSample]]; still shuffle-free. */
  def hashSampleWeighted(df: DataFrame, keys: Seq[String], rateCol: Column,
                         salt: String = ""): DataFrame = {
    require(keys.nonEmpty, "hashSampleWeighted needs key columns")
    val rate = least(greatest(rateCol.cast("double"), lit(0.0)), lit(1.0))
    df.filter(keyLong(keys, salt).cast("double") < rate * lit(4294967296.0))
  }

  /** Per-stratum rates (`sampleBy`, made deterministic): strata found in
    * `rates` sample at their rate, everything else at `defaultRate`. */
  def hashSampleBy(df: DataFrame, strataCol: String, rates: Map[String, Double],
                   keys: Seq[String], defaultRate: Double = 0.0,
                   salt: String = ""): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (stratum, r)) =>
      when(col(s"`$strataCol`") === stratum, lit(r)).otherwise(acc)
    }
    hashSampleWeighted(df, keys, rate, salt)
  }

  /** Keep at most `cap` rows per group — the "N documents per domain"
    * operator. Selection order is the key hash (an unbiased per-group
    * sample, not "first N by insertion"), tie-broken by the key columns
    * themselves so the result is total-ordered and deterministic.
    *
    * One shuffle on `groupCols`; a pathologically hot group sorts in a
    * single task — pre-thin such groups with [[hashSample]] at
    * rate ≈ k·cap/|group| first if that matters. */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], cap: Int,
                  keys: Seq[String], salt: String = ""): DataFrame = {
    require(groupCols.nonEmpty && keys.nonEmpty, "capPerGroup needs group and key columns")
    require(cap > 0, s"cap must be positive, got $cap")
    val rn = "__graft_rn__"
    val order = keyHex(keys, salt) +: keys.map(c => col(s"`$c`"))
    val w = Window.partitionBy(groupCols.map(c => col(s"`$c`")): _*)
      .orderBy(order: _*)
    df.withColumn(rn, row_number().over(w)).filter(col(rn) <= cap).drop(rn)
  }
}
