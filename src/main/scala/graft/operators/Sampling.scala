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

  /** One decision rule everywhere: keep iff keyLong < floor(rate·2^32).
    * `rate >= 1.0` keeps EVERY row (floor = 2^32 exceeds any 32-bit hash)
    * — callers with a fixed rate special-case it because an 8-hex-char
    * threshold cannot express 2^32. The floor makes the fixed-rate hex
    * compare and the weighted numeric compare select IDENTICAL rows for
    * the same effective rate. */
  private def thresholdHex(rate: Double): String = {
    require(rate >= 0.0 && rate < 1.0, s"hex threshold needs rate in [0,1), got $rate")
    f"${(rate * 4294967296.0).toLong}%08x"
  }

  /** Keep ~`rate` of rows, chosen by key hash. Same (keys, salt) always
    * selects the same rows; change `salt` to draw an independent sample.
    * `rate = 1.0` keeps all rows. */
  def hashSample(df: DataFrame, keys: Seq[String], rate: Double,
                 salt: String = ""): DataFrame = {
    require(keys.nonEmpty, "hashSample needs key columns")
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    if (rate >= 1.0) df
    else df.filter(keyHex(keys, salt) < lit(thresholdHex(rate)))
  }

  /** Label every row `test` (~`testFraction`) or `train` by key hash.
    * Because membership is content-keyed, a row keeps its split across
    * incremental appends and re-runs — no leakage between splits. */
  def hashSplit(df: DataFrame, keys: Seq[String], testFraction: Double,
                salt: String = "", outCol: String = "split"): DataFrame = {
    require(keys.nonEmpty, "hashSplit needs key columns")
    require(testFraction >= 0.0 && testFraction <= 1.0,
      s"testFraction must be in [0,1], got $testFraction")
    if (testFraction >= 1.0) df.withColumn(outCol, lit("test"))
    else df.withColumn(outCol,
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
    * determinism guarantees as [[hashSample]]; still shuffle-free.
    * Uses the floor(rate·2^32) rule, so a constant weight `r` selects
    * EXACTLY the rows `hashSample(r)` selects (rate 1.0 keeps all). */
  def hashSampleWeighted(df: DataFrame, keys: Seq[String], rateCol: Column,
                         salt: String = ""): DataFrame = {
    require(keys.nonEmpty, "hashSampleWeighted needs key columns")
    val rate = least(greatest(rateCol.cast("double"), lit(0.0)), lit(1.0))
    df.filter(keyLong(keys, salt).cast("double") <
      floor(rate * lit(4294967296.0)))
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
    * One shuffle on `groupCols`. A pathologically hot group (one domain
    * with 100M rows) would sort in a single task, so the operator guards
    * itself: a lightweight map-combinable sizing aggregate finds the
    * largest group, and when it exceeds `cap × hotGroupFactor` the plan
    * becomes an EXACT two-stage top-k — per-(group, hash-prefix-bucket)
    * top-`cap` first (256-way fan-out, bounded partitions), then the
    * global per-group top-`cap` over ≤ 256·cap survivors. Every global
    * top-`cap` row ranks ≤ `cap` inside its own bucket, so the two-stage
    * result is IDENTICAL to the single-window result — this is a plan
    * change, never a sample. Normal-sized groups keep the original
    * single-window plan. `hotGroupFactor = 0` disables the guard (and
    * the sizing job), restoring a fully lazy operator. */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], cap: Int,
                  keys: Seq[String], salt: String = "",
                  hotGroupFactor: Int = 64): DataFrame = {
    require(groupCols.nonEmpty && keys.nonEmpty, "capPerGroup needs group and key columns")
    require(cap > 0, s"cap must be positive, got $cap")
    val rn = "__graft_rn__"
    val gcols = groupCols.map(c => col(s"`$c`"))
    val order = keyHex(keys, salt) +: keys.map(c => col(s"`$c`"))
    val hot = hotGroupFactor > 0 && {
      val r = df.groupBy(gcols: _*).agg(count(lit(1)).as("__graft_n__"))
        .agg(max(col("__graft_n__"))).head()
      !r.isNullAt(0) && r.getLong(0) > cap.toLong * hotGroupFactor
    }
    val base =
      if (!hot) df
      else {
        val bucket = substring(keyHex(keys, salt), 1, 2) // 256-way
        val w1 = Window.partitionBy(gcols :+ bucket: _*).orderBy(order: _*)
        df.withColumn(rn, row_number().over(w1)).filter(col(rn) <= cap).drop(rn)
      }
    val w = Window.partitionBy(gcols: _*).orderBy(order: _*)
    base.withColumn(rn, row_number().over(w)).filter(col(rn) <= cap).drop(rn)
  }

  /** Cap each group at a TOKEN budget instead of a row count — the
    * training-mixture quota operator ("at most N tokens of each
    * language/domain per epoch"). Rows are admitted in key-hash order
    * (unbiased, deterministic, append-stable like every operator here)
    * while the tokens admitted BEFORE the row stay under `budget` — the
    * same exclusive-prefix boundary policy as
    * [[graft.llm.Packing.packSequences]]: the straddling row is
    * admitted (total ≤ budget + one document), and a group's first row
    * always survives, so a quota can never silently starve a group out
    * of the mixture. One shuffle on `groupCols`.
    *
    * Hot-group guard (same sizing aggregate as [[capPerGroup]]): when
    * the largest group exceeds `budget-row-count × hotGroupFactor`-ish
    * scale — detected as max group row count > hotGroupFactor × 1024 —
    * the prefix sum decomposes EXACTLY over 256 hash-prefix buckets:
    * the bucket is the leading hex of the very hash the global order
    * sorts by, so (bucket asc, within-bucket order) IS the global
    * order, and global prefix = per-bucket running sum + the running
    * total of all earlier buckets (a 256-row window). Bounded sorts,
    * identical output. `hotGroupFactor = 0` disables the guard and the
    * sizing job. */
  def capTokensPerGroup(df: DataFrame, groupCols: Seq[String],
                        sizeCol: String, budget: Long,
                        keys: Seq[String], salt: String = "",
                        hotGroupFactor: Int = 64): DataFrame = {
    require(groupCols.nonEmpty && keys.nonEmpty,
      "capTokensPerGroup needs group and key columns")
    require(budget > 0, s"budget must be positive, got $budget")
    val cum = "__graft_cum__"
    val gcols = groupCols.map(c => col(s"`$c`"))
    val order = keyHex(keys, salt) +: keys.map(c => col(s"`$c`"))
    val sz = col(s"`$sizeCol`").cast("long")
    val hot = hotGroupFactor > 0 && {
      val r = df.groupBy(gcols: _*).agg(count(lit(1)).as("__graft_n__"))
        .agg(max(col("__graft_n__"))).head()
      !r.isNullAt(0) && r.getLong(0) > hotGroupFactor.toLong * 1024L
    }
    if (!hot) {
      val w = Window.partitionBy(gcols: _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn(cum, coalesce(sum(sz).over(w), lit(0L)))
        .filter(col(cum) < budget)
        .drop(cum)
    } else {
      val b = "__graft_b__"
      val within = "__graft_within__"
      val offset = "__graft_off__"
      val bucket = substring(keyHex(keys, salt), 1, 2)
      val wIn = Window.partitionBy(gcols :+ col(b): _*).orderBy(order: _*)
        .rowsBetween(Window.unboundedPreceding, -1)
      val wOff = Window.partitionBy(gcols: _*).orderBy(col(b))
        .rowsBetween(Window.unboundedPreceding, -1)
      val bucketTotals = df.withColumn(b, bucket)
        .groupBy(gcols :+ col(b): _*).agg(sum(sz).as("__graft_bt__"))
        .withColumn(offset, coalesce(sum(col("__graft_bt__")).over(wOff), lit(0L)))
        .drop("__graft_bt__")
      df.withColumn(b, bucket)
        .withColumn(within, coalesce(sum(sz).over(wIn), lit(0L)))
        .join(bucketTotals, groupCols :+ b)
        .filter(col(offset) + col(within) < budget)
        .drop(b, within, offset)
    }
  }

  /** Deterministic training-mixture assembly: draw a corpus of ~`total`
    * rows honoring per-stratum `weights` ("50% en, 20% de, …") — the
    * domain/language re-weighting step every pretraining pipeline runs
    * between curation and packing. Each stratum's quota is the exact
    * integer `floor(total · weight)`; rows are admitted per stratum in
    * key-hash order (unbiased within the stratum, append-stable), and a
    * stratum smaller than its quota contributes everything it has —
    * quotas are caps, not promises. Strata absent from `weights` are
    * dropped (weight 0).
    *
    * Same plan family as [[capPerGroup]] with a per-group cap: one
    * shuffle on the stratum column, and the identical 256-hash-bucket
    * two-stage top-k guard for hot strata (a mixture stratum is USUALLY
    * hot — "half the corpus is English" — so the guard matters more
    * here than anywhere; stage-1 caps each (stratum, bucket) at the
    * stratum's own quota, which keeps the stage-2 sort ≤ 256·quota rows
    * and provably identical output). `hotGroupFactor = 0` disables the
    * guard and its sizing job. */
  /** Exact per-stratum quotas `floor(total · weight)`, computed in
    * BigDecimal from the weight's decimal literal. The closest double
    * to "0.3" is slightly below it, so bare `(1000 * 0.3).toLong`
    * would shave the quota to 299 — and an absolute epsilon does not
    * survive large totals either (ulp(3e11) ≈ 6e-5 swallows 1e-6), so
    * the true product is rounded down exactly. Representation noise
    * must never cost a row at any corpus size. */
  private[graft] def mixtureQuotas(total: Long,
                                   weights: Map[String, Double]): Map[String, Long] =
    weights.map { case (s, w) =>
      s -> (BigDecimal(total) * BigDecimal(w))
        .setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
    }

  def mixtureSample(df: DataFrame, strataCol: String,
                    weights: Map[String, Double], total: Long,
                    keys: Seq[String], salt: String = "",
                    hotGroupFactor: Int = 64): DataFrame = {
    require(total > 0, s"total must be positive, got $total")
    require(weights.nonEmpty, "mixtureSample needs at least one stratum weight")
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      s"weights must be in [0,1], got $weights")
    mixtureSampleQuotas(df, strataCol, mixtureQuotas(total, weights),
      keys, salt, hotGroupFactor)
  }

  /** [[mixtureSample]] with the per-stratum row quotas given DIRECTLY
    * (the admission machinery without the weight→quota derivation) —
    * the entry point for quota sources computed elsewhere, e.g.
    * [[temperatureQuotas]]. Same guarantees: key-hash-ordered
    * deterministic admission per stratum, quotas are caps not
    * promises, strata absent from the map are dropped, and the
    * 256-bucket two-stage guard bounds the sort for hot strata. */
  def mixtureSampleQuotas(df: DataFrame, strataCol: String,
                          quotas: Map[String, Long],
                          keys: Seq[String], salt: String = "",
                          hotGroupFactor: Int = 64): DataFrame = {
    require(keys.nonEmpty, "mixtureSample needs key columns")
    require(quotas.nonEmpty, "mixtureSample needs at least one stratum quota")
    require(quotas.values.forall(_ >= 0L),
      s"quotas must be non-negative, got $quotas")
    val capExpr = quotas.foldLeft(lit(0L)) { case (acc, (stratum, c)) =>
      when(col(s"`$strataCol`") === stratum, lit(c)).otherwise(acc)
    }
    val rn = "__graft_rn__"
    val g = col(s"`$strataCol`")
    val order = keyHex(keys, salt) +: keys.map(c => col(s"`$c`"))
    val maxCap = quotas.values.max
    val hot = hotGroupFactor > 0 && {
      val r = df.groupBy(g).agg(count(lit(1)).as("__graft_n__"))
        .agg(max(col("__graft_n__"))).head()
      !r.isNullAt(0) && r.getLong(0) > maxCap * hotGroupFactor
    }
    val base =
      if (!hot) df
      else {
        val bucket = substring(keyHex(keys, salt), 1, 2) // 256-way
        val w1 = Window.partitionBy(g, bucket).orderBy(order: _*)
        df.withColumn(rn, row_number().over(w1))
          .filter(col(rn) <= capExpr).drop(rn)
      }
    val w = Window.partitionBy(g).orderBy(order: _*)
    base.withColumn(rn, row_number().over(w))
      .filter(col(rn) <= capExpr).drop(rn)
  }

  /** Deterministic training order: assign every row a hash shard and a
    * position within it, so `(pos, shard)` lexicographic order IS the
    * training curriculum — a round-robin interleave across hash shards,
    * i.e. a reproducible global shuffle that any engine recomputes
    * bit-identically from (keys, salt) alone.
    *
    * Scale: a true global shuffle (ORDER BY hash) is a full range sort
    * and at read time a single consumer sequence; sharding instead
    * shuffles once on the 16-bit hash prefix and sorts each shard
    * independently — shard sizes are ~N/numShards by hash uniformity,
    * so per-shard state is bounded, and training jobs stream shards in
    * parallel exactly like webdataset/Megatron shard loaders. The
    * interleave keeps the curriculum well-mixed: consecutive positions
    * of one shard are hash-distant documents.
    *
    * `numShards` must be in [1, 65536] (shards come from the first 4
    * hex chars of the row hash); powers of two divide 65536 evenly and
    * give exactly balanced shard probabilities. */
  def trainingOrder(df: DataFrame, keys: Seq[String], numShards: Int,
                    salt: String = "", shardCol: String = "shard",
                    posCol: String = "pos"): DataFrame = {
    require(keys.nonEmpty, "trainingOrder needs key columns")
    require(numShards >= 1 && numShards <= 65536,
      s"numShards must be in [1, 65536], got $numShards")
    val h = md5(concat_ws("|",
      (lit(salt) +: keys.map(c => col(s"`$c`").cast("string"))): _*))
    val hc = "__graft_h__"
    val w = Window.partitionBy(col(s"`$shardCol`"))
      .orderBy(col(hc) +: keys.map(c => col(s"`$c`")): _*)
    df.withColumn(hc, h)
      .withColumn(shardCol,
        (conv(substring(col(hc), 1, 4), 16, 10).cast("int") % numShards))
      .withColumn(posCol, row_number().over(w))
      .drop(hc)
  }

  /** Temperature-scaled mixture quotas — the domain-reweighting rule of
    * multilingual/multi-domain pretraining (w_i ∝ n_i^α, α<1 upsamples
    * the tail; e.g. Conneau & Lample 2019 §3.1, Raffel 2020 §3.4.3):
    * per-stratum target row counts for a mixture of `total` rows, from
    * the corpus's OWN stratum counts.
    *
    * Engine-neutral by integer construction: the scaled weight is
    * `floor(10⁶ · (n_i/n_max)^α)` — for the default α = 0.5 the power
    * is `sqrt`, which IEEE-754 requires correctly rounded, so both
    * engines floor the SAME double (a floor tie needs 10⁶·√ratio
    * integral, which happens only at exactly-representable rational
    * squares where sqrt is exact anyway); the quota is then
    * `total·sw_i div Σsw` in pure BIGINT arithmetic. Normalizing by
    * n_max keeps sw ≤ 10⁶, so `total·sw` fits 2⁶³ for any total up to
    * ~9·10¹², and every stratum with n ≥ 10⁻¹²·n_max keeps a nonzero
    * weight. For α ≠ 0.5 the `pow` is NOT guaranteed bit-identical
    * across engines (libm vs JVM) — fine for production use, but pin
    * cross-engine oracles to α = 0.5.
    *
    * Scale: one count aggregate over one scan; the stratum table is
    * tiny by definition (strata are languages/domains), so the n_max
    * and Σsw scalars broadcast. Compose with [[mixtureSampleQuotas]]
    * via [[temperatureMixtureSample]]. Σ quotas ≤ total (floor), and
    * quotas are caps: a stratum smaller than its quota contributes
    * everything it has. */
  def temperatureQuotas(df: DataFrame, strataCol: String, total: Long,
                        alpha: Double = 0.5): DataFrame = {
    require(total > 0, s"total must be positive, got $total")
    require(alpha > 0.0 && alpha <= 1.0,
      s"alpha must be in (0, 1], got $alpha")
    // a NULL stratum can never be admitted (the admission predicate
    // `col === stratum` never matches NULL), so it must not enter the
    // weight math either — counted in, it would inflate Σsw (and
    // possibly n_max) and silently dilute every REAL stratum's quota
    val counts = df.filter(col(s"`$strataCol`").isNotNull)
      .groupBy(col(s"`$strataCol`").as("stratum"))
      .agg(count(lit(1)).as("n"))
    val nMax = counts.agg(max(col("n")).as("n_max"))
    val ratio = col("n").cast("double") / col("n_max").cast("double")
    val scaled = if (alpha == 0.5) sqrt(ratio) else pow(ratio, alpha)
    val w = counts.crossJoin(broadcast(nMax))
      .withColumn("scaled_weight",
        floor(lit(1000000L) * scaled).cast("long"))
    val swSum = w.agg(sum(col("scaled_weight")).as("sw_sum"))
    w.crossJoin(broadcast(swSum))
      .select(col("stratum"), col("n"), col("scaled_weight"),
        expr(s"$total * scaled_weight div sw_sum").as("quota"))
  }

  /** [[temperatureQuotas]] fed straight into [[mixtureSampleQuotas]]:
    * draw a ~`total`-row mixture whose stratum proportions follow
    * n^α. The quota table is strata-sized (languages/domains), so the
    * one driver materialization is bounded by construction — the same
    * justification as mixtureSample's own hot-stratum probe. */
  def temperatureMixtureSample(df: DataFrame, strataCol: String,
                               total: Long, keys: Seq[String],
                               alpha: Double = 0.5, salt: String = "",
                               hotGroupFactor: Int = 64): DataFrame = {
    val quotas = temperatureQuotas(df, strataCol, total, alpha)
      .select("stratum", "quota").collect()
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    mixtureSampleQuotas(df, strataCol, quotas, keys, salt, hotGroupFactor)
  }
}
