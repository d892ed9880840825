package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Declarative data-quality expectations (the Deequ/"expectations suite"
 * layer a pipeline runs on every load, generalizing the reference's
 * single `table_constraint` write pattern): a rule set is evaluated in
 * ONE aggregate over ONE scan — every rule is a parallel aggregate
 * expression (violation counting is `sum(when(...))`; uniqueness is
 * `count(*) − count(DISTINCT keys)`, planned through Spark's EXPAND
 * like any multi-distinct), and the wide 1-row result is stacked to a
 * long `(rule, column, n_violations, passed)` verdict table driver-free.
 * Adding rules never adds scans.
 *
 * Null semantics, stated once: `NotNull` counts NULLs; every OTHER rule
 * counts only non-null violators — a NULL is not "out of range", it is
 * missing, and conflating the two double-counts the same defect. Rows
 * failing several rules count once per rule (the verdicts are
 * per-rule, not per-row).
 *
 * `check` returns the verdict table; `require` on `passed` is the
 * caller's choice — gating vs monitoring are the same computation.
 */
object Expectations {

  sealed trait Rule {
    def ruleName: String
    def columnLabel: String
    /** Aggregate expression counting this rule's violations. */
    private[graft] def violations: org.apache.spark.sql.Column
  }

  /** NULLs in `col`. */
  final case class NotNull(col: String) extends Rule {
    val ruleName = "not_null"
    val columnLabel: String = col
    private[graft] def violations =
      sum(when(org.apache.spark.sql.functions.col(s"`$col`").isNull, 1L)
        .otherwise(0L))
  }

  /** Duplicate `keys` tuples: `count(*) − count(DISTINCT keys)` — rows
    * with a NULL key component are excluded from the distinct count by
    * SQL semantics, so they are counted via the non-null total to keep
    * `0 ≤ violations` exact. */
  final case class Unique(keys: Seq[String]) extends Rule {
    require(keys.nonEmpty, "Unique needs key columns")
    val ruleName = "unique"
    val columnLabel: String = keys.mkString(",")
    private def nonNull = keys.map(k =>
      org.apache.spark.sql.functions.col(s"`$k`").isNotNull).reduce(_ && _)
    private[graft] def violations =
      sum(when(nonNull, 1L).otherwise(0L)) -
        // backtick-quoted like the null filter — a raw name here would
        // parse dots as struct access and count a DIFFERENT column
        countDistinct(org.apache.spark.sql.functions.col(s"`${keys.head}`"),
          keys.tail.map(k => org.apache.spark.sql.functions.col(s"`$k`")): _*)
  }

  /** Non-null values outside `[lo, hi]` (inclusive). */
  final case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    require(lo <= hi, s"empty range [$lo, $hi]")
    val ruleName = "in_range"
    val columnLabel: String = col
    private[graft] def violations = {
      val c = org.apache.spark.sql.functions.col(s"`$col`")
      sum(when(c.isNotNull && (c < lo || c > hi), 1L).otherwise(0L))
    }
  }

  /** Non-null values not matching `regex` (RE2-safe subset recommended). */
  final case class MatchesRegex(col: String, regex: String) extends Rule {
    val ruleName = "matches_regex"
    val columnLabel: String = col
    private[graft] def violations = {
      val c = org.apache.spark.sql.functions.col(s"`$col`")
      sum(when(c.isNotNull && !c.rlike(regex), 1L).otherwise(0L))
    }
  }

  /** Non-null values outside the allowed set. Comparison is on the
    * column's STRING rendering (`cast("string")`) — for a numeric
    * column list the rendered forms ("5.0", not "5"), or use
    * [[InRange]]/[[Satisfies]] for numeric membership. */
  final case class OneOf(col: String, allowed: Seq[String]) extends Rule {
    require(allowed.nonEmpty, "OneOf needs at least one allowed value")
    val ruleName = "one_of"
    val columnLabel: String = col
    private[graft] def violations = {
      val c = org.apache.spark.sql.functions.col(s"`$col`").cast("string")
      sum(when(c.isNotNull && !c.isin(allowed: _*), 1L).otherwise(0L))
    }
  }

  /** Rows failing an arbitrary boolean SQL predicate (the escape hatch —
    * `sql` must be TRUE for conforming rows; NULL predicate = violation,
    * matching WHERE/filter semantics where only TRUE passes. This is
    * deliberately STRICTER than a SQL CHECK constraint, which lets
    * UNKNOWN through — a quality gate that waves NULLs past its own
    * predicate would hide exactly the rows it exists to catch). */
  final case class Satisfies(sql: String, label: String) extends Rule {
    val ruleName = "satisfies"
    val columnLabel: String = label
    private[graft] def violations =
      sum(when(coalesce(expr(sql), lit(false)), 0L).otherwise(1L))
  }

  /**
   * The rule DSL shared by the SQL TVF (`graft_expectations`) and the
   * task-output gate: ';'-separated entries —
   * `not_null:col | unique:a,b | range:col:lo:hi | regex:col:pattern |
   * one_of:col:v1|v2 | check:label:<sql predicate>`. Colons inside the
   * regex/predicate survive (split is bounded per rule kind); a literal
   * ';' inside a regex or predicate cannot (it IS the rule separator) —
   * such rules need the Scala API.
   */
  def parseRules(dsl: String): Seq[Rule] = {
    val rules = dsl.split(";").toSeq.map(_.trim).filter(_.nonEmpty).map { entry =>
      val parts = entry.split(":", 2)
      require(parts.length == 2,
        s"expectations rule must be 'kind:spec', got '$entry'")
      val spec = parts(1)
      parts(0) match {
        case "not_null" => NotNull(spec)
        case "unique" => Unique(spec.split(",").map(_.trim).toSeq)
        case "range" =>
          val p = spec.split(":")
          require(p.length == 3, s"range needs col:lo:hi, got '$spec'")
          val (lo, hi) = try (p(1).toDouble, p(2).toDouble) catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"range bounds must be numeric in '$entry'")
          }
          InRange(p(0), lo, hi)
        case "regex" =>
          val p = spec.split(":", 2)
          require(p.length == 2, s"regex needs col:pattern, got '$spec'")
          MatchesRegex(p(0), p(1))
        case "one_of" =>
          val p = spec.split(":", 2)
          require(p.length == 2, s"one_of needs col:v1|v2|…, got '$spec'")
          OneOf(p(0), p(1).split("\\|").toSeq)
        case "check" =>
          val p = spec.split(":", 2)
          require(p.length == 2, s"check needs label:<predicate>, got '$spec'")
          Satisfies(p(1), p(0))
        case other => throw new IllegalArgumentException(
          s"unknown expectations rule kind '$other' in '$entry'")
      }
    }
    require(rules.nonEmpty, "expectations DSL parsed to zero rules")
    rules
  }

  /** The rule's violation-count aggregate — for callers composing
    * rules into their OWN aggregations (e.g. the managed table's
    * write-time constraint enforcement, which rides the write job's
    * Observation instead of a second scan). */
  def violationsOf(rule: Rule): org.apache.spark.sql.Column = rule.violations

  // ---------------- drift / anomaly detection (Deequ-style) ----------------

  /** An integer-exact batch metric for drift tracking. Values are
    * BIGINT counts on purpose: drift verdicts compare value·n against
    * Σ·history by DECIMAL(38,0) cross-multiplication, so PASS/FAIL is
    * bit-identical in any engine — no float ratios anywhere. */
  sealed trait Metric {
    def metricName: String
    def columnLabel: String
    private[graft] def value: org.apache.spark.sql.Column
  }
  /** Total rows. */
  final case class RowCount() extends Metric {
    val metricName = "row_count"
    val columnLabel = "*"
    private[graft] def value = count(lit(1))
  }
  /** NULLs in `col`. */
  final case class NullCount(col: String) extends Metric {
    val metricName = "null_count"
    val columnLabel: String = col
    private[graft] def value =
      sum(when(org.apache.spark.sql.functions.col(s"`$col`").isNull, 1L)
        .otherwise(0L))
  }
  /** Exact distinct count of `col` (one EXPAND pass, like [[Unique]]). */
  final case class DistinctCount(col: String) extends Metric {
    val metricName = "distinct_count"
    val columnLabel: String = col
    private[graft] def value =
      countDistinct(org.apache.spark.sql.functions.col(s"`$col`"))
  }

  /** Metrics DSL: ';'-separated `count | nulls:col | distinct:col`. */
  def parseMetrics(dsl: String): Seq[Metric] = {
    val ms = dsl.split(";").toSeq.map(_.trim).filter(_.nonEmpty).map { entry =>
      entry.split(":", 2) match {
        case Array("count") => RowCount()
        case Array("nulls", c) => NullCount(c)
        case Array("distinct", c) => DistinctCount(c)
        case _ => throw new IllegalArgumentException(
          s"unknown metric '$entry' (count | nulls:col | distinct:col)")
      }
    }
    require(ms.nonEmpty, "metrics DSL parsed to zero metrics")
    ms
  }

  /** Profile a batch in ONE scan: `(metric, column, value)`, one row
    * per metric. Persist these per load (a managed metrics table) and
    * feed the accumulated history to [[driftCheck]]. */
  def metricsProfile(df: DataFrame, metrics: Seq[Metric]): DataFrame = {
    require(metrics.nonEmpty, "metricsProfile needs at least one metric")
    val aggs = metrics.zipWithIndex.map { case (m, i) =>
      coalesce(m.value, lit(0L)).cast("long").as(s"__m$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = metrics.zipWithIndex.map { case (m, i) =>
      val mn = m.metricName.replace("'", "''")
      val cl = m.columnLabel.replace("'", "''")
      s"'$mn', '$cl', `__m$i`"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${metrics.size}, $stackArgs) AS (metric, column, value)")
  }

  /**
   * Anomaly verdicts for a batch profile against its own history (the
   * Deequ relative-rate-of-change strategy, made engine-exact): a
   * metric passes when `|value − mean(history)| ≤ tolPpm·1e-6 ·
   * mean(history)`, evaluated WITHOUT division as
   * `|value·n − Σ| · 1e6 ≤ tolPpm · Σ` in DECIMAL(38,0). A metric
   * whose history sums to zero passes only at zero (a count appearing
   * from nowhere IS the anomaly); a metric with no history rows
   * passes vacuously (`hist_n = 0` marks it for the caller).
   *
   * `current` and `history` are both `(metric, column, value)` frames
   * (the [[metricsProfile]] shape — history typically many epochs'
   * rows). One aggregation of the history, one broadcast-size join;
   * at 100 TB the expensive part is profiling the batch, never this.
   */
  def driftCheck(current: DataFrame, history: DataFrame,
                 tolPpm: Long): DataFrame = {
    require(tolPpm >= 0, s"tolPpm must be >= 0, got $tolPpm")
    val hist = history.groupBy("metric", "column")
      .agg(count(lit(1)).as("hist_n"),
        sum(col("value")).cast("long").as("hist_sum"))
    val dec = "decimal(38,0)"
    current.join(hist, Seq("metric", "column"), "left")
      .withColumn("hist_n", coalesce(col("hist_n"), lit(0L)))
      .withColumn("hist_sum", coalesce(col("hist_sum"), lit(0L)))
      .withColumn("passed",
        when(col("hist_n") === 0L, lit(1))
          .when(col("hist_sum") === 0L, (col("value") === 0L).cast("int"))
          .otherwise(
            (abs(col("value").cast(dec) * col("hist_n").cast(dec) -
              col("hist_sum").cast(dec)) * lit(1000000L).cast(dec) <=
              lit(tolPpm).cast(dec) * col("hist_sum").cast(dec))
              .cast("int")))
  }

  /** Evaluate all rules in one scan: `(rule, column, n_violations,
    * passed)`, one row per rule, rule order preserved. */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "Expectations.check needs at least one rule")
    val aggs = rules.zipWithIndex.map { case (r, i) =>
      coalesce(r.violations, lit(0L)).as(s"__r$i")
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stackArgs = rules.zipWithIndex.map { case (r, i) =>
      val rn = r.ruleName.replace("'", "''")
      val cl = r.columnLabel.replace("'", "''")
      s"'$rn', '$cl', `__r$i`"
    }.mkString(", ")
    wide.selectExpr(
      s"stack(${rules.size}, $stackArgs) AS (rule, column, n_violations)")
      .withColumn("passed", (col("n_violations") === 0L).cast("int"))
  }
}
