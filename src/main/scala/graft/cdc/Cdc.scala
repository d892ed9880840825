package graft.cdc

import graft.state.StateStore
import org.apache.spark.sql.DataFrame

/**
 * Attribute-based change data capture — the reference's incremental
 * "query semantics" (reference: core/sources/delta_source.py:251-333, the
 * same logic for file sources file_source.py:814-896; state schema
 * core/schemas/state.py:13-111).
 *
 * A CDC run computes [start, end] bounds over a watermark attribute from
 * (a) the previously persisted state and (b) a min/max aggregate over the
 * source — two cheap scans that Catalyst reduces to parquet
 * footer-statistics reads where possible — and injects a range filter into
 * the read. At 100 TB the filter is what matters: it is a plain predicate
 * on the scan, so partition pruning / row-group skipping applies.
 */
object Cdc {

  /** Typed CDC bound value with the reference's SQL-literal rendering
    * (state.py:64-74: integers bare, date/timestamp quoted). */
  final case class FeatureValue(value: Option[String], valueType: String) {
    def sqlLiteral: String = valueType match {
      case "integer" => value.get
      case "date" | "timestamp" => s"'${value.get}'"
      case t => throw new IllegalArgumentException(s"cdc value type $t")
    }
    def isEmpty: Boolean = value.isEmpty
  }

  /** Persisted per-input CDC state (`ChangeDataCaptureState`,
    * state.py:77-111), stored under `sources/<input>_cdc_value`. */
  final case class State(
      attribute: Option[String],
      nextValue: Option[FeatureValue],
      startValue: Option[FeatureValue],
      loadType: String = "incremental",
      batchId: Option[String] = None) {

    def toJson: String = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = m.createObjectNode()
      attribute.foreach(n.put("attribute", _))
      def putFv(name: String, fv: FeatureValue): Unit = {
        val o = n.putObject(name)
        fv.value match { case Some(v) => o.put("value", v); case None => o.putNull("value") }
        o.put("value_type", fv.valueType)
      }
      nextValue.foreach(putFv("next_value", _))
      startValue.foreach(putFv("start_value", _))
      n.put("load_type", loadType)
      batchId.foreach(n.put("batch_id", _))
      m.writeValueAsString(n)
    }
  }

  object State {
    def fromJson(s: String): State = {
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = m.readTree(s)
      def fv(name: String): Option[FeatureValue] = Option(n.get(name)).map { o =>
        FeatureValue(
          Option(o.get("value")).filterNot(_.isNull).map(_.asText()),
          Option(o.get("value_type")).map(_.asText()).getOrElse("integer"))
      }
      State(
        Option(n.get("attribute")).filterNot(_.isNull).map(_.asText()),
        fv("next_value"), fv("start_value"),
        Option(n.get("load_type")).map(_.asText()).getOrElse("incremental"),
        Option(n.get("batch_id")).filterNot(_.isNull).map(_.asText()))
    }
    val empty: State = State(None, None, None)
  }

  /** Result of the CDC pre-step: the filter to inject (as an extra
    * filter_data_feature, input.py:133-145) and the state to persist after
    * a successful run (task.py:519-544). */
  final case class Result(filterExpr: Option[String], newState: Option[State])

  private def aggString(df: DataFrame, agg: String): Option[String] = {
    val row = df.selectExpr(agg).collect()(0)
    if (row.isNullAt(0)) None
    else Some(row.get(0) match {
      case ts: java.sql.Timestamp => ts.toString.stripSuffix(".0")
      case v => v.toString
    })
  }

  /**
   * Attribute CDC bounds (delta_source.py:262-328):
   *  - no previous state + no configured start: start=min(attr),
   *    end=max(attr), filter `attr >= s AND attr <= e`
   *  - no previous state + configured start: end=max(attr where attr>=s),
   *    filter `attr >= s AND attr <= e`
   *  - previous state: start=prev.next_value,
   *    end=max(attr where attr > prev), filter `attr > s AND attr <= e`
   *    (or `attr = s` when bounds are equal)
   *  - any bound NULL (empty slice) → filter `1=2`
   */
  def attributeBounds(
      source: DataFrame,
      attribute: String,
      valueType: String,
      previous: State,
      configuredStart: Option[String]): Result = {

    val prev = previous.nextValue.filterNot(_.isEmpty)
    val (start, end) = prev match {
      case Some(p) =>
        (Some(p.value.get),
          aggString(source.filter(s"$attribute > ${p.sqlLiteral}"), s"max($attribute)"))
      case None => configuredStart match {
        case Some(s0) =>
          val s0v = FeatureValue(Some(s0), valueType)
          (Some(s0),
            aggString(source.filter(s"$attribute >= ${s0v.sqlLiteral}"), s"max($attribute)"))
        case None =>
          (aggString(source, s"min($attribute)"), aggString(source, s"max($attribute)"))
      }
    }

    (start, end) match {
      case (Some(s), Some(e)) =>
        val sv = FeatureValue(Some(s), valueType)
        val ev = FeatureValue(Some(e), valueType)
        val filter =
          if (prev.isEmpty) s"$attribute >= ${sv.sqlLiteral} and $attribute <= ${ev.sqlLiteral}"
          else if (s != e) s"$attribute > ${sv.sqlLiteral} and $attribute <= ${ev.sqlLiteral}"
          else s"$attribute = ${sv.sqlLiteral}"
        Result(Some(filter),
          Some(State(Some(attribute), Some(ev), Some(sv), "incremental")))
      case _ => Result(Some("1=2"), None)
    }
  }

  /** Change-feed CDC bounds over a [[graft.table.ManagedTable]] — the
    * analogue of the reference's Delta change-data-feed CDC
    * (delta_source.py:198-250): only available when the table was written
    * with `enable_change_data_feed`; `startingVersion` is the previously
    * persisted `next_value` (else the configured start, else the earliest
    * version in the commit log) and `endingVersion` the latest version.
    *
    * Matches the reference's inclusive-start quirk: `next_value` persists
    * the END version, and the next run's `startingVersion` is that same
    * version (Delta's `startingVersion` is inclusive), so the last
    * version's changes are re-read on the following run. Consumers that
    * need exactly-once must dedupe on `_commit_version` — exactly as they
    * must with the reference on Delta.
    */
  final case class ChangeFeedBounds(startingVersion: Long, endingVersion: Long,
                                    newState: State)

  def changeFeedBounds(
      table: graft.table.ManagedTable,
      previous: State,
      configuredStart: Option[String] = None): ChangeFeedBounds = {
    val latest = table.latestVersion.getOrElse(
      throw new IllegalStateException("change-feed CDC over a non-existent table"))
    val start = previous.nextValue.filterNot(_.isEmpty).map(_.value.get.toLong)
      .orElse(configuredStart.map(_.toLong))
      .getOrElse(table.earliestVersion.getOrElse(0L))
    ChangeFeedBounds(start, latest,
      State(Some("readChangeFeed"),
        Some(FeatureValue(Some(latest.toString), "integer")),
        Some(FeatureValue(Some(start.toString), "integer")), "incremental"))
  }

  /** Backfill: fixed configured range, both bounds required
    * (input.py:108-113, delta_source.py:334-343). */
  def backfillBounds(attribute: String, valueType: String,
                     start: String, end: String): Result = {
    val sv = FeatureValue(Some(start), valueType)
    val ev = FeatureValue(Some(end), valueType)
    Result(
      Some(s"$attribute >= ${sv.sqlLiteral} and $attribute <= ${ev.sqlLiteral}"),
      Some(State(Some(attribute), Some(ev), Some(sv), "backfill")))
  }

  /** Load previous state for an input from the store
    * (input.py:114-119: `sources/<name>_cdc_value`). */
  def loadState(store: StateStore, inputName: String): State =
    store.get("sources", s"${inputName}_cdc_value") match {
      case Some(json) if json.nonEmpty && json != "{}" => State.fromJson(json)
      case _ => State.empty
    }

  /** Persist post-run state (task.py:519-544). */
  def saveState(store: StateStore, inputName: String, state: State): Unit =
    store.set("sources", s"${inputName}_cdc_value", state.toJson)
}
