package graft

import graft.cdc.Cdc
import graft.state.StateStore

/** Attribute CDC bound semantics (reference: delta_source.py:251-333) and
  * state round-trip (schemas/state.py:77-111); mirrors test_batch.py:668. */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def store(p: String) =
    new StateStore(spark.sparkContext.hadoopConfiguration, p)

  test("first run: min..max inclusive bounds") {
    val df = Seq(5, 7, 9).toDF("v")
    val r = Cdc.attributeBounds(df, "v", "integer", Cdc.State.empty, None)
    assert(r.filterExpr === Some("v >= 5 and v <= 9"))
    assert(r.newState.get.nextValue.get.value === Some("9"))
    assert(r.newState.get.startValue.get.value === Some("5"))
  }

  test("first run with configured start: start..max(attr>=start)") {
    val df = Seq(5, 7, 9).toDF("v")
    val r = Cdc.attributeBounds(df, "v", "integer", Cdc.State.empty, Some("6"))
    assert(r.filterExpr === Some("v >= 6 and v <= 9"))
  }

  test("later run: exclusive lower bound from previous next_value") {
    val df = Seq(5, 7, 9, 12).toDF("v")
    val prev = Cdc.State(Some("v"),
      Some(Cdc.FeatureValue(Some("9"), "integer")),
      Some(Cdc.FeatureValue(Some("5"), "integer")))
    val r = Cdc.attributeBounds(df, "v", "integer", prev, None)
    assert(r.filterExpr === Some("v > 9 and v <= 12"))
    assert(r.newState.get.nextValue.get.value === Some("12"))
  }

  test("later run with no new data: empty slice → 1=2, no state update") {
    val df = Seq(5, 7, 9).toDF("v")
    val prev = Cdc.State(Some("v"),
      Some(Cdc.FeatureValue(Some("9"), "integer")),
      Some(Cdc.FeatureValue(Some("5"), "integer")))
    val r = Cdc.attributeBounds(df, "v", "integer", prev, None)
    assert(r.filterExpr === Some("1=2"))
    assert(r.newState === None)
  }

  test("change-feed bounds: first run from v0, later runs from persisted version") {
    import graft.table.ManagedTable
    val t = ManagedTable(spark, tmpDir("cdc_cdf"))
    t.write(Seq(1).toDF("id"), "APPEND", "append")
    t.write(Seq(2).toDF("id"), "APPEND", "append")

    val first = Cdc.changeFeedBounds(t, Cdc.State.empty)
    assert(first.startingVersion === 0L && first.endingVersion === 1L)
    assert(first.newState.nextValue.get.value === Some("1"))
    assert(first.newState.attribute === Some("readChangeFeed"))

    // reference persists next_value = end; next run starts there (inclusive)
    t.write(Seq(3).toDF("id"), "APPEND", "append")
    val second = Cdc.changeFeedBounds(t, first.newState)
    assert(second.startingVersion === 1L && second.endingVersion === 2L)

    // configured start wins when no previous state
    val cfg = Cdc.changeFeedBounds(t, Cdc.State.empty, configuredStart = Some("2"))
    assert(cfg.startingVersion === 2L && cfg.endingVersion === 2L)
  }

  test("timestamp values render quoted (state.py:64-74)") {
    val df = Seq("2026-01-01 00:00:00", "2026-03-01 10:30:00")
      .toDF("s").selectExpr("cast(s as timestamp) as v")
    val r = Cdc.attributeBounds(df, "v", "timestamp", Cdc.State.empty, None)
    assert(r.filterExpr ===
      Some("v >= '2026-01-01 00:00:00' and v <= '2026-03-01 10:30:00'"))
  }

  test("backfill: fixed inclusive range") {
    val r = Cdc.backfillBounds("v", "date", "2026-01-01", "2026-02-01")
    assert(r.filterExpr === Some("v >= '2026-01-01' and v <= '2026-02-01'"))
    assert(r.newState.get.loadType === "backfill")
  }

  test("state JSON round-trips through the store") {
    val s = store(tmpDir("cdc_state"))
    val st = Cdc.State(Some("v"),
      Some(Cdc.FeatureValue(Some("9"), "integer")),
      Some(Cdc.FeatureValue(Some("5"), "integer")), "incremental", Some("b1"))
    Cdc.saveState(s, "in1", st)
    val back = Cdc.loadState(s, "in1")
    assert(back === st)
    assert(Cdc.loadState(s, "missing") === Cdc.State.empty)
  }
}
