package graft

/** Driver-contract smoke: `SparkEntry.entry` must return rows on sf0.001
  * (the round driver's first check before the oracle gate). */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query has an oracle or is deliberately absent") {
    // oracleSql keys must be a subset of queries (a dangling oracle would
    // make the driver run SQL for a query that does not exist)
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracle entries without a query: $dangling")
  }
}
