package graft

/** Smoke: driver contract — entry() returns rows; every oracle key has a
  * query and vice-versa (a dangling oracle would zero the round).
  */
class EntrySpec extends SparkTestBase {

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys ⊆ queries keys") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("every query has an oracle except the known rows-only set") {
    // sketch values are engine-specific by nature; everything else must
    // stay oracle-checked — this pins against silently losing an oracle
    val rowsOnly = Set("x_approx_sketches")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == rowsOnly, s"queries missing oracles: ${missing -- rowsOnly}")
  }

  test("every query runs and returns rows on sf0.001") {
    val empty = SparkEntry.queries.filter { case (_, fn) =>
      fn(spark, sf).isEmpty
    }.keys
    assert(empty.isEmpty, s"empty results: $empty")
  }
}
