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

  test("EVERY query has an oracle — no rows-only rows") {
    // engine-specific values (sketches, approx bounds) are emitted as
    // error-bound booleans the oracle re-derives exactly, so nothing
    // is exempt; this pins against silently losing an oracle
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries missing oracles: $missing")
  }

  test("every query runs and returns rows on sf0.001") {
    val empty = SparkEntry.queries.filter { case (_, fn) =>
      fn(spark, sf).isEmpty
    }.keys
    assert(empty.isEmpty, s"empty results: $empty")
  }
}
