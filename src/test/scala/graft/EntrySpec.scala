package graft

/** The driver's own smoke checks, run ahead of time: the flagship
  * entry query must return rows at sf0.001, and every registered
  * oracle key must have a query (and vice versa where promised). */
class EntrySpec extends SparkSpec {

  test("entry() returns rows at sf0.001 (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a registered query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every registered query is oracle-verified (no rows-only keys)") {
    // the LSH family went fully portable (md5-prefix hashing) in r3, so
    // every driver key now carries a DuckDB oracle
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"unexpected rows-only set: $rowsOnly")
  }
}
