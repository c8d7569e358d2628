package graft

import org.scalatest.funsuite.AnyFunSuite

/** Contract guards: the driver hash-compares by key, so a drifted key
  * silently drops a correctness row — pin the mapping here.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query has an oracle — no rows-only exceptions remain") {
    // the two sketch queries carry tolerance oracles since round 6: they
    // emit the exact answer (independently recomputed by DuckDB) plus an
    // in-band flag the oracle pins to TRUE
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries missing oracles: $missing")
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(SparkTestBase.shared).count() > 0)
  }
}
