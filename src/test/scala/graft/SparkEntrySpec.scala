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

  test("every query has an oracle, except declared rows-only ops") {
    // sketch estimates are engine-specific — error-bounded by specs instead
    val rowsOnly = Set("dedup_approx_hll", "q22b_approx_percentiles")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == rowsOnly, s"queries missing oracles: ${missing -- rowsOnly}")
  }

  test("flagship entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(SparkTestBase.shared).count() > 0)
  }
}
