package graft.sources.wire

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the protocol-independent wire-JDBC facade internals that the
  * protocol specs can't reach in isolation — currently the quote-aware
  * ` VALUES (` locator that anchors multi-row batch coalescing.
  */
class WireJdbcSpec extends AnyFunSuite {

  test("valuesIndex finds the keyword case-insensitively outside quotes") {
    val t = """INSERT INTO x ("a", "b") VALUES (?, ?)"""
    assert(WireJdbc.valuesIndex(t) == t.toUpperCase.indexOf(" VALUES ("))
    val lower = """insert into x (a, b) values (?, ?)"""
    assert(lower.regionMatches(true, WireJdbc.valuesIndex(lower),
      " VALUES (", 0, 9))
  }

  test("valuesIndex skips the keyword inside a quoted identifier or " +
      "string literal (doubled quotes are in-span escapes)") {
    // the identifier itself contains ` VALUES (` — the naive indexOf
    // would split there and corrupt every coalesced chunk
    val evilId = """INSERT INTO " VALUES (x" ("k") VALUES (?)"""
    val vi = WireJdbc.valuesIndex(evilId)
    assert(vi == evilId.lastIndexOf(" VALUES ("),
      "must anchor past the quoted identifier")
    val evilLit =
      """INSERT INTO t SELECT ' VALUES (no), it''s data' VALUES (1)"""
    assert(WireJdbc.valuesIndex(evilLit) ==
      evilLit.lastIndexOf(" VALUES ("))
    // no keyword outside quotes at all → -1 (per-statement fallback)
    assert(WireJdbc.valuesIndex("""UPDATE t SET v = ' VALUES ('""") == -1)
  }
}
