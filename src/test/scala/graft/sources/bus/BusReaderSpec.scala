package graft.sources.bus

import org.scalatest.funsuite.AnyFunSuite

/** Package-private reader contract: a planned offset range the bus can no
  * longer serve must FAIL the task, never complete silently (silent
  * completion commits offsets that were never read — data loss on an
  * exactly-once source).
  */
class BusReaderSpec extends AnyFunSuite {

  test("reader throws when the log cannot serve a planned range " +
      "(truncated/replaced bus), instead of silently completing") {
    val server = new BusServer(1)
    val port = server.start()
    try {
      val c = new BusClient("127.0.0.1", port)
      (0 until 5).foreach(i => c.append(0, i.toLong, s"$i", "x"))
      c.close()
      // a range the log CAN serve reads fully
      val ok = new BusPartitionReader(BusRange("127.0.0.1", port, 0, 0L, 5L, "graft"))
      var n = 0
      while (ok.next()) { ok.get(); n += 1 }
      ok.close()
      assert(n == 5)
      // a planned range past the end (the planner's end offsets came from
      // a previous, larger incarnation of the log) must throw
      val bad = new BusPartitionReader(BusRange("127.0.0.1", port, 0, 5L, 9L, "graft"))
      try {
        intercept[java.io.IOException] {
          while (bad.next()) bad.get()
        }
      } finally bad.close()
    } finally server.close()
  }
}
