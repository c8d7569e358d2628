package graft.util

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Per-process scratch space for the query legs that materialize
  * intermediate exports (a41 atomic publish, a57 zstd round-trip, the
  * warehouse sync fixtures, …).
  *
  * Every directory handed out lives under ONE session root that a JVM
  * shutdown hook deletes recursively — so repeated gate/bench runs no
  * longer accumulate full lineitem/documents parquet copies in
  * java.io.tmpdir (each Verify/Bench JVM cleans up after itself, and a
  * crashed JVM leaves at most one root for the next run's OS tmp
  * reaper instead of dozens of anonymous graft_* directories).
  */
object Scratch {

  private lazy val root: Path = {
    val r = Files.createTempDirectory("graft_scratch_")
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(r)))
    r
  }

  /** A fresh unique directory under the session root; same contract as
    * `Files.createTempDirectory(prefix)` but reaped at JVM exit.
    */
  def dir(prefix: String): Path = Files.createTempDirectory(root, prefix)

  private def deleteTree(p: Path): Unit = {
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try {
        stream.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => try Files.deleteIfExists(f) catch { case _: Exception => () })
      } finally stream.close()
    }
  }
}
