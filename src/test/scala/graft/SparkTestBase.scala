package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs; sf0.001 test tables. */
trait SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.shared
  val sfDir = "/root/testdata/sf0.001"
}

object SparkTestBase {
  lazy val shared: SparkSession = {
    // static conf — must precede session creation (bucketed-table specs)
    System.setProperty("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    Engine.session("graft-test", "4")
  }
}
