package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the cluster-submittable contract of [[Engine.session]]: an
  * externally supplied `spark.master` must be respected (the factory adds
  * `local[N]` only as the direct-JVM fallback). The decision point is
  * tested directly — creating a second real session against a bogus master
  * would tear down the suite-shared local session.
  */
class EngineSpec extends AnyFunSuite {

  private def withMasterProp[T](value: Option[String])(body: => T): T = {
    val prev = sys.props.get("spark.master")
    try {
      value match {
        case Some(v) => sys.props("spark.master") = v
        case None => sys.props -= "spark.master"
      }
      body
    } finally prev match {
      case Some(v) => sys.props("spark.master") = v
      case None => sys.props -= "spark.master"
    }
  }

  test("an injected spark.master suppresses the local[N] fallback") {
    withMasterProp(Some("spark://cluster-host:7077")) {
      assert(Engine.injectedMaster.contains("spark://cluster-host:7077"))
      assert(Engine.localMasterFallback("8").isEmpty,
        "factory must not override a submitted master")
    }
  }

  test("without an injected master the factory falls back to local[N]") {
    withMasterProp(None) {
      if (sys.env.get("MASTER").exists(_.trim.nonEmpty)) cancel("MASTER env set")
      assert(Engine.localMasterFallback("8").contains("local[8]"))
    }
  }

  test("a blank spark.master property does not count as injected") {
    withMasterProp(Some("  ")) {
      if (sys.env.get("MASTER").exists(_.trim.nonEmpty)) cancel("MASTER env set")
      assert(Engine.injectedMaster.isEmpty)
      assert(Engine.localMasterFallback("4").contains("local[4]"))
    }
  }

  test("the shared test session still runs local with engine semantics") {
    val s = SparkTestBase.shared
    assert(s.sparkContext.master.startsWith("local["))
    assert(s.conf.get("spark.sql.session.timeZone") == "UTC")
  }
}
