package graft.sources

import graft.SparkTestBase

/** XML-leg invariants: entity escaping round-trips hostile strings
  * byte-for-byte through the built-in XML source.
  */
class XmlIOSpec extends SparkTestBase {

  test("hostile strings round-trip exactly through write.xml -> read.xml") {
    import spark.implicits._
    val rows = Seq(
      (1L, "plain words only"),
      (2L, "angle <brackets> & ampersand"),
      (3L, "quotes \"double\" and 'single'"),
      (4L, "]]> cdata terminator and <&>"),
      (5L, "unicode café ☃ and tab\tchar"))
    val base = java.nio.file.Files.createTempDirectory("graft_xmlspec")
      .toString + "/d"
    rows.toDF("id", "t").write.mode("overwrite").format("xml")
      .option("rootTag", "rs").option("rowTag", "r").save(base)
    val back = spark.read.format("xml")
      .schema("id BIGINT, t STRING").option("rowTag", "r").load(base)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, t) =>
      assert(back(id) == t, s"row $id: '${back(id)}' != '$t'") }
  }
}
