package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** SCD2 history laws + k-means convergence invariants. */
class Scd2ClusteringSpec extends SparkTestBase {

  import spark.implicits._

  private val ds = "2024-06-01"

  private def existing = Seq(
    // (key, bal, seg, valid_from, valid_to, is_current)
    (1L, 10.0, "A", "2024-01-01", null.asInstanceOf[String], 1),
    (2L, 20.0, "B", "2024-01-01", null.asInstanceOf[String], 1),
    (3L, 30.0, "C", "2024-01-01", null.asInstanceOf[String], 1),
    // closed history row for key 1 — must pass through untouched
    (1L, 5.0, "A", "2023-01-01", "2024-01-01", 0),
  ).toDF("key", "bal", "seg", "valid_from", "valid_to", "is_current")

  private def stage = Seq(
    (1L, 10.0, "A"),  // unchanged
    (2L, 99.0, "B"),  // changed bal
    (4L, 40.0, "D"),  // brand new
  ).toDF("key", "bal", "seg")

  test("scd2: unchanged passes, changed closes+opens, new opens, absent kept") {
    val out = Merge.scd2(existing, stage, "key", Seq("bal", "seg"), ds)
      .collect().map(r => (r.getLong(0), r.getString(3), r.getInt(5)) -> r).toMap
    assert(out.size == 6) // 4 existing + 1 new version + 1 new key

    // closed history row untouched
    assert(out(((1L, "2023-01-01", 0))).getString(4) == "2024-01-01")
    // unchanged key 1: still current, original window
    assert(out(((1L, "2024-01-01", 1))).getString(4) == null)
    // changed key 2: old version closed at ds...
    assert(out(((2L, "2024-01-01", 0))).getString(4) == ds)
    // ...and the new version open from ds with the stage value
    val v2 = out(((2L, ds, 1)))
    assert(v2.getDouble(1) == 99.0 && v2.getString(4) == null)
    // existing-only key 3: kept current (no delete)
    assert(out(((3L, "2024-01-01", 1))).getString(4) == null)
    // new key 4: opened at ds
    assert(out(((4L, ds, 1))).getDouble(1) == 40.0)
  }

  test("scd2: exactly one current row per key") {
    val out = Merge.scd2(existing, stage, "key", Seq("bal", "seg"), ds)
    val dupCurrent = out.filter(col("is_current") === 1)
      .groupBy("key").count().filter(col("count") > 1)
    assert(dupCurrent.isEmpty)
  }

  test("kmeans: assignment is total, k clusters at most, iterations reduce " +
       "or preserve mean within-cluster similarity loss") {
    val e = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val n = e.count()
    val a1 = Clustering.kmeansAssign(e, "vec_id", "emb", 4, 1)
    val a2 = Clustering.kmeansAssign(e, "vec_id", "emb", 4, 2)
    assert(a1.count() == n && a2.count() == n, "every vector assigned")
    assert(a2.select("cid").distinct().count() <= 4)
    def meanCos(assigned: org.apache.spark.sql.DataFrame): Double =
      Clustering.kmeansSummary(e, "vec_id", "emb", 4,
        if (assigned eq a1) 1 else 2)
        .agg(avg("avg_cos")).head().getDouble(0)
    // Lloyd iterations cannot decrease mean similarity to the centroid
    // (up to the 1e-6 centroid rounding)
    assert(meanCos(a2) >= meanCos(a1) - 1e-4)
  }
}
