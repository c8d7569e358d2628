package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class MergeSpec extends SparkTestBase {

  private lazy val orders = Tables.load(spark, sfDir, "orders")
    .select("o_orderkey", "o_orderstatus", "o_totalprice")
  private lazy val existing = orders.filter(col("o_orderkey") % 2 === 0)
    .withColumn("o_totalprice", col("o_totalprice") + 1000)
  private lazy val stage = orders.filter(col("o_orderkey") % 3 === 0)

  test("upsert: keys = union, no duplicates, stage wins") {
    val merged = Merge.upsert(existing, stage, Seq("o_orderkey")).cache()
    val eKeys = existing.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val sKeys = stage.select("o_orderkey").collect().map(_.getLong(0)).toSet
    val mKeys = merged.select("o_orderkey").collect().map(_.getLong(0))
    assert(mKeys.toSet == (eKeys ++ sKeys), "keys must be the union")
    assert(mKeys.length == mKeys.toSet.size, "no duplicate keys")
    // conflict rows (in both) must carry stage's (un-perturbed) price
    val conflicts = merged.join(stage.select(col("o_orderkey"),
        col("o_totalprice").as("sp")), "o_orderkey")
    assert(conflicts.filter(col("o_totalprice") =!= col("sp")).count() == 0,
      "stage wins on conflict")
    // existing-only rows keep the perturbed price
    val eOnly = merged.filter(col("o_orderkey") % 2 === 0 && col("o_orderkey") % 3 =!= 0)
    val eVals = existing.select(col("o_orderkey"), col("o_totalprice").as("ep"))
    assert(eOnly.join(eVals, "o_orderkey")
      .filter(col("o_totalprice") =!= col("ep")).count() == 0)
    merged.unpersist()
  }

  test("antiUnion equals upsert on key-unique inputs") {
    val a = Merge.antiUnion(existing, stage, Seq("o_orderkey"))
    val b = Merge.upsert(existing, stage, Seq("o_orderkey"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("upsert rejects mismatched schemas and empty keys") {
    intercept[IllegalArgumentException] {
      Merge.upsert(existing.drop("o_orderstatus"), stage, Seq("o_orderkey"))
    }
    intercept[IllegalArgumentException] {
      Merge.upsert(existing, stage, Nil)
    }
  }

  test("merge with empty stage is identity; empty existing returns stage") {
    val empty = stage.limit(0)
    assert(Merge.upsert(existing, empty, Seq("o_orderkey")).count() == existing.count())
    assert(Merge.upsert(empty, stage, Seq("o_orderkey")).count() == stage.count())
  }

  test("upsertEvolve absorbs schema drift: new column, typed nulls for old rows") {
    import org.apache.spark.sql.functions._
    val widened = stage.withColumn("pri", lit("HIGH"))
    val out = Merge.upsertEvolve(existing, widened, Seq("o_orderkey"))
    assert(out.columns.toSeq ==
      existing.columns.toSeq :+ "pri", "union schema, additions appended")
    // keys only in existing carry NULL pri; keys in stage carry the value
    val eOnly = out.join(widened.select("o_orderkey"), Seq("o_orderkey"), "left_anti")
    assert(eOnly.filter(col("pri").isNotNull).count() == 0)
    assert(out.join(widened.select("o_orderkey"), Seq("o_orderkey"), "left_semi")
      .filter(col("pri") =!= "HIGH").count() == 0)
    // DROPPED column on the stage side also survives (existing's value kept)
    val narrowed = stage.drop("o_orderstatus")
    val out2 = Merge.upsertEvolve(existing, narrowed, Seq("o_orderkey"))
    assert(out2.columns.toSeq == existing.columns.toSeq)
    assert(out2.count() ==
      Merge.upsert(existing, stage, Seq("o_orderkey")).count())
  }

  test("cdcApply: updates win, tombstones delete, absent-key deletes are " +
      "idempotent no-ops") {
    import spark.implicits._
    val existing = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq(
      (2L, "B", "U"),  // update
      (3L, "x", "D"),  // delete matched
      (4L, "d", "I"),  // insert new
      (5L, "x", "D")   // tombstone for a key that never existed
    ).toDF("k", "v", "op")
    val got = Merge.cdcApply(existing, changes, Seq("k"), "op")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "a", 2L -> "B", 4L -> "d"))
  }

  test("cdcApply: an update that sets a column to NULL lands as NULL " +
      "(no coalesce resurrection)") {
    import spark.implicits._
    val existing = Seq((1L, Some("a")), (2L, Some("b"))).toDF("k", "v")
    val changes = Seq((2L, None: Option[String], "U")).toDF("k", "v", "op")
    val got = Merge.cdcApply(existing, changes, Seq("k"), "op")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got == Map(1L -> Some("a"), 2L -> None),
      "NULL-bearing update must not resurrect the existing value")
  }

  test("mergeAll: all five ANSI branches fire; delete precedes update " +
      "on matched rows; schema mismatch refuses") {
    import spark.implicits._
    val e = Seq((1L, 3L, 10.0), (2L, 3L, 20.0), (3L, 5L, 30.0),
      (4L, 5L, -1.0)).toDF("k", "nat", "bal")
    val s4 = Seq((2L, 5L, 99.0),   // matched, bal >= 0 -> UPDATE
      (4L, 5L, -50.0),             // matched, bal < 0  -> DELETE
      (9L, 7L, 7.0))               // unmatched          -> INSERT
      .toDF("k", "nat", "bal")
    // not matched by source: k=1 (nat 3 -> DELETE), k=3 (nat 5 -> KEEP)
    val got = Merge.mergeAll(e, s4, Seq("k"),
        updateWhen = "s.bal >= 0", deleteWhen = "s.bal < 0",
        deleteUnmatchedWhen = "e.nat = 3")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getString(3))).toMap
    assert(got == Map(
      2L -> ((5L, 99.0, "U")),
      3L -> ((5L, 30.0, "K")),
      9L -> ((7L, 7.0, "I"))))
    // ANSI clause order: when BOTH delete and update conditions hold,
    // the delete clause (evaluated first) wins
    val both = Merge.mergeAll(e, s4, Seq("k"),
      updateWhen = "true", deleteWhen = "s.bal < 0",
      deleteUnmatchedWhen = "false")
    assert(!both.collect().map(_.getLong(0)).contains(4L),
      "delete clause must precede update")
    intercept[IllegalArgumentException] {
      Merge.mergeAll(e, s4.select("k", "bal", "nat"), Seq("k"),
        "true", "false", "false")
    }
  }
}
