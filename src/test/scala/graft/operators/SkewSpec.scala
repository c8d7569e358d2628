package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkTestBase, Tables}

class SkewSpec extends SparkTestBase {

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val ord = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_orderstatus")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(ord, Seq("l_orderkey"))
    val salted = Skew.saltedJoin(li, ord, "l_orderkey", "l_linenumber", salts = 4)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salting spreads a hot key over multiple salts") {
    // all rows share ONE key — the pathological case; distinct salts > 1
    // proves the hot key is split across reducers.
    val hot = spark.range(1000)
      .select(lit(42L).as("k"), col("id"))
    val salts = hot.withColumn("g_salt",
      pmod(xxhash64(col("id")), lit(8)).cast("int"))
      .select("g_salt").distinct().count()
    assert(salts > 4, s"expected the hot key spread over many salts, got $salts")
  }

  test("AQE splits a skewed join partition at runtime (no manual salting)") {
    // one pathological hot key; thresholds lowered so the tiny test data
    // crosses them — at real scale the defaults (256 MB) play this role.
    // This is the runtime complement to Skew.saltedJoin: AQE re-plans the
    // skewed partition into splits after seeing shuffle statistics.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) =>
      k -> util.Try(spark.conf.get(k)).toOption.flatMap(Option(_))
    }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val hot = spark.range(200000)
        .select((col("id") % 100).as("noise"),
          when(col("id") % 10 === 0, lit(42L)).otherwise(col("id")).as("k"))
      val dim = spark.range(200000).select(col("id").as("k"), (col("id") * 2).as("v"))
      val j = hot.join(dim, "k")
      // materialize THIS dataframe's QueryExecution (count() would build
      // its own), so the adaptive plan below is the final, executed one
      assert(j.collect().nonEmpty)
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("skew=true") || p.contains("skewed"),
        s"AQE must mark the skewed join:\n$p")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join without an exchange (co-located join)") {
    val ord = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
      .sortBy("o_orderkey").saveAsTable("g_orders_b")
    li.write.mode("overwrite").bucketBy(8, "l_orderkey")
      .sortBy("l_orderkey").saveAsTable("g_lineitem_b")
    // disable broadcast so the planner must consider a shuffle join —
    // bucketing then removes BOTH sides' exchanges (co-located SMJ)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val j = spark.table("g_lineitem_b").join(spark.table("g_orders_b"),
        col("l_orderkey") === col("o_orderkey"))
      val p = j.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), s"expected SMJ:\n$p")
      assert(!p.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$p")
      assert(j.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }
}
