package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver test tables (TESTDATA.md / FIXTURES.md §1).
  *
  * The reference's data model is named relational tables in a star schema
  * (reference: dags/cloudsql_to_bigquery.py:82-84, README.md:4-6); here a
  * "table" is a parquet directory under the scale-factor dir. Reads go
  * through Spark's vectorized parquet reader so Catalyst column pruning and
  * predicate pushdown reach the scan — at 100 TB this is what keeps a
  * 2-column projection from reading 16 columns.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables small enough to broadcast in joins at any realistic scale
    * (dimension side of the reference's dim/fact model, README.md:4-6).
    * `region`/`nation` are bounded by geography; at 100 TB they are still
    * KB-sized and must never be the build side of a sort-merge join.
    */
  val broadcastable: Set[String] = Set("region", "nation")

  /** Per-session METADATA memo (round-15 verdict item 3): the first load
    * of a table resolves its parquet footprint (directory listing + footer
    * schema inference) into the DataFrame's relation; re-loading the same
    * immutable test table re-paid that driver-side work on EVERY query —
    * ~383 rows × tables × 2 bench passes of pure re-listing/re-inferring.
    * The memo reuses the resolved DataFrame (file index + schema ONLY —
    * every action on it still scans the parquet data from disk; no rows,
    * no results, no computed state are cached). Keyed weakly by session so
    * stopped test sessions unpin their entries.
    */
  private val dfMemo = new java.util.WeakHashMap[SparkSession,
    scala.collection.mutable.HashMap[String, DataFrame]]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.functions.GraftFunctions.ensure(spark) // idempotent; any session works
    dfMemo.synchronized {
      var per = dfMemo.get(spark)
      if (per == null) {
        per = new scala.collection.mutable.HashMap[String, DataFrame]()
        dfMemo.put(spark, per)
      }
      per.getOrElseUpdate(s"$dir/$name.parquet", loadUncached(spark, dir, name))
    }
  }

  private def loadUncached(spark: SparkSession, dir: String,
                           name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    // `events.ts` arrives in whatever physical form the generator wrote:
    //   - TIMESTAMP(NANOS) → LongType ns-since-epoch (via
    //     spark.sql.legacy.parquet.nanosAsLong in [[Engine.session]]);
    //     integer DIV (not double /) keeps µs exact — ns epochs exceed
    //     double's 2^53 mantissa.
    //   - tz-naive TIMESTAMP(MICROS) → TimestampNTZType (Spark's
    //     inferTimestampNTZ default).
    // Both normalize to instant-semantics TimestampType here, so every
    // consumer (windows, watermarks, ts arithmetic) sees ONE type; at the
    // pinned UTC session zone the NTZ→LTZ cast is value-preserving.
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)"))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Registers every test table as a temp view named after the table, so
    * `spark.sql` surface (the reference's verbatim-SQL contract,
    * dags/cloudsql_to_bigquery.py:66,110) works against the same dir.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
