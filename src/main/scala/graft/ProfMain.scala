package graft
// Scratch profiling main (not part of the driver contract).
object ProfMain {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("prof", "8")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Seq("dedup_ngram_jaccard")
    if (names == Seq("plans")) {
      // dump formatted physical plans of the scale-critical queries
      val targets = Seq("q02_filter_predicates", "q04_star_join",
        "q10_window_topk", "q16_global_topk", "q19_cosine_topk",
        "dedup_minhash_lsh", "dedup_embedding", "dedup_simhash",
        "dedup_fuzzy", "sim_ivf_ann", "sim_ivf_nprobe", "mm_decode",
        "q27_sessionize", "q31_bloom_semi_join", "q32_range_bucket_join",
        "q33_gap_fill", "q37_range_frame", "q38_frame_stats",
        "prep_split", "a18_bucketed_merge", "ml_kmeans", "text_tfidf")
      for (n <- targets) {
        println(s"\n===== $n =====")
        println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode))
      }
      spark.stop(); return
    }
    if (names == Seq("streamdemo")) {
      val tmp = java.nio.file.Files.createTempDirectory("sd").toString
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"),
        java.nio.file.Paths.get(s"$tmp/events.parquet"))
      val out = tmp + "/out"
      graft.streaming.EventsStream.userTotals(spark, tmp, tmp + "/ckpt", out)
        .awaitTermination()
      val got = spark.read.parquet(out)
      println(s"rows=${got.count()} users=${got.select("user_id").distinct().count()}")
      got.orderBy(org.apache.spark.sql.functions.col("user_id")).show(5)
      spark.stop(); return
    }
    if (names == Seq("dotbench")) {
      import org.apache.spark.sql.functions._
      import graft.operators.VectorOps
      val e = Tables.load(spark, dir, "embeddings").select(col("embedding"))
      val pairs = e.crossJoin(e.select(col("embedding").as("p"))).cache()
      pairs.count()
      for ((label, c) <- Seq(
          "native" -> VectorOps.dot(col("p"), col("embedding")),
          "hof" -> VectorOps.dotHof(col("p"), col("embedding"))); i <- 1 to 3) {
        val t0 = System.nanoTime()
        pairs.select(sum(c)).head()
        println(f"$label run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
      spark.stop(); return
    }
    for (name <- names) {
      val df = SparkEntry.queries(name)(spark, dir)
      df.explain("formatted")
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }
    spark.stop()
  }
}
