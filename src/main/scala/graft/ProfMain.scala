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
        "prep_split", "a18_bucketed_merge", "ml_kmeans", "text_tfidf",
        "text_repetition", "text_contamination", "text_lm_score",
        "prep_pack", "q40_stats_agg", "sim_pq_ann", "dedup_simhash_pairs",
        "dedup_incremental", "text_pmi", "text_hashtf", "mm_audio_frames",
        "mm_scene_detect", "prep_balance", "dq_outliers", "a22_cdc_merge",
        "text_bpe_pairs", "text_bigram_lm", "sim_pq_recall",
        "dedup_paragraph", "sim_twostage")
      for (n <- targets) {
        println(s"\n===== $n =====")
        println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode))
      }
      spark.stop(); return
    }
    if (names.headOption.contains("scalecheck")) {
      // scaling evidence: the same dedup operators on 1x/2x/4x/8x unions
      // of the documents table. Every token is prefixed with the copy
      // index so copies share NO vocabulary: duplicate structure per copy
      // stays identical instead of growing quadratically (n identical
      // copies of a doc would otherwise add n² true near-dup pairs — an
      // output-size artifact, not engine work). Near-linear wall-clock
      // growth is the measured form of "no all-pairs join anywhere".
      import org.apache.spark.sql.functions._
      val base = Tables.load(spark, dir, "documents").select("doc_id", "text")
      for (n <- if (names.length > 1) names.tail.map(_.toInt) else Seq(1, 2, 4, 8)) {
        val corpus = (0 until n).map(k =>
          base.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
            regexp_replace(col("text"), "(^| )", s"$$1c$k").as("text")))
          .reduce(_ unionByName _)
        for ((label, df) <- Seq(
            "exact" -> graft.operators.Dedup.exactKeepMin(corpus, Seq("text"), "doc_id"),
            "simhash" -> graft.operators.Dedup.simhash(corpus, "doc_id", "text"))) {
          df.write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          println(f"scale $label n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
        val t0 = System.nanoTime()
        graft.operators.Dedup.nearDupPairs(corpus, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
        println(f"scale minhash_lsh n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
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
    // construction INSIDE the timed window (iterative queries — CC, sync
    // runs, sketch builds — do real work while the DataFrame is built;
    // timing only the final write under-reports them)
    if (names.headOption.contains("timeq")) {
      for (name <- names.tail; i <- 1 to 2) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        println(f"$name run$i ${(System.nanoTime() - t0) / 1e9}%.2fs")
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
