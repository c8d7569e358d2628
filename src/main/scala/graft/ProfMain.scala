package graft
// Scratch profiling main (not part of the driver contract).
object ProfMain {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("prof",
      sys.env.getOrElse("SPARK_GRAFT_PROF_CPUS", "8"))
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Seq("dedup_ngram_jaccard")
    if (names == Seq("plans")) {
      // dump formatted physical plans of the ENTIRE registry (round-7
      // verdict item 8: the 0-cartesian/0-UDF audit should be total, not
      // sampled). Construction side effects (fixture Derby catalogs,
      // pipeline sync runs, driver collects) execute like they do under
      // Verify; a query whose construction fails still leaves a marker
      // line instead of killing the dump.
      //
      // The dump is also a mechanical PLAN GATE (round-14 verdict item
      // 5): 0 CartesianProduct, 0 ScalaUDF, and every
      // BroadcastNestedLoopJoin BUILD side must statically trace to a
      // bounded frame — a global (empty-grouping) aggregate's 1 row, an
      // explicit limit, a driver-built LocalTableScan literal, or the
      // raise_error count-guard (guardProbes: ≤ maxProbes rows or the
      // query FAILS — runtime-bounded by construction), composed
      // through row-preserving/reducing operators (project / filter /
      // sort / exchange / window / grouped agg over a bounded input;
      // a join of two bounded inputs is bounded by their product). A
      // build side whose lineage reaches a data-sized leaf with none of
      // these on the path is a data-sized broadcast — the exact
      // anti-pattern the prose audits adjudicated by hand until now.
      // Violations print PLAN-GATE-FAIL lines and exit 2.
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec, LocalLimitExec, LocalTableScanExec}
      import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
      import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
      import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.catalyst.expressions.{RaiseError, ScalaUDF}
      import org.apache.spark.sql.catalyst.optimizer.BuildLeft

      def boundedBuild(p: SparkPlan): Boolean = p match {
        case a: BaseAggregateExec =>
          a.groupingExpressions.isEmpty || a.children.forall(boundedBuild)
        case _: GlobalLimitExec | _: LocalLimitExec | _: CollectLimitExec =>
          true
        case _: LocalTableScanExec => true
        case r: ReusedExchangeExec => boundedBuild(r.child)
        case f: org.apache.spark.sql.execution.FilterExec
            if f.condition.exists(_.isInstanceOf[RaiseError]) => true
        case leaf if leaf.children.isEmpty => false
        case other => other.children.forall(boundedBuild)
      }
      def physical(df: org.apache.spark.sql.DataFrame): SparkPlan =
        df.queryExecution.executedPlan match {
          case a: AdaptiveSparkPlanExec => a.inputPlan
          case p => p
        }

      var nBnlj = 0
      var nBnljUnbounded = 0
      var nCartesian = 0
      var nUdf = 0
      val gateFails = scala.collection.mutable.ListBuffer.empty[String]
      val targets = SparkEntry.queries.keys.toSeq.sorted
      for (n <- targets) {
        println(s"\n===== $n =====")
        try {
          val df = SparkEntry.queries(n)(spark, dir)
          println(df.queryExecution
            .explainString(org.apache.spark.sql.execution.SimpleMode))
          physical(df).foreach {
            case j: BroadcastNestedLoopJoinExec =>
              nBnlj += 1
              val build =
                if (j.buildSide == BuildLeft) j.left else j.right
              if (!boundedBuild(build)) {
                nBnljUnbounded += 1
                gateFails += s"PLAN-GATE-FAIL: $n has a " +
                  "BroadcastNestedLoopJoin whose build side does not " +
                  "trace to a bounded frame:\n" + build.treeString
              }
            case c: CartesianProductExec =>
              nCartesian += 1
              gateFails += s"PLAN-GATE-FAIL: $n has a CartesianProduct"
            case p =>
              if (p.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF]))) {
                nUdf += 1
                gateFails += s"PLAN-GATE-FAIL: $n has a ScalaUDF in " +
                  s"${p.nodeName}"
              }
          }
        } catch {
          case e: Throwable =>
            println(s"PLAN-DUMP-ERROR: ${e.getClass.getName}: " +
              s"${Option(e.getMessage).getOrElse("").take(200)}")
        }
      }
      println(s"\nPLAN-GATE: bnlj=$nBnlj bnlj_unbounded=$nBnljUnbounded " +
        s"cartesian=$nCartesian scala_udf=$nUdf")
      gateFails.foreach(println)
      spark.stop()
      if (gateFails.nonEmpty) sys.exit(2)
      return
    }
    if (names == Seq("plans_legacy")) {
      // the historical hand-curated scale-critical subset
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
        "dedup_paragraph", "sim_twostage", "sim_ivfpq_ann",
        "dedup_semantic", "dedup_normalized", "text_pii", "prep_mix",
        "dedup_containment", "dq_drift", "sim_mips_topk", "dedup_soft",
        "prep_interleave", "dedup_incremental_lsh", "prep_weighted_sample",
        "sim_range_search", "q22b_approx_percentiles", "dedup_approx_hll",
        "prep_curriculum", "mm_binary_dedup", "q41_interval_overlap",
        "graph_pagerank", "text_heavy_hitters", "q42_zorder",
        "graph_triangles", "q43_funnel",
        "dedup_span", "dedup_linkage", "text_bm25", "prep_kfold",
        "q44_retention", "q45_histogram", "prep_shuffle",
        "graph_labelprop", "mm_phash_neardup", "ml_linreg",
        "sim_maxsim", "sim_hybrid_rrf", "a28_jsonl_roundtrip",
        "asof_tolerance", "text_winnowing", "text_bpe_apply",
        "graph_bfs", "q46_rolling_distinct", "dq_freshness",
        "ml_naive_bayes", "a29_corrupt_records", "mm_cdc_chunking", "dq_mad",
        // round-7 additions
        "a30_incremental_dedup_sync", "sim_scalar_quant", "text_cms_probe",
        "mm_resize", "sim_sq_recall", "mm_bmp_decode", "mm_incremental_phash",
        "ml_pca_power", "prep_token_budget", "dq_ewma", "q47_map_functions",
        "text_kneser_ney", "dedup_linkage_entities")
      for (n <- targets) {
        println(s"\n===== $n =====")
        println(SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
          org.apache.spark.sql.execution.SimpleMode))
      }
      spark.stop(); return
    }
    if (names.headOption.contains("r8scale")) {
      // Scaling evidence for the round-8 operator family on 1x..8x
      // vocab-disjoint corpus unions (the newscale construction: copies
      // share no vocabulary, so per-copy structure stays constant and
      // wall-clock growth measures ENGINE work). bpe_train's vocabulary
      // grows ~n-fold, kneser_ney3's trigram model likewise — both
      // should stay near-linear because every pass is a map-side
      // aggregate + (now hint-free) key join; leakage_split's group
      // frame and png decode's payload count scale exactly n-fold.
      import org.apache.spark.sql.functions._
      val base = Tables.load(spark, dir, "documents").select("doc_id", "text")
      for (n <- if (names.length > 1) names.tail.map(_.toInt) else Seq(1, 2, 4, 8)) {
        val corpus = (0 until n).map(k =>
          base.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
            regexp_replace(col("text"), "(^| )", s"$$1c$k").as("text")))
          .reduce(_ unionByName _).localCheckpoint(true)
        val ids = corpus.select("doc_id")
        for ((label, mk) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
            "bpe_train" -> (() => {
              val m = graft.operators.TextAnalysis
                .bpeTrain(corpus, "doc_id", "text", rounds = 6)
              spark.createDataFrame(m).toDF("round", "merge", "weight")
            }),
            "kneser_ney3" -> (() => graft.operators.TextAnalysis
              .kneserNeyTrigram(corpus, "doc_id", "text")),
            "leakage_split" -> (() => graft.operators.Prep
              .leakageSafeSplit(corpus, "doc_id", "text")),
            "png_decode" -> (() => {
              import spark.implicits._
              graft.operators.Multimodal.decodePixels(
                graft.operators.Multimodal.pngMedia(ids, "doc_id", "doc_id")
                  .select(col("doc_id"), col("data"),
                    col("meta.mime").as("mime"),
                    col("meta.n_bytes").as("n_bytes"))
                  .as[graft.operators.Multimodal.MediaRow]).toDF()
            }),
            "bpe_encode" -> (() => graft.operators.TextAnalysis
              .bpeEncodeStats(corpus, "doc_id", "text",
                Seq("e r", "i n", "o w", "s t", "a t", "a l", "t er"))))) {
          mk().write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          println(f"r8scale $label n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
      }
      spark.stop(); return
    }
    if (names.headOption.contains("r15newscale")) {
      // Scaling evidence for the round-15 additions on 1x..8x id-shifted
      // unions of the sf inputs. Claims under check: (a) BQ ANN cost is
      // corpus-linear with the tiny per-row popcount slope (codes, not
      // floats, stream through the candidate stage; rerank is fixed at
      // cand per probe); (b) conformal is one aggregate + a grouped
      // rank + one aggregate — near-flat wall-clock; (c) a deletion
      // batch costs O(deleted), so its time must stay FAR below the
      // O(table) base publish at every n and track the deleted count,
      // not the table; (d) the streaming session drain is per-row flat
      // with user-disjoint state growth.
      import org.apache.spark.sql.functions._
      for (n <- if (names.length > 1) names.tail.map(_.toInt)
                else Seq(1, 2, 4, 8)) {
        locally { // (a) sim_bq
          val e = Tables.load(spark, dir, "embeddings")
          val corpus = (0 until n).map(k =>
            e.filter(col("vec_id") >= 10).select(
              (col("vec_id") + lit(k * 1000000L)).as("vec_id"),
              col("embedding")))
            .reduce(_ unionByName _).localCheckpoint(true)
          val probes = e.filter(col("vec_id") < 10)
          val mk = () => graft.operators.Similarity.bqTopK(
            corpus, probes, "vec_id", "embedding", k = 3)
          mk().write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          println(f"r15newscale bq n=$n corpus=${corpus.count()} " +
            f"${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
        locally { // (b) ml_conformal
          val li = Tables.load(spark, dir, "lineitem")
          val base = (0 until n).map(k => li.select(
              col("l_returnflag"),
              col("l_quantity").cast("long").as("x1"),
              round(col("l_discount") * 100).cast("long").as("x2"),
              round(col("l_extendedprice")).cast("long").as("y"),
              (graft.operators.Hashing.md5Long(concat_ws("-",
                col("l_orderkey") + lit(k * 100000000L),
                col("l_linenumber"))) % 10).as("fold")))
            .reduce(_ unionByName _).localCheckpoint(true)
          val mk = () => graft.operators.Regression.conformalCore(base)
          mk().write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          println(f"r15newscale conformal n=$n " +
            f"${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
        locally { // (c) a68 deletion vectors
          val o = Tables.load(spark, dir, "orders")
          val big = (0 until n).map(k => o.withColumn("o_orderkey",
              col("o_orderkey") + lit(k * 100000000L)))
            .reduce(_ unionByName _).localCheckpoint(true)
          val path = graft.util.Scratch.dir("graft_dvscale").toString
          val tp0 = System.nanoTime()
          graft.pipeline.DeletionVectors.publishBase(big, path)
          val tPub = (System.nanoTime() - tp0) / 1e9
          val td0 = System.nanoTime()
          graft.pipeline.DeletionVectors.addDeletes(spark, path,
            big.filter(col("o_orderkey") % 97 === 0), "o_orderkey")
          val tDel = (System.nanoTime() - td0) / 1e9
          val tr0 = System.nanoTime()
          val cnt = graft.pipeline.DeletionVectors
            .readMor(spark, path, "o_orderkey").count()
          val tMor = (System.nanoTime() - tr0) / 1e9
          println(f"r15newscale dv n=$n rows=${big.count()} mor=$cnt " +
            f"publish=$tPub%.2fs delete_batch=$tDel%.2fs mor_read=$tMor%.2fs")
        }
        locally { // (d) stream_session drain
          val ev = Tables.load(spark, dir, "events")
          val big = (0 until n).map(k => ev.select(
              (col("event_id") + lit(k * 1000000000L)).as("event_id"),
              col("ts"),
              (col("user_id") + lit(k * 1000000L)).as("user_id"),
              col("event_type"), col("value"), col("props")))
            .reduce(_ unionByName _)
          val work = graft.util.Scratch.dir("graft_sessscale").toString
          val ranged = big.withColumn("qr", ntile(4).over(
            org.apache.spark.sql.expressions.Window
              .orderBy("ts", "event_id")))
          val f = new org.apache.hadoop.fs.Path(work)
            .getFileSystem(spark.sparkContext.hadoopConfiguration)
          f.mkdirs(new org.apache.hadoop.fs.Path(s"$work/src"))
          for (r <- 1 to 4) {
            ranged.filter(col("qr") === r).drop("qr")
              .coalesce(1).write.mode("overwrite").parquet(s"$work/stage")
            val part = f.globStatus(
              new org.apache.hadoop.fs.Path(s"$work/stage/part-*"))(0).getPath
            f.rename(part,
              new org.apache.hadoop.fs.Path(f"$work/src/part-$r%02d.parquet"))
          }
          val t0 = System.nanoTime()
          graft.streaming.EventsStream.sessionPublish(
            spark, s"$work/src", s"$work/ck", s"$work/final")
            .awaitTermination()
          val rows = spark.read.parquet(s"$work/final").count()
          println(f"r15newscale session n=$n sessions=$rows " +
            f"drain=${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
      }
      spark.stop(); return
    }
    if (names.headOption.contains("r15scale")) {
      // Lakehouse time-travel scalecheck (round-14 verdict item 8): one
      // root per history depth 8/16/32/64, `depth` sequential publishes
      // (retain = all, the time-travel configuration), then timed reads
      // of (a) a mid-history version, (b) the live pointer, (c) an
      // as-of-date resolve, plus one more publish. The DATA is constant
      // (a 5-row nation aggregate) so wall-clock isolates the METADATA
      // cost: the claim to check is that per-read cost stays flat /
      // milliseconds-scale as the live version count grows 8× — history
      // resolution is one directory listing + small-file reads, never a
      // scan of the snapshots themselves.
      import org.apache.spark.sql.functions._
      import graft.pipeline.Sync
      val nation = Tables.load(spark, dir, "nation")
      def agg(k: Int) = nation.groupBy("n_regionkey")
        .agg(count(lit(1)).as("n")).withColumn("v", lit(k.toLong))
      for (depth <- Seq(8, 16, 32, 64)) {
        val root = graft.util.Scratch.dir("graft_r15scale").toString + "/ds"
        val tPub0 = System.nanoTime()
        for (v <- 1 to depth)
          Sync.publishAtomicAll(Seq("t" -> agg(v)), root,
            retain = depth + 2, publishedAt = Some(v * 1000L))
        val pubAvg = (System.nanoTime() - tPub0) / 1e9 / depth
        def timed(f: => Unit): Double = {
          f // warm (plan + listing caches, JIT)
          val t0 = System.nanoTime()
          f
          (System.nanoTime() - t0) / 1e9
        }
        val mid = (depth / 2).toLong
        val tTravel = timed(
          Sync.readAtomicTableAt(spark, root, "t", mid).get
            .write.format("noop").mode("overwrite").save())
        val tLive = timed(
          Sync.readAtomicTable(spark, root, "t").get
            .write.format("noop").mode("overwrite").save())
        val tAsOf = timed(
          Sync.readAtomicTableAsOf(spark, root, "t", mid * 1000L).get
            .write.format("noop").mode("overwrite").save())
        val tNext = timed(
          Sync.publishAtomicAll(Seq("t" -> agg(depth + 7)), root,
            retain = depth + 2, publishedAt = Some((depth + 7) * 1000L)))
        println(f"r15scale depth=$depth pub_avg=$pubAvg%.3fs " +
          f"timetravel=$tTravel%.3fs live=$tLive%.3fs asof=$tAsOf%.3fs " +
          f"next_pub=$tNext%.3fs")
      }
      spark.stop(); return
    }
    if (names.headOption.contains("r14scale")) {
      // Scaling evidence for the round-14 text tier on 1x..8x id-shifted
      // corpora with per-copy token prefixes (the round-4 dedup
      // scalecheck rule: disjoint vocabularies, so true vocabulary work
      // grows with n instead of collapsing onto one copy). Byte-BPE
      // training is vocabulary-sized per bounded round; the UTF-8
      // validator is a row-local fold behind the ASCII fast path; the
      // quality filter is one feature scan + the rounds-bounded
      // integer-gradient trainer. Wall-clock should track n
      // near-linearly with flat per-row marginal cost.
      import org.apache.spark.sql.functions._
      val base = Tables.load(spark, dir, "documents")
        .select("doc_id", "text", "source", "lang")
      for (n <- if (names.length > 1) names.tail.map(_.toInt)
                else Seq(1, 2, 4, 8)) {
        val corpus = (0 until n).map(k =>
          base.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
            regexp_replace(col("text"), "(^| )", "$1c" + k).as("text"),
            col("source"), col("lang")))
          .reduce(_ unionByName _).localCheckpoint(true)
        locally {
          val t0 = System.nanoTime()
          val m = graft.operators.TextAnalysis.bpeTrainBytes(
            corpus.select("text"), "text", rounds = 4)
          println(f"r14scale bpe_bytes n=$n ${m.length} merges " +
            f"${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
        locally {
          val hx = corpus.select(col("doc_id"),
            hex(encode(col("text"), "UTF-8")).as("hx"))
          val mk = () => graft.operators.TextAnalysis
            .utf8Stats(hx, "doc_id", "hx")
          mk().write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          println(f"r14scale utf8 n=$n " +
            f"${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
        locally {
          val words = split(col("text"), " ")
          val nW = size(words).cast("double")
          val stop = Seq("the", "of", "and", "to", "a", "in", "is", "it",
            "for", "on")
          val feats = corpus.select(col("doc_id"),
            (((length(col("text")) - size(words) + 1) / nW - 4.5) / 0.8)
              .as("x1"),
            ((size(filter(words, w => w.isin(stop: _*))) / nW - 0.06)
              / 0.16).as("x2"))
            .withColumn("y", (col("x1") + lit(2.0) * col("x2") +
              (pmod(graft.operators.Hashing.md5Long(
                col("doc_id").cast("string")), lit(1000))
                / 1000.0 - 0.5) > 0.0).cast("long"))
          val t0 = System.nanoTime()
          graft.operators.LogReg.train(feats, "doc_id", "y", "x1", "x2",
              xScale = 1000, iters = 10, lr = 4.0)
            .write.format("noop").mode("overwrite").save()
          println(f"r14scale quality_filter n=$n " +
            f"${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
      }
      spark.stop(); return
    }
    if (names.headOption.contains("r10scale")) {
      // Scaling evidence for the round-10 codecs + bus on 1x..8x
      // id-shifted corpora: every stage is row-local (fixture map,
      // partition-wise decode) or offset-partitioned (bus), so
      // wall-clock should track n near-linearly with flat per-row cost.
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val base = Tables.load(spark, dir, "documents").select("doc_id")
      for (n <- if (names.length > 1) names.tail.map(_.toInt) else Seq(1, 2, 4, 8)) {
        val ids = (0 until n).map(k =>
          base.select((col("doc_id") + lit(k * 1000000L)).as("doc_id")))
          .reduce(_ unionByName _).localCheckpoint(true)
        def media(df: org.apache.spark.sql.DataFrame) = df
          .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
            col("meta.n_bytes").as("n_bytes"))
          .as[graft.operators.Multimodal.MediaRow]
        for ((label, mk) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
            "jpeg_color_decode" -> (() => graft.operators.Multimodal
              .decodePixels(media(graft.operators.Jpeg
                .jpegMedia(ids, "doc_id", "doc_id", color = true))).toDF()),
            "wav_decode" -> (() => graft.operators.Wav
              .wavStats(media(graft.operators.Wav
                .wavMedia(ids, "doc_id", "doc_id"))).toDF()))) {
          mk().write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          println(f"r10scale $label n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
        // bus: distributed produce of the n-fold id set + full drain
        locally {
          val server = new graft.sources.bus.BusServer(4)
          val port = server.start()
          try {
            val t0 = System.nanoTime()
            ids.as[Long].foreachPartition { (it: Iterator[Long]) =>
              val cl = new graft.sources.bus.BusClient("127.0.0.1", port)
              try it.foreach(id => cl.append((id % 4).toInt, id, s"$id", "x"))
              finally cl.close()
            }
            val ck = java.nio.file.Files
              .createTempDirectory("r10scale_bus").toString
            spark.readStream.format("graft.sources.bus.BusSourceProvider")
              .option("host", "127.0.0.1").option("port", port.toString)
              .load()
              .writeStream
              .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
              .option("checkpointLocation", ck)
              .format("noop").start().awaitTermination()
            println(f"r10scale bus_roundtrip n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
          } finally server.close()
        }
      }
      spark.stop(); return
    }
    if (names.headOption.contains("r10cscale")) {
      // Scaling evidence for the round-10 CONTINUATION operators on
      // 1x..8x grown inputs: gif decode is row-local (must be flat per
      // row), neighborhood jaccard is cap-bounded (must track |E|, not
      // hub-degree^2 — the armed-cap claim measured), boosted stumps
      // re-aggregate the grown fact per round (must track rows).
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val docs0 = Tables.load(spark, dir, "documents").select("doc_id")
      val part0 = Tables.load(spark, dir, "part")
        .select("p_partkey", "p_brand", "p_type", "p_size")
      val li0 = Tables.load(spark, dir, "lineitem")
        .select(col("l_quantity").cast("long").as("q1"),
          floor(col("l_discount") * 100 + 0.5).cast("long").as("q2"),
          floor(col("l_extendedprice") + 0.5).cast("long").as("t"))
      for (n <- if (names.length > 1) names.tail.map(_.toInt) else Seq(1, 2, 4, 8)) {
        val ids = (0 until n).map(k =>
          docs0.select((col("doc_id") + lit(k * 1000000L)).as("doc_id")))
          .reduce(_ unionByName _).localCheckpoint(true)
        def media(df: org.apache.spark.sql.DataFrame) = df
          .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
            col("meta.n_bytes").as("n_bytes"))
          .as[graft.operators.Multimodal.MediaRow]
        locally {
          val mk = () => graft.operators.Multimodal
            .decodePixels(media(graft.operators.Gif
              .gifMedia(ids, "doc_id", "doc_id"))).toDF()
          mk().write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          println(f"r10cscale gif_decode n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
        // disjoint id-shifted copies of the part table: |V|,|E| grow n-fold,
        // group sizes (and so the capped fan-out per neighbor) stay fixed
        locally {
          val parts = (0 until n).map(k => part0.select(
              (col("p_partkey") + lit(k * 10000000L)).as("p_partkey"),
              concat(col("p_brand"), lit(s"#$k")).as("p_brand"),
              concat(col("p_type"), lit(s"#$k")).as("p_type"),
              col("p_size")))
            .reduce(_ unionByName _).localCheckpoint(true)
          parts.createOrReplaceTempView("g_part_scaled")
          def edges = {
            val p = parts
            def stars(cs: String*) = {
              val w = org.apache.spark.sql.expressions.Window
                .partitionBy(cs.map(col): _*)
              p.select(col("p_partkey").cast("long").as("p"),
                  min(col("p_partkey").cast("long")).over(w).as("hub"))
                .filter(col("p") =!= col("hub"))
            }
            val st = stars("p_brand", "p_size").unionByName(stars("p_type"))
            st.select(col("p").as("src"), col("hub").as("dst"))
              .unionByName(st.select(col("hub").as("src"), col("p").as("dst")))
          }
          val mk = () => graft.operators.Graph.neighborJaccard(edges)
          mk().write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          println(f"r10cscale jaccard n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
        locally {
          val li = (0 until n).map(_ => li0).reduce(_ unionByName _)
            .localCheckpoint(true)
          val mk = () => {
            var cur = li
            var out = List.empty[org.apache.spark.sql.DataFrame]
            for (k <- graft.operators.Regression.boostedFeats.indices) {
              val (_, fcol) = graft.operators.Regression.boostedFeats(k)
              val best = graft.operators.Regression.stumpSplits(cur, fcol, "t")
                .orderBy(col("sse"), col("q")).limit(1).localCheckpoint(true)
              val mult = if (k == 0) 10 else 1
              cur = cur.crossJoin(broadcast(best.select(col("q").as("bq"),
                  col("ml").as("bml"), col("mr").as("bmr"))))
                .withColumn("t", floor((col("t").cast("double") -
                  when(col(fcol) <= col("bq"), col("bml"))
                    .otherwise(col("bmr"))) * mult + 0.5).cast("long"))
                .select("q1", "q2", "t").localCheckpoint(true)
              out ::= best
            }
            out.reduce(_ unionByName _)
          }
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          println(f"r10cscale boosted n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
      }
      spark.stop(); return
    }
    if (names.headOption.contains("r10dscale")) {
      // Scaling evidence for the round-10 SESSION-3 operators on 1x..8x
      // grown inputs: tiff decode is row-local (flat per row), wcc's
      // doubling rounds must track |E| (component count grows, diameter
      // fixed, so the round budget is constant), knn must track the
      // corpus linearly (probes fixed), rake must track corpus tokens
      // (vocabulary fixed, so the stats frames stay bounded).
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val docs0 = Tables.load(spark, dir, "documents")
        .select("doc_id", "text")
      val keys0 = Tables.load(spark, dir, "part")
        .select(col("p_partkey").cast("long").as("k"))
      for (n <- if (names.length > 1) names.tail.map(_.toInt) else Seq(1, 2, 4, 8)) {
        val docs = (0 until n).map(j => docs0.select(
            (col("doc_id") + lit(j * 1000000L)).as("doc_id"), col("text")))
          .reduce(_ unionByName _).localCheckpoint(true)
        locally { // row-local decode: flat per row
          val mk = () => graft.operators.Multimodal.decodePixels(
            graft.operators.Tiff.tiffMedia(docs, "doc_id", "doc_id")
              .select(col("doc_id"), col("data"),
                col("meta.mime").as("mime"),
                col("meta.n_bytes").as("n_bytes"))
              .as[graft.operators.Multimodal.MediaRow]).toDF()
          mk().write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          println(f"r10dscale tiff_decode n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
        locally { // |V|,|E| grow n-fold, diameter fixed: cost ~ |E| per round
          val keys = (0 until n).map(j =>
              keys0.select((col("k") + lit(j * 10000000L)).as("k")))
            .reduce(_ unionByName _).localCheckpoint(true)
          val e = keys.withColumn("nxt", col("k") + 1)
            .filter(col("k") % 97 =!= 0)
            .join(keys.select(col("k").as("nxt")), Seq("nxt"), "left_semi")
            .select(col("k").as("src"), col("nxt").as("dst"))
          val mk = () => graft.operators.Graph.wcc(e, rounds = 8)
            .groupBy("p").agg(count(lit(1)).as("n"))
          mk().write.format("noop").mode("overwrite").save()
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          println(f"r10dscale wcc n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
        locally { // corpus tokens grow n-fold, vocab fixed
          val mk = () => graft.operators.TextAnalysis.rakeTopK(
            docs, "doc_id", "text",
            graft.operators.LlmQueries.RakeStop)
          mk().write.format("noop").mode("overwrite").save()
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          println(f"r10dscale rake n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
      }
      spark.stop(); return
    }
    if (names.headOption.contains("newscale")) {
      // Scaling evidence for the round-6-continuation operator family:
      // winnowing fingerprints, CDC chunking, blockwise phash signatures,
      // BPE apply, and the shuffle-order prefix sum on 1x/2x/4x/8x
      // vocab-disjoint corpus unions (same construction as the dedup
      // scalecheck — copies share no vocabulary, so per-copy structure
      // stays constant and wall-clock growth measures ENGINE work).
      // Near-linear growth is the measured form of "row-local + one
      // bounded shuffle" for every operator here.
      import org.apache.spark.sql.functions._
      val base = Tables.load(spark, dir, "documents").select("doc_id", "text")
      for (n <- if (names.length > 1) names.tail.map(_.toInt) else Seq(1, 2, 4, 8)) {
        val corpus = (0 until n).map(k =>
          base.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
            regexp_replace(col("text"), "(^| )", s"$$1c$k").as("text")))
          .reduce(_ unionByName _)
        val media = graft.operators.Multimodal.attachBinary(corpus, "doc_id", "text")
        for ((label, mk) <- Seq[(String, () => org.apache.spark.sql.DataFrame)](
            "winnowing" -> (() => graft.operators.TextAnalysis
              .winnowFingerprints(corpus, "doc_id", "text")),
            "cdc_chunks" -> (() => graft.operators.Multimodal
              .cdcChunks(media, "doc_id")),
            "phash_sigs" -> (() => graft.operators.Multimodal
              .phashSignatures(media, "doc_id")),
            "bpe_apply" -> (() => graft.operators.TextAnalysis
              .bpeApply(corpus, "doc_id", "text",
                Seq("e r", "i n", "o w", "s t", "a t", "a l", "t er"))),
            "shuffle_order" -> (() => graft.operators.Prep
              .shuffleOrder(corpus.select(col("doc_id")), "doc_id", seed = 42)))) {
          mk().write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          println(f"newscale $label n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
        // output-volume sanity line: confirms the corpus (and the work)
        // actually scales with n — a flat time WITH a scaling row count
        // is fixed-overhead dominance, not an unexecuted plan
        println(s"newscale cdc_rows n=$n " +
          graft.operators.Multimodal.cdcChunks(media, "doc_id").count())
      }
      spark.stop(); return
    }
    if (names.headOption.contains("r7scale")) {
      // Round-7 scalecheck: the operator families the round-6 verdict
      // asked to put under the 1x/2x/4x/8x lens — BM25, winnowing,
      // record linkage, duplicate spans (vocab-/block-disjoint corpus
      // unions: per-copy structure constant, so wall-clock growth
      // measures ENGINE work), and the non-pagerank graph family
      // (node-id-shifted edge unions: |V|,|E| grow linearly, disjoint
      // components, per-round cost must track |E|).
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.functions._
      val docs0 = Tables.load(spark, dir, "documents").select("doc_id", "text")
      val cust0 = Tables.load(spark, dir, "customer").select(
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
      val edges0 = graft.operators.Graph.nationTradeEdges(spark, dir)
        .localCheckpoint(true)
      val baseTerms = Seq("spark", "join", "window", "vector")
      val multiples = if (names.length > 1) names.tail.map(_.toInt) else Seq(1, 2, 4, 8)
      for (n <- multiples) {
        val corpus = (0 until n).map(k =>
          docs0.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
            regexp_replace(col("text"), "(^| )", s"$$1c$k").as("text")))
          .reduce(_ unionByName _)
        // linkage: per copy, clean + dirty records in a SHIFTED block
        // space (nationkey + k*1000) — candidate pairs never cross copies
        val recs = (0 until n).map { k =>
          val c = cust0.select(
            (col("c_custkey") + lit(k * 10000000L)).as("c_custkey"),
            concat(lit(s"k$k"), col("c_name")).as("c_name"),
            (col("c_nationkey") + lit(k * 1000L)).as("c_nationkey"),
            col("c_acctbal"), col("c_mktsegment"))
          c.unionByName(c.select(
            (col("c_custkey") + 1000000).as("c_custkey"),
            concat(expr("substring(c_name, 1, length(c_name) - 1)"), lit("X"))
              .as("c_name"),
            col("c_nationkey"),
            round(col("c_acctbal") + 0.37, 2).as("c_acctbal"),
            col("c_mktsegment")))
        }.reduce(_ unionByName _)
        val edges = (0 until n).map(k =>
          edges0.select((col("src") + lit(k * 1000L)).as("src"),
            (col("dst") + lit(k * 1000L)).as("dst"), col("w")))
          .reduce(_ unionByName _)
        val queryTerms = (0 until n).flatMap(k => baseTerms.map(t => s"c$k$t"))
        val shapes: Seq[(String, () => DataFrame)] = Seq(
          "bm25" -> (() => graft.operators.TextAnalysis
            .bm25TopK(corpus, "doc_id", "text", queryTerms, k = 10 * n)),
          "winnowing" -> (() => graft.operators.TextAnalysis
            .winnowFingerprints(corpus, "doc_id", "text")),
          "span" -> (() => graft.operators.Dedup
            .duplicateSpans(corpus, "doc_id", "text")),
          "linkage" -> (() => graft.operators.Linkage
            .fsLink(recs, "c_custkey", "c_name", "c_nationkey",
              "c_acctbal", "c_mktsegment")),
          "triangles" -> (() => graft.operators.Graph.triangleStats(edges)),
          "labelprop" -> (() => graft.operators.Graph
            .labelPropagation(edges, rounds = 5)),
          "bfs" -> (() => graft.operators.Graph
            .bfsHops(edges, (0 until n).map(_ * 1000L), rounds = 3)))
        for ((label, mk) <- shapes) {
          mk().write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          println(f"r7scale $label n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
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
            "simhash" -> graft.operators.Dedup.simhash(corpus, "doc_id", "text"),
            "simhash_pairs" -> graft.operators.Dedup.simhashPairs(corpus, "doc_id", "text", maxDist = 1),
            "fuzzy" -> graft.operators.Dedup.fuzzyBlockedPairs(corpus, "doc_id", "text"))) {
          df.write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          println(f"scale $label n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
        val t0 = System.nanoTime()
        graft.operators.Dedup.nearDupPairs(corpus, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
        println(f"scale minhash_lsh n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        val t1 = System.nanoTime()
        graft.operators.Dedup.containmentPairs(corpus, "doc_id", "text",
            threshold = 0.9)
          .write.format("noop").mode("overwrite").save()
        println(f"scale containment n=$n ${(System.nanoTime() - t1) / 1e9}%.2fs")
        val t2 = System.nanoTime()
        graft.operators.Dedup.duplicateSpans(corpus, "doc_id", "text")
          .write.format("noop").mode("overwrite").save()
        println(f"scale span n=$n ${(System.nanoTime() - t2) / 1e9}%.2fs")
      }
      spark.stop(); return
    }
    if (names.headOption.contains("annscale")) {
      // ANN-family scalecheck: exact brute-force vs the bucketed/encoded
      // paths on 1x/2x/4x/8x perturbed unions of the embedding corpus
      // (copies id-shifted and deterministically nudged per dimension so
      // no artificial exact ties appear). Codebooks are trained ONCE on
      // the 1x corpus and reused at every multiple — the realistic
      // deployment (train on a sample, encode + search at scale) — so the
      // measurement isolates the per-row scaling path: row-local encode,
      // broadcast probes, per-probe top-k as the only shuffle.
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.functions._
      import graft.operators.Similarity
      val e = Tables.load(spark, dir, "embeddings").select(col("vec_id"),
        col("label"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      val probes = e.filter(col("vec_id") < 10).drop("label").localCheckpoint(true)
      val base = e.filter(col("vec_id") >= 10)
      val coarse = Similarity.trainCentroids(base, "label", "emb").localCheckpoint(true)
      val res = Similarity.ivfResiduals(base, coarse, "emb")
      val half = "CAST(floor(size(res) / 2) AS INT)"
      val cb1 = Similarity.trainCentroids(
        res.select(col("label"), expr(s"slice(res, 1, $half)").as("remb")),
        "label", "remb").localCheckpoint(true)
      val cb2 = Similarity.trainCentroids(
        res.select(col("label"),
          expr(s"slice(res, $half + 1, size(res) - $half)").as("remb")),
        "label", "remb").localCheckpoint(true)
      // plain-PQ codebooks on the RAW subvector halves (no coarse stage)
      val rawHalf = "CAST(floor(size(emb) / 2) AS INT)"
      val pb1 = Similarity.trainCentroids(
        base.select(col("label"), expr(s"slice(emb, 1, $rawHalf)").as("remb")),
        "label", "remb").localCheckpoint(true)
      val pb2 = Similarity.trainCentroids(
        base.select(col("label"),
          expr(s"slice(emb, $rawHalf + 1, size(emb) - $rawHalf)").as("remb")),
        "label", "remb").localCheckpoint(true)
      val multiples = if (names.length > 1) names.tail.map(_.toInt) else Seq(1, 2, 4, 8)
      for (n <- multiples) {
        val corpus = (0 until n).map(k =>
          base.select((col("vec_id") + lit(k * 10000000L)).as("vec_id"),
            expr(s"transform(emb, (x, i) -> x + ${k}E-4 * CAST(i + 1 AS DOUBLE))").as("emb")))
          .reduce(_ unionByName _).localCheckpoint(true)
        // thunks, not frames: pca/sq do real work (moment collects,
        // range aggregates) at CONSTRUCTION — timing only the final
        // write would under-report them (the timeq rationale)
        val shapes: Seq[(String, () => DataFrame)] = Seq(
          "pca_power" -> (() =>
            graft.operators.Pca.pcaPowerTop1(corpus, "vec_id", "emb")),
          "sq8" -> (() =>
            Similarity.sqTopK(corpus, probes, "vec_id", "emb", k = 10)),
          "exact_knn" -> (() =>
            Similarity.cosineTopK(corpus, probes, "vec_id", "emb", k = 10)),
          "lsh_bucketed" -> (() =>
            Similarity.lshTopK(corpus, probes, "vec_id", "emb", bits = 8, k = 10)),
          "ivf_nprobe2" -> (() => Similarity.ivfTopKNprobe(corpus, probes, coarse,
            "vec_id", "emb", k = 10, nprobe = 2)),
          "ivfpq_nprobe2" -> (() => Similarity.ivfpqTopK(corpus, probes, coarse,
            cb1, cb2, "vec_id", "emb", k = 10, nprobe = 2)),
          "pq" -> (() => Similarity.pqTopK(corpus, probes, pb1, pb2,
            "vec_id", "emb", k = 10)))
        for ((label, mk) <- shapes) {
          mk().write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          println(f"annscale $label n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
      }
      spark.stop(); return
    }
    if (names.headOption.contains("relscale")) {
      // Relational-family scalecheck: q03/q04/q10/q20 shapes on 1x/2x/4x/8x
      // key-shifted unions of the base tables (run one multiple per JVM,
      // like the dedup scalecheck — fresh-JVM points avoid cross-point
      // block accumulation). Key shifts keep each copy's join keys
      // disjoint, so join/window output grows LINEARLY (engine work, not
      // output-size artifacts); group-by keys for q03/q04 are unshifted, so
      // those outputs stay constant-size and the test isolates map-side
      // combine + shuffle behavior under AQE coalescing.
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.functions._
      val multiples = if (names.length > 1) names.tail.map(_.toInt) else Seq(1, 2, 4, 8)
      val li0 = Tables.load(spark, dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_shipdate")
      val or0 = Tables.load(spark, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val cu0 = Tables.load(spark, dir, "customer").select("c_custkey", "c_nationkey")
      val ev0 = Tables.load(spark, dir, "events").select("user_id", "ts", "value")
      val nat = broadcast(Tables.load(spark, dir, "nation"))
      val reg = broadcast(Tables.load(spark, dir, "region"))
      for (n <- multiples) {
        def rep(df: DataFrame, shifts: Map[String, Long]): DataFrame =
          (0 until n).map(k => df.select(df.columns.toIndexedSeq.map(c =>
            shifts.get(c).map(m => (col(c) + lit(k * m)).as(c)).getOrElse(col(c))): _*))
            .reduce(_ unionByName _)
        val li = rep(li0, Map("l_orderkey" -> 1000000000L))
        val or = rep(or0, Map("o_orderkey" -> 1000000000L, "o_custkey" -> 100000000L))
        val cu = rep(cu0, Map("c_custkey" -> 100000000L))
        val ev = rep(ev0, Map("user_id" -> 100000000L))
        val w10 = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        val shapes: Seq[(String, DataFrame)] = Seq(
          "q03_agg" -> li
            .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(round(sum("l_quantity"), 2).as("sq"),
              round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"),
              round(avg("l_quantity"), 2).as("aq"), count(lit(1)).as("c")),
          "q04_star" -> li.join(or, col("l_orderkey") === col("o_orderkey"))
            .join(cu, col("o_custkey") === col("c_custkey"))
            .join(nat, col("c_nationkey") === col("n_nationkey"))
            .join(reg, col("n_regionkey") === col("r_regionkey"))
            .groupBy("r_name", "n_name")
            .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev")),
          "q10_topk" -> or
            .select(col("o_custkey"), col("o_orderkey"),
              row_number().over(w10).cast("long").as("rn"))
            .filter(col("rn") <= 3),
          "q20_bucket" -> ev
            .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("w"))
            .agg(count(lit(1)).as("c"), round(sum(col("value")), 2).as("v")))
        for ((label, df) <- shapes) {
          df.write.format("noop").mode("overwrite").save() // warm
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          println(f"relscale $label n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
      }
      spark.stop(); return
    }
    if (names.headOption.contains("graphscale")) {
      // Graph/sketch-family scalecheck: PageRank on 1x/2x/4x/8x node-id-
      // shifted unions of the nation trade graph (n disjoint copies →
      // |V|,|E| grow linearly and every copy converges identically; wall
      // must track |E|, proving per-iteration cost is the co-partitioned
      // edge join, not something super-linear), and the Misra–Gries
      // heavy-hitters sketch on token-prefixed corpus unions (distinct
      // n-gram domain grows n× while sketch state stays a hard k
      // counters; wall must track the token stream, not the domain).
      import org.apache.spark.sql.functions._
      val edges0 = graft.operators.Graph.nationTradeEdges(spark, dir)
        .localCheckpoint(true)
      val docs0 = Tables.load(spark, dir, "documents").select("doc_id", "text")
      val multiples = if (names.length > 1) names.tail.map(_.toInt) else Seq(1, 2, 4, 8)
      for (n <- multiples) {
        val edges = (0 until n).map(k =>
          edges0.select((col("src") + lit(k * 1000L)).as("src"),
            (col("dst") + lit(k * 1000L)).as("dst"), col("w")))
          .reduce(_ unionByName _)
        val t0 = System.nanoTime()
        graft.operators.Graph.pageRank(edges, iters = 5)
          .write.format("noop").mode("overwrite").save()
        println(f"graphscale pagerank n=$n ${(System.nanoTime() - t0) / 1e9}%.2fs")
        val corpus = (0 until n).map(k =>
          docs0.select((col("doc_id") + lit(k * 1000000L)).as("doc_id"),
            regexp_replace(col("text"), "(^| )", s"$$1c$k").as("text")))
          .reduce(_ unionByName _)
        for ((label, kCap) <- Seq("hh_k4096" -> 4096, "hh_k64" -> 64)) {
          val df = graft.operators.TextAnalysis.heavyHitters(corpus, "text", kCap)
          df.write.format("noop").mode("overwrite").save() // warm
          val t1 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          println(f"graphscale $label n=$n ${(System.nanoTime() - t1) / 1e9}%.2fs")
        }
      }
      spark.stop(); return
    }
    if (names == Seq("streamdemo")) {
      val tmp = graft.util.Scratch.dir("sd").toString
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
    if (names == Seq("editprof")) {
      // stage-level timing of the PassJoin edit-distance pipeline
      import org.apache.spark.sql.functions._
      val d = Tables.load(spark, dir, "documents").select(col("doc_id"), col("text"))
      val variants = d.unionByName(
        d.filter(col("doc_id") % 3 === 0 && length(col("text")) >= 18)
          .select((col("doc_id") + 1000000L).as("doc_id"),
            concat(expr("substring(text, 1, length(text) - 2)"), lit("xq"))
              .as("text")))
      def t[A](label: String)(f: => A): A = {
        val t0 = System.nanoTime()
        val r = f
        println(f"editprof $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
        r
      }
      val keyed = t("keyed-ckpt") {
        variants.select(col("doc_id").as("id"), col("text").as("t"),
          length(col("text")).as("ln")).localCheckpoint(true)
      }
      val k = 3; val kk = 4
      def segLen(lCol: String) =
        s"$lCol div $kk + IF(i >= $kk - $lCol % $kk, 1, 0)"
      def segStart(lCol: String) =
        s"i * ($lCol div $kk) + greatest(0, i - ($kk - $lCol % $kk))"
      val segs = keyed
        .select(col("id").as("a_id"), col("ln").as("l"),
          explode(expr(
            s"""transform(sequence(0, $k), i -> struct(i AS i,
               |  substring(t, CAST(${segStart("ln")} AS INT) + 1,
               |            CAST(${segLen("ln")} AS INT)) AS seg))"""
              .stripMargin)).as("e"))
        .select(col("a_id"), col("l"), col("e.i").as("i"), col("e.seg").as("seg"))
      val probes = keyed
        .select(col("id").as("b_id"),
          explode(expr(
            s"""flatten(transform(sequence(greatest(ln - $k, 0), ln), l ->
               |  flatten(transform(sequence(0, $k), i ->
               |    transform(
               |      filter(sequence(greatest((${segStart("l")}) - $k, 0),
               |                      (${segStart("l")}) + $k),
               |             p -> p + (${segLen("l")}) <= ln),
               |      p -> struct(l AS l, i AS i,
               |        substring(t, CAST(p AS INT) + 1,
               |                  CAST(${segLen("l")} AS INT)) AS seg))))))"""
              .stripMargin)).as("e"))
        .select(col("b_id"), col("e.l").as("l"), col("e.i").as("i"),
          col("e.seg").as("seg"))
      t("segs-count")(println("  segs=" + segs.count()))
      t("probes-count")(println("  probes=" + probes.count()))
      val cand = segs.join(probes, Seq("l", "i", "seg"))
        .filter(col("a_id") =!= col("b_id"))
        .select(least(col("a_id"), col("b_id")).as("a"),
          greatest(col("a_id"), col("b_id")).as("b"))
        .distinct()
      val candC = t("cand-distinct")(cand.localCheckpoint(true))
      println("  cand=" + candC.count())
      val withT = t("attach-texts") {
        candC.join(keyed.select(col("id").as("a"), col("t").as("ta")), Seq("a"))
          .join(keyed.select(col("id").as("b"), col("t").as("tb")), Seq("b"))
          .localCheckpoint(true)
      }
      t("dp") {
        withT.select(col("a"), col("b"),
            expr(s"levenshtein(ta, tb, $k)").as("dist"))
          .filter(col("dist") >= 0).orderBy("a", "b")
          .write.format("noop").mode("overwrite").save()
      }
      spark.stop(); return
    }
    if (names == Seq("uniprof")) {
      // stage-level timing + job count of the unigram-LM train ladder
      import org.apache.spark.sql.functions._
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val jobNanos = new java.util.concurrent.atomic.AtomicLong(0L)
      val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
            jobs.incrementAndGet()
            jobStarts.put(j.jobId, System.nanoTime())
          }
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val s = jobStarts.remove(j.jobId)
            if (s != 0L) jobNanos.addAndGet(System.nanoTime() - s)
          }
        })
      for (i <- 1 to 3) {
        val j0 = jobs.get()
        val n0 = jobNanos.get()
        val t0 = System.nanoTime()
        val df = graft.operators.TextAnalysis
          .unigramTrain(Tables.load(spark, dir, "documents"), "doc_id", "text")
        val t1 = System.nanoTime()
        val jMid = jobs.get()
        val nMid = jobNanos.get()
        df.write.format("noop").mode("overwrite").save()
        println(f"uniprof run$i construct ${(t1 - t0) / 1e9}%.2fs " +
          f"(jobs ${jMid - j0}, jobwall ${(nMid - n0) / 1e9}%.2fs) " +
          f"write ${(System.nanoTime() - t1) / 1e9}%.2fs " +
          f"(jobs ${jobs.get() - jMid}, jobwall ${(jobNanos.get() - nMid) / 1e9}%.2fs)")
      }
      // sub-phase attribution: words/seed replicated from the operator
      for (i <- 1 to 2) {
        val docs = Tables.load(spark, dir, "documents")
        var t0 = System.nanoTime()
        val words = docs.select(explode(split(col("text"), " ")).as("w"))
          .filter(length(col("w")).between(1, 10))
          .groupBy("w").agg(count(lit(1)).as("tc"))
          .localCheckpoint(true)
        println(f"uniprof sub$i words ${(System.nanoTime() - t0) / 1e9}%.2fs")
        t0 = System.nanoTime()
        val seed = words.select(col("tc"), explode(expr(
            s"""flatten(transform(sequence(1, length(w)), st ->
               |  transform(sequence(1, least(4, length(w) - st + 1)),
               |    l -> substring(w, st, l))))""".stripMargin)).as("piece"))
          .groupBy("piece").agg(sum("tc").as("f"))
          .localCheckpoint(true)
        println(f"uniprof sub$i seed ${(System.nanoTime() - t0) / 1e9}%.2fs")
        t0 = System.nanoTime()
        val modelRows = seed
          .withColumn("rk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(length(col("piece")) === 1)
              .orderBy(col("f").desc, col("piece"))))
          .filter(length(col("piece")) === 1 || col("rk") <= 120)
          .select(col("piece"), col("f"))
          .collect()
        println(f"uniprof sub$i modelcollect ${(System.nanoTime() - t0) / 1e9}%.2fs " +
          s"(${modelRows.length} rows)")
      }
      spark.stop(); return
    }
    if (names == Seq("sessprof")) {
      // stage-level timing of the streaming session-publish registry row
      // (staging replicates the registry wrapper's ONE-PASS form, round
      // 16) plus the per-micro-batch duration breakdown the round-15
      // verdict asked for: queryPlanning vs addBatch (sink) vs walCommit/
      // stateStore commit, straight from StreamingQueryProgress.
      import org.apache.spark.sql.functions._
      import org.apache.hadoop.fs.Path
      for (i <- 1 to 2) {
        val work = graft.util.Scratch.dir("graft_sessprof").toString
        def t[A](label: String)(f: => A): A = {
          val t0 = System.nanoTime()
          val r = f
          println(f"sessprof run$i $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
          r
        }
        val ev = Tables.load(spark, dir, "events")
        val bounds = t("bounds") {
          ev.select(expr(
            "percentile(unix_micros(ts), array(0.25D, 0.5D, 0.75D))").as("b"))
            .head().getSeq[Double](0)
        }
        val tsUs = expr("unix_micros(ts)")
        val fs = new Path(work).getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.mkdirs(new Path(s"$work/src"))
        t("stage-one-pass") {
          val qr = when(tsUs <= bounds(0), 1)
            .when(tsUs <= bounds(1), 2)
            .when(tsUs <= bounds(2), 3)
            .otherwise(4)
          ev.withColumn("qr", qr)
            .repartition(4, col("qr"))
            .write.partitionBy("qr").mode("overwrite").parquet(s"$work/stage")
          val t0m = System.currentTimeMillis()
          for (r <- 1 to 4) {
            val parts = fs.globStatus(new Path(s"$work/stage/qr=$r/part-*"))
            if (parts != null && parts.nonEmpty) {
              val target = new Path(f"$work/src/part-$r%02d.parquet")
              fs.rename(parts(0).getPath, target)
              fs.setTimes(target, t0m + r * 1000L, -1)
            }
          }
        }
        t("drain") {
          val q = graft.streaming.EventsStream
            .sessionPublish(spark, s"$work/src", s"$work/ck", s"$work/final")
          q.awaitTermination()
          q.recentProgress.foreach { p =>
            val d = p.durationMs
            println(s"sessprof   batch=${p.batchId} rows=${p.numInputRows} " +
              s"trigger=${d.get("triggerExecution")}ms " +
              s"planning=${d.get("queryPlanning")}ms " +
              s"addBatch=${d.get("addBatch")}ms " +
              s"getBatch=${d.get("getBatch")}ms " +
              s"walCommit=${d.get("walCommit")}ms " +
              s"commitOffsets=${d.get("commitOffsets")}ms")
          }
        }
        t("readback") {
          spark.read.parquet(s"$work/final")
            .select(col("user_id"), col("w_start"), col("w_end"),
              col("n_events").cast("long").as("n_events"),
              round(col("v"), 2).as("v"))
            .orderBy("user_id", "w_start")
            .write.format("noop").mode("overwrite").save()
        }
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
