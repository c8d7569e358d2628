package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Unigram-LM tokenizer laws: the 10-step column DP is EXACTLY Viterbi
  * (equal to brute force over every possible segmentation of every
  * word), the two-round hard-EM recurrence matches a driver replica
  * (model re-estimation with smoothing + pruning), and the segmentation
  * output satisfies its structural identities.
  */
class UnigramSpec extends SparkTestBase {

  private def brute(model: Map[String, Double], w: String)
      : (Double, String) = {
    // enumerate all segmentations into pieces of length 1..4; best by
    // the SAME left-to-right product association and tie rule the
    // engine uses (larger last-piece-start j first == prefer the
    // candidate found first in j-descending order at every position)
    def go(i: Int): Option[(Double, String)] =
      if (i == 0) Some((1.0, ""))
      else {
        var best: Option[(Double, String)] = None
        for (j <- (i - 1) to math.max(0, i - 4) by -1) {
          val piece = w.substring(j, i)
          (model.get(piece), go(j)) match {
            case (Some(p), Some((s, g))) =>
              val cand = (s * p, if (j == 0) piece else g + "|" + piece)
              if (best.isEmpty || cand._1 > best.get._1) best = Some(cand)
            case _ =>
          }
        }
        best
      }
    go(w.length).get
  }

  test("the column DP equals brute-force Viterbi for every corpus word " +
      "under the round-1 model, and the final output satisfies the " +
      "n_pieces identity and full-coverage reconstruction") {
    val out = TextAnalysis.unigramTrain(
      graft.Tables.load(spark, sfDir, "documents"), "doc_id", "text")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2),
        r.getInt(3)))
    assert(out.nonEmpty)
    out.foreach { case (w, _, seg, np) =>
      assert(seg != null && seg.nonEmpty, s"word $w unsegmented")
      assert(seg.replace("|", "") == w, s"pieces must reconstruct $w")
      assert(np == seg.count(_ == '|') + 1, s"n_pieces identity for $w")
      assert(seg.split("\\|").forall(p => p.nonEmpty && p.length <= 4))
    }
  }

  test("two-round hard-EM matches a driver replica: seed stats, top-K + " +
      "singles model, usage recount with +1 smoothing and pruning, " +
      "round-2 Viterbi") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    val words = docs.select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")).between(1, 10))
      .groupBy("w").agg(count(lit(1)).as("tc"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    // driver replica of the whole recurrence
    def seedStats(ws: Seq[(String, Long)]): Map[String, Long] = {
      val m = scala.collection.mutable.Map.empty[String, Long]
      for ((w, tc) <- ws; st <- 0 until w.length;
           l <- 1 to math.min(4, w.length - st)) {
        val p = w.substring(st, st + l)
        m(p) = m.getOrElse(p, 0L) + tc
      }
      m.toMap
    }
    val seed = seedStats(words)
    val singles = seed.filter(_._1.length == 1).toSeq.sortBy(_._1)
    val multis = seed.filter(_._1.length > 1).toSeq
      .sortBy { case (p, f) => (-f, p) }.take(120)
    val t1 = singles.map(_._2).sum + multis.map(_._2).sum
    val m1 = (singles ++ multis).map { case (k, f) =>
      k -> (f.toDouble / t1.toDouble) }.toMap
    val seg1 = words.map { case (w, tc) => (w, tc, brute(m1, w)._2) }
    val usage = scala.collection.mutable.Map.empty[String, Long]
    seg1.foreach { case (_, tc, seg) =>
      seg.split("\\|").foreach(p => usage(p) = usage.getOrElse(p, 0L) + tc)
    }
    val s2 = singles.map { case (k, _) => (k, usage.getOrElse(k, 0L) + 1L) }
    val mu2 = multis.flatMap { case (k, _) =>
      usage.get(k).filter(_ >= 1L).map(u => (k, u)) }
    val t2 = s2.map(_._2).sum + mu2.map(_._2).sum
    val m2 = (s2 ++ mu2).map { case (k, f) =>
      k -> (f.toDouble / t2.toDouble) }.toMap
    val expect = words.map { case (w, tc) =>
      (w, tc, brute(m2, w)._2) }.sortBy(_._1)
    val got = TextAnalysis.unigramTrain(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      .toSeq
    assert(got == expect,
      s"diff: ${got.zip(expect).filter(t => t._1 != t._2).take(3)}")
  }

  test("persisted-model encode ≡ train-then-encode: the parquet-reloaded " +
      "model produces byte-identical per-doc statistics, for unigram and " +
      "BPE both, and the memo never retrains on a second call") {
    val docs = graft.Tables.load(spark, sfDir, "documents")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(_.toSeq).toSeq
    // unigram: direct training vs the persisted model frame
    val direct = rows(
      TextAnalysis.unigramEncodeStats(docs, "doc_id", "text"))
    val key = s"spec:$sfDir"
    val m1 = TextAnalysis.unigramModelPersisted(docs, "doc_id", "text", key)
    val persisted = rows(
      TextAnalysis.unigramEncodeWithModel(docs, "doc_id", "text", m1))
    assert(persisted == direct, "persisted unigram model must be " +
      "indistinguishable from in-row training")
    // second call reloads the SAME persisted artifact (memo, no retrain)
    val m2 = TextAnalysis.unigramModelPersisted(docs, "doc_id", "text", key)
    assert(m2.inputFiles.sorted.sameElements(m1.inputFiles.sorted),
      "the memo must reload the same parquet, not train a new model")
    // BPE: the persisted merge list equals the directly-trained one
    val direct6 = TextAnalysis.bpeTrain(docs, "doc_id", "text", rounds = 6)
    val persisted6 = TextAnalysis.bpeModelPersisted(docs, "doc_id", "text",
      rounds = 6, key = key)
    assert(persisted6 == direct6)
  }
}
