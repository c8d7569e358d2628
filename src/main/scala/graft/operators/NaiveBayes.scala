package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multinomial Naive Bayes over token counts — the second
  * "distributed ML is one aggregate" operator beside
  * [[Regression.olsTwoFeature]]: TRAINING is a single map-side-combined
  * (class, token) count plus a class prior count (the sufficient
  * statistics; nothing iterative), and SCORING is one broadcast join of
  * the vocabulary-sized model against the exploded probe tokens plus a
  * per-(doc, class) sum — the shape that classifies 100 TB with two
  * scans total.
  *
  * Smoothing: add-one (Laplace) over the GLOBAL vocabulary V;
  * out-of-class tokens fall back to ln(1 / (classTotal + V)) — the
  * standard zero-count path, spelled identically in the oracle.
  *
  * Determinism: per-class scores are sums of ~|doc| ln() terms;
  * summation order differs across engines at ~1e-13 relative error
  * while inter-class gaps on any real corpus are orders larger, so the
  * argmax and the 4-decimal rounded score are stable (the q40
  * correlation precedent).
  */
object NaiveBayes {

  /** Train on `train` (class = `classCol`), score `probes`; returns one
    * row per probe doc: true class, predicted class (argmax posterior,
    * ties to the lexicographically smallest class), rounded best score.
    */
  def trainScore(train: DataFrame, probes: DataFrame, idCol: String,
                 textCol: String, classCol: String): DataFrame = {
    val toks = train.select(col(classCol).as("cls"),
      explode(split(col(textCol), " ")).as("t"))
    // the (class, token) count is the ONE fact-sized aggregate and it
    // feeds four consumers (class totals, vocabulary, model, fallback);
    // materialize once or the corpus tokenize+count re-runs per consumer
    val ct = toks.groupBy("cls", "t").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val classTot = ct.groupBy("cls").agg(sum("c").as("ctot"))
      .localCheckpoint(true) // feeds the model AND the fallback
    val vocab = ct.select("t").distinct().agg(count(lit(1)).as("v"))
    val priors = train.groupBy(col(classCol).as("cls"))
      .agg(count(lit(1)).as("nd"))
      .crossJoin(broadcast(train.agg(count(lit(1)).as("ndall"))))
      .select(col("cls"), log(col("nd") / col("ndall").cast("double")).as("prior"))
    // vocabulary-sized model frame: (cls, t, loglik) — broadcast class
    val model = ct.join(classTot, "cls").crossJoin(broadcast(vocab))
      .select(col("cls"), col("t"),
        log((col("c") + 1) / (col("ctot") + col("v")).cast("double")).as("ll"))
    // per-class fallback for unseen tokens — class-domain-sized; the
    // guard re-states the bound over the checkpoint-opaque class totals
    // for the plan gate (this frame broadcasts into the scoring BNLJ)
    val fallback = graft.util.RowBound.guard(
      classTot.crossJoin(broadcast(vocab))
        .select(col("cls"),
          log(lit(1) / (col("ctot") + col("v")).cast("double")).as("fb")),
      64, "naive-bayes per-class fallback")
    val ptoks = probes.select(col(idCol), col(classCol).as("true_cls"),
      explode(split(col(textCol), " ")).as("t"))
    // every probe token scores against EVERY class: join the token to the
    // model where present, fall back otherwise — the cross join is
    // |tokens| × |classes| with both model frames broadcast
    val scored = ptoks.crossJoin(broadcast(fallback))
      .join(broadcast(model), Seq("cls", "t"), "left")
      .select(col(idCol), col("true_cls"), col("cls"),
        coalesce(col("ll"), col("fb")).as("term"))
      .groupBy(col(idCol), col("true_cls"), col("cls"))
      .agg(sum("term").as("loglik"))
      .join(broadcast(priors), "cls")
      .select(col(idCol), col("true_cls"), col("cls"),
        (col("loglik") + col("prior")).as("score"))
    // argmax per doc: rank classes by (score DESC, cls ASC) — the window
    // runs over |probes| × |classes| rows, a sliver of the corpus
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col("score").desc, col("cls"))
    scored.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col(idCol), col("true_cls"), col("cls").as("pred_cls"),
        round(col("score"), 4).as("score"),
        (col("true_cls") === col("cls")).as("correct"))
  }

  /** Registered query: language identification by NB — train on docs NOT
    * in the probe slice (doc_id % 11 != 0), score the held-out slice.
    */
  def mlNaiveBayes(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.load(s, dir, "documents")
    val train = d.filter(col("doc_id") % 11 =!= 0)
    val probes = d.filter(col("doc_id") % 11 === 0)
    trainScore(train, probes, "doc_id", "text", "lang")
      .orderBy("doc_id")
  }
}
