package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Two tiers, matching how ANN degrades gracefully at scale:
  *
  *   - [[cosineTopK]] — brute-force exact k-NN: the probe set broadcasts,
  *     the corpus streams once, a per-probe window keeps k. O(|corpus| ×
  *     |probes|) work but a single corpus scan, no corpus shuffle. Right
  *     whenever |probes| is small (the q19 single-probe case is this with
  *     |probes| = 1).
  *   - [[lshTopK]] — sign-LSH bucketed ANN: corpus pre-bucketed by the
  *     packed sign bits of leading dimensions (an IVF-style coarse
  *     quantizer with deterministic axis-aligned hyperplanes); probes only
  *     scan their own bucket. Recall trades against `bits`; cost drops by
  *     ~2^bits. This is the 100 TB path — the bucket join shuffles on the
  *     bucket id, never all-pairs.
  */
object Similarity {

  /** Packed sign bits of dimensions 1..bits (1-based): the deterministic
    * LSH bucket id. Stays inside codegen — no UDF.
    */
  def signBucket(emb: Column, bits: Int): Column =
    (0 until bits).map { k =>
      when(element_at(emb, k + 1) >= 0, lit(1L << k)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact cosine top-k for each probe: broadcast probes × streamed corpus,
    * ranked per probe with a deterministic tie-break.
    */
  def cosineTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
                 embCol: String, k: Int): DataFrame = {
    val p = broadcast(probes.select(col(idCol).as("probe_id"), col(embCol).as("p_emb")))
    val w = Window.partitionBy("probe_id")
      .orderBy(col("cos").desc, col(idCol))
    corpus.join(p, col("probe_id") =!= col(idCol))
      .withColumn("cos", VectorOps.cosine(col("p_emb"), col(embCol)))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col(idCol).as("neighbor_id"), col("rn"),
        round(col("cos"), 4).as("cos"))
  }

  /** IVF coarse quantizer training: one centroid per label via the typed
    * [[graft.functions.CentroidAgg]] UDAF (k-means' assignment step over a
    * labeled corpus; swap the label for an iterated assignment to get full
    * k-means — the operator shapes are identical).
    */
  def trainCentroids(vectors: DataFrame, labelCol: String, embCol: String): DataFrame = {
    val centroid = udaf(graft.functions.CentroidAgg)
    vectors.groupBy(col(labelCol).as("cid"))
      .agg(centroid(col(embCol)).as("cemb"))
  }

  /** IVF assignment: nearest centroid by cosine (centroids broadcast —
    * they are tiny by construction), deterministic tie-break on cid.
    */
  def ivfAssign(vectors: DataFrame, centroids: DataFrame,
                idCol: String, embCol: String): DataFrame = {
    val w = Window.partitionBy(idCol).orderBy(col("ccos").desc, col("cid"))
    vectors.crossJoin(broadcast(centroids))
      .withColumn("ccos", VectorOps.cosine(col(embCol), col("cemb")))
      .withColumn("crn", row_number().over(w))
      .filter(col("crn") === 1)
      .select(col(idCol), col(embCol), col("cid"))
  }

  /** IVF ANN (nprobe = 1): probes search only the inverted list of their
    * nearest centroid. At 100 TB the corpus shuffles once on cid (each
    * inverted list is a partition-local scan); accuracy/cost trades via
    * the codebook size and nprobe, exactly like the LSH `bits` dial.
    */
  def ivfTopK(corpus: DataFrame, probes: DataFrame, centroids: DataFrame,
              idCol: String, embCol: String, k: Int): DataFrame = {
    val c = ivfAssign(corpus, centroids, idCol, embCol)
      .select(col(idCol).as("cand_id"), col(embCol).as("c_emb"), col("cid"))
    val p = ivfAssign(probes, centroids, idCol, embCol)
      .select(col(idCol).as("probe_id"), col(embCol).as("p_emb"), col("cid"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))
    c.join(broadcast(p), Seq("cid"))
      .withColumn("cos", VectorOps.cosine(col("p_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("cand_id").as("neighbor_id"),
        col("cid"), round(col("cos"), 4).as("cos"))
  }

  /** IVF ANN with multi-list probing (nprobe > 1): each probe searches the
    * inverted lists of its `nprobe` nearest centroids — the standard
    * recall-vs-cost dial (recall lost to a probe landing just outside its
    * best list is recovered by also scanning the runner-up lists). The
    * corpus is still assigned to exactly ONE list, so candidate sets from
    * different lists are disjoint — no dedup pass needed; only the tiny
    * probe side fans out nprobe-fold.
    */
  def ivfTopKNprobe(corpus: DataFrame, probes: DataFrame, centroids: DataFrame,
                    idCol: String, embCol: String, k: Int, nprobe: Int): DataFrame = {
    val c = ivfAssign(corpus, centroids, idCol, embCol)
      .select(col(idCol).as("cand_id"), col(embCol).as("c_emb"), col("cid"))
    val wp = Window.partitionBy(idCol).orderBy(col("ccos").desc, col("cid"))
    val p = probes.crossJoin(broadcast(centroids))
      .withColumn("ccos", VectorOps.cosine(col(embCol), col("cemb")))
      .withColumn("crn", row_number().over(wp))
      .filter(col("crn") <= nprobe)
      .select(col(idCol).as("probe_id"), col(embCol).as("p_emb"), col("cid"))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))
    c.join(broadcast(p), Seq("cid"))
      .withColumn("cos", VectorOps.cosine(col("p_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("cand_id").as("neighbor_id"), col("rn"),
        round(col("cos"), 4).as("cos"))
  }

  /** Bucketed ANN: probes join only the corpus rows in their sign bucket.
    * Returns each probe's best in-bucket neighbor plus the bucket's
    * candidate count (the recall/cost dial made visible).
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, idCol: String,
              embCol: String, bits: Int, k: Int): DataFrame = {
    val c = corpus
      .select(col(idCol).as("cand_id"), col(embCol).as("c_emb"))
      .withColumn("bkt", signBucket(col("c_emb"), bits))
    val p = broadcast(probes
      .select(col(idCol).as("probe_id"), col(embCol).as("p_emb"))
      .withColumn("bkt", signBucket(col("p_emb"), bits)))
    val w = Window.partitionBy("probe_id").orderBy(col("cos").desc, col("cand_id"))
    val wc = Window.partitionBy("probe_id")
    c.join(p, Seq("bkt"))
      .filter(col("cand_id") =!= col("probe_id"))
      .withColumn("cos", VectorOps.cosine(col("p_emb"), col("c_emb")))
      .withColumn("n_cands", count(lit(1)).over(wc))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("probe_id"), col("cand_id").as("neighbor_id"), col("rn"),
        col("n_cands"), round(col("cos"), 4).as("cos"))
  }
}
