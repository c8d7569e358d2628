package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full Lloyd k-means over an embedding column, composed from the IVF
  * building blocks ([[Similarity.ivfAssign]] assignment ×
  * [[Similarity.trainCentroids]] recompute) — the "swap the label for an
  * iterated assignment" path promised there.
  *
  * Determinism (oracle-matchable): init centroids are the vectors with the
  * k smallest ids (no random seed), assignment tie-breaks on cid, and
  * cosine is the similarity — the same arithmetic the rest of the
  * similarity stack uses.
  *
  * Scale: each iteration collects the k-row centroid codebook to the
  * driver (KBs — the sanctioned bounded collect), inlines it as a
  * literal, and re-assigns with a row-local argmax expression; the only
  * thing that moves is the map-side-combined shuffle of k×dim partial
  * sums in the centroid recompute — the corpus itself never shuffles
  * (true as of round 4: the round-3 formulation's per-id window DID
  * shuffle the corpus every pass). Iterations multiply cost linearly;
  * k never does.
  */
object Clustering {

  /** Recomputed centroids, element-rounded to 6 decimals: partial-sum
    * order differs between engines (and between runs at different
    * partitioning), so raw averages disagree at ~1e-15; rounding both
    * engines to the same decimal pins the centroid bits and keeps every
    * downstream assignment identical.
    */
  private def roundedCentroids(assigned: DataFrame, embCol: String): DataFrame =
    Similarity.trainCentroids(assigned, "cid", embCol)
      .withColumn("cemb", expr("transform(cemb, x -> round(x, 6))"))

  /** Run `iters` Lloyd iterations; returns (idCol, embCol, cid) final
    * assignment.
    */
  def kmeansAssign(vectors: DataFrame, idCol: String, embCol: String,
                   k: Int, iters: Int): DataFrame = {
    var cents = vectors.filter(col(idCol) < k)
      .select(col(idCol).cast("int").as("cid"), col(embCol).as("cemb"))
    var assigned = Similarity.ivfAssign(vectors, cents, idCol, embCol)
    for (_ <- 2 to iters) {
      cents = roundedCentroids(assigned, embCol)
      assigned = Similarity.ivfAssign(vectors, cents, idCol, embCol)
    }
    assigned
  }

  /** Cluster summary after the final assignment: size and mean
    * within-cluster cosine (both rounded for cross-engine stability).
    */
  def kmeansSummary(vectors: DataFrame, idCol: String, embCol: String,
                    k: Int, iters: Int): DataFrame = {
    val assigned = kmeansAssign(vectors, idCol, embCol, k, iters)
    val cents = roundedCentroids(assigned, embCol)
    assigned.join(broadcast(cents), "cid")
      .withColumn("cos", VectorOps.cosine(col(embCol), col("cemb")))
      .groupBy("cid")
      .agg(count(lit(1)).as("n_members"), round(avg("cos"), 4).as("avg_cos"))
      .orderBy("cid")
  }
}
