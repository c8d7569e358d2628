package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Declared queries for the LLM-data-pipeline operators (dedup, similarity
  * search, text analysis, multimodal) over the `documents` / `embeddings`
  * test tables — each with a DuckDB oracle in [[graft.SparkEntry.oracleSql]].
  *
  * Near-dup operators are tested against a corpus WITH near-dups by
  * construction: each doc unioned with a copy (id + 1,000,000 — disjoint from
  * real ids at ANY scale factor) missing its last
  * token (text) or scaled by 1.01 (embeddings). The oracle computes the
  * ground-truth all-pairs answer; the engine must reach the same pairs via
  * its bucketed (LSH/blocked) path — i.e. the oracle checks RECALL of the
  * scale-path algorithm, not just its internal consistency.
  */
object LlmQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** documents ∪ (doc_id+1e6, text minus last token). */
  private def nearDupDocs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(d.select(
      (col("doc_id") + 1000000).as("doc_id"),
      expr("array_join(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), ' ')").as("text")))
  }

  /** embeddings (as double) ∪ (vec_id+1e6, embedding × 1.01). */
  private def nearDupVecs(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    e.unionByName(e.select(
      (col("vec_id") + 1000000).as("vec_id"),
      expr("transform(emb, x -> x * 1.01D)").as("emb")))
  }

  def dedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exactKeepMin(docs(s, dir).select(col("doc_id"), col("text")),
        Seq("text"), "doc_id")
      .select(col("doc_id").as("keep_id"), col("dup_count"),
        md5(col("text")).as("text_hash"))
      .orderBy("keep_id")

  /** Normalize-then-exact dedup ([[Dedup.normalizedDedup]]) over a corpus
    * with formatting variants by construction: every doc unioned with an
    * upper-cased, punctuation-decorated copy (id + 1,000,000), which the
    * normalization must collapse back onto its original — so every group
    * has n_dups ≥ 2 and the original id survives.
    */
  /** dedup_edit — typo-noise near-dup pairs
    * ([[Dedup.editDistancePairs]], PassJoin segment blocking) over a
    * corpus with tail-edit copies planted by construction: every third
    * doc long enough gains a copy whose last two characters are
    * replaced — distance exactly 2. The oracle is UNBLOCKED: all pairs
    * under only the necessary |Δlen| ≤ 3 condition with the full DP,
    * so the gate certifies the engine's blocking against ground truth.
    */
  def dedupEdit(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val variants = d.unionByName(
      d.filter(col("doc_id") % 3 === 0 && length(col("text")) >= 18)
        .select((col("doc_id") + 1000000).as("doc_id"),
          concat(expr("substring(text, 1, length(text) - 2)"), lit("xq"))
            .as("text")))
    Dedup.editDistancePairs(variants, "doc_id", "text")
  }

  /** dedup_edit_recall — the measured-recall leg for PassJoin blocking:
    * a bounded 400-doc fixture (texts clipped to 200 chars so the
    * oracle's unbanded all-pairs DP stays tractable) planting
    * distance-2 edits at EARLY (chars 2–3), MID (around len/2) and
    * LATE (last two chars) positions for every third doc. The early
    * plant is precisely what a shared-prefix bucket misses; the oracle
    * computes the UNBLOCKED ground-truth pair set, so row-for-row
    * equality is a recall ≡ 1.0 AND precision ≡ 1.0 measurement of the
    * segment pigeonhole — the [[Dedup.editDistancePairs]] scaladoc's
    * losslessness claim, gated per round instead of asserted.
    */
  def dedupEditRecall(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).filter(col("doc_id") < 400)
      .select(col("doc_id"), expr("substring(text, 1, 200)").as("text"))
    val eligible = base
      .filter(col("doc_id") % 3 === 0 && length(col("text")) >= 30)
    val early = eligible.select((col("doc_id") + 1000000).as("doc_id"),
      concat(expr("substring(text, 1, 1)"), lit("zq"),
        expr("substring(text, 4)")).as("text"))
    val mid = eligible.select((col("doc_id") + 2000000).as("doc_id"),
      concat(expr("substring(text, 1, length(text) div 2)"), lit("zq"),
        expr("substring(text, length(text) div 2 + 3)")).as("text"))
    val late = eligible.select((col("doc_id") + 3000000).as("doc_id"),
      concat(expr("substring(text, 1, length(text) - 2)"), lit("zq"))
        .as("text"))
    Dedup.editDistancePairs(
      base.unionByName(early).unionByName(mid).unionByName(late),
      "doc_id", "text")
  }

  /** dedup_prefix — truncation-duplicate detection
    * ([[Dedup.prefixDups]]) over a corpus with truncated re-fetches
    * planted by construction: every fourth doc long enough gains a
    * half-length prefix copy. The oracle replays the plant, the bucket
    * window, and the successor test row-for-row.
    */
  def dedupPrefix(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val variants = d.unionByName(
      d.filter(col("doc_id") % 4 === 0 && length(col("text")) >= 16)
        .select((col("doc_id") + 1000000).as("doc_id"),
          expr("substring(text, 1, CAST(length(text) DIV 2 AS INT))")
            .as("text")))
    Dedup.prefixDups(variants, "doc_id", "text")
  }

  def dedupNormalized(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val variants = d.unionByName(d.select(
      (col("doc_id") + 1000000).as("doc_id"),
      concat(upper(col("text")), lit("  !!!")).as("text")))
    Dedup.normalizedDedup(variants, "doc_id", "text").orderBy("keep_id")
  }

  /** PII scrub ([[TextAnalysis.piiRedact]]) over a corpus with PII
    * injected by construction (every third doc gains an email, a 555
    * phone number and an IPv4 literal derived from its id), so the
    * detection counts and masked text have a known ground truth.
    */
  def textPii(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val injected = d.withColumn("text",
      when(col("doc_id") % 3 === 0,
        concat(col("text"),
          lit(" contact u"), col("doc_id").cast("string"), lit("@ex.com or 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
          lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".7")))
      .otherwise(col("text")))
    TextAnalysis.piiRedact(injected, "doc_id", "text").orderBy("doc_id")
  }

  /** prep_winsorize ([[Prep.winsorizeStats]]): P1/P99 winsorized price
    * statistics per order priority — five bounded groups over exact
    * cents; the oracle replays the interpolated percentiles
    * (quantile_cont) and the exact clip-total reassembly.
    */
  def prepWinsorize(s: SparkSession, dir: String): DataFrame =
    Prep.winsorizeStats(
      Tables.load(s, dir, "orders").select(
        col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents")),
      "o_orderpriority", col("cents"))
      .withColumnRenamed("g", "priority")
      .orderBy("priority")

  /** text_invisible ([[TextAnalysis.invisibleChars]]) over a corpus
    * with obfuscation planted by construction: every fourth doc gains
    * zero-width joiners inside a word, a bidi override and a soft
    * hyphen — invisible in rendering, poison for tokenizers and
    * dedup. The oracle replays the three counts and the cleaned-text
    * md5 (so the REMOVAL is pinned too, not just detection).
    */
  def textInvisible(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val injected = d.withColumn("text",
      when(col("doc_id") % 4 === 0,
        concat(lit("he\u200Bllo\u200D "), col("text"),
          lit(" \u202Ereversed\u202C x\u00ADy")))
      .otherwise(col("text")))
    TextAnalysis.invisibleChars(injected, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** prep_decontaminate ([[Prep.decontaminate]]): the GPT-3-style
    * eval-leakage scrub over a corpus with contamination planted by
    * construction — every seventh doc gains a shared 8-token phrase, so
    * whichever of them the hash split lands in TEST contaminates the
    * TRAIN members, which must be dropped. The oracle replays the md5
    * split, the distinct 8-gram generation, the test-gram join and the
    * disposition rule.
    */
  def prepDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"),
      when(col("doc_id") % 7 === 0,
        concat(col("text"),
          lit(" qq0 qq1 qq2 qq3 qq4 qq5 qq6 qq7"))).otherwise(col("text"))
        .as("text"))
    Prep.decontaminate(d, "doc_id", "text").orderBy("doc_id")
  }

  /** dedup_keep_best ([[Dedup.exactKeepBest]]): exact dedup keeping the
    * HIGHEST-QUALITY duplicate instead of the min id — every third doc
    * gains a degraded copy (boilerplate prefix, higher id) and every
    * ninth a BETTER copy (longer id but higher score), so the keeper
    * must sometimes rescue a high id (`rescued` pins those rows). Score
    * is a deterministic integer quality proxy (length minus
    * boilerplate hits); dup key is the normalized-core md5.
    */
  def dedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val degraded = d.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 1000000).as("doc_id"),
        concat(lit("click here ads ads "), col("text")).as("text"))
    val improved = d.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 2000000).as("doc_id"),
        concat(col("text"), lit(" appendix")).as("text"))
    val corpus = d.unionByName(degraded).unionByName(improved)
      // dup key: text stripped of the planted decorations; score:
      // chars minus a 1000-point boilerplate penalty plus the appendix
      // bonus — integer, deterministic, oracle-replayable
      .withColumn("core", regexp_replace(regexp_replace(col("text"),
        lit("^click here ads ads "), lit("")), lit(" appendix$"), lit("")))
      .withColumn("score",
        length(col("text")).cast("long") -
          when(col("text").startsWith("click here ads ads "), 1000L)
            .otherwise(0L))
    Dedup.exactKeepBest(
        corpus.select(md5(col("core")).as("k"), col("doc_id"), col("score")),
        Seq("k"), "doc_id", "score")
      .orderBy("keep_id")
  }

  /** Luhn card scan ([[TextAnalysis.piiLuhn]]) over a corpus with card
    * numbers planted by construction: every fifth doc gains one
    * Luhn-VALID Visa-format number, one INVALID same-length number and
    * one valid 15-digit Amex-format number — so candidate and valid
    * counts differ exactly where the checksum matters. The oracle
    * replays the run extraction and the mod-10 fold per candidate.
    */
  def textPiiLuhn(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val injected = d.withColumn("text",
      when(col("doc_id") % 5 === 0,
        concat(col("text"),
          lit(" card 4539578763621486 ref 1234567812345678"),
          lit(" amex 378282246310005")))
      .otherwise(col("text")))
    TextAnalysis.piiLuhn(injected, "doc_id", "text").orderBy("doc_id")
  }

  /** Containment dedup ([[Dedup.containmentPairs]]) over a corpus with
    * doc-in-doc duplication by construction: every doc unioned with a copy
    * (id + 1,000,000) wrapped in id-derived boilerplate tokens. The wrap
    * keeps every original shingle, so containment is 1.0 while Jaccard
    * drops below the near-dup thresholds — the pair class resemblance
    * dedup misses. At these doc lengths (≪ 160 shingles) the bottom-k
    * candidate path is provably exhaustive, so the all-pairs oracle
    * checks exact recall.
    */
  def dedupContainment(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val p = concat(lit("w"), col("doc_id").cast("string"))
    val wrapped = d.select((col("doc_id") + 1000000).as("doc_id"),
      concat(p, lit("a "), p, lit("b "), p, lit("c "), col("text"),
        lit(" "), p, lit("d "), p, lit("e")).as("text"))
    Dedup.containmentPairs(d.unionByName(wrapped), "doc_id", "text",
      threshold = 0.9)
  }

  def dedupMinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.nearDupPairs(nearDupDocs(s, dir), "doc_id", "text",
      shingleN = 3, numHashes = 16, rowsPerBand = 2, threshold = 0.5)

  /** Incremental near-dup ([[Dedup.deltaNearDupPairs]]): lake = the
    * documents table, delta = the trailing-token variants (id + 1e6).
    * The lake's [[Dedup.minhashSignatures]] frame materializes ONCE
    * (standing in for the persisted parquet artifact a daily pipeline
    * keeps) and the run hashes only the delta — the O(Δ·collisions)
    * form. Emitted pairs all involve a delta doc (a < b and delta ids
    * are the high range, so the oracle restricts its all-pairs truth to
    * b ≥ 1,000,000); banding matches [[dedupMinhashLsh]], so recall for
    * this pair class is the same audited S-curve.
    */
  def dedupIncrementalLsh(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val delta = d.select(
      (col("doc_id") + 1000000).as("doc_id"),
      expr("array_join(slice(split(text, ' '), 1, size(split(text, ' ')) - 1), ' ')").as("text"))
    val lakeSig = Dedup.minhashSignatures(d, "doc_id", "text",
      shingleN = 3, numHashes = 16).localCheckpoint(true)
    Dedup.deltaNearDupPairs(lakeSig, delta, "doc_id", "text",
      shingleN = 3, numHashes = 16, rowsPerBand = 2, threshold = 0.5)
  }

  def dedupNgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.blockedJaccardPairs(nearDupDocs(s, dir), "doc_id", "text", 0.5)

  def dedupSimhash(s: SparkSession, dir: String): DataFrame =
    Dedup.simhash(docs(s, dir), "doc_id", "text").orderBy("doc_id")

  /** Simhash Hamming-ball pairs over the near-dup corpus: the multi-index
    * band join finds EVERY pair within the distance bound
    * (pigeonhole-exact), so the oracle's brute-force all-pairs answer is
    * the contract, not just a recall target. Bound 1 here: the synthetic
    * corpus' tiny vocabulary makes signatures cluster, so wider balls
    * measure output size, not engine work (dist ≤ 3 already holds 82k
    * true pairs at sf0.01).
    */
  def dedupSimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairs(nearDupDocs(s, dir), "doc_id", "text",
      bits = 32, maxDist = 1)

  def dedupFuzzy(s: SparkSession, dir: String): DataFrame =
    Dedup.fuzzyBlockedPairs(nearDupDocs(s, dir), "doc_id", "text")

  /** Near-dup pairs → dedup GROUPS: connected components over the
    * MinHash-LSH pair list ([[Dedup.connectedComponents]] min-label
    * propagation), component id = min doc id. Covers every doc that
    * appears in at least one pair.
    */
  def dedupCluster(s: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.nearDupPairs(nearDupDocs(s, dir), "doc_id", "text",
      shingleN = 3, numHashes = 16, rowsPerBand = 2, threshold = 0.5)
    Dedup.connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("comp").as("component"))
      .orderBy("doc_id")
  }

  /** Incremental ingest dedup: a new batch (src0 docs re-ingested — half
    * verbatim, half genuinely novel) deduped against the full
    * historical corpus via the Bloom-prefiltered anti-join
    * ([[Dedup.incrementalNew]] — result provably identical to the plain
    * anti-join the oracle runs).
    */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val history = docs(s, dir).select(col("doc_id"), col("text"))
    val batch = docs(s, dir).filter(col("source") === "src0")
      .select((col("doc_id") + 5000).as("doc_id"),
        when(col("doc_id") % 40 === 0, col("text"))
          .otherwise(concat(col("text"), lit(" zz_novel"))).as("text"))
    Dedup.incrementalNew(batch, history, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Paragraph-level boilerplate over the near-dup corpus (copies share
    * most 10-token windows with their originals, so the signal is dense
    * by construction).
    */
  def dedupParagraph(s: SparkSession, dir: String): DataFrame =
    Dedup.paragraphBoilerplate(nearDupDocs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  def dedupEmbedding(s: SparkSession, dir: String): DataFrame =
    Dedup.embeddingNearDups(nearDupVecs(s, dir), "vec_id", "emb",
      bits = 16, threshold = 0.99)

  /** Cluster-scoped semantic dedup ([[Dedup.semanticDedup]]): centroids
    * from the labeled corpus (deterministic — the k-means assignment
    * step), exact cosine only within clusters; survivors keep the lowest
    * id. Each ×1.01-scaled copy lands in its original's cluster (cosine
    * is scale-invariant) at cos = 1.0, so the copies are provably all
    * dropped — plus any genuinely near-identical originals.
    */
  def dedupSemantic(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.unionByName(e.select(
      (col("vec_id") + 1000000).as("vec_id"), col("label"),
      expr("transform(emb, x -> x * 1.01D)").as("emb")))
    val centroids = Similarity.trainCentroids(corpus, "label", "emb")
    Dedup.semanticDedup(corpus.drop("label"), centroids, "vec_id", "emb",
        threshold = 0.99)
      .orderBy("vec_id")
  }

  /** MMR diversity rerank over a first-stage top-8 pool
    * ([[Similarity.mmrRerank]]): 4 greedy picks per probe at λ = 0.7.
    */
  def simMmr(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.mmrRerank(
        e.filter(col("vec_id") >= 10), e.filter(col("vec_id") < 5),
        "vec_id", "embedding")
      .orderBy("probe_id", "step")
  }

  /** Metadata-FILTERED retrieval ([[Similarity.filteredCosineTopK]]):
    * top-3 cosine among candidates sharing the probe's label — the
    * predicate constrains candidate generation (a label-keyed join),
    * never a post-filter.
    */
  def simFilteredKnn(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.filteredCosineTopK(
        e.filter(col("vec_id") >= 10), e.filter(col("vec_id") < 10),
        "vec_id", "embedding", "label", k = 3)
      .orderBy("probe_id", "rn")
  }

  /** sim_filtered_ivf ([[Similarity.filteredIvfTopK]]): the bucketed
    * scale sibling of [[simFilteredKnn]] — metadata-filtered ANN where
    * the probe scans its IVF cell ∩ its label instead of the corpus.
    */
  def simFilteredIvf(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10)
    val cents = Similarity.trainCentroids(corpus, "label", "emb")
    Similarity.filteredIvfTopK(corpus, probes, cents,
        "vec_id", "emb", "label", k = 3)
      .orderBy("probe_id", "rn")
  }

  /** Measured recall@1 of the filtered-IVF tier against the exact
    * filtered top-1 ([[Similarity.filteredCosineTopK]]) — certifies
    * [[simFilteredIvf]]; a probe whose cell is label-empty counts as a
    * miss, so both loss sources are in the number.
    */
  def simFilteredIvfRecall(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10)
    val cents = Similarity.trainCentroids(corpus, "label", "emb")
    val exact = Similarity.filteredCosineTopK(corpus, probes,
        "vec_id", "emb", "label", k = 1)
      .select(col("probe_id"), col("neighbor_id").as("true_nn"))
    val ann = Similarity.filteredIvfTopK(corpus, probes, cents,
        "vec_id", "emb", "label", k = 1)
      .select(col("probe_id"), col("neighbor_id").as("ann_nn"))
    exact.join(ann, Seq("probe_id"), "left")
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("ann_nn") === col("true_nn"), 1L).otherwise(0L)).as("hits"))
      .select(lit("filtered_ivf").as("method"), col("n_probes"), col("hits"),
        round(col("hits") / col("n_probes"), 4).as("recall_at_1"))
  }

  /** sim_range_ivf ([[Similarity.rangeSearchIvf]]): the bucketed scale
    * sibling of [[simRangeSearch]] — the radius filter runs inside the
    * probe's IVF cell.
    */
  def simRangeIvf(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10).drop("label")
    val cents = Similarity.trainCentroids(corpus, "label", "emb")
    Similarity.rangeSearchIvf(corpus.drop("label"), probes, cents,
        "vec_id", "emb", minCos = 0.25)
      .orderBy("probe_id", "neighbor_id")
  }

  /** Measured PAIR-LEVEL recall of the cell-bucketed radius search vs
    * the exact [[Similarity.rangeSearch]] truth (a radius query answers
    * a SET, so the number is found-pairs over true-pairs) — certifies
    * [[simRangeIvf]].
    */
  def simRangeIvfRecall(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10).drop("label")
    val cents = Similarity.trainCentroids(corpus, "label", "emb")
    val exact = Similarity.rangeSearch(corpus.drop("label"), probes,
        "vec_id", "emb", minCos = 0.25)
      .select(col("probe_id"), col("neighbor_id"))
    val ann = Similarity.rangeSearchIvf(corpus.drop("label"), probes, cents,
        "vec_id", "emb", minCos = 0.25)
      .select(col("probe_id"), col("neighbor_id"), lit(1L).as("found"))
    exact.join(ann, Seq("probe_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("n_pairs"),
        sum(coalesce(col("found"), lit(0L))).as("hits"))
      .select(lit("range_ivf").as("method"), col("n_pairs"), col("hits"),
        round(col("hits") / col("n_pairs"), 4).as("pair_recall"))
  }

  /** sim_reciprocal_nn ([[Similarity.reciprocalNN]]): mutual-top-1
    * pairs over the embedding corpus — the near-dup clustering seed.
    */
  def simReciprocalNn(s: SparkSession, dir: String): DataFrame =
    Similarity.reciprocalNN(embs(s, dir), "vec_id", "embedding")

  /** sim_reciprocal_nn_ivf — the bucketed scale sibling MEASURED
    * against the exact tier ([[Similarity.reciprocalNNIvf]]): mutual
    * top-1 within IVF cells (label-trained codebook), full-outer-joined
    * with the exact mutual pairs so every row carries (in_exact,
    * in_ivf) — agreement is the fraction of both-true rows, and the
    * exact-only rows are precisely the cross-cell pairs the SemDeDup
    * trade gives up (the oracle replays assignment, both pair sets and
    * the join, so the measured loss is pinned, not asserted).
    * Embeddings cast to double once so the per-cell cosine agrees with
    * the exact side bit-for-bit.
    */
  /** sim_margin_mine ([[Similarity.marginMine]]): Artetxe–Schwenk
    * ratio-margin bitext mining across the label-parity split of the
    * embedding corpus (even labels = "source side", odd = "target
    * side"). The oracle replays scoring, both k-NN density averages,
    * the two margin-argmax windows and the mutual-above-threshold
    * filter. Embeddings cast to double for bit-parity.
    */
  def simMarginMine(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    Similarity.marginMine(
        e.filter(col("label") % 2 === 0).drop("label"),
        e.filter(col("label") % 2 === 1).drop("label"),
        "vec_id", "emb")
      .orderBy("x", "y")
  }

  def simReciprocalNnIvf(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .localCheckpoint(true) // feeds centroids + both pair computations
    val cents = Similarity.trainCentroids(e, "label", "emb")
    val exact = Similarity.reciprocalNN(e.drop("label"), "vec_id", "emb")
      .withColumn("in_exact", lit(true))
    val ivf = Similarity.reciprocalNNIvf(e.drop("label"), cents,
        "vec_id", "emb")
      .withColumnRenamed("cos", "cos_ivf")
      .withColumn("in_ivf", lit(true))
    exact.join(ivf, Seq("a", "b"), "full_outer")
      .select(col("a"), col("b"),
        coalesce(col("cos"), col("cos_ivf")).as("cos"),
        coalesce(col("in_exact"), lit(false)).as("in_exact"),
        coalesce(col("in_ivf"), lit(false)).as("in_ivf"))
      .orderBy("a", "b")
  }

  def simKnnTopK(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.cosineTopK(
        e.filter(col("vec_id") >= 10), e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 3)
      .orderBy("probe_id", "rn")
  }

  /** Int8 scalar-quantization ranking ([[Similarity.sqTopK]]): the
    * memory-compression ANN tier — per-dimension codes against the
    * corpus range, exact integer-dot ranking, bit-reproducible by the
    * oracle.
    */
  def simScalarQuant(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.sqTopK(
        e.filter(col("vec_id") >= 10), e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 3)
      .orderBy("probe_id", "rn")
  }

  /** Binary-quantization ANN ([[Similarity.bqTopK]]): 1-bit sign codes
    * vs the per-dimension corpus midrange, Hamming-distance shortlist,
    * exact-dot rerank — the extreme end of the quantization family
    * (SQ8's 4x becomes ~16x; candidate scoring is xor + popcount).
    */
  def simBqAnn(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.bqTopK(
        e.filter(col("vec_id") >= 10), e.filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 3)
      .orderBy("probe_id", "rn")
  }

  def simLshAnn(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir)
    Similarity.lshTopK(
        e.filter(col("vec_id") >= 10), e.filter(col("vec_id") < 10),
        "vec_id", "embedding", bits = 4, k = 1)
      .orderBy("probe_id")
  }

  def textTokens(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tokenStats(docs(s, dir), "doc_id", "text").orderBy("doc_id")

  def textZipf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.zipf(docs(s, dir), "text")

  /** text_lexdiv — per-doc lexical-diversity profile
    * ([[TextAnalysis.lexDiversity]]): TTR, Guiraud R, Simpson repeat
    * rate, Yule's K, all off integer type-frequency statistics.
    */
  def textLexDiv(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.lexDiversity(docs(s, dir), "doc_id", "text")

  /** text_normalize — Unicode NFC normalization audit over the corpus
    * ([[graft.functions.NfcNormalize]], the codegen'd JDK normalizer;
    * DuckDB's built-in `nfc_normalize` is the oracle). The synthetic
    * docs are ASCII (already NFC), so each row is DECORATED with a
    * decomposed run derived from its id — base letters + 1..3 combining
    * acute accents (U+0301) — giving the normalizer real composition
    * work the hash gate then compares byte-for-byte. On a real corpus
    * the decoration step disappears and this is one row-local scan.
    */
  def textNormalize(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
        expr("substring(text, 1, 40) || ' cafe\u0301 ' || "
          + "repeat('e\u0301', CAST(doc_id % 3 AS INT) + 1)").as("raw"))
      .select(col("doc_id"), length(col("raw")).as("raw_chars"),
        expr("nfc_normalize(raw)").as("nfc"))
      .withColumn("nfc_chars", length(col("nfc")))
      .withColumn("composed", col("raw_chars") - col("nfc_chars"))
      .orderBy("doc_id")

  def textLangId(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.langId(docs(s, dir), "doc_id", "text").orderBy("doc_id")

  /** text_garbage — OCR-garbage screen ([[TextAnalysis.garbageScreen]])
    * over a corpus with garbage planted by construction: every fifth
    * doc gains a consonant smash, digit-letter confusions, and symbol
    * runs, so both verdict branches are oracle-exercised.
    */
  def textGarbage(s: SparkSession, dir: String): DataFrame = {
    val decorated = docs(s, dir).select(col("doc_id"), expr(
      """CASE WHEN doc_id % 5 = 0
        |  THEN concat(text, ' zzzzkrtpbq xk7q9w2 4x2b8 !!!###$$$')
        |  ELSE text END""".stripMargin).as("text"))
    TextAnalysis.garbageScreen(decorated, "doc_id", "text")
  }

  /** text_html_strip — markup removal over a corpus HTML-decorated by
    * construction ([[TextAnalysis.htmlStrip]]): every doc is wrapped in
    * nested tags with attributes and gains entity-encoded punctuation
    * derived from its id, so the oracle checks tag regex, entity
    * decode ORDER (`&amp;` last), and whitespace squeeze exactly.
    */
  def textHtmlStrip(s: SparkSession, dir: String): DataFrame = {
    val decorated = docs(s, dir).select(col("doc_id"), expr(
      """concat('<div class="d', CAST(doc_id AS STRING), '"><p>',
        |  substring(text, 1, 40), ' &amp;&lt;x&gt; ',
        |  CASE WHEN doc_id % 3 = 0 THEN '&quot;q&quot;&#39;s<br/>'
        |       ELSE '' END,
        |  substring(text, 41), '</p></div>')""".stripMargin).as("text"))
    TextAnalysis.htmlStrip(decorated, "doc_id", "text")
  }

  /** text_script — per-doc Unicode script profile
    * ([[TextAnalysis.scriptProfile]]): Latin/CJK/digit/space/other
    * char-class counts and the latin-vs-han dominance call.
    */
  def textScript(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.scriptProfile(docs(s, dir), "doc_id", "text")

  def textQuality(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.quality(docs(s, dir), "doc_id", "text").orderBy("doc_id")

  def textFingerprint(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.fingerprint(docs(s, dir), "doc_id", "text").orderBy("doc_id")

  def textReadability(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.readability(docs(s, dir), "doc_id", "text").orderBy("doc_id")

  def textSentiment(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.sentiment(docs(s, dir), "doc_id", "text").orderBy("doc_id")

  /** Decontamination sweep: docs from source `src0` act as the held-out
    * benchmark; every OTHER doc is checked for 5-gram collisions with it.
    */
  def textContamination(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    TextAnalysis.contamination(
        d.filter(col("source") =!= "src0"),
        d.filter(col("source") === "src0"),
        "doc_id", "text", n = 5)
      .orderBy("doc_id")
  }

  def textLmScore(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramLogProb(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  def textHashTf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.hashingTf(docs(s, dir), "doc_id", "text", dim = 64)
      .orderBy("doc_id", "bucket")

  def textBpePairs(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bpePairStats(docs(s, dir), "doc_id", "text", k = 10)

  def textBigramLm(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bigramLogProb(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Corpus-wide top 3-grams through the NATIVE [[graft.functions.NGrams]]
    * generator — the custom-Generator extension path driven end-to-end
    * (grams stream straight out of the token array, no per-doc gram
    * array materialization). Top-10 by (count desc, gram).
    */
  def textNgramsNative(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(expr("ngrams(split(text, ' '), 3)"))
      .groupBy("gram").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram")).limit(10)

  /** DSIR importance-resampled top-100 ([[TextAnalysis.dsirTopK]]):
    * target = English documents, features = 256-bucket hashed
    * uni+bigrams, derandomized Gumbel noise — the data-selection tilt
    * toward a target domain, oracle-replayed end to end.
    */
  def textDsir(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.dsirTopK(docs(s, dir), "doc_id", "text",
      targetPred = col("lang") === "en", buckets = 256, k = 100)

  /** Kneser–Ney-smoothed bigram surprisal
    * ([[TextAnalysis.kneserNeySurprisal]]) — the production LM-quality
    * filter form.
    */
  def textKneserNey(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.kneserNeySurprisal(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Trigram interpolated KN ([[TextAnalysis.kneserNeyTrigram]]) — the
    * three-level recursion at the order production corpus filters run.
    */
  def textKneserNey3(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.kneserNeyTrigram(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  def textChi2(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.chi2TopK(docs(s, dir), "doc_id", "text")

  /** URL canonicalization over id-derived messy URLs (mixed case,
    * default and non-default ports, empty paths, unsorted + tracking
    * params, fragments — every RFC 3986 normalization rule fires
    * somewhere in the corpus); `n_dupes` counts how many docs collapse
    * onto each canonical key, the dedup the operator exists for.
    */
  def textUrlCanon(s: SparkSession, dir: String): DataFrame = {
    val raw = expr(
      """concat(
        |  CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'hTtPs' END,
        |  '://ExAmPle-', CAST(doc_id % 7 AS STRING), '.CoM',
        |  CASE WHEN doc_id % 3 = 0 THEN ':80'
        |       WHEN doc_id % 3 = 1 THEN ':443' ELSE ':8080' END,
        |  CASE WHEN doc_id % 4 = 0 THEN ''
        |       ELSE concat('/Path/', CAST(doc_id % 11 AS STRING)) END,
        |  '?b=', CAST(doc_id % 5 AS STRING),
        |  '&utm_source=x&a=', CAST(doc_id % 3 AS STRING),
        |  CASE WHEN doc_id % 2 = 0 THEN '#frag' ELSE '' END)""".stripMargin)
    val canon = TextAnalysis.urlCanon(
      docs(s, dir).select(col("doc_id"), raw.as("url")), "doc_id", "url")
    val w = org.apache.spark.sql.expressions.Window.partitionBy("canon")
    canon.select(col("doc_id"), col("canon"),
        count(lit(1)).over(w).as("n_dupes"))
      .orderBy("doc_id")
  }

  /** The stoplist shared verbatim with the oracle: the corpus's
    * function words plus its adjectives, so phrase breaks fire
    * mid-document everywhere.
    */
  private[graft] val RakeStop =
    Seq("the", "a", "small", "big", "fast", "slow")

  def textRake(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.rakeTopK(docs(s, dir), "doc_id", "text", RakeStop)

  def textPmi(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.pmiTopK(docs(s, dir), "doc_id", "text", k = 20, minCount = 5)

  def textLlr(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.llrTopK(docs(s, dir), "doc_id", "text", k = 20, minCount = 5)

  def textStem(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.stemTopK(docs(s, dir), "doc_id", "text", k = 20)

  def textHeaps(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.heaps(docs(s, dir), "doc_id", "text")

  def textBurstiness(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.burstiness(docs(s, dir), "doc_id", "text", k = 15)

  /** Capacity 4096 > the corpus's distinct-bigram count at every test
    * scale, so the sketch is exact here and DuckDB's exact aggregate is
    * the oracle; HeavyHittersSpec pins the lossy small-k bounds.
    */
  def textHeavyHitters(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.heavyHitters(docs(s, dir), "text", k = 4096, minEst = 3L)
      .orderBy("gram")

  def textCmsProbe(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.cmsFreqProbe(docs(s, dir), "doc_id", "text")
      .orderBy("gram")

  /** KMV distinct-overlap WITH the in-query tolerance cross-check (the
    * dedup_approx_hll pattern): the 5-gram domains (~24k–240k grams)
    * genuinely saturate the k=1024 sketch, so the registered query
    * exercises the real estimator. It emits the EXACT overlap numbers
    * (the verification harness — a production pipeline runs the bare
    * sketch) plus two flags the oracle pins TRUE: the union estimate
    * within 10% (≈3σ at k=1024) and the Jaccard estimate within 0.02
    * absolute (≈7σ at the fixture's J≈0.005). Estimates are
    * deterministic (fixed hash, fixed data), so the flags are too.
    */
  def textOverlapKmv(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val a = d.filter(col("source") =!= "src0")
    val b = d.filter(col("source") === "src0")
    // one gram-domain pass per side feeds BOTH the sketch and the exact
    // verification counts (without the checkpoint each side scanned twice)
    val ga = TextAnalysis.gramHashes(a, "text", n = 5).localCheckpoint(true)
    val gb = TextAnalysis.gramHashes(b, "text", n = 5).localCheckpoint(true)
    def bottomK(df: org.apache.spark.sql.DataFrame): Array[Long] =
      df.orderBy("h").limit(1024).collect().map(_.getLong(0))
    val est = TextAnalysis.kmvEstimate(s, bottomK(ga), bottomK(gb), 1024).head()
    val nA = ga.count()
    val nB = gb.count()
    val nI = ga.join(gb, "h").count()
    val nU = nA + nB - nI
    val j = if (nU == 0) 0.0 else nI.toDouble / nU
    val unionOk = math.abs(est.getLong(2) - nU) <= 0.10 * nU
    val jaccardOk = math.abs(est.getDouble(4) - j) <= 0.02
    import s.implicits._
    Seq((nA, nB, nU, nI,
        BigDecimal(j).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        unionOk, jaccardOk))
      .toDF("n_a", "n_b", "n_union", "n_inter", "jaccard",
        "kmv_union_ok", "kmv_jaccard_ok")
  }

  def textRepetition(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.repetition(docs(s, dir), "doc_id", "text", n = 2)
      .orderBy("doc_id")

  def textSegments(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.segmentLangId(docs(s, dir), "doc_id", "text", segTokens = 20)
      .orderBy("doc_id", "seg_idx")

  def mmBinaryMeta(s: SparkSession, dir: String): DataFrame =
    Multimodal.binaryMeta(s, docs(s, dir))

  /** Partition-wise REAL decode (typed mapPartitions, one decoder context
    * per partition, [[Multimodal.decodeHeader]] parsing actual PPM bytes)
    * + the feature-extract pass over the DECODED pixel region — the full
    * media-pipeline plumbing driven end-to-end. The fixture payloads are
    * real P6 images from the closed-form generator
    * ([[Multimodal.ppmMedia]]), so the oracle reproduces geometry and
    * pixel features from the generator formula while the engine parses
    * bytes it has never seen the formula for.
    */
  def mmDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.ppmMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .localCheckpoint(true) // feeds decode, stats, and the pixel slice
    val mediaDs = media.as[Multimodal.MediaRow]
    val decoded = Multimodal.decodeImages(mediaDs).toDF()
    // pixel_off comes from the PARSED header — the substring below reads
    // exactly the pixel array the decoder located, not a construction
    // constant
    val stats = Multimodal.decodePixels(mediaDs).toDF()
      .select(col("doc_id"), col("pixel_off"),
        (col("width") * col("height") * col("channels")).as("n_px_bytes"))
    val pixels = media.join(stats, "doc_id")
      .select(col("doc_id"),
        expr("substring(data, pixel_off + 1, n_px_bytes)").as("data"))
    val features = Multimodal.featurize(pixels, dims = 4)
      .select(col("doc_id"), col("features"))
    decoded.join(features, "doc_id")
      .select(col("doc_id"), col("width"), col("height"), col("channels"),
        // serialized scalar, not ARRAY<BIGINT>: external compare harnesses
        // sort/hash columns and cannot order array cells
        array_join(col("features"), ",").as("features_csv"))
      .orderBy("doc_id")
  }

  /** Incremental perceptual dedup against a persisted signature
    * artifact ([[Multimodal.deltaDctNearDups]]): day 1 decodes the
    * image lake once and writes its `(doc_id, ph)` aHash frame to
    * parquet; day 2's delta (the perturbed re-uploads) is the ONLY side
    * decoded — the lake enters as 8-byte signatures read back from
    * disk. Emits exactly the delta-involving pairs of the
    * [[mmPhashNearDup]] surface; the oracle recomputes the full pair
    * set from the generator and keeps the `b ≥ 10⁶` (delta-involving)
    * class.
    */
  def mmIncrementalPhash(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = docs(s, dir).select(col("doc_id"))
    val lakeMedia = Multimodal.ppmMedia(base, "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes")).as[Multimodal.MediaRow]
    val artifact = java.nio.file.Files
      .createTempDirectory("graft_phash_art").toString
    Multimodal.decodePixels(lakeMedia).toDF()
      .select(col("doc_id"), col("ph"))
      .write.mode("overwrite").parquet(artifact)
    val delta = Multimodal.ppmMedia(
        base.select((col("doc_id") + 1000000).as("doc_id"),
          col("doc_id").as("seed")),
        "doc_id", "seed", deltaSql = "IF(i < 6, 8, 0)")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes")).as[Multimodal.MediaRow]
    val lakeSig = s.read.parquet(artifact)
    Multimodal.deltaDctNearDups(lakeSig, delta).orderBy("a", "b")
  }

  /** The BMP leg of the real-decode pipeline ([[Multimodal.bmpMedia]]
    * fixtures through [[Multimodal.decodeImages]] +
    * [[Multimodal.decodePixels]]): parsed little-endian geometry plus
    * the luminance total over the REAL pixel walk — which is only
    * correct if the decoder honors the 4-byte row padding, the
    * bottom-up row order, and the BGR channel weights (the oracle sums
    * the generator formula with the BGR weight per in-row byte
    * position and skips padding bytes; any stride/order/channel mistake
    * in the engine's walk changes the total).
    */
  def mmBmpDecode(s: SparkSession, dir: String): DataFrame =
    mediaDecodeStats(Multimodal.bmpMedia(docs(s, dir), "doc_id", "doc_id"))

  /** The COMPRESSED leg of the real-decode pipeline
    * ([[Multimodal.pngMedia]] fixtures through the
    * [[Multimodal.decodePng]] inflate + defilter path): parsed IHDR
    * geometry plus the luminance total over the DEFILTERED pixels —
    * which is only correct if the decoder concatenates IDAT framing,
    * inflates the zlib stream, and reverses the Sub/Up row filters (the
    * fixture stores per-row DELTAS; the oracle sums the closed-form raw
    * pixel formula, so a decoder that skips any of those steps changes
    * the total).
    */
  def mmPngDecode(s: SparkSession, dir: String): DataFrame =
    mediaDecodeStats(Multimodal.pngMedia(docs(s, dir), "doc_id", "doc_id"))

  /** The ADAM7 leg ([[Multimodal.pngMediaInterlaced]] fixtures through
    * [[Multimodal.decodePng]]'s 7-pass defilter + scatter): the SAME
    * pixel field as [[mmPngDecode]], so the oracle row set is identical
    * — the engine only matches it by walking the reduced-image stream
    * with correct pass origins/strides and per-pass filter state.
    */
  def mmPngInterlaced(s: SparkSession, dir: String): DataFrame =
    mediaDecodeStats(
      Multimodal.pngMediaInterlaced(docs(s, dir), "doc_id", "doc_id"))

  /** EXIF-in-JPEG auto-rotate ([[Jpeg.exifRotate]]): tag 274 read from
    * a REAL APP1 segment (the EXIF container is a TIFF — one parser for
    * both carriers, [[Tiff.orientationOnly]]), then decode + correcting
    * rotations with the rotation-pinning probes. The dominant
    * real-world form: cameras emit JPEG with metadata orientation, not
    * rotated rasters. Oracle replays the block-constant closed form
    * under the inverse rotation maps (sums are order-invariant, so
    * row/column reversals drop out).
    */
  def mmJpegExif(s: SparkSession, dir: String): DataFrame = {
    val media = Jpeg.exifJpegMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow](org.apache.spark.sql.Encoders.product)
    Jpeg.exifRotate(media).toDF().orderBy("doc_id")
  }

  /** The PALETTE-indexed leg ([[Multimodal.pngMediaPalette]] fixtures
    * through [[Multimodal.decodePng]]'s packed-row defilter + PLTE
    * expansion): bit-depth-4 indices, 1-byte filter unit over packed
    * bytes, tRNS-driven RGB/RGBA split by seed parity — the oracle
    * replays index field, palette formulas and luminance in closed
    * form, and the channels column pins the tRNS detection.
    */
  def mmPngPalette(s: SparkSession, dir: String): DataFrame =
    mediaDecodeStats(
      Multimodal.pngMediaPalette(docs(s, dir), "doc_id", "doc_id"))

  /** The RUN-LENGTH-ENCODED leg ([[Tga.tgaMedia]] fixtures through
    * [[Tga.decode]]'s packet walk): raw vs RLE packets alternate per
    * row, BGR order, top-down descriptor — the oracle replays the
    * closed-form pixel field, so a packet-kind or channel-order
    * mistake changes the luminance total.
    */
  def mmTgaDecode(s: SparkSession, dir: String): DataFrame =
    mediaDecodeStats(Tga.tgaMedia(docs(s, dir), "doc_id", "doc_id"))

  /** The CHUNK-OP leg ([[Qoi.qoiMedia]] fixtures through [[Qoi.decode]]'s
    * running-index state machine): four-pixel groups alternating
    * QOI_OP_RGB / DIFF / LUMA / RUN, so a decoder that confuses the op
    * classes, their biases, or the mod-256 wrap changes the luminance
    * total; INDEX/RGBA ops are spec-pinned on hand vectors.
    */
  def mmQoiDecode(s: SparkSession, dir: String): DataFrame =
    mediaDecodeStats(Qoi.qoiMedia(docs(s, dir), "doc_id", "doc_id"))

  /** The MULTI-IMAGE DIRECTORY leg ([[Ico.icoMedia]] two-entry fixtures
    * through [[Ico.icoStats]]'s directory walk): per contained image
    * the parsed geometry, the luminance total over the bottom-up BGR
    * XOR block (row padding skipped), and the AND-mask transparency
    * count (width-bounded — mask padding bits are deliberately set in
    * the fixture to catch over-reads).
    */
  def mmIcoDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Ico.icoMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Ico.icoStats(media).toDF().orderBy("doc_id", "img_idx")
  }

  /** The INTERPOLATING-RESIZE leg ([[Multimodal.ppmMedia]] fixtures
    * through [[Multimodal.bilinearStats]]'s fixed-point align-corners
    * resample): the oracle rebuilds per-pixel luminance from the
    * closed-form byte field and replays the exact 1/225-unit
    * interpolation — grid mapping, weights, and corner anchoring all
    * pinned with no float anywhere.
    */
  def mmResizeBilinear(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.ppmMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Multimodal.bilinearStats(media).toDF().orderBy("doc_id")
  }

  /** The HISTOGRAM-ANALYSIS leg ([[Multimodal.ppmMedia]] pseudo-random
    * fixtures through [[Multimodal.otsuStats]]): the oracle rebuilds the
    * gray histogram from the closed-form byte field and replays the
    * between-class-variance argmax over observed levels — candidate
    * set, score expression, and smallest-t tiebreak all pinned.
    */
  def mmOtsu(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.ppmMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Multimodal.otsuStats(media).toDF().orderBy("doc_id")
  }

  /** The NEIGHBORHOOD-STENCIL leg ([[Multimodal.ppmMediaLinear]] linear
    * gradients through [[Multimodal.sobelStats]]'s real 3×3
    * convolution): the oracle predicts every interior response in
    * closed form (8a/8b per pixel in luminance micro-units) while the
    * engine must run the actual stencil with correct kernel
    * orientation, signs, and border exclusion.
    */
  def mmSobel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.ppmMediaLinear(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Multimodal.sobelStats(media).toDF().orderBy("doc_id")
  }

  /** The ASCII-Netpbm (P3) leg ([[Multimodal.ppmAsciiMedia]] fixtures
    * through [[Multimodal.decodePpmAscii]]'s token walk): the SAME
    * pixel field as the binary PPM leg, so the closed-form luminance
    * oracle pins the decimal-token parser — a dropped comment, a
    * mis-split token, or an offset slip changes the total.
    */
  def mmPpmAscii(s: SparkSession, dir: String): DataFrame =
    mediaDecodeStats(
      Multimodal.ppmAsciiMedia(docs(s, dir), "doc_id", "doc_id"))

  /** The ORIENTATION-CORRECTION leg ([[Tiff.exifMedia]] fixtures
    * carrying tag 274 through [[Tiff.exifRotate]]): all four rotation
    * orientations exercised; the oracle replays the rotated corner and
    * first-row probes in closed form, so running the WRONG rotation —
    * or none — fails even though the luminance total is invariant.
    */
  def mmExifRotate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Tiff.exifMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Tiff.exifRotate(media).toDF().orderBy("doc_id")
  }

  /** The GRAYSCALE-Netpbm (P5) leg ([[Multimodal.pgmMedia]] fixtures
    * through the 1-channel header/pixel path): completes the Netpbm
    * family (P6 binary RGB, P3 ASCII RGB, P5 binary gray); the
    * closed-form 1000·gray luminance oracle pins the single-channel
    * stride and offset handling.
    */
  def mmPgmDecode(s: SparkSession, dir: String): DataFrame =
    mediaDecodeStats(Multimodal.pgmMedia(docs(s, dir), "doc_id", "doc_id"))

  /** The BASELINE-JPEG leg of the real-decode pipeline ([[Jpeg.jpegMedia]]
    * grayscale fixtures through [[Jpeg.decode]]'s huffman + dequant +
    * integer-IDCT path): parsed SOF geometry plus the luminance total over
    * the REAL reconstructed pixels — exact because the fixtures are
    * per-block-constant (DC-only blocks survive quantize(1)/IDCT
    * bit-exactly), so the oracle predicts every decoded sample in closed
    * form while the engine must actually run canonical-Huffman decode,
    * differential-DC reconstruction, dequantization, the IDCT, and
    * edge-block cropping (w, h are non-multiples of 8) to reproduce it.
    */
  /** Shared decode-stats pipeline of the per-format media legs
    * (BMP/PNG/JPEG rows): checkpoint the fixture payloads once, run the
    * geometry and pixel-stats decode passes off the same frame, join the
    * two bounded results on doc_id.
    */
  private def mediaDecodeStats(media0: DataFrame): DataFrame = {
    val s = media0.sparkSession
    import s.implicits._
    val media = media0
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .localCheckpoint(true) // feeds both decode passes
    val mediaDs = media.as[Multimodal.MediaRow]
    val decoded = Multimodal.decodeImages(mediaDs).toDF()
      .select(col("doc_id"), col("width"), col("height"), col("channels"))
    val stats = Multimodal.decodePixels(mediaDs).toDF()
      .select(col("doc_id"), col("lum_total"))
    decoded.join(stats, "doc_id").orderBy("doc_id")
  }

  def mmJpegDecode(s: SparkSession, dir: String): DataFrame =
    mediaDecodeStats(Jpeg.jpegMedia(docs(s, dir), "doc_id", "doc_id",
      color = false))

  /** The PALETTE-INDEXED / dictionary-compressed leg of the real-decode
    * pipeline ([[Gif.gifMedia]] fixtures through [[Gif.decode]]'s
    * sub-block reassembly + LZW + color-table expansion): parsed
    * descriptor geometry plus the luminance total over palette-expanded
    * RGB — only correct if the decoder actually reassembles sub-blocks,
    * decodes the LZW code stream, and maps every index through the
    * global color table (the oracle sums the closed-form palette
    * formula over the closed-form index stream).
    */
  def mmGifDecode(s: SparkSession, dir: String): DataFrame =
    mediaDecodeStats(Gif.gifMedia(docs(s, dir), "doc_id", "doc_id"))

  /** Shot-boundary detection over REAL decoded video-like frames — the
    * [[mmGifFrames]] surface driven through the scene-detect pipeline
    * (what `mm_scene_detect` runs over synthetic frames, now on actual
    * LZW-decoded GIF animation frames): per frame the composited-screen
    * luminance, then a per-doc lag window flags cuts where the
    * frame-to-frame jump exceeds the threshold. The fixture guarantees a
    * ≥75-palette-slot jump exactly at frame 3 and one-slot drift inside
    * scenes, so the flags are deterministic; the oracle replays the
    * closed-form per-frame luminance and the same lag rule.
    */
  def mmGifScene(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val frames = Gif.gifSceneMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        Gif.decodeFrames(bytes) match {
          case Some((w, h, fs)) => fs.map { f =>
            var lum = 0L
            var p = 0
            while (p < w * h) {
              lum += 299L * (f.px(p * 3) & 0xFF) +
                587L * (f.px(p * 3 + 1) & 0xFF) +
                114L * (f.px(p * 3 + 2) & 0xFF)
              p += 1
            }
            (id, f.index, w.toLong * h, lum)
          }
          case None => Seq((id, -1, 0L, 0L))
        }
      })
      .toDF("doc_id", "frame_idx", "n_px", "lum_total")
    val wnd = Window.partitionBy("doc_id").orderBy("frame_idx")
    frames
      .withColumn("lum_diff",
        col("lum_total") - lag("lum_total", 1).over(wnd))
      // cut threshold: > 40 palette slots of mean jump (2000/slot/pixel);
      // within-scene steps are exactly 1 slot, the cut is >= 75
      .withColumn("is_cut",
        coalesce(abs(col("lum_diff")) >
          lit(40L) * 2000L * col("n_px"), lit(false)))
      .select(col("doc_id"), col("frame_idx"), col("lum_total"),
        coalesce(col("lum_diff"), lit(0L)).as("lum_diff"), col("is_cut"))
      .orderBy("doc_id", "frame_idx")
  }

  /** The ANIMATED (multi-frame) GIF leg ([[Gif.decodeFrames]]): every
    * frame decoded and COMPOSITED per the GIF89a Graphic Control
    * semantics — frame 1 a sub-rect over the full frame-0 screen,
    * frame 2 a sub-rect with a TRANSPARENT index whose pixels keep
    * showing the prior composite — emitting per-frame delay and the
    * luminance total of the full composited screen. The oracle replays
    * the per-pixel latest-covering-frame CASE in closed form, so any
    * placement/transparency/compositing mistake changes a frame's total.
    * Row-local mapPartitions decode, zero shuffles before the final sort.
    */
  def mmGifFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Gif.gifAnimMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"))
      .as[(Long, Array[Byte])]
      .mapPartitions(it => it.flatMap { case (id, bytes) =>
        Gif.decodeFrames(bytes) match {
          case Some((w, h, frames)) => frames.map { f =>
            var lum = 0L
            var p = 0
            while (p < w * h) {
              lum += 299L * (f.px(p * 3) & 0xFF) +
                587L * (f.px(p * 3 + 1) & 0xFF) +
                114L * (f.px(p * 3 + 2) & 0xFF)
              p += 1
            }
            (id, f.index, f.delayCs, w, h, lum)
          }
          case None => Seq((id, -1, 0, 0, 0, 0L)) // refusal marker row
        }
      })
      .toDF("doc_id", "frame_idx", "delay_cs", "width", "height",
        "lum_total")
      .orderBy("doc_id", "frame_idx")
  }

  /** The VIDEO container leg ([[Avi.aviMedia]] fixtures through
    * [[Avi.decodeFrames]]'s RIFF walk + per-frame [[Jpeg.decode]]):
    * MJPEG-in-AVI clips — avih geometry/frame-rate, word-aligned skip
    * of an odd JUNK chunk and an interleaved audio chunk, `00dc` frame
    * payloads each a complete baseline JPEG — emitting the per-frame
    * luminance table with the scene-cut lag rule over it (the
    * [[mmGifScene]] shape on a REAL video container). The fixture
    * guarantees a +129/pixel jump exactly at frame 2 and +1/pixel drift
    * inside scenes (values bounded below 256, so deltas never wrap);
    * the oracle replays the closed-form per-frame luminance and the
    * same lag rule. Row-local decode, zero shuffles before the final
    * sort.
    */
  def mmVideoFrames(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val frames = Avi.videoFrames(
      Avi.aviMedia(docs(s, dir), "doc_id", "doc_id"))
    val wnd = Window.partitionBy("doc_id").orderBy("frame_idx")
    frames
      .withColumn("lum_diff",
        coalesce(col("lum_total") - lag("lum_total", 1).over(wnd), lit(0L)))
      // cut threshold: > 40 luminance milli-units per pixel of mean
      // jump; within-scene drift is exactly 1000·n_px, the cut 129000·n_px
      .withColumn("is_cut", abs(col("lum_diff")) >
        lit(40000L) * col("width") * col("height"))
      .select(col("doc_id"), col("frame_idx"), col("frame_ms"),
        col("width"), col("height"), col("lum_total"), col("lum_diff"),
        col("is_cut"))
      .orderBy("doc_id", "frame_idx")
  }

  /** The AUDIO track of the same video container ([[Avi.decodeAudio]]:
    * the `##wb` chunks the frame walk skips are PCM16 the [[Wav]] leg
    * already speaks): per-clip audio features (Σs² energy, peak — the
    * [[Wav.wavStats]] math) joined with the video geometry and both
    * durations, over clips whose interleaved stream-01 track is split
    * across two `01wb` chunks and shares the movi LIST with an
    * undeclared-stream `03wb` chunk both walks must skip. The oracle
    * replays the closed-form sample stream
    * `((seed·31 + k·17) mod 4001) − 2000` per clip. Row-local decode,
    * zero shuffles before the final sort.
    */
  def mmVideoAudio(s: SparkSession, dir: String): DataFrame =
    Avi.videoAudio(Avi.aviMedia(docs(s, dir), "doc_id", "doc_id"))
      .orderBy("doc_id")

  /** The MSB-first / early-change LZW leg ([[Tiff.tiffMedia]] fixtures
    * through [[Tiff.decode]]'s IFD walk + strip decompress): the same
    * dictionary algorithm as GIF with the opposite bit order — a decoder
    * that mixes the two variants produces garbage for one of them, so
    * the pair pins both.
    */
  def mmTiffDecode(s: SparkSession, dir: String): DataFrame =
    mediaDecodeStats(Tiff.tiffMedia(docs(s, dir), "doc_id", "doc_id"))

  /** The 4:2:0 COLOR leg of the JPEG pipeline: interleaved Y₀Y₁Y₂Y₃ Cb Cr
    * MCUs with restart markers (interval 3 — DC predictors reset and
    * re-align mid-scan), 2×2 luma / 1×1 chroma sampling, replication
    * upsampling, and the fixed-point BT.601 YCbCr→RGB conversion. The
    * oracle reproduces the SAME integer conversion formula, so any
    * mistake in subsampling geometry, predictor resets, or the conversion
    * constants changes the luminance total.
    */
  def mmJpegColor(s: SparkSession, dir: String): DataFrame =
    mediaDecodeStats(Jpeg.jpegMedia(docs(s, dir), "doc_id", "doc_id",
      color = true))

  /** The PROGRESSIVE (SOF2) JPEG leg — the encoding web-scraped media
    * corpora are dominated by: multi-scan spectral-selection +
    * successive-approximation files ([[Jpeg.progressiveGrayFixture]]:
    * DC first/refinements, banded AC first/refinements, EOB runs,
    * per-scan restart markers) through [[Jpeg.decode]]'s Annex-G scan
    * loop. Fixtures stay per-block-constant so the oracle is the same
    * closed form as the baseline leg — the engine only matches it by
    * accumulating coefficients correctly across all seven scans.
    */
  def mmJpegProgressive(s: SparkSession, dir: String): DataFrame =
    mediaDecodeStats(Jpeg.jpegProgressiveMedia(docs(s, dir), "doc_id",
      "doc_id"))

  /** The AUDIO container leg ([[Wav.wavMedia]] fixtures through
    * [[Wav.decodeHeader]]'s RIFF chunk walk + [[Wav.wavStats]]'s one-pass
    * PCM16 sample scan): parsed channels/rate/frames plus Long-exact
    * energy (Σ s²) and peak magnitude over the REAL interleaved samples —
    * which is only correct if the decoder skips the embedded odd-length
    * LIST chunk with word alignment and decodes signed little-endian
    * 16-bit words; the oracle recomputes the closed-form sample formula.
    */
  def mmWavDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Wav.wavMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Wav.wavStats(media).toDF().orderBy("doc_id")
  }

  /** The COMPRESSED audio leg ([[Flac.flacMedia]] fixtures through
    * [[Flac.decode]]'s frame walk — CRC-verified headers/bodies, FIXED
    * predictors, Rice residuals, left/side decorrelation): the SAME
    * closed-form samples as [[mmWavDecode]] round-tripped through the
    * reference FLAC encoder, so the energy/peak/geometry row set must
    * be IDENTICAL to the WAV leg's — lossless compression pinned by
    * cross-format parity, the verdict-prescribed oracle.
    */
  def mmFlacDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Flac.flacMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Flac.flacStats(media).toDF().orderBy("doc_id")
  }

  /** Rational 3:2 linear upsampling over decoded channel-0 PCM
    * ([[Wav.wavResample]]) — exact integer interpolation, per-doc
    * energy/peak pinned against the closed-form fixture replay.
    */
  def mmAudioResample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Wav.wavMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Wav.wavResample(media).toDF().orderBy("doc_id")
  }

  /** G.711 μ-law companding round trip over decoded channel-0 PCM
    * ([[Wav.wavMulaw]]) — the telephony codec leg: per-doc
    * reconstruction energy/peak and max companding error, all-integer
    * segment/mantissa arithmetic the oracle replays from the
    * closed-form fixture samples.
    */
  def mmAudioMulaw(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Wav.wavMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Wav.wavMulaw(media).toDF().orderBy("doc_id")
  }

  /** The ADAPTIVE-DIFFERENTIAL audio leg ([[Adpcm.adpcmMedia]] fixtures
    * through [[Adpcm.adpcmStats]]'s step-table nibble walk): every block
    * shares one nibble pattern and initial index, so the decoded stream
    * is predictor + a closed-form offset sequence — the oracle replays
    * it exactly while the engine must run the real 89-entry step-size
    * recurrence, index adaptation, nibble ordering, and the
    * header-sample emission to reproduce the energy.
    */
  def mmAudioAdpcm(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Adpcm.adpcmMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Adpcm.adpcmStats(media).toDF().orderBy("doc_id")
  }

  /** mm_audio_trim ([[Wav.wavTrim]] over [[Wav.wavMediaPadded]]
    * silence-padded fixtures): the trimmed span, its length, and the
    * kept-sample energy/peak — the oracle scans the same closed-form
    * padded signal for the first/last nonzero.
    */
  def mmAudioTrim(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Wav.wavMediaPadded(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Wav.wavTrim(media).toDF().orderBy("doc_id")
  }

  /** mm_audio_downmix ([[Wav.wavDownmix]]): stereo→mono floor-average
    * with mono passthrough; the fixture corpus alternates 1- and
    * 2-channel payloads by seed, so both paths are oracle-exercised.
    */
  def mmAudioDownmix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Wav.wavMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Wav.wavDownmix(media).toDF().orderBy("doc_id")
  }

  /** Audio framing over DECODED PCM ([[Wav.wavFrames]]): 64-sample
    * frames every 32 samples of channel 0 with per-frame energy/peak —
    * the STFT layout over real samples (the raw-byte
    * [[Multimodal.frameEnergy]] sibling frames the container bytes;
    * this frames what a spectral pipeline actually consumes). The oracle
    * replays the closed-form channel-0 sample formula per frame, so any
    * interleave/stride/window mistake changes a frame's energy.
    */
  def mmWavFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Wav.wavMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Wav.wavFrames(media).toDF().orderBy("doc_id", "frame_id")
  }

  /** The spectral leg over the same WAV fixtures ([[Wav.stftPower]]):
    * per-doc per-bin DFT power totals, integer-exact end to end — the
    * oracle replays the closed-form samples against the interpolated
    * fixed-point basis tables, so any framing, channel-stride, or
    * window mistake changes a bin total.
    */
  def mmStftPower(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Wav.wavMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Wav.stftPower(media).toDF().orderBy("doc_id", "bin")
  }

  /** Orientation transform slot ([[Multimodal.rotateProbes]]): decode →
    * rotate 90° CW → probes the oracle recomputes closed-form from the
    * PPM pixel formula (corners swap to bottom-left/top-left/…, the
    * first row becomes the old first column, the luminance total is
    * invariant).
    */
  def mmRotate90(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.ppmMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
      .as[Multimodal.MediaRow]
    Multimodal.rotateProbes(media).toDF().orderBy("doc_id")
  }

  /** Resize slot of the media pipeline: REAL decoded dims →
    * aspect-preserving fit into a 256×224 box ([[Multimodal.resizeDims]]
    * — exact integer math, the computation every real resize does before
    * its pixel pass).
    */
  def mmResize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.ppmMedia(docs(s, dir), "doc_id", "doc_id")
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
    val decoded = Multimodal.decodeImages(media.as[Multimodal.MediaRow]).toDF()
    Multimodal.resizeDims(decoded, targetW = 256, targetH = 224)
      .select("doc_id", "width", "height", "rw", "rh")
      .orderBy("doc_id")
  }

  /** Deterministic frame sampling (seek + stride over the payload): every
    * 7th byte, reported as the hex concatenation so an external oracle can
    * reproduce the exact sampled bytes.
    */
  def mmFrameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleBytes(
        Multimodal.attachBinary(docs(s, dir), "doc_id", "text"), stride = 7)
      .select(col("doc_id"),
        size(col("sampled")).cast("long").as("n_samples"),
        expr("array_join(transform(sampled, x -> hex(x)), '')").as("sample_hex"))
      .orderBy("doc_id")

  /** Audio-leg framing over the binary payloads: 64-byte frames every 32
    * bytes (50% overlap), per-frame energy + peak
    * ([[Multimodal.frameEnergy]]).
    */
  def mmAudioFrames(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameEnergy(
        Multimodal.attachBinary(docs(s, dir), "doc_id", "text"),
        frameLen = 64, hop = 32)
      .orderBy("doc_id", "frame_idx")

  /** Spectral frame features ([[Multimodal.frameDct]]): the DCT-II
    * spectrum (u = 1..7, shared fixed-point basis) of every mean-centered
    * 32-sample frame — the shape MFCC pipelines start from; serialized
    * per frame so the oracle pins every coefficient.
    */
  def mmFrameDct(s: SparkSession, dir: String): DataFrame =
    Multimodal.frameDct(
        Multimodal.attachBinary(docs(s, dir), "doc_id", "text"))
      .orderBy("doc_id", "frame_idx")

  /** Shot-boundary detection over the framed payloads: energy jumps above
    * 300 against the previous frame start a new scene
    * ([[Multimodal.sceneChanges]] over [[Multimodal.frameEnergy]] rows).
    */
  def mmSceneDetect(s: SparkSession, dir: String): DataFrame =
    Multimodal.sceneChanges(
        Multimodal.frameEnergy(
          Multimodal.attachBinary(docs(s, dir), "doc_id", "text"),
          frameLen = 64, hop = 32),
        threshold = 300L)
      .orderBy("doc_id")

  /** Deterministic class rebalance: every language stratum downsampled to
    * the smallest stratum's size by portable-hash rank
    * ([[Prep.balanceStrata]]).
    */
  def prepBalance(s: SparkSession, dir: String): DataFrame =
    Prep.balanceStrata(docs(s, dir).select(col("doc_id"), col("lang")),
        "doc_id", "lang")
      .orderBy("doc_id")

  /** Deterministic domain-mixture sample over the language strata
    * ([[Prep.mixStrata]]): the largest corpus hitting a 40/20/20/10/10
    * en/de/es/fr/zh target exactly, survivors picked by portable-hash
    * rank so the oracle reproduces the id set.
    */
  /** prep_temperature — temperature-scaled (α = 1/2) sampling-weight
    * fit per language ([[Prep.temperatureWeights]]); the mixing recipe
    * [[prepMix]] then applies.
    */
  def prepTemperature(s: SparkSession, dir: String): DataFrame =
    Prep.temperatureWeights(docs(s, dir).select(col("lang")), "lang")

  def prepMix(s: SparkSession, dir: String): DataFrame =
    Prep.mixStrata(docs(s, dir).select(col("doc_id"), col("lang")),
        "doc_id", "lang",
        Map("en" -> 0.4, "de" -> 0.2, "es" -> 0.2, "fr" -> 0.1, "zh" -> 0.1))
      .orderBy("doc_id")

  /** Soft dedup ([[Dedup.softDedupWeights]]) over the variant corpus used
    * by [[dedupNormalized]]: every doc and its formatting variant carry
    * weight 1/2 (plus smaller weights where the corpus has genuine
    * normalized collisions) — no row dropped.
    */
  def dedupSoft(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), col("text"))
    val variants = d.unionByName(d.select(
      (col("doc_id") + 1000000).as("doc_id"),
      concat(upper(col("text")), lit("  !!!")).as("text")))
    Dedup.softDedupWeights(variants, "doc_id", "text").orderBy("doc_id")
  }

  /** Token-budget mixture ([[Prep.tokenBudgetMix]]): each language
    * contributes documents in portable-hash order until its TOKEN budget
    * is spent — the mixture dial in the units training consumes.
    */
  def prepTokenBudget(s: SparkSession, dir: String): DataFrame =
    Prep.tokenBudgetMix(
        docs(s, dir).select(col("doc_id"), col("lang"), col("text")),
        "doc_id", "lang", "text",
        Map("en" -> 20000L, "de" -> 8000L, "es" -> 8000L,
          "fr" -> 4000L, "zh" -> 4000L))
      .orderBy("doc_id")

  /** Curriculum staging ([[Prep.curriculum]]): the corpus ranked by its
    * unigram-surprisal difficulty score ([[TextAnalysis.unigramLogProb]],
    * the text_lm_score signal) and cut into 4 contiguous easy-to-hard
    * stages. Deterministic total order (score, doc_id), so DuckDB's
    * SQL-standard NTILE over the same ordering reproduces the stages
    * bit-for-bit. The registered form is the exact NTILE tier (the score
    * table is per-document); [[Prep.curriculumBySketch]] is the
    * spec-covered 100 TB path — sketch cutpoints, no global window.
    */
  def prepCurriculum(s: SparkSession, dir: String): DataFrame = {
    val scored = TextAnalysis.unigramLogProb(docs(s, dir), "doc_id", "text")
      .select(col("doc_id"), col("avg_surprisal").as("difficulty"))
    Prep.curriculum(scored, "doc_id", "difficulty", stages = 4)
      .orderBy("doc_id")
  }

  /** Exact binary-content dedup over the multimodal ingest frame
    * ([[Multimodal.attachBinary]]): identical payloads collapse on their
    * md5 fingerprint — the first pass every image/audio corpus runs
    * before any perceptual near-dup work (it removes exact re-uploads
    * for the cost of one map-side-combined aggregate on the digest).
    */
  def mmBinaryDedup(s: SparkSession, dir: String): DataFrame =
    Multimodal.attachBinary(docs(s, dir), "doc_id", "text")
      .groupBy(md5(col("data")).as("content_md5"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        sum(col("meta.n_bytes")).as("total_bytes"))
      .orderBy("keep_id")

  /** CDC chunk-level dedup ([[Multimodal.cdcChunks]]): every payload
    * beside a 3-byte-prefix-shifted copy; per original payload, how many
    * of its distinct chunks the SHIFTED copy still shares — fixed-size
    * chunking would share ~none after any shift, content-defined
    * boundaries re-align within one window, which is the measurable
    * point of CDC. The oracle recomputes chunking and overlap end to
    * end.
    */
  def mmCdcDedup(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("text"))
    val corpus = base.unionByName(
      base.select((col("doc_id") + 1000000).as("doc_id"),
        concat(lit("XY "), col("text")).as("text")))
    val ch = Multimodal.cdcChunks(
        Multimodal.attachBinary(corpus, "doc_id", "text"), "doc_id")
      .localCheckpoint(true) // feeds four consumers below
    val o = ch.filter(col("doc_id") < 1000000).groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks_orig"),
        countDistinct("chunk_hash").as("nd_orig"))
    val oh = ch.filter(col("doc_id") < 1000000)
      .select(col("doc_id"), col("chunk_hash")).distinct()
    val sh = ch.filter(col("doc_id") >= 1000000)
      .select((col("doc_id") - 1000000).as("doc_id"), col("chunk_hash")).distinct()
    val sn = sh.groupBy("doc_id").agg(count(lit(1)).as("nd_shift"))
    val sj = oh.join(sh, Seq("doc_id", "chunk_hash"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_shared"))
    o.join(sn, "doc_id").join(sj, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks_orig"), col("nd_orig"), col("nd_shift"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        round(coalesce(col("n_shared"), lit(0L)) / col("nd_orig").cast("double"), 4)
          .as("resync_ratio"))
      .orderBy("doc_id")
  }

  /** Perceptual near-dup over REAL decoded pixels
    * ([[Multimodal.dctNearDups]]): every fixture image beside a
    * lightly perturbed copy (+8 on the first 6 pixel bytes — two pixels
    * of the top-left cell: at fixture sizes an 8×8 cell is only 1–2
    * pixels wide, so a LOCALIZED edit must stay within a couple of
    * pixels or its spectral footprint legitimately exceeds the
    * hamming-3 band guarantee), paired by banding the 64-bit DCT pHash
    * and verified by exact hamming. A 2-pixel edit perturbs every DCT
    * coefficient only slightly, so just the bits whose coefficients sat
    * near the AC-mean threshold can flip — and any such loss reproduces
    * exactly, because the oracle recomputes the identical integer
    * signature from the generator formula. The engine decodes actual
    * PPM bytes partition-wise; the byte-blockwise sibling for
    * codec-less payloads remains [[Multimodal.phashNearDups]].
    */
  def mmPhashNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = docs(s, dir).select(col("doc_id"))
    val orig = Multimodal.ppmMedia(base, "doc_id", "doc_id")
    val pert = Multimodal.ppmMedia(
      base.select((col("doc_id") + 1000000).as("doc_id"),
        col("doc_id").as("seed")),
      "doc_id", "seed", deltaSql = "IF(i < 6, 8, 0)")
    val media = orig.unionByName(pert)
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes"))
    Multimodal.dctNearDups(media.as[Multimodal.MediaRow])
      .orderBy("a", "b")
  }

  /** Measured robustness contrast between the two perceptual hashes
    * under a SMOOTH luminance gradient — the perturbation class where
    * the block-mean aHash demonstrably breaks and the DCT pHash does
    * not: a vertical gradient walks different cell means by different
    * amounts, flipping every aHash bit whose cell hovered near the
    * global mean, while the same gradient projects onto one or two
    * lowest AC frequencies of the DCT and leaves the rest of the
    * spectrum untouched. Fixture = clamped-range generator images
    * ([[Multimodal.ppmMediaClamped]] — no byte wrap, so the
    * perturbation really IS a smooth gradient) + copies with a 0..11
    * row-linear luminance ramp — amplitude tuned so the contrast is
    * legible: the ramp flips enough near-mean block bits to break the
    * aHash past its hamming-3 band guarantee on half the corpus while
    * the DCT spectrum absorbs it (measured 0.47 vs 0.85 at sf0.001).
    * Each hash runs its REAL banded
    * operator (4×16 bands, hamming ≤ 3) over originals ∪ copies; recall
    * = planted (orig, copy) pairs recovered / planted pairs. The oracle
    * replays both integer signature pipelines bit-for-bit.
    */
  def mmPhashRecall(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = docs(s, dir).select(col("doc_id"))
    val orig = Multimodal.ppmMediaClamped(base, "doc_id", "doc_id")
    val grad = Multimodal.ppmMediaClamped(
      base.select((col("doc_id") + 1000000).as("doc_id"),
        col("doc_id").as("seed")),
      "doc_id", "seed", deltaSql = "(i div (w * 3)) * 12 div hh")
    val media = orig.unionByName(grad)
      .select(col("doc_id"), col("data"), col("meta.mime").as("mime"),
        col("meta.n_bytes").as("n_bytes")).as[Multimodal.MediaRow]
    val sig = Multimodal.decodePixels(media).toDF()
      .select(col("doc_id"), col("ah"), col("ph"))
      .localCheckpoint(true) // one decode feeds both banded runs
    val n = base.count()
    def recallOf(hCol: String, label: String): DataFrame =
      Multimodal.bandedSigPairs(sig, hCol, maxHamming = 3)
        .filter(col("b") === col("a") + 1000000)
        .agg(count(lit(1)).as("n_found"))
        .select(lit(label).as("method"), lit(n).as("n_planted"),
          col("n_found"),
          round(col("n_found") / n.toDouble, 4).as("recall"))
    recallOf("ah", "ahash_block_mean")
      .unionByName(recallOf("ph", "phash_dct"))
      .orderBy("method")
  }

  /** Deterministic round-robin interleave of the document sources
    * ([[Prep.interleaveSources]]): the curriculum-mixing layout where
    * consecutive slots cycle through sources; slot assignment is closed
    * form so the oracle reproduces the full layout.
    */
  def prepInterleave(s: SparkSession, dir: String): DataFrame =
    Prep.interleaveSources(docs(s, dir).select(col("doc_id"), col("source")),
        "doc_id", "source")
      .orderBy("slot")

  /** Quality-weighted subsample ([[Prep.weightedSample]]): survival
    * probability = the doc's stop-word ratio (the [[TextAnalysis.quality]]
    * signal a scorer would emit), so high-quality docs are kept densely
    * and low-signal docs sparsely — with the exact surviving id set
    * reproducible by the oracle.
    */
  def prepWeightedSample(s: SparkSession, dir: String): DataFrame = {
    val q = TextAnalysis.quality(docs(s, dir), "doc_id", "text")
      .select(col("doc_id"), col("stop_ratio").as("w"))
    Prep.weightedSample(q, "doc_id", "w")
      .select(col("doc_id"), round(col("w"), 4).as("w"))
      .orderBy("doc_id")
  }

  /** Snapshot drift detection ([[Analytics.driftPsi]]) with drift by
    * construction: the "current" half of the event stream relabels one
    * event type and shifts values up 50%, so both PSI rows must register
    * clearly above the conventional 0.2 retrain threshold while the
    * even/odd split alone would measure ≈ 0.
    */
  def dqDrift(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    val base = ev.filter(col("event_id") % 2 === 0)
    val curr = ev.filter(col("event_id") % 2 === 1)
      .select(col("event_id"),
        when(col("event_type") === "click", lit("tap"))
          .otherwise(col("event_type")).as("event_type"),
        (col("value") * 1.5).as("value"))
    Analytics.driftPsi(base, curr, "event_type", "value")
  }

  /** As-of join over the event stream: each click matched to the user's
    * latest preceding-or-simultaneous purchase (oracle: DuckDB's native
    * ASOF LEFT JOIN — an independent implementation of the semantics).
    */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_id"), round(col("value"), 2).as("p_value"))
    AsOf.join(clicks, purchases, "user_id", "ts", Seq("p_id", "p_value"))
      .select("event_id", "user_id", "p_id", "p_value")
      .orderBy("event_id")
  }

  /** As-of with a 1-hour lookback tolerance ([[AsOf.joinWithTolerance]]):
    * a click only attributes to a purchase within the preceding hour —
    * the bounded-attribution form every real event pipeline wants. The
    * oracle CASE-nulls DuckDB's unbounded ASOF match at the same cutoff.
    */
  def asofTolerance(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_id"), round(col("value"), 2).as("p_value"))
    AsOf.joinWithTolerance(clicks, purchases, "user_id", "ts",
        Seq("p_id", "p_value"), tolerance = "INTERVAL 1 HOUR")
      .select("event_id", "user_id", "p_id", "p_value")
      .orderBy("event_id")
  }

  /** The same as-of join through the NATIVE operator path
    * ([[graft.plans.AsOfJoinExec]] via the injected planner strategy) —
    * checked against the same independent DuckDB ASOF oracle.
    */
  /** Nearest-direction as-of: each click matched to the purchase
    * closest in time EITHER way (ties to the earlier purchase) — the
    * sensor-alignment / event-attribution variant the backward join
    * can't express.
    */
  def asofNearest(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_id"), round(col("value"), 2).as("p_value"))
    AsOf.joinNearest(clicks, purchases, "user_id", "ts", Seq("p_id", "p_value"))
      .select("event_id", "user_id", "p_id", "p_value")
      .orderBy("event_id")
  }

  def asofJoinNative(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("p_id"), round(col("value"), 2).as("p_value"))
    AsOf.joinNative(clicks, purchases, "user_id", "ts", Seq("p_id", "p_value"))
      .select("event_id", "user_id", "p_id", "p_value")
      .orderBy("event_id")
  }

  /** Approximate distinct counting (HLL sketch) WITH an in-query
    * tolerance cross-check — the 100 TB path for cardinality-only dedup
    * questions (`approx_count_distinct` merges tiny sketches instead of
    * Expand'ing the fact table).
    *
    * Sketch estimates are implementation-specific, so the raw estimate
    * can't hash-match an external engine. The query emits the EXACT
    * per-group distinct count plus `hll_ok` — whether the rsd = 0.02
    * sketch landed within 10% (5σ) of it. The oracle independently
    * recomputes the exact counts and asserts `TRUE`: a drifting sketch
    * flips the flag and fails the hash compare, so the error bound is
    * oracle-verified, not self-certified. The exact column is the
    * verification harness — a production pipeline runs the bare sketch.
    */
  def dedupApproxHll(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy("lang")
      .agg(
        countDistinct(col("text")).as("exact_distinct"),
        approx_count_distinct(col("text"), 0.02).as("approx"))
      .select(col("lang"), col("exact_distinct"),
        (abs(col("approx") - col("exact_distinct")) /
          col("exact_distinct").cast("double") < 0.1).as("hll_ok"))
      .orderBy("lang")

  /** Radius search ([[Similarity.rangeSearch]]): every corpus vector
    * within cosine ≥ 0.25 of each probe — dense neighborhoods return many
    * rows, sparse ones few, with no fixed-k truncation or padding.
    */
  def simRangeSearch(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    Similarity.rangeSearch(
        e.filter(col("vec_id") >= 10), e.filter(col("vec_id") < 10),
        "vec_id", "emb", minCos = 0.25)
      .orderBy("probe_id", "neighbor_id")
  }

  /** Exact MIPS top-2 ([[Similarity.mipsTopK]]): dot-product ranking over
    * the embedding corpus — where vector norms reorder results relative
    * to [[simKnnTopK]]'s cosine ranking.
    */
  /** Measured recall@1 of the SQ8 quantized-dot ranking
    * ([[Similarity.sqTopK]]) against the exact inner-product truth
    * ([[Similarity.mipsTopK]]) — the [[simPqRecall]] pattern for the
    * scalar-quantization tier, so every approximate path in the
    * registry carries a measured recall row.
    */
  def simSqRecall(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10)
    val exact = Similarity.mipsTopK(corpus, probes, "vec_id", "emb", k = 1)
      .select(col("probe_id"), col("neighbor_id").as("true_nn"))
    val sq = Similarity.sqTopK(corpus, probes, "vec_id", "emb", k = 1)
      .select(col("probe_id"), col("neighbor_id").as("ann_nn"))
    exact.join(sq, Seq("probe_id"), "left")
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("ann_nn") === col("true_nn"), 1L).otherwise(0L)).as("hits"))
      .select(lit("sq8").as("method"), col("n_probes"), col("hits"),
        round(col("hits") / col("n_probes"), 4).as("recall_at_1"))
  }

  /** Measured recall@1 of the binary-quantization rerank tier
    * ([[Similarity.bqTopK]]) against the exact inner-product truth —
    * the [[simSqRecall]] pattern, certifying [[simBqAnn]].
    */
  def simBqRecall(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10)
    val exact = Similarity.mipsTopK(corpus, probes, "vec_id", "emb", k = 1)
      .select(col("probe_id"), col("neighbor_id").as("true_nn"))
    val bq = Similarity.bqTopK(corpus, probes, "vec_id", "emb", k = 1)
      .select(col("probe_id"), col("neighbor_id").as("ann_nn"))
    exact.join(bq, Seq("probe_id"), "left")
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("ann_nn") === col("true_nn"), 1L).otherwise(0L)).as("hits"))
      .select(lit("bq1bit").as("method"), col("n_probes"), col("hits"),
        round(col("hits") / col("n_probes"), 4).as("recall_at_1"))
  }

  def simMipsTopK(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    Similarity.mipsTopK(
        e.filter(col("vec_id") >= 10), e.filter(col("vec_id") < 10),
        "vec_id", "emb", k = 2)
      .orderBy("probe_id", "rn")
  }

  /** ColBERT-style late-interaction retrieval ([[Similarity.maxSimTopK]]):
    * the 64-dim embedding as 8×8-dim sub-vectors, score = Σ_i max_j
    * sub-cosine — top 3 per probe, oracle recomputes the full m×m
    * interaction matrix.
    */
  def simMaxsim(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("embedding"))
    Similarity.maxSimTopK(
        e.filter(col("vec_id") >= 10), e.filter(col("vec_id") < 10),
        "vec_id", "embedding", m = 8, k = 3)
      .orderBy("probe_id", "rn")
  }

  /** IVF ANN: per-label centroids trained on the corpus (vec_id ≥ 10)
    * serve as the codebook; probes (vec_id < 10) search only their nearest
    * centroid's inverted list.
    */
  def simIvfAnn(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10).drop("label")
    val centroids = Similarity.trainCentroids(corpus, "label", "emb")
    Similarity.ivfTopK(corpus.drop("label"), probes, centroids, "vec_id", "emb", k = 1)
      .orderBy("probe_id")
  }

  /** Product-quantization ANN: per-subspace codebooks from the labeled
    * corpus halves, corpus encoded row-locally to 2 code ids, probes
    * search by the two-lookup ADC distance ([[Similarity.pqTopK]]).
    */
  def simPqAnn(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10).drop("label")
    val half = "CAST(floor(size(emb) / 2) AS INT)"
    val cb1 = Similarity.trainCentroids(
      corpus.select(col("label"), expr(s"slice(emb, 1, $half)").as("emb")),
      "label", "emb")
    val cb2 = Similarity.trainCentroids(
      corpus.select(col("label"),
        expr(s"slice(emb, $half + 1, size(emb) - $half)").as("emb")),
      "label", "emb")
    Similarity.pqTopK(corpus.drop("label"), probes, cb1, cb2,
        "vec_id", "emb", k = 2)
      .orderBy("probe_id", "rn")
  }

  /** IVF-PQ ANN ([[Similarity.ivfpqTopK]], the IVFADC layout): coarse
    * per-label centroids prune to nprobe = 2 inverted lists; residual
    * sub-codebooks (trained on `emb − c_cell` halves, per label) supply
    * the ADC compression. k = 2 over the probed cells.
    */
  def simIvfPqAnn(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10).drop("label")
    val coarse = Similarity.trainCentroids(corpus, "label", "emb")
    val res = Similarity.ivfResiduals(corpus, coarse, "emb")
    val half = "CAST(floor(size(res) / 2) AS INT)"
    val cb1 = Similarity.trainCentroids(
      res.select(col("label"), expr(s"slice(res, 1, $half)").as("remb")),
      "label", "remb")
    val cb2 = Similarity.trainCentroids(
      res.select(col("label"),
        expr(s"slice(res, $half + 1, size(res) - $half)").as("remb")),
      "label", "remb")
    Similarity.ivfpqTopK(corpus.drop("label"), probes, coarse, cb1, cb2,
        "vec_id", "emb", k = 2, nprobe = 2)
      .orderBy("probe_id", "rn")
  }

  /** IVF-PQ quality: recall@1 of the nprobe = 2 ADC search vs the exact
    * L2 nearest neighbor (the metric IVF-PQ approximates). Measured
    * honestly on the structureless synthetic corpus — the same caveat as
    * [[simPqRecall]] applies, but residual-trained codebooks + multi-cell
    * probing recover part of what raw-vector PQ loses.
    */
  def simIvfPqRecall(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10).drop("label")
    val coarse = Similarity.trainCentroids(corpus, "label", "emb")
    val res = Similarity.ivfResiduals(corpus, coarse, "emb")
    val half = "CAST(floor(size(res) / 2) AS INT)"
    val cb1 = Similarity.trainCentroids(
      res.select(col("label"), expr(s"slice(res, 1, $half)").as("remb")),
      "label", "remb")
    val cb2 = Similarity.trainCentroids(
      res.select(col("label"),
        expr(s"slice(res, $half + 1, size(res) - $half)").as("remb")),
      "label", "remb")
    val exact = Similarity.l2TopK(corpus.drop("label"), probes, "vec_id", "emb", k = 1)
      .select(col("probe_id"), col("neighbor_id").as("true_nn"))
    val ann = Similarity.ivfpqTopK(corpus.drop("label"), probes, coarse, cb1, cb2,
        "vec_id", "emb", k = 1, nprobe = 2)
      .select(col("probe_id"), col("neighbor_id").as("ann_nn"))
    exact.join(ann, Seq("probe_id"), "left")
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("ann_nn") === col("true_nn"), 1L).otherwise(0L)).as("hits"))
      .select(lit("ivfpq_m2_nprobe2").as("method"), col("n_probes"), col("hits"),
        round(col("hits") / col("n_probes"), 4).as("recall_at_1"))
  }

  /** Two-stage retrieval: 32-dim prefix cosine proposes 100 candidates per
    * probe, full 64-dim cosine reranks to top-2
    * ([[Similarity.twoStageTopK]]) — the operating point chosen from the
    * measured recall surface (see [[simTwoStageRecall]]): half the stage-1
    * FLOPs, ≥ 0.9 recall@1 at every tested corpus scale.
    */
  def simTwoStage(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    Similarity.twoStageTopK(
        e.filter(col("vec_id") >= 10), e.filter(col("vec_id") < 10),
        "vec_id", "emb", prefixDims = 32, candidates = 100, k = 2)
      .orderBy("probe_id", "rn")
  }

  /** Two-stage retrieval quality: recall@1 vs the brute-force cosine
    * truth at the default operating point (prefix 32 of 64 dims,
    * 100 candidates). Chosen from the measured recall@1 surface over this
    * corpus family — (prefix, candidates) → sf0.001 / sf0.01 / sf0.1:
    * p16/c50 = 0.5/0.7/0.3 (the old default — too weak), p24/c50 =
    * 0.9/0.9/0.6, p32/c50 = 1.0/0.9/0.8, **p32/c100 = 1.0/0.9/1.0**,
    * p48/c50 = 1.0/1.0/1.0 (barely cheaper than exhaustive). p32/c100
    * clears 0.9 everywhere while halving the stage-1 scan cost; the
    * structureless synthetic vectors make this a WORST case for prefix
    * proposers (no energy concentration in leading dims — real
    * Matryoshka-trained embeddings concentrate it there by construction).
    * With an exhaustive candidate set the spec pins exact equality.
    */
  def simTwoStageRecall(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(corpus, probes, "vec_id", "emb", k = 1)
      .select(col("probe_id"), col("neighbor_id").as("true_nn"))
    val ts = Similarity.twoStageTopK(corpus, probes, "vec_id", "emb",
        prefixDims = 32, candidates = 100, k = 1)
      .select(col("probe_id"), col("neighbor_id").as("ann_nn"))
    exact.join(ts, Seq("probe_id"), "left")
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("ann_nn") === col("true_nn"), 1L).otherwise(0L)).as("hits"))
      .select(lit("twostage_p32_c100").as("method"), col("n_probes"), col("hits"),
        round(col("hits") / col("n_probes"), 4).as("recall_at_1"))
  }

  /** PQ quality measured against the metric it approximates: recall@1 of
    * the ADC search vs the exact L2 nearest neighbor (cosine truth would
    * conflate quantization loss with metric mismatch). On THIS corpus the
    * number is low by construction — the synthetic embeddings are
    * structureless, so 2×10-cell codebooks explain almost no variance
    * (the measured sim_recall rows for IVF nprobe=1 / sign-LSH sit at
    * 0.1/0.2 for the same reason); the recall dial is subspace count ×
    * codebook size, exactly the m/k dial of the PQ paper.
    */
  def simPqRecall(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10).drop("label")
    val half = "CAST(floor(size(emb) / 2) AS INT)"
    val cb1 = Similarity.trainCentroids(
      corpus.select(col("label"), expr(s"slice(emb, 1, $half)").as("emb")),
      "label", "emb")
    val cb2 = Similarity.trainCentroids(
      corpus.select(col("label"),
        expr(s"slice(emb, $half + 1, size(emb) - $half)").as("emb")),
      "label", "emb")
    val exact = Similarity.l2TopK(corpus.drop("label"), probes, "vec_id", "emb", k = 1)
      .select(col("probe_id"), col("neighbor_id").as("true_nn"))
    val pq = Similarity.pqTopK(corpus.drop("label"), probes, cb1, cb2,
        "vec_id", "emb", k = 1)
      .select(col("probe_id"), col("neighbor_id").as("ann_nn"))
    exact.join(pq, Seq("probe_id"), "left")
      .agg(count(lit(1)).as("n_probes"),
        sum(when(col("ann_nn") === col("true_nn"), 1L).otherwise(0L)).as("hits"))
      .select(lit("pq_m2").as("method"), col("n_probes"), col("hits"),
        round(col("hits") / col("n_probes"), 4).as("recall_at_1"))
  }

  /** tf-idf top-3 characteristic terms per document (rank ties broken by
    * term, scores rounded for cross-engine float stability).
    */
  /** Probabilistic record linkage ([[Linkage.fsLink]]) over customers
    * plus a deterministic dirty copy of each (id + 1e6: last name char
    * corrupted, balance drifted 0.37, same nation/segment) — the entity
    * resolution step upstream of the reference's keyed merge. The DuckDB
    * oracle scores ALL within-nation pairs with no name blocking, so it
    * verifies the parity-block candidate generation loses no match.
    */
  def dedupLinkage(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))
    val dirty = c.select((col("c_custkey") + 1000000).as("c_custkey"),
      concat(expr("substring(c_name, 1, length(c_name) - 1)"), lit("X"))
        .as("c_name"),
      col("c_nationkey"),
      round(col("c_acctbal") + 0.37, 2).as("c_acctbal"),
      col("c_mktsegment"))
    Linkage.fsLink(c.unionByName(dirty), "c_custkey", "c_name",
        "c_nationkey", "c_acctbal", "c_mktsegment")
      .orderBy("id1", "id2")
  }

  /** Entity RESOLUTION end-to-end: the [[dedupLinkage]] match pairs
    * collapsed into entities by connected components
    * ([[Dedup.connectedComponents]]) — records transitively linked
    * through any chain of accepted matches share one entity id (the min
    * member id), which is what a keyed merge actually joins on. Only
    * records appearing in at least one accepted pair emit (singletons
    * are their own entity trivially).
    */
  def dedupLinkageEntities(s: SparkSession, dir: String): DataFrame = {
    val pairs = dedupLinkage(s, dir)
      .select(col("id1").as("a"), col("id2").as("b"))
    Dedup.connectedComponents(pairs)
      .select(col("id").as("c_custkey"), col("comp").as("entity_id"))
      .orderBy("c_custkey")
  }

  /** Exact duplicate-span detection ([[Dedup.duplicateSpans]]) over a
    * corpus with span structure by construction: every doc's
    * last-token-truncated copy (id + 1e6 — a full-prefix span) plus, for
    * every 7th doc, a SPLICE (id + 2e6) of its first 24 tokens followed
    * by its tokens 5..28 — a doc sharing two runs with its source at two
    * different diagonal offsets, which whole-doc similarity under-reports
    * but the span finder must localize. The DuckDB oracle recomputes the
    * ground truth with the same gram hash, cap, and island reduction.
    */
  /** The onion REMOVAL over the plain corpus ([[Dedup.spanRemoval]]):
    * tokens covered by cross-doc duplicate 8-grams are stripped from
    * every doc but the min-id keeper; affected docs report counts + a
    * kept-text fingerprint the oracle recomputes end to end.
    */
  def dedupSpanRemoval(s: SparkSession, dir: String): DataFrame =
    Dedup.spanRemoval(docs(s, dir).select(col("doc_id"), col("text")),
        "doc_id", "text")
      .orderBy("doc_id")

  def dedupSpan(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).select(col("doc_id"), col("text"))
    val tk = base.select(col("doc_id"), split(col("text"), " ").as("tk"))
    val corpus = base
      .unionByName(tk.select((col("doc_id") + 1000000).as("doc_id"),
        expr("array_join(slice(tk, 1, size(tk) - 1), ' ')").as("text")))
      .unionByName(tk.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 2000000).as("doc_id"),
          expr("array_join(concat(slice(tk, 1, 24), slice(tk, 5, 24)), ' ')")
            .as("text")))
    Dedup.duplicateSpans(corpus, "doc_id", "text")
      .orderBy("d1", "d2")
  }

  /** BM25 ranked retrieval ([[TextAnalysis.bm25TopK]]): top 10 docs for a
    * 4-term query, scored with Lucene-form positive idf at k1=1.2,
    * b=0.75.
    */
  def textBm25(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.bm25TopK(docs(s, dir), "doc_id", "text",
        Seq("spark", "join", "window", "vector"), k = 10)
      .orderBy("rank")

  /** Hybrid retrieval ([[TextAnalysis.hybridRrf]]): BM25 and token-set
    * Jaccard top-20 lists fused by reciprocal rank at c = 60, top 10.
    */
  def simHybridRrf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.hybridRrf(docs(s, dir), "doc_id", "text",
        Seq("spark", "join", "window", "vector"))
      .orderBy("fused_rank")

  def textTfidf(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.tfidfTopK(docs(s, dir), "doc_id", "text", k = 3)
      .orderBy("doc_id", "rank")

  /** BPE trainer ([[TextAnalysis.bpeTrain]]): the 6-round learned merge
    * list over the corpus — each round re-counts piece pairs on the
    * merged vocabulary, so later merges compose multi-char pieces the
    * raw pair statistics never see. The oracle replays the unrolled
    * 6-round recurrence (per-round argmax + replace), the
    * graph_pagerank precedent for iterative operators.
    */
  /** Unigram-LM tokenizer training ([[TextAnalysis.unigramTrain]]) —
    * the SentencePiece-family lattice algorithm beside the merge-loop
    * BPE trainer: two hard-EM rounds of Viterbi segmentation over a
    * bounded piece inventory with usage re-estimation and pruning,
    * emitting every word's final segmentation. The oracle unrolls the
    * identical recurrence (10 DP-step CTE chains per round).
    */
  def textUnigramLm(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramTrain(docs(s, dir), "doc_id", "text")

  /** Unigram encode ([[TextAnalysis.unigramEncodeWithModel]]): the
    * trained segmentation applied over the corpus — per-doc
    * tokenization statistics under the final unigram model, the
    * text_bpe_encode sibling for the lattice tokenizer family. The row
    * consumes the PERSISTED model
    * ([[TextAnalysis.unigramModelPersisted]]: train once per JVM,
    * reload from parquet thereafter), so its cost is the apply pass the
    * operator actually has at scale; training is measured by the
    * `text_unigram_lm` row. Persisted-model ≡ train-then-encode is
    * spec-pinned.
    */
  def textUnigramEncode(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.unigramEncodeWithModel(docs(s, dir), "doc_id", "text",
      TextAnalysis.unigramModelPersisted(docs(s, dir), "doc_id", "text",
        dir))

  /** Deterministic multi-byte UTF-8 fixture appended to the corpus for
    * the byte-level BPE row (the synthetic documents table is pure
    * ASCII): 2-byte Latin accents, 3-byte CJK, 4-byte emoji — with
    * repetition so their byte pairs carry learnable corpus weight.
    * Mirrored literally in the oracle's VALUES list.
    */
  val ByteBpeFixture: Seq[String] =
    Seq.fill(3)("naïve café déjà vu") ++
      Seq.fill(2)("東京タワー 東京") ++
      Seq.fill(2)("🚀 déjà 🚀") :+ "Ünïcödé tëst"

  /** GPT-3-STYLE QUALITY-CLASSIFIER FILTERING with Pareto importance
    * sampling (Brown et al. 2020, Appendix A — the model-based filter
    * every frontier-scale corpus build runs after dedup): train a
    * logistic quality classifier, score every document, keep a
    * document iff its Pareto draw clears the score. The paper's rule
    * `pareto(α=9) > 1 − score` is spelled deterministically:
    * u = md5-hash(doc_id) on a 1e-6 grid, keep iff
    * (1−u)·(2−s)⁹ < 1 — algebraically the same keep set, with the ⁹
    * expanded into an explicit multiply chain so both engines evaluate
    * the identical IEEE tree (pow() differs in ULPs across libms).
    * Features are exactly-replayable text statistics (mean word
    * length, stopword fraction); the label is planted with hash noise
    * (the ml_logreg fixture discipline — the synthetic corpus carries
    * no human quality signal); training is [[LogReg.train]]'s
    * bit-exact integer-gradient recurrence, which the oracle replays.
    * Output: per-source doc/kept counts + mean score, the monitoring
    * view a filtering run ships. Scale shape: one feature scan, the
    * rounds-bounded training aggregate over the quantized frame, one
    * row-local keep decision — no extra shuffle beyond the closing
    * per-source aggregate.
    */
  def prepQualityFilter(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val words = split(col("text"), " ")
    val nW = size(words).cast("double")
    val stop = Seq("the", "of", "and", "to", "a", "in", "is", "it",
      "for", "on")
    // centered to the corpus's stable operating point (mean word
    // length ~4.5 chars, stopword fraction ~0.06) so the planted
    // signal and the hash noise are comparable — the ml_logreg
    // irreducible-noise discipline
    val feats = d.select(col("doc_id"), col("source"),
      (((length(col("text")) - size(words) + 1) / nW - 4.5) / 0.8)
        .as("x1"),
      ((size(filter(words, w => w.isin(stop: _*))) / nW - 0.06) / 0.16)
        .as("x2"))
    val planted = feats.withColumn("y",
      (col("x1") + lit(2.0) * col("x2") +
        (pmod(Hashing.md5Long(col("doc_id").cast("string")), lit(1000))
          / 1000.0 - 0.5) > 0.0).cast("long"))
    val scored = LogReg.train(planted, "doc_id", "y", "x1", "x2",
      xScale = 1000, iters = 10, lr = 4.0)
    scored
      .withColumn("u",
        pmod(Hashing.md5Long(concat(col("doc_id").cast("string"),
          lit("|u"))), lit(1000000)) / 1000000.0)
      .withColumn("t", lit(2.0) - col("p"))
      .withColumn("t2", col("t") * col("t"))
      .withColumn("t4", col("t2") * col("t2"))
      .withColumn("t9", col("t4") * col("t4") * col("t"))
      .withColumn("keep", (lit(1.0) - col("u")) * col("t9") < 1.0)
      .join(d.select("doc_id", "source"), "doc_id")
      .withColumn("p4", floor(col("p") * 10000 + 0.5).cast("long"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("keep").cast("long")).as("n_kept"),
        round(sum("p4") / (count(lit(1)) * 10000.0), 4).as("mean_score"))
      .orderBy("source")
  }

  /** CCNet-STYLE PERPLEXITY BUCKETING (Wenzek et al. 2020: per-language
    * head/middle/tail terciles by LM perplexity — the OTHER canonical
    * model-based corpus filter beside [[prepQualityFilter]]'s
    * classifier; CCNet keeps "head", mixes "middle", drops "tail").
    * Surprisal is the corpus-unigram LM of text_lm_score (the KenLM
    * stand-in this engine trains in one aggregate); docs rank per
    * language on the ROUNDED score with doc_id tie-break, so the
    * tercile assignment is deterministic in both engines. Output: per
    * (lang, bucket) doc counts and min/max/mean surprisal — the
    * monitoring view of a filtering run. Scale: the LM is one
    * vocabulary aggregate; ranking is one per-language window; no
    * all-pairs anything.
    */
  def prepPerplexityBuckets(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val sc = TextAnalysis.unigramLogProb(d, "doc_id", "text")
      .join(d.select("doc_id", "lang"), "doc_id")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("avg_surprisal"), col("doc_id"))
    val per = org.apache.spark.sql.expressions.Window.partitionBy("lang")
    sc.withColumn("r", row_number().over(w))
      .withColumn("n", count(lit(1)).over(per))
      .withColumn("bucket",
        when(col("r") * 3 <= col("n"), "head")
          .when(col("r") * 3 <= col("n") * 2, "middle")
          .otherwise("tail"))
      .withColumn("s4",
        floor(col("avg_surprisal") * 10000 + 0.5).cast("long"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        min("avg_surprisal").as("min_surprisal"),
        max("avg_surprisal").as("max_surprisal"),
        round(sum("s4") / (count(lit(1)) * 10000.0), 4)
          .as("mean_surprisal"))
      .orderBy("lang", "bucket")
  }

  /** Gopher-rules fixture: one document per rule, violating EXACTLY
    * that rule (plus one passing control) — mirrored literally in the
    * oracle's VALUES so each heuristic's firing is pinned
    * independently of the synthetic corpus's distribution.
    */
  val GopherFixture: Seq[(Long, String)] = {
    val pass60 = (1 to 52).map(i => s"word$i").mkString(" ") +
      " the of and that have with be to"
    Seq(
      1L -> "the of and short",                              // word count
      2L -> ((1 to 52).map(_ => "ab").mkString(" ") +
        " be to of the and that have with"),                 // word length
      3L -> ((1 to 44).map(i => s"word$i").mkString(" ") +
        " # # # # # # # # the of and that have with be to"), // symbols
      4L -> ((1 to 44).map(i => s"word$i").mkString(" ") +
        " the of and that have with be to" +
        "\n- first bullet item\n- second bullet item" +
        "\nplain closing line\nanother plain line"),         // bullets
      5L -> ((1 to 44).map(i => s"word$i").mkString(" ") +
        " the of and that have with be to" +
        "\ntrailing thought one...\ntrailing thought two..." +
        "\nplain closing line\nanother plain line"),         // ellipses
      6L -> ((1 to 37).map(i => s"word$i").mkString(" ") + " " +
        (1 to 15).map(i => s"${10000 + i}").mkString(" ") +
        " the of and that have with be to"),                 // alpha words
      7L -> (1 to 60).map(i => s"word$i").mkString(" "),     // stop words
      8L -> pass60)                                          // all pass
  }

  /** GOPHER/MassiveText rule filter (text_gopher_rules —
    * [[TextAnalysis.gopherRules]]): the seven published heuristics of
    * Rae et al. 2021 Appendix A, evaluated per document with
    * integer-exact thresholds, aggregated per group — the rule-based
    * pre-filter that runs BEFORE the model-based
    * [[prepQualityFilter]]/[[prepPerplexityBuckets]] stages in a real
    * corpus build. Groups = one per fixture document (each pinning one
    * rule's firing) + one per corpus source (violation counts + pass
    * counts).
    */
  def textGopherRules(s: SparkSession, dir: String): DataFrame = {
    val fixture = s.createDataFrame(GopherFixture).toDF("fid", "text")
      .select((col("fid") + 9000000L).as("doc_id"), col("text"),
        concat(lit("fx"), col("fid")).as("grp"))
    val corpus = docs(s, dir).select(col("doc_id"), col("text"),
      col("source").as("grp"))
    val all = fixture.unionByName(corpus)
    val rules = Seq("r_wordcount", "r_wordlen", "r_symbol", "r_bullet",
      "r_ellipsis", "r_alpha", "r_stopword")
    TextAnalysis.gopherRules(all, "doc_id", "text")
      .join(all.select("doc_id", "grp"), "doc_id")
      .groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        rules.map(r => sum((!col(r)).cast("long"))
          .as(r.replace("r_", "viol_"))) :+
          sum(col("pass").cast("long")).as("n_pass"): _*)
      .orderBy("grp")
  }

  /** C4-filter fixture: each document exercises one line- or page-level
    * rule (plus a passing control); mirrored literally in the oracle.
    */
  val C4Fixture: Seq[(Long, String)] = Seq(
    1L -> ("A good opening sentence stands here today.\n" +
      "this line has no terminal punctuation at all\n" +
      "And a proper closing sentence follows right here. Indeed."), // line: punct
    2L -> ("A good opening sentence stands here today.\n" +
      "Too short line.\n" +
      "And a proper closing sentence follows right here."), // line: <5 words
    3L -> ("A good opening sentence stands here today.\n" +
      "Please enable javascript to view this content properly.\n" +
      "And a proper closing sentence follows right here."), // line: js
    4L -> ("A good opening sentence stands here today.\n" +
      "Classic filler lorem ipsum dolor sit amet appears here.\n" +
      "And a proper closing sentence follows right here."), // page: lorem
    5L -> ("A good opening sentence stands here today.\n" +
      "An object literal { appears inside this line sadly.\n" +
      "And a proper closing sentence follows right here."), // page: brace
    6L -> "Only two sentences live here. That is all folks!", // page: <3
    7L -> ("A good opening sentence stands here today.\n" +
      "The middle line carries plenty of useful words too.\n" +
      "And a proper closing sentence follows right here."))  // all pass

  /** C4 FILTERS (text_c4_filters — Raffel et al. 2020 §2.2, the
    * cleaning rules behind the C4 corpus, expressible without the
    * bad-words list): LINE level — keep a line iff it ends in terminal
    * punctuation, has at least 5 words, and does not mention
    * "javascript"; PAGE level — keep a page iff it has at least 3
    * sentences, no "lorem ipsum", and no curly brace. All verdicts are
    * integer/boolean (counts and substring tests), hash-exact
    * cross-engine. Output: per-group page/line retention counts over
    * the corpus plus the per-rule fixture documents. One row-local
    * pass over the lines array, no explode, no shuffle beyond the
    * closing aggregate.
    */
  def textC4Filters(s: SparkSession, dir: String): DataFrame = {
    val fixture = s.createDataFrame(C4Fixture).toDF("fid", "text")
      .select((col("fid") + 9100000L).as("doc_id"), col("text"),
        concat(lit("fx"), col("fid")).as("grp"))
    val corpus = docs(s, dir).select(col("doc_id"), col("text"),
      col("source").as("grp"))
    val all = fixture.unionByName(corpus)
    val lines = split(col("text"), "\n")
    def lineKeep(l: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      (l.endsWith(".") || l.endsWith("!") || l.endsWith("?") ||
        l.endsWith("\"")) &&
        size(split(l, " ")) >= 5 &&
        !lower(l).contains("javascript")
    def occurrences(needle: String): org.apache.spark.sql.Column =
      length(col("text")) -
        length(call_function("replace", col("text"), lit(needle), lit("")))
    val sentences = occurrences(".") + occurrences("!") + occurrences("?")
    val pageKeep = sentences >= 3 &&
      !lower(col("text")).contains("lorem ipsum") &&
      !col("text").contains("{")
    all.select(col("grp"),
        size(lines).cast("long").as("n_lines"),
        size(filter(lines, l => lineKeep(l))).cast("long").as("n_lines_kept"),
        pageKeep.cast("long").as("page_kept"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n_docs"),
        sum("page_kept").as("n_docs_kept"),
        sum("n_lines").as("n_lines"),
        sum("n_lines_kept").as("n_lines_kept"))
      .orderBy("grp")
  }

  /** UTF-8 validation fixture: (id, hex bytes), one row per
    * well-formedness class of Unicode 15 Table 3-7 — valid ASCII/NUL/
    * BOM/2-3-4-byte forms, the surrogate-range boundaries from both
    * sides, U+10FFFF from both sides, every overlong family, bad
    * leads, bare continuations, truncations. Mirrored literally in the
    * oracle's VALUES.
    */
  val Utf8Fixture: Seq[(Long, String)] = Seq(
    1L  -> "48656C6C6F", // ASCII
    2L  -> "00",         // interior NUL is VALID UTF-8
    3L  -> "C3A9",       // 2-byte é
    4L  -> "EFBBBF41",   // BOM + 'A'
    5L  -> "E282AC",     // 3-byte €
    6L  -> "F09F9A80",   // 4-byte emoji
    7L  -> "ED9FBF",     // U+D7FF — last before surrogates, valid
    8L  -> "EE8080",     // U+E000 — first after surrogates, valid
    9L  -> "F48FBFBF",   // U+10FFFF — the maximum, valid
    10L -> "C0AF",       // overlong '/' (2-byte form)
    11L -> "E080AF",     // overlong (3-byte form)
    12L -> "F0808080",   // overlong (4-byte form)
    13L -> "EDA080",     // surrogate U+D800
    14L -> "EDBFBF",     // surrogate U+DFFF
    15L -> "F4908080",   // first code point past U+10FFFF
    16L -> "F5808080",   // F5 lead — never valid
    17L -> "FF",         // FF — never valid
    18L -> "80",         // bare continuation
    19L -> "E282",       // truncated 3-byte
    20L -> "C2",         // truncated 2-byte
    21L -> "41C3",       // valid prefix, truncated tail
    22L -> "C1BF",       // overlong (C1 lead)
    23L -> "")           // empty: vacuously valid

  /** UTF-8 structural validation (text_utf8_validate —
    * [[TextAnalysis.utf8Stats]]): the Table 3-7 DFA over the fixture's
    * hex byte sequences (every invalidity class pinned at its exact
    * first-bad offset) PLUS one summary row folding the whole
    * documents corpus byte stream — the ingest gate a crawled-text
    * pipeline runs before trusting tokenizers on the bytes.
    */
  def textUtf8Validate(s: SparkSession, dir: String): DataFrame = {
    val fixture = s.createDataFrame(Utf8Fixture).toDF("id", "hx")
    val corpus = docs(s, dir).select(
      (col("doc_id") + 1000000L).as("id"),
      hex(encode(col("text"), "UTF-8")).as("hx"))
    val per = TextAnalysis.utf8Stats(fixture.unionByName(corpus), "id", "hx")
    val fixOut = per.filter(col("id") < 1000000L)
    val corpOut = per.filter(col("id") >= 1000000L)
      .agg(sum("n_bytes").as("n_bytes"),
        sum("n_codepoints").as("n_codepoints"),
        max("first_invalid").as("first_invalid"))
      .select(lit(999999L).as("id"), col("n_bytes"), col("n_codepoints"),
        col("first_invalid"),
        (col("first_invalid") === -1L).as("is_valid"))
    fixOut.unionByName(corpOut).orderBy("id")
  }

  /** Byte-level BPE training (text_bpe_bytes —
    * [[TextAnalysis.bpeTrainBytes]]): the GPT-2 scheme the char-level
    * trainer cannot express — regex pre-tokenization, a 256-byte base
    * alphabet (NO UNK: any script tokenizes), merges learned over
    * byte pairs so multi-byte UTF-8 sequences re-assemble when
    * frequent. The corpus is documents plus the multi-byte fixture;
    * the oracle replays the identical recurrence over the identical
    * corpus in DuckDB.
    */
  def textBpeBytes(s: SparkSession, dir: String): DataFrame = {
    val corpus = docs(s, dir).select(col("text"))
      .unionByName(
        s.createDataFrame(ByteBpeFixture.map(Tuple1.apply)).toDF("text"))
    val merges = TextAnalysis.bpeTrainBytes(corpus, "text", rounds = 8)
    s.createDataFrame(merges).toDF("round", "merge", "weight")
      .orderBy("round")
  }

  /** Byte-level encode (text_bpe_bytes_encode —
    * [[TextAnalysis.bpeBytesEncodeStats]]): per-document pre-token /
    * piece / byte statistics under the trained byte merges — the
    * text_bpe_encode sibling for the byte alphabet, consuming the
    * PERSISTED model (train-once memo; training is the text_bpe_bytes
    * row). Merges are trained over documents + the multi-byte fixture
    * (identically to the train row); the encoded stream is the
    * documents table itself.
    */
  def textBpeBytesEncode(s: SparkSession, dir: String): DataFrame = {
    val corpus = docs(s, dir).select(col("text"))
      .unionByName(
        s.createDataFrame(ByteBpeFixture.map(Tuple1.apply)).toDF("text"))
    val merges = TextAnalysis.bpeBytesModelPersisted(corpus, "text",
      rounds = 8, key = dir).map(_._2)
    TextAnalysis.bpeBytesEncodeStats(docs(s, dir), "doc_id", "text", merges)
      .orderBy("doc_id")
  }

  def textBpeTrain(s: SparkSession, dir: String): DataFrame = {
    val merges = TextAnalysis.bpeTrain(docs(s, dir), "doc_id", "text",
      rounds = 6)
    s.createDataFrame(merges).toDF("round", "merge", "weight")
      .orderBy("round")
  }

  /** BPE encode ([[TextAnalysis.bpeEncodeStats]]): the per-document
    * tokenization pass with the TRAINED 6-merge list — token/piece/char
    * counts and the chars-per-piece compression ratio per doc. The
    * oracle carries the original token through the training recurrence
    * and joins each doc's token stream to the final vocabulary state.
    */
  def textBpeEncode(s: SparkSession, dir: String): DataFrame = {
    // persisted-model path (train once per JVM, reload thereafter) —
    // the apply-only cost shape; training is the text_bpe_train row
    val merges = TextAnalysis.bpeModelPersisted(docs(s, dir), "doc_id",
      "text", rounds = 6, key = dir).map(_._2)
    TextAnalysis.bpeEncodeStats(docs(s, dir), "doc_id", "text", merges)
      .orderBy("doc_id")
  }

  /** BPE apply ([[TextAnalysis.bpeApply]]) consuming the TRAINED merge
    * list end-to-end: [[TextAnalysis.bpeTrain]]'s 6 learned merges
    * (collected — the merge list is the rounds-bounded model artifact, a
    * handful of strings) applied in learned order over the corpus
    * vocabulary. Because trainer and applier share the same exhaustive
    * leftmost-replace semantics on the same corpus, the applied state
    * equals the trainer's final vocabulary — which is exactly how the
    * oracle checks it (replay the recurrence, count final pieces).
    */
  def textBpeApply(s: SparkSession, dir: String): DataFrame = {
    val merges = TextAnalysis.bpeModelPersisted(docs(s, dir), "doc_id",
      "text", rounds = 6, key = dir).map(_._2)
    TextAnalysis.bpeApply(docs(s, dir), "doc_id", "text", merges)
  }

  /** Winnowing fingerprint statistics ([[TextAnalysis.winnowStats]]):
    * per-doc selected-fingerprint count and density under the MOSS
    * 4-gram / window-4 scheme (expected density 2/(w+1) = 0.4).
    */
  def textWinnowing(s: SparkSession, dir: String): DataFrame =
    TextAnalysis.winnowStats(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Full Lloyd k-means (k=4, 2 iterations, deterministic smallest-id
    * init) over the embedding corpus; output = per-cluster size + mean
    * within-cluster cosine.
    */
  def mlKmeans(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    Clustering.kmeansSummary(e, "vec_id", "emb", k = 4, iters = 2)
  }

  /** End-to-end training-data prep — the operators composed as one
    * pipeline over the near-dup corpus:
    *
    *   1. quality gate ([[TextAnalysis.quality]] keep flag);
    *   2. near-dup removal: MinHash-LSH pairs → connected components →
    *      keep the min doc id per component;
    *   3. token statistics ([[TextAnalysis.tokenStats]]) for survivors.
    *
    * Each stage is the same operator the standalone queries check; this
    * query pins that they compose (the oracle recomputes the whole
    * pipeline independently).
    */
  def pipelinePrep(s: SparkSession, dir: String): DataFrame = {
    val corpus = nearDupDocs(s, dir)
    val keepQuality = TextAnalysis.quality(corpus, "doc_id", "text")
      .filter(col("keep") === 1).select("doc_id")
    val pairs = Dedup.nearDupPairs(corpus, "doc_id", "text",
      shingleN = 3, numHashes = 16, rowsPerBand = 2, threshold = 0.5)
    val dupLosers = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("comp")).select(col("id").as("doc_id"))
    val survivors = keepQuality.join(dupLosers, Seq("doc_id"), "left_anti")
    TextAnalysis.tokenStats(corpus, "doc_id", "text")
      .join(survivors, "doc_id")
      .orderBy("doc_id")
  }

  /** IVF with nprobe=2: probes also scan their runner-up inverted list —
    * the recall dial beyond [[simIvfAnn]]'s nprobe=1.
    */
  def simIvfNprobe(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10).drop("label")
    val centroids = Similarity.trainCentroids(corpus, "label", "emb")
    Similarity.ivfTopKNprobe(corpus.drop("label"), probes, centroids,
        "vec_id", "emb", k = 2, nprobe = 2)
      .orderBy("probe_id", "rn")
  }

  /** Deterministic stratified train/val/test split over the corpus
    * ([[Prep.trainValTestSplit]]): exact 10/10/80 per language stratum,
    * rank-by-portable-hash so any engine reproduces the assignment.
    */
  def prepSplit(s: SparkSession, dir: String): DataFrame =
    Prep.trainValTestSplit(docs(s, dir).select(col("doc_id"), col("lang")),
        "doc_id", "lang")
      .orderBy("doc_id")

  /** Scaler fit over lineitem cents per return flag
    * ([[Prep.scaleStats]]): one aggregate, floor-quantized z/min-max
    * probes.
    */
  def prepScale(s: SparkSession, dir: String): DataFrame =
    Prep.scaleStats(graft.Tables.load(s, dir, "lineitem"), "l_returnflag",
        floor(col("l_extendedprice") * 100 + 0.5).cast("long"))
      .orderBy("l_returnflag")

  /** Discretization fit ([[Prep.binStats]]): equal-width occupancy +
    * equal-frequency split points per return-flag group over exact
    * cent-quantized prices.
    */
  def prepBin(s: SparkSession, dir: String): DataFrame =
    Prep.binStats(graft.Tables.load(s, dir, "lineitem"), "l_returnflag",
      floor(col("l_extendedprice") * 100 + 0.5).cast("long"),
      concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string")))

  /** Leakage-safe split ([[Prep.leakageSafeSplit]]): duplicate groups
    * (normalized-content keyed) assigned to folds atomically — the
    * oracle replays group formation, the salted group rank, and the
    * member propagation row-for-row.
    */
  def prepLeakageSplit(s: SparkSession, dir: String): DataFrame =
    Prep.leakageSafeSplit(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id")

  /** Stratified 5-fold CV assignment ([[Prep.kFold]]) over source
    * strata — the full per-row fold map, so the oracle pins every
    * held-out set, not just the fold sizes.
    */
  def prepKfold(s: SparkSession, dir: String): DataFrame =
    Prep.kFold(docs(s, dir).select(col("doc_id"), col("source")),
        "doc_id", "source", k = 5)
      .orderBy("doc_id")

  /** GPT-style sequence packing ([[Prep.packSequences]]): the corpus laid
    * out as one concatenated token stream chunked into 1024-token
    * training sequences, each doc mapped to its absolute offset and
    * first/last sequence — via the scalable two-level prefix sum, never
    * a global single-task window.
    */
  def prepPack(s: SparkSession, dir: String): DataFrame =
    Prep.packSequences(docs(s, dir), "doc_id", "text", budget = 1024)
      .orderBy("doc_id")

  /** Overlapping token-window chunking ([[Prep.chunkDocs]]) with content
    * fingerprints the oracle recomputes from the same slices.
    */
  def prepChunk(s: SparkSession, dir: String): DataFrame =
    Prep.chunkDocs(docs(s, dir), "doc_id", "text")
      .orderBy("doc_id", "chunk_id")

  /** Deterministic word-dropout augmentation ([[Prep.augmentDropout]]):
    * reproducible 10% mask, content fingerprinted for the oracle.
    */
  def prepAugment(s: SparkSession, dir: String): DataFrame =
    Prep.augmentDropout(docs(s, dir), "doc_id", "text").orderBy("doc_id")

  /** Seeded deterministic corpus shuffle ([[Prep.shuffleOrder]]): the
    * exact global permutation position of every document under the
    * md5(id:seed) order, via the two-level prefix sum — reproducible in
    * any engine with md5, so the oracle pins the entire permutation.
    */
  def prepShuffle(s: SparkSession, dir: String): DataFrame =
    Prep.shuffleOrder(docs(s, dir).select(col("doc_id")), "doc_id", seed = 42)
      .orderBy("pos")

  /** ANN quality measured, not assumed: recall@1 of the bucketed LSH path
    * and the IVF path against the brute-force ground truth, computed by
    * the engine itself (the oracle recomputes all three sides
    * independently). A probe whose bucket holds no candidate counts as a
    * miss — recall accounting must include empty buckets.
    */
  def simRecall(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10).drop("label")
    val exact = Similarity.cosineTopK(corpus.drop("label"), probes, "vec_id", "emb", k = 1)
      .select(col("probe_id"), col("neighbor_id").as("true_nn"))
    def recallOf(method: String, ann: DataFrame): DataFrame =
      exact.join(ann, Seq("probe_id"), "left")
        .agg(count(lit(1)).as("n_probes"),
          sum(when(col("ann_nn") === col("true_nn"), 1L).otherwise(0L)).as("hits"))
        .select(lit(method).as("method"), col("n_probes"), col("hits"),
          round(col("hits") / col("n_probes"), 4).as("recall_at_1"))
    val lsh = Similarity.lshTopK(corpus.drop("label"), probes, "vec_id", "emb",
        bits = 4, k = 1)
      .select(col("probe_id"), col("neighbor_id").as("ann_nn"))
    val centroids = Similarity.trainCentroids(corpus, "label", "emb")
    val ivf = Similarity.ivfTopK(corpus.drop("label"), probes, centroids,
        "vec_id", "emb", k = 1)
      .select(col("probe_id"), col("neighbor_id").as("ann_nn"))
    // nprobe=2 beside nprobe=1: the recall-vs-cost dial, measured
    val ivf2 = Similarity.ivfTopKNprobe(corpus.drop("label"), probes, centroids,
        "vec_id", "emb", k = 1, nprobe = 2)
      .select(col("probe_id"), col("neighbor_id").as("ann_nn"))
    recallOf("ivf_nprobe1", ivf)
      .unionByName(recallOf("ivf_nprobe2", ivf2))
      .unionByName(recallOf("lsh_bits4", lsh))
      .orderBy("method")
  }

  /** The GRAPH-index ANN tier measured ([[Similarity.hnswLiteTopK]]):
    * per-probe hit table of the HNSW-lite greedy-descent + beam search
    * against the brute-force truth — the oracle replays the ENTIRE
    * construction and search (derandomized levels, bucketed adjacencies,
    * all seven fixed rounds) in generated CTE chains, so any edge-set,
    * entry-point, round-order or tie-break mistake flips a row.
    */
  /** The GRAPH-index ANN tier, production row ([[Similarity.hnswLiteTopK]]
    * standalone): per-probe nearest neighbor by the HNSW-lite greedy
    * beam walk — the benchable entry whose cost IS the tier's query
    * cost (construction + fixed-round search, no brute-force leg).
    * Certification lives in the [[simHnswRecall]] measurement row.
    */
  def simHnswAnn(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    Similarity.hnswLiteTopK(
        e.filter(col("vec_id") >= 10), e.filter(col("vec_id") < 10),
        "vec_id", "emb")
      .orderBy("probe_id")
  }

  def simHnswRecall(s: SparkSession, dir: String): DataFrame = {
    val e = embs(s, dir).select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
    val corpus = e.filter(col("vec_id") >= 10)
    val probes = e.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(corpus, probes, "vec_id", "emb", k = 1)
      .select(col("probe_id"), col("neighbor_id").as("true_nn"))
    val ann = Similarity.hnswLiteTopK(corpus, probes, "vec_id", "emb")
      .withColumnRenamed("neighbor_id", "hnsw_nn")
    exact.join(ann, Seq("probe_id"))
      .select(col("probe_id"), col("true_nn"), col("hnsw_nn"),
        when(col("hnsw_nn") === col("true_nn"), 1).otherwise(0)
          .cast("int").as("hit"))
      .orderBy("probe_id")
  }

  /** Per-label centroid via the typed Aggregator UDAF (§2.D) — the IVF
    * coarse-quantizer training step; output exploded to (label, dim, value)
    * rows so the oracle can reproduce it with plain SQL.
    */
  def udafCentroid(s: SparkSession, dir: String): DataFrame = {
    val centroid = udaf(graft.functions.CentroidAgg)
    embs(s, dir)
      .select(col("label"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("emb"))
      .groupBy("label")
      .agg(centroid(col("emb")).as("c"))
      .select(col("label"), posexplode(col("c")))
      .select(col("label"), (col("pos") + 1).cast("long").as("i"),
        // + 0.0 canonicalizes IEEE negative zero: a mean that rounds to
        // -0.0 on one engine and +0.0 on another prints differently and
        // breaks the hash compare (seen at sf0.001)
        (round(col("col"), 4) + lit(0.0)).as("v"))
      .orderBy("label", "i")
  }
}
