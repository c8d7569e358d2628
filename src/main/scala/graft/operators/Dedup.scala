package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable hashing helpers.
  *
  * [[md5Long]] is a 60-bit hash computable identically in other engines
  * (DuckDB: `('0x'||substr(md5(x),1,15))::BIGINT`), used where an external
  * oracle must reproduce hash values bit-for-bit (simhash, fingerprints).
  * Internal-only hashing (MinHash, LSH banding) uses `xxhash64` instead —
  * codegen'd and several times faster, which matters when the input is
  * 100 TB of shingles.
  */
object Hashing {
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
}

/** Parallelism guard for heavy row-local derivation passes (shingling,
  * minhash, gram posting, payload encoding): a corpus arriving as ONE
  * small file gives the scan ONE partition, pinning the whole
  * interpreted per-row pipeline to one thread regardless of cluster
  * width (measured: CDC chunking flat at 7.5 s from 1× to 8× corpus
  * because the n-fold union produced exactly n partitions). Widens only
  * when the input is narrower than the cluster's slots — a no-op
  * exchange-wise for any pre-partitioned production corpus.
  */
private[operators] object Spread {
  /** `spark.graft.spread` ∈ {auto, force, off}.
    *
    * `auto` (default) inspects `df.rdd.getNumPartitions`, which FORCES
    * physical planning of the upstream frame (including file-source
    * partition listing) at operator-CONSTRUCTION time, and bakes the
    * build-time `defaultParallelism` into the emitted plan — plan
    * construction is NOT side-effect-free in this mode, and a plan built
    * on one cluster and executed on another keeps the builder's verdict.
    * Callers that construct plans ahead of execution (or repeatedly)
    * should set `force` — unconditional round-robin repartition, a pure
    * lazy plan node, cheap for the heavy row-local passes this guards
    * because the exchange moves raw payloads once while saving a
    * cluster-width factor of interpreted per-row work — or `off` when
    * the input is known pre-partitioned.
    */
  val ModeKey = "spark.graft.spread"

  def ifNarrow(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val slots = spark.sparkContext.defaultParallelism
    spark.conf.get(ModeKey, "auto") match {
      case "off"   => df
      case "force" => df.repartition(slots)
      case _ =>
        if (df.rdd.getNumPartitions < slots) df.repartition(slots) else df
    }
  }
}

/** Deduplication operators for large document corpora.
  *
  * The reference's dedup story is snapshot-overwrite idempotency
  * (reference dags/copy_cloudsql_to_bigquery_v2.py:108); a training-data
  * pipeline needs content-level dedup. All operators here are single-pass +
  * one bucketed shuffle — never an all-pairs O(n²) join:
  *
  *   - [[exactKeepMin]]: hash-groupBy on content key, deterministic keeper.
  *   - MinHash+LSH ([[withShingles]] → [[withMinhash]] → [[lshCandidates]]
  *     → [[verifyJaccard]]): shingle → signature → band-bucket join →
  *     exact verify on the (tiny) candidate set. Shuffles scale with
  *     bucket collisions, not with n².
  *   - [[simhash]]: 32-bit rotation-invariant signature; near-dups differ
  *     in few bits (Charikar 2002 / Manku et al. WWW'07 style).
  */
object Dedup {

  /** Exact dedup: group on content columns, keep the smallest id —
    * deterministic, unlike `dropDuplicates`' arbitrary-surviving-row. One
    * map-side-combined shuffle on the content hash.
    */
  def exactKeepMin(df: DataFrame, keyCols: Seq[String], idCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))

  /** QUALITY-AWARE keeper selection — the production refinement of
    * [[exactKeepMin]]: when a duplicate group spans sources of unequal
    * quality (a clean article and its ad-ridden scrape), min-id keeps a
    * COIN FLIP; this keeps the argmax-quality member (deterministic
    * tie-break on id). Same single map-side-combined aggregate — the
    * keeper rides a max(struct(score, -id)) fold, so the 100 TB shape
    * is unchanged: one scan, one hash-aggregate shuffle on the dup key,
    * no window over the fact table.
    */
  def exactKeepBest(df: DataFrame, keyCols: Seq[String], idCol: String,
                    scoreCol: String): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(
        max(struct(col(scoreCol).as("s"), (-col(idCol)).as("ni"),
          col(idCol).as("id"))).as("best"),
        count(lit(1)).as("dup_count"),
        min(col(idCol)).as("min_id"))
      .select(col("best.id").as("keep_id"), col("best.s").as("keep_score"),
        col("dup_count"), (col("best.id") =!= col("min_id")).as("rescued"))

  /** Normalization-keyed exact dedup (the CCNet/RefinedWeb prep step):
    * docs collapse on their lower-cased, punctuation-stripped,
    * whitespace-collapsed text, so trivial formatting variants of the
    * same content dedup away before the (much costlier) near-dup passes.
    * The normalization is row-local; the only exchange is the same
    * map-side-combined group-by-key shuffle as [[exactKeepMin]] — the
    * 100 TB shape is one scan + one hash aggregate on the (md5) key.
    */
  def normalizedDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = trim(regexp_replace(regexp_replace(lower(col(textCol)),
      lit("[^a-z0-9 ]"), lit(" ")), lit(" +"), lit(" ")))
    docs.select(col(idCol), norm.as("norm_text"))
      .groupBy(col("norm_text"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).cast("long").as("n_dups"))
      .select(col("keep_id"), col("n_dups"), md5(col("norm_text")).as("norm_md5"))
  }

  /** Distinct word n-gram shingle set per doc; docs shorter than n tokens
    * carry no shingle and are dropped (mirrored by oracle queries).
    */
  def withShingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame = {
    val grams = (0 until n).map(k => s"element_at(tk, i + $k)").mkString(", ")
    docs.filter(size(split(col(textCol), " ")) >= n)
      .withColumn("tk", split(col(textCol), " "))
      .withColumn("shingles",
        expr(s"array_distinct(transform(sequence(1, size(tk) - ${n - 1}), i -> concat_ws(' ', $grams)))"))
      .select(col(idCol), col("shingles"))
  }

  /** MinHash signature as ONE `mhs` array column, built in a single
    * aggregate pass. The shingle STRING is hashed once per shingle; the k
    * signature hashes re-hash the resulting 64-bit value with per-hash
    * seeds, folded as k running minima — one traversal of the shingle set
    * and one k-element accumulator per doc, instead of k separate
    * `array_min(transform(...))` passes each allocating a full hash array
    * (the round-3 GC hot spot on the 100 TB shingle path).
    */
  def withMinhash(shingled: DataFrame, numHashes: Int = 8): DataFrame =
    shingled.withColumn("mhs",
      expr(s"""aggregate(
         |  transform(shingles, s -> xxhash64(s)),
         |  array_repeat(CAST(9223372036854775807 AS BIGINT), $numHashes),
         |  (acc, h) -> transform(acc, (m, j) -> least(m, xxhash64(h, j))))""".stripMargin))

  /** LSH banding: signatures split into bands of `rowsPerBand`; docs whose
    * band hashes collide become candidate pairs. The self-join shuffles on
    * (band_id, band_hash) — candidates come from shared buckets only, so
    * cost tracks collision counts, never n².
    */
  /** (id, band_id, band_hash) bucket rows for the banded signature. */
  private def bandBuckets(sig: DataFrame, idCol: String,
                          numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0, "bands must tile the signature")
    val bands = numHashes / rowsPerBand
    val bandCols = (0 until bands).map { b =>
      val hs = (0 until rowsPerBand).map(r => s"element_at(mhs, ${b * rowsPerBand + r + 1})")
      struct(lit(b).as("band_id"), expr(s"xxhash64(${hs.mkString(", ")})").as("band_hash"))
    }
    sig.select(col(idCol), explode(array(bandCols: _*)).as("b"))
      .select(col(idCol), col("b.band_id"), col("b.band_hash"))
  }

  /** Pick `rowsPerBand` for a target Jaccard threshold: the banded
    * S-curve's 50%-collision midpoint is `(1/b)^(1/r)` (b bands of r
    * rows), and the divisor of `numHashes` whose midpoint lands closest
    * to the target gives the steepest useful curve — the standard LSH
    * tuning rule (Leskovec/Rajaraman/Ullman, MMDS §3.4.3), here as a
    * function instead of folklore. Deterministic driver-side arithmetic;
    * feed the result to [[nearDupPairs]] / [[lshCandidates]].
    */
  def bandingForThreshold(numHashes: Int, threshold: Double): Int = {
    require(numHashes > 0 && threshold > 0 && threshold < 1)
    (1 to numHashes).filter(numHashes % _ == 0)
      .minBy(r => math.abs(
        math.pow(1.0 / (numHashes / r), 1.0 / r) - threshold))
  }

  def lshCandidates(sig: DataFrame, idCol: String,
                    numHashes: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val buckets = bandBuckets(sig, idCol, numHashes, rowsPerBand)
    buckets.as("l").join(buckets.as("r"),
        col("l.band_id") === col("r.band_id") &&
          col("l.band_hash") === col("r.band_hash") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("a"), col(s"r.$idCol").as("b"))
      .distinct()
  }

  /** The (id, shingles, mhs) signature frame — the persistable artifact
    * the incremental near-dup form reuses across runs (write it out once,
    * read it back each day instead of re-hashing the lake).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 8): DataFrame =
    withMinhash(withShingles(Spread.ifNarrow(docs), idCol, textCol, shingleN),
      numHashes)

  /** Incremental MinHash-LSH near-dup against PRECOMPUTED lake
    * signatures: the delta-vs-lake form of [[nearDupPairs]] for a
    * daily-ingest pipeline. Only the delta is shingled and hashed this
    * run; `lakeSig` is a previously materialized [[minhashSignatures]]
    * frame (persisted parquet, or a checkpoint within the session), so
    * the per-run cost is O(Δ signatures + band-bucket collisions) — the
    * lake is neither re-hashed nor re-paired against itself. Only
    * candidate pairs INVOLVING a delta document are ever generated (the
    * delta's band buckets join the lake∪delta buckets); recall for the
    * emitted pair class is the SAME banded S-curve as the batch operator
    * (identical signatures and banding, only the old×old pair class is
    * skipped by construction).
    */
  def deltaNearDupPairs(lakeSig: DataFrame, delta: DataFrame,
                        idCol: String, textCol: String,
                        shingleN: Int = 3, numHashes: Int = 8,
                        rowsPerBand: Int = 2,
                        threshold: Double = 0.5): DataFrame = {
    val sigNew = minhashSignatures(delta, idCol, textCol, shingleN, numHashes)
      .localCheckpoint(true) // feeds its buckets AND the verify join
    val sig = lakeSig.unionByName(sigNew)
    val bAll = bandBuckets(sig, idCol, numHashes, rowsPerBand)
    val bNew = bandBuckets(sigNew, idCol, numHashes, rowsPerBand)
    val cands = bNew.as("l").join(bAll.as("r"),
        col("l.band_id") === col("r.band_id") &&
          col("l.band_hash") === col("r.band_hash") &&
          col(s"l.$idCol") =!= col(s"r.$idCol"))
      .select(least(col(s"l.$idCol"), col(s"r.$idCol")).as("a"),
        greatest(col(s"l.$idCol"), col(s"r.$idCol")).as("b"))
      .distinct()
    verifyJaccard(cands, sig, idCol, threshold).orderBy("a", "b")
  }

  /** Convenience form of [[deltaNearDupPairs]] that builds the lake
    * signatures in-run. NOTE the cost contract: this overload pays a
    * full signature pass over the lake every run — what it avoids is
    * only the quadratic lake×lake pair join. A daily pipeline at 100 TB
    * should persist [[minhashSignatures]] of the lake once and call
    * [[deltaNearDupPairs]] directly, which is the O(Δ·collisions) form.
    */
  def incrementalNearDupPairs(lake: DataFrame, delta: DataFrame,
                              idCol: String, textCol: String,
                              shingleN: Int = 3, numHashes: Int = 8,
                              rowsPerBand: Int = 2,
                              threshold: Double = 0.5): DataFrame =
    deltaNearDupPairs(
      minhashSignatures(lake, idCol, textCol, shingleN, numHashes)
        .localCheckpoint(true),
      delta, idCol, textCol, shingleN, numHashes, rowsPerBand, threshold)

  /** Exact Jaccard check of candidate pairs against the true shingle sets —
    * the candidate set is tiny post-LSH, so the two joins broadcast.
    */
  def verifyJaccard(pairs: DataFrame, shingled: DataFrame, idCol: String,
                    threshold: Double): DataFrame = {
    val sets = shingled.select(col(idCol), col("shingles"))
    pairs
      .join(sets.select(col(idCol).as("a"), col("shingles").as("sa")), "a")
      .join(sets.select(col(idCol).as("b"), col("shingles").as("sb")), "b")
      .withColumn("jaccard",
        expr("size(array_intersect(sa, sb)) / CAST(size(array_union(sa, sb)) AS DOUBLE)"))
      .filter(col("jaccard") >= threshold)
      .select(col("a"), col("b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Full MinHash-LSH near-dup pipeline.
    *
    * The (id, shingles, mhs) frame is materialized ONCE (eager
    * localCheckpoint): it feeds BOTH the band-bucket join and the exact
    * Jaccard verify, and without materialization the shingle+minhash
    * pipeline runs twice per query — worse, CollapseProject would inline
    * the minhash aggregate into each of the band projections. Checkpoint,
    * not cache: no shared-CacheManager entry (each run pays its own
    * compute — honest benchmarks), and the blocks are released when the
    * RDD is garbage-collected.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, numHashes: Int = 8, rowsPerBand: Int = 2,
                   threshold: Double = 0.5): DataFrame = {
    val sig = withMinhash(
        withShingles(Spread.ifNarrow(docs), idCol, textCol, shingleN), numHashes)
      .localCheckpoint(true)
    val cands = lshCandidates(sig, idCol, numHashes, rowsPerBand)
    verifyJaccard(cands, sig, idCol, threshold)
      .orderBy("a", "b")
  }

  /** Soft dedup: instead of DROPPING duplicates, every row keeps a
    * training weight `1 / |duplicate group|` on its normalized-content
    * key, so n copies of a document contribute one document's worth of
    * gradient — the down-weighting alternative pipelines use when hard
    * dedup would distort the distribution. One shuffle (the group-size
    * window on the normalized key); no row is lost, which also makes the
    * output safely joinable back to the full corpus.
    */
  def softDedupWeights(docs: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val norm = trim(regexp_replace(regexp_replace(lower(col(textCol)),
      lit("[^a-z0-9 ]"), lit(" ")), lit(" +"), lit(" ")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("norm_text")
    docs.select(col(idCol), norm.as("norm_text"))
      .withColumn("n_dups", count(lit(1)).over(w).cast("long"))
      .select(col(idCol), col("n_dups"),
        round(lit(1.0) / col("n_dups"), 6).as("weight"))
  }

  /** Containment near-dup pairs (Broder's containment, not resemblance):
    * `|A∩B| / min(|A|,|B|)` catches a document EMBEDDED in a larger one —
    * boilerplate wrap, quote-and-extend — where Jaccard stays low because
    * the union grows. Candidates come from a bottom-k sketch join: every
    * doc emits its k smallest-hash shingles as keys, every doc exposes its
    * full shingle set, and a candidate is any (key ∈ other's set) hit.
    *
    * Exactness: if the smaller set is missing m < k − minKeys + 1 shingles
    * of an overlap partner (m ≤ (1−t)·|small|, so guaranteed whenever
    * |small| < (k − minKeys + 1)/(1−t) — 70 shingles at the t = 0.9,
    * k = 8, minKeys = 2 defaults), at least k − m ≥ minKeys of its
    * bottom-k keys MUST land in the big set (for h in the small set:
    * fewer than k set members hash below h in the superset implies fewer
    * below it in the subset), so the bucketed path finds every qualifying
    * pair; beyond the bound the miss probability decays as (1−t)^k. The
    * co-occurrence floor is `least(minKeys, |smaller bottom-k set|)`, so
    * the bound extends to docs with FEWER than minKeys distinct shingles
    * (a 3-token doc carries one shingle; full containment puts that one
    * shingle — its entire bottom-k — in the wrapper's set, and the
    * capped floor admits the pair a flat minKeys floor would drop). The
    * minKeys co-occurrence floor is what keeps the exact-verify stage
    * small: random pairs rarely share even two bottom-k keys, so the
    * expensive `array_intersect` runs on true-pair-density candidates.
    * Scale shape: the exploded shingle table is the one big shuffle (same
    * class as [[paragraphBoilerplate]]'s window table); the key side is k
    * rows per doc; never an all-pairs join.
    */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       threshold: Double, shingleN: Int = 3,
                       k: Int = 8, minKeys: Int = 2): DataFrame = {
    // repartition BEFORE the checkpoint: a single-file source would pin the
    // shingle computation (and everything fed from the checkpoint) to one
    // input split — the blockedJaccardPairs parallelism trap
    val n = docs.sparkSession.sparkContext.defaultParallelism
    val sets = withShingles(docs.repartition(n), idCol, textCol, shingleN)
      .localCheckpoint(true)
    // The key join runs on the 64-BIT SHINGLE HASH, not the shingle
    // string (the dedup_span md5Long-posting convention; guide §2.3
    // narrower types): the `all` side is the corpus's full exploded
    // shingle table and this is the operator's one big shuffle — an
    // 8-byte key in place of a multi-word string cuts its shuffle bytes
    // several-fold and the join comparisons to one long each. The
    // bottom-k side already computed xxhash64(s) to RANK the keys, so
    // candidate selection is unchanged; the distinct-key floor below
    // counts hashes instead of strings (identical modulo a 64-bit
    // collision — the same caveat every hash-keyed blocking tier here
    // carries, and a collision can only add a candidate the exact
    // verify stage re-checks or merge two shared keys of one pair).
    val keys = sets.select(col(idCol).as("a"),
        least(lit(k), size(col("shingles"))).as("nka"),
        explode(expr(
          s"slice(array_sort(transform(shingles, s -> xxhash64(s))), 1, $k)")).as("h"))
    val all = sets.select(col(idCol).as("b"),
      least(lit(k), size(col("shingles"))).as("nkb"),
      explode(expr("transform(shingles, s -> xxhash64(s))")).as("h"))
    // count DISTINCT shared keys: a shingle in both docs' bottom-k shows
    // up once per join direction, and row counts would let one such
    // shingle fake the minKeys floor. The floor itself is capped at the
    // SMALLER doc's bottom-k size (least(nka, nkb) — symmetric, so it
    // survives the a/b canonicalization below): a doc with fewer than
    // minKeys distinct shingles can never share minKeys keys, and a flat
    // minKeys floor would silently drop its containment-1.0 pair with a
    // wrapping doc.
    val cands = keys.join(all, Seq("h"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"), col("h"),
        least(col("nka"), col("nkb")).as("fk"))
      .groupBy("a", "b")
      .agg(countDistinct(col("h")).as("nk"), min(col("fk")).as("fk"))
      .filter(col("nk") >= least(lit(minKeys), col("fk")))
      .select("a", "b")
    cands
      .join(sets.select(col(idCol).as("a"), col("shingles").as("sa")), "a")
      .join(sets.select(col(idCol).as("b"), col("shingles").as("sb")), "b")
      .withColumn("containment",
        expr("size(array_intersect(sa, sb)) / CAST(least(size(sa), size(sb)) AS DOUBLE)"))
      .filter(col("containment") >= threshold)
      .select(col("a"), col("b"), round(col("containment"), 4).as("containment"))
      .orderBy("a", "b")
  }

  /** Exact duplicate-SPAN detection: for every doc pair sharing at least
    * one exact n-token gram, the LONGEST contiguous shared token run and
    * the count of distinct shared grams — the span-level dedup from Lee
    * et al., "Deduplicating Training Data Makes Language Models Better"
    * (arXiv:2107.06499), re-expressed relationally instead of via their
    * suffix array: a shared run of R tokens appears as R−n+1 consecutive
    * postings on ONE (d1, d2, p1−p2) diagonal, so runs fall out of a
    * gaps-and-islands pass (p1 − rank) over the matched postings. This
    * catches partial-overlap pairs (quoted paragraphs, spliced docs) that
    * whole-doc similarity misses, and reports WHERE the overlap mass is
    * (run length), which Jaccard can't.
    *
    * Scale shape: postings (gram hash, doc, pos) shuffle once on the
    * 60-bit hash; grams present in more than `maxDf` docs are dropped
    * before the pair join (the boilerplate guard — same role as
    * [[paragraphBoilerplate]]'s recurring set, and the exact analog of
    * Lee et al. discarding over-frequent duplicate grams), so per-gram
    * join fan-out is bounded by maxDf² and never corpus-sized. The
    * diagonal window + island aggregate shuffle on (d1, d2[, diag]) —
    * sized by TRUE overlap, not corpus size. The matched-postings frame
    * feeds both the island pass and the distinct-gram count, so it
    * materializes once (eager localCheckpoint, the shared-frame idiom).
    * A within-doc repeated gram contributes one posting per occurrence —
    * fan-out bounded by doc length, with pathological self-repetition
    * already measured by [[graft.operators.TextAnalysis.repetition]].
    *
    * Exactness: over grams under the maxDf cap, every shared run of at
    * least minRun tokens contains a full n-gram window on its diagonal,
    * so no qualifying pair is missed (minRun ≥ n by construction here).
    */
  def duplicateSpans(docs: DataFrame, idCol: String, textCol: String,
                     n: Int = 8, minRun: Int = 12, maxDf: Int = 64): DataFrame = {
    require(minRun >= n, s"minRun ($minRun) must be >= gram width n ($n)")
    val parts = (0 until n).map(j => s"element_at(tk, i + $j)").mkString(", ")
    val posts = Spread.ifNarrow(docs).withColumn("tk", split(col(textCol), " "))
      .filter(size(col("tk")) >= n)
      .select(col(idCol),
        explode(expr(s"transform(sequence(1, size(tk) - ${n - 1}), " +
          s"i -> struct(i AS pos, concat_ws(' ', $parts) AS gram))")).as("pg"))
      .select(col(idCol), col("pg.pos").as("pos"),
        Hashing.md5Long(col("pg.gram")).as("h"))
    val hot = posts.groupBy("h")
      .agg(count_distinct(col(idCol)).as("nd"))
      .filter(col("nd") > maxDf).select("h")
    // Materialize the surviving postings ONCE: `kept` is consumed by BOTH
    // sides of the pair self-join (the multi-consumer barrier rule —
    // unbarriered, each side re-runs tokenize→explode→hash plus the
    // hot-gram anti-join). Locally the pair join dominates and the
    // barrier measures neutral at sf0.1; at scale it trades one
    // materialization of |postings| rows for a second full corpus scan.
    val kept = posts.join(hot, Seq("h"), "left_anti").localCheckpoint(true)
    val m = kept.select(col("h"), col(idCol).as("d1"), col("pos").as("p1"))
      .join(kept.select(col("h"), col(idCol).as("d2"), col("pos").as("p2")), "h")
      .filter(col("d1") < col("d2"))
      .localCheckpoint(true) // feeds the island pass AND the gram count
    val wd = org.apache.spark.sql.expressions.Window
      .partitionBy(col("d1"), col("d2"), col("diag"))
      .orderBy(col("p1"))
    val longest = m.withColumn("diag", col("p1") - col("p2"))
      .withColumn("islid", col("p1") - row_number().over(wd))
      .groupBy("d1", "d2", "diag", "islid")
      .agg(count(lit(1)).as("glen"))
      .groupBy("d1", "d2")
      .agg((max("glen") + (n - 1)).as("longest_run"))
    val shared = m.groupBy("d1", "d2")
      .agg(count_distinct(col("h")).as("shared_grams"))
    longest.join(shared, Seq("d1", "d2"))
      .filter(col("longest_run") >= minRun)
  }

  /** Duplicate-span REMOVAL — the "onion" step after [[duplicateSpans]]
    * finds overlap (Lee et al., arXiv:2107.06499 §4: the duplicated
    * span is REMOVED from all but one occurrence, not the whole doc
    * dropped): every token covered by an exact n-gram that some EARLIER
    * doc (min doc id per gram = the kept copy) also contains is marked,
    * marked tokens are deleted, and each affected doc reports its
    * before/removed counts plus a fingerprint of the kept text for the
    * hash gate. Docs whose every token is removed vanish from the
    * output (nothing kept to fingerprint) — the documented contract.
    *
    * Scale shape: postings shuffle ONCE on the gram hash; the dup-gram
    * frame is vocabulary-bounded and carries the same `maxDf`
    * boilerplate cap as [[duplicateSpans]] (an over-frequent gram is
    * boilerplate, not plagiarism — and uncapped it would fan the mark
    * join corpus-wide); marks are sized by TRUE duplication; the kept
    * reassembly groups on doc id, bounded by doc length. No pair join
    * at all — removal needs only gram→keeper, never doc×doc.
    */
  def spanRemoval(docs: DataFrame, idCol: String, textCol: String,
                  n: Int = 8, maxDf: Int = 64): DataFrame = {
    val parts = (0 until n).map(j => s"element_at(tk, i + $j)").mkString(", ")
    val base = Spread.ifNarrow(docs)
      .withColumn("tk", split(col(textCol), " "))
      .localCheckpoint(true) // feeds postings, token explode, and totals
    val posts = base.filter(size(col("tk")) >= n)
      .select(col(idCol),
        explode(expr(s"transform(sequence(1, size(tk) - ${n - 1}), " +
          s"i -> struct(i AS pos, concat_ws(' ', $parts) AS gram))")).as("pg"))
      .select(col(idCol), col("pg.pos").as("pos"),
        Hashing.md5Long(col("pg.gram")).as("h"))
      .localCheckpoint(true) // feeds the gram stats AND the mark join
    val dup = posts.groupBy("h")
      .agg(count_distinct(col(idCol)).as("nd"), min(col(idCol)).as("keeper"))
      .filter(col("nd") > 1 && col("nd") <= maxDf)
      .select("h", "keeper")
    val marks = posts.join(dup, "h")
      .filter(col(idCol) > col("keeper")) // the min-id copy is KEPT
      .select(col(idCol).as("m_doc"),
        explode(expr(s"sequence(pos, pos + ${n - 1})")).as("t"))
      .distinct()
      .localCheckpoint(true) // feeds the anti-join AND the removal count
    val toks = base
      .select(col(idCol), posexplode(col("tk")).as(Seq("pos0", "tok")))
      .withColumn("pos", col("pos0") + 1)
    val kept = toks.join(marks,
      col(idCol) === col("m_doc") && col("pos") === col("t"), "left_anti")
    val keptAgg = kept.groupBy(idCol).agg(
      md5(concat_ws(" ", expr(
        "transform(array_sort(collect_list(struct(pos, tok))), x -> x.tok)")))
        .as("kept_fp"))
    val nrem = marks.groupBy("m_doc")
      .agg(count(lit(1)).as("n_removed"))
    base.select(col(idCol), size(col("tk")).cast("long").as("n_tokens"))
      .join(nrem, col(idCol) === col("m_doc")).drop("m_doc")
      .join(keptAgg, idCol)
      .select(col(idCol), col("n_tokens"), col("n_removed"), col("kept_fp"))
  }

  /** Blocked exact n-gram Jaccard: all-pairs only WITHIN a block key (a
    * shingle-count bucket) — the classic blocking alternative to LSH when a
    * cheap partition key bounds the candidate space. Blocks on the SHINGLE
    * count, not token count: near-dups differ by O(1) shingles so they
    * co-block, while shingle sets (unlike small-vocabulary token sets)
    * keep random-pair similarity near zero.
    */
  def blockedJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                          threshold: Double, shingleN: Int = 3,
                          blockSize: Int = 50): DataFrame = {
    val grams = (0 until shingleN).map(k => s"element_at(tk, i + $k)").mkString(", ")
    val pfxGrams = (1 to shingleN).map(k => s"element_at(tk, $k)").mkString(", ")
    val sets = docs.filter(size(split(col(textCol), " ")) >= shingleN)
      .withColumn("tk", split(col(textCol), " "))
      .withColumn("shingles",
        expr(s"array_distinct(transform(sequence(1, size(tk) - ${shingleN - 1}), i -> concat_ws(' ', $grams)))"))
      // prefix blocking (PPJoin-style): candidates must share the leading
      // n-gram AND a size bucket — near-identical docs keep both, random
      // pairs almost never share an exact leading n-gram.
      .withColumn("pfx", expr(s"concat_ws(' ', $pfxGrams)"))
      // floor, not CAST: engines disagree on double→int cast rounding
      .withColumn("blk", expr(s"CAST(floor(size(shingles) / $blockSize) AS INT)"))
      .select(col(idCol), col("pfx"), col("blk"), col("shingles"))
    // repartition: spread the shingle computation across cores even when
    // the source is one small file (one input split); null-safe equality
    // (<=>) stops Catalyst inferring IsNotNull(blk/pfx) — a filter that
    // would re-evaluate the whole shingle expression per row pre-shuffle.
    val n = docs.sparkSession.sparkContext.defaultParallelism
    sets.repartition(n).as("l").join(sets.as("r"),
        col("l.blk") <=> col("r.blk") && col("l.pfx") <=> col("r.pfx") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .withColumn("jaccard",
        expr("size(array_intersect(l.shingles, r.shingles)) / CAST(size(array_union(l.shingles, r.shingles)) AS DOUBLE)"))
      .filter(col("jaccard") >= threshold)
      .select(col(s"l.$idCol").as("a"), col(s"r.$idCol").as("b"),
        round(col("jaccard"), 4).as("jaccard"))
      .orderBy("a", "b")
  }

  /** Edit-distance near-dup pairs with (leading-token, length-bucket)
    * blocking: Levenshtein runs only INSIDE blocks, so the quadratic
    * string comparison is bounded by block size, never n². The prefix cap
    * bounds each comparison at O(prefixLen²) regardless of document
    * length — the fuzzy complement to set-based Jaccard (catches
    * character-level edits that token shingles miss). Null-safe block
    * keys (`<=>`) keep Catalyst from pushing the derived key expressions
    * into a pre-shuffle re-evaluating Filter. At 100 TB a single hot
    * leading token is the skew risk — widen the blocking key (more
    * leading tokens / finer length buckets) the same way LSH widens
    * bands.
    */
  def fuzzyBlockedPairs(docs: DataFrame, idCol: String, textCol: String,
                        maxDist: Int = 5, prefixLen: Int = 40,
                        lenBucket: Int = 20): DataFrame = {
    val sets = docs.select(col(idCol),
        substring(col(textCol), 1, prefixLen).as("pfx"),
        element_at(split(col(textCol), " "), 1).as("b1"),
        expr(s"CAST(floor(length($textCol) / $lenBucket) AS INT)").as("b2"))
      .localCheckpoint(true) // one derivation pass feeds rollup + expansions
    // Distinct-key rollup (the simhashPairs technique): near-dup corpora
    // put MANY docs on the same (block, prefix) key — trailing-token
    // variants share the whole 40-char prefix — and Levenshtein is the
    // single most expensive verify here, so it must run once per
    // distinct key pair, not once per doc pair. Identical-key groups
    // (dist 0) come from a cheap equality self-join; the quadratic
    // string comparison never touches duplicate multiplicity.
    val dk = sets.select(col("pfx"), col("b1"), col("b2")).distinct()
    val keyPairs = dk.as("l").join(dk.as("r"),
        col("l.b1") <=> col("r.b1") && col("l.b2") <=> col("r.b2") &&
          col("l.pfx") < col("r.pfx"))
      .withColumn("dist", levenshtein(col("l.pfx"), col("r.pfx")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("l.pfx").as("pl"), col("r.pfx").as("pr"),
        col("l.b1").as("b1"), col("l.b2").as("b2"), col("dist"))
    val near = keyPairs
      .join(sets.select(col(idCol).as("ia"), col("pfx").as("pl"),
        col("b1"), col("b2")), Seq("pl", "b1", "b2"))
      .join(sets.select(col(idCol).as("ib"), col("pfx").as("pr"),
        col("b1"), col("b2")), Seq("pr", "b1", "b2"))
      .select(least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"), col("dist"))
    // === (not <=>) on pfx: a null prefix must emit nothing, matching the
    // direct form where levenshtein(null, null) is a null dist (dropped)
    val same = sets.as("l").join(sets.as("r"),
        col("l.b1") <=> col("r.b1") && col("l.b2") <=> col("r.b2") &&
          col("l.pfx") === col("r.pfx") && col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("a"), col(s"r.$idCol").as("b"),
        lit(0L).as("dist"))
    near.unionByName(same).orderBy("a", "b")
  }

  /** 32-bit SimHash per doc over its distinct tokens, built from the
    * portable [[Hashing.md5Long]] so external oracles reproduce it. ONE
    * aggregation straight off the (doc, token-hash) rows: each bit's
    * majority vote is a conditional ±1 sum over `h`, all `bits` votes
    * computed side-by-side in the same map-side-combined aggregate, then
    * bit-packed in the output projection. No row amplification — the
    * round-3 formulation exploded (doc, h) × sequence(0,31), carrying 32
    * shuffle rows per token.
    */
  def simhash(docs: DataFrame, idCol: String, textCol: String, bits: Int = 32): DataFrame = {
    val votes = (0 until bits).map { i =>
      sum(expr(s"CASE WHEN (shiftright(h, $i) & 1) = 1 THEN 1 ELSE -1 END")).as(s"s$i")
    }
    Spread.ifNarrow(docs)
      .select(col(idCol), explode(expr(s"array_distinct(split($textCol, ' '))")).as("tok"))
      .select(col(idCol), Hashing.md5Long(col("tok")).as("h"))
      .groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol),
        (0 until bits).map { i =>
          when(col(s"s$i") > 0, lit(1L << i)).otherwise(lit(0L))
        }.reduce(_ + _).as("simhash"))
  }

  /** Hamming-ball pair search over [[simhash]] signatures — the simhash
    * counterpart of LSH banding (Manku, Jain & Sarma, WWW'07 multi-index):
    * signatures split into `maxDist + 1` bit-bands; by pigeonhole, any two
    * signatures within Hamming distance `maxDist` agree EXACTLY on at
    * least one band, so the band-bucket self-join finds every such pair —
    * this path is exact, not probabilistic. The bit_count verify on the
    * candidate set removes band-collision false positives.
    *
    * Scale: the band join runs over DISTINCT signatures, not docs. A
    * duplicate-heavy corpus (the dedup use case) collapses onto far
    * fewer signatures than documents, and identical signatures are the
    * WORST band-join citizens — they collide in every one of the
    * `maxDist + 1` bands, so a doc-level join regenerates each identical
    * group's |g|² pairs per band and then pays a distinct to collapse
    * them. The rollup computes each signature pair once, expands to doc
    * pairs through two output-bounded joins, and emits the (dist = 0)
    * identical-signature pairs from a direct equality self-join. One
    * signature pass (checkpointed — reused by the bands and both
    * expansions); never all-pairs; bucket-collision cost now tracks
    * DISTINCT-signature density, immune to duplicate skew.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   bits: Int = 32, maxDist: Int = 3): DataFrame = {
    val nBands = maxDist + 1
    require(bits % nBands == 0, "bands must tile the signature")
    val bandWidth = bits / nBands
    val mask = (1L << bandWidth) - 1
    val sigs = simhash(docs, idCol, textCol, bits).localCheckpoint(true)
    val dsig = sigs.select(col("simhash")).distinct()
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band_id"),
        expr(s"shiftright(simhash, ${b * bandWidth}) & $mask").as("band_bits"))
    }
    val buckets = dsig
      .select(col("simhash"), explode(array(bandCols: _*)).as("bd"))
      .select(col("simhash"), col("bd.band_id"), col("bd.band_bits"))
    val sigPairs = buckets.as("l").join(buckets.as("r"),
        col("l.band_id") === col("r.band_id") &&
          col("l.band_bits") === col("r.band_bits") &&
          col("l.simhash") < col("r.simhash"))
      .select(col("l.simhash").as("sa"), col("r.simhash").as("sb"),
        bit_count(col("l.simhash").bitwiseXOR(col("r.simhash"))).cast("long").as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct() // a close signature pair collides in several bands
    // expand signature pairs to doc pairs (each doc has ONE signature, so
    // a doc pair arises from exactly one signature pair — already unique)
    val near = sigPairs
      .join(sigs.select(col("simhash").as("sa"), col(idCol).as("ia")), "sa")
      .join(sigs.select(col("simhash").as("sb"), col(idCol).as("ib")), "sb")
      .select(least(col("ia"), col("ib")).as("a"),
        greatest(col("ia"), col("ib")).as("b"), col("dist"))
    // identical signatures: dist 0, straight equality self-join
    val same = sigs.as("l").join(sigs.as("r"),
        col("l.simhash") === col("r.simhash") &&
          col(s"l.$idCol") < col(s"r.$idCol"))
      .select(col(s"l.$idCol").as("a"), col(s"r.$idCol").as("b"),
        lit(0L).as("dist"))
    near.unionByName(same).orderBy("a", "b")
  }

  /** Connected components over a near-dup pair list — the clustering step
    * that turns pairwise `(a, b)` matches into dedup GROUPS (keep one doc
    * per component). HYBRID: pair graphs within the bounded-build budget
    * (`driverMaxEdges`) are solved by a driver-side union-find in one
    * collect; larger graphs run iterative min-label propagation WITH
    * pointer jumping:
    * every vertex starts as its own label; each round (1) joins current
    * labels across the edge list (both directions) and keeps the minimum
    * seen, then (2) shortcuts `comp ← comp(comp)` — following the label
    * one hop through the label table itself. The shortcut turns the
    * O(diameter) plain propagation into O(log diameter) rounds (the
    * Hash-to-Min style scheme, Rastogi et al. ICDE'13) — jumped TWICE per
    * round here, so chain graphs close in ~log₂(diameter)/2 rounds
    * (maxIter = 20 covers astronomically deep chains, and the loop exits
    * at the first stable round — the cap is a safety net, not a cost).
    * Convergence is checked with a label-mass aggregate per round (labels
    * never increase, so an unchanged sum is the fixed point).
    *
    * Output: (id, component) where component = min doc id in the
    * component — deterministic, engine-independent.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
                          driverMaxEdges: Long = 5000000L): DataFrame = {
    // The pair list is orders of magnitude smaller than the corpus that
    // produced it (it's the LSH/blocking survivors), and the per-round
    // checkpoint materialization doesn't get AQE partition coalescing —
    // left at the session shuffle parallelism, every round pays full task
    // overhead on near-empty partitions. Cache the pairs once (so sizing
    // doesn't recompute the upstream LSH pipeline), then size the graph's
    // parallelism to the edge count (~1M edges per partition, floor 1).
    val p = pairs.cache()
    val nEdges = p.count()
    // Bounded pair graphs take the DRIVER path: ≤ driverMaxEdges edges
    // collect once and union-find in O(E α(E)), replacing a dozen
    // iterative Spark rounds with milliseconds. The collect packs each
    // partition into a primitive long array (16 B/edge — no boxed Rows or
    // tuples on the driver), and the union-find runs over dense int
    // indices into the sorted vertex table, so the measured peak at the
    // 5M-edge default is ~240 MB (80 MB edges + 2×80 MB vertex sort +
    // 40 MB parent ints) — sized like a large broadcast build side; give
    // the driver ≥1 GB of headroom or lower the budget. Distance from an
    // all-pairs scan: the INPUT here is the LSH-survivor list, already
    // orders of magnitude below the corpus; a 100 TB corpus whose
    // near-dup graph exceeds the budget flows into the iterative
    // label-propagation path below, which handles unbounded graphs.
    if (nEdges <= driverMaxEdges) {
      val spark = pairs.sparkSession
      val chunks = p.select(col("a").cast("long"), col("b").cast("long"))
        .rdd.mapPartitions { it =>
          val buf = scala.collection.mutable.ArrayBuilder.make[Long]
          it.foreach { r => buf += r.getLong(0); buf += r.getLong(1) }
          Iterator.single(buf.result())
        }.collect()
      p.unpersist()
      val flat = new Array[Long](chunks.iterator.map(_.length).sum)
      var off = 0
      chunks.foreach { c => System.arraycopy(c, 0, flat, off, c.length); off += c.length }
      // dense vertex table: sorted unique ids; index order == id order, so
      // the min-index root IS the min-id root
      val verts = {
        val s = flat.clone(); java.util.Arrays.sort(s)
        var n = 0
        var i = 0
        while (i < s.length) {
          if (n == 0 || s(i) != s(n - 1)) { s(n) = s(i); n += 1 }
          i += 1
        }
        java.util.Arrays.copyOf(s, n)
      }
      def idx(v: Long): Int = java.util.Arrays.binarySearch(verts, v)
      val parent = Array.tabulate(verts.length)(identity)
      // iterative find + full path compression (recursion would blow the
      // stack on chain graphs)
      def find(x0: Int): Int = {
        var r = x0
        while (parent(r) != r) r = parent(r)
        var x = x0
        while (parent(x) != x) { val nxt = parent(x); parent(x) = r; x = nxt }
        r
      }
      var e = 0
      while (e < flat.length) {
        val (ra, rb) = (find(idx(flat(e))), find(idx(flat(e + 1))))
        // link larger root under smaller: roots stay component minima,
        // so labels match the iterative path bit-for-bit
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        e += 2
      }
      import spark.implicits._
      return verts.indices.map(i => (verts(i), verts(find(i)))).toDF("id", "comp")
    }
    val nParts = math.max(1, math.min(
      p.sparkSession.sparkContext.defaultParallelism,
      (nEdges / 1000000L).toInt + 1))
    val edges = p.select(col("a").as("src"), col("b").as("dst"))
      .unionByName(p.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
      .repartition(nParts, col("src"))
      .cache()
    // localCheckpoint (NOT cache): `labels` appears twice in each round's
    // plan, so the logical lineage doubles per iteration and analysis time
    // grows exponentially — caching truncates neither analysis nor
    // re-optimization. Checkpointing cuts the plan to the materialized
    // partitions each round (the standard iterative-graph formulation).
    //
    // Init = min(id, min neighbor), not id: single-pair components (the
    // dominant near-dup shape) converge at init, so most corpora finish
    // after one confirming round instead of three.
    var labels = edges.groupBy(col("src").as("id"))
      .agg(min("dst").as("g_mn"))
      .select(col("id"), least(col("id"), col("g_mn")).as("comp"))
      .repartition(nParts, col("id"))
      .localCheckpoint(true)
    // Convergence detection via the LABEL-MASS invariant: every update is
    // a least(current, ...) — no label ever increases — so sum(comp) is
    // strictly decreasing until the fixed point, and an unchanged sum IS
    // convergence. One aggregate scan of the checkpointed table per round
    // replaces the round-3 labels⋈labels changed-count join (decimal sum:
    // 1e10 ids × 1e10 rows overflows a long at full scale).
    def labelMass(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("comp").cast("decimal(38,0)"))).head().getDecimal(0)
    var lastMass = labelMass(labels)
    var converged = lastMass == null // empty pair list: nothing to do
    var i = 0
    while (!converged && i < maxIter) {
      // neighbor labels: for each id, the min comp among itself and its
      // neighbors' current comps
      val viaNeighbors = edges
        .join(labels.withColumnRenamed("id", "dst"), "dst")
        .groupBy(col("src").as("id"))
        .agg(min("comp").as("n_comp"))
      val viaEdges = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("n_comp"), col("comp"))).as("comp"))
      // pointer jumping ×2: comp is itself a vertex id, so follow it
      // through the round-start labels TWICE (comp(comp), then again) —
      // labels only ever decrease, so taking the min keeps the lattice
      // monotone, and the double hop halves the path twice per round
      // (half the rounds of the round-3 single jump for chain graphs, at
      // roughly 1.3× the per-round cost).
      def jumped(df: DataFrame): DataFrame = df
        .join(labels.select(col("id").as("comp"), col("comp").as("jump")),
          Seq("comp"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("jump"), col("comp"))).as("comp"))
      val next = jumped(jumped(viaEdges))
        .repartition(nParts, col("id"))
        .localCheckpoint(true)
      val mass = labelMass(next)
      labels = next
      converged = lastMass.compareTo(mass) == 0
      lastMass = mass
      i += 1
    }
    edges.unpersist()
    p.unpersist()
    // Non-convergence means the returned labels would SPLIT components
    // whose diameter exceeds maxIter — silently wrong dedup groups. Fail
    // loudly instead: the caller should raise maxIter for long-chain
    // graphs (near-dup components are shallow; hitting this is a signal
    // the pair list is not near-dup shaped).
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge after $maxIter rounds " +
          s"(label mass still decreasing) — raise maxIter")
    labels
  }

  /** Sub-document (paragraph-level) dedup signals: documents split into
    * fixed token windows; a window whose content recurs ANYWHERE in the
    * corpus is boilerplate (the CCNet/RefinedWeb paragraph-dedup pass —
    * whole-doc dedup misses shared headers/footers/navigation inside
    * otherwise-unique documents). Output per doc: window count,
    * boilerplate-window count, and the boilerplate fraction a filter
    * would threshold on.
    *
    * Scale: windows explode row-locally, the recurrence count is one
    * map-side-combined aggregate on the window hash, and ONLY the
    * `n_occ > 1` subset joins back — a window absent from that subset
    * occurred exactly once, so a LEFT join recovers the full verdict.
    * The recurring subset is the boilerplate vocabulary (shared
    * headers/footers — orders of magnitude below the distinct-window
    * table, which is corpus-sized and must never be broadcast) — but it
    * still GROWS with the corpus, so the join carries no broadcast
    * hint: size-based planning broadcasts the typical MB-scale subset
    * and degrades a pathological one to a hash-partitioned shuffle
    * (a forced hint would OOM instead); still never all-pairs.
    */
  def paragraphBoilerplate(docs: DataFrame, idCol: String, textCol: String,
                           windowTokens: Int = 10): DataFrame = {
    val segs = docs
      .withColumn("tk", split(col(textCol), " "))
      .select(col(idCol), explode(expr(
        s"""transform(
           |  sequence(0, CAST(floor((size(tk) - 1) / $windowTokens) AS INT)),
           |  i -> concat_ws(' ', slice(tk, i * $windowTokens + 1, $windowTokens)))""".stripMargin))
        .as("seg"))
      .select(col(idCol), md5(col("seg")).as("h"))
    val recurring = segs.groupBy("h").agg(count(lit(1)).as("n_occ"))
      .filter(col("n_occ") > 1)
    segs.join(recurring, Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("n_occ").isNotNull, 1L).otherwise(0L)).as("n_boiler"))
      .select(col(idCol), col("n_windows"), col("n_boiler"),
        round(col("n_boiler") / col("n_windows").cast("double"), 4).as("boiler_frac"))
  }

  /** Incremental batch dedup: keep only new-batch docs whose content
    * fingerprint does NOT already exist in the historical corpus — the
    * daily-ingest shape (dedup the delta against the lake, not the lake
    * against itself). A Bloom sketch of the history's fingerprints
    * pre-filters the batch ROW-LOCALLY before the exact anti-join, so
    * definitely-novel rows (the common case for a fresh crawl) skip the
    * shuffle entirely; sketch false positives survive the pre-filter and
    * are removed by the exact join — the result is provably identical to
    * the plain anti-join, only the shuffle volume differs. At 100 TB the
    * sketch is MB-sized for billions of fingerprints (the q31 technique
    * applied to the dedup story).
    */
  def incrementalNew(batch: DataFrame, history: DataFrame,
                     idCol: String, textCol: String,
                     expectedHistoryRows: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftbridge.PlanBridge
    // the sketch probes a 64-bit hash (the native might_contain expression
    // is long-typed); the EXACT verdict stays on the md5 fingerprint
    val fp = md5(col(textCol))
    val hv = xxhash64(col(textCol))
    val hist = history.select(fp.as("fp_h"), hv.as("hv_h"))
    val bloom = hist.stat.bloomFilter("hv_h", expectedHistoryRows, 0.01)
    val bytes = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bytes)
    val maybeSeen = PlanBridge.column(BloomFilterMightContain(
      Literal(bytes.toByteArray, org.apache.spark.sql.types.BinaryType),
      PlanBridge.expression(col("hv"))))
    val tagged = batch.select(col(idCol), fp.as("fp"), hv.as("hv"))
    // rows the sketch definitely hasn't seen are new — no join needed;
    // the possibly-seen remainder gets the exact anti-join verdict
    tagged.filter(!maybeSeen)
      .unionByName(tagged.filter(maybeSeen)
        .join(hist.select("fp_h"), col("fp") === col("fp_h"), "left_anti"))
      .select(col(idCol), col("fp"))
  }

  /** Embedding near-dup pairs via sign-LSH bucketing: bucket = packed sign
    * bits of the first `bits` dimensions (deterministic — no random
    * hyperplanes to seed), exact cosine only within buckets.
    */
  def embeddingNearDups(vecs: DataFrame, idCol: String, embCol: String,
                        bits: Int = 16, threshold: Double = 0.99): DataFrame = {
    val bucketed = vecs.withColumn("bkt", Similarity.signBucket(col(embCol), bits))
    bucketed.as("l").join(bucketed.as("r"),
        col("l.bkt") === col("r.bkt") && col(s"l.$idCol") < col(s"r.$idCol"))
      .withColumn("cos", VectorOps.cosine(col(s"l.$embCol"), col(s"r.$embCol")))
      .filter(col("cos") >= threshold)
      .select(col(s"l.$idCol").as("a"), col(s"r.$idCol").as("b"),
        round(col("cos"), 4).as("cos"))
      .orderBy("a", "b")
  }

  /** Cluster-scoped semantic dedup (the SemDeDup shape, Abbas et al.
    * 2023): vectors are first assigned to their nearest centroid — a
    * row-local argmax over the inlined codebook, zero shuffles
    * ([[Similarity.ivfAssign]]) — and exact cosine runs only WITHIN a
    * cluster. A vector is dropped when a lower-id cluster-mate sits at
    * `cos >= threshold` (greedy min-id keeper — deterministic, and every
    * surviving pair is provably below threshold within its cluster).
    *
    * Returns survivors as (id, cid).
    *
    * Scale: this is the answer to [[embeddingNearDups]]' implicit limit —
    * sign-LSH buckets are fixed-grid, while centroids ADAPT to the data,
    * so cluster sizes are controlled by k (size k to keep |cluster|² per
    * task bounded; at 100 TB that is k in the tens of thousands, trained
    * on a sample). The only shuffle carries (cid) — cluster-local pairs,
    * never all-pairs; cross-cluster near-dups are the accepted recall
    * loss, exactly the SemDeDup trade.
    */
  def semanticDedup(vecs: DataFrame, centroids: DataFrame, idCol: String,
                    embCol: String, threshold: Double): DataFrame = {
    // Materialize the assignment ONCE (checkpoint barrier — the
    // ivfpqTopK pattern): it feeds three consumers (both self-join sides
    // and the final anti-join), and without the barrier CollapseProject
    // re-inlines the interpreted HOF argmax into each of them, tripling
    // the assignment work per run.
    val assigned = Similarity.ivfAssign(vecs, centroids, idCol, embCol)
      .localCheckpoint(true)
    val l = assigned.select(col(idCol).as("a"), col(embCol).as("a_emb"), col("cid"))
    val r = assigned.select(col(idCol).as("b"), col(embCol).as("b_emb"), col("cid"))
    val dropped = l.join(r, Seq("cid"))
      .filter(col("a") < col("b"))
      .filter(VectorOps.cosine(col("a_emb"), col("b_emb")) >= threshold)
      .select(col("b").as("drop_id")).distinct()
    assigned.join(dropped, col(idCol) === col("drop_id"), "left_anti")
      .select(col(idCol), col("cid"))
  }

  /** EDIT-DISTANCE near-duplicate pairs — the typo/OCR-noise family
    * (one transposition or dropped character defeats every exact-hash
    * leg, and shingle Jaccard barely moves). Candidate generation is
    * the PassJoin segment pigeonhole (Li, Deng, Feng, Wang, VLDB 2011)
    * and is PROVABLY LOSSLESS: partition each string of length l into
    * `maxDist + 1` contiguous segments — k edits can damage at most k
    * of them, so for any pair within edit distance k at least one
    * segment of one string survives UNTOUCHED and appears verbatim in
    * the other, displaced by at most k positions (the net
    * insert/delete drift before it). So the candidate join matches on
    * (partner length l, segment slot i, segment text), where the probe
    * side enumerates, for each partner length within ±k (a necessary
    * condition on its own), the aligned substring at every start in
    * the ±k window around that length's segment start. Every true pair
    * is generated — unlike a prefix bucket, early-, mid- and
    * late-position edits are all covered (pinned by the
    * `dedup_edit_recall` row against UNBLOCKED ground truth and by the
    * all-pairs property spec).
    *
    * Survivors then run the exact Levenshtein DP — a built-in with
    * identical semantics on both engines — in its BANDED threshold
    * form (`levenshtein(a, b, k)` — O(n·k), not O(n²); an unbanded DP
    * over kilobyte texts measured 140+ s at sf0.1 vs ~2 s banded).
    *
    * Scale: per document the probe fan-out is a CONSTANT ≤
    * (2k+1)·(k+1)·(2k+1) short keys (196 at k=3) — linear in corpus
    * size, never all-pairs — and the candidate-join shuffle carries
    * only (l, i, segment, id), not document text. Candidate pairs are
    * distinct-ed BEFORE texts are re-attached, and the checkpoint
    * barrier keeps the DP off the join residual (the r11-measured
    * 7.7 s → ~1 s effect: without it, PushDownPredicate hoists
    * `dist >= 0` ahead of the cheap conjuncts and evaluates the DP
    * twice per raw pair).
    */
  def editDistancePairs(docs: DataFrame, idCol: String, textCol: String,
                        maxDist: Int = 3): DataFrame = {
    val k = maxDist
    val kk = k + 1
    // one bounded source frame feeding the index, probe and verify legs
    val keyed = docs.select(col(idCol).as("id"), col(textCol).as("t"),
      length(col(textCol)).as("ln")).localCheckpoint(true)
    // even partition scheme for length l: the first (k+1 − l mod (k+1))
    // segments take floor(l/(k+1)) chars, the rest one more — any fixed
    // scheme works as long as index and probe agree
    def segLen(lCol: String) =
      s"$lCol div $kk + IF(i >= $kk - $lCol % $kk, 1, 0)"
    def segStart(lCol: String) =
      s"i * ($lCol div $kk) + greatest(0, i - ($kk - $lCol % $kk))"
    // index: the k+1 segments of each string at their home positions —
    // ONE generate per row producing only (i, short segment), the
    // kilobyte text never rides through the explode output
    val segs = keyed
      .select(col("id").as("a_id"), col("ln").as("l"),
        explode(expr(
          s"""transform(sequence(0, $k), i -> struct(i AS i,
             |  substring(t, CAST(${segStart("ln")} AS INT) + 1,
             |            CAST(${segLen("ln")} AS INT)) AS seg))"""
            .stripMargin)).as("e"))
      .select(col("a_id"), col("l"), col("e.i").as("i"),
        // join on a FIXED-WIDTH hash of the segment, not the segment
        // text: a collision only ADDS a candidate pair (killed by the
        // exact DP), never drops one, and the candidate shuffle width
        // falls from segment-sized strings to 8 bytes
        xxhash64(col("e.seg")).as("seg"))
    // probe: for each partner length in [ln−k, ln] (probing only the
    // SHORTER side's segments — lossless, since for any pair a segment
    // of the shorter string survives in the longer one), each segment
    // slot, each start in the ±k alignment window, the aligned
    // substring. Built as one nested-HOF array so a single Generate
    // emits only the short (l, i, seg) structs.
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
        xxhash64(col("e.seg")).as("seg"))
    val cand = segs.join(probes, Seq("l", "i", "seg"))
      .filter(col("a_id") =!= col("b_id"))
      .select(least(col("a_id"), col("b_id")).as("a"),
        greatest(col("a_id"), col("b_id")).as("b"))
      .distinct()
    // verify candidates with the exact banded DP, then BARRIER before
    // the global sort: without the checkpoint the range-sort sampling
    // pass re-executes the attach joins and the DP a second time
    val verified = cand
      .join(keyed.select(col("id").as("a"), col("t").as("ta")), Seq("a"))
      .join(keyed.select(col("id").as("b"), col("t").as("tb")), Seq("b"))
      .select(col("a"), col("b"),
        expr(s"levenshtein(ta, tb, $maxDist)").as("dist"))
      .filter(col("dist") >= 0) // banded form returns -1 past the cap
      .localCheckpoint(true)
    verified.orderBy("a", "b")
  }

  /** PREFIX-duplicate detection — the TRUNCATION family beside the
    * exact/near/span dedup legs (a crawl re-fetch cut off mid-transfer,
    * a CMS excerpt, a token-limit clip: the duplicate is a strict
    * PREFIX of the original, which no shingle-set or content-hash leg
    * treats specially). One sorted pass, no pair join, via the order
    * property: if p is a prefix of ANY document t in the set, then
    * every string between p and t also extends p — so p's IMMEDIATE
    * lexicographic successor extends p, and a single `lead` window
    * finds every prefix-duplicate source.
    *
    * Scale: the window partitions by the first `bucketLen` characters —
    * a prefix pair shares its bucket whenever the prefix side is at
    * least `bucketLen` chars (shorter prefixes are below any useful
    * dedup threshold anyway), so the sort is bucket-local, never a
    * single global task.
    *
    * Output: one row per prefix-duplicate source — its id/length, the
    * extension document the successor proves exists, and whether the
    * pair is byte-identical (`is_exact`, the degenerate case).
    */
  def prefixDups(docs: DataFrame, idCol: String, textCol: String,
                 bucketLen: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(substring(col(textCol), 1, bucketLen))
      .orderBy(col(textCol), col(idCol))
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("nt", lead("text", 1).over(w))
      .withColumn("nid", lead("doc_id", 1).over(w))
      .filter(col("nt").isNotNull &&
        expr("left(nt, length(text)) = text"))
      .select(col("doc_id").as("trunc_id"), col("nid").as("ext_id"),
        length(col("text")).cast("long").as("prefix_chars"),
        (length(col("nt")) === length(col("text"))).as("is_exact"))
      .orderBy("trunc_id")
  }
}
