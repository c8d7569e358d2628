package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-preparation operators for training pipelines.
  *
  * The reference ships data TO a warehouse (reference README.md:1-8); a
  * training pipeline additionally needs the warehouse-side prep steps.
  * Everything here is deterministic and engine-portable (the
  * [[Hashing.md5Long]] hash), so an external system can reproduce — and
  * audit — exactly which rows landed in which split.
  */
object Prep {

  /** Deterministic stratified train/val/test split with EXACT per-stratum
    * proportions at any stratum size: rows get a GLOBAL per-stratum rank
    * by the two-level prefix sum (block-local rank inside (stratum,
    * salt-block), ordered by the portable content-free hash of the id,
    * plus the running block offset from a tiny (|strata|·salts)-row
    * offset table — the [[shuffleOrder]] construction), and global rank
    * modulo 10 assigns 10% test / 10% val / 80% train. Each stratum hits
    * the exact ratios ±1 row REGARDLESS of how its rows spread over salt
    * blocks. (The earlier block-local rank-mod degraded badly when
    * blocks held fewer than 10 rows — a 2-row block emitted only
    * test/val — which is exactly the regime of a modest table or a rare
    * stratum.)
    *
    * Scale: the rank window partitions on (stratum, salt), NOT the bare
    * stratum — a bare-stratum rank is one task per stratum, which a
    * 100 TB corpus with a handful of languages cannot run. The salt
    * fans each stratum out `salts`-fold (size it to the cluster's
    * parallelism); blocks are hash-uniform, so no skew. The offset table
    * is |strata|·salts rows — label-domain × config, bounded — and
    * broadcasts.
    */
  def trainValTestSplit(df: DataFrame, idCol: String, strataCol: String,
                        salts: Int = 64): DataFrame = {
    val ranked = strataGlobalRank(df, idCol, strataCol, salts)
    val slot = pmod(col("grank") - 1, lit(10))
    ranked.select(col(idCol), col(strataCol),
      when(slot === 0, "test").when(slot === 1, "val")
        .otherwise("train").as("split"))
  }

  /** `df` plus a GLOBAL per-stratum rank column `grank` (1-based) by the
    * two-level prefix sum: block-local `row_number` inside (stratum,
    * hash-salt block) plus the running per-stratum block offset from a
    * broadcast (|strata|·salts)-row table — the [[shuffleOrder]]
    * construction, stratified. The global order is (block id, hash,
    * id) — deterministic, hash-uniform, and reproducible by a plain
    * `ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY hash % salts,
    * hash, id)` on any engine. The offset table is label-domain ×
    * config — tiny in the intended label-domain case — but the join
    * carries NO broadcast hint: size-based planning still broadcasts it
    * at any sane cardinality, while a caller passing a high-cardinality
    * stratum column degrades to a shuffle join instead of OOMing (a
    * forced hint never degrades).
    */
  private def strataGlobalRank(df: DataFrame, idCol: String,
                               strataCol: String, salts: Int): DataFrame = {
    val h = Hashing.md5Long(col(idCol).cast("string"))
    val keyed = df.select(col(idCol), col(strataCol), h.as("hv"),
      pmod(h, lit(salts)).as("blk"))
    val offs = keyed.groupBy(col(strataCol), col("blk"))
      .agg(count(lit(1)).as("bn"))
    val wb = Window.partitionBy(col(strataCol)).orderBy(col("blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = offs
      .withColumn("blk_off", coalesce(sum("bn").over(wb), lit(0L)))
      .select(col(strataCol), col("blk"), col("blk_off"))
    val ww = Window.partitionBy(col(strataCol), col("blk"))
      .orderBy(col("hv"), col(idCol))
    // null-safe stratum equality: a NULL stratum is a legitimate group
    // (the window treats it as one) and a plain equi-join would silently
    // drop its rows from the split
    val offRenamed = offsets
      .withColumnRenamed(strataCol, "s_off").withColumnRenamed("blk", "b_off")
    keyed.join(offRenamed,
        col(strataCol) <=> col("s_off") && col("blk") === col("b_off"))
      .drop("s_off", "b_off")
      .withColumn("grank", col("blk_off") + row_number().over(ww))
  }

  /** GROUP-AWARE (leakage-safe) train/val/test split: every formatting
    * variant of the same normalized content lands in the SAME fold, so a
    * near-copy of a training doc can never leak into test — the split
    * hygiene every decontamination pipeline needs, because a plain
    * per-doc hash split (i.i.d. over ids) scatters duplicate groups
    * across folds with probability 1 − 10^{1−|group|}.
    *
    * Construction: docs key on the [[Dedup.normalizedDedup]]
    * canonicalization (lower/punct-strip/whitespace-collapse); the
    * GROUP REPRESENTATIVE (min id) gets a GLOBAL rank via the two-level
    * prefix sum over salted hash blocks (the [[strataGlobalRank]]
    * construction with a single stratum — the offset table is ≤ salts
    * rows), and global rank mod 10 assigns the fold — exact 10/10/80
    * ±1 GROUP at any group count. The group's fold propagates to its
    * members by a key join.
    *
    * Scale: one map-side-combined group aggregate on the md5 key, the
    * salted rank window over the GROUP frame (hash-uniform blocks, no
    * skew), and one unhinted key join back (the group frame is
    * corpus-scale — distinct contents — so broadcast stays with
    * size-based planning). No bare-stratum windows, nothing
    * corpus-quadratic.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, textCol: String,
                       salts: Int = 64): DataFrame = {
    val norm = trim(regexp_replace(regexp_replace(lower(col(textCol)),
      lit("[^a-z0-9 ]"), lit(" ")), lit(" +"), lit(" ")))
    val withKey = docs.select(col(idCol), md5(norm).as("gkey"))
    val groups = withKey.groupBy("gkey")
      .agg(min(col(idCol)).as("group_rep"))
    val h = Hashing.md5Long(col("group_rep").cast("string"))
    val keyed = groups.select(col("gkey"), col("group_rep"), h.as("hv"),
      pmod(h, lit(salts)).as("blk"))
    val offs = keyed.groupBy("blk").agg(count(lit(1)).as("bn"))
    // <= salts rows: the running-offset window over it is trivially small
    val wb = Window.orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = offs
      .withColumn("blk_off", coalesce(sum("bn").over(wb), lit(0L)))
      .select("blk", "blk_off")
    val ww = Window.partitionBy("blk").orderBy(col("hv"), col("group_rep"))
    val grank = col("blk_off") + row_number().over(ww)
    val slot = pmod(grank - 1, lit(10))
    val assigned = keyed.join(broadcast(offsets), "blk")
      .select(col("gkey"), col("group_rep"),
        when(slot === 0, "test").when(slot === 1, "val")
          .otherwise("train").as("split"))
    withKey.join(assigned, "gkey")
      .select(col(idCol), col("group_rep"), col("split"))
  }

  /** Split sizes per stratum — the audit view of [[trainValTestSplit]]. */
  def splitSummary(assigned: DataFrame, strataCol: String): DataFrame =
    assigned.groupBy(col(strataCol), col("split"))
      .agg(count(lit(1)).as("n"))
      .orderBy(strataCol, "split")

  /** Deterministic stratified k-fold assignment — the cross-validation
    * companion of [[trainValTestSplit]]: the same GLOBAL per-stratum
    * rank (two-level prefix sum over salted hash blocks), fold = rank
    * mod k. Every stratum carries each fold ±1 row at ANY stratum size
    * (the earlier block-local rank-mod packed small blocks into the low
    * folds — an 84%-fold-0 assignment on a 500-row table), and the
    * assignment is reproducible on any engine from (id, k, salts)
    * alone, which is what lets an external trainer audit exactly which
    * rows each CV round held out.
    *
    * Scale: identical shape to [[trainValTestSplit]] — the rank window
    * partitions on (stratum, salt), never the bare stratum; the offset
    * table broadcasts.
    */
  def kFold(df: DataFrame, idCol: String, strataCol: String, k: Int,
            salts: Int = 64): DataFrame = {
    require(k >= 2, s"k-fold needs k >= 2, got $k")
    strataGlobalRank(df, idCol, strataCol, salts)
      .select(col(idCol), col(strataCol),
        pmod(col("grank") - 1, lit(k)).cast("long").as("fold"))
  }

  /** Class balancing: downsample every stratum to the SMALLEST stratum's
    * size, keeping rows by portable-hash rank (deterministic — any engine
    * reproduces the same survivor set). The standard rebalance before
    * training on skewed labels.
    *
    * Scale: one count aggregate (stratum-sized), the 1-row min broadcast,
    * one rank window per stratum. The window partitions on the stratum —
    * for few-strata corpora at 100 TB, salt it like
    * [[trainValTestSplit]] does, then take per-(stratum, salt) quotas of
    * minSize/salts each; the unsalted form here keeps the oracle exact.
    */
  def balanceStrata(df: DataFrame, idCol: String, strataCol: String): DataFrame = {
    val minSize = df.groupBy(strataCol).agg(count(lit(1)).as("n"))
      .agg(min("n").as("min_n"))
    val h = Hashing.md5Long(col(idCol).cast("string"))
    val w = Window.partitionBy(strataCol).orderBy(h, col(idCol))
    df.select(col(idCol), col(strataCol))
      .withColumn("rk", row_number().over(w))
      .crossJoin(broadcast(minSize))
      .filter(col("rk") <= col("min_n"))
      .select(col(idCol), col(strataCol))
  }

  /** Deterministic domain-mixture sampling: draw the LARGEST corpus whose
    * stratum proportions hit the target `weights` exactly, never
    * oversampling any stratum. The curriculum/mixture step every training
    * pipeline runs after filtering ("40% web, 20% code, ..."), expressed
    * so any engine reproduces the same sampled ids:
    *
    *   1. feasible total: `N = min over strata of floor(count_s / w_s)` —
    *      the binding stratum is taken whole(ish), everything else is
    *      downsampled to proportion;
    *   2. per-stratum quota: `floor(w_s * N)`;
    *   3. survivors: the quota lowest rows per stratum by portable-hash
    *      rank (pseudorandom, reproducible, content-free).
    *
    * Strata absent from `weights` get weight 0 (dropped). Scale: one
    * stratum-sized count aggregate joined to the weight literal, a 1-row
    * feasible-total broadcast, and one rank window per stratum — the
    * window salts like [[trainValTestSplit]] when a 100 TB corpus has few
    * strata (unsalted here so the oracle stays a plain ROW_NUMBER).
    */
  def mixStrata(df: DataFrame, idCol: String, strataCol: String,
                weights: Map[String, Double]): DataFrame = {
    val wtab = broadcast(df.sparkSession.createDataFrame(
      weights.toSeq.sortBy(_._1)).toDF("stratum", "wt"))
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("n"))
      .join(wtab, col(strataCol) === col("stratum"))
    val total = counts.agg(min(floor(col("n") / col("wt"))).as("total"))
    val quotas = broadcast(counts.crossJoin(broadcast(total))
      .select(col("stratum"), floor(col("wt") * col("total")).as("quota")))
    val h = Hashing.md5Long(col(idCol).cast("string"))
    val w = Window.partitionBy(strataCol).orderBy(h, col(idCol))
    df.select(col(idCol), col(strataCol))
      .withColumn("rk", row_number().over(w))
      .join(quotas, col(strataCol) === col("stratum"))
      .filter(col("rk") <= col("quota"))
      .select(col(idCol), col(strataCol))
  }

  /** Token-budget mixture sampling — the mixture dial training actually
    * uses: each stratum (domain/language) contributes documents until its
    * TOKEN budget is spent, not until a document count is hit (documents
    * vary 100× in length; doc-count quotas like [[mixStrata]] over-weight
    * short-doc domains in token space). Documents take a deterministic
    * portable-hash order within their stratum; a doc survives iff the
    * tokens BEFORE it in that order are under the stratum's budget — so
    * the budget is exceeded by at most one document (the standard
    * take-while-crossing convention) and the surviving id set is exactly
    * reproducible by any engine.
    *
    * Scale shape: one per-stratum window for the running token sum —
    * shuffles the (id, stratum, n_tokens) TRIPLES once, never text. A
    * stratum skewed enough to overwhelm one window task takes the
    * [[prep_pack two-level prefix sum]] form with the hash-block as the
    * first level — the same upgrade path [[curriculumBySketch]]
    * documents for the NTILE tier.
    */
  def tokenBudgetMix(docs: DataFrame, idCol: String, strataCol: String,
                     textCol: String,
                     budgets: Map[String, Long]): DataFrame = {
    val btab = broadcast(docs.sparkSession.createDataFrame(
      budgets.toSeq.sortBy(_._1)).toDF("stratum", "budget"))
    val h = Hashing.md5Long(col(idCol).cast("string"))
    val w = Window.partitionBy(strataCol).orderBy(h, col(idCol))
    docs
      .select(col(idCol), col(strataCol),
        size(split(col(textCol), " ")).cast("long").as("n_tokens"))
      .withColumn("cum_before",
        coalesce(sum("n_tokens").over(w.rowsBetween(
          Window.unboundedPreceding, -1)), lit(0L)))
      .join(btab, col(strataCol) === col("stratum"))
      .filter(col("cum_before") < col("budget"))
      .select(col(idCol), col(strataCol),
        col("n_tokens"), (col("cum_before") + col("n_tokens")).as("cum_tokens"))
  }

  /** Sequence packing for pre-training: documents concatenated in id
    * order into one token stream, chunked into fixed `budget`-token
    * training sequences. Each doc gets its absolute token offset and the
    * first/last sequence it lands in (a doc may straddle a chunk
    * boundary — the standard concat-then-chunk layout, not padding).
    *
    * The token offset is a GLOBAL running sum — the naive spelling is a
    * single unpartitioned window (`Window.orderBy(id)`), which funnels
    * the whole corpus through ONE task. This implements the scalable
    * two-level prefix sum instead:
    *
    *   1. per-block subtotal: docs bucket into ordered blocks
    *      (`floor(id / blockSize)`); one map-side-combined aggregate
    *      computes each block's token sum;
    *   2. block offsets: running sum OVER BLOCKS — a window over the
    *      block-count-sized subtotal table (millions of rows at 100 TB,
    *      not billions — and broadcastable);
    *   3. within-block running sum: `Window.partitionBy(block)` — full
    *      parallelism, each task holds one block.
    *
    * offset(doc) = blockOffset(block) + withinBlockCumsum − n_tok.
    */
  /** Deterministic weighted Bernoulli sampling: each row survives iff its
    * portable 60-bit id hash falls below `weight × 2⁶⁰` — the
    * quality-weighted subsample a pipeline takes when a scorer says HOW
    * MUCH of each document class to keep (weight 1 keeps everything,
    * 0 drops everything, monotone in between: raising a row's weight can
    * only ADD it, never remove others). Row-local, zero shuffles, and
    * reproducible by any engine that can md5 — no RNG state anywhere.
    * Both sides of the comparison promote to double identically across
    * engines, so the selected id SET is portable, not just its size.
    */
  def weightedSample(df: DataFrame, idCol: String,
                     weightCol: String): DataFrame =
    df.filter(Hashing.md5Long(col(idCol).cast("string")).cast("double") <
      col(weightCol) * lit(1152921504606846976.0)) // 2^60

  /** Deterministic round-robin source interleave (the curriculum-mixing
    * layout: consecutive training rows cycle through sources instead of
    * streaming one source at a time). Each row's global slot is CLOSED
    * FORM — `rank_within_source × n_sources + source_index` — so the only
    * exchange is the per-source rank window; no global single-task
    * ordering anywhere. Rank is portable-hash order (reproducible by an
    * external engine), source index is lexicographic.
    */
  def interleaveSources(df: DataFrame, idCol: String,
                        sourceCol: String): DataFrame = {
    val srcs = df.select(col(sourceCol)).distinct()
      .collect().map(_.getString(0)).sorted // bounded: one row per source
    val idx = srcs.zipWithIndex.map { case (s, i) => (s, i.toLong) }
    val itab = broadcast(df.sparkSession.createDataFrame(idx.toIndexedSeq)
      .toDF("src", "src_idx"))
    val h = Hashing.md5Long(col(idCol).cast("string"))
    val w = Window.partitionBy(sourceCol).orderBy(h, col(idCol))
    df.select(col(idCol), col(sourceCol))
      .withColumn("rk", row_number().over(w).cast("long") - 1L)
      .join(itab, col(sourceCol) === col("src"))
      .select(col(idCol), col(sourceCol),
        (col("rk") * srcs.length + col("src_idx")).as("slot"))
  }

  /** Curriculum staging: rank the corpus by a difficulty score and cut it
    * into `stages` contiguous blocks (stage 1 = easiest), the
    * easy-to-hard ordering curriculum-learning schedules consume. The
    * ordering is total — (score, id) — so stage assignment is
    * deterministic and engine-portable (SQL-standard NTILE over the same
    * ordering reproduces it bit-for-bit).
    *
    * This is the EXACT tier: NTILE needs global ranks, i.e. one ordering
    * pass (fine for the per-document score table, which is many orders
    * smaller than the token data). At 100 TB corpus-table scale, swap to
    * [[curriculumBySketch]] — sketch-estimated stage cutpoints applied
    * row-locally, no global window at all.
    */
  def curriculum(scored: DataFrame, idCol: String, scoreCol: String,
                 stages: Int): DataFrame = {
    val w = Window.orderBy(col(scoreCol), col(idCol))
    scored.select(col(idCol), col(scoreCol),
      ntile(stages).over(w).cast("long").as("stage"))
  }

  /** The scale-tier curriculum: stage cutpoints come from ONE
    * `approx_percentile` sketch pass (bounded memory, map-side merged)
    * and every row buckets against the broadcast cutpoint array
    * row-locally — no global ordering window anywhere. Stage boundaries
    * can differ from [[curriculum]]'s exact NTILE by the sketch's rank
    * error (n/accuracy rows around each cutpoint); the interior of each
    * stage is identical.
    */
  def curriculumBySketch(scored: DataFrame, idCol: String, scoreCol: String,
                         stages: Int, accuracy: Int = 10000): DataFrame = {
    val qs = (1 until stages).map(i => i.toDouble / stages)
    val cuts = scored.agg(expr(
      s"approx_percentile($scoreCol, array(${qs.mkString(", ")}), $accuracy)")
      .as("cuts"))
    scored.crossJoin(broadcast(cuts))
      .select(col(idCol), col(scoreCol),
        (aggregate(transform(col("cuts"), c => when(col(scoreCol) > c, 1L).otherwise(0L)),
          lit(0L), (a, x) => a + x) + 1L).as("stage"))
  }

  /** prep_chunk — overlapping token-window chunking (the RAG/embedding
    * ingestion step: every retrieval pipeline slices documents into
    * fixed-size windows with overlap so boundary sentences land in two
    * chunks): chunk c of a doc covers tokens `[c·stride, c·stride +
    * size)`, the final window truncating at the document end, and every
    * doc emits at least one chunk. Each chunk carries its exact token
    * count and an md5 content fingerprint (the portable-hash rule), so
    * the oracle verifies CONTENT, not just geometry.
    *
    * Scale: split + a row-local `transform`/`explode` — chunks stream
    * out of the scan stage, nothing shuffles, output is linear in
    * corpus tokens regardless of document skew.
    */
  def chunkDocs(docs: DataFrame, idCol: String, textCol: String,
                chunkSize: Int = 32, stride: Int = 24): DataFrame =
    docs.select(col(idCol), split(col(textCol), " ").as("tk"))
      .withColumn("n", size(col("tk")))
      .filter(col("n") >= 1)
      .withColumn("c", explode(expr(
        s"""sequence(0, CASE WHEN n <= $chunkSize THEN 0
           |  ELSE (n - $chunkSize + $stride - 1) div $stride END)"""
          .stripMargin)))
      .select(col(idCol), col("c").cast("long").as("chunk_id"),
        least(lit(chunkSize), col("n") - col("c") * stride)
          .cast("int").as("n_tokens"),
        md5(concat_ws(" ", expr(
          s"slice(tk, c * $stride + 1, " +
            s"least($chunkSize, n - c * $stride))"))).as("fp"))

  /** prep_augment — deterministic word-dropout augmentation (the text
    * side of training-set augmentation; word dropout is the standard
    * regularizer from Iyyer et al.'s deep averaging networks onward):
    * token i of doc d drops iff `md5(d:i) mod 10 = 0` — a 10% mask that
    * is REPRODUCIBLE (same doc → same augmentation on any engine, the
    * [[shuffleOrder]] seeded-determinism rule) yet independent across
    * positions and documents. Output carries the kept-token fingerprint
    * so the oracle verifies the augmented CONTENT, not just counts.
    * Row-local explode/filter/reassemble; nothing shuffles.
    */
  def augmentDropout(docs: DataFrame, idCol: String,
                     textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("pos", "tok")))
      .withColumn("keep",
        pmod(Hashing.md5Long(concat(col("doc_id").cast("string"),
          lit(":"), col("pos").cast("string"))), lit(10L)) =!= 0)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_dropped"),
        md5(concat_ws(" ", expr(
          "transform(array_sort(collect_list(CASE WHEN keep THEN " +
            "struct(pos, tok) END)), x -> x.tok)"))).as("aug_fp"))
      .withColumn("kept_ratio", round(
        (col("n_tokens") - col("n_dropped")).cast("double") /
          col("n_tokens").cast("double"), 4))

  def packSequences(docs: DataFrame, idCol: String, textCol: String,
                    budget: Int, blockSize: Long = 4096L): DataFrame = {
    val toks = docs.select(col(idCol),
        size(split(col(textCol), " ")).cast("long").as("n_tok"))
      // coalesce: statically non-nullable join key, so not-null inference
      // doesn't push an isnotnull(FLOOR(...)) filter onto the corpus scan
      .withColumn("blk", coalesce(floor(col(idCol) / blockSize), lit(-1L)))
    val blockTotals = toks.groupBy("blk").agg(sum("n_tok").as("blk_tok"))
    // running sum over the (small) block table; `rangeBetween` up to the
    // PREVIOUS block = this block's starting offset
    val wb = Window.orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blockOffsets = blockTotals
      .withColumn("blk_off", coalesce(sum("blk_tok").over(wb), lit(0L)))
      .select("blk", "blk_off")
    val ww = Window.partitionBy("blk").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.join(broadcast(blockOffsets), "blk")
      .withColumn("tok_start",
        col("blk_off") + sum("n_tok").over(ww) - col("n_tok"))
      .select(col(idCol), col("n_tok"), col("tok_start"),
        floor(col("tok_start") / budget).cast("long").as("seq_first"),
        floor((col("tok_start") + col("n_tok") - 1) / budget).cast("long").as("seq_last"))
  }

  /** Deterministic seeded global shuffle: every row gets its exact
    * 0-based position in the order of `md5(id || ':' || seed)` — the
    * "shuffle the corpus, reproducibly, and let any engine verify the
    * permutation" step before epoch writes. Changing the seed is a fresh
    * independent permutation; same seed replays bit-identically anywhere
    * md5 exists.
    *
    * Scale shape: a naive global `row_number` is ONE task at 100 TB. This
    * is instead the [[packSequences]] distributed prefix-sum — rows block
    * by their key's leading byte (256 hash-uniform blocks; blocks are
    * CONTIGUOUS in key order, so block-local rank + the running block
    * offset IS the global rank), the per-block window fans out across the
    * cluster, and the 256-row offset table broadcasts. Fully lazy — no
    * zipWithIndex job, no driver round-trip.
    */
  def shuffleOrder(df: DataFrame, idCol: String, seed: Int): DataFrame = {
    val keyed = df.select(col(idCol),
        md5(concat(col(idCol).cast("string"), lit(":" + seed))).as("sk"))
      .withColumn("blk", substring(col("sk"), 1, 2))
    val offs = keyed.groupBy("blk").agg(count(lit(1)).as("bn"))
    val wb = Window.orderBy("blk").rowsBetween(Window.unboundedPreceding, -1)
    val blockOffsets = offs
      .withColumn("blk_off", coalesce(sum("bn").over(wb), lit(0L)))
      .select("blk", "blk_off")
    val ww = Window.partitionBy("blk").orderBy("sk")
    keyed.join(broadcast(blockOffsets), "blk")
      .select(col(idCol), col("sk"),
        (col("blk_off") + row_number().over(ww) - 1).as("pos"))
  }

  /** The scaling expressions shared TEXTUALLY with the oracle (the
    * stumpSseSql discipline): all inputs are exact integer sufficient
    * statistics, so both engines evaluate the identical IEEE tree.
    */
  private[graft] val ScaleMeanSql = "CAST(s AS DOUBLE) / CAST(n AS DOUBLE)"
  private[graft] val ScaleStdSql =
    "SQRT((CAST(ss AS DOUBLE) - (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))" +
      " / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))"

  /** Feature scaling — the fit half of the scaler every training
    * pipeline runs before a linear model (z-score standardization,
    * min-max normalization, and the two scaled probes that make an
    * off-by-one in either formula visible): per-group n/Σv/Σv²/min/max
    * over an integer-quantized feature, then population mean/std and the
    * scaled positions of the group extremes, all floor-quantized for
    * the cross-engine gate.
    *
    * Scale: ONE map-side-combined aggregate over the fact frame — the
    * scaler "fit" is a 5-number sketch per group, the transform is a
    * row-local expression against the broadcast stats (the
    * [[graft.operators.Regression.mlBagging]] scoring shape); groups
    * are bounded (dimension cardinality), nothing else shuffles.
    *
    * Determinism: v is exact cents, so n/Σv/Σv² are exact 64-bit at any
    * partial-sum order; mean/std/z/minmax are identical IEEE
    * expressions over identical integers on any engine
    * ([[ScaleMeanSql]]/[[ScaleStdSql]] shared textually); emissions
    * floor-quantize (the ml_stump ROUND-tie lesson).
    */
  def scaleStats(df: DataFrame, groupCol: String, v: Column): DataFrame =
    df.select(col(groupCol), v.as("v"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), sum("v").as("s"),
        sum(col("v") * col("v")).as("ss"),
        min("v").as("mn"), max("v").as("mx"))
      .withColumn("mean", expr(ScaleMeanSql))
      .withColumn("std", expr(ScaleStdSql))
      .select(col(groupCol), col("n"),
        floor(col("mean") * 10000).cast("long").as("mean_e4"),
        floor(col("std") * 10000).cast("long").as("std_e4"),
        floor((col("mx").cast("double") - col("mean")) / col("std") * 10000)
          .cast("long").as("z_max_e4"),
        floor((col("mn").cast("double") - col("mean")) / col("std") * 10000)
          .cast("long").as("z_min_e4"),
        floor((col("mean") - col("mn").cast("double")) /
          (col("mx").cast("double") - col("mn").cast("double")) * 1000000)
          .cast("long").as("minmax_mean_e6"))

  /** TRAIN/TEST DECONTAMINATION — the GPT-3 appendix-C recipe as one
    * operator: after the deterministic hash split, any TRAIN document
    * sharing an n-gram with ANY test document is dropped from the
    * training set (test must stay untouched — eval integrity beats
    * train-set size). Emits every document with its split, its
    * contaminating-gram count, and the final disposition — `dropped`
    * rows are the leakage that would otherwise inflate eval scores.
    *
    * Scale: the gram join keys on the n-gram; only the TEST side's
    * distinct grams (a fixed fraction of the corpus) land on the build
    * side. At 100 TB the test grams compress into a bloom filter on the
    * train scan (the q31 pattern — false positives only over-drop,
    * never leak); the exact join here keeps the oracle total.
    */
  def decontaminate(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 8, testMod: Int = 10): DataFrame = {
    val assigned = docs.select(col(idCol), col(textCol),
      when(pmod(Hashing.md5Long(col(idCol).cast("string")), lit(testMod))
        === 0, "test").otherwise("train").as("split"))
      .localCheckpoint(false) // feeds gram sides and the final report
    val parts = (0 until n).map(k => s"element_at(tk, i + $k)")
      .mkString(", ")
    def grams(df: DataFrame): DataFrame = df
      .withColumn("tk", split(col(textCol), " "))
      .filter(size(col("tk")) >= n)
      .select(col(idCol), explode(expr(
        s"array_distinct(transform(sequence(1, size(tk) - ${n - 1}), " +
          s"i -> concat_ws(' ', $parts)))")).as("gram"))
    val testGrams = grams(assigned.filter(col("split") === "test"))
      .select("gram").distinct()
    val hits = grams(assigned.filter(col("split") === "train"))
      .join(testGrams, Seq("gram"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("hit_grams"))
    assigned.join(hits, Seq(idCol.toString), "left")
      .select(col(idCol), col("split"),
        coalesce(col("hit_grams"), lit(0L)).as("n_contaminated_grams"),
        when(col("split") === "test", "test")
          .when(col("hit_grams").isNotNull, "dropped")
          .otherwise("train").as("disposition"))
  }

  /** WINSORIZED per-group statistics — the outlier-robust scaling prep
    * every numeric-feature pipeline runs before normalization (a single
    * corrupt sensor reading or price typo otherwise drags the mean and
    * detonates the z-scores [[scaleStats]] emits): clip at the exact
    * P1/P99 group percentiles and report the clip counts plus the
    * winsorized mean. Two passes over the fact frame (percentiles, then
    * clip-aggregate with the bounded quantile frame BROADCAST back —
    * the dq_outliers shape; the fact table is never windowed).
    *
    * Determinism: v is exact integer units, so the interpolated
    * percentiles are fixed IEEE expressions over integers; the
    * winsorized total is reassembled EXACTLY as
    * `Σ_mid v + n_low·p1 + n_high·p99` (one fixed-order double
    * expression — clipped doubles are never stream-summed), and
    * emissions floor-quantize (the ml_stump ROUND-tie lesson).
    */
  def winsorizeStats(df: DataFrame, groupCol: String, v: Column): DataFrame = {
    val base = df.select(col(groupCol).as("g"), v.as("v"))
    val qs = base.groupBy("g").agg(
      expr("percentile(v, 0.01d)").as("p1"),
      expr("percentile(v, 0.99d)").as("p99"))
      .localCheckpoint(false) // bounded: one row per group
    base.join(broadcast(qs), Seq("g"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") < col("p1"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("v") > col("p99"), 1L).otherwise(0L)).as("n_high"),
        sum(when(col("v") >= col("p1") && col("v") <= col("p99"), col("v"))
          .otherwise(0L)).as("s_mid"),
        first("p1").as("p1"), first("p99").as("p99"))
      .select(col("g"), col("n"), col("n_low"), col("n_high"),
        floor(col("p1") * 10000).cast("long").as("p1_e4"),
        floor(col("p99") * 10000).cast("long").as("p99_e4"),
        floor((col("s_mid").cast("double") +
          col("n_low").cast("double") * col("p1") +
          col("n_high").cast("double") * col("p99")) /
          col("n").cast("double") * 10000).cast("long").as("wmean_e4"))
  }

  /** TEMPERATURE-SCALED sampling weights (the multilingual mixing
    * recipe of mT5/XLM-R: sample stratum s proportional to n_s^α, here
    * α = 1/2 so the transform is the CORRECTLY-ROUNDED sqrt rather
    * than a libm-varying pow): upweights low-resource strata relative
    * to proportional sampling without letting the head dominate. Where
    * [[mixStrata]] APPLIES given weights, this FITS them from corpus
    * counts.
    *
    * Determinism: each sqrt is floor-quantized to integer micro-units
    * BEFORE summing, so the normalizing total is an exact integer sum
    * (float partial-sum order never appears); weights and per-budget
    * target counts are integer divisions. Targets cap at the stratum
    * size (no upsampling; the shortfall reports as undersupply).
    *
    * Scale: one map-side-combined count per stratum — a
    * vocabulary-sized frame; the window total never sees row-level
    * data.
    */
  def temperatureWeights(docs: DataFrame, stratumCol: String,
                         budget: Long = 2000): DataFrame = {
    val w = Window.partitionBy()
    docs.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("sq_e6",
        floor(sqrt(col("n_docs").cast("double")) * 1000000).cast("long"))
      .withColumn("tot", sum("sq_e6").over(w))
      .select(col("stratum"), col("n_docs"), col("sq_e6"),
        expr("sq_e6 * 1000000 DIV tot").as("weight_e6"),
        least(col("n_docs"), expr(s"sq_e6 * ${budget}L DIV tot"))
          .as("target_n"))
      .orderBy("stratum")
  }

  /** Feature DISCRETIZATION fit — the binning sibling of [[scaleStats]]
    * (a tree/GBM/categorical-encoder pipeline bins features; a scaler
    * standardizes them): per group both classic cuts over the exact
    * integer value v —
    *
    *   - EQUAL-WIDTH: bin = min(bins−1, (v−mn)·bins div (mx−mn)) —
    *     all-integer arithmetic off the one-pass min/max, so the cut is
    *     bit-free-of-floats entirely;
    *   - EQUAL-FREQUENCY: NTILE(bins) over the deterministic total
    *     order (v, key) — each tile's min/max v ARE the empirical
    *     quantile split points a production binner persists.
    *
    * Output per (group, bin): equal-width occupancy plus the
    * equal-frequency tile's row count and [lo, hi] value range.
    *
    * Scale: equal-width is one broadcast-stats join + a map-side-
    * combined aggregate (fact-scale safe); the NTILE leg sorts
    * group-sized slices (at 100 TB the same split points come from a
    * sampled/sketched quantile pass — q22b's tier — with this exact
    * output contract).
    */
  def binStats(df: DataFrame, groupCol: String, v: Column, key: Column,
               bins: Int = 10): DataFrame = {
    val base = df.select(col(groupCol).as("g"), v.as("v"), key.as("k"))
    val stats = base.groupBy("g").agg(min("v").as("mn"), max("v").as("mx"))
    val width = base.join(broadcast(stats), "g")
      .select(col("g"), expr(
        s"""least(${bins - 1}, CAST(CASE WHEN mx = mn THEN 0
           |  ELSE ((v - mn) * $bins) DIV (mx - mn) END AS INT))"""
          .stripMargin).as("bin"))
      .groupBy("g", "bin").agg(count(lit(1)).as("n_width"))
    val wTile = Window.partitionBy("g").orderBy(col("v"), col("k"))
    val freq = base
      .withColumn("bin", (ntile(bins).over(wTile) - 1))
      .groupBy("g", "bin")
      .agg(count(lit(1)).as("n_freq"), min("v").as("freq_lo"),
        max("v").as("freq_hi"))
    freq.join(width, Seq("g", "bin"), "full_outer")
      .select(col("g"), col("bin"),
        coalesce(col("n_width"), lit(0L)).as("n_width"),
        coalesce(col("n_freq"), lit(0L)).as("n_freq"),
        col("freq_lo"), col("freq_hi"))
      .orderBy("g", "bin")
  }
}
