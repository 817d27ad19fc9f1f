package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.{Bpe, Dedup, Multimodal, Similarity, TextAnalysis, Unigram}

/** Training-data pipeline surface as driver-checkable queries over the
  * documents/embeddings tables: dedup (exact, fingerprint, n-gram
  * Jaccard, MinHash-LSH, SimHash), similarity search (brute-force,
  * sign-LSH), text analysis (tokens, quality, language ID), multimodal
  * decode plumbing. Hash-function-dependent ops (xxhash64) have no
  * DuckDB equivalent → rows-only; everything md5/arithmetic-based is
  * oracle-checked.
  */
object PipelineQueries {

  // q159 Fellegi–Sunter parameters, shared by the query and its oracle
  // so both engines sum the SAME precomputed weight literals.
  private val fsMu = Seq((0.9, 0.02), (0.9, 0.04), (0.85, 0.025))
  private def log2(x: Double) = math.log(x) / math.log(2.0)
  private val fsWa = fsMu.map { case (m, u) => log2(m / u) }
  private val fsWd = fsMu.map { case (m, u) => log2((1 - m) / (1 - u)) }

  /** Invariant-oracle audit shape shared by the approximate top-k
    * queries (q30/q41/q56) — the r7 graduation of the last `no_oracle`
    * rows (the q34/q79/q90/q161 pattern): instead of dumping (qid,
    * rid, cos, rn) rows whose rid depends on hash buckets no SQL engine
    * can replay, emit one row per input vector with the CONTRACT the
    * operator must satisfy as booleans the DuckDB oracle pins TRUE —
    *
    *  - `k_ok`: exactly k results came back for this query vector
    *    (a vector missing from the output, or short-listed, fails);
    *  - `distinct_ok` / `no_self_ok`: result ids are distinct and
    *    never the query itself;
    *  - `range_ok` / `sorted_ok`: emitted cosines are valid cosines
    *    and non-increasing in rank (the re-rank window's contract);
    *  - `recall_ok`: the measured capped-universe recall vs the brute
    *    twin clears the operator's enforced floor.
    *
    * Any regression — a dropped query vector, duplicate hits, a broken
    * re-rank, a recall collapse — flips a boolean and hash-fails the
    * row. The value-level top-k semantics stay covered by q29's exact
    * oracle; SimilaritySpec keeps the kernel-level assertions. */
  private def annTopKAudit(vectors: DataFrame, topk: DataFrame, k: Int,
                           recall: Double, floor: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy("rn")
    val per = topk
      .withColumn("_prev", lag(col("cos"), 1).over(w))
      .groupBy("qid").agg(
        count(lit(1)).as("_n"),
        countDistinct(col("rid")).as("_nd"),
        max(col("rid") === col("qid")).as("_self"),
        min(col("cos").between(-1.000001, 1.000001)).as("_range"),
        min(coalesce(col("_prev") >= col("cos"), lit(true))).as("_sorted"))
    vectors.select(col("vec_id").cast("long").as("qid"))
      .join(per, Seq("qid"), "left")
      .select(col("qid"),
        (coalesce(col("_n"), lit(0L)) === k).as("k_ok"),
        coalesce(col("_nd") === col("_n"), lit(false)).as("distinct_ok"),
        coalesce(!col("_self"), lit(false)).as("no_self_ok"),
        coalesce(col("_range"), lit(false)).as("range_ok"),
        coalesce(col("_sorted"), lit(false)).as("sorted_ok"),
        lit(recall >= floor).as("recall_ok"))
      .orderBy("qid")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q24_dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d))),

    "q25_fingerprint" -> ((s, d) =>
      Dedup.fingerprint(Tables.documents(s, d))),

    "q26_jaccard_pairs" -> ((s, d) =>
      Dedup.jaccardPairs(Tables.documents(s, d), n = 3, threshold = 0.10)),

    // recall_vs_brute on the approximate queries (q27/q30/q41): the
    // approximation quality surfaces as DATA in the dumped frame, not
    // just a row count — computed against the exact twin (over a capped
    // query set for the top-k ops), identical on every row.
    "q27_minhash_lsh" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // md5-family hashes (signature mins + band buckets) so the whole
      // LSH candidate generation is DuckDB-replicable — q27 graduates
      // from rows-only to a full hash-checked oracle row
      val lsh = Dedup.minhashLsh(docs, n = 3, k = 64, bands = 16,
        threshold = 0.10, md5Based = true).cache()
      // recall measured on a capped universe (doc_id < 1000, like
      // q30/q41's query caps): the exact-jaccard twin is quadratic-ish
      // in docs, and the capped measure is the same estimator at a
      // tenth of the cost at sf0.1
      val capped = docs.filter(col("doc_id") < 1000)
      val brute = Dedup.jaccardPairs(capped, n = 3, threshold = 0.10)
        .select("id_a", "id_b")
      val nb = brute.count()
      val nh = lsh.filter(col("id_a") < 1000 && col("id_b") < 1000)
        .select("id_a", "id_b")
        .join(brute, Seq("id_a", "id_b"), "left_semi").count()
      val recall = if (nb == 0) 1.0 else nh.toDouble / nb
      lsh.withColumn("recall_vs_brute", round(lit(recall), 4))
        .orderBy("id_a", "id_b")
    }),

    // Signature-verified MinHash-LSH pairs — the batch twin of the
    // streaming cross-batch near-dup gate (NearDupStream: the
    // accumulated index stores signatures, never text, so the stream
    // verifies by minhash agreement; this query puts that verification
    // mode in the hash gate). md5 family ⟹ the ENTIRE path — signature,
    // banding, candidate join, agreement fraction — replays in DuckDB.
    "q175_sig_dedup" -> ((s, d) =>
      Dedup.minhashLsh(Tables.documents(s, d), n = 3, k = 64, bands = 16,
          threshold = 0.5, md5Based = true, verify = "sig")
        .orderBy("id_a", "id_b")),

    "q28_simhash_pairs" -> ((s, d) =>
      // d ≤ 7 with 8-bit chunks keeps the pigeonhole full-recall
      // guarantee simhashPairs documents (and now enforces). md5Hash64
      // token hashes make the fingerprints — and therefore the exact
      // pair set — DuckDB-replicable (the oracle brute-forces pairs;
      // pigeonhole and brute agree because the bucketing is full-recall
      // by construction, so the oracle doubles as a recall proof).
      Dedup.simhashPairs(Tables.documents(s, d), maxDist = 7, chunks = 8,
          hasher = Dedup.md5Hash64)
        .orderBy("id_a", "id_b")),

    // Dedup cluster resolution over the q26 pair graph: GraphX CC
    // labels every paired doc with the min doc_id of its component.
    "q44_dedup_clusters" -> ((s, d) =>
      Dedup.dupClusters(s,
        Dedup.jaccardPairs(Tables.documents(s, d), n = 3, threshold = 0.10))),

    "q29_ann_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      Similarity.bruteForceTopK(e.filter(col("vec_id") < 50), e, k = 5)
    }),

    // Operating point set from the measured recall curve (ProbeAnnRecall,
    // r7): (nBits=32, bands=8) keeps 4-bit bands — collision prob 1/16
    // per band, so candidate volume stays ~n²/2 at 8 bands — and
    // measures recall@5 0.664 (sf0.01) / 0.720 (sf0.1) on the
    // near-random synthetic vectors; the old (16, 4) point measured
    // 0.41/0.50, under the floor the audit now ENFORCES.
    "q30_lsh_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val lsh = Similarity.lshTopK(e, k = 5, nBits = 32, bands = 8).cache()
      val brute = Similarity.bruteForceTopK(e.filter(col("vec_id") < 50), e,
        k = 5).select("qid", "rid")
      val nb = brute.count()
      val nh = lsh.filter(col("qid") < 50).select("qid", "rid")
        .join(brute, Seq("qid", "rid"), "left_semi").count()
      val recall = if (nb == 0) 1.0 else nh.toDouble / nb
      // enforced floor, not just reported quality: a recall regression
      // flips recall_ok in the dumped frame (and fails SimilaritySpec)
      annTopKAudit(e, lsh, k = 5, recall, floor = 0.55)
    }),

    // CCNet head/middle/tail perplexity bucketing: per SOURCE, docs
    // split into LM-quality tertiles by the q64 unigram NLL (CCNet
    // §4.2 does exactly this per language with a KenLM score — head =
    // closest to the LM, the slice pretraining keeps preferentially).
    // The ntile window is source-partitioned (scale-safe) and orders
    // on the ROUNDED oracle-proven NLL with a doc_id tiebreak, so the
    // cut replays identically in both engines. Exact oracle.
    "q180_ccnet_buckets" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val nll = TextAnalysis.unigramLogLik(docs)
      val w = Window.partitionBy("source")
        .orderBy(col("avg_nll"), col("doc_id"))
      val nt = ntile(3).over(w)
      docs.select("doc_id", "source").join(nll, "doc_id")
        .withColumn("bucket", when(nt === 1, "head")
          .when(nt === 2, "middle").otherwise("tail"))
        .select(col("doc_id"), col("source"), col("avg_nll"), col("bucket"))
        .orderBy("doc_id")
    }),

    // Per-label embedding outlier audit: every vector's d² to its own
    // label centroid, within-label z, non-round-threshold flag — all
    // recomputed in DuckDB. Exact oracle.
    "q187_label_outliers" -> ((s, d) =>
      Similarity.labelOutliers(s, Tables.embeddings(s, d))
        .orderBy("vec_id")),

    // Text normalization over planted mess (the corpus is already
    // clean lowercase, so the query plants mixed case, whitespace
    // runs, and repeated punctuation — q177 idiom); the idempotence
    // audit is recomputed in BOTH engines. Exact oracle.
    "q186_normalize_text" -> ((s, d) =>
      TextAnalysis.normalizeText(
        Tables.documents(s, d).select(col("doc_id"),
          concat(lit("  MiXeD\tCASE  "), col("text"),
            when(col("doc_id") % 4 === 0, lit(" Wow!!!  Really??"))
              .otherwise(lit("\nnew  line,,, end.")))
            .as("text")))
        .select("doc_id", "normalized", "changed", "idempotent")
        .orderBy("doc_id")),

    // Johnson–Lindenstrauss ±1 projection 64→16: every projected
    // coordinate of every vector recomputed in DuckDB from the same
    // md5-derived sign matrix. Exact oracle.
    "q185_jl_project" -> ((s, d) =>
      Similarity.jlProject(Tables.embeddings(s, d), outDim = 16)
        .orderBy("vec_id", "dim")),

    // k-center greedy coreset over a bounded universe (vec_id<200, the
    // q170 capped-anchor idiom): the full greedy trajectory — picks
    // AND max-min radii — replays in DuckDB as k chained argmax CTEs
    // on the same rounded distances. Exact oracle.
    "q184_kcenter_coreset" -> ((s, d) =>
      Similarity.kCenterGreedy(s,
        Tables.embeddings(s, d).filter(col("vec_id") < 200), k = 4)
        .orderBy("rank")),

    // mC4/mT5 α-sampling: per-language corpus shares → p^α mixture
    // weights, oversample factors, expected docs at a 10k budget.
    // One grouped count + tiny-frame algebra. Exact oracle.
    "q182_temperature_sampling" -> ((s, d) =>
      TextAnalysis.temperatureWeights(Tables.documents(s, d),
        alpha = 0.3, budget = 10000L).orderBy("lang")),

    // DoReMi-style loss-based domain reweighting (static closed form):
    // per-source mean unigram NLL (the q64 machinery) → softmax
    // mixture weights with identical max-subtraction in both engines.
    // Exact oracle.
    "q183_domain_mix_weights" -> ((s, d) =>
      TextAnalysis.domainMixWeights(Tables.documents(s, d), eta = 1.0)
        .orderBy("source")),

    // Gopher quality rules over planted line/symbol structure (the
    // corpus is single-line without bullets/ellipses/stopwords, so the
    // query constructs each rule's trigger in-plan — the q177 planting
    // idiom): every 3rd doc gains a bullet line plus TWO ellipsis
    // lines (flipping ellipsis_ok), every 7th gains hash symbols
    // (flipping symbol_ok/alpha_ok on short docs), the rest gain a
    // stopword-rich sentence (satisfying stop_ok). All rule booleans
    // are integer algebra — exact oracle.
    "q181_gopher_rules" -> ((s, d) =>
      TextAnalysis.gopherRules(
        Tables.documents(s, d).select(col("doc_id"),
          concat(col("text"),
            when(col("doc_id") % 3 === 0,
              lit("\n• promo item\nread more...\nclick here..."))
              .when(col("doc_id") % 7 === 0, lit(" ## ## ##"))
              .otherwise(lit("\nthe end of that story and with more")))
            .as("text")),
        minWords = 5L)
        .select("doc_id", "n_words", "n_lines", "mean_word_len",
          "symbol_ratio", "n_stopwords", "words_ok", "word_len_ok",
          "symbol_ok", "bullet_ok", "ellipsis_ok", "alpha_ok", "stop_ok",
          "gopher_keep")
        .orderBy("doc_id")),

    // Lee et al. exact duplicate-SPAN removal over planted boilerplate:
    // every 5th doc carries a 9-token tail (two duplicated 8-grams in
    // the tail; boundary grams stay unique per doc), so the globally
    // first plant keeps its copy and every later one loses exactly the
    // tail. Exact oracle — both engines replay the whole edit.
    "q179_dedup_spans" -> ((s, d) =>
      Dedup.dedupSpans(
        Tables.documents(s, d).select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(col("text"),
              lit(" zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9")))
            .otherwise(col("text")).as("text")),
        L = 8).orderBy("doc_id")),

    // Model-based quality filtering (the GPT-3/CCNet classifier stage):
    // logistic regression on the q31 quality features, trained by
    // one-aggregate-per-iteration full-batch GD to distill the
    // rule-based keep gate into a soft score (the classic setup — rules
    // label, the classifier generalizes/ranks). Invariant oracle: the
    // weights are float-sum-order data, but the training CONTRACT is
    // pinned per doc — scores are valid probabilities, the final loss
    // strictly beats the zero model, and AUC against the rule labels
    // clears 0.75 (measured 0.98+ at sf0.01/sf0.1; a learner that
    // stopped learning fails the row hash).
    "q178_quality_classifier" -> ((s, d) => {
      import graft.pipeline.QualityClassifier
      val feat = QualityClassifier.featurize(Tables.documents(s, d), col("keep"))
      val (w, losses) = QualityClassifier.train(feat, iters = 30, lr = 1.0)
      val scored = QualityClassifier.score(feat, w).cache()
      val a = QualityClassifier.auc(scored)
      scored.select(col("doc_id"),
          (col("score") >= 0.0 && col("score") <= 1.0 &&
            !isnan(col("score"))).as("score_range_ok"),
          lit(losses.last < losses.head - 1e-6).as("loss_improved"),
          lit(a >= 0.75).as("auc_ok"))
        .orderBy("doc_id")
    }),

    // PQ embedding-compression codec audit (invariant oracle): every
    // vector's codes are in range and the reconstruction beats the
    // null (global-mean) model — a quantizer that learned nothing, or
    // an encode/decode mismatch, flips better_than_mean. The mse
    // columns stay operator-side (PipelineSpec bounds them); the
    // oracle pins the booleans per vec_id.
    "q176_pq_codec" -> ((s, d) =>
      Similarity.pqReconstructionAudit(s, Tables.embeddings(s, d))
        .select(col("vec_id"), col("codes_ok"), col("better_than_mean"))
        .orderBy("vec_id")),

    // A8 bootstrap CI of Spearman rho — the LAST §2 operator without a
    // driver-gate row (reference visualization.py:31-46). md5-keyed
    // Poisson resampling on doc_id (the q87/q92 discipline): DuckDB
    // replays every resample's weights, weighted tie-ranks, rho, and
    // the 2.5/97.5 percentile cut. x = token count, y = char count —
    // correlated but not perfectly (doc-length ties), so the resampled
    // rho distribution has genuine spread for the CI to measure.
    "q188_bootstrap_ci" -> ((s, d) => {
      val base = Tables.documents(s, d).select(col("doc_id"),
        size(split(col("text"), " ")).cast("double").as("xv"),
        col("n_chars").cast("double").as("yv"))
      graft.metrics.Correlation.bootstrapCiMd5(base, "doc_id", "xv", "yv",
          resamples = 200)
        .orderBy("i")
    }),

    // C4-style rule cleaning over planted multi-line documents (the
    // synthetic corpus is single-line with no punctuation, so the query
    // constructs the line structure in-plan — the q49 planting idiom;
    // both engines build and clean identical strings). Line 1 is the
    // corpus text with terminal punctuation (kept), line 2 is
    // unterminated boilerplate — carrying "lorem ipsum" on every 7th
    // doc, which drops the whole document — line 3 is the enable-
    // JavaScript banner, line 4 is under the word floor. Exact oracle.
    "q177_c4_clean" -> ((s, d) =>
      TextAnalysis.c4Clean(
        Tables.documents(s, d).select(col("doc_id"),
          concat(col("text"), lit(".\n"),
            when(col("doc_id") % 7 === 0, lit("buy now lorem ipsum"))
              .otherwise(lit("buy now click here")),
            lit("\nEnable JavaScript and cookies to continue.\ntoo short."))
            .as("text")))
        .select("doc_id", "n_lines", "n_kept", "cleaned", "doc_dropped")
        .orderBy("doc_id")),

    "q31_text_quality" -> ((s, d) =>
      TextAnalysis.keepDecision(Tables.documents(s, d))
        .select("doc_id", "n_words", "mean_word_len", "punct_ratio",
          "stopword_ratio", "repetition", "keep")),

    "q32_langid" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), TextAnalysis.languageId(col("text")).as("lang_pred"))),

    "q33_token_counts" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.wordCount(col("text")).as("n_words"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"))),

    "q38_cosine_pairs" -> ((s, d) =>
      Similarity.cosinePairs(Tables.embeddings(s, d), threshold = 0.35)),

    // Edit-distance-1 similarity join via FastSS deletion neighborhoods
    // on customer names (capped at custkey < 2000 so the ORACLE's brute
    // quadratic levenshtein stays runnable — the operator itself never
    // goes quadratic). The hash match against brute enumeration is the
    // losslessness proof for the deletion-key candidate filter.
    "q106_editdist_join" -> ((s, d) =>
      graft.pipeline.Dedup.editDistanceJoin(
        Tables.customer(s, d).filter(col("c_custkey") < 2000)
          .select(col("c_custkey").as("id"), col("c_name").as("s")))),

    // Overlapping sliding-window chunking (RAG pre-processing): 64-token
    // windows advancing by 48 over each document — a pure narrow map
    // (see TextAnalysis.chunkDocuments).
    "q107_chunk_overlap" -> ((s, d) =>
      TextAnalysis.chunkDocuments(Tables.documents(s, d))),

    // Flesch-style readability audit over the corpus (vowel-group
    // syllable heuristic; see TextAnalysis.readability).
    "q127_readability" -> ((s, d) =>
      TextAnalysis.readability(Tables.documents(s, d))),

    // Per-group uniform k-sample: 25 docs per source by md5 rank — the
    // replayable per-stratum pick (q50's deterministicSample gives a
    // RATE per stratum; this gives an exact COUNT). The rank filter
    // plans as WindowGroupLimit, so each group's sort stops at k rows
    // map-side — no full per-group sort, the q04 machinery.
    "q120_group_sample" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source")
        .orderBy(md5(concat(lit("gs:"), col("doc_id"))), col("doc_id"))
      Tables.documents(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 25)
        .select(col("source"), col("doc_id"), col("rn"))
    }),

    // nProbe=3 of 8 lists: measured recall@5 0.676 at BOTH sf0.01 and
    // sf0.1 (ProbeAnnRecall, r7) — nProbe=2 measured 0.54, under the
    // enforced 0.55 floor.
    "q41_ivf_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val ivf = Similarity.ivfTopK(s, e, k = 5, nLists = 8, nProbe = 3).cache()
      val brute = Similarity.bruteForceTopK(e.filter(col("vec_id") < 50), e,
        k = 5).select("qid", "rid")
      val nb = brute.count()
      val nh = ivf.filter(col("qid") < 50).select("qid", "rid")
        .join(brute, Seq("qid", "rid"), "left_semi").count()
      val recall = if (nb == 0) 1.0 else nh.toDouble / nb
      annTopKAudit(e, ivf, k = 5, recall, floor = 0.55)
    }),

    // IVF-PQ (the reference ladder's >1M-vector tier): product-
    // quantized inverted lists + exact refine; recall measured against
    // the brute twin on the same capped query universe as q30/q41.
    // Parameters picked from the recorded ProfileIvfPq recall curve
    // (BASELINE.md r5) and re-measured in r7 (ProbeAnnRecall): nProbe
    // ≤ 4 is probe-coverage-bounded no matter how good the codes, so
    // the ≥0.8 regime needs 6+ probes; and m=8 (8-byte codes) is
    // code-quality-bounded at sf0.1 (0.744, under the floor) while
    // m=16 — the dim/4 production guidance from the 1M-vector curve —
    // measures 0.916 (sf0.01) / 0.920 (sf0.1) at 16 bytes/vector.
    "q56_ivfpq_topk" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val pq = Similarity.ivfPqTopK(s, e, k = 5, nLists = 8, nProbe = 6,
        m = 16, nCodes = 32, refine = 20).cache()
      val brute = Similarity.bruteForceTopK(e.filter(col("vec_id") < 50), e,
        k = 5).select("qid", "rid")
      val nb = brute.count()
      val nh = pq.filter(col("qid") < 50).select("qid", "rid")
        .join(brute, Seq("qid", "rid"), "left_semi").count()
      val recall = if (nb == 0) 1.0 else nh.toDouble / nb
      annTopKAudit(e, pq, k = 5, recall, floor = 0.8)
    }),

    "q45_winnow_fp" -> ((s, d) =>
      TextAnalysis.winnowFingerprints(Tables.documents(s, d), k = 4, w = 4)),

    "q46_winnow_pairs" -> ((s, d) =>
      TextAnalysis.winnowPairs(Tables.documents(s, d), k = 4, w = 4,
        minShared = 2)),

    // End-to-end MOSS dedup: winnow fingerprints → shared-fp candidate
    // pairs → connected-component cluster resolution. The composition
    // that a real pipeline runs, oracle-checked all the way through.
    "q47_winnow_clusters" -> ((s, d) =>
      Dedup.dupClusters(s,
        TextAnalysis.winnowPairs(Tables.documents(s, d), k = 4, w = 4,
          minShared = 2).select(col("id_a"), col("id_b")))),

    // Decontamination: every 20th document stands in for the eval set;
    // per training doc, the fraction of its 3-gram shingles found
    // anywhere in that set.
    "q48_contamination" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.contamination(docs, docs.filter(col("doc_id") % 20 === 0), n = 3)
    }),

    // Bloom screen twin of q48 (same ref slice): per-doc flagged count
    // carries the exact count beside it so approximation quality is
    // data the driver sees (cf. recall_vs_brute on q27/q30/q41) —
    // bloom_minus_exact counts false positives, never negatives.
    // Bloom screen vs exact contamination. The Bloom count itself is
    // sketch-dependent (not DuckDB-expressible), but its one provable
    // property — no false negatives, so n_flagged_ub >= n_exact on
    // EVERY row — is: ub_ge_exact must be uniformly true, and the
    // oracle hash-checks it alongside the exact counts. A Bloom
    // implementation with false negatives flips the flag and fails the
    // row hash.
    "q69_contamination_bloom" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val ref = docs.filter(col("doc_id") % 20 === 0)
      val bloom = Dedup.contaminationBloom(docs, ref, n = 3)
        .select(col("doc_id"), col("n_shingles"), col("n_flagged_ub"))
      val exact = Dedup.contamination(docs, ref, n = 3)
        .select(col("doc_id"), col("n_contaminated"))
      bloom.join(exact, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_shingles"),
          coalesce(col("n_contaminated"), lit(0L)).as("n_exact"),
          (col("n_flagged_ub") >=
            coalesce(col("n_contaminated"), lit(0L))).as("ub_ge_exact"))
    }),

    // PII scrubbing over text with planted email/IP/phone (planted in
    // the query so both engines construct and scrub identical strings —
    // the synthetic corpus itself contains no PII).
    "q49_pii_scrub" -> ((s, d) =>
      Tables.documents(s, d).select(col("doc_id"),
        TextAnalysis.scrubPii(concat(col("text"),
          lit(" contact: user"), col("doc_id").cast("string"),
          lit("@example.com from 10.0."),
          (col("doc_id") % 256).cast("string"),
          lit(".7 call +14155552671"))).as("scrubbed"))),

    // Language-balanced deterministic sampling: md5-threshold Bernoulli
    // per stratum — replayable on any topology, oracle-checkable.
    "q50_stratified_sample" -> ((s, d) =>
      TextAnalysis.stratifiedSample(
        Tables.documents(s, d).select("doc_id", "lang"),
        stratumCol = "lang", keyCol = "doc_id",
        fractions = Map("en" -> 0.5, "de" -> 0.25), defaultP = 0.1)),

    // Distributed PCA: one treeAggregate moment pass + driver Jacobi
    // (the EigenInit driver-route reasoning), then the codegen'd
    // broadcast projection — emitted coords are the distributed
    // operator's output (rows-only: the eigen loop has no SQL analog;
    // PcaSpec carries recovery/orthonormality/projection correctness).
    // Distributed PCA with the linear-algebra contracts as an INVARIANT
    // oracle (r6 graduation, the q20/q21 pattern): component
    // orthonormality, eigenvalues sorted nonincreasing and nonnegative,
    // and the spectral identity var(pcₖ over the full table) = λₖ —
    // checked against the moment-pass eigendecomposition itself, so a
    // solver or projection regression flips a pinned boolean. Per-row
    // finiteness rides on the enumerable vec_id < 100 projection.
    "q90_pca" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val model = graft.linalg.Pca.fit(e, "v", r = 4)
      val comps = model.components
      val ortho = (for (i <- comps.indices; j <- i until comps.length) yield {
        val dot = comps(i).zip(comps(j)).map { case (a, b) => a * b }.sum
        math.abs(dot - (if (i == j) 1.0 else 0.0)) < 1e-8
      }).forall(identity)
      val evalsOk = model.explainedVariance.zip(model.explainedVariance.drop(1))
        .forall { case (a, b) => a >= b - 1e-12 } &&
        model.explainedVariance.forall(_ >= -1e-9)
      val full = graft.linalg.Pca.transform(e, model, "v").cache()
      val vars = full.agg(var_pop(col("pc")(0)), var_pop(col("pc")(1)),
        var_pop(col("pc")(2)), var_pop(col("pc")(3))).collect()(0)
      val varsOk = model.explainedVariance.indices.forall { k =>
        math.abs(vars.getDouble(k) - model.explainedVariance(k)) <=
          1e-6 * math.max(1.0, model.explainedVariance(k))
      }
      full.filter(col("vec_id") < 100)
        .select(col("vec_id"),
          (!isnan(col("pc")(0)) && !isnan(col("pc")(1)) &&
            !isnan(col("pc")(2)) && !isnan(col("pc")(3))).as("finite_ok"),
          lit(ortho).as("orthonormal_ok"),
          lit(evalsOk).as("evals_sorted_ok"),
          lit(varsOk).as("var_matches_eigenvalue"))
        .orderBy("vec_id")
    }),

    // Weighted reservoir sample (Efraimidis–Spirakis): 64 docs drawn
    // proportional to n_chars, deterministic md5 uniforms — the rounded
    // rank key itself is emitted so the oracle checks the full key
    // arithmetic, not just the selected set.
    "q87_weighted_sample" -> ((s, d) =>
      TextAnalysis.weightedSample(
        Tables.documents(s, d).select("doc_id", "n_chars"),
        keyCol = "doc_id", weightCol = "n_chars", k = 64)
        .select(col("doc_id"), col("n_chars"),
          round(col("es_key"), 9).as("w_key"))),

    // Sequence packing: concatenate-and-slice token layout at L=512.
    "q51_pack_sequences" -> ((s, d) =>
      TextAnalysis.packSequences(Tables.documents(s, d), seqLen = 512)),

    // Canonical-survivor selection: the full dedup pipeline ending —
    // jaccard pairs → cluster resolution → keep the highest-quality doc
    // per cluster (ties to smallest id), singletons keep themselves.
    "q53_dedup_keep" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.keepBest(s,
        TextAnalysis.qualityScore(docs),
        Dedup.jaccardPairs(docs, n = 3, threshold = 0.10)
          .select("id_a", "id_b"))
    }),

    // Every payload is a REAL encoded container (PNG / WAV / Y4M) and
    // every row runs the genuine decoder — `decoded` must be all-true.
    // Gopher-style repetition filters: per-doc top-bigram and
    // duplicated-bigram coverage.
    "q57_ngram_repetition" -> ((s, d) =>
      TextAnalysis.ngramRepetition(Tables.documents(s, d), n = 2)),

    // Deterministic corpus shuffle + round-robin shard assignment —
    // the md5 permutation makes the training order itself replayable
    // AND oracle-checkable.
    "q58_shuffle_shards" -> ((s, d) =>
      TextAnalysis.shuffleShards(Tables.documents(s, d), nShards = 8)),

    // Keyword extraction: per-doc top-5 TF-IDF terms. Integer/string
    // output only; the double score lives solely in the window ORDER BY.
    "q59_tfidf_topk" -> ((s, d) =>
      TextAnalysis.tfidfTopK(Tables.documents(s, d), k = 5)),

    // Degenerate-text detector: char-level Shannon entropy, a pure
    // narrow map (no shuffle) — a scan at 100 TB.
    "q60_char_entropy" -> ((s, d) =>
      TextAnalysis.charEntropy(Tables.documents(s, d))),

    // Corpus audit: per-source docs/tokens/vocab/hapax/type-token ratio.
    "q61_lexical_stats" -> ((s, d) =>
      TextAnalysis.lexicalStats(Tables.documents(s, d))),

    // SemDeDup (arXiv:2303.09540): k-means-bounded semantic dedup —
    // within-cluster exact pairs → CC → keep the least-redundant doc
    // per duplicate group. Recall measured against the unclustered
    // brute pair set at the same threshold (the cost SemDeDup pays for
    // turning Θ(n²) into K·Θ((n/K)²) is exactly cross-cluster pairs).
    "q62_semdedup" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      // semDedupPairs returns an already-persisted frame (it must
      // materialize before dropping its cluster assignment)
      val pairs = Similarity.semDedupPairs(s, e, threshold = 0.35,
        nClusters = 8)
      val dec = Similarity.semDedup(s, e, threshold = 0.35, nClusters = 8,
        precomputedPairs = Some(pairs))
      // recall on a capped universe (vec_id < 200, like q27/q30/q41's
      // query caps): the brute twin is Θ(n²) and would dominate the
      // query at scale; the capped measure is the same estimator at
      // fixed cost as data grows
      val brute = Similarity
        .cosinePairsBrute(e.filter(col("vec_id") < 200), threshold = 0.35)
        .select("id_a", "id_b")
      val bruteN = brute.count()
      val semN = pairs.filter(col("id_a") < 200 && col("id_b") < 200)
        .select("id_a", "id_b")
        .join(brute, Seq("id_a", "id_b"), "left_semi").count()
      val recall = if (bruteN == 0) 1.0 else semN.toDouble / bruteN
      // r7 graduation to an invariant oracle (the annTopKAudit shape):
      // one row per input vector with the decision contract pinned —
      // exactly one keeper per duplicate group, group labels are the
      // group's min id (the CC contract), every dropped vector has a
      // same-group witness, centroid cosines are valid, and the
      // capped-universe recall clears the enforced floor. Floor set
      // from measurement (ProbeAnnRecall, r7): on the NEAR-RANDOM
      // synthetic embeddings the θ=0.35 pair population has no cluster
      // structure, so single-assignment SemDeDup measures pair recall
      // 0.366 (sf0.01) / 0.350 (sf0.1) at K=8 — the K·(n/K)² trade the
      // paper accepts (cross-cluster pairs are exactly the cost). A
      // BROKEN assignment ceilings at ~1/K ≈ 0.125 and a broken pair
      // join at 0, so 0.25 separates working from broken with margin
      // on both sides.
      import org.apache.spark.sql.expressions.Window
      val wg = Window.partitionBy("group_id")
      dec
        .withColumn("_nkeep", sum(when(col("keep"), 1L).otherwise(0L)).over(wg))
        .withColumn("_gsz", count(lit(1)).over(wg))
        .select(col("vec_id"),
          (col("_nkeep") === 1L).as("one_keeper_ok"),
          (col("group_id") <= col("vec_id")).as("group_min_ok"),
          (col("keep") || col("_gsz") >= 2L).as("witness_ok"),
          col("centroid_cos").between(-1.000001, 1.000001).as("range_ok"),
          lit(recall >= 0.25).as("recall_ok"))
        .orderBy("vec_id")
    }),

    // Training-mix construction: per-source token budgets → replayable
    // md5 Bernoulli rates computed in-plan (oracle-checkable even
    // though the rates are data-dependent).
    "q63_mixture_sample" -> ((s, d) =>
      TextAnalysis.mixtureSample(Tables.documents(s, d),
        budgets = Map("src0" -> 700L, "src1" -> 3000L,
          "src2" -> 400L, "src3" -> 900L))),

    // CCNet-shaped LM quality score: per-doc avg negative log-likelihood
    // under the corpus unigram distribution.
    "q64_unigram_nll" -> ((s, d) =>
      TextAnalysis.unigramLogLik(Tables.documents(s, d))),

    // DSIR importance weights targeting the src0 slice: hashed
    // unigram+bigram log-likelihood ratios, replayable md5 buckets.
    "q65_dsir_weights" -> ((s, d) =>
      TextAnalysis.dsirWeights(Tables.documents(s, d),
        targetPred = col("source") === "src0", buckets = 1024)),

    // Tokenize-to-ids: top-20 vocab (the synthetic corpus has ~31
    // distinct terms, so the OOV->0 path is exercised), exploded
    // (doc, pos, token_id) stream.
    "q66_vocab_encode" -> ((s, d) =>
      TextAnalysis.vocabEncode(Tables.documents(s, d), maxVocab = 20)),

    // Corpus length report: exact interpolated p50/p90/p99 per source.
    "q67_length_quantiles" -> ((s, d) =>
      TextAnalysis.lengthQuantiles(Tables.documents(s, d))),

    // BM25 retrieval: top-20 docs for a fixed 3-term query.
    "q70_bm25_topk" -> ((s, d) =>
      TextAnalysis.bm25TopK(Tables.documents(s, d), "spark table join")),

    // Budget-constrained quality curation: keep the best docs per
    // source until the token budget is spent (src0 generous, src1
    // cuts mid-source, src2 zero budget, all other sources absent).
    "q71_quality_budget" -> ((s, d) =>
      TextAnalysis.qualityBudgetSelect(Tables.documents(s, d),
        Map("src0" -> 30000L, "src1" -> 8000L, "src2" -> 0L))),

    // Passage-level boilerplate removal: 15-token windows, drop
    // non-first occurrences of globally duplicated passages, reassemble.
    "q68_dedup_passages" -> ((s, d) =>
      Dedup.dedupPassages(Tables.documents(s, d), window = 15)),

    // Multimodal near-dup: aHash + pigeonhole hamming pairs over the
    // encoded-image table with ids<60 images re-planted under offset
    // ids — each planted copy must pair with its source at dist 0.
    // Planted-duplicate recovery through the full decode → aHash →
    // pigeonhole-bucket → verify pipeline: every image with media_id <
    // 60 is copied byte-identically to id+1e6, so each planted pair
    // MUST surface at Hamming distance 0. The output is the per-plant
    // verdict — deterministic and DuckDB-expressible (the oracle
    // enumerates the planted ids from `documents`; the pixel pipeline
    // itself can't run in SQL, its effect is what's checked). A broken
    // hash/bucket path drops `recovered` to false and fails the hash.
    "q72_image_dup_pairs" -> ((s, d) => {
      val media = Multimodal.syntheticEncodedMedia(Tables.documents(s, d))
      val planted = media
        .filter(col("modality") === "image" && col("media_id") < 60)
        .withColumn("media_id", col("media_id") + 1000000L)
      val pairs = Multimodal.imageDupPairs(s, media.unionByName(planted))
      val expected = Tables.documents(s, d)
        .filter(col("doc_id") % 3 === 0 && col("doc_id") < 60)
        .select(col("doc_id").as("id_a"),
          (col("doc_id") + 1000000L).as("id_b"))
      expected.join(pairs, Seq("id_a", "id_b"), "left")
        .select(col("id_a"), col("id_b"),
          col("dist").isNotNull.as("recovered"),
          coalesce(col("dist"), lit(-1)).as("dist"))
    }),

    // Prefix-filtered set-similarity self-join (AllPairs) over the SAME
    // 3-gram shingle space as q26: the prefix filter is LOSSLESS, so
    // the pair set must equal the brute posting-list join's — the
    // oracle replays the brute form and the hash compare doubles as a
    // correctness proof of the pruning. τ=0.5 is the operator's
    // operating point (near-dup level): the indexed prefix is
    // |x|−⌈τ|x|⌉+1 ≈ half of each document, so the candidate volume
    // halves-squared vs the full posting join — at τ→0 the prefix
    // approaches the whole set and the algorithm degenerates to q26's
    // brute form by design (SimJoinSpec pins equality at τ=0.10 too).
    "q96_setsim_join" -> ((s, d) =>
      Dedup.setSimilarityJoin(Tables.documents(s, d), threshold = 0.5, n = 3)),

    // Misra–Gries heavy-hitters audit (k=64) beside the exact term
    // counts: one deterministic invariant row (the q84/q88 pattern) —
    // the sketch's est ≤ f ≤ est + n/(k+1) guarantee and the
    // every-heavy-term-found completeness are checked against the
    // exact aggregate, and either failing flips a boolean the hash
    // compare catches.
    "q98_heavy_hitters" -> ((s, d) =>
      graft.pipeline.Sketches.heavyHittersAudit(s, Tables.documents(s, d), k = 64)),

    // Real-codec decode as an INVARIANT oracle (graduated from
    // rows-only in r6): the synthetic payloads are bit-deterministic
    // per media_id, so the decoded stream properties are closed-form —
    // image/video dims must equal the encoder's metadata, audio must
    // come back 8 kHz mono with a sane amplitude, video must report
    // 25 fps and frames×40 ms == the recorded duration. Every check is
    // a boolean the DuckDB oracle pins TRUE; a decode or parser
    // regression flips one and the hash compare catches it.
    "q34_media_features" -> ((s, d) => {
      val media = Multimodal.syntheticEncodedMedia(Tables.documents(s, d))
      val f = Multimodal.decodeFeatures(s, media, featDim = 16)
      def feat(i: Int) = element_at(col("features"), i)
      f.join(media.select("media_id", "meta_width", "meta_height",
          "meta_duration_ms"), "media_id")
        .select(col("media_id"), col("modality"), col("decoded"),
          when(col("modality") === "audio",
              feat(1) === 8000f && feat(2) === 1f)
            .otherwise(feat(1) === col("meta_width").cast("float") &&
              feat(2) === col("meta_height").cast("float")).as("dims_ok"),
          when(col("modality") === "image", col("meta_duration_ms") === 0)
            .when(col("modality") === "audio",
              col("meta_duration_ms").between(25, 49))
            .otherwise(feat(3) * 40 === col("meta_duration_ms")
              .cast("float") && feat(4) === 25f).as("duration_ok"),
          when(col("modality") === "audio",
              feat(3) > 0f && feat(3) <= 1f && feat(4) >= 0f && feat(4) <= 1f)
            .when(col("modality") === "image",
              feat(3).between(0f, 1f) && feat(4).between(0f, 0.5f))
            .otherwise(feat(5).between(0f, 1f)).as("signal_ok"))
        .orderBy("media_id")
    }),

    // Video frame sampling (q34's decode ladder, per-FRAME): decode
    // each y4m payload and emit every 2nd frame (everyMs=80 at 25
    // fps), then audit per clip. Invariant oracle (the q34 pattern —
    // frame counts are seed-random, so the CONTRACT is checked, not
    // the draw): stride exactly 2 from frame 0, timestamps exactly
    // idx·40 ms, lumas normalized to [0,1], and ⌈frames/2⌉ ∈ {2,3}
    // sampled rows for the 3..6-frame clips. Narrow map over video
    // rows + one media-keyed aggregate.
    "q154_frame_sample" -> ((s, d) => {
      val media = Multimodal.syntheticEncodedMedia(Tables.documents(s, d))
      Multimodal.frameSampleDecoded(s, media, everyMs = 80)
        .groupBy("media_id")
        .agg(count(lit(1)).as("_n"),
          (min(col("frame_idx")) === 0 &&
            max(col("frame_idx")) === (count(lit(1)) - 1) * 2 &&
            sum(pmod(col("frame_idx"), lit(2))) === 0).as("stride_ok"),
          (sum(abs(col("frame_ms") - col("frame_idx") * 40L)) === 0)
            .as("timing_ok"),
          (min(col("luma_mean")) >= 0f && max(col("luma_mean")) <= 1f)
            .as("luma_ok"))
        .select(col("media_id"),
          col("_n").between(2, 3).as("count_ok"),
          col("stride_ok"), col("timing_ok"), col("luma_ok"))
        .orderBy("media_id")
    }),

    // Audio feature extraction audit: decode each WAV payload and pin
    // the PHYSICS of the planted signal — a pure sine at amplitude 0.5
    // has RMS a/√2 ≈ 0.3536 (the Dirichlet-kernel partial-period
    // residual stays under ±0.011 for every (freq, n) the generator
    // draws, so [0.30, 0.41] has 4× headroom), zero-crossing rate
    // ≈ 2f/fs ∈ [0.05, 0.49988] for f ∈ [200, 1999], and every
    // envelope segment RMS sits in [0, 1]. A decode scale/endianness/
    // channel regression moves RMS far outside the band. Invariant
    // oracle; narrow map over audio rows only.
    "q155_audio_features" -> ((s, d) => {
      val media = Multimodal.syntheticEncodedMedia(Tables.documents(s, d))
        .filter(col("modality") === "audio")
      def feat(i: Int) = element_at(col("features"), i)
      Multimodal.decodeFeatures(s, media, featDim = 16)
        .select(col("media_id"), col("decoded"),
          feat(3).between(0.30f, 0.41f).as("rms_ok"),
          feat(4).between(0.04f, 0.51f).as("zcr_ok"),
          expr("forall(slice(features, 5, 12), " +
            "x -> x >= 0F AND x <= 1F)").as("env_ok"))
        .orderBy("media_id")
    }),

    // Corpus memorization audit: the k most frequent bigrams with their
    // occurrence and document frequencies (TakeOrderedAndProject cut).
    "q73_top_ngrams" -> ((s, d) =>
      TextAnalysis.topKNgrams(Tables.documents(s, d), n = 2, k = 25)),

    // PMI collocations: bigrams whose words co-occur beyond chance.
    "q74_pmi_collocations" -> ((s, d) =>
      TextAnalysis.pmiCollocations(Tables.documents(s, d), k = 25, minCount = 5)),

    // One-row Zipf rank-frequency fit over the top-100 terms.
    "q75_zipf_fit" -> ((s, d) =>
      TextAnalysis.zipfFit(Tables.documents(s, d), topV = 100)),

    // Robust per-source length outliers (median/MAD z on token counts).
    "q76_length_outliers" -> ((s, d) =>
      TextAnalysis.lengthOutliers(Tables.documents(s, d), zThresh = 3.0)),

    // Bigram-LM quality score (add-α smoothing) — the word-ORDER-aware
    // upgrade of q64.
    "q78_bigram_nll" -> ((s, d) =>
      TextAnalysis.bigramLogLik(Tables.documents(s, d), alpha = 0.1)),

    // BPE subword tokenize: train 200 merges on the corpus word table,
    // encode every document. The greedy merge loop has no SQL analog,
    // so the oracle checks INVARIANTS the encode must satisfy (the
    // q69/q84/q88 pattern): n_words replayed exactly by DuckDB,
    // n_words ≤ n_pieces ≤ n_chars + n_words (each word yields between
    // 1 and len(word)+1 pieces, </w> included), and the lossless
    // roundtrip — pieces stripped of the </w> sentinel re-concatenate
    // to exactly the original words. A merge-table or encode bug flips
    // a hash-checked boolean. All columns scalar (the r5 checker crash
    // was an array<string> column hitting pandas sort_values).
    // Count-min sketch audit beside the exact counts (q98's CMS
    // sibling): point-query guarantee booleans hash-enforced.
    "q132_countmin" -> ((s, d) =>
      graft.pipeline.Sketches.countMinAudit(s, Tables.documents(s, d),
        depth = 4, width = 1024, topQ = 32)),

    // Character-class / script profile: the encoding audit before
    // language ID. Exact oracle (pure regexp counts).
    "q133_script_profile" -> ((s, d) =>
      TextAnalysis.scriptProfile(Tables.documents(s, d)).orderBy("doc_id")),

    // Distributed Lloyd k-means with the dual-route argmin audit and
    // Lloyd-monotonicity invariant (booleans oracle-pinned TRUE; the
    // centroid table itself has no SQL analog).
    "q134_kmeans" -> ((s, d) =>
      Similarity.kMeansAssign(s, Tables.embeddings(s, d), k = 8, iters = 5)
        .orderBy("vec_id")),

    // Fightin'-Words keyness: per-source characteristic terms by
    // Dirichlet log-odds z-score. Exact oracle (aggregates + log
    // arithmetic + per-group top-k).
    "q135_keyness" -> ((s, d) =>
      TextAnalysis.keyness(Tables.documents(s, d), k = 10)
        .orderBy("source", "rn")),

    // Heaps-law vocabulary growth curve + log-log OLS fit (the q75
    // Zipf companion). Exact oracle.
    "q136_vocab_growth" -> ((s, d) =>
      TextAnalysis.vocabGrowth(Tables.documents(s, d)).orderBy("doc_id")),

    // Per-source Gini of the doc-length distribution (downsampling
    // granularity diagnostic). Exact oracle.
    "q137_gini_tokens" -> ((s, d) =>
      TextAnalysis.giniTokens(Tables.documents(s, d)).orderBy("source")),

    // Pairwise source JS divergence over unigram distributions
    // (mixture-design redundancy measure). Exact oracle.
    "q138_js_divergence" -> ((s, d) =>
      TextAnalysis.jsDivergence(Tables.documents(s, d))
        .orderBy("src_a", "src_b")),

    // gzip compressibility proxy (boilerplate/junk filter). gzip bytes
    // are not SQL-replayable → exact n_bytes + pinned bound booleans.
    "q139_compress_ratio" -> ((s, d) =>
      TextAnalysis.compressRatio(Tables.documents(s, d))
        .select(col("doc_id"), col("n_bytes"),
          (col("gz_bytes") > 0 && col("ratio") <= 2.0).as("ratio_ok"),
          (col("gz_bytes") >= 20).as("overhead_floor_ok"))
        .orderBy("doc_id")),

    // Per-source winsorized length stats (p05/p95 clamp — outlier-
    // robust corpus summary). Exact oracle: percentile ≡ quantile_cont
    // on integer-valued doubles.
    "q151_winsorize" -> ((s, d) =>
      TextAnalysis.winsorizedStats(Tables.documents(s, d))
        .orderBy("source")),

    // Per-doc duplicated word-8-gram load (substring-level dup signal,
    // Lee et al. 2022). Exact oracle: identical gram construction.
    "q152_dup_ngrams" -> ((s, d) =>
      Dedup.dupNgramStats(Tables.documents(s, d), n = 8)
        .orderBy("doc_id")),

    // Sparse TF-IDF cosine pairs via inverted-index join (lexical
    // mirror detector). Exact oracle replaying the same weighted
    // posting-list algebra.
    "q153_tfidf_cosine" -> ((s, d) =>
      TextAnalysis.tfidfCosinePairs(Tables.documents(s, d),
          threshold = 0.3, maxDf = 0.25)
        .orderBy("id_a", "id_b")),

    // Pairwise source vocabulary overlap (exact set algebra). Exact
    // oracle.
    "q147_source_overlap" -> ((s, d) =>
      TextAnalysis.sourceOverlap(Tables.documents(s, d))
        .orderBy("src_a", "src_b")),

    // Per-source HLL distinct audit: exact count (oracle-replayed)
    // beside approx_count_distinct with its 3σ accuracy pinned.
    "q148_hll_by_source" -> ((s, d) =>
      TextAnalysis.hllDistinctAudit(Tables.documents(s, d))
        .orderBy("source")),

    // Image resize (area-average → PNG re-encode) with invariant
    // oracle: resized payloads must decode at the requested dims and
    // track the global luma mean within 0.1 — pooling preserves the
    // count-weighted mean exactly, and the unweighted drift from
    // cell imbalance on tiny non-divisible images measures max 0.045
    // at sf0.1 (see resizeEncode doc), so 0.1 has 2× headroom while
    // still catching channel/scale regressions. The q34 pattern on
    // the enumerable image slice.
    "q145_resize" -> ((s, d) => {
      val media = Multimodal.syntheticEncodedMedia(Tables.documents(s, d))
        .filter(col("modality") === "image")
      val orig = Multimodal.decodeFeatures(s, media, featDim = 4)
        .select(col("media_id"), element_at(col("features"), 3).as("mean0"))
      val rs = Multimodal.resizeImages(s, media, outW = 4, outH = 4)
      val dec = Multimodal.decodeFeatures(s, rs, featDim = 4)
        .select(col("media_id"), col("decoded"),
          element_at(col("features"), 1).as("w"),
          element_at(col("features"), 2).as("h"),
          element_at(col("features"), 3).as("mean1"))
      dec.join(orig, "media_id")
        .select(col("media_id"), col("decoded"),
          (col("w") === 4f && col("h") === 4f).as("dims_ok"),
          (abs(col("mean0") - col("mean1")) < 0.1f).as("mean_preserved"))
        .orderBy("media_id")
    }),

    // Blocked Jaro-Winkler fuzzy join on part names (record linkage
    // between exact dedup and editdist-1). DuckDB implements the same
    // JW definition, so this is a full cross-engine oracle; both
    // engines filter on the ROUNDED score to keep the cut identical.
    "q141_jw_join" -> ((s, d) =>
      Dedup.jaroWinklerJoin(
        Tables.part(s, d).filter(col("p_partkey") < 500)
          .select(col("p_partkey").as("id"), col("p_name").as("s")),
        threshold = 0.92).orderBy("id_a", "id_b")),

    // Per-doc n-gram novelty against the ingest order: the fraction of
    // a document's 5-grams whose FIRST corpus occurrence (by doc_id)
    // is in that document — the "is the stream still contributing new
    // content" curve a continual-ingest pipeline watches (novelty ~1 =
    // fresh, ~0 = the corpus already said this). One gram explode +
    // one gram-keyed min aggregate + a 1:1 join back — the q152 cost
    // envelope with min instead of count. Exact oracle.
    "q173_ngram_novelty" -> ((s, d) => {
      val grams = Tables.documents(s, d)
        .select(col("doc_id"),
          filter(split(col("text"), " "), w => length(w) > 0).as("_ws"))
        .filter(size(col("_ws")) >= 5)
        .select(col("doc_id"), explode(expr(
          """transform(sequence(0, size(_ws) - 5),
            |  i -> array_join(slice(_ws, i + 1, 5), ' '))""".stripMargin))
          .as("gram"))
      val firstSeen = grams.groupBy("gram")
        .agg(min(col("doc_id")).as("_first"))
      grams.join(firstSeen, "gram")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("_first") === col("doc_id"), 1L).otherwise(0L))
            .as("n_novel"))
        .withColumn("novelty",
          round(col("n_novel") / col("n_grams").cast("double"), 6))
        .orderBy("doc_id")
    }),

    // Per-dimension embedding drift between the even/odd vec_id halves
    // (reference vs candidate batch): the feature-drift monitor a
    // production embedding pipeline runs on every refresh. One
    // posexplode + one (dim)-keyed aggregate — 64 output rows
    // regardless of corpus size. Exact oracle.
    "q171_embedding_drift" -> ((s, d) => {
      val x = Tables.embeddings(s, d)
        .select((col("vec_id") % 2 === 0).as("_a"),
          posexplode(col("embedding")).as(Seq("pos", "_v")))
      x.groupBy("pos").agg(
          round(avg(when(col("_a"), col("_v"))), 6).as("mean_ref"),
          round(avg(when(!col("_a"), col("_v"))), 6).as("mean_cand"))
        .withColumn("abs_diff",
          round(abs(col("mean_ref") - col("mean_cand")), 6))
        .withColumn("drifted", col("abs_diff") > 0.1)
        .orderBy("pos")
    }),

    // Train/val token-balance audit: the md5 split (q143) should leave
    // unigram distributions statistically indistinguishable — the chi²
    // over the (term × split) grid quantifies it. One term-keyed
    // aggregate + a broadcast totals row; catches both a broken hash
    // and a pathological corpus. Exact oracle (the split predicate is
    // md5-replayable, the q143 contract).
    "q172_split_balance" -> ((s, d) => {
      val terms = Tables.documents(s, d)
        .select(TextAnalysis.splitLabel(col("doc_id")).as("split"),
          explode(filter(split(col("text"), " "), w => length(w) > 0))
            .as("term"))
        .filter(col("split") =!= "test")
      val grid = terms.groupBy("term").agg(
        sum(when(col("split") === "train", 1L).otherwise(0L))
          .cast("double").as("ntr"),
        sum(when(col("split") === "val", 1L).otherwise(0L))
          .cast("double").as("nva"))
      val tot = grid.agg(sum(col("ntr")).as("Ttr"), sum(col("nva")).as("Tva"))
      def e(n: org.apache.spark.sql.Column, t: org.apache.spark.sql.Column) =
        (col("ntr") + col("nva")) * t / (col("Ttr") + col("Tva"))
      grid.crossJoin(broadcast(tot))
        .select(
          (pow(col("ntr") - e(col("ntr"), col("Ttr")), 2) /
            e(col("ntr"), col("Ttr")) +
            pow(col("nva") - e(col("nva"), col("Tva")), 2) /
              e(col("nva"), col("Tva"))).as("_t"),
          col("Ttr"), col("Tva"))
        .agg(count(lit(1)).as("n_terms"),
          round(first(col("Ttr")), 1).as("n_train_tokens"),
          round(first(col("Tva")), 1).as("n_val_tokens"),
          round(sum(col("_t")), 6).as("chi2"))
        .withColumn("dof", col("n_terms") - 1)
    }),

    // Contrastive-pair mining on the labeled embeddings (hardest
    // negative / hardest positive / margin per anchor — the triplet-
    // loss data-prep step). Exact oracle over the bounded anchor set.
    "q170_contrastive" -> ((s, d) =>
      Similarity.contrastiveMining(
        Tables.embeddings(s, d).filter(col("vec_id") < 100))
        .orderBy("aid")),

    // Fellegi–Sunter record linkage over prefix-blocked part pairs:
    // fuzzy name (JW) + exact brand/type agreement folded into the
    // log₂-likelihood match weight. Full cross-engine oracle — the
    // weights are driver-precomputed literals (see fellegiSunter doc),
    // so the sum replays bit-exactly.
    "q159_record_linkage" -> ((s, d) =>
      Dedup.fellegiSunter(
        Tables.part(s, d).filter(col("p_partkey") < 800),
        idCol = "p_partkey", nameCol = "p_name",
        exactCols = Seq("p_brand", "p_type"),
        mu = fsMu, nameThreshold = 0.9, matchThreshold = 6.0)
        .orderBy("id_a", "id_b")),

    // Per-source quantile normalization of doc length. Exact oracle.
    "q142_quantile_norm" -> ((s, d) =>
      TextAnalysis.quantileNormalize(Tables.documents(s, d))
        .orderBy("source", "doc_id")),

    // Deterministic 3-way stratified split (80/10/10). Exact oracle.
    "q143_split_assign" -> ((s, d) =>
      TextAnalysis.splitAssign(Tables.documents(s, d).select("doc_id"))
        .orderBy("doc_id")),

    // Unigram-LM (SentencePiece-style) tokenize: train a 1500-piece
    // model by Viterbi-EM on the corpus word table, Viterbi-encode
    // every document. Same invariant-oracle shape as q79: n_words
    // replayed exactly, piece-count bounds (1..len(word) pieces per
    // word), lossless concat roundtrip — plus the model-level
    // guarantee distinct from BPE's: n_pieces ≤ q79's would-be char
    // count because multi-char pieces exist (bounds_ok's upper edge is
    // n_chars, no </w> sentinel inflation).
    "q161_unigram_encode" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val model = Unigram.train(docs, vocabSize = 1500, maxWords = 5000)
      val words = filter(split(col("text"), " "), w => length(w) > 0)
      val nChars = aggregate(words, lit(0L), (acc, w) => acc + length(w))
      Unigram.encode(docs, model)
        .join(docs.select(col("doc_id"), nChars.as("_n_chars"),
          concat_ws("", words).as("_joined")), "doc_id")
        .select(col("doc_id"), col("n_words"),
          col("n_pieces").between(col("n_words"), col("_n_chars"))
            .as("bounds_ok"),
          (concat_ws("", col("pieces")) === col("_joined"))
            .as("roundtrip_ok"))
        .orderBy("doc_id")
    }),

    "q79_bpe_encode" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.train(docs, nMerges = 200, maxWords = 5000)
      val words = filter(split(col("text"), " "), w => length(w) > 0)
      val nChars = aggregate(words, lit(0L), (acc, w) => acc + length(w))
      Bpe.encode(docs, merges)
        .join(docs.select(col("doc_id"), nChars.as("_n_chars"),
          concat_ws("", words).as("_joined")), "doc_id")
        .select(col("doc_id"), col("n_words"),
          (col("n_pieces").between(col("n_words"),
            col("_n_chars") + col("n_words"))).as("bounds_ok"),
          (regexp_replace(concat_ws("", col("pieces")), "</w>", "")
            === col("_joined")).as("roundtrip_ok"))
        .orderBy("doc_id")
    })
  )

  def oracleSql: Map[String, String] = Map(
    // Brute-force quadratic levenshtein over the capped universe — the
    // ground truth the deletion-neighborhood join must reproduce
    // exactly (losslessness proof; FastSS guarantees no false
    // negatives at d ≤ 1, the verify step removes false positives).
    "q106_editdist_join" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS s FROM customer
        |  WHERE c_custkey < 2000)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.s, b.s) AS BIGINT) AS dist
        |FROM c a JOIN c b ON a.id < b.id
        |WHERE levenshtein(a.s, b.s) <= 1""".stripMargin,

    // The same chunk grid: token list, last-start = clamped
    // ceil((n-64)/48), list_slice per start (1-based, end-clamped like
    // Spark's slice), md5 of the re-joined window. Trunc-vs-floor
    // division never diverges: the clamp catches every negative.
    "q107_chunk_overlap" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents),
        |n AS (SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) >= 1),
        |g AS (SELECT doc_id, toks, n, s.i AS chunk_idx
        |  FROM n, LATERAL (SELECT unnest(generate_series(0,
        |    greatest(0, (n - 64 + 48 - 1) // 48))) AS i) s),
        |c AS (SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
        |  list_slice(toks, chunk_idx * 48 + 1,
        |    least(chunk_idx * 48 + 64, n)) AS chunk FROM g)
        |SELECT doc_id, chunk_idx, CAST(len(chunk) AS BIGINT) AS n_tokens,
        |  md5(array_to_string(chunk, ' ')) AS chunk_md5
        |FROM c""".stripMargin,

    "q24_dedup_exact" ->
      """SELECT md5(text) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,

    // Identical distinct-set algebra over the (source, term) table.
    "q147_source_overlap" ->
      """WITH st AS (SELECT DISTINCT source, unnest(list_filter(
        |    string_split(text, ' '), w -> len(w) > 0)) AS term
        |  FROM documents),
        |sz AS (SELECT source, count(*) AS n FROM st GROUP BY 1),
        |i AS (SELECT a.source AS src_a, b.source AS src_b,
        |    count(*) AS n_common
        |  FROM st a JOIN st b ON a.term = b.term AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT i.src_a, i.src_b, CAST(na.n AS BIGINT) AS na,
        |  CAST(nb.n AS BIGINT) AS nb, CAST(i.n_common AS BIGINT)
        |    AS n_common,
        |  round(i.n_common / (na.n + nb.n - i.n_common), 6) AS jaccard
        |FROM i JOIN sz na ON i.src_a = na.source
        |  JOIN sz nb ON i.src_b = nb.source""".stripMargin,

    // Exact per-source distinct + the sketch-accuracy boolean pinned.
    "q148_hll_by_source" ->
      """WITH st AS (SELECT DISTINCT source, unnest(list_filter(
        |    string_split(text, ' '), w -> len(w) > 0)) AS term
        |  FROM documents)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_distinct,
        |  TRUE AS hll_ok
        |FROM st GROUP BY 1""".stripMargin,

    // Resize invariant oracle on the enumerable image slice.
    "q145_resize" ->
      """SELECT doc_id AS media_id, TRUE AS decoded, TRUE AS dims_ok,
        |  TRUE AS mean_preserved
        |FROM documents WHERE doc_id % 3 = 0""".stripMargin,

    // Same blocking key, same JW definition, same rounded-score cut.
    // Same block join, same rounded-JW agreement cut, and the SAME
    // weight literals summed in the same left-assoc order.
    "q159_record_linkage" -> {
      val Seq(wa0, wa1, wa2) = fsWa
      val Seq(wd0, wd1, wd2) = fsWd
      // CAST each leg: DuckDB parses decimal literals as DECIMAL and
      // would sum in decimal arithmetic; the weights are doubles.
      val w = s"(CASE WHEN agree_p_name THEN CAST($wa0 AS DOUBLE) " +
        s"ELSE CAST($wd0 AS DOUBLE) END) " +
        s"+ (CASE WHEN agree_p_brand THEN CAST($wa1 AS DOUBLE) " +
        s"ELSE CAST($wd1 AS DOUBLE) END) " +
        s"+ (CASE WHEN agree_p_type THEN CAST($wa2 AS DOUBLE) " +
        s"ELSE CAST($wd2 AS DOUBLE) END)"
      s"""WITH p AS (SELECT p_partkey AS id, p_name, p_brand, p_type
         |  FROM part WHERE p_partkey < 800),
         |c AS (
         |  SELECT a.id AS id_a, b.id AS id_b,
         |    round(jaro_winkler_similarity(a.p_name, b.p_name), 6) >= 0.9
         |      AS agree_p_name,
         |    a.p_brand = b.p_brand AS agree_p_brand,
         |    a.p_type = b.p_type AS agree_p_type
         |  FROM p a JOIN p b ON a.id < b.id
         |    AND substr(a.p_name, 1, 4) = substr(b.p_name, 1, 4))
         |SELECT id_a, id_b, agree_p_name, agree_p_brand, agree_p_type,
         |  round($w, 6) AS weight,
         |  round($w, 6) >= 6.0 AS is_match
         |FROM c""".stripMargin
    },

    "q141_jw_join" ->
      """WITH p AS (SELECT p_partkey AS id, p_name AS s FROM part
        |  WHERE p_partkey < 500)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  round(jaro_winkler_similarity(a.s, b.s), 6) AS jw
        |FROM p a JOIN p b ON a.id < b.id
        |  AND substr(a.s, 1, 4) = substr(b.s, 1, 4)
        |WHERE round(jaro_winkler_similarity(a.s, b.s), 6) >= 0.92""".stripMargin,

    // Identical unique-ordering percent_rank.
    "q142_quantile_norm" ->
      """WITH pd AS (SELECT source, doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), w -> len(w) > 0))
        |    AS BIGINT) AS n_tok FROM documents)
        |SELECT source, doc_id, n_tok,
        |  round(percent_rank() OVER (
        |    PARTITION BY source ORDER BY n_tok ASC, doc_id ASC), 6) AS qnorm
        |FROM pd""".stripMargin,

    // Identical md5 thresholds: 0.8·2³² = cccccccc, 0.9·2³² = e6666666.
    "q143_split_assign" ->
      """SELECT doc_id,
        |  CASE WHEN md5('split:42:' || CAST(doc_id AS VARCHAR)) < 'cccccccc'
        |    THEN 'train'
        |  WHEN md5('split:42:' || CAST(doc_id AS VARCHAR)) < 'e6666666'
        |    THEN 'val'
        |  ELSE 'test' END AS split
        |FROM documents""".stripMargin,

    // Identical rank-weighted Gini arithmetic (ties broken by doc_id).
    "q137_gini_tokens" ->
      """WITH pd AS (SELECT source, doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), w -> len(w) > 0))
        |    AS BIGINT) AS n_tok FROM documents),
        |r AS (SELECT source, n_tok, CAST(row_number() OVER (
        |  PARTITION BY source ORDER BY n_tok ASC, doc_id ASC) AS BIGINT)
        |  AS i FROM pd)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
        |  round(2.0 * sum(i * n_tok) / (count(*) * sum(n_tok))
        |    - (count(*) + 1.0) / count(*), 6) AS gini
        |FROM r GROUP BY 1""".stripMargin,

    // Identical pair×vocab grid and 0·ln0 guards.
    "q138_js_divergence" ->
      """WITH t AS (SELECT source, unnest(list_filter(string_split(text, ' '),
        |    w -> len(w) > 0)) AS term FROM documents),
        |c AS (SELECT source, term, count(*) AS cnt FROM t GROUP BY 1, 2),
        |tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n FROM c
        |  GROUP BY 1),
        |p AS (SELECT c.source, c.term, c.cnt / tot.n AS p FROM c
        |  JOIN tot USING (source)),
        |pairs AS (SELECT a.source AS src_a, b.source AS src_b
        |  FROM (SELECT source FROM tot) a, (SELECT source FROM tot) b
        |  WHERE a.source < b.source),
        |vocab AS (SELECT DISTINCT term FROM c),
        |grid AS (SELECT pr.src_a, pr.src_b,
        |  coalesce(pa.p, 0) AS pa, coalesce(pb.p, 0) AS pb
        |  FROM pairs pr CROSS JOIN vocab v
        |  LEFT JOIN p pa ON pa.source = pr.src_a AND pa.term = v.term
        |  LEFT JOIN p pb ON pb.source = pr.src_b AND pb.term = v.term
        |  WHERE coalesce(pa.p, 0) + coalesce(pb.p, 0) > 0)
        |SELECT src_a, src_b,
        |  round(sum(
        |    CASE WHEN pa > 0 THEN 0.5 * pa * ln(pa / ((pa + pb) / 2))
        |      ELSE 0 END +
        |    CASE WHEN pb > 0 THEN 0.5 * pb * ln(pb / ((pa + pb) / 2))
        |      ELSE 0 END), 6) AS jsd,
        |  CAST(count(*) AS BIGINT) AS n_terms_union
        |FROM grid GROUP BY 1, 2""".stripMargin,

    // Identical word-8-gram slide and corpus-wide count join; docs
    // shorter than 8 words drop out of both engines by construction.
    "q152_dup_ngrams" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    array_to_string(list_slice(ws, i.i + 1, i.i + 8), ' ') AS gram
        |  FROM w, LATERAL (SELECT unnest(range(0, len(ws) - 7)) AS i) i),
        |c AS (SELECT gram, count(*) AS cnt FROM g GROUP BY 1)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_dup_grams,
        |  round(sum(CASE WHEN cnt > 1 THEN 1 ELSE 0 END)
        |    / CAST(count(*) AS DOUBLE), 6) AS dup_fraction
        |FROM g JOIN c USING (gram) GROUP BY 1""".stripMargin,

    // Identical df-capped TF-IDF space: smooth idf, norms over the
    // capped vocabulary, dot via the term-keyed posting join.
    "q153_tfidf_cosine" ->
      """WITH t AS (SELECT doc_id AS id,
        |    unnest(list_filter(string_split(text, ' '), x -> len(x) > 0))
        |      AS term
        |  FROM documents),
        |tf AS (SELECT id, term, count(*) AS tf FROM t GROUP BY 1, 2),
        |nd AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1
        |        HAVING count(*) <=
        |          least(0.25 * (SELECT n FROM nd), 1000.0)),
        |w AS (SELECT id, tf.term,
        |    tf.tf * (ln((nd.n + 1.0) / (dfq.df + 1.0)) + 1.0) AS w
        |  FROM tf JOIN dfq USING (term), nd),
        |nm AS (SELECT id, sqrt(sum(w * w)) AS norm FROM w GROUP BY 1),
        |d AS (SELECT a.id AS id_a, b.id AS id_b, sum(a.w * b.w) AS dot
        |  FROM w a JOIN w b ON a.term = b.term AND a.id < b.id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |  round(dot / (na.norm * nb.norm), 6) AS cosine
        |FROM d JOIN nm na ON d.id_a = na.id JOIN nm nb ON d.id_b = nb.id
        |WHERE dot / (na.norm * nb.norm) >= 0.3""".stripMargin,

    // Identical clamp-at-quantile arithmetic; quantile_cont matches
    // Spark's exact percentile (linear interpolation at p·(n−1)).
    "q151_winsorize" ->
      """WITH v AS (SELECT source AS grp, CAST(n_chars AS DOUBLE) AS v
        |  FROM documents),
        |q AS (SELECT grp, quantile_cont(v, 0.05) AS plo,
        |    quantile_cont(v, 0.95) AS phi
        |  FROM v GROUP BY 1)
        |SELECT grp AS source, count(*) AS n_rows,
        |  round(plo, 6) AS p_lo, round(phi, 6) AS p_hi,
        |  round(avg(v), 6) AS mean_raw,
        |  round(avg(greatest(plo, least(phi, v))), 6) AS mean_winsorized
        |FROM v JOIN q USING (grp) GROUP BY grp, plo, phi""".stripMargin,

    // gzip invariant oracle: exact byte counts, bound booleans pinned.
    "q139_compress_ratio" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT)
        |    AS n_bytes,
        |  TRUE AS ratio_ok, TRUE AS overhead_floor_ok
        |FROM documents WHERE octet_length(encode(text)) >= 1""".stripMargin,

    // PCA invariant oracle over the enumerable projection slice.
    "q90_pca" ->
      """SELECT vec_id, TRUE AS finite_ok, TRUE AS orthonormal_ok,
        |  TRUE AS evals_sorted_ok, TRUE AS var_matches_eigenvalue
        |FROM embeddings WHERE vec_id < 100""".stripMargin,

    // CMS audit: exact scalars recomputed, guarantee booleans pinned.
    "q132_countmin" ->
      """WITH t AS (SELECT unnest(list_filter(string_split(text, ' '),
        |    w -> len(w) > 0)) AS term FROM documents),
        |a AS (SELECT term, count(*) AS cnt FROM t GROUP BY 1)
        |SELECT CAST(sum(cnt) AS BIGINT) AS n_total,
        |  CAST(count(*) AS BIGINT) AS n_terms,
        |  CAST(least(32, count(*)) AS BIGINT) AS n_checked,
        |  TRUE AS no_underestimate, TRUE AS overcount_ok
        |FROM a""".stripMargin,

    // Identical ASCII character-class regexp counts and ratio
    // arithmetic.
    "q133_script_profile" ->
      """WITH c AS (SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT)
        |    AS n_letter,
        |  CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digit,
        |  CAST(len(regexp_extract_all(text, '[ \t\n\r]')) AS BIGINT)
        |    AS n_space
        |  FROM documents WHERE len(text) >= 1)
        |SELECT doc_id, n_chars, n_letter, n_digit, n_space,
        |  n_chars - n_letter - n_digit - n_space AS n_other,
        |  round(n_letter / n_chars, 6) AS r_letter,
        |  round(n_digit / n_chars, 6) AS r_digit,
        |  n_letter * 2 > n_chars AS mostly_alpha
        |FROM c""".stripMargin,

    // k-means invariant oracle: the dual-route argmin agreement and
    // Lloyd monotonicity are Spark-side booleans pinned TRUE per row.
    "q134_kmeans" ->
      """SELECT vec_id, TRUE AS assign_ok, TRUE AS inertia_ok
        |FROM embeddings""".stripMargin,

    // Identical Dirichlet log-odds z arithmetic and per-source top-k.
    "q135_keyness" ->
      """WITH t AS (SELECT source, unnest(list_filter(string_split(text, ' '),
        |    w -> len(w) > 0)) AS term FROM documents),
        |bs AS (SELECT source, term, count(*) AS f_s FROM t GROUP BY 1, 2),
        |bt AS (SELECT term, CAST(sum(f_s) AS BIGINT) AS f_tot FROM bs
        |  GROUP BY 1),
        |tot AS (SELECT source, CAST(sum(f_s) AS BIGINT) AS n_s FROM bs
        |  GROUP BY 1),
        |g AS (SELECT CAST((SELECT sum(n_s) FROM tot) AS BIGINT) AS n_tot,
        |  (SELECT count(*) FROM bt) AS vocab),
        |sc AS (SELECT bs.source, bs.term, bs.f_s,
        |  round((ln((bs.f_s + 0.5) / (tot.n_s + 0.5 * g.vocab - bs.f_s - 0.5))
        |    - ln(((bt.f_tot - bs.f_s) + 0.5)
        |      / ((g.n_tot - tot.n_s) + 0.5 * g.vocab
        |        - (bt.f_tot - bs.f_s) - 0.5)))
        |    / sqrt(1.0 / (bs.f_s + 0.5) + 1.0 / ((bt.f_tot - bs.f_s) + 0.5)),
        |    6) AS z
        |  FROM bs JOIN tot USING (source) JOIN bt USING (term), g)
        |SELECT source, term, f_s, z, rn FROM (
        |  SELECT source, term, f_s, z, row_number() OVER (
        |    PARTITION BY source ORDER BY z DESC, term) AS rn FROM sc)
        |WHERE rn <= 10""".stripMargin,

    // Identical prefix sums and CENTERED two-pass OLS fit in log-log
    // space (the raw-moment form cancelled catastrophically at the
    // 50k-doc scale point — see vocabGrowth).
    "q136_vocab_growth" ->
      """WITH t AS (SELECT doc_id, unnest(list_filter(string_split(text, ' '),
        |    w -> len(w) > 0)) AS term FROM documents),
        |pd AS (SELECT doc_id, count(*) AS n_tok FROM t GROUP BY 1),
        |fd AS (SELECT doc_id, count(*) AS n_new FROM (
        |  SELECT term, min(doc_id) AS doc_id FROM t GROUP BY 1) GROUP BY 1),
        |c AS (SELECT pd.doc_id,
        |  CAST(sum(pd.n_tok) OVER (ORDER BY pd.doc_id) AS BIGINT)
        |    AS cum_tokens,
        |  CAST(sum(coalesce(fd.n_new, 0)) OVER (ORDER BY pd.doc_id) AS BIGINT)
        |    AS cum_vocab
        |  FROM pd LEFT JOIN fd USING (doc_id)),
        |xy AS (SELECT ln(cum_tokens) AS x, ln(cum_vocab) AS y FROM c
        |  WHERE cum_tokens > 0 AND cum_vocab > 0),
        |m AS (SELECT avg(x) AS mx, avg(y) AS my FROM xy),
        |f AS (SELECT sum((x - mx) * (y - my)) AS sxy,
        |  sum((x - mx) * (x - mx)) AS sxx,
        |  first(mx) AS mx, first(my) AS my FROM xy, m),
        |b AS (SELECT sxy / sxx AS beta, mx, my FROM f)
        |SELECT c.doc_id, c.cum_tokens, c.cum_vocab,
        |  round(b.beta, 6) AS heaps_beta,
        |  round(exp(b.my - b.beta * b.mx), 6) AS heaps_k
        |FROM c, b""".stripMargin,

    // BPE invariant oracle: n_words replayed exactly; the bounds and
    // roundtrip booleans are computed Spark-side from the actual encode
    // and must all be TRUE — a false anywhere hash-mismatches.
    "q79_bpe_encode" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), w -> len(w) > 0))
        |    AS BIGINT) AS n_words,
        |  TRUE AS bounds_ok, TRUE AS roundtrip_ok
        |FROM documents""".stripMargin,

    // Same invariant shape for the unigram tokenizer (q79 pattern).
    "q161_unigram_encode" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(string_split(text, ' '), w -> len(w) > 0))
        |    AS BIGINT) AS n_words,
        |  TRUE AS bounds_ok, TRUE AS roundtrip_ok
        |FROM documents""".stripMargin,

    // Media-decode invariant oracle: modality is doc_id%3 by
    // construction; every synthetic payload must decode through the
    // real codec path (PNG via javax.imageio, WAV via javax.sound,
    // Y4M via the y4m parser), and the decoded stream properties must
    // equal the metadata the encoder recorded — dims for image/video,
    // 8 kHz mono + amplitude bound for audio, 25 fps × 40 ms frames
    // for video. Each property is a Spark-side boolean the oracle
    // pins TRUE.
    // Frame-sampling contract booleans for the video third of the
    // corpus (counts are seed-random → invariant oracle, q34 pattern).
    "q154_frame_sample" ->
      """SELECT doc_id AS media_id, TRUE AS count_ok, TRUE AS stride_ok,
        |  TRUE AS timing_ok, TRUE AS luma_ok
        |FROM documents WHERE doc_id % 3 = 2""".stripMargin,

    // Audio physics booleans for the audio third (sine RMS/ZCR bands).
    "q155_audio_features" ->
      """SELECT doc_id AS media_id, TRUE AS decoded, TRUE AS rms_ok,
        |  TRUE AS zcr_ok, TRUE AS env_ok
        |FROM documents WHERE doc_id % 3 = 1""".stripMargin,

    "q34_media_features" ->
      """SELECT doc_id AS media_id,
        |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image'
        |    WHEN 1 THEN 'audio' ELSE 'video' END AS modality,
        |  TRUE AS decoded, TRUE AS dims_ok, TRUE AS duration_ok,
        |  TRUE AS signal_ok
        |FROM documents""".stripMargin,

    // The identical per-word regexp counts (syllables clamped ≥1 PER
    // WORD, matching TextAnalysis.readability) and the identical
    // left-assoc double expression tree.
    "q127_readability" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    len(list_filter(string_split(text, ' '), w -> len(w) > 0))
        |      AS n_words,
        |    greatest(1, len(list_filter(
        |      regexp_split_to_array(text, '[.!?]+'), s -> len(trim(s)) > 0)))
        |      AS n_sentences,
        |    coalesce(list_sum(list_transform(
        |      list_filter(string_split(text, ' '), w -> len(w) > 0),
        |      w -> greatest(1, len(regexp_extract_all(lower(w),
        |        '[aeiouy]+'))))), 0) AS syl
        |  FROM documents)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  CAST(n_sentences AS BIGINT) AS n_sentences,
        |  CAST(syl AS BIGINT) AS n_syllables,
        |  round(206.835 - 1.015 * (n_words / n_sentences)
        |    - 84.6 * (syl / n_words), 6) AS flesch
        |FROM c WHERE n_words >= 1""".stripMargin,

    "q120_group_sample" ->
      """SELECT source, doc_id, rn FROM (
        |  SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source
        |      ORDER BY md5('gs:' || doc_id), doc_id) AS rn
        |  FROM documents) WHERE rn <= 25""".stripMargin,

    "q25_fingerprint" ->
      """SELECT doc_id, md5(array_to_string(
        |  list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fingerprint
        |FROM documents""".stripMargin,

    "q26_jaccard_pairs" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t)-1),
        |  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM d),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |  FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b, round(c * 1.0 / (na.n + nb.n - c), 6) AS jaccard
        |FROM inter JOIN sz na ON na.doc_id = id_a JOIN sz nb ON nb.doc_id = id_b
        |WHERE c * 1.0 / (na.n + nb.n - c) >= 0.10""".stripMargin,

    // q27's md5-family replica up to the candidate join, verified by
    // SIGNATURE agreement instead of true Jaccard (the q175 mode):
    // jaccard = (#agreeing of 64 minhash positions)/64.
    "q175_sig_dedup" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t)-1),
        |  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM d),
        |hm AS (SELECT doc_id, md5(s) AS m FROM sh),
        |hp AS (SELECT doc_id,
        |  CAST(CAST('0x' || substr(m, 1, 16) AS UBIGINT) AS HUGEINT) AS u1,
        |  CAST((CAST('0x' || substr(m, 17, 16) AS UBIGINT) | 1) AS HUGEINT) AS u2
        |  FROM hm),
        |hsg AS (SELECT doc_id,
        |  u1 - CASE WHEN u1 >= 9223372036854775808 THEN 18446744073709551616 ELSE 0 END AS s1,
        |  u2 - CASE WHEN u2 >= 9223372036854775808 THEN 18446744073709551616 ELSE 0 END AS s2
        |  FROM hp),
        |hs AS (SELECT doc_id, r.i, min(CAST(
        |  ((s1 + r.i * s2 + 9223372036854775808) % 18446744073709551616
        |    + 18446744073709551616) % 18446744073709551616
        |    - 9223372036854775808 AS BIGINT)) AS h
        |  FROM hsg, range(0, 64) r(i) GROUP BY 1, 2),
        |sig AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM hs GROUP BY 1),
        |bb AS (SELECT doc_id, rb.b,
        |  md5(array_to_string(sig[rb.b*4+1 : rb.b*4+4], '|')) AS bucket
        |  FROM sig, range(0, 16) rb(b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
        |  FROM bb a JOIN bb b2 ON a.b = b2.b AND a.bucket = b2.bucket
        |  WHERE a.doc_id < b2.doc_id),
        |sv AS (SELECT c.id_a, c.id_b,
        |  round(len(list_filter(range(1, 65),
        |    i -> sa.sig[i] = sb.sig[i])) / 64.0, 6) AS jaccard
        |  FROM cand c JOIN sig sa ON sa.doc_id = c.id_a
        |  JOIN sig sb ON sb.doc_id = c.id_b)
        |SELECT id_a, id_b, jaccard FROM sv WHERE jaccard >= 0.5""".stripMargin,

    // Full MinHash+LSH replica of the Kirsch–Mitzenmacher md5 family:
    // each shingle's single md5 digest splits into two 64-bit halves,
    // h_i = h1 + i·(h2|1) with two's-complement wrap — rebuilt here with
    // HUGEINT mod-2^64 arithmetic (DuckDB BIGINT ops raise on overflow,
    // so the wrap is made explicit; the ±2^63 shuffle converts between
    // the unsigned hex value and Spark's signed long). Band bucket =
    // md5 of the "|"-joined 4-hash slice, candidates verified against
    // true Jaccard, and the recall_vs_brute constant recomputed from
    // the capped (<1000) brute twin — cell-identical to the Spark frame.
    "q27_minhash_lsh" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t)-1),
        |  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM d),
        |hm AS (SELECT doc_id, md5(s) AS m FROM sh),
        |hp AS (SELECT doc_id,
        |  CAST(CAST('0x' || substr(m, 1, 16) AS UBIGINT) AS HUGEINT) AS u1,
        |  CAST((CAST('0x' || substr(m, 17, 16) AS UBIGINT) | 1) AS HUGEINT) AS u2
        |  FROM hm),
        |hsg AS (SELECT doc_id,
        |  u1 - CASE WHEN u1 >= 9223372036854775808 THEN 18446744073709551616 ELSE 0 END AS s1,
        |  u2 - CASE WHEN u2 >= 9223372036854775808 THEN 18446744073709551616 ELSE 0 END AS s2
        |  FROM hp),
        |hs AS (SELECT doc_id, r.i, min(CAST(
        |  ((s1 + r.i * s2 + 9223372036854775808) % 18446744073709551616
        |    + 18446744073709551616) % 18446744073709551616
        |    - 9223372036854775808 AS BIGINT)) AS h
        |  FROM hsg, range(0, 64) r(i) GROUP BY 1, 2),
        |sig AS (SELECT doc_id, list(h ORDER BY i) AS sig FROM hs GROUP BY 1),
        |bb AS (SELECT doc_id, rb.b,
        |  md5(array_to_string(sig[rb.b*4+1 : rb.b*4+4], '|')) AS bucket
        |  FROM sig, range(0, 16) rb(b)),
        |cand AS (SELECT DISTINCT a.doc_id AS id_a, b2.doc_id AS id_b
        |  FROM bb a JOIN bb b2 ON a.b = b2.b AND a.bucket = b2.bucket
        |  WHERE a.doc_id < b2.doc_id),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT c.id_a, c.id_b, count(*) AS c
        |  FROM cand c JOIN sh a ON a.doc_id = c.id_a
        |  JOIN sh b ON b.doc_id = c.id_b AND b.s = a.s GROUP BY 1, 2),
        |ver AS (SELECT id_a, id_b, round(c * 1.0 / (na.n + nb.n - c), 6) AS jaccard
        |  FROM inter JOIN sz na ON na.doc_id = id_a JOIN sz nb ON nb.doc_id = id_b
        |  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.10),
        |bru AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |  FROM sh a JOIN sh b USING (s)
        |  WHERE a.doc_id < b.doc_id AND a.doc_id < 1000 AND b.doc_id < 1000
        |  GROUP BY 1, 2),
        |brup AS (SELECT id_a, id_b
        |  FROM bru JOIN sz na ON na.doc_id = id_a JOIN sz nb ON nb.doc_id = id_b
        |  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.10),
        |hit AS (SELECT count(*) AS nb, count(*) FILTER (WHERE EXISTS
        |  (SELECT 1 FROM ver v WHERE v.id_a = brup.id_a AND v.id_b = brup.id_b)) AS nh
        |  FROM brup),
        |rec AS (SELECT CASE WHEN nb = 0 THEN 1.0 ELSE round(nh * 1.0 / nb, 4) END
        |  AS recall_vs_brute FROM hit)
        |SELECT v.id_a, v.id_b, v.jaccard, rec.recall_vs_brute
        |FROM ver v CROSS JOIN rec""".stripMargin,

    // SimHash brute-force twin: md5Hash64 token hashes rebuilt as
    // CAST('0x'||substr(md5(w),1,16) AS UBIGINT) (identical 64 bits),
    // majority-vote fingerprint assembled bit by bit, and ALL pairs
    // scanned at distance ≤ 7 — the pigeonhole-bucketed Spark operator
    // must produce the identical set (full recall by construction), so
    // this oracle row doubles as a recall proof. The 64 per-bit sums
    // are generated, not hand-written.
    "q28_simhash_pairs" -> {
      val sums = (0 until 64).map(b =>
        s"sum(CAST((h >> $b) & 1 AS BIGINT)) AS c$b").mkString(",\n  ")
      // toUnsignedString: bit 63's constant must print as 2^63, not
      // Long.MinValue's negative literal, to cast into UBIGINT
      val fp = (0 until 64).map(b =>
        s"CASE WHEN 2*c$b > n THEN ${java.lang.Long.toUnsignedString(1L << b)}::UBIGINT ELSE 0::UBIGINT END")
        .mkString(" + ")
      s"""WITH tok AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w
         |  FROM documents),
         |h AS (SELECT doc_id, CAST('0x' || substr(md5(w), 1, 16) AS UBIGINT) AS h
         |  FROM tok),
         |bits AS (SELECT doc_id, count(*) AS n,
         |  $sums
         |  FROM h GROUP BY 1),
         |fp AS (SELECT doc_id, $fp AS fp FROM bits),
         |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         |    CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS dist
         |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id)
         |SELECT id_a, id_b, dist FROM pairs WHERE dist <= 7""".stripMargin
    },

    // Connected components via transitive closure (recursive CTE) over
    // the q26 pair graph; cluster label = min reachable id. Feasible in
    // SQL because the closure is bounded by dup-cluster sizes, not the
    // corpus.
    "q44_dedup_clusters" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t)-1),
        |  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM d),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |  FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM inter JOIN sz na ON na.doc_id = id_a JOIN sz nb ON nb.doc_id = id_b
        |  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.10),
        |e AS (SELECT id_a AS a, id_b AS b FROM pairs
        |      UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
        |nodes AS (SELECT DISTINCT a AS id FROM e)
        |SELECT n.id AS doc_id, least(n.id, min(r.b)) AS keep_id,
        |  least(n.id, min(r.b)) = n.id AS keep
        |FROM nodes n JOIN reach r ON r.a = n.id
        |GROUP BY n.id""".stripMargin,

    // Identical 5-gram slide + first-occurrence min join.
    "q173_ngram_novelty" ->
      """WITH w AS (SELECT doc_id,
        |    list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    array_to_string(list_slice(ws, i.i + 1, i.i + 5), ' ') AS gram
        |  FROM w, LATERAL (SELECT unnest(range(0, len(ws) - 4)) AS i) i),
        |f AS (SELECT gram, min(doc_id) AS first FROM g GROUP BY 1)
        |SELECT doc_id, count(*) AS n_grams,
        |  CAST(sum(CASE WHEN f.first = g.doc_id THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_novel,
        |  round(sum(CASE WHEN f.first = g.doc_id THEN 1 ELSE 0 END)
        |    / CAST(count(*) AS DOUBLE), 6) AS novelty
        |FROM g JOIN f USING (gram) GROUP BY 1""".stripMargin,

    // Same 0-based dim explode, same conditional means off the SAME
    // rounded columns.
    "q171_embedding_drift" ->
      """WITH x AS (
        |  SELECT vec_id % 2 = 0 AS a, CAST(u.i AS INT) AS pos,
        |    embedding[u.i + 1] AS v
        |  FROM embeddings,
        |    LATERAL (SELECT unnest(range(0, 64)) AS i) u),
        |m AS (
        |  SELECT pos,
        |    round(avg(CASE WHEN a THEN v END), 6) AS mean_ref,
        |    round(avg(CASE WHEN NOT a THEN v END), 6) AS mean_cand
        |  FROM x GROUP BY 1)
        |SELECT pos, mean_ref, mean_cand,
        |  round(abs(mean_ref - mean_cand), 6) AS abs_diff,
        |  round(abs(mean_ref - mean_cand), 6) > 0.1 AS drifted
        |FROM m""".stripMargin,

    // The q143 md5 split predicate + the q119 chi² arithmetic over the
    // (term × split) grid.
    "q172_split_balance" ->
      """WITH t AS (
        |  SELECT CASE
        |      WHEN md5('split:42:' || CAST(doc_id AS VARCHAR))
        |        < 'cccccccc' THEN 'train'
        |      WHEN md5('split:42:' || CAST(doc_id AS VARCHAR))
        |        < 'e6666666' THEN 'val'
        |      ELSE 'test' END AS split,
        |    unnest(list_filter(string_split(text, ' '),
        |      w -> len(w) > 0)) AS term
        |  FROM documents),
        |g AS (
        |  SELECT term,
        |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS ntr,
        |    CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END)
        |      AS DOUBLE) AS nva
        |  FROM t WHERE split <> 'test' GROUP BY 1),
        |tt AS (SELECT sum(ntr) AS Ttr, sum(nva) AS Tva FROM g)
        |SELECT count(*) AS n_terms,
        |  round(first(Ttr), 1) AS n_train_tokens,
        |  round(first(Tva), 1) AS n_val_tokens,
        |  round(sum(
        |    pow(ntr - (ntr + nva) * Ttr / (Ttr + Tva), 2)
        |      / ((ntr + nva) * Ttr / (Ttr + Tva))
        |    + pow(nva - (ntr + nva) * Tva / (Ttr + Tva), 2)
        |      / ((ntr + nva) * Tva / (Ttr + Tva))), 6) AS chi2,
        |  count(*) - 1 AS dof
        |FROM g, tt""".stripMargin,

    // Same bounded-anchor pair frame, same per-polarity windows.
    "q170_contrastive" ->
      """WITH e AS (SELECT vec_id, embedding, label FROM embeddings
        |  WHERE vec_id < 100),
        |p AS (
        |  SELECT a.vec_id AS aid, b.vec_id AS bid,
        |    a.label AS alab, b.label AS blab,
        |    round(list_cosine_similarity(a.embedding::DOUBLE[],
        |      b.embedding::DOUBLE[]), 6) AS cos
        |  FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        |n AS (SELECT aid, bid AS hard_neg_id, cos AS hard_neg_cos,
        |    row_number() OVER (PARTITION BY aid
        |      ORDER BY cos DESC, bid ASC) AS rn
        |  FROM p WHERE alab <> blab),
        |q AS (SELECT aid, bid AS hard_pos_id, cos AS hard_pos_cos,
        |    row_number() OVER (PARTITION BY aid
        |      ORDER BY cos ASC, bid ASC) AS rn
        |  FROM p WHERE alab = blab)
        |SELECT e.vec_id AS aid, n.hard_neg_id, n.hard_neg_cos,
        |  q.hard_pos_id, q.hard_pos_cos,
        |  round(q.hard_pos_cos - n.hard_neg_cos, 6) AS margin
        |FROM e
        |LEFT JOIN (SELECT * FROM n WHERE rn = 1) n ON e.vec_id = n.aid
        |LEFT JOIN (SELECT * FROM q WHERE rn = 1) q ON e.vec_id = q.aid""".stripMargin,

    // Identical planted-line construction + rule algebra in DuckDB.
    "q177_c4_clean" ->
      """WITH t AS (SELECT doc_id, text || '.' || chr(10) ||
        |    CASE WHEN doc_id % 7 = 0 THEN 'buy now lorem ipsum'
        |      ELSE 'buy now click here' END || chr(10) ||
        |    'Enable JavaScript and cookies to continue.' || chr(10) ||
        |    'too short.' AS text
        |  FROM documents),
        |c AS (SELECT doc_id, text,
        |  (contains(lower(text), 'lorem ipsum') OR contains(text, '{'))
        |    AS doc_dropped,
        |  string_split(text, chr(10)) AS ls FROM t),
        |k AS (SELECT doc_id, doc_dropped,
        |  CAST(len(ls) AS BIGINT) AS n_lines,
        |  list_filter(ls, l -> regexp_matches(l, '[.!?"]$')
        |    AND len(list_filter(string_split(l, ' '), w -> len(w) > 0)) >= 3
        |    AND NOT contains(lower(l), 'javascript')
        |    AND NOT contains(lower(l), 'cookie')) AS kept
        |  FROM c)
        |SELECT doc_id, n_lines,
        |  CASE WHEN doc_dropped THEN 0
        |    ELSE CAST(len(kept) AS BIGINT) END AS n_kept,
        |  CASE WHEN doc_dropped THEN ''
        |    ELSE array_to_string(kept, chr(10)) END AS cleaned,
        |  doc_dropped
        |FROM k""".stripMargin,

    // q64's NLL machinery + the same source-partitioned tertile cut.
    "q180_ccnet_buckets" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS c FROM tok
        |  WHERE term <> '' GROUP BY 1, 2),
        |gf AS (SELECT term, sum(c) AS g FROM tf GROUP BY 1),
        |tot AS (SELECT sum(g) AS t FROM gf),
        |nll AS (SELECT tf.doc_id,
        |    round(-sum(tf.c * ln(gf.g / tot.t)) / sum(tf.c), 6) AS avg_nll
        |  FROM tf JOIN gf USING (term), tot GROUP BY 1),
        |j AS (SELECT d.doc_id, d.source, nll.avg_nll,
        |    ntile(3) OVER (PARTITION BY d.source
        |      ORDER BY nll.avg_nll, d.doc_id) AS nt
        |  FROM documents d JOIN nll ON d.doc_id = nll.doc_id)
        |SELECT doc_id, source, avg_nll,
        |  CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
        |    ELSE 'tail' END AS bucket
        |FROM j""".stripMargin,

    // Same centroid/d²/z algebra with the same rounding points; DuckDB
    // stddev is sample stddev like Spark's.
    "q187_label_outliers" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |x AS (SELECT vec_id, label, g.i AS pos, v[g.i] AS x
        |  FROM e, LATERAL (SELECT unnest(generate_series(1, 64)) AS i)
        |    g),
        |c AS (SELECT label, pos, avg(x) AS m FROM x GROUP BY 1, 2),
        |d AS (SELECT x.vec_id, x.label,
        |    round(sum((x.x - c.m) * (x.x - c.m)), 6) AS d2
        |  FROM x JOIN c ON x.label = c.label AND x.pos = c.pos
        |  GROUP BY 1, 2),
        |s AS (SELECT label, avg(d2) AS mu, stddev(d2) AS sd FROM d
        |  GROUP BY 1)
        |SELECT d.vec_id, d.label, d.d2,
        |  round((d.d2 - s.mu) / s.sd, 6) AS z,
        |  round((d.d2 - s.mu) / s.sd, 6) > 2.4931 AS is_outlier
        |FROM d JOIN s USING (label)""".stripMargin,

    // Identical planted mess + the same lowercase/whitespace/punct
    // collapse chain (expanded per char — RE2 has no backreferences);
    // idempotence recomputed on the normalized output.
    "q186_normalize_text" ->
      """WITH t AS (SELECT doc_id, '  MiXeD' || chr(9) || 'CASE  ' ||
        |    text || CASE WHEN doc_id % 4 = 0 THEN ' Wow!!!  Really??'
        |      ELSE chr(10) || 'new  line,,, end.' END AS text
        |  FROM documents),
        |n AS (SELECT doc_id, text, trim(
        |    regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(lower(text),
        |      '[ ' || chr(9) || chr(10) || ']+', ' ', 'g'),
        |      '\.{2,}', '.', 'g'), '!{2,}', '!', 'g'),
        |      '\?{2,}', '?', 'g'), ',{2,}', ',', 'g'),
        |      ';{2,}', ';', 'g'), ':{2,}', ':', 'g')) AS normalized
        |  FROM t)
        |SELECT doc_id, normalized, text <> normalized AS changed,
        |  trim(regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(regexp_replace(regexp_replace(
        |    regexp_replace(lower(normalized),
        |      '[ ' || chr(9) || chr(10) || ']+', ' ', 'g'),
        |      '\.{2,}', '.', 'g'), '!{2,}', '!', 'g'),
        |      '\?{2,}', '?', 'g'), ',{2,}', ',', 'g'),
        |      ';{2,}', ';', 'g'), ':{2,}', ':', 'g')) = normalized
        |    AS idempotent
        |FROM n""".stripMargin,

    // Every coordinate from the same md5 sign algebra (0-based i:j
    // keys, first hex digit 0-7 → +1); casts keep DOUBLE throughout.
    "q185_jl_project" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v
        |  FROM embeddings),
        |j AS (SELECT CAST(unnest(generate_series(0, 15)) AS INTEGER)
        |  AS dim)
        |SELECT e.vec_id, j.dim,
        |  round(list_sum(list_transform(generate_series(1, 64),
        |    i -> e.v[i] * (CASE WHEN substr(md5((i - 1) || ':' ||
        |        j.dim), 1, 1) BETWEEN '0' AND '7'
        |      THEN CAST(1.0 AS DOUBLE)
        |      ELSE CAST(-1.0 AS DOUBLE) END)))
        |    / sqrt(CAST(16 AS DOUBLE)), 6) AS coord
        |FROM e, j""".stripMargin,

    // The greedy trajectory as chained argmax CTEs: c1 = min id,
    // m_t = per-point min rounded d² to the first t centers,
    // c_{t+1} = argmax(m_t) with id tiebreak — identical rounding
    // points to the Scala loop.
    "q184_kcenter_coreset" ->
      """WITH e AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v
        |  FROM embeddings WHERE vec_id < 200),
        |c1 AS (SELECT id, v FROM e ORDER BY id LIMIT 1),
        |m1 AS (SELECT e.id, e.v,
        |    round(list_sum(list_transform(generate_series(1, 64),
        |      i -> (e.v[i] - c1.v[i]) * (e.v[i] - c1.v[i]))), 6) AS md
        |  FROM e, c1),
        |c2 AS (SELECT id, v, md FROM m1 ORDER BY md DESC, id LIMIT 1),
        |m2 AS (SELECT m1.id, m1.v, least(m1.md,
        |    round(list_sum(list_transform(generate_series(1, 64),
        |      i -> (m1.v[i] - c2.v[i]) * (m1.v[i] - c2.v[i]))), 6))
        |      AS md
        |  FROM m1, c2),
        |c3 AS (SELECT id, v, md FROM m2 ORDER BY md DESC, id LIMIT 1),
        |m3 AS (SELECT m2.id, m2.v, least(m2.md,
        |    round(list_sum(list_transform(generate_series(1, 64),
        |      i -> (m2.v[i] - c3.v[i]) * (m2.v[i] - c3.v[i]))), 6))
        |      AS md
        |  FROM m2, c3),
        |c4 AS (SELECT id, v, md FROM m3 ORDER BY md DESC, id LIMIT 1)
        |SELECT 1 AS rank, (SELECT id FROM c1) AS vec_id,
        |  CAST(0.0 AS DOUBLE) AS radius
        |UNION ALL SELECT 2, (SELECT id FROM c2), (SELECT md FROM c2)
        |UNION ALL SELECT 3, (SELECT id FROM c3), (SELECT md FROM c3)
        |UNION ALL SELECT 4, (SELECT id FROM c4), (SELECT md FROM c4)"""
        .stripMargin,

    // Per-language p^α weights — count, share, normalized weight,
    // oversample factor, expected docs; same rounding points as Spark.
    "q182_temperature_sampling" ->
      """WITH c AS (SELECT lang, count(*) AS n_docs FROM documents
        |  GROUP BY 1),
        |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n FROM c),
        |p AS (SELECT lang, n_docs, n_docs / CAST(t.n AS DOUBLE) AS p,
        |    pow(n_docs / CAST(t.n AS DOUBLE), 0.3) AS pa FROM c, t),
        |s AS (SELECT sum(pa) AS spa FROM p)
        |SELECT lang, n_docs, round(p, 6) AS p,
        |  round(pa / s.spa, 6) AS weight,
        |  round(pa / s.spa / p, 6) AS oversample,
        |  round(pa / s.spa * 10000, 6) AS expected_docs
        |FROM p, s""".stripMargin,

    // q64's NLL machinery → per-source mean (rounded BEFORE the
    // softmax in both engines) → exp/normalize with max-subtraction.
    "q183_domain_mix_weights" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' '))
        |    AS term FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS c FROM tok
        |  WHERE term <> '' GROUP BY 1, 2),
        |gf AS (SELECT term, sum(c) AS g FROM tf GROUP BY 1),
        |tot AS (SELECT sum(g) AS t FROM gf),
        |nll AS (SELECT tf.doc_id,
        |    round(-sum(tf.c * ln(gf.g / tot.t)) / sum(tf.c), 6)
        |      AS avg_nll
        |  FROM tf JOIN gf USING (term), tot GROUP BY 1),
        |b AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
        |    round(avg(nll.avg_nll), 6) AS avg_nll
        |  FROM documents d JOIN nll ON d.doc_id = nll.doc_id
        |  GROUP BY 1),
        |t2 AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_total,
        |    max(avg_nll) AS max_nll FROM b),
        |e AS (SELECT b.source, b.n_docs, b.avg_nll,
        |    b.n_docs / CAST(t2.n_total AS DOUBLE) AS p,
        |    exp((b.avg_nll - t2.max_nll) * 1.0) AS ev FROM b, t2),
        |s AS (SELECT sum(ev) AS se FROM e)
        |SELECT source, n_docs, avg_nll, round(ev / s.se, 6) AS weight,
        |  round(ev / s.se / p, 6) AS upweight
        |FROM e, s""".stripMargin,

    // Identical planted construction + integer rule algebra in DuckDB.
    "q181_gopher_rules" ->
      """WITH t AS (SELECT doc_id, text ||
        |    CASE WHEN doc_id % 3 = 0 THEN chr(10) || '• promo item' ||
        |        chr(10) || 'read more...' || chr(10) || 'click here...'
        |      WHEN doc_id % 7 = 0 THEN ' ## ## ##'
        |      ELSE chr(10) || 'the end of that story and with more'
        |    END AS text FROM documents),
        |f AS (SELECT doc_id, text,
        |    list_filter(regexp_split_to_array(text, '[ \n]'),
        |      w -> len(w) > 0) AS ws,
        |    string_split(text, chr(10)) AS ls,
        |    CAST(len(text) - len(replace(text, '#', '')) AS BIGINT)
        |      AS n_hash,
        |    CAST((len(text) - len(replace(text, '...', ''))) // 3
        |      AS BIGINT) AS n_ell
        |  FROM t),
        |g AS (SELECT doc_id,
        |    CAST(len(ws) AS BIGINT) AS n_words,
        |    CAST(len(ls) AS BIGINT) AS n_lines,
        |    CAST(list_sum(list_transform(ws, w -> len(w))) AS BIGINT)
        |      AS sum_len,
        |    n_hash, n_ell,
        |    CAST(len(list_filter(ls, l -> regexp_matches(l, '^[•\-*]')))
        |      AS BIGINT) AS n_bullet,
        |    CAST(len(list_filter(ls, l -> regexp_matches(l, '\.\.\.$')))
        |      AS BIGINT) AS n_ell_line,
        |    CAST(len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]')))
        |      AS BIGINT) AS n_alpha,
        |    CAST(CAST(list_contains(ws, 'the') AS INT)
        |      + CAST(list_contains(ws, 'be') AS INT)
        |      + CAST(list_contains(ws, 'to') AS INT)
        |      + CAST(list_contains(ws, 'of') AS INT)
        |      + CAST(list_contains(ws, 'and') AS INT)
        |      + CAST(list_contains(ws, 'that') AS INT)
        |      + CAST(list_contains(ws, 'have') AS INT)
        |      + CAST(list_contains(ws, 'with') AS INT) AS BIGINT)
        |      AS n_stopwords
        |  FROM f)
        |SELECT doc_id, n_words, n_lines,
        |  round(sum_len / CAST(n_words AS DOUBLE), 6) AS mean_word_len,
        |  round((n_hash + n_ell) / CAST(n_words AS DOUBLE), 6)
        |    AS symbol_ratio,
        |  n_stopwords,
        |  n_words >= 5 AND n_words <= 100000 AS words_ok,
        |  sum_len >= 3 * n_words AND sum_len <= 10 * n_words
        |    AS word_len_ok,
        |  (n_hash + n_ell) * 10 <= n_words AS symbol_ok,
        |  n_bullet * 10 <= n_lines * 9 AS bullet_ok,
        |  n_ell_line * 10 <= n_lines * 3 AS ellipsis_ok,
        |  n_alpha * 10 >= n_words * 8 AS alpha_ok,
        |  n_stopwords >= 2 AS stop_ok,
        |  (n_words >= 5 AND n_words <= 100000)
        |    AND (sum_len >= 3 * n_words AND sum_len <= 10 * n_words)
        |    AND ((n_hash + n_ell) * 10 <= n_words)
        |    AND (n_bullet * 10 <= n_lines * 9)
        |    AND (n_ell_line * 10 <= n_lines * 3)
        |    AND (n_alpha * 10 >= n_words * 8)
        |    AND (n_stopwords >= 2) AS gopher_keep
        |FROM g""".stripMargin,

    // Exact replay of the span-removal algebra: positional grams,
    // count/min-key aggregate, coverage join, anti join, ordered
    // reassembly.
    "q179_dedup_spans" ->
      """WITH t0 AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0
        |    THEN text || ' zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9'
        |    ELSE text END AS text FROM documents),
        |d AS (SELECT doc_id, string_split(text, ' ') AS ts FROM t0),
        |tok AS (SELECT doc_id, g.i AS idx, ts[g.i + 1] AS token
        |  FROM d, LATERAL (SELECT unnest(generate_series(0, len(ts) - 1))
        |    AS i) g),
        |gr AS (SELECT doc_id, g.i AS idx,
        |    array_to_string(ts[g.i + 1 : g.i + 8], ' ') AS gram,
        |    doc_id * 1000000 + g.i AS key
        |  FROM d, LATERAL (SELECT unnest(generate_series(0, len(ts) - 8))
        |    AS i) g
        |  WHERE len(ts) >= 8),
        |f AS (SELECT gram, count(*) AS cnt, min(key) AS fk FROM gr
        |  GROUP BY 1),
        |rem AS (SELECT gr.doc_id, gr.idx AS s FROM gr JOIN f USING (gram)
        |  WHERE f.cnt > 1 AND gr.key <> f.fk),
        |cov AS (SELECT DISTINCT t.doc_id, t.idx FROM tok t JOIN rem r
        |  ON t.doc_id = r.doc_id AND t.idx BETWEEN r.s AND r.s + 7),
        |keep AS (SELECT t.doc_id, t.idx, t.token FROM tok t
        |  ANTI JOIN cov c ON t.doc_id = c.doc_id AND t.idx = c.idx),
        |rb AS (SELECT doc_id, count(*) AS nk,
        |    array_to_string(list(token ORDER BY idx), ' ') AS cleaned
        |  FROM keep GROUP BY 1)
        |SELECT d.doc_id, CAST(len(d.ts) AS BIGINT) AS n_tokens,
        |  CAST(len(d.ts) - coalesce(rb.nk, 0) AS BIGINT) AS n_removed,
        |  coalesce(rb.cleaned, '') AS cleaned
        |FROM d LEFT JOIN rb USING (doc_id)""".stripMargin,

    // Classifier training-contract oracle: one row per doc, pinned.
    "q178_quality_classifier" ->
      """SELECT doc_id, TRUE AS score_range_ok, TRUE AS loss_improved,
        |  TRUE AS auc_ok
        |FROM documents""".stripMargin,

    // PQ codec invariant oracle: one row per vector, booleans pinned.
    "q176_pq_codec" ->
      """SELECT vec_id, TRUE AS codes_ok, TRUE AS better_than_mean
        |FROM embeddings""".stripMargin,

    // Full bootstrap replay: md5 uniforms → Poisson(1) weights →
    // weighted average-tie ranks per resample → weighted Pearson over
    // ranks → order-statistic cut at rn 6/196 (= bootstrapCi's
    // floor(alpha/2*B)+1 and floor((1-alpha/2)*B)+1 for B=200). All
    // rank/moment sums are exact half/quarter-integer arithmetic, so
    // both engines agree bit-for-bit before the 6-dp round.
    "q188_bootstrap_ci" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS DOUBLE) AS xv,
        |    CAST(n_chars AS DOUBLE) AS yv
        |  FROM documents),
        |u AS (
        |  SELECT CAST(i.range AS INTEGER) AS i, b.xv, b.yv,
        |    (CAST('0x' || substr(md5('42:' || b.doc_id || ':' || i.range),
        |       1, 13) AS BIGINT) + 1) / 4503599627370496.0 AS u
        |  FROM base b CROSS JOIN range(200) i),
        |w AS (
        |  SELECT i, xv, yv,
        |    CASE WHEN u < 0.3678794411714423 THEN 0
        |         WHEN u < 0.7357588823428846 THEN 1
        |         WHEN u < 0.9196986029286058 THEN 2
        |         WHEN u < 0.9810118431238462 THEN 3
        |         WHEN u < 0.9963401531726563 THEN 4
        |         WHEN u < 0.9994058151824183 THEN 5
        |         WHEN u < 0.9999167588507119 THEN 6
        |         ELSE 7 END AS w
        |  FROM u),
        |wf AS (SELECT * FROM w WHERE w > 0),
        |rxg AS (SELECT i, xv, sum(w) AS cw FROM wf GROUP BY 1, 2),
        |rxr AS (SELECT i, xv,
        |    sum(cw) OVER (PARTITION BY i ORDER BY xv) - (cw - 1) / 2.0 AS rx
        |  FROM rxg),
        |ryg AS (SELECT i, yv, sum(w) AS cw FROM wf GROUP BY 1, 2),
        |ryr AS (SELECT i, yv,
        |    sum(cw) OVER (PARTITION BY i ORDER BY yv) - (cw - 1) / 2.0 AS ry
        |  FROM ryg),
        |j AS (
        |  SELECT wf.i, wf.w, rxr.rx, ryr.ry
        |  FROM wf
        |  JOIN rxr ON wf.i = rxr.i AND wf.xv = rxr.xv
        |  JOIN ryr ON wf.i = ryr.i AND wf.yv = ryr.yv),
        |rho AS (
        |  SELECT i,
        |    round((sum(w) * sum(w * rx * ry) - sum(w * rx) * sum(w * ry)) /
        |      sqrt((sum(w) * sum(w * rx * rx) - sum(w * rx) * sum(w * rx)) *
        |           (sum(w) * sum(w * ry * ry) - sum(w * ry) * sum(w * ry))),
        |      6) AS rho
        |  FROM j GROUP BY i),
        |cut AS (
        |  SELECT min(rho) AS ci_lo, max(rho) AS ci_hi FROM (
        |    SELECT rho, row_number() OVER (ORDER BY rho, i) AS rn FROM rho)
        |  WHERE rn IN (6, 196))
        |SELECT r.i, r.rho, c.ci_lo, c.ci_hi
        |FROM rho r CROSS JOIN cut c ORDER BY r.i""".stripMargin,

    // SemDeDup invariant oracle: one row per input vector, decision
    // contract booleans pinned TRUE (see the q62 query body).
    "q62_semdedup" ->
      """SELECT vec_id, TRUE AS one_keeper_ok, TRUE AS group_min_ok,
        |  TRUE AS witness_ok, TRUE AS range_ok, TRUE AS recall_ok
        |FROM embeddings""".stripMargin,

    // ANN-ladder invariant oracles (annTopKAudit): one row per input
    // vector, every contract boolean pinned TRUE. A dropped query
    // vector changes the row count; any broken invariant flips a
    // boolean; a recall collapse below the enforced floor flips
    // recall_ok — all caught by the driver's hash compare.
    "q30_lsh_topk" ->
      """SELECT vec_id AS qid, TRUE AS k_ok, TRUE AS distinct_ok,
        |  TRUE AS no_self_ok, TRUE AS range_ok, TRUE AS sorted_ok,
        |  TRUE AS recall_ok
        |FROM embeddings""".stripMargin,

    "q41_ivf_topk" ->
      """SELECT vec_id AS qid, TRUE AS k_ok, TRUE AS distinct_ok,
        |  TRUE AS no_self_ok, TRUE AS range_ok, TRUE AS sorted_ok,
        |  TRUE AS recall_ok
        |FROM embeddings""".stripMargin,

    "q56_ivfpq_topk" ->
      """SELECT vec_id AS qid, TRUE AS k_ok, TRUE AS distinct_ok,
        |  TRUE AS no_self_ok, TRUE AS range_ok, TRUE AS sorted_ok,
        |  TRUE AS recall_ok
        |FROM embeddings""".stripMargin,

    "q29_ann_topk" ->
      """WITH pairs AS (
        |  SELECT q.vec_id AS qid, r.vec_id AS rid,
        |    round(list_cosine_similarity(q.embedding::DOUBLE[], r.embedding::DOUBLE[]), 6) AS cos
        |  FROM embeddings q JOIN embeddings r ON q.vec_id <> r.vec_id
        |  WHERE q.vec_id < 50),
        |ranked AS (SELECT qid, rid, cos,
        |  row_number() OVER (PARTITION BY qid ORDER BY cos DESC, rid ASC) AS rn
        |  FROM pairs)
        |SELECT qid, rid, cos, rn FROM ranked WHERE rn <= 5""".stripMargin,

    "q31_text_quality" ->
      """WITH f AS (SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_words,
        |  round(length(replace(text, ' ', '')) * 1.0 /
        |    greatest(len(string_split(text, ' ')), 1), 6) AS mean_word_len,
        |  round(len(regexp_extract_all(text, '[^\w\s]')) * 1.0 /
        |    greatest(length(text), 1), 6) AS punct_ratio,
        |  round(len(list_filter(string_split(lower(text), ' '),
        |    x -> list_contains(['the','a','of','and','to','in','is','it','that','for'], x)))
        |    * 1.0 / greatest(len(string_split(lower(text), ' ')), 1), 6) AS stopword_ratio,
        |  round(1.0 - len(list_distinct(string_split(text, ' '))) * 1.0 /
        |    greatest(len(string_split(text, ' ')), 1), 6) AS repetition
        |FROM documents)
        |SELECT doc_id, n_words, mean_word_len, punct_ratio, stopword_ratio,
        |  repetition,
        |  (n_words >= 5 AND punct_ratio < 0.1931 AND repetition < 0.5931) AS keep
        |FROM f""".stripMargin,

    "q32_langid" ->
      """WITH r AS (SELECT doc_id,
        |  len(list_filter(string_split(lower(text),' '), x -> list_contains(
        |    ['the','a','of','and','to','in','is','it','that','for'], x))) * 1.0
        |    / greatest(len(string_split(lower(text),' ')), 1) AS en,
        |  len(list_filter(string_split(lower(text),' '), x -> list_contains(
        |    ['der','die','das','und','ist','ein','nicht','mit','zu','den'], x))) * 1.0
        |    / greatest(len(string_split(lower(text),' ')), 1) AS de,
        |  len(list_filter(string_split(lower(text),' '), x -> list_contains(
        |    ['le','la','les','et','est','un','une','pas','pour','que'], x))) * 1.0
        |    / greatest(len(string_split(lower(text),' ')), 1) AS fr
        |FROM documents)
        |SELECT doc_id, CASE WHEN greatest(en, de, fr) = 0.0 THEN 'und'
        |  WHEN en >= de AND en >= fr THEN 'en'
        |  WHEN de >= fr THEN 'de' ELSE 'fr' END AS lang_pred FROM r""".stripMargin,

    "q33_token_counts" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_words,
        |  len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_tokens
        |FROM documents""".stripMargin,

    // Winnowing (Schleimer et al. 2003): k-gram md5 hashes, window-min
    // selection, distinct survivors. DuckDB list lambdas mirror the
    // Spark transform/slice/array_min pipeline exactly; md5 hex compares
    // identically in both engines.
    "q45_winnow_fp" ->
      """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(t) >= 4
        |    THEN list_transform(range(1, len(t) - 4 + 2),
        |           i -> md5(array_to_string(t[i:i+3], ' ')))
        |    ELSE [md5(text)] END AS h
        |  FROM d),
        |m AS (SELECT doc_id,
        |  list_transform(range(1, greatest(len(h) - 4 + 1, 1) + 1),
        |    i -> list_aggregate(h[i:i+3], 'min')) AS mins
        |  FROM g)
        |SELECT DISTINCT doc_id, unnest(mins) AS fp FROM m""".stripMargin,

    "q46_winnow_pairs" ->
      """WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(t) >= 4
        |    THEN list_transform(range(1, len(t) - 4 + 2),
        |           i -> md5(array_to_string(t[i:i+3], ' ')))
        |    ELSE [md5(text)] END AS h
        |  FROM d),
        |m AS (SELECT doc_id,
        |  list_transform(range(1, greatest(len(h) - 4 + 1, 1) + 1),
        |    i -> list_aggregate(h[i:i+3], 'min')) AS mins
        |  FROM g),
        |fp AS (SELECT DISTINCT doc_id, unnest(mins) AS fp FROM m)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
        |FROM fp a JOIN fp b USING (fp) WHERE a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING count(*) >= 2""".stripMargin,

    "q47_winnow_clusters" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
        |g AS (SELECT doc_id,
        |  CASE WHEN len(t) >= 4
        |    THEN list_transform(range(1, len(t) - 4 + 2),
        |           i -> md5(array_to_string(t[i:i+3], ' ')))
        |    ELSE [md5(text)] END AS h
        |  FROM d),
        |m AS (SELECT doc_id,
        |  list_transform(range(1, greatest(len(h) - 4 + 1, 1) + 1),
        |    i -> list_aggregate(h[i:i+3], 'min')) AS mins
        |  FROM g),
        |fp AS (SELECT DISTINCT doc_id, unnest(mins) AS fp FROM m),
        |pairs AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM fp a JOIN fp b USING (fp) WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2 HAVING count(*) >= 2),
        |e AS (SELECT id_a AS a, id_b AS b FROM pairs
        |      UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
        |nodes AS (SELECT DISTINCT a AS id FROM e)
        |SELECT n.id AS doc_id, least(n.id, min(r.b)) AS keep_id,
        |  least(n.id, min(r.b)) = n.id AS keep
        |FROM nodes n JOIN reach r ON r.a = n.id
        |GROUP BY n.id""".stripMargin,

    "q48_contamination" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t)-1),
        |  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM d),
        |ref AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
        |tot AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1),
        |hit AS (SELECT doc_id, count(*) AS n_hit FROM sh
        |        WHERE s IN (SELECT s FROM ref) GROUP BY 1)
        |SELECT tot.doc_id, tot.n_shingles,
        |  coalesce(hit.n_hit, 0) AS n_contaminated,
        |  round(coalesce(hit.n_hit, 0) * 1.0 / tot.n_shingles, 6) AS contamination
        |FROM tot LEFT JOIN hit ON tot.doc_id = hit.doc_id""".stripMargin,

    "q49_pii_scrub" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    text || ' contact: user' || CAST(doc_id AS VARCHAR) ||
        |      '@example.com from 10.0.' || CAST(doc_id % 256 AS VARCHAR) ||
        |      '.7 call +14155552671',
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\+\d{7,15}', '<PHONE>', 'g') AS scrubbed
        |FROM documents""".stripMargin,

    // (v+1)/2^52 with v = first 13 md5 hex digits — exact in doubles,
    // so the key arithmetic replays bit-for-bit (ln at ulp scale only).
    "q87_weighted_sample" ->
      """WITH k AS (
        |  SELECT doc_id, n_chars,
        |    ln((CAST('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 13)
        |         AS BIGINT) + 1) / 4503599627370496.0) / n_chars AS es_key
        |  FROM documents)
        |SELECT doc_id, n_chars, round(es_key, 9) AS w_key FROM k
        |ORDER BY es_key DESC, doc_id LIMIT 64""".stripMargin,

    // hexThreshold: 0.5→80000000, 0.25→40000000, 0.1→19999999
    "q50_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE md5('42:' || CAST(doc_id AS VARCHAR)) <
        |  CASE WHEN lang = 'en' THEN '80000000'
        |       WHEN lang = 'de' THEN '40000000'
        |       ELSE '19999999' END""".stripMargin,

    "q51_pack_sequences" ->
      """WITH t AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, n_tokens,
        |  CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
        |    AS start_offset
        |  FROM t)
        |SELECT doc_id, n_tokens, start_offset,
        |  CAST(start_offset // 512 AS BIGINT) AS seq_idx FROM c""".stripMargin,

    "q58_shuffle_shards" ->
      """WITH o AS (SELECT doc_id,
        |  row_number() OVER (ORDER BY md5('42:' || CAST(doc_id AS VARCHAR)),
        |    doc_id) - 1 AS pos
        |  FROM documents)
        |SELECT doc_id, pos, pos % 8 AS shard FROM o""".stripMargin,

    "q59_tfidf_topk" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term <> '' GROUP BY 1, 2),
        |dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |s AS (SELECT tf.doc_id, tf.term, tf.tf, dfq.df,
        |  tf.tf * (ln((n.n + 1.0) / (dfq.df + 1.0)) + 1) AS score
        |  FROM tf, dfq, n WHERE tf.term = dfq.term),
        |r AS (SELECT doc_id, term, tf, df, row_number() OVER
        |  (PARTITION BY doc_id ORDER BY score DESC, term) AS rank FROM s)
        |SELECT doc_id, term, tf, df, rank FROM r WHERE rank <= 5""".stripMargin,

    "q60_char_entropy" ->
      """WITH c AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents)
        |SELECT doc_id, count(DISTINCT ch) AS distinct_chars,
        |  round(entropy(ch), 6) AS entropy
        |FROM c WHERE ch <> '' GROUP BY 1""".stripMargin,

    "q61_lexical_stats" ->
      """WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tc AS (SELECT source, term, count(*) AS cnt FROM tok
        |  WHERE term <> '' GROUP BY 1, 2),
        |ps AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |  count(*) AS vocab,
        |  CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
        |  FROM tc GROUP BY 1),
        |docs AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
        |SELECT docs.source, docs.n_docs, ps.n_tokens, ps.vocab, ps.hapax,
        |  round(ps.vocab * 1.0 / ps.n_tokens, 6) AS ttr
        |FROM docs JOIN ps USING (source)""".stripMargin,

    "q71_quality_budget" ->
      """WITH q AS (SELECT doc_id, source,
        |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
        |    AS n_tokens,
        |  (CASE WHEN len(string_split(text, ' ')) < 5
        |      THEN 0.1::DOUBLE ELSE 1.0::DOUBLE END)
        |    * (1.0 - least(round(len(regexp_extract_all(text, '[^\w\s]')) * 1.0 /
        |        greatest(length(text), 1), 6) * 4, 1.0::DOUBLE) * 0.5)
        |    * (1.0 - round(1.0 - len(list_distinct(string_split(text, ' '))) * 1.0 /
        |        greatest(len(string_split(text, ' ')), 1), 6) * 0.5) AS quality
        |  FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |  CAST(sum(n_tokens) OVER (PARTITION BY source
        |    ORDER BY quality DESC, doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |    AS cum_tokens FROM q)
        |SELECT doc_id, source, n_tokens, cum_tokens,
        |  CASE WHEN source = 'src0' THEN cum_tokens <= 30000
        |       WHEN source = 'src1' THEN cum_tokens <= 8000
        |       WHEN source = 'src2' THEN cum_tokens <= 0
        |       ELSE false END AS keep
        |FROM c""".stripMargin,

    "q70_bm25_topk" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |l AS (SELECT doc_id, len(ts) AS dl FROM t),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM l),
        |tok AS (SELECT doc_id, unnest(ts) AS term FROM t),
        |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
        |  WHERE term IN ('spark', 'table', 'join') GROUP BY 1, 2),
        |dfreq AS (SELECT term, count(*) AS dfq FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id, sum(
        |    ln(1 + (stats.n - dfreq.dfq + 0.5) / (dfreq.dfq + 0.5)) *
        |    tf.tf * (1.2 + 1) /
        |    (tf.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / stats.avgdl))) AS score
        |  FROM tf JOIN dfreq USING (term) JOIN l USING (doc_id), stats
        |  GROUP BY 1)
        |SELECT doc_id, round(score, 6) AS bm25 FROM sc
        |ORDER BY bm25 DESC, doc_id LIMIT 20""".stripMargin,

    // Exact contamination counts replicated in SQL; the Bloom screen's
    // no-false-negative invariant is the literal TRUE the Spark side
    // must reproduce on every row.
    "q69_contamination_bloom" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t)-1),
        |  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM d),
        |ref AS (SELECT DISTINCT s FROM sh WHERE doc_id % 20 = 0),
        |cnt AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1),
        |hit AS (SELECT sh.doc_id, count(*) AS n_exact
        |  FROM sh JOIN ref USING (s) GROUP BY 1)
        |SELECT doc.doc_id, coalesce(cnt.n_shingles, 0) AS n_shingles,
        |  coalesce(hit.n_exact, 0) AS n_exact, TRUE AS ub_ge_exact
        |FROM documents doc
        |LEFT JOIN cnt ON cnt.doc_id = doc.doc_id
        |LEFT JOIN hit ON hit.doc_id = doc.doc_id""".stripMargin,

    // Planted-duplicate ground truth: images are doc_id % 3 = 0 (the
    // synthetic media modality rule); every planted copy must come back
    // recovered at distance 0 through the decode→aHash→bucket pipeline.
    "q72_image_dup_pairs" ->
      """SELECT doc_id AS id_a, doc_id + 1000000 AS id_b,
        |  TRUE AS recovered, 0 AS dist
        |FROM documents WHERE doc_id % 3 = 0 AND doc_id < 60""".stripMargin,

    "q68_dedup_passages" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |p AS (SELECT doc_id, CAST(i AS INT) AS pidx,
        |    array_to_string(ts[(CAST(i AS INT)*15+1):(CAST(i AS INT)*15+15)],
        |      ' ') AS passage
        |  FROM t, unnest(range(0, CAST(ceil(len(ts)/15.0) AS BIGINT))) AS u(i)),
        |k AS (SELECT doc_id, pidx, passage,
        |    count(*) OVER (PARTITION BY passage) AS n_copies,
        |    row_number() OVER (PARTITION BY passage ORDER BY doc_id, pidx) AS rn
        |  FROM p),
        |r AS (SELECT doc_id, string_agg(passage, ' ' ORDER BY pidx)
        |    AS text_deduped, count(*) AS n_kept
        |  FROM k WHERE n_copies < 2 OR rn = 1 GROUP BY 1)
        |SELECT t.doc_id, coalesce(r.text_deduped, '') AS text_deduped,
        |  CAST(ceil(len(t.ts)/15.0) AS BIGINT) AS n_passages,
        |  coalesce(r.n_kept, 0) AS n_kept
        |FROM t LEFT JOIN r USING (doc_id)""".stripMargin,

    "q67_length_quantiles" ->
      """WITH t AS (SELECT source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n FROM documents)
        |SELECT source, count(*) AS n_docs,
        |  round(quantile_cont(n, 0.5), 6) AS p50,
        |  round(quantile_cont(n, 0.9), 6) AS p90,
        |  round(quantile_cont(n, 0.99), 6) AS p99
        |FROM t GROUP BY 1""".stripMargin,

    "q66_vocab_encode" ->
      """WITH d AS (SELECT doc_id,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS ts
        |  FROM documents),
        |p AS (SELECT doc_id, unnest(list_transform(range(1, len(ts) + 1),
        |    i -> {'pos': i, 'term': ts[i]}), recursive := true) FROM d),
        |tf AS (SELECT term, count(*) AS cnt FROM p GROUP BY 1),
        |v AS (SELECT term, row_number() OVER (ORDER BY cnt DESC, term)
        |    AS token_id FROM tf ORDER BY cnt DESC, term LIMIT 20)
        |SELECT p.doc_id, p.pos, coalesce(v.token_id, 0) AS token_id
        |FROM p LEFT JOIN v USING (term)""".stripMargin,

    "q65_dsir_weights" ->
      """WITH d AS (SELECT doc_id, source,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS ts
        |  FROM documents),
        |g AS (SELECT doc_id, source, unnest(list_concat(ts,
        |    list_transform(range(1, len(ts)),
        |      i -> ts[i] || ' ' || ts[i + 1]))) AS gram FROM d),
        |bkt AS (SELECT doc_id, source,
        |  CAST(concat('0x', substr(md5(gram), 1, 8)) AS UBIGINT) % 1024
        |    AS b FROM g),
        |db AS (SELECT doc_id, b, count(*) AS c FROM bkt GROUP BY 1, 2),
        |dist AS (SELECT b, count(*) AS r,
        |  sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS t
        |  FROM bkt GROUP BY 1),
        |tot AS (SELECT sum(r) AS sum_r, sum(t) AS sum_t FROM dist),
        |s AS (SELECT b, ln((t + 1.0) / (sum_t + 1.0 * 1024)) -
        |  ln((r + 1.0) / (sum_r + 1.0 * 1024)) AS llr FROM dist, tot)
        |SELECT db.doc_id, CAST(sum(db.c) AS BIGINT) AS n_grams,
        |  round(sum(db.c * s.llr), 6) AS log_weight
        |FROM db JOIN s USING (b) GROUP BY 1""".stripMargin,

    "q64_unigram_nll" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, count(*) AS c FROM tok
        |  WHERE term <> '' GROUP BY 1, 2),
        |gf AS (SELECT term, sum(c) AS g FROM tf GROUP BY 1),
        |tot AS (SELECT sum(g) AS t FROM gf)
        |SELECT tf.doc_id, CAST(sum(tf.c) AS BIGINT) AS n_tokens,
        |  round(-sum(tf.c * ln(gf.g / tot.t)) / sum(tf.c), 6) AS avg_nll
        |FROM tf JOIN gf USING (term), tot GROUP BY 1""".stripMargin,

    "q63_mixture_sample" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |b(source, budget) AS (VALUES ('src0', 700), ('src1', 3000),
        |  ('src2', 400), ('src3', 900)),
        |s AS (SELECT source, sum(n_tokens) AS src_tokens FROM t GROUP BY 1),
        |r AS (SELECT b.source,
        |  least(1.0, CAST(b.budget AS DOUBLE) / CAST(s.src_tokens AS DOUBLE))
        |    AS rate
        |  FROM b JOIN s USING (source)),
        |rt AS (SELECT source, rate, CASE WHEN rate >= 1.0 THEN 'g'
        |  ELSE printf('%08x', CAST(floor(rate * 4294967296.0) AS BIGINT))
        |  END AS thr FROM r)
        |SELECT t.doc_id, t.source, t.n_tokens, rt.rate
        |FROM t JOIN rt USING (source)
        |WHERE md5('42:' || CAST(t.doc_id AS VARCHAR)) < rt.thr""".stripMargin,

    "q57_ngram_repetition" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |tot AS (SELECT doc_id, greatest(len(t) - 1, 0) AS n_ngrams FROM d),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(t)),
        |  i -> t[i] || ' ' || t[i+1])) AS g FROM d WHERE len(t) >= 2),
        |c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY 1, 2),
        |agg AS (SELECT doc_id, max(c) AS top_ngram_n,
        |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS dup_ngram_n
        |  FROM c GROUP BY 1)
        |SELECT tot.doc_id, tot.n_ngrams,
        |  coalesce(agg.top_ngram_n, 0) AS top_ngram_n,
        |  coalesce(agg.dup_ngram_n, 0) AS dup_ngram_n,
        |  CASE WHEN tot.n_ngrams > 0 THEN
        |    round(coalesce(agg.top_ngram_n, 0) * 1.0 / tot.n_ngrams, 6)
        |  ELSE 0.0 END AS top_ngram_frac,
        |  CASE WHEN tot.n_ngrams > 0 THEN
        |    round(coalesce(agg.dup_ngram_n, 0) * 1.0 / tot.n_ngrams, 6)
        |  ELSE 0.0 END AS dup_ngram_frac
        |FROM tot LEFT JOIN agg USING (doc_id)""".stripMargin,

    // The q26 brute posting-list join with the overlap count carried —
    // the prefix-filtered Spark plan must reproduce it EXACTLY (the
    // filter is lossless), so this row is both an oracle and a proof.
    "q96_setsim_join" ->
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t)-1),
        |  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM d),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |  FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
        |SELECT id_a, id_b, c AS n_common,
        |  round(c * 1.0 / (na.n + nb.n - c), 6) AS jaccard
        |FROM inter JOIN sz na ON na.doc_id = id_a JOIN sz nb ON nb.doc_id = id_b
        |WHERE c * 1.0 / (na.n + nb.n - c) >= 0.5""".stripMargin,

    // The Misra–Gries guarantees are theorems, so the oracle states the
    // exact-side facts (total tokens, how many terms exceed n/(k+1))
    // and TRUE for both invariant booleans; a sketch bug that broke
    // either bound would flip a boolean and fail the hash compare.
    "q98_heavy_hitters" ->
      """WITH t AS (
        |  SELECT tok AS term FROM (
        |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
        |  WHERE length(tok) > 0),
        |n AS (SELECT count(*) AS n_total FROM t)
        |SELECT n.n_total,
        |  (SELECT count(*) FROM (SELECT term, count(*) AS c FROM t GROUP BY 1)
        |   WHERE c > n.n_total / 65.0) AS n_heavy,
        |  true AS all_heavy_found, true AS bounds_ok
        |FROM n""".stripMargin,

    "q38_cosine_pairs" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) >= 0.35""".stripMargin,

    // q44's recursive-CTE closure + q31's quality components composed
    // into the survivor selection: same cluster labels, same rounded
    // quality formula (round-then-multiply order mirrors the Spark
    // column expression so the doubles are bit-identical).
    "q53_dedup_keep" ->
      """WITH RECURSIVE
        |d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT DISTINCT doc_id, unnest(list_transform(range(1, len(t)-1),
        |  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM d),
        |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
        |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        |  FROM sh a JOIN sh b USING (s) WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM inter JOIN sz na ON na.doc_id = id_a JOIN sz nb ON nb.doc_id = id_b
        |  WHERE c * 1.0 / (na.n + nb.n - c) >= 0.10),
        |e AS (SELECT id_a AS a, id_b AS b FROM pairs
        |      UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT a, b FROM e
        |  UNION
        |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
        |clusters AS (
        |  SELECT a AS doc_id, least(a, min(b)) AS keep_id FROM reach GROUP BY a),
        |q AS (SELECT doc_id,
        |  (CASE WHEN len(string_split(text, ' ')) < 5
        |      THEN 0.1::DOUBLE ELSE 1.0::DOUBLE END)
        |    * (1.0 - least(round(len(regexp_extract_all(text, '[^\w\s]')) * 1.0 /
        |        greatest(length(text), 1), 6) * 4, 1.0::DOUBLE) * 0.5)
        |    * (1.0 - round(1.0 - len(list_distinct(string_split(text, ' '))) * 1.0 /
        |        greatest(len(string_split(text, ' ')), 1), 6) * 0.5) AS quality
        |  FROM documents),
        |lab AS (SELECT q.doc_id, coalesce(c.keep_id, q.doc_id) AS cluster_id,
        |  q.quality FROM q LEFT JOIN clusters c ON c.doc_id = q.doc_id)
        |SELECT doc_id, cluster_id, quality,
        |  row_number() OVER (PARTITION BY cluster_id
        |    ORDER BY quality DESC, doc_id ASC) = 1 AS keep
        |FROM lab""".stripMargin,

    "q73_top_ngrams" ->
      """WITH d AS (SELECT doc_id,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS ts FROM documents),
        |g AS (SELECT doc_id, unnest(list_transform(range(1, len(ts)),
        |  i -> ts[i] || ' ' || ts[i + 1])) AS gram FROM d WHERE len(ts) >= 2)
        |SELECT gram, count(*) AS cnt, count(DISTINCT doc_id) AS n_docs
        |FROM g GROUP BY 1 ORDER BY cnt DESC, gram LIMIT 25""".stripMargin,

    // Same expression SHAPE as the Spark side so every division is the
    // identical correctly-rounded IEEE op; ln + round(,6) is the q64
    // discipline; the ORDER BY uses the unrounded value with the word
    // tiebreak (bit-equal doubles on equal count triples).
    "q74_pmi_collocations" ->
      """WITH d AS (SELECT
        |  list_filter(string_split(text, ' '), x -> x <> '') AS ts FROM documents),
        |tot AS (SELECT CAST(sum(len(ts)) AS BIGINT) AS n_uni,
        |  CAST(sum(greatest(len(ts) - 1, 0)) AS BIGINT) AS n_bi FROM d),
        |uc AS (SELECT w, count(*) AS c
        |  FROM (SELECT unnest(ts) AS w FROM d) GROUP BY 1),
        |bg AS (SELECT ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT ts, unnest(range(1, len(ts))) AS i FROM d
        |        WHERE len(ts) >= 2)),
        |bc AS (SELECT w1, w2, count(*) AS pair_n FROM bg GROUP BY 1, 2
        |  HAVING count(*) >= 5),
        |j AS (SELECT w1, w2, pair_n, a.c AS left_n, b.c AS right_n,
        |  ln((pair_n * 1.0 / n_bi) /
        |     ((a.c * 1.0 / n_uni) * (b.c * 1.0 / n_uni))) AS p
        |  FROM bc JOIN uc a ON a.w = bc.w1 JOIN uc b ON b.w = bc.w2, tot)
        |SELECT w1, w2, pair_n, left_n, right_n, round(p, 6) AS pmi
        |FROM j ORDER BY p DESC, w1, w2 LIMIT 25""".stripMargin,

    "q75_zipf_fit" ->
      """WITH tf AS (SELECT term, count(*) AS cnt FROM (
        |    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> ''))
        |      AS term FROM documents)
        |  GROUP BY 1 ORDER BY cnt DESC, term LIMIT 100),
        |rk AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS r
        |  FROM tf),
        |s AS (SELECT CAST(count(*) AS BIGINT) AS n_terms,
        |  sum(ln(r)) AS sx, sum(ln(cnt)) AS sy,
        |  sum(ln(r) * ln(r)) AS sxx, sum(ln(r) * ln(cnt)) AS sxy FROM rk),
        |sl AS (SELECT n_terms, sx, sy,
        |  (sxy - sx * sy / n_terms) / (sxx - sx * sx / n_terms) AS slope_raw
        |  FROM s)
        |SELECT n_terms, round(slope_raw, 6) AS slope,
        |  round((sy - slope_raw * sx) / n_terms, 6) AS intercept FROM sl""".stripMargin,

    "q76_length_outliers" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
        |    AS BIGINT) AS n_tokens FROM documents),
        |m AS (SELECT source, median(n_tokens) AS med FROM t GROUP BY 1),
        |d AS (SELECT t.doc_id, t.source, t.n_tokens, m.med,
        |  abs(t.n_tokens - m.med) AS dev FROM t JOIN m USING (source)),
        |md AS (SELECT source, median(dev) AS mad FROM d GROUP BY 1),
        |j AS (SELECT d.doc_id, d.source, d.n_tokens, d.med, md.mad,
        |  CASE WHEN md.mad > 0.0 THEN
        |    round((d.n_tokens - d.med) / (1.4826 * md.mad), 6) END AS z
        |  FROM d JOIN md USING (source))
        |SELECT doc_id, source, n_tokens, med, mad, z,
        |  coalesce(abs(z) > 3.0, false) AS is_outlier FROM j""".stripMargin,

    // Identical division/ln tree shape as the Spark side (the q64
    // discipline); contexts are plain unigram counts, V the unigram
    // vocabulary, α = 0.1 the same literal in both engines.
    "q78_bigram_nll" ->
      """WITH d AS (SELECT doc_id,
        |  list_filter(string_split(text, ' '), x -> x <> '') AS ts FROM documents),
        |bg AS (SELECT doc_id, ts[i] AS w1, ts[i + 1] AS w2
        |  FROM (SELECT doc_id, ts, unnest(range(1, len(ts))) AS i FROM d
        |        WHERE len(ts) >= 2)),
        |db AS (SELECT doc_id, w1, w2, count(*) AS c FROM bg GROUP BY 1, 2, 3),
        |cb AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
        |cu AS (SELECT w1, count(*) AS c1
        |  FROM (SELECT unnest(ts) AS w1 FROM d) GROUP BY 1),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS vsz FROM cu)
        |SELECT db.doc_id, CAST(sum(db.c) AS BIGINT) AS n_bigrams,
        |  round(-sum(db.c * ln((cb.c12 + 0.1) / (cu.c1 + 0.1 * v.vsz)))
        |    / sum(db.c), 6) AS avg_nll
        |FROM db JOIN cb USING (w1, w2) JOIN cu USING (w1), v
        |GROUP BY 1""".stripMargin
  )
}
