package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The canonical corpus-curation pipeline as ONE composition — the
  * batch counterpart of the streaming ingest chain
  * ([[graft.streaming.DocsStream]]: rules → classifier → exact dedup →
  * near-dup), wired from the individually-oracled operators so every
  * stage's semantics are already in the driver's hash gate (q31 rules,
  * q178 classifier contract, q24 exact dedup, q175 near-dup pairs, q44
  * clusters, q196 leakage-safe splits). What a user runs when they
  * want "curate this corpus" rather than twelve operator calls.
  *
  * Stages, in the order production pipelines run them (cheap narrow
  * gates first so expensive joins see fewer rows):
  *
  *  1. RULE GATE — [[TextAnalysis.keepDecision]] (q31's thresholds);
  *  2. MODEL GATE — [[QualityClassifier.fit]] distills the rule labels
  *     into a score on the PRE-gate corpus, then keeps survivors with
  *     score ≥ `minScore` (rules label, the classifier generalizes —
  *     the GPT-3/CCNet setup);
  *  3. EXACT DEDUP — [[Dedup.exact]]'s min-id keep per distinct text;
  *  4. NEAR-DUP — [[Dedup.minhashLsh]] pairs on the survivors,
  *     [[Dedup.dupClusters]] min-id resolution;
  *  5. SPLITS — [[TextAnalysis.leakageSafeSplits]] keyed on the SAME
  *     pair graph, so near-dup survivors and their (dropped) cluster
  *     mates share a split and nothing leaks across train/test.
  *
  * Returns (curated, audit): `curated` = the surviving rows of `docs`
  * plus (score, group_id, split); `audit` = EVERY input row with its
  * per-stage booleans (rule_keep, model_keep, exact_keep, neardup_keep,
  * kept) — the reject path stays auditable, the qualityGateOnIngest
  * posture. Stage costs: two narrow scans, one GD training loop (one
  * aggregate job per iteration), one text-keyed aggregate, one banded
  * LSH join on gated survivors, CC over the O(dups) pair list.
  */
object Curate {

  /** `scorer = Some(...)` runs the model gate with a FROZEN pre-trained
    * scorer instead of training on `docs` — the streaming twin's
    * posture ([[graft.streaming.CurateStream]]), letting spec/parity
    * runs feed the identical model to both routes. `verify = "sig"`
    * selects signature-estimated near-dup verification (the only mode
    * a signature-resident stream index can afford); "exact" (default)
    * re-shingles. */
  def corpus(spark: SparkSession, docs: DataFrame,
             minScore: Double = 0.5, n: Int = 3, k: Int = 64,
             bands: Int = 16, threshold: Double = 0.5,
             pTrain: Double = 0.8, pVal: Double = 0.1,
             idCol: String = "doc_id",
             textCol: String = "text",
             scorer: Option[QualityClassifier.TextScorer] = None,
             verify: String = "exact"): (DataFrame, DataFrame) = {
    // 1+2: rule gate labels, classifier distills them, model gate cuts
    val theScorer = scorer.getOrElse(
      QualityClassifier.fit(docs, col("keep"), textCol))
    val scored = QualityClassifier.scoreText(docs, theScorer, textCol)
      .select(col(idCol), col("keep").as("rule_keep"),
        round(col("score"), 6).as("score"))
      .withColumn("model_keep", col("score") >= minScore)
    val gated = docs.join(
      scored.filter(col("rule_keep") && col("model_keep")).select(idCol),
      Seq(idCol), "left_semi")
    // 3: exact dedup on the gated survivors
    val exactKeep = Dedup.exact(gated, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val exacted = gated.join(exactKeep, Seq(idCol), "left_semi")
    // 4: near-dup pairs + min-id cluster resolution
    val pairs = Dedup.minhashLsh(exacted, n, k, bands, threshold,
      idCol, textCol, verify = verify)
    val clusters = Dedup.dupClusters(spark, pairs.select("id_a", "id_b"))
    val nearKeep = exacted.select(col(idCol))
      .join(clusters.filter(!col("keep"))
        .select(col("doc_id").as(idCol)), Seq(idCol), "left_anti")
    // 5: leakage-safe splits on the SAME pair graph
    val splits = TextAnalysis.leakageSafeSplits(spark, exacted,
      pairs.select("id_a", "id_b"), pTrain, pVal, idCol)
    val curated = docs
      .join(nearKeep, Seq(idCol), "left_semi")
      .join(scored.select(col(idCol), col("score")), Seq(idCol))
      .join(splits.withColumnRenamed("doc_id", idCol), Seq(idCol))
    val audit = docs.select(col(idCol))
      .join(scored, Seq(idCol), "left")
      .join(exactKeep.withColumn("_ek", lit(true)), Seq(idCol), "left")
      .join(nearKeep.withColumn("_nk", lit(true)), Seq(idCol), "left")
      .select(col(idCol), col("rule_keep"), col("model_keep"),
        col("score"),
        // exact/near flags are only defined for docs that reached the
        // stage; upstream rejects carry false (they were never kept)
        coalesce(col("_ek"), lit(false)).as("exact_keep"),
        coalesce(col("_nk"), lit(false)).as("neardup_keep"))
      .withColumn("kept", col("neardup_keep"))
    (curated, audit)
  }
}
