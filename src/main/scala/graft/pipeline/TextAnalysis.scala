package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting, quality
  * scoring, language ID, fingerprinting. Pure column expressions —
  * everything stays in whole-stage codegen, no UDFs.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def wordCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish token count: word pieces and punctuation as separate
    * tokens (`\w+|[^\w\s]`) — the standard pre-tokenizer regex. */
  def tokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0)))

  private val stopEn = Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")
  private val stopDe = Seq("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "zu", "den")
  private val stopFr = Seq("le", "la", "les", "et", "est", "un", "une", "pas", "pour", "que")

  private def hitRatio(toks: Column, words: Seq[String]): Column =
    size(filter(toks, w => words.map(s => w === lit(s)).reduce(_ || _))) /
      greatest(size(toks), lit(1)).cast("double")

  /** N-gram-heuristic language ID over stopword hit ratios; returns the
    * argmax language code, 'und' (undetermined) when nothing hits. */
  def languageId(text: Column): Column = {
    val toks = split(lower(text), " ")
    val en = hitRatio(toks, stopEn)
    val de = hitRatio(toks, stopDe)
    val fr = hitRatio(toks, stopFr)
    when(greatest(en, de, fr) === 0.0, lit("und"))
      .when(en >= de && en >= fr, lit("en"))
      .when(de >= fr, lit("de"))
      .otherwise(lit("fr"))
  }

  /** Quality features: length, words, mean word length, punctuation
    * ratio, stopword ratio, repetition (1 - distinct/total tokens). */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = split(t, " ")
    df.withColumn("n_chars_m", length(t))
      .withColumn("n_words", size(toks))
      .withColumn("mean_word_len",
        round(length(regexp_replace(t, " ", "")) / greatest(size(toks), lit(1)).cast("double"), 6))
      .withColumn("punct_ratio",
        round(size(regexp_extract_all(t, lit("[^\\w\\s]"), lit(0))) /
          greatest(length(t), lit(1)).cast("double"), 6))
      .withColumn("stopword_ratio", round(hitRatio(split(lower(t), " "), stopEn), 6))
      .withColumn("repetition",
        round(lit(1.0) - size(array_distinct(toks)) /
          greatest(size(toks), lit(1)).cast("double"), 6))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs with low
    * repetition and sane punctuation — the usual heuristic filter. */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame =
    qualityFeatures(df, textCol).withColumn("quality",
      round(
        when(col("n_words") < 5, 0.1).otherwise(1.0) *
          (lit(1.0) - least(col("punct_ratio") * 4, lit(1.0)) * 0.5) *
          (lit(1.0) - col("repetition") * 0.5), 6))

  /** Keep/drop filter decision. Thresholds are deliberately NOT round
    * rationals (1931/10⁴, 5931/10⁴): the feature ratios have small-int
    * denominators, so equality with a threshold — the one case where
    * engines could diverge on an exact boundary — is impossible, making
    * the boolean bit-stable across engines (unlike a rounded composite
    * score, whose half-way ties flip on rounding mode). */
  def keepDecision(df: DataFrame, textCol: String = "text"): DataFrame =
    qualityFeatures(df, textCol).withColumn("keep",
      col("n_words") >= 5 && col("punct_ratio") < 0.1931 &&
        col("repetition") < 0.5931)
}
