package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ingest surface for document corpora: exact dedup at
  * ingest time — the streaming twin of [[graft.pipeline.Dedup.exact]],
  * and the shape a training-data pipeline actually runs dedup in
  * (filter duplicates as shards arrive, not in a nightly batch).
  *
  * The state key is md5(text) (16 bytes/doc, never raw text), and
  * `dropDuplicatesWithinWatermark` bounds the state store by the
  * watermark delay: a duplicate arriving within `watermark` of the
  * original is dropped; state for older fingerprints is evicted. That
  * eviction is the 100 TB design point — unbounded `dropDuplicates`
  * state on a corpus-scale stream grows forever, while watermark-scoped
  * state holds only the ingest window. Cross-window dedup composes with
  * the batch operator over the accumulated corpus.
  */
object DocsStream {

  /** documents schema plus an ingest-time column, as a file stream
    * reads it. */
  val rawSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ingest_ts", TimestampType)))

  /** Keep the first-arriving copy of each distinct text within the
    * watermark window. Streaming-only by Spark's contract —
    * `dropDuplicatesWithinWatermark` rejects batch inputs; the batch
    * equivalent over an accumulated corpus is
    * [[graft.pipeline.Dedup.exact]] (q24's oracle-checked operator,
    * which PipelineSpec asserts this stream agrees with). */
  def dedupOnIngest(docs: DataFrame, watermark: String = "2 hours"): DataFrame =
    docs.withColumn("fp", md5(col("text")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("fp")

  /** Decontamination at ingest: per arriving document, the fraction of
    * its n-gram shingles found in the (static, driver-collected)
    * reference/eval shingle set — the streaming twin of
    * [[graft.pipeline.Dedup.contamination]], evaluated STATELESS so the
    * same transform serves batch and readStream with no watermark or
    * state store.
    *
    * The eval set is collected once and broadcast: eval corpora are
    * small by construction (they are benchmarks), and a broadcast set
    * membership per shingle beats a stream-static join that would
    * re-shuffle every micro-batch. `maxRefShingles` guards the collect
    * with a loud failure, same contract idiom as cosinePairs. Output
    * adds (n_shingles, n_contaminated, contamination); docs shorter
    * than n tokens carry 0 shingles and NaN contamination. */
  def contaminationOnIngest(docs: DataFrame, ref: DataFrame, n: Int = 3,
                            textCol: String = "text",
                            maxRefShingles: Long = 10000000L): DataFrame = {
    import graft.pipeline.Dedup
    val spark = docs.sparkSession
    import spark.implicits._
    val refSh = ref.select(explode(Dedup.shingles(col(textCol), n)).as("s"))
      .distinct().as[String].limit(
        math.min(maxRefShingles, Int.MaxValue - 1L).toInt + 1).collect()
    require(refSh.length <= maxRefShingles,
      s"reference corpus exceeds $maxRefShingles distinct shingles — " +
        "decontamination-on-ingest broadcasts the eval set; for " +
        "corpus-sized references use the batch Dedup.contamination join")
    val bc = spark.sparkContext.broadcast(refSh.toSet)
    val hitCount = udf { (shingles: Seq[String]) =>
      val set = bc.value
      shingles.count(set.contains)
    }
    docs.withColumn("_sh", Dedup.shingles(col(textCol), n))
      .withColumn("n_shingles", size(col("_sh")).cast("long"))
      .withColumn("n_contaminated", hitCount(col("_sh")).cast("long"))
      .withColumn("contamination",
        when(col("n_shingles") > 0,
          round(col("n_contaminated").cast("double") / col("n_shingles"), 6))
          .otherwise(lit(Double.NaN)))
      .drop("_sh")
  }

  /** Span-level eval-set decontamination on ingest — the REMOVAL twin
    * of [[contaminationOnIngest]]'s measurement and the streaming twin
    * of [[graft.pipeline.Dedup.decontaminateSpans]]: any ≥L-token span
    * of an arriving document found verbatim in the (static, broadcast)
    * eval corpus is cut before the document lands. The edit is
    * ROW-LOCAL (each doc's grams checked against the broadcast set,
    * coverage union, rebuild — one compiled function per row, no join,
    * no state store), so the same transform serves batch and
    * readStream and throughput scales with input partitions; the batch
    * operator's gram-keyed join form is the right geometry only when
    * the eval set is itself corpus-sized. `maxEvalGrams` guards the
    * collect with a loud failure (the contaminationOnIngest contract).
    * PipelineSpec pins row-for-row equality with the batch operator. */
  def decontaminateOnIngest(docs: DataFrame, ref: DataFrame, L: Int = 8,
                            textCol: String = "text",
                            maxEvalGrams: Long = 10000000L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ets = split(col(textCol), " ")
    val grams = ref.filter(size(ets) >= L)
      .select(explode(transform(sequence(lit(0), size(ets) - L),
        i => concat_ws(" ", slice(ets, i + 1, lit(L))))).as("g"))
      .distinct().as[String]
      .limit(math.min(maxEvalGrams, Int.MaxValue - 1L).toInt + 1).collect()
    require(grams.length <= maxEvalGrams,
      s"reference corpus exceeds $maxEvalGrams distinct $L-grams — " +
        "decontamination-on-ingest broadcasts the eval gram set; for " +
        "corpus-sized references use the batch Dedup.decontaminateSpans join")
    val bc = spark.sparkContext.broadcast(grams.toSet)
    val clean = udf { (text: String) =>
      val ts = text.split(" ", -1)
      if (ts.length < L) (ts.length.toLong, 0L, text)
      else {
        val set = bc.value
        val covered = new Array[Boolean](ts.length)
        var i = 0
        while (i + L <= ts.length) {
          if (set.contains(ts.slice(i, i + L).mkString(" "))) {
            var j = i
            while (j < i + L) { covered(j) = true; j += 1 }
          }
          i += 1
        }
        val kept = ts.indices.filterNot(covered).map(ts)
        (ts.length.toLong, (ts.length - kept.length).toLong,
          kept.mkString(" "))
      }
    }
    docs.withColumn("_c", clean(col(textCol)))
      .withColumn("n_tokens", col("_c._1"))
      .withColumn("n_removed", col("_c._2"))
      .withColumn("cleaned", col("_c._3"))
      .drop("_c")
  }

  /** Passage-level dedup on ingest: the streaming twin of
    * [[graft.pipeline.Dedup.dedupPassages]] (q68). Documents are
    * exploded into fixed `window`-token passages as they arrive and a
    * passage whose exact text was already seen within the watermark is
    * dropped — emitting the surviving (doc_id, pidx, passage) CHUNK
    * stream, which is what the trainer-facing side of a pipeline
    * consumes (sequence packing operates on chunks, not documents).
    *
    * State is md5(passage) — 16 bytes per distinct passage in the
    * ingest window, evicted by the watermark; raw text never enters
    * the state store. First-arriving copy wins (micro-batch order);
    * the batch operator's min-(doc,pos) rule agrees whenever ingest
    * order follows doc order — the PipelineSpec twin test pins that
    * agreement, and cross-window dedup composes with the batch pass
    * over the accumulated corpus exactly as [[dedupOnIngest]] does. */
  def passageFilterOnIngest(docs: DataFrame, window: Int = 15,
                            watermark: String = "2 hours"): DataFrame = {
    val toks = split(col("text"), " ")
    val nPass = ((size(toks) + window - 1) / window).cast("int")
    val idxs = when(nPass > 0, sequence(lit(0), nPass - 1))
      .otherwise(array().cast("array<int>"))
    docs.select(col("doc_id"), col("ingest_ts"),
        posexplode(transform(idxs,
          i => concat_ws(" ", slice(toks, i * window + 1, lit(window))))))
      .select(col("doc_id"), col("ingest_ts"),
        col("pos").as("pidx"), col("col").as("passage"),
        md5(col("col")).as("fp"))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
      .drop("fp")
  }

  /** The full ingest-time quality gate a training pipeline runs as
    * shards arrive: PII scrub → quality features → keep/drop decision
    * → language ID — the streaming composition of the oracle-checked
    * batch operators (q49's [[graft.pipeline.TextAnalysis.scrubPii]],
    * q31's [[graft.pipeline.TextAnalysis.keepDecision]], q32's
    * [[graft.pipeline.TextAnalysis.languageId]]).
    *
    * Every stage is a stateless narrow map (regexp chains, array
    * expressions), so the SAME plan serves batch and readStream with
    * no watermark, no state store, and no shuffle: at 100 TB/day this
    * is a pure scan pipeline whose throughput scales with input
    * partitions. Docs are scrubbed FIRST so the quality features and
    * the kept text never see raw PII — placeholder tokens count as
    * ordinary words downstream, matching the batch semantics of
    * running q31 on scrubbed text.
    *
    * Emits every input row with (text scrubbed, quality feature
    * columns, keep, lang_pred): the caller filters on `keep` for the
    * training stream and routes the complement to a reject store —
    * emitting the decision rather than pre-filtering keeps the reject
    * path auditable. */
  def qualityGateOnIngest(docs: DataFrame,
                          textCol: String = "text"): DataFrame = {
    import graft.pipeline.TextAnalysis
    val scrubbed = docs.withColumn(textCol,
      TextAnalysis.scrubPii(col(textCol)))
    TextAnalysis.keepDecision(scrubbed, textCol)
      .withColumn("lang_pred", TextAnalysis.languageId(col(textCol)))
  }

  /** Model-based quality scoring on ingest — the classifier stage of
    * the canonical chain (rules → classifier → exact dedup → near-dup
    * gate), completing it as streaming surface: [[qualityGateOnIngest]]
    * is the rule gate, this is the GPT-3/CCNet-style model gate, and
    * [[dedupOnIngest]] / [[graft.streaming.NearDupStream]] are the two
    * dedup rungs. The scorer is FROZEN at train time
    * ([[graft.pipeline.QualityClassifier.fit]] bundles standardization
    * stats + weights): scoring is a stateless narrow map (features,
    * frozen-stat standardization, sigmoid — all column expressions),
    * so the same plan serves batch and readStream with no aggregate,
    * no state store, no shuffle — at 100 TB/day a pure scan whose
    * throughput scales with input partitions. PipelineSpec asserts
    * stream ≡ batch on a scored fixture. */
  def classifierScoreOnIngest(docs: DataFrame,
                              scorer: graft.pipeline.QualityClassifier.TextScorer,
                              textCol: String = "text"): DataFrame =
    graft.pipeline.QualityClassifier.scoreText(docs, scorer, textCol)

  /** Split-routing on ingest: every arriving document gets its
    * deterministic train/val/test label ([[graft.pipeline.TextAnalysis
    * .splitAssign]]'s md5 bucketing) the moment it lands — the
    * pattern that lets a live ingest write three output streams whose
    * membership is identical to what the nightly batch job (q143)
    * would assign, because the hash depends only on the id. Stateless
    * narrow map: one plan serves batch and readStream, no state store,
    * no shuffle. */
  def splitOnIngest(docs: DataFrame, pTrain: Double = 0.8,
                    pVal: Double = 0.1): DataFrame =
    docs.withColumn("split",
      graft.pipeline.TextAnalysis.splitLabel(col("doc_id"), pTrain, pVal))

  /** Windowed trending-term counts over the ingest stream — the live
    * twin of [[graft.pipeline.TextAnalysis.topKNgrams]]'s n=1 case: a
    * curator watches which terms surge per ingest window (a scraping
    * loop stuck on one site, an injection campaign, a boilerplate
    * burst) instead of discovering it in the nightly batch audit.
    *
    * One transform serves batch and readStream: explode terms →
    * watermarked tumbling-window count, `cnt >= minCount` pruning the
    * hapax tail AFTER the aggregate (allowed in append mode). State is
    * one counter per (window, term) inside the watermark horizon —
    * bounded by the active vocabulary, not the corpus — and each
    * micro-batch partial-aggregates map-side before touching it. The
    * global "top k per window" cut is the CONSUMER's one-window sort
    * (mid-stream window functions are not allowed); this emits the
    * pruned counts a dashboard or alerter ranks. */
  def trendingTerms(docs: DataFrame, windowDur: String = "1 hour",
                    watermark: String = "2 hours",
                    minCount: Long = 2L): DataFrame =
    docs.select(col("ingest_ts"),
        explode(filter(split(col("text"), " "), w => length(w) > 0)).as("term"))
      .withWatermark("ingest_ts", watermark)
      .groupBy(window(col("ingest_ts"), windowDur).as("w"), col("term"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(col("w.start").as("window_start"), col("term"), col("cnt"))
}
