package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram-language-model subword tokenizer (Kudo 2018,
  * arXiv:1804.10959 — the SentencePiece unigram algorithm): the second
  * tokenizer family beside [[Bpe]]. Where BPE composes greedily from
  * characters upward, the unigram model starts from a LARGE seed
  * vocabulary of substrings and PRUNES it under a probabilistic
  * criterion, segmenting by maximum-likelihood Viterbi — the shape used
  * by T5/ALBERT/XLNet vocabularies.
  *
  * Division of labor mirrors [[Bpe]] (and production practice):
  * TRAINING runs driver-side over the bounded top-`maxWords`
  * word-frequency table (the corpus collapses to ≤ maxWords rows before
  * anything iterative happens), ENCODING is distributed — the scored
  * vocabulary broadcasts and every document is a narrow map running the
  * per-word Viterbi DP (genuinely imperative per-row logic, the
  * documented UDF case).
  *
  * Simplification vs the paper, stated: the E-step uses VITERBI counts
  * (hard assignment) rather than full forward–backward expectations,
  * and pruning drops lowest-count multi-char pieces directly instead of
  * ranking by likelihood loss. Both keep the estimator consistent on
  * the dominant segmentations and keep the trainer a pure
  * deterministic fold: ties everywhere break on (count DESC, piece
  * ASC), Viterbi prefers the LONGEST piece at equal score, and single
  * characters are never pruned (coverage guarantee — any word always
  * segments; characters unseen in training score `unkScore` per char).
  *
  * No SQL analog (the EM loop and DP are inherently iterative) →
  * invariant oracle (q161, the q79 pattern): n_words replayed exactly,
  * piece-count bounds, and the lossless roundtrip as hash-checked
  * booleans.
  */
object Unigram {

  /** Score used for a single character absent from the vocabulary —
    * low enough that any in-vocab segmentation wins, finite so every
    * word still segments. */
  val unkScore: Double = -20.0

  /** A trained model: piece → log probability. */
  type Model = Map[String, Double]

  /** Learn a `vocabSize`-piece unigram model. Seed = the `seedSize`
    * most frequent substrings (≤ `maxPieceLen` chars) of the top
    * `maxWords` words plus ALL single characters; then `emRounds` of
    * Viterbi-EM with pruning to `vocabSize`. */
  def train(df: DataFrame, vocabSize: Int, maxWords: Int = 50000,
            maxPieceLen: Int = 6, seedSize: Int = 20000, emRounds: Int = 3,
            textCol: String = "text"): Model = {
    require(vocabSize >= 1 && maxPieceLen >= 1 && emRounds >= 1,
      s"bad unigram params: vocab=$vocabSize len=$maxPieceLen em=$emRounds")
    val wc = df
      .select(explode(filter(split(col(textCol), " "), w => length(w) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    // seed substring counts (each occurrence weighted by word count)
    val sub = scala.collection.mutable.HashMap.empty[String, Long]
    wc.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= math.min(maxPieceLen, w.length - i)) {
          val p = w.substring(i, i + l)
          sub.update(p, sub.getOrElse(p, 0L) + c)
          l += 1
        }
        i += 1
      }
    }
    val chars = sub.keysIterator.filter(_.length == 1).toSet
    def toModel(counts: Iterable[(String, Long)], keep: Int): Model = {
      val kept = counts.toSeq.sortBy { case (p, c) => (-c, p) }
        .filter(_._1.length > 1).take(math.max(keep - chars.size, 0))
        .map(_._1).toSet ++ chars
      val total = counts.iterator.filter(kv => kept(kv._1))
        .map(_._2.toDouble).sum
      counts.iterator.filter(kv => kept(kv._1))
        .map { case (p, c) => p -> math.log(c / total) }.toMap
    }
    var model = toModel(sub, math.max(vocabSize, seedSize))
    var round = 0
    while (round < emRounds) {
      val counts = scala.collection.mutable.HashMap.empty[String, Long]
      wc.foreach { case (w, c) =>
        segment(w, model, maxPieceLen).foreach(p =>
          counts.update(p, counts.getOrElse(p, 0L) + c))
      }
      // characters that lost every Viterbi race still need floor mass
      chars.foreach(ch => if (!counts.contains(ch)) counts.update(ch, 1L))
      model = toModel(counts, vocabSize)
      round += 1
    }
    model
  }

  /** Maximum-likelihood segmentation of one word: Viterbi DP over cut
    * positions; at equal score the LONGER incoming piece wins (checked
    * first), making the cut sequence a pure function of (word, model). */
  def segment(word: String, logp: Model, maxPieceLen: Int = 6): Vector[String] = {
    val n = word.length
    if (n == 0) return Vector.empty
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = math.min(maxPieceLen, i)
      while (l >= 1) {
        val j = i - l
        if (best(j) > Double.NegativeInfinity) {
          val piece = word.substring(j, i)
          val s = logp.get(piece) match {
            case Some(lp) => lp
            case None => if (l == 1) unkScore else Double.NegativeInfinity
          }
          if (s > Double.NegativeInfinity && best(j) + s > best(i)) {
            best(i) = best(j) + s
            back(i) = j
          }
        }
        l -= 1
      }
      i += 1
    }
    var cuts = List.empty[String]
    var k = n
    while (k > 0) { cuts = word.substring(back(k), k) :: cuts; k = back(k) }
    cuts.toVector
  }

  /** Distributed encode: broadcast the scored vocabulary, Viterbi-map
    * every document — a pure narrow map, no shuffle, a scan at 100 TB.
    * Returns (idCol, n_words, n_pieces, pieces). */
  def encode(df: DataFrame, model: Model, maxPieceLen: Int = 6,
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val enc = udf { (text: String) =>
      if (text == null) Array.empty[String]
      else text.split(" ").iterator.filter(_.nonEmpty)
        .flatMap(w => segment(w, bc.value, maxPieceLen)).toArray
    }
    df.select(col(idCol),
        size(filter(split(col(textCol), " "), w => length(w) > 0)).cast("long")
          .as("n_words"),
        enc(col(textCol)).as("pieces"))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
      .select(col(idCol), col("n_words"), col("n_pieces"), col("pieces"))
  }
}
