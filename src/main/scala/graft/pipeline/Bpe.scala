package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Byte-pair-encoding subword tokenizer (Sennrich et al. 2016,
  * arXiv:1508.07909): the training-pipeline step between raw text and
  * token ids that [[TextAnalysis.tokenCount]]'s regex only
  * approximates.
  *
  * Division of labor follows how production tokenizers are actually
  * built at corpus scale: TRAINING runs on a bounded word-frequency
  * table (the distributed corpus collapses to ≤ maxWords (word, count)
  * rows — a TakeOrderedAndProject — and the greedy merge loop is
  * driver-side, exactly like [[graft.linalg.EigenInit]]'s driver
  * route), while ENCODING is distributed: the ranked merge table
  * broadcasts to executors and every document is a narrow map. The
  * per-word greedy merge loop has no relational form — this is the
  * documented "genuine per-row imperative logic" case, so encode uses
  * a broadcast-closure UDF rather than contorted column expressions.
  *
  * Deterministic end to end: word counts tie-break on the word, the
  * merge loop tie-breaks on (count DESC, left, right), and encoding is
  * a pure function of (text, merges) — same model and same ids on one
  * core or a thousand executors. No SQL analog (the merge loop is
  * inherently iterative) → rows-only query (q79) + closed-form specs,
  * like the other iterative operators (SURVEY §5).
  */
object Bpe {

  /** End-of-word sentinel appended to each word's symbol sequence so
    * merges distinguish word-final from word-internal contexts. */
  val EndOfWord = "</w>"

  /** Learn `nMerges` merge rules from the corpus. The distributed part
    * is ONLY the word-count table (top `maxWords` by count — rare-word
    * tails don't shape early merges); the classic greedy loop runs on
    * the driver over that bounded table. Returns merges in rank order. */
  def train(df: DataFrame, nMerges: Int, maxWords: Int = 50000,
            textCol: String = "text"): Seq[(String, String)] = {
    require(nMerges >= 0 && maxWords >= 1,
      s"need nMerges >= 0 and maxWords >= 1, got $nMerges / $maxWords")
    val wc = df
      .select(explode(filter(split(col(textCol), " "), w => length(w) > 0)).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))

    var words: Array[(Vector[String], Long)] =
      wc.map { case (w, c) => (w.map(_.toString).toVector :+ EndOfWord, c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var remaining = nMerges
    while (remaining > 0) {
      val pairCounts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + c)
          j += 1
        }
      }
      if (pairCounts.isEmpty) remaining = 0
      else {
        val best = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergeOnce(syms, best), c) }
        remaining -= 1
      }
    }
    merges.toSeq
  }

  private def mergeOnce(syms: Vector[String], pair: (String, String)): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += syms(j) + syms(j + 1); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.result()
  }

  /** Encode one word with a rank table: repeatedly merge the
    * lowest-rank adjacent pair until none applies (the standard greedy
    * BPE inference). Symbols never seen in training (OOV characters)
    * simply survive unmerged. */
  def encodeWord(word: String, ranks: Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector :+ EndOfWord
    var done = false
    while (!done && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = j }
        j += 1
      }
      if (bestIdx < 0) done = true
      else syms = syms.patch(bestIdx, Vector(syms(bestIdx) + syms(bestIdx + 1)), 2)
    }
    syms
  }

  /** Distributed encode: broadcast the ranked merges, map every
    * document to its subword pieces — a pure narrow map, no shuffle,
    * a scan at 100 TB. Returns (idCol, n_words, n_pieces, pieces). */
  def encode(df: DataFrame, merges: Seq[(String, String)],
             idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ranks = merges.zipWithIndex.toMap
    val bc = df.sparkSession.sparkContext.broadcast(ranks)
    val enc = udf { (text: String) =>
      if (text == null) Array.empty[String]
      else text.split(" ").iterator.filter(_.nonEmpty)
        .flatMap(w => encodeWord(w, bc.value)).toArray
    }
    df.select(col(idCol),
        size(filter(split(col(textCol), " "), w => length(w) > 0)).cast("long")
          .as("n_words"),
        enc(col(textCol)).as("pieces"))
      .withColumn("n_pieces", size(col("pieces")).cast("long"))
      .select(col(idCol), col("n_words"), col("n_pieces"), col("pieces"))
  }
}
