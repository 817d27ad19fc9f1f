package graft

import graft.pipeline.Bpe

/** BPE train/encode against the closed-form Sennrich corpus: merge
  * order, tiebreaks, greedy inference, OOV behavior, distributed ≡
  * driver encode. */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  // low×5, lower×2, newest×6, widest×3 — the arXiv:1508.07909 example
  private def corpus: Seq[String] = Seq(
    (Seq.fill(5)("low") ++ Seq.fill(2)("lower")).mkString(" "),
    (Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))

  test("train recovers the classic merge sequence with deterministic tiebreaks") {
    val docs = corpus.toDF("text")
    // pair counts: (e,s)=(s,t)=(t,</w>)=9 — the three-way tie breaks on
    // the left symbol; after est</w> forms, (l,o)=(o,w)=7 ties break to l
    val merges = Bpe.train(docs, nMerges = 4)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord), ("l", "o")))
  }

  test("train stops early when no pairs remain") {
    val merges = Bpe.train(Seq("a").toDF("text"), nMerges = 10)
    // "a</w>" has one pair, then a single symbol: exactly one merge
    assert(merges === Seq(("a", Bpe.EndOfWord)))
  }

  test("encodeWord applies merges greedily by rank; OOV symbols survive") {
    val ranks = Seq(("e", "s"), ("es", "t"), ("est", Bpe.EndOfWord), ("l", "o"))
      .zipWithIndex.toMap
    assert(Bpe.encodeWord("lowest", ranks) === Vector("lo", "w", "est" + Bpe.EndOfWord))
    assert(Bpe.encodeWord("xyz", ranks) === Vector("x", "y", "z", Bpe.EndOfWord))
  }

  test("distributed encode ≡ driver encodeWord, counts consistent, null-safe") {
    val docs = (corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
      (99L, "lowest xyz")).toDF("doc_id", "text")
    val merges = Bpe.train(docs.filter($"doc_id" < 10), nMerges = 4)
    val ranks = merges.zipWithIndex.toMap
    val gotRows = Bpe.encode(docs, merges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getSeq[String](3)))).toMap
    docs.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val words = text.split(" ").filter(_.nonEmpty)
      val expected = words.toVector.flatMap(w => Bpe.encodeWord(w, ranks))
      val (nWords, nPieces, pieces) = gotRows(id)
      assert(nWords === words.length.toLong, s"doc $id")
      assert(pieces.toVector === expected, s"doc $id")
      assert(nPieces === expected.length.toLong, s"doc $id")
    }
    // merges compress: strictly fewer pieces than characters for real words
    val (_, nP, _) = gotRows(99L)
    assert(nP === (3 + 4).toLong) // lowest -> lo w est</w>; xyz -> x y z </w>
  }
}
