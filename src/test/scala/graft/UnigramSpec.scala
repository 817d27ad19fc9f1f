package graft

import graft.pipeline.Unigram

/** Unigram-LM tokenizer: Viterbi segmentation closed forms, EM
  * training behavior on a constructed corpus, coverage/OOV guarantees,
  * distributed ≡ driver encode. */
class UnigramSpec extends SparkSpec {

  import spark.implicits._

  test("segment picks the maximum-likelihood split, longest at ties") {
    val logp = Map("ab" -> -1.0, "a" -> -2.0, "b" -> -2.0, "c" -> -1.5)
    // "abc": ab+c = -2.5 beats a+b+c = -5.5
    assert(Unigram.segment("abc", logp) === Vector("ab", "c"))
    // equal scores: "ab" (-1.0) vs "a"+"b" would be -4.0; force a tie
    // with x/y/xy all at -1: xy (one piece, -1) beats x+y (-2)
    val tie = Map("x" -> -1.0, "y" -> -1.0, "xy" -> -1.0)
    assert(Unigram.segment("xy", tie) === Vector("xy"))
    assert(Unigram.segment("", logp) === Vector.empty)
  }

  test("segment always covers: unknown chars fall back at unkScore") {
    val logp = Map("a" -> -1.0)
    assert(Unigram.segment("aqa", logp) === Vector("a", "q", "a"))
    // a fully-OOV word still segments to its characters
    assert(Unigram.segment("zz", Map.empty[String, Double]) === Vector("z", "z"))
  }

  test("train keeps high-frequency substrings and all characters") {
    // 'inter' appears in every word — a 5-char piece the seed must keep
    val docs = Seq(Seq.fill(20)("internet").mkString(" "),
      Seq.fill(10)("interval").mkString(" "),
      Seq.fill(5)("interior").mkString(" ")).toDF("text")
    val model = Unigram.train(docs, vocabSize = 40, maxPieceLen = 5)
    // EM keeps multi-char pieces (which of int/inter/ernet win the
    // Viterbi race is tie-dependent — compression is the contract)
    assert(model.keys.exists(_.length >= 3), s"no long pieces in $model")
    // every character of the corpus survives pruning
    "internvalo".foreach(c => assert(model.contains(c.toString), s"char $c"))
    // probabilities are a (log-)distribution over the kept vocab
    val mass = model.values.map(math.exp).sum
    assert(math.abs(mass - 1.0) < 1e-9)
    // training words compress well below their character length
    val segd = Unigram.segment("internet", model, maxPieceLen = 5)
    assert(segd.length <= 3, s"expected <= 3 pieces, got $segd")
    assert(segd.mkString("") === "internet")
  }

  test("distributed encode ≡ driver segment; roundtrip lossless") {
    val docs = Seq((1L, "internet interval"), (2L, "interior qq"),
      (3L, "")).toDF("doc_id", "text")
    val model = Unigram.train(docs, vocabSize = 60, maxPieceLen = 5)
    val got = Unigram.encode(docs, model, maxPieceLen = 5).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[String](3)))).toMap
    docs.collect().foreach { r =>
      val (id, text) = (r.getLong(0), r.getString(1))
      val words = text.split(" ").filter(_.nonEmpty)
      val expected = words.toVector
        .flatMap(w => Unigram.segment(w, model, maxPieceLen = 5))
      val (nWords, nPieces, pieces) = got(id)
      assert(nWords === words.length.toLong, s"doc $id")
      assert(pieces.toVector === expected, s"doc $id")
      assert(nPieces === expected.length.toLong, s"doc $id")
      // lossless: concatenated pieces rebuild the concatenated words
      assert(pieces.mkString("") === words.mkString(""), s"doc $id")
    }
  }
}
