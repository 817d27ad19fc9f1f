package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Dedup

/** Prefix-filtered set-similarity join: losslessness (≡ the brute
  * posting-list jaccardPairs over the same shingle space, and ≡ a
  * driver brute force over unigram sets), threshold edge cases, and
  * the planted near-dup recovery the operator exists for. */
class SimJoinSpec extends SparkSpec {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "a completely different sentence about spark plans"),
    (4L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (5L, "a completely different sentence about spark physical plans"),
    (6L, "one more unrelated line of filler text here")
  ).toDF("doc_id", "text")

  test("setSimilarityJoin(n=3) equals jaccardPairs on the same shingle space") {
    val got = Dedup.setSimilarityJoin(corpus, threshold = 0.10, n = 3)
      .select("id_a", "id_b", "jaccard")
    val want = Dedup.jaccardPairs(corpus, n = 3, threshold = 0.10)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0) // the fixture really has near-dups
  }

  test("setSimilarityJoin(n=1) equals driver brute force over token sets") {
    val sets = corpus.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty).toSet)
    val tau = 0.30
    val want = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      c = (sa & sb).size
      j = c.toDouble / (sa.size + sb.size - c)
      if j >= tau
    } yield (ia, ib, c.toLong)).toSet
    val got = Dedup.setSimilarityJoin(corpus, threshold = tau, n = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want)
  }

  test("threshold 1.0 keeps only identical sets; planted dup recovered") {
    val got = Dedup.setSimilarityJoin(corpus, threshold = 1.0, n = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 4L)))
  }

  test("agrees with jaccardPairs on the sf0.001 documents table") {
    val docs = graft.Tables.documents(spark, sf)
    val got = Dedup.setSimilarityJoin(docs, threshold = 0.10, n = 3)
      .select("id_a", "id_b", "jaccard")
    val want = Dedup.jaccardPairs(docs, n = 3, threshold = 0.10)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("editDistanceJoin: substitution/insertion/identical-variant pairs, no false positives") {
    import spark.implicits._
    val df = Seq(
      (1L, "abcd"), (2L, "abxd"),  // substitution -> dist 1
      (3L, "abd"),                 // deletion of c from abcd -> dist 1 to 1, 1 to 2
      (4L, "ba"), (5L, "ab"),      // transposition = dist 2: must NOT pair
      (6L, "abcd")                 // exact duplicate of 1 -> dist 0
    ).toDF("id", "s")
    val got = Dedup.editDistanceJoin(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L), (1L, 6L, 0L),
      (2L, 6L, 1L), (3L, 6L, 1L), (3L, 5L, 1L)))
  }

  test("editDistanceJoin equals brute levenshtein on sf0.001 customer names") {
    val c = graft.Tables.customer(spark, sf)
      .select(col("c_custkey").as("id"), col("c_name").as("s"))
    val got = Dedup.editDistanceJoin(c)
    // brute force via cross join on the driver-capped universe
    val a = c.select(col("id").as("id_a"), col("s").as("s_a"))
    val b = c.select(col("id").as("id_b"), col("s").as("s_b"))
    val want = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("dist", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .filter(col("dist") <= 1).select("id_a", "id_b", "dist")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0) // non-vacuous: consecutive names differ by one digit
  }

  test("jaro / jaroWinkler: the textbook closed-form pairs") {
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(r6(Dedup.jaro("MARTHA", "MARHTA")) == 0.944444)
    assert(r6(Dedup.jaroWinkler("MARTHA", "MARHTA")) == 0.961111)
    assert(r6(Dedup.jaro("DWAYNE", "DUANE")) == 0.822222)
    assert(r6(Dedup.jaroWinkler("DWAYNE", "DUANE")) == 0.84)
    assert(r6(Dedup.jaro("DIXON", "DICKSONX")) == 0.766667)
    assert(r6(Dedup.jaroWinkler("DIXON", "DICKSONX")) == 0.813333)
    assert(Dedup.jaroWinkler("same", "same") == 1.0)
    assert(Dedup.jaro("abc", "xyz") == 0.0)
    // below the 0.7 boost threshold, NO prefix bonus applies
    val j = Dedup.jaro("aXXXXX", "aYYYYY")
    assert(j <= 0.7 && Dedup.jaroWinkler("aXXXXX", "aYYYYY") == j)
  }

  test("jaroWinklerJoin: blocked pairs equal brute within-block scoring") {
    import spark.implicits._
    val names = Seq((1L, "small ring"), (2L, "small rings"), (3L, "smell ring"),
      (4L, "blue bolt"), (5L, "blue belt"), (6L, "red gear"))
      .toDF("id", "s")
    val got = Dedup.jaroWinklerJoin(names, threshold = 0.9, blockLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // blocks: {1,2,3 "smal|smel"}… "smel" differs → (1,2) only from smal;
    // (4,5) share "blue"; 6 alone. Verify against direct scoring:
    val all = for {
      (ia, sa) <- Seq((1L, "small ring"), (2L, "small rings"), (3L, "smell ring"),
        (4L, "blue bolt"), (5L, "blue belt"), (6L, "red gear"))
      (ib, sb) <- Seq((1L, "small ring"), (2L, "small rings"), (3L, "smell ring"),
        (4L, "blue bolt"), (5L, "blue belt"), (6L, "red gear"))
      if ia < ib && sa.take(4) == sb.take(4)
      if math.rint(Dedup.jaroWinkler(sa, sb) * 1e6) / 1e6 >= 0.9
    } yield (ia, ib)
    assert(got == all.toSet && got.contains((1L, 2L)) && got.contains((4L, 5L)))
  }
}
