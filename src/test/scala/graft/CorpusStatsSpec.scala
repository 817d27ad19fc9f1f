package graft

import org.apache.spark.sql.functions._
import graft.pipeline.TextAnalysis
import graft.util.ZOrder

/** Corpus-statistics operators (top n-grams, PMI collocations, Zipf
  * fit, robust length outliers) on hand-computed fixtures, plus the
  * Z-order layout utility's Morton-code and locality contracts. */
class CorpusStatsSpec extends SparkSpec {

  import spark.implicits._

  test("topKNgrams: counts, doc frequency, deterministic tie cut") {
    val docs = Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")
    // bigrams: d1 -> [a b, b a, a b, b c], d2 -> [a b, b x]
    val top = TextAnalysis.topKNgrams(docs, n = 2, k = 2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(top.head === (("a b", 3L, 2L)))
    // the cnt-1 tie is cut by gram ASC: "b a" < "b c" < "b x"
    assert(top(1) === (("b a", 1L, 1L)))
  }

  test("topKNgrams: global cut plans as TakeOrderedAndProject") {
    val docs = Seq((1L, "a b a b c")).toDF("doc_id", "text")
    val plan = TextAnalysis.topKNgrams(docs, n = 2, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("pmiCollocations: hand-computed PMI, minCount prune, tiebreak") {
    val docs = Seq((1L, "p q p q p q"), (2L, "r r r")).toDF("doc_id", "text")
    // unigrams: p:3 q:3 r:3, n_uni=9; bigrams: "p q":3 "q p":2 "r r":2, n_bi=7
    val got = TextAnalysis.pmiCollocations(docs, k = 5, minCount = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    def pmi(cxy: Double, cx: Double, cy: Double): Double =
      BigDecimal(math.log((cxy / 7) / ((cx / 9) * (cy / 9))))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.length === 3)
    assert(got(0) === (("p", "q", 3L, 3L, 3L, pmi(3, 3, 3))))
    // (q,p) and (r,r) have the SAME pmi — w1 ASC breaks the tie
    assert(got(1) === (("q", "p", 2L, 3L, 3L, pmi(2, 3, 3))))
    assert(got(2) === (("r", "r", 2L, 3L, 3L, pmi(2, 3, 3))))
  }

  test("zipfFit: exactly-Zipfian counts recover slope -1 and intercept ln(12)") {
    // counts 12/r at ranks 1..4 -> ln(cnt) = ln 12 - 1*ln(rank)
    val text = (Seq.fill(12)("t1") ++ Seq.fill(6)("t2") ++
      Seq.fill(4)("t3") ++ Seq.fill(3)("t4")).mkString(" ")
    val row = TextAnalysis.zipfFit(Seq(text).toDF("text"), topV = 4).head()
    assert(row.getLong(0) === 4L)
    assert(row.getDouble(1) === -1.0)
    assert(row.getDouble(2) ===
      BigDecimal(math.log(12.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("lengthOutliers: MAD z-score flags the planted outlier; MAD=0 source is null-z") {
    def doc(id: Long, src: String, n: Int) = (id, src, Seq.fill(n)("w").mkString(" "))
    val docs = (Seq(
      doc(1, "A", 10), doc(2, "A", 10), doc(3, "A", 10), doc(4, "A", 10),
      doc(5, "A", 100), // degenerate source: median 10, MAD 0
      doc(6, "B", 8), doc(7, "B", 10), doc(8, "B", 12), doc(9, "B", 14),
      doc(10, "B", 1000) // median 12, MAD 2 -> z(1000) = 988/(1.4826*2)
    )).toDF("doc_id", "source", "text")
    val out = TextAnalysis.lengthOutliers(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // source A: MAD 0 -> z null, never an outlier (even the 100)
    assert(out(5L).isNullAt(5) && !out(5L).getBoolean(6))
    // source B: only the planted 1000 crosses |z| > 3
    val zB = BigDecimal(988.0 / (1.4826 * 2))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(10L).getDouble(5) === zB && out(10L).getBoolean(6))
    assert(Seq(6L, 7L, 8L, 9L).forall(i => !out(i).getBoolean(6)))
    assert(out(7L).getDouble(3) === 12.0 && out(7L).getDouble(4) === 2.0)
  }

  test("bigramLogLik: hand-computed smoothed bigram NLLs") {
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    // unigrams a:3 b:2 c:1 (V=3); corpus bigrams (a,b):2 (b,a):1 (a,c):1
    def nll(c12: Double, c1: Double): Double = -math.log((c12 + 0.1) / (c1 + 0.1 * 3))
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = TextAnalysis.bigramLogLik(docs, alpha = 0.1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L)._1 === 3L)
    assert(got(1L)._2 === r6((2 * nll(2, 3) + nll(1, 2)) / 3))
    assert(got(2L) === ((1L, r6(nll(1, 3)))))
    // a one-token doc has no bigram slots -> no row
    val short = TextAnalysis.bigramLogLik(
      Seq((1L, "a b"), (2L, "x")).toDF("doc_id", "text")).collect()
    assert(short.map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("lengthOutliers: approx route shares the exact route's schema") {
    val docs = Seq((1L, "A", "w w w"), (2L, "A", "w w w w w"),
      (3L, "A", "w w w w w w w")).toDF("doc_id", "source", "text")
    val exact = TextAnalysis.lengthOutliers(docs, exact = true)
    val approx = TextAnalysis.lengthOutliers(docs, exact = false)
    assert(exact.schema === approx.schema)
    // odd group sizes: the sketch median is the exact middle element
    assert(exact.collect().toSet === approx.collect().toSet)
  }

  import CorpusStatsSpec.mortonRef

  test("zValue2 matches the reference interleave on a 32x32 grid") {
    val pts = for (x <- 0 until 32; y <- 0 until 32) yield (x.toLong, y.toLong)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"), ZOrder.zValue2(col("x"), col("y"), 8).as("z"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y, 8), s"($x,$y)")
    }
  }

  test("zValueN interleaves three dimensions to the reference layout") {
    def ref3(x: Long, y: Long, z: Long, bits: Int): Long =
      (0 until bits).map(i => (((x >> i) & 1L) << (3 * i)) |
        (((y >> i) & 1L) << (3 * i + 1)) |
        (((z >> i) & 1L) << (3 * i + 2))).reduce(_ | _)
    val pts = for (x <- 0 until 8; y <- 0 until 8; z <- 0 until 8)
      yield (x.toLong, y.toLong, z.toLong)
    val got = pts.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        ZOrder.zValueN(Seq(col("x"), col("y"), col("z")), 3).as("zv"))
      .collect().map(r => ((r.getLong(0), r.getLong(1), r.getLong(2)), r.getLong(3)))
      .toMap
    pts.foreach { case (x, y, z) => assert(got((x, y, z)) === ref3(x, y, z, 3)) }
  }

  test("aligned z-blocks are square tiles: every 256-code block of a 64x64 grid is 16x16") {
    val pts = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val ext = pts
      .withColumn("blk", shiftright(ZOrder.zValue2(col("x"), col("y"), 6), 8))
      .groupBy("blk")
      .agg((max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey"),
        count(lit(1)).as("n"))
      .collect()
    assert(ext.length === 16)
    ext.foreach { r =>
      assert(r.getLong(1) === 15L && r.getLong(2) === 15L && r.getLong(3) === 256L)
    }
  }

  test("clusterByZ: rows preserved, range-partitioned, z-sorted within partitions") {
    val pts = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val clustered = ZOrder.clusterByZ(pts, col("x"), col("y"),
      numPartitions = 8, bits = 6)
    assert(clustered.queryExecution.executedPlan.toString
      .toLowerCase.contains("rangepartitioning"))
    val rows = clustered.select("x", "y").rdd
      .mapPartitions { it =>
        val zs = it.map(r => mortonRef(r.getLong(0), r.getLong(1), 6)).toArray
        Iterator((zs.length, zs.sameElements(zs.sorted)))
      }.collect()
    assert(rows.map(_._1).sum === 64 * 64)
    assert(rows.forall(_._2), "each partition must be a contiguous sorted z-run")
  }

  test("readability: closed-form Flesch on hand fixtures") {
    val docs = Seq(
      (1L, "the cat sat. the dog ran!"),   // 6 words, 2 sentences, 6 syl
      (2L, "xyzx bcd"),                    // vowel-less -> clamp to 1/word
      (3L, "bcd banana"))                  // per-word clamp: 1 + 3 = 4
      .toDF("doc_id", "text")
    val got = TextAnalysis.readability(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toMap
    // doc 1: 206.835 - 1.015*(6/2) - 84.6*(6/6)
    assert(got(1L)._1 == 6L && got(1L)._2 == 2L && got(1L)._3 == 6L)
    assert(math.abs(got(1L)._4 - (206.835 - 1.015 * 3.0 - 84.6)) < 1e-9)
    // doc 2: syllables clamped to word count (y counts as vowel in xyzx)
    assert(got(2L)._3 == 2L)
    // doc 3: the clamp is PER WORD — a vowel-less word counts 1 even
    // beside a polysyllabic neighbor (total-clamp would give 3)
    assert(got(3L)._3 == 4L)
  }

  test("scriptProfile: closed-form class counts and ratios") {
    val docs = Seq((1L, "ab 12!"), (2L, "xyz")).toDF("doc_id", "text")
    val got = TextAnalysis.scriptProfile(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val r1 = got(1L)
    // "ab 12!": 6 chars = 2 letters + 2 digits + 1 space + 1 other
    assert(r1.getLong(r1.fieldIndex("n_chars")) == 6L)
    assert(r1.getLong(r1.fieldIndex("n_letter")) == 2L)
    assert(r1.getLong(r1.fieldIndex("n_digit")) == 2L)
    assert(r1.getLong(r1.fieldIndex("n_space")) == 1L)
    assert(r1.getLong(r1.fieldIndex("n_other")) == 1L)
    assert(math.abs(r1.getDouble(r1.fieldIndex("r_letter")) - 0.333333) < 1e-9)
    assert(!r1.getBoolean(r1.fieldIndex("mostly_alpha"))) // 2*2 !> 6
    val r2 = got(2L)
    assert(r2.getBoolean(r2.fieldIndex("mostly_alpha")))
    assert(r2.getDouble(r2.fieldIndex("r_letter")) == 1.0)
  }

  test("keyness: a source-exclusive term tops its source's ranking") {
    // "krakatoa" appears only in src A; shared filler dominates counts
    val docs = (1L to 20L).map { i =>
      val src = if (i <= 10) "A" else "B"
      val extra = if (i <= 10) " krakatoa" else " mundane"
      (i, src, s"the quick fox$extra")
    }.toDF("doc_id", "source", "text")
    val got = TextAnalysis.keyness(docs.select(col("doc_id"), col("source"),
      col("text")), k = 3).collect()
    val topA = got.filter(r => r.getString(0) == "A" && r.getLong(4) == 1L)(0)
    val topB = got.filter(r => r.getString(0) == "B" && r.getLong(4) == 1L)(0)
    assert(topA.getString(1) == "krakatoa")
    assert(topB.getString(1) == "mundane")
    // z is antisymmetric for a 2-source corpus: A's top z > 0
    assert(topA.getDouble(3) > 0)
  }

  test("giniTokens: 0 for uniform lengths, (n-1)/n for total concentration") {
    val docs = Seq(
      (1L, "u", "a b c"), (2L, "u", "d e f"), (3L, "u", "g h i"),
      (4L, "c", ""), (5L, "c", ""), (6L, "c", ""), (7L, "c", "w x y z"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.giniTokens(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(math.abs(got("u")) < 1e-9)           // perfectly equal
    assert(math.abs(got("c") - 0.75) < 1e-9)    // one doc holds all: (4-1)/4
  }

  test("jsDivergence: 0 for identical sources, ln 2 for disjoint vocabularies") {
    val docs = Seq(
      (1L, "a1", "x y z"), (2L, "a2", "x y z"),        // identical dists
      (3L, "b1", "p p q"), (4L, "b2", "r s s"))        // disjoint vocabs
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.jsDivergence(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(got(("a1", "a2"))) < 1e-9)
    assert(math.abs(got(("b1", "b2")) - math.log(2)) < 1e-6)
  }

  test("sourceOverlap: hand-computed set algebra") {
    val docs = Seq(
      (1L, "A", "a b c"), (2L, "A", "c d"),      // A = {a,b,c,d}
      (3L, "B", "c d e"),                        // B = {c,d,e}
      (4L, "C", "x y"))                          // C = {x,y} (disjoint)
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(got(("A", "B")) == ((4L, 3L, 2L, 0.4)))   // {c,d}, 2/(4+3-2)
    assert(!got.contains(("A", "C")))                 // no shared term row
    assert(!got.contains(("B", "C")))
  }

  test("winsorizedStats: hand-computed interpolated clamp bounds") {
    // group A: 1..9 plus outlier 1000 (n=10). p05 rank = 0.45 → 1.45;
    // p95 rank = 8.55 → 9 + 0.55·(1000−9) = 554.05. Clamped mean:
    // (1.45 + (2+..+9) + 554.05)/10 = 59.95; raw mean 104.5.
    val docs = ((1 to 9).map(i => (i.toLong, "A", i.toLong)) :+
      (10L, "A", 1000L)).toDF("doc_id", "source", "n_chars")
    val r = TextAnalysis.winsorizedStats(docs).collect().head
    assert(r.getString(0) == "A" && r.getLong(1) == 10L)
    assert(r.getDouble(2) == 1.45 && r.getDouble(3) == 554.05)
    assert(r.getDouble(4) == 104.5 && r.getDouble(5) == 59.95)
  }

  test("hllDistinctAudit: exact counts and sketch accuracy on a small vocab") {
    val docs = Seq((1L, "A", "a b c a"), (2L, "B", "x y"))
      .toDF("doc_id", "source", "text")
    val got = TextAnalysis.hllDistinctAudit(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got("A") == ((3L, true)) && got("B") == ((2L, true)))
  }

  test("compressRatio: repetitive text deflates, tiny text pays the header") {
    val docs = Seq((1L, "ab " * 300), (2L, "q"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.compressRatio(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got(1L)._3 < 0.1, s"900 bytes of 'ab ' must deflate hard: ${got(1L)}")
    assert(got(2L)._3 > 1.0, s"1-byte doc pays gzip overhead: ${got(2L)}")
    assert(got(2L)._2 >= 20L) // gzip header(10)+trailer(8) floor
  }

  test("vocabGrowth: hand-computed cumulative curve and a sane fit") {
    val docs = Seq((1L, "a b a"), (2L, "b c"), (3L, "c c d a"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // tokens: 3, 5, 9; vocab: {a,b}=2, {+c}=3, {+d}=4
    assert(got == Map(1L -> (3L, 2L), 2L -> (5L, 3L), 3L -> (9L, 4L)))
    val fit = TextAnalysis.vocabGrowth(docs).select("heaps_beta", "heaps_k")
      .distinct().collect()
    assert(fit.length == 1) // the fit is one constant pair on every row
    val beta = fit(0).getDouble(0)
    assert(beta > 0 && beta < 1, s"sublinear growth expected, got $beta")
  }

  test("chunkDocuments: exact windows, overlap, and last-covering-chunk rule") {
    // 10 tokens, size 4, stride 3: starts 0, 3, 6 (6+4 >= 10 stops it)
    val doc = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(doc, size = 4, stride = 3)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getString(3))).sortBy(_._1)
    assert(got.map(c => (c._1, c._2)).toSeq == Seq((0L, 4L), (1L, 4L), (2L, 4L)))
    def h(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(got(0)._3 == h("t0 t1 t2 t3"))
    assert(got(1)._3 == h("t3 t4 t5 t6"))
    assert(got(2)._3 == h("t6 t7 t8 t9"))
  }

  test("chunkDocuments: short docs yield one chunk; ragged tail is truncated") {
    val docs = Seq((1L, "a b"), (2L, (0 until 6).map("w" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunkDocuments(docs, size = 4, stride = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(got == Map((1L, 0L) -> 2L, (2L, 0L) -> 4L, (2L, 1L) -> 3L))
  }

  test("chunkDocuments: every token position is covered, no chunk past the end") {
    val docs = graft.Tables.documents(spark, sf).limit(200)
    val chunks = TextAnalysis.chunkDocuments(docs, size = 64, stride = 48)
    val byDoc = chunks.groupBy("doc_id")
      .agg(max(col("chunk_idx")).as("last"), count(lit(1)).as("n"),
        sum(col("n_tokens")).as("tok_sum"))
    val joined = byDoc.join(
      docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_toks")), "doc_id")
    // chunk count = clamped ceil((n-size)/stride)+1; coverage: last
    // chunk reaches the end, so sum of chunk sizes >= n (overlap >= 0)
    assert(joined.filter(
      col("n") =!= greatest(lit(0L),
        ceil((col("n_toks") - 64).cast("double") / 48.0).cast("long")) + 1L
        || col("tok_sum") < col("n_toks")).isEmpty)
  }
}

/** Reference Morton interleave, kept off the spec instance so executor
  * closures don't drag the (non-serializable) suite along. */
object CorpusStatsSpec extends Serializable {
  def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).map(i => (((x >> i) & 1L) << (2 * i)) |
      (((y >> i) & 1L) << (2 * i + 1))).reduce(_ | _)
}
