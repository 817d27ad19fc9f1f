package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Sketches

/** Misra–Gries heavy-hitters sketch: exactness when the counter budget
  * covers the vocabulary, the est ≤ f ≤ est + n/(k+1) guarantee and
  * heavy-term completeness under pressure, and the audit row's
  * partitioning invariance (the property that lets a
  * partitioning-dependent counter set hash-compare via its invariants).
  */
class SketchesSpec extends SparkSpec {

  import spark.implicits._

  private def termsOf(ts: String*) = ts.toDF("term")

  test("misraGries is exact when k covers the distinct terms") {
    val t = termsOf("a", "b", "a", "c", "a", "b")
    val got = Sketches.misraGries(t, k = 8)
    assert(got == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("misraGries under pressure: bounds hold and the heavy term survives") {
    // 60×"hot" + 40 singletons, k=4: n=100, bound=20 — "hot" (60 > 20)
    // must be present with 40 ≤ est ≤ 60
    val stream = Seq.fill(60)("hot") ++ (1 to 40).map(i => s"rare$i")
    val exact = stream.groupBy(identity).map { case (k2, v) => k2 -> v.size.toLong }
    val t = new scala.util.Random(42).shuffle(stream).toDF("term").repartition(6)
    val got = Sketches.misraGries(t, k = 4)
    val n = stream.size
    val bound = n.toDouble / 5
    assert(got.contains("hot"))
    got.foreach { case (term, est) =>
      val f = exact(term)
      assert(est <= f, s"$term overestimated: $est > $f")
      assert(f - est <= bound, s"$term bound violated: $f - $est > $bound")
    }
  }

  test("heavyHittersAudit: hand-computed fixture row") {
    // "a a a a b" + "a c": n=7 tokens, k=2 → bound 7/3; only a (5) is
    // heavy; both invariants are theorems → true
    val docs = Seq((1L, "a a a a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = Sketches.heavyHittersAudit(spark, docs, k = 2).collect()(0)
    assert(r.getLong(r.fieldIndex("n_total")) == 7L)
    assert(r.getLong(r.fieldIndex("n_heavy")) == 1L)
    assert(r.getBoolean(r.fieldIndex("all_heavy_found")))
    assert(r.getBoolean(r.fieldIndex("bounds_ok")))
  }

  test("heavyHittersAudit row is partitioning-invariant") {
    val docs = (1L to 200L).map(i =>
      (i, if (i % 3 == 0) "x x common y" else s"w$i z$i common")).toDF("doc_id", "text")
    val a = Sketches.heavyHittersAudit(spark, docs.repartition(1), k = 8).collect()(0)
    val b = Sketches.heavyHittersAudit(spark, docs.repartition(8), k = 8).collect()(0)
    assert(a == b)
  }

  test("countMin: point estimates never underestimate; exact when collision-free") {
    // a wide sketch over a tiny vocab: with width ≫ vocab and 4 rows,
    // min_i almost surely hits a collision-free row → est == f exactly
    val counts = Seq(("a", 30L), ("b", 7L), ("c", 1L)).toDF("term", "cnt")
    val cms = Sketches.countMin(counts, depth = 4, width = 4096).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    def est(t: String): Long = (0 until 4).map { i =>
      val b = Sketches.countMin(Seq((t, 0L)).toDF("term", "cnt"), 4, 4096)
        .filter(col("row") === i).collect()(0).getLong(1)
      cms.getOrElse((i, b), 0L)
    }.min
    assert(est("a") == 30L && est("b") == 7L && est("c") == 1L)
  }

  test("countMinAudit: exact scalars + guarantee booleans on a hand fixture") {
    val docs = Seq((1L, "a a a a b"), (2L, "a c")).toDF("doc_id", "text")
    val r = Sketches.countMinAudit(spark, docs, depth = 4, width = 256,
      topQ = 8).collect()(0)
    assert(r.getLong(r.fieldIndex("n_total")) == 7L)
    assert(r.getLong(r.fieldIndex("n_terms")) == 3L)
    assert(r.getLong(r.fieldIndex("n_checked")) == 3L)
    assert(r.getBoolean(r.fieldIndex("no_underestimate")))
    assert(r.getBoolean(r.fieldIndex("overcount_ok")))
  }

  test("countMinAudit row is partitioning-invariant") {
    val docs = (1L to 100L).map(i =>
      (i, s"common w${i % 9} z$i")).toDF("doc_id", "text")
    val a = Sketches.countMinAudit(spark, docs.repartition(1), width = 128).collect()(0)
    val b = Sketches.countMinAudit(spark, docs.repartition(8), width = 128).collect()(0)
    assert(a == b)
  }
}
