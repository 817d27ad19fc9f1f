package graft

import org.apache.spark.sql.functions._
import graft.linalg.Pca

/** PCA correctness: Jacobi closed forms, planted-direction recovery,
  * orthonormality, variance accounting, projection parity. */
class PcaSpec extends SparkSpec {

  import spark.implicits._

  test("jacobiEigen: 2x2 closed form") {
    val (evals, evecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val sorted = evals.sorted
    assert(math.abs(sorted(0) - 1.0) < 1e-12 && math.abs(sorted(1) - 3.0) < 1e-12)
    // eigenvector for eval 3 is (1,1)/sqrt(2) up to sign
    val i3 = evals.indexWhere(v => math.abs(v - 3.0) < 1e-9)
    val v3 = Array(evecs(0)(i3), evecs(1)(i3))
    assert(math.abs(math.abs(v3(0)) - math.sqrt(0.5)) < 1e-9)
    assert(math.abs(v3(0) - v3(1)) < 1e-9)
  }

  /** Deterministic anisotropic fixture in d=4: dominant direction v,
    * small structured perturbation along w ⊥ v. */
  private def planted = {
    val v = Array(0.5, 0.5, 0.5, 0.5)
    val w = Array(0.5, -0.5, 0.5, -0.5)
    (-50 to 50).map { t =>
      val p = math.sin(t * 0.7) // |p| ≤ 1, mean ~0 — tiny vs |t| spread
      (t.toLong, (0 until 4).map(i => t * v(i) + p * w(i)).toArray.toSeq)
    }.toDF("id", "v")
  }

  test("fit recovers the planted dominant direction") {
    val m = Pca.fit(planted, "v", r = 2)
    val c1 = m.components(0)
    val v = Array(0.5, 0.5, 0.5, 0.5)
    val cos = c1.zip(v).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.999, s"top component ${c1.mkString(",")}")
    // sign convention: largest-|coordinate| entry positive → cos > 0
    assert(cos > 0)
    assert(m.explainedVariance(0) > 100 * m.explainedVariance(1))
  }

  test("components are orthonormal; variances ordered; total accounted") {
    val m = Pca.fit(planted, "v", r = 4)
    for (i <- 0 until 4; j <- i until 4) {
      val d = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      val want = if (i == j) 1.0 else 0.0
      assert(math.abs(d - want) < 1e-9, s"<c$i,c$j> = $d")
    }
    val evs = m.explainedVariance
    assert(evs.zip(evs.tail).forall { case (a, b) => a >= b - 1e-12 })
    assert(math.abs(evs.sum - m.totalVariance) < 1e-9 * math.max(1.0, m.totalVariance))
  }

  test("transform matches the driver-side projection and variance accounting") {
    val df = planted.cache()
    val m = Pca.fit(df, "v", r = 2)
    val got = Pca.transform(df, m, "v").select("id", "pc").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val rows = df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { case (id, x) =>
      val want = m.components.map(c =>
        c.zip(x).map { case (a, b) => a * b }.sum -
          c.zip(m.mean).map { case (a, b) => a * b }.sum)
      val pc = got(id)
      want.indices.foreach(k => assert(math.abs(pc(k) - want(k)) < 1e-9))
    }
    // empirical variance of pc1 equals the first explained variance
    val pc1 = rows.keys.toSeq.map(id => got(id)(0))
    val mean = pc1.sum / pc1.size
    val varP = pc1.map(x => (x - mean) * (x - mean)).sum / pc1.size
    assert(math.abs(varP - m.explainedVariance(0)) <
      1e-6 * math.max(1.0, m.explainedVariance(0)))
    df.unpersist()
  }

  test("fit is deterministic across runs") {
    val a = Pca.fit(planted, "v", 3)
    val b = Pca.fit(planted, "v", 3)
    val fa: Array[Double] = a.components.flatten
    val fb: Array[Double] = b.components.flatten
    assert(fa.zip(fb).forall { case (x, y) => math.abs(x - y) < 1e-12 })
    assert(a.explainedVariance.zip(b.explainedVariance)
      .forall { case (x, y) => math.abs(x - y) < 1e-12 })
  }
}
