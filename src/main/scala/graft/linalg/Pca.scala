package graft.linalg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VecOps

/** Distributed principal component analysis over an embedding column —
  * the dimensionality-reduction step an embedding pipeline runs before
  * ANN indexing or clustering (the reference embeds but never reduces;
  * this is part of the beyond-reference embedding surface alongside
  * Similarity's ANN ladder).
  *
  * Scale shape: ONE `treeAggregate` pass over the data accumulates
  * (n, Σx, upper-triangular ΣxxT) — d·(d+3)/2 doubles of state per
  * partition, merged tree-wise, independent of row count. The d×d
  * covariance eigendecomposition happens on the driver (cyclic Jacobi;
  * d is the embedding width, 64 here — microseconds), exactly the
  * EigenInit driver-route reasoning: never ship an O(n) problem to the
  * driver, always ship the O(d²) summary. The projection back over the
  * data is a broadcast of r·d coefficients folded into a codegen'd
  * column expression — a narrow map, no shuffle, a scan at 100 TB.
  */
object Pca {

  /** Fitted model: column means, top-r components (rows, unit-norm,
    * variance-descending, sign-normalized so each component's
    * largest-|coordinate| entry is positive — deterministic up to the
    * float-sum order of the input pass), their explained variances,
    * and the total variance across all d dimensions. */
  case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
                      explainedVariance: Array[Double], totalVariance: Double)

  /** One-pass moment accumulation + driver Jacobi. `vecCol` must be
    * array<double> (cast upstream for float embeddings). */
  def fit(df: DataFrame, vecCol: String, r: Int): PcaModel = {
    val d = df.select(size(col(vecCol))).first().getInt(0)
    require(r >= 1 && r <= d, s"r must be in [1, $d], got $r")
    val tri = d * (d + 1) / 2
    val zero = (0L, new Array[Double](d), new Array[Double](tri))
    val (n, s, g) = df.select(col(vecCol)).rdd
      .map(_.getSeq[Double](0).toArray)
      .treeAggregate(zero)(
        seqOp = { case ((n, s, g), x) =>
          var i = 0; var t = 0
          while (i < d) {
            s(i) += x(i)
            var j = i
            while (j < d) { g(t) += x(i) * x(j); j += 1; t += 1 }
            i += 1
          }
          (n + 1, s, g)
        },
        combOp = { case ((n1, s1, g1), (n2, s2, g2)) =>
          var i = 0
          while (i < d) { s1(i) += s2(i); i += 1 }
          i = 0
          while (i < tri) { g1(i) += g2(i); i += 1 }
          (n1 + n2, s1, g1)
        })
    require(n > 1, s"PCA needs at least 2 rows, got $n")
    val mean = s.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var t = 0
    for (i <- 0 until d; j <- i until d) {
      val c = g(t) / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c; t += 1
    }
    val (evals, evecs) = jacobiEigen(cov)
    val order = evals.indices.sortBy(i => (-evals(i), i))
    val top = order.take(r).map { i =>
      val v = evecs.map(_(i))
      // sign convention: largest-|coordinate| entry positive
      val m = v.indices.maxBy(k => (math.abs(v(k)), -k))
      if (v(m) < 0) v.map(-_) else v
    }.toArray
    PcaModel(mean, top, order.take(r).map(evals(_)).toArray, evals.sum)
  }

  /** Project `vecCol` onto the model's components: emits `outCol` as
    * array<double> of length r. The components fold into the plan as
    * literal arrays — pc_k = Σ_i x_i·c_ki − ⟨c_k, mean⟩, all inside
    * whole-stage codegen. */
  def transform(df: DataFrame, model: PcaModel, vecCol: String,
                outCol: String = "pc"): DataFrame = {
    val comps: Seq[Column] = model.components.map { c =>
      val offset = c.zip(model.mean).map { case (a, b) => a * b }.sum
      VecOps.dot(col(vecCol), typedLit(c.toSeq)) - lit(offset)
    }.toSeq
    df.withColumn(outCol, array(comps: _*))
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with vectors in COLUMNS).
    * Deterministic sweep order; converges quadratically — sweeps is a
    * safety bound, the off-diagonal norm check exits long before. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]],
                                  sweeps: Int = 100): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offNorm(a)
    val tol = 1e-14 * math.max(1.0, frobNorm(a))
    while (sweep < sweeps && off > tol) {
      for (p <- 0 until d - 1; q <- p + 1 until d if math.abs(a(p)(q)) > tol / (d * d)) {
        val apq = a(p)(q)
        val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
        val tSign = if (theta >= 0) 1.0 else -1.0
        val tt = tSign / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
        val c = 1.0 / math.sqrt(tt * tt + 1.0)
        val sN = tt * c
        var k = 0
        while (k < d) {
          val akp = a(k)(p); val akq = a(k)(q)
          a(k)(p) = c * akp - sN * akq
          a(k)(q) = sN * akp + c * akq
          k += 1
        }
        k = 0
        while (k < d) {
          val apk = a(p)(k); val aqk = a(q)(k)
          a(p)(k) = c * apk - sN * aqk
          a(q)(k) = sN * apk + c * aqk
          k += 1
        }
        k = 0
        while (k < d) {
          val vkp = v(k)(p); val vkq = v(k)(q)
          v(k)(p) = c * vkp - sN * vkq
          v(k)(q) = sN * vkp + c * vkq
          k += 1
        }
      }
      off = offNorm(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices if i != j) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }

  private def frobNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- a.indices) s += a(i)(j) * a(i)(j)
    math.sqrt(s)
  }
}
