package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** OPQ vs plain PQ at the REALISTIC regime — the r6 finding was that
  * PQ recall is code-quality-bound at n ≥ 1M, which is exactly the
  * regime the rotation exists for; the testdata embeddings are
  * near-random (little cross-dim structure for a rotation to exploit),
  * so this probe re-measures the lift on the deterministic 1M×64
  * LATENT-CLUSTER corpus (ProfileIvfPqScale's generator: 512 seeded
  * gaussian centers + 0.35σ noise — correlated dims, the shape real
  * embedding corpora have). Identical index bytes per pair; low refine
  * so stage-1 code quality is exposed.
  *
  * Usage: runMain graft.bench.ProbeOpqScale [n] [nLists] [latent]
  */
object ProbeOpqScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val nLists = args.drop(1).headOption.map(_.toInt).getOrElse(256)
    val latent = args.drop(2).headOption.map(_.toInt).getOrElse(512)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def time[T](b: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = b
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val mode = args.drop(3).headOption.getOrElse("correlated")
    val dim = 64
    val centers = Array.tabulate(latent) { c =>
      val r = new java.util.Random(1000L + c)
      Array.fill(dim)(r.nextGaussian().toFloat)
    }
    // "correlated" mode: the corpus lives in a HIDDEN rotated basis
    // with per-dim variance decaying exp(-3j/64) — the anisotropic,
    // cross-dim-correlated shape real embedding corpora have (and the
    // shape OPQ exists for: an axis-aligned subspace split spends
    // equal bits on unequal directions; the learned rotation undoes
    // the mixing). "latent" mode is ProfileIvfPqScale's isotropic
    // blobs — a control where the optimal rotation IS the identity.
    val mix: Array[Array[Double]] =
      if (mode == "correlated") {
        val r = new java.util.Random(77L)
        // a fixed random orthogonal Q via Gram-Schmidt on gaussians
        val a = Array.fill(dim, dim)(r.nextGaussian())
        for (i <- 0 until dim) {
          for (j <- 0 until i) {
            val d = (0 until dim).map(k => a(i)(k) * a(j)(k)).sum
            for (k <- 0 until dim) a(i)(k) -= d * a(j)(k)
          }
          val nn = math.sqrt((0 until dim).map(k => a(i)(k) * a(i)(k)).sum)
          for (k <- 0 until dim) a(i)(k) /= nn
        }
        a
      } else null
    val sigmas = Array.tabulate(dim)(j => math.exp(-3.0 * j / dim))
    val bc = spark.sparkContext.broadcast(centers)
    val bcMix = spark.sparkContext.broadcast(mix)
    val bcSig = spark.sparkContext.broadcast(sigmas)
    val vecs = spark.range(n).map { id =>
      val r = new java.util.Random(id * 2654435761L + 7L)
      val c = bc.value((id % latent).toInt)
      val q = bcMix.value
      if (q == null)
        (id, Array.tabulate(dim)(i =>
          c(i) + 0.35f * r.nextGaussian().toFloat))
      else {
        // z-space: damped center + decaying-variance noise; x = Qᵀz
        val sg = bcSig.value
        val z = Array.tabulate(dim)(j =>
          (0.5 * c(j) + 0.35 * r.nextGaussian()) * sg(j))
        (id, Array.tabulate(dim) { i =>
          var s = 0.0; var j = 0
          while (j < dim) { s += q(j)(i) * z(j); j += 1 }
          s.toFloat
        })
      }
    }.toDF("vec_id", "embedding")
      .repartition(spark.sparkContext.defaultParallelism).cache()
    val nVecs = vecs.count()
    val queries = vecs.filter(col("vec_id") < 50).cache()
    val (brute, tBrute) = time {
      val b = Similarity.bruteForceTopK(queries, vecs, k = 5)
        .select("qid", "rid").cache()
      b.count(); b
    }
    val nb = brute.count()
    println(f"[opq-scale] n=$nVecs latent=$latent nLists=$nLists " +
      f"brute=${tBrute}%.1fs")
    def recallOf(name: String, df: org.apache.spark.sql.DataFrame,
                 t: Double): Unit = {
      val nh = df.select("qid", "rid")
        .join(brute, Seq("qid", "rid"), "left_semi").count()
      println(f"[opq-scale] $name%-12s recall@5 = ${nh.toDouble / nb}%.4f " +
        f"($nh/$nb) time=${t}%.1fs")
    }
    // HIGH probe coverage on purpose: at nProbe/nLists ≲ 10% the
    // reading is coverage-bound (the first run measured 0.06–0.25 at
    // 16/256 — noise about the probe term), and the question here is
    // the CODES' quality, which only becomes the binding constraint
    // once coverage stops being one
    for ((mm, rf) <- Seq((8, 2), (8, 4)); np <- Seq(64, 256)) {
      val ((pm, pidx), tP) = time {
        val r = Similarity.ivfPqBuildIndex(spark, vecs, nLists = nLists,
          m = mm, nCodes = 32)
        (r._1, r._2.cache())
      }
      pidx.count()
      val (pq, tPq) = time {
        val d = Similarity.ivfPqTopKFromIndex(spark, queries, pidx, pm,
          vecs, k = 5, nProbe = np, refine = rf).cache()
        d.count(); d
      }
      recallOf(f"pq_m${mm}r${rf}p$np", pq, tP + tPq)
      pidx.unpersist()
      val ((om, oidx), tO) = time {
        val r = Similarity.ivfOpqBuildIndex(spark, vecs, nLists = nLists,
          m = mm, nCodes = 32, iters = 4)
        (r._1, r._2.cache())
      }
      oidx.count()
      val (opq, tOpq) = time {
        val d = Similarity.ivfPqTopKFromIndex(spark, queries, oidx, om,
          vecs, k = 5, nProbe = np, refine = rf).cache()
        d.count(); d
      }
      recallOf(f"opq_m${mm}r${rf}p$np", opq, tO + tOpq)
      oidx.unpersist()
    }
    spark.stop()
  }
}
