package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Similarity

/** IVF-PQ recall at the REALISTIC regime: `runMain
  * graft.bench.ProfileIvfPqScale [n] [latent]`.
  *
  * The sf0.01 curve in BASELINE.md is measured on a 500-vector
  * universe where 6/8 probes scan 75 % of the data — the probe-count
  * numbers don't transfer to n ≥ 1M. This profiler generates a
  * deterministic n≈1M, 64-dim corpus with latent cluster structure
  * (vectors = one of `latent` seeded Gaussian centers + noise, the
  * shape real embedding tables have), indexes it with nLists ≈ √n,
  * and sweeps the probe FRACTION (nProbe/nLists ∈ ~1–6 %) at the
  * q56 refine=20 exact re-rank — recall vs a 50-query brute-force
  * twin over the full corpus. Generation is a narrow seeded map
  * (bit-deterministic per id, any partitioning); nothing here touches
  * driver memory beyond the k-means training sample.
  * Not part of the driver contract.
  */
object ProfileIvfPqScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val latent = args.drop(1).headOption.map(_.toInt).getOrElse(512)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dim = 64
    // latent centers: seeded unit-scale gaussians, broadcast (~256 KB)
    val centers = Array.tabulate(latent) { c =>
      val r = new java.util.Random(1000L + c)
      Array.fill(dim)(r.nextGaussian().toFloat)
    }
    val bc = spark.sparkContext.broadcast(centers)
    val vecs = spark.range(n).map { id =>
      val r = new java.util.Random(id * 2654435761L + 7L)
      val c = bc.value((id % latent).toInt)
      (id, Array.tabulate(dim)(i => c(i) + 0.35f * r.nextGaussian().toFloat))
    }.toDF("vec_id", "embedding").repartition(spark.sparkContext.defaultParallelism)
      .cache()
    val nVecs = vecs.count()
    val queries = vecs.filter(col("vec_id") < 50).cache()
    val t0 = System.nanoTime()
    val brute = Similarity.bruteForceTopK(queries, vecs, k = 5)
      .select("qid", "rid").cache()
    val nb = brute.count()
    println(f"[ivfpq-scale] n=$nVecs latent=$latent brutePairs=$nb " +
      f"bruteTime=${(System.nanoTime() - t0) / 1e9}%.1fs")
    println("| nLists | nProbe | probe_frac | m | nCodes | refine | recall | time_s |")
    println("|---|---|---|---|---|---|---|---|")
    def cell(nLists: Int, nProbe: Int, m: Int, nCodes: Int, refine: Int): Unit = {
      val t = System.nanoTime()
      val ivf = Similarity.ivfPqTopK(spark, vecs, k = 5, nLists = nLists,
        nProbe = nProbe, m = m, nCodes = nCodes, refine = refine,
        trainCap = 50000, queriesOpt = Some(queries))
      val nh = ivf.select("qid", "rid")
        .join(brute, Seq("qid", "rid"), "left_semi").count()
      val dt = (System.nanoTime() - t) / 1e9
      val recall = if (nb == 0) 1.0 else nh.toDouble / nb
      println(f"| $nLists | $nProbe | ${nProbe.toDouble / nLists}%.3f | $m " +
        f"| $nCodes | $refine | $recall%.3f | $dt%.1f |")
    }
    // nLists = 1024 ≈ √n; probe fraction 0.8 % → 6.3 %
    for (nProbe <- Seq(8, 16, 32, 64)) cell(1024, nProbe, 8, 32, 20)
    // code-quality axis at the middle probe fraction — at this scale
    // recall is PQ-error-bound, not probe-bound (the 5-bit cells above
    // plateau), so sweep code bits, subspace count and refine depth
    cell(1024, 32, 8, 256, 20)
    cell(1024, 16, 8, 256, 50)
    cell(1024, 16, 16, 256, 20)
    // coarser index for comparison (probe fraction matched to 3.1 %)
    cell(512, 16, 8, 32, 20)
    // the auto-tuner's derivation at this n — ivfPqTopKAuto's cell
    val p = Similarity.ivfPqParamsFor(nVecs, dim, 5)
    println(s"[ivfpq-scale] auto params: $p")
    cell(p.nLists, p.nProbe, p.m, p.nCodes, p.refine)
    spark.stop()
  }
}
