package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline.Similarity

/** IVF-PQ recall sweep: `runMain graft.bench.ProfileIvfPq [sfDir]`.
  * Sweeps nProbe ∈ {1,2,4,8} × nLists ∈ {8,16,32} at k=5 on the
  * embeddings table, reporting recall vs the brute-force twin (capped
  * at vec_id < 50 query set, like q56) and wall time per cell — the
  * measurement behind the q56 default parameters recorded in
  * BASELINE.md. Not part of the driver contract. */
object ProfileIvfPq {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, sfDir).cache()
    val nVecs = e.count()
    val brute = Similarity.bruteForceTopK(e.filter(col("vec_id") < 50), e, k = 5)
      .select("qid", "rid").cache()
    val nb = brute.count()
    println(s"[ivfpq] sfDir=$sfDir nVecs=$nVecs brutePairs=$nb")
    println("| nLists | nProbe | m | nCodes | refine | recall | time_s |")
    println("|---|---|---|---|---|---|---|")
    def cell(nLists: Int, nProbe: Int, m: Int, nCodes: Int, refine: Int): Unit = {
      val t0 = System.nanoTime()
      val ivf = Similarity.ivfPqTopK(spark, e, k = 5, nLists = nLists,
        nProbe = nProbe, m = m, nCodes = nCodes, refine = refine)
      val nh = ivf.filter(col("qid") < 50).select("qid", "rid")
        .join(brute, Seq("qid", "rid"), "left_semi").count()
      val dt = (System.nanoTime() - t0) / 1e9
      val recall = if (nb == 0) 1.0 else nh.toDouble / nb
      println(f"| $nLists | $nProbe | $m | $nCodes | $refine | $recall%.3f | $dt%.1f |")
    }
    // probe axis at the r4 quantization defaults
    for (nLists <- Seq(8, 16, 32); nProbe <- Seq(1, 2, 4, 8))
      cell(nLists, nProbe, 8, 32, 4)
    // quantization axes: the probe-all cells above showed the recall
    // ceiling is PQ error, not probe count — sweep code size and the
    // exact-rerank shortlist at fixed (8 lists, 2/4 probes)
    for (nProbe <- Seq(2, 4); m <- Seq(8, 16); nCodes <- Seq(32, 256);
         refine <- Seq(4, 10))
      cell(8, nProbe, m, nCodes, refine)
    // the nProbe≤4 cells plateau at probe coverage (0.544 / 0.756 at
    // sf0.01 no matter how good the codes) — the ≥0.8 regime needs
    // high probe count AND a deeper exact-rerank shortlist
    for (nProbe <- Seq(6, 8); refine <- Seq(10, 20))
      cell(8, nProbe, 8, 32, refine)
    cell(8, 8, 8, 256, 10)
    cell(16, 8, 8, 32, 10)
    cell(16, 12, 8, 32, 10)
    spark.stop()
  }
}
