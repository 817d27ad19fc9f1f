package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.NearDupStream

/** Throughput of the cross-batch near-dup gate at ingest scale: drive
  * [[NearDupStream.filterBatch]] over the sf1-equivalent 50k-doc
  * corpus in 10k-doc micro-batches, index accumulating in parquet
  * (the attach() storage layout), and print per-batch wall / index
  * size / survivor count — the evidence that per-batch cost tracks
  * BATCH size (the index side is an equi-join probe), not corpus size.
  *
  * `reps` replicates the corpus with replica-disjoint token spaces
  * (the PipelineScaleProbe scheme: every token prefixed `r<k>_`, ids
  * offset), growing the accumulated index an order of magnitude past
  * the r7d run while each replica reproduces the base corpus's exact
  * near-dup structure — the flatness claim is only proven as far as
  * the index has actually grown (r7 verdict #6).
  *
  * Usage: runMain graft.bench.ProbeNearDupStream /tmp/sf1eq [batchRows] [reps]
  */
object ProbeNearDupStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/sf1eq")
    val batchRows = args.lift(1).map(_.toInt).getOrElse(10000)
    val reps = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val nBase = base.count()
    val docs = (0 until reps).map { k =>
      base.select((col("doc_id") + lit(k * nBase)).as("doc_id"),
        regexp_replace(col("text"), "(^| )", "$1r" + k + "_").as("text"))
    }.reduce(_ union _).cache()
    val n = docs.count()
    val idxDir = java.nio.file.Files
      .createTempDirectory("ndup_idx").toString + "/index"
    var lo = 0L
    var batch = 0
    while (lo < n) {
      batch += 1
      val b = docs.filter(col("doc_id") >= lo && col("doc_id") < lo + batchRows)
      val index = NearDupStream.readIndex(spark, idxDir, 64)
      val t0 = System.nanoTime()
      val (surv, add) = NearDupStream.filterBatch(b, index, threshold = 0.5)
      val nSurv = surv.count()
      add.write.mode("append").parquet(idxDir)
      add.unpersist()
      val dt = (System.nanoTime() - t0) / 1e9
      val idxRows = spark.read.parquet(idxDir).count()
      println(f"[ndup-stream] batch $batch rows=$batchRows survivors=$nSurv " +
        f"indexRows=$idxRows wall=${dt}%.1fs " +
        f"(${batchRows / dt}%.0f docs/s)")
      lo += batchRows
    }
    spark.stop()
  }
}
