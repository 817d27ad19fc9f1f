package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.NearDupStream

/** Probe: batch `dedupAgainstIndex` cost as the accumulated band-key
  * index grows — the backfill twin of ProbeNearDupStream's streaming
  * flatness measurement (r8 verdict #8). The reference side is a
  * K×-replicated corpus indexed the way the gate indexes it (replica
  * tokens disjoint, so true-match structure per replica is constant);
  * the NEW side is a fixed 5k-doc batch carrying plants. A flat-ish
  * per-probe wall as K grows is the evidence the equi-join probe
  * geometry holds — the new side never re-signatures the reference.
  *
  * Usage: SPARK_GRAFT_CPUS=16 sbt "runMain graft.bench.ProbeDedupIndex /root/testdata/sf0.1 1 4 10"
  */
object ProbeDedupIndex {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val repsList = if (args.length > 1) args.drop(1).map(_.toInt).toSeq else Seq(1, 4, 10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](b: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = b; (r, (System.nanoTime() - t0) / 1e9)
    }
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    // new batch: 4k fresh docs (replica tag r9_ disjoint from every
    // index replica) + 1k raw copies that must match replica 0
    val fresh = base.filter(col("doc_id") < 4000)
      .select((col("doc_id") + 90000000L).as("doc_id"),
        regexp_replace(col("text"), "(^| )", "$1r9x_").as("text"))
    val copies = base.filter(col("doc_id") >= 4000 && col("doc_id") < 5000)
      .select((col("doc_id") + 80000000L).as("doc_id"),
        regexp_replace(col("text"), "(^| )", "$1r0_").as("text"))
    val neu = fresh.union(copies).cache()
    val nNew = neu.count()
    repsList.foreach { reps =>
      val ref = (0 until reps).map { k =>
        base.select((col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), "(^| )", "$1r" + k + "_").as("text"))
      }.reduce(_ union _)
      val (index, tIdx) = time {
        val i = NearDupStream.bandKeys(ref)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        i.count(); i
      }
      val nIdx = index.count()
      val (dropped, tProbe) = time(
        NearDupStream.dedupAgainstIndex(neu, index, threshold = 0.5)
          .filter(!col("keep")).count())
      println(s"""{"probe":"dedup_index","reps":$reps,"index_rows":$nIdx,""" +
        s""""new_docs":$nNew,"index_build_sec":$tIdx,""" +
        s""""probe_sec":$tProbe,"dropped":$dropped}""")
      index.unpersist()
      ()
    }
    spark.stop()
  }
}
