package graft.bench

import org.apache.spark.sql.SparkSession
import graft.streaming.IndexManifest

/** Tombstone-probe cost at the LONG-LIVED-stream regime (r15g): the
  * committed-batch tombstone list grows one line per trigger EVER
  * committed, and [[IndexManifest.installBatch]] consults it on every
  * fresh trigger — at 10⁶ lifetime triggers a naive per-trigger parse
  * of the ~14 MB list would re-grow exactly the O(history) trigger
  * cost the delta manifests removed. The max-id fast path answers a
  * genuinely fresh id from one ~16-byte read. This probe forges the
  * regime (vacuum-written files, real code paths) and measures:
  *
  *  - fresh_fast_sec — tombstoned() for id > max (the per-trigger
  *    steady-state price, max file present);
  *  - pruned_full_sec — tombstoned() for a tombstoned id (the rare
  *    replay-of-pruned-history path: full list parse);
  *  - fresh_fallback_sec — the same fresh id with the max file
  *    removed (the pre-r15g / crashed-max fallback: full parse).
  *
  * Usage: runMain graft.bench.ProbeTombstoneScale [nTombstones]
  */
object ProbeTombstoneScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](reps: Int)(b: => T): Double = {
      b // warm
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); b
        (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(reps / 2)
    }

    val root = java.nio.file.Files
      .createTempDirectory("graft_tomb_probe").toString
    val dir = s"$root/idx"
    val md = new java.io.File(s"$dir/_manifests")
    md.mkdirs()
    // forge the vacuum-written state directly (same bytes vacuum
    // writes: sorted batch=<id> lines + the max file)
    val w = new java.io.PrintWriter(
      new java.io.File(md, "committed-batches.txt"), "UTF-8")
    (0 until n).foreach(i => w.println(s"batch=$i"))
    w.close()
    val wm = new java.io.PrintWriter(
      new java.io.File(md, "committed-batches.max"), "UTF-8")
    wm.print((n - 1).toString); wm.close()
    val bytes = new java.io.File(md, "committed-batches.txt").length()

    val freshId = s"batch=${n + 7}"
    val prunedId = s"batch=${n / 2}"
    val tFast = time(9) {
      require(!IndexManifest.tombstoned(spark, dir, freshId))
    }
    val tFull = time(9) {
      require(IndexManifest.tombstoned(spark, dir, prunedId))
    }
    new java.io.File(md, "committed-batches.max").delete()
    val tFallback = time(9) {
      require(!IndexManifest.tombstoned(spark, dir, freshId))
    }

    println(s"""{"metric":"tombstone_scale","n_tombstones":$n,""" +
      s""""tombstone_bytes":$bytes,"fresh_fast_sec":$tFast,""" +
      s""""pruned_full_sec":$tFull,"fresh_fallback_sec":$tFallback}""")
    spark.stop()
  }
}
