package graft.bench

import org.apache.spark.sql.SparkSession
import graft.streaming.ModelStore

/** Model-epoch chain cost at the LONG-LIVED-index regime (r14 verdict
  * #5): [[ModelStore]] accumulates one `_models/gen-N/` directory per
  * model-changing commit, so a year of hourly retrains is ~10⁴ epochs
  * — and every pinned-probe model resolution ([[ModelStore.readAt]])
  * starts with a listing of that directory. [[ModelStore.vacuumModels]]
  * bounds the chain, but the costs BETWEEN vacuums were unmeasured.
  * This probe forges the regime and measures the envelope:
  *
  *  - epoch_write_sec — one real [[ModelStore.write]] landing at the
  *    top of an nEpochs-deep chain (depth-independent by construction:
  *    write never lists, it mkdirs + renames one staged dir);
  *  - resolve_sec — [[ModelStore.readAt]] at the deepest chain: one
  *    `listStatus` of nEpochs directory entries + one epoch's parquet
  *    read (the per-pinned-probe price);
  *  - listgens_sec — the listing alone, isolating directory pressure
  *    from the (constant) model read;
  *  - vacuum_sec — [[ModelStore.vacuumModels]] sweeping all but the
  *    resolving epoch: nEpochs−1 recursive directory deletes.
  *
  * Epochs 1..n−1 are FS-level copies of one real epoch (template
  * written by ModelStore.write itself — same file inventory), so the
  * probe measures directory mechanics, not Spark job launches.
  *
  * Usage: runMain graft.bench.ProbeModelStoreScale [nEpochs]
  */
object ProbeModelStoreScale {
  def main(args: Array[String]): Unit = {
    val nEpochs = args.headOption.map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](b: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = b
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val root = java.nio.file.Files
      .createTempDirectory("graft_modelstore_probe").toString
    val dir = s"$root/idx"
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)

    // one REAL epoch (float tier, 16 lists × dim 32) as the template
    val centers = Array.tabulate(16)(l =>
      Array.tabulate(32)(d => (l * 31 + d * 7) % 97 / 97.0))
    ModelStore.write(spark, dir, 0L, ModelStore.FloatCenters(centers))
    val template = new org.apache.hadoop.fs.Path(s"$dir/_models/gen-000000000")

    // forge the chain: epochs 1..n-1 are byte-copies of the template
    val (_, tForge) = time {
      (1 until nEpochs).foreach { g =>
        val dst = new org.apache.hadoop.fs.Path(
          f"$dir/_models/gen-$g%09d")
        org.apache.hadoop.fs.FileUtil.copy(fs, template, fs, dst,
          false, conf)
      }
    }

    // incremental write at depth: the real per-retrain cost
    val (_, tWrite) = time(ModelStore.write(spark, dir, nEpochs.toLong,
      ModelStore.FloatCenters(centers)))

    // resolve at the deepest chain (median of 9 — first call may pay
    // dentry-cache warmup, which S3 deployments pay every time)
    val reps = 9
    val resolves = (1 to reps).map { _ =>
      val (m, t) = time(ModelStore.readAt(spark, dir, Long.MaxValue))
      require(m.nonEmpty, "probe: resolve returned no model"); t
    }.sorted
    val tResolveFirst = resolves.last // includes the cold outlier
    val tResolve = resolves(reps / 2)

    val lists = (1 to reps).map { _ =>
      val (g, t) = time(ModelStore.listGens(spark, dir))
      require(g.size == nEpochs + 1, s"probe: expected ${nEpochs + 1} " +
        s"epochs, listed ${g.size}"); t
    }.sorted
    val tList = lists(reps / 2)

    // vacuum to the single resolving epoch
    val (nRemoved, tVacuum) = time(ModelStore.vacuumModels(spark, dir,
      Seq(Long.MaxValue)))

    println(s"""{"metric":"modelstore_scale","n_epochs":$nEpochs,""" +
      s""""forge_sec":$tForge,"epoch_write_sec":$tWrite,""" +
      s""""resolve_median_sec":$tResolve,"resolve_max_sec":$tResolveFirst,""" +
      s""""listgens_median_sec":$tList,""" +
      s""""vacuum_sec":$tVacuum,"vacuum_removed":$nRemoved}""")
    spark.stop()
  }
}
