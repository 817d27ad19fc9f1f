package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.{IndexManifest, NearDupStream}

/** Gate-index growth bound at the UNBOUNDED-corpus regime (r14
  * verdict #6): the fp/band GATE indexes are append-only across the
  * corpus lifetime — ProbeNearDupStream measured the per-batch PROBE
  * flat to 8 M accrued rows (r8b, 50× growth), but the COMPACTION that
  * folds the per-trigger litter had no measured cost at the 10⁷-row
  * regime, so the cadence knob ([[NearDupStream
  * .compactIndexIfFragmented]] maxBatches) was untuned. This probe
  * builds a 10⁷-row band-key index in the production shape (nBatches
  * per-trigger leaf dirs, manifest-enrolled, copy-on-write compaction
  * + vacuum) and measures:
  *
  *  - probe_frag_sec — [[NearDupStream.filterBatch]] of a fresh
  *    real-signature batch against the FRAGMENTED index (the cost a
  *    lazy cadence pays every trigger);
  *  - compact_sec — [[NearDupStream.compactIndex]] at 10⁷ rows
  *    (read + range-repartition by bucket + sort + write + commit);
  *  - vacuum_sec — reclaiming the retired leaves;
  *  - probe_compact_sec — the same filterBatch against the compacted
  *    index (the cost a fresh compaction buys back).
  *
  * Index ROWS are synthetic (hash-derived buckets/sigs — compaction
  * and scan mechanics are content-agnostic; the probe-side flatness
  * with REAL signatures is r8b's measurement); the probed batch runs
  * the real minhash pipeline on the `documents` table.
  *
  * Usage: runMain graft.bench.ProbeGateIndexScale <sfDir> [nIndexRows] [nBatches]
  */
object ProbeGateIndexScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nIndexRows = args.lift(1).map(_.toLong).getOrElse(10000000L)
    val nBatches = args.lift(2).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](b: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = b
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val root = java.nio.file.Files
      .createTempDirectory("graft_gate_probe").toString
    val dir = s"$root/index"
    val bands = 16
    val nDocs = nIndexRows / bands
    val perBatch = (nDocs + nBatches - 1) / nBatches

    // forge the accrued index: per-trigger leaf dirs in the real
    // layout/schema, hash-derived content (ids disjoint from the
    // probed batch's id space)
    val (_, tForge) = time {
      (0 until nBatches).foreach { b =>
        val lo = 1000000000L + b * perBatch
        spark.range(lo, math.min(lo + perBatch, 1000000000L + nDocs))
          .select(col("id").as("doc_id"),
            explode(sequence(lit(0), lit(bands - 1))).as("band"))
          .select(col("doc_id"), col("band"),
            md5(concat_ws("_", col("doc_id") % 5000000, col("band")))
              .as("bucket"),
            transform(sequence(lit(0L), lit(63L)),
              x => xxhash64(col("doc_id"), col("band"), x)).as("sig"))
          .write.mode("overwrite").parquet(s"$dir/batch=$b")
      }
    }
    IndexManifest.enroll(spark, dir)
    val idxRows = NearDupStream.readIndex(spark, dir, 64).count()

    val batch = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    def probeOnce(): Double = {
      val index = NearDupStream.readIndex(spark, dir, 64)
      val (_, t) = time {
        val (surv, add) = NearDupStream.filterBatch(batch, index,
          threshold = 0.5)
        surv.count()
        add.unpersist()
      }
      t
    }
    probeOnce() // warm (code paths, parquet footers)
    val probeFrag = (1 to 3).map(_ => probeOnce()).min

    val (_, tCompact) = time(NearDupStream.compactIndex(spark, dir, 64,
      partitions = cpus.toInt))
    val (nVac, tVacuum) = time(IndexManifest.vacuum(spark, dir,
      keepGens = 1, pendingOk = true))
    val leavesAfter = IndexManifest.pin(spark, dir).leaves.size
    val probeCompact = (1 to 3).map(_ => probeOnce()).min

    println(s"""{"metric":"gate_index_scale","index_rows":$idxRows,""" +
      s""""n_batches":$nBatches,"forge_sec":$tForge,""" +
      s""""probe_frag_sec":$probeFrag,"compact_sec":$tCompact,""" +
      s""""vacuum_sec":$tVacuum,"vacuum_removed":$nVac,""" +
      s""""leaves_after":$leavesAfter,""" +
      s""""probe_compact_sec":$probeCompact}""")
    spark.stop()
  }
}
