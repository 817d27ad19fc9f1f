package graft

import org.apache.spark.sql.SparkSession

/** Child JVM for [[CrossProcessSpec]]: races one manifest commit
  * against a sibling process on the SAME generation of the same
  * index. The in-JVM races in SnapshotSpec share one filesystem
  * object and one process; this child shares NOTHING with its rival
  * but the directory on disk, so the create-exclusive loud-fail in
  * `IndexManifest.writeManifest` is exercised across a real process
  * boundary (r14 verdict #4).
  *
  * Protocol (all file-based, no stdout parsing — Spark logs own
  * stdout): the child opens its own SparkSession, resolves the
  * current snapshot, writes `readyFile`, spin-waits for `goFile`
  * (the parent's barrier drop), then attempts
  * `commitAt(dir, gen, currentLeaves)` and writes `WIN ...` or
  * `LOSE <exception>` to `outFile`. */
object CommitRaceChild {
  def main(args: Array[String]): Unit = {
    val Array(dir, genS, readyFile, goFile, outFile) = args
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-commit-race-child")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val result =
      try {
        val cur = graft.streaming.IndexManifest.current(spark, dir)
          .getOrElse(sys.error(s"child: $dir is not enrolled"))
        java.nio.file.Files.write(java.nio.file.Paths.get(readyFile),
          "ready".getBytes("UTF-8"))
        val go = new java.io.File(goFile)
        while (!go.exists()) Thread.sleep(2)
        val snap = graft.streaming.IndexManifest.commitAt(spark, dir,
          genS.toLong, cur.leaves)
        s"WIN gen=${snap.gen}"
      } catch {
        case t: Throwable =>
          s"LOSE ${t.getClass.getSimpleName}: " +
            String.valueOf(t.getMessage).replace('\n', ' ')
      } finally spark.stop()
    java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      result.getBytes("UTF-8"))
  }
}
