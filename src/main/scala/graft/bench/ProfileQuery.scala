package graft.bench

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-stage measurement tool (guide §1: measure first): run ONE
  * SparkEntry query and print, per completed stage, wall, executor CPU,
  * executor run time, task count, shuffle read/write bytes and records,
  * plus the stage's first job description — so a 40 s-CPU query can be
  * blamed on its actual stage instead of guessed at from the plan.
  *
  * Usage: runMain graft.bench.ProfileQuery <queryName> [sfDir] [reps]
  * Prints the ranked stage table to stderr and a one-line JSON summary
  * to stdout. Not part of the bench contract; a diagnosis tool only.
  */
object ProfileQuery {
  final case class StageRow(id: Int, name: String, tasks: Int,
    wallMs: Long, cpuMs: Long, runMs: Long,
    shRead: Long, shWrite: Long, inRec: Long, outRec: Long)

  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // diagnosis-only knob: decouple shuffle width from the core count
    // to A/B a stage's cost against its partition count
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val stages = mutable.ArrayBuffer.empty[StageRow]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        val wall = (for (a <- si.completionTime; b <- si.submissionTime)
          yield a - b).getOrElse(-1L)
        stages.synchronized {
          stages += StageRow(si.stageId, si.name.takeWhile(_ != '\n'),
            si.numTasks, wall, m.executorCpuTime / 1000000,
            m.executorRunTime,
            m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.inputMetrics.recordsRead, m.outputMetrics.recordsWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    var dt = 0.0d
    var rows = 0L
    (1 to reps).foreach { i =>
      if (i > 1) stages.synchronized(stages.clear())
      val t0 = System.nanoTime()
      rows = graft.SparkEntry.queries(name)(spark, sfDir).count()
      dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[profile] rep $i: $name rows=$rows wall=$dt%.2fs")
    }
    // drain the listener bus so the last stages land
    org.apache.spark.graftbridge.ListenerBridge.flush(spark.sparkContext)
    val snap = stages.synchronized(stages.toVector)
    val totCpu = snap.map(_.cpuMs).sum / 1000.0
    val totRun = snap.map(_.runMs).sum / 1000.0
    System.err.println(f"[profile] $name wall=$dt%.2fs cpu=$totCpu%.1fs " +
      f"run=$totRun%.1fs stages=${snap.size} tasks=${snap.map(_.tasks).sum}")
    System.err.println(
      "  stageId  tasks   wall_ms    cpu_ms    run_ms   sh_read  sh_write" +
      "    in_rec   out_rec  name")
    snap.sortBy(-_.cpuMs).take(40).foreach { s =>
      System.err.println(
        f"  ${s.id}%7d ${s.tasks}%6d ${s.wallMs}%9d ${s.cpuMs}%9d " +
        f"${s.runMs}%9d ${s.shRead}%9d ${s.shWrite}%9d ${s.inRec}%9d " +
        f"${s.outRec}%9d  ${s.name}")
    }
    println(f"""{"query":"$name","rows":$rows,"wall_sec":$dt%.3f,""" +
      f""""cpu_sec":$totCpu%.3f,"run_sec":$totRun%.3f,""" +
      f""""n_stages":${snap.size},"n_tasks":${snap.map(_.tasks).sum}}""")
    spark.stop()
  }
}
