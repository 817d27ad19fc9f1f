package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gen.Generators
import graft.layout.{Layout, LayoutConfig}
import graft.linalg.EigenInit

/** Ad-hoc per-phase timing for the layout pipeline (q21 shape):
  * `runMain graft.bench.ProfileLayout [w] [h] [iters]`. Prints eigen
  * time and per-iteration step times — the tool behind the loop's
  * scheduler-floor tuning; not part of the driver contract.
  */
object ProfileLayout {
  def main(args: Array[String]): Unit = {
    val w = args.lift(0).map(_.toInt).getOrElse(12)
    val h = args.lift(1).map(_.toInt).getOrElse(12)
    val iters = args.lift(2).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    val taskMs = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (sys.env.contains("PROFILE_STAGES"))
          println(s"[stage] ${s.stageInfo.stageId} tasks=${s.stageInfo.numTasks} ${s.stageInfo.name.take(120)}")
      }
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    def timed[T](label: String)(body: => T): T = {
      val (j0, s0, t0n, tm0) = (jobs.get, stages.get, tasks.get, taskMs.get)
      val t0 = System.nanoTime()
      val r = body
      Thread.sleep(150) // let listener events drain
      println(f"[profile] $label ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"jobs=${jobs.get - j0} stages=${stages.get - s0} tasks=${tasks.get - t0n} " +
        s"taskTime=${(taskMs.get - tm0) / 1000.0}s")
      r
    }
    val g = timed("grid gen+count") {
      val g = Generators.roadNetwork(spark, w, h); g.count(); g
    }
    val init = timed("eigen init") {
      val i = EigenInit.init(spark, g, (w * h).toLong, 2, seed = 42)
      i.count(); i
    }
    val cfg = LayoutConfig(nComponents = 2, LMin = 1.0, numIterations = iters,
      sampleSize = 128, nNeighbors = 8, seed = 42)
    val e = Layout.withEdgeIds(g).persist()
    val m = e.count()
    graft.util.Iterate.withSizedShuffle(spark, m) {
      var (pos, handle) = graft.util.Iterate.checkpoint(spark, init)
      val n = pos.count()
      var it = 0
      while (it < iters) {
        val (next, nh) = timed(s"iter $it") {
          graft.util.Iterate.checkpoint(spark,
            Layout.step(spark, e, pos, cfg, it, m, n))
        }
        timed(s"iter $it normalize") {
          pos = Layout.normalize(next, cfg.nComponents)
        }
        handle.unpersist(blocking = false)
        handle = nh
        pos = next
        it += 1
      }
    }
    // fresh init frame: Iterate.checkpoint consumed init.rdd above and
    // unpersisted it — reusing the same Dataset would read dead blocks.
    val init2 = EigenInit.init(spark, g, (w * h).toLong, 2, seed = 42)
    timed("full Layout.run for comparison") {
      Layout.run(spark, g, init2, cfg).count()
    }
    spark.stop()
  }
}
