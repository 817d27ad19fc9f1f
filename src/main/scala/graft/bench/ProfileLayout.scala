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
    // "er" / "ds" as first arg profile the bench's ER / dataset-scale
    // points instead of a grid
    val er = args.headOption.contains("er")
    val ds = args.headOption.contains("ds")
    val w = if (er || ds) 0 else args.lift(0).map(_.toInt).getOrElse(12)
    val h = if (er || ds) 0 else args.lift(1).map(_.toInt).getOrElse(12)
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
    val nV: Long = if (er) 500L else if (ds) 4039L else w.toLong * h
    val dim = if (er || ds) 3 else 2
    val g = timed("gen+count") {
      val g0 = if (er) Generators.erdosRenyi(spark, 500, 0.03, 42)
               else if (ds) Generators.barabasiAlbert(spark, 4039, 22, 42)
               else Generators.roadNetwork(spark, w, h)
      g0.cache(); g0.count(); g0
    }
    val init = timed("eigen init") {
      val i = EigenInit.init(spark, g, nV, dim, seed = 42)
      i.count(); i
    }
    val cfgBase =
      if (er || ds) LayoutConfig(nComponents = 3, LMin = if (ds) 4.0 else 10.0,
        kAttr = 0.5, kInter = 0.1, nNeighbors = 15, sampleSize = 512,
        numIterations = iters, seed = 42)
      else LayoutConfig(nComponents = 2, LMin = 1.0, numIterations = iters,
        sampleSize = 128, nNeighbors = 8, seed = 42)
    // PROFILE_GRID=1 forces the grid-ANN kNN branch in step()
    val cfg = if (sys.env.contains("PROFILE_GRID"))
      cfgBase.copy(exactKnnMaxRef = 0) else cfgBase
    if (sys.env.contains("PROFILE_EXPLAIN")) {
      val e0 = Layout.withEdgeIds(g).persist(); val m0 = e0.count()
      val (p0, _) = graft.util.Iterate.checkpoint(spark, init)
      Layout.step(spark, e0, p0, cfg, 0, m0, nV).explain("formatted")
      spark.stop(); return
    }
    // mirror Layout.run's loop exactly, with per-iteration timing
    val e = Layout.withEdgeIds(g).persist()
    val m = e.count()
    val eS = e.coalesce(graft.util.Iterate.sizedPartitions(spark, m))
    graft.util.Iterate.withSizedShuffle(spark, m) {
      var (pos, handle) = graft.util.Iterate.checkpoint(spark,
        init.coalesce(graft.util.Iterate.sizedPartitions(spark, 0L)))
      val n = pos.count()
      var it = 0
      while (it < iters) {
        val (next, nh) = timed(s"iter $it") {
          graft.util.Iterate.checkpoint(spark,
            Layout.step(spark, eS, pos, cfg, it, m, n))
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
    val init2 = EigenInit.init(spark, g, nV, dim, seed = 42)
    timed("full Layout.run for comparison") {
      Layout.run(spark, g, init2, cfg).count()
    }
    spark.stop()
  }
}
