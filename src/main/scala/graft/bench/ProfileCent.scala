package graft.bench

import org.apache.spark.sql.SparkSession
import graft.gen.Generators
import graft.metrics.Centralities

/** Ad-hoc timing for the distributed-centralities tier:
  * `runMain graft.bench.ProfileCent [n] [mPerV]`. Times each distributed
  * measure separately plus the fused BFS bundle — the tool behind the
  * centralities_distributed tier tuning; not part of the driver
  * contract. */
object ProfileCent {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(4039)
    val mPerV = args.lift(1).map(_.toInt).getOrElse(22)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(b: => T): T = {
      val t0 = System.nanoTime()
      val r = b
      println(f"[cent] $label ${(System.nanoTime() - t0) / 1e9}%.1fs")
      r
    }
    val g = Generators.barabasiAlbert(spark, n, mPerV, 42).cache()
    val m = g.count()
    println(s"[cent] graph n=$n m=$m")
    timed("pageRankDistributed")(
      Centralities.pageRankDistributed(spark, g, n).count())
    timed("eigenvectorDistributed")(
      Centralities.eigenvectorDistributed(spark, g, n).count())
    timed("closenessDistributed (forward BFS only)")(
      Centralities.closenessDistributed(spark, g, n).count())
    timed("fused BFS closeness+betweenness+load") {
      val (c, b, l) = Centralities.bfsMeasuresDistributed(spark, g, n)
      c.count() + b.count() + l.count()
    }
    timed("all() distributed")(
      Centralities.all(spark, g, n, broadcastEdgeMax = 0).count())
    timed("all() routed CSR")(
      Centralities.all(spark, g, n).count())
    spark.stop()
  }
}
