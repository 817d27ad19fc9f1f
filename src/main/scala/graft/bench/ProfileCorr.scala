package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.gen.Generators
import graft.layout.LayoutConfig
import graft.metrics.{Centralities, Correlation}
import graft.functions.VecOps
import graft.api.GraphEm

/** Ad-hoc phase timing for the q40 correlation-benchmark pipeline. */
object ProfileCorr {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[profile] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }
    val g = Generators.roadNetwork(spark, 8, 8)
    val cfg = LayoutConfig(nComponents = 2, LMin = 1.0, numIterations = 5,
      sampleSize = 64, nNeighbors = 6, seed = 13)
    graft.util.Iterate.withSizedShuffle(spark, g.count()) {
      val em = timed("GraphEm ctor (eigen init)") { GraphEm(spark, g, cfg) }
      timed("runLayout 5 iters") { em.runLayout() }
      val radii = timed("radii persist") {
        val r = em.positions
          .select(col("id"), VecOps.norm(col("pos")).as("radius")).persist()
        r.count(); r
      }
      val cents = timed("centralities.all") {
        val c = Centralities.all(spark, g, em.nVertices).persist()
        c.count(); c
      }
      val joined = timed("join") {
        val j = radii.join(cents, "id").persist(); j.count(); j
      }
      val rhos = timed("spearmanMany x6") {
        Correlation.spearmanMany(joined, "radius",
          Seq("degree_centrality", "pagerank", "eigenvector", "closeness",
            "betweenness", "load"))
      }
      println(s"[profile] rhos=$rhos")
    }
    spark.stop()
  }
}
