package graft

import org.apache.spark.sql.functions._
import graft.gen.Generators
import graft.metrics.{Centralities, Correlation}

/** Centrality and correlation invariants against closed-form values on
  * canonical small graphs (the reference validates the same measures
  * via NetworkX, benchmark.py:73-107). */
class MetricsSpec extends SparkSpec {

  import spark.implicits._

  private def star(n: Int) =
    (1 until n).map(i => (0L, i.toLong)).toDF("src", "dst")

  test("degree centrality: star center is 1") {
    val dc = Centralities.degreeCentrality(star(8), 8)
    assert(math.abs(dc.filter(col("id") === 0).collect()(0).getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(dc.filter(col("id") === 1).collect()(0).getDouble(1) - 1.0 / 7) < 1e-12)
  }

  test("betweenness: star center 1, leaves 0; P3 middle 1") {
    val b = Centralities.betweenness(spark, star(8), 8).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(b(0L) - 1.0) < 1e-12)
    assert((1L to 7L).forall(i => b(i) == 0.0))
    val p3 = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val bp = Centralities.betweenness(spark, p3, 3).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(bp(1L) - 1.0) < 1e-12)
  }

  test("closeness: star center 1; leaf (n-1)/(1+2(n-2)) scaled") {
    val c = Centralities.closeness(spark, star(8), 8).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(c(0L) - 1.0) < 1e-12)
    val expectLeaf = (7.0 / 7.0) * (7.0 / (1 + 2 * 6))
    assert(math.abs(c(1L) - expectLeaf) < 1e-12)
  }

  test("pagerank sums to 1 and ranks the star center highest") {
    val pr = Centralities.pageRank(spark, star(8)).cache()
    val total = pr.agg(sum("pagerank")).collect()(0).getDouble(0)
    assert(math.abs(total - 1.0) < 1e-6)
    val top = pr.orderBy(desc("pagerank")).limit(1).collect()(0).getLong(0)
    assert(top == 0L)
    pr.unpersist()
  }

  test("eigenvector centrality: K3 is uniform, star center highest") {
    val k3 = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")
    val ev = Centralities.eigenvectorCentrality(spark, k3, 3).collect()
      .map(_.getDouble(1))
    assert(ev.max - ev.min < 1e-9)
    val evs = Centralities.eigenvectorCentrality(spark, star(6), 6)
      .orderBy(desc("eigenvector")).limit(1).collect()(0).getLong(0)
    assert(evs == 0L)
  }

  test("largest connected component extracts the bigger piece") {
    val twoComp = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L)).toDF("src", "dst")
    val lcc = graft.model.GraphOps.largestComponent(spark, twoComp)
    assert(lcc.count() == 3)
    assert(lcc.filter(col("src") >= 10).isEmpty)
  }

  test("spearman: monotone 1, anti-monotone -1, ties handled") {
    val df = (1 to 20).map(i => (i.toDouble, i * i.toDouble)).toDF("x", "y")
    assert(math.abs(Correlation.spearman(df, "x", "y") - 1.0) < 1e-12)
    val df2 = (1 to 20).map(i => (i.toDouble, -i.toDouble)).toDF("x", "y")
    assert(math.abs(Correlation.spearman(df2, "x", "y") + 1.0) < 1e-12)
    // scipy parity on a tied sample: x=[1,2,2,3], y=[1,3,2,4] with
    // average ranks rx=[1,2.5,2.5,4] → rho=0.9486832980505138
    val df3 = Seq((1.0, 1.0), (2.0, 3.0), (2.0, 2.0), (3.0, 4.0)).toDF("x", "y")
    assert(math.abs(Correlation.spearman(df3, "x", "y") - 0.9486832980505138) < 1e-9)
  }

  test("correlation matrix: diagonal 1, symmetric, constant guard NaN") {
    val df = (1 to 15).map(i => (i.toDouble, 16.0 - i, 5.0)).toDF("a", "b", "c")
    val m = Correlation.matrix(spark, df, Seq("a", "b", "c")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(m(("a", "a")) == 1.0)
    assert(math.abs(m(("a", "b")) + 1.0) < 1e-12)
    assert(m(("a", "b")) == m(("b", "a")))
    assert(m(("a", "c")).isNaN)
  }

  test("bootstrap CI brackets the point estimate") {
    val df = (1 to 30).map(i => (i.toDouble, i + (i % 5).toDouble)).toDF("x", "y")
    val rho = Correlation.spearman(df, "x", "y")
    val (lo, hi) = Correlation.bootstrapCi(spark, df, "x", "y", resamples = 30)
    assert(lo <= rho && rho <= hi)
  }

  test("centralities.all joins every measure") {
    val g = Generators.roadNetwork(spark, 3, 3)
    val all = Centralities.all(spark, g, 9)
    assert(all.count() == 9)
    assert(all.columns.toSet == Set("id", "degree_centrality", "pagerank",
      "eigenvector", "closeness", "betweenness"))
  }
}
