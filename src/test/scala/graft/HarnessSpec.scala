package graft

import graft.bench.Harness
import graft.layout.LayoutConfig

/** End-to-end benchmark-harness smoke (t1 pipeline shape, SURVEY §7). */
class HarnessSpec extends SparkSpec {

  private val cfg = LayoutConfig(nComponents = 2, LMin = 1.0,
    numIterations = 3, sampleSize = 32, nNeighbors = 4, seed = 11)

  test("correlation benchmark: one rho per centrality, all in [-1,1] or NaN") {
    val g = graft.gen.Generators.roadNetwork(spark, 5, 5)
    val rows = Harness.correlationBenchmark(spark, g, cfg).collect()
    assert(rows.length == 6) // five classic measures + load
    rows.foreach { r =>
      val rho = r.getDouble(1)
      assert(rho.isNaN || (rho >= -1.0 && rho <= 1.0), s"bad rho $rho")
    }
  }

  test("GraphEm.correlationReport runs off the facade's own positions") {
    val g = graft.gen.Generators.roadNetwork(spark, 5, 5)
    val em = graft.api.GraphEm(spark, g, cfg)
    em.runLayout()
    val rows = em.correlationReport().collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val rho = r.getDouble(1)
      assert(rho.isNaN || (rho >= -1.0 && rho <= 1.0), s"bad rho $rho")
    }
    // figure output: 6 facets (one per measure), 25 vertices each
    val svg = em.plotRadialVsCentrality()
    assert(svg.startsWith("<svg ") && svg.endsWith("</svg>"))
    assert(svg.contains(">pagerank<") && svg.contains(">load<"))
    assert(svg.sliding(7).count(_ == "<circle") == 6 * 25)
  }

  test("influence benchmark: three methods, sane spreads and times") {
    import spark.implicits._
    val star = (1 to 12).map(i => (0L, i.toLong)).toDF("src", "dst")
    val rows = Harness.influenceBenchmark(spark, star, k = 2, p = 0.5,
      cfg = cfg, greedyPool = 6).collect()
    assert(rows.map(_.getString(0)).toSet == Set("graphem", "greedy", "random"))
    rows.foreach { r =>
      assert(r.getDouble(1) >= 1.0 && r.getDouble(1) <= 13.0)
      assert(r.getDouble(2) > 0.0)
    }
  }
}
