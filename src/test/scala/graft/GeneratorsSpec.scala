package graft

import org.apache.spark.sql.functions._
import graft.gen.Generators
import graft.model.GraphOps

/** Structural-invariant battery mirroring the reference's generator
  * tests (tests/test_generators.py:23-57): canonical src<dst, no
  * self-loops, no duplicates, exact counts for deterministic shapes,
  * same-seed reproducibility, different-seed divergence. */
class GeneratorsSpec extends SparkSpec {

  test("road network 3x3 has exactly 12 edges, all canonical") {
    val g = Generators.roadNetwork(spark, 3, 3)
    assert(g.count() == 12)
    assert(GraphOps.isCanonical(g))
  }

  test("balanced binary tree h=2 has 6 edges over 7 nodes") {
    val g = Generators.balancedTree(spark, 2, 2)
    assert(g.count() == 6)
    assert(GraphOps.vertices(g).count() == 7)
    assert(GraphOps.isCanonical(g))
  }

  test("caveman 3 cliques of 4 has 3*C(4,2)=18 edges") {
    val g = Generators.caveman(spark, 3, 4)
    assert(g.count() == 18)
    assert(GraphOps.isCanonical(g))
    // every edge stays within its block
    assert(g.filter(floor(col("src") / 4) =!= floor(col("dst") / 4)).count() == 0)
  }

  test("ring lattice n=10 k=4 has 20 edges, all degree 4") {
    val g = Generators.ringLattice(spark, 10, 4)
    assert(g.count() == 20)
    val degs = GraphOps.degrees(g).select("degree").distinct().collect()
    assert(degs.length == 1 && degs(0).getLong(0) == 4)
  }

  test("erdos-renyi is canonical, seed-reproducible, seed-sensitive") {
    val g1 = Generators.erdosRenyi(spark, 100, 0.1, 7)
    val g2 = Generators.erdosRenyi(spark, 100, 0.1, 7)
    val g3 = Generators.erdosRenyi(spark, 100, 0.1, 8)
    assert(GraphOps.isCanonical(g1))
    assert(g1.exceptAll(g2).isEmpty && g2.exceptAll(g1).isEmpty)
    assert(g1.exceptAll(g3).count() > 0)
    // edge count within loose binomial bounds around p*C(n,2)=495
    val m = g1.count()
    assert(m > 300 && m < 700, s"unexpected edge count $m")
  }

  test("sbm respects p_in >> p_out") {
    val g = Generators.sbm(spark, 50, 4, 0.3, 0.01, 11)
    val inBlock = g.filter(floor(col("src") / 50) === floor(col("dst") / 50)).count()
    val crossBlock = g.count() - inBlock
    assert(inBlock > crossBlock * 2)
    assert(GraphOps.isCanonical(g))
  }

  test("geometric grid-bucketed join equals brute force") {
    val n = 200L
    val radius = 0.15
    val g = Generators.geometric(spark, n, radius, 2, 5)
    // brute force over the same hashed points
    val pts = spark.range(n).toDF("id").select(col("id"),
      Generators.hashUniform(5, col("id")).as("x"),
      Generators.hashUniform(6, col("id")).as("y"))
    val a = pts.select(col("id").as("src"), col("x").as("ax"), col("y").as("ay"))
    val b = pts.select(col("id").as("dst"), col("x").as("bx"), col("y").as("by"))
    val brute = a.crossJoin(b).filter(col("src") < col("dst") &&
      (col("ax") - col("bx")) * (col("ax") - col("bx")) +
        (col("ay") - col("by")) * (col("ay") - col("by")) < radius * radius)
      .select("src", "dst")
    assert(g.exceptAll(brute).isEmpty && brute.exceptAll(g).isEmpty)
    assert(g.count() > 0)
  }

  test("barabasi-albert grows n-m attachments of m edges") {
    val g = Generators.barabasiAlbert(spark, 50, 2, 3)
    assert(GraphOps.isCanonical(g))
    assert(g.count() == (50 - 2) * 2)
    // new nodes have degree >= m
    val minDeg = GraphOps.degrees(g).agg(min("degree")).collect()(0).getLong(0)
    assert(minDeg >= 1)
  }

  test("random regular: every vertex has degree d") {
    val g = Generators.randomRegular(spark, 20, 3, 9)
    val degs = GraphOps.degrees(g).select("degree").distinct().collect()
    assert(degs.length == 1 && degs(0).getLong(0) == 3)
  }

  test("watts-strogatz and relaxed caveman stay canonical after rewiring") {
    assert(GraphOps.isCanonical(Generators.wattsStrogatz(spark, 60, 4, 0.2, 13)))
    assert(GraphOps.isCanonical(Generators.relaxedCaveman(spark, 5, 6, 0.2, 13)))
    assert(GraphOps.isCanonical(Generators.scaleFree(spark, 100, seed = 17)))
    assert(GraphOps.isCanonical(Generators.powerlawCluster(spark, 60, 2, 0.3, 19)))
    assert(GraphOps.isCanonical(Generators.bipartite(spark, 20, 30)))
  }

  test("undirect + relabel produce contiguous ids") {
    val raw = Generators.roadNetwork(spark, 4, 4)
      .select((col("src") * 10).as("src"), (col("dst") * 10).as("dst"))
    val (verts, edges) = GraphOps.relabel(raw)
    assert(verts.count() == 16)
    val maxIdx = verts.agg(max("idx")).collect()(0).getLong(0)
    assert(maxIdx == 15)
    assert(edges.count() == raw.count())
    assert(GraphOps.isCanonical(edges))
  }
}
