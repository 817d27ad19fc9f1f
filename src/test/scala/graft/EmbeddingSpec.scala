package graft

import org.apache.spark.sql.functions._
import graft.gen.Generators
import graft.linalg.EigenInit
import graft.layout.{Layout, LayoutConfig}
import graft.influence.Influence
import graft.api.GraphEm
import graft.functions.VecOps

/** Embedder/layout/influence invariants mirroring the reference's
  * test battery (tests/test_pytorch_backend.py, test_integration.py,
  * test_influence.py): shapes, finiteness, reproducibility, spectral
  * properties, IC bounds and replayability. */
class EmbeddingSpec extends SparkSpec {

  private def finite(df: org.apache.spark.sql.DataFrame): Boolean =
    df.filter(exists(col("pos"), x => x.isNaN || x === Double.PositiveInfinity ||
      x === Double.NegativeInfinity)).isEmpty

  test("eigen init: shape (n, k), finite, deterministic") {
    val g = Generators.roadNetwork(spark, 3, 3)
    val p1 = EigenInit.init(spark, g, 9, 2, seed = 1)
    assert(p1.count() == 9)
    assert(p1.filter(size(col("pos")) =!= 2).isEmpty)
    assert(finite(p1))
    val p2 = EigenInit.init(spark, g, 9, 2, seed = 1)
    assert(p1.exceptAll(p2).isEmpty)
  }

  test("eigen init: Fiedler vector of a path has exactly one sign change") {
    // path 0-1-2-...-7 = balanced tree with r=1. The normalized-Laplacian
    // Fiedler vector is NOT monotone along the path (the D^{1/2} weighting
    // shrinks the endpoints), but its nodal-domain property — a single
    // sign change — is exact.
    val path = Generators.balancedTree(spark, 1, 7)
    val pos = EigenInit.init(spark, path, 8, 1, seed = 2)
    val fiedler = pos.orderBy("id").collect()
      .map(_.getSeq[Double](1).head)
    val changes = fiedler.sliding(2).count { case Array(a, b) => a.sign != b.sign }
    assert(changes == 1, s"expected 1 sign change: ${fiedler.mkString(",")}")
  }

  test("eigen init: components of one eigenvector are orthogonal-ish and unit-ish") {
    val g = Generators.roadNetwork(spark, 4, 4)
    val pos = EigenInit.init(spark, g, 16, 3, seed = 3)
    val dots = pos.agg(
      sum(element_at(col("pos"), 1) * element_at(col("pos"), 2)).as("d12"),
      sum(element_at(col("pos"), 1) * element_at(col("pos"), 1)).as("d11")).collect()(0)
    assert(math.abs(dots.getDouble(0)) < 1e-6)
    assert(math.abs(dots.getDouble(1) - 1.0) < 1e-6)
  }

  test("distributed eigen path agrees with the driver path up to rotation") {
    // force the distributed backend (driverMaxEdges=0) and compare
    // rotation-invariant row norms of the 2-dim embedding subspace.
    val g = Generators.roadNetwork(spark, 4, 4)
    val drv = EigenInit.init(spark, g, 16, 2, seed = 9)
    val dist = EigenInit.init(spark, g, 16, 2, seed = 9, driverMaxEdges = 0)
    assert(dist.count() == 16)
    assert(finite(dist))
    val n1 = drv.select(col("id"), VecOps.norm(col("pos")).as("r")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val n2 = dist.select(col("id"), VecOps.norm(col("pos")).as("r")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // the distributed path runs a fixed 30 subspace iterations (each
    // matvec is a shuffle); ~1-2% residual vs the driver path's deeper
    // convergence is expected and harmless — the layout refines it.
    val maxDiff = n1.keys.map(k => math.abs(n1(k) - n2(k))).max
    assert(maxDiff < 0.05, s"subspace mismatch: max radius diff $maxDiff")
  }

  test("grid kNN: bounded lists, high overlap with exact kNN at sane cell size") {
    val g = Layout.withEdgeIds(Generators.erdosRenyi(spark, 80, 0.08, 5))
    val pos = EigenInit.init(spark, g.select("src", "dst"), 80, 3, seed = 5)
    val mids = Layout.midpoints(g, pos).cache()
    val m = mids.count()
    val exact = Layout.knnExact(mids, mids, 5, dim = 3)
      .select("qid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val grid = Layout.knnGrid(spark, mids, mids, 5, dim = 3,
      cellSide = Layout.gridCellSide(m, 5, 3)).cache()
    assert(grid.groupBy("qid").count().filter(col("count") > 5).isEmpty)
    assert(grid.filter(col("qid") === col("rid")).isEmpty)
    val gset = grid.select("qid", "rid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (gset & exact).size.toDouble / exact.size
    assert(recall > 0.7, s"grid kNN recall too low: $recall")
    // oversized query side falls back to the distributed cell join —
    // same cells, same tie-breaks, identical rows
    val viaJoin = Layout.knnGrid(spark, mids, mids, 5, dim = 3,
      cellSide = Layout.gridCellSide(m, 5, 3), kernelMaxQueries = 4)
      .select("qid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaJoin == gset)
    grid.unpersist(); mids.unpersist()
  }

  test("LSH kNN path returns bounded neighbor lists that overlap exact kNN") {
    val g = Layout.withEdgeIds(Generators.erdosRenyi(spark, 60, 0.1, 3))
    val pos = EigenInit.init(spark, g.select("src", "dst"), 60, 3, seed = 3)
    val mids = Layout.midpoints(g, pos).cache()
    val exact = Layout.knnExact(mids, mids, 5, dim = 3).select("qid", "rid")
    val lsh = Layout.knnLsh(spark, mids, mids, 5, 3, seed = 3).select("qid", "rid")
    assert(lsh.groupBy("qid").count().filter(col("count") > 5).isEmpty)
    val overlap = lsh.join(exact, Seq("qid", "rid"), "left_semi").count()
    assert(overlap > 0, "LSH found nothing the exact path found")
    mids.unpersist()
  }

  test("random fallback positions: shape and determinism") {
    val p1 = EigenInit.randomPositions(spark, 20, 3, 7)
    assert(p1.count() == 20)
    assert(finite(p1))
    assert(p1.exceptAll(EigenInit.randomPositions(spark, 20, 3, 7)).isEmpty)
  }

  test("spring force sign matches the reference: repel stretched, attract compressed") {
    import spark.implicits._
    // reference magnitude is -k_attr·(dist-L_min) along (p2-p1)/dist to
    // src (embedder_pytorch.py:626-635): dist>L_min pushes apart,
    // dist<L_min pulls together. Pin both directions numerically.
    val e = Seq((0L, 1L)).toDF("src", "dst")
    val cfg = LayoutConfig(nComponents = 3, LMin = 10.0, kAttr = 0.5, kInter = 0.0)
    val far = Seq((0L, Array(0.0, 0.0, 0.0)), (1L, Array(20.0, 0.0, 0.0))).toDF("id", "pos")
    val fFar = Layout.springForces(e, far, cfg).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // coef = -0.5·(20-10)/20 = -0.25 → f(src) = (-5,0,0): away from dst
    assert(math.abs(fFar(0L)(0) + 5.0) < 1e-3, s"src force ${fFar(0L)}")
    assert(math.abs(fFar(1L)(0) - 5.0) < 1e-3, s"dst force ${fFar(1L)}")
    val near = Seq((0L, Array(0.0, 0.0, 0.0)), (1L, Array(4.0, 0.0, 0.0))).toDF("id", "pos")
    val fNear = Layout.springForces(e, near, cfg).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    // coef = -0.5·(4-10)/4 = +0.75 → f(src) = (3,0,0): toward dst
    assert(math.abs(fNear(0L)(0) - 3.0) < 1e-3, s"src force ${fNear(0L)}")
    assert(math.abs(fNear(1L)(0) + 3.0) < 1e-3, s"dst force ${fNear(1L)}")
  }

  test("layout: positions move, stay finite and normalized") {
    val g = Generators.roadNetwork(spark, 5, 5)
    val cfg = LayoutConfig(nComponents = 2, LMin = 1.0, numIterations = 5,
      sampleSize = 64, nNeighbors = 5, seed = 4)
    val init = EigenInit.init(spark, g, 25, 2, seed = 4)
    val out = Layout.run(spark, g, init, cfg)
    assert(out.count() == 25)
    assert(finite(out))
    // A4 normalization: per-dim mean ~0, sample std ~1
    val st = out.agg(
      avg(element_at(col("pos"), 1)).as("m"),
      stddev_samp(element_at(col("pos"), 1)).as("s")).collect()(0)
    assert(math.abs(st.getDouble(0)) < 1e-6)
    assert(math.abs(st.getDouble(1) - 1.0) < 0.01)
    // moved from init
    assert(out.exceptAll(init).count() > 0)
  }

  test("layout: reproducible for same seed") {
    val g = Generators.roadNetwork(spark, 4, 4)
    val cfg = LayoutConfig(nComponents = 2, LMin = 1.0, numIterations = 3,
      sampleSize = 32, nNeighbors = 4, seed = 5)
    val a = Layout.run(spark, g, EigenInit.init(spark, g, 16, 2, seed = 5), cfg)
    val b = Layout.run(spark, g, EigenInit.init(spark, g, 16, 2, seed = 5), cfg)
    assert(a.exceptAll(b).isEmpty)
  }

  test("layout driver route matches the distributed route to float tolerance") {
    // Same dynamics, different FP summation order: trajectories agree
    // to ~1e-9/iter, amplified by normalization — 1e-6 over 3 iters is
    // a tight pin that any semantic divergence (sampling, kNN
    // tie-breaks, intersection predicate, ddof) would blow through.
    val g = Generators.roadNetwork(spark, 5, 5)
    val cfg = LayoutConfig(nComponents = 2, LMin = 1.0, numIterations = 3,
      sampleSize = 16, nNeighbors = 5, seed = 7)
    val init = EigenInit.init(spark, g, 25, 2, seed = 7)
    val local = Layout.run(spark, g, init, cfg)
    val dist = Layout.run(spark, g, init, cfg.copy(localMaxEdges = 0))
    val joined = local.select(col("id"), col("pos").as("pl"))
      .join(dist.select(col("id"), col("pos").as("pd")), "id")
    assert(joined.count() == 25)
    val maxDiff = joined.select(max(greatest(
      abs(element_at(col("pl"), 1) - element_at(col("pd"), 1)),
      abs(element_at(col("pl"), 2) - element_at(col("pd"), 2)))))
      .collect()(0).getDouble(0)
    assert(maxDiff < 1e-6, s"route divergence $maxDiff")
  }

  test("knn exact: k neighbors per query, no self-match") {
    val g = Layout.withEdgeIds(Generators.roadNetwork(spark, 4, 4))
    val pos = EigenInit.init(spark, g.select("src", "dst"), 16, 2, seed = 6)
    val mids = Layout.midpoints(g, pos)
    val knn = Layout.knnExact(Layout.sampleMidpoints(mids, 5, 1, 24), mids, 3, dim = 2)
    val counts = knn.groupBy("qid").count().select("count").distinct().collect()
    assert(counts.length == 1 && counts(0).getLong(0) == 3)
    assert(knn.filter(col("qid") === col("rid")).isEmpty)
  }

  test("knn exact: oversized query side falls back to join+window, identical rows") {
    val g = Layout.withEdgeIds(Generators.roadNetwork(spark, 5, 5)).cache()
    val pos = EigenInit.init(spark, g.select("src", "dst"), 25, 2, seed = 6)
    val mids = Layout.midpoints(g, pos).cache()
    mids.count()
    val kernel = Layout.knnExact(mids, mids, 4, dim = 2)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(6))).toSet
    // kernelMaxQueries below |q| forces the distributed join+window
    // route — no throw (the r2 API regression), bit-equal output
    val fallback = Layout.knnExact(mids, mids, 4, dim = 2, kernelMaxQueries = 4)
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getDouble(6))).toSet
    assert(fallback == kernel)
    mids.unpersist(); g.unpersist()
  }

  test("independent cascade: p=1 floods the component, p=0 stays at seeds") {
    val path = Generators.balancedTree(spark, 1, 4) // path of 5 nodes
    import spark.implicits._
    val seeds = Seq(0L).toDF("id")
    assert(Influence.estimatedInfluence(spark, path, seeds, 1.0) == 5)
    assert(Influence.estimatedInfluence(spark, path, seeds, 0.0) == 1)
    val mid = Influence.estimatedInfluence(spark, path, seeds, 0.6, seed = 3)
    assert(mid >= 1 && mid <= 5)
    // replayable
    assert(mid == Influence.estimatedInfluence(spark, path, seeds, 0.6, seed = 3))
  }

  test("cascade and greedy driver routes equal the distributed routes exactly") {
    import spark.implicits._
    // Integer set algebra + bit-identical hash coins: the routes must
    // agree EXACTLY, not statistically.
    val g = Generators.erdosRenyi(spark, 80, 0.06, 11)
    val seeds = Seq(0L, 3L, 7L).toDF("id")
    val local = Influence.independentCascade(spark, g, seeds, 0.3,
      maxRounds = 30, seed = 11)
    val dist = Influence.independentCascade(spark, g, seeds, 0.3,
      maxRounds = 30, seed = 11, localMaxEdges = 0)
    assert(local.count() > 3, "cascade should spread beyond the seeds")
    assert(local.exceptAll(dist).isEmpty && dist.exceptAll(local).isEmpty)

    val gl = Influence.greedySeeds(spark, g, k = 3, p = 0.2, simRounds = 10,
      candidatePool = 8, seed = 11)
    val gd = Influence.greedySeeds(spark, g, k = 3, p = 0.2, simRounds = 10,
      candidatePool = 8, seed = 11, localMaxEdges = 0)
    assert(gl.collect().map(_.getLong(0)).toSeq.sorted ==
      gd.collect().map(_.getLong(0)).toSeq.sorted)

    // over-threshold fall-through: a cap smaller than the edge count
    // must overflow the limit probe and route distributed — same result
    val over = Influence.independentCascade(spark, g, seeds, 0.3,
      maxRounds = 30, seed = 11, localMaxEdges = 2)
    assert(over.exceptAll(dist).isEmpty && dist.exceptAll(over).isEmpty)
  }

  test("greedy seeds stop at pool exhaustion (k > pool) on both routes") {
    val g = Generators.roadNetwork(spark, 3, 3)
    val local = Influence.greedySeeds(spark, g, k = 10, p = 0.3,
      simRounds = 5, candidatePool = 3, seed = 2)
    val dist = Influence.greedySeeds(spark, g, k = 10, p = 0.3,
      simRounds = 5, candidatePool = 3, seed = 2, localMaxEdges = 0)
    assert(local.count() == 3, "should return the pool, not crash")
    assert(local.collect().map(_.getLong(0)).toSet ==
      dist.collect().map(_.getLong(0)).toSet)
  }

  test("seed selection: top-k by radius") {
    import spark.implicits._
    val pos = Seq((0L, Array(3.0, 0.0)), (1L, Array(0.0, 1.0)),
      (2L, Array(2.0, 2.0)), (3L, Array(0.1, 0.1))).toDF("id", "pos")
    val seeds = Influence.selectSeeds(pos, 2).collect().map(_.getLong(0))
    assert(seeds.toSet == Set(0L, 2L))
  }

  test("greedy seeds: finds the hub of a star") {
    import spark.implicits._
    // star: 0 center, 1..8 leaves
    val star = (1 to 8).map(i => (0L, i.toLong)).toDF("src", "dst")
    // p=1, one round: the hub reaches all 9 nodes, any leaf only 2 —
    // a deterministic margin independent of the hash-RNG draw.
    val picked = Influence.greedySeeds(spark, star, 1, 1.0, simRounds = 1,
      candidatePool = 9, seed = 1).collect().map(_.getLong(0))
    assert(picked.head == 0L)
  }

  test("greedy seeds: k distinct seeds even when cascades saturate (p=1)") {
    import spark.implicits._
    // p=1 floods every cascade identically → every candidate ties and
    // the low-id tiebreak would re-pick the same vertex each round if
    // chosen vertices stayed in the pool.
    val path = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val picked = Influence.greedySeeds(spark, path, 2, 1.0, simRounds = 5,
      candidatePool = 2, seed = 1).collect().map(_.getLong(0))
    assert(picked.length == 2 && picked.distinct.length == 2,
      s"duplicate seeds: ${picked.mkString(",")}")
  }

  test("ANN layout branch: full distributed loop, quality tracks the exact run") {
    // exactKnnMaxRef=0 forces EVERY iteration's candidate search through
    // the grid-ANN path inside the distributed loop (localMaxEdges=0) —
    // the exact configuration the 100k+-midpoint regime runs, end to end.
    // Quality metric: the reference's own exact↔ANN trade, ρ(radius,
    // degree) of the LSH run vs the exact-kNN run on the same graph.
    import graft.metrics.Correlation
    val g = Generators.barabasiAlbert(spark, 400, 3, 42).cache()
    g.count()
    val init = EigenInit.init(spark, g, 400, 3, seed = 42).cache()
    init.count()
    val base = LayoutConfig(nComponents = 3, LMin = 4.0, numIterations = 8,
      sampleSize = 128, nNeighbors = 10, seed = 42, localMaxEdges = 0)
    def rhoOf(pos: org.apache.spark.sql.DataFrame): Double = {
      val radii = pos.select(col("id"), VecOps.norm(col("pos")).as("radius"))
      Correlation.spearman(
        radii.join(graft.model.GraphOps.degrees(g), "id"), "radius", "degree")
    }
    val rhoExact = rhoOf(Layout.run(spark, g, init, base))
    val rhoLsh = rhoOf(Layout.run(spark, g, init, base.copy(exactKnnMaxRef = 0)))
    assert(!rhoLsh.isNaN && !rhoExact.isNaN)
    assert(math.abs(rhoLsh - rhoExact) < 0.25,
      s"LSH layout quality drifted: rho_lsh=$rhoLsh vs rho_exact=$rhoExact")
    init.unpersist(); g.unpersist()
  }

  test("end-to-end facade: grid layout, seeds, influence, radius-degree correlation") {
    val g = Generators.roadNetwork(spark, 5, 5)
    val em = GraphEm(spark, g, LayoutConfig(nComponents = 2, LMin = 1.0,
      numIterations = 5, sampleSize = 64, nNeighbors = 5, seed = 8))
    assert(em.nVertices == 25)
    em.runLayout()
    val seeds = em.selectSeeds(5)
    assert(seeds.count() == 5)
    val infl = em.estimateInfluence(seeds, 0.3)
    assert(infl >= 5 && infl <= 25)
    // ρ(radius, degree) must be computable (t1 smoke shape, SURVEY §7)
    val radii = em.positions.select(col("id"), VecOps.norm(col("pos")).as("r"))
    val degs = graft.model.GraphOps.degrees(g)
    val rho = radii.join(degs, "id").agg(corr(col("r"), col("degree"))).collect()(0)
    assert(!rho.isNullAt(0))
  }
}
