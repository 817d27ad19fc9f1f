package graft.metrics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.model.GraphOps

/** Per-vertex and per-pair structural graph features — the
  * feature-engineering layer a link-prediction / graph-ML pipeline
  * computes over an edge list (beyond the reference's centrality set;
  * the reference stops at degrees and the radial metrics,
  * graphem_rapids/metrics.py:15-60).
  *
  * All inputs are canonical undirected edge lists (`src < dst`, no
  * self-loops — [[GraphOps.undirect]] output). Everything here is a
  * pure DataFrame program whose shuffles key on vertex or pair ids:
  *
  *  - [[triangles]] uses the degree-ordered orientation ("compact
  *    forward"): each edge is directed from its lower-(degree, id)
  *    endpoint, so every vertex's out-neighborhood is O(sqrt m) on any
  *    graph and the wedge self-join is bounded by m^(3/2) WORK TOTAL,
  *    never by the square of a hub's degree — the standard bound that
  *    makes distributed triangle enumeration survive skewed degree
  *    distributions at 100 TB.
  *  - [[linkPrediction]] enumerates wedges through each shared
  *    neighbor; work is sum(deg(w)^2) over wedge centers, so hubs above
  *    `maxCenterDeg` are excluded (documented operator semantics, the
  *    same stop-shingle reasoning as Dedup.jaccardPairs — a hub shared
  *    by everything carries no pairwise signal and only quadratic
  *    cost).
  */
object GraphFeatures {

  /** One row per triangle {a, b, c}, emitted exactly once with the
    * wedge center first (the triangle's (degree, id)-minimum vertex)
    * and `b < c` by id. Two shuffles on vertex keys + one on the
    * closing-edge pair key. */
  def triangles(edges: DataFrame): DataFrame = {
    val deg = GraphOps.degrees(edges)
    // direct each edge from its lower-(degree, id) endpoint; src<dst
    // canonical input makes the tie case u=src
    val arcs = edges
      .join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "sdeg"), "src")
      .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "ddeg"), "dst")
      .select(
        when(col("sdeg") <= col("ddeg"), col("src")).otherwise(col("dst")).as("u"),
        when(col("sdeg") <= col("ddeg"), col("dst")).otherwise(col("src")).as("v"))
    // wedges at u over its (bounded) out-neighborhood, closed by the
    // canonical edge (x, y), x<y by id
    val a1 = arcs.select(col("u"), col("v").as("x"))
    val a2 = arcs.select(col("u"), col("v").as("y"))
    a1.join(a2, "u").filter(col("x") < col("y"))
      .join(edges.withColumnRenamed("src", "x").withColumnRenamed("dst", "y"),
        Seq("x", "y"), "left_semi")
      .select(col("u").as("a"), col("x").as("b"), col("y").as("c"))
  }

  /** Per-vertex triangle participation count: each triangle counted at
    * all three corners. */
  def triangleCounts(edges: DataFrame): DataFrame =
    triangles(edges)
      .select(explode(array(col("a"), col("b"), col("c"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))

  /** Local clustering coefficient per vertex:
    * `2·T(v) / (deg(v)·(deg(v)−1))`, 0 for degree < 2. Emits every
    * vertex with its degree and triangle count (coefficient rounded to
    * 6 so the double division hashes stably across engines). */
  def localClustering(edges: DataFrame): DataFrame = {
    val deg = GraphOps.degrees(edges)
    deg.join(triangleCounts(edges), Seq("id"), "left_outer")
      .select(col("id"), col("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        round(
          when(col("degree") >= 2,
            lit(2.0) * coalesce(col("n_tri"), lit(0L)) /
              (col("degree") * (col("degree") - 1)))
            .otherwise(lit(0.0)), 6).as("coeff"))
  }

  /** Link-prediction candidate scores for NON-adjacent vertex pairs
    * that share at least `minCommon` neighbors: common-neighbor count,
    * Jaccard overlap of neighborhoods, and Adamic–Adar
    * (`Σ_w 1/ln deg(w)` over shared neighbors w — Adamic & Adar 2003).
    *
    * Wedge centers with degree > `maxCenterDeg` are excluded by
    * definition (see object doc): at 100 TB a hub shared by millions of
    * vertices would alone emit deg²/2 wedge rows while ranking every
    * pair it touches identically. The cap is the operator's semantics,
    * not a silent truncation — pairs are still complete for every
    * center at or below the cap.
    *
    * Shuffle structure: one (center)-keyed self-join, one (u, v) pair
    * aggregation with map-side partials, two broadcast-eligible degree
    * joins, one anti-join against the edge set on the pair key.
    */
  def linkPrediction(edges: DataFrame, minCommon: Int = 2,
                     maxCenterDeg: Int = 10000): DataFrame = {
    val deg = GraphOps.degrees(edges)
    val adj = edges.select(col("src").as("w"), col("dst").as("n"))
      .union(edges.select(col("dst").as("w"), col("src").as("n")))
    val centers = adj
      .join(deg.withColumnRenamed("id", "w"), "w")
      .filter(col("degree") <= maxCenterDeg)
    val n1 = centers.select(col("w"), col("n").as("u"), col("degree").as("wdeg"))
    val n2 = centers.select(col("w"), col("n").as("v"))
    val pairs = n1.join(n2, "w").filter(col("u") < col("v"))
      .groupBy("u", "v")
      .agg(count(lit(1)).as("n_common"),
        sum(lit(1.0) / log(col("wdeg"))).as("aa"))
      .filter(col("n_common") >= minCommon)
      // candidates only: drop pairs already linked (canonical u<v
      // matches the src<dst edge key directly)
      .join(edges.withColumnRenamed("src", "u").withColumnRenamed("dst", "v"),
        Seq("u", "v"), "left_anti")
    pairs
      .join(deg.withColumnRenamed("id", "u").withColumnRenamed("degree", "udeg"), "u")
      .join(deg.withColumnRenamed("id", "v").withColumnRenamed("degree", "vdeg"), "v")
      .select(col("u"), col("v"), col("n_common"),
        round(col("n_common") /
          (col("udeg") + col("vdeg") - col("n_common")).cast("double"), 6)
          .as("jaccard"),
        round(col("aa"), 6).as("adamic_adar"))
  }

  /** Core number (k-core decomposition) per vertex via iterated
    * neighborhood H-index (Lü, Zhou, Zhang & Stanley 2016, "The
    * H-index of a network node"): start from c₀(v) = deg(v) and
    * repeatedly set c(v) to the H-index of its neighbors' current
    * values — the unique fixpoint is the core number.
    *
    * This is the distributed formulation of choice at scale: the
    * classic sequential peel is inherently ordered, while each H-index
    * round here is one neighbor join + one per-vertex ordered
    * aggregate (H = max over the descending-sorted neighbor values of
    * min(rank, value)), all keyed on vertex id. Values only decrease,
    * so convergence is monotone; rounds needed in practice are small
    * (bounded by the core-value spread, not n). Lineage per round is
    * cut with [[graft.util.Iterate.checkpoint]].
    */
  def coreNumbers(spark: org.apache.spark.sql.SparkSession, edges: DataFrame,
                  maxIter: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val adj = edges.select(col("src").as("id"), col("dst").as("nbr"))
      .union(edges.select(col("dst").as("id"), col("src").as("nbr")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var (c, handle) = graft.util.Iterate.checkpoint(spark,
      GraphOps.degrees(edges).withColumnRenamed("degree", "c"))
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val nbrVals = adj.join(
        c.withColumnRenamed("id", "nbr").withColumnRenamed("c", "cn"), "nbr")
        .select(col("id"), col("cn"))
      val w = Window.partitionBy("id").orderBy(col("cn").desc)
      val next = nbrVals
        .withColumn("rn", row_number().over(w).cast("long"))
        .groupBy("id").agg(max(least(col("rn"), col("cn"))).as("cNew"))
      val (nextC, nextHandle) = graft.util.Iterate.checkpoint(spark,
        c.join(next, "id").select(col("id"), col("cNew").as("c")))
      converged = nextC.join(c.withColumnRenamed("c", "cPrev"), "id")
        .filter(col("c") =!= col("cPrev")).isEmpty
      handle.unpersist()
      c = nextC; handle = nextHandle
      it += 1
    }
    adj.unpersist()
    c.withColumnRenamed("c", "core")
  }

  /** Deterministic uniform random walks — DeepWalk / node2vec corpus
    * generation (Perozzi et al. 2014), the data-prep step that feeds a
    * skip-gram trainer from a graph. Every step's neighbor choice is
    * `hash(seed, walk, step) mod degree` with the hash drawn from the
    * first 13 md5 hex digits (52 bits, non-negative, exact in any
    * engine — the [[graft.pipeline.TextAnalysis.weightedSample]]
    * parity construction), so the full walk corpus is replayable
    * bit-for-bit on any cluster shape AND expressible in SQL for the
    * oracle gate.
    *
    * Shape: one ranked adjacency build (per-vertex neighbor index via
    * a vertex-keyed window), then per step one join on the current
    * vertex + chosen rank — walkLen × one equi-join, all keyed on
    * vertex ids, no driver state. Emits the long format
    * (walk_id, step, node). */
  def randomWalks(edges: DataFrame, walkLen: Int,
                  seed: Long = 42): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(walkLen >= 1, s"walkLen must be >= 1, got $walkLen")
    val adj = edges.select(col("src").as("id"), col("dst").as("nbr"))
      .union(edges.select(col("dst").as("id"), col("src").as("nbr")))
    val ranked = adj
      .withColumn("rk",
        row_number().over(Window.partitionBy("id").orderBy("nbr")).cast("long") - 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = ranked.groupBy("id").agg(count(lit(1)).as("deg"))
    def draw(step: Int): Column =
      conv(substring(md5(concat_ws(":", lit(seed.toString),
        col("walk_id").cast("string"), lit(step.toString))), 1, 13), 16, 10)
        .cast("long")
    var state = GraphOps.vertices(edges)
      .select(col("id").as("walk_id"), col("id").as("cur"))
    var out = state.select(col("walk_id"), lit(0).as("step"),
      col("cur").as("node"))
    for (t <- 1 until walkLen) {
      // persist each step: the final union reads every step's frame
      // once, and step t+1 extends step t without replaying its joins
      state = state
        .join(deg.withColumnRenamed("id", "cur"), "cur")
        .withColumn("rk", draw(t) % col("deg"))
        .join(ranked.withColumnRenamed("id", "cur")
          .withColumnRenamed("nbr", "next"), Seq("cur", "rk"))
        .select(col("walk_id"), col("next").as("cur"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      out = out.unionByName(
        state.select(col("walk_id"), lit(t).as("step"), col("cur").as("node")))
    }
    out
  }

  /** Degree assortativity: Pearson correlation of endpoint degrees over
    * all directed edge instances (both orientations — Newman 2002's
    * r for undirected graphs). One degree aggregate, two
    * broadcast-eligible joins, one scalar aggregate. Computed from
    * guarded covariance/stddev components rather than `corr` so a
    * regular graph (zero degree variance) yields NULL instead of an
    * ANSI divide-by-zero. */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val deg = GraphOps.degrees(edges)
    val both = edges.union(
      edges.select(col("dst").as("src"), col("src").as("dst")))
    both
      .join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "sdeg"), "src")
      .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "ddeg"), "dst")
      .agg(covar_pop(col("sdeg").cast("double"), col("ddeg").cast("double")).as("cov"),
        stddev_pop(col("sdeg").cast("double")).as("sdx"),
        stddev_pop(col("ddeg").cast("double")).as("sdy"))
      .select(round(
        when(col("sdx") * col("sdy") > 0, col("cov") / (col("sdx") * col("sdy"))),
        6).as("assortativity"))
  }
}
