package graft.layout

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.VecOps
import graft.gen.Generators.hashUniform

/** Layout configuration mirroring the reference defaults
  * (benchmark.py:18-19, embedder_pytorch.py:56-103). */
case class LayoutConfig(
    nComponents: Int = 3,
    LMin: Double = 10.0,
    kAttr: Double = 0.5,
    kInter: Double = 0.1,
    nNeighbors: Int = 15,
    sampleSize: Int = 512,
    numIterations: Int = 30,
    seed: Long = 42,
    /** exact kNN (cross-join + window top-k) below this many midpoints,
      * LSH above — mirrors the reference's brute-force→ANN switch
      * (embedder_cuvs.py:255-272). */
    exactKnnMaxRef: Long = 200000L)

/** Force-directed layout with edge-crossing repulsion — the reference's
  * engine core (embedder_pytorch.py:595-833) as one declarative
  * DataFrame program per iteration.
  *
  * Shuffle budget per iteration (SURVEY.md §4): 2 broadcast joins for
  * the position gather (positions ≪ edges at scale), 1 shuffle for the
  * spring scatter-add, 1 for the kNN window (exact path), 2 broadcast
  * joins for pair expansion, 1 for the intersection scatter-add, 1
  * global agg for normalization. Positions are cached and
  * locally checkpointed each iteration to truncate lineage (the Spark
  * failure mode the reference doesn't have, SURVEY.md §7 risk 2).
  */
object Layout {

  /** Stable deterministic edge id (hash of endpoints; canonical edges). */
  def withEdgeIds(edges: DataFrame): DataFrame =
    edges.withColumn("eid", xxhash64(col("src"), col("dst")))

  /** J1 gather: edge rows with both endpoint positions. `pos` is
    * broadcast when small enough; Spark's AQE demotes to sort-merge
    * automatically above the threshold. */
  def gather(edges: DataFrame, pos: DataFrame): DataFrame =
    edges
      .join(pos.select(col("id").as("src"), col("pos").as("p1")), "src")
      .join(pos.select(col("id").as("dst"), col("pos").as("p2")), "dst")

  /** A2 spring forces: per-edge Hooke force accumulated on both
    * endpoints with opposite signs (embedder_pytorch.py:595-636).
    * Returns (id, f: array<double>). */
  def springForces(edges: DataFrame, pos: DataFrame, cfg: LayoutConfig): DataFrame = {
    val g = gather(edges, pos)
      .withColumn("diff", VecOps.sub(col("p2"), col("p1")))
      .withColumn("dist", VecOps.norm(col("diff")) + lit(1e-6))
      .withColumn("coef", lit(cfg.kAttr) * (col("dist") - lit(cfg.LMin)) / col("dist"))
      .select(col("src"), col("dst"), VecOps.scale(col("diff"), col("coef")).as("f"))
    val contrib = g.select(col("src").as("id"), col("f"))
      .union(g.select(col("dst").as("id"), VecOps.scale(col("f"), lit(-1.0)).as("f")))
    VecOps.sumVecBy(contrib, "id", cfg.nComponents, "f")
  }

  /** Edge midpoints (embedder_pytorch.py:784-785): (eid, src, dst, mid). */
  def midpoints(edgesWithId: DataFrame, pos: DataFrame): DataFrame =
    gather(edgesWithId, pos)
      .select(col("eid"), col("src"), col("dst"),
        VecOps.midpoint(col("p1"), col("p2")).as("mid"))

  /** W4 deterministic sample of s midpoints (embedder_pytorch.py:406-413):
    * hash-ordered limit — same rows for the same (seed, iter) anywhere. */
  def sampleMidpoints(mids: DataFrame, s: Int, seed: Long): DataFrame =
    mids.orderBy(hashUniform(seed, col("eid")).asc, col("eid").asc).limit(s)

  /** J3 exact kNN: sampled query midpoints × all reference midpoints,
    * per-query top-k by squared distance (embedder_pytorch.py:543-593 as
    * cross join + WindowGroupLimit; Spark 4 rewrites rn<=k into a
    * per-partition top-k, never materializing the full sort). Self-match
    * dropped (embedder_pytorch.py:420-421). */
  def knnExact(queries: DataFrame, refs: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("eid").as("qid"), col("src").as("qsrc"),
      col("dst").as("qdst"), col("mid").as("qmid"))
    val r = refs.select(col("eid").as("rid"), col("src").as("rsrc"),
      col("dst").as("rdst"), col("mid").as("rmid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("rid").asc)
    q.join(r, col("qid") =!= col("rid"))
      .withColumn("d2", VecOps.sqDist(col("qmid"), col("rmid")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** J3 approximate kNN via MLlib bucketed random-projection LSH — the
    * cuVS-ANN analog (embedder_cuvs.py:274-382) for large midpoint sets. */
  def knnLsh(spark: SparkSession, queries: DataFrame, refs: DataFrame, k: Int,
             dim: Int, seed: Long): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.functions.array_to_vector
    val rv = refs.select(col("eid").as("rid"), col("src").as("rsrc"),
      col("dst").as("rdst"), col("mid").as("rmid"),
      array_to_vector(col("mid")).as("features"))
    val qv = queries.select(col("eid").as("qid"), col("src").as("qsrc"),
      col("dst").as("qdst"), col("mid").as("qmid"),
      array_to_vector(col("mid")).as("features"))
    val lsh = new BucketedRandomProjectionLSH()
      .setBucketLength(2.0).setNumHashTables(3).setSeed(seed)
      .setInputCol("features").setOutputCol("hashes")
    val model = lsh.fit(rv)
    val joined = model.approxSimilarityJoin(qv, rv, Double.MaxValue, "dist")
      .select(col("datasetA.qid").as("qid"), col("datasetA.qsrc").as("qsrc"),
        col("datasetA.qdst").as("qdst"), col("datasetA.qmid").as("qmid"),
        col("datasetB.rid").as("rid"), col("datasetB.rsrc").as("rsrc"),
        col("datasetB.rdst").as("rdst"), col("datasetB.rmid").as("rmid"),
        (col("dist") * col("dist")).as("d2"))
      .filter(col("qid") =!= col("rid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("rid").asc)
    joined.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  /** A3 intersection repulsion: for each candidate edge pair from kNN
    * that properly intersects (P4/P5/P6), push all 4 endpoints away from
    * the pair centroid with k_inter/d² (embedder_pytorch.py:638-736). */
  def intersectionForces(pairs: DataFrame, pos: DataFrame, cfg: LayoutConfig): DataFrame = {
    // gather the 4 endpoint positions (two joins on edge endpoints via
    // the midpoints' src/dst columns carried through the kNN)
    val p = pairs
      .filter(col("qid") < col("rid")) // P4 i<j
      .filter(!(col("qsrc") === col("rsrc") || col("qsrc") === col("rdst") ||
        col("qdst") === col("rsrc") || col("qdst") === col("rdst"))) // P5
    val withPos = p
      .join(pos.select(col("id").as("qsrc"), col("pos").as("p1")), "qsrc")
      .join(pos.select(col("id").as("qdst"), col("pos").as("p2")), "qdst")
      .join(pos.select(col("id").as("rsrc"), col("pos").as("q1")), "rsrc")
      .join(pos.select(col("id").as("rdst"), col("pos").as("q2")), "rdst")
      .filter(VecOps.segmentsIntersect(col("p1"), col("p2"), col("q1"), col("q2"))) // P6
      .withColumn("c4", VecOps.centroid4(col("p1"), col("p2"), col("q1"), col("q2")))
    def push(idCol: String, ptCol: String) = withPos
      .withColumn("diff", VecOps.sub(col(ptCol), col("c4")))
      .withColumn("d", VecOps.norm(col("diff")) + lit(1e-6))
      .select(col(idCol).as("id"),
        VecOps.scale(col("diff"), lit(cfg.kInter) / (col("d") * col("d"))).as("f"))
    val contrib = push("qsrc", "p1").union(push("qdst", "p2"))
      .union(push("rsrc", "q1")).union(push("rdst", "q2"))
    VecOps.sumVecBy(contrib, "id", cfg.nComponents, "f")
  }

  /** A4 center-and-scale per dimension (embedder_pytorch.py:800-804);
    * torch.std is the SAMPLE std (ddof=1) → stddev_samp. The 2·d
    * statistics collapse to one row collected on the driver. */
  def normalize(pos: DataFrame, dim: Int): DataFrame = {
    val statCols = (0 until dim).flatMap(i => Seq(
      avg(element_at(col("pos"), i + 1)).as(s"m$i"),
      stddev_samp(element_at(col("pos"), i + 1)).as(s"s$i")))
    val st = pos.agg(statCols.head, statCols.tail: _*).collect()(0)
    val comps = (0 until dim).map { i =>
      val m = st.getAs[Double](s"m$i")
      val sRaw = st.getAs[Double](s"s$i")
      val s = if (sRaw.isNaN) 0.0 else sRaw
      (element_at(col("pos"), i + 1) - lit(m)) / lit(s + 1e-6)
    }
    pos.select(col("id"), array(comps: _*).as("pos"))
  }

  /** One layout iteration (update_positions, embedder_pytorch.py:776-806). */
  def step(spark: SparkSession, edgesWithId: DataFrame, pos: DataFrame,
           cfg: LayoutConfig, iter: Int, refCount: Long): DataFrame = {
    val spring = springForces(edgesWithId, pos, cfg)
    val mids = midpoints(edgesWithId, pos)
    val inter =
      if (cfg.kInter == 0.0) null
      else {
        val sampled = sampleMidpoints(mids, cfg.sampleSize, cfg.seed + iter)
        val pairs =
          if (refCount <= cfg.exactKnnMaxRef) knnExact(sampled, mids, cfg.nNeighbors)
          else knnLsh(spark, sampled, mids, cfg.nNeighbors, cfg.nComponents, cfg.seed)
        intersectionForces(pairs, pos, cfg)
      }
    val forces =
      if (inter == null) spring
      else VecOps.sumVecBy(
        spring.select(col("id"), col("f")).unionByName(inter),
        "id", cfg.nComponents, "f")
    // Unnormalized move; run() checkpoints this, then applies A4
    // normalization as a lazy projection over the cached rows so the
    // force pipeline executes exactly once per iteration.
    pos.join(forces, Seq("id"), "left")
      .select(col("id"),
        when(col("f").isNull, col("pos"))
          .otherwise(VecOps.add(col("pos"), col("f"))).as("pos"))
  }

  /** L3 driver loop (run_layout, embedder_pytorch.py:808-833). */
  def run(spark: SparkSession, edges: DataFrame, initial: DataFrame,
          cfg: LayoutConfig): DataFrame = {
    val e = withEdgeIds(edges).persist()
    val m = e.count()
    // Per iteration: ONE full execution (materializing the moved
    // positions), then normalization stats + projection read the cache.
    var (pos, handle) = graft.util.Iterate.checkpoint(spark, initial)
    var it = 0
    while (it < cfg.numIterations) {
      val (moved, mh) = graft.util.Iterate.checkpoint(
        spark, step(spark, e, pos, cfg, it, m))
      handle.unpersist(blocking = false)
      pos = normalize(moved, cfg.nComponents)
      handle = mh
      it += 1
    }
    e.unpersist()
    pos
  }
}
