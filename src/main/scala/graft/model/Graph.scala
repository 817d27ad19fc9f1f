package graft.model

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Undirected edge with the canonical invariant `src < dst`
  * (reference: upper-triangle extraction, embedder_pytorch.py:237-240).
  */
case class Edge(src: Long, dst: Long)

/** Vertex position in an n_components-dimensional embedding
  * (reference: positions tensor, embedder_pytorch.py:324-335).
  */
case class VertexPos(id: Long, pos: Array[Double])

/** Core graph transformations shared by readers, generators and the
  * layout engine. All are pure DataFrame programs: Catalyst handles
  * pushdown/pruning; every shuffle is on the vertex or edge key.
  */
object GraphOps {

  /** Symmetrize + dedupe + canonicalize to src<dst; drops self-loops.
    * Reference: A+A.T binarize (embedder_pytorch.py:350-352) and the
    * undirect pipeline (datasets.py:339-352).
    * One shuffle (distinct on the edge key).
    */
  def undirect(edges: DataFrame): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") < col("dst"))
      .distinct()
  }

  /** Distinct vertex ids of an edge list (datasets.py:354-356). */
  def vertices(edges: DataFrame): DataFrame =
    edges.select(explode(array(col("src"), col("dst"))).as("id")).distinct()

  /** Dense 0..n-1 index in ascending `keyCol` order. Below
    * `windowMax` rows: one sorted window (single partition — fine for
    * driver-scale maps). Above: range-partition + sortWithinPartitions
    * + zipWithIndex, which yields the IDENTICAL globally-sorted
    * contiguous index without ever collecting the sort to one task
    * (zipWithIndex costs one extra per-partition count job — the
    * standard scale form of this op). */
  def denseIndex(df: DataFrame, keyCol: String,
                 windowMax: Long = 10000000L,
                 knownCount: Long = -1L): DataFrame = {
    val spark = df.sparkSession
    val n = if (knownCount >= 0) knownCount else df.count()
    if (n <= windowMax)
      df.withColumn("idx",
        row_number().over(Window.orderBy(col(keyCol))).cast("long") - 1)
    else {
      val parts = graft.util.Iterate.sizedPartitions(spark, n)
      val sorted = df.repartitionByRange(parts, col(keyCol))
        .sortWithinPartitions(keyCol)
      val schema = org.apache.spark.sql.types.StructType(
        sorted.schema.fields :+ org.apache.spark.sql.types.StructField(
          "idx", org.apache.spark.sql.types.LongType, nullable = false))
      spark.createDataFrame(
        sorted.rdd.zipWithIndex.map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) }, schema)
    }
  }

  /** Contiguous 0..n-1 relabeling applied to both endpoints
    * (nx.convert_node_labels_to_integers, datasets.py:161-164).
    * Vertex indexing via [[denseIndex]] (windowed small / zipWithIndex
    * large); the edge-side remap broadcasts the vertex map only while
    * it plausibly fits executors. */
  def relabel(edges: DataFrame,
              broadcastMaxVertices: Long = 10000000L): (DataFrame, DataFrame) = {
    val v = vertices(edges)
    val n = v.count()
    val verts = denseIndex(v, "id", broadcastMaxVertices, knownCount = n)
    val m = if (n <= broadcastMaxVertices) broadcast(verts) else verts
    val remapped = edges
      .join(m.withColumnRenamed("id", "src").withColumnRenamed("idx", "sidx"), "src")
      .join(m.withColumnRenamed("id", "dst").withColumnRenamed("idx", "didx"), "dst")
      .select(col("sidx").as("src"), col("didx").as("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
    (verts, remapped)
  }

  /** Vertex degrees of an undirected (src<dst canonical) edge list.
    * Reference: adjacency row-sums (generators.py:52-64).
    * explode → partial+final hash aggregate; one shuffle on id.
    */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(explode(array(col("src"), col("dst"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("degree"))

  /** Largest connected component via GraphX, returning the induced
    * subgraph's edges (run_benchmarks.py:256-270). */
  def largestComponent(spark: SparkSession, edges: DataFrame): DataFrame = {
    import org.apache.spark.graphx.{Edge => GxEdge, Graph => GxGraph}
    val rdd = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .rdd.map(r => GxEdge(r.getLong(0), r.getLong(1), 1))
    val g = GxGraph.fromEdges(rdd, 0)
    val cc = g.connectedComponents().vertices // (id, ccId)
    import spark.implicits._
    val ccDf = cc.toDF("id", "cc")
    val top = ccDf.groupBy("cc").count().orderBy(desc("count"), asc("cc")).limit(1)
      .select("cc")
    val keep = broadcast(ccDf.join(broadcast(top), "cc").select("id"))
    edges
      .join(keep.withColumnRenamed("id", "src"), "src", "left_semi")
      .join(keep.withColumnRenamed("id", "dst"), "dst", "left_semi")
      .select("src", "dst")
  }

  /** Connected components as a PURE DataFrame program — the
    * alternating large-star / small-star contraction (Kiveris et al.
    * 2014, "Connected Components in MapReduce and Beyond"), which
    * converges in O(log n) rounds on ANY topology (long chains
    * included, where naive min-label propagation needs diameter
    * rounds).
    *
    * This is the at-scale twin of the GraphX route ([[largestComponent]]
    * and the dedup clustering use GraphX): every phase is one
    * vertex-keyed aggregate + one vertex-keyed join over DataFrames,
    * so it stays inside Catalyst/AQE (skew handling, adaptive shuffle
    * sizing, whole-stage codegen) instead of dropping to RDDs.
    * Returns (id, component) with component = the component's minimum
    * vertex id — same labeling as GraphX's connectedComponents.
    */
  def connectedComponentsDF(spark: SparkSession, edges: DataFrame,
                            maxIter: Int = 50): DataFrame = {
    val verts = vertices(edges).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one phase: per center u, m = min(Γ(u) ∪ {u}); large connects the
    // strictly-larger neighbors to m, small connects the ≤ ones (and u)
    def phase(e: DataFrame, large: Boolean): DataFrame = {
      val adj = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      val mu = adj.groupBy("src").agg(min(col("dst")).as("_mn"))
        .select(col("src"), least(col("_mn"), col("src")).as("m"))
      val cand =
        if (large) adj.filter(col("dst") > col("src"))
        else adj.filter(col("dst") <= col("src"))
          .union(mu.select(col("src"), col("src").as("dst")))
      cand.join(mu, "src")
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    var (e, handle) = graft.util.Iterate.checkpoint(spark,
      edges.select(col("src").cast("long"), col("dst").cast("long"))
        .filter(col("src") =!= col("dst")))
    // order-independent, overflow-free set signature (rows are distinct)
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(src, dst))"), lit(0L))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    var sig = signature(e)
    var converged = false
    var it = 0
    // contraction state shrinks fast; run the rounds data-sized (the
    // iterative-loop treatment — see Iterate.withSizedShuffle)
    graft.util.Iterate.withSizedShuffle(spark, sig._1) {
      while (!converged && it < maxIter) {
        val (next, nextHandle) = graft.util.Iterate.checkpoint(spark,
          phase(phase(e, large = true), large = false))
        val nextSig = signature(next)
        converged = nextSig == sig
        handle.unpersist()
        e = next; handle = nextHandle; sig = nextSig
        it += 1
      }
    }
    // converged edge set is a union of stars (v → component min); every
    // min maps to itself, isolated-in-input vertices keep their own id
    val comp = verts
      .join(e.withColumnRenamed("src", "id").withColumnRenamed("dst", "c"),
        Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("c"), col("id")).as("component"))
    verts.unpersist()
    comp
  }

  /** Structural invariants used across tests (mirrors
    * tests/test_generators.py:32-57): canonical form, loop-free. */
  def isCanonical(edges: DataFrame): Boolean =
    edges.filter(col("src") >= col("dst")).isEmpty &&
      edges.groupBy("src", "dst").count().filter(col("count") > 1).isEmpty

  /** W5 seeded vertex subsample with induced edges
    * (run_benchmarks.py:224-237): keep a hash-deterministic fraction of
    * vertices, then left-semi both endpoints — no driver round trip. */
  def subsample(edges: DataFrame, fraction: Double, seed: Long): DataFrame = {
    val keep = vertices(edges)
      .filter(graft.gen.Generators.hashUniform(seed, col("id")) < fraction)
    edges
      .join(keep.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
      .join(keep.withColumnRenamed("id", "dst"), Seq("dst"), "left_semi")
      .select("src", "dst")
  }

  /** A5 graph stats (benchmark.py:140-148, datasets.py:176-184). */
  def stats(edges: DataFrame): (Long, Long, Double, Double) = {
    val m = edges.count()
    val n = vertices(edges).count()
    val density = if (n > 1) 2.0 * m / (n.toDouble * (n - 1)) else 0.0
    val avgDeg = if (n > 0) 2.0 * m / n else 0.0
    (n, m, density, avgDeg)
  }
}
