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
    /** exact kNN (compiled broadcast kernel) below this many midpoints,
      * grid-bucketed ANN above — mirrors the reference's
      * brute-force→ANN switch (embedder_cuvs.py:255-272). */
    exactKnnMaxRef: Long = 200000L,
    /** broadcast the positions table into gathers below this vertex
      * count; above it, gathers shuffle-join (positions no longer fit
      * an executor). The checkpointed positions leaf reports the
      * default (unbounded) size estimate, so without the explicit hint
      * Catalyst picks sort-merge even for 500 rows. */
    broadcastPosMax: Long = 5000000L,
    /** run the whole loop on the driver below this many edges — the
      * same size-guarded routing Centralities/dupClusters use. A layout
      * iteration on a sub-500k-edge graph is millisecond-scale compute;
      * the distributed loop pays a ~0.5-1 s/iteration scheduler floor
      * regardless of data, so small graphs (the reference's entire
      * benchmark envelope) run 10-50× faster driver-side while the
      * distributed path carries everything larger. Set to 0 to force
      * the distributed route (tests do). */
    localMaxEdges: Long = 500000L)

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

  /** J1 gather: edge rows with both endpoint positions. */
  def gather(edges: DataFrame, pos: DataFrame, bcast: Boolean = true): DataFrame = {
    def side(df: DataFrame) = if (bcast) broadcast(df) else df
    edges
      .join(side(pos.select(col("id").as("src"), col("pos").as("p1"))), "src")
      .join(side(pos.select(col("id").as("dst"), col("pos").as("p2"))), "dst")
  }

  /** A2 spring force contributions: per-edge force emitted for
    * both endpoints with opposite signs (embedder_pytorch.py:595-636).
    * The reference's magnitude is -k_attr·(dist-L_min) applied along
    * (p2-p1)/dist to src (embedder_pytorch.py:626-635): edges SHORTER
    * than L_min attract, longer repel — the sign the layout dynamics
    * (and the radius-vs-centrality correlations) depend on.
    * Returns UNAGGREGATED (id, f) rows — step() fuses all force streams
    * into a single scatter-add shuffle.
    *
    * Emission uses explode(array(struct..)) — ONE pass over the edge
    * pipeline. A union of two selects re-executes the whole gather
    * subtree per branch (Catalyst plans are trees, not DAGs); with the
    * kNN inside, that multiplied iteration cost ~4×. Force math is
    * fixed-dimension column arithmetic, fully codegen'd. */
  def springContrib(edges: DataFrame, pos: DataFrame, cfg: LayoutConfig,
                    bcast: Boolean = true): DataFrame = {
    val d = cfg.nComponents
    val diffs = (0 until d).map(i =>
      (element_at(col("p2"), i + 1) - element_at(col("p1"), i + 1)).as(s"d$i"))
    val dist = sqrt((0 until d).map(i => col(s"d$i") * col(s"d$i")).reduce(_ + _)) + lit(1e-6)
    val g = gather(edges, pos, bcast)
      .select(Seq(col("src"), col("dst")) ++ diffs: _*)
      .withColumn("coef", lit(-cfg.kAttr) * (dist - lit(cfg.LMin)) / dist)
    val fPos = array((0 until d).map(i => col(s"d$i") * col("coef")): _*)
    val fNeg = array((0 until d).map(i => -col(s"d$i") * col("coef")): _*)
    g.select(explode(array(
      struct(col("src").as("id"), fPos.as("f")),
      struct(col("dst").as("id"), fNeg.as("f")))).as("c"))
      .select(col("c.id").as("id"), col("c.f").as("f"))
  }

  /** Aggregated spring forces (kept for direct use/tests). */
  def springForces(edges: DataFrame, pos: DataFrame, cfg: LayoutConfig): DataFrame =
    VecOps.sumVecBy(springContrib(edges, pos, cfg), "id", cfg.nComponents, "f")

  /** Edge midpoints (embedder_pytorch.py:784-785): (eid, src, dst, mid). */
  def midpoints(edgesWithId: DataFrame, pos: DataFrame,
                bcast: Boolean = true): DataFrame =
    gather(edgesWithId, pos, bcast)
      .select(col("eid"), col("src"), col("dst"),
        VecOps.midpoint(col("p1"), col("p2")).as("mid"))

  /** W4 deterministic sample of ~s midpoints (embedder_pytorch.py:406-413)
    * via hash thresholding: expected s rows, exactly reproducible for a
    * (seed, iter), and NO global sort — a pure narrow filter, unlike
    * orderBy().limit() which shuffles every midpoint each iteration.
    * `refCount` is the midpoint population m. */
  def sampleMidpoints(mids: DataFrame, s: Int, seed: Long, refCount: Long): DataFrame =
    if (refCount <= s) mids
    else mids.filter(hashUniform(seed, col("eid")) < s.toDouble / refCount)

  /** J3 exact kNN: sampled query midpoints × all reference midpoints,
    * per-query top-k by squared distance (embedder_pytorch.py:543-593),
    * self-match dropped (embedder_pytorch.py:420-421).
    *
    * The query side (≤ sampleSize rows by contract) is collected and
    * broadcast as primitive arrays; each ref partition streams ONCE
    * through a compiled kernel holding a bounded worst-out buffer per
    * query, then the tiny per-partition survivors (parts × |q| × k
    * rows) merge through one window. The earlier join + window form
    * materialized all |q|·m joined rows into WindowGroupLimit's
    * per-partition SORT — 2.9 µs/pair vs ~10 ns here (measured 132 s
    * of task time per iteration at m=88k). Tie-breaks ((d2, rid) asc)
    * and the left-to-right d2 summation are identical, so results are
    * bit-equal to the join form.
    *
    * Query sides above `kernelMaxQueries` (where the broadcast arrays
    * and the O(|q|) inner scan stop being the fast plan) fall back to
    * the fully-distributed join+window form — same exact semantics,
    * never a thrown error (the internal run() path always samples
    * first; the fallback keeps the public entry point total). */
  def knnExact(queries: DataFrame, refs: DataFrame, k: Int, dim: Int = 3,
               kernelMaxQueries: Int = 65536): DataFrame = {
    val spark = refs.sparkSession
    import spark.implicits._
    // kernelMaxQueries == Int.MaxValue means the CALLER guarantees a
    // small query side (the loop samples first): plain one-job collect.
    // Otherwise probe via limit — CollectLimit scans partitions
    // incrementally, costing 2-3 mini-jobs, but never materializes an
    // unsampled query side on the driver.
    val qSel = queries.select(col("eid"), col("src"), col("dst"), col("mid"))
      .as[(Long, Long, Long, Array[Double])]
    val qArr =
      if (kernelMaxQueries == Int.MaxValue) qSel.collect()
      else qSel.limit(kernelMaxQueries + 1).collect()
    // the kernel is O(|q|) per ref row and the buffers O(|q|·k) per
    // task — an unsampled query side routes to the join+window plan
    // (exact, distributed both sides) instead of a quadratic broadcast
    if (qArr.length > kernelMaxQueries) {
      System.err.println(s"[graft] knnExact query side exceeds " +
        s"$kernelMaxQueries rows; using the distributed join+window " +
        "plan (consider knnLsh for approximate top-k at this scale)")
      return knnJoinWindow(queries, refs, k, dim)
    }
    val bc = spark.sparkContext.broadcast(qArr)
    val partial = refs.select(col("eid"), col("src"), col("dst"), col("mid"))
      .as[(Long, Long, Long, Array[Double])]
      .mapPartitions { it =>
        val qs = bc.value
        val nq = qs.length
        // per-query bounded buffers: parallel arrays of size k, slot of
        // the current worst tracked for O(1) reject of non-candidates
        val d2s = Array.fill(nq)(Array.fill(k)(Double.MaxValue))
        val rids = Array.fill(nq)(Array.fill(k)(Long.MaxValue))
        val rsrcs = Array.fill(nq)(new Array[Long](k))
        val rdsts = Array.fill(nq)(new Array[Long](k))
        def worse(a2: Double, ar: Long, b2: Double, br: Long): Boolean =
          a2 > b2 || (a2 == b2 && ar > br)
        it.foreach { case (rid, rsrc, rdst, rmid) =>
          var qi = 0
          while (qi < nq) {
            val q = qs(qi)
            if (q._1 != rid) {
              val qm = q._4
              var d2 = 0.0
              var i = 0
              while (i < dim) { val d = qm(i) - rmid(i); d2 += d * d; i += 1 }
              // find the worst slot; replace if this candidate beats it
              val ds = d2s(qi); val rs = rids(qi)
              var wi = 0; var j = 1
              while (j < k) { if (worse(ds(j), rs(j), ds(wi), rs(wi))) wi = j; j += 1 }
              if (worse(ds(wi), rs(wi), d2, rid)) {
                ds(wi) = d2; rs(wi) = rid
                rsrcs(qi)(wi) = rsrc; rdsts(qi)(wi) = rdst
              }
            }
            qi += 1
          }
        }
        (0 until nq).iterator.flatMap { qi =>
          val q = qs(qi)
          (0 until k).iterator.filter(s => d2s(qi)(s) < Double.MaxValue).map { s =>
            (q._1, q._2, q._3, rids(qi)(s), rsrcs(qi)(s), rdsts(qi)(s), d2s(qi)(s))
          }
        }
      }.toDF("qid", "qsrc", "qdst", "rid", "rsrc", "rdst", "d2")
    val w = Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("rid").asc)
    partial
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** The pre-kernel exact form: |q|×m join, per-query top-k window.
    * Same (d2, rid) asc tie-breaks and left-to-right d2 summation as
    * the kernel, so the two routes are bit-equal; this one distributes
    * BOTH sides, which is what an oversized query set needs. */
  private def knnJoinWindow(queries: DataFrame, refs: DataFrame,
                            k: Int, dim: Int): DataFrame = {
    val q = queries.select(col("eid").as("qid"), col("src").as("qsrc"),
      col("dst").as("qdst"), col("mid").as("qmid"))
    val r = refs.select(col("eid").as("rid"), col("src").as("rsrc"),
      col("dst").as("rdst"), col("mid").as("rmid"))
    val d2 = (0 until dim).map { i =>
      val df = element_at(col("qmid"), i + 1) - element_at(col("rmid"), i + 1)
      df * df
    }.reduce(_ + _)
    val w = Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("rid").asc)
    q.crossJoin(r)
      .filter(col("qid") =!= col("rid"))
      .withColumn("d2", d2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("qsrc"), col("qdst"),
        col("rid"), col("rsrc"), col("rdst"), col("d2"))
  }

  /** J3 approximate kNN via GRID BUCKETING — the scale path the layout
    * loop uses past `exactKnnMaxRef` midpoints (the cuVS-ANN analog,
    * embedder_cuvs.py:274-382).
    *
    * Shape: the (sampled, ≤ sampleSize) queries broadcast with a
    * driver-built cell→queries index (each query registers under its
    * 3^dim neighbor cells of side `cellSide`); refs stream ONCE through
    * the same compiled bounded-buffer kernel as [[knnExact]], but each
    * ref row is evaluated only against the queries probing ITS cell —
    * an O(1) map lookup. Any neighbor within `cellSide` of a query is
    * guaranteed probed, so with cellSide ≈ 2× the expected k-NN radius
    * recall is high by construction; candidates beyond the shell are
    * skipped without ever materializing a pair row.
    *
    * Why this shape and not a cell equi-join or MLlib
    * BucketedRandomProjectionLSH (kept as [[knnLsh]]): both materialize
    * every candidate PAIR as a row. Midpoints are heavily skewed (BA
    * hubs pile thousands of midpoints into a cell; iteration 0 runs on
    * eigen-init positions with σ≈1/√n where ALL midpoints share one
    * cell), and the measured cost on the m=88k bench tier was ~4 min/
    * iter for the LSH join and ~17 s/iter for the cell join. Here the
    * same skewed candidate set costs ~10 ns/eval inside the kernel with
    * zero shuffle — sub-second/iter — and the degenerate all-in-one-
    * cell case just degrades to the exact kernel's linear pass. Falls
    * back to the distributed cell join for oversized query sides. */
  def knnGrid(spark: SparkSession, queries: DataFrame, refs: DataFrame,
              k: Int, dim: Int, cellSide: Double,
              kernelMaxQueries: Int = 65536): DataFrame = {
    require(cellSide > 0, s"cellSide must be positive, got $cellSide")
    import spark.implicits._
    // same collect/probe split as knnExact (see there)
    val qSel = queries.select(col("eid"), col("src"), col("dst"), col("mid"))
      .as[(Long, Long, Long, Array[Double])]
    val qArr =
      if (kernelMaxQueries == Int.MaxValue) qSel.collect()
      else qSel.limit(kernelMaxQueries + 1).collect()
    if (qArr.length > kernelMaxQueries) {
      System.err.println(s"[graft] knnGrid query side exceeds " +
        s"$kernelMaxQueries rows; using the distributed cell-join plan")
      return knnGridJoin(queries, refs, k, dim, cellSide)
    }
    // Cell key from the dim floor coordinates via a splitmix64-style
    // finalizer per step: XOR-multiply FNV collided 64 structured probe
    // tuples down to 36 keys here (tiny coords barely perturb the
    // state), and a query registered twice under one key gets evaluated
    // twice per ref — the duplicate insert then wastes a top-k buffer
    // slot. Strong mixing plus the per-query key dedup below keeps
    // every (query, ref) evaluation exactly-once.
    def mix64(z0: Long): Long = {
      var z = z0 + -7046029254386353131L // golden-gamma increment
      z = (z ^ (z >>> 30)) * -4658895280553007687L
      z = (z ^ (z >>> 27)) * -7723592293110705685L
      z ^ (z >>> 31)
    }
    def cellKey(coords: Array[Long]): Long = {
      var h = 1469598103934665603L
      var i = 0
      while (i < coords.length) { h = mix64(h ^ mix64(coords(i))); i += 1 }
      h
    }
    def coordsOf(mid: Array[Double]): Array[Long] =
      Array.tabulate(dim)(i => math.floor(mid(i) / cellSide).toLong)
    // driver index: cell key → indices of queries probing that cell
    val probing = new java.util.HashMap[Long, scala.collection.mutable.ArrayBuffer[Int]]()
    val nOffsets = math.pow(3, dim).toInt
    var qi = 0
    while (qi < qArr.length) {
      val base = coordsOf(qArr(qi)._4)
      val seen = new java.util.HashSet[java.lang.Long](nOffsets * 2)
      var code = 0
      while (code < nOffsets) {
        val c = new Array[Long](dim)
        var i = 0
        var rem = code
        while (i < dim) { c(i) = base(i) + rem % 3 - 1; rem /= 3; i += 1 }
        val key = cellKey(c)
        if (seen.add(key))
          probing.computeIfAbsent(key,
            _ => scala.collection.mutable.ArrayBuffer.empty[Int]) += qi
        code += 1
      }
      qi += 1
    }
    val probeIdx: java.util.HashMap[Long, Array[Int]] = {
      val m = new java.util.HashMap[Long, Array[Int]](probing.size * 2)
      probing.forEach((k, v) => m.put(k, v.toArray))
      m
    }
    val bcQ = spark.sparkContext.broadcast(qArr)
    val bcIdx = spark.sparkContext.broadcast(probeIdx)
    val bcSide = cellSide
    val partial = refs.select(col("eid"), col("src"), col("dst"), col("mid"))
      .as[(Long, Long, Long, Array[Double])]
      .mapPartitions { it =>
        val qs = bcQ.value
        val idx = bcIdx.value
        val nq = qs.length
        val d2s = Array.fill(nq)(Array.fill(k)(Double.MaxValue))
        val rids = Array.fill(nq)(Array.fill(k)(Long.MaxValue))
        val rsrcs = Array.fill(nq)(new Array[Long](k))
        val rdsts = Array.fill(nq)(new Array[Long](k))
        def worse(a2: Double, ar: Long, b2: Double, br: Long): Boolean =
          a2 > b2 || (a2 == b2 && ar > br)
        def mix64(z0: Long): Long = {
          var z = z0 + -7046029254386353131L
          z = (z ^ (z >>> 30)) * -4658895280553007687L
          z = (z ^ (z >>> 27)) * -7723592293110705685L
          z ^ (z >>> 31)
        }
        it.foreach { case (rid, rsrc, rdst, rmid) =>
          var h = 1469598103934665603L
          var i = 0
          while (i < dim) {
            h = mix64(h ^ mix64(math.floor(rmid(i) / bcSide).toLong))
            i += 1
          }
          val cands = idx.get(h)
          if (cands != null) {
            var ci = 0
            while (ci < cands.length) {
              val qi = cands(ci)
              val q = qs(qi)
              if (q._1 != rid) {
                val qm = q._4
                var d2 = 0.0
                var j = 0
                while (j < dim) { val d = qm(j) - rmid(j); d2 += d * d; j += 1 }
                val ds = d2s(qi); val rs = rids(qi)
                var wi = 0; var s = 1
                while (s < k) { if (worse(ds(s), rs(s), ds(wi), rs(wi))) wi = s; s += 1 }
                if (worse(ds(wi), rs(wi), d2, rid)) {
                  ds(wi) = d2; rs(wi) = rid
                  rsrcs(qi)(wi) = rsrc; rdsts(qi)(wi) = rdst
                }
              }
              ci += 1
            }
          }
        }
        (0 until nq).iterator.flatMap { qi =>
          val q = qs(qi)
          (0 until k).iterator.filter(s => d2s(qi)(s) < Double.MaxValue).map { s =>
            (q._1, q._2, q._3, rids(qi)(s), rsrcs(qi)(s), rdsts(qi)(s), d2s(qi)(s))
          }
        }
      }.toDF("qid", "qsrc", "qdst", "rid", "rsrc", "rdst", "d2")
    val w = Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("rid").asc)
    partial
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .drop("rn")
  }

  /** Distributed cell-join form of [[knnGrid]] for oversized query
    * sides: refs key by cell, queries explode over their 3^dim probe
    * cells, codegen'd distances, one top-k window. Materializes
    * candidate pairs as rows — only the fallback, not the loop path. */
  private def knnGridJoin(queries: DataFrame, refs: DataFrame,
                          k: Int, dim: Int, cellSide: Double): DataFrame = {
    def cellCoord(c: String, i: Int) =
      floor(element_at(col(c), i + 1) / cellSide).cast("long")
    val r = refs.select(col("eid").as("rid"), col("src").as("rsrc"),
      col("dst").as("rdst"), col("mid").as("rmid"),
      xxhash64((0 until dim).map(i => cellCoord("rmid", i)): _*).as("cell"))
    val offsets = (0 until math.pow(3, dim).toInt).map { code =>
      (0 until dim).map(i => (code / math.pow(3, i).toInt) % 3 - 1)
    }
    val q = queries.select(col("eid").as("qid"), col("src").as("qsrc"),
      col("dst").as("qdst"), col("mid").as("qmid"))
      .withColumn("cell", explode(array(offsets.map(o =>
        xxhash64((0 until dim).map(i =>
          cellCoord("qmid", i) + lit(o(i).toLong)): _*)): _*)))
    val d2 = (0 until dim).map { i =>
      val df = element_at(col("qmid"), i + 1) - element_at(col("rmid"), i + 1)
      df * df
    }.reduce(_ + _)
    val w = Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("rid").asc)
    q.join(r, "cell")
      .filter(col("qid") =!= col("rid"))
      .withColumn("d2", d2)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("qid"), col("qsrc"), col("qdst"),
        col("rid"), col("rsrc"), col("rdst"), col("d2"))
  }

  /** Cell side for [[knnGrid]] under the loop's A4 normalization
    * (positions re-scaled to std 1 per dim every iteration, so σ ≈ 1
    * needs no stats pass): ~2× the uniform-density estimate of the
    * k-NN radius, 4σ(k/n)^(1/d). */
  def gridCellSide(nRefs: Long, k: Int, dim: Int): Double =
    math.max(1e-6,
      8.0 * math.pow((k + 1).toDouble / math.max(nRefs, 1L), 1.0 / dim))

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

  /** A3 intersection repulsion contributions (unaggregated): for each
    * candidate edge pair from kNN that properly intersects (P4/P5/P6),
    * push all 4 endpoints away from the pair centroid with k_inter/d²
    * (embedder_pytorch.py:638-736). One explode pass — see
    * springContrib for why unions of selects are forbidden here. */
  def intersectionContrib(pairs: DataFrame, pos: DataFrame, cfg: LayoutConfig,
                          bcast: Boolean = true): DataFrame = {
    val d = cfg.nComponents
    def side(df: DataFrame) = if (bcast) broadcast(df) else df
    val p = pairs
      .filter(col("qid") < col("rid")) // P4 i<j
      .filter(!(col("qsrc") === col("rsrc") || col("qsrc") === col("rdst") ||
        col("qdst") === col("rsrc") || col("qdst") === col("rdst"))) // P5
    val withPos = p
      .join(side(pos.select(col("id").as("qsrc"), col("pos").as("p1"))), "qsrc")
      .join(side(pos.select(col("id").as("qdst"), col("pos").as("p2"))), "qdst")
      .join(side(pos.select(col("id").as("rsrc"), col("pos").as("q1"))), "rsrc")
      .join(side(pos.select(col("id").as("rdst"), col("pos").as("q2"))), "rdst")
      .filter(VecOps.segmentsIntersect(col("p1"), col("p2"), col("q1"), col("q2"))) // P6
      .withColumn("c4", VecOps.centroid4(col("p1"), col("p2"), col("q1"), col("q2")))
    val exploded = withPos.select(col("c4"), explode(array(
      struct(col("qsrc").as("id"), col("p1").as("pt")),
      struct(col("qdst").as("id"), col("p2").as("pt")),
      struct(col("rsrc").as("id"), col("q1").as("pt")),
      struct(col("rdst").as("id"), col("q2").as("pt")))).as("c"))
      .select(col("c.id").as("id"), col("c.pt").as("pt"), col("c4"))
    val diffs = (0 until d).map(i =>
      (element_at(col("pt"), i + 1) - element_at(col("c4"), i + 1)).as(s"d$i"))
    val dsq = (0 until d).map(i => col(s"d$i") * col(s"d$i")).reduce(_ + _)
    exploded.select(Seq(col("id")) ++ diffs: _*)
      .withColumn("dist", sqrt(dsq) + lit(1e-6))
      .select(col("id"), array((0 until d).map(i =>
        col(s"d$i") * lit(cfg.kInter) / (col("dist") * col("dist"))): _*).as("f"))
  }

  /** Aggregated intersection forces (kept for direct use/tests). */
  def intersectionForces(pairs: DataFrame, pos: DataFrame, cfg: LayoutConfig): DataFrame =
    VecOps.sumVecBy(intersectionContrib(pairs, pos, cfg), "id", cfg.nComponents, "f")

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

  /** One layout iteration (update_positions, embedder_pytorch.py:776-806).
    * Spring and intersection contributions are unioned RAW and fused
    * into one scatter-add hash aggregate — a single force shuffle per
    * iteration instead of three. */
  def step(spark: SparkSession, edgesWithId: DataFrame, pos: DataFrame,
           cfg: LayoutConfig, iter: Int, refCount: Long,
           nVertices: Long = 0L): DataFrame = {
    val bcast = nVertices <= cfg.broadcastPosMax
    val spring = springContrib(edgesWithId, pos, cfg, bcast)
    val contrib =
      if (cfg.kInter == 0.0) spring
      else {
        val mids = midpoints(edgesWithId, pos, bcast)
        val sampled = sampleMidpoints(mids, cfg.sampleSize, cfg.seed + iter, refCount)
        val pairs =
          if (refCount <= cfg.exactKnnMaxRef) {
            // the BNLJ evaluates |sampled|·m distance rows — compute-
            // bound, unlike every other (scheduling-bound) stage of the
            // loop, so its stream side is repartitioned for the CORES,
            // not for the data size (~250k pair-evals per task). With
            // the loop's data-sized coalesce alone, a 10k-edge graph
            // ran 5M evals on one task (13 s/iter single-threaded).
            val cores = spark.sparkContext.defaultParallelism
            val q = math.min(cfg.sampleSize.toLong, refCount)
            val parts = math.max(1L,
              math.min(cores.toLong, q * refCount / 250000L + 1L)).toInt
            val refs = if (parts > 1) mids.repartition(parts) else mids
            // Int.MaxValue: the query side is sampled two lines up —
            // skip the incremental limit-probe's extra per-iter jobs
            knnExact(sampled, refs, cfg.nNeighbors, cfg.nComponents,
              kernelMaxQueries = Int.MaxValue)
          } else knnGrid(spark, sampled, mids, cfg.nNeighbors, cfg.nComponents,
            gridCellSide(refCount, cfg.nNeighbors, cfg.nComponents),
            kernelMaxQueries = Int.MaxValue)
        spring.unionByName(intersectionContrib(pairs, pos, cfg, bcast))
      }
    val forcesRaw = VecOps.sumVecBy(contrib, "id", cfg.nComponents, "f")
    // forces join pos WITHOUT a broadcast hint: a broadcast build is a
    // separate driver-blocking job per iteration, while the shuffle
    // join folds into the main job (both sides are loop-state-sized).
    // At cluster scale forces ~ n rows — not broadcastable anyway, so
    // the shuffle plan is also the one that survives 100× data.
    val forces = forcesRaw
    // Unnormalized move; run() checkpoints this, then applies A4
    // normalization as a lazy projection over the cached rows so the
    // force pipeline executes exactly once per iteration.
    pos.join(forces, Seq("id"), "left")
      .select(col("id"),
        when(col("f").isNull, col("pos"))
          .otherwise(VecOps.add(col("pos"), col("f"))).as("pos"))
  }

  /** L3 driver loop (run_layout, embedder_pytorch.py:808-833).
    * Routes to [[runLocal]] below `cfg.localMaxEdges` edges (long/long
    * edge schema only — eids must hash identically on both routes);
    * the distributed loop above. Both routes implement the same
    * dynamics; they differ only in floating-point summation order, so
    * trajectories agree to ~1e-6 over a few iterations (asserted by
    * EmbeddingSpec) and statistically thereafter. */
  def run(spark: SparkSession, edges: DataFrame, initial: DataFrame,
          cfg: LayoutConfig): DataFrame = {
    // The driver cap also respects exactKnnMaxRef when intersection
    // forces are on: past it the distributed loop switches to grid-ANN
    // kNN, so a driver run (always exact kNN) would diverge
    // structurally, not just in FP order — parity holds only under the
    // joint cap.
    val localCap =
      if (cfg.kInter == 0.0) cfg.localMaxEdges
      else math.min(cfg.localMaxEdges, cfg.exactKnnMaxRef)
    graft.util.DriverRoute.probePairs(edges, "src", "dst", localCap) match {
      case Some(eArr) => return runLocal(spark, eArr, initial, cfg)
      case None => // over threshold or non-long schema → distributed
    }
    val e = withEdgeIds(edges).persist()
    val m = e.count()
    // Size the edge/position partitioning to the DATA, like the shuffle
    // count: generator/parquet inputs arrive in default-parallelism
    // partitions (64 for a 264-row grid), and every per-iteration stage
    // inherits that task count. coalesce is narrow over the cache and
    // never increases the partition count, so big inputs keep theirs.
    val eSized = e.coalesce(graft.util.Iterate.sizedPartitions(spark, m))
    graft.util.Iterate.withSizedShuffle(spark, m) {
      runLoop(spark, eSized, initial, cfg, m)
    }
  }

  /** Driver-local twin of the distributed loop — identical dynamics
    * (same eid hashing, same hash-threshold midpoint sampling, same
    * bounded-buffer kNN with (d2, rid) tie-breaks, same P4/P5/P6
    * intersection predicate, same ddof=1 normalization), executed on
    * collected arrays with the kNN parallelized across cores. The
    * reference runs this entire regime single-node (NumPy/PyTorch);
    * routing small graphs to the driver is the Spark-honest version of
    * that, with [[runLoop]] carrying the 100 TB regime. */
  private def runLocal(spark: SparkSession, eArrAll: Array[(Long, Long)],
                       initial: DataFrame, cfg: LayoutConfig): DataFrame = {
    import graft.util.DriverRoute.{hashStart, foldLong, toUniform}
    val d = cfg.nComponents
    val init = initial.select(col("id"), col("pos")).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    val n = init.length
    val ids = init.map(_._1)
    val idIdx = new java.util.HashMap[Long, Int](n * 2)
    var vi = 0
    while (vi < n) { idIdx.put(ids(vi), vi); vi += 1 }
    var pos = init.map(_._2.clone())
    // Edges with an endpoint absent from `initial` are DROPPED, exactly
    // like the distributed gather's inner join (a null from idIdx.get
    // would otherwise silently unbox to vertex 0). The sampling
    // denominator stays the FULL edge count, matching the distributed
    // loop, which counts edges before the gather.
    val eArr = eArrAll.filter { case (s, t) =>
      idIdx.containsKey(s) && idIdx.containsKey(t) }
    val mFull = eArrAll.length
    val m = eArr.length
    // eid = xxhash64(src, dst): seed 42, fold each long
    val eids = new Array[Long](m)
    val esrc = new Array[Int](m); val edst = new Array[Int](m)
    var ei = 0
    while (ei < m) {
      val (s, t) = eArr(ei)
      eids(ei) = foldLong(foldLong(42L, s), t)
      esrc(ei) = idIdx.get(s); edst(ei) = idIdx.get(t)
      ei += 1
    }
    // hashUniform(seed, eid) = xxhash64(lit(seed), eid) >>> 11 / 2^53
    def hashU(seed: Long, x: Long): Double =
      toUniform(foldLong(hashStart(seed), x))
    var it = 0
    while (it < cfg.numIterations) {
      val force = Array.fill(n)(new Array[Double](d))
      ei = 0
      while (ei < m) { // A2 spring, same sign/eps as springContrib
        val a = esrc(ei); val b = edst(ei)
        val pa = pos(a); val pb = pos(b)
        var d2 = 0.0; val diff = new Array[Double](d)
        var i = 0
        while (i < d) { diff(i) = pb(i) - pa(i); d2 += diff(i) * diff(i); i += 1 }
        val dist = math.sqrt(d2) + 1e-6
        val coef = -cfg.kAttr * (dist - cfg.LMin) / dist
        i = 0
        while (i < d) {
          val f = diff(i) * coef; force(a)(i) += f; force(b)(i) -= f; i += 1
        }
        ei += 1
      }
      if (cfg.kInter != 0.0) {
        val mids = Array.tabulate(m) { j =>
          val pa = pos(esrc(j)); val pb = pos(edst(j))
          Array.tabulate(d)(i => (pa(i) + pb(i)) / 2.0)
        }
        val thr = cfg.sampleSize.toDouble / mFull
        val sampled =
          if (mFull <= cfg.sampleSize) Array.range(0, m)
          else Array.range(0, m).filter(j => hashU(cfg.seed + it, eids(j)) < thr)
        val k = cfg.nNeighbors
        // kNN: per-query bounded worst-out buffer, (d2, rid) asc ties —
        // queries are independent, so fan out across cores
        val nbrs = new Array[Array[Int]](sampled.length)
        java.util.stream.IntStream.range(0, sampled.length).parallel().forEach { si =>
          val qj = sampled(si)
          val qm = mids(qj)
          val ds = Array.fill(k)(Double.MaxValue)
          val rs = Array.fill(k)(Long.MaxValue)
          val ridx = new Array[Int](k)
          var wi = 0 // current worst slot
          var rj = 0
          while (rj < m) {
            if (eids(rj) != eids(qj)) {
              val rm = mids(rj)
              var d2 = 0.0; var i = 0
              while (i < d) { val df = qm(i) - rm(i); d2 += df * df; i += 1 }
              val rid = eids(rj)
              if (d2 < ds(wi) || (d2 == ds(wi) && rid < rs(wi))) {
                ds(wi) = d2; rs(wi) = rid; ridx(wi) = rj
                var j = 1; wi = 0
                while (j < k) {
                  if (ds(j) > ds(wi) || (ds(j) == ds(wi) && rs(j) > rs(wi))) wi = j
                  j += 1
                }
              }
            }
            rj += 1
          }
          nbrs(si) = (0 until k).filter(s => ds(s) < Double.MaxValue)
            .map(ridx).toArray
        }
        // A3 intersection repulsion over surviving (P4/P5/P6) pairs
        var si = 0
        while (si < sampled.length) {
          val qj = sampled(si)
          for (rj <- nbrs(si)) {
            if (eids(qj) < eids(rj)) { // P4
              val qs = esrc(qj); val qd = edst(qj)
              val rsrc = esrc(rj); val rdst = edst(rj)
              if (qs != rsrc && qs != rdst && qd != rsrc && qd != rdst) { // P5
                val p1 = pos(qs); val p2 = pos(qd)
                val q1 = pos(rsrc); val q2 = pos(rdst)
                def o(ax: Double, ay: Double, bx: Double, by: Double,
                      cx: Double, cy: Double): Double =
                  math.signum((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))
                val o1 = o(p1(0), p1(1), p2(0), p2(1), q1(0), q1(1))
                val o2 = o(p1(0), p1(1), p2(0), p2(1), q2(0), q2(1))
                val o3 = o(q1(0), q1(1), q2(0), q2(1), p1(0), p1(1))
                val o4 = o(q1(0), q1(1), q2(0), q2(1), p2(0), p2(1))
                if (o1 * o2 < 0 && o3 * o4 < 0) { // P6
                  val c4 = Array.tabulate(d)(i =>
                    (p1(i) + p2(i) + q1(i) + q2(i)) / 4.0)
                  for ((v, pt) <- Seq((qs, p1), (qd, p2), (rsrc, q1), (rdst, q2))) {
                    var d2 = 0.0; var i = 0
                    while (i < d) { val df = pt(i) - c4(i); d2 += df * df; i += 1 }
                    val dist = math.sqrt(d2) + 1e-6
                    i = 0
                    while (i < d) {
                      force(v)(i) += (pt(i) - c4(i)) * cfg.kInter / (dist * dist)
                      i += 1
                    }
                  }
                }
              }
            }
          }
          si += 1
        }
      }
      // move + A4 center-and-scale (ddof=1, same eps)
      val sums = new Array[Double](d); val sqs = new Array[Double](d)
      vi = 0
      while (vi < n) {
        val p = pos(vi); val f = force(vi)
        var i = 0
        while (i < d) {
          p(i) += f(i); sums(i) += p(i); sqs(i) += p(i) * p(i); i += 1
        }
        vi += 1
      }
      var i = 0
      while (i < d) {
        val mean = sums(i) / n
        val variance =
          if (n > 1) math.max(0.0, (sqs(i) - n * mean * mean) / (n - 1)) else 0.0
        val scale = math.sqrt(variance) + 1e-6
        vi = 0
        while (vi < n) { pos(vi)(i) = (pos(vi)(i) - mean) / scale; vi += 1 }
        i += 1
      }
      it += 1
    }
    import spark.implicits._
    ids.zip(pos).toSeq.toDF("id", "pos")
  }

  private def runLoop(spark: SparkSession, e: DataFrame, initial: DataFrame,
                      cfg: LayoutConfig, m: Long): DataFrame = {
    // Per iteration: ONE full execution (materializing the moved
    // positions), then normalization stats + projection read the cache.
    var (pos, handle) = graft.util.Iterate.checkpoint(spark,
      initial.coalesce(graft.util.Iterate.sizedPartitions(spark, 0L)))
    val n = pos.count()
    val d = cfg.nComponents
    var it = 0
    while (it < cfg.numIterations) {
      // ONE job per iteration: the A4 stats aggregate IS the
      // materializing action of the checkpoint (the force pipeline
      // executes inside it; the persisted rows back the next step).
      // Partials are combined in PARTITION ORDER on the driver —
      // treeAggregate's completion-order combine makes float sums
      // run-dependent and breaks bit-reproducibility of the layout.
      val (moved, mh, partialsRaw) = graft.util.Iterate.checkpointWith(
        spark, step(spark, e, pos, cfg, it, m, n)) { rdd =>
        rdd.mapPartitionsWithIndex { (idx, rows) =>
          val s = new Array[Double](d); val q = new Array[Double](d); var c = 0L
          rows.foreach { row =>
            val p = row.getSeq[Double](1)
            var i = 0
            while (i < d) { s(i) += p(i); q(i) += p(i) * p(i); i += 1 }
            c += 1
          }
          Iterator((idx, (s, q, c)))
        }.collect()
      }
      handle.unpersist(blocking = false)
      val partials = partialsRaw.sortBy(_._1).map(_._2)
      val sums = new Array[Double](d); val sqs = new Array[Double](d); var cnt = 0L
      partials.foreach { case (s, q, c) =>
        var i = 0
        while (i < d) { sums(i) += s(i); sqs(i) += q(i); i += 1 }
        cnt += c
      }
      val comps = (0 until d).map { i =>
        val mean = sums(i) / cnt
        // sample std (ddof=1) to match torch.std (embedder_pytorch.py:803)
        val variance = if (cnt > 1) math.max(0.0, (sqs(i) - cnt * mean * mean) / (cnt - 1)) else 0.0
        (element_at(col("pos"), i + 1) - lit(mean)) / lit(math.sqrt(variance) + 1e-6)
      }
      pos = moved.select(col("id"), array(comps: _*).as("pos"))
      handle = mh
      it += 1
    }
    e.unpersist()
    pos
  }
}
