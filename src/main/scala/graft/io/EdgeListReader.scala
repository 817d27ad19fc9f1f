package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.model.GraphOps

/** Graph file readers (reference: datasets.py). All are pure textfile →
  * filter → split → cast pipelines; Spark reads .gz transparently and
  * splits large plain-text files across executors, so these scale to
  * edge lists far beyond the reference's single-node parser.
  */
object EdgeListReader {

  private def parsePairs(lines: DataFrame, comment: String, delim: String): DataFrame =
    lines.filter(!col("value").startsWith(comment) && length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), delim).as("f"))
      .filter(size(col("f")) >= 2)
      .select(col("f").getItem(0).cast("long").as("src"),
        col("f").getItem(1).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)

  /** SNAP `.txt`/`.txt.gz` edge list (datasets.py:306-357): skip `#`
    * comments, parse two ints per line, undirect + dedupe + src<dst. */
  def snap(spark: SparkSession, path: String): DataFrame =
    GraphOps.undirect(parsePairs(spark.read.text(path), "#", "\\s+"))

  /** `.edges` file — same grammar, no gz required (datasets.py:531-572). */
  def edges(spark: SparkSession, path: String): DataFrame = snap(spark, path)

  /** Matrix Market `.mtx` (datasets.py:485-529): skip `%` comments AND
    * the first non-comment line (dimensions), then 1-based → 0-based. */
  def matrixMarket(spark: SparkSession, path: String): DataFrame = {
    // The dims line is identified POSITIONALLY (first non-comment line):
    // limit(1)+exceptAll removed by VALUE, so a data row that textually
    // equals the header (e.g. weighted self-loop "5 5 12" in a 5×5/12
    // file) could be dropped instead. zipWithIndex preserves file order
    // for a text source.
    val spark2 = spark
    import spark2.implicits._
    val lines = spark.read.textFile(path)
      .filter((l: String) => !l.startsWith("%") && l.trim.nonEmpty)
    val body = lines.rdd.zipWithIndex()
      .filter(_._2 > 0).map(_._1).toDF("value")
    GraphOps.undirect(
      parsePairs(body, "%", "\\s+")
        .select((col("src") - 1).as("src"), (col("dst") - 1).as("dst")))
  }

  /** Semantic Scholar style CSV pair (datasets.py:575-683): nodes.csv has
    * an id column; citations.csv has source/target columns referencing
    * it. Paper id → dense 0..n-1 index via row_number; edges with
    * unknown endpoints dropped by the inner joins (same semantics as the
    * reference's `if source is None: continue`, datasets.py:664-666).
    * The node map broadcasts (nodes ≪ edges).
    */
  def csvGraph(spark: SparkSession, nodesCsv: String, edgesCsv: String,
               idCol: String = "id", srcCol: String = "source",
               dstCol: String = "target"): DataFrame = {
    // dense paper→index map via the size-guarded denseIndex (windowed
    // small / range-partitioned zipWithIndex at scale)
    val nodes = GraphOps.denseIndex(
      spark.read.option("header", "true").csv(nodesCsv)
        .select(col(idCol).as("paper")), "paper")
    val cites = spark.read.option("header", "true").csv(edgesCsv)
      .select(col(srcCol).as("s"), col(dstCol).as("t"))
    val m = broadcast(nodes)
    GraphOps.undirect(cites
      .join(m.withColumnRenamed("paper", "s").withColumnRenamed("idx", "src"), "s")
      .join(m.withColumnRenamed("paper", "t").withColumnRenamed("idx", "dst"), "t")
      .select("src", "dst"))
  }

  /** Result sink (run_benchmarks.py:495-520): header CSV. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}

/** S18 dispatcher (datasets.py:726-758): prefix-routed reader registry
  * plus the named catalog of the reference's 8 SNAP datasets
  * (datasets.py:205-262). A catalog entry resolves against a local
  * root directory by its canonical filename — the same
  * caching-by-existence convention the reference uses after its fetch
  * step (datasets.py:56-58); the fetch itself (S17) is
  * [[Fetch.download]]/[[Fetch.extract]], and [[Fetch.fetchAndLoad]]
  * is the one-call download-then-parse UX. */
object Datasets {

  /** Catalog metadata (datasets.py:205-262): canonical filename, SNAP
    * origin, directedness (undirected either way after U1), published
    * node/edge counts for sanity checks. */
  final case class DatasetInfo(name: String, fileName: String, url: String,
                               description: String, directed: Boolean,
                               nodes: Long, edges: Long)

  /** The reference's 8 named SNAP datasets, keyed `snap-<name>`. */
  val catalog: Map[String, DatasetInfo] = Seq(
    DatasetInfo("snap-facebook_combined", "facebook_combined.txt.gz",
      "https://snap.stanford.edu/data/facebook_combined.txt.gz",
      "Facebook social network", directed = false, 4039L, 88234L),
    DatasetInfo("snap-ego-twitter", "twitter_combined.txt.gz",
      "https://snap.stanford.edu/data/twitter_combined.txt.gz",
      "Twitter ego network", directed = true, 81306L, 1768149L),
    DatasetInfo("snap-wiki-vote", "wiki-Vote.txt.gz",
      "https://snap.stanford.edu/data/wiki-Vote.txt.gz",
      "Wikipedia who-votes-on-whom network", directed = true, 7115L, 103689L),
    DatasetInfo("snap-ca-GrQc", "ca-GrQc.txt.gz",
      "https://snap.stanford.edu/data/ca-GrQc.txt.gz",
      "Collaboration network of Arxiv General Relativity", directed = false,
      5242L, 14496L),
    DatasetInfo("snap-ca-HepTh", "ca-HepTh.txt.gz",
      "https://snap.stanford.edu/data/ca-HepTh.txt.gz",
      "Collaboration network of Arxiv High Energy Physics Theory",
      directed = false, 9877L, 25998L),
    DatasetInfo("snap-oregon1_010331", "oregon1_010331.txt.gz",
      "https://snap.stanford.edu/data/oregon1_010331.txt.gz",
      "AS peering network from Oregon route views", directed = false,
      10670L, 22002L),
    DatasetInfo("snap-p2p-Gnutella04", "p2p-Gnutella04.txt.gz",
      "https://snap.stanford.edu/data/p2p-Gnutella04.txt.gz",
      "Gnutella peer-to-peer network from August 4, 2002", directed = true,
      10876L, 39994L),
    DatasetInfo("snap-email-Enron", "email-Enron.txt.gz",
      "https://snap.stanford.edu/data/email-Enron.txt.gz",
      "Email communication network from Enron", directed = true,
      36692L, 183831L)
  ).map(d => d.name -> d).toMap

  /** Catalog listing as a DataFrame (datasets.py:686-723 analog).
    * `file_name`/`url` document the S17 pre-fetch contract: download
    * `url` (out of engine scope — zero egress here) and place it at
    * `<root>/<file_name>`, then `load(spark, name, root)` resolves it. */
  def list(spark: SparkSession): DataFrame = {
    import spark.implicits._
    catalog.values.toSeq.sortBy(_.name)
      .map(d => (d.name, d.description, d.directed, d.nodes, d.edges,
        d.fileName, d.url))
      .toDF("name", "description", "directed", "nodes", "edges",
        "file_name", "url")
  }

  /** Where [[load]] expects a catalog dataset on disk under `root` —
    * the target [[Fetch.download]] fills (S17) and the user's own
    * fetch step can pre-populate. */
  def expectedPath(name: String, root: String): String = {
    val info = catalog.getOrElse(name,
      sys.error(s"'$name' is not a catalog dataset (known: ${catalog.keys.toSeq.sorted.mkString(", ")})"))
    new java.io.File(root, info.fileName).getPath
  }

  val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
    "snap" -> ((s, p) => EdgeListReader.snap(s, p)),
    "mtx" -> ((s, p) => EdgeListReader.matrixMarket(s, p)),
    "edges" -> ((s, p) => EdgeListReader.edges(s, p)))

  /** Load a dataset by prefixed name. `path` is either the data file
    * itself or, for a catalog name, a directory holding the dataset
    * under its canonical filename (`load_dataset(name)` one-call UX,
    * datasets.py:726-758). */
  def load(spark: SparkSession, name: String, path: String): DataFrame = {
    val prefix = name.takeWhile(_ != '-')
    val loader = loaders.getOrElse(prefix,
      sys.error(s"unknown dataset prefix '$prefix' (known: ${loaders.keys.mkString(",")})"))
    val resolved = catalog.get(name) match {
      case Some(info) if new java.io.File(path).isDirectory =>
        new java.io.File(path, info.fileName).getPath
      case _ => path
    }
    loader(spark, resolved)
  }
}
