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
    val nodes = spark.read.option("header", "true").csv(nodesCsv)
      .select(col(idCol).as("paper"))
      .withColumn("idx", row_number().over(Window.orderBy(col("paper"))).cast("long") - 1)
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

/** S18 dispatcher (datasets.py:726-758): prefix-routed reader registry.
  * The reference keys on dataset-name prefixes (snap-/mtx-/…) and pairs
  * each with a fetch step; fetching is driver-side tooling out of
  * engine scope (SURVEY.md S17), so the registry here maps a prefixed
  * name plus a local path to the right parser. */
object Datasets {
  val loaders: Map[String, (SparkSession, String) => DataFrame] = Map(
    "snap" -> ((s, p) => EdgeListReader.snap(s, p)),
    "mtx" -> ((s, p) => EdgeListReader.matrixMarket(s, p)),
    "edges" -> ((s, p) => EdgeListReader.edges(s, p)))

  def load(spark: SparkSession, name: String, path: String): DataFrame = {
    val prefix = name.takeWhile(_ != '-')
    loaders.getOrElse(prefix,
      sys.error(s"unknown dataset prefix '$prefix' (known: ${loaders.keys.mkString(",")})"))
      .apply(spark, path)
  }
}
