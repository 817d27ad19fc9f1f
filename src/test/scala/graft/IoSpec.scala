package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.io.{Datasets, EdgeListReader, Sinks}
import graft.model.GraphOps

/** Reader/sink specs over on-disk fixtures (reference grammar:
  * datasets.py:306-683). */
class IoSpec extends SparkSpec {

  private def write(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-io")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("snap reader: comments skipped, undirected, deduped") {
    val p = write("g.txt",
      """# comment line
        |# another
        |0 1
        |1 0
        |1 2
        |2 3
        |2 3
        |""".stripMargin)
    val g = EdgeListReader.snap(spark, p)
    assert(g.count() == 3) // (0,1),(1,2),(2,3)
    assert(GraphOps.isCanonical(g))
  }

  test("matrix market reader: % comments + dims line skipped, 1-based shifted") {
    val p = write("g.mtx",
      """%%MatrixMarket matrix coordinate pattern symmetric
        |% a comment
        |4 4 3
        |1 2
        |2 3
        |3 4
        |""".stripMargin)
    val g = EdgeListReader.matrixMarket(spark, p)
    assert(g.count() == 3)
    // 0-based after the -1 shift
    assert(g.agg(min("src")).collect()(0).getLong(0) == 0)
    assert(g.agg(max("dst")).collect()(0).getLong(0) == 3)
  }

  test("dataset catalog: named entry resolves by canonical filename") {
    // gzipped fixture under the catalog's canonical name, loaded via the
    // one-call load_dataset UX (datasets.py:726-758)
    val dir = Files.createTempDirectory("graft-catalog")
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("facebook_combined.txt.gz")))
    gz.write("# fb fixture\n0 1\n1 2\n2 0\n1 0\n".getBytes)
    gz.close()
    val info = Datasets.catalog("snap-facebook_combined")
    assert(info.nodes == 4039L && info.edges == 88234L && !info.directed)
    val g = Datasets.load(spark, "snap-facebook_combined", dir.toString)
    assert(g.count() == 3)
    assert(GraphOps.isCanonical(g))
    // listing covers all 8 names and documents the pre-fetch contract
    val listed = Datasets.list(spark)
    assert(listed.count() == 8)
    assert(listed.columns.contains("file_name") && listed.columns.contains("url"))
    // expectedPath names exactly the file load() resolves — the
    // documented S17 target for the user's own fetch step
    assert(Datasets.expectedPath("snap-facebook_combined", dir.toString) ==
      dir.resolve("facebook_combined.txt.gz").toString)
    intercept[RuntimeException] { Datasets.expectedPath("snap-nope", "/x") }
    // a non-catalog name still loads by direct path
    assert(Datasets.load(spark, "snap-adhoc",
      dir.resolve("facebook_combined.txt.gz").toString).count() == 3)
  }

  test("matrix market: data row textually equal to the dims line survives") {
    // header "4 5 3" and the weighted edge "4 5 3" are byte-identical;
    // only the POSITIONAL first line may be dropped.
    val p = write("h.mtx",
      """%%MatrixMarket matrix coordinate integer general
        |4 5 3
        |1 2
        |4 5 3
        |2 3
        |""".stripMargin)
    val g = EdgeListReader.matrixMarket(spark, p)
    assert(g.count() == 3, s"expected 3 edges, got ${g.count()}")
    assert(g.agg(max("dst")).collect()(0).getLong(0) == 4) // edge (3,4) kept
  }

  test("csv graph reader: id remap drops unknown endpoints") {
    val nodes = write("nodes.csv", "id\np1\np2\np3\n")
    val cites = write("cites.csv",
      "source,target\np1,p2\np2,p3\np1,unknown\nunknown,p2\n")
    val g = EdgeListReader.csvGraph(spark, nodes, cites)
    assert(g.count() == 2) // unknown endpoints dropped (inner joins)
    assert(GraphOps.isCanonical(g))
    assert(g.agg(max("dst")).collect()(0).getLong(0) <= 2)
  }

  test("dataset dispatcher routes by prefix and rejects unknown") {
    val p = write("g.edges", "0 1\n1 2\n")
    assert(Datasets.load(spark, "edges-fixture", p).count() == 2)
    intercept[RuntimeException] {
      Datasets.load(spark, "nope-fixture", p)
    }
  }

  test("csv sink round-trips; markdown/latex/html render") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("b", 2.5)).toDF("name", "value")
    val dir = Files.createTempDirectory("graft-sink").resolve("out").toString
    EdgeListReader.writeCsv(df, dir)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() == 2)
    val md = Sinks.markdown(df)
    assert(md.contains("| name | value |") && md.contains("| b | 2.5000 |"))
    assert(Sinks.latex(df).contains("\\begin{tabular}{ll}"))
    assert(Sinks.html(df).contains("<th>name</th>"))
  }

  test("svg scatter sink: faceted points + one OLS trendline per facet") {
    import spark.implicits._
    // two facets: 'deg' perfectly linear (trendline through the data),
    // 'pr' with spread; plus a NaN row that must be dropped
    val df = (Seq.tabulate(20)(i => (i.toDouble, 2.0 * i + 1, "deg")) ++
      Seq.tabulate(20)(i => (i.toDouble, (i % 5).toDouble, "pr")) :+
      (Double.NaN, 1.0, "deg"))
      .toDF("radius", "centrality", "measure")
    val svg = Sinks.svgScatter(df, "radius", "centrality", "measure",
      title = "radius vs centrality")
    assert(svg.startsWith("<svg ") && svg.endsWith("</svg>"))
    assert(svg.sliding(7).count(_ == "<circle") == 40) // NaN row dropped
    assert(svg.sliding(5).count(_ == "<line") == 2)    // one OLS per facet
    assert(svg.contains(">deg<") && svg.contains(">pr<"))
    // bounded-input contract is enforced, not silently sampled
    intercept[IllegalArgumentException] {
      Sinks.svgScatter(df, "radius", "centrality", "measure", maxPoints = 5)
    }
  }

  test("subsample keeps induced edges only; stats are consistent") {
    val g = graft.gen.Generators.roadNetwork(spark, 10, 10)
    val sub = GraphOps.subsample(g, 0.5, 7)
    // every endpoint of the subgraph survives the vertex sample
    val kept = GraphOps.vertices(sub)
    assert(sub.count() < g.count())
    val (n, m, density, avgDeg) = GraphOps.stats(g)
    assert(n == 100 && m == 180)
    assert(math.abs(density - 2.0 * 180 / (100 * 99)) < 1e-12)
    assert(math.abs(avgDeg - 3.6) < 1e-12)
  }

  test("random baseline influence lies within [k, n]") {
    val g = graft.gen.Generators.roadNetwork(spark, 5, 5)
    val mean = graft.influence.Influence.randomBaseline(spark, g, 3, 0.3,
      trials = 2, seed = 5)
    assert(mean >= 3.0 && mean <= 25.0)
  }
}
