package graft.queries

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.io.EdgeListReader

/** S13–S16 file-format scans as ORACLE rows: both engines parse the
  * SAME fixture file — Spark through the distributed readers
  * ([[EdgeListReader]], reference grammar at datasets.py:306-357,
  * 485-529, 531-572, 575-683), DuckDB through `read_csv` with the
  * equivalent filter/cast/canonicalize SQL — so the hash compare
  * checks the full parse → undirect → dedupe pipeline, not just row
  * counts. Fixtures are deterministic byte strings written
  * (atomically, via .part rename) under /tmp/graft_fixtures by the
  * Spark side before reading; the driver runs the Spark dump first,
  * so the oracle always finds them. Each fixture deliberately
  * exercises the grammar's edge cases: comment lines, duplicate and
  * reversed edges, self-loops, 1-based ids (mtx), unknown endpoints
  * (csv graph).
  */
object IoQueries {

  private val fixtureDir = new File("/tmp/graft_fixtures")

  /** Write `content` to fixtureDir/name atomically (temp + rename) so
    * a concurrent reader never sees a half-written fixture. Gzip when
    * the name ends .gz — exercising the readers' transparent-gz path
    * end-to-end (Spark text source and DuckDB both decompress by
    * extension). */
  private def writeFixture(name: String, content: String): String = {
    fixtureDir.mkdirs()
    val dest = new File(fixtureDir, name)
    val tmp = new File(fixtureDir, name + ".part")
    val bytes = content.getBytes(StandardCharsets.UTF_8)
    if (name.endsWith(".gz")) {
      val os = new java.util.zip.GZIPOutputStream(
        new java.io.FileOutputStream(tmp))
      try os.write(bytes) finally os.close()
    } else Files.write(tmp.toPath, bytes)
    Files.move(tmp.toPath, dest.toPath, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    dest.getPath
  }

  // SNAP grammar torture row set: '#' comments, duplicate edge, the
  // reverse of an existing edge, a self-loop, tab + multi-space
  // separators (the reader splits on \s+; the oracle fixture keeps
  // single spaces on the lines DuckDB must parse — the tab line is a
  // duplicate of an existing pair so both engines agree either way).
  private[graft] def snapFixture(): String = writeFixture("snap.txt.gz",
    """# SNAP-style header comment
      |# FromNodeId ToNodeId
      |1 2
      |2 1
      |1 2
      |3 4
      |3\t4
      |5 5
      |7 9
      |2 5
      |""".stripMargin.replace("\\t", "\t"))

  private[graft] def edgesFixture(): String = writeFixture("graph.edges",
    """# ego-net style .edges fixture
      |10 20
      |20 30
      |30 10
      |10 30
      |40 50
      |""".stripMargin)

  // Matrix Market: '%' comments, a POSITIONAL dims line (6 6 7), then
  // 1-based coordinate pairs including a reversed duplicate.
  private[graft] def mtxFixture(): String = writeFixture("matrix.mtx",
    """%%MatrixMarket matrix coordinate pattern symmetric
      |% generated fixture with a comment line
      |6 6 7
      |1 2
      |2 3
      |3 1
      |4 5
      |5 6
      |6 4
      |2 5
      |""".stripMargin)

  // Semantic-Scholar-style CSV pair: ids dense-indexed in string sort
  // order; citations referencing unknown ids are dropped (reference
  // `if source is None: continue`, datasets.py:664-666); self-cite
  // dropped by the src<dst canonical filter.
  private[graft] def csvGraphFixture(): (String, String) = (
    writeFixture("nodes.csv",
      """id
        |p05
        |p01
        |p03
        |p02
        |p04
        |""".stripMargin),
    writeFixture("citations.csv",
      """source,target
        |p01,p02
        |p02,p01
        |p03,p05
        |p04,unknown1
        |unknownX,p01
        |p05,p05
        |p02,p04
        |""".stripMargin))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q128_read_snap" -> ((s, _) =>
      EdgeListReader.snap(s, snapFixture()).orderBy("src", "dst")),

    "q129_read_mtx" -> ((s, _) =>
      EdgeListReader.matrixMarket(s, mtxFixture()).orderBy("src", "dst")),

    "q130_read_edges" -> ((s, _) =>
      EdgeListReader.edges(s, edgesFixture()).orderBy("src", "dst")),

    "q131_read_csvgraph" -> ((s, _) => {
      val (nodes, cites) = csvGraphFixture()
      EdgeListReader.csvGraph(s, nodes, cites).orderBy("src", "dst")
    })
  )

  // DuckDB replays of the same grammars over the same files. Comment /
  // header / dims lines have a field count that fails the two-column
  // schema, so `ignore_errors` drops them exactly where the Spark
  // reader's filters do; the residual `starts_with` guard covers any
  // two-field comment, and TRY_CAST + IS NOT NULL mirrors the Spark
  // reader's unparseable-token filter (the tab-separated line lands
  // here on the DuckDB side, and is a duplicate pair by construction
  // so both engines converge after distinct). Canonicalization is the
  // same least/greatest + distinct + src<dst as GraphOps.undirect.
  def oracleSql: Map[String, String] = Map(
    "q128_read_snap" ->
      """WITH raw AS (
        |  SELECT * FROM read_csv('/tmp/graft_fixtures/snap.txt.gz',
        |    header=false, delim=' ', columns={'a':'VARCHAR','b':'VARCHAR'},
        |    ignore_errors=true)
        |  WHERE NOT starts_with(a, '#')),
        |e AS (SELECT TRY_CAST(a AS BIGINT) AS s, TRY_CAST(b AS BIGINT) AS t
        |  FROM raw)
        |SELECT DISTINCT least(s, t) AS src, greatest(s, t) AS dst
        |FROM e WHERE s IS NOT NULL AND t IS NOT NULL
        |  AND least(s, t) < greatest(s, t)""".stripMargin,

    "q129_read_mtx" ->
      """WITH raw AS (
        |  SELECT * FROM read_csv('/tmp/graft_fixtures/matrix.mtx',
        |    header=false, delim=' ', columns={'a':'VARCHAR','b':'VARCHAR'},
        |    ignore_errors=true)
        |  WHERE NOT starts_with(a, '%')),
        |e AS (SELECT TRY_CAST(a AS BIGINT) - 1 AS s,
        |  TRY_CAST(b AS BIGINT) - 1 AS t FROM raw)
        |SELECT DISTINCT least(s, t) AS src, greatest(s, t) AS dst
        |FROM e WHERE s IS NOT NULL AND t IS NOT NULL
        |  AND least(s, t) < greatest(s, t)""".stripMargin,

    "q130_read_edges" ->
      """WITH raw AS (
        |  SELECT * FROM read_csv('/tmp/graft_fixtures/graph.edges',
        |    header=false, delim=' ', columns={'a':'VARCHAR','b':'VARCHAR'},
        |    ignore_errors=true)
        |  WHERE NOT starts_with(a, '#')),
        |e AS (SELECT TRY_CAST(a AS BIGINT) AS s, TRY_CAST(b AS BIGINT) AS t
        |  FROM raw)
        |SELECT DISTINCT least(s, t) AS src, greatest(s, t) AS dst
        |FROM e WHERE s IS NOT NULL AND t IS NOT NULL
        |  AND least(s, t) < greatest(s, t)""".stripMargin,

    "q131_read_csvgraph" ->
      """WITH m AS (
        |  SELECT id, row_number() OVER (ORDER BY id) - 1 AS idx
        |  FROM read_csv('/tmp/graft_fixtures/nodes.csv', header=true,
        |    all_varchar=true)),
        |e AS (
        |  SELECT a.idx AS s, b.idx AS t
        |  FROM read_csv('/tmp/graft_fixtures/citations.csv', header=true,
        |    all_varchar=true) c
        |  JOIN m a ON c.source = a.id
        |  JOIN m b ON c.target = b.id)
        |SELECT DISTINCT CAST(least(s, t) AS BIGINT) AS src,
        |  CAST(greatest(s, t) AS BIGINT) AS dst
        |FROM e WHERE least(s, t) < greatest(s, t)""".stripMargin
  )
}
