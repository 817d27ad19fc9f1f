package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, forked by sbt). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // bucketed-table tests write managed tables — keep them in target/
      .config("spark.sql.warehouse.dir", "target/spark-warehouse")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

/** Shared suite base.
  *
  * EXPECTED `WARN WindowExec: No Partition Defined` SOURCES (r9
  * verdict #8 — this note is the "explained" list; a warning from any
  * OTHER source in an `sbt test` log is signal, not noise). Every
  * deliberate global window in production code runs over a frame
  * whose size is BOUNDED by construction, each documented at its
  * definition and — where a query exercises it — PlanSpec-pinned to
  * sit above the bounding aggregate (q105's `Exchange SinglePartition`
  * assertion is the pattern):
  *
  *  - Spearman/correlation rank windows (Correlation.scala): the
  *    WINDOW route of the dual-route design — the comparison twin the
  *    range-partitioned production route is spec-equated against, and
  *    the per-variable rank frames are column-distinct-bounded;
  *  - bounded global ranks over aggregated frames: q105 ntile over
  *    per-customer aggregates, q85 rolling over daily aggregates,
  *    top-k vocab/ngram cuts (TextAnalysis), skyline price groups,
  *    greedy trajectories (kCenter, q39) — all ≤ group-count rows;
  *  - id-remap / dense-index windowed route (Graph.scala:53): the
  *    small-graph route; the zipWithIndex distributed route is the
  *    scale path and spec-equated;
  *  - bootstrap/quantile replays and closed-form test fixtures that
  *    deliberately compare a distributed operator against a naive
  *    single-partition formulation (these fixtures define a constant
  *    partition where possible — the partitionBy(lit(0)) idiom).
  */
abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
  def sf: String = TestSpark.sf
}
