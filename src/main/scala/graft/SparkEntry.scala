package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-module operator surfaces; every entry with
  * a deterministic, SQL-expressible semantics also appears in `oracleSql`
  * so the driver's DuckDB compare covers it (t2 correctness gate).
  */
object SparkEntry {

  private def modules: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (_root_.graft.queries.Relational.queries, _root_.graft.queries.Relational.oracleSql),
      (_root_.graft.queries.GraphQueries.queries, _root_.graft.queries.GraphQueries.oracleSql),
      (_root_.graft.queries.PipelineQueries.queries, _root_.graft.queries.PipelineQueries.oracleSql),
      (_root_.graft.queries.PipelineDedupQueries.queries, _root_.graft.queries.PipelineDedupQueries.oracleSql),
      (_root_.graft.queries.PipelineSimilarityQueries.queries, _root_.graft.queries.PipelineSimilarityQueries.oracleSql),
      (_root_.graft.queries.IoQueries.queries, _root_.graft.queries.IoQueries.oracleSql)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q02_agg_pricing")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.map(_._2).reduce(_ ++ _)
}
