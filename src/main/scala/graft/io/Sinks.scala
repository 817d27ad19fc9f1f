package graft.io

import org.apache.spark.sql.DataFrame

/** S19 result sinks (run_benchmarks.py:495-930): CSV via the DataFrame
  * writer (EdgeListReader.writeCsv), plus Markdown/LaTeX/HTML renderers
  * — string templating over collected result tables (these are
  * benchmark summaries of a few hundred rows, driver-side by design,
  * exactly as in the reference). */
object Sinks {

  /** Hive-style partitioned parquet layout: the write-side half of
    * partition pruning. A downstream filter on a partition column never
    * touches the other directories — the scan's PartitionFilters prune
    * before any I/O (asserted by ScaleUtilSpec). At 100 TB this is the
    * difference between reading one day and reading three years; choose
    * LOW-cardinality columns (date, source, lang), never ids. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: String*): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  private def cells(df: DataFrame): (Array[String], Seq[Array[String]]) = {
    val cols = df.columns
    val rows = df.collect().toSeq.map(r =>
      cols.indices.map(i => Option(r.get(i)).map {
        case d: Double => f"$d%.4f"
        case v => v.toString
      }.getOrElse("")).toArray)
    (cols, rows)
  }

  /** Markdown table (run_benchmarks.py:522-627). */
  def markdown(df: DataFrame): String = {
    val (cols, rows) = cells(df)
    val header = cols.mkString("| ", " | ", " |")
    val sep = cols.map(_ => "---").mkString("| ", " | ", " |")
    (Seq(header, sep) ++ rows.map(_.mkString("| ", " | ", " |"))).mkString("\n")
  }

  /** LaTeX tabular (run_benchmarks.py:629-770). */
  def latex(df: DataFrame): String = {
    val (cols, rows) = cells(df)
    def esc(s: String) = s.replace("_", "\\_").replace("%", "\\%")
    (Seq(
      s"\\begin{tabular}{${"l" * cols.length}}",
      "\\hline",
      cols.map(esc).mkString(" & ") + " \\\\",
      "\\hline") ++
      rows.map(_.map(esc).mkString(" & ") + " \\\\") ++
      Seq("\\hline", "\\end{tabular}")).mkString("\n")
  }

  /** Minimal HTML table (run_benchmarks.py:772-930). */
  def html(df: DataFrame): String = {
    val (cols, rows) = cells(df)
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    (Seq("<table>", "<tr>" + cols.map(c => s"<th>${esc(c)}</th>").mkString + "</tr>") ++
      rows.map(r => "<tr>" + r.map(c => s"<td>${esc(c)}</td>").mkString + "</tr>") ++
      Seq("</table>")).mkString("\n")
  }
}
