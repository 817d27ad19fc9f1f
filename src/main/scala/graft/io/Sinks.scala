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

  /** Compact a parquet directory to ~`targetBytes` per output file —
    * the small-files remedy every long-running ingest needs: streaming
    * sinks and fine-grained partitioned writes accumulate thousands of
    * KB-scale files whose per-file open/footer cost eventually dominates
    * scans. One read + one write: the file count is computed from the
    * directory's actual on-disk bytes, and the rewrite round-robins rows
    * into exactly that many files (repartition, not coalesce — coalesce
    * would chain the upstream parallelism down to the file count and
    * starve the read stage). Returns (filesBefore, filesAfter).
    *
    * Writes to `outPath` (never in place — a failed in-place rewrite
    * would destroy the input; callers swap directories atomically at
    * the catalog/metastore layer). */
  def compactParquet(spark: org.apache.spark.sql.SparkSession, inPath: String,
                     outPath: String,
                     targetBytes: Long = 128L * 1024 * 1024): (Long, Long) = {
    require(inPath != outPath, "compactParquet never rewrites in place")
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(inPath)
    val fs = p.getFileSystem(conf)
    val parts = fs.listStatus(p).filter(f => f.isFile &&
      f.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes)
    spark.read.parquet(inPath).repartition(nOut.toInt)
      .write.mode("overwrite").parquet(outPath)
    val outFiles = fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet")).toLong
    (parts.length.toLong, outFiles)
  }

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

  /** Faceted scatter with per-facet OLS trendline as a self-contained
    * SVG string — the figure-output analog of the reference's
    * plot_radial_vs_centrality (visualization.py:93-127), which facets
    * radial distance against each centrality measure. Dependency-free
    * (the container has no plotting stack) and driver-side over a
    * COLLECTED result frame like every other renderer here: the input
    * is a per-vertex metrics table (thousands of rows), never corpus
    * data — `maxPoints` enforces that contract. */
  def svgScatter(df: DataFrame, xCol: String, yCol: String,
                 facetCol: String, title: String = "",
                 maxPoints: Int = 100000): String = {
    val pts = df.select(xCol, yCol, facetCol).collect().toSeq.flatMap { r =>
      (Option(r.get(0)), Option(r.get(1))) match {
        case (Some(x: Number), Some(y: Number)) =>
          val (xd, yd) = (x.doubleValue(), y.doubleValue())
          if (xd.isFinite && yd.isFinite)
            Some((xd, yd, Option(r.get(2)).fold("null")(_.toString)))
          else None
        case _ => None
      }
    }
    require(pts.size <= maxPoints,
      s"svgScatter is a driver-side result renderer: got ${pts.size} points " +
        s"(max $maxPoints) — aggregate or sample before plotting")
    val facets = pts.groupBy(_._3).toSeq.sortBy(_._1)
    val (fw, fh, pad, perRow) = (320, 260, 42, 3)
    val rowsN = math.max(1, (facets.size + perRow - 1) / perRow)
    val w = perRow * fw + 2 * pad
    val h = rowsN * fh + 2 * pad + (if (title.nonEmpty) 24 else 0)
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" font-family="sans-serif" font-size="10">\n"""
    if (title.nonEmpty)
      sb ++= s"""<text x="${w / 2}" y="16" text-anchor="middle" font-size="14">$title</text>\n"""
    facets.zipWithIndex.foreach { case ((name, fpts), fi) =>
      val x0 = pad + (fi % perRow) * fw
      val y0 = pad + (fi / perRow) * fh + (if (title.nonEmpty) 24 else 0)
      val (pw, ph) = (fw - 60, fh - 60)
      val xs = fpts.map(_._1); val ys = fpts.map(_._2)
      val (xmin, xmax) = (xs.min, xs.max)
      val (ymin, ymax) = (ys.min, ys.max)
      def sx(v: Double) = x0 + 40 +
        (if (xmax > xmin) (v - xmin) / (xmax - xmin) * pw else pw / 2.0)
      def sy(v: Double) = y0 + 10 + ph -
        (if (ymax > ymin) (v - ymin) / (ymax - ymin) * ph else ph / 2.0)
      // frame + axis labels
      sb ++= s"""<rect x="${x0 + 40}" y="${y0 + 10}" width="$pw" height="$ph" fill="none" stroke="#999"/>\n"""
      sb ++= s"""<text x="${x0 + 40 + pw / 2}" y="${y0 + 8}" text-anchor="middle" font-weight="bold">$name</text>\n"""
      sb ++= s"""<text x="${x0 + 40 + pw / 2}" y="${y0 + ph + 34}" text-anchor="middle">$xCol</text>\n"""
      sb ++= f"""<text x="${x0 + 36}" y="${sy(ymin)}%.1f" text-anchor="end">$ymin%.3g</text>\n"""
      sb ++= f"""<text x="${x0 + 36}" y="${sy(ymax)}%.1f" text-anchor="end">$ymax%.3g</text>\n"""
      fpts.foreach { case (x, y, _) =>
        sb ++= f"""<circle cx="${sx(x)}%.1f" cy="${sy(y)}%.1f" r="2" fill="#1f77b4" fill-opacity="0.6"/>\n"""
      }
      // OLS trendline (the px.scatter trendline='ols' analog)
      val n = fpts.size.toDouble
      val (mx, my) = (xs.sum / n, ys.sum / n)
      val sxx = xs.map(v => (v - mx) * (v - mx)).sum
      if (sxx > 0) {
        val slope = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum / sxx
        val icept = my - slope * mx
        def clampY(v: Double) = math.min(ymax, math.max(ymin, v))
        sb ++= f"""<line x1="${sx(xmin)}%.1f" y1="${sy(clampY(icept + slope * xmin))}%.1f" x2="${sx(xmax)}%.1f" y2="${sy(clampY(icept + slope * xmax))}%.1f" stroke="#d62728" stroke-width="1.5"/>\n"""
      }
    }
    sb ++= "</svg>"
    sb.toString
  }
}
