package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Rank-correlation utilities (reference A6–A8: benchmark.py:212-241,
  * visualization.py:28-90). */
object Correlation {

  /** Average tie rank (scipy.stats.rankdata 'average' — what spearmanr
    * uses), computed from a cumulative count over DISTINCT values:
    * rank(v) = cum(v) - (cnt(v)-1)/2. The unpartitioned window runs
    * over distinct values only; joining back distributes. For data
    * where even distinct values are huge, pre-bucket into quantiles
    * (approximate spearman) — exactness is kept here for oracle parity.
    */
  private def avgRank(df: DataFrame, c: String, rankCol: String): DataFrame = {
    val w = Window.orderBy(col(c))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranks = df.groupBy(col(c)).agg(count(lit(1)).as("_c"))
      .withColumn(rankCol, sum("_c").over(w) - (col("_c") - 1) / 2.0)
      .drop("_c")
    df.join(ranks, c.replaceAll("`", "") :: Nil)
  }

  /** Spearman ρ of two columns (benchmark.py:224: scipy spearmanr).
    * Constant columns → NaN (the reference's A11 guard,
    * run_benchmarks.py:169-175; also keeps ANSI-mode corr from raising
    * DIVIDE_BY_ZERO on zero variance — hit live on a constant PageRank
    * over disjoint K2 components). */
  def spearman(df: DataFrame, x: String, y: String): Double = {
    val cached = df.select(col(x), col(y))
    if (isConstant(cached, x) || isConstant(cached, y)) return Double.NaN
    val ranked = avgRank(avgRank(cached, x, "_rx"), y, "_ry")
    val r = ranked.agg(corr(col("_rx"), col("_ry"))).collect()(0)
    if (r.isNullAt(0)) Double.NaN else r.getDouble(0)
  }

  /** A11 constant-column guard (run_benchmarks.py:169-175). */
  def isConstant(df: DataFrame, c: String): Boolean =
    df.agg(countDistinct(col(c))).collect()(0).getLong(0) <= 1

  /** A7 full Spearman correlation matrix over the given columns
    * (visualization.py:52-90): returns (col_x, col_y, rho) rows. */
  def matrix(spark: SparkSession, df: DataFrame, cols: Seq[String]): DataFrame = {
    val rows = for (a <- cols; b <- cols) yield {
      val rho =
        if (a == b) 1.0
        else if (isConstant(df, a) || isConstant(df, b)) Double.NaN
        else spearman(df, a, b)
      (a, b, rho)
    }
    import spark.implicits._
    rows.toDF("col_x", "col_y", "rho")
  }

  /** A8 bootstrap CI of ρ: `resamples` seeded with-replacement samples,
    * percentile bounds (visualization.py:31-46). Resampling uses a
    * hash-seeded multinomial draw per resample so the whole bootstrap is
    * one grouped job, not a driver loop. */
  def bootstrapCi(spark: SparkSession, df: DataFrame, x: String, y: String,
                  resamples: Int = 1000, alpha: Double = 0.05,
                  seed: Long = 42): (Double, Double) = {
    val rhos = (0 until resamples).map { i =>
      val s = df.sample(withReplacement = true, 1.0, seed + i)
      spearman(s, x, y)
    }.filterNot(_.isNaN).sorted
    if (rhos.isEmpty) (Double.NaN, Double.NaN)
    else {
      val lo = rhos(math.max(0, (alpha / 2 * rhos.size).toInt))
      val hi = rhos(math.min(rhos.size - 1, ((1 - alpha / 2) * rhos.size).toInt))
      (lo, hi)
    }
  }
}
