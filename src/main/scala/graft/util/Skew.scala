package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (SURVEY §4 / the 100 TB checklist):
  * when one join key carries a disproportionate share of the fact rows,
  * a plain hash join lands that key's entire volume on ONE task. AQE's
  * skew-join handles the sort-merge case at runtime; this helper is the
  * explicit form for when the planner must be forced — e.g. broadcast-
  * ineligible dimension sides or deterministic plans under AQE-off
  * iterative loops. */
object Skew {

  /** Salted inner equi-join, row-identical to
    * `big.join(small, Seq(key))`: every big-side row picks one of
    * `factor` salt values by a deterministic hash of its whole row, so
    * a hot key's rows spread over `factor` tasks; the small side
    * replicates once per salt. Cost: small side × factor (keep `small`
    * dimension-sized); determinism: the salt is a content hash, not a
    * random, so results and partition routing replay identically. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(factor.toLong)))
    val smallS = small.withColumn("_salt",
      explode(array((0 until factor).map(i => lit(i.toLong)): _*)))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }

  /** Salted two-stage aggregation, result-identical to
    * `df.groupBy(key).agg(sum(valCol))` for exactly-representable
    * values (integers in doubles): stage 1 combines on
    * (key, content-hash salt) so a hot key's rows split over `factor`
    * concurrent reducers, stage 2 combines the `factor` partials per
    * key. Spark's hash aggregate already map-side-combines, so this
    * matters when the REDUCE side of one key exceeds a single task —
    * the groupBy analog of [[saltedJoin]]. Deterministic: content-hash
    * salt, associative combine. */
  def saltedSum(df: DataFrame, key: String, valCol: String,
                factor: Int): DataFrame = {
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    df.withColumn("_salt",
        pmod(xxhash64(struct(df.columns.map(col): _*)), lit(factor.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(col(valCol)).as("_partial"), count(lit(1)).as("_n"))
      .groupBy(col(key))
      .agg(sum("_partial").as(s"sum_$valCol"), sum("_n").as("n_rows"))
  }
}
