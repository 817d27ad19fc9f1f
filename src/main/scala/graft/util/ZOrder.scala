package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-code) clustering for multi-dimensional data layout.
  *
  * A single-column range sort clusters one dimension perfectly and
  * leaves every other dimension scattered across all files; interleaving
  * the bits of two dimensions into one Morton code gives every aligned
  * code block a square footprint, so min/max file statistics prune scans
  * that filter on EITHER dimension — the standard layout trick for a
  * 100 TB table queried by (customer, time) or (lat, lon) style
  * predicates. Pure shift/mask column expressions, fully codegen'd.
  */
object ZOrder {

  /** Morton code of N ≥ 2 non-negative integer columns: bit i of
    * dimension j lands at position i·N + j, for the low `bits` bits of
    * each (callers rank/clamp wider domains first — see [[clusterByZ]]).
    * Deterministic, oracle-checkable arithmetic; the interleave must
    * fit a long (N·bits ≤ 63). */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    val n = dims.size
    require(n >= 2, s"need >= 2 dimensions, got $n")
    require(bits >= 1 && n * bits <= 63,
      s"need 1 <= bits and dims*bits <= 63, got $n*$bits")
    dims.zipWithIndex.map { case (c, j) =>
      val cl = c.cast("long")
      (0 until bits).map(i =>
        shiftleft(shiftright(cl, i).bitwiseAND(lit(1L)), i * n + j))
        .reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** Two-dimensional Morton code: bit i of `x` at position 2i, of `y`
    * at 2i+1 — [[zValueN]] on (x, y). */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column =
    zValueN(Seq(x, y), bits)

  /** Cluster a frame for write: range-partition on the Morton code of
    * (x, y) and sort within partitions, so each output file covers a
    * contiguous z-interval — a compact axis-aligned region of the
    * (x, y) plane whose min/max statistics both dimensions can prune
    * on. Range partitioning samples boundaries (one lightweight Spark
    * job) and balances file sizes even under skew; AQE coalesces
    * near-empty trailing ranges. The helper column is dropped, so the
    * written schema is the caller's. */
  def clusterByZ(df: DataFrame, x: Column, y: Column, numPartitions: Int,
                 bits: Int = 16): DataFrame = {
    require(numPartitions >= 1, s"numPartitions must be >= 1, got $numPartitions")
    df.withColumn("_z", zValue2(x, y, bits))
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }
}
