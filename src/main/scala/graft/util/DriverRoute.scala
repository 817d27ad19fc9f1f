package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Shared machinery for size-guarded driver routes (layout, cascades,
  * dedup clustering): a bounded limit-probe collector and the driver
  * replay of Spark's xxhash64 fold.
  *
  * The probe runs the upstream pipeline ONCE and decides the route from
  * the collected length — a count() + collect() pair would execute the
  * pipeline twice. Caps are clamped to Int.MaxValue-1 so a generous
  * Long cap cannot wrap limit() negative.
  */
object DriverRoute {

  /** Collect up to `cap` (c1, c2) long pairs. None → route distributed:
    * either the data exceeds the cap, or the columns are not LongType
    * (hash-replay routes need bit-identical xxhash64 inputs, and
    * xxhash64 of an int is not xxhash64 of a long). */
  def probePairs(df: DataFrame, c1: String, c2: String,
                 cap: Long): Option[Array[(Long, Long)]] = {
    if (cap <= 0 || df.schema(c1).dataType != LongType ||
        df.schema(c2).dataType != LongType) None
    else {
      val capI = math.min(cap, Int.MaxValue - 1L).toInt
      val arr = df.select(col(c1), col(c2))
        .as[(Long, Long)](org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.scalaLong))
        .limit(capI + 1).collect()
      if (arr.length <= capI) Some(arr) else None
    }
  }

  // Driver replay of the Catalyst xxhash64 fold: seed 42, children
  // folded left-to-right, ints via hashInt and longs via hashLong —
  // bit-identical to the codegen'd expression.
  import org.apache.spark.sql.catalyst.expressions.XXH64

  def hashStart(seed: Long): Long = XXH64.hashLong(seed, 42L)
  def foldLong(h: Long, v: Long): Long = XXH64.hashLong(v, h)
  def foldInt(h: Long, v: Int): Long = XXH64.hashInt(v, h)

  /** Top-53-bit uniform in [0,1) — Generators.hashUniform's scaling. */
  def toUniform(h: Long): Double = (h >>> 11) / 9007199254740992.0
}
