package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table plumbing for co-located joins (SURVEY §4 / the 100 TB
  * checklist): two fact tables bucketed AND sorted on their join key
  * with the same bucket count join with ZERO shuffle exchanges — each
  * task reads bucket i of both sides. At 100 TB this converts the
  * biggest repeated fact⋈fact shuffle (e.g. orders⋈lineitem on
  * orderkey) into a one-time write-side cost amortized over every
  * downstream join; the plan-shape guarantee is asserted by
  * ScaleUtilSpec. */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table.
    * Bucket counts must MATCH across tables that will join. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Read a bucketed table back (bucket metadata rides the catalog, so
    * this must be a table read, not a path read). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
