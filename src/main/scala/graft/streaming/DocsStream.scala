package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming ingest surface for document corpora: exact dedup at
  * ingest time — the streaming twin of [[graft.pipeline.Dedup.exact]],
  * and the shape a training-data pipeline actually runs dedup in
  * (filter duplicates as shards arrive, not in a nightly batch).
  *
  * The state key is md5(text) (16 bytes/doc, never raw text), and
  * `dropDuplicatesWithinWatermark` bounds the state store by the
  * watermark delay: a duplicate arriving within `watermark` of the
  * original is dropped; state for older fingerprints is evicted. That
  * eviction is the 100 TB design point — unbounded `dropDuplicates`
  * state on a corpus-scale stream grows forever, while watermark-scoped
  * state holds only the ingest window. Cross-window dedup composes with
  * the batch operator over the accumulated corpus.
  */
object DocsStream {

  /** documents schema plus an ingest-time column, as a file stream
    * reads it. */
  val rawSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ingest_ts", TimestampType)))

  /** Keep the first-arriving copy of each distinct text within the
    * watermark window. Streaming-only by Spark's contract —
    * `dropDuplicatesWithinWatermark` rejects batch inputs; the batch
    * equivalent over an accumulated corpus is
    * [[graft.pipeline.Dedup.exact]] (q24's oracle-checked operator,
    * which PipelineSpec asserts this stream agrees with). */
  def dedupOnIngest(docs: DataFrame, watermark: String = "2 hours"): DataFrame =
    docs.withColumn("fp", md5(col("text")))
      .withWatermark("ingest_ts", watermark)
      .dropDuplicatesWithinWatermark("fp")
}
