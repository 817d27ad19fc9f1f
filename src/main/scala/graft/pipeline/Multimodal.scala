package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media (image/audio/video) as opaque
  * `binary` payloads with typed metadata, processed in partition-sized
  * batches via `mapPartitions` (the JVM analog of `mapInPandas` batch
  * processing — same batch shape, schema contract and partitioning
  * story; no Python worker hop).
  *
  * The actual codec work (JPEG decode, resampling, frame extraction) is
  * STUBBED with a deterministic fake — media codec libraries are not in
  * this environment — but everything Spark-cares-about is real: schema,
  * batch iteration, partition sizing, and the feature-column contract
  * downstream consumers (Similarity.bruteForceTopK etc.) rely on.
  */
object Multimodal {

  /** Media record schema: id, modality, payload (opaque), metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("modality", StringType),
    StructField("payload", BinaryType),
    StructField("meta_width", IntegerType),
    StructField("meta_height", IntegerType),
    StructField("meta_duration_ms", IntegerType)))

  /** Wrap any table's text column as a synthetic media table — the
    * payload layout (8-byte header + body) stands in for an encoded
    * frame; header carries fake dimensions derived from content. */
  def syntheticMedia(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).cast("long").as("media_id"),
      when(col(idCol) % 3 === 0, "image")
        .when(col(idCol) % 3 === 1, "audio").otherwise("video").as("modality"),
      encode(col(textCol), "UTF-8").as("payload"),
      (pmod(xxhash64(col(textCol)), lit(1920)) + 32).cast("int").as("meta_width"),
      (pmod(xxhash64(col(textCol), lit(1)), lit(1080)) + 32).cast("int").as("meta_height"),
      (pmod(xxhash64(col(textCol), lit(2)), lit(60000)) + 1000).cast("int").as("meta_duration_ms"))

  /** STUB decode: a real implementation hands each partition's payloads
    * to a native codec in batches. The deterministic fake derives
    * `featDim` floats from the payload bytes so tests can assert the
    * full pipeline (schema, batching, determinism) end-to-end. */
  def decodeFeatures(spark: SparkSession, media: DataFrame, featDim: Int = 16,
                     batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("modality", StringType),
      StructField("n_bytes", IntegerType),
      StructField("features", ArrayType(FloatType))))
    val rdd = media.select("media_id", "modality", "payload").rdd
      .mapPartitions { it =>
        // batch iteration mirrors the Arrow-batch shape: accumulate up
        // to batchSize payloads, "decode" the batch, emit, repeat.
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val id = r.getLong(0)
            val mod = r.getString(1)
            val bytes = r.getAs[Array[Byte]](2)
            // ??? real codec call goes here (JPEG/PCM/H264 decode);
            // deterministic fake: rolling-hash features of the payload.
            val feats = new Array[Float](featDim)
            var h = 1125899906842597L
            var i = 0
            while (i < bytes.length) { h = 31 * h + bytes(i); i += 1
              if (i % 8 == 0 || i == bytes.length) {
                feats(((i - 1) / 8) % featDim) += (h % 1000) / 1000.0f }
            }
            Row(id, mod, bytes.length, feats.toSeq)
          }
        }
      }
    spark.createDataFrame(rdd, outSchema)
  }

  /** STUB resize/frame-sample: metadata-level transform (real work is
    * codec-side); keeps the schema contract for downstream stages. */
  def frameSample(media: DataFrame, everyMs: Int = 1000): DataFrame =
    media.filter(col("modality") === "video")
      .select(col("media_id"),
        explode(sequence(lit(0), col("meta_duration_ms"), lit(everyMs))).as("frame_ms"))
}
