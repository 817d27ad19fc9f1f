package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.pipeline.Similarity

/** Streaming VECTOR ingest into an IVF index — the embedding-side twin
  * of the document gates: a live pipeline that embeds arriving
  * documents needs its vectors SEARCHABLE without nightly re-indexing,
  * and IVF's structure is exactly what makes that a stateless stream:
  * the coarse quantizer is FROZEN at train time (the
  * [[DocsStream.classifierScoreOnIngest]] posture — centroids are
  * nLists·dim doubles, broadcast-sized anywhere), so assignment is one
  * narrow typed map per arrival, no aggregate, no state store, no
  * shuffle.
  *
  * The index accrues as list-partitioned parquet
  * (`indexDir/batch=<id>/list=<l>/`) with the [[NearDupStream.attach]]
  * idempotency pattern — one overwritten batch partition per trigger,
  * so crash replay rewrites the same files. Search goes through
  * [[Similarity.ivfTopKFromIndex]]: probed lists are a ≤nLists
  * driver-side set, so the probe filter lands in the parquet scan as
  * `PartitionFilters` and a query reads nProbe/nLists of the index
  * bytes — at 100 TB of accumulated vectors that pruning IS the
  * difference between an ANN index and a full scan. Route equality
  * with the batch [[Similarity.ivfTopK]] under shared centroids is
  * pinned by PipelineSpec; the assignment arithmetic is ONE definition
  * ([[Similarity.ivfNearest]]) for all three call sites.
  *
  * Re-train cadence is the caller's: k-means centroids drift as the
  * corpus distribution does, so production re-trains offline
  * ([[Similarity.ivfTrainCentroids]]) and re-attaches — the accrued
  * index re-assigns with one batch `assignOnIngest` pass, not a
  * re-shuffle (assignment is a narrow map at any size). */
object IvfStream {

  /** Stateless list assignment: (idCol, vecCol, list) — one plan
    * serves batch and readStream. */
  def assignOnIngest(vecs: DataFrame, centers: Array[Array[Double]],
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centers)
    vecs.select(col(idCol).cast("long").as(idCol), col(vecCol).as(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) => (id, v, Similarity.ivfNearest(bc.value, v, 1)(0)) }
      .toDF(idCol, vecCol, "list")
  }

  /** Wire vector ingest into a running stream: each micro-batch is
    * assigned against the frozen centroids and lands in its own
    * idempotent `batch=<id>` partition, sub-partitioned by list. */
  def attach(stream: DataFrame, centers: Array[Array[Double]],
             indexDir: String, checkpointDir: String,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        assignOnIngest(batch, centers, idCol, vecCol)
          .write.partitionBy("list").mode("overwrite")
          .parquet(s"$indexDir/batch=$batchId")
        ()
      }
      .start()

  /** Stateless assign-and-ENCODE: (idCol, codes, list) — the
    * [[assignOnIngest]] twin for the 4×-compressed IVF-SQ8 index
    * ([[Similarity.ivfSqBuildIndex]]'s frame shape). Both quantizers
    * are frozen broadcasts; the map is narrow, so the codes index
    * accrues from a stream exactly like the float index — but at a
    * quarter of the stored bytes, which at 100 TB of arriving
    * embeddings is the difference between the index fitting the hot
    * tier or not. */
  def assignAndEncodeOnIngest(vecs: DataFrame,
                              centers: Array[Array[Double]],
                              codec: Similarity.SqCodec,
                              idCol: String = "vec_id",
                              vecCol: String = "embedding"): DataFrame = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val bcC = spark.sparkContext.broadcast(centers)
    val bcQ = spark.sparkContext.broadcast(codec)
    vecs.select(col(idCol).cast("long").as(idCol), col(vecCol).as(vecCol))
      .as[(Long, Array[Float])]
      .map { case (id, v) =>
        (id, bcQ.value.encode(v), Similarity.ivfNearest(bcC.value, v, 1)(0)) }
      .toDF(idCol, "codes", "list")
  }

  /** Wire CODES ingest into a running stream — the [[attach]] layout
    * (idempotent `batch=<id>` partitions, sub-partitioned by list) with
    * int8 codes as the stored payload. Search the accrued directory
    * with [[Similarity.ivfSqTopKFromIndex]] over [[readCodesIndex]];
    * the probed-list filter prunes the same way (PlanSpec pins the
    * float layout; the codes layout is identical). Route equality with
    * the batch [[Similarity.ivfSqBuildIndex]] is PipelineSpec-pinned. */
  def attachSq(stream: DataFrame, centers: Array[Array[Double]],
               codec: Similarity.SqCodec, indexDir: String,
               checkpointDir: String, idCol: String = "vec_id",
               vecCol: String = "embedding"): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        assignAndEncodeOnIngest(batch, centers, codec, idCol, vecCol)
          .write.partitionBy("list").mode("overwrite")
          .parquet(s"$indexDir/batch=$batchId")
        ()
      }
      .start()

  /** Accumulated CODES index rows (idCol, codes, list), or an empty
    * typed frame before the first write. */
  def readCodesIndex(spark: SparkSession, indexDir: String,
                     idCol: String = "vec_id"): DataFrame = {
    IndexSwap.restoreIfInterrupted(spark, indexDir)
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(path) && fs.listStatus(path).nonEmpty)
      spark.read.parquet(indexDir).select(idCol, "codes", "list")
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(idCol,
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("codes",
            org.apache.spark.sql.types.BinaryType),
          org.apache.spark.sql.types.StructField("list",
            org.apache.spark.sql.types.IntegerType))))
  }

  /** Offline quantizer refresh for the ACCRUED index — the re-train
    * path the frozen-quantizer design prescribes (quantizer drift is
    * the known failure mode of frozen IVF as the corpus distribution
    * moves): train new centroids offline
    * ([[Similarity.ivfTrainCentroids]] over [[readIndex]] or a fresh
    * sample), then ONE [[assignOnIngest]] pass re-lists every indexed
    * vector and the directory is atomically replaced with the
    * compacted list-partitioned result (`batch=-1`, the
    * [[NearDupStream.compactIndex]] layout + [[IndexSwap]] crash
    * discipline — a crash mid-swap self-heals on the next read).
    * Assignment is a narrow map against broadcast centroids at any
    * index size — no shuffle; the rewritten layout keeps
    * [[Similarity.ivfTopKFromIndex]]'s `PartitionFilters` pruning.
    * Run while the ingest stream is quiesced, then resume [[attach]]
    * with the NEW centroids (one frozen quantizer per epoch). */
  def reassign(spark: SparkSession, indexDir: String,
               newCenters: Array[Array[Double]],
               idCol: String = "vec_id",
               vecCol: String = "embedding"): Unit = {
    IndexSwap.requireLive(spark, indexDir, "IvfStream.reassign")
    val tmp = indexDir + ".compact"
    assignOnIngest(readIndex(spark, indexDir, idCol, vecCol)
        .select(idCol, vecCol), newCenters, idCol, vecCol)
      .write.partitionBy("list").mode("overwrite").parquet(s"$tmp/batch=-1")
    IndexSwap.swap(spark, indexDir, tmp)
  }

  /** Accumulated index rows (idCol, vecCol, list), or an empty typed
    * frame before the first write (the [[NearDupStream.readIndex]]
    * Hadoop-FS shape, including the interrupted-[[reassign]]
    * self-heal). */
  def readIndex(spark: SparkSession, indexDir: String,
                idCol: String = "vec_id",
                vecCol: String = "embedding"): DataFrame = {
    IndexSwap.restoreIfInterrupted(spark, indexDir)
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(path) && fs.listStatus(path).nonEmpty)
      spark.read.parquet(indexDir).select(idCol, vecCol, "list")
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField(idCol,
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField(vecCol,
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType)),
          org.apache.spark.sql.types.StructField("list",
            org.apache.spark.sql.types.IntegerType))))
  }
}
