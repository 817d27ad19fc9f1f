package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.pipeline.Dedup

/** Cross-batch NEAR-duplicate gate for streaming ingest — the gap the
  * exact-dedup stream ([[DocsStream.dedupOnIngest]]) leaves open: md5
  * state only catches byte-identical copies inside the watermark
  * window, while a real ingest pipeline must reject a paraphrased or
  * lightly-edited copy of a document the corpus absorbed WEEKS ago.
  *
  * Design (the accumulated-index pattern): every arriving document is
  * fingerprinted ROW-LOCALLY — [[Dedup.minhashSigExpr]], the shuffle-
  * free form of the q27 operator's KM minhash — and its LSH band keys
  * ([[Dedup.bandBucketsExpr]], bit-identical to the batch banding by
  * shared construction) are checked per micro-batch against a compacted
  * band-key INDEX of everything that ever arrived. A band collision
  * makes a candidate; candidates are verified by signature-estimated
  * Jaccard ([[Dedup.sigJaccard]] ≥ threshold — the index stores k longs
  * per doc, never text, so exact re-shingling is deliberately out of
  * reach and the batch twin is `minhashLsh(verify = "sig")`). Verified
  * arrivals are dropped; ALL arrivals' band keys join the index
  * (dropped docs keep indexing, so a chain-copy of a dropped doc is
  * still caught — the CC-conservative policy in arrival order).
  *
  * Scale: the index is (band, bucket, sig) — (k+2)·8 ≈ 530 bytes per
  * band row, bands·that per doc, independent of document size. The
  * per-batch work is one equi-join of the batch's band keys against a
  * bucket-bucketed index plus a narrow verify — no corpus re-shuffle,
  * no unbounded state store; watermarks are irrelevant because the
  * index IS the state, persisted as data. foreachBatch is the right
  * Spark surface: dedup-against-accumulated-corpus is a batch join per
  * trigger, not a keyed state machine (flatMapGroupsWithState would key
  * on band buckets and still need a second stateful doc-level stage —
  * two chained stateful operators where one batch join does the job).
  *
  * Semantics vs the batch operator: an arrival is dropped iff it
  * verifies against SOME earlier arrival (arrival order = doc order
  * within a batch). This agrees with `minhashLsh(verify="sig")` +
  * [[Dedup.dupClusters]] min-id resolution whenever every non-minimal
  * cluster member pairs directly with an earlier member (true for
  * planted copies; a doc whose only similar partner arrives LATER is
  * kept by both). PipelineSpec drives a near-dup arriving two batches
  * after its original and asserts stream ≡ batch.
  */
object NearDupStream {

  /** Row-local banded fingerprints of a document frame — usable on a
    * STREAM (no shuffle): (doc_id, band, bucket, sig). Docs shorter
    * than n tokens have no shingles → no band rows (they cannot be
    * near-dups at the n-gram level; route them through the exact gate). */
  def bandKeys(docs: DataFrame, n: Int = 3, k: Int = 64, bands: Int = 16,
               md5Based: Boolean = false, idCol: String = "doc_id",
               textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        Dedup.minhashSigExpr(col(textCol), n, k, md5Based).as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id"), col("sig"),
        posexplode(Dedup.bandBucketsExpr(col("sig"), k, bands, md5Based))
          .as(Seq("band", "bucket")))
      .select("doc_id", "band", "bucket", "sig")

  /** One micro-batch step of the gate. `index` holds the accumulated
    * (doc_id, band, bucket, sig) rows of every prior arrival (empty on
    * the first batch). Returns (survivors, indexAdd): the batch rows
    * that are NOT near-dups of anything earlier, and the batch's OWN
    * band rows to append to the index (all arrivals, kept or dropped).
    *
    * Earlier-in-same-batch arrivals count as "prior": the batch's own
    * band keys self-join with a doc_id inequality, so a near-dup and
    * its original landing in one trigger still dedup. */
  def filterBatch(batch: DataFrame, index: DataFrame, n: Int = 3,
                  k: Int = 64, bands: Int = 16, threshold: Double = 0.5,
                  md5Based: Boolean = false, idCol: String = "doc_id",
                  textCol: String = "text"): (DataFrame, DataFrame) = {
    val keys = bandKeys(batch, n, k, bands, md5Based, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    keys.count() // materialize once: used for cands, self-join, indexAdd
    val arrivals = keys.select(col("doc_id").as("_id"), col("band"),
      col("bucket"), col("sig").as("_psig"))
    // prior = accumulated index ∪ earlier-id rows of this batch. The
    // _pid =!= doc_id guard is the replay defense: if a crash-replayed
    // batch's own rows ever reach the index frame (e.g. an index
    // compaction folded a not-yet-committed batch), a doc must never
    // verify against ITSELF (sigJaccard = 1) and silently drop.
    val candIdx = keys.join(index.select(col("band"), col("bucket"),
        col("doc_id").as("_pid"), col("sig").as("_psig")),
      Seq("band", "bucket"))
      .filter(col("_pid") =!= col("doc_id"))
    val candSelf = keys.join(arrivals.withColumnRenamed("_id", "_pid"),
        Seq("band", "bucket"))
      .filter(col("_pid") < col("doc_id"))
    val dropped = candIdx.select(col("doc_id"), col("sig"), col("_psig"))
      .unionByName(candSelf.select(col("doc_id"), col("sig"), col("_psig")))
      .filter(Dedup.sigJaccard(col("sig"), col("_psig")) >= threshold)
      .select("doc_id").distinct()
    val survivors = batch.join(dropped.withColumnRenamed("doc_id", idCol),
      Seq(idCol), "left_anti")
    (survivors, keys)
  }

  /** Wire the gate into a running stream: foreachBatch maintains a
    * parquet band-key index at `indexDir` and writes survivors to
    * `outDir`. Both writes are IDEMPOTENT under streaming failure
    * replay: each batch lands in its own `batch=<batchId>` partition
    * directory with overwrite semantics, so a batch replayed after a
    * write-committed/checkpoint-lost crash rewrites the SAME files
    * instead of appending duplicates, and the index join excludes the
    * batch's own partition (plus the `_pid =!= doc_id` self-guard in
    * [[filterBatch]]) so a replayed batch can never drop its documents
    * against its own earlier write. Compact the index periodically with
    * [[compactIndex]] while the stream is quiesced (compaction folds
    * partitions together, so it must only see committed batches; keep
    * the index in a table format with atomic commit in production — the
    * logic only needs "read current index rows", so the storage layer
    * is swappable). */
  def attach(stream: DataFrame, indexDir: String, outDir: String,
             checkpointDir: String, n: Int = 3, k: Int = 64,
             bands: Int = 16, threshold: Double = 0.5,
             md5Based: Boolean = false): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val index = readIndex(spark, indexDir, k, excludeBatch = batchId)
        val (survivors, indexAdd) =
          filterBatch(batch, index, n, k, bands, threshold, md5Based)
        survivors.write.mode("overwrite")
          .parquet(s"$outDir/batch=$batchId")
        // deliberately IN-PLACE on replay (not IndexManifest
        // .installBatch): the gate's replay defense is readIndex's
        // `excludeBatch = batchId`, which scopes out the trigger's own
        // prior attempt BY ITS `batch=` PARTITION VALUE — a
        // copy-on-write re-attempt would move those rows to a rewrite
        // leaf the exclusion cannot see, and a second replay would
        // then gate the batch against its own rows (every doc
        // self-matches → survivors empty → output data loss). The
        // value-based alternative is impossible for gates: excluding
        // by content (fp/signature) would also exclude GENUINE earlier
        // copies, breaking the dedup decision itself. Price: a reader
        // pinned across the replay window may see this one trigger's
        // leaf rewritten in place (bytes identical for a deterministic
        // batch); commitBatch re-commits the same leaf, so the
        // manifest stays exact.
        indexAdd.select("doc_id", "band", "bucket", "sig")
          .write.mode("overwrite").parquet(s"$indexDir/batch=$batchId")
        IndexManifest.commitBatch(batch.sparkSession, indexDir, batchId)
        indexAdd.unpersist()
        ()
      }
      .start()

  /** [[graft.pipeline.Dedup.dedupAgainst]] probing the gate's
    * ACCUMULATED band-key index instead of re-signaturing the
    * reference corpus — the incremental-crawl backfill sharing state
    * with the streaming gate (r8 verdict #8): once the stream has
    * indexed a corpus (ideally [[compactIndex]]-ed, so each bucket's
    * rows are clustered), a batch backfill dedups against it at the
    * cost of ONE band equi-join — the reference side's signature scan,
    * the expensive half of `dedupAgainst` at 100 TB of reference, is
    * already paid.
    *
    * Same output contract as `dedupAgainst`: one row per new doc,
    * (doc_id, keep, n_matches, matched_ref), decisions identical by
    * construction ([[bandKeys]] is the same minhash/banding algebra;
    * verification is the same round-6 [[Dedup.sigJaccard]] cut) —
    * PipelineSpec pins route equality. Collisions verify BEFORE the
    * id-pair dedup (the [[filterBatch]] shape: both sigs ride the
    * collision row, so nothing joins signatures back); `n_matches`
    * counts distinct verifying reference docs. */
  def dedupAgainstIndex(newDocs: DataFrame, index: DataFrame, n: Int = 3,
                        k: Int = 64, bands: Int = 16,
                        threshold: Double = 0.5,
                        md5Based: Boolean = false, idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val keys = bandKeys(newDocs, n, k, bands, md5Based, idCol, textCol)
    val hits = keys
      .join(index.select(col("band"), col("bucket"),
        col("doc_id").as("_pid"), col("sig").as("_psig")),
        Seq("band", "bucket"))
      // the same self-match guard as [[filterBatch]]: a backfill doc
      // whose id already sits in the index (replayed backfill, id
      // overlap with the ingested corpus) must never verify against
      // ITSELF (sigJaccard = 1) and silently drop (r9 ADVICE)
      .filter(col("_pid") =!= col("doc_id"))
      .filter(round(Dedup.sigJaccard(col("sig"), col("_psig")), 6)
        >= threshold)
      .select(col("doc_id"), col("_pid")).distinct()
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_matches"), min(col("_pid")).as("matched_ref"))
    newDocs.select(col(idCol).as("doc_id")).join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        col("matched_ref").isNull.as("keep"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("matched_ref"))
  }

  /** [[dedupAgainstIndex]] against the index directory a running
    * [[attach]] maintains. `excludeBatch` scopes out one `batch=`
    * partition (a replaying backfill's own earlier write — the
    * [[readIndex]] replay defense, exposed here per r9 ADVICE). */
  def dedupAgainstIndex(spark: SparkSession, newDocs: DataFrame,
                        indexDir: String, n: Int, k: Int, bands: Int,
                        threshold: Double, excludeBatch: Long): DataFrame =
    dedupAgainstIndex(newDocs, readIndex(spark, indexDir, k, excludeBatch),
      n, k, bands, threshold)

  def dedupAgainstIndex(spark: SparkSession, newDocs: DataFrame,
                        indexDir: String, n: Int, k: Int, bands: Int,
                        threshold: Double): DataFrame =
    dedupAgainstIndex(spark, newDocs, indexDir, n, k, bands, threshold,
      excludeBatch = Long.MinValue)

  /** Current index rows (doc_id, band, bucket, sig), or an empty typed
    * frame before first write. Existence goes through the Hadoop
    * FileSystem API so an HDFS/S3 `indexDir` works — `java.io.File`
    * would silently read every remote index as absent and disable
    * cross-batch dedup without error. `excludeBatch` drops one
    * `batch=` partition (the replaying batch's own rows). Self-heals a
    * compaction interrupted between its two renames by restoring the
    * `.old` directory. */
  def readIndex(spark: SparkSession, indexDir: String, k: Int,
                excludeBatch: Long = Long.MinValue): DataFrame = {
    IndexSwap.restoreIfInterrupted(spark, indexDir)
    // manifested index: plan from the pinned snapshot, never a listing
    IndexManifest.current(spark, indexDir).foreach { snap =>
      return IndexManifest.readSnapshot(spark, indexDir, snap)
        .map { raw =>
          val scoped =
            if (raw.columns.contains("batch"))
              raw.filter(col("batch") =!= lit(excludeBatch))
            else raw
          scoped.select("doc_id", "band", "bucket", "sig")
        }
        .getOrElse(emptyBandFrame(spark))
    }
    val path = new org.apache.hadoop.fs.Path(indexDir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(path) && fs.listStatus(path).nonEmpty) {
      val raw = spark.read.parquet(indexDir)
      val scoped =
        if (raw.columns.contains("batch"))
          raw.filter(col("batch") =!= lit(excludeBatch))
        else raw
      scoped.select("doc_id", "band", "bucket", "sig")
    } else emptyBandFrame(spark)
  }

  private def emptyBandFrame(spark: SparkSession): DataFrame =
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("band",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("bucket",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("sig",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.LongType)))))

  /** Rewrite the per-batch partition litter as one bucket-sorted file
    * set under `batch=-1` — the periodic compaction a long-running
    * ingest schedules while the stream is quiesced (sorting by bucket
    * clusters each band key's rows for the per-batch join). The swap
    * uses the Hadoop FileSystem API (works on HDFS/S3, unlike
    * `java.io.File`) and removes the old directory only AFTER the
    * compacted one is renamed into place: write tmp → rename live to
    * `.old` → rename tmp to live → delete `.old`. A crash between the
    * renames leaves `.old` intact and [[readIndex]] restores it. */
  /** Fragmentation-driven compaction for the band-key index (the
    * [[graft.streaming.IvfStream.MaintainPolicy]].maxBatches arm for
    * the index families with no quantizer to drift): compacts when
    * the `batch=` directory count exceeds `maxBatches`, no-ops
    * otherwise. Returns whether it compacted. One directory listing
    * to decide; run quiesced, like [[compactIndex]]. */
  def compactIndexIfFragmented(spark: SparkSession, indexDir: String,
                               k: Int, maxBatches: Int,
                               partitions: Int = 32): Boolean = {
    val batches = IndexSwap.countBatches(spark, indexDir)
    if (batches > maxBatches) { compactIndex(spark, indexDir, k, partitions); true }
    else false
  }

  def compactIndex(spark: SparkSession, indexDir: String, k: Int,
                   partitions: Int = 32): Unit = {
    IndexSwap.requireLive(spark, indexDir, "compactIndex")
    val content = readIndex(spark, indexDir, k)
      .repartitionByRange(partitions, col("bucket"))
      .sortWithinPartitions("bucket")
    IndexManifest.current(spark, indexDir) match {
      case Some(snap) =>
        // copy-on-write: the compacted rows land in a fresh batch dir,
        // the commit retires every old leaf, pinned readers keep the
        // retained bytes until IndexManifest.vacuum
        content.write.mode("overwrite")
          .parquet(s"$indexDir/batch=${snap.rewriteBatchId}")
        IndexManifest.commitRewrite(spark, indexDir, snap, snap.leaves)
        ()
      case None =>
        val tmp = indexDir + ".compact"
        content.write.mode("overwrite").parquet(s"$tmp/batch=-1")
        IndexSwap.swap(spark, indexDir, tmp)
    }
  }
}
