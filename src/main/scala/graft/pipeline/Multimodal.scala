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
  * IMAGE decode is REAL: `javax.imageio` ships in the JDK (PNG, BMP,
  * GIF, JPEG readers), so image payloads are decoded to pixels and the
  * feature vector carries actual decoded-pixel statistics. AUDIO decode
  * is REAL for WAV/PCM: `javax.sound.sampled` (also pure JDK) parses
  * RIFF/WAVE containers, so audio payloads decode to samples and the
  * features carry actual waveform statistics (RMS, zero-crossing rate,
  * temporal-segment energies). VIDEO codec work (frame extraction)
  * remains STUBBED with a deterministic fake — no container/codec
  * library in this environment — but everything Spark-cares-about is
  * real for all modalities: schema, batch iteration, partition sizing,
  * and the feature-column contract downstream consumers
  * (Similarity.bruteForceTopK etc.) rely on.
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

  /** Decoded-pixel features for an image payload via javax.imageio:
    * [width, height, mean luma, std luma, then (featDim-4) vertical-
    * strip luma means] — a deterministic decode → grayscale → resample
    * pipeline on real pixels. Returns None when no JDK reader claims
    * the bytes (payload is not an image, or an exotic codec). */
  private[pipeline] def imageFeatures(bytes: Array[Byte],
                                      featDim: Int): Option[Array[Float]] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val feats = new Array[Float](featDim)
        val strips = math.max(featDim - 4, 0)
        val stripSum = new Array[Double](math.max(strips, 1))
        val stripCnt = new Array[Long](math.max(strips, 1))
        var sum = 0.0
        var sq = 0.0
        val row = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, row, 0, w)
          var x = 0
          while (x < w) {
            val rgb = row(x)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            val luma = (0.299 * r + 0.587 * g + 0.114 * b) / 255.0
            sum += luma; sq += luma * luma
            if (strips > 0) {
              val s = x * strips / w
              stripSum(s) += luma; stripCnt(s) += 1
            }
            x += 1
          }
          y += 1
        }
        val nPix = w.toDouble * h
        val mean = sum / nPix
        val variance = math.max(0.0, sq / nPix - mean * mean)
        if (featDim > 0) feats(0) = w.toFloat
        if (featDim > 1) feats(1) = h.toFloat
        if (featDim > 2) feats(2) = mean.toFloat
        if (featDim > 3) feats(3) = math.sqrt(variance).toFloat
        var s = 0
        while (s < strips) {
          feats(4 + s) =
            if (stripCnt(s) > 0) (stripSum(s) / stripCnt(s)).toFloat else 0f
          s += 1
        }
        Some(feats)
      }
    } catch { case _: Exception => None }

  /** Decoded-waveform features for an audio payload via
    * javax.sound.sampled (pure JDK — WAV/AIFF/AU containers, PCM
    * codecs): [sample_rate, channels, RMS amplitude, zero-crossing
    * rate, then (featDim-4) temporal-segment RMS energies] over the
    * channel-averaged signal normalized to [-1, 1]. Returns None when
    * the bytes aren't a parseable container or the codec isn't plain
    * 16-bit-signed / 8-bit-unsigned PCM. */
  private[pipeline] def audioFeatures(bytes: Array[Byte],
                                      featDim: Int): Option[Array[Float]] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        import javax.sound.sampled.AudioFormat.Encoding
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val pcm16 = fmt.getEncoding == Encoding.PCM_SIGNED && bits == 16
        val pcm8 = fmt.getEncoding == Encoding.PCM_UNSIGNED && bits == 8
        if (!pcm16 && !pcm8) None
        else {
          val data = in.readAllBytes()
          val ch = fmt.getChannels
          val frameBytes = (bits / 8) * ch
          val nFrames = data.length / frameBytes
          if (nFrames == 0) None
          else {
            val segs = math.max(featDim - 4, 0)
            val segSum = new Array[Double](math.max(segs, 1))
            val segCnt = new Array[Long](math.max(segs, 1))
            var sq = 0.0
            var crossings = 0L
            var prev = 0.0
            var i = 0
            while (i < nFrames) {
              // channel-averaged mono sample in [-1, 1]
              var acc = 0.0
              var c = 0
              while (c < ch) {
                val off = i * frameBytes + c * (bits / 8)
                acc +=
                  (if (pcm16) {
                    val lo = data(off + (if (fmt.isBigEndian) 1 else 0)) & 0xff
                    val hi = data(off + (if (fmt.isBigEndian) 0 else 1))
                    ((hi << 8) | lo) / 32768.0
                  } else ((data(off) & 0xff) - 128) / 128.0)
                c += 1
              }
              val s = acc / ch
              sq += s * s
              if (i > 0 && (s > 0) != (prev > 0) && (s != 0 || prev != 0))
                crossings += 1
              prev = s
              if (segs > 0) {
                val k = (i * segs / nFrames).toInt
                segSum(k) += s * s; segCnt(k) += 1
              }
              i += 1
            }
            val feats = new Array[Float](featDim)
            if (featDim > 0) feats(0) = fmt.getSampleRate
            if (featDim > 1) feats(1) = ch.toFloat
            if (featDim > 2) feats(2) = math.sqrt(sq / nFrames).toFloat
            if (featDim > 3) feats(3) =
              (if (nFrames > 1) crossings.toDouble / (nFrames - 1) else 0.0).toFloat
            var k = 0
            while (k < segs) {
              feats(4 + k) =
                if (segCnt(k) > 0) math.sqrt(segSum(k) / segCnt(k)).toFloat else 0f
              k += 1
            }
            Some(feats)
          }
        }
      } finally in.close()
    } catch { case _: Exception => None }

  /** Batch decode: image payloads run through the REAL javax.imageio
    * pixel pipeline and audio payloads through the REAL
    * javax.sound.sampled PCM pipeline (`decoded = true`); video — and
    * payloads no JDK reader claims — fall back to the deterministic
    * rolling-hash fake (`decoded = false`), keeping the schema/batch
    * contract identical across modalities so downstream stages never
    * branch. */
  def decodeFeatures(spark: SparkSession, media: DataFrame, featDim: Int = 16,
                     batchSize: Int = 64): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("modality", StringType),
      StructField("n_bytes", IntegerType),
      StructField("decoded", BooleanType),
      StructField("features", ArrayType(FloatType))))
    val rdd = media.select("media_id", "modality", "payload").rdd
      .mapPartitions { it =>
        // keep ImageIO in-memory: its default disk cache writes a tmp
        // file per read — pure overhead for payloads already in RAM
        javax.imageio.ImageIO.setUseCache(false)
        // batch iteration mirrors the Arrow-batch shape: accumulate up
        // to batchSize payloads, decode the batch, emit, repeat.
        it.grouped(batchSize).flatMap { batch =>
          batch.map { r =>
            val id = r.getLong(0)
            val mod = r.getString(1)
            val bytes = r.getAs[Array[Byte]](2)
            val real = mod match {
              case "image" => imageFeatures(bytes, featDim)
              case "audio" => audioFeatures(bytes, featDim)
              case _ => None
            }
            val (feats, decoded) = real match {
              case Some(f) => (f, true)
              case None =>
                // deterministic fake for the stubbed codecs:
                // rolling-hash features of the payload.
                val f = new Array[Float](featDim)
                var h = 1125899906842597L
                var i = 0
                while (i < bytes.length) { h = 31 * h + bytes(i); i += 1
                  if (i % 8 == 0 || i == bytes.length) {
                    f(((i - 1) / 8) % featDim) += (h % 1000) / 1000.0f }
                }
                (f, false)
            }
            Row(id, mod, bytes.length, decoded, feats.toSeq)
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
