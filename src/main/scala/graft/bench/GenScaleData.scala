package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generate an ~sf1-EQUIVALENT of the hot tables (documents /
  * embeddings / events) for the second independent correctness scale
  * point (r6 verdict #4): oracle parity is proven at sf0.01 and sf0.1;
  * this gives a 10× point to show no scale-dependent nondeterminism
  * (partition-order-sensitive aggregation, overflow, skew-valve trips)
  * emerges beyond the driver's gate.
  *
  * Row counts extrapolate the driver's own sf ratios (documents 10×/sf
  * decade, embeddings 4×, events 10×): 50 000 docs, 8 000 vectors,
  * 1 000 000 events. Distributions mirror the driver data: ~31-word
  * Zipf-ish vocabulary (the df-degeneracy the operators are tuned
  * for), en-heavy lang mix over 5 codes, 20 sources, 64-dim float
  * embeddings with 10 labels, 5 event types over a 4-month window.
  * Everything is a seeded hash of the row id — bit-deterministic on
  * any partitioning. Dimension tables are copied from sf0.1 (the scale
  * point targets the hot-table queries).
  *
  * Each table lands as ONE parquet file named `<table>.parquet` (the
  * layout Tables.* and the DuckDB oracle both read).
  *
  * Usage: runMain graft.bench.GenScaleData /tmp/sf1eq
  */
object GenScaleData {
  val vocab: Array[String] = Array(
    "spark", "table", "join", "filter", "group", "agg", "sort", "scan",
    "shuffle", "hash", "merge", "batch", "stream", "window", "row",
    "column", "index", "cache", "disk", "memory", "plan", "query",
    "data", "value", "key", "part", "order", "line", "fast", "slow",
    "small")

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/sf1eq")
    val nDocs = args.lift(1).map(_.toInt).getOrElse(50000)
    val nVecs = args.lift(2).map(_.toInt).getOrElse(8000)
    val nEvents = args.lift(3).map(_.toInt).getOrElse(1000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    new java.io.File(out).mkdirs()

    def writeOne(df: DataFrame, name: String): Unit = {
      val tmp = s"$out/_tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"no part file for $name"))
      val dest = new java.io.File(s"$out/$name.parquet")
      dest.delete()
      require(part.renameTo(dest), s"rename failed for $name")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm); f.delete(); ()
      }
      rm(new java.io.File(tmp))
      println(s"[gen] $name.parquet written")
    }

    val langs = Array("en", "en", "en", "en", "de", "es", "fr", "zh")
    val docs = spark.range(nDocs).map { id =>
      val r = new java.util.Random(id * 6364136223846793005L + 42L)
      val len = 10 + r.nextInt(150)
      val text = Array.fill(len)(vocab(r.nextInt(vocab.length))).mkString(" ")
      (id, text, langs(r.nextInt(langs.length)), s"src${(id % 20).toInt}",
        text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    writeOne(docs, "documents")

    val vecs = spark.range(nVecs).map { id =>
      val r = new java.util.Random(id * 2654435761L + 7L)
      val label = (id % 10).toInt
      // latent label centers + noise, the ProfileIvfPqScale shape
      val cr = new java.util.Random(9000L + label)
      val c = Array.fill(64)(cr.nextGaussian().toFloat)
      (id, Array.tabulate(64)(i => c(i) + 0.8f * r.nextGaussian().toFloat),
        label)
    }.toDF("vec_id", "embedding", "label")
      .withColumn("label", col("label").cast("int"))
    writeOne(vecs, "embeddings")

    val types = Array("view", "click", "purchase", "signup", "error")
    val events = spark.range(nEvents).map { id =>
      val r = new java.util.Random(id * 1103515245L + 12345L)
      val ts = 1704067200000000L + // 2024-01-01 UTC in micros
        (r.nextDouble() * 120.0 * 86400.0 * 1e6).toLong
      (id, ts, r.nextInt(15000).toLong, types(r.nextInt(types.length)),
        math.rint(r.nextDouble() * 50000.0) / 100.0, s"""{"k": ${r.nextInt(100)}}""")
    }.toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .select(col("event_id"),
        timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
    writeOne(events, "events")

    // dimension tables: copy from sf0.1 byte-for-byte
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem")) {
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"/root/testdata/sf0.1/$t.parquet"),
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    println(s"[gen] done → $out")
    spark.stop()
  }
}
