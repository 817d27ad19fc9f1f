package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Temporal

/** Scale probe for the TEMPORAL / event-stream operators — the events
  * table replicated K× with DISJOINT user-id spaces, so every per-user
  * structure (sessions, timelines, daily series) reproduces the base
  * stream exactly K times and a linear-scaling operator must show
  * linear wall time in K. Run:
  *
  *   SPARK_GRAFT_CPUS=16 sbt "runMain graft.bench.EventsScaleProbe /root/testdata/sf0.1 4"
  *
  * Probes the operators whose shuffles key on the entity: gap
  * sessionization, the as-of join, per-key EWMA, daily resample +
  * forward fill, journey n-grams, and the retention grid. One JSON
  * line per run; slopes recorded in BASELINE.md. */
object EventsScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](b: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = b; (r, (System.nanoTime() - t0) / 1e9)
    }
    val base = graft.Tables.events(spark, sfDir)
    val ev = (0 until reps).map { k =>
      base.select((col("event_id") + lit(k * 1000000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(k * 10000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ union _).cache()
    val nEv = ev.count()
    val (nSess, tSess) = time(
      graft.streaming.EventsStream.sessions(ev).count())
    val (nAsof, tAsof) = time {
      val p = ev.filter(col("event_type") === "purchase")
        .select("user_id", "event_id", "ts", "value")
      val s = ev.filter(col("event_type") === "signup")
        .select(col("user_id"), col("ts"), col("event_id").as("sid"))
      Temporal.asofJoin(p, s, Seq("user_id"), "ts", "ts").count()
    }
    val (_, tEwma) = time(
      Temporal.ewma(ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "event_id", "value"),
        Seq("user_id"), "ts", "value", alpha = 0.2, tieCol = "event_id")
        .count())
    val (nRes, tRes) = time(
      Temporal.resampleDaily(ev.filter(col("event_type") === "purchase"),
        "user_id", "ts", "value").count())
    val (_, tJour) = time(
      Temporal.journeyNgrams(ev, "user_id", "event_type", "ts", "event_id")
        .count())
    val (nRet, tRet) = time(Temporal.retentionCohorts(ev).count())
    println(s"""{"probe":"events_scale","reps":$reps,"events":$nEv,""" +
      s""""sessions_sec":$tSess,"sessions":$nSess,""" +
      s""""asof_sec":$tAsof,"asof_rows":$nAsof,""" +
      s""""ewma_sec":$tEwma,""" +
      s""""resample_sec":$tRes,"resample_rows":$nRes,""" +
      s""""journeys_sec":$tJour,""" +
      s""""retention_sec":$tRet,"retention_rows":$nRet}""")
    spark.stop()
  }
}
