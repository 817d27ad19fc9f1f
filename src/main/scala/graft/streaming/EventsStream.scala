package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props).
  *
  * The reference has no streaming (SURVEY.md §2.9); this is the
  * forward-looking extension the testdata's events table invites:
  * tumbling-window aggregates with watermarked late-data handling, the
  * batch-equivalent of q11_events_hourly. The same transform function
  * serves both `read` and `readStream` inputs — single definition,
  * batch-checked by the DuckDB oracle, stream-checked by the
  * streaming spec.
  */
object EventsStream {

  /** events schema as stored in the driver's parquet: ts is
    * TIMESTAMP(MICROS, isAdjustedToUTC=false), which Spark reads as
    * TIMESTAMP_NTZ (normalized to TimestampType inside the transforms;
    * older nanos-as-long testdata is handled there too). */
  val rawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  private def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        // integer `div` — see Tables.events (double `/` loses µs above 2^53)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // exact under the session's UTC timezone — see Tables.events
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Hourly tumbling-window aggregate — identical semantics batch or
    * stream (window() is the streaming-safe form of date_trunc). */
  def hourlyAgg(events: DataFrame): DataFrame =
    normalizeTs(events)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n"), col("v"))

  /** Hopping (sliding) window aggregate: 1-hour windows advancing every
    * 30 minutes, so each event lands in exactly window/slide = 2
    * overlapping windows — the smoothed-trend view a tumbling window
    * can't give. Spark expands the window memberships in-plan (one
    * narrow generate, no self-join) and streaming state is bounded by
    * watermark × active (window, type) keys, exactly as for
    * [[hourlyAgg]] — ×2 window multiplicity, same eviction. The window
    * start is emitted as exact epoch micros for the integer-arithmetic
    * DuckDB twin. One transform serves batch and readStream. */
  def hourlyHopping(events: DataFrame): DataFrame =
    normalizeTs(events)
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
      .select(unix_micros(col("w.start")).as("w_start"),
        col("event_type"), col("n"), col("v"))

  /** Gap-based per-user sessionization (default 30-minute inactivity
    * gap): Spark's `session_window` computes the identical merge in
    * batch and streaming, and in streaming its state is bounded by the
    * watermark — the idiomatic form of what a custom
    * `flatMapGroupsWithState` session reducer would hand-roll. An event
    * arriving exactly `gap` after the previous one MERGES into the same
    * session (windows are [ts, ts+gap] with inclusive-end overlap —
    * pinned by the boundary test in PipelineSpec); only a strictly
    * larger inactivity gap starts a new session.
    *
    * Output: (user_id, sess_start µs, sess_events, sess_value) — the
    * session start is the min event time, emitted as epoch micros so
    * the DuckDB oracle compares exact integers, not formatted strings.
    */
  def sessions(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    normalizeTs(events)
      .withWatermark("ts", "2 hours")
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("sess_events"),
        round(sum(col("value")), 2).as("sess_value"))
      .select(col("user_id"), unix_micros(col("w.start")).as("sess_start"),
        col("sess_events"), col("sess_value"))

  /** One event as the stateful transition operator sees it (ts in exact
    * epoch micros — java.sql.Timestamp.getTime is ms-floored, so the
    * sub-ms part is recovered from getNanos). */
  case class Ev(user_id: Long, ts: java.sql.Timestamp,
                event_id: Long, event_type: String) {
    def us: Long = ts.getTime * 1000 + (ts.getNanos % 1000000) / 1000
  }
  /** Per-user custom state: events not yet past the watermark, plus the
    * type of the last already-emitted event (the stitch point across
    * flushes). (Public: Spark's generated encoder code needs access.) */
  case class TransState(buf: Seq[(Long, Long, String)],
                        lastType: Option[String])
  /** One emitted transition. */
  case class Transition(user_id: Long, ts_us: Long,
                        from_type: String, to_type: String)

  /** Per-user event-type transitions in EVENT-TIME order — the shape a
    * session-path / funnel analysis consumes.
    *
    * Batch form: `lag` over (user, ts) — one shuffle by user_id, sort
    * within partitions, scales with user cardinality.
    *
    * This is the operator that genuinely needs custom streaming state
    * (`flatMapGroupsWithState`): streams deliver events out of
    * event-time order, and no built-in streaming window provides `lag`.
    * [[transitionsStream]] buffers per-user events in state, and on
    * each watermark advance (EventTimeTimeout) sorts-and-flushes the
    * prefix at or below the watermark, stitching to the previous
    * flush's last event — so its output rows are exactly this batch
    * form's, independent of arrival order or micro-batching (asserted
    * by PipelineSpec). */
  def transitions(events: DataFrame): DataFrame =
    normalizeTs(events)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
      .withColumn("from_type", lag("event_type", 1)
        .over(Window.partitionBy("user_id").orderBy("ts_us", "event_id")))
      .filter(col("from_type").isNotNull)
      .select(col("user_id"), col("ts_us"), col("from_type"),
        col("event_type").as("to_type"))

  /** Streaming twin of [[transitions]] — see there for the contract. */
  def transitionsStream(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = normalizeTs(events)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withWatermark("ts", "2 hours")
      .as[Ev]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Ev], state: GroupState[TransState]) =>
          val st = state.getOption.getOrElse(TransState(Nil, None))
          val buf = st.buf ++ it.map(e => (e.us, e.event_id, e.event_type))
          val wmUs = state.getCurrentWatermarkMs() * 1000
          // flush the ≤-watermark prefix in (ts, event_id) order; keep
          // the rest buffered and the new stitch point in state
          val (ready, pending) = buf.partition(_._1 <= wmUs)
          val sorted = ready.sortBy(e => (e._1, e._2))
          val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
          var prev = st.lastType
          sorted.foreach { case (us, _, t) =>
            prev.foreach(p => out += Transition(user, us, p, t))
            prev = Some(t)
          }
          state.update(TransState(pending, prev))
          // wake this group on the next watermark advance so buffered
          // events flush even if the user never sends again
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          out.iterator
      }.toDF()
  }

  /** Per-(user, type) throttle state: buffered not-yet-flushed events
    * plus the timestamp of the last RAW event already processed (the
    * raw-predecessor stitch point across flushes). */
  case class ThrState(buf: Seq[(Long, Long)], lastUs: Option[Long])
  /** One event the throttle kept. */
  case class KeptEvent(user_id: Long, event_type: String,
                       event_id: Long, gap_us: Option[Long])

  /** Streaming twin of [[graft.queries.Temporal.debounce]] — the
    * raw-predecessor throttle on ingest. Same contract as
    * [[transitionsStream]]: events buffer per (user, type) in custom
    * state (`lag` has no streaming built-in), each watermark advance
    * sorts-and-flushes the ≤-watermark prefix in (ts, event_id) order,
    * and the previous raw event's timestamp carries in state so gaps
    * stitch exactly across flushes — output rows equal the batch
    * form's for data at most watermark-late, independent of arrival
    * order or micro-batching (asserted by PipelineSpec). State per key
    * = the in-flight tail within the watermark, never the history. */
  def throttleOnIngest(events: DataFrame, gapUs: Long = 600000000L,
                       watermark: String = "2 hours"): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = normalizeTs(events)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withWatermark("ts", watermark)
      .as[Ev]
    typed.groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (key: (Long, String), it: Iterator[Ev], state: GroupState[ThrState]) =>
          val st = state.getOption.getOrElse(ThrState(Nil, None))
          val buf = st.buf ++ it.map(e => (e.us, e.event_id))
          val wmUs = state.getCurrentWatermarkMs() * 1000
          val (ready, pending) = buf.partition(_._1 <= wmUs)
          val out = scala.collection.mutable.ArrayBuffer.empty[KeptEvent]
          var last = st.lastUs
          ready.sortBy(identity).foreach { case (us, id) =>
            if (last.forall(l => us - l >= gapUs))
              out += KeptEvent(key._1, key._2, id, last.map(us - _))
            last = Some(us) // raw predecessor: advances on DROPPED too
          }
          state.update(ThrState(pending, last))
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
          out.iterator
      }.toDF()
  }

  /** Event-time interval join: purchases within `[0, windowMin)`
    * minutes AFTER each error — the streaming form of
    * `queries/Temporal.rangeJoinBanded` (q55's pair stage), and the
    * place where the banding design becomes LOAD-BEARING: Structured
    * Streaming refuses stream-stream joins without an equality
    * predicate (state matching must hash somewhere), so the band
    * bucket is not merely an optimization here — it is what makes the
    * interval join expressible at all. Each purchase keys to its
    * window-sized time cell, each error probes its ≤2 overlapping
    * cells, the residual range condition filters band-local pairs, and
    * the both-side watermarks + time bounds let Spark evict join state
    * the watermark has passed — state stays O(window), not O(stream).
    *
    * One transform serves batch and stream (watermarks are no-ops in
    * batch, where this plans as a plain equi-join on the cell id). */
  def errorPurchaseJoin(events: DataFrame, windowMin: Int = 10): DataFrame = {
    val bandUs = windowMin * 60L * 1000000L
    val e = normalizeTs(events)
    val errors = e.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("ts").as("err_ts"))
      .withColumn("band", explode(array(
        floor(unix_micros(col("err_ts")) / bandUs),
        floor(unix_micros(col("err_ts")) / bandUs) + 1)))
      .withWatermark("err_ts", "2 hours")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("ts").as("p_ts"), col("value"))
      .withColumn("band", floor(unix_micros(col("p_ts")) / bandUs))
      .withWatermark("p_ts", "2 hours")
    errors.join(purchases, Seq("band"))
      .filter(expr(s"p_ts >= err_ts AND p_ts < err_ts + interval $windowMin minutes"))
      .select(col("err_id"), col("p_id"),
        unix_micros(col("err_ts")).as("err_us"),
        unix_micros(col("p_ts")).as("p_us"), col("value"))
  }

  /** Static per-user cohort dimension (user → Monday-truncated week of
    * their first event) — the batch-computed side of the stream-static
    * join. At cluster scale this is the periodically-refreshed dim
    * table every streaming enrichment pipeline maintains. */
  def userCohorts(batchEvents: DataFrame): DataFrame =
    normalizeTs(batchEvents).groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))

  /** Stream-static dimension enrichment: each (micro-batch of) events
    * broadcast-joins the static cohort dim — STATELESS in the stream
    * (no watermark, no state store; the static side is re-broadcast
    * per trigger, which is exactly Structured Streaming's contract for
    * slowly-changing dims). Adds the cohort week and the integer
    * weeks-since-cohort age. One transform serves batch and
    * readStream; PipelineSpec asserts stream ≡ batch row-for-row. */
  def enrich(events: DataFrame, cohorts: DataFrame): DataFrame =
    normalizeTs(events)
      .join(broadcast(cohorts), Seq("user_id"), "left")
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"),
        date_format(col("cohort_week"), "yyyy-MM-dd").as("cohort_week"),
        (datediff(date_trunc("week", col("ts")).cast("date"),
          col("cohort_week")) / 7).cast("long").as("weeks_since"))

  /** Batch entry: read the parquet and aggregate. */
  def batch(spark: SparkSession, dir: String): DataFrame =
    hourlyAgg(spark.read.parquet(s"$dir/events.parquet"))

  /** Streaming entry: treat the directory as a file stream (only the
    * events files; the file source requires a directory path). */
  def stream(spark: SparkSession, dir: String): DataFrame =
    hourlyAgg(spark.readStream.schema(rawSchema)
      .option("maxFilesPerTrigger", "1")
      .option("pathGlobFilter", "events*.parquet").parquet(dir))

  /** Run the stream to completion against a static dir via the memory
    * sink; returns the materialized result table. */
  def runToMemory(spark: SparkSession, dir: String, name: String = "events_hourly"): DataFrame = {
    val q = stream(spark, dir).writeStream
      .format("memory").queryName(name).outputMode("complete").start()
    q.processAllAvailable()
    q.stop()
    spark.table(name)
  }
}
