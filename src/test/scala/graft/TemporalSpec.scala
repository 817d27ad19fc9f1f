package graft

import org.apache.spark.sql.functions._
import graft.queries.Temporal

class TemporalSpec extends SparkSpec {

  private def mkTs(us: Long) = new java.sql.Timestamp(us / 1000)

  test("asofJoin matches the latest right row at or before each left row") {
    import spark.implicits._
    // key 1: rights at t=10, 20, 30; key 2: right at t=100 only
    val left = Seq(
      (1L, 5L, "l-before-any"), (1L, 10L, "l-at-10"), (1L, 25L, "l-mid"),
      (1L, 99L, "l-after-all"), (2L, 50L, "l-no-right-yet"),
      (2L, 100L, "l-at-100"), (3L, 7L, "l-keyless"))
      .toDF("k", "us", "tag")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("tag"))
    val right = Seq(
      (1L, 10L, "r10"), (1L, 20L, "r20"), (1L, 30L, "r30"), (2L, 100L, "r100"))
      .toDF("k", "us", "rtag")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("rtag"))
    val out = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts")
      .select(col("tag"), col("asof_rtag")).as[(String, String)]
      .collect().toMap
    assert(out("l-before-any") == null)   // strictly before the first right
    assert(out("l-at-10") == "r10")       // inclusive at equal ts
    assert(out("l-mid") == "r20")
    assert(out("l-after-all") == "r30")
    assert(out("l-no-right-yet") == null)
    assert(out("l-at-100") == "r100")
    assert(out("l-keyless") == null)      // key absent from right entirely
  }

  test("asofJoin match is row-atomic: matched right nulls stay null") {
    import spark.implicits._
    val left = Seq((1L, 50L)).toDF("k", "us")
      .select(col("k"), timestamp_micros(col("us")).as("ts"))
    // latest right row (t=40) carries a NULL payload field; the earlier
    // row (t=10) has it set — per-column last(ignoreNulls) would leak
    // "old" into the match; the struct design must not.
    val right = Seq((1L, 10L, Option("old")), (1L, 40L, Option.empty[String]))
      .toDF("k", "us", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("v"))
    val row = Temporal.asofJoin(left, right, Seq("k"), "ts", "ts")
      .select(unix_micros(col("asof_ts")), col("asof_v")).collect().head
    assert(row.getLong(0) == 40L)
    assert(row.isNullAt(1))
  }

  test("asofJoin equals the quadratic argmax formulation on events") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select("user_id", "event_id", "ts")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("sid"))
    val fast = Temporal.asofJoin(purchases, signups, Seq("user_id"), "ts", "ts")
      .select(col("event_id"), col("asof_sid").as("sid"))
    // oracle: theta-join + per-purchase max-ts pick (fine at sf0.001)
    val naive = purchases.as("p")
      .join(signups.as("s"),
        col("p.user_id") === col("s.user_id") && col("s.ts") <= col("p.ts"),
        "left")
      .groupBy(col("p.event_id").as("event_id"))
      .agg(max_by(col("s.sid"), col("s.ts")).as("sid"))
    assert(fast.count() == purchases.count())
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("rangeJoinBanded equals the theta-join, including band boundaries") {
    import spark.implicits._
    val band = 100L
    // rights placed on/around bucket edges of band=100: 0, 99, 100, 199,
    // 200 exercise the ≤2-bucket probe and the half-open [lo, hi) ends
    val left = Seq((1L, 0L), (2L, 50L), (3L, 100L), (4L, 101L))
      .toDF("lid", "us").select(col("lid"), timestamp_micros(col("us")).as("ts"))
    val right = Seq((10L, 0L), (11L, 99L), (12L, 100L), (13L, 199L), (14L, 200L))
      .toDF("rid", "us").select(col("rid"), timestamp_micros(col("us")).as("ts"))
    val fast = Temporal.rangeJoinBanded(left, right, "ts", "ts", 0L, band)
      .select(col("lid"), col("r_rid").as("rid"))
    val naive = left.join(right.withColumnRenamed("ts", "rts"),
        unix_micros(col("rts")) >= unix_micros(col("ts")) &&
        unix_micros(col("rts")) < unix_micros(col("ts")) + band)
      .select(col("lid"), col("rid"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
    // spot-check the half-open semantics
    val m = fast.as[(Long, Long)].collect().groupBy(_._1)
      .map { case (k, v) => (k, v.map(_._2).toSet) }
    assert(m(1L) == Set(10L, 11L))          // [0,100) excludes rid=12 at 100
    assert(m(3L) == Set(12L, 13L))          // [100,200) excludes 200
  }

  test("funnel: strict-order first-reach semantics on a hand fixture") {
    import spark.implicits._
    val d = Seq(
      // user 1 full conversion: signup@10, view@30 (the @5 view is
      // BEFORE signup and must not count), purchase@100
      (1L, 5L, "b"), (1L, 10L, "a"), (1L, 30L, "b"), (1L, 100L, "c"),
      // user 2 stalls at view (purchase precedes the view, doesn't count)
      (2L, 10L, "a"), (2L, 20L, "c"), (2L, 40L, "b"),
      // user 3 signs up only
      (3L, 10L, "a"),
      // user 4 never signs up
      (4L, 10L, "b"), (4L, 20L, "c"))
      .toDF("user_id", "us", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"))
    val f = Temporal.funnel(d, Seq("a", "b", "c")).collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toMap
    assert(f(0) == (("a", 3L, null)))          // users 1, 2, 3
    assert(f(1) == (("b", 2L, 25.0)))          // gaps 20 (u1), 30 (u2) → p50 25
    assert(f(2) == (("c", 1L, 70.0)))          // u1 only: 100-30
  }

  test("rangeJoinBanded with keys equals the keyed theta-join on events") {
    val ev = Tables.events(spark, sf)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("ts"))
    val fast = Temporal.rangeJoinBanded(errors, purchases, "ts", "ts",
        0L, 3600000000L, keys = Seq("user_id"))
      .select(col("event_id"), col("r_pid").as("pid"))
    val naive = errors.as("e").join(purchases.as("p"),
        col("e.user_id") === col("p.user_id") &&
        unix_micros(col("p.ts")) >= unix_micros(col("e.ts")) &&
        unix_micros(col("p.ts")) < unix_micros(col("e.ts")) + 3600000000L)
      .select(col("event_id"), col("pid"))
    assert(fast.exceptAll(naive).isEmpty && naive.exceptAll(fast).isEmpty)
  }

  test("retentionCohorts: hand-computed two-cohort fixture") {
    import spark.implicits._
    // Mondays: 2024-01-01 (w0) and 2024-01-08 (w1), 2024-01-15 (w2).
    // u1: w0, w1, w2; u2: w0 only; u3: joins in w1, active w2.
    // Cohort w0 = {u1, u2}; cohort w1 = {u3}.
    def ts(day: String) = s"$day 12:00:00"
    val ev = Seq(
      (1L, ts("2024-01-03")), (1L, ts("2024-01-09")), (1L, ts("2024-01-17")),
      (1L, ts("2024-01-18")), // second event same week — must not double count
      (2L, ts("2024-01-05")),
      (3L, ts("2024-01-08")), (3L, ts("2024-01-21")))
      .toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val r = Temporal.retentionCohorts(ev).collect()
      .map(x => (x.getString(0), x.getLong(1)) ->
        (x.getLong(2), x.getLong(3), x.getDouble(4))).toMap
    assert(r(("2024-01-01", 0L)) == ((2L, 2L, 1.0)))
    assert(r(("2024-01-01", 1L)) == ((1L, 2L, 0.5)))
    assert(r(("2024-01-01", 2L)) == ((1L, 2L, 0.5)))
    assert(r(("2024-01-08", 0L)) == ((1L, 1L, 1.0)))
    assert(r(("2024-01-08", 1L)) == ((1L, 1L, 1.0)))
    assert(r.size == 5)
  }

  test("ewma: hand-computed fold, tie order, and per-key independence") {
    import spark.implicits._
    // key 1 values in time order: 10, 20, 40 (alpha=0.5):
    //   0 -> 5.0 -> 12.5 -> 26.25; two rows tie at us=30, event_id breaks it
    val ev = Seq(
      (1L, 10L, 100L, 10.0), (1L, 20L, 101L, 20.0), (1L, 30L, 103L, 40.0),
      (1L, 30L, 102L, 0.0), // same ts, smaller id -> folds BEFORE the 40
      (2L, 5L, 200L, 8.0))
      .toDF("k", "us", "eid", "v")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("eid"), col("v"))
    val out = Temporal.ewma(ev, Seq("k"), "ts", "v", alpha = 0.5, tieCol = "eid")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // key 1: fold over (10, 20, 0, 40): 5.0, 12.5, 6.25, 23.125
    assert(out(1L) == ((4L, 23.125)))
    assert(out(2L) == ((1L, 4.0)))
  }

  test("resampleDaily: gap days forward-fill the last observed daily total") {
    import spark.implicits._
    val us = 86400000000L // one day in micros
    val ev = Seq(
      (1L, 0L, 10.0), (1L, 1000L, 5.0),       // day 0: two events, sum 15
      (1L, 3 * us, 7.5),                       // day 3 (days 1-2 are gaps)
      (2L, 2 * us, 1.0))                       // key 2: single day, no grid
      .toDF("k", "usec", "v")
      .select(col("k"), timestamp_micros(col("usec")).as("ts"), col("v"))
    val out = Temporal.resampleDaily(ev, "k", "ts", "v").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getDouble(2), r.getBoolean(3)))
      .toMap
    assert(out((1L, "1970-01-01")) == ((15.0, true)))
    assert(out((1L, "1970-01-02")) == ((15.0, false)))
    assert(out((1L, "1970-01-03")) == ((15.0, false)))
    assert(out((1L, "1970-01-04")) == ((7.5, true)))
    assert(out((2L, "1970-01-03")) == ((1.0, true)))
    assert(out.size == 5)
  }

  test("journeyNgrams: sliding trigrams, short keys dropped, deterministic cut") {
    import spark.implicits._
    val ev = Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 11L, "b"), (1L, 3L, 12L, "a"),
      (1L, 4L, 13L, "b"),
      (2L, 1L, 20L, "a"), (2L, 2L, 21L, "b"), // timeline shorter than n
      (3L, 5L, 31L, "b"), (3L, 5L, 30L, "a"), (3L, 6L, 32L, "c")) // ts tie -> id order
      .toDF("k", "us", "eid", "t")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("eid"), col("t"))
    val got = Temporal.journeyNgrams(ev, "k", "t", "ts", "eid", n = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSet == Set(("a>b>a", 1L), ("b>a>b", 1L), ("a>b>c", 1L)))
    assert(got.map(_._1).toSeq == Seq("a>b>a", "a>b>c", "b>a>b")) // path asc on tie
  }

  test("scd2Intervals: change runs, interval chaining, current flag") {
    import spark.implicits._
    val ev = Seq(
      (1L, 10L, 100L, "free"), (1L, 20L, 101L, "free"), // same run
      (1L, 30L, 102L, "pro"), (1L, 40L, 103L, "free"),  // back-and-forth
      (2L, 5L, 200L, "pro"))
      .toDF("k", "us", "eid", "plan")
      .select(col("k"), timestamp_micros(col("us")).as("ts"), col("eid"), col("plan"))
    val got = Temporal.scd2Intervals(ev, "k", "plan", "ts", "eid").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3), r.getBoolean(4))).toSet
    assert(got == Set(
      (1L, "free", 10L, 30L, false),
      (1L, "pro", 30L, 40L, false),
      (1L, "free", 40L, -1L, true),
      (2L, "pro", 5L, -1L, true)))
  }

  test("growthAccounting: new/retained/resurrected/churned identities") {
    import spark.implicits._
    // Mondays: 2024-01-01, -08, -15. u1 all three weeks (retained
    // chain), u2 skips the middle (resurrected), u3 week one only.
    def ts(d: String) = s"$d 12:00:00"
    val ev = Seq(
      (1L, ts("2024-01-01")), (1L, ts("2024-01-08")), (1L, ts("2024-01-15")),
      (2L, ts("2024-01-02")), (2L, ts("2024-01-16")),
      (3L, ts("2024-01-03")))
      .toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val got = Temporal.growthAccounting(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got("2024-01-01") == ((3L, 3L, 0L, 0L, 0L)))
    assert(got("2024-01-08") == ((1L, 0L, 1L, 0L, 2L)))
    assert(got("2024-01-15") == ((2L, 0L, 1L, 1L, 0L)))
    // identity: prev n_active = n_retained + n_churned on every row
  }

  test("volumeAnomaly: planted spike flagged, current day excluded from its window") {
    import spark.implicits._
    // type t: 8 steady days of 10 events, then a day of 100 — z huge.
    // The spike day must not smooth itself (ROWS ..1 PRECEDING).
    val ev = (for {
      d <- 1 to 9
      i <- 1 to (if (d == 9) 100 else 10)
    } yield (s"2024-01-0$d 00:${i % 60}:00", "t")) ++
      // a second type with CONSTANT volume: sd = 0 -> z null, never flagged
      (for (d <- 1 to 9; i <- 1 to 5)
        yield (s"2024-01-0$d 01:0$i:00", "u"))
    val df = ev.toDF("s", "event_type")
      .select(col("s").cast("timestamp").as("ts"), col("event_type"))
    val got = Temporal.volumeAnomaly(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), Option(r.get(3)), r.getBoolean(4))).toMap
    val spike = got(("t", "2024-01-09"))
    // constant baseline: sd = 0 -> denominator floors at 1 -> z = 90
    assert(spike._1 == 100L && spike._2.contains(90.0) && spike._3,
      s"spike must flag: $spike")
    // steady days never flag; first day has no window -> z null, and
    // day 2 has a single trailing observation -> sd null -> z null
    assert(!got(("t", "2024-01-05"))._3)
    assert(got(("t", "2024-01-01"))._2.isEmpty)
    assert(got(("t", "2024-01-02"))._2.isEmpty)
    // zero-spread type: z = 0 under the floored denominator, never flagged
    (3 to 9).foreach { d =>
      val r = got(("u", s"2024-01-0$d"))
      assert(r._2.contains(0.0) && !r._3)
    }
  }

  test("twap: holding-interval weights; single-event key undefined") {
    import spark.implicits._
    // user 1: v=10 held 1s, v=20 held 3s, v=99 terminal (no interval)
    // → twap = (10·1 + 20·3)/4 = 17.5, plain avg = 43.0
    val ev = Seq(
      (1L, 1L, 0L, 10.0), (1L, 2L, 1000000L, 20.0),
      (1L, 3L, 4000000L, 99.0),
      (2L, 4L, 0L, 7.0))
      .toDF("user_id", "event_id", "us", "value")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"), col("value"))
    val got = Temporal.twap(ev).collect()
      .map(r => r.getLong(0) -> r).toMap
    val u1 = got(1L)
    assert(u1.getLong(1) == 3L && u1.getLong(2) == 4000000L)
    assert(u1.getDouble(3) == 17.5)
    assert(u1.getDouble(4) == 43.0)
    val u2 = got(2L)
    assert(u2.getLong(1) == 1L && u2.isNullAt(2) && u2.isNullAt(3))
  }

  test("debounce: raw-predecessor gaps; first event always kept") {
    import spark.implicits._
    // user 1 events at t = 0, 5, 16, 17s with gap 10s: raw-predecessor
    // gaps are (—, 5, 11, 1) → keep 0 (first) and 16; 5 and 17 drop
    val ev = Seq(
      (1L, "c", 10L, 0L), (1L, "c", 11L, 5000000L),
      (1L, "c", 12L, 16000000L), (1L, "c", 13L, 17000000L),
      (2L, "c", 20L, 0L))
      .toDF("user_id", "event_type", "event_id", "us")
      .select(col("user_id"), col("event_type"), col("event_id"),
        timestamp_micros(col("us")).as("ts"))
    val got = Temporal.debounce(ev, gapUs = 10000000L).collect()
      .map(r => r.getLong(2)).toSet
    assert(got == Set(10L, 12L, 20L))
  }

  test("rollingActives: trailing window counts distinct, clipped range") {
    import spark.implicits._
    // user A on day 1, user B on day 3, A again on day 9 (range 1..9)
    def d(day: Int) = f"2024-01-$day%02d 12:00:00"
    val ev = Seq((1L, "A", d(1)), (2L, "B", d(3)), (3L, "A", d(9)))
      .toDF("event_id", "u", "s")
      .select(col("event_id"), col("u").as("user_id"),
        col("s").cast("timestamp").as("ts"))
    val got = Temporal.rollingActives(ev, windowDays = 7).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // days 1-2: {A}; 3-7: {A,B}; 8-9: {B}+... day 8: B (3+6=9 >= 8),
    // day 9: B(window 3..9) + A(day 9) = 2
    assert(got("2024-01-01") == 1 && got("2024-01-02") == 1)
    (3 to 7).foreach(i => assert(got(f"2024-01-$i%02d") == 2, s"day $i"))
    assert(got("2024-01-08") == 1 && got("2024-01-09") == 2)
    // nothing reported past the observed max day
    assert(!got.contains("2024-01-10"))
  }

  test("acf: alternating daily series has acf(1) = -1, acf(2) = +1") {
    import spark.implicits._
    // 10 days alternating 1, 5: lag-1 pairs are (5,1)/(1,5) → corr -1;
    // lag-2 pairs are (1,1)/(5,5) → corr +1; n_pairs = 10 - lag
    val ev = (0 until 10).map { i =>
      (i.toLong, f"2024-01-${i + 1}%02d 12:00:00",
        if (i % 2 == 0) 1.0 else 5.0)
    }.toDF("event_id", "s", "value")
      .select(col("event_id"), col("s").cast("timestamp").as("ts"),
        col("value"))
    val got = Temporal.acf(ev, maxLag = 3).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1) == ((9L, -1.0)))
    assert(got(2) == ((8L, 1.0)))
    assert(got(3) == ((7L, -1.0)))
  }

  test("maxDrawdown: hand-computed peak-to-trough; monotone curve has 0") {
    import spark.implicits._
    def ts(s: String) = s
    // user 1 increments: +5 +3 -4 -2 +1 → curve 5 8 4 2 3; peak 8 → dd 6
    // user 2 monotone:   +1 +1 +1       → drawdown 0
    val ev = Seq(
      (1L, 1L, "2024-01-01 00:00:00", 5.0),
      (1L, 2L, "2024-01-01 00:01:00", 3.0),
      (1L, 3L, "2024-01-01 00:02:00", -4.0),
      (1L, 4L, "2024-01-01 00:03:00", -2.0),
      (1L, 5L, "2024-01-01 00:04:00", 1.0),
      (2L, 6L, "2024-01-01 00:00:00", 1.0),
      (2L, 7L, "2024-01-01 00:01:00", 1.0),
      (2L, 8L, "2024-01-01 00:02:00", 1.0))
      .toDF("user_id", "event_id", "s", "value")
      .select(col("user_id"), col("event_id"),
        col("s").cast("timestamp").as("ts"), col("value"))
    val got = Temporal.maxDrawdown(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got(1L) == ((5L, 6.0)))
    assert(got(2L) == ((3L, 0.0)))
  }
}
