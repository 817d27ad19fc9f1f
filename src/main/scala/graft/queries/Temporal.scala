package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Temporal join operators the built-in surface lacks: as-of join and
  * banded range join. Both are composed from existing relational
  * primitives (union, window, equi-join) per the survey's extension
  * preference order — no custom plan nodes needed, and both avoid the
  * naive quadratic formulation a theta-join would hand the optimizer.
  *
  * AS-OF: the classic "latest right row at or before each left row per
  * key" (kdb `aj`, Flink temporal join, pandas merge_asof). The naive
  * plan — range theta-join + per-left-row argmax — materializes every
  * (left, right-before-it) pair: Θ(|L|·|R|) per key. The shipped design
  * is the canonical distributed one: tag the two inputs, union them,
  * and run ONE window scan ordered by (ts, side) per key — the match is
  * `last(right-payload, ignoreNulls)` over the preceding frame. Cost:
  * one shuffle on the key + one sort, linear scan, zero join
  * explosion, at any |L|, |R|.
  *
  * RANGE: `r.ts − l.ts ∈ [lo, hi)` (optionally per key). The naive form
  * is a cross join + filter — Θ(|L|·|R|) candidate rows regardless of
  * selectivity. Banding buckets time into `hi − lo`-wide cells: every
  * right row lands in exactly one cell, every left interval spans at
  * most two, so the theta-join becomes an equi-join on the cell id with
  * an exact residual filter — candidates shrink from |L|·|R| to only
  * the pairs within one band of each other, and the equi-join
  * shuffles/broadcasts like any other join.
  */
object Temporal {

  /** As-of join: for each left row, the right row with the greatest
    * `rightTs <= leftTs` in the same `keys` group (inclusive match),
    * nulls when no right row precedes. Right non-key columns come back
    * prefixed with `rightPrefix`.
    *
    * The right payload travels as ONE struct so the match is row-atomic
    * (a null inside a matched right row stays null — per-column
    * `last(ignoreNulls)` would silently mix rows). Ties on
    * (key, rightTs) resolve to the struct-max right row,
    * deterministically.
    *
    * Scale: one hash shuffle on `keys`, one per-partition sort — the
    * same cost envelope as a groupBy on the key. A pathologically hot
    * key serializes into one sort partition; that is inherent to as-of
    * semantics (the scan must see the key's full timeline in order) and
    * is the same bound kdb/Flink accept.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               rightPrefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one key column")
    val lpayCols = left.columns.filterNot(keys.contains)
    val rpayCols = right.columns.filterNot(keys.contains)
    require(lpayCols.contains(leftTs) || keys.contains(leftTs),
      s"left has no column $leftTs")
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("_ts"), lit(0).as("_side"),
        struct(rpayCols.map(c => col(c).as(rightPrefix + c)): _*).as("_rpay")): _*)
    val rpayType = r.schema("_rpay").dataType
    val l = left.select(
      keys.map(col) ++ Seq(
        col(leftTs).as("_ts"), lit(1).as("_side"),
        lit(null).cast(rpayType).as("_rpay")) ++
        Seq(struct(lpayCols.map(col): _*).as("_lpay")): _*)
    val lpayType = l.schema("_lpay").dataType
    val unioned = l.unionByName(
      r.withColumn("_lpay", lit(null).cast(lpayType)))
    // right rows sort before left rows at equal ts (inclusive match);
    // _rpay as the final key makes right-right ties deterministic.
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_rpay").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_match", last(col("_rpay"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
    matched.select(
      keys.map(col) ++
        lpayCols.map(c => col("_lpay").getField(c).as(c)) ++
        rpayCols.map(c => col("_match").getField(rightPrefix + c).as(rightPrefix + c)): _*)
  }

  /** Banded range join: pairs where
    * `rightTs − leftTs ∈ [loUs, hiUs)` microseconds (equi on `keys`
    * first when given). Right columns come back prefixed with
    * `rightPrefix`; both timestamp columns must be TimestampType.
    *
    * Each right row is bucketed once at `floor(us / band)`; each left
    * row probes the ≤ 2 buckets its window [lus+lo, lus+hi) overlaps
    * (band = hi − lo, so the window never spans three). The bucket id
    * joins as a plain equi-key — broadcastable, AQE-skew-splittable —
    * and the exact predicate filters the band-local candidates.
    */
  def rangeJoinBanded(left: DataFrame, right: DataFrame,
                      leftTs: String, rightTs: String,
                      loUs: Long, hiUs: Long,
                      keys: Seq[String] = Nil,
                      rightPrefix: String = "r_"): DataFrame = {
    require(hiUs > loUs, s"empty range [$loUs, $hiUs)")
    val band = hiUs - loUs
    // Floor-division on LONGS: `pmod` makes the numerator an exact
    // multiple of band, `div` divides it as integers — the bucket id
    // never routes through a double, so it stays exact even when the
    // microsecond magnitudes approach 2^63 (Column `/` is double
    // division and goes half-ulp-wrong past 2^53).
    def floorDivBand(sqlExpr: String): Column =
      expr(s"(($sqlExpr) - pmod($sqlExpr, ${band}L)) div ${band}L")
    val l = left
      .withColumn("_lus", unix_micros(col(leftTs)))
      .withColumn("_bucket",
        explode(sequence(
          floorDivBand(s"_lus + ${loUs}L"),
          floorDivBand(s"_lus + ${hiUs}L - 1L"))))
    val rRenamed = right.columns.filterNot(keys.contains)
      .foldLeft(right)((df, c) => df.withColumnRenamed(c, rightPrefix + c))
    val r = rRenamed
      .withColumn("_rus", unix_micros(col(rightPrefix + rightTs)))
      .withColumn("_bucket", floorDivBand("_rus"))
    l.join(r, Seq("_bucket") ++ keys)
      .filter(col("_rus") >= col("_lus") + loUs &&
        col("_rus") < col("_lus") + hiUs)
      .drop("_bucket", "_lus", "_rus")
  }

  /** Ordered funnel conversion over an event stream: for each user, the
    * first time each step is reached STRICTLY AFTER the previous
    * step's first-reach time (the standard product-analytics funnel —
    * "signup, then a view after that, then a purchase after that").
    * Emits one row per step: users reached and the median gap from the
    * previous step among them.
    *
    * Shape: per step one filtered event slice joined and re-aggregated
    * on the user key — every shuffle is user-keyed, each level's frame
    * only shrinks (monotone conversion), and the per-step stats are
    * ≤|steps| scalar aggregates. The step filters push into the scan;
    * nothing here depends on |events| beyond the user-keyed joins. */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(steps.size >= 2, s"funnel needs >= 2 steps, got ${steps.size}")
    val e = events.select(col(userCol), col(typeCol).as("_et"),
      unix_micros(col(tsCol)).as("_us"))
    var levels = List(
      e.filter(col("_et") === steps.head)
        .groupBy(userCol).agg(min("_us").as("t0")))
    for (k <- 1 until steps.size) {
      val carry = (0 until k).map(i => first(col(s"t$i")).as(s"t$i"))
      levels = levels :+ levels.last
        .join(e.filter(col("_et") === steps(k)), Seq(userCol))
        .filter(col("_us") > col(s"t${k - 1}"))
        .groupBy(userCol)
        .agg(carry.head, (carry.tail :+ min(col("_us")).as(s"t$k")): _*)
    }
    levels.zipWithIndex.map { case (lv, k) =>
      val gapP50 =
        if (k == 0) first(lit(null).cast("double"))
        else percentile(col(s"t$k") - col(s"t${k - 1}"), lit(0.5))
      lv.agg(count(lit(1)).as("n_users"), gapP50.as("_p"))
        .select(lit(k).as("step_idx"), lit(steps(k)).as("step"),
          col("n_users"), round(col("_p"), 6).as("p50_gap_us"))
    }.reduce(_ unionByName _)
  }

  /** Per-key exponentially weighted moving average over an event-time
    * series: `ewma := alpha·x + (1−alpha)·ewma`, folded left over each
    * key's (ts, tie)-ordered values from a 0.0 seed. Emits one row per
    * key with the series length and the final smoothed level — the
    * standard "current smoothed state per entity" feature.
    *
    * The recurrence is inherently sequential per key, so the design
    * collects each key's series into ONE array (`sort_array` over
    * `collect_list` — deterministic under the (ts, tie) total order,
    * unlike raw collect_list) and folds it with the codegen'd
    * `aggregate` higher-order function: one hash shuffle on the key,
    * no window sort, no driver state. Per-key state = that entity's
    * own history — the same per-key bound sessionization accepts, and
    * orders of magnitude below any global structure at 100 TB. The
    * fold uses only `+`/`*` in a fixed order (never `pow`), so the
    * result is bit-replayable in any IEEE engine — DuckDB's
    * `list_reduce` over the same ordered list reproduces it exactly.
    */
  def ewma(events: DataFrame, keys: Seq[String], tsCol: String,
           valCol: String, alpha: Double,
           tieCol: String): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha out of (0,1]: $alpha")
    val series = events
      .select(keys.map(col) ++ Seq(
        struct(unix_micros(col(tsCol)).as("_us"), col(tieCol).as("_tie"),
          col(valCol).cast("double").as("_v")).as("_s")): _*)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        sort_array(collect_list(col("_s"))).as("_ss"))
    series
      .withColumn("ewma", round(aggregate(
        transform(col("_ss"), s => s.getField("_v")),
        lit(0.0),
        (acc, x) => lit(alpha) * x + lit(1.0 - alpha) * acc), 6))
      .drop("_ss")
  }

  /** Per-key daily resample with forward fill — the time-series
    * downsampling staple (pandas `resample('D').sum().ffill()`, kdb
    * `fills`): each key's events are aggregated to calendar days, the
    * per-key [first, last] day range is densified, and gap days carry
    * the last observed daily value forward. `is_observed` marks real
    * vs filled rows.
    *
    * Shape: one (key, day) hash aggregate reduces the raw stream, a
    * per-key min/max aggregate bounds the grid, a `sequence` explode
    * densifies it (rows = that key's date span — calendar-bounded,
    * never corpus-bounded), and the fill is `last(ignoreNulls)` over a
    * key-partitioned window — the as-of scan (q54) specialized to a
    * regular grid. Every shuffle keys on the entity; nothing global.
    */
  def resampleDaily(events: DataFrame, keyCol: String, tsCol: String,
                    valCol: String): DataFrame = {
    val daily = events
      .groupBy(col(keyCol), to_date(col(tsCol)).as("_day"))
      .agg(round(sum(col(valCol)), 2).as("_dv"))
    val grid = daily.groupBy(col(keyCol))
      .agg(min(col("_day")).as("_lo"), max(col("_day")).as("_hi"))
      .select(col(keyCol),
        explode(sequence(col("_lo"), col("_hi"), expr("interval 1 day")))
          .as("_day"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("_day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(daily, Seq(keyCol, "_day"), "left")
      .withColumn("_fill", last(col("_dv"), ignoreNulls = true).over(w))
      .select(col(keyCol), date_format(col("_day"), "yyyy-MM-dd").as("day"),
        col("_fill").as("value"), col("_dv").isNotNull.as("is_observed"))
  }

  /** SCD2 interval build (slowly-changing-dimension type 2): each
    * key's attribute timeline collapsed to CHANGE runs — a validity
    * interval opens when the attribute differs from the previous
    * event's and closes at the next change (null `valid_to_us` =
    * current). Two key-partitioned window passes over the entity's own
    * history — the standard warehouse snapshot-interval construction,
    * entity-keyed at any scale. Ties on the timestamp break by
    * `tieCol`, making the run structure a pure function of the data. */
  def scd2Intervals(events: DataFrame, keyCol: String, attrCol: String,
                    tsCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col("_us").asc, col(tieCol).asc)
    val runs = events
      .select(col(keyCol), col(tieCol), col(attrCol).as("_attr"),
        unix_micros(col(tsCol)).as("_us"))
      .withColumn("_prev", lag(col("_attr"), 1).over(w))
      .filter(col("_prev").isNull || col("_prev") =!= col("_attr"))
    runs.withColumn("valid_to_us", lead(col("_us"), 1).over(w))
      .select(col(keyCol), col("_attr").as(attrCol),
        col("_us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }

  /** Top user journeys — sequential pattern mining (lite): each key's
    * event types form a timeline (ordered by ts with a tie column, the
    * [[ewma]] determinism treatment), every sliding `n`-gram of that
    * timeline is emitted as a `>`-joined path, and the global top-k
    * paths surface with a deterministic (count DESC, path ASC) cut.
    * The funnel operator (q91) checks a KNOWN sequence; this one
    * DISCOVERS the frequent sequences to feed it.
    *
    * Shape: one key-partitioned gather (sort_array over collect_list
    * — per-key state = that entity's history), a bounded per-key
    * n-gram explode (|timeline| − n + 1 rows), a gram-keyed
    * partial+final count, and a TakeOrderedAndProject top-k — only k
    * rows ever cross the final ordering. */
  def journeyNgrams(events: DataFrame, keyCol: String, typeCol: String,
                    tsCol: String, tieCol: String,
                    n: Int = 3, k: Int = 20): DataFrame = {
    require(n >= 2, s"journey n-grams need n >= 2, got $n")
    val seqs = events
      .select(col(keyCol).as("_k"),
        struct(unix_micros(col(tsCol)).as("_us"), col(tieCol).as("_tie"),
          col(typeCol).as("_t")).as("_s"))
      .groupBy("_k")
      .agg(transform(sort_array(collect_list(col("_s"))),
        s => s.getField("_t")).as("_ts"))
    seqs
      // sequence(0, negative) DESCENDS in Spark — keys with a timeline
      // shorter than n must be dropped before the index explode
      .filter(org.apache.spark.sql.functions.size(col("_ts")) >= n)
      .select(explode(expr(
        s"""transform(sequence(0, size(_ts) - $n),
           |  i -> array_join(slice(_ts, i + 1, $n), '>'))""".stripMargin))
        .as("path"))
      .groupBy("path").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("path").asc)
      .limit(k)
  }

  /** Weekly growth accounting — the "new / retained / resurrected /
    * churned" decomposition every growth team reports: per week,
    * actives split by whether the user is in their FIRST active week
    * (new), was active the immediately-preceding week (retained), or
    * returns after a gap (resurrected); churned counts last week's
    * actives who did not return (so `n_active(prev) = n_retained +
    * n_churned`, an internal identity the numbers must satisfy).
    *
    * Shape: one distinct (user, week) projection, a user-partitioned
    * lag to classify each active week, a week-keyed aggregate, and one
    * final lag over the ≤#weeks frame for churn. Entirely integer
    * arithmetic on Monday-truncated dates — engine-exact. */
  def growthAccounting(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts"): DataFrame = {
    val wk = events.select(col(userCol).as("_u"),
      date_trunc("week", col(tsCol)).cast("date").as("_w")).distinct()
    val lagged = wk.withColumn("_pw",
      lag(col("_w"), 1).over(Window.partitionBy("_u").orderBy(col("_w"))))
    val classed = lagged.select(col("_w"),
      when(col("_pw").isNull, "new")
        .when(datediff(col("_w"), col("_pw")) === 7, "retained")
        .otherwise("resurrected").as("_cls"))
    val byWeek = classed.groupBy("_w").pivot("_cls",
        Seq("new", "retained", "resurrected"))
      .agg(count(lit(1)))
      .na.fill(0, Seq("new", "retained", "resurrected"))
      .withColumn("n_active",
        col("new") + col("retained") + col("resurrected"))
    // churned(w) = actives of the previous OBSERVED week who are not
    // retained into w (an all-quiet calendar week attributes its churn
    // to the next observed week); the ≤#weeks frame makes the
    // unpartitioned lag free
    val w = Window.orderBy(col("_w"))
    byWeek
      .withColumn("n_churned",
        coalesce(lag(col("n_active"), 1).over(w), lit(0L)) - col("retained"))
      .select(date_format(col("_w"), "yyyy-MM-dd").as("week"),
        col("n_active"), col("new").as("n_new"),
        col("retained").as("n_retained"),
        col("resurrected").as("n_resurrected"), col("n_churned"))
  }

  /** Weekly retention cohorts — the product-analytics staple: users are
    * cohorted by the ISO week of their FIRST event, and each later
    * week's activity is reported as (cohort_week, week_offset,
    * n_active, cohort_size, retention). week_offset 0 is the cohort
    * week itself (retention 1.0 by construction — a useful built-in
    * sanity row).
    *
    * Shape: one (user, week) distinct projection of the raw stream,
    * one user-keyed min for the cohort, then (cohort_week, offset)
    * aggregates — the raw events are touched once and every shuffle
    * keys on user or on the ≤ #weeks² output grid. Week arithmetic is
    * integer days / 7 on Monday-truncated dates (exact in any
    * engine). */
  def retentionCohorts(events: DataFrame, userCol: String = "user_id",
                       tsCol: String = "ts"): DataFrame = {
    val wk = events.select(col(userCol).as("_u"),
        date_trunc("week", col(tsCol)).cast("date").as("_week")).distinct()
    val cohort = wk.groupBy("_u").agg(min(col("_week")).as("_cw"))
    val sizes = cohort.groupBy("_cw").agg(count(lit(1)).as("cohort_size"))
    wk.join(cohort, "_u")
      .groupBy(col("_cw"),
        (datediff(col("_week"), col("_cw")) / 7).cast("long").as("week_offset"))
      .agg(count(lit(1)).as("n_active")) // (user, week) rows are distinct
      .join(sizes, "_cw")
      .select(date_format(col("_cw"), "yyyy-MM-dd").as("cohort_week"),
        col("week_offset"), col("n_active"), col("cohort_size"),
        round(col("n_active") / col("cohort_size"), 6).as("retention"))
  }

  /** Daily-volume spike detection per event type: a trailing-window
    * z-score of each day's event count against the previous seven days
    * (ROWS 7 PRECEDING .. 1 PRECEDING — the current day never smooths
    * its own spike), flagged at |z| > 3. The ops-monitoring classic;
    * one (type, day) aggregate + one ordered window per type. Days
    * with fewer than 2 trailing observations have no defined z and are
    * never flagged. */
  def volumeAnomaly(events: DataFrame, typeCol: String = "event_type",
                    tsCol: String = "ts", zThresh: Double = 3.0): DataFrame = {
    val daily = events
      .select(col(typeCol).as("event_type"),
        date_trunc("day", col(tsCol)).cast("date").as("day"))
      .groupBy("event_type", "day").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(-7, -1)
    daily
      .withColumn("_mu", avg(col("cnt")).over(w))
      .withColumn("_sd", stddev_samp(col("cnt")).over(w))
      .select(col("event_type"), date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("cnt"),
        // denominator floored at 1 count so a spike over a CONSTANT
        // baseline (sd = 0, the classic on-call case) still flags —
        // and the explicit floor also keeps both engines off the
        // divide-by-zero branch (NULL in Spark, ±inf in DuckDB). z is
        // null only when the trailing window has < 2 observations.
        when(col("_sd").isNotNull, round((col("cnt") - col("_mu")) /
          greatest(col("_sd"), lit(1.0)), 6)).as("z"),
        coalesce(when(col("_sd").isNotNull,
          abs((col("cnt") - col("_mu")) /
            greatest(col("_sd"), lit(1.0))) > zThresh),
          lit(false)).as("is_anomaly"))
  }

  /** Time-weighted average (TWAP) per key: each observation's value
    * holds until the NEXT observation, so the average weights each
    * value by its holding interval — Σ vᵢ·Δtᵢ / Σ Δtᵢ over the lead
    * gaps. The last observation has no interval and contributes
    * nothing; keys with a single event have no defined TWAP (null).
    * The standard market/metrics aggregate that a plain AVG silently
    * gets wrong on irregular sampling. One window sort per key
    * partition + one key aggregate; interval arithmetic is integer
    * microseconds, the single division rounds at 6. */
  def twap(events: DataFrame, keyCol: String = "user_id",
           tsCol: String = "ts", valCol: String = "value",
           tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(keyCol)
      .orderBy(col("_us").asc, col(tieCol).asc)
    events
      .select(col(keyCol), col(tieCol), col(valCol).cast("double").as("_v"),
        unix_micros(col(tsCol)).as("_us"))
      .withColumn("_dt", lead(col("_us"), 1).over(w) - col("_us"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        sum(col("_dt")).as("span_us"),
        round(sum(col("_v") * col("_dt")) / sum(col("_dt")), 6).as("twap"),
        round(avg(col("_v")), 6).as("plain_avg"))
  }

  /** Event debounce (throttle): per (key, type), drop events arriving
    * within `gapUs` microseconds of the PREVIOUS RAW event of the same
    * (key, type) — the duplicate-click / retry-storm suppressor. This
    * is the lag-based contract (each event compares to its raw
    * predecessor, not to the last KEPT one — the chained variant is
    * inherently sequential and needs the EWMA-style per-key fold);
    * stated because the two differ on bursts longer than one gap. One
    * window sort per (key, type) partition; ties break on `tieCol`.
    * Emits the kept events with the gap that admitted them. */
  def debounce(events: DataFrame, gapUs: Long,
               keyCols: Seq[String] = Seq("user_id", "event_type"),
               tsCol: String = "ts",
               tieCol: String = "event_id"): DataFrame = {
    require(gapUs > 0, s"debounce gap must be > 0 us, got $gapUs")
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_us").asc, col(tieCol).asc)
    events.withColumn("_us", unix_micros(col(tsCol)))
      .withColumn("_prev", lag(col("_us"), 1).over(w))
      .filter(col("_prev").isNull || col("_us") - col("_prev") >= gapUs)
      .select((keyCols.map(col) :+ col(tieCol) :+
        (col("_us") - col("_prev")).as("gap_us")): _*)
  }

  /** Rolling 7-day distinct actives per day — the DAU/WAU staple:
    * for every calendar day in the observed range, the number of
    * DISTINCT keys active in the trailing 7-day window [day−6, day].
    * Distinct-over-range resists plain window frames (COUNT(DISTINCT)
    * isn't frame-able), so each (day, key) activity row is exploded to
    * the ≤7 report days it contributes to and counted distinct per
    * report day — 7× the DAILY-distinct row count (calendar-bounded),
    * two key-partitioned shuffles, no self-join. Report days outside
    * the observed [min, max] are clipped (no partial phantom days). */
  def rollingActives(events: DataFrame, windowDays: Int = 7,
                     keyCol: String = "user_id",
                     tsCol: String = "ts"): DataFrame = {
    require(windowDays >= 1, s"window must be >= 1 day, got $windowDays")
    val du = events.select(col(keyCol).as("_k"),
      date_trunc("day", col(tsCol)).cast("date").as("_day")).distinct()
    val bounds = du.agg(min(col("_day")).as("_lo"), max(col("_day")).as("_hi"))
    du.crossJoin(broadcast(bounds))
      .select(col("_k"), explode(sequence(col("_day"),
        least(date_add(col("_day"), windowDays - 1), col("_hi")),
        expr("interval 1 day"))).as("_rd"))
      .distinct()
      .groupBy(date_format(col("_rd"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Autocorrelation function of the daily-aggregated series at lags
    * `1..maxLag`: the series is the per-day sum of `valCol`, and each
    * lag's coefficient is the Pearson correlation between the series
    * and its k-day shift over the pairs where both exist (the lagged-
    * scatter correlogram — the seasonality/trend screen a metrics
    * pipeline runs before fitting anything).
    *
    * Shape: one (day) hash aggregate reduces the raw stream to ≤#days
    * rows, ONE unpartitioned window sort computes all `maxLag` shifts
    * in a single pass (bounded by the calendar, never by the corpus —
    * the q125 contract), a `stack` unpivot turns the shifts into
    * (lag, x, y) pairs, and a lag-keyed `corr` aggregate emits one row
    * per lag. The raw events are touched exactly once. */
  def acf(events: DataFrame, tsCol: String = "ts", valCol: String = "value",
          maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, s"acf needs maxLag >= 1, got $maxLag")
    val daily = events
      .groupBy(date_trunc("day", col(tsCol)).cast("date").as("_day"))
      .agg(round(sum(col(valCol)), 6).as("_v"))
    val w = Window.orderBy(col("_day"))
    val lagged = (1 to maxLag).foldLeft(daily)((df, k) =>
      df.withColumn(s"_l$k", lag(col("_v"), k).over(w)))
    val pairs = (1 to maxLag).map(k => s"$k, _l$k").mkString(", ")
    lagged
      .select(col("_v"),
        expr(s"stack($maxLag, $pairs) AS (lag, _lk)"))
      .filter(col("_lk").isNotNull)
      .groupBy("lag")
      .agg(count(lit(1)).as("n_pairs"),
        round(corr(col("_v"), col("_lk")), 6).as("acf"))
  }

  /** Maximum drawdown per key: treat the ordered `valCol` stream as
    * increments of an equity curve (running sum), track the running
    * peak, and report the deepest peak-to-trough drop — the classic
    * risk statistic, and in pipeline terms the worst cumulative dip of
    * any monitored per-key metric. Three stacked window frames over
    * the same (key × time) ordering — ONE sort per key partition, no
    * extra shuffle between them (ties broken by `tieCol` so the curve
    * is deterministic). */
  def maxDrawdown(events: DataFrame, keyCol: String = "user_id",
                  tsCol: String = "ts", valCol: String = "value",
                  tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    events
      .withColumn("_cum", sum(col(valCol)).over(w))
      .withColumn("_peak", max(col("_cum")).over(w))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        round(max(col("_peak") - col("_cum")), 6).as("max_drawdown"))
  }
}
