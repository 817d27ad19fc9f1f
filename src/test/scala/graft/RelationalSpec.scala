package graft

import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("every query has a runnable plan and every oracle key has a query") {
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(SparkEntry.queries.contains(k), s"oracle $k has no query")
    }
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, s"$name has no columns")
    }
  }

  test("tableProfile approx mode: schema parity and <=5% sketch drift") {
    import graft.queries.Relational
    val o = Tables.orders(spark, sf)
    val exact = Relational.tableProfile(o, approx = false).cache()
    val approx = Relational.tableProfile(o, approx = true).cache()
    assert(exact.schema == approx.schema, "swap modes must agree on schema")
    // the approx plan must NOT Expand the input (that's the point)
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"))
    assert(exact.queryExecution.executedPlan.toString.contains("Expand"))
    val joined = exact.select(col("col_name"), col("n_distinct").as("nde"),
        col("n_rows").as("nr"), col("n_null").as("nn"))
      .join(approx.select(col("col_name"), col("n_distinct").as("nda"),
        col("n_rows").as("nra"), col("n_null").as("nna")), "col_name")
      .collect()
    assert(joined.length == o.columns.length)
    joined.foreach { r =>
      // rows/nulls are exact in both modes; distinct drifts <= 5% (q84)
      assert(r.getAs[Long]("nr") == r.getAs[Long]("nra"))
      assert(r.getAs[Long]("nn") == r.getAs[Long]("nna"))
      val e = r.getAs[Long]("nde").toDouble
      val a = r.getAs[Long]("nda").toDouble
      assert(math.abs(a - e) <= 0.05 * math.max(e, 1.0),
        s"${r.getString(0)}: approx $a vs exact $e drifts > 5%")
    }
    // the config flag routes the driver query itself
    spark.conf.set("spark.graft.profile.approx", "true")
    try {
      val viaFlag = SparkEntry.queries("q115_table_profile")(spark, sf)
      assert(!viaFlag.queryExecution.executedPlan.toString.contains("Expand"))
    } finally spark.conf.unset("spark.graft.profile.approx")
    exact.unpersist(); approx.unpersist()
  }

  test("revenueDeciles range mode: schema parity, conserved totals, ordered ranges") {
    import graft.queries.Relational
    val rev = Tables.orders(spark, sf).groupBy("o_custkey")
      .agg(round(sum(col("o_totalprice")), 2).as("rev")).cache()
    val n = rev.count()
    val exact = Relational.revenueDeciles(rev, rangeMode = false)
    val ranged = Relational.revenueDeciles(rev, rangeMode = true).cache()
    assert(exact.schema == ranged.schema)
    // no global sort in the range plan (ntile's single-partition window)
    val planStr = ranged.queryExecution.executedPlan.toString
    assert(!planStr.contains("Window"), s"range mode must not plan a window")
    val rows = ranged.collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    // every customer lands in exactly one decile
    assert(rows.map(_.getAs[Long]("n_customers")).sum == n)
    // populations near-uniform (sketch error 0.001 on distinct-ish revs)
    rows.foreach { r =>
      val sz = r.getAs[Long]("n_customers").toDouble
      assert(math.abs(sz - n / 10.0) <= math.max(0.1 * n / 10.0, 2.0),
        s"decile ${r.getInt(0)} size $sz far from ${n / 10.0}")
    }
    // ranges ordered and non-overlapping: decile d's min >= d+1's max
    rows.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi.getAs[Double]("min_rev") >= lo.getAs[Double]("max_rev"),
        s"deciles ${hi.getInt(0)}/${lo.getInt(0)} ranges overlap")
    }
    // flag routes the driver query
    spark.conf.set("spark.graft.deciles.range", "true")
    try {
      val viaFlag = SparkEntry.queries("q105_ntile_deciles")(spark, sf)
      assert(!viaFlag.queryExecution.executedPlan.toString.contains("Window"))
    } finally spark.conf.unset("spark.graft.deciles.range")
    rev.unpersist(); ranged.unpersist()
  }

  test("q02 aggregates partition correctly") {
    val df = SparkEntry.queries("q02_agg_pricing")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp")).count()
    assert(total == expected)
  }

  test("q04 per-group top-k emits at most 3 per customer") {
    val df = SparkEntry.queries("q04_window_topk")(spark, sf)
    val over = df.groupBy("o_custkey").count().filter(col("count") > 3).count()
    assert(over == 0)
  }

  test("q06 undirect yields src<dst with no duplicates") {
    val df = SparkEntry.queries("q06_union_distinct")(spark, sf).cache()
    assert(df.filter(col("src") >= col("dst")).count() == 0)
    assert(df.count() == df.distinct().count())
    df.unpersist()
  }

  test("q09 degree sum equals 2x edge count") {
    val edges = SparkEntry.queries("q06_union_distinct")(spark, sf).count()
    val degSum = SparkEntry.queries("q09_degrees")(spark, sf)
      .agg(sum("degree")).collect()(0).getLong(0)
    assert(degSum == 2 * edges)
  }

  test("q13 spearman rho is in [-1, 1]") {
    val rho = SparkEntry.queries("q13_spearman")(spark, sf)
      .collect()(0).getAs[Double]("spearman_rho")
    assert(rho >= -1.0 && rho <= 1.0)
  }

  test("q83 rollup: per-level totals all equal the grand total") {
    val df = SparkEntry.queries("q83_rollup_revenue")(spark, sf).cache()
    // gid 0 = leaf cells, 1 = per-priority subtotal, 3 = grand total
    val byGid = df.groupBy("gid").agg(sum("n_orders").as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(byGid.keySet == Set(0, 1, 3))
    val total = Tables.orders(spark, sf).count()
    assert(byGid.values.toSet == Set(total))
    assert(df.filter(col("gid") === 3).count() == 1)
    df.unpersist()
  }

  test("q150 benford: digit partition is exact and frequencies close") {
    val rows = SparkEntry.queries("q150_benford")(spark, sf).collect()
    val digits = rows.map(_.getAs[Int]("digit"))
    assert(digits.toSet.subsetOf((1 to 9).toSet) && digits.distinct.length == digits.length)
    val nTotal = Tables.orders(spark, sf)
      .filter(col("o_totalprice") >= 1.0).count()
    assert(rows.map(_.getAs[Long]("n")).sum == nTotal)
    assert(math.abs(rows.map(_.getAs[Double]("obs_freq")).sum - 1.0) < 1e-4)
    // the digit-1 expectation is the Benford constant log10(2)
    val d1 = rows.find(_.getAs[Int]("digit") == 1).get
    assert(d1.getAs[Double]("benford_freq") == 0.30103)
    assert(rows.forall(_.getAs[Double]("chi2_term") >= 0.0))
  }

  test("q169 grouped OLS: counts partition events; r2 in [0,1]") {
    val rows = SparkEntry.queries("q169_grouped_ols")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("n")).sum ==
      Tables.events(spark, sf).count())
    rows.foreach { r =>
      val r2 = r.getAs[Double]("r2")
      assert(r2 >= -1e-9 && r2 <= 1 + 1e-9, s"r2 out of range: $r")
    }
  }

  test("q168 skyline window formulation equals brute-force dominance") {
    val pts = Tables.part(spark, sf)
      .select("p_partkey", "p_retailprice", "p_size").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        r.getAs[Number]("p_size").longValue))
    def dominates(q: (Long, Double, Long), p: (Long, Double, Long)) =
      q._2 <= p._2 && q._3 >= p._3 && (q._2 < p._2 || q._3 > p._3)
    val want = pts.filter(p => !pts.exists(q => dominates(q, p)))
      .map(_._1).toSet
    val got = SparkEntry.queries("q168_skyline")(spark, sf).collect()
      .map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty)
  }

  test("q162 ab z-test: halves partition each type; flags track |z|") {
    val rows = SparkEntry.queries("q162_ab_ztest")(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables.events(spark, sf).count()
    assert(rows.map(r => r.getAs[Long]("n1") + r.getAs[Long]("n2")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Long]("x1") <= r.getAs[Long]("n1"))
      assert(r.getAs[Long]("x2") <= r.getAs[Long]("n2"))
      val z = Option(r.getAs[java.lang.Double]("z"))
      val sig = r.getAs[Boolean]("is_significant")
      assert(z.forall(v => !v.isNaN && !v.isInfinite))
      assert(sig == z.exists(v => math.abs(v) > 1.96))
    }
  }

  test("q163 mutual information: information inequalities hold") {
    val r = SparkEntry.queries("q163_mutual_info")(spark, sf).collect()(0)
    val (mi, hx, hy, nmi) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(2), r.getDouble(3))
    assert(mi >= -1e-9, s"MI must be nonnegative, got $mi")
    assert(mi <= math.min(hx, hy) + 1e-9, s"MI <= min(H): $mi vs $hx/$hy")
    assert(hx > 0 && hy > 0)
    assert(nmi >= -1e-9 && nmi <= 1 + 1e-9)
  }

  test("q84 approx distinct stays within the 5pct invariant") {
    val rows = SparkEntry.queries("q84_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("within_5pct")))
  }

  test("q85 rolling window: 7-day sum bounds and first-day identity") {
    val rows = SparkEntry.queries("q85_rolling_revenue")(spark, sf)
      .orderBy("day").collect()
    assert(rows.nonEmpty)
    // every rolling value is at least its own day's value
    rows.foreach { r =>
      assert(r.getAs[Double]("rev_7d") >= r.getAs[Double]("day_rev") - 1e-6)
      assert(r.getAs[Long]("n_7d") >= r.getAs[Long]("n_orders"))
    }
    // the first day's frame contains only itself
    val f = rows.head
    assert(f.getAs[Double]("rev_7d") == f.getAs[Double]("day_rev"))
    assert(f.getAs[Long]("n_7d") == f.getAs[Long]("n_orders"))
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("MarketBasket.pairRules: hand-computed supports, confidence, lift") {
    import spark.implicits._
    // baskets: b1{x,y} b2{x,y} b3{x,z} b4{y}; duplicate rows collapse.
    // N=4, supp(x)=3, supp(y)=3, supp(z)=1; pair (x,y)=2 survives
    // minPairCount=2, (x,z)=1 does not.
    val items = Seq(
      (1L, "x"), (1L, "y"), (1L, "y"), // dup within basket
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "z"),
      (4L, "y")).toDF("basket", "item")
    val r = graft.queries.MarketBasket.pairRules(items, minPairCount = 2)
      .collect().map(row => (row.getString(0), row.getString(1)) ->
        (row.getLong(2), row.getDouble(3), row.getDouble(4))).toMap
    assert(r.keySet == Set(("x", "y"), ("y", "x")))
    val (ps, conf, lift) = r(("x", "y"))
    assert(ps == 2L)
    assert(conf == 0.666667)            // 2/3 rounded to 6
    assert(lift == 0.888889)            // 2*4/(3*3)
    assert(r(("y", "x")) == ((2L, 0.666667, 0.888889)))
  }
}
