package graft

import org.apache.spark.sql.functions._
import graft.io.Bucketing
import graft.util.Skew

/** The explicit scale-technique utilities: bucketed co-located joins
  * (plan-shape: zero exchanges) and salted skew joins (row-identical to
  * the plain join, hot key spread across salt partitions). */
class ScaleUtilSpec extends SparkSpec {

  import spark.implicits._

  /** Drop the table AND its warehouse location (a crashed earlier run
    * can leave the directory behind with no catalog entry). */
  private def freshTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete()
    }
    val loc = new java.io.File(s"target/spark-warehouse/$name")
    if (loc.exists()) rm(loc)
  }

  test("bucketed fact-fact join plans ZERO shuffle exchanges") {
    freshTable("orders_b")
    freshTable("items_b")
    val orders = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val items = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity")
      .withColumnRenamed("l_orderkey", "o_orderkey")
    Bucketing.writeBucketed(orders, "orders_b", "o_orderkey", 8)
    Bucketing.writeBucketed(items, "items_b", "o_orderkey", 8)
    // at test scale the planner would broadcast (and skip the bucketed
    // scan entirely); force the sort-merge path — the one that matters
    // at fact⋈fact scale, where broadcast is not an option
    val thr = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(thr)
    spark.conf.set(thr, "-1")
    try {
      val joined = Bucketing.readBucketed(spark, "orders_b")
        .join(Bucketing.readBucketed(spark, "items_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan did not use buckets:\n$plan")
      // and it is the same result as the plain path join
      val plain = orders.join(items, "o_orderkey")
      assert(joined.count() == plain.count())
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    } finally spark.conf.set(thr, prev)
  }

  test("partitioned write: filters prune partitions before any I/O") {
    val path = "target/tmp/docs_by_lang"
    val docs = Tables.documents(spark, sf).select("doc_id", "lang", "text")
    graft.io.Sinks.writePartitioned(docs, path, "lang")
    val langs = docs.select("lang").distinct().count()
    assert(langs > 1, "fixture needs multiple partitions")
    val one = spark.read.parquet(path).filter(col("lang") === "en")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") &&
      plan.replaceAll("\\s", "").contains("PartitionFilters:[isnotnull(lang"),
      s"no partition filter at the scan:\n$plan")
    // round trip: the pruned read returns exactly the en rows
    assert(one.count() == docs.filter(col("lang") === "en").count())
  }

  test("salted join: row-identical to plain join under a planted hot key") {
    // 90% of the big side lands on key 7 — the classic skew bomb
    val big = (0 until 20000).map { i =>
      (if (i % 10 == 0) (i % 50).toLong else 7L, i.toLong)
    }.toDF("k", "payload")
    val small = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val plain = big.join(small, Seq("k"))
    val salted = Skew.saltedJoin(big, small, "k", factor = 8)
    assert(salted.columns.toSeq == plain.columns.toSeq)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
    // determinism: content-hash salt replays identically
    val again = Skew.saltedJoin(big, small, "k", factor = 8)
    assert(again.exceptAll(salted).isEmpty)
    // the join really is on (k, _salt): the hot key's rows split across
    // several salt values rather than one partition
    val saltSpread = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.map(col): _*)), lit(8L)))
      .filter(col("k") === 7L).select("_salt").distinct().count()
    assert(saltSpread >= 6, s"hot key only spread over $saltSpread salts")
  }

  test("salted sum: result-identical to the one-stage groupBy under a hot key") {
    val big = (0 until 20000).map { i =>
      (if (i % 10 == 0) (i % 50).toLong else 7L, (i % 97).toLong)
    }.toDF("k", "v")
    val plain = big.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("n_rows"))
    val salted = Skew.saltedSum(big, "k", "v", factor = 8)
    assert(salted.columns.toSeq == Seq("k", "sum_v", "n_rows"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("compactParquet: many small files in, target-sized file count out, rows intact") {
    val in = "target/compact-in"
    val out = "target/compact-out"
    val df = (0L until 5000L).map(i => (i, s"row_$i")).toDF("id", "payload")
    df.repartition(40).write.mode("overwrite").parquet(in) // 40 small files
    val totalBytes = {
      val conf = spark.sessionState.newHadoopConf()
      val p = new org.apache.hadoop.fs.Path(in)
      p.getFileSystem(conf).listStatus(p)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
    }
    // target half the data per file → exactly 2 output files
    val (before, after) = graft.io.Sinks.compactParquet(
      spark, in, out, targetBytes = (totalBytes + 1) / 2)
    assert(before == 40L)
    assert(after == 2L)
    val back = spark.read.parquet(out)
    assert(back.count() == 5000L)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
    // never in place
    intercept[IllegalArgumentException] {
      graft.io.Sinks.compactParquet(spark, in, in)
    }
  }
}
