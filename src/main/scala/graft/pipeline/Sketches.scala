package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.collection.mutable

/** Mergeable frequency sketches for corpus-scale term statistics.
  *
  * At 100 TB the exact term-count aggregate is itself cheap (one
  * hash-aggregate scan), but it SHUFFLES the full vocabulary; a
  * heavy-hitters sketch answers "which terms exceed φ·n" with a
  * constant-size summary per partition and NO shuffle at all — the
  * partial summaries ship to the driver and merge there (the same
  * one-pass treeAggregate shape as [[graft.linalg.Pca]]'s moment
  * pass). The price is bounded error, and the bound is a THEOREM, so
  * the audit query carries the bound check beside the exact twin the
  * same way q84 (HLL) and q88 (GK quantiles) do: the sketch is what
  * runs at scale, the exact aggregate anchors it, and drift past the
  * guarantee fails the gate loudly.
  */
object Sketches {

  /** Misra–Gries heavy-hitters summary with `k` counters (Misra &
    * Gries 1982; merge rule from Agarwal, Cormode, Huang, Phillips,
    * Wei & Yi 2012, "Mergeable Summaries"). For a stream of n items
    * the summary guarantees, for EVERY term x with true count f(x):
    *
    *   est(x) ≤ f(x)   and   f(x) − est(x) ≤ n/(k+1)
    *
    * (absent terms have est 0), and therefore every term with
    * f(x) > n/(k+1) is present among the counters. Both properties
    * survive arbitrary merging of partial summaries — the property
    * that makes the sketch distributable.
    *
    * One pass, no shuffle: per-partition summaries merge via
    * treeAggregate. The returned map has at most k entries.
    */
  def misraGries(terms: DataFrame, k: Int,
                 termCol: String = "term"): Map[String, Long] = {
    require(k >= 1, s"k must be >= 1, got $k")

    // insert one occurrence: bump if tracked, claim a free counter, or
    // decrement all (amortized O(1): each decrement event burns k+1
    // units of total inserted count, so there are at most n/(k+1))
    def add(m: mutable.Map[String, Long], x: String): mutable.Map[String, Long] = {
      m.get(x) match {
        case Some(c) => m.update(x, c + 1)
        case None if m.size < k => m.update(x, 1L)
        case None =>
          val dead = mutable.ArrayBuffer[String]()
          m.mapValuesInPlace((_, c) => c - 1)
          m.foreach { case (t, c) => if (c <= 0) dead += t }
          dead.foreach(m.remove)
      }
      m
    }

    // merge: counter-wise sum, then subtract the (k+1)-th largest
    // count from everything and drop the non-positive — the Agarwal
    // et al. merge that preserves the n/(k+1) bound
    def merge(a: mutable.Map[String, Long],
              b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
      b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
      if (a.size > k) {
        val cut = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
        val dead = mutable.ArrayBuffer[String]()
        a.mapValuesInPlace((_, c) => c - cut)
        a.foreach { case (t, c) => if (c <= 0) dead += t }
        dead.foreach(a.remove)
      }
      a
    }

    terms.select(col(termCol).cast("string")).na.drop()
      .rdd.map(_.getString(0))
      .treeAggregate(mutable.Map.empty[String, Long])(add, merge)
      .toMap
  }

  /** Heavy-hitters audit over a document corpus: runs the Misra–Gries
    * sketch (k counters) against the exact term counts and emits ONE
    * deterministic row proving the sketch's guarantees held —
    *
    *   (n_total, n_heavy, all_heavy_found, bounds_ok)
    *
    * where n_heavy counts terms with exact count > n/(k+1),
    * all_heavy_found asserts every such term is among the sketch's
    * counters, and bounds_ok asserts est ≤ exact and
    * exact − est ≤ n/(k+1) on every counter. The row is a pure
    * function of the corpus (the booleans are theorems — ANY
    * partitioning yields true), so it hash-compares against an exact
    * SQL oracle even though the counter SET itself is
    * partitioning-dependent.
    */
  def heavyHittersAudit(spark: SparkSession, docs: DataFrame, k: Int,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    import spark.implicits._
    val terms = docs
      .select(explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sketch = misraGries(terms, k)
    val exact = terms.groupBy("term").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = exact.agg(sum(col("cnt"))).collect()(0).getLong(0)
    val bound = n.toDouble / (k + 1)
    val cand = sketch.toSeq.toDF("term", "est")
    // a counter's term always occurred (est ≥ 1 implies f ≥ 1), so the
    // inner join is total over the candidate set
    val checked = cand.join(exact, "term")
      .agg(coalesce(min(col("est") <= col("cnt") &&
        (col("cnt") - col("est")) <= lit(bound)), lit(true)).as("bounds_ok"))
    val missedHeavy = exact.filter(col("cnt") > bound)
      .join(cand, Seq("term"), "left_anti")
    val nHeavy = exact.filter(col("cnt") > bound).count()
    val allFound = missedHeavy.isEmpty
    val out = checked.select(lit(n).as("n_total"), lit(nHeavy).as("n_heavy"),
      lit(allFound).as("all_heavy_found"), col("bounds_ok"))
    val materialized = out.collect()
    terms.unpersist(); exact.unpersist()
    spark.createDataFrame(
      spark.sparkContext.parallelize(materialized.toIndexedSeq, 1), out.schema)
  }

  /** Count-min sketch (Cormode & Muthukrishnan 2005) built from the
    * aggregated term table: `depth` seeded hash rows × `width` buckets,
    * each row adding f(t) to bucket h_i(t) — arithmetic-identical to
    * streaming every token through the sketch, but one shuffle on
    * (row, bucket) with map-side partial sums instead of a token-count
    * stream. est(t) = min_i cms[i][h_i(t)]. The whole sketch is
    * depth×width longs — mergeable across any partitioning, the
    * property that makes CMS the standard distributed-frequency
    * structure beside Misra-Gries ([[misraGries]] keeps exact heavy
    * entries; CMS answers point queries over the full domain). */
  def countMin(termCounts: DataFrame, depth: Int, width: Int,
               termCol: String = "term", cntCol: String = "cnt"): DataFrame = {
    require(depth >= 1 && width >= 2, s"need depth>=1 width>=2, got $depth/$width")
    termCounts
      .select(col(termCol).as("term"), col(cntCol).as("cnt"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("row"),
        pmod(xxhash64(col("term"), col("row")), lit(width)).as("bucket"),
        col("cnt"))
      .groupBy("row", "bucket").agg(sum("cnt").as("sum"))
  }

  /** One-row CMS audit beside the exact counts (the
    * [[heavyHittersAudit]] / q84 / q88 pattern): estimates for the
    * `topQ` most frequent terms are read back from the sketch and the
    * guarantees become hash-checked booleans — `no_underestimate`
    * (est ≥ f, a theorem of CMS) and `overcount_ok` (est ≤ f +
    * depth·N/width, a generous multiple of the E[N/width] per-row
    * collision mass; deterministic for a fixed corpus + seed, so a
    * sketch regression flips it). n_total / n_terms / n_checked are
    * exact scalars the SQL oracle recomputes. */
  def countMinAudit(spark: SparkSession, docs: DataFrame, depth: Int = 4,
                    width: Int = 1024, topQ: Int = 32,
                    textCol: String = "text"): DataFrame = {
    val exact = docs
      .select(explode(split(col(textCol), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (n, nTerms) = {
      val r = exact.agg(sum("cnt"), count(lit(1))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val cms = countMin(exact, depth, width)
    val heavy = exact.orderBy(col("cnt").desc, col("term")).limit(topQ)
      .select(col("term"), col("cnt"),
        explode(sequence(lit(0), lit(depth - 1))).as("row"))
      .select(col("term"), col("cnt"), col("row"),
        pmod(xxhash64(col("term"), col("row")), lit(width)).as("bucket"))
    val est = heavy.join(cms, Seq("row", "bucket"))
      .groupBy("term", "cnt").agg(min("sum").as("est"))
    val slack = depth.toDouble * n / width
    val out = est.agg(
      lit(n).as("n_total"), lit(nTerms).as("n_terms"),
      count(lit(1)).as("n_checked"),
      coalesce(min(col("est") >= col("cnt")), lit(true))
        .as("no_underestimate"),
      coalesce(min(col("est") <= col("cnt") + slack), lit(true))
        .as("overcount_ok"))
    val materialized = out.collect()
    exact.unpersist()
    spark.createDataFrame(
      spark.sparkContext.parallelize(materialized.toIndexedSeq, 1), out.schema)
  }
}
