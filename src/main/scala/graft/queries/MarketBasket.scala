package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise market-basket analysis (association-rule mining restricted
  * to the 2-itemset tier — the tier that matters for co-occurrence
  * features and "bought together" joins; deeper itemsets explode
  * combinatorially and are a different algorithm).
  *
  * Scale shape: the within-basket pair expansion is the only
  * super-linear step and it is bounded by Σ_b |b|² over baskets — at a
  * bounded basket size (retail orders, TPC-H ≤ 7 line items) that is a
  * constant factor on the scan, the same per-group bound as the q26
  * posting lists. Everything else is item- or pair-keyed hash
  * aggregates with map-side partials plus broadcast-size support
  * joins; the basket count rides along as a one-row broadcast, so the
  * whole rule computation is a single declarative plan.
  */
object MarketBasket {

  /** Association rules a→c between items co-occurring in at least
    * `minPairCount` baskets:
    *
    *   confidence(a→c) = supp(a,c) / supp(a)
    *   lift(a→c)       = supp(a,c)·N / (supp(a)·supp(c))
    *
    * over `items` rows (basket, item) — duplicates within a basket are
    * collapsed first. Both directions of every surviving pair are
    * emitted. Integer products are taken BEFORE the one double
    * division (exact in int64), so the rounded values replay
    * identically in any engine. */
  def pairRules(items: DataFrame, minPairCount: Long): DataFrame = {
    val it = items.select(col("basket"), col("item")).distinct()
    val nb = it.agg(countDistinct(col("basket")).as("n_baskets"))
    val supp = it.groupBy("item").agg(count(lit(1)).as("supp"))
    val pairs = it.select(col("basket"), col("item").as("a"))
      .join(it.select(col("basket"), col("item").as("b")), "basket")
      .filter(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("pair_supp"))
      .filter(col("pair_supp") >= minPairCount)
    val rules = pairs
      .select(col("a").as("antecedent"), col("b").as("consequent"), col("pair_supp"))
      .unionByName(pairs
        .select(col("b").as("antecedent"), col("a").as("consequent"), col("pair_supp")))
    rules
      .join(supp.withColumnRenamed("item", "antecedent")
        .withColumnRenamed("supp", "supp_a"), "antecedent")
      .join(supp.withColumnRenamed("item", "consequent")
        .withColumnRenamed("supp", "supp_c"), "consequent")
      .crossJoin(broadcast(nb))
      .select(col("antecedent"), col("consequent"), col("pair_supp"),
        round(col("pair_supp") / col("supp_a"), 6).as("confidence"),
        round((col("pair_supp") * col("n_baskets")) /
          (col("supp_a") * col("supp_c")), 6).as("lift"))
  }
}
