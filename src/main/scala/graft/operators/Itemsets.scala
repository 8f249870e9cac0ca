package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pairwise frequent-itemset statistics (the level-2 slice of
  * market-basket analysis): which items co-occur in the same basket
  * more than their marginals predict. In a data-curation setting the
  * "items" are tags, event types, or quality flags and the "basket" a
  * user, session, or document — lift spots flag combinations that
  * travel together (a template family, a spam signature).
  */
object Itemsets {

  /** Co-occurrence support / confidence / lift for item pairs.
    * `support(a,b) = n_ab / N`, `confidence(a→b) = n_ab / n_a`,
    * `lift = n_ab·N / (n_a·n_b)` (>1 ⇔ positive association).
    * Emits one row per unordered pair with `item_a < item_b`:
    * `(item_a, item_b, n_a, n_b, n_ab, support, conf_a_b, conf_b_a,
    * lift)`, pairs with `n_ab >= minSupport` only.
    *
    * Scale shape: the classic a-priori pruning — per-item counts
    * first (one combinable agg), items below `minSupport` are dropped
    * BEFORE the pair join (an infrequent pair needs two frequent
    * members), then the basket self-join runs on the de-duplicated
    * (basket, item) projection with `item_a < item_b`. The join
    * shuffles on the basket key; per-basket fan-out is
    * C(frequent items in basket, 2) — bounded by the frequent-item
    * filter, the reason a-priori prunes before joining. Totals and
    * item counts are dimension-sized broadcasts.
    */
  def pairLift(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long = 2): DataFrame = {
    // the distinct (basket, item) projection feeds item counts, the
    // basket total, AND both sides of the pair join — persist it
    // (tracked; released by Dedup.clearCaches) or each consumer
    // re-runs the distinct's shuffle over the raw table
    val pairs = Dedup.persistTracked(
      df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
        .where(col("__i").isNotNull)
        .distinct())
    val itemN = pairs.groupBy(col("__i")).agg(count(lit(1)).as("__n"))
      .where(col("__n") >= minSupport)
    val total = pairs.select(col("__b")).distinct()
      .agg(count(lit(1)).as("__total"))
    // prune to frequent items before the quadratic-in-basket join
    val frequent = pairs.join(broadcast(itemN.select("__i")), Seq("__i"))
    val co = frequent.as("a")
      .join(frequent.as("b"),
        col("a.__b") === col("b.__b") && col("a.__i") < col("b.__i"))
      .groupBy(col("a.__i").as("item_a"), col("b.__i").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minSupport)
    co.join(broadcast(itemN.select(col("__i").as("item_a"), col("__n").as("n_a"))),
        Seq("item_a"))
      .join(broadcast(itemN.select(col("__i").as("item_b"), col("__n").as("n_b"))),
        Seq("item_b"))
      .crossJoin(broadcast(total))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"), col("n_ab"),
        round(col("n_ab") / col("__total"), 6).as("support"),
        round(col("n_ab") / col("n_a"), 6).as("conf_a_b"),
        round(col("n_ab") / col("n_b"), 6).as("conf_b_a"),
        round(col("n_ab") * col("__total") / (col("n_a") * col("n_b")), 6)
          .as("lift"))
  }
}
