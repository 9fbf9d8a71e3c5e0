package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-pair co-occurrence mining (market-basket support/lift) —
  * "parts ordered together", "domains cited together": the pairwise core
  * of association-rule mining.
  *
  * Pair generation is a SELF-EQUI-JOIN on the basket key over the
  * DEDUPLICATED (basket, item) table: |pairs per basket| = C(b,2) where
  * b is basket size — the data's intrinsic output, not an engine
  * artifact — and the join is hash-partitioned on the basket key, never
  * a nested loop. Baskets are bounded in practice (an order has a
  * handful of lines); for heavy-tailed basket sizes cap with a
  * `maxBasket` guard, the Dedup star-pair pattern.
  *
  * Lift denominators come from one item-support aggregate broadcast back
  * onto the |distinct pairs| table, and the basket total rides the plan
  * as a broadcast 1-row aggregate — the whole operator is lazy, three
  * group-bys and three equi-joins.
  */
object Basket {

  /** Support and lift per unordered item pair (item_a < item_b).
    * Output: item_a, item_b, pair_support (baskets containing both),
    * support_a, support_b, lift = pair·N / (a·b) as one rounded double.
    * `maxBasket > 0` drops baskets with more items (skew guard; 0 = off,
    * the exact-oracle form).
    */
  def pairSupport(df: DataFrame, basketCol: String, itemCol: String,
                  maxBasket: Int = 1000): DataFrame = {
    val bi0 = df.select(col(basketCol).as("b"), col(itemCol).as("i"))
      .distinct()
    val bi = if (maxBasket > 0) {
      val sizes = bi0.groupBy(col("b")).agg(count(lit(1)).as("__bs"))
        .filter(col("__bs") <= maxBasket)
      bi0.join(sizes.select(col("b")), Seq("b"), "left_semi")
    } else bi0
    val pairs = bi.select(col("b"), col("i").as("item_a"))
      .join(bi.select(col("b"), col("i").as("item_b")), Seq("b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_support"))
    val support = bi.groupBy(col("i")).agg(count(lit(1)).as("s"))
    val nBaskets = bi.select(col("b")).distinct()
      .agg(count(lit(1)).as("__n"))
    pairs
      .join(support.select(col("i").as("item_a"), col("s").as("support_a")),
        Seq("item_a"))
      .join(support.select(col("i").as("item_b"), col("s").as("support_b")),
        Seq("item_b"))
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("pair_support"),
        col("support_a"), col("support_b"),
        // one double division of exact integers — bit-portable
        round((col("pair_support") * col("__n")).cast("double") /
          (col("support_a") * col("support_b")).cast("double"), 9)
          .as("lift"))
  }
}
