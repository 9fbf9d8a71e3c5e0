package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.BloomFilterFns

/** Bloom-pruned semi join (builder brief §"minimize shuffles").
  *
  * Spark's `InjectRuntimeFilter` only fires on equi-joins it can prove
  * selective at plan time; this operator makes the same trick explicit
  * and exact for the common 100 TB shape "keep fact rows whose key
  * appears in a filtered dimension":
  *
  *   1. build: one distributed aggregation over the dimension keys →
  *      a KB–MB Bloom filter (partial aggs on executors, merged once);
  *   2. prune: probe the filter inside the fact scan's codegen span —
  *      rows that are *definitely absent* never reach the shuffle;
  *   3. verify: a left-semi equi-join over the survivors removes Bloom
  *      false positives, so the result is EXACTLY the semi join.
  *
  * At scale the win is step 2: with a selective dimension the shuffle
  * for step 3 sees only `match_rate + fpp` of the fact table instead of
  * all of it. The filter itself is the only driver-side materialization
  * (one row, bounded by `numBits/8` bytes — the same order as any
  * broadcast hash table, and far smaller than broadcasting the dim).
  */
object BloomJoin {

  /** Exact left-semi join of `fact` against `dim` keys, Bloom-pruned.
    * Key columns must be integral (probed as LONG).
    */
  def bloomSemiJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                    dimKey: String, estimatedItems: Long = 1 << 20,
                    bitsPerItem: Int = 16): DataFrame = {
    val numBits = math.max(64L, estimatedItems * bitsPerItem)
    val bloom = dim
      .select(BloomFilterFns.bloom_filter_agg(
        col(dimKey).cast("long"), estimatedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)
    // Zero dimension rows → null filter → nothing can match.
    val pruned =
      if (bloom == null) fact.filter(lit(false))
      else fact.filter(BloomFilterFns.might_contain(
        lit(bloom), col(factKey).cast("long")))
    pruned.join(dim.select(col(dimKey).as(factKey)).distinct(),
      Seq(factKey), "left_semi")
  }

  /** The prune stage alone (possibly-matching superset, no verify join)
    * — for pipelines that tolerate the false-positive rate in exchange
    * for zero shuffle, and for specs pinning the no-false-negative
    * guarantee.
    */
  def bloomPrune(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, estimatedItems: Long = 1 << 20,
                 bitsPerItem: Int = 16): DataFrame = {
    val numBits = math.max(64L, estimatedItems * bitsPerItem)
    val bloom = dim
      .select(BloomFilterFns.bloom_filter_agg(
        col(dimKey).cast("long"), estimatedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]](0)
    if (bloom == null) fact.filter(lit(false))
    else fact.filter(BloomFilterFns.might_contain(
      lit(bloom), col(factKey).cast("long")))
  }
}
