package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-pair co-occurrence mining (market-basket support/lift) —
  * "parts ordered together", "domains cited together": the pairwise core
  * of association-rule mining.
  *
  * Pair generation is GROUPED, not a self-join: one shuffle gathers
  * each basket's distinct items into a sorted array (`collect_set`
  * dedups inside the aggregation buffer — no separate distinct pass),
  * and C(b,2) pair structs are emitted ROW-LOCALLY from the array. A
  * self-join on the basket key would shuffle the (basket, item) table
  * twice and materialize the pair space as join output; here the only
  * other exchanges are the pair-count and item-support group-bys, both
  * map-side combined. Per-row blowup is C(b,2) — safe because baskets
  * are bounded (an order has a handful of lines; the round-3 lesson:
  * array emission is only safe with bounded buckets), and heavy-tailed
  * basket sizes are capped by the `maxBasket` guard, the Dedup
  * star-pair pattern.
  *
  * Lift denominators come from one item-support aggregate hash-joined
  * onto the |distinct pairs| table, and the basket total rides the plan
  * as a broadcast 1-row aggregate — the whole operator is lazy.
  */
object Basket {

  /** Support and lift per unordered item pair (item_a < item_b).
    * Output: item_a, item_b, pair_support (baskets containing both),
    * support_a, support_b, lift = pair·N / (a·b) as one rounded double.
    * `maxBasket > 0` drops baskets with more items (skew guard; 0 = off).
    * The default 64 is a measured-headroom bound on this corpus family:
    * distinct parts per order are generator-bounded at 11/13/17 across
    * sf0.001/0.01/0.1 and replica scaling preserves basket sizes, so 64
    * provably filters nothing at every tested scale (oracle parity
    * holds) while capping the quadratic per-basket emission at C(64,2)
    * if the data ever drifts — a drifted megabasket diverges LOUDLY in
    * the correctness gate instead of silently exploding the pair space.
    * BehaviorSpec plants one and pins the guard tripping for BOTH the
    * pair and triple paths, plus a ≤32 headroom tripwire on real data.
    */
  def pairSupport(df: DataFrame, basketCol: String, itemCol: String,
                  maxBasket: Int = 64): DataFrame = {
    val grouped = df.groupBy(col(basketCol).as("b"))
      .agg(sort_array(collect_set(col(itemCol))).as("items"))
    // referenced by the pair emission, the item supports, AND the
    // basket total — without a materialization barrier each reference
    // re-runs the collect_set aggregation over the source (measured 3×
    // the basket-build cost); the lazy checkpoint computes it once.
    // (r14 probe note: widening the checkpoint to shuffle-partitions
    // width via an explicit pre-barrier repartition was measured and
    // REVERTED — at this emission cost the extra task fan-out lost
    // more than the added cores won: 0.85 -> 1.37 s.)
    val baskets =
      (if (maxBasket > 0) grouped.filter(size(col("items")) <= maxBasket)
       else grouped).localCheckpoint(false)
    // sorted array -> each pair emitted once with item_a < item_b by
    // construction (indexes j < k). Two chained codegen'd Generates
    // (posexplode anchors item_a, explode of the tail slice emits
    // item_b) — the previous nested transform/slice tower was
    // interpreted (higher-order functions are CodegenFallback) and
    // built an array-of-array-of-struct per basket before the flatten:
    // measured 2.4 s CPU for the emission stage at sf0.1 vs ~0.6 s for
    // this shape (r14). Per-basket fan-out is the same C(b,2).
    val pairs = baskets
      .select(col("items"), posexplode(col("items")).as(Seq("j", "item_a")))
      .select(col("item_a"),
        explode(slice(col("items"), col("j") + lit(2),
          greatest(size(col("items")) - col("j") - 1, lit(0))))
          .as("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("pair_support"))
    val support = baskets.select(explode(col("items")).as("i"))
      .groupBy(col("i")).agg(count(lit(1)).as("s"))
    val nBaskets = baskets.agg(count(lit(1)).as("__n"))
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

  /** Item–item cosine similarity over basket co-occurrence — the
    * classic neighborhood collaborative-filtering score ("customers who
    * bought X also bought Y"): cos(a,b) = |a∩b| / √(|a|·|b|) on the
    * binary basket-membership vectors, so it reuses [[pairSupport]]'s
    * grouped pair machinery wholesale (one basket shuffle + two
    * map-side-combined count aggregates; no self-join, no |items|²).
    *
    * `minPairSupport` prunes noise pairs BEFORE the support joins — at
    * catalog scale most of the pair mass is 1-count pairs and the
    * filter sits directly on the pair aggregate's output. The cosine is
    * √ of an exact-integer product into one IEEE division (both
    * correctly rounded ops), rounded to 9 dp — bit-portable.
    */
  /** Frequent triple mining: support per unordered item triple
    * (item_a < item_b < item_c), the 3-itemset step of association-rule
    * mining. Shape: [[pairSupport]]'s row-local C(b,2) pair emission
    * (keyed by basket) extended by ONE equi-join back to the exploded
    * (basket, item) table with the range condition `item_c > item_b`
    * inside the join — each (a,b) pair picks up exactly its valid
    * third items, so join output is exactly the C(b,3) triples. The
    * round-10 verdict measured the previous 3-level nested
    * `transform`/`slice` HOF tower as the suite's slowest query (the
    * known interpreted-HOF trap): two HOF levels + a codegen'd
    * sort-merge join beat three interpreted levels building nested
    * array-of-array-of-struct per row. Both join inputs descend from
    * the same basket aggregate (localCheckpoint barrier), already
    * hash-partitioned by `b`, so the join adds sorts but NO new
    * shuffle. The `maxBasket` guard still bounds the cubic per-basket
    * blowup (A-Priori's candidate pruning trades that for extra
    * passes; with bounded baskets direct emission is one shuffle and
    * strictly cheaper). `minSupport` prunes at the count aggregate,
    * BEFORE any downstream join.
    */
  def tripleSupport(df: DataFrame, basketCol: String, itemCol: String,
                    maxBasket: Int = 64,
                    minSupport: Long = 2): DataFrame = {
    val grouped = df.groupBy(col(basketCol).as("b"))
      .agg(sort_array(collect_set(col(itemCol))).as("items"))
    val filtered =
      if (maxBasket > 0) grouped.filter(size(col("items")) <= maxBasket)
      else grouped
    // referenced by the pair emission AND the third-item explode —
    // barrier so the collect_set aggregation runs once; explicit
    // basket-hash repartition as in [[pairSupport]] (and both join
    // inputs below then share the b-hash layout)
    val nPart = df.sparkSession.conf.get("spark.sql.shuffle.partitions",
      df.sparkSession.sparkContext.defaultParallelism.toString).toInt
    val baskets =
      filtered.repartition(nPart, col("b")).localCheckpoint(false)
    // codegen'd pair emission — same two-Generate shape as
    // [[pairSupport]], with the basket key carried through
    val pairs = baskets
      .select(col("b"), col("items"),
        posexplode(col("items")).as(Seq("j", "item_a")))
      .select(col("b"), col("item_a"),
        explode(slice(col("items"), col("j") + lit(2),
          greatest(size(col("items")) - col("j") - 1, lit(0))))
          .as("item_b"))
    // distinct column name on the right side: both join inputs descend
    // from the same checkpointed plan, and same-name Dataset columns in
    // a self-join resolve ambiguously (Spark warns "trivially true")
    val thirds = baskets.select(col("b").as("__b_r"),
      explode(col("items")).as("item_c"))
    pairs
      .join(thirds, col("b") === col("__b_r") &&
        col("item_c") > col("item_b"))
      .groupBy(col("item_a"), col("item_b"), col("item_c"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  def itemCosine(df: DataFrame, basketCol: String, itemCol: String,
                 maxBasket: Int = 64,
                 minPairSupport: Long = 1): DataFrame =
    pairSupport(df, basketCol, itemCol, maxBasket)
      .filter(col("pair_support") >= minPairSupport)
      .select(col("item_a"), col("item_b"), col("pair_support"),
        col("support_a"), col("support_b"),
        round(col("pair_support").cast("double") /
          sqrt((col("support_a") * col("support_b")).cast("double")), 9)
          .as("cosine"))
}
