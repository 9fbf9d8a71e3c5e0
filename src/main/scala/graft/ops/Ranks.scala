package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking without a single-partition sort.
  *
  * `row_number()`/`ntile(k)` over a no-partitionBy window move the
  * ENTIRE table through one task (Spark's WindowExec warns exactly
  * this) — the one operator shape that cannot survive a 100× scale-up.
  * But an exact global rank does not need a global sort: it is a sum
  * of counts, and counts distribute.
  *
  * For the total order `(key DESC, tie ASC)` the 1-based position of a
  * row is
  *
  *   rank = #{key' > key}                       (phase 1, per-value)
  *        + #{key' = key ∧ tie' < tie} + 1      (phase 2, within-value)
  *
  * Phase 1 runs on the |distinct key| table with the two-phase bucketed
  * prefix (equi-depth `approx_percentile` buckets are a function of the
  * key, so ties never split; intra-bucket windows are partitioned, and
  * the only partition-free window is the ≤`buckets`-row bucket-totals
  * prefix). `#{key' > key}` = n − strictly-below − own-count — no
  * descending pass.
  *
  * Phase 2 is the same idea nested: bucket the TIE domain (a function
  * of tie — a hot key value, e.g. frequency = 1 for half the users,
  * splits across all tie-buckets instead of melting one task), count
  * per (key, tie-bucket), per-key prefix over ≤`buckets` rows, plus a
  * row_number partitioned by (key, tie-bucket).
  *
  * Contracts: `keyCol` numeric non-null (approx_percentile needs a
  * numeric domain); `tieCol` numeric non-null and UNIQUE per row (it is
  * the total-order tie-break — duplicates would make ranks
  * nondeterministic, exactly as they would under a window); row counts
  * below 2^53 (exact double integer arithmetic).
  */
object Ranks {

  /** Floor division for non-negative longs below 2^53 (doubles are
    * exact there; inputs are row counts/ranks). */
  private def idiv(a: Column, b: Column): Column =
    floor(a.cast("double") / b.cast("double")).cast("long")

  /** Adds `out` = exact 1-based global row number over
    * `(keyCol DESC, tieCol ASC)` and `outN` = total row count, with no
    * single-partition exchange of data-sized tables. See the object
    * doc for the decomposition and contracts.
    */
  def rowNumberDesc(df: DataFrame, keyCol: String, tieCol: String,
                    out: String = "__rank", outN: String = "__rank_n",
                    buckets: Int = 256): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val key = col(keyCol); val tie = col(tieCol)
    val fracs = array((1 until buckets).map(i =>
      lit(i.toDouble / buckets)): _*)
    val stats = df.agg(
      percentile_approx(key, fracs, lit(10000)).as("__kb"),
      percentile_approx(tie, fracs, lit(10000)).as("__tb"),
      count(lit(1)).as(outN))
    // order-preserving equi-depth buckets, each a pure function of its
    // column — equal values always share a bucket. bucket_index is the
    // codegen'd binary search (double space: the cast is monotonic and
    // equality-preserving, so both properties survive; two distinct
    // values collapsing to one double merely merge buckets)
    val b = df.crossJoin(broadcast(stats))
      .withColumn("__bk", graft.functions.native_fns.bucket_index(
        col("__kb").cast("array<double>"), key.cast("double")))
      .withColumn("__bt", graft.functions.native_fns.bucket_index(
        col("__tb").cast("array<double>"), tie.cast("double")))
      .drop("__kb", "__tb")
      .localCheckpoint(false) // read by phase 1, phase 2, and the join
    // ---- phase 1: lt = #{key' < key} on the per-distinct-key table --
    val perKey = b.groupBy(col("__bk"), key.as("__k"))
      .agg(count(lit(1)).as("__c"))
    val intraW = Window.partitionBy(col("__bk")).orderBy(col("__k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val interW = Window.orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketTotals = perKey.groupBy(col("__bk"))
      .agg(sum(col("__c")).as("__bc"))
      .withColumn("__boff",
        coalesce(sum(col("__bc")).over(interW), lit(0L)))
      .select(col("__bk").as("__bk2"), col("__boff"))
    val perKeyLt = perKey
      .join(bucketTotals, col("__bk") === col("__bk2"))
      .withColumn("__lt",
        col("__boff") + coalesce(sum(col("__c")).over(intraW), lit(0L)))
      .select(col("__k"), col("__c"), col("__lt"))
    // ---- phase 2: within-key offset of the row's tie-bucket ---------
    val subW = Window.partitionBy(col("__k2")).orderBy(col("__bt2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val subOff = b.groupBy(key.as("__k2"), col("__bt").as("__bt2"))
      .agg(count(lit(1)).as("__sc"))
      .withColumn("__soff",
        coalesce(sum(col("__sc")).over(subW), lit(0L)))
      .select(col("__k2"), col("__bt2"), col("__soff"))
    // ---- combine: above-count + tie-bucket offset + intra row_number
    val rnW = Window.partitionBy(key, col("__bt")).orderBy(tie)
    b.withColumn("__rn", row_number().over(rnW).cast("long"))
      .join(perKeyLt, key === col("__k"))
      .join(subOff, key === col("__k2") && col("__bt") === col("__bt2"))
      .withColumn(out,
        col(outN) - col("__lt") - col("__c") + col("__soff") + col("__rn"))
      .drop("__bk", "__bt", "__rn", "__k", "__c", "__lt", "__k2",
        "__bt2", "__soff")
  }

  /** Exact INCLUSIVE cumulative sum of `valCol` over the total order
    * `(keyCol DESC, tieCol ASC)` with no single-partition sort — the
    * prefix-SUM sibling of [[rowNumberDesc]], same decomposition with
    * value sums in place of counts:
    *
    *   cum(row) = Σ{key' > key} + Σ{key' = key ∧ tie' ≤ tie}
    *
    * Phase 1 runs on the per-distinct-key SUMS table (Σ above =
    * total − strictly-below − own); phase 2 tie-buckets within equal
    * keys. Pass `valCol` as DECIMAL: every partial is then an exact
    * sum and the cumulative is order-free under any partitioning (a
    * double here would re-introduce accumulation-order dependence).
    * Same contracts as [[rowNumberDesc]] (numeric non-null key,
    * unique numeric tie).
    */
  def cumSumDesc(df: DataFrame, keyCol: String, tieCol: String,
                 valCol: String, out: String = "__cum",
                 buckets: Int = 256): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val key = col(keyCol); val tie = col(tieCol)
    val fracs = array((1 until buckets).map(i =>
      lit(i.toDouble / buckets)): _*)
    val stats = df.agg(
      percentile_approx(key, fracs, lit(10000)).as("__kb"),
      percentile_approx(tie, fracs, lit(10000)).as("__tb"))
    val b = df.crossJoin(broadcast(stats))
      .withColumn("__bk", graft.functions.native_fns.bucket_index(
        col("__kb").cast("array<double>"), key.cast("double")))
      .withColumn("__bt", graft.functions.native_fns.bucket_index(
        col("__tb").cast("array<double>"), tie.cast("double")))
      .drop("__kb", "__tb")
      .localCheckpoint(false)
    // phase 1: per-distinct-key sums; Σ{key' < key} via the bucketed
    // two-phase prefix; Σ above = total − below − own
    val perKey = b.groupBy(col("__bk"), key.as("__k"))
      .agg(sum(col(valCol)).as("__vs"))
    val intraW = Window.partitionBy(col("__bk")).orderBy(col("__k"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val interW = Window.orderBy(col("__bk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketTotals = perKey.groupBy(col("__bk"))
      .agg(sum(col("__vs")).as("__bv"))
      .withColumn("__boff", sum(col("__bv")).over(interW))
      .select(col("__bk").as("__bk2"), col("__boff"))
    val total = perKey.agg(sum(col("__vs")).as("__tot"))
    val perKeyAbove = perKey
      .join(bucketTotals, col("__bk") === col("__bk2"))
      .crossJoin(broadcast(total))
      .withColumn("__ltv", coalesce(col("__boff"), lit(0)) +
        coalesce(sum(col("__vs")).over(intraW), lit(0)))
      .select(col("__k"),
        (col("__tot") - col("__ltv") - col("__vs")).as("__above"))
    // phase 2: within-key inclusive running sum via tie buckets
    val subW = Window.partitionBy(col("__k2")).orderBy(col("__bt2"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val subOff = b.groupBy(key.as("__k2"), col("__bt").as("__bt2"))
      .agg(sum(col(valCol)).as("__sv"))
      .withColumn("__soff", sum(col("__sv")).over(subW))
      .select(col("__k2"), col("__bt2"), col("__soff"))
    val runW = Window.partitionBy(key, col("__bt")).orderBy(tie)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn("__run", sum(col(valCol)).over(runW))
      .join(perKeyAbove, key === col("__k"))
      .join(subOff, key === col("__k2") && col("__bt") === col("__bt2"))
      .withColumn(out, col("__above") +
        coalesce(col("__soff"), lit(0)) + col("__run"))
      .drop("__bk", "__bt", "__run", "__k", "__above", "__k2",
        "__bt2", "__soff")
  }

  /** SQL-standard `NTILE(k)` of an exact 1-based `rank` among `n` rows:
    * the first `n mod k` tiles hold `⌈n/k⌉` rows, the rest `⌊n/k⌋` —
    * bit-identical to the window function, computed row-locally.
    */
  def ntileOfRank(rank: Column, n: Column, k: Int): Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    val q = idiv(n, lit(k.toLong))
    val rem = n % lit(k.toLong)
    val threshold = rem * (q + lit(1L))
    when(rank <= threshold, idiv(rank - 1, q + lit(1L)) + 1)
      // q = 0 only when n < k, where every rank takes the first branch
      .otherwise(rem + idiv(rank - threshold - 1,
        greatest(q, lit(1L))) + 1)
      .cast("int")
  }

  /** `ntile(k) OVER (ORDER BY keyCol DESC, tieCol)` as a scale-safe
    * composition: [[rowNumberDesc]] + [[ntileOfRank]], internal
    * columns dropped.
    */
  def ntileDesc(df: DataFrame, keyCol: String, tieCol: String, k: Int,
                out: String, buckets: Int = 256): DataFrame =
    rowNumberDesc(df, keyCol, tieCol, buckets = buckets)
      .withColumn(out, ntileOfRank(col("__rank"), col("__rank_n"), k))
      .drop("__rank", "__rank_n")
}
