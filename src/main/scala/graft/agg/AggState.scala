package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Decomposable aggregate STATE for incremental maintenance — the
  * materialized-view discipline: keep (sum, count, min, max) per group
  * instead of finished answers, because states MERGE (new partition of
  * data → partialize it → merge into the stored state) while finished
  * averages do not. This is how a 100 TB rolling aggregate avoids
  * re-scanning history: each refresh aggregates only the new slice and
  * merges two small state tables, and every non-decomposable read-side
  * value (mean here) is derived at the end from decomposable parts.
  *
  * All three steps are plain hash aggregates with map-side partials;
  * sums accumulate in DECIMAL so merge results are exact and identical
  * to a single-pass aggregate — pinned by the x_incr_agg oracle, which
  * compares a two-state merge against DuckDB aggregating the full
  * table directly.
  */
object AggState {

  private val StateCols = Seq("s_sum", "s_count", "s_min", "s_max")

  /** Aggregate a slice of data into per-group state. */
  def partialize(df: DataFrame, keys: Seq[String],
                 valCol: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(
      sum(col(valCol).cast(DecimalType(18, 2))).as("s_sum"),
      count(col(valCol)).as("s_count"),
      min(col(valCol)).as("s_min"),
      max(col(valCol)).as("s_max"))

  /** Merge any number of state tables (same keys) into one. */
  def merge(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state table")
    states.map(_.select((keys ++ StateCols).map(col): _*))
      .reduce(_ unionByName _)
      .groupBy(keys.map(col): _*).agg(
        sum(col("s_sum")).as("s_sum"),
        sum(col("s_count")).as("s_count"),
        min(col("s_min")).as("s_min"),
        max(col("s_max")).as("s_max"))
  }

  /** Read-side view of a state table: totals plus the derived mean. */
  def finalized(state: DataFrame): DataFrame = {
    val keys = state.columns.filterNot(StateCols.contains)
    state.select(keys.toIndexedSeq.map(col) ++ Seq(
      col("s_sum").cast("double").as("total"),
      col("s_count").as("n"),
      (col("s_sum").cast("double") / col("s_count").cast("double"))
        .as("mean"),
      col("s_min").as("vmin"),
      col("s_max").as("vmax")): _*)
  }

  // ---- distinct-count state (HLL sketches) -----------------------------

  /** DISTINCT-count state: the one decomposable aggregate the
    * (sum, count, min, max) tier can't carry — exact distinct counts
    * don't merge (|A ∪ B| ≠ |A| + |B|), so the state is a DataSketches
    * HLL sketch per group (`hll_sketch_agg`, a built-in since Spark
    * 3.5): a KB-sized binary that unions losslessly. A 100 TB rolling
    * "distinct users per day/segment" materializes one sketch per
    * slice and answers any grouping-superset query by unioning
    * sketches — no history re-scan, no exact distinct over the union.
    * `lgK = 12` ≈ 1.6% relative standard error.
    */
  def partializeDistinct(df: DataFrame, keys: Seq[String],
                         valCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(hll_sketch_agg(col(valCol), lit(lgK)).as("s_hll"))

  /** Merge distinct-count states (same keys), optionally rolling up to
    * a coarser key set — the read path of the sketch table.
    */
  def mergeDistinct(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state table")
    states.map(_.select((keys :+ "s_hll").map(col): _*))
      .reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(hll_union_agg(col("s_hll")).as("s_hll"))
  }

  /** Read-side estimate of a distinct-count state table. */
  def finalizedDistinct(state: DataFrame): DataFrame = {
    val keys = state.columns.filterNot(_ == "s_hll")
    state.select(keys.toIndexedSeq.map(col) :+
      hll_sketch_estimate(col("s_hll")).as("approx_distinct"): _*)
  }

  // ---- quantile state (KLL sketches) -----------------------------------

  /** QUANTILE state — the other aggregate the (sum, count, min, max)
    * tier can't carry: percentiles don't merge (the p99 of two slices
    * says nothing about the union's p99), so the state is a KLL doubles
    * sketch per group (Spark 4.1's built-in `kll_sketch_agg_double` —
    * ~KB binary, proven normalized-rank guarantee ≈1.65% at k=200 that
    * survives union). A 100 TB monitoring pipeline that can't re-scan
    * for p99 materializes one sketch per (group, slice) and answers any
    * later rollup by merging — the quantile analogue of
    * [[partializeDistinct]]. Build and read sides are the built-ins;
    * only the N-row merge fold is the native
    * [[org.apache.spark.sql.graft.KllMergeAgg]] (the built-in merge is
    * pairwise only — it cannot fold a state table of unbounded epochs).
    */
  def partializeQuantile(df: DataFrame, keys: Seq[String],
                         valCol: String, k: Int = 200): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(kll_sketch_agg_double(col(valCol).cast("double"), k)
        .as("s_kll"))

  /** Merge quantile states (same keys), optionally rolling up to a
    * coarser key set — the read path of the persisted sketch table.
    */
  def mergeQuantile(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state table")
    states.map(_.select((keys :+ "s_kll").map(col): _*))
      .reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(graft.functions.native_fns.kll_merge(col("s_kll")).as("s_kll"))
  }

  /** Read-side percentile estimates of a quantile state table: one
    * `p<rank*100>` column per requested rank plus the exact absorbed
    * count `n` (both via the Spark built-ins).
    */
  def finalizedQuantile(state: DataFrame,
                        ranks: Seq[Double]): DataFrame = {
    require(ranks.nonEmpty, "need at least one rank")
    val keys = state.columns.filterNot(_ == "s_kll")
    state.select(keys.toIndexedSeq.map(col) ++
      ranks.map(r => kll_sketch_get_quantile_double(col("s_kll"), lit(r))
        .as(s"p${math.round(r * 100)}")) :+
      kll_sketch_get_n_double(col("s_kll")).as("n"): _*)
  }
}
