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

  // ---- cross-moment state (covariance / correlation) -------------------

  /** CROSS-MOMENT state — the fourth tier, for everything bivariate:
    * covariance, correlation, and OLS slopes all derive from
    * (n, Σx, Σx², Σxy), and those moments merge EXACTLY when kept in
    * DECIMAL (unlike finished correlations, and unlike the built-in
    * `corr`'s float recurrences, which neither merge nor replay
    * layout-stably). A 100 TB feature store materializes one moment
    * row per (group, slice) — a few dozen DECIMAL cells — and answers
    * any later correlation matrix over any slice union without
    * re-scanning; merged state is bit-identical to the one-pass state
    * because every cell is an exact sum. Columns quantize to 4 dp on
    * entry (the [[graft.agg.Robust.corrMatrix]] convention — this is
    * its grouped, incremental sibling).
    */
  def partializeMoments(df: DataFrame, keys: Seq[String],
                        cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    val d = df
      .filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select((keys.map(col) ++ cols.map(c =>
        col(c).cast(DecimalType(18, 4)).as(c))): _*)
    val aggs = (count(lit(1)).as("s_cnt") +:
      cols.map(c => sum(col(c)).as(s"s_$c"))) ++
      cols.map(c => sum((col(c) * col(c)).cast(DecimalType(38, 8)))
        .as(s"ss_$c")) ++
      (for (i <- cols.indices; j <- (i + 1) until cols.size) yield
        sum((col(cols(i)) * col(cols(j))).cast(DecimalType(38, 8)))
          .as(s"x_${cols(i)}__${cols(j)}"))
    d.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** The exact moment-cell names [[partializeMoments]] emits for a
    * measure set, anchored on the unambiguous `ss_<c>` cells (only ever
    * produced for measures): `s_cnt`, `s_<c>`/`ss_<c>` per measure, and
    * `x_<a>__<b>` per measure pair present. A bare prefix test would
    * misclassify a KEY that happens to start with `s_` (e.g. TPC-H's
    * `s_suppkey`) as a moment cell and silently sum it.
    */
  private def momentCells(columns: Seq[String]): Seq[String] = {
    val measures = columns.filter(_.startsWith("ss_")).map(_.drop(3)).toSet
    val crosses = (for (a <- measures; b <- measures if a != b)
      yield s"x_${a}__$b").toSet
    columns.filter(c => c == "s_cnt" ||
      (c.startsWith("s_") && measures.contains(c.drop(2))) ||
      c.startsWith("ss_") || crosses.contains(c))
  }

  /** Merge cross-moment states (same keys, same column set): every
    * cell is an exact DECIMAL sum, so this is one group-by of sums —
    * bit-identical to having aggregated the union in one pass.
    */
  def mergeMoments(keys: Seq[String], states: DataFrame*): DataFrame = {
    require(states.nonEmpty, "need at least one state table")
    // moment cells by the partializeMoments convention, NOT "every
    // non-key column": a rollup to coarser keys (including the global
    // Seq.empty) must DROP the finer key columns, not try to sum them
    val momentCols = momentCells(states.head.columns.toIndexedSeq)
      .filterNot(keys.contains)
    states.map(_.select((keys ++ momentCols).map(col): _*))
      .reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(momentCols.head)).as(momentCols.head),
        momentCols.tail.map(c => sum(col(c)).as(c)): _*)
  }

  /** Read-side correlation matrix of a cross-moment state: long-format
    * (keys..., col_a, col_b, n, r) with the
    * [[graft.agg.Robust.corrMatrix]] formula — 9 dp pin, null on zero
    * variance. The state is checkpointed once and unfolded k(k−1)/2
    * times.
    */
  def finalizedCorr(state: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    val s = state.localCheckpoint(false)
    // keys = whatever is not an EXPECTED moment cell for this measure
    // set (exact names, not prefixes — a key named s_region must stay
    // a key; see momentCells)
    val cells = (Set("s_cnt") ++ cols.flatMap(c => Seq(s"s_$c", s"ss_$c"))
      ++ (for (i <- cols.indices; j <- (i + 1) until cols.size)
        yield s"x_${cols(i)}__${cols(j)}")).toSet
    val keys = s.columns.filterNot(cells.contains)
    val nD = col("s_cnt").cast("double")
    def varTerm(c: String) = col(s"ss_$c").cast("double") -
      col(s"s_$c").cast("double") * col(s"s_$c").cast("double") / nD
    (for (i <- cols.indices; j <- (i + 1) until cols.size) yield {
      val (a, b) = (cols(i), cols(j))
      val num = col(s"x_${a}__$b").cast("double") -
        col(s"s_$a").cast("double") * col(s"s_$b").cast("double") / nD
      val prod = varTerm(a) * varTerm(b)
      s.select(keys.toIndexedSeq.map(col) ++ Seq(
        lit(a).as("col_a"), lit(b).as("col_b"),
        col("s_cnt").as("n"),
        when(prod > 0, round(num / sqrt(prod), 9)).as("r")): _*)
    }).reduce(_ unionByName _)
  }
}
