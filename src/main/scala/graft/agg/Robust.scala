package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Robust (outlier-resistant) statistics — the feature-conditioning step
  * before a numeric column feeds training or anomaly baselines.
  */
object Robust {

  /** Per-group winsorized statistics: clip `valCol` to its group's
    * [pLo, pHi] exact percentiles, report clip counts and the clipped
    * sum/mean.
    *
    * Two-phase: one group-by computes the per-group percentile bounds
    * (|groups| rows), which broadcast-join back onto the rows for the
    * row-local clip, then one partial-agged group-by aggregates. The
    * clipped values are rounded to 6dp and DECIMAL-accumulated so the
    * sum is order-independent (hash-parity contract); the mean is one
    * IEEE double division. Exact `percentile` buffers a group's
    * distribution in the agg buffer — the oracle/testing form; swap
    * `percentile_approx` in at 100 TB (mergeable sketch, same shape).
    *
    * Null contract: nulls in `valCol` are excluded from the percentile
    * bounds, the clip counts, and the clipped sum/mean (the mean
    * divides by the non-null count); `n_rows` still counts every row.
    *
    * SCHEMA CHANGE (round 12): `clipped_sum` is now DECIMAL(28,6), not
    * double — the ×100 oracle sweep showed the old decimal→double cast
    * drifting by an ULP once the sum crosses 17 significant digits.
    * Callers that read it as DoubleType must update (in-repo callers
    * and the x_winsorize oracle now read it as decimal/string);
    * `clipped_mean` stays a 6dp-rounded double.
    */
  def winsorizedStats(df: DataFrame, groupCol: String, valCol: String,
                      pLo: Double, pHi: Double): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, "need 0 <= pLo < pHi <= 1")
    val bounds = df.groupBy(col(groupCol)).agg(
      expr(s"percentile($valCol, $pLo)").as("lo"),
      expr(s"percentile($valCol, $pHi)").as("hi"))
    // NULL-SAFE clip: greatest/least SKIP nulls (they return the
    // greatest non-null operand), so an unguarded clip would coerce a
    // null value to `lo` and silently inflate the sum — the isNotNull
    // gate keeps nulls null so the sum ignores them
    val clipped = df.join(broadcast(bounds), Seq(groupCol))
      .withColumn("_clip",
        when(col(valCol).isNotNull,
          least(greatest(col(valCol), col("lo")), col("hi"))))
    clipped.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_rows"),
        // mean divides by the NON-null count: null values contribute
        // nothing to clipped_sum (least/greatest propagate null, sum
        // skips it), so n_rows would bias the mean low under nulls
        count(col(valCol)).as("_nv"),
        sum(when(col(valCol) < col("lo"), 1L).otherwise(0L))
          .as("n_clipped_lo"),
        sum(when(col(valCol) > col("hi"), 1L).otherwise(0L))
          .as("n_clipped_hi"),
        min(col("lo")).as("lo"), min(col("hi")).as("hi"),
        // the sum STAYS exact decimal: at ×100 data it crosses 17
        // significant digits, where a decimal→double cast is allowed
        // to differ by an ULP between engines (caught by the round-12
        // ×100 oracle sweep) — emitting the decimal keeps it exact at
        // any scale; only the mean takes the one IEEE division, and
        // 6 dp rounding ends its low-bit lottery (Profile convention)
        sum(round(col("_clip"), 6).cast(DecimalType(28, 6)))
          .as("clipped_sum"))
      .withColumn("clipped_mean",
        round(col("clipped_sum").cast("double") /
          col("_nv").cast("double"), 6))
      .drop("_nv")
  }

  /** Per-group Tukey box-plot statistics — the README's box-plot visual
    * (`/root/reference/README.md:15`; the quartile machinery the five
    * shipped charts in `streamlit_app.py:108-152` stop short of):
    * quartiles, IQR fences at 1.5×IQR, whiskers as the extreme data
    * points INSIDE the fences (Tukey's definition — not the fences
    * themselves), and the outlier count.
    *
    * Same two-phase shape as [[winsorizedStats]]: a |groups|-row exact
    * `percentile` aggregate broadcast-joins back for one row-local
    * fence pass. Fence arithmetic is *,-,+ on doubles — exact-rounded
    * IEEE, so bit-portable across engines (the hash-parity contract);
    * exact `percentile` is the oracle/test form whose agg-buffer cost
    * is the value domain, so group over low-cardinality measures (the
    * `x_percentiles` lesson) or swap `approx_percentile` at 100 TB.
    */
  def boxplotStats(df: DataFrame, groupCol: String,
                   valCol: String): DataFrame = {
    val v = col(valCol)
    val bounds = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valCol, array(0.25, 0.5, 0.75))").as("q"))
      .select(col(groupCol),
        element_at(col("q"), 1).as("q1"),
        element_at(col("q"), 2).as("median"),
        element_at(col("q"), 3).as("q3"))
      .withColumn("fence_lo",
        col("q1") - (col("q3") - col("q1")) * 1.5)
      .withColumn("fence_hi",
        col("q3") + (col("q3") - col("q1")) * 1.5)
    df.join(broadcast(bounds), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(count(v).as("n_rows"),
        min(col("q1")).as("q1"), min(col("median")).as("median"),
        min(col("q3")).as("q3"),
        min(when(v >= col("fence_lo"), v)).as("whisker_lo"),
        max(when(v <= col("fence_hi"), v)).as("whisker_hi"),
        sum(when(v < col("fence_lo") || v > col("fence_hi"), 1L)
          .otherwise(0L)).as("n_outliers"))
      .orderBy(col(groupCol))
  }

  /** Exact LOWER weighted median per group: the smallest value whose
    * cumulative weight reaches half the group's total — the
    * interpolation-free convention, so the answer is an exact integer
    * rule over exact integer weights (engine-portable with no float
    * anywhere; an interpolated weighted median has no cross-engine
    * contract). The robust center for weighted data — ratings weighted
    * by volume, prices weighted by quantity — where a weighted MEAN
    * follows the heavy rows.
    *
    * Shape: collapse to one row per (group, value) with summed weights
    * (the only data-sized shuffle, map-side combined), then a per-group
    * cumulative window over |distinct values| rows and a min-aggregate
    * of the qualifying values. Skew = a hot group's distinct-value
    * list; bounded domains (prices, ratings) keep it small.
    */
  /** Jackknife standard error of the per-group mean (Tukey's
    * leave-one-out): SE² = (n−1)/n · Σᵢ (x̄₋ᵢ − x̄)² — the variance
    * estimate that needs no distributional assumption and, unlike the
    * Poisson bootstrap (`Sampling.poissonBootstrap`), no replicate
    * fan-out: every leave-one-out mean is ROW-LOCAL once the group's
    * exact decimal sum broadcasts back ((S−xᵢ)/(n−1)), so the whole
    * estimator is one aggregate + one joined scan. Terms pin at 9 dp
    * into exact decimal sums (order-independent); SE rounds to 6 dp.
    * Values are treated at 2 dp (the money convention).
    */
  def jackknifeSE(df: DataFrame, groupCol: String,
                  valCol: String): DataFrame = {
    val x = col(valCol).cast(DecimalType(18, 2))
    val stats = df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"), sum(x).as("__s"))
      .withColumn("__mean",
        col("__s").cast("double") / col("__n").cast("double"))
    df.filter(col(valCol).isNotNull)
      .join(broadcast(stats), Seq(groupCol))
      .withColumn("__loo",
        (col("__s") - x).cast("double") /
          (col("__n") - 1).cast("double"))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"), max(col("__mean")).as("mean"),
        sum(round((col("__loo") - col("__mean")) *
          (col("__loo") - col("__mean")), 9).cast(DecimalType(28, 9)))
          .as("__ss"))
      .select(col(groupCol), col("n"), col("mean"),
        round(sqrt((col("n") - 1).cast("double") /
          col("n").cast("double") * col("__ss").cast("double")), 6)
          .as("jk_se"))
  }

  /** Robust scaler per group: (v − median) / IQR — the outlier-immune
    * standardization ([[graft.ext.Classifier.fitScaler]]'s z-score
    * follows the tail that robust scaling ignores). Exact interpolating
    * percentiles fitted per group, broadcast back; the transform is
    * row-local. A zero IQR (constant-ish group) yields null scaled
    * values rather than an infinity — callers gate on it explicitly.
    */
  def robustScale(df: DataFrame, groupCol: String,
                  valCol: String): DataFrame = {
    val stats = df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(expr(s"percentile($valCol, 0.5)").as("__med"),
        (expr(s"percentile($valCol, 0.75)") -
          expr(s"percentile($valCol, 0.25)")).as("__iqr"))
    df.join(broadcast(stats), Seq(groupCol), "left")
      .withColumn(s"${valCol}_scaled",
        when(col("__iqr") =!= 0.0,
          (col(valCol) - col("__med")) / col("__iqr")))
      .drop("__med", "__iqr")
  }

  /** Theil-Sen robust trend per group: slope = median of all pairwise
    * slopes (v_b−v_a)/(t_b−t_a), intercept = median of (v − slope·t) —
    * up to 29 % contamination tolerated where OLS (`regr_slope`)
    * follows a single corrupted day. The pair join is O(n²) per group
    * BY DEFINITION — use on bounded series (daily aggregates:
    * 365 days → 66 k pairs), never raw events; the equi-join on the
    * group key is the only shuffle and medians are exact interpolating
    * percentiles (bit-matched cross-engine in `x_percentiles`).
    */
  def theilSen(df: DataFrame, groupCol: String, tickCol: String,
               valCol: String): DataFrame = {
    val base = df
      .filter(col(tickCol).isNotNull && col(valCol).isNotNull)
      .select(col(groupCol), col(tickCol).cast("long").as("__t"),
        col(valCol).cast("double").as("__v"))
      // referenced by both pair sides AND the residual pass — without
      // a barrier the upstream aggregate runs three times
      .localCheckpoint(false)
    val a = base.select(col(groupCol), col("__t").as("__ta"),
      col("__v").as("__va"))
    val b = base.select(col(groupCol), col("__t").as("__tb"),
      col("__v").as("__vb"))
    val slopes = a.join(b, Seq(groupCol))
      .filter(col("__ta") < col("__tb"))
      .select(col(groupCol),
        ((col("__vb") - col("__va")) /
          (col("__tb") - col("__ta")).cast("double")).as("__s"))
      .groupBy(col(groupCol))
      .agg(expr("percentile(__s, 0.5)").as("slope"),
        count(lit(1)).as("n_pairs"))
    base.join(broadcast(slopes), Seq(groupCol))
      .select(col(groupCol), col("slope"), col("n_pairs"),
        (col("__v") - col("slope") * col("__t").cast("double"))
          .as("__r"))
      .groupBy(col(groupCol), col("slope"), col("n_pairs"))
      .agg(expr("percentile(__r, 0.5)").as("intercept"))
      .select(col(groupCol), col("slope"), col("intercept"),
        col("n_pairs"))
  }

  /** Exact Gini coefficient per group (Lorenz-curve inequality of a
    * non-negative quantity): G = Σᵢ (2i − n − 1)·x₍ᵢ₎ / (n·Σx) over
    * the ascending sort — revenue concentration, data-skew scoring,
    * fairness audits. Entirely exact until one final IEEE division:
    * values pin to DECIMAL(18,2), rank coefficients are integers, and
    * tie blocks contribute the same sum under any permutation, so the
    * statistic is deterministic on any engine and any partitioning.
    * One by-key sort window + one aggregate; a group's rows pass
    * through a single task's sort (the per-key series bound).
    */
  def gini(df: DataFrame, groupCol: String, valCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valCol).cast(DecimalType(18, 2))
    val byKey = Window.partitionBy(col(groupCol))
    val w = byKey.orderBy(col(valCol))
    df.filter(col(valCol).isNotNull)
      .withColumn("__i", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(byKey))
      .groupBy(col(groupCol))
      .agg(max(col("__n")).as("n"),
        sum((col("__i") * 2 - col("__n") - 1) * v).as("__num"),
        sum(v).as("__tot"))
      .select(col(groupCol), col("n"),
        // 9 dp: numerator and denominator are exact decimals, but at
        // ×100 data they cross 17 significant digits and their double
        // casts can differ by an ULP between engines (round-12 ×100
        // sweep find) — rounding the one IEEE ratio (∈ [0,1]) ends
        // the low-bit lottery at far-above-ULP precision
        round(col("__num").cast("double") /
          (col("n") * col("__tot")).cast("double"), 9).as("gini"))
  }

  /** Full Pearson correlation matrix of `cols` in ONE scan: a single
    * aggregate emits n, per-column Σx / Σx² and all k(k−1)/2 cross
    * sums Σxy as exact DECIMAL accumulations (quantized to 4 dp —
    * order-free under any partitioning, unlike the built-in `corr`'s
    * float recurrences), then every pairwise r unfolds row-locally
    * from the checkpointed 1-row moment table:
    *   r = (Σxy − ΣxΣy/n) / √((Σx²−Σx²/n)(Σy²−Σy²/n)), 9 dp pin.
    * k² arithmetic on ONE row vs k² built-in corr calls that each
    * carry their own moment state — same single scan, deterministic
    * output. Complete-case semantics: rows with any null column drop.
    * A zero-variance column yields null r against everything.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need >= 2 columns, got ${cols.size}")
    val d = df
      .filter(cols.map(col(_).isNotNull).reduce(_ && _))
      .select(cols.map(c =>
        col(c).cast(DecimalType(18, 4)).as(c)): _*)
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (i, j)
    val aggs = (count(lit(1)).as("__n") +:
      cols.map(c => sum(col(c)).cast("double").as(s"__s_$c"))) ++
      cols.map(c => sum((col(c) * col(c)).cast(DecimalType(38, 8)))
        .cast("double").as(s"__ss_$c")) ++
      pairs.map { case (i, j) =>
        sum((col(cols(i)) * col(cols(j))).cast(DecimalType(38, 8)))
          .cast("double").as(s"__x_${i}_$j") }
    val m = d.agg(aggs.head, aggs.tail: _*)
      .localCheckpoint(false) // one row, unfolded k(k-1)/2 times
    val nD = col("__n").cast("double")
    def varTerm(c: String) =
      col(s"__ss_$c") - col(s"__s_$c") * col(s"__s_$c") / nD
    pairs.map { case (i, j) =>
      val (a, b) = (cols(i), cols(j))
      val num = col(s"__x_${i}_$j") - col(s"__s_$a") * col(s"__s_$b") / nD
      val prod = varTerm(a) * varTerm(b)
      m.select(lit(a).as("col_a"), lit(b).as("col_b"),
        col("__n").as("n"),
        when(prod > 0, round(num / sqrt(prod), 9)).as("r"))
    }.reduce(_ unionByName _)
  }

  /** Weights are an INTEGRAL contract: each weight is rounded half-up
    * to a long before use, and rows whose rounded weight is 0 drop
    * (a raw `cast("long")` would let 0.6 pass a `> 0` filter yet
    * truncate to 0 — a group of all-sub-unit weights then degenerates
    * to returning its min value).
    */
  def weightedMedian(df: DataFrame, groupCol: String, valCol: String,
                     weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grouped = df
      .filter(col(valCol).isNotNull && col(weightCol).isNotNull)
      .withColumn("__wi", round(col(weightCol)).cast("long"))
      .filter(col("__wi") > 0)
      .groupBy(col(groupCol), col(valCol).as("__v"))
      .agg(sum(col("__wi")).as("__w"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__v"))
    val all = Window.partitionBy(col(groupCol))
    grouped
      .withColumn("__cum",
        sum(col("__w")).over(w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)))
      .withColumn("__tot", sum(col("__w")).over(all))
      .filter(col("__cum") * 2 >= col("__tot"))
      .groupBy(col(groupCol))
      .agg(min(col("__v")).as("weighted_median"))
  }
}
