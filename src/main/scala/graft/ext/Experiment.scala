package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Experimentation-analysis operators beyond the plain z test
  * (`x_ab_test`) / rank-sum (`x_mann_whitney`) / SPRT (`x_sprt`) tier:
  * variance reduction and shrinkage — the techniques a large
  * experimentation platform applies before anyone reads a p-value.
  *
  * Scale shape shared by both: exact DECIMAL accumulation for every
  * cross-row sum (order-free, engine-portable), 1-row broadcast of the
  * fitted scalars, row-local adjustment, and re-aggregation of the
  * adjusted values pinned to 9 dp before summing (an IEEE double sum
  * over rows would be accumulation-order-dependent; a 9 dp DECIMAL sum
  * is exact under any partitioning).
  */
object Experiment {

  /** CUPED (Controlled-experiment Using Pre-Experiment Data — Deng et
    * al., WSDM'13): reduce metric variance with a pre-period covariate,
    *   Y' = Y − θ·(X − E[X]),   θ = cov(X, Y) / var(X),
    * leaving every treatment-effect estimate unbiased (θ·(X−E[X]) has
    * mean 0 and is treatment-independent when X predates assignment)
    * while shrinking variance by the squared X-Y correlation — often
    * the difference between a 2-week and a 6-week experiment.
    *
    * Input: one row per unit with (unitCol, variantCol, xCol pre-metric,
    * yCol post-metric). θ is fitted POOLED over all units (the standard
    * form — a per-variant θ would re-introduce bias). Output one row
    * per variant: n, mean_y, mean_y_adj, var_y, var_y_adj,
    * var_reduction (1 − var'/var).
    *
    * Shape: one DECIMAL moment aggregate (Σx, Σy, Σxy, Σx², n) → 1-row
    * broadcast θ/E[X]; row-local adjustment; per-variant aggregate of
    * 9 dp-pinned adjusted values. Two passes over the unit table, no
    * window, no data-sized broadcast.
    */
  def cuped(df: DataFrame, variantCol: String, xCol: Column,
            yCol: Column): DataFrame = {
    val d = df.select(col(variantCol).as("__v"),
        xCol.cast(DecimalType(18, 4)).as("__x"),
        yCol.cast(DecimalType(18, 4)).as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      .localCheckpoint(false) // moments + the adjusted re-aggregation
    val moments = d.agg(
      count(lit(1)).as("__n"),
      sum(col("__x")).cast("double").as("__sx"),
      sum(col("__y")).cast("double").as("__sy"),
      sum((col("__x") * col("__y")).cast(DecimalType(38, 8)))
        .cast("double").as("__sxy"),
      sum((col("__x") * col("__x")).cast(DecimalType(38, 8)))
        .cast("double").as("__sxx"))
    val nD = col("__n").cast("double")
    // zero-variance covariate → θ = 0/0 = NaN, which would propagate
    // through __yadj and the DECIMAL casts would silently null the
    // adjusted sums; a constant X carries no information, so fall back
    // to θ = 0 (no adjustment — Y' = Y, var_reduction = 0), mirroring
    // ebShrinkRates' degenerate-prior passthrough
    val varX = col("__sxx") - col("__sx") * col("__sx") / nD
    val theta = when(varX > 0,
      (col("__sxy") - col("__sx") * col("__sy") / nD) / varX)
      .otherwise(lit(0.0))
    val pinned = moments.select(col("__n"),
      round(theta, 9).as("__theta"),
      round(col("__sx") / nD, 9).as("__mx"))
    val adj = d.crossJoin(broadcast(pinned))
      .withColumn("__yadj", round(col("__y").cast("double") -
        col("__theta") * (col("__x").cast("double") - col("__mx")), 9))
    adj.groupBy(col("__v").as(variantCol))
      .agg(count(lit(1)).as("n"),
        sum(col("__y")).cast("double").as("__vsy"),
        sum((col("__y") * col("__y")).cast(DecimalType(38, 8)))
          .cast("double").as("__vsyy"),
        sum(col("__yadj").cast(DecimalType(28, 9))).cast("double")
          .as("__vsa"),
        // round BEFORE the decimal cast: a bare double→DECIMAL cast of
        // an arbitrary product rounds differently per engine at ~1e-10
        // (the seasonal_decompose measurement); round() snaps to a
        // double both engines cast identically
        sum(round(col("__yadj") * col("__yadj"), 9)
          .cast(DecimalType(38, 9))).cast("double").as("__vsaa"))
      .select(col(variantCol), col("n"),
        (col("__vsy") / col("n")).as("mean_y"),
        (col("__vsa") / col("n")).as("mean_y_adj"),
        ((col("__vsyy") - col("__vsy") * col("__vsy") / col("n")) /
          (col("n") - 1)).as("var_y"),
        ((col("__vsaa") - col("__vsa") * col("__vsa") / col("n")) /
          (col("n") - 1)).as("var_y_adj"))
      .withColumn("var_reduction",
        lit(1.0) - col("var_y_adj") / col("var_y"))
  }

  /** Empirical-Bayes (beta-binomial, method of moments) shrinkage of
    * per-key success RATES — the fix for "rank items by rate" when
    * small-n keys dominate the extremes (a 1/1 part should not outrank
    * a 96/100 part): fit Beta(α, β) to the observed per-key rates,
    *   K = m(1−m)/v − 1,  α = mK,  β = (1−m)K,
    * then shrink each key toward the prior mean by its own evidence:
    * p̂ = (s + α)/(n + α + β) — keys with small n collapse to m, keys
    * with large n keep their data.
    *
    * Shape: one group-by to |keys| rows; prior moments from 9 dp-pinned
    * per-key rates summed in exact DECIMAL (order-free); 1-row
    * broadcast of (α, β); shrinkage row-local. Requires var > 0 and
    * within the binomial bound (a degenerate prior emits null α/β and
    * passes raw rates through).
    */
  def ebShrinkRates(df: DataFrame, keyCol: String,
                    successCol: Column): DataFrame = {
    val perKey = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(successCol.cast("long")).as("s"))
      .withColumn("p_raw", round(
        col("s").cast("double") / col("n").cast("double"), 9))
      .localCheckpoint(false) // prior moments + the shrinkage pass
    val prior = perKey.agg(
        count(lit(1)).as("__k"),
        sum(col("p_raw").cast(DecimalType(28, 9))).cast("double")
          .as("__sp"),
        // round before cast — see cuped's __vsaa note
        sum(round(col("p_raw") * col("p_raw"), 9)
          .cast(DecimalType(38, 9))).cast("double").as("__spp"))
      .select(col("__k"),
        (col("__sp") / col("__k")).as("__m"),
        ((col("__spp") - col("__sp") * col("__sp") / col("__k")) /
          (col("__k") - 1)).as("__var"))
      .select(col("__m"), col("__var"),
        when(col("__var") > 0 &&
            col("__m") * (lit(1.0) - col("__m")) > col("__var"),
          round(col("__m") * (col("__m") * (lit(1.0) - col("__m")) /
            col("__var") - 1), 9)).as("__alpha"),
        when(col("__var") > 0 &&
            col("__m") * (lit(1.0) - col("__m")) > col("__var"),
          round((lit(1.0) - col("__m")) *
            (col("__m") * (lit(1.0) - col("__m")) /
              col("__var") - 1), 9)).as("__beta"))
    perKey.crossJoin(broadcast(prior))
      .select(col(keyCol), col("n"), col("s"), col("p_raw"),
        round(col("__alpha"), 9).as("alpha"),
        round(col("__beta"), 9).as("beta"),
        when(col("__alpha").isNotNull,
          round((col("s").cast("double") + col("__alpha")) /
            (col("n").cast("double") + col("__alpha") + col("__beta")),
            9))
          .otherwise(col("p_raw")).as("p_shrunk"))
  }
}
