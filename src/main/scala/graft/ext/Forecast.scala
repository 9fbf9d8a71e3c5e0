package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequential per-key recurrences — the operator class windows cannot
  * express: each output depends on the PREVIOUS output, not a frame of
  * inputs (exponential smoothing, Holt's linear trend; the classical
  * forecasting baselines next to `x_forecast_ma`'s moving average).
  *
  * Spark-first shape: the recurrence is a FOLD, and Spark's
  * higher-order `aggregate` IS a fold — so each key's series is
  * gathered once (`collect_list` + `array_sort`, one shuffle at
  * (key)-grain), folded row-locally in a single pass, and exploded
  * back. No driver loop, no iterative jobs, no window at all; the
  * whole recurrence runs inside one projection. Memory bound: one
  * key's series as an array — the same per-key bound sessionization
  * and `session_window` already accept; keys parallelize across the
  * cluster (the skew bound is the longest single series).
  *
  * Determinism: the fold applies exactly-rounded IEEE ops in series
  * order, so results are bit-identical on any engine that applies the
  * same ops in the same order (the DuckDB oracle's recursive CTE
  * does); with dyadic-rational smoothing constants (0.5, 0.25) every
  * multiply is exact-by-halving on top.
  */
object Forecast {

  /** Holt's linear-trend smoothing per key:
    * {{{
    *   l_0 = x_0,  b_0 = 0,  fit_0 = null
    *   fit_t = l_{t-1} + b_{t-1}                       (1-step forecast)
    *   l_t   = α·x_t + (1-α)·fit_t
    *   b_t   = β·(l_t - l_{t-1}) + (1-β)·b_{t-1}
    * }}}
    * Returns one row per input row: (keys..., tick, value, level,
    * trend, fit) in tick order. `α = β = 0` degrades to a frozen
    * level; `β = 0` is plain EWMA with a dead trend.
    */
  def holtLinear(df: DataFrame, keyCols: Seq[String], tickCol: String,
                 valueCol: String, alpha: Double, beta: Double): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column (scale: " +
      "a key-free call folds the whole table through one task)")
    require(alpha >= 0 && alpha <= 1, s"alpha in [0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta in [0,1], got $beta")
    val series = df
      .groupBy(keyCols.map(col): _*)
      .agg(array_sort(collect_list(struct(
        col(tickCol).cast("long").as("tick"),
        col(valueCol).cast("double").as("x")))).as("__series"))
    // fold state: (l, b, started, out[])
    val init = struct(
      lit(0.0).as("l"), lit(0.0).as("b"), lit(false).as("started"),
      array().cast("array<struct<tick:bigint,x:double,level:double," +
        "trend:double,fit:double>>").as("out"))
    val step = (acc: Column, e: Column) => {
      val first = struct(
        e.getField("x").as("l"), lit(0.0).as("b"),
        lit(true).as("started"),
        array(struct(e.getField("tick").as("tick"),
          e.getField("x").as("x"),
          e.getField("x").as("level"), lit(0.0).as("trend"),
          lit(null).cast("double").as("fit"))).as("out"))
      val fit = acc.getField("l") + acc.getField("b")
      val newL = lit(alpha) * e.getField("x") + lit(1 - alpha) * fit
      val newB = lit(beta) * (newL - acc.getField("l")) +
        lit(1 - beta) * acc.getField("b")
      val rest = struct(
        newL.as("l"), newB.as("b"), lit(true).as("started"),
        array_append(acc.getField("out"),
          struct(e.getField("tick").as("tick"), e.getField("x").as("x"),
            newL.as("level"), newB.as("trend"), fit.as("fit"))).as("out"))
      when(acc.getField("started"), rest).otherwise(first)
    }
    val folded = series.withColumn("__out",
      aggregate(col("__series"), init, step, acc => acc.getField("out")))
    folded
      .select(keyCols.map(col) :+ explode(col("__out")).as("__e"): _*)
      .select(keyCols.map(col) ++ Seq(
        col("__e.tick").as(tickCol), col("__e.x").as(valueCol),
        col("__e.level").as("level"), col("__e.trend").as("trend"),
        col("__e.fit").as("fit")): _*)
  }

  /** Plain EWMA (simple exponential smoothing): [[holtLinear]] with a
    * dead trend — kept as its own entry point because it is the form
    * drift monitors and metrics pipelines reach for.
    */
  def ewma(df: DataFrame, keyCols: Seq[String], tickCol: String,
           valueCol: String, alpha: Double): DataFrame =
    holtLinear(df, keyCols, tickCol, valueCol, alpha, beta = 0.0)
      .drop("trend")
      .withColumnRenamed("level", "ewma")
}
