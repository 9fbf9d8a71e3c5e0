package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Sequential per-key recurrences — the operator class windows cannot
  * express: each output depends on the PREVIOUS output, not a frame of
  * inputs (exponential smoothing, Holt's linear trend; the classical
  * forecasting baselines next to `x_forecast_ma`'s moving average).
  *
  * Spark-first shape — the secondary-sort scan: repartition by key,
  * `sortWithinPartitions(key, tick)`, then ONE streaming pass per
  * partition carrying O(1) state per live key (this is the brief's
  * "mapPartitions for genuine per-partition imperative logic" tier —
  * a recurrence is exactly that). One shuffle, no arrays, no
  * iterative jobs; series length is unbounded because nothing gathers
  * a series in memory. The declarative alternative — fold the
  * collected series through the higher-order `aggregate` — is
  * semantically identical but builds the output array by immutable
  * append, O(|series|²) copying per key: measured 1.0-1.1 s vs this
  * scan's 0.65 s on the sf0.1 daily-revenue series (~2.1 k steps per
  * key), and diverging quadratically with series length. The scan is
  * the 100 TB form.
  *
  * Determinism: the scan applies exactly-rounded IEEE ops in series
  * order, so results are bit-identical on any engine applying the
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
    * trend, fit) in tick order. `β = 0` is plain EWMA with a dead
    * trend ([[ewma]]). Input must be at (keys, tick) grain; duplicate
    * ticks would make the visit order — and thus the recurrence —
    * depend on sort stability.
    */
  def holtLinear(df: DataFrame, keyCols: Seq[String], tickCol: String,
                 valueCol: String, alpha: Double, beta: Double): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column (scale: " +
      "a key-free call scans the whole table through one task)")
    require(alpha >= 0 && alpha <= 1, s"alpha in [0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta in [0,1], got $beta")
    val nk = keyCols.size
    val prepared = df
      .select(keyCols.map(col) ++ Seq(
        col(tickCol).cast("long").as(tickCol),
        col(valueCol).cast("double").as(valueCol)): _*)
      // observations only: a null tick has no place in the order, a
      // null value has no defined recurrence step
      .filter(col(tickCol).isNotNull && col(valueCol).isNotNull)
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols :+ tickCol).map(col): _*)
    val keyFields = keyCols.map(c => prepared.schema(c))
    val outSchema = StructType(keyFields ++ Seq(
      StructField(tickCol, LongType, nullable = false),
      StructField(valueCol, DoubleType, nullable = true),
      StructField("level", DoubleType, nullable = true),
      StructField("trend", DoubleType, nullable = true),
      StructField("fit", DoubleType, nullable = true)))
    prepared.mapPartitions { it =>
      // O(1) state: the partition is sorted by (key, tick), so a key
      // change resets the recurrence — no per-key map, no buffering
      var curKey: Seq[Any] = null
      var l = 0.0; var b = 0.0
      it.map { row =>
        val key = (0 until nk).map(row.get)
        val tick = row.getLong(nk)
        val x = row.getDouble(nk + 1)
        if (key != curKey) {
          curKey = key
          l = x; b = 0.0
          // Seq[Any], not Seq(...): mixed Long/Double literals harmonize
          // to Seq[Double] and would silently widen the tick
          Row.fromSeq(key ++ Seq[Any](tick, x, l, b, null))
        } else {
          val fit = l + b
          val nl = alpha * x + (1 - alpha) * fit
          val nb = beta * (nl - l) + (1 - beta) * b
          l = nl; b = nb
          Row.fromSeq(key ++ Seq[Any](tick, x, nl, nb, fit))
        }
      }
    }(Encoders.row(outSchema))
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

  /** Holt-Winters ADDITIVE seasonal smoothing per key (period `m`):
    * {{{
    *   t = 0:  l = x_0, b = 0, s[*] = 0, fit = null
    *   t ≥ 1:  i = t mod m
    *     fit_t = l + b + s[i]
    *     l_t   = α·(x_t - s[i]) + (1-α)·(l + b)
    *     b_t   = β·(l_t - l) + (1-β)·b
    *     s[i]  = γ·(x_t - l_t) + (1-γ)·s[i]
    * }}}
    * Zero-seeded seasonal state (the level absorbs the first cycle;
    * production code warm-starts from a reference period — pass the
    * recurrence the same way). State per live key is O(m) — the ring
    * of seasonal components — still constant w.r.t. series length;
    * same secondary-sort scan, same bit-portability (the oracle's
    * recursive CTE carries the seasonal ring as a list and applies
    * the identical in-order IEEE ops).
    * Returns (keys..., tick, value, level, trend, seasonal, fit).
    */
  def holtWinters(df: DataFrame, keyCols: Seq[String], tickCol: String,
                  valueCol: String, m: Int, alpha: Double, beta: Double,
                  gamma: Double): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(m >= 1, s"season length must be >= 1, got $m")
    require(alpha >= 0 && alpha <= 1, s"alpha in [0,1], got $alpha")
    require(beta >= 0 && beta <= 1, s"beta in [0,1], got $beta")
    require(gamma >= 0 && gamma <= 1, s"gamma in [0,1], got $gamma")
    val nk = keyCols.size
    val prepared = df
      .select(keyCols.map(col) ++ Seq(
        col(tickCol).cast("long").as(tickCol),
        col(valueCol).cast("double").as(valueCol)): _*)
      .filter(col(tickCol).isNotNull && col(valueCol).isNotNull)
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols :+ tickCol).map(col): _*)
    val keyFields = keyCols.map(c => prepared.schema(c))
    val outSchema = StructType(keyFields ++ Seq(
      StructField(tickCol, LongType, nullable = false),
      StructField(valueCol, DoubleType, nullable = true),
      StructField("level", DoubleType, nullable = true),
      StructField("trend", DoubleType, nullable = true),
      StructField("seasonal", DoubleType, nullable = true),
      StructField("fit", DoubleType, nullable = true)))
    prepared.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var l = 0.0; var b = 0.0; var t = 0L
      var s: Array[Double] = null
      it.map { row =>
        val key = (0 until nk).map(row.get)
        val tick = row.getLong(nk)
        val x = row.getDouble(nk + 1)
        if (key != curKey) {
          curKey = key
          l = x; b = 0.0; t = 0L; s = new Array[Double](m)
          Row.fromSeq(key ++ Seq[Any](tick, x, l, b, 0.0, null))
        } else {
          t += 1
          val i = (t % m).toInt
          val si = s(i)
          val fit = l + b + si
          val nl = alpha * (x - si) + (1 - alpha) * (l + b)
          val nb = beta * (nl - l) + (1 - beta) * b
          val ns = gamma * (x - nl) + (1 - gamma) * si
          l = nl; b = nb; s(i) = ns
          Row.fromSeq(key ++ Seq[Any](tick, x, nl, nb, ns, fit))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Tabular CUSUM changepoint detection per key (Page 1954):
    * {{{
    *   S⁺_t = max(0, S⁺_{t-1} + (x_t - target - slack))
    *   S⁻_t = max(0, S⁻_{t-1} + (target - x_t - slack))
    *   alarm_t = S⁺_t > h  ∨  S⁻_t > h
    * }}}
    * — the sequential drift detector a mean-shift hides from
    * point-in-time z-scores (each day can stay within bounds while the
    * cumulative excess grows without limit). `targetCol` / `slackCol` /
    * `thresholdCol` ride the rows so callers supply per-key baselines
    * (typically a reference-period mean and fractions of it); same
    * secondary-sort scan, O(1) state, same bit-portability argument as
    * [[holtLinear]].
    * Returns (keys..., tick, value, cusum_pos, cusum_neg, alarm).
    */
  def cusum(df: DataFrame, keyCols: Seq[String], tickCol: String,
            valueCol: String, targetCol: String, slackCol: String,
            thresholdCol: String): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    val nk = keyCols.size
    val prepared = df
      .select(keyCols.map(col) ++ Seq(
        col(tickCol).cast("long").as(tickCol),
        col(valueCol).cast("double").as(valueCol),
        col(targetCol).cast("double").as(targetCol),
        col(slackCol).cast("double").as(slackCol),
        col(thresholdCol).cast("double").as(thresholdCol)): _*)
      .filter(col(tickCol).isNotNull && col(valueCol).isNotNull &&
        col(targetCol).isNotNull && col(slackCol).isNotNull &&
        col(thresholdCol).isNotNull)
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols :+ tickCol).map(col): _*)
    val keyFields = keyCols.map(c => prepared.schema(c))
    val outSchema = StructType(keyFields ++ Seq(
      StructField(tickCol, LongType, nullable = false),
      StructField(valueCol, DoubleType, nullable = true),
      StructField("cusum_pos", DoubleType, nullable = false),
      StructField("cusum_neg", DoubleType, nullable = false),
      StructField("alarm", BooleanType, nullable = false)))
    prepared.mapPartitions { it =>
      var curKey: Seq[Any] = null
      var sp = 0.0; var sn = 0.0
      it.map { row =>
        val key = (0 until nk).map(row.get)
        val tick = row.getLong(nk)
        val x = row.getDouble(nk + 1)
        val target = row.getDouble(nk + 2)
        val slack = row.getDouble(nk + 3)
        val h = row.getDouble(nk + 4)
        if (key != curKey) { curKey = key; sp = 0.0; sn = 0.0 }
        sp = math.max(0.0, sp + (x - target - slack))
        sn = math.max(0.0, sn + (target - x - slack))
        Row.fromSeq(key ++ Seq[Any](tick, x, sp, sn, sp > h || sn > h))
      }
    }(Encoders.row(outSchema))
  }

  /** Per-key isotonic regression (pool-adjacent-violators): the least-
    * squares MONOTONE fit of `valueCol` against the tick order — the
    * proper calibration map for classifier scores (Zadrozny & Elkan),
    * monotone dose/response curves, trend flooring. Output one row per
    * input row: (keys..., tick, value, iso_fit) with iso_fit
    * non-decreasing in tick within every key.
    *
    * Same secondary-sort scan as the smoothers, but PAV is not a
    * forward recurrence — fitted values change retroactively when a
    * violating pool merges — so the pass buffers ONE KEY's pools at a
    * time (state ∝ rows of the largest single key, the same bound as
    * any per-key sessionization; keys stream through the partition one
    * after another).
    *
    * Determinism contract: values quantize to integers
    * (round(value·scale)), pool means are exact rationals compared by
    * Long cross-multiplication — no float in any DECISION — and the
    * emitted fit is one correctly-rounded IEEE division
    * sum/(n·scale). By PAV's minimax characterization
    * fit_i = max_{j≤i} min_{k≥i} mean(y_j..y_k), which an oracle can
    * re-derive in O(n³) SQL from the same quantized prefix sums —
    * monotone rounding makes double max/min equal the rounded exact
    * optimum, so the match is bit-exact. Cross-products stay in Long:
    * |Σy·scale| < 2^42 and counts < 2^20 at any plausible key size.
    *
    * `(keys, tick)` must be unique (pre-aggregate duplicates): tied
    * ticks would make the pool order sort-unstable.
    */
  /** Autocorrelation function per key: the standard biased ACF
    * r_l = Σ_t (x_t−μ)(x_{t−l}−μ) / Σ_t (x_t−μ)² for lags 1..maxLag —
    * THE diagnostic that tells a forecaster which of this family's
    * tools fits (slow decay → trend, spikes at the period → seasonal,
    * nothing → noise). One by-key window pass materializes all lag
    * columns, a row-local stack turns them into (lag, term) rows, one
    * group-by sums. Portability: every product term and squared
    * deviation is pinned at 9 dp into exact decimal sums (order-
    * independent — the repo's arbitrary-double summation convention),
    * final ratios rounded to 6 dp.
    */
  def autocorrelation(df: DataFrame, keyCols: Seq[String],
                      tickCol: String, valueCol: String,
                      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    require(keyCols.nonEmpty, "need at least one key column")
    import org.apache.spark.sql.expressions.Window
    val base = df.select(keyCols.map(col) ++ Seq(col(tickCol),
        col(valueCol).cast("double").as("__x")): _*)
      .filter(col("__x").isNotNull)
    val stats = base.groupBy(keyCols.map(col): _*)
      .agg((sum(col("__x").cast(DecimalType(18, 2))).cast("double") /
        count(lit(1)).cast("double")).as("__mu"),
        count(lit(1)).as("n_obs"))
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tickCol))
    val withLags = (1 to maxLag).foldLeft(
      base.join(broadcast(stats), keyCols)) { (acc, l) =>
      acc.withColumn(s"__l$l", lag(col("__x"), l).over(w))
    }
    val den = withLags.groupBy(keyCols.map(col): _*)
      .agg(sum(round((col("__x") - col("__mu")) *
        (col("__x") - col("__mu")), 9).cast(DecimalType(28, 9)))
        .as("__den"))
    withLags
      .select(keyCols.map(col) ++ Seq(col("__mu"), col("n_obs"),
        col("__x"),
        explode(array((1 to maxLag).map(l =>
          struct(lit(l).as("lag"), col(s"__l$l").as("xl"))): _*))
          .as("__p")): _*)
      .select(keyCols.map(col) ++ Seq(col("__mu"), col("n_obs"),
        col("__p.lag").as("lag"), col("__p.xl").as("__xl"),
        col("__x")): _*)
      .filter(col("__xl").isNotNull)
      .groupBy(keyCols.map(col) :+ col("lag"): _*)
      .agg(max(col("n_obs")).as("n_obs"),
        sum(round((col("__x") - col("__mu")) *
          (col("__xl") - col("__mu")), 9).cast(DecimalType(28, 9)))
          .as("__num"))
      .join(broadcast(den), keyCols)
      .select(keyCols.map(col) ++ Seq(col("lag"), col("n_obs"),
        round(col("__num").cast("double") / col("__den").cast("double"),
          6).as("acf")): _*)
  }

  /** Classical additive seasonal decomposition (the moving-average
    * method): value = trend + seasonal + remainder, with
    * trend = centered (period+1-point, period even halves) moving
    * average, seasonal = per-phase mean of the detrended series
    * re-centered to sum ≈ 0, remainder = the rest. The diagnostic
    * decomposition [[holtWinters]]' recursive state summarizes — this
    * one you PLOT.
    *
    * Windows are by-key; the phase means ride one group-by over
    * (keys, period) cells and broadcast back. Portability: the trend
    * is a DECIMAL window sum with one IEEE division; detrended terms
    * pin to DECIMAL(28,9) before the phase mean (order-independent
    * sums — the PMI convention). Edge rows (incomplete centered
    * window) carry null trend/seasonal/remainder.
    */
  def seasonalDecompose(df: DataFrame, keyCols: Seq[String],
                        tickCol: String, valueCol: String,
                        period: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(period >= 2, s"period must be >= 2, got $period")
    require(keyCols.nonEmpty, "need at least one key column")
    val half = period / 2
    val span = 2 * half + 1
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tickCol)).rowsBetween(-half, half)
    val withTrend = df
      .select(keyCols.map(col) ++ Seq(col(tickCol),
        col(valueCol).cast("double").as(valueCol)): _*)
      .withColumn("__wn", count(col(valueCol)).over(w))
      .withColumn("trend",
        when(col("__wn") === span,
          sum(col(valueCol).cast(DecimalType(28, 9))).over(w)
            .cast("double") / lit(span.toDouble)))
      .withColumn("__phase", pmod(col(tickCol), lit(period.toLong)))
    val phaseMeans = withTrend.filter(col("trend").isNotNull)
      .groupBy(keyCols.map(col) :+ col("__phase"): _*)
      .agg((sum((col(valueCol) - col("trend")).cast(DecimalType(28, 9)))
        .cast("double") / count(lit(1))).as("__pm"))
    val phaseCenter = phaseMeans
      .groupBy(keyCols.map(col): _*)
      .agg((sum(col("__pm").cast(DecimalType(28, 9))).cast("double") /
        count(lit(1))).as("__pc"))
    withTrend
      .join(broadcast(phaseMeans), keyCols :+ "__phase", "left")
      .join(broadcast(phaseCenter), keyCols, "left")
      .withColumn("seasonal",
        when(col("trend").isNotNull, col("__pm") - col("__pc")))
      .withColumn("remainder",
        col(valueCol) - col("trend") - col("seasonal"))
      .select(keyCols.map(col) ++ Seq(col(tickCol), col(valueCol),
        col("trend"), col("seasonal"), col("remainder")): _*)
  }

  def isotonic(df: DataFrame, keyCols: Seq[String], tickCol: String,
               valueCol: String, scale: Long = 100L): DataFrame =
    isotonicCore(df, keyCols, tickCol, valueCol, lit(1L), scale)
      .drop("weight")

  /** WEIGHTED isotonic regression: each observation carries a positive
    * integer weight (a count of pooled identical observations), and the
    * fit minimizes Σ w·(fit−y)² subject to monotonicity — the form
    * classifier-score calibration needs: group by distinct score, weight
    * = group size, y = the group's positive RATE. Same PAV, pools carry
    * (Σw·yq, Σw), decisions stay exact Long cross-products. Output
    * keeps the `weight` column.
    */
  def isotonicWeighted(df: DataFrame, keyCols: Seq[String], tickCol: String,
                       valueCol: String, weightCol: String,
                       scale: Long = 100L): DataFrame =
    isotonicCore(df, keyCols, tickCol, valueCol,
      col(weightCol).cast("long"), scale)

  private def isotonicCore(df: DataFrame, keyCols: Seq[String],
                           tickCol: String, valueCol: String,
                           weight: org.apache.spark.sql.Column,
                           scale: Long): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column (scale: " +
      "a key-free call scans the whole table through one task)")
    require(scale > 0, s"scale must be positive, got $scale")
    val nk = keyCols.size
    val prepared = df
      .select(keyCols.map(col) ++ Seq(
        col(tickCol).cast("long").as(tickCol),
        round(col(valueCol).cast("double") * scale).cast("long").as("__yq"),
        weight.as("__w")): _*)
      .filter(col(tickCol).isNotNull && col("__yq").isNotNull &&
        col("__w").isNotNull && col("__w") > 0)
      .repartition(keyCols.map(col): _*)
      .sortWithinPartitions((keyCols :+ tickCol).map(col): _*)
    val keyFields = keyCols.map(c => prepared.schema(c))
    val outSchema = StructType(keyFields ++ Seq(
      StructField(tickCol, LongType, nullable = false),
      StructField(valueCol, DoubleType, nullable = false),
      StructField("weight", LongType, nullable = false),
      StructField("iso_fit", DoubleType, nullable = false)))
    prepared.mapPartitions { it =>
      def flush(key: Seq[Any], ticks: Seq[Long], ys: Seq[Long],
                ws: Seq[Long]): Seq[Row] = {
        // PAV stack: pools of (Σw·y, Σw, rows); merge while the previous
        // pool's weighted mean exceeds the new one's (exact cross-product
        // compare — counts are positive, so order is preserved)
        var pools = List.empty[(Long, Long, Int)] // head = rightmost pool
        ys.lazyZip(ws).foreach { (y, w) =>
          var s = y * w; var n = w; var m = 1
          while (pools.nonEmpty && pools.head._1 * n > s * pools.head._2) {
            s += pools.head._1; n += pools.head._2; m += pools.head._3
            pools = pools.tail
          }
          pools = (s, n, m) :: pools
        }
        val fits = pools.reverse.flatMap { case (s, n, m) =>
          val fit = s.toDouble / (n * scale).toDouble
          Seq.fill(m)(fit)
        }
        ticks.lazyZip(ys).lazyZip(ws).lazyZip(fits).map { (t, y, w, f) =>
          Row.fromSeq(key ++ Seq[Any](t, y.toDouble / scale.toDouble, w, f))
        }
      }

      // stream keys through the sorted partition one at a time: buffer
      // exactly one key's rows, PAV it, emit, move on — with a one-row
      // pushback for the row that revealed the key change
      new Iterator[Row] {
        private var pending: Iterator[Row] = Iterator.empty
        private var pushback: Row = null
        private def refill(): Unit = {
          val ticks = scala.collection.mutable.ArrayBuffer.empty[Long]
          val ys = scala.collection.mutable.ArrayBuffer.empty[Long]
          val ws = scala.collection.mutable.ArrayBuffer.empty[Long]
          val first =
            if (pushback != null) { val r = pushback; pushback = null; r }
            else it.next()
          val key = (0 until nk).map(first.get)
          ticks += first.getLong(nk); ys += first.getLong(nk + 1)
          ws += first.getLong(nk + 2)
          var done = false
          while (!done && it.hasNext) {
            val row = it.next()
            val k = (0 until nk).map(row.get)
            if (k == key) {
              ticks += row.getLong(nk); ys += row.getLong(nk + 1)
              ws += row.getLong(nk + 2)
            } else { pushback = row; done = true }
          }
          pending = flush(key, ticks.toSeq, ys.toSeq, ws.toSeq).iterator
        }
        override def hasNext: Boolean = {
          if (pending.hasNext) true
          else if (pushback != null || it.hasNext) { refill(); pending.hasNext }
          else false
        }
        override def next(): Row = {
          if (!hasNext) throw new NoSuchElementException
          pending.next()
        }
      }
    }(Encoders.row(outSchema))
  }
}
