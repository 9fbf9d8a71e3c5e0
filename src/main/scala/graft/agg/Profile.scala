package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, NumericType}

/** A11: column profiling (SURVEY §2.4), the dashboard's
  * `ProfileReport(minimal=True)` (`/root/reference/streamlit_app.py:206-209`).
  *
  * One wide aggregate computes every per-column statistic in a single job
  * (pandas-profiling sweeps the frame once per stat family; here partial
  * aggregation folds all stats map-side, so a 100 TB profile is one scan +
  * one tiny shuffle). Output is long-form: one row per column.
  */
object Profile {

  /** One row per profiled column:
    * (column, n, nulls, distinct, min, max, mean, stddev) — numeric stats
    * null for non-numeric columns; min/max rendered as strings for uniform
    * schema.
    *
    * Mean and stddev derive from exact decimal Σx and Σx² (shuffle-order-
    * independent — float summation would give per-run low-bit drift), with
    * a single double division/sqrt at the end. Stddev is the sample form
    * (n−1), matching pandas' default; `greatest(0, ·)` guards the
    * cancellation case where Σx² − (Σx)²/n rounds a hair negative.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val total = count(lit(1))
    val perCol = cols.flatMap { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        count(col(c)).as(s"${c}__cnt"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"),
        (if (isNum) sum(col(c).cast(DecimalType(28, 6))).cast("double")
         else lit(null).cast("double")).as(s"${c}__sum"),
        // cast BEFORE squaring: the base value (~1e5) converts to
        // scale-6 decimal inside double's 17 significant digits, so
        // every engine rounds it identically, and the square is then
        // EXACT decimal arithmetic. Squaring the double first made the
        // scale-10 conversion of a ~1e9 product ambiguous beyond
        // double precision — Spark and DuckDB disagreed by ULPs per
        // row, surfacing as a 2-ULP stddev drift at sf0.1 (caught by
        // the round-11 sf0.1 oracle sweep).
        (if (isNum) sum(col(c).cast(DecimalType(18, 6)) *
            col(c).cast(DecimalType(18, 6))).cast("double")
         else lit(null).cast("double")).as(s"${c}__sumsq"),
        // domain guard for the DECIMAL(18,6) cast above: |x| >= 1e12
        // nulls under non-ANSI cast and sum() would silently SKIP the
        // row — a wrong stddev with no error (the Dsir.scoresFromCounts
        // / Eval.emd1d silent-overflow class). max(|x|) costs nothing
        // extra in the same single-pass agg and lets the reshape step
        // raise_error instead.
        (if (isNum) max(abs(col(c).cast("double")))
         else lit(null).cast("double")).as(s"${c}__maxabs")
      )
    }
    val wide = df.agg(total.as("__n"), perCol: _*)

    // Reshape the single wide row to long form: one row per column.
    val stacked = cols.map { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      val cnt = col(s"${c}__cnt")
      val s1 = col(s"${c}__sum")
      // fail-fast on the DECIMAL(18,6) domain: values at/near 1e12
      // overflow the pre-square cast; under non-ANSI that nulls the
      // term and sum() skips it — stddev would be silently wrong.
      // Threshold 999999999999.5 is half a unit conservative (scale-6
      // rounding can carry the last half-unit below 1e12 over the
      // edge): a loud false positive in that sliver beats a silent
      // wrong answer. Null maxabs (all-null column) is in-domain.
      val maxabs = col(s"${c}__maxabs")
      val s2 =
        if (isNum)
          when(maxabs.isNull || maxabs < 999999999999.5,
            col(s"${c}__sumsq"))
            .otherwise(raise_error(concat(
              lit(s"profile: max(abs($c)) = "), maxabs.cast("string"),
              lit(" exceeds the DECIMAL(18,6) domain (~1e12); stddev " +
                "would silently skip overflowed rows")))
              .cast("double"))
        else col(s"${c}__sumsq")
      val mean = s1 / cnt
      // greatest() SKIPS nulls (it is not null-propagating), so the
      // non-numeric case must be gated statically or a null Σx² would
      // surface as stddev 0.0 instead of null.
      val variance = greatest(lit(0.0), (s2 - s1 * s1 / cnt) / (cnt - 1))
      val stddev =
        if (isNum) when(cnt > 1, sqrt(variance)) else lit(null).cast("double")
      struct(
        lit(c).as("column"),
        col("__n").as("n"),
        (col("__n") - cnt).as("nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"),
        // 6 dp: display statistics, and the honest cross-engine
        // contract — the exact decimal Σx² can carry 16+ significant
        // digits, where decimal→double casts are allowed to differ by
        // an ULP between engines (measured Spark vs DuckDB at sf0.01,
        // round-11 sweep); rounding the one IEEE output ends the
        // low-bit lottery without touching the exact-sum arithmetic
        round(mean, 6).as("mean_value"),
        round(stddev, 6).as("stddev_value")
      )
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
      .orderBy("column")
  }

  /** Fixed-bin histogram of a numeric column: `bins` equal-width buckets
    * over [min, max], the ydata-profiling minimal histogram. Returns
    * (bin, lo, hi, n_rows) with bin ∈ [0, bins).
    *
    * Two jobs by necessity (bin edges need global min/max), but both are
    * single-scan with map-side partial aggregation and the min/max row is
    * broadcast — no driver-side collect, no second shuffle of the data.
    * Values exactly equal to max clamp into the last bin. Bin edges are
    * recomputed from (min, bin index, width) in double arithmetic — the
    * identical expression shape an external SQL engine produces, so edges
    * are bit-reproducible across engines.
    */
  def histogram(df: DataFrame, c: String, bins: Int = 10): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    val mm = df.agg(min(col(c)).cast("double").as("mn"),
      max(col(c)).cast("double").as("mx"))
    val width = (col("mx") - col("mn")) / lit(bins)
    df.select(col(c).cast("double").as("x")).where(col("x").isNotNull)
      .crossJoin(broadcast(mm))
      .select(
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(least(floor((col("x") - col("mn")) / width),
            lit(bins - 1L)))
          .cast("int").as("bin"),
        col("mn"), col("mx"))
      .groupBy(col("bin"), col("mn"), col("mx"))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("bin"),
        (col("mn") + col("bin") * width).as("lo"),
        (col("mn") + (col("bin") + 1) * width).as("hi"),
        col("n_rows"))
      .orderBy("bin")
  }
}
