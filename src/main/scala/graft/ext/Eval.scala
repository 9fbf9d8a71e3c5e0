package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Classifier/ranker evaluation over Dataset-scale predictions — the
  * measurement side of [[Classifier]]'s quality filter: rank-based AUC,
  * threshold confusion matrices, and calibration bins, each as one
  * distributed plan whose arithmetic is exact (integer counts and
  * products throughout; at most one IEEE division per output value), so
  * every metric is bit-reproducible under any partitioning and
  * hash-checkable against an exact oracle.
  *
  * Scale notes: the naive AUC formulations are a pos×neg pair join
  * (quadratic) or one global ORDER BY rank window (single task at the
  * merge). [[auc]] instead groups by score value (the natural
  * compression: |distinct scores| ≤ n, often ≪ n) and takes the
  * strictly-below negative count from a TWO-PHASE prefix sum — the
  * `TextAnalysis.packSequences` pattern: an intra-bucket running sum
  * partitioned by a caller-supplied score bucket, plus a bucket-totals
  * prefix over the (tiny) bucket table. No unbounded window ever sees
  * more than one bucket's distinct scores.
  */
object Eval {

  /** Mann-Whitney AUC of `scoreCol` against binary `labelCol` (0/1),
    * with the standard tie treatment (ties count half):
    * `AUC = (#{pos>neg} + #{pos==neg}/2) / (n_pos·n_neg)`.
    * Returns one row `(n_pos, n_neg, auc)`.
    *
    * Everything up to the final division is integer arithmetic on
    * longs — `num2 = 2·#{pos>neg} + #ties` and `den2 = 2·n_pos·n_neg`
    * — so `auc = num2/den2` is a single exactly-rounded IEEE division:
    * bit-portable, no rounding fudge.
    *
    * Rows with a NULL score are EXCLUDED up front (they have no rank
    * position in the Mann-Whitney order), so both overloads agree on
    * the input population regardless of how a bucket function would
    * have mapped NULL.
    *
    * `bucketOf(score)` must be a deterministic, ORDER-PRESERVING
    * coarsening of the score (`s₁ < s₂ ⇒ bucket(s₁) ≤ bucket(s₂)`) —
    * e.g. `floor(score)`, `score DIV 100` — sized so one bucket's
    * distinct scores fit a task. Correctness does not depend on the
    * bucket granularity, only the window sizes do.
    *
    * The no-`bucketOf` overload derives buckets from the data:
    * 255 `percentile_approx` boundaries over the DISTINCT-score table
    * (the quantity that actually bounds the window), broadcast back,
    * and `bucket = #{boundaries ≤ score}` — order-preserving because
    * the boundary set is fixed, and equi-depth by construction, so the
    * partitioned intra-bucket window sees ~|distinct|/256 scores per
    * bucket regardless of the score distribution (the partition-free
    * prefix window sees only the ≤256-row bucket-totals table). The
    * default requires a numeric score column (percentile_approx); use
    * the explicit-`bucketOf` overload for non-numeric orderable
    * scores. Scale note: deriving the boundaries reads the
    * distinct-score aggregate a second time (bounds subtree + join
    * left side); Spark's ReuseExchange usually dedupes the shuffle but
    * the map-side scan can run twice — pass an explicit `bucketOf` to
    * guarantee a single pass when the input scan is the dominant cost.
    */
  def auc(df: DataFrame, scoreCol: Column, labelCol: Column): DataFrame =
    aucImpl(df, scoreCol, labelCol, None)

  /** See [[auc]]; `bucketOf` supplies the order-preserving score
    * coarsening explicitly (required for non-numeric score columns).
    * A `bucketOf` that maps a non-NULL score to NULL would silently
    * drop that score's rows at the bucket join — NULL scores
    * themselves are already excluded before bucketing.
    */
  def auc(df: DataFrame, scoreCol: Column, labelCol: Column,
          bucketOf: Column => Column): DataFrame =
    aucImpl(df, scoreCol, labelCol, Some(bucketOf))

  /** One row per DISTINCT non-null score: (__s, __pos, __neg). */
  private def scoreCounts(df: DataFrame, scoreCol: Column,
                          labelCol: Column): DataFrame =
    df.filter(scoreCol.isNotNull)
      .groupBy(scoreCol.as("__s"))
      .agg(sum(labelCol.cast("long")).as("__pos"),
        sum(lit(1L) - labelCol.cast("long")).as("__neg"))

  /** Attach the order-preserving bucket id `__b` (caller-supplied or
    * equi-depth derived — see [[auc]]'s scaling notes). */
  private def bucketScores(grouped: DataFrame,
                           bucketOf: Option[Column => Column]): DataFrame =
    bucketOf match {
      case Some(f) => grouped.withColumn("__b", f(col("__s")))
      case None =>
        val fracs = array((1 until 256).map(i => lit(i / 256.0)): _*)
        val bounds = grouped.agg(
          percentile_approx(col("__s"), fracs, lit(10000)).as("__bounds"))
        // codegen'd binary search; the double cast is monotonic and
        // equality-preserving, so the bucket stays an order-preserving
        // coarsening (see Ranks)
        grouped.crossJoin(broadcast(bounds))
          .withColumn("__b", graft.functions.native_fns.bucket_index(
            col("__bounds").cast("array<double>"),
            col("__s").cast("double")))
          .drop("__bounds")
    }

  /** Two-phase strictly-below prefix sums of `cols` over score order:
    * intra-bucket window (partitioned by `__b`) + bucket-totals prefix
    * (the only partition-free window, one row per bucket). Adds
    * `__lt_<col>` per requested column. */
  private def strictlyBelow(counts: DataFrame,
                            cols: Seq[String]): DataFrame = {
    val intra = Window.partitionBy(col("__b")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val interW = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val aggs = cols.map(c => sum(col(c)).as(s"__bt_$c"))
    val bucketTotals0 = counts.groupBy(col("__b"))
      .agg(aggs.head, aggs.tail: _*)
    val bucketTotals = cols.foldLeft(bucketTotals0) { (d, c) =>
      d.withColumn(s"__below_$c",
        coalesce(sum(col(s"__bt_$c")).over(interW), lit(0L)))
    }.drop(cols.map(c => s"__bt_$c"): _*)
    val joined = counts.join(bucketTotals, Seq("__b"))
    cols.foldLeft(joined) { (d, c) =>
      d.withColumn(s"__lt_$c",
        col(s"__below_$c") + coalesce(sum(col(c)).over(intra), lit(0L)))
    }
  }

  private def aucImpl(df: DataFrame, scoreCol: Column, labelCol: Column,
                      bucketOf: Option[Column => Column]): DataFrame = {
    val counts = bucketScores(scoreCounts(df, scoreCol, labelCol), bucketOf)
    strictlyBelow(counts, Seq("__neg"))
      .agg(sum(col("__pos")).as("n_pos"), sum(col("__neg")).as("n_neg"),
        sum(col("__pos") * (lit(2L) * col("__lt___neg") + col("__neg")))
          .as("__num2"))
      .select(col("n_pos"), col("n_neg"),
        (col("__num2").cast("double") /
          (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
          .as("auc"))
  }

  /** Mann-Whitney U / Wilcoxon rank-sum two-sample test — the
    * NONPARAMETRIC complement of the Welch z in `x_ab_test`: does one
    * group stochastically dominate the other, with no normality or
    * equal-variance assumption (the robust A/B readout when value
    * distributions are skewed, which revenue always is).
    *
    * U counts cross-group pairs (A-value > B-value, ties ½) — exactly
    * `auc · n_a · n_b`, so this reuses [[auc]]'s scale machinery
    * verbatim: per-value compression, equi-depth bucketed two-phase
    * prefix, NO global window. The normal approximation uses the
    * tie-corrected variance
    * σ² = n_a·n_b/12 · ((n+1) − Σ(t³−t)/(n(n−1))); z is pinned at 9 dp
    * (U and the tie sum are exact integers/halves, so the one ln-free
    * IEEE chain is engine-portable to far below that). Degenerate
    * inputs (a group empty, or every value identical → σ = 0) emit a
    * null z rather than ±∞.
    *
    * The tie cube t³ is computed in DECIMAL(38,0), not Long: a single
    * value with t > ⌊2^63^(1/3)⌋ ≈ 2.09M tied rows would silently
    * overflow a Long product in non-ANSI mode — exactly the hot-tied-
    * value shape the bucketed machinery exists for. DECIMAL keeps the
    * term exact up to t ≈ 4.6·10¹² tied rows per value (t³ < 10³⁸),
    * the documented contract.
    */
  def mannWhitney(df: DataFrame, valueCol: Column,
                  groupACol: Column): DataFrame = {
    val counts = bucketScores(scoreCounts(df, valueCol, groupACol), None)
    val t = (col("__pos") + col("__neg")).cast(DecimalType(20, 0))
    val agg = strictlyBelow(counts, Seq("__neg"))
      .agg(sum(col("__pos")).as("n_a"), sum(col("__neg")).as("n_b"),
        sum(col("__pos") * (lit(2L) * col("__lt___neg") + col("__neg")))
          .as("__num2"),
        sum(t * t * t - t).as("__ties"))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val n = (col("n_a") + col("n_b")).cast("double")
    val u = col("__num2").cast("double") / lit(2.0)
    val sigma2 = na * nb / lit(12.0) *
      ((n + lit(1.0)) - col("__ties").cast("double") / (n * (n - lit(1.0))))
    agg.select(col("n_a"), col("n_b"), u.as("u"),
      (u / (na * nb)).as("auc"),
      when(col("n_a") > 0 && col("n_b") > 0 && sigma2 > 0,
        round((u - na * nb / lit(2.0)) / sqrt(sigma2), 9)).as("z"))
  }

  /** Precision-recall curve: one row per DISTINCT score value s,
    * evaluating the classifier "predict positive ⟺ score ≥ s" —
    * `(threshold, tp, fp, fn, precision, recall)`, exact integer
    * counts and one IEEE division per rate. tp+fp ≥ 1 at every emitted
    * threshold (the threshold's own rows score ≥ it), so precision
    * never divides by zero; recall emits 0.0 when the frame has no
    * positives at all.
    *
    * Same scale machinery as [[auc]]: per-score compression first
    * (|distinct| rows, not |rows|), then the two-phase bucketed prefix
    * sum — cumulative-from-above counts are `total − strictly-below`,
    * so no descending window and no second sort; the only
    * partition-free window is over the ≤256-row bucket-totals table.
    * NULL scores are excluded (no threshold to stand at), exactly as
    * in [[auc]].
    */
  def prCurve(df: DataFrame, scoreCol: Column, labelCol: Column)
      : DataFrame = prCurveImpl(df, scoreCol, labelCol, None)

  /** See [[prCurve]]; explicit order-preserving bucket function (the
    * [[auc]] overload contract). */
  def prCurve(df: DataFrame, scoreCol: Column, labelCol: Column,
              bucketOf: Column => Column): DataFrame =
    prCurveImpl(df, scoreCol, labelCol, Some(bucketOf))

  private def prCurveImpl(df: DataFrame, scoreCol: Column,
                          labelCol: Column,
                          bucketOf: Option[Column => Column]): DataFrame = {
    val counts = bucketScores(scoreCounts(df, scoreCol, labelCol), bucketOf)
      .localCheckpoint(false) // referenced by totals AND the curve
    val totals = counts.agg(sum(col("__pos")).as("__tpos"),
      sum(col("__neg")).as("__tneg"))
    strictlyBelow(counts, Seq("__pos", "__neg"))
      .crossJoin(broadcast(totals))
      .select(col("__s").as("threshold"),
        (col("__tpos") - col("__lt___pos")).as("tp"),
        (col("__tneg") - col("__lt___neg")).as("fp"),
        col("__lt___pos").as("fn"))
      .withColumn("precision",
        col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
      .withColumn("recall",
        when(col("tp") + col("fn") === 0, lit(0.0))
          .otherwise(col("tp").cast("double") /
            (col("tp") + col("fn")).cast("double")))
  }

  /** Confusion matrix + exact-division summary for a boolean predictor
    * column vs binary `labelCol`: one aggregate pass emitting
    * `(tp, fp, tn, fn, accuracy, precision, recall)` as one row.
    * Counts are integer; each rate is one IEEE division (bit-portable).
    * Pair with an integer-margin predictor (`margin > 0`) to keep the
    * whole plan transcendental-free — σ(m) > ½ ⟺ m > 0, so
    * thresholding the sigmoid at 0.5 never needs the sigmoid.
    *
    * Degenerate inputs stay finite and non-null: a predictor that never
    * fires (tp+fp = 0), an all-negative label column (tp+fn = 0), or an
    * empty frame all emit 0.0 for the affected rate instead of null —
    * downstream gating logic never sees a null to propagate.
    */
  def confusion(df: DataFrame, predCol: Column,
                labelCol: Column): DataFrame = {
    val y = labelCol.cast("int")
    val p = predCol.cast("int")
    def rate(num: Column, den: Column): Column =
      when(den === 0, lit(0.0))
        .otherwise(num.cast("double") / den.cast("double"))
    df.agg(
        coalesce(sum((p * y).cast("long")), lit(0L)).as("tp"),
        coalesce(sum((p * (lit(1) - y)).cast("long")), lit(0L)).as("fp"),
        coalesce(sum(((lit(1) - p) * (lit(1) - y)).cast("long")), lit(0L))
          .as("tn"),
        coalesce(sum(((lit(1) - p) * y).cast("long")), lit(0L)).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        rate(col("tp") + col("tn"),
          col("tp") + col("fp") + col("tn") + col("fn")).as("accuracy"),
        rate(col("tp"), col("tp") + col("fp")).as("precision"),
        rate(col("tp"), col("tp") + col("fn")).as("recall"))
  }

  /** Reliability-diagram bins: group rows by an integer score bin
    * (caller supplies the binning column — `margin DIV w`, a decile id,
    * …), emit per-bin `(n, n_pos, pos_rate)`. The bin id must be a
    * row-local function of the score so the plan is scan → group-by;
    * `pos_rate` is the bin's single exact division.
    */
  def calibrationBins(df: DataFrame, binCol: Column,
                      labelCol: Column): DataFrame =
    df.groupBy(binCol.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(labelCol.cast("long")).as("n_pos"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double"))
          .as("pos_rate"))

  /** Population Stability Index terms between a reference slice
    * (`isRefCol` true) and the rest, over a row-local integer bin:
    * per-bin `(bin, n_ref, n_cur, psi_term)` with
    * `psi_term = (p−q)·ln(p/q)`, Laplace-smoothed over the observed
    * bins (`p = (n_ref_b+1)/(N_ref+B)`), so empty-on-one-side bins are
    * finite. The standard drift monitor for a score distribution
    * (PSI > 0.2 ⇒ investigate); Σ of the terms is the index.
    *
    * One group-by over (bin) + broadcast totals; p and q are exact
    * integer-ratio divisions, and the product with the transcendental
    * `ln` is pinned to DECIMAL(28,9) — the engine-portability
    * convention for log terms.
    */
  def psiBins(df: DataFrame, binCol: Column,
              isRefCol: Column): DataFrame = {
    val r = isRefCol.cast("long")
    val counts = df.groupBy(binCol.as("bin"))
      .agg(sum(r).as("n_ref"), sum(lit(1L) - r).as("n_cur"))
    val totals = counts.agg(sum(col("n_ref")).as("__tr"),
      sum(col("n_cur")).as("__tc"), count(lit(1)).as("__nb"))
    val p = (col("n_ref") + lit(1L)).cast("double") /
      (col("__tr") + col("__nb")).cast("double")
    val q = (col("n_cur") + lit(1L)).cast("double") /
      (col("__tc") + col("__nb")).cast("double")
    counts.crossJoin(broadcast(totals))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        ((p - q) * log(p / q)).cast(DecimalType(28, 9)).cast("double")
          .as("psi_term"))
  }

  /** Mutual information (nats) between two discrete columns — the
    * feature-selection score for a binned feature against a label:
    * `MI = Σ_xy p_xy·ln(p_xy·N² / (c_x·c_y·N))` with every ratio an
    * exact integer division and each cell's term DECIMAL(28,9)-pinned
    * before the order-independent sum. Returns one row
    * `(n, n_cells, mi)`.
    *
    * The joint table is the only corpus-wide aggregate; marginals are
    * re-grouped FROM it (|X|·|Y| rows), so everything after the first
    * group-by is broadcast-sized.
    */
  /** Pearson χ² test of independence between two discrete columns —
    * the transcendental-FREE sibling of [[mutualInformation]] (no log
    * anywhere, so no rounding convention is even needed: every per-cell
    * term is exactly-rounded IEEE arithmetic on exact integer inputs,
    * pinned to DECIMAL(28,9) only to make the cell sum
    * order-independent). Zero-observed cells contribute their full
    * expected mass — the cell grid is enumerated as marginal×marginal
    * (broadcast-sized after the one corpus group-by), not read off the
    * joint table, which would silently drop them. Returns one row
    * `(n, dof, chi2)`.
    */
  def chiSquared(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val joint = df.groupBy(xCol.as("__x"), yCol.as("__y"))
      .agg(count(lit(1)).as("__cxy"))
    val mx = joint.groupBy(col("__x")).agg(sum(col("__cxy")).as("__cx"))
    val my = joint.groupBy(col("__y")).agg(sum(col("__cxy")).as("__cy"))
    val n = joint.agg(sum(col("__cxy")).as("__n"))
    val o = coalesce(col("__cxy"), lit(0L)).cast("double")
    val e = col("__cx").cast("double") * col("__cy").cast("double") /
      col("__n").cast("double")
    broadcast(mx).crossJoin(broadcast(my))
      .join(joint, Seq("__x", "__y"), "left")
      .crossJoin(broadcast(n))
      .select(col("__n"), col("__x"), col("__y"),
        ((o - e) * (o - e) / e).cast(DecimalType(28, 9)).as("__t"))
      .groupBy(col("__n"))
      .agg(
        ((countDistinct(col("__x")) - 1) *
          (countDistinct(col("__y")) - 1)).as("dof"),
        sum(col("__t")).cast("double").as("chi2"))
      .select(col("__n").as("n"), col("dof"), col("chi2"))
  }

  def mutualInformation(df: DataFrame, xCol: Column,
                        yCol: Column): DataFrame = {
    val joint = df.groupBy(xCol.as("__x"), yCol.as("__y"))
      .agg(count(lit(1)).as("__cxy"))
    val mx = joint.groupBy(col("__x")).agg(sum(col("__cxy")).as("__cx"))
    val my = joint.groupBy(col("__y")).agg(sum(col("__cxy")).as("__cy"))
    val n = joint.agg(sum(col("__cxy")).as("__n"),
      count(lit(1)).as("n_cells"))
    joint
      .join(broadcast(mx), Seq("__x"))
      .join(broadcast(my), Seq("__y"))
      .crossJoin(broadcast(n))
      .select(col("__n"), col("n_cells"),
        ((col("__cxy").cast("double") / col("__n").cast("double")) *
          log((col("__cxy").cast("double") * col("__n").cast("double")) /
            (col("__cx").cast("double") * col("__cy").cast("double"))))
          .cast(DecimalType(28, 9)).as("__term"))
      .groupBy(col("__n"), col("n_cells"))
      .agg(sum(col("__term")).cast("double").as("mi"))
      .select(col("__n").as("n"), col("n_cells"), col("mi"))
  }

  /** Cumulative gains / lift table: rank the population by score
    * descending, cut into `nBuckets` equal-count bins, and report per
    * bin the cumulative share of positives captured vs the share of
    * population contacted — "the top 20 % of scores hold 54 % of the
    * converters", the campaign-targeting readout of a ranking model
    * (the operating-point view [[auc]] integrates away).
    *
    * Shape: per-score-value compression first (one group-by — ties
    * share a bucket boundary deterministically via the value order),
    * then the same two-phase bucketed prefix as [[auc]]/[[prCurve]]:
    * cumulative-from-the-top counts are `total − strictly-below`, so
    * there is NO descending global window. That matters here precisely
    * because gains tables run on CONTINUOUS classifier scores — the
    * distinct-score table is data-sized, and a no-partitionBy window
    * over it would be a single-partition sort of ~|rows| (the exact
    * shape [[prCurve]] was refactored away from); the only
    * partition-free window is over the ≤256-row bucket-totals table.
    * Exact integer cumulative counts; lift = one IEEE division per bin
    * row.
    */
  def gainsTable(df: DataFrame, scoreCol: Column, labelCol: Column,
                 nBuckets: Int = 10): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    val byScore = df.select(scoreCol.as("__s"),
        labelCol.cast("long").as("__y"))
      .filter(col("__s").isNotNull)
      .groupBy(col("__s"))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__pos"))
    val counts = bucketScores(byScore, None)
      .localCheckpoint(false) // referenced by totals AND the prefixes
    val totals = counts.agg(sum(col("__n")).as("__tn"),
      sum(col("__pos")).as("__tp"))
    strictlyBelow(counts, Seq("__n", "__pos"))
      .crossJoin(broadcast(totals))
      // descending-inclusive cumulative == total − ascending strictly
      // -below: scores ≥ s are exactly the complement of scores < s
      .withColumn("__cn", col("__tn") - col("__lt___n"))
      .withColumn("__cp", col("__tp") - col("__lt___pos"))
      // bucket of the row's cumulative END position: ties inside one
      // score value never split across buckets. Integer DIV — exact.
      .withColumn("bucket",
        expr(s"CAST(((__cn - 1) * $nBuckets) DIV __tn AS INT) + 1"))
      .groupBy(col("bucket"))
      .agg(max(col("__cn")).as("n_cum"), max(col("__cp")).as("pos_cum"),
        max(col("__tn")).as("__tn"), max(col("__tp")).as("__tp"))
      .select(col("bucket"), col("n_cum"), col("pos_cum"),
        (col("pos_cum").cast("double") / col("__tp").cast("double"))
          .as("gain"),
        ((col("pos_cum").cast("double") / col("__tp").cast("double")) /
          (col("n_cum").cast("double") / col("__tn").cast("double")))
          .as("lift"))
  }

  /** Split-conformal prediction intervals (Vovk; Lei et al.): per key,
    * the (1−α) empirical quantile of the absolute residuals becomes the
    * half-width of every interval — model-agnostic, distribution-free,
    * coverage ≥ 1−α on exchangeable data. The band a forecast or
    * regression needs before anyone acts on it.
    *
    * Input: rows with a prediction and an actual. Output: the input
    * plus (resid, q, lo, hi, hit). One per-key aggregate (Spark's exact
    * `percentile` — interpolating, bit-matched against DuckDB's
    * quantile_cont in `x_percentiles`) broadcast back; interval
    * arithmetic is row-local. Rows with a null prediction (e.g. a
    * trailing-window warmup) pass through with null band columns and
    * don't contribute to the quantile.
    */
  def conformalInterval(df: DataFrame, keyCols: Seq[String],
                        predCol: Column, actualCol: Column,
                        alpha: Double): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha in (0,1), got $alpha")
    require(keyCols.nonEmpty, "need at least one key column")
    val withR = df.withColumn("resid",
      when(predCol.isNotNull, abs(actualCol - predCol)))
    val q = withR.filter(col("resid").isNotNull)
      .groupBy(keyCols.map(col): _*)
      .agg(expr(s"percentile(resid, ${1.0 - alpha})").as("q"))
    withR.join(broadcast(q), keyCols, "left")
      .withColumn("q", when(col("resid").isNotNull, col("q")))
      .withColumn("lo", predCol - col("q"))
      .withColumn("hi", predCol + col("q"))
      .withColumn("hit",
        when(col("q").isNotNull,
          actualCol >= col("lo") && actualCol <= col("hi")))
  }

  /** Two-sample Kolmogorov-Smirnov statistic: D = max |F_a(v) − F_b(v)|
    * over the pooled value domain — the scale-free drift test PSI's
    * fixed bins approximate ([[psiBins]] needs a binning choice; KS
    * does not). Output one row: (n_a, n_b, ks_d). `valueCol` must be
    * numeric (a CDF difference is defined over an ordered numeric
    * domain; the equi-depth bucketing needs percentile_approx).
    *
    * Relational shape: per-(value, side) counts → pooled per-value
    * rows → the SAME two-phase bucketed prefix as [[auc]] for both
    * inclusive running sums (strictly-below + own count), so there is
    * NO data-sized global window — raw continuous scores with
    * near-unique values are fine; the only partition-free window is
    * the ≤256-row bucket-totals table. (Until round 9 this used one
    * ordered window over the distinct-value table with a
    * bounded-domain contract; the bucketed form removes the
    * contract.) D is a max of exact-integer-ratio differences:
    * |ca·nb − cb·na| stays in Long and one IEEE division at the end
    * makes the statistic bit-portable.
    */
  def ksTest(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val av = a.select(col(valueCol).as("__s")).filter(col("__s").isNotNull)
      .groupBy(col("__s")).agg(count(lit(1)).as("__ca"))
    val bv = b.select(col(valueCol).as("__s")).filter(col("__s").isNotNull)
      .groupBy(col("__s")).agg(count(lit(1)).as("__cb"))
    val pooled = av.join(bv, Seq("__s"), "full_outer")
      .select(col("__s"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val counts = bucketScores(pooled, None)
      .localCheckpoint(false) // totals + both prefix passes
    val totals = counts.agg(sum(col("__ca")).as("n_a"),
      sum(col("__cb")).as("n_b"))
    strictlyBelow(counts, Seq("__ca", "__cb"))
      .crossJoin(broadcast(totals))
      .groupBy(col("n_a"), col("n_b"))
      // DECIMAL(19,0) casts BEFORE the cross-multiply: the inclusive
      // CDF counts and totals are each long-ranged, so the products
      // (≤ n_a·n_b < 2^126) need decimal headroom — in Long they would
      // silently wrap once n_a·n_b approaches 2^63 (~3e9 rows/side,
      // plausible at corpus scale)
      .agg(max(abs(
        (col("__lt___ca") + col("__ca")).cast(DecimalType(19, 0)) *
          col("n_b").cast(DecimalType(19, 0)) -
          (col("__lt___cb") + col("__cb")).cast(DecimalType(19, 0)) *
            col("n_a").cast(DecimalType(19, 0)))).as("__num"))
      .select(col("n_a"), col("n_b"),
        (col("__num").cast("double") /
          (col("n_a").cast(DecimalType(19, 0)) *
            col("n_b").cast(DecimalType(19, 0))).cast("double"))
          .as("ks_d"))
  }

  /** Two-sample 1-D earth-mover's (Wasserstein-1) distance — the
    * fourth drift leg: PSI needs a binning choice, KS sees only the
    * worst POINT of CDF disagreement, chi² is categorical; EMD
    * integrates |F_a − F_b| over the value axis, so it weights drift
    * by HOW FAR mass moved (the standard score/embedding-drift
    * measure). For discrete samples:
    *   EMD = Σ_i (v_{i+1} − v_i) · |F_a(v_i) − F_b(v_i)|
    * over the sorted pooled distinct values.
    *
    * Exactness contract (the quantize convention): `valueCol` must be
    * EXACT-integer-valued (cast to long by the caller — e.g. cents of
    * a DECIMAL(12,2) price). Then every gap and every CDF numerator is
    * an exact integer, each term is an exact DECIMAL(38,0) product,
    * the sum is order/partitioning-independent, and the statistic is
    * bit-portable through its one final IEEE division. Output one row:
    * (n_a, n_b, emd) with emd in the caller's integer units.
    *
    * Relational shape: the [[ksTest]] two-phase bucketed prefix gives
    * both inclusive CDFs with no data-sized global window; the
    * successor value v_{i+1} is the intra-bucket `lead` (window
    * partitioned by bucket) patched at each bucket's last row by the
    * next bucket's minimum — a lead over the ≤256-row bucket-minimum
    * table, the same bounded partition-free class as the bucket-totals
    * prefix (bucket_index is an order-preserving, equality-preserving
    * coarsening, so "min of the next non-empty bucket" IS the global
    * successor). The global maximum value has no successor and
    * contributes nothing (F_a = F_b = 1 there anyway).
    */
  def emd1d(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    val av = a.select(col(valueCol).cast("long").as("__s"))
      .filter(col("__s").isNotNull)
      .groupBy(col("__s")).agg(count(lit(1)).as("__ca"))
    val bv = b.select(col(valueCol).cast("long").as("__s"))
      .filter(col("__s").isNotNull)
      .groupBy(col("__s")).agg(count(lit(1)).as("__cb"))
    val pooled = av.join(bv, Seq("__s"), "full_outer")
      .select(col("__s"), coalesce(col("__ca"), lit(0L)).as("__ca"),
        coalesce(col("__cb"), lit(0L)).as("__cb"))
    val counts = bucketScores(pooled, None)
      .localCheckpoint(false) // totals, prefixes, bucket minima
    val totals = counts.agg(sum(col("__ca")).as("n_a"),
      sum(col("__cb")).as("n_b"))
    val wIntra = Window.partitionBy(col("__b")).orderBy(col("__s"))
    // ≤256 rows: minimum value per non-empty bucket, each row's
    // successor bucket-minimum via the bounded partition-free lead
    val bnext = counts.groupBy(col("__b")).agg(min(col("__s")).as("__bmin"))
      .withColumn("__bnext",
        lead(col("__bmin"), 1).over(Window.orderBy(col("__b"))))
      .select(col("__b"), col("__bnext"))
    strictlyBelow(counts, Seq("__ca", "__cb"))
      .withColumn("__nx", lead(col("__s"), 1).over(wIntra))
      .join(broadcast(bnext), Seq("__b"))
      .withColumn("__next", coalesce(col("__nx"), col("__bnext")))
      .filter(col("__next").isNotNull)
      .crossJoin(broadcast(totals))
      .withColumn("__term",
        // every factor is cast to DECIMAL BEFORE any multiply: the
        // CDF-difference leg is ≤ n_a·n_b < 2^126 — exact in
        // DECIMAL(38,0), but silently wrapped in Long once n_a·n_b
        // neared 2^63 (~3e9 rows per side). Residual bound: the full
        // term gap·|ΔCDF| must fit DECIMAL(38,0) (< 10^38). Past that
        // Spark nulls the product — and sum() would silently SKIP the
        // null term, understating the EMD. The agg below counts null
        // terms and raise_error()s instead of returning a wrong value.
        (col("__next") - col("__s")).cast(DecimalType(38, 0)) *
          abs((col("__lt___ca") + col("__ca")).cast(DecimalType(19, 0)) *
              col("n_b").cast(DecimalType(19, 0)) -
            (col("__lt___cb") + col("__cb")).cast(DecimalType(19, 0)) *
              col("n_a").cast(DecimalType(19, 0))))
      .groupBy(col("n_a"), col("n_b"))
      .agg(sum(col("__term")).as("__num"),
        (count(lit(1)) - count(col("__term"))).as("__overflowed"))
      .select(col("n_a"), col("n_b"),
        when(col("__overflowed") === 0L,
          col("__num").cast("double") /
            (col("n_a").cast(DecimalType(19, 0)) *
              col("n_b").cast(DecimalType(19, 0))).cast("double"))
          .otherwise(raise_error(concat(lit("emd1d: "), col("__overflowed"),
            lit(" term(s) overflowed DECIMAL(38,0); result would understate EMD")))
            .cast("double"))
          .as("emd"))
  }
}
