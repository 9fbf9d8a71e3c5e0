package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    * `bucketOf(score)` must be a deterministic, ORDER-PRESERVING
    * coarsening of the score (`s₁ < s₂ ⇒ bucket(s₁) ≤ bucket(s₂)`) —
    * e.g. `floor(score)`, `score DIV 100` — sized so one bucket's
    * distinct scores fit a task. Correctness does not depend on the
    * bucket granularity, only the window sizes do.
    */
  def auc(df: DataFrame, scoreCol: Column, labelCol: Column,
          bucketOf: Column => Column = identity): DataFrame = {
    val counts = df
      .groupBy(scoreCol.as("__s"))
      .agg(sum(labelCol.cast("long")).as("__pos"),
        sum(lit(1L) - labelCol.cast("long")).as("__neg"))
      .withColumn("__b", bucketOf(col("__s")))
    // phase 1: negatives strictly below within this score's bucket
    val intra = Window.partitionBy(col("__b")).orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    // phase 2: whole-bucket negative totals, prefix over buckets
    // (one row per bucket — the only partition-free window)
    val interW = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val bucketNeg = counts.groupBy(col("__b"))
      .agg(sum(col("__neg")).as("__bneg"))
      .withColumn("__below", coalesce(sum(col("__bneg")).over(interW),
        lit(0L)))
      .drop("__bneg")
    counts
      .join(bucketNeg, Seq("__b"))
      .withColumn("__lt",
        col("__below") + coalesce(sum(col("__neg")).over(intra), lit(0L)))
      .agg(sum(col("__pos")).as("n_pos"), sum(col("__neg")).as("n_neg"),
        sum(col("__pos") * (lit(2L) * col("__lt") + col("__neg")))
          .as("__num2"))
      .select(col("n_pos"), col("n_neg"),
        (col("__num2").cast("double") /
          (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
          .as("auc"))
  }

  /** Confusion matrix + exact-division summary for a boolean predictor
    * column vs binary `labelCol`: one aggregate pass emitting
    * `(tp, fp, tn, fn, accuracy, precision, recall)` as one row.
    * Counts are integer; each rate is one IEEE division (bit-portable).
    * Pair with an integer-margin predictor (`margin > 0`) to keep the
    * whole plan transcendental-free — σ(m) > ½ ⟺ m > 0, so
    * thresholding the sigmoid at 0.5 never needs the sigmoid.
    */
  def confusion(df: DataFrame, predCol: Column,
                labelCol: Column): DataFrame = {
    val y = labelCol.cast("int")
    val p = predCol.cast("int")
    df.agg(
        sum((p * y).cast("long")).as("tp"),
        sum((p * (lit(1) - y)).cast("long")).as("fp"),
        sum(((lit(1) - p) * (lit(1) - y)).cast("long")).as("tn"),
        sum(((lit(1) - p) * y).cast("long")).as("fn"))
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        ((col("tp") + col("tn")).cast("double") /
          (col("tp") + col("fp") + col("tn") + col("fn")).cast("double"))
          .as("accuracy"),
        (col("tp").cast("double") /
          (col("tp") + col("fp")).cast("double")).as("precision"),
        (col("tp").cast("double") /
          (col("tp") + col("fn")).cast("double")).as("recall"))
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
}
