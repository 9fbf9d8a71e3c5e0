package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Trainable document-quality classifier — the fastText/DSIR-style
  * quality-filter step of an LLM data pipeline: hand-rolled logistic
  * regression over row-local text features, trained with full-batch
  * gradient descent on the [[Similarity.kmeans]] pattern: per-iteration
  * driver state is O(model) (one weight per feature), each iteration is
  * ONE corpus scan collapsing map-side into a single J-column gradient
  * row — no per-row state, no shuffle wider than one row, scale-invariant
  * by construction.
  *
  * Determinism contract: per-row gradient terms are cast to
  * DECIMAL(28,9) before summing (the [[TextAnalysis.unigramLogProb]]
  * convention), so a step — and therefore the whole training run — is
  * bit-reproducible under any partitioning; the first step from w = 0 is
  * additionally engine-exact (sigmoid(0) = 1/2 exactly, so terms are
  * integer multiples of 1/2 with no transcendental anywhere), which is
  * what the DuckDB oracle checks.
  */
object Classifier {

  /** Row-local integer feature columns for a document text column —
    * cheap, codegen'd, shuffle-free: bias, token count, char count,
    * stopword hits.
    */
  def features(textCol: Column): Seq[(String, Column)] = {
    val toks = split(lower(textCol), " ")
    Seq(
      "bias" -> lit(1L),
      "n_tokens" -> size(toks).cast("long"),
      "n_chars" -> length(textCol).cast("long"),
      "stop_hits" -> TextAnalysis.vocabHits(toks,
        Seq("the", "and", "of", "to", "a")).cast("long"))
  }

  /** One full-batch gradient step as a DataFrame of
    * (feature, grad, w_next) rows: `grad_j = Σ_i x_ij·(σ(w·x_i) − y_i)`,
    * `w'_j = w_j − lr·grad_j/n`. Weights are literals in the plan (the
    * codebook-as-parameter pattern), so the margin and per-feature terms
    * evaluate inside the scan projection; the only aggregation is the
    * one-row gradient. With `w = 0` (the oracle-checked query) σ(w·x) is
    * exactly 1/2 and every term is exact.
    */
  def logregStepTable(df: DataFrame, feats: Seq[(String, Column)],
                      labelCol: Column, w: Seq[Double],
                      lr: Double): DataFrame = {
    require(feats.nonEmpty && feats.size == w.size,
      "need one weight per feature")
    val margin = feats.zip(w)
      .map { case ((_, x), wj) => x.cast("double") * lit(wj) }
      .reduce(_ + _)
    val p =
      if (w.forall(_ == 0.0)) lit(0.5) // exact: σ(0) = 1/2, no exp in plan
      else lit(1.0) / (lit(1.0) + exp(-margin))
    val aggs = feats.zipWithIndex.map { case ((_, x), j) =>
      sum((x.cast("double") * (p - labelCol.cast("double")))
        .cast(DecimalType(28, 9))).cast("double").as(s"__g$j")
    } :+ count(lit(1)).cast("double").as("__n")
    val row = df.agg(aggs.head, aggs.tail: _*)
    row.select(explode(array(feats.zipWithIndex.map { case ((name, _), j) =>
        struct(lit(name).as("feature"), col(s"__g$j").as("grad"),
          (lit(w(j)) - lit(lr) * (col(s"__g$j") / col("__n")))
            .as("w_next"))
      }: _*)).as("r"))
      .select(col("r.feature"), col("r.grad"), col("r.w_next"))
  }

  /** Per-feature standardization parameters (mean, std) computed from
    * exact integer sums: `mean = Σx/n`, `var = (Σx² − (Σx)²/n)/n`,
    * `std = √var` — every op exactly-rounded IEEE, so the parameters
    * are bit-reproducible under any partitioning. One scan, one row.
    */
  def fitScaler(df: DataFrame,
                feats: Seq[(String, Column)]): Seq[(Double, Double)] = {
    val aggs = feats.zipWithIndex.flatMap { case ((_, x), j) =>
      Seq(sum(x.cast("long")).as(s"__s$j"),
        sum(x.cast("long") * x.cast("long")).as(s"__q$j"))
    } :+ count(lit(1)).as("__n")
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    // count is 0 (not null) on an empty frame; the sums WOULD be null —
    // check before any getLong unboxes one into an NPE
    require(r.getLong(2 * feats.size) > 0,
      "fitScaler needs at least one row")
    val n = r.getLong(2 * feats.size).toDouble
    feats.indices.map { j =>
      val sx = r.getLong(2 * j).toDouble
      val sq = r.getLong(2 * j + 1).toDouble
      val mean = sx / n
      val v = (sq - sx * sx / n) / n
      (mean, if (v > 0) math.sqrt(v) else 1.0)
    }
  }

  /** Full-batch gradient-descent training: `iters` rounds, each one
    * distributed step whose J-element gradient row is collected back
    * into the next round's literal weights — O(model) driver state,
    * O(iters) jobs. Features are standardized with [[fitScaler]]
    * parameters (computed once, applied row-locally as literals);
    * the bias stays raw. Returns weights aligned to `feats`,
    * interpretable against standardized inputs.
    */
  def train(df: DataFrame, feats: Seq[(String, Column)], labelCol: Column,
            iters: Int, lr: Double): Seq[Double] = {
    val scale = fitScaler(df, feats)
    val zfeats = feats.zip(scale).zipWithIndex.map {
      case (((name, x), (m, s)), j) =>
        if (j == 0) name -> x.cast("double") // bias: raw
        else name -> ((x.cast("double") - lit(m)) / lit(s))
    }
    var w = Seq.fill(feats.size)(0.0)
    (0 until iters).foreach { _ =>
      val step = logregStepTable(df, zfeats, labelCol, w, lr)
        .select(col("feature"), col("w_next")).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      w = feats.map { case (name, _) => step(name) }
    }
    w
  }

  /** Row-local scoring column σ(w·x) for trained weights (literals in
    * the plan — scoring 100 TB is scan → project). Pair with a threshold
    * for the quality gate, or keep the probability as a sort key for
    * curriculum ordering.
    */
  def scoreWith(feats: Seq[(String, Column)], w: Seq[Double]): Column = {
    val margin = feats.zip(w)
      .map { case ((_, x), wj) => x.cast("double") * lit(wj) }
      .reduce(_ + _)
    lit(1.0) / (lit(1.0) + exp(-margin))
  }

  /** Leave-one-out target encoding with prior smoothing (Micci-Barreca
    * 2001): replace a high-cardinality categorical with
    *   enc = (Σ_cat y − y_own + m·ȳ) / (n_cat − 1 + m)
    * — the category's label mean EXCLUDING the row's own label (the
    * leakage that makes naive target encoding overfit) shrunk toward
    * the global mean by pseudo-count `m`. Singleton categories fall
    * back to pure prior (n−1 = 0 ⟹ enc = ȳ, m > 0 required).
    *
    * One (category) aggregate broadcast-joined back + a 1-row global
    * aggregate riding the plan — per-row arithmetic after that, no
    * second scan of the label column. Integer label sums; doubles
    * enter at three correctly-rounded ops in fixed order (global mean,
    * the m·ȳ product, the final division), so the encoding is
    * bit-portable.
    */
  def targetEncode(df: DataFrame, catCol: String, labelCol: Column,
                   m: Long): DataFrame = {
    require(m > 0, s"prior pseudo-count m must be > 0, got $m")
    val y = labelCol.cast("long")
    val cat = df.withColumn("__y", y)
    val perCat = cat.groupBy(col(catCol))
      .agg(count(lit(1)).as("__n"), sum(col("__y")).as("__s"))
    val global = cat.agg(
      (sum(col("__y")).cast("double") / count(lit(1)).cast("double"))
        .as("__gmean"))
    cat.join(broadcast(perCat), Seq(catCol))
      .crossJoin(broadcast(global))
      .withColumn("target_enc",
        ((col("__s") - col("__y")).cast("double") +
          lit(m.toDouble) * col("__gmean")) /
          (col("__n") - 1 + m).cast("double"))
      .drop("__y", "__n", "__s", "__gmean")
  }

  /** Weight-of-evidence encoding + information value (the credit-
    * scoring feature diagnostic; Siddiqi): per category c of a
    * categorical feature against a binary label,
    *
    *   WoE_c = ln(d_pos / d_neg),   IV = Σ_c (d_pos − d_neg)·WoE_c
    *
    * with d_pos/d_neg the Laplace-smoothed (+0.5 per cell, +0.5·K per
    * total, K = category count) shares of positives/negatives landing
    * in c — smoothing keeps ln finite for one-sided cells. IV reads as
    * the standard ladder: <0.02 useless, 0.1-0.3 medium, >0.5 suspect.
    *
    * Shape: one group-by to |categories| rows, a 1-row totals
    * broadcast, row-local ln pinned at 9 dp (the PMI convention — the
    * one transcendental, identical across engines at that precision);
    * iv terms are the pinned products so Σ is engine-portable. Output
    * per category: (cat, n, n_pos, n_neg, woe, iv_term).
    */
  def woeTable(df: DataFrame, catCol: String,
               labelCol: Column): DataFrame = {
    val y = labelCol.cast("long")
    val perCat = df.withColumn("__y", y)
      .filter(col(catCol).isNotNull)
      .groupBy(col(catCol))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("n_pos"),
        sum(lit(1L) - col("__y")).as("n_neg"))
    val totals = perCat.agg(sum(col("n_pos")).as("__tp"),
      sum(col("n_neg")).as("__tn"), count(lit(1)).as("__k"))
    val dPos = (col("n_pos").cast("double") + lit(0.5)) /
      (col("__tp").cast("double") + lit(0.5) * col("__k").cast("double"))
    val dNeg = (col("n_neg").cast("double") + lit(0.5)) /
      (col("__tn").cast("double") + lit(0.5) * col("__k").cast("double"))
    perCat.crossJoin(broadcast(totals))
      .withColumn("woe", round(log(dPos / dNeg), 9))
      .withColumn("iv_term",
        round((dPos - dNeg) * col("woe"), 9))
      .drop("__tp", "__tn", "__k")
  }
}
