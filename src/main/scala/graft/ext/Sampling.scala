package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deterministic sampling and splitting for training-data pipelines.
  *
  * `df.sample(fraction, seed)` is only reproducible for a fixed
  * partitioning — a repartition, compaction, or engine change reshuffles
  * the RNG streams and yields a different sample. Hash-based sampling
  * keys the decision on the ROW (a stable id column), so the same row
  * lands in the same sample/split on any engine, any partitioning, any
  * day — which is what dataset reproducibility actually requires, and
  * what makes these operators oracle-checkable. All decisions are
  * row-local expressions; no shuffle, no state.
  *
  * Shared RATE RESOLUTION contract: every sampler here quantizes its
  * keep-rate to the `Buckets = 1e6` hash grid — a rate below 1e-6
  * realizes ZERO rows (e.g. a Neyman stratum allocated n_target ≥ 1
  * out of > 1e6·n_target rows). This is the deliberate price of
  * row-local decisions: a hash threshold needs a fixed grid, and 1e-6
  * already exceeds the sub-percent resolution any statistical
  * allocation of a 1e6-row stratum is meaningful at. Callers needing
  * exact small-k draws should use [[reservoirSample]] (exact k, one
  * extra top-k pass) instead of a rate.
  */
object Sampling {

  private val Buckets = 1000000L

  /** Uniform bucket in [0, 1e6) derived from the key column + seed. */
  def bucketOf(key: Column, seed: Int): Column =
    pmod(Hashing.hash64(key.cast("string"), seed), lit(Buckets))

  /** Keep ~`fraction` of rows, decided per row by hash of `keyCol`. */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
                 seed: Int = 0): DataFrame = {
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    df.filter(bucketOf(col(keyCol), seed) < (fraction * Buckets).toLong)
  }

  /** Label every row with a split name by cumulative weight: e.g.
    * Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1). Weights must
    * sum to 1 (± rounding); assignment is deterministic per key.
    */
  def splitByHash(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Double)], seed: Int = 0): DataFrame = {
    require(splits.nonEmpty && math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val b = bucketOf(col(keyCol), seed)
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail
      .map(w => (w * Buckets).toLong)
    val labeled = splits.map(_._1).zip(bounds).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, (name, hi)) =>
        when(b < hi, lit(name)).otherwise(acc)
      }
    df.withColumn("split", labeled)
  }

  /** Cluster-aware (leakage-free) split: every row whose id belongs to
    * the same near-dup cluster (connected component of `pairs`, columns
    * `id_a`/`id_b`) lands in the same split — the decontamination
    * guarantee for train/test splits over a corpus with known
    * near-duplicates: a doc's twin must not leak into eval. Each id's
    * cluster representative is its component label (singletons:
    * themselves) and the [[splitByHash]] decision is keyed on the REP,
    * not the id. Output: `df` + (`rep`, `split`).
    *
    * Scale: the component table is |clustered docs|-sized — typically a
    * small fraction of the corpus — and the rep join is the only
    * shuffle beyond what [[graft.ext.Dedup.connectedComponents]]
    * already does; the split decision itself stays row-local.
    */
  def leakFreeSplit(df: DataFrame, idCol: String, pairs: DataFrame,
                    splits: Seq[(String, Double)],
                    seed: Int = 0): DataFrame = {
    val comps = Dedup.connectedComponents(pairs)
      .select(col("doc_id").as(idCol), col("cluster_id"))
    val withRep = df.join(comps, Seq(idCol), "left")
      .withColumn("rep", coalesce(col("cluster_id"), col(idCol)))
      .drop("cluster_id")
    splitByHash(withRep, "rep", splits, seed)
  }

  /** Stratified sample: a per-stratum keep fraction (e.g. downsample
    * over-represented languages, keep all of a rare one) — the corpus
    * rebalancing step of dataset curation. The keep decision is the
    * same row-local hash bucket as [[hashSample]], so it is
    * deterministic, partitioning-invariant, and composes with splits;
    * strata not named in `fractions` keep `defaultFraction`. No
    * shuffle: one scan, one filter.
    */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
                       fractions: Map[String, Double],
                       defaultFraction: Double = 1.0,
                       seed: Int = 0): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction))
      .forall(f => f >= 0 && f <= 1), "fractions must be in [0,1]")
    val b = bucketOf(col(keyCol), seed)
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit((defaultFraction * Buckets).toLong)) {
        case (acc, (stratum, f)) =>
          when(col(strataCol) === stratum, lit((f * Buckets).toLong))
            .otherwise(acc)
      }
    df.filter(b < threshold)
  }

  /** Neyman allocation (survey-sampling optimum): for a fixed total
    * budget `totalN`, allocate per-stratum sample sizes
    * n_h ∝ N_h · σ_h — strata that are big AND variable earn budget;
    * a huge uniform stratum needs almost none. This minimizes the
    * variance of the stratified mean estimator at fixed cost.
    *
    * One DECIMAL-moment aggregate per stratum → (N_h, sample σ_h);
    * the weight N_h·σ_h pins at 6 dp and totals in exact DECIMAL
    * (order-free), shares/rates pin at 9 dp. Rates cap at 1
    * (n_h ≤ N_h); a zero-variance or single-row stratum gets σ = 0
    * and thus no budget — the formula's statement that such strata
    * contribute nothing to estimator variance.
    *
    * Returns the |strata|-row plan: (stratum, n_rows, sigma, share,
    * n_target, rate). Feed it to [[neymanSample]] for the rows.
    */
  def neymanAllocation(df: DataFrame, strataCol: String,
                       valueCol: String, totalN: Long): DataFrame = {
    require(totalN > 0, s"totalN must be > 0, got $totalN")
    val v = col(valueCol).cast(org.apache.spark.sql.types
      .DecimalType(18, 4))
    val nD = col("n_rows").cast("double")
    val perStratum = df.filter(col(valueCol).isNotNull)
      .groupBy(col(strataCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(v).cast("double").as("__s"),
        sum((v * v).cast(org.apache.spark.sql.types.DecimalType(38, 8)))
          .cast("double").as("__ss"))
      .withColumn("sigma", when(col("n_rows") > 1,
        round(sqrt(greatest(
          (col("__ss") - col("__s") * col("__s") / nD) / (nD - 1),
          lit(0.0))), 9)).otherwise(lit(0.0)))
      .withColumn("__wp", round(nD * col("sigma"), 6))
      .localCheckpoint(false) // weight total + the share unfold
    val tot = perStratum.agg(
      sum(col("__wp").cast(org.apache.spark.sql.types
        .DecimalType(28, 6))).cast("double").as("__tw"))
    // degenerate input (every stratum zero-variance or single-row) →
    // total weight 0: emit null shares/targets/rates rather than let
    // 0/0 = NaN flow silently into the plan — there is no defensible
    // allocation to report, and [[neymanSample]] then selects nothing
    perStratum.crossJoin(broadcast(tot))
      .withColumn("share",
        when(col("__tw") > 0, round(col("__wp") / col("__tw"), 9)))
      // least() skips nulls, so guard explicitly: a null share must
      // yield null target/rate, not n_rows / 1.0
      .withColumn("n_target", when(col("share").isNotNull,
        least(col("n_rows"),
          round(lit(totalN.toDouble) * col("share")).cast("long"))))
      .withColumn("rate", when(col("share").isNotNull,
        round(least(lit(1.0),
          lit(totalN.toDouble) * col("share") / nD), 9)))
      .select(col(strataCol), col("n_rows"), col("sigma"),
        col("share"), col("n_target"), col("rate"))
  }

  /** Draw the Neyman-allocated sample: the [[neymanAllocation]] rates
    * applied through the deterministic hash filter (the
    * [[stratifiedSample]] mechanism — row-identity-keyed, so the
    * realized sample is partitioning- and engine-invariant and
    * concentrates on n_h per stratum without any coordination).
    */
  def neymanSample(df: DataFrame, keyCol: String, strataCol: String,
                   valueCol: String, totalN: Long,
                   seed: Int = 0): DataFrame =
    neymanSample(df, keyCol, strataCol,
      neymanAllocation(df, strataCol, valueCol, totalN), seed)

  /** [[neymanSample]] with a PRECOMPUTED allocation plan (the
    * [[neymanAllocation]] output, or any (stratum, rate) table) — the
    * single-scan form: the convenience overload re-aggregates `df` to
    * derive the allocation, scanning the corpus twice; at 100 TB the
    * allocation should be computed once, persisted/inspected, and the
    * draw made against it. Rows in strata absent from `alloc` (or with
    * a null rate — the degenerate-allocation signal) are dropped.
    */
  def neymanSample(df: DataFrame, keyCol: String, strataCol: String,
                   alloc: DataFrame, seed: Int): DataFrame =
    df.join(broadcast(alloc.select(col(strataCol), col("rate"))),
        Seq(strataCol))
      .filter(bucketOf(col(keyCol), seed) <
        floor(col("rate") * Buckets).cast("long"))
      .drop("rate")

  /** Fixed-size uniform sample — the distributed, deterministic form of
    * reservoir sampling: keep the `k` rows with the smallest
    * (hash(key), key). Equivalent in distribution to a uniform
    * k-of-n reservoir, but the selection is a pure function of row
    * identity, so it is reproducible across engines and partitionings
    * (a classic reservoir depends on encounter order, which a shuffle
    * changes). Plans as TakeOrderedAndProject: each partition keeps its
    * local top-k, the driver merges k·P candidates — no global sort of
    * the corpus, no single-task funnel.
    */
  def reservoirSample(df: DataFrame, keyCol: String, k: Int,
                      seed: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val h = Hashing.hash64(col(keyCol).cast("string"), seed)
    df.withColumn("_h", h)
      .orderBy(col("_h"), col(keyCol))
      .limit(k)
      .drop("_h")
  }

  /** Per-group fixed-size sample: `k` deterministic rows per stratum
    * (the "pull 100 docs from every domain for inspection" query).
    * Same smallest-hash selection as [[reservoirSample]], but grouped —
    * and executed by the custom bounded-heap TopKPerKey operator, so
    * each partition keeps k candidates per key with NO per-group sort
    * (the window row_number idiom sorts every group; at web scale a
    * group is a domain with 10⁹ rows and the sort is the bottleneck).
    */
  def reservoirPerGroup(df: DataFrame, keyCol: String, strataCol: String,
                        k: Int, seed: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    org.apache.spark.sql.graft.TopKPerKey.topKPerKey(
        df.withColumn("__h",
          Hashing.hash64(col(keyCol).cast("string"), seed)),
        keys = Seq(strataCol),
        orderBy = Seq(col("__h").asc, col(keyCol).asc), k = k)
      .drop("__h")
  }

  /** Domain-mixture resampling: downsample each domain so the surviving
    * corpus matches a target mixture (e.g. 40% web / 30% books / 20%
    * code / 10% wiki) WITHOUT upsampling — the largest corpus the
    * observed counts can support is taken, so the most-constrained
    * domain keeps 100% and every other domain's keep fraction is
    * `w_d * scale / n_d` with `scale = min_d(n_d / w_d)`. Domains not
    * named in `targets` are dropped.
    *
    * Per-domain counts are one partial-aggregated group-by over a
    * handful of domains; the fractions table (|domains| rows) broadcasts
    * back and the keep decision is the same row-local hash bucket as
    * [[hashSample]] — deterministic, partitioning-invariant, one wide
    * shuffle of a few dozen rows regardless of corpus size.
    */
  def domainMix(df: DataFrame, keyCol: String, domainCol: String,
                targets: Seq[(String, Double)], seed: Int = 0): DataFrame = {
    require(targets.nonEmpty && targets.forall(_._2 > 0),
      "target weights must be positive")
    val wCol = targets.foldLeft(lit(null).cast("double")) {
      case (acc, (d, w)) => when(col(domainCol) === d, lit(w)).otherwise(acc)
    }
    // referenced twice (the scale bound and the fractions); the barrier
    // keeps the corpus group-by to ONE pass — |domains| rows
    val counts = df.groupBy(col(domainCol))
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", wCol)
      .filter(col("__w").isNotNull)
      .localCheckpoint(false)
    val scale = counts.agg(min(col("__n") / col("__w")).as("__scale"))
    val fracs = counts.crossJoin(broadcast(scale))
      .select(col(domainCol),
        least(lit(1.0), col("__w") * col("__scale") / col("__n"))
          .as("__frac"))
    df.join(broadcast(fracs), Seq(domainCol))
      .filter(bucketOf(col(keyCol), seed).cast("double") <
        col("__frac") * Buckets)
      .drop("__frac")
  }

  /** Temperature-flattened domain mixture — the multilingual-training
    * reweighting (w_d ∝ n_d^α): α = 1 keeps the natural mixture, α = 0
    * forces uniform, and the customary α ∈ [0.2, 0.7] lifts
    * low-resource domains without the overfitting a full upsample of
    * them causes. No-upsampling closed form: the most-constrained
    * domain is the SMALLEST (its n_d/w_d ∝ n_d^(1−α) is minimal), so
    * keep_d = (n_min/n_d)^(1−α) — the smallest domain survives whole
    * and larger domains downsample toward it.
    *
    * Same scale shape as [[domainMix]]: a |domains|-row broadcast of
    * fractions, row-local hash-bucket keep decisions, deterministic
    * and partitioning-invariant. At α = 0.5 the fraction is
    * `sqrt(n_min/n_d)` — two exactly-rounded IEEE ops, bit-portable to
    * any engine (used by the oracle-checked query); other α go through
    * `pow`, which is 1-ulp-correct only, so cross-engine bit parity at
    * the keep boundary is not guaranteed (fine in production, where
    * the boundary rows are arbitrary anyway).
    */
  def temperatureMix(df: DataFrame, keyCol: String, domainCol: String,
                     alpha: Double, seed: Int = 0): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"alpha must be in [0, 1], got $alpha")
    // referenced twice (the min and the fractions); the barrier keeps
    // the corpus group-by to ONE pass — the checkpoint is |domains| rows.
    // Null domains are dropped (the fraction equi-join cannot match
    // them anyway) and excluded from n_min, so an unlabeled slice can
    // never become the bottleneck every labeled domain shrinks toward
    val counts = df.filter(col(domainCol).isNotNull)
      .groupBy(col(domainCol))
      .agg(count(lit(1)).cast("double").as("__n"))
      .localCheckpoint(false)
    val nmin = counts.agg(min(col("__n")).as("__nmin"))
    val ratio = col("__nmin") / col("__n")
    val frac =
      if (alpha == 1.0) lit(1.0)
      else if (alpha == 0.5) sqrt(ratio)
      else pow(ratio, lit(1.0 - alpha))
    val fracs = counts.crossJoin(broadcast(nmin))
      .select(col(domainCol), frac.as("__frac"))
    df.join(broadcast(fracs), Seq(domainCol))
      .filter(bucketOf(col(keyCol), seed).cast("double") <
        col("__frac") * Buckets)
      .drop("__frac")
  }

  /** Deterministic negative sampling for contrastive training data:
    * `k` pseudo-random candidate ids per anchor, derived by hashing
    * (anchor, draw-index) into the dense id domain [0, max(id)] —
    * reproducible across engines and partitionings like every sampler
    * here, and collision-free with the anchor by construction (self
    * hits are filtered; callers anti-join their positive pairs).
    * The id-space bound rides the plan as a broadcast 1-row aggregate,
    * so the operator stays lazy end to end. Row-local otherwise: the
    * output is |anchors|·k rows from one scan, no shuffle.
    */
  def negativeSamples(df: DataFrame, idCol: String, k: Int,
                      seed: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val m = df.agg((max(col(idCol)) + 1).as("__m"))
    df.select(col(idCol).as("anchor_id"))
      .crossJoin(broadcast(m))
      .select(col("anchor_id"), col("__m"),
        explode(sequence(lit(0), lit(k - 1))).as("j"))
      .select(col("anchor_id"), col("j"),
        pmod(Hashing.hash64(
          concat(col("anchor_id").cast("string"), lit("#"),
            col("j").cast("string")), seed), col("__m")).as("neg_id"))
      .filter(col("neg_id") =!= col("anchor_id"))
  }

  /** Deterministic shard assignment for balanced export: shard id in
    * [0, nShards) hashed from the key — stable across engines,
    * partitionings, and reruns, so shard membership is part of the
    * dataset's identity (resumable exports, per-shard retries,
    * reader-side sharding all depend on that). Row-local, no shuffle;
    * the write path groups by `shard` (one exchange) or passes it to
    * `partitionBy`.
    */
  def shardAssign(df: DataFrame, keyCol: String, nShards: Int,
                  seed: Int = 0): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    df.withColumn("shard",
      pmod(Hashing.hash64(col(keyCol).cast("string"), seed),
        lit(nShards.toLong)).cast("int"))
  }

  /** Weighted sampling without replacement — Ohlsson's sequential
    * Poisson sampling: each row draws a deterministic uniform
    * u = (bucket + 0.5) / 1e6 from its key hash and is ranked by
    * priority u / w; the k smallest priorities are the sample.
    * Inclusion probability is ≈ proportional to weight (πps), and the
    * scheme is a published, well-studied estimator (Ohlsson 1998, used
    * by official statistics agencies) — unlike ad-hoc weight·random.
    *
    * Engine-portable determinism: the priority is two IEEE-754 double
    * divisions on integer-derived operands — exact-rounded and therefore
    * bit-identical on any IEEE engine, no transcendentals (the A-ES
    * exponential-keys variant needs ln(u), whose libm rounding differs
    * across engines). Plans as TakeOrderedAndProject: per-partition
    * top-k, driver merges k·P candidates — no global sort.
    *
    * Precondition (like the other hash-keyed samplers here): `keyCol`
    * values must be UNIQUE. Duplicate keys share the same hash-derived
    * u and therefore the same priority, and the (_pri, keyCol)
    * tie-break then leaves the choice among them at the k boundary
    * engine- and partitioning-dependent.
    */
  def weightedPrioritySample(df: DataFrame, keyCol: String,
                             weightCol: String, k: Int,
                             seed: Int = 0): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val u = (bucketOf(col(keyCol), seed).cast("double") + 0.5) / Buckets
    df.filter(col(weightCol) > 0)
      .withColumn("_pri", u / col(weightCol).cast("double"))
      .orderBy(col("_pri"), col(keyCol))
      .limit(k)
      .drop("_pri")
  }

  /** SQL fragment computing the same priority in DuckDB. */
  def prioritySql(keyExpr: String, weightExpr: String, seed: Int): String =
    s"((${bucketSql(keyExpr, seed)}) + 0.5) / $Buckets.0" +
      s" / CAST($weightExpr AS DOUBLE)"

  /** SQL fragment computing the same shard in DuckDB. */
  def shardSql(expr: String, nShards: Int, seed: Int = 0): String =
    s"CAST(${Hashing.hash64Sql(s"CAST($expr AS VARCHAR)", seed)} % $nShards AS INTEGER)"

  /** SQL fragment computing the same bucket in DuckDB. */
  def bucketSql(expr: String, seed: Int): String =
    s"${Hashing.hash64Sql(s"CAST($expr AS VARCHAR)", seed)} % $Buckets"

  /** Poisson(1) CDF thresholds scaled to the [0, 1e6) bucket grid —
    * PLAN-TIME integer literals, so the inverse-CDF draw below is pure
    * integer comparison: identical in any engine, no floating point at
    * the decision boundary. floor(1e6 · P(X ≤ k)) for k = 0..7; draws
    * cap at 8 (P(X > 8) ≈ 1e-6, one bucket value).
    */
  private[ext] val PoissonCdfBuckets: Seq[Long] =
    Seq(367879L, 735758L, 919698L, 981011L,
      996340L, 999405L, 999850L, 999956L)

  /** Poisson bootstrap — confidence intervals at corpus scale in ONE
    * pass (Chamandy et al., "Estimating uncertainty for massive data
    * streams", Google 2012; the standard trick behind distributed
    * bootstrap): instead of drawing n rows with replacement per
    * replicate (impossible distributed — it needs global coordination),
    * each row enters replicate j with an independent Poisson(1) weight,
    * which converges to the multinomial bootstrap for large n. Weights
    * are DETERMINISTIC: the inverse CDF applied to the row's hash
    * bucket for (key, replicate) — reproducible across engines,
    * partitionings, and reruns like every sampler here, and the
    * integer-threshold comparison has no float boundary.
    *
    * Output: one row per replicate with the effective sample size and
    * the weighted mean (DECIMAL-exact sums, one IEEE division). Plan:
    * explode over `replicates` ints → weight projection → partial-
    * aggregated group-by — the shuffle carries `replicates` × partials,
    * never data; CPU cost is `replicates` integer comparisons per row.
    * Replicate-mean quantiles give the CI; the caller computes them
    * over the tiny output table.
    */
  def poissonBootstrap(df: DataFrame, keyCol: String, valCol: String,
                       replicates: Int, seed: Int = 0): DataFrame = {
    require(replicates >= 1, s"replicates must be >= 1, got $replicates")
    import org.apache.spark.sql.types.DecimalType
    val u = pmod(Hashing.hash64(
      concat(col(keyCol).cast("string"), lit("#"),
        col("replicate").cast("string")), seed), lit(Buckets))
    // descending fold so the outermost branch tests the SMALLEST
    // threshold: w = min k with u < P(X <= k), capped at 8
    val w = PoissonCdfBuckets.zipWithIndex.reverse
      .foldLeft(lit(PoissonCdfBuckets.size): Column) {
        case (acc, (thr, k)) => when(u < thr, k).otherwise(acc)
      }
    df.select(col(keyCol), col(valCol))
      .withColumn("replicate",
        explode(sequence(lit(0), lit(replicates - 1))))
      .withColumn("__w", w)
      .groupBy(col("replicate"))
      .agg(sum(col("__w").cast("long")).as("n_eff"),
        sum((col("__w") * col(valCol)).cast(DecimalType(28, 6)))
          .cast("double").as("__ws"))
      .select(col("replicate"), col("n_eff"),
        // 6 dp: the weighted sum is EXACT decimal, but its cast to
        // double is allowed to differ by an ULP between engines once
        // the sum crosses 17 significant digits — which the round-12
        // ×10 oracle sweep hit (16M-row replicate sums; 6 of 16
        // replicate means differed in the last bit). Rounding the one
        // IEEE output ends the low-bit lottery without touching the
        // exact-sum arithmetic (the Profile.profile convention).
        round(col("__ws") / col("n_eff").cast("double"), 6)
          .as("boot_mean"))
  }

  /** Temporal train/test split with an EMBARGO gap (the time-series
    * leakage guard [[splitByHash]] cannot give you: hash splits
    * scatter a series' future into its training past, and even a clean
    * time cut leaks through serially-correlated rows at the boundary —
    * the embargo, per de Prado's purged CV, discards a buffer after
    * the cut so no training-window feature overlaps an eval-window
    * label). Row-local comparison against two literals; no shuffle,
    * no state, deterministic on any engine by construction.
    *
    * split = `train` (tick ≤ trainEnd), `embargo` (inside the gap,
    * excluded from both sides), `test` (tick > trainEnd + embargoTicks).
    */
  def temporalSplit(df: DataFrame, tickCol: String, trainEnd: Long,
                    embargoTicks: Long): DataFrame = {
    require(embargoTicks >= 0, s"embargo must be >= 0, got $embargoTicks")
    df.withColumn("split",
      when(col(tickCol) <= trainEnd, "train")
        .when(col(tickCol) > trainEnd + embargoTicks, "test")
        .otherwise("embargo"))
  }
}
