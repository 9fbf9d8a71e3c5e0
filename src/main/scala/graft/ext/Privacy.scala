package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Privacy risk measurement over quasi-identifiers — the re-identification
  * audit a curation pipeline runs before releasing a training corpus
  * carrying user-derived records (complements [[TextAnalysis.piiScan]]:
  * PII scanning finds direct identifiers inside text, these find
  * IMPLICIT identification through attribute combinations).
  *
  * Both are single `groupBy(quasi-identifiers)` passes — partial
  * aggregation map-side, |equivalence classes| rows after the shuffle,
  * no row-level state. At 100 TB the class table is the small output;
  * the only care needed is QI-combination skew (a dominant class is
  * one hot group — AQE handles it, and the aggregate is just counts).
  */
object Privacy {

  /** k-anonymity audit: every combination of `qiCols` (an equivalence
    * class) with its row count and an `at_risk` flag — a class smaller
    * than `k` means those rows are re-identifiable within the release
    * (Sweeney's k-anonymity: each record must be indistinguishable
    * from at least k−1 others on the quasi-identifiers).
    */
  def kAnonymity(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"))
      .withColumn("at_risk", col("n_rows") < k)
  }

  /** l-diversity audit: per equivalence class, the number of DISTINCT
    * values of `sensitiveCol` — a class can be k-anonymous yet leak the
    * sensitive attribute outright when every member shares one value
    * (Machanavajjhala et al.); `diverse` requires at least `l` distinct
    * sensitive values. Exact distinct per group (two-level aggregate);
    * swap in an HLL sketch when classes are huge and ±2 % suffices.
    */
  def lDiversity(df: DataFrame, qiCols: Seq[String],
                 sensitiveCol: String, l: Long): DataFrame = {
    require(qiCols.nonEmpty, "need at least one quasi-identifier column")
    require(l >= 2, s"l must be >= 2, got $l")
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("diverse", col("n_sensitive") >= l)
  }

  /** k-anonymity ENFORCEMENT (suppression): drop every row whose
    * equivalence class is smaller than `k` — after this, the release
    * IS k-anonymous on `qiCols` by construction (suppression is the
    * bluntest of the k-anonymity mechanisms; generalization keeps more
    * rows but needs a domain hierarchy). One aggregate to find the
    * risky classes + one semi-join back — the class table is the small
    * side and broadcasts.
    */
  def suppressRisky(df: DataFrame, qiCols: Seq[String], k: Long): DataFrame = {
    val safe = kAnonymity(df, qiCols, k)
      .filter(!col("at_risk"))
      .select(qiCols.map(col): _*)
    df.join(broadcast(safe), qiCols, "left_semi")
  }

  /** Corpus-level k-anonymity summary: one row —
    * (n_classes, n_risky_classes, n_rows, n_risky_rows, min_class_size)
    * — the go/no-go gate number. Derived from [[kAnonymity]]'s class
    * table, so it costs one extra aggregate over |classes| rows.
    */
  def kAnonymitySummary(df: DataFrame, qiCols: Seq[String],
                        k: Long): DataFrame =
    kAnonymity(df, qiCols, k).agg(
      count(lit(1)).as("n_classes"),
      sum(when(col("at_risk"), 1L).otherwise(0L)).as("n_risky_classes"),
      sum(col("n_rows")).as("n_rows"),
      sum(when(col("at_risk"), col("n_rows")).otherwise(0L))
        .as("n_risky_rows"),
      min(col("n_rows")).as("min_class_size"))

  /** Differentially-private count release (the Laplace mechanism,
    * Dwork et al. 2006): per-group counts with Laplace(1/ε) noise —
    * counting queries have sensitivity 1, so adding or removing any one
    * row changes each released number by at most 1 and the release is
    * ε-DP. The aggregation side is one `groupBy` pass; the noise is a
    * row-local expression over the |groups| output — nothing about the
    * mechanism touches the data scan.
    *
    * Noise is DETERMINISTIC by design (and that is a feature, not a
    * test convenience: re-running the release must not spend fresh ε
    * budget or let an adversary average independent noise draws away).
    * The draw inverts the Laplace CDF at a uniform derived from the
    * 60-bit md5 hash of the group key + seed ([[Hashing.hash64]] — the
    * engine-portable hash every sampling operator here uses):
    * u = (h + ½)/2⁶⁰ ∈ (0,1) exactly (power-of-two division), centered
    * c = u − ½, noise = −(1/ε)·sgn(c)·ln(1−2|c|), rounded to 6 dp (the
    * repo's pinned-transcendental convention — ln is the one op libms
    * disagree on in the last ulp).
    *
    * Output: group keys + `n_noisy` (DOUBLE). The TRUE count is
    * deliberately not a column — releasing it beside the noise would
    * defeat the mechanism; callers auditing utility can join back to
    * [[kAnonymity]]'s class table.
    */
  /** Randomized response (Warner 1965 — LOCAL differential privacy,
    * the per-record complement of [[dpCounts]]' central mechanism):
    * each row keeps its true category with probability 1−p and
    * otherwise reports a uniform draw from `domain` — so no single
    * released ROW is trustworthy, yet aggregate counts debias exactly:
    * E[noisy_c] = n_c·(1−p) + n·p/k  ⟹  n̂_c = (noisy_c − n·p/k)/(1−p).
    *
    * The flip decisions are deterministic md5 draws keyed on `idCol`
    * (same rationale as [[dpCounts]]: replays must not give an
    * averaging adversary fresh randomness). Row-local expressions;
    * the domain rides the plan as literals.
    *
    * Returns `df` with `catCol` REPLACED by its randomized value.
    * `p` is taken in thousandths (pT/1000) so the keep/flip threshold
    * is exact integer arithmetic.
    */
  def randomizedResponse(df: DataFrame, idCol: String, catCol: String,
                         domain: Seq[String], pThousandths: Int,
                         seed: Int = 0): DataFrame = {
    require(domain.nonEmpty, "need the category domain")
    require(pThousandths >= 0 && pThousandths <= 1000,
      s"p in [0,1000] thousandths, got $pThousandths")
    val flip = pmod(Hashing.hash64(col(idCol).cast("string"), seed),
      lit(1000L)) < pThousandths
    val draw = pmod(Hashing.hash64(col(idCol).cast("string"), seed + 1),
      lit(domain.size.toLong))
    val uniform = domain.zipWithIndex.reverse
      .foldLeft(lit(domain.last)) { case (acc, (v, i)) =>
        when(draw === i.toLong, lit(v)).otherwise(acc)
      }
    df.withColumn(catCol, when(flip, uniform).otherwise(col(catCol)))
  }

  /** Debiased count estimates from a randomized-response release:
    * per category, the noisy count and the unbiased estimate
    * n̂_c = (noisy_c − n·p/k)/(1−p) (one fixed sequence of
    * correctly-rounded IEEE ops — bit-portable). Categories absent
    * from the release still debias (noisy 0), provided via `domain`.
    */
  def rrDebias(noisy: DataFrame, catCol: String, domain: Seq[String],
               pThousandths: Int): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast => bc}
    val spark = noisy.sparkSession
    import spark.implicits._
    val counts = noisy.groupBy(col(catCol))
      .agg(count(lit(1)).as("n_noisy"))
    val full = domain.toDF(catCol)
      .join(counts, Seq(catCol), "left")
      .select(col(catCol), coalesce(col("n_noisy"), lit(0L)).as("n_noisy"))
    val total = full.agg(sum(col("n_noisy")).as("__n"))
    val p = pThousandths.toDouble / 1000.0
    val k = domain.size.toDouble
    full.crossJoin(bc(total))
      .select(col(catCol), col("n_noisy"),
        ((col("n_noisy").cast("double") -
          col("__n").cast("double") * lit(p) / lit(k)) /
          lit(1.0 - p)).as("n_est"))
  }

  def dpCounts(df: DataFrame, keys: Seq[String], epsilon: Double,
               seed: Int = 0): DataFrame = {
    require(keys.nonEmpty, "need at least one grouping column")
    require(epsilon > 0, s"epsilon must be > 0, got $epsilon")
    val keyStr = concat_ws("|", keys.map(col): _*)
    val h = Hashing.hash64(keyStr, seed)
    // mask the 60-bit hash to 52 bits BEFORE the int→double cast: a
    // 52-bit integer (and 52-bit integer + 0.5, spacing 0.5 up to 2^52)
    // is exactly representable, so u = (h52 + 0.5)/2^52 ∈ (0,1) never
    // hits an endpoint BY CONSTRUCTION and ln's argument 1−2|c| ∈ (0,1]
    // is always valid. (The unmasked form broke the invariant: casting
    // h ≥ 2^60−64 rounds up to 2^60 → u = 1.0 → ln(0) → a null count
    // for ~64/2^60 of keys.)
    val u = (h.bitwiseAND(lit((1L << 52) - 1)).cast("double") +
      lit(0.5)) / lit(math.pow(2, 52))
    val c = u - lit(0.5)
    val noise = round(
      lit(-1.0 / epsilon) * signum(c) * log(lit(1.0) - lit(2.0) * abs(c)), 6)
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .select(keys.map(col) :+
        (col("__n").cast("double") + noise).as("n_noisy"): _*)
  }
}
