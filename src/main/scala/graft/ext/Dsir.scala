package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.functions.Hashing

/** Data Selection via Importance Resampling (Xie et al., 2023) — the
  * published recipe for picking pretraining documents that "look like" a
  * target corpus: estimate token-level importance weights under a
  * hashed bag-of-ngrams model, score every raw document by its summed
  * log-likelihood ratio, and resample toward the high-weight tail.
  *
  * Spark-first shape: one explode + two conditional aggregates build the
  * B-bucket hashed model (B is a parameter, e.g. 1024 — the model is a
  * BROADCAST table no matter how large the corpus); per-document scoring
  * is explode → bucket → broadcast-join → decimal-sum — scan-shaped,
  * no shuffle wider than the per-doc aggregation, so the whole selector
  * runs at corpus scale with a model that never grows past B rows.
  * The single-scan composition ([[gramCounts]] → [[modelFromCounts]] +
  * [[scoresFromCounts]]) tokenizes the corpus exactly ONCE and derives
  * both the model and the scores from the materialized (doc, flag,
  * bucket, n) table — bit-identical to fitting and scoring separately.
  *
  * Determinism contract: the only transcendental is the per-BUCKET
  * `ln(p_target/p_raw)`, computed once per bucket and pinned to
  * DECIMAL(28,9) (the [[TextAnalysis.unigramLogProb]] convention);
  * per-document sums are decimal-exact and order-independent. Bucket
  * ids come from [[Hashing.hash64]] (md5-derived, engine-portable —
  * never Spark's xxhash).
  */
object Dsir {

  /** Hashed-ngram importance model: one row per bucket with Laplace-
    * smoothed target/raw probabilities and the DECIMAL(28,9)-pinned
    * log-ratio. `targetCol` is a boolean marking target-domain rows
    * inside `df` (the DSIR setup scores RAW docs against a target
    * sample carried in the same frame). Token stream is unigram +
    * bigram (the paper's default), hashed into `buckets` ids.
    */
  def importanceModel(df: DataFrame, textCol: String, targetCol: Column,
                      buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val hashed = ngramBuckets(df, textCol, buckets)
      .withColumn("__t", targetCol.cast("int"))
    // corpus totals re-aggregate the B-row bucket table, not the gram
    // stream; the lazy checkpoint materializes those ≤B rows once, so
    // the model is ONE pass over the corpus (without it, the two
    // references to `counts` inline the gram aggregation twice)
    val counts = hashed
      .groupBy(col("__b"))
      .agg(sum(col("__t").cast("long")).as("__ct"),
        count(lit(1)).as("__c"))
      .localCheckpoint(false)
    modelFromBucketCounts(counts, buckets)
  }

  /** Per-(doc, target-flag, bucket) gram-count table — the ONE
    * corpus-sized tokenize+hash pass, pre-aggregated to at most
    * |docs|·min(grams/doc, B) rows and lazily checkpointed so BOTH the
    * model fit ([[modelFromCounts]]) and the per-document scoring
    * ([[scoresFromCounts]]) derive from the same materialized table.
    * Without it the two consumers each inline [[ngramBuckets]] and the
    * corpus is tokenized twice — the BM25 twice-computed-subtree class
    * (PERF.md). Output: (idCol, __t INT, __b, __n). `targetCol` must be
    * per-document constant (the DSIR setup: a domain label).
    */
  def gramCounts(df: DataFrame, idCol: String, textCol: String,
                 targetCol: Column, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    ngramBuckets(df, textCol, buckets)
      .select(col(idCol), targetCol.cast("int").as("__t"), col("__b"))
      .groupBy(col(idCol), col("__t"), col("__b"))
      .agg(count(lit(1)).as("__n"))
      .localCheckpoint(false)
  }

  /** [[importanceModel]] fit from a [[gramCounts]] table instead of a
    * fresh corpus pass — exact same integer bucket counts (Σ t·n and
    * Σ n over (doc,t,b) cells equal the per-gram sums), so the model
    * is bit-identical to the one-arg path.
    */
  def modelFromCounts(counts: DataFrame, buckets: Int = 1024): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val bucketCounts = counts
      .groupBy(col("__b"))
      .agg(sum(col("__t").cast("long") * col("__n")).as("__ct"),
        sum(col("__n")).as("__c"))
      .localCheckpoint(false)
    modelFromBucketCounts(bucketCounts, buckets)
  }

  /** Shared model tail over the ≤B-row (__b, __ct, __c) bucket table
    * (already materialized by the caller — referenced twice below).
    */
  private def modelFromBucketCounts(counts: DataFrame,
                                    buckets: Int): DataFrame =
    counts
      .crossJoin(broadcast(counts.agg(
        sum(col("__ct")).as("__nt"),
        sum(col("__c")).as("__n"))))
      .select(col("__b").as("bucket"), col("__ct").as("n_target"),
        (col("__c") - col("__ct")).as("n_raw"),
        // Laplace +1 over B buckets: exact integer ratios into ln
        log(((col("__ct") + lit(1L)).cast("double") /
            (col("__nt") + lit(buckets.toLong)).cast("double")) /
          ((col("__c") - col("__ct") + lit(1L)).cast("double") /
            (col("__n") - col("__nt") + lit(buckets.toLong))
              .cast("double")))
          .cast(DecimalType(28, 9)).as("log_ratio"))

  /** Per-document importance score: Σ over the doc's hashed ngrams of
    * the model's log-ratio — decimal-exact, order-independent. Output:
    * (idCol, n_ngrams, weight DOUBLE). Model rides as a broadcast join
    * (B rows); unseen buckets contribute nothing (inner join — they
    * cannot occur when the model was fit on a superset of the scored
    * corpus, the DSIR setup).
    */
  def importanceScores(df: DataFrame, idCol: String, textCol: String,
                       model: DataFrame, buckets: Int = 1024): DataFrame =
    ngramBuckets(df, textCol, buckets)
      .join(broadcast(model.select(col("bucket").as("__b"),
        col("log_ratio"))), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_ngrams"),
        sum(col("log_ratio")).cast("double").as("weight"))

  /** [[importanceScores]] from a [[gramCounts]] table: n·log_ratio per
    * (doc, bucket) cell replaces n repeated decimal additions — and is
    * bit-identical to them, PROVIDED the product stays inside
    * DECIMAL(38,9). The count leg is cast to DECIMAL(9,0) (one bucket
    * repeating > 10^9 times inside one document is not a real corpus)
    * so 9 + 28 + 1 = 38: Spark keeps the full scale 9 instead of
    * silently dropping to scale 6 the way a raw long×decimal multiply
    * (precision 49 → capped) would. If a count DOES exceed the
    * DECIMAL(9,0) cast (nulling the term and silently dropping it from
    * `weight` while `n_ngrams` kept the raw sum — an inconsistent
    * score), the per-doc max-count guard raise_error()s instead.
    */
  def scoresFromCounts(counts: DataFrame, idCol: String,
                       model: DataFrame): DataFrame =
    counts
      .join(broadcast(model.select(col("bucket").as("__b"),
        col("log_ratio"))), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__n")).as("n_ngrams"),
        max(col("__n")).as("__mx"),
        sum(col("__n").cast(DecimalType(9, 0)) * col("log_ratio"))
          .cast("double").as("__w"))
      .select(col(idCol), col("n_ngrams"),
        when(col("__mx") < 1000000000L, col("__w"))
          .otherwise(raise_error(concat(
            lit("scoresFromCounts: per-doc bucket count "), col("__mx"),
            lit(" exceeds DECIMAL(9,0); weight would silently drop the term")))
            .cast("double"))
          .as("weight"))

  /** Top-k selection by importance weight (the resampling step's
    * deterministic top-quantile variant): global TakeOrderedAndProject
    * on (weight desc, id) — no full sort materialized. For true
    * Gumbel-top-k resampling compose with
    * [[Sampling.weightedPrioritySample]] instead.
    */
  def selectTopK(scores: DataFrame, idCol: String, k: Int): DataFrame =
    scores.orderBy(col("weight").desc, col(idCol)).limit(k)

  /** Row-per-ngram frame: doc columns + `__b` (hashed bucket id of each
    * unigram and adjacent bigram). Row-local: tokenize once, build the
    * bigram list with a slice+zip (no self-join), explode the unioned
    * list. Kept internal-shaped (leading `__`) but public for specs.
    */
  def ngramBuckets(df: DataFrame, textCol: String,
                   buckets: Int): DataFrame = {
    val withToks = df.withColumn("__toks",
      split(lower(col(textCol)), " "))
    val grams = concat(
      col("__toks"),
      zip_with(
        slice(col("__toks"), lit(1),
          greatest(size(col("__toks")) - 1, lit(0))),
        slice(col("__toks"), lit(2),
          greatest(size(col("__toks")) - 1, lit(0))),
        (a, b) => concat_ws(" ", a, b)))
    withToks
      .withColumn("__g", explode(grams))
      .withColumn("__b", pmod(Hashing.hash64(col("__g"), seed = 41),
        lit(buckets.toLong)))
      .drop("__toks", "__g")
  }
}
