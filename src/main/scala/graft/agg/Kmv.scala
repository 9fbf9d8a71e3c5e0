package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** K-minimum-values sketch as relational state (Bar-Yossef et al. 2002,
  * Beyer et al. 2007) — the third member of the mergeable-sketch family
  * next to [[CountMin]] (frequencies) and the HLL rollups (pure
  * cardinality): a KMV keeps the k SMALLEST hash values of a key set,
  * which yields a distinct-count estimate AND — because two KMVs
  * union into the KMV of the union — a Jaccard/overlap estimate
  * between columns that never sat in the same table. That overlap
  * number is what a join planner wants before committing to a
  * strategy, and what an FK-discovery profiler scores candidates with.
  *
  * The sketch is a k-row table of hash values: build is
  * distinct→hash→TakeOrdered (no full sort — Spark plans
  * `TakeOrderedAndProject`); merge is union→TakeOrdered. Hashes are
  * [[Hashing.hash64]] md5 derivations, so every estimate is
  * re-derivable exactly by any engine — the estimates are
  * DETERMINISTIC functions of the data, not of a run.
  *
  * Estimator conventions (both exact-integer-ratio IEEE divisions):
  *   - distinct: (k−1)·2⁶⁰ / max(kmv) when the sketch is full, else
  *     the sketch size itself (the set was smaller than k — exact).
  *   - Jaccard(A,B): |K(A∪B) ∩ A's sketch ∩ B's sketch| / k over the
  *     union's KMV (Beyer et al.'s unbiased form).
  */
object Kmv {

  private val HashSpace = math.pow(2, 60) // hash64 range as double

  /** The k smallest distinct key hashes: one column `hv`. */
  def sketch(df: DataFrame, keyCol: String, k: Int,
             seed: Int = 0): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    df.filter(col(keyCol).isNotNull)
      .select(Hashing.hash64(col(keyCol).cast("string"), seed).as("hv"))
      .distinct()
      .orderBy(col("hv"))
      .limit(k)
  }

  /** KMV of the UNION of the sketched sets: union → k smallest. */
  def merge(k: Int, sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "nothing to merge")
    sketches.reduce(_ unionByName _)
      .distinct()
      .orderBy(col("hv"))
      .limit(k)
  }

  /** One-row distinct-count estimate: exact when |set| < k (the sketch
    * is the whole hashed set), (k−1)/max otherwise.
    */
  def distinctEstimate(sketch: DataFrame, k: Int): DataFrame =
    sketch.agg(count(lit(1)).as("__n"), max(col("hv")).as("__mx"))
      .select(
        when(col("__n") < k, col("__n").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
            col("__mx").cast("double"))
          .as("distinct_est"))

  /** One-row Jaccard estimate between two sketched key sets, plus the
    * union's distinct estimate — both from the merged KMV and two
    * broadcast semi-join membership counts.
    */
  def jaccardEstimate(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    val u = merge(k, a, b).localCheckpoint(false) // referenced 3×
    val inBoth = u
      .join(broadcast(a), Seq("hv"), "left_semi")
      .join(broadcast(b), Seq("hv"), "left_semi")
      .agg(count(lit(1)).as("__m"))
    val uStats = u.agg(count(lit(1)).as("__ku"), max(col("hv")).as("__mx"))
    inBoth.crossJoin(uStats)
      .select(
        (col("__m").cast("double") / col("__ku").cast("double"))
          .as("jaccard_est"),
        when(col("__ku") < k, col("__ku").cast("double"))
          .otherwise(lit((k - 1).toDouble) * lit(HashSpace) /
            col("__mx").cast("double"))
          .as("union_distinct_est"))
  }
}
