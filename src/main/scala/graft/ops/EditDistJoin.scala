package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** String similarity self-join: all pairs within Levenshtein distance
  * `maxDist`, with zero recall loss.
  *
  * Candidate generation uses the length filter — edit distance ≤ d
  * implies |len(a) − len(b)| ≤ d — turned into an EQUI-join: the probe
  * side emits one row per candidate length in [len−d, len+d] (2d+1 rows
  * per input row, a constant fan-out), and the anchor side joins on its
  * own length. No theta-join, no BroadcastNestedLoopJoin: the pair space
  * is enumerated by a hash join on the candidate-length key, and each
  * qualifying pair is produced exactly once (anchor id < probe id).
  *
  * This is the exact-recall baseline of the similarity-join family (the
  * role `bruteForceTopK` plays for ANN): length alone is a coarse
  * blocking key, so candidates within a length band still verify
  * all-pairs. At 100 TB compose it with a second blocking stage — e.g.
  * group by `TextAnalysis.fingerprint` band or a q-gram signature — and
  * keep this operator as the in-band verifier; the verification cost is
  * then ∝ candidate pairs, the right asymptote. The Levenshtein verify
  * itself is Spark's built-in codegen'd expression.
  */
object EditDistJoin {

  /** Pairs (id_a < id_b) with `minDist ≤ levenshtein ≤ maxDist`.
    * Output columns: id_a, id_b, dist.
    */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
               maxDist: Int, minDist: Int = 0): DataFrame = {
    require(maxDist >= 0 && minDist >= 0 && minDist <= maxDist,
      "need 0 <= minDist <= maxDist")
    val anchor = df.select(col(idCol).as("id_a"), col(strCol).as("s_a"),
      length(col(strCol)).as("len_key"))
    val probe = df.select(col(idCol).as("id_b"), col(strCol).as("s_b"),
        explode(sequence(length(col(strCol)) - maxDist,
          length(col(strCol)) + maxDist)).as("len_key"))
    anchor.join(probe, Seq("len_key"))
      .filter(col("id_a") < col("id_b"))
      // bounded form: banded DP, O(maxDist·len) per pair with early
      // exit, returns -1 above the bound — which minDist >= 0 excludes
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= minDist && col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
