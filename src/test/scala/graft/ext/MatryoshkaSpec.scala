package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Truncated-dimension (matryoshka) retrieval eval: the fullDim row is
  * recall 1.0 by construction, every recall is a valid fraction of k,
  * hand-checkable geometry ranks correctly, and the result is
  * partitioning-invariant (exact integer dots).
  */
class MatryoshkaSpec extends SparkTestBase {
  import spark.implicits._

  test("fullDim rows report recall exactly 1.0; all recalls in [0,1]") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = Similarity.truncatedRecall(emb, "vec_id", "embedding",
      queryIds = Seq(0L, 1L, 2L), k = 10, dims = Seq(8, 32), fullDim = 64)
      .collect()
    assert(out.length == 9) // 3 queries × (2 dims + fullDim)
    out.foreach { r =>
      val (d, hits, rec) = (r.getInt(1), r.getLong(2), r.getDouble(3))
      assert(hits >= 0 && hits <= 10)
      assert(rec >= 0.0 && rec <= 1.0)
      if (d == 64) assert(rec == 1.0, s"fullDim recall was $rec")
    }
  }

  test("hand-checkable geometry: truncation flips the winner") {
    // query (1, 0, 10): at d=2 the truncated query is (1, 0) — nearest
    // truncated candidate is (1, 0)=id 10; at full d=3 the third
    // coordinate dominates and (0, 0, 10)=id 11 wins.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 10.0f)),
      (10L, Array(1.0f, 0.0f, -10.0f)),
      (11L, Array(0.0f, 0.1f, 10.0f))).toDF("vec_id", "embedding")
    val out = Similarity.truncatedRecall(emb, "vec_id", "embedding",
      queryIds = Seq(0L), k = 1, dims = Seq(2), fullDim = 3)
      .collect().map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(out(3) == 1.0)  // sanity row
    assert(out(2) == 0.0)  // truncated winner 10 is not the full winner 11
  }

  test("partitioning-invariant") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.truncatedRecall(df, "vec_id", "embedding",
        queryIds = Seq(0L, 1L), k = 5, dims = Seq(16), fullDim = 64)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(run(emb.repartition(1)) == run(emb.repartition(5)))
  }
}
