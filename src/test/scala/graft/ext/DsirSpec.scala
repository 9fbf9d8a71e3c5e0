package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DSIR importance selection: ngram extraction shape, model accounting
  * invariants, selection behavior, and partitioning invariance of the
  * decimal-pinned scores.
  */
class DsirSpec extends SparkTestBase {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "the cat and the dog", true),
      (2L, "the bird and a fish", true),
      (3L, "der hund und die katze", false),
      (4L, "el gato y el perro", false),
      (5L, "the cat and a bird", false) // raw doc made of target words
    ).toDF("id", "text", "is_en")
  }

  test("ngramBuckets emits 2n-1 grams per doc, ids in [0, B)") {
    val g = Dsir.ngramBuckets(docs, "text", buckets = 32)
    val per = g.groupBy(col("id")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every doc here has 5 tokens: 5 unigrams + 4 bigrams
    assert(per.values.toSet == Set(9L))
    val ids = g.select(col("__b")).collect().map(_.getLong(0))
    assert(ids.forall(b => b >= 0 && b < 32))
    // single-token doc: exactly one gram
    import spark.implicits._
    val one = Dsir.ngramBuckets(Seq((9L, "hello")).toDF("id", "text"),
      "text", 32)
    assert(one.count() == 1)
  }

  test("model accounting: bucket counts partition the gram stream") {
    val m = Dsir.importanceModel(docs, "text", col("is_en"), buckets = 16)
      .collect()
    assert(m.length <= 16)
    val nt = m.map(_.getLong(1)).sum  // n_target
    val nr = m.map(_.getLong(2)).sum  // n_raw
    assert(nt == 2 * 9 && nr == 3 * 9)
  }

  test("target-vocabulary raw doc outscores off-domain raw docs") {
    val model = Dsir.importanceModel(docs, "text", col("is_en"),
      buckets = 64)
    val scores = Dsir.importanceScores(docs.filter(!col("is_en")), "id",
        "text", model, buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(5L) > scores(3L) && scores(5L) > scores(4L),
      s"doc 5 (target words) should outrank: $scores")
    val top = Dsir.selectTopK(
      Dsir.importanceScores(docs.filter(!col("is_en")), "id", "text",
        model, buckets = 64), "id", 1).collect()
    assert(top.length == 1 && top(0).getLong(0) == 5L)
  }

  test("scores are partitioning-invariant (decimal-pinned sums)") {
    val model = Dsir.importanceModel(docs, "text", col("is_en"),
      buckets = 16)
    def run(parts: Int) =
      Dsir.importanceScores(docs.repartition(parts), "id", "text",
          model, buckets = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }
}
