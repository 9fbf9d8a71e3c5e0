package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Length-bucketed batch construction: bucket edges, per-bucket rank
  * correctness via the two-phase prefix (vs a plain window reference),
  * and partitioning invariance of the assignment.
  */
class BatchingSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(n: Int) =
    (0 until n).map(i => (i.toLong, ((i * 37) % 1200).toLong))
      .toDF("doc_id", "len0")

  test("bucket edges are inclusive upper bounds; last bucket open") {
    val out = TextAnalysis.lengthBatches(
        Seq((1L, 200L), (2L, 201L), (3L, 500L), (4L, 501L), (5L, 9999L))
          .toDF("doc_id", "len0"),
        "doc_id", "len0", Seq(200L, 500L), batchSize = 10)
      .select("doc_id", "len_bucket").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L))
  }

  test("two-phase rank == plain per-bucket window rank") {
    val d = docs(500)
    val got = TextAnalysis.lengthBatches(d, "doc_id", "len0",
        Seq(300L, 700L), batchSize = 16, idBucketWidth = 50)
      .select("doc_id", "len_bucket", "batch_idx", "batch_pos")
      .as[(Long, Long, Long, Long)].collect().toSet
    import org.apache.spark.sql.expressions.Window
    val bucket = when(col("len0") > 700, 2L)
      .when(col("len0") > 300, 1L).otherwise(0L)
    val w = Window.partitionBy(col("len_bucket")).orderBy(col("doc_id"))
    val want = d.withColumn("len_bucket", bucket)
      .withColumn("rnk", row_number().over(w).cast("long") - 1L)
      .select(col("doc_id"), col("len_bucket"),
        (col("rnk") / 16).cast("long").as("batch_idx"),
        (col("rnk") % 16).as("batch_pos"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got == want)
  }

  test("assignment is partitioning-invariant") {
    val d = docs(300)
    val a = TextAnalysis.lengthBatches(d.repartition(1), "doc_id", "len0",
        Seq(400L), batchSize = 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val b = TextAnalysis.lengthBatches(
        d.repartition(7, col("len0")), "doc_id", "len0",
        Seq(400L), batchSize = 8)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(a == b)
  }

  test("every batch but each bucket's last is exactly batchSize") {
    val out = TextAnalysis.lengthBatches(docs(400), "doc_id", "len0",
        Seq(300L, 700L), batchSize = 32)
      .groupBy("len_bucket", "batch_idx").count()
    val perBucketMax = out.groupBy("len_bucket")
      .agg(max("batch_idx").as("last"))
    val nonLast = out.join(perBucketMax, Seq("len_bucket"))
      .filter(col("batch_idx") =!= col("last"))
      .select("count").as[Long].collect()
    assert(nonLast.forall(_ == 32L))
  }
}
