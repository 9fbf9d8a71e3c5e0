package graft.agg

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class CountMinSpec extends SparkTestBase {
  import spark.implicits._

  private def stream = (Seq.fill(50)("hot") ++ Seq.fill(7)("warm") ++
    Seq("a", "b", "c", "d", "e")).zipWithIndex
    .map { case (k, i) => (i.toLong, k) }.toDF("id", "key")

  test("estimates never undercount; small sketches stay exact") {
    // width 64 >> 7 distinct keys: no collisions expected, but the
    // GUARANTEE under test is only est >= exact
    val sk = CountMin.build(stream, "key", depth = 4, width = 64, seed = 3)
    val keys = Seq("hot", "warm", "a", "never-seen").toDF("key")
    val est = CountMin.estimate(sk, keys, "key", 4, 64, 3)
      .as[(String, Long)].collect().toMap
    val exact = Map("hot" -> 50L, "warm" -> 7L, "a" -> 1L,
      "never-seen" -> 0L)
    exact.foreach { case (k, n) => assert(est(k) >= n, s"$k under") }
    // min over 4 rows of a 64-wide sketch over 7 keys: exact here
    assert(est == exact, est.toString)
  }

  test("merge of split builds == one-shot build, cell for cell") {
    val a = CountMin.build(stream.filter(col("id") % 2 === 0), "key",
      4, 32, seed = 1)
    val b = CountMin.build(stream.filter(col("id") % 2 =!= 0), "key",
      4, 32, seed = 1)
    val merged = CountMin.merge(a, b)
      .as[(Int, Int, Long)].collect().toSet
    val oneShot = CountMin.build(stream, "key", 4, 32, seed = 1)
      .as[(Int, Int, Long)].collect().toSet
    assert(merged == oneShot)
  }

  test("collisions overcount but never undercount under a tiny width") {
    // width 2 forces heavy collisions across 7 keys
    val sk = CountMin.build(stream, "key", depth = 2, width = 2, seed = 0)
    val keys = Seq("hot", "warm", "a", "b", "c", "d", "e").toDF("key")
    val est = CountMin.estimate(sk, keys, "key", 2, 2, 0)
      .as[(String, Long)].collect().toMap
    val exact = Map("hot" -> 50L, "warm" -> 7L) ++
      Seq("a", "b", "c", "d", "e").map(_ -> 1L)
    exact.foreach { case (k, n) => assert(est(k) >= n, s"$k under") }
    // total counter mass per row is conserved
    val rowMass = sk.groupBy("row").agg(sum("n").as("m"))
      .as[(Int, Long)].collect().toMap
    assert(rowMass.values.toSet == Set(62L))
  }

  test("null keys are skipped; deterministic across partitionings") {
    val withNull = stream.union(Seq((99L, null.asInstanceOf[String]))
      .toDF("id", "key"))
    val a = CountMin.build(withNull, "key", 3, 16, 5)
      .as[(Int, Int, Long)].collect().toSet
    val b = CountMin.build(withNull.repartition(9), "key", 3, 16, 5)
      .as[(Int, Int, Long)].collect().toSet
    assert(a == b)
    assert(a.toSeq.map(_._3).sum == 62L * 3) // null contributed nothing
  }
}
