package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TypedAggsSpec extends SparkTestBase {
  import spark.implicits._

  test("WeightedMean: hand-computed, null for weightless groups") {
    val wm = udaf(TypedAggs.WeightedMean)
    // group a: (10.00 x 1, 20.00 x 3) -> 70/4 = 17.5; group b: zero weight
    val df = Seq(("a", 10.0, 1.0), ("a", 20.0, 3.0), ("b", 5.0, 0.0))
      .toDF("g", "p", "q")
    val out = df.groupBy("g").agg(wm(col("p"), col("q")).as("w"))
      .orderBy("g").as[(String, Option[Double])].collect()
    assert(out.toSeq == Seq(("a", Some(17.5)), ("b", None)))
  }

  test("WeightedMean is partitioning-invariant (exact long buffer)") {
    val wm = udaf(TypedAggs.WeightedMean)
    val li = graft.io.Tables.load(spark, sf, "lineitem")
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("l_returnflag")
        .agg(wm(col("l_extendedprice"), col("l_quantity")).as("w"))
        .orderBy("l_returnflag").as[(String, Double)].collect().toSeq
    assert(run(li) == run(li.repartition(17)))
  }

  test("CountMin: never undercounts, bounded overcount, exact on heavy keys") {
    val cms = new TypedAggs.CountMin(depth = 4, width = 256)
    val agg = udaf(cms)
    val rows = Seq.fill(300)("hot") ++ Seq.fill(100)("warm") ++
      (0 until 600).map(i => s"tail_$i")
    val df = rows.toDF("k").repartition(9)
    val cells = df.agg(agg(col("k")).as("sk"))
      .as[Array[Long]].head()
    val n = rows.size
    val exact = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    // overestimate property: est >= true for EVERY key
    exact.foreach { case (k, c) =>
      assert(cms.estimate(cells, k) >= c, s"undercount for $k")
    }
    // CM error bound (deterministic check at 2N/width, far above the
    // expected eN/width): overcount small relative to the stream
    exact.foreach { case (k, c) =>
      assert(cms.estimate(cells, k) - c <= 2L * n / 256 + 8,
        s"overcount for $k: ${cms.estimate(cells, k)} vs $c")
    }
    // every counter row sums to exactly N (no lost mass)
    (0 until 4).foreach { r =>
      assert(cells.slice(r * 256, (r + 1) * 256).sum == n.toLong)
    }
  }

  test("CountMin sketch is mergeable: identical cells at any partitioning") {
    val agg = udaf(new TypedAggs.CountMin(4, 128))
    val rows = (0 until 2000).map(i => s"k${i % 37}")
    def run(p: Int) = rows.toDF("k").repartition(p)
      .agg(agg(col("k"))).as[Array[Long]].head().toSeq
    assert(run(1) == run(13))
  }
}
