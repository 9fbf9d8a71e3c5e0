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
}
