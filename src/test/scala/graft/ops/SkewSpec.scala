package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.io.Tables

class SkewSpec extends SparkTestBase {

  test("saltedGroupSum == plain groupBy sum (exact, via decimal)") {
    val o = Tables.load(spark, sf, "orders")
      .withColumn("p", col("o_totalprice")
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)))
    val plain = o.groupBy("o_orderstatus")
      .agg(sum("p").cast("double").as("t"))
      .orderBy("o_orderstatus").collect()
    val salted = Skew.saltedGroupSum(o, Seq("o_orderstatus"), "p",
      spreadOn = col("o_orderkey"), buckets = 8)
      .select(col("o_orderstatus"), col("p").cast("double").as("t"))
      .orderBy("o_orderstatus").collect()
    assert(plain.toSeq == salted.toSeq)
  }

  test("salt is deterministic and bounded") {
    val s = Tables.load(spark, sf, "orders")
      .select(Skew.salt(col("o_orderkey"), 16).as("s"))
    val vals = s.agg(min("s"), max("s")).head()
    assert(vals.getInt(0) >= 0 && vals.getInt(1) < 16)
    val a = s.collect().map(_.getInt(0)).toSeq
    val b = s.collect().map(_.getInt(0)).toSeq
    assert(a == b)
  }

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // the runtime complement of manual salting: one hot key, shuffle
    // join, thresholds lowered so the test corpus trips the same
    // OptimizeSkewedJoin path a 100 TB hot key would
    import spark.implicits._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.2")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 50k rows on ONE key vs a near-uniform remainder
      val left = spark.range(0, 52000)
        .select(when($"id" < 50000, 0L).otherwise($"id" % 40).as("k"),
          $"id".as("v"))
      val right = spark.range(0, 40).select($"id".as("k"), ($"id" * 10).as("w"))
      val joined = left.join(right, "k")
      // materialize THIS QueryExecution (count() would build another one
      // and leave this plan un-executed, isFinalPlan=false)
      assert(joined.collect().length == 52000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-split join in final plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("saltedJoin == plain inner join, including m:n key matches") {
    import spark.implicits._
    // hot key 1 on both sides (3×2 fan-out), plus unmatched rows each way
    val big = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "d"), (9L, "x"))
      .toDF("k", "bv")
    val other = Seq((1L, 10), (1L, 20), (2L, 30), (7L, 99))
      .toDF("k", "ov")
    val plain = big.join(other, Seq("k"), "inner")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sorted.toSeq
    val salted = Skew.saltedJoin(big, other, key = "k",
        spreadOn = col("bv"), buckets = 4)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .sorted.toSeq
    assert(salted == plain)
    assert(plain.size == 7) // 3·2 for key 1 + 1·1 for key 2
  }
}
