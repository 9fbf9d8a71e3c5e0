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
}
