package graft.agg

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class KmvSpec extends SparkTestBase {
  import spark.implicits._

  test("below k the sketch IS the set: distinct estimate is exact") {
    val df = (1L to 40L).map(i => i % 25).toDF("key") // 25 distinct
    val sk = Kmv.sketch(df, "key", k = 64)
    assert(sk.count() == 25)
    val est = Kmv.distinctEstimate(sk, 64).as[Double].head()
    assert(est == 25.0)
  }

  test("above k the (k-1)/max estimate lands near the truth") {
    val n = 5000
    val df = (1L to n.toLong).toDF("key")
    val est = Kmv.distinctEstimate(Kmv.sketch(df, "key", k = 256), 256)
      .as[Double].head()
    // KMV relative error ~ 1/sqrt(k) ≈ 6%; allow 3σ
    assert(math.abs(est - n) / n < 0.20, s"est=$est truth=$n")
  }

  test("merge == sketch of the union; overlap estimate brackets truth") {
    val a = (1L to 3000L).toDF("key")
    val b = (1501L to 4500L).toDF("key") // |inter|=1500, |union|=4500
    val k = 256
    val sa = Kmv.sketch(a, "key", k).localCheckpoint(true)
    val sb = Kmv.sketch(b, "key", k).localCheckpoint(true)
    val merged = Kmv.merge(k, sa, sb).as[Long].collect().toSeq
    val direct = Kmv.sketch(a.union(b), "key", k).as[Long].collect().toSeq
    assert(merged == direct) // mergeability, value for value
    val est = Kmv.jaccardEstimate(sa, sb, k)
      .as[(Double, Double)].head()
    val trueJ = 1500.0 / 4500.0
    assert(math.abs(est._1 - trueJ) < 0.15, s"J est ${est._1} vs $trueJ")
    assert(math.abs(est._2 - 4500.0) / 4500.0 < 0.20,
      s"union est ${est._2}")
  }

  test("deterministic across partitionings and replays") {
    val df = (1L to 2000L).toDF("key")
    val s1 = Kmv.sketch(df, "key", 128).as[Long].collect().toSeq
    val s2 = Kmv.sketch(df.repartition(11), "key", 128)
      .as[Long].collect().toSeq
    assert(s1 == s2)
    // seeds give independent sketches
    val s3 = Kmv.sketch(df, "key", 128, seed = 9).as[Long].collect().toSeq
    assert(s1 != s3)
  }
}
