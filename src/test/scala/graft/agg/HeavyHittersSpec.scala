package graft.agg

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.io.Tables

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  // one key at ~50%, one strictly above the k=3 threshold (260/1010 >
  // 1/4), tail of singletons — forces MG eviction with small k and many
  // partitions
  private def skewed = {
    val rows = Seq.fill(500)("hot") ++ Seq.fill(260)("warm") ++
      (0 until 250).map(i => s"tail_$i")
    // deterministic interleave so hot keys span every partition
    rows.zipWithIndex.sortBy { case (_, i) => (i * 131) % 997 }
      .map(_._1).toDF("k").repartition(7)
  }

  test("heavyHitters == exact HAVING-threshold group-by (synthetic skew)") {
    val k = 3
    val df = skewed
    val n = df.count()
    val exact = df.groupBy("k").agg(count(lit(1)).as("n"))
      .filter(col("n") * (k + 1) > n)
      .select(col("k").as("key"), col("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = HeavyHitters.heavyHitters(df, "k", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == exact)
    assert(got.map(_._1) == Set("hot", "warm"))
  }

  test("candidate set is a superset of true heavy hitters, bounded by k×partitions") {
    val k = 3
    val df = skewed
    val cands = HeavyHitters.misraGriesCandidates(df, "k", k)
      .collect().map(_.getString(0)).toSet
    assert(cands.contains("hot") && cands.contains("warm"))
    assert(cands.size <= k * df.rdd.getNumPartitions)
  }

  test("eviction path: k smaller than distinct count still finds the majority key") {
    val df = (Seq.fill(600)("maj") ++ (0 until 400).map(i => s"u$i"))
      .zipWithIndex.sortBy { case (_, i) => (i * 37) % 211 }.map(_._1)
      .toDF("k").repartition(5)
    val got = HeavyHitters.heavyHitters(df, "k", 1)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq == Seq(("maj", 600L)))
  }

  test("partitioning-invariant result") {
    val k = 4
    val a = HeavyHitters.heavyHitters(skewed.repartition(2), "k", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = HeavyHitters.heavyHitters(skewed.repartition(13), "k", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("nulls ignored; threshold is strict >") {
    val df = (Seq.fill(10)(Some("a")) ++ Seq.fill(10)(Some("b")) ++
      Seq.fill(5)(Option.empty[String])).toDF("k")
    // non-null N = 20; k=1 → need n*2 > 20, i.e. n > 10: neither passes
    assert(HeavyHitters.heavyHitters(df, "k", 1).count() == 0L)
    // k=2 → need n*3 > 20: both pass with exact counts
    val got = HeavyHitters.heavyHitters(df, "k", 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == Set(("a", 10L), ("b", 10L)))
  }

  test("real column: supplier keys on lineitem match exact computation") {
    val li = Tables.load(spark, sf, "lineitem")
    val k = 15
    val n = li.filter(col("l_suppkey").isNotNull).count()
    val exact = li.groupBy(col("l_suppkey").cast("string").as("key"))
      .agg(count(lit(1)).as("n")).filter(col("n") * (k + 1) > n)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = HeavyHitters.heavyHitters(li, "l_suppkey", k)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got == exact)
  }
}
