package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.io.Tables

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf, "documents")

  test("hashSample is deterministic and partitioning-invariant") {
    val a = Sampling.hashSample(docs, "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(7), "doc_id", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    val frac = a.size.toDouble / docs.count()
    assert(frac > 0.2 && frac < 0.4, s"~0.3 expected, got $frac")
  }

  test("splitByHash: exhaustive, disjoint, roughly weighted") {
    val split = Sampling.splitByHash(docs, "doc_id",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "valid", "test"))
    assert(counts.values.sum == docs.count())
    assert(counts("train") > counts("valid") && counts("train") > counts("test"))
    // stability: same row, same split, every time
    val again = Sampling.splitByHash(docs, "doc_id",
      Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .select("doc_id", "split").as[(Long, String)].collect().toSet
    assert(again == split.select("doc_id", "split")
      .as[(Long, String)].collect().toSet)
  }

  test("stratifiedSample: named strata thinned, unnamed kept whole") {
    val out = Sampling.stratifiedSample(docs, "doc_id", "lang",
      fractions = Map("en" -> 0.5), defaultFraction = 1.0)
    val before = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val after = out.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(after("en") < before("en"))
    (before.keySet - "en").foreach(l => assert(after(l) == before(l),
      s"unnamed stratum $l must be untouched"))
    // partitioning invariance, same as hashSample
    val again = Sampling.stratifiedSample(docs.repartition(5), "doc_id",
      "lang", fractions = Map("en" -> 0.5))
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.select("doc_id").as[Long].collect().toSet)
  }

  test("reservoirSample: exactly k, partitioning-invariant, TakeOrdered plan") {
    val s1 = Sampling.reservoirSample(docs, "doc_id", 25)
    assert(s1.count() == 25)
    val s2 = Sampling.reservoirSample(docs.repartition(9), "doc_id", 25)
    assert(s1.select("doc_id").as[Long].collect().toSet ==
      s2.select("doc_id").as[Long].collect().toSet)
    // distributed top-k, not a global sort
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("reservoirPerGroup: k per stratum, no window sort, partition-invariant") {
    val base = docs.select($"doc_id", $"source")
    val s1 = Sampling.reservoirPerGroup(base, "doc_id", "source", k = 3, seed = 2)
    val got = s1.groupBy("source").count().as[(String, Long)].collect()
    assert(got.nonEmpty && got.forall(_._2 <= 3), got.mkString(","))
    val a = s1.select("doc_id").as[Long].collect().toSet
    val b = Sampling.reservoirPerGroup(base.repartition(7), "doc_id",
      "source", k = 3, seed = 2).select("doc_id").as[Long].collect().toSet
    assert(a == b, "selection must not depend on partitioning")
    val plan = s1.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("Window"), "must not fall back to window sort:\n" + plan)
  }

  test("domainMix: bottleneck keeps all, others downsample to the mixture") {
    val rows = (0 until 300).map(i => (i.toLong, "a")) ++
      (300 until 360).map(i => (i.toLong, "b")) ++
      (360 until 400).map(i => (i.toLong, "c")) ++
      (400 until 420).map(i => (i.toLong, "drop_me"))
    val df = rows.toDF("id", "domain")
    val mixed = Sampling.domainMix(df, "id", "domain",
      targets = Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25), seed = 1)
    val kept = mixed.groupBy("domain").count()
      .as[(String, Long)].collect().toMap
    // scale = min(300/.5, 60/.25, 40/.25) = 160 -> quotas 80/40/40:
    // c is the bottleneck (keeps all 40); a,b hash-sample toward quota
    assert(kept.getOrElse("c", 0L) == 40L, kept.toString)
    assert(!kept.contains("drop_me"), "unlisted domains must be dropped")
    assert(math.abs(kept("a") - 80L) <= 25, kept.toString)
    assert(math.abs(kept("b") - 40L) <= 15, kept.toString)
    // partitioning-invariant
    val again = Sampling.domainMix(df.repartition(7), "id", "domain",
      targets = Seq("a" -> 0.5, "b" -> 0.25, "c" -> 0.25), seed = 1)
      .select("id").as[Long].collect().toSet
    assert(again == mixed.select("id").as[Long].collect().toSet)
  }

  test("temperatureMix: alpha=1 keeps all, alpha=0 flattens to the " +
      "smallest domain, alpha=0.5 lands between; partitioning-invariant") {
    val rows = (0 until 900).map(i => (i.toLong, "big")) ++
      (900 until 1000).map(i => (i.toLong, "small"))
    val df = rows.toDF("id", "domain")
    def kept(alpha: Double) =
      Sampling.temperatureMix(df, "id", "domain", alpha, seed = 3)
        .groupBy("domain").count().as[(String, Long)].collect().toMap
    val k1 = kept(1.0)
    assert(k1 == Map("big" -> 900L, "small" -> 100L), k1.toString)
    // alpha=0: quota = n_min for every domain (uniform); hash sampling
    // scatters around 100 for big, small keeps all
    val k0 = kept(0.0)
    assert(k0("small") == 100L, k0.toString)
    assert(math.abs(k0("big") - 100L) <= 35, k0.toString)
    // alpha=0.5: big quota = sqrt(100/900)*900 = 300
    val kHalf = kept(0.5)
    assert(kHalf("small") == 100L, kHalf.toString)
    assert(math.abs(kHalf("big") - 300L) <= 55, kHalf.toString)
    // deterministic under repartitioning
    val a = Sampling.temperatureMix(df, "id", "domain", 0.5, seed = 3)
      .select("id").as[Long].collect().toSet
    val b = Sampling.temperatureMix(df.repartition(7), "id", "domain",
      0.5, seed = 3).select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("poissonBootstrap: replicate means bracket the true mean, " +
      "n_eff ~ n, deterministic under repartitioning") {
    val n = 2000
    val df = (0 until n).map(i => (i.toLong, (i % 100).toDouble))
      .toDF("id", "v")
    val trueMean = (0 until n).map(_ % 100).sum.toDouble / n
    val boot = Sampling.poissonBootstrap(df, "id", "v",
      replicates = 32, seed = 5).collect()
    assert(boot.length == 32)
    val means = boot.map(_.getAs[Double]("boot_mean"))
    // each replicate's mean is a bootstrap draw: all within a few
    // standard errors (sd(v)/sqrt(n) ~ 0.65), and they straddle truth
    assert(means.forall(m => math.abs(m - trueMean) < 4.0),
      s"wild replicate mean: ${means.mkString(",")} vs $trueMean")
    assert(means.exists(_ < trueMean) && means.exists(_ > trueMean),
      "replicates should straddle the true mean")
    // Poisson(1) weights: E[n_eff] = n, sd ~ sqrt(n) ~ 45
    val neffs = boot.map(_.getAs[Long]("n_eff"))
    assert(neffs.forall(e => math.abs(e - n) < 200), neffs.mkString(","))
    // partitioning-invariant and rerun-stable
    val again = Sampling.poissonBootstrap(df.repartition(7), "id", "v",
      replicates = 32, seed = 5).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet
    assert(again == boot.map(r =>
      (r.getInt(0), r.getLong(1), r.getDouble(2))).toSet)
  }

  test("shardAssign: stable, in-range, partitioning-invariant, roughly balanced") {
    val ids = (0L until 1000L).toDF("id")
    val a = Sampling.shardAssign(ids, "id", nShards = 8, seed = 1)
      .as[(Long, Int)].collect().toMap
    assert(a.values.forall(s => s >= 0 && s < 8))
    val b = Sampling.shardAssign(ids.repartition(13), "id", 8, seed = 1)
      .as[(Long, Int)].collect().toMap
    assert(a == b)
    // uniform hash → each shard within ±50% of the 125 expectation
    val sizes = a.values.groupBy(identity).map(_._2.size)
    assert(sizes.size == 8 && sizes.forall(s => s > 62 && s < 188), sizes)
    // different seed → different layout
    val c = Sampling.shardAssign(ids, "id", 8, seed = 2)
      .as[(Long, Int)].collect().toMap
    assert(a != c)
  }

  test("vocabulary: ids are dense by (count desc, token asc)") {
    val v = TextAnalysis.vocabulary(docs, "text", minCount = 2)
      .orderBy("token_id").collect()
    assert(v.nonEmpty)
    assert(v.map(_.getInt(2)).toSeq == (1 to v.length))
    val counts = v.map(_.getLong(1)).toSeq
    assert(counts == counts.sorted.reverse, "descending counts")
  }

  test("leakFreeSplit keeps clusters together; singletons match splitByHash") {
    val ids = (1L to 200L).toDF("id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val out = Sampling.leakFreeSplit(ids, "id", pairs,
        Seq("train" -> 0.8, "test" -> 0.2))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
      .toMap
    // whole cluster on one side, keyed by its min-label rep
    assert(Seq(1L, 2L, 3L).map(out(_)._1).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(out(_)._2).distinct.size == 1)
    assert(out(10L)._2 == out(11L)._2 && out(10L)._1 == 10L)
    // singletons: rep is the id and the split is plain splitByHash
    val plain = Sampling.splitByHash((20L to 200L).toDF("rep"), "rep",
        Seq("train" -> 0.8, "test" -> 0.2))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (20L to 200L).foreach(i =>
      assert(out(i) == ((i, plain(i))), s"singleton $i"))
    assert(out.values.map(_._2).toSet == Set("train", "test"))
  }

  test("temporalSplit: boundaries inclusive/exclusive, embargo excluded") {
    import spark.implicits._
    val ticks = Seq(5L, 10L, 11L, 12L, 13L, 20L).toDF("t")
    val got = Sampling.temporalSplit(ticks, "t", trainEnd = 10L,
        embargoTicks = 2L)
      .as[(Long, String)].collect().toMap
    assert(got == Map(5L -> "train", 10L -> "train", // cut inclusive
      11L -> "embargo", 12L -> "embargo",            // (cut, cut+e]
      13L -> "test", 20L -> "test"))                 // strictly after
    // zero embargo degenerates to a plain time cut
    val z = Sampling.temporalSplit(ticks, "t", 10L, 0L)
      .as[(Long, String)].collect().toMap
    assert(!z.values.exists(_ == "embargo"))
  }

  test("neymanAllocation: budget follows N_h*sigma_h — a huge uniform " +
    "stratum earns nothing, realized sizes track targets") {
    val rnd = new scala.util.Random(7)
    // stratum a: 4000 rows, constant value (sigma = 0)
    // stratum b: 1000 rows, sd ~ 10; stratum c: 1000 rows, sd ~ 100
    val rows =
      (0 until 4000).map(i => (s"k$i", "a", 50.0)) ++
      (0 until 1000).map(i => (s"k${9000 + i}", "b",
        50.0 + rnd.nextGaussian() * 10)) ++
      (0 until 1000).map(i => (s"k${20000 + i}", "c",
        50.0 + rnd.nextGaussian() * 100))
    val df = rows.toDF("k", "g", "v")
    val alloc = Sampling.neymanAllocation(df, "g", "v", totalN = 600)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4),
          r.getDouble(5))).toMap
    val (na, sa, sha, ta, ra) = alloc("a")
    assert(na == 4000L && sa == 0.0 && sha == 0.0 && ta == 0L &&
      ra == 0.0, alloc("a").toString)
    // c's sd is ~10x b's at equal size -> ~10x the budget share
    val shareRatio = alloc("c")._3 / alloc("b")._3
    assert(shareRatio > 5 && shareRatio < 20, s"ratio $shareRatio")
    assert(alloc("b")._4 + alloc("c")._4 <= 600 + 1)
    // realized hash-sample sizes land near the targets
    val got = Sampling.neymanSample(df, "k", "g", "v", totalN = 600,
        seed = 3)
      .groupBy("g").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!got.contains("a"))
    for (g <- Seq("b", "c")) {
      val target = alloc(g)._4.toDouble
      assert(math.abs(got(g) - target) <= 4 * math.sqrt(target) + 2,
        s"$g realized ${got(g)} vs target $target")
    }
  }

  test("neymanSample: precomputed-allocation overload draws the same " +
    "sample as the convenience form (single corpus scan)") {
    val rnd = new scala.util.Random(5)
    val df = (0 until 2000).map(i => (s"k$i", s"g${i % 3}",
      rnd.nextGaussian() * (i % 3 + 1))).toDF("k", "g", "v")
    val alloc = Sampling.neymanAllocation(df, "g", "v", totalN = 300)
    val viaAlloc = Sampling.neymanSample(df, "k", "g", alloc, seed = 3)
      .select("k").collect().map(_.getString(0)).toSet
    val direct = Sampling.neymanSample(df, "k", "g", "v", totalN = 300,
      seed = 3).select("k").collect().map(_.getString(0)).toSet
    assert(viaAlloc == direct && viaAlloc.nonEmpty)
  }

  test("neymanAllocation: all-degenerate strata emit null shares/" +
    "targets/rates (not NaN/1.0), and the sample is empty") {
    // every stratum zero-variance -> total weight 0: there is no
    // defensible allocation; least() skips nulls so the rate guard
    // must hold explicitly (a silent 1.0 would sample EVERYTHING)
    val df = (0 until 100).map(i => (s"k$i", s"g${i % 2}", 5.0))
      .toDF("k", "g", "v")
    val alloc = Sampling.neymanAllocation(df, "g", "v", totalN = 10)
      .collect()
    assert(alloc.length == 2)
    alloc.foreach { r =>
      assert(r.getDouble(2) == 0.0, s"sigma: $r")       // sigma = 0
      assert(r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5),
        s"expected null share/target/rate: $r")
    }
    assert(Sampling.neymanSample(df, "k", "g", "v", totalN = 10)
      .isEmpty)
  }
}
