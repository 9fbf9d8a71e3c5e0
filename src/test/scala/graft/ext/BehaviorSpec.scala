package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Funnel, cohort retention, co-occurrence mining, weighted sampling —
  * the round-5 behavioral/curation additions.
  */
class BehaviorSpec extends SparkTestBase {
  import spark.implicits._

  private def ev = Seq(
    // user 1 completes A -> B -> C in order, within gap
    (1L, 100L, "A"), (1L, 200L, "B"), (1L, 300L, "C"),
    // user 2 does B before A, never after -> stops at stage 1
    (2L, 50L, "B"), (2L, 100L, "A"),
    // user 3 completes A -> B, then C too late (gap 2000 > 1000)
    (3L, 0L, "A"), (3L, 500L, "B"), (3L, 2600L, "C"),
    // user 4 never does A -> not in funnel at all
    (4L, 10L, "B"), (4L, 20L, "C")
  ).toDF("user_id", "sec", "etype")

  test("funnel: strict order, bounded gap, monotone stage counts") {
    val f = Behavior.funnel(ev, "user_id", "sec", "etype",
      Seq("A", "B", "C"), maxGapSec = 1000)
      .orderBy("stage").collect()
    assert(f.map(_.getLong(2)).toSeq == Seq(3L, 2L, 1L))
    // stage 2 mean gap: user1 (200-100) + user3 (500-0) over 2 = 300
    assert(f(1).getDouble(3) == 300.0)
    // stage 3: only user1, gap 100
    assert(f(2).getDouble(3) == 100.0)
    // stage 1 has no previous stage
    assert(f(0).isNullAt(3))
  }

  test("funnel: counts never increase across stages (property)") {
    val counts = Behavior.funnel(ev, "user_id", "sec", "etype",
      Seq("A", "B", "C"), maxGapSec = 10000)
      .orderBy("stage").collect().map(_.getLong(2))
    assert(counts.sliding(2).forall(w => w(0) >= w(1)))
  }

  test("cohortRetention: offsets relative to first-activity day") {
    val days = Seq(
      (1L, 10L), (1L, 10L), (1L, 12L), // dup (user,day) collapses
      (2L, 11L), (2L, 12L),
      (3L, 10L)
    ).toDF("user_id", "day")
    val m = Behavior.cohortRetention(days, "user_id", "day")
      .orderBy("cohort_day", "day_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(m.toSeq == Seq((10L, 0L, 2L), (10L, 2L, 1L),
      (11L, 0L, 1L), (11L, 1L, 1L)))
  }

  test("basket pairSupport: hand-computed support and lift") {
    val bi = Seq(
      (1L, "x"), (1L, "y"), (1L, "z"),
      (2L, "x"), (2L, "y"),
      (3L, "x"), (3L, "x") // dup item in basket collapses
    ).toDF("basket", "item")
    val p = Basket.pairSupport(bi, "basket", "item", maxBasket = 0)
      .orderBy("item_a", "item_b")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    // supports: x=3 baskets, y=2, z=1; n_baskets=3
    // pairs: (x,y)=2, (x,z)=1, (y,z)=1
    assert(p.toSeq == Seq(
      ("x", "y", 2L, 3L, 2L, 1.0),         // 2*3/(3*2)
      ("x", "z", 1L, 3L, 1L, 1.0),         // 1*3/(3*1)
      ("y", "z", 1L, 2L, 1L, 1.5)))        // 1*3/(2*1)
  }

  test("basket pairSupport: maxBasket guard drops oversized baskets") {
    val bi = Seq((1L, "a"), (1L, "b"), (1L, "c"), (2L, "a"), (2L, "b"))
      .toDF("basket", "item")
    val p = Basket.pairSupport(bi, "basket", "item", maxBasket = 2)
      .collect()
    // basket 1 (3 items) dropped; only basket 2's (a,b) remains
    assert(p.length == 1 &&
      p(0).getString(0) == "a" && p(0).getString(1) == "b" &&
      p(0).getLong(2) == 1L)
  }

  test("x_copurchase guard config: a planted megabasket trips " +
    "maxBasket=64 while every real basket passes through untouched") {
    // the x_copurchase / x_item_cosine configs run pairSupport with
    // maxBasket = 64 on the claim that order line counts are
    // generator-bounded (measured max distinct parts per order:
    // 11/13/17 at sf0.001/0.01/0.1). Two halves to pin:
    //  (a) the claim holds with headroom — no lineitem basket exceeds
    //      HALF the guard, so the guard provably filters nothing and
    //      oracle parity holds (and a slow drift toward the bound
    //      trips THIS test before the gate could silently diverge);
    //  (b) the guard actually trips — drifted data with a megabasket
    //      contributes NO pairs instead of exploding C(b,2).
    val li = graft.io.Tables.load(spark, sf, "lineitem")
    val maxBasketSize = li
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_partkey")).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(maxBasketSize <= 32L,
      s"basket-size headroom gone: a basket has $maxBasketSize items " +
        "— revisit the x_copurchase maxBasket=64 bound before the " +
        "correctness gate diverges")
    val guarded = Basket.pairSupport(li, "l_orderkey", "l_partkey",
      maxBasket = 64).orderBy("item_a", "item_b").collect().toSeq
    val unguarded = Basket.pairSupport(li, "l_orderkey", "l_partkey",
      maxBasket = 0).orderBy("item_a", "item_b").collect().toSeq
    assert(guarded == unguarded,
      "maxBasket=64 must be a no-op on generator-bounded baskets")

    // (b) plant a 100-item megabasket beside normal baskets: its
    // C(100,2) pair space must vanish, real baskets' pairs survive
    val planted = li.select(col("l_orderkey").as("b"),
        col("l_partkey").as("i"))
      .unionByName(spark.range(100)
        .select(lit(-1L).as("b"), (col("id") + 1000000L).as("i")))
    val got = Basket.pairSupport(planted, "b", "i", maxBasket = 64)
      .orderBy("item_a", "item_b").collect().toSeq
    assert(got == unguarded,
      "planted megabasket must contribute zero pairs under the guard")
    val exploded = Basket.pairSupport(planted, "b", "i", maxBasket = 0)
      .count()
    assert(exploded == unguarded.size + (100L * 99 / 2),
      "sanity: with the guard off the megabasket emits all C(100,2) pairs")
  }

  test("tripleSupport default guard: a planted megabasket contributes " +
    "zero triples (cubic emission capped) and is a no-op on real data") {
    // maxBasket = 64 is now the Basket-wide DEFAULT (no call site in
    // the registry disables it); tripleSupport's C(b,3) emission is
    // CUBIC per basket, so the guard matters even more than for pairs
    // — a 100-item megabasket is 161,700 triples unguarded.
    val li = graft.io.Tables.load(spark, sf, "lineitem")
      .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
    val unguarded = Basket.tripleSupport(li, "b", "i",
        maxBasket = 0, minSupport = 1)
      .orderBy("item_a", "item_b", "item_c").collect().toSeq
    val defaulted = Basket.tripleSupport(li, "b", "i", minSupport = 1)
      .orderBy("item_a", "item_b", "item_c").collect().toSeq
    assert(defaulted == unguarded,
      "default maxBasket=64 must be a no-op on generator-bounded baskets")
    val planted = li.unionByName(spark.range(100)
      .select(lit(-1L).as("b"), (col("id") + 1000000L).as("i")))
    val got = Basket.tripleSupport(planted, "b", "i", minSupport = 1)
      .orderBy("item_a", "item_b", "item_c").collect().toSeq
    assert(got == unguarded,
      "planted megabasket must contribute zero triples under the guard")
    val exploded = Basket.tripleSupport(planted, "b", "i",
      maxBasket = 0, minSupport = 1).count()
    assert(exploded == unguarded.size + (100L * 99 * 98 / 6),
      "sanity: with the guard off the megabasket emits all C(100,3) triples")
  }

  test("weightedPrioritySample: deterministic, partitioning-invariant, " +
    "favors heavy rows") {
    val rows = (1 to 400).map(i => (i.toLong, if (i <= 40) 1000L else 1L))
    val df = rows.toDF("id", "w")
    val a = Sampling.weightedPrioritySample(df, "id", "w", k = 20)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    val b = Sampling.weightedPrioritySample(df.repartition(7), "id", "w",
      k = 20).orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(a == b, "selection must not depend on partitioning")
    // 10% of rows carry 1000x weight -> they dominate the sample
    assert(a.count(_ <= 40) >= 15,
      s"heavy rows underrepresented: ${a.count(_ <= 40)}/20")
    // zero/negative weights are excluded
    val z = Sampling.weightedPrioritySample(
      Seq((1L, 0L), (2L, 5L)).toDF("id", "w"), "id", "w", k = 10)
      .collect().map(_.getLong(0))
    assert(z.toSeq == Seq(2L))
  }

  test("funnel == plain-Scala reference on random event streams") {
    val steps = Seq("A", "B", "C")
    (0 until 6).foreach { trial =>
      val rnd = new scala.util.Random(99L + trial)
      val evs = (0 until 120).map { _ =>
        (rnd.nextInt(8).toLong, rnd.nextInt(5000).toLong,
          steps(rnd.nextInt(3)))
      }
      val gap = 600L
      // reference: per user, earliest chain of steps within gap
      val byUser = evs.groupBy(_._1)
      val chains = byUser.values.map { rows =>
        val t1 = rows.filter(_._3 == "A").map(_._2).minOption
        val t2 = t1.flatMap(t => rows.filter(r => r._3 == "B" &&
          r._2 >= t && r._2 <= t + gap).map(_._2).minOption)
        val t3 = t2.flatMap(t => rows.filter(r => r._3 == "C" &&
          r._2 >= t && r._2 <= t + gap).map(_._2).minOption)
        (t1, t2, t3)
      }.toSeq
      val expected = Seq(chains.count(_._1.isDefined).toLong,
        chains.count(_._2.isDefined).toLong,
        chains.count(_._3.isDefined).toLong)
      val got = Behavior.funnel(
          evs.toDF("user_id", "sec", "etype"),
          "user_id", "sec", "etype", steps, maxGapSec = gap)
        .orderBy("stage").collect().map(_.getLong(2)).toSeq
      assert(got == expected, s"trial=$trial got=$got expected=$expected")
    }
  }

  test("pairSupport == plain-Scala reference on random baskets") {
    (0 until 6).foreach { trial =>
      val rnd = new scala.util.Random(7L + trial)
      val rows = (0 until 150).map { _ =>
        (rnd.nextInt(25).toLong, s"i${rnd.nextInt(10)}")
      }
      val baskets = rows.distinct.groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val n = baskets.size.toLong
      val support = baskets.values.flatten.groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val expected = (for {
        items <- baskets.values
        a <- items; b <- items if a < b
      } yield (a, b)).groupBy(identity).view.mapValues(_.size.toLong)
        .toMap.map { case ((a, b), c) =>
          (a, b, c, support(a), support(b),
            BigDecimal(c.toDouble * n / (support(a) * support(b)))
              .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }.toSet
      val got = Basket.pairSupport(rows.toDF("basket", "item"),
          "basket", "item", maxBasket = 0)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
      assert(got == expected,
        s"trial=$trial missing=${expected -- got} extra=${got -- expected}")
    }
  }

  test("skipgramPairs: window-2 pairs of a known sentence") {
    val docs = Seq("a b c d").toDF("text")
    val p = TextAnalysis.skipgramPairs(docs, "text", window = 2)
      .orderBy("w", "c").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(p.toSeq == Seq(
      ("a", "b", 1L), ("a", "c", 1L),
      ("b", "c", 1L), ("b", "d", 1L),
      ("c", "d", 1L)))
    // short docs produce no out-of-range pairs
    val one = TextAnalysis.skipgramPairs(Seq("solo").toDF("text"), "text", 2)
    assert(one.count() == 0)
  }

  test("streaks: islands, counts, earliest-longest tie-break") {
    val days = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 7L), (1L, 8L), (1L, 2L), // dup day
      (2L, 5L),
      (3L, 1L), (3L, 2L), (3L, 9L), (3L, 10L) // two length-2 streaks: tie
    ).toDF("user_id", "day")
    val got = Behavior.streaks(days, "user_id", "day").orderBy("user_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 5L, 2L, 3L, 1L),   // [1..3] + [7,8]: longest 3 starts at 1
      (2L, 1L, 1L, 1L, 5L),   // singleton
      (3L, 4L, 2L, 2L, 1L)))  // tie on length 2 -> earliest start 1
  }

  test("streaks: partitioning-invariant") {
    val days = (1L to 200L).map(i => (i % 7, i / 3)).toDF("user_id", "day")
    val a = Behavior.streaks(days, "user_id", "day")
      .orderBy("user_id").collect().toSeq
    val b = Behavior.streaks(days.repartition(13), "user_id", "day")
      .orderBy("user_id").collect().toSeq
    assert(a == b)
  }

  test("maxConcurrency: sweep max, earliest peak, half-open ends") {
    val iv = Seq(
      ("k", 0L, 10L), ("k", 5L, 15L), ("k", 12L, 20L),
      // half-open: [0,10) and [10,20) never overlap
      ("h", 0L, 10L), ("h", 10L, 20L)
    ).toDF("key", "s0", "s1")
    val got = Behavior.maxConcurrency(iv, "key", "s0", "s1")
      .orderBy("key").as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("h", 1L, 0L), ("k", 2L, 5L)))
  }

  test("maxConcurrency: null-boundary intervals drop, not corrupt") {
    // a null end would sort first per key and start the running
    // open-count at a spurious -1 — such rows must be excluded
    val iv = Seq(
      ("k", Some(0L), Some(10L)), ("k", Some(5L), None),
      ("k", None, Some(8L)), ("k", Some(6L), Some(12L))
    ).toDF("key", "s0", "s1")
    val got = Behavior.maxConcurrency(iv, "key", "s0", "s1")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("k", 2L, 6L)), got.toString)
  }

  test("maxConcurrency: duplicate instants pre-aggregate cleanly") {
    // three intervals opening at the same instant
    val iv = Seq(("k", 3L, 9L), ("k", 3L, 5L), ("k", 3L, 7L))
      .toDF("key", "s0", "s1")
    val got = Behavior.maxConcurrency(iv, "key", "s0", "s1")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("k", 3L, 3L)))
  }

  test("kaplanMeier: textbook worked example with censoring") {
    // durations: events at 2 (1 death of 5 at risk), 4 (1 of 3), and a
    // censored 3 and 5: classic KM table
    //   t=2: n=5, d=1 -> S = 4/5 = 0.8
    //   t=4: n=2 (censor at 3 left the risk set), d=1 -> S = 0.8*0.5
    val subj = Seq((2L, true), (2L, false), (3L, false), (4L, true),
      (5L, false)).toDF("dur", "obs")
    val got = Behavior.kaplanMeier(subj, "dur", "obs")
      .orderBy("t").as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4)) ==
      Seq((2L, 5L, 1L, 1L), (4L, 2L, 1L, 0L)))
    assert(math.abs(got(0)._5 - 0.8) < 1e-6)
    assert(math.abs(got(1)._5 - 0.4) < 1e-6)
  }

  test("kaplanMeier: absorbing event hits exact 0; no-censor curve " +
    "matches the empirical survivor function") {
    val all = Seq((1L, true), (2L, true), (2L, true), (3L, true))
      .toDF("dur", "obs")
    val got = Behavior.kaplanMeier(all, "dur", "obs")
      .orderBy("t").as[(Long, Long, Long, Long, Double)].collect().toSeq
    // no censoring: S(t) = fraction with duration > t
    assert(math.abs(got(0)._5 - 0.75) < 1e-6)
    assert(math.abs(got(1)._5 - 0.25) < 1e-6)
    assert(got(2)._5 == 0.0) // last death: exact zero, not an ulp
  }

  test("hashFeatures: signed-sum weights match a plain-Scala twin") {
    val docs = Seq((1L, "a b a c"), (2L, "b b"), (3L, "")).toDF("id", "text")
    def h(s: String, seed: Int): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed|$s".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 15)
      java.lang.Long.parseLong(hex, 16)
    }
    val expected = Seq(1L -> Seq("a", "b", "a", "c"), 2L -> Seq("b", "b"))
      .flatMap { case (id, toks) =>
        toks.map(t => ((id, (h(t, 0) % 16).toInt), (h(t, 1) % 2) * 2 - 1))
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .filter(_._2 != 0L)
      .map { case ((id, b), w) => (id, b, w) }.toSet
    val got = TextAnalysis.hashFeatures(docs, "id", "text", dim = 16)
      .as[(Long, Int, Long)].collect().toSet
    assert(got == expected, s"got=$got expected=$expected")
    // inner products via shared buckets approximate token overlap:
    // doc 2's only token 'b' must land in a bucket doc 1 also hits
    val byDoc = got.groupBy(_._1)
    assert(byDoc(2L).map(_._2).subsetOf(byDoc(1L).map(_._2)))
  }

  test("tripleSupport: C(b,3) emission matches a brute-force reference") {
    val rnd = new scala.util.Random(3)
    val rows = for {
      b <- 0 until 25
      i <- 0 until rnd.nextInt(6) + 1
    } yield (s"b$b", s"i${rnd.nextInt(8)}")
    val expected = rows.distinct.groupBy(_._1).values.flatMap { basket =>
      val items = basket.map(_._2).distinct.sorted
      for {
        a <- items; b <- items if b > a; c <- items if c > b
      } yield (a, b, c)
    }.groupBy(identity).collect {
      case (t, hits) if hits.size >= 2 => (t._1, t._2, t._3, hits.size.toLong)
    }.toSet
    val got = Basket.tripleSupport(rows.toDF("basket", "item"),
        "basket", "item", maxBasket = 0, minSupport = 2)
      .as[(String, String, String, Long)].collect().toSet
    assert(got == expected,
      s"missing=${expected -- got} extra=${got -- expected}")
  }

  test("tripleSupport: maxBasket guard drops oversized baskets") {
    val rows = (Seq.fill(1)("small").flatMap(b =>
      Seq((b, "x"), (b, "y"), (b, "z"))) ++
      (0 until 10).map(i => ("big", s"i$i"))).toDF("basket", "item")
    val all = Basket.tripleSupport(rows, "basket", "item",
      maxBasket = 0, minSupport = 1)
    val guarded = Basket.tripleSupport(rows, "basket", "item",
      maxBasket = 5, minSupport = 1)
    assert(all.count() == 1 + 120)   // xyz + C(10,3)
    assert(guarded.count() == 1)     // big basket suppressed
  }

  test("itemCosine: hand-computed cosine, min-support prune") {
    val rows = Seq(("b1", "A"), ("b1", "B"), ("b2", "A"), ("b2", "B"),
      ("b3", "A"), ("b3", "C")).toDF("basket", "item")
    val got = Basket.itemCosine(rows, "basket", "item",
        maxBasket = 0, minPairSupport = 2)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    // (A,C) pair support 1 pruned; (A,B): 2/sqrt(3*2)
    val expect = BigDecimal(2.0 / math.sqrt(6.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(("B", "A", 2L, 2L, 3L, expect)) ||
      got == Seq(("A", "B", 2L, 3L, 2L, expect)), got.toString)
  }
}
