package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  // 3 classes: (a,1) x5, (a,2) x2, (b,1) x1; sensitive attr s
  private def people = Seq(
    ("a", 1, "x"), ("a", 1, "x"), ("a", 1, "y"), ("a", 1, "z"), ("a", 1, "x"),
    ("a", 2, "x"), ("a", 2, "x"),
    ("b", 1, "y")
  ).toDF("seg", "nat", "s")

  test("kAnonymity: class sizes and at-risk flags") {
    val out = Privacy.kAnonymity(people, Seq("seg", "nat"), k = 3)
      .orderBy("seg", "nat")
      .as[(String, Int, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      ("a", 1, 5L, false),
      ("a", 2, 2L, true),
      ("b", 1, 1L, true)))
  }

  test("kAnonymitySummary: the one-row gate") {
    val r = Privacy.kAnonymitySummary(people, Seq("seg", "nat"), k = 3)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r == ((3L, 2L, 8L, 3L, 1L))) // classes, risky, rows, risky rows, min
  }

  test("suppressRisky: the release is k-anonymous by construction") {
    val out = Privacy.suppressRisky(people, Seq("seg", "nat"), k = 3)
    // only class (a,1) (5 rows) survives at k=3
    assert(out.count() == 5)
    assert(out.select("seg", "nat").distinct()
      .as[(String, Int)].collect().toSeq == Seq(("a", 1)))
    val audit = Privacy.kAnonymitySummary(out, Seq("seg", "nat"), k = 3)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(audit._2 == 0L && audit._5 >= 3L) // no risky classes left
  }

  test("lDiversity: k-anonymous class can still fail diversity") {
    // class (a,2) has 2 rows but only one sensitive value 'x'
    val out = Privacy.lDiversity(people, Seq("seg", "nat"), "s", l = 2)
      .orderBy("seg", "nat")
      .as[(String, Int, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      ("a", 1, 5L, 3L, true),
      ("a", 2, 2L, 1L, false),
      ("b", 1, 1L, 1L, false)))
  }

  /** The exact noise dpCounts derives for a key, replayed driver-side
    * from the same md5 formula — the hand-oracle for the mechanism.
    */
  private def laplaceNoise(keyStr: String, eps: Double, seed: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$seed|$keyStr".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.substring(0, 15)
    val h = java.lang.Long.parseLong(hex, 16)
    // 52-bit mask before the cast (exact double arithmetic, u strictly
    // inside (0,1)) — mirrors Privacy.dpCounts
    val u = ((h & ((1L << 52) - 1)).toDouble + 0.5) / math.pow(2, 52)
    val c = u - 0.5
    val raw = -1.0 / eps * math.signum(c) * math.log(1.0 - 2.0 * math.abs(c))
    BigDecimal(raw).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  test("dpCounts: noisy count == true count + hand-derived Laplace draw") {
    val got = Privacy.dpCounts(people, Seq("seg"), epsilon = 0.5, seed = 0)
      .orderBy("seg").as[(String, Double)].collect().toMap
    assert(got.keySet == Set("a", "b"))
    assert(got("a") == 7.0 + laplaceNoise("a", 0.5, 0), got.toString)
    assert(got("b") == 1.0 + laplaceNoise("b", 0.5, 0))
    // the mechanism actually perturbs (draws are a.s. nonzero)
    assert(got("a") != 7.0 && got("b") != 1.0)
  }

  test("dpCounts: deterministic per seed, different across seeds") {
    val a1 = Privacy.dpCounts(people, Seq("seg"), 0.5, seed = 0)
      .orderBy("seg").as[(String, Double)].collect().toSeq
    val a2 = Privacy.dpCounts(people.repartition(5), Seq("seg"), 0.5, seed = 0)
      .orderBy("seg").as[(String, Double)].collect().toSeq
    val b = Privacy.dpCounts(people, Seq("seg"), 0.5, seed = 1)
      .orderBy("seg").as[(String, Double)].collect().toSeq
    assert(a1 == a2)          // replays and repartitions change nothing
    assert(a1 != b)           // a fresh seed is a fresh draw
  }

  test("randomizedResponse: deterministic, ~p flip rate, debias recovers") {
    val ids = (1L to 4000L)
    val df = ids.map(i => (i, if (i % 4 == 0) "x" else "y"))
      .toDF("id", "cat")
    val dom = Seq("x", "y", "z")
    val a = Privacy.randomizedResponse(df, "id", "cat", dom, 300, seed = 1)
      .as[(Long, String)].collect().toMap
    val b = Privacy.randomizedResponse(df.repartition(7), "id", "cat",
      dom, 300, seed = 1).as[(Long, String)].collect().toMap
    assert(a == b) // replays and repartitions give the same release
    // about 30% of rows flip to a uniform draw; of those, 1/3 land on
    // their own category — observed "changed" rate ≈ p·(k−1)/k = 20%
    val changed = ids.count(i =>
      a(i) != (if (i % 4 == 0) "x" else "y")).toDouble / ids.size
    assert(changed > 0.15 && changed < 0.25, s"changed rate $changed")
    // z appears in the release though no true row carries it
    assert(a.values.toSet.contains("z"))
    // debiased estimates bracket the true histogram
    val noisy = Privacy.randomizedResponse(df, "id", "cat", dom, 300, 1)
    val est = Privacy.rrDebias(noisy, "cat", dom, 300)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(math.abs(est("x") - 1000.0) < 100, est.toString)
    assert(math.abs(est("y") - 3000.0) < 100, est.toString)
    assert(math.abs(est("z") - 0.0) < 100, est.toString)
  }

  test("dpCounts: tighter epsilon means smaller noise magnitude") {
    val loose = Privacy.dpCounts(people, Seq("seg"), epsilon = 0.1, seed = 0)
      .orderBy("seg").as[(String, Double)].collect()
    val tight = Privacy.dpCounts(people, Seq("seg"), epsilon = 10.0, seed = 0)
      .orderBy("seg").as[(String, Double)].collect()
    val truth = Map("a" -> 7.0, "b" -> 1.0)
    loose.zip(tight).foreach { case ((k, l), (_, t)) =>
      assert(math.abs(t - truth(k)) < math.abs(l - truth(k)))
    }
  }
}
