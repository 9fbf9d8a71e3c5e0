package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Eval metrics vs hand computation: Mann-Whitney AUC with ties (and
  * its bucketed two-phase prefix form vs the trivial single-bucket
  * form), boundary AUCs, confusion-matrix rates, calibration bins.
  */
class EvalSpec extends SparkTestBase {

  test("auc matches the hand-computed Mann-Whitney value with ties") {
    import spark.implicits._
    // scores: pos {3, 2, 2}, neg {1, 2, 0}
    // pairs pos>neg: 3>{1,2,0}=3, 2>{1,0}=2 (×2 pos) → 7; ties: 2==2 ×2
    // AUC = (7 + 2/2) / 9 = 8/9
    val df = Seq((3, 1), (2, 1), (2, 1), (1, 0), (2, 0), (0, 0))
      .toDF("s", "y")
    val r = Eval.auc(df, col("s"), col("y")).collect()(0)
    assert(r.getLong(0) == 3 && r.getLong(1) == 3)
    assert(r.getDouble(2) == 8.0 / 9.0)
  }

  test("default quantile buckets == explicit buckets == single bucket") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(500)((rnd.nextInt(40), rnd.nextInt(2)))
    val df = rows.toDF("s", "y").repartition(8)
    val plain = Eval.auc(df, col("s"), col("y"), bucketOf = _ => lit(0L))
      .collect()(0).getDouble(2)
    val bucketed = Eval.auc(df, col("s"), col("y"),
        bucketOf = c => floor(c.cast("double") / 10.0).cast("long"))
      .collect()(0).getDouble(2)
    val default = Eval.auc(df, col("s"), col("y")).collect()(0).getDouble(2)
    assert(plain == bucketed && plain == default)
    // cross-check against the O(n²) definition
    val pos = rows.filter(_._2 == 1).map(_._1)
    val neg = rows.filter(_._2 == 0).map(_._1)
    val num = pos.flatMap(p => neg.map(n =>
      if (p > n) 2L else if (p == n) 1L else 0L)).sum
    assert(plain == num.toDouble / (2.0 * pos.size * neg.size))
  }

  test("default auc plan has no partition-free window over raw scores") {
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val df = Seq.tabulate(100)(i => (i * 7 % 41, i % 2)).toDF("s", "y")
    val plan = Eval.auc(df, col("s"), col("y"))
      .queryExecution.optimizedPlan
    val free = plan.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
    assert(free.nonEmpty, "expected the bucket-totals prefix window")
    // every partition-free window must order by the derived bucket id
    // (≤256 distinct values), never by the raw score column
    free.foreach { w =>
      val ordRefs = w.orderSpec.flatMap(_.references.toSeq).map(_.name)
      assert(ordRefs.nonEmpty && ordRefs.forall(_ == "__b"),
        s"partition-free window orders by $ordRefs, not the bucket id")
    }
  }

  test("auc is 1 for perfect separation, 0 for perfectly inverted") {
    import spark.implicits._
    val perfect = Seq((10, 1), (9, 1), (2, 0), (1, 0)).toDF("s", "y")
    assert(Eval.auc(perfect, col("s"), col("y"))
      .collect()(0).getDouble(2) == 1.0)
    val inverted = Seq((1, 1), (2, 1), (9, 0), (10, 0)).toDF("s", "y")
    assert(Eval.auc(inverted, col("s"), col("y"))
      .collect()(0).getDouble(2) == 0.0)
  }

  test("confusion matrix counts and rates") {
    import spark.implicits._
    // (pred, label): tp=2, fp=1, tn=3, fn=1
    val df = Seq((1, 1), (1, 1), (1, 0), (0, 0), (0, 0), (0, 0), (0, 1))
      .toDF("p", "y")
    val r = Eval.confusion(df, col("p") === 1, col("y")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      == ((2L, 1L, 3L, 1L)))
    assert(r.getDouble(4) == 5.0 / 7.0) // accuracy
    assert(r.getDouble(5) == 2.0 / 3.0) // precision
    assert(r.getDouble(6) == 2.0 / 3.0) // recall
  }

  test("confusion degenerate inputs emit 0.0, never null") {
    import spark.implicits._
    // predictor never fires → tp+fp = 0 → precision 0.0 (not null);
    // labels all negative → tp+fn = 0 → recall 0.0 (not null)
    val silent = Seq((0, 0), (0, 0), (0, 0)).toDF("p", "y")
    val r = Eval.confusion(silent, col("p") === 1, col("y")).collect()(0)
    assert(!r.anyNull)
    assert(r.getDouble(4) == 1.0 && r.getDouble(5) == 0.0 &&
      r.getDouble(6) == 0.0)
    // empty frame → all counts 0, all rates 0.0
    val e = Eval.confusion(silent.filter(lit(false)), col("p") === 1,
      col("y")).collect()(0)
    assert(!e.anyNull)
    assert((0 to 3).forall(e.getLong(_) == 0L) &&
      (4 to 6).forall(e.getDouble(_) == 0.0))
  }

  test("calibration bins: per-bin counts and exact positive rate") {
    import spark.implicits._
    val df = Seq((5, 0), (15, 1), (17, 0), (25, 1), (27, 1), (29, 1))
      .toDF("s", "y")
    val got = Eval.calibrationBins(df, expr("s DIV 10"), col("y"))
      .orderBy(col("bin")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq((0L, 1L, 0L, 0.0), (1L, 2L, 1L, 0.5),
      (2L, 3L, 3L, 1.0)))
  }

  test("psi terms are exactly 0 for identical halves, positive on shift") {
    import spark.implicits._
    // each bin has equal ref/cur counts → p == q → term exactly 0.0
    val same = Seq((0, true), (0, false), (1, true), (1, false),
      (1, true), (1, false)).toDF("b", "r")
    val z = Eval.psiBins(same, col("b"), col("r")).collect()
    assert(z.forall(_.getDouble(3) == 0.0))
    // ref mass in bin 0, cur mass in bin 1 → both terms positive
    val shifted = (Seq.fill(20)((0, true)) ++ Seq.fill(2)((1, true)) ++
      Seq.fill(2)((0, false)) ++ Seq.fill(20)((1, false))).toDF("b", "r")
    val terms = Eval.psiBins(shifted, col("b"), col("r"))
      .collect().map(_.getDouble(3))
    assert(terms.forall(_ > 0) && terms.sum > 0.2,
      s"shift should trip the 0.2 alarm: ${terms.toSeq}")
  }

  test("mutual information: 0 for independence, ln 2 for identity") {
    import spark.implicits._
    // exactly independent joint: every (x, y) cell has the same count
    // → every ratio is 1 → every term ln(1) = 0 exactly
    val indep = (for { x <- 0 to 1; y <- 0 to 1; _ <- 1 to 5 }
      yield (x, y)).toDF("x", "y")
    val r0 = Eval.mutualInformation(indep, col("x"), col("y")).collect()(0)
    assert(r0.getLong(0) == 20 && r0.getLong(1) == 4)
    assert(r0.getDouble(2) == 0.0)
    // y == x, uniform two values → MI = ln 2, up to the per-cell
    // DECIMAL(28,9) pin (2 cells × round(0.5·ln2, 9))
    val ident = (for { x <- 0 to 1; _ <- 1 to 6 } yield (x, x))
      .toDF("x", "y")
    val mi = Eval.mutualInformation(ident, col("x"), col("y"))
      .collect()(0).getDouble(2)
    val expected = 2.0 * BigDecimal(0.5 * math.log(2.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(mi == expected, s"$mi vs $expected")
  }

  test("chi-squared: 0 at independence; hand value incl. a zero cell") {
    import spark.implicits._
    val indep = (for { x <- 0 to 1; y <- 0 to 1; _ <- 1 to 5 }
      yield (x, y)).toDF("x", "y")
    val r0 = Eval.chiSquared(indep, col("x"), col("y")).collect()(0)
    assert(r0.getLong(0) == 20 && r0.getLong(1) == 1)
    assert(r0.getDouble(2) == 0.0)
    // joint: (0,0)=4, (0,1)=2, (1,0)=3, (1,1)=0 — the zero-observed
    // cell must contribute E(1,1) = 3·2/9
    val rows = Seq.fill(4)((0, 0)) ++ Seq.fill(2)((0, 1)) ++
      Seq.fill(3)((1, 0))
    val r = Eval.chiSquared(rows.toDF("x", "y"), col("x"), col("y"))
      .collect()(0)
    assert(r.getLong(0) == 9 && r.getLong(1) == 1)
    val cells = Seq((4.0, 6.0 * 7 / 9), (2.0, 6.0 * 2 / 9),
      (3.0, 3.0 * 7 / 9), (0.0, 3.0 * 2 / 9))
    val expected = cells.map { case (o, e) =>
      BigDecimal((o - e) * (o - e) / e)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    }.sum.toDouble
    assert(r.getDouble(2) == expected, s"${r.getDouble(2)} vs $expected")
  }

  test("prCurve: hand-computed operating points, incl. tied scores") {
    import spark.implicits._
    // scores: 1(y=0), 2(y=1), 2(y=0), 3(y=1) — thresholds 1, 2, 3
    val df = Seq((1L, 0), (2L, 1), (2L, 0), (3L, 1)).toDF("s", "y")
    val out = Eval.prCurve(df, col("s"), col("y")).orderBy("threshold")
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      // threshold, tp, fp, fn, precision, recall
      (1L, 2L, 2L, 0L, 0.5, 1.0),
      (2L, 2L, 1L, 0L, 2.0 / 3.0, 1.0),
      (3L, 1L, 0L, 1L, 1.0, 0.5)))
  }

  test("prCurve: bucketed == default-bucketed; consistent with auc") {
    import spark.implicits._
    val df = (0 until 500).map { i =>
      val s = (i * 37) % 101
      (s.toLong, if (s + (i % 7) > 55) 1 else 0)
    }.toDF("s", "y")
    val a = Eval.prCurve(df, col("s"), col("y")).orderBy("threshold")
      .collect().toSeq
    val b = Eval.prCurve(df, col("s"), col("y"),
        bucketOf = c => (c / 10).cast("long"))
      .orderBy("threshold").collect().toSeq
    assert(a == b)
    // the refactor-shared machinery: auc still matches its O(n²) def
    val rows = df.as[(Long, Int)].collect()
    val pairs = for {
      (sp, yp) <- rows if yp == 1
      (sn, yn) <- rows if yn == 0
    } yield if (sp > sn) 1.0 else if (sp == sn) 0.5 else 0.0
    val want = pairs.sum / pairs.size
    val got = Eval.auc(df, col("s"), col("y")).head().getDouble(2)
    assert(math.abs(got - want) < 1e-12)
  }

  test("gainsTable: hand-computed deciles; perfect ranking front-loads") {
    import spark.implicits._
    // scores 10..1, positives at the top 3 scores: perfect ranking
    val df = (1 to 10).map(s => (s, if (s >= 8) 1 else 0))
      .toDF("s", "y")
    val got = Eval.gainsTable(df, col("s"), col("y"), nBuckets = 5)
      .orderBy("bucket")
      .as[(Int, Long, Long, Double, Double)].collect().toSeq
    // 5 buckets of 2: bucket 1 = scores {10,9} -> 2 of 3 positives
    assert(got.map(_._1) == Seq(1, 2, 3, 4, 5))
    assert(got.map(_._3) == Seq(2L, 3L, 3L, 3L, 3L))
    assert(got.head._5 == (2.0 / 3.0) / (2.0 / 10.0)) // lift ~3.33
    assert(got.last._4 == 1.0 && got.last._5 == 1.0)  // full population
    // gains are monotone non-decreasing
    assert(got.map(_._4).sliding(2).forall(w => w(0) <= w(1)))
  }

  test("gainsTable: ties never split across buckets") {
    import spark.implicits._
    // one score value carrying 6 of 10 rows: its whole block lands in
    // the bucket of its cumulative END position
    val df = (Seq.fill(6)((5, 1)) ++ (1 to 4).map(s => (s, 0))).toDF("s", "y")
    val got = Eval.gainsTable(df, col("s"), col("y"), nBuckets = 5)
      .orderBy("bucket").as[(Int, Long, Long, Double, Double)].collect()
    // the tie block (cn=6) sits alone in bucket 3; buckets 1-2 absent
    assert(got.map(_._1).toSeq == Seq(3, 4, 5))
    assert(got.head._2 == 6L && got.head._3 == 6L)
  }

  test("conformalInterval: hand quantile, coverage flags, null pred") {
    import spark.implicits._
    // key k: residuals 1,2,3,4,5 -> q(0.5) = 3 (exact interpolating
    // percentile on odd count); one null-prediction row passes through
    val df = Seq(("k", 10.0, 11.0), ("k", 10.0, 12.0), ("k", 10.0, 13.0),
      ("k", 10.0, 14.0), ("k", 10.0, 15.0))
      .toDF("g", "pred", "actual")
      .union(Seq(("k", Option.empty[Double], 99.0))
        .toDF("g", "pred", "actual"))
    val got = Eval.conformalInterval(df, Seq("g"), col("pred"),
        col("actual"), alpha = 0.5)
      .orderBy(col("actual")).collect()
    val banded = got.filter(!_.isNullAt(3))
    assert(banded.forall(_.getDouble(4) == 3.0)) // q
    // lo/hi = 7..13; actuals 11,12,13 hit; 14,15 miss -> coverage 3/5
    assert(banded.map(r => r.getBoolean(7)).toSeq ==
      Seq(true, true, true, false, false))
    val nullRow = got.filter(_.isNullAt(1)).head
    assert(nullRow.isNullAt(4) && nullRow.isNullAt(7))
  }

  test("conformalInterval: empirical coverage >= 1 - alpha on " +
    "exchangeable residuals") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val df = (0 until 500).map { i =>
      ("k", 50.0, 50.0 + rnd.nextGaussian() * 5) }
      .toDF("g", "pred", "actual")
    val hits = Eval.conformalInterval(df, Seq("g"), col("pred"),
        col("actual"), alpha = 0.2)
      .filter(col("hit")).count()
    assert(hits >= (500 * 0.8 * 0.95).toLong, s"coverage $hits/500")
  }

  test("mannWhitney: hand-computed U with ties, null z on degenerate") {
    import spark.implicits._
    // A = {1,3,3,5}, B = {2,3,4}: U = 0 + 1.5 + 1.5 + 3 = 6 = n_a*n_b/2
    // -> z = 0; tie sum = 3^3-3 = 24
    val df = (Seq(1.0, 3.0, 3.0, 5.0).map((_, true)) ++
      Seq(2.0, 3.0, 4.0).map((_, false))).toDF("v", "a")
    val r = graft.ext.Eval.mannWhitney(df, col("v"), col("a")).head()
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((4L, 3L, 6.0)))
    assert(r.getDouble(4) == 0.0, s"z ${r.getDouble(4)}")
    // no ties, clean separation: U=6, mu=3, sigma^2 = 6/12*6 = 3
    val df2 = (Seq(10.0, 20.0, 30.0).map((_, true)) ++
      Seq(1.0, 2.0).map((_, false))).toDF("v", "a")
    val r2 = graft.ext.Eval.mannWhitney(df2, col("v"), col("a")).head()
    assert(r2.getDouble(2) == 6.0 && r2.getDouble(3) == 1.0)
    val want = BigDecimal(3.0 / math.sqrt(3.0))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r2.getDouble(4) == want, s"z ${r2.getDouble(4)} vs $want")
    // every value identical -> sigma = 0 -> null z, not infinity
    val r3 = graft.ext.Eval.mannWhitney(
      Seq((7.0, true), (7.0, false), (7.0, true)).toDF("v", "a"),
      col("v"), col("a")).head()
    assert(r3.isNullAt(4), r3.toString)
  }

  test("mannWhitney: a hot value with >2.09M tied rows (t^3 > 2^63) " +
    "keeps the tie correction exact — no silent Long overflow") {
    import spark.implicits._
    // one value tied across 2.4M rows (t^3 ~ 1.4e19 > Long.MaxValue)
    // plus two clean values; expected z from exact BigInt arithmetic
    val tied = 2400000L
    val aTied = tied / 2
    val df = spark.range(tied)
      .select(lit(0.0).as("v"), (col("id") % 2 === 0).as("a"))
      .unionAll(spark.range(50)
        .select(lit(1.0).as("v"), lit(true).as("a")))
      .unionAll(spark.range(30)
        .select(lit(2.0).as("v"), lit(false).as("a")))
    val r = graft.ext.Eval.mannWhitney(df, col("v"), col("a")).head()
    val (na, nb) = (aTied + 50, tied - aTied + 30)
    assert((r.getLong(0), r.getLong(1)) == ((na, nb)))
    // U = sum over A-values of (#B below + #B tied / 2):
    //   v=0: aTied * (0 + (tied - aTied)/2); v=1: 50 * (tied - aTied)
    val u = aTied.toDouble * (tied - aTied) / 2.0 +
      50.0 * (tied - aTied)
    assert(r.getDouble(2) == u, s"u ${r.getDouble(2)} vs $u")
    val n = na + nb
    val ties = (BigInt(tied).pow(3) - tied) + (BigInt(50).pow(3) - 50) +
      (BigInt(30).pow(3) - 30)
    assert(ties > BigInt(Long.MaxValue), "test must exceed Long range")
    val sigma2 = na.toDouble * nb / 12.0 *
      ((n + 1.0) - ties.toDouble / (n.toDouble * (n - 1.0)))
    val want = BigDecimal(
        (u - na.toDouble * nb / 2.0) / math.sqrt(sigma2))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) == want, s"z ${r.getDouble(4)} vs $want")
  }

  test("ksTest: hand-computed D, zero on identical samples") {
    import spark.implicits._
    val a = Seq(1, 1, 2, 3).toDF("v")   // F_a: 1->.5, 2->.75, 3->1
    val b = Seq(2, 3, 3, 4).toDF("v")   // F_b: 1->0, 2->.25, 3->.75, 4->1
    val (na, nb, d) = Eval.ksTest(a, b, "v")
      .as[(Long, Long, Double)].head()
    assert((na, nb) == ((4L, 4L)))
    assert(d == 0.5) // at v=1: |.5 - 0|
    val (_, _, z) = Eval.ksTest(a, a, "v").as[(Long, Long, Double)].head()
    assert(z == 0.0)
  }

  test("ksTest detects a shifted distribution") {
    import spark.implicits._
    val a = (0 until 400).map(_ % 20).toDF("v")
    val b = (0 until 400).map(i => i % 20 + 8).toDF("v")
    val d = Eval.ksTest(a, b, "v").as[(Long, Long, Double)].head()._3
    assert(d >= 0.35, s"shift not detected: $d")
  }

  test("emd1d: hand-computed transport cost, zero on identical samples") {
    import spark.implicits._
    // F_a at 1:.5, 2:.75, 3:1 ; F_b at 1:0, 2:.25, 3:.75, 4:1
    // gaps all 1 → EMD = |.5−0| + |.75−.25| + |1−.75| = 1.25
    val a = Seq(1, 1, 2, 3).toDF("v")
    val b = Seq(2, 3, 3, 4).toDF("v")
    val (na, nb, e) = Eval.emd1d(a, b, "v")
      .as[(Long, Long, Double)].head()
    assert((na, nb) == ((4L, 4L)))
    assert(e == 1.25)
    val (_, _, z) = Eval.emd1d(a, a, "v").as[(Long, Long, Double)].head()
    assert(z == 0.0)
  }

  test("emd1d: a pure location shift costs exactly the shift " +
    "(where KS saturates at the overlap)") {
    import spark.implicits._
    val a = (0 until 400).map(_ % 20).toDF("v")
    val b = (0 until 400).map(i => i % 20 + 7).toDF("v")
    val e = Eval.emd1d(a, b, "v").as[(Long, Long, Double)].head()._3
    assert(e == 7.0, s"shift transport: $e")
  }

  test("emd1d: value gaps weight the cost (same counts, farther mass)") {
    import spark.implicits._
    val a = Seq(0, 0, 0, 0).toDF("v")
    val near = Seq(10, 10, 10, 10).toDF("v")
    val far = Seq(1000, 1000, 1000, 1000).toDF("v")
    val eNear = Eval.emd1d(a, near, "v").as[(Long, Long, Double)].head()._3
    val eFar = Eval.emd1d(a, far, "v").as[(Long, Long, Double)].head()._3
    assert(eNear == 10.0 && eFar == 1000.0)
    // KS cannot tell these apart — both are total separation
    val kNear = Eval.ksTest(a, near, "v").as[(Long, Long, Double)].head()._3
    val kFar = Eval.ksTest(a, far, "v").as[(Long, Long, Double)].head()._3
    assert(kNear == 1.0 && kFar == 1.0)
  }

  test("emd1d is partitioning-invariant (exact integer terms)") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val a = Seq.fill(500)(rnd.nextInt(10000).toLong).toDF("v")
    val b = Seq.fill(400)(rnd.nextInt(10000) + 2000L).toDF("v")
    val one = Eval.emd1d(a.repartition(1), b.repartition(1), "v")
      .as[(Long, Long, Double)].head()
    val many = Eval.emd1d(a.repartition(7), b.repartition(5), "v")
      .as[(Long, Long, Double)].head()
    assert(one == many)
    assert(one._3 > 0.0)
  }
}
