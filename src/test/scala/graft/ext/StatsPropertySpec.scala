package graft.ext

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the round-8 statistical operators,
  * following PropertySpec's fixed-seed generator discipline (the
  * scalatest-scalacheck bridge isn't in the offline cache): 15
  * replayable cases per property, generators small enough that a
  * brute-force reference stays trivial.
  */
class StatsPropertySpec extends graft.SparkTestBase {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int = 15): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(1042L + i)))

  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    samples(g).foreach(body)

  // ties-heavy: values from a small domain, tie-break id unique
  private val rankedRowsGen = for {
    n <- Gen.chooseNum(1, 120)
    dom <- Gen.chooseNum(1, 8)
    vals <- Gen.listOfN(n, Gen.chooseNum(0, dom))
  } yield vals.zipWithIndex.map { case (v, i) => (v.toLong, i.toLong) }

  test("property: Ranks.ntileDesc == the ntile window for random " +
    "sizes, tie densities, and k") {
    forAll(Gen.zip(rankedRowsGen, Gen.oneOf(2, 3, 5, 7))) {
      case (rows, k) =>
        val df = rows.toDF("key", "tie")
        val got = graft.ops.Ranks
          .ntileDesc(df, "key", "tie", k, out = "q", buckets = 4)
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
          .toMap
        val w = Window.orderBy(col("key").desc, col("tie"))
        val want = df.withColumn("q", ntile(k).over(w))
          .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
          .toMap
        assert(got == want, s"k=$k rows=${rows.size}")
    }
  }

  private val twoSampleGen = for {
    na <- Gen.chooseNum(1, 60)
    nb <- Gen.chooseNum(1, 60)
    a <- Gen.listOfN(na, Gen.chooseNum(0, 9))
    b <- Gen.listOfN(nb, Gen.chooseNum(0, 9))
  } yield (a.map(_.toDouble), b.map(_.toDouble))

  test("property: mannWhitney U == brute-force pair counting with " +
    "half-credit ties") {
    forAll(twoSampleGen) { case (as, bs) =>
      val df = (as.map((_, true)) ++ bs.map((_, false))).toDF("v", "a")
      val r = Eval.mannWhitney(df, col("v"), col("a")).head()
      val brute = (for (x <- as; y <- bs) yield
        if (x > y) 1.0 else if (x == y) 0.5 else 0.0).sum
      assert(r.getLong(0) == as.size && r.getLong(1) == bs.size)
      assert(r.getDouble(2) == brute,
        s"U ${r.getDouble(2)} vs brute $brute")
      // z is null exactly when the variance degenerates (all values
      // tied); otherwise finite with the sign of (U - n_a n_b / 2)
      val allTied = (as ++ bs).distinct.size == 1
      if (allTied) assert(r.isNullAt(4))
      else {
        val z = r.getDouble(4)
        assert(!z.isNaN && !z.isInfinite)
        val lean = brute - as.size.toDouble * bs.size / 2.0
        assert(math.signum(z) == math.signum(lean) || lean == 0.0)
      }
    }
  }

  private val ratesGen = for {
    nk <- Gen.chooseNum(3, 20)
    keys <- Gen.listOfN(nk, Gen.zip(
      Gen.chooseNum(1, 40), Gen.chooseNum(0.0, 1.0)))
  } yield keys.zipWithIndex.flatMap { case ((n, p), k) =>
    (0 until n).map(i => (k.toLong, i < (p * n).round))
  }

  test("property: ebShrinkRates pulls every key STRICTLY toward the " +
    "implied prior mean, never past it") {
    forAll(ratesGen) { rows =>
      val out = Experiment.ebShrinkRates(rows.toDF("k", "ok"), "k",
          col("ok"))
        .collect().map(r => (r.getDouble(3),
          if (r.isNullAt(4)) None else Some((r.getDouble(4),
            r.getDouble(5))), r.getDouble(6)))
      out.foreach { case (raw, ab, shrunk) =>
        ab match {
          case None => assert(shrunk == raw) // degenerate passthrough
          case Some((alpha, beta)) =>
            val prior = alpha / (alpha + beta)
            // p_shrunk is a convex combination of p_raw and the prior
            // mean -> it lies between them (inclusive under rounding)
            val (lo, hi) = (math.min(raw, prior), math.max(raw, prior))
            assert(shrunk >= lo - 1e-9 && shrunk <= hi + 1e-9,
              s"raw=$raw prior=$prior shrunk=$shrunk")
        }
      }
    }
  }
}
