package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY §5.2) over small generated frames:
  * melt∘pivot identity, union row preservation, clean-aggregate total
  * preservation. Generators stay small (≤40 rows) — the properties are
  * about semantics, not scale. ScalaCheck generators are driven directly
  * with fixed seeds (the scalatest bridge isn't in the offline cache),
  * so every run replays the same 15 cases per property.
  */
class PropertySpec extends graft.SparkTestBase {
  import spark.implicits._

  /** Deterministically sample `n` values from a generator. */
  private def samples[A](g: Gen[A], n: Int = 15): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(42L + i)))

  private def forAll[A](g: Gen[A])(body: A => Unit): Unit =
    samples(g).foreach(body)

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(body: (A, B) => Unit): Unit =
    samples(g1).zip(samples(g2)).foreach { case (a, b) => body(a, b) }

  private val keyGen = Gen.alphaLowerStr.map(_.take(4)).suchThat(_.nonEmpty)
  private val rowsGen = Gen.nonEmptyListOf(for {
    k <- keyGen
    nsw <- Gen.chooseNum(0.0, 1000.0)
    vic <- Gen.chooseNum(0.0, 1000.0)
  } yield (k, nsw, vic)).map(_.take(40))

  test("property: pivot(melt(wide)) == aggregated wide") {
    forAll(rowsGen) { rows =>
      val wide = rows.toDF("k", "NSW", "VIC")
        .groupBy("k").agg(sum("NSW").as("NSW"), sum("VIC").as("VIC"))
      val long = Reshape.melt(wide, Seq("k"), Seq("NSW", "VIC"), "state", "v")
      val back = Reshape.pivotSum(long, Seq("k"), "state", Seq("NSW", "VIC"), "v")
      val a = wide.orderBy("k").collect().toSeq
      val b = back.orderBy("k").collect().toSeq
      assert(a == b)
    }
  }

  test("property: unionAligned preserves every input row") {
    forAll(rowsGen, rowsGen) { (r1, r2) =>
      val f1 = r1.toDF("k", "NSW", "VIC")
      val f2 = r2.map { case (k, a, _) => (k, a) }.toDF("k", "QLD")
      val u = Reshape.unionAligned(Seq(f1, f2))
      assert(u.count() == r1.size + r2.size)
      assert(u.columns.toSeq == Seq("k", "NSW", "VIC", "QLD"))
      // rows from f2 have null NSW/VIC; from f1 null QLD
      assert(u.filter(col("QLD").isNull).count() == r1.size)
    }
  }

  test("property: cleanAggregate preserves measure totals per (year,state)") {
    val tidyGen = Gen.nonEmptyListOf(for {
      y <- Gen.oneOf(2021, 2022, 2023)
      s <- Gen.oneOf("NSW", "VIC", "QLD")
      c <- Gen.option(Gen.oneOf("c1", "c2"))
      v <- Gen.chooseNum(0.0, 100.0)
    } yield (y, s, c, v)).map(_.take(40))
    forAll(tidyGen) { rows =>
      val tidy = rows.toDF("year", "state", "category", "separations")
      val clean = Tidy.cleanAggregate(tidy, Seq("category"))
      val before = tidy.groupBy("year", "state")
        .agg(sum("separations").as("t")).orderBy("year", "state")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
      val after = clean.groupBy("year", "state")
        .agg(sum("separations").as("t")).orderBy("year", "state")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2)))
      // sums of the same doubles in possibly different order: compare
      // with a tolerance to stay honest about fp reassociation
      assert(before.length == after.length)
      before.zip(after).foreach { case ((y1, s1, t1), (y2, s2, t2)) =>
        assert(y1 == y2 && s1 == s2 && math.abs(t1 - t2) < 1e-6)
      }
    }
  }

  test("property: melt drops exactly the null measures") {
    val withNullsGen = Gen.nonEmptyListOf(for {
      k <- keyGen
      nsw <- Gen.option(Gen.chooseNum(0.0, 10.0))
      vic <- Gen.option(Gen.chooseNum(0.0, 10.0))
    } yield (k, nsw, vic)).map(_.take(30))
    forAll(withNullsGen) { rows =>
      val wide = rows.toDF("k", "NSW", "VIC")
      val long = Reshape.melt(wide, Seq("k"), Seq("NSW", "VIC"), "state", "v")
      val expected = rows.map(r => r._2.size + r._3.size).sum
      assert(long.count() == expected)
      assert(long.filter(col("v").isNull).count() == 0)
    }
  }
}
