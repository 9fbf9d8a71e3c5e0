package graft.agg

import graft.SparkTestBase

class RobustSpec extends SparkTestBase {
  import spark.implicits._

  test("winsorizedStats: bounds, clip counts, clipped mean") {
    // group g: 1..100 plus outliers -1000 and 5000
    val df = ((1 to 100).map(v => ("g", v.toDouble)) ++
      Seq(("g", -1000.0), ("g", 5000.0))).toDF("k", "v")
    val r = Robust.winsorizedStats(df, "k", "v", 0.1, 0.9).collect()(0)
    val (lo, hi) = (r.getAs[Double]("lo"), r.getAs[Double]("hi"))
    assert(lo > -1000 && hi < 5000, "percentile bounds exclude outliers")
    assert(r.getAs[Long]("n_clipped_lo") >= 1)
    assert(r.getAs[Long]("n_clipped_hi") >= 1)
    val mean = r.getAs[Double]("clipped_mean")
    assert(mean >= lo && mean <= hi)
    assert(r.getAs[Long]("n_rows") == 102)
  }

  test("winsorizedStats: no clipping when bounds are the extremes") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0)).toDF("k", "v")
    val r = Robust.winsorizedStats(df, "k", "v", 0.0, 1.0).collect()(0)
    assert(r.getAs[Long]("n_clipped_lo") == 0)
    assert(r.getAs[Long]("n_clipped_hi") == 0)
    // decimal output (exact at any scale — the ×100 sweep contract)
    assert(r.getAs[java.math.BigDecimal]("clipped_sum")
      .doubleValue == 6.0)
  }

  test("winsorizedStats null contract: mean over non-null count only") {
    // 1..4 plus two nulls: sum 10 over 4 non-null values, not 6 rows
    val df = (Seq.tabulate(4)(i => ("g", Option((i + 1).toDouble))) ++
      Seq(("g", Option.empty[Double]), ("g", Option.empty[Double])))
      .toDF("k", "v")
    val r = Robust.winsorizedStats(df, "k", "v", 0.0, 1.0).collect()(0)
    assert(r.getAs[Long]("n_rows") == 6, "n_rows counts every row")
    assert(r.getAs[Double]("clipped_mean") == 2.5,
      "mean must divide by the non-null count (10/4), not n_rows (10/6)")
  }

  test("boxplotStats: Tukey quartiles, in-fence whiskers, outliers") {
    // group g: 1..11 plus outliers -100 and 100 — 13 values, so
    // q1=3, median=6, q3=9, IQR=6, fences [-6, 18]; group h: clean
    val df = ((1 to 11).map(v => ("g", v.toDouble)) ++
      Seq(("g", -100.0), ("g", 100.0)) ++
      (1 to 5).map(v => ("h", v.toDouble))).toDF("k", "v")
    val rows = Robust.boxplotStats(df, "k", "v").collect()
    val g = rows.find(_.getString(0) == "g").get
    assert(g.getAs[Long]("n_rows") == 13)
    assert(g.getAs[Double]("median") == 6.0)
    assert(g.getAs[Double]("whisker_lo") == 1.0,
      "whisker is the lowest datum INSIDE the fence, not the fence")
    assert(g.getAs[Double]("whisker_hi") == 11.0)
    assert(g.getAs[Long]("n_outliers") == 2)
    val h = rows.find(_.getString(0) == "h").get
    assert(h.getAs[Long]("n_outliers") == 0)
    assert(h.getAs[Double]("whisker_lo") == 1.0 &&
      h.getAs[Double]("whisker_hi") == 5.0)
  }

  test("jackknifeSE of the mean == the classical s/sqrt(n) identity") {
    // for the MEAN statistic, jackknife SE equals sqrt(Σ(x-x̄)²/(n(n-1)))
    val rnd = new scala.util.Random(41)
    val vals = Seq.fill(80)((rnd.nextInt(10000) / 100.0))
    val got = Robust.jackknifeSE(vals.map(("g", _)).toDF("g", "v"),
      "g", "v").as[(String, Long, Double, Double)].head()
    val mean = vals.sum / vals.size
    val classical = math.sqrt(
      vals.map(x => (x - mean) * (x - mean)).sum /
        (vals.size * (vals.size - 1.0)))
    assert(got._2 == 80L)
    assert(math.abs(got._4 - classical) < 1e-5,
      s"jk ${got._4} vs classical $classical")
  }

  test("robustScale: hand median/IQR; constant group scales to null") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 100.0), // outlier widens a z-score, not the IQR
      ("b", 7.0), ("b", 7.0)).toDF("g", "v")
    val got = Robust.robustScale(df, "g", "v")
      .collect().map(r => (r.getString(0), r.getDouble(1),
        if (r.isNullAt(2)) Double.NaN else r.getDouble(2))).toSeq
    // group a: med 3, q1 2, q3 4 -> iqr 2; scaled(1.0) = -1, scaled(100)=48.5
    val a = got.filter(_._1 == "a").map(r => r._2 -> r._3).toMap
    assert(a(1.0) == -1.0 && a(3.0) == 0.0 && a(100.0) == 48.5,
      a.toString)
    // constant group: iqr 0 -> null, not infinity
    got.filter(_._1 == "b").foreach(r => assert(r._3.isNaN))
  }

  test("theilSen: exact line recovered; one wild outlier moves nothing") {
    // y = 3t + 10 on t=0..9, except t=5 is corrupted by +1000
    val clean = (0L to 9L).map(t => ("k", t, 3.0 * t + 10.0))
    val dirty = clean.map { case (g, t, v) =>
      if (t == 5L) (g, t, v + 1000.0) else (g, t, v) }
    val got = Robust.theilSen(dirty.toDF("g", "t", "v"), "g", "t", "v")
      .as[(String, Double, Double, Long)].head()
    assert(got._2 == 3.0, s"slope ${got._2}")       // median slope exact
    assert(got._3 == 10.0, s"intercept ${got._3}")  // median residual
    assert(got._4 == 45L)                           // C(10,2) pairs
    // OLS on the same data is dragged far off the true slope
    val ols = dirty.toDF("g", "t", "v")
      .agg(org.apache.spark.sql.functions.expr("regr_slope(v, t)"))
      .head().getDouble(0)
    assert(math.abs(ols - 3.0) > 5.0, s"OLS $ols unexpectedly robust")
  }

  test("gini: known values — equality 0, extreme concentration -> (n-1)/n") {
    val equal = (1 to 10).map(i => ("e", 5.0)).toDF("g", "v")
    val concentrated = (("c", 100.0) +: Seq.fill(9)(("c", 0.0))).toDF("g", "v")
    val ge = Robust.gini(equal, "g", "v").as[(String, Long, Double)].head()
    assert(ge._2 == 10L && ge._3 == 0.0)
    val gc = Robust.gini(concentrated, "g", "v")
      .as[(String, Long, Double)].head()
    assert(gc._3 == 0.9) // one holder of everything: (n-1)/n
  }

  test("gini == brute-force mean-absolute-difference formula") {
    // G = Σ|xi−xj| / (2 n Σx) over all ordered pairs
    val rnd = new scala.util.Random(31)
    val vals = Seq.fill(60)((rnd.nextInt(1000) + 1).toDouble)
    val got = Robust.gini(vals.map(("g", _)).toDF("g", "v"), "g", "v")
      .as[(String, Long, Double)].head()._3
    val madSum = (for { a <- vals; b <- vals } yield math.abs(a - b)).sum
    val want = madSum / (2.0 * vals.size * vals.sum)
    assert(math.abs(got - want) < 1e-9, s"$got vs $want")
  }

  test("corrMatrix: one-pass matrix — exact +1/-1, hand r, " +
    "zero-variance nulls, complete-case drops") {
    val df = Seq(
      (1.0, 2.0, -1.0, 5.0, Some(1.0)),
      (2.0, 4.0, -2.0, 5.0, Some(9.0)),
      (3.0, 6.0, -3.0, 5.0, None),
      (4.0, 8.0, -4.0, 5.0, Some(4.0))
    ).toDF("a", "b", "c", "k", "m")
    val got = Robust.corrMatrix(df, Seq("a", "b", "c", "k"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(("a", "b")) == Some(1.0))    // b = 2a exactly
    assert(got(("a", "c")) == Some(-1.0))   // c = -a exactly
    assert(got(("b", "c")) == Some(-1.0))
    // constant column: zero variance -> null against everything
    assert(got(("a", "k")) == None && got(("b", "k")) == None &&
      got(("c", "k")) == None)
    assert(got.size == 6)
    // complete-case: the null-m row drops for EVERY pair when m is in
    // the column set, and r matches the hand formula on the 3 rows
    val withM = Robust.corrMatrix(df, Seq("a", "m"))
      .collect().map(r => (r.getLong(2), r.getDouble(3))).head
    val (xs, ys) = (Seq(1.0, 2.0, 4.0), Seq(1.0, 9.0, 4.0))
    val n = 3.0
    val hand = (xs.zip(ys).map { case (x, y) => x * y }.sum -
      xs.sum * ys.sum / n) /
      math.sqrt((xs.map(x => x * x).sum - xs.sum * xs.sum / n) *
        (ys.map(y => y * y).sum - ys.sum * ys.sum / n))
    val pinned = BigDecimal(hand)
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(withM._1 == 3L && math.abs(withM._2 - pinned) < 1e-9,
      s"$withM vs $pinned")
  }

  test("weightedMedian: lower-median rule, weights dominate counts") {
    val df = Seq(
      // group a: value 10 carries 1, value 20 carries 5 -> median 20
      ("a", 10.0, 1L), ("a", 20.0, 5L),
      // group b: exact half boundary at the first value (2*3 >= 6)
      ("b", 1.0, 3L), ("b", 9.0, 3L),
      // group c: duplicate value rows collapse; nulls/zero-w ignored
      ("c", 4.0, 1L), ("c", 4.0, 1L), ("c", 5.0, 1L), ("c", 6.0, 0L)
    ).toDF("g", "v", "w")
    val got = Robust.weightedMedian(df, "g", "v", "w")
      .as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 20.0, "b" -> 1.0, "c" -> 4.0), got.toString)
  }

  test("weightedMedian: fractional weights round half-up, 0-rounds drop") {
    val df = Seq(
      // 0.6 rounds to 1 (not truncates to 0); 2.5 rounds half-up to 3
      ("a", 10.0, 0.6), ("a", 20.0, 2.5),
      // every weight rounds to 0 -> the whole group drops rather than
      // degenerate to its min value via a 0 >= 0 cum filter
      ("b", 1.0, 0.4), ("b", 9.0, 0.2)
    ).toDF("g", "v", "w")
    val got = Robust.weightedMedian(df, "g", "v", "w")
      .as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 20.0), got.toString)
  }

  test("weightedMedian == brute-force expansion on random data") {
    val rnd = new scala.util.Random(17)
    val rows = (0 until 300).map(i =>
      (s"g${i % 4}", rnd.nextInt(40).toDouble, (rnd.nextInt(5) + 1).toLong))
    val got = Robust.weightedMedian(rows.toDF("g", "v", "w"), "g", "v", "w")
      .as[(String, Double)].collect().toMap
    val expect = rows.groupBy(_._1).view.mapValues { g =>
      val expanded = g.flatMap { case (_, v, w) =>
        Seq.fill(w.toInt)(v) }.sorted
      // lower weighted median == lower median of the expanded multiset
      expanded((expanded.size - 1) / 2)
    }.toMap
    assert(got == expect, s"got=$got expect=$expect")
  }
}
