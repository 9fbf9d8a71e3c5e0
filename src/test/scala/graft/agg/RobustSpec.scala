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
    assert(r.getAs[Double]("clipped_sum") == 6.0)
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
}
