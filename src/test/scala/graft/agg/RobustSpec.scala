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
}
