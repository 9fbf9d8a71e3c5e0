package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ExperimentSpec extends SparkTestBase {
  import spark.implicits._

  test("cuped: theta == hand cov/var; strong covariate slashes " +
    "variance; pooled mean is preserved") {
    val rnd = new scala.util.Random(23)
    // y = 2x + small noise: rho^2 ~ .97 -> variance should collapse
    val rows = (0 until 400).map { i =>
      val x = rnd.nextDouble() * 100
      val y = 2.0 * x + rnd.nextGaussian() * 5
      (if (i % 2 == 0) "A" else "B", x, y)
    }
    val out = Experiment.cuped(rows.toDF("v", "x", "y"), "v",
        col("x"), col("y"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getDouble(5), r.getDouble(6))).toMap
    for ((_, (_, _, _, vy, vya, red)) <- out) {
      assert(red > 0.9, s"expected >90% reduction, got $red")
      assert(vya < vy * 0.1)
    }
    // pooled adjustment is mean-zero (up to the 9dp pins): the summed
    // adjusted metric equals the summed raw metric
    val pooledDiff = out.values.map { case (n, my, mya, _, _, _) =>
      n * (my - mya) }.sum
    assert(math.abs(pooledDiff) < 1e-3, s"pooled shift $pooledDiff")
    // exact tiny case: x=(0,2), y=(0,4): theta = cov/var = 2, mx=1,
    // yadj = y - 2(x-1) = (2, 2) -> var_y_adj = 0
    val tiny = Seq(("A", 0.0, 0.0), ("A", 2.0, 4.0)).toDF("v", "x", "y")
    val t = Experiment.cuped(tiny, "v", col("x"), col("y")).head()
    assert(t.getDouble(3) == 2.0 && t.getDouble(5) == 0.0, t.toString)
  }

  test("cuped: zero-variance covariate passes Y through unadjusted " +
    "(theta = 0), never NaN/null") {
    // constant X -> var(X) = 0 -> theta would be 0/0; the guard must
    // fall back to no adjustment: mean_y_adj == mean_y, var_y_adj ==
    // var_y, var_reduction == 0, and nothing comes back null
    val df = Seq(("A", 7.0, 1.0), ("A", 7.0, 3.0),
      ("B", 7.0, 2.0), ("B", 7.0, 6.0)).toDF("v", "x", "y")
    val out = Experiment.cuped(df, "v", col("x"), col("y")).collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert((0 until r.length).forall(!r.isNullAt(_)), r.toString)
      assert(r.getDouble(2) == r.getDouble(3), s"mean shifted: $r")
      assert(r.getDouble(4) == r.getDouble(5), s"var shifted: $r")
      assert(r.getDouble(6) == 0.0, s"reduction not 0: $r")
    }
  }

  test("ebShrinkRates: small-n keys collapse to the prior mean, " +
    "large-n keys keep their data; degenerate prior passes through") {
    val rnd = new scala.util.Random(31)
    // many keys with true rate ~ Beta-ish spread, plus two extremes:
    // key 9001 = 1/1 (all success), key 9002 = 96/100
    val base = (0 until 60).flatMap { k =>
      val p = 0.2 + 0.6 * rnd.nextDouble()
      (0 until 50).map(i => (k.toLong, rnd.nextDouble() < p))
    }
    val rows = base ++ Seq((9001L, true)) ++
      (0 until 100).map(i => (9002L, i < 96))
    val out = Experiment.ebShrinkRates(rows.toDF("k", "ok"), "k",
        col("ok"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(3), r.getDouble(6))).toMap
    val m = out.values.map(_._2).sum / out.size // ~ prior mean
    val (n1, raw1, shr1) = out(9001L)
    val (n2, raw2, shr2) = out(9002L)
    assert(n1 == 1L && raw1 == 1.0)
    // the 1/1 key collapses most of the way to the prior mean...
    assert(shr1 < 0.75 && math.abs(shr1 - m) < math.abs(raw1 - m) * 0.8,
      s"shr1=$shr1 m=$m")
    // ...while 96/100 keeps most of its signal and STILL outranks it
    assert(raw2 == 0.96 && shr2 > 0.8 && shr2 > shr1,
      s"shr2=$shr2 shr1=$shr1")
    // degenerate: every key identical rate -> var 0 -> raw passthrough
    val flat = (0 until 5).flatMap(k =>
      Seq((k.toLong, true), (k.toLong, false)))
    val f = Experiment.ebShrinkRates(flat.toDF("k", "ok"), "k",
        col("ok"))
      .select("p_raw", "p_shrunk", "alpha")
      .collect()
    f.foreach { r =>
      assert(r.getDouble(0) == 0.5 && r.getDouble(1) == 0.5 &&
        r.isNullAt(2))
    }
  }
}
