package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Holt linear smoothing: hand-computed parity, plain-Scala reference
  * parity on longer series, EWMA degeneration, partition invariance.
  */
class ForecastSpec extends SparkTestBase {
  import spark.implicits._

  /** Plain-Scala reference for one series. */
  private def holtRef(xs: Seq[Double], a: Double, b: Double)
      : Seq[(Double, Double, Option[Double])] = {
    var l = xs.head; var t = 0.0
    (l, 0.0, Option.empty[Double]) +: xs.tail.map { x =>
      val fit = l + t
      val nl = a * x + (1 - a) * fit
      val nt = b * (nl - l) + (1 - b) * t
      l = nl; t = nt
      (nl, nt, Some(fit))
    }
  }

  test("hand-computed two-step recurrence") {
    val df = Seq(("k", 1L, 10.0), ("k", 2L, 20.0), ("k", 3L, 12.0))
      .toDF("k", "t", "x")
    val out = Forecast.holtLinear(df, Seq("k"), "t", "x", 0.5, 0.25)
      .orderBy("t")
      .select("level", "trend", "fit")
      .as[(Double, Double, Option[Double])].collect().toSeq
    // t1: l=10, b=0, fit null
    // t2: fit=10, l=.5*20+.5*10=15, b=.25*5+.75*0=1.25
    // t3: fit=16.25, l=.5*12+.5*16.25=14.125, b=.25*(-0.875)+.75*1.25=0.71875
    assert(out == Seq(
      (10.0, 0.0, None),
      (15.0, 1.25, Some(10.0)),
      (14.125, 0.71875, Some(16.25))))
  }

  test("fold == plain-Scala reference on a longer noisy series") {
    val xs = (0 until 200).map(i =>
      50.0 + i * 0.5 + ((i * 2654435761L) % 17).toDouble)
    val df = xs.zipWithIndex.map { case (x, i) => ("s", i.toLong, x) }
      .toDF("k", "t", "x")
    val got = Forecast.holtLinear(df, Seq("k"), "t", "x", 0.5, 0.25)
      .orderBy("t").select("level", "trend", "fit")
      .as[(Double, Double, Option[Double])].collect().toSeq
    val want = holtRef(xs, 0.5, 0.25)
    assert(got == want) // bit-exact, not approximate
  }

  test("series are independent across keys") {
    val df = Seq(("a", 1L, 10.0), ("b", 1L, 100.0),
      ("a", 2L, 20.0), ("b", 2L, 200.0)).toDF("k", "t", "x")
    val out = Forecast.holtLinear(df, Seq("k"), "t", "x", 0.5, 0.25)
      .filter(col("t") === 2).orderBy("k")
      .select("k", "level").as[(String, Double)].collect().toSeq
    assert(out == Seq(("a", 15.0), ("b", 150.0)))
  }

  test("ewma: dead trend, fit is the running smooth") {
    val df = Seq(("k", 1L, 8.0), ("k", 2L, 4.0), ("k", 3L, 6.0))
      .toDF("k", "t", "x")
    val out = Forecast.ewma(df, Seq("k"), "t", "x", 0.5)
      .orderBy("t").select("ewma", "fit")
      .as[(Double, Option[Double])].collect().toSeq
    assert(out == Seq((8.0, None), (6.0, Some(8.0)), (6.0, Some(6.0))))
  }

  test("holtWinters: hand-computed steps with a period-2 season") {
    // m=2, α=.5, β=.25, γ=.25; xs: 10, 20, 12
    // t0: l=10, b=0, s=[0,0], fit null
    // t1 (i=1): si=0, fit=10, l=.5*20+.5*10=15, b=.25*5=1.25,
    //           s[1]=.25*(20-15)=1.25
    // t2 (i=0): si=0, fit=15+1.25=16.25, l=.5*12+.5*16.25=14.125,
    //           b=.25*(-.875)+.75*1.25=.71875, s[0]=.25*(12-14.125)=-.53125
    val df = Seq(("k", 1L, 10.0), ("k", 2L, 20.0), ("k", 3L, 12.0))
      .toDF("k", "t", "x")
    val out = Forecast.holtWinters(df, Seq("k"), "t", "x", m = 2,
        alpha = 0.5, beta = 0.25, gamma = 0.25)
      .orderBy("t").select("level", "trend", "seasonal", "fit")
      .as[(Double, Double, Double, Option[Double])].collect().toSeq
    assert(out == Seq(
      (10.0, 0.0, 0.0, None),
      (15.0, 1.25, 1.25, Some(10.0)),
      (14.125, 0.71875, -0.53125, Some(16.25))))
  }

  test("holtWinters == plain-Scala reference on a seasonal series") {
    val m = 7
    val xs = (0 until 150).map(i =>
      100.0 + 3.0 * (i % m) + ((i * 2654435761L) % 11).toDouble)
    val df = xs.zipWithIndex.map { case (x, i) => ("s", i.toLong, x) }
      .toDF("k", "t", "x")
    val got = Forecast.holtWinters(df, Seq("k"), "t", "x", m,
        0.5, 0.25, 0.25)
      .orderBy("t").select("level", "trend", "seasonal", "fit")
      .as[(Double, Double, Double, Option[Double])].collect().toSeq
    // plain-Scala twin
    var l = xs.head; var b = 0.0
    val s = new Array[Double](m)
    val want = (l, 0.0, 0.0, Option.empty[Double]) +:
      xs.tail.zipWithIndex.map { case (x, i0) =>
        val i = (i0 + 1) % m
        val fit = l + b + s(i)
        val nl = 0.5 * (x - s(i)) + 0.5 * (l + b)
        val nb = 0.25 * (nl - l) + 0.75 * b
        val ns = 0.25 * (x - nl) + 0.75 * s(i)
        l = nl; b = nb; s(i) = ns
        (nl, nb, ns, Some(fit))
      }
    assert(got == want) // bit-exact
    // seasonal components eventually track the planted +3/slot pattern
    val tail = got.takeRight(m).map(_._3)
    assert(tail.max - tail.min > 5.0, s"seasonality not learned: $tail")
  }

  test("cusum: hand-computed one-sided statistics and alarm") {
    // target 10, slack 1, h 3; xs: 10, 12, 13, 9
    // sp: max(0,0+(10-10-1))=0; 0+(12-11)=1; 1+(13-11)=3; max(0,3+(9-11))=1
    // sn: 0+(10-10-1)→0; (10-12-1)→0; →0; 10-9-1=0→0
    val df = Seq(1L -> 10.0, 2L -> 12.0, 3L -> 13.0, 4L -> 9.0)
      .map { case (t, x) => ("k", t, x, 10.0, 1.0, 3.0) }
      .toDF("k", "t", "x", "target", "slack", "h")
    val out = Forecast.cusum(df, Seq("k"), "t", "x", "target", "slack", "h")
      .orderBy("t").select("cusum_pos", "cusum_neg", "alarm")
      .as[(Double, Double, Boolean)].collect().toSeq
    assert(out == Seq((0.0, 0.0, false), (1.0, 0.0, false),
      (3.0, 0.0, false), (1.0, 0.0, false)))
  }

  test("cusum: detects a mean shift a per-point gate misses") {
    // 50 days at target, then 50 days at target + half-slack-above-slack
    // drift: each day only +2 over target (under any 3σ-style gate), but
    // the cumulative sum grows to alarm
    val xs = (Seq.fill(50)(100.0) ++ Seq.fill(50)(102.0)).zipWithIndex
    val df = xs.map { case (x, i) =>
      ("k", i.toLong, x, 100.0, 1.0, 10.0) }
      .toDF("k", "t", "x", "target", "slack", "h")
    val alarms = Forecast.cusum(df, Seq("k"), "t", "x",
        "target", "slack", "h")
      .filter(col("alarm")).select("t").as[Long].collect().sorted
    assert(alarms.nonEmpty)
    assert(alarms.head >= 50) // nothing alarms during the in-control half
    // once drifted past h/(delta-slack) days, every later day alarms
    assert(alarms.toSeq == (alarms.head to 99L))
  }

  test("cusum: state resets per key") {
    val df = Seq(("a", 1L, 200.0), ("a", 2L, 200.0), ("b", 1L, 100.0))
      .map { case (k, t, x) => (k, t, x, 100.0, 1.0, 50.0) }
      .toDF("k", "t", "x", "target", "slack", "h")
    val out = Forecast.cusum(df, Seq("k"), "t", "x", "target", "slack", "h")
      .orderBy("k", "t").select("k", "cusum_pos")
      .as[(String, Double)].collect().toSeq
    assert(out == Seq(("a", 99.0), ("a", 198.0), ("b", 0.0)))
  }

  test("result is partitioning-invariant") {
    val df = (0 until 100).map(i => (s"k${i % 3}", i.toLong, i * 1.5))
      .toDF("k", "t", "x")
    val a = Forecast.holtLinear(df.repartition(1), Seq("k"), "t", "x",
      0.5, 0.25).collect().map(_.toSeq).toSet
    val b = Forecast.holtLinear(df.repartition(7, col("x")), Seq("k"),
      "t", "x", 0.5, 0.25).collect().map(_.toSeq).toSet
    assert(a == b)
  }

  /** Plain-Scala PAV on cent-quantized values — the stack algorithm
    * re-implemented independently for the parity tests.
    */
  private def pavRef(ys: Seq[Long]): Seq[Double] = {
    var pools = List.empty[(Long, Long)]
    ys.foreach { y =>
      var s = y; var n = 1L
      while (pools.nonEmpty && pools.head._1 * n > s * pools.head._2) {
        s += pools.head._1; n += pools.head._2; pools = pools.tail
      }
      pools = (s, n) :: pools
    }
    pools.reverse.flatMap { case (s, n) =>
      Seq.fill(n.toInt)(s.toDouble / (n * 100L).toDouble) }
  }

  test("autocorrelation: alternating series -> r1 ~ -1, r2 ~ +1; " +
    "constant-free sanity on noise") {
    val alt = (0L until 40L).map(t => ("k", t,
      if (t % 2 == 0) 10.0 else 20.0)).toDF("k", "t", "v")
    val got = Forecast.autocorrelation(alt, Seq("k"), "t", "v", 3)
      .orderBy("lag").collect()
      .map(r => r.getInt(1) -> r.getDouble(3)).toMap
    assert(got(1) < -0.9 && got(2) > 0.9 && got(3) < -0.9, got.toString)
    val rnd = new scala.util.Random(37)
    val noise = (0L until 300L).map(t => ("k", t,
      50.0 + rnd.nextInt(100) / 10.0)).toDF("k", "t", "v")
    val g2 = Forecast.autocorrelation(noise, Seq("k"), "t", "v", 2)
      .collect().map(_.getDouble(3))
    g2.foreach(r => assert(math.abs(r) < 0.2, s"noise acf $r"))
  }

  test("seasonalDecompose: planted weekly pattern recovered, edges null") {
    // value = 100 + phase bump {0:+12, 3:-9, else 0}; zero trend slope
    val bump = Map(0L -> 12.0, 3L -> -9.0).withDefaultValue(0.0)
    val df = (0L until 35L).map(d => ("k", d, 100.0 + bump(d % 7)))
      .toDF("k", "t", "v")
    val out = Forecast.seasonalDecompose(df, Seq("k"), "t", "v", 7)
      .orderBy("t").collect()
    // first and last 3 rows: incomplete centered window
    (0 until 3).foreach(i => assert(out(i).isNullAt(3)))
    (32 until 35).foreach(i => assert(out(i).isNullAt(3)))
    out.slice(3, 32).foreach { r =>
      val t = r.getLong(1); val phase = t % 7
      // trend = mean over any full week = 100 + (12-9)/7
      assert(math.abs(r.getDouble(3) - (100.0 + 3.0 / 7.0)) < 1e-9,
        s"trend at $t")
      // seasonal = bump re-centered by the mean bump 3/7
      assert(math.abs(r.getDouble(4) - (bump(phase) - 3.0 / 7.0)) < 1e-9,
        s"seasonal at $t")
      // components reassemble the observation
      assert(math.abs(r.getDouble(3) + r.getDouble(4) + r.getDouble(5)
        - r.getDouble(2)) < 1e-9)
    }
  }

  test("isotonicWeighted: hand case; weight-1 degenerates to isotonic") {
    // (0.8, w=1) then (0.2, w=3): pooled weighted mean = 1.4/4 = 0.35
    val df = Seq(("k", 0L, 0.8, 1L), ("k", 1L, 0.2, 3L))
      .toDF("k", "t", "y", "w")
    val got = Forecast.isotonicWeighted(df, Seq("k"), "t", "y", "w")
      .orderBy("t").as[(String, Long, Double, Long, Double)]
      .collect().toSeq
    assert(got.map(_._5) == Seq(0.35, 0.35), got.toString)
    assert(got.map(_._4) == Seq(1L, 3L)) // weights ride through
    // weight 1 everywhere == the unweighted operator
    val series = Seq(("k", 0L, 3.0, 1L), ("k", 1L, 1.0, 1L),
      ("k", 2L, 2.0, 1L), ("k", 3L, 4.0, 1L)).toDF("k", "t", "y", "w")
    val w1 = Forecast.isotonicWeighted(series, Seq("k"), "t", "y", "w")
      .drop("weight").orderBy("t").collect().map(_.toSeq).toSeq
    val plain = Forecast.isotonic(series.drop("w"), Seq("k"), "t", "y")
      .orderBy("t").collect().map(_.toSeq).toSeq
    assert(w1 == plain)
  }

  test("isotonicWeighted: weights equal exploded duplicates") {
    // weighted rows == the same observations repeated w times at
    // distinct sub-ticks (PAV pools adjacent equal values, so the
    // fitted PLATEAU values match the weighted fit)
    val weighted = Seq(("k", 0L, 5.0, 2L), ("k", 10L, 1.0, 3L),
      ("k", 20L, 9.0, 1L)).toDF("k", "t", "y", "w")
    val exploded = Seq(("k", 0L, 5.0), ("k", 1L, 5.0), ("k", 10L, 1.0),
      ("k", 11L, 1.0), ("k", 12L, 1.0), ("k", 20L, 9.0))
      .toDF("k", "t", "y")
    val a = Forecast.isotonicWeighted(weighted, Seq("k"), "t", "y", "w")
      .orderBy("t").collect().map(r => (r.getLong(1), r.getDouble(4)))
    val b = Forecast.isotonic(exploded, Seq("k"), "t", "y")
      .orderBy("t").collect().map(r => (r.getLong(1), r.getDouble(3)))
    // weighted row i (weight w_i) expands to w_i exploded fits, equal
    val weights = Seq(2, 3, 1)
    val expanded = a.toSeq.lazyZip(weights).flatMap {
      case ((_, f), w) => Seq.fill(w)(f) }
    assert(b.map(_._2).toSeq == expanded, s"a=${a.toSeq} b=${b.toSeq}")
  }

  test("isotonic: hand-computed pooling on a violating series") {
    // y = 3, 1, 2, 4: PAV pools (3,1,2)->2 then stays below 4
    val df = Seq(("k", 0L, 3.0), ("k", 1L, 1.0), ("k", 2L, 2.0),
      ("k", 3L, 4.0)).toDF("k", "t", "y")
    val got = Forecast.isotonic(df, Seq("k"), "t", "y")
      .orderBy("t").as[(String, Long, Double, Double)].collect().toSeq
    assert(got.map(_._4) == Seq(2.0, 2.0, 2.0, 4.0), got.toString)
    assert(got.map(_._3) == Seq(3.0, 1.0, 2.0, 4.0)) // values round-trip
  }

  test("isotonic: already-monotone input is returned unchanged") {
    val df = (0L to 9L).map(i => ("k", i, i * 1.25)).toDF("k", "t", "y")
    val got = Forecast.isotonic(df, Seq("k"), "t", "y")
      .orderBy("t").as[(String, Long, Double, Double)].collect()
    got.foreach(r => assert(r._4 == r._3))
  }

  test("isotonic == independent PAV reference; fit is monotone; " +
    "mean is preserved") {
    val rnd = new scala.util.Random(5)
    val df = (0 until 300).map { i =>
      (s"k${i % 3}", (i / 3).toLong,
        (i / 3) * 0.1 + rnd.nextInt(1000) / 100.0)
    }.toDF("k", "t", "y")
    val got = Forecast.isotonic(df.repartition(7), Seq("k"), "t", "y")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    val byKey = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .groupBy(_._1)
    byKey.foreach { case (k, rows) =>
      val ys = rows.sortBy(_._2).map(r =>
        BigDecimal(r._3 * 100).setScale(0,
          BigDecimal.RoundingMode.HALF_UP).toLong).toSeq
      val expect = pavRef(ys)
      assert(got(k) == expect, s"key $k")
      // monotone non-decreasing
      assert(got(k).sliding(2).forall(w => w.length < 2 || w(0) <= w(1)))
      // pooling preserves the (quantized) total
      assert(math.abs(got(k).sum - ys.map(_ / 100.0).sum) < 1e-6)
    }
  }
}
