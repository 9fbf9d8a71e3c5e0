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
}
