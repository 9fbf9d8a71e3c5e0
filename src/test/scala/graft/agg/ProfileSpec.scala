package graft.agg

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val df = Seq(
    (1.0, "a"), (2.0, "b"), (3.0, "a"), (4.0, null.asInstanceOf[String])
  ).toDF("x", "s")

  test("profile: counts, nulls, mean and sample stddev per column") {
    val rows = Profile.profile(df, Seq("x", "s")).collect()
      .map(r => r.getString(0) -> r).toMap
    val x = rows("x")
    assert(x.getLong(1) == 4 && x.getLong(2) == 0)          // n, nulls
    assert(x.getDouble(6) == 2.5)                           // mean
    // sample stddev of 1..4 = sqrt(5/3), reported at 6 dp (display
    // stat; ends the cross-engine decimal->double low-bit lottery)
    assert(math.abs(x.getDouble(7) - math.sqrt(5.0 / 3)) < 5e-7)
    val s = rows("s")
    assert(s.getLong(2) == 1 && s.getLong(3) == 2)          // nulls, distinct
    assert(s.isNullAt(6) && s.isNullAt(7))                  // no numeric stats
  }

  test("histogram: equal-width bins cover [min,max], max clamps into last bin") {
    val d = (0 until 100).map(_.toDouble).toDF("v")
    val h = Profile.histogram(d, "v", bins = 10).collect()
    assert(h.length == 10)
    assert(h.map(_.getLong(3)).forall(_ == 10), "uniform data, 10 per bin")
    assert(h.head.getDouble(1) == 0.0 && h.last.getDouble(2) == 99.0)
    // value == max must land in the last bin, not a phantom 11th
    assert(h.map(_.getInt(0)).toSeq == (0 until 10))
  }

  test("histogram: constant column collapses to one bin holding every row") {
    val d = Seq.fill(7)(42.0).toDF("v")
    val h = Profile.histogram(d, "v", bins = 5).collect()
    assert(h.length == 1 && h.head.getInt(0) == 0 && h.head.getLong(3) == 7)
  }

  test("profile fail-fast: |x| beyond the DECIMAL(18,6) sumsq domain " +
    "raises instead of a silently wrong stddev") {
    // an epoch-millis-sized double (~1.7e12) overflows the pre-square
    // DECIMAL(18,6) cast; under non-ANSI that nulls the term and sum()
    // SKIPS it — the guard must raise, never return a wrong stddev
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val d = Seq(1.7e12, 2.0, 3.0).toDF("ts")
      val e = intercept[Exception] {
        Profile.profile(d, Seq("ts")).collect()
      }
      def chain(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ chain(t.getCause)
      assert(chain(e).exists(_.contains("DECIMAL(18,6)")),
        s"expected the domain-guard message, got: ${chain(e)}")
      // in-domain data through the same guarded path still profiles
      val ok = Profile.profile(Seq(1.0, 2.0).toDF("ts"), Seq("ts"))
        .collect().head
      assert(math.abs(ok.getDouble(7) - math.sqrt(0.5)) < 5e-7)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }
}
