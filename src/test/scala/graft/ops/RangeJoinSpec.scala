package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("binnedRangeJoin == naive range join on generated data") {
    val points = (0L until 200L).map(i => (i, i * 7 % 500)).toDF("pid", "pt")
    val ranges = Seq((0L, 50L), (40L, 45L), (100L, 300L), (499L, 500L),
      (480L, 520L)).toDF("lo", "hi")
    val binned = RangeJoin
      .binnedRangeJoin(points, ranges, "pt", "lo", "hi", binWidth = 64)
      .select("pid", "lo", "hi")
    val naive = points.crossJoin(ranges)
      .filter(col("pt") >= col("lo") && col("pt") < col("hi"))
      .select("pid", "lo", "hi")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
    assert(binned.count() == naive.count()) // no duplicate pairs
  }

  test("binnedRangeJoin: reversed/empty ranges match nothing (no explosion)") {
    val points = Seq((1L, 5L)).toDF("pid", "pt")
    val ranges = Seq((1000000L, 0L), (7L, 7L)).toDF("lo", "hi")
    assert(RangeJoin.binnedRangeJoin(points, ranges, "pt", "lo", "hi", 1).isEmpty)
  }

  test("binnedRangeJoin: exact at epoch-nanos magnitudes (beyond 2^53)") {
    val base = 1704067200000000000L // 2024-01-01 in ns
    val points = Seq((1L, base + 599999999999L), (2L, base + 600000000000L))
      .toDF("pid", "pt")
    val ranges = Seq((base, base + 600000000000L)).toDF("lo", "hi")
    val got = RangeJoin
      .binnedRangeJoin(points, ranges, "pt", "lo", "hi", 600000000000L)
      .select("pid").as[Long].collect().toSeq
    assert(got == Seq(1L), "hi-exclusive boundary must hold at ns scale")
  }

  test("binnedRangeJoin: negative domains floor-bin correctly") {
    val points = Seq((1L, -5L), (2L, -64L), (3L, 0L)).toDF("pid", "pt")
    val ranges = Seq((-70L, 1L)).toDF("lo", "hi")
    val got = RangeJoin.binnedRangeJoin(points, ranges, "pt", "lo", "hi", 64)
      .select("pid").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  test("binnedRangeJoin: range ending on a bin edge excludes that bin") {
    val points = Seq((1L, 64L)).toDF("pid", "pt")
    val ranges = Seq((0L, 64L)).toDF("lo", "hi") // hi exclusive
    val got = RangeJoin.binnedRangeJoin(points, ranges, "pt", "lo", "hi", 64)
    assert(got.isEmpty)
  }
}
