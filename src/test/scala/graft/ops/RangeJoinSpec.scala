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

  test("binnedRangeJoin: range ending on a bin edge excludes that bin") {
    val points = Seq((1L, 64L)).toDF("pid", "pt")
    val ranges = Seq((0L, 64L)).toDF("lo", "hi") // hi exclusive
    val got = RangeJoin.binnedRangeJoin(points, ranges, "pt", "lo", "hi", 64)
    assert(got.isEmpty)
  }
}
