package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.SparkTestBase

class RanksSpec extends SparkTestBase {
  import spark.implicits._

  private def randomFrame(n: Int, distinctKeys: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    // heavy ties: keys drawn from a small domain (the frequency=1 RFM
    // shape), tie unique per row
    (0 until n).map(i => (rnd.nextInt(distinctKeys).toLong, i.toLong))
      .toDF("k", "t")
  }

  test("rowNumberDesc == row_number window on ties-heavy random data") {
    for ((n, keys, buckets) <- Seq((500, 7, 8), (1000, 300, 16),
        (37, 3, 256))) {
      val df = randomFrame(n, keys, seed = n)
      val got = Ranks.rowNumberDesc(df, "k", "t", buckets = buckets)
        .select(col("k"), col("t"), col("__rank"), col("__rank_n"))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3))).toMap
      val w = Window.orderBy(col("k").desc, col("t"))
      val want = df.withColumn("__r", row_number().over(w))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          r.getInt(2).toLong).toMap
      assert(got.size == n)
      got.foreach { case (key, (rank, total)) =>
        assert(total == n.toLong)
        assert(rank == want(key), s"at $key: $rank vs ${want(key)}")
      }
    }
  }

  test("ntileOfRank == SQL NTILE for every (n, k) shape incl. n < k") {
    for (n <- Seq(1, 4, 5, 6, 11, 100, 103); k <- Seq(2, 5, 10)) {
      val df = (1 to n).map(_.toLong).toDF("r")
        .withColumn("got", Ranks.ntileOfRank(col("r"), lit(n.toLong), k))
      val w = Window.orderBy(col("r"))
      val want = df.withColumn("want", ntile(k).over(w))
        .select("r", "got", "want").collect()
      want.foreach { row =>
        assert(row.getInt(1) == row.getInt(2),
          s"n=$n k=$k rank=${row.getLong(0)}: " +
            s"${row.getInt(1)} vs ${row.getInt(2)}")
      }
    }
  }

  test("ntileDesc == ntile window; quintiles of a ties-heavy column") {
    val df = randomFrame(800, 5, seed = 42)
    val got = Ranks.ntileDesc(df, "k", "t", k = 5, out = "q", buckets = 8)
      .select(col("k"), col("t"), col("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    val w = Window.orderBy(col("k").desc, col("t"))
    val want = df.withColumn("q", ntile(5).over(w))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2))
      .toMap
    assert(got == want)
  }

  test("cumSumDesc == inclusive window cumsum on ties-heavy data, " +
    "exact DECIMAL") {
    for ((n, keys, buckets) <- Seq((400, 6, 8), (37, 3, 256))) {
      val rnd = new scala.util.Random(n)
      val df = (0 until n).map(i => (rnd.nextInt(keys).toLong,
          i.toLong, BigDecimal(rnd.nextInt(10000)) / 100))
        .toDF("k", "t", "v")
        .withColumn("v", col("v").cast("decimal(18,2)"))
      val got = Ranks.cumSumDesc(df, "k", "t", "v", out = "cum",
          buckets = buckets)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          r.getDecimal(3)).toMap
      val w = Window.orderBy(col("k").desc, col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val want = df.withColumn("cum", sum(col("v")).over(w))
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          r.getDecimal(3)).toMap
      got.foreach { case (key, cum) =>
        assert(cum.compareTo(want(key)) == 0,
          s"at $key: $cum vs ${want(key)}")
      }
      assert(got.size == n)
    }
  }

  test("ntileDesc output carries no internal helper columns") {
    val df = randomFrame(50, 4, seed = 7)
    val out = Ranks.ntileDesc(df, "k", "t", k = 5, out = "q")
    assert(out.columns.toSeq == Seq("k", "t", "q"))
  }
}
