package graft.agg

import graft.SparkTestBase
import graft.io.Tables
import org.apache.spark.sql.functions._

class AggStateSpec extends SparkTestBase {

  test("3-way split, partialize, merge == single-pass aggregate") {
    val o = Tables.load(spark, sf, "orders")
      .withColumn("year", year(col("o_orderdate")))
    val keys = Seq("year", "o_orderstatus")
    val slices = (0 until 3).map(i =>
      AggState.partialize(o.filter(col("o_custkey") % 3 === i),
        keys, "o_totalprice"))
    val merged = AggState.finalized(AggState.merge(keys, slices: _*))
    val direct = AggState.finalized(
      AggState.partialize(o, keys, "o_totalprice"))
    assert(merged.exceptAll(direct).isEmpty &&
      direct.exceptAll(merged).isEmpty,
      "merged state must equal the one-pass aggregate exactly")
  }

  test("HLL sketches merge exactly: union of slice sketches == one-pass sketch") {
    // the approximate counterpart of AggState: Datasketches HLL state
    // is mergeable, so distinct-count refreshes also skip history
    val o = Tables.load(spark, sf, "orders")
    val slices = (0 until 3).map(i =>
      o.filter(col("o_custkey") % 3 === i)
        .agg(hll_sketch_agg(col("o_custkey")).as("sk")))
    val merged = slices.reduce(_ unionByName _)
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .head().getLong(0)
    val onePass = o.agg(
      hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
      .head().getLong(0)
    assert(merged == onePass,
      s"sketch merge must be lossless vs one-pass: $merged != $onePass")
    // and the estimate is a real distinct-count approximation
    val exact = o.select("o_custkey").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged too far from exact $exact")
  }

  test("distinct-count state API: slice sketches merge losslessly and " +
    "roll up to coarser keys") {
    val o = Tables.load(spark, sf, "orders")
      .withColumn("year", year(col("o_orderdate")))
    val keys = Seq("year", "o_orderstatus")
    val slices = (0 until 3).map(i => AggState.partializeDistinct(
      o.filter(col("o_orderkey") % 3 === i), keys, "o_custkey"))
    // merged fine-grained state == one-pass state, bit-for-bit on the
    // estimates (sketch union is lossless)
    val merged = AggState.finalizedDistinct(
      AggState.mergeDistinct(keys, slices: _*))
    val onePass = AggState.finalizedDistinct(
      AggState.partializeDistinct(o, keys, "o_custkey"))
    assert(merged.collect().toSet == onePass.collect().toSet)
    // rollup: the stored fine state answers the coarser query too
    val rolled = AggState.finalizedDistinct(AggState.mergeDistinct(
        Seq("o_orderstatus"), AggState.mergeDistinct(keys, slices: _*)))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = o.groupBy(col("o_orderstatus"))
      .agg(countDistinct(col("o_custkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(rolled(k) - n).toDouble / n < 0.05,
        s"rollup estimate for $k: ${rolled(k)} vs exact $n")
    }
  }

  test("merge is associative: (a+b)+c == a+(b+c)") {
    val o = Tables.load(spark, sf, "orders")
    val keys = Seq("o_orderstatus")
    val Seq(a, b, c) = (0 until 3).map(i =>
      AggState.partialize(o.filter(col("o_custkey") % 3 === i),
        keys, "o_totalprice"))
    val left = AggState.merge(keys, AggState.merge(keys, a, b), c)
    val right = AggState.merge(keys, a, AggState.merge(keys, b, c))
    assert(left.exceptAll(right).isEmpty && right.exceptAll(left).isEmpty)
  }

  test("cross-moment state: merged slices == one-pass BIT-FOR-BIT; " +
    "rollup to coarser keys; corr reads agree") {
    val o = Tables.load(spark, sf, "orders")
    val keys = Seq("o_orderstatus")
    val cols = Seq("o_totalprice", "o_custkey")
    val slices = (0 until 3).map(i => AggState.partializeMoments(
      o.filter(col("o_orderkey") % 3 === i), keys, cols))
    val merged = AggState.mergeMoments(keys, slices: _*)
    val onePass = AggState.partializeMoments(o, keys, cols)
    // every cell is an exact DECIMAL sum -> bit equality, no tolerance
    assert(merged.exceptAll(onePass).isEmpty &&
      onePass.exceptAll(merged).isEmpty)
    val a = AggState.finalizedCorr(merged, cols).collect().toSet
    val b = AggState.finalizedCorr(onePass, cols).collect().toSet
    assert(a == b && a.nonEmpty)
    // the stored fine state answers the coarser (global) query too
    val global = AggState.finalizedCorr(
      AggState.mergeMoments(Seq.empty, merged), cols).collect()
    val direct = AggState.finalizedCorr(
      AggState.partializeMoments(o, Seq.empty, cols), cols).collect()
    assert(global.toSeq == direct.toSeq && global.length == 1)
  }

  test("cross-moment state: a grouping key named with a moment-like " +
    "prefix (s_*) stays a key — never summed as a moment cell") {
    import spark.implicits._
    // TPC-H supplier columns are exactly this shape (s_suppkey,
    // s_nationkey); a prefix-based cell classifier would silently sum
    // the key and drop it from the group-by
    val df = Seq(("s1", 1.0, 2.0), ("s1", 3.0, 5.0), ("s2", 2.0, 9.0),
      ("s2", 4.0, 1.0), ("s2", 6.0, 4.0)).toDF("s_region", "a", "b")
    val keys = Seq("s_region")
    val cols = Seq("a", "b")
    val slices = (0 until 2).map(i => AggState.partializeMoments(
      df.filter(crc32(col("s_region")) % 2 === i), keys, cols))
    val merged = AggState.mergeMoments(keys, slices: _*)
    assert(merged.columns.contains("s_region"),
      s"key lost: ${merged.columns.mkString(",")}")
    val onePass = AggState.partializeMoments(df, keys, cols)
    assert(merged.exceptAll(onePass).isEmpty &&
      onePass.exceptAll(merged).isEmpty)
    val corr = AggState.finalizedCorr(merged, cols)
    assert(corr.columns.take(1).toSeq == Seq("s_region"))
    assert(corr.count() == 2)
  }

  test("quantile state: all-null sketch group merges to null, and the " +
    "read side yields null (not an empty-sketch throw)") {
    import spark.implicits._
    val state = Seq("a", "a").toDF("g")
      .select(col("g"), lit(null).cast("binary").as("s_kll"))
      .unionByName(AggState.partializeQuantile(
        Seq(("b", 1.0), ("b", 2.0)).toDF("g", "v"), Seq("g"), "v"))
    val out = AggState.finalizedQuantile(
        AggState.mergeQuantile(Seq("g"), state), Seq(0.5))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(out("a").isNullAt(1) && out("a").isNullAt(2),
      s"expected null read for the all-null group: ${out("a")}")
    // inclusive-rank p50 of {1,2} = smallest value reaching rank 0.5
    assert(out("b").getDouble(1) == 1.0 && out("b").getLong(2) == 2L)
  }

  test("quantile state: small sketches are exact, merge == one-pass") {
    import spark.implicits._
    // n < k per group: no KLL compaction, the sketch stores every value
    // — estimates are EXACT and merge is bit-identical to one-pass
    val vals = (1 to 60).map(i => (if (i % 2 == 0) "a" else "b",
      i.toDouble))
    val df = vals.toDF("g", "v")
    val keys = Seq("g")
    val slices = (0 until 3).map(i =>
      AggState.partializeQuantile(df.filter(col("v") % 3 === i),
        keys, "v"))
    val merged = AggState.finalizedQuantile(
        AggState.mergeQuantile(keys, slices: _*), Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    val onePass = AggState.finalizedQuantile(
        AggState.partializeQuantile(df, keys, "v"), Seq(0.5, 0.9))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getLong(3))).toMap
    assert(merged == onePass, s"$merged vs $onePass")
    // exact INCLUSIVE-rank quantiles: smallest value whose <=-fraction
    // reaches the rank, over each group's 30 values
    def exact(g: String, r: Double): Double = {
      val sorted = vals.filter(_._1 == g).map(_._2).sorted
      sorted(math.ceil(r * sorted.size).toInt - 1)
    }
    for (g <- Seq("a", "b")) {
      val (p50, p90, n) = merged(g)
      assert(n == 30L)
      assert(p50 == exact(g, 0.5), s"$g p50: $p50 vs ${exact(g, 0.5)}")
      assert(p90 == exact(g, 0.9), s"$g p90: $p90 vs ${exact(g, 0.9)}")
    }
  }

  test("quantile state: compacted sketches keep the rank guarantee " +
    "through a merge") {
    import spark.implicits._
    // n >> k: compaction kicks in (randomized), so assert the BOUND —
    // the exact rank of each estimate within 5% (k=200 is ~1.65% at
    // 99% confidence) — and that the absorbed count stays exact
    val rnd = new scala.util.Random(11)
    val vals = (0 until 10000).map(_ => rnd.nextGaussian())
    val df = vals.map(("k", _)).toDF("g", "v")
    val slices = (0 until 4).map(i =>
      AggState.partializeQuantile(
        df.filter(abs(hash(col("v"))) % 4 === i), Seq("g"), "v"))
    val out = AggState.finalizedQuantile(
        AggState.mergeQuantile(Seq("g"), slices: _*),
        Seq(0.1, 0.5, 0.99))
      .collect().head
    assert(out.getLong(4) == vals.size.toLong, "count must stay exact")
    val sorted = vals.sorted
    for ((r, idx) <- Seq(0.1 -> 1, 0.5 -> 2, 0.99 -> 3)) {
      val est = out.getDouble(idx)
      val exactRank = sorted.count(_ <= est).toDouble / sorted.size
      assert(math.abs(exactRank - r) <= 0.05,
        s"rank($est) = $exactRank too far from $r")
    }
  }
}
