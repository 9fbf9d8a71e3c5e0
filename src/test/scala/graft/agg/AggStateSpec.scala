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
}
