package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.io.Tables
import graft.functions.native_fns

class BloomJoinSpec extends SparkTestBase {

  private def supplierDim =
    Tables.load(spark, sf, "supplier").filter(col("s_nationkey") < 5)

  test("bloomSemiJoin == plain left-semi join (exact after verify)") {
    val fact = Tables.load(spark, sf, "lineitem")
    val exact = fact
      .join(supplierDim.select(col("s_suppkey").as("l_suppkey")).distinct(),
        Seq("l_suppkey"), "left_semi")
      .agg(count(lit(1)).as("n")).head().getLong(0)
    val got = BloomJoin.bloomSemiJoin(fact, supplierDim,
      "l_suppkey", "s_suppkey", estimatedItems = 1024)
      .agg(count(lit(1)).as("n")).head().getLong(0)
    assert(got == exact && got > 0)
  }

  test("bloomPrune never drops a true match (no false negatives)") {
    val fact = Tables.load(spark, sf, "lineitem")
    val trueKeys = fact
      .join(supplierDim.select(col("s_suppkey").as("l_suppkey")).distinct(),
        Seq("l_suppkey"), "left_semi")
    val pruned = BloomJoin.bloomPrune(fact, supplierDim,
      "l_suppkey", "s_suppkey", estimatedItems = 1024)
    // every true match survives the prune: anti-join must be empty
    val lost = trueKeys.join(pruned.select("l_suppkey").distinct(),
      Seq("l_suppkey"), "left_anti").count()
    assert(lost == 0L)
    // and the prune is a subset of the fact table
    assert(pruned.count() <= fact.count())
  }

  test("prune rate: a selective dim eliminates most fact rows pre-shuffle") {
    val fact = Tables.load(spark, sf, "lineitem")
    val oneSupplier = Tables.load(spark, sf, "supplier")
      .filter(col("s_suppkey") === 1)
    val exact = fact.filter(col("l_suppkey") === 1).count()
    val pruned = BloomJoin.bloomPrune(fact, oneSupplier,
      "l_suppkey", "s_suppkey", estimatedItems = 64).count()
    val total = fact.count()
    // superset of the 1-of-10-suppliers matches, with ≪1% false-positive
    // spill on top (64 items × 16 bits/item for 1 real key)
    assert(pruned >= exact)
    assert(pruned <= exact + total / 100)
  }

  test("empty dimension → empty result, no NPE on null filter") {
    val fact = Tables.load(spark, sf, "lineitem")
    val emptyDim = Tables.load(spark, sf, "supplier")
      .filter(col("s_suppkey") < 0)
    assert(BloomJoin.bloomSemiJoin(fact, emptyDim,
      "l_suppkey", "s_suppkey").count() == 0L)
    assert(BloomJoin.bloomPrune(fact, emptyDim,
      "l_suppkey", "s_suppkey").count() == 0L)
  }

  test("might_contain probe stays inside WholeStageCodegen") {
    val dim = supplierDim
    val bloom = dim.select(native_fns.bloom_filter_agg(
      col("s_suppkey").cast("long"), 1024, 16384).as("bf"))
      .head().getAs[Array[Byte]](0)
    val plan = Tables.load(spark, sf, "lineitem")
      .filter(native_fns.might_contain(lit(bloom),
        col("l_suppkey").cast("long")))
      .queryExecution.executedPlan.toString
    // "*(n)" is the WholeStageCodegen marker in the simple plan string —
    // the probe must sit inside the scan's codegen span, not a fallback
    // interpreted Filter
    assert(plan.contains("*(1) Filter might_contain"))
  }
}
