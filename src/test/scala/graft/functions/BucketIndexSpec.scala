package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The codegen'd binary-search bucket assignment must be value-identical
  * to the interpreted HOF formulation it replaced
  * (`aggregate(bounds, 0, (acc, x) => acc + when(x <= v, 1).otherwise(0))`)
  * — on duplicates, boundary hits, out-of-range values, NaN, and nulls —
  * and must actually run inside whole-stage codegen (the entire point).
  */
class BucketIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val hof = (bounds: org.apache.spark.sql.Column,
                     v: org.apache.spark.sql.Column) =>
    aggregate(bounds, lit(0), (acc, x) => acc + when(x <= v, 1).otherwise(0))

  test("binary search == HOF count on boundary/duplicate/range cases") {
    // ascending bounds with a duplicated boundary — the hot-key shape
    val bounds = Seq(1.0, 3.0, 3.0, 3.0, 7.0, 9.0)
    val values = Seq(0.0, 1.0, 2.0, 3.0, 5.0, 7.0, 8.0, 9.0, 10.0,
      -1e308, 1e308, Double.NaN)
    val df = values.toDF("v")
      .select(col("v"),
        native_fns.bucket_index(
          lit(bounds.toArray), col("v")).as("fast"),
        hof(lit(bounds.toArray), col("v")).as("slow"))
    val rows = df.collect()
    rows.foreach(r => assert(r.getInt(1) == r.getInt(2),
      s"v=${r.getDouble(0)}: fast=${r.getInt(1)} slow=${r.getInt(2)}"))
    // Spark SQL ordering (not IEEE): NaN is the LARGEST double, so a
    // NaN value lands in the last bucket under both formulations
    assert(rows.last.getInt(1) == bounds.size)
  }

  test("equivalence on generated equi-depth bounds over a real column") {
    // the production shape: percentile_approx bounds broadcast back
    val scores = graft.io.Tables.load(spark, sf, "lineitem")
      .select(col("l_extendedprice").cast("double").as("v"))
    val fracs = array((1 until 64).map(i => lit(i / 64.0)): _*)
    val bounds = scores.agg(
      percentile_approx(col("v"), fracs, lit(10000)).as("b"))
    val both = scores.crossJoin(broadcast(bounds))
      .select(native_fns.bucket_index(col("b"), col("v")).as("fast"),
        hof(col("b"), col("v")).as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).isEmpty)
    // buckets are used: more than one distinct id on a real column
    assert(both.select("fast").distinct().count() > 16)
  }

  test("null array or null value yields null; empty array yields 0") {
    val r = Seq((Some(Array(1.0, 2.0)), Some(1.5)),
        (None, Some(1.5)),
        (Some(Array(1.0, 2.0)), None),
        (Some(Array.empty[Double]), Some(1.5)))
      .toDF("b", "v")
      .select(native_fns.bucket_index(col("b"), col("v")).as("i"))
      .collect()
    assert(r(0).getInt(0) == 1)
    assert(r(1).isNullAt(0) && r(2).isNullAt(0))
    assert(r(3).getInt(0) == 0)
  }

  test("runs inside whole-stage codegen") {
    // parquet-backed input: a local relation would be constant-folded
    // into a LocalTableScan and never exercise codegen
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(native_fns.bucket_index(
        lit(Array(2.0, 4.0)),
        col("l_quantity").cast("double")).as("i"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[bucket_index.*"),
      plan)
    assert(df.distinct().as[Int].collect().toSet == Set(0, 1, 2))
  }

  test("SQL registration via extensions descriptor") {
    graft.plans.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT bucket_index(array(1.0D, 3.0D, 7.0D), 4.0D) AS i")
      .as[Int].head()
    assert(got == 2)
  }
}
