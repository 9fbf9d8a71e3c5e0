package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The fused double dot product must be value-identical to the composed
  * zip_with/aggregate fold on the same element order (both accumulate
  * left-to-right), honor the min-length and null contracts of
  * quantized_dot, and actually run inside whole-stage codegen.
  */
class DoubleDotSpec extends SparkTestBase {
  import spark.implicits._

  private def composed(a: org.apache.spark.sql.Column,
                       b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  test("matches the composed fold bit-for-bit on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(50)((
      Array.fill(64)(rnd.nextDouble() * 2 - 1),
      Array.fill(64)(rnd.nextDouble() * 2 - 1)))
    val df = rows.toDF("a", "b").select(
      native_fns.double_dot(col("a"), col("b")).as("fused"),
      composed(col("a"), col("b")).as("ref"))
    df.collect().foreach { r =>
      // bit-for-bit: same element order, same IEEE adds
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("min-length semantics and null propagation") {
    val df = Seq(
      (Some(Array(1.0, 2.0, 3.0)), Some(Array(10.0, 20.0))),
      (None: Option[Array[Double]], Some(Array(1.0))),
      (Some(Array(1.0)), None: Option[Array[Double]]),
      (Some(Array.empty[Double]), Some(Array(1.0))))
      .toDF("a", "b")
      .select(native_fns.double_dot(col("a"), col("b")).as("d"))
      .collect()
    assert(df(0).getDouble(0) == 50.0) // 1*10 + 2*20, third elem dropped
    assert(df(1).isNullAt(0) && df(2).isNullAt(0))
    assert(df(3).getDouble(0) == 0.0)
  }

  test("runs inside whole-stage codegen") {
    // parquet-backed input: a local relation would be constant-folded
    // into a LocalTableScan and never exercise codegen
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(native_fns.double_dot(
        col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")).as("selfdot"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[double_dot.*"),
      plan)
    assert(df.filter(col("selfdot") <= 0.0).count() == 0)
  }

  test("SQL registration via extensions descriptor") {
    graft.plans.GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT double_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .as[Double].head()
    assert(got == 11.0)
  }
}
