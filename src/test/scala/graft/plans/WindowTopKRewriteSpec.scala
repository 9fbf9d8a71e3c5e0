package graft.plans

import graft.SparkTestBase
import graft.io.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.WindowTopKRewrite

/** The optimizer-rule tier: the window row_number top-k idiom must be
  * rewritten into the bounded-heap operator — same rows, no partition
  * sort — and must NOT be rewritten when the rewrite would change
  * semantics (rank functions, row number still referenced, OR-ed
  * predicates).
  */
class WindowTopKRewriteSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val supplier = Tables.load(spark, sf, "supplier")

  private val w = Window.partitionBy(col("s_nationkey"))
    .orderBy(col("s_acctbal").desc, col("s_suppkey"))

  private def topkIdiom(k: Int): DataFrame =
    supplier.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k).drop("rn")

  private def withRule[A](body: => A): A =
    try { WindowTopKRewrite.install(spark); body }
    finally WindowTopKRewrite.uninstall(spark)

  test("idiom is rewritten: TopKPerKey plan, no WindowExec, rows unchanged") {
    // expected set computed WITHOUT the rule installed
    val expected = topkIdiom(3).select("s_suppkey").as[Long].collect().toSet
    withRule {
      val df = topkIdiom(3)
      val optimized = df.queryExecution.optimizedPlan.toString
      val physical = df.queryExecution.executedPlan.toString
      assert(optimized.contains("TopKPerKeyPlan"), optimized)
      // physical nodeName strips the Exec suffix; assert the heap operator
      // replaced BOTH the window and every partition sort (incl. the ones
      // a surviving WindowGroupLimit would require)
      assert(physical.contains("TopKPerKey "), physical)
      assert(!physical.contains("Window ["), physical)
      assert(!physical.contains("Sort ["), physical)
      assert(df.select("s_suppkey").as[Long].collect().toSet == expected)
    }
  }

  test("extra AND-ed predicates survive above the heap operator") {
    val expected = supplier.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2 && col("s_acctbal") > 0).drop("rn")
      .select("s_suppkey").as[Long].collect().toSet
    withRule {
      val df = supplier.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2 && col("s_acctbal") > 0).drop("rn")
      assert(df.queryExecution.optimizedPlan.toString.contains("TopKPerKeyPlan"))
      assert(df.select("s_suppkey").as[Long].collect().toSet == expected)
    }
  }

  test("rn = 1 rewrites as k = 1") {
    val expected = topkIdiom(1).select("s_suppkey").as[Long].collect().toSet
    withRule {
      val df = supplier.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
      assert(df.queryExecution.optimizedPlan.toString.contains("TopKPerKeyPlan"))
      assert(df.select("s_suppkey").as[Long].collect().toSet == expected)
    }
  }

  test("no rewrite when the row number is still in the output") {
    withRule {
      val df = supplier.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3) // rn kept
      assert(!df.queryExecution.optimizedPlan.toString.contains("TopKPerKeyPlan"))
    }
  }

  test("no rewrite for rank() — ties may exceed k rows per key") {
    withRule {
      val df = supplier.withColumn("rn", rank().over(w))
        .filter(col("rn") <= 3).drop("rn")
      assert(!df.queryExecution.optimizedPlan.toString.contains("TopKPerKeyPlan"))
    }
  }

  test("no rewrite when the bound is OR-ed with another predicate") {
    withRule {
      val df = supplier.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3 || col("s_acctbal") > 0).drop("rn")
      assert(!df.queryExecution.optimizedPlan.toString.contains("TopKPerKeyPlan"))
    }
  }
}
