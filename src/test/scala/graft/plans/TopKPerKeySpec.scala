package graft.plans

import graft.SparkTestBase
import graft.io.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TopKPerKey

class TopKPerKeySpec extends SparkTestBase {

  import spark.implicits._

  private lazy val supplier = Tables.load(spark, sf, "supplier")

  private def windowed(k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("s_nationkey"))
      .orderBy(col("s_acctbal").desc, col("s_suppkey"))
    supplier.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k).drop("rank")
  }

  test("heap operator == window row_number top-k (total ordering)") {
    val heap = TopKPerKey.topKPerKey(supplier, Seq("s_nationkey"),
      Seq(col("s_acctbal").desc, col("s_suppkey").asc), k = 3)
    val a = heap.select("s_suppkey").as[Long].collect().toSet
    val b = windowed(3).select("s_suppkey").as[Long].collect().toSet
    assert(a == b, s"heap ${a.size} vs window ${b.size}: diff ${a.diff(b) ++ b.diff(a)}")
  }

  test("physical plan: TopKPerKeyExec, one exchange, no Sort/Window") {
    val heap = TopKPerKey.topKPerKey(supplier, Seq("s_nationkey"),
      Seq(col("s_acctbal").desc, col("s_suppkey").asc), k = 3)
    val plan = heap.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan)
    assert(!plan.contains("WindowExec") && !plan.contains("SortExec"),
      s"heap top-k must not sort full partitions:\n$plan")
  }

  test("k larger than every group returns all rows") {
    val n = supplier.count()
    val all = TopKPerKey.topKPerKey(supplier, Seq("s_nationkey"),
      Seq(col("s_acctbal").desc, col("s_suppkey").asc), k = n.toInt)
    assert(all.count() == n)
  }

  test("results are stable under repartitioning of the input") {
    val a = TopKPerKey.topKPerKey(supplier.repartition(13), Seq("s_nationkey"),
      Seq(col("s_acctbal").desc, col("s_suppkey").asc), k = 2)
      .select("s_suppkey").as[Long].collect().toSet
    val b = TopKPerKey.topKPerKey(supplier, Seq("s_nationkey"),
      Seq(col("s_acctbal").desc, col("s_suppkey").asc), k = 2)
      .select("s_suppkey").as[Long].collect().toSet
    assert(a == b)
  }
}
