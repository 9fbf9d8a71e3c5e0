package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Runtime bloom-filter join pruning: Catalyst's InjectRuntimeFilter
  * builds a bloom filter over the selective (small) side's join keys and
  * applies `might_contain` on the big side BEFORE its shuffle — at
  * 100 TB this prunes the probe side's shuffle to roughly the rows that
  * can actually match, the declarative equivalent of a manual semi-join
  * pre-filter. Defaults only fire past 10 GB application-side scans, so
  * the thresholds are lowered here to pin (a) that our join shapes are
  * eligible for injection and (b) that pruning never changes results.
  */
class RuntimeFilterSpec extends SparkTestBase {

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("selective dim filter injects might_contain on the fact side") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val orders = Tables.load(spark, sf, "orders")
      val cust = Tables.load(spark, sf, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val joined = orders.join(cust,
        col("o_custkey") === col("c_custkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a runtime bloom filter in:\n$optimized")
      // pruning is transparent: same result as the unfiltered plan
      val n = joined.count()
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
      assert(n == orders.join(cust,
        col("o_custkey") === col("c_custkey")).count())
    }
  }
}
