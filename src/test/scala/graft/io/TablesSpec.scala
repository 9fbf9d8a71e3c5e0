package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.SparkTestBase

class TablesSpec extends SparkTestBase {
  import spark.implicits._

  test("savePartitioned: partition filters prune before IO") {
    val out = java.nio.file.Files.createTempDirectory("parts").toString
    val tidy = Seq(
      (2022, "NSW", 1.0), (2022, "VIC", 2.0),
      (2023, "NSW", 3.0), (2023, "VIC", 4.0)
    ).toDF("year", "state", "separations")
    Tables.savePartitioned(tidy, out, "clean", Seq("year", "state"))

    val scan = Tables.load(spark, out, "clean")
      .filter(col("year") === 2023 && col("state") === "NSW")
    // the physical scan must carry partition filters and read 1 partition
    val exec = scan.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(exec.partitionFilters.nonEmpty, "partition filters missing")
    assert(scan.collect().map(_.getDouble(0)).toSeq == Seq(3.0))
    // directory layout is hive-style
    assert(new java.io.File(s"$out/clean.parquet/year=2023/state=NSW").exists)
  }

  test("withFallback: primary empty -> fallback plan, else primary") {
    val primary = Seq(1).toDF("x").filter(col("x") > 99)
    val got = Tables.withFallback(primary)(Seq(7).toDF("x"))
    assert(got.as[Int].collect().toSeq == Seq(7))
    val got2 = Tables.withFallback(Seq(5).toDF("x"))(Seq(7).toDF("x"))
    assert(got2.as[Int].collect().toSeq == Seq(5))
  }
}
