package graft.agg

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.io.ZoneMap

class IncrementalRollupSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(lo: Int, hi: Int) =
    (lo until hi).map(i => (s"g${i % 3}", i * 1.0 + 0.25, i % 7))
      .toDF("grp", "amount", "qty")

  test("incremental refresh across manifest versions == full rebuild, " +
      "bit-exactly") {
    val table = java.nio.file.Files.createTempDirectory("ir_t").toString
    val mPath = java.nio.file.Files.createTempDirectory("ir_m").toString +
      "/manifest"
    val dims = Seq("grp"); val ms = Seq("amount", "qty")

    rows(0, 500).coalesce(2).write.mode("overwrite").parquet(table)
    val v0 = ZoneMap.commitManifest(
      ZoneMap.buildManifest(spark, table, Seq("qty")), mPath)
    val r0 = IncrementalRollup.build(spark.read.parquet(table), dims, ms)
      .localCheckpoint(true)

    // two successive appends, each committed as a manifest version
    rows(500, 800).coalesce(2).write.mode("append").parquet(table)
    val v1 = ZoneMap.commitManifest(ZoneMap.updateManifest(spark, table,
      ZoneMap.readManifestAt(spark, mPath, v0), Seq("qty")), mPath)
    rows(800, 1000).coalesce(1).write.mode("append").parquet(table)
    val v2 = ZoneMap.commitManifest(ZoneMap.updateManifest(spark, table,
      ZoneMap.readManifestAt(spark, mPath, v1), Seq("qty")), mPath)

    val r1 = IncrementalRollup.refreshBetween(spark, r0, mPath, v0, v1,
      dims, ms).localCheckpoint(true)
    val r2 = IncrementalRollup.refreshBetween(spark, r1, mPath, v1, v2,
      dims, ms)
    val rebuilt = IncrementalRollup.build(spark.read.parquet(table), dims, ms)
    assert(r2.orderBy("grp").collect().toSeq ==
      rebuilt.orderBy("grp").collect().toSeq)
    // same-version diff is a no-op returning the input unchanged
    assert(IncrementalRollup.refreshBetween(spark, r2, mPath, v2, v2,
      dims, ms) eq r2)
    // derived averages agree with direct aggregation
    val avg1 = IncrementalRollup.withAverages(r2, ms)
      .select(col("grp"), col("amount_avg")).as[(String, Double)]
      .collect().toMap
    val direct = spark.read.parquet(table).groupBy("grp")
      .agg(avg(col("amount").cast("decimal(18,2)")).cast("double"))
      .as[(String, Double)].collect().toMap
    for ((g, v) <- direct) assert(math.abs(avg1(g) - v) < 1e-9)
  }

  test("append-only violation (removed files) is rejected, not merged") {
    val table = java.nio.file.Files.createTempDirectory("irv_t").toString
    val mPath = java.nio.file.Files.createTempDirectory("irv_m").toString +
      "/manifest"
    rows(0, 100).coalesce(2).write.mode("overwrite").parquet(table)
    val v0 = ZoneMap.commitManifest(
      ZoneMap.buildManifest(spark, table, Seq("qty")), mPath)
    // compaction rewrites history: fewer, different files
    graft.io.Tables.compact(spark, table, numFiles = 1)
    val v1 = ZoneMap.commitManifest(
      ZoneMap.buildManifest(spark, table, Seq("qty")), mPath)
    val r0 = IncrementalRollup.build(spark.read.parquet(table),
      Seq("grp"), Seq("amount"))
    intercept[IllegalArgumentException] {
      IncrementalRollup.refreshBetween(spark, r0, mPath, v0, v1,
        Seq("grp"), Seq("amount"))
    }
  }
}
