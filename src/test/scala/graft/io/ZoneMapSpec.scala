package graft.io

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ZoneMapSpec extends SparkTestBase {
  import spark.implicits._

  // 64x64 (x, y) grid — every (x, y) combination once, so both
  // dimensions are uniform and layout is the only variable.
  private def grid() =
    spark.range(64L * 64L)
      .select((col("id") / 64).cast("int").as("x"),
        (col("id") % 64).cast("int").as("y"),
        col("id").as("payload"))

  test("manifest matches per-file truth; skipScan reads fewer files, " +
      "same rows as the full filter") {
    val dir = java.nio.file.Files.createTempDirectory("zm").toString
    grid().repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(dir)

    val manifest = ZoneMap.buildManifest(spark, dir, Seq("x", "y"))
      .cache()
    val nFiles = spark.read.parquet(dir).inputFiles.length
    assert(manifest.count() == nFiles)
    // zone stats must bound every row of their own file
    val bad = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min("x").as("tmin"), max("x").as("tmax"))
      .join(manifest, "file")
      .filter(col("tmin") =!= col("x__min") || col("tmax") =!= col("x__max"))
    assert(bad.count() == 0)

    // x in [10, 13] lives in one-ish range partition of eight
    val pruned = ZoneMap.prunedFiles(manifest, "x", 10, 13)
    assert(pruned.nonEmpty && pruned.size < nFiles,
      s"expected real pruning, got ${pruned.size} of $nFiles files")

    val viaSkip = ZoneMap.skipScan(spark, dir, manifest, "x", 10, 13)
    assert(viaSkip.inputFiles.length == pruned.size)
    val full = spark.read.parquet(dir)
      .filter(col("x") >= 10 && col("x") <= 13)
    assert(viaSkip.select("x", "y", "payload").sort("payload").collect()
      .toSeq == full.select("x", "y", "payload").sort("payload").collect()
      .toSeq)
  }

  test("z-order layout prunes on BOTH dimensions; a linear x-sort " +
      "prunes only x") {
    val dirX = java.nio.file.Files.createTempDirectory("zmx").toString
    val dirZ = java.nio.file.Files.createTempDirectory("zmz").toString
    grid().repartitionByRange(8, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(dirX)
    graft.ops.ZOrder.clusterByZ(grid(), "x", "y", bits = 6,
        numPartitions = 8)
      .write.mode("overwrite").parquet(dirZ)

    val mx = ZoneMap.buildManifest(spark, dirX, Seq("x", "y"))
    val mz = ZoneMap.buildManifest(spark, dirZ, Seq("x", "y"))
    val nx = spark.read.parquet(dirX).inputFiles.length
    val nz = spark.read.parquet(dirZ).inputFiles.length

    // y-range predicate: the x-sorted layout cannot prune (every file
    // spans all of y); the z-ordered layout must skip files
    val yPrunedX = ZoneMap.prunedFiles(mx, "y", 0, 7)
    val yPrunedZ = ZoneMap.prunedFiles(mz, "y", 0, 7)
    assert(yPrunedX.size == nx, "x-sorted layout unexpectedly pruned on y")
    assert(yPrunedZ.size < nz,
      s"z-order layout failed to prune on y: ${yPrunedZ.size} of $nz")
    // and x still prunes under z-order too
    assert(ZoneMap.prunedFiles(mz, "x", 0, 7).size < nz)

    // pruned scans stay row-exact on both layouts
    val exact = grid().filter(col("y") <= 7).count()
    assert(ZoneMap.skipScan(spark, dirZ, mz, "y", 0, 7).count() == exact)
    assert(ZoneMap.skipScan(spark, dirX, mx, "y", 0, 7).count() == exact)
  }

  test("fully-pruned predicate yields an empty frame with the table " +
      "schema, no file reads") {
    val dir = java.nio.file.Files.createTempDirectory("zme").toString
    grid().coalesce(2).write.mode("overwrite").parquet(dir)
    val m = ZoneMap.buildManifest(spark, dir, Seq("x"))
    val out = ZoneMap.skipScan(spark, dir, m, "x", 1000, 2000)
    assert(out.inputFiles.isEmpty || out.count() == 0)
    assert(out.schema.fieldNames.toSet == Set("x", "y", "payload"))
    assert(out.count() == 0)
  }

  test("null zones are kept conservatively") {
    val dir = java.nio.file.Files.createTempDirectory("zmn").toString
    Seq((Some(1), "a"), (None, "b"), (Some(5), "c"))
      .toDF("v", "tag").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val m = ZoneMap.buildManifest(spark, dir, Seq("v"))
    assert(m.select("v__nulls").as[Long].head() == 1L)
    // file intersects [0, 10] -> kept; rows with null v drop at the
    // row-level re-filter
    assert(ZoneMap.skipScan(spark, dir, m, "v", 0, 10).count() == 2)
  }

  test("bloom manifest prunes equality lookups range zones cannot; " +
      "no false negatives") {
    val dir = java.nio.file.Files.createTempDirectory("zmb").toString
    // payload hash-scattered across files: every file spans the whole
    // payload range, so min/max zones prune NOTHING for payload
    grid().repartition(8, col("payload"))
      .write.mode("overwrite").parquet(dir)
    val nFiles = spark.read.parquet(dir).inputFiles.length
    val zones = ZoneMap.buildManifest(spark, dir, Seq("payload"))
    assert(ZoneMap.prunedFiles(zones, "payload", 777L, 777L)
      .size == nFiles, "hash layout should defeat range zones")

    val blooms = ZoneMap.buildBloomManifest(spark, dir, "payload",
      expectedPerFile = 1024L)
    // each key lives in exactly one file; bloom must admit few files
    for (key <- Seq(0L, 777L, 4095L)) {
      val admitted = ZoneMap.bloomPrunedFiles(blooms, "payload", key)
      assert(admitted.nonEmpty && admitted.size <= nFiles / 2,
        s"key $key admitted ${admitted.size} of $nFiles files")
      val hit = ZoneMap.bloomSkipScan(spark, dir, blooms, "payload", key)
        .collect()
      assert(hit.length == 1 && hit.head.getAs[Long]("payload") == key)
    }
    // absent key: no row survives the re-filter regardless of fpp
    assert(ZoneMap.bloomSkipScan(spark, dir, blooms, "payload", 999999L)
      .count() == 0)
  }

  test("updateManifest scans only new files and is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("zmu").toString
    grid().filter(col("x") < 32).repartitionByRange(4, col("x"))
      .sortWithinPartitions("x").write.mode("overwrite").parquet(dir)
    val m1 = ZoneMap.buildManifest(spark, dir, Seq("x")).cache()
    val n1 = m1.count()
    // append a second batch of files
    grid().filter(col("x") >= 32).repartitionByRange(4, col("x"))
      .sortWithinPartitions("x").write.mode("append").parquet(dir)
    val m2 = ZoneMap.updateManifest(spark, dir, m1, Seq("x")).cache()
    assert(m2.count() == spark.read.parquet(dir).inputFiles.length)
    assert(m2.count() > n1)
    // matches a from-scratch rebuild, and a second update is a no-op
    val rebuilt = ZoneMap.buildManifest(spark, dir, Seq("x"))
    assert(m2.sort("file").collect().toSeq ==
      rebuilt.sort("file").collect().toSeq)
    assert(ZoneMap.updateManifest(spark, dir, m2, Seq("x"))
      .count() == m2.count())
    // the updated manifest still prunes correctly across both batches
    val pruned = ZoneMap.prunedFiles(m2, "x", 0, 7)
    assert(pruned.nonEmpty && pruned.size < m2.count())
  }

  test("updateManifest drops entries for files compaction deleted; " +
      "skipScan stays readable through the full lifecycle") {
    val dir = java.nio.file.Files.createTempDirectory("zmc").toString
    grid().repartitionByRange(6, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(dir)
    val m1 = ZoneMap.buildManifest(spark, dir, Seq("x"))
      .localCheckpoint(true)
    // compact rewrites the table into fewer files: every m1 entry is
    // now a deleted path
    Tables.compact(spark, dir, numFiles = 2)
    val m2 = ZoneMap.updateManifest(spark, dir, m1, Seq("x"))
      .localCheckpoint(true)
    val liveFiles = spark.read.parquet(dir).inputFiles.toSet
    assert(m2.select("file").collect().map(_.getString(0)).toSet ==
      liveFiles, "manifest must track exactly the live files")
    val rebuilt = ZoneMap.buildManifest(spark, dir, Seq("x"))
    assert(m2.sort("file").collect().toSeq ==
      rebuilt.sort("file").collect().toSeq)
    // a pruned read through the refreshed manifest still returns the
    // right rows (and does not touch deleted paths)
    assert(ZoneMap.skipScan(spark, dir, m2, "x", 0, 7).count() ==
      grid().filter(col("x") <= 7).count())
  }

  test("manifestSink: streaming appends keep the manifest current " +
      "and pruning-correct across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dataDir = java.nio.file.Files.createTempDirectory("zms-d").toString
    val mPath = java.nio.file.Files.createTempDirectory("zms-m").toString + "/manifest"
    val ckpt = java.nio.file.Files.createTempDirectory("zms-c").toString
    val mem = MemoryStream[(Int, Long)]
    val q = ZoneMap.manifestSink(
      mem.toDF().toDF("x", "payload"), dataDir, mPath, Seq("x"), ckpt)
    try {
      mem.addData((1, 10L), (2, 20L), (3, 30L))
      q.processAllAvailable()
      mem.addData((100, 40L), (101, 50L))
      q.processAllAvailable()
      val manifest = spark.read.parquet(mPath)
      // manifest covers every landed file, equals a from-scratch build
      assert(manifest.count() ==
        spark.read.parquet(dataDir).inputFiles.length)
      val rebuilt = ZoneMap.buildManifest(spark, dataDir, Seq("x"))
      assert(manifest.sort("file").collect().toSeq ==
        rebuilt.sort("file").collect().toSeq)
      // pruned read: x in [100, 200] must skip batch-1 files yet see
      // every batch-2 row
      val hit = ZoneMap.skipScan(spark, dataDir, manifest, "x", 100, 200)
      assert(hit.count() == 2)
      assert(hit.inputFiles.length <
        spark.read.parquet(dataDir).inputFiles.length)
    } finally q.stop()
  }

  test("zoneAudit: z-value zones are tight in both dimensions, " +
      "x-sorted zones span all of y") {
    val g = grid()
    val zAudit = ZoneMap.zoneAudit(g,
      graft.ops.ZOrder.zvalue(col("x"), col("y"), 6), col("payload"),
      nZones = 16, audit = Seq("x" -> col("x"), "y" -> col("y")))
      .collect()
    val xAudit = ZoneMap.zoneAudit(g, col("x"), col("payload"),
      nZones = 16, audit = Seq("x" -> col("x"), "y" -> col("y")))
      .collect()
    def meanSpan(rows: Array[org.apache.spark.sql.Row], c: String) =
      rows.map(r => r.getAs[Int](s"${c}_max") - r.getAs[Int](s"${c}_min"))
        .sum.toDouble / rows.length
    // x-sorted: x spans tiny, y spans the full 0..63
    assert(meanSpan(xAudit, "y") == 63.0)
    // z-order: each 256-row zone is a 16x16 tile -> span 15 in BOTH
    assert(meanSpan(zAudit, "x") <= 16.0)
    assert(meanSpan(zAudit, "y") <= 16.0)
    assert(zAudit.map(_.getAs[Long]("n_rows")).sum == 64L * 64L)
  }
}
