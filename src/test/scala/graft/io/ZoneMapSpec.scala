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
    // zone stats must bound every row of their own file (truth keys
    // normalized like the manifest's, so the join actually matches)
    val norm = udf(ZoneMap.normPath _)
    val truth = spark.read.parquet(dir)
      .groupBy(norm(input_file_name()).as("file"))
      .agg(min("x").as("tmin"), max("x").as("tmax"))
    val joined = truth.join(manifest, "file")
    assert(joined.count() == nFiles, "every truth row must join a manifest row")
    assert(joined.filter(col("tmin") =!= col("x__min") ||
      col("tmax") =!= col("x__max")).count() == 0)

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

  test("zero-row files: listed with n_rows=0, pruned for every " +
      "predicate, never re-detected as fresh") {
    val dir = java.nio.file.Files.createTempDirectory("zmz0").toString
    grid().filter(col("x") < 8).coalesce(1)
      .write.mode("overwrite").parquet(dir)
    // a drained filter still writes a schema-only file
    grid().limit(0).coalesce(1).write.mode("append").parquet(dir)
    val nFiles = spark.read.parquet(dir).inputFiles.length
    assert(nFiles == 2, s"expected data file + empty file, got $nFiles")
    val m = ZoneMap.buildManifest(spark, dir, Seq("x"))
      .localCheckpoint(true)
    assert(m.count() == nFiles)
    assert(m.filter(col("n_rows") === 0).count() == 1)
    // zero rows proves absence for EVERY predicate
    assert(ZoneMap.prunedFiles(m, "x", -1000, 1000).size == 1)
    // the empty file is known, so a no-op refresh returns the same frame
    assert(ZoneMap.updateManifest(spark, dir, m, Seq("x")) eq m)
    assert(ZoneMap.skipScan(spark, dir, m, "x", 0, 7).count() ==
      grid().filter(col("x") <= 7).count())
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
    val liveFiles = spark.read.parquet(dir).inputFiles
      .map(ZoneMap.normPath).toSet
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
      val manifest = ZoneMap.readManifest(spark, mPath)
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
      // two micro-batches -> two committed versions, monotonic
      assert(ZoneMap.currentManifestVersion(spark, mPath).contains(1L))
    } finally q.stop()
  }

  test("manifest commits are reader-atomic: a half-written snapshot " +
      "is invisible until its marker lands; snapshots are immutable") {
    val dataDir = java.nio.file.Files.createTempDirectory("zma-d").toString
    val mPath = java.nio.file.Files.createTempDirectory("zma-m").toString +
      "/manifest"
    grid().filter(col("x") < 32).coalesce(2)
      .write.mode("overwrite").parquet(dataDir)
    val v0 = ZoneMap.commitManifest(
      ZoneMap.buildManifest(spark, dataDir, Seq("x")), mPath)
    assert(v0 == 0L)
    val snap0 = ZoneMap.readManifest(spark, mPath).collect().toSeq

    // simulate a refresh that crashed mid-write: new data lands and a
    // partial v1 snapshot directory exists, but no marker was created
    grid().filter(col("x") >= 32).coalesce(2)
      .write.mode("append").parquet(dataDir)
    spark.range(1).toDF("garbage")
      .write.mode("overwrite").parquet(s"$mPath/v1")
    // a racing reader resolves v0, complete and untorn
    assert(ZoneMap.currentManifestVersion(spark, mPath).contains(0L))
    assert(ZoneMap.readManifest(spark, mPath).collect().toSeq == snap0)
    // pruning through the visible snapshot never silently drops rows
    // from files it lists (the new files are re-filtered at row level
    // only after a refresh commits them)
    assert(ZoneMap.skipScan(spark, dataDir,
      ZoneMap.readManifest(spark, mPath), "x", 0, 7).count() ==
      grid().filter(col("x") <= 7).count())

    // the retried refresh overwrites the orphan dir and commits
    val pinnedOld = ZoneMap.readManifest(spark, mPath)
    val v1 = ZoneMap.commitManifest(
      ZoneMap.updateManifest(spark, dataDir, pinnedOld, Seq("x")), mPath)
    assert(v1 == 1L)
    val m1 = ZoneMap.readManifest(spark, mPath)
    assert(m1.count() == spark.read.parquet(dataDir).inputFiles.length)
    assert(m1.sort("file").collect().toSeq ==
      ZoneMap.buildManifest(spark, dataDir, Seq("x"))
        .sort("file").collect().toSeq)
    // snapshot isolation: the frame pinned before the commit still
    // reads the OLD version's rows (immutable snapshot dirs)
    assert(pinnedOld.collect().toSeq == snap0)

    // vacuum drops superseded snapshots but keeps the current one
    ZoneMap.vacuumManifest(spark, mPath, keep = 1)
    assert(ZoneMap.currentManifestVersion(spark, mPath).contains(1L))
    assert(!new java.io.File(s"$mPath/v0").exists())
    assert(ZoneMap.readManifest(spark, mPath).sort("file").collect()
      .toSeq == m1.sort("file").collect().toSeq)
  }

  test("time travel: scanAsOf pins a version's file list; manifestDiff " +
      "names the files added since") {
    val dataDir = java.nio.file.Files.createTempDirectory("tt-d").toString
    val mPath = java.nio.file.Files.createTempDirectory("tt-m").toString +
      "/manifest"
    // v0: first half of the table
    grid().filter(col("x") < 32).coalesce(2)
      .write.mode("overwrite").parquet(dataDir)
    val v0 = ZoneMap.commitManifest(
      ZoneMap.buildManifest(spark, dataDir, Seq("x")), mPath)
    // v1: append the second half, refresh, commit
    grid().filter(col("x") >= 32).coalesce(3)
      .write.mode("append").parquet(dataDir)
    val v1 = ZoneMap.commitManifest(
      ZoneMap.updateManifest(spark, dataDir,
        ZoneMap.readManifestAt(spark, mPath, v0), Seq("x")), mPath)

    // AS OF v0 the table is the pre-append state, although the
    // directory now holds both halves
    assert(ZoneMap.scanAsOf(spark, mPath, v0).count() ==
      grid().filter(col("x") < 32).count())
    assert(ZoneMap.scanAsOf(spark, mPath, v1).count() == grid().count())
    // the snapshot read still prunes/pushes down like any parquet scan
    assert(ZoneMap.scanAsOf(spark, mPath, v0)
      .filter(col("x") === 5).count() ==
      grid().filter(col("x") === 5).count())

    // the diff is exactly the appended files
    val diff = ZoneMap.manifestDiff(spark, mPath, v0, v1).collect()
    assert(diff.forall(_.getString(1) == "added"))
    val v0Files = ZoneMap.readManifestAt(spark, mPath, v0)
      .select("file").collect().map(_.getString(0)).toSet
    val v1Files = ZoneMap.readManifestAt(spark, mPath, v1)
      .select("file").collect().map(_.getString(0)).toSet
    assert(diff.map(_.getString(0)).toSet == v1Files -- v0Files)
    assert(ZoneMap.manifestDiff(spark, mPath, v0, v0).count() == 0)

    // a vacuumed version fails loudly, not wrong-silently
    ZoneMap.vacuumManifest(spark, mPath, keep = 1)
    intercept[java.io.FileNotFoundException] {
      ZoneMap.scanAsOf(spark, mPath, v0)
    }
    assert(ZoneMap.scanAsOf(spark, mPath, v1).count() == grid().count())
  }

  test("paths with URI-special characters: manifest keys match " +
      "inputFiles, updateManifest stays incremental, skipScan opens " +
      "the files") {
    val base = java.nio.file.Files.createTempDirectory("zm sp").toString
    val dir = s"$base/table with space"
    grid().filter(col("x") < 32).repartitionByRange(4, col("x"))
      .sortWithinPartitions("x").write.mode("overwrite").parquet(dir)
    val m1 = ZoneMap.buildManifest(spark, dir, Seq("x"))
      .localCheckpoint(true)
    // manifest keys must equal the normalized inputFiles spelling —
    // raw input_file_name() would disagree on every path here
    assert(m1.select("file").collect().map(_.getString(0)).toSet ==
      spark.read.parquet(dir).inputFiles.map(ZoneMap.normPath).toSet)
    // no-op refresh returns the SAME frame (reference equality): the
    // stale-key bug would silently force a full rescan instead
    assert(ZoneMap.updateManifest(spark, dir, m1, Seq("x")) eq m1)
    // append, refresh incrementally, prune row-exactly through it
    grid().filter(col("x") >= 32).repartitionByRange(4, col("x"))
      .sortWithinPartitions("x").write.mode("append").parquet(dir)
    val m2 = ZoneMap.updateManifest(spark, dir, m1, Seq("x"))
    assert(m2.count() == spark.read.parquet(dir).inputFiles.length)
    val pruned = ZoneMap.skipScan(spark, dir, m2, "x", 40, 47)
    assert(pruned.inputFiles.length < m2.count())
    assert(pruned.count() ==
      grid().filter(col("x") >= 40 && col("x") <= 47).count())
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
