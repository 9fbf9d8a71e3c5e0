package graft.ext

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.io.Tables

/** The persisted, cell-partitioned IVF layout: search parity with the
  * in-memory operator, and the probe's IO contract — only the probed
  * cells' directories are read (static partition pruning), which is the
  * property that makes an IVF probe cost nprobe/C of the corpus at
  * 100 TB.
  */
class IvfIndexSpec extends SparkTestBase {

  private val centroidIds = 10L to 17L
  private val queryIds = Seq(0L, 1L, 2L, 3L, 4L)

  test("saveIvfIndex + ivfTopKIndexed == in-memory ivfTopK, and the " +
    "probe scan reads ONLY the probed cell partitions") {
    val emb = Tables.load(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ivf_idx").toString
    Similarity.saveIvfIndex(emb, "vec_id", "embedding", centroidIds,
      dir, "ivf")

    // on-disk layout: one hive directory per cell
    val cellDirs = new java.io.File(s"$dir/ivf.parquet").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(_.getName.stripPrefix("cell=").toLong).toSeq.sorted
    assert(cellDirs.size > 1, s"expected multiple cells, got $cellDirs")

    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
    for (nprobe <- Seq(1, 2)) {
      val got = Similarity.ivfTopKIndexed(queries, "vec_id", "embedding",
        dir, "ivf", k = 10, nprobe = nprobe)
      val expected = Similarity.ivfTopK(emb, "vec_id", "embedding",
        centroidIds, queryIds, k = 10, nprobe = nprobe)
      assert(got.collect().toSeq == expected.collect().toSeq,
        s"indexed search diverged from in-memory ivfTopK at nprobe=$nprobe")
    }

    // IO contract at nprobe=1: <= one cell per query may be probed, and
    // the pruned scan must carry partition filters and touch exactly
    // the probed directories — not the whole index
    val probed = Similarity.probeCells(queries, "vec_id", "embedding",
      dir, "ivf", nprobe = 1)
    assert(probed.size <= queryIds.size)
    assert(probed.size < cellDirs.size,
      "probe must not touch every cell of the index")
    val scan = Tables.load(spark, dir, "ivf")
      .filter(col("cell").isin(probed: _*))
    val exec = scan.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }.get
    assert(exec.partitionFilters.nonEmpty,
      "cell IN (probed) must become partition filters, not a data filter")
    // execute THIS plan object so its scan metrics populate; the hive
    // partition column is inferred as int on load, hence the normalize
    val gotCells = scan.collect()
      .map(_.getAs[Number]("cell").longValue()).distinct.toSeq.sorted
    assert(gotCells == probed, "scan surfaced rows outside probed cells")
    assert(exec.metrics.contains("numPartitions") &&
      exec.metrics("numPartitions").value == probed.size,
      s"expected ${probed.size} partitions read, " +
        s"metrics=${exec.metrics.get("numPartitions").map(_.value)}")
  }

  test("segmented IVF: init+append == full rebuild == in-memory ivfTopK " +
    "(bit-exact), at nprobe 1 and 2") {
    val emb = Tables.load(spark, sf, "embeddings")
    val inc = java.nio.file.Files.createTempDirectory("ivf_inc").toString
    val full = java.nio.file.Files.createTempDirectory("ivf_full").toString
    Similarity.initIvfIndex(emb.filter(col("vec_id") < 250), "vec_id",
      "embedding", centroidIds, inc)
    Similarity.appendIvfIndex(emb.filter(col("vec_id") >= 250), "vec_id",
      "embedding", inc)
    Similarity.initIvfIndex(emb, "vec_id", "embedding", centroidIds, full)
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
    for (nprobe <- Seq(1, 2)) {
      val got = Similarity.ivfTopKSegmented(queries, "vec_id", "embedding",
        inc, k = 10, nprobe = nprobe).collect().toSeq
      val rebuilt = Similarity.ivfTopKSegmented(queries, "vec_id",
        "embedding", full, k = 10, nprobe = nprobe).collect().toSeq
      val mem = Similarity.ivfTopK(emb, "vec_id", "embedding",
        centroidIds, queryIds, k = 10, nprobe = nprobe).collect().toSeq
      assert(got == rebuilt, s"incremental != rebuild at nprobe=$nprobe")
      assert(got == mem, s"segmented != in-memory at nprobe=$nprobe")
    }
    // probed-cell partition pruning carries to the segmented layout
    val probed = Similarity.probeCellsSeg(queries, "vec_id", "embedding",
      inc, nprobe = 1)
    val scan = spark.read.parquet(s"$inc/vectors.parquet")
      .filter(col("seg").isin(0L, 1L) && col("cell").isin(probed: _*))
    val exec = scan.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }.get
    assert(exec.partitionFilters.nonEmpty,
      "seg/cell IN filters must prune partitions, not rows")
    assert(scan.collect().map(_.getAs[Number]("cell").longValue())
      .distinct.toSeq.sorted == probed)
  }

  test("segmented IVF: replayed epoch is a no-op; compaction folds to " +
    "one segment and vacuum deletes superseded trees, search unchanged") {
    val emb = Tables.load(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ivf_seg").toString
    Similarity.initIvfIndex(emb.filter(col("vec_id") < 250), "vec_id",
      "embedding", centroidIds, dir)
    val batch = emb.filter(col("vec_id") >= 250)
    Similarity.appendIvfIndexAs(batch, "vec_id", "embedding", dir, seg = 7L)
    val queries = emb.filter(col("vec_id").isin(queryIds: _*))
    val before = Similarity.ivfTopKSegmented(queries, "vec_id",
      "embedding", dir, k = 10, nprobe = 2).collect().toSeq
    // replay: same explicit segment id again — nothing may change
    Similarity.appendIvfIndexAs(batch, "vec_id", "embedding", dir, seg = 7L)
    assert(graft.io.Segments.committedSegments(spark, dir) == Seq(0L, 7L),
      "replayed epoch must not commit a new segment")
    assert(Similarity.ivfTopKSegmented(queries, "vec_id", "embedding",
      dir, k = 10, nprobe = 2).collect().toSeq == before)
    // compact: one merged segment, identical answers
    val merged = Similarity.compactIvfIndex(spark, dir)
    assert(graft.io.Segments.committedSegments(spark, dir) == Seq(merged))
    assert(Similarity.ivfTopKSegmented(queries, "vec_id", "embedding",
      dir, k = 10, nprobe = 2).collect().toSeq == before)
    // replay AFTER compaction superseded seg 7: still a no-op
    Similarity.appendIvfIndexAs(batch, "vec_id", "embedding", dir, seg = 7L)
    assert(graft.io.Segments.committedSegments(spark, dir) == Seq(merged))
    // vacuum keepVersions=1: segments 0 and 7 physically deleted
    val dead = Similarity.vacuumIvfIndex(spark, dir, keepVersions = 1)
    assert(dead == Seq(0L, 7L), s"expected dead segs 0,7 got $dead")
    val segDirs = new java.io.File(s"$dir/vectors.parquet").listFiles()
      .filter(_.getName.startsWith("seg=")).map(_.getName).toSeq.sorted
    assert(segDirs == Seq(s"seg=$merged"))
    assert(Similarity.ivfTopKSegmented(queries, "vec_id", "embedding",
      dir, k = 10, nprobe = 2).collect().toSeq == before)
  }

  test("fsckIvfIndex classifies ok / historical / orphan / missing " +
    "segments (planted faults — the text-index fsck applied to vectors)") {
    val emb = Tables.load(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ivf_fsck").toString
    Similarity.initIvfIndex(emb.filter(col("vec_id") < 250), "vec_id",
      "embedding", centroidIds = 10L to 17L, indexDir = dir)
    Similarity.appendIvfIndex(emb.filter(col("vec_id") >= 250), "vec_id",
      "embedding", dir)
    def statusOf(): Map[Long, (String, Int)] =
      Similarity.fsckIvfIndex(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    // healthy two-segment index (the vector index has ONE table)
    assert(statusOf() == Map(0L -> ("ok", 1), 1L -> ("ok", 1)))

    // compaction supersedes 0,1 -> historical; merged is the active ok
    val merged = Similarity.compactIvfIndex(spark, dir)
    assert(statusOf() == Map(0L -> ("historical", 1),
      1L -> ("historical", 1), merged -> ("ok", 1)))

    // planted orphan: a segment tree no version ever committed
    assert(new java.io.File(s"$dir/vectors.parquet/seg=99").mkdirs())
    assert(statusOf()(99L) == ("orphan", 1))

    // planted corruption: delete the ACTIVE segment's only tree
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(new java.io.File(s"$dir/vectors.parquet/seg=$merged"))
    assert(statusOf()(merged) == ("missing", 0))

    // vacuum reclaims historical trees AND the orphan; the report
    // shrinks to the one corrupted active segment
    Similarity.vacuumIvfIndex(spark, dir, keepVersions = 1)
    assert(statusOf() == Map(merged -> ("missing", 0)))
  }
}
