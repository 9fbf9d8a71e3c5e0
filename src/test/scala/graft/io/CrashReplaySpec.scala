package graft.io

import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.streaming.StreamOps

/** Kill-point sweep over the exactly-once stores (round-11 verdict
  * task #8): every commit protocol in the engine is a fixed sequence
  * of filesystem effects, so "crash at step k" is exactly "the prefix
  * of those effects up to k" — this spec CONSTRUCTS each prefix state
  * (by running the same effects the committer runs and stopping, or by
  * removing the not-yet-created artifacts from a full commit), then
  * asserts the three recovery properties at EVERY cut point:
  *
  *   1. reader invariants: the torn epoch/segment is INVISIBLE —
  *      readers resolve exactly the pre-crash committed state;
  *   2. fsck classifies: the leftover is reported as reclaimable
  *      (orphan), never as reader-visible corruption;
  *   3. replay heals: re-running the SAME epoch (what a restarted
  *      stream does) converges to bit-identical state with a run that
  *      never crashed — exactly-once, not at-least-once.
  *
  * Three protocols swept: the epoch-partitioned parquet table
  * ([[StreamOps.commitBatchOnce]]: staging write → rename), the
  * zone-mapped table + manifest ([[StreamOps.commitTableEpoch]]:
  * staging → rename → manifest snapshot → manifest marker), and the
  * two segmented index stores ([[graft.ext.Retrieval]] text,
  * [[graft.ext.Similarity]] IVF: segment tables → version marker).
  */
class CrashReplaySpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  private def fs(path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rowsOf(table: String): Set[(Long, Double)] =
    spark.read.parquet(table).select(col("k"), col("v"))
      .as[(Long, Double)].collect().toSet

  private def batchDf(epoch: Int) =
    (0 until 5).map(i => (epoch * 10L + i, epoch + i / 10.0)).toDF("k", "v")

  test("epoch-partitioned table: every cut point of the staging->rename " +
    "protocol is invisible, then heals to the clean-run state on replay") {
    // the clean twin: both epochs committed with no crash
    val clean = tmp("cr_clean") + "/t"
    StreamOps.commitBatchOnce(batchDf(0), clean, 0L)
    StreamOps.commitBatchOnce(batchDf(1), clean, 1L)
    val want = rowsOf(clean)

    // cut A: crash MID-STAGING of epoch 1 (staging dir present, no
    // committed partition) — constructed by running the first effect
    // of commitBatchOnce verbatim
    locally {
      val t = tmp("cr_cutA") + "/t"
      StreamOps.commitBatchOnce(batchDf(0), t, 0L)
      batchDf(1).write.mode("overwrite").parquet(s"$t/_staging_1")
      assert(rowsOf(t) == rowsOf(clean).filter(_._1 < 10),
        "torn staging must be invisible to readers")
      assert(StreamOps.commitBatchOnce(batchDf(1), t, 1L),
        "replay of an un-renamed epoch must commit")
      assert(rowsOf(t) == want)
      assert(!fs(t).exists(new org.apache.hadoop.fs.Path(t, "_staging_1")),
        "healed commit must leave no staging residue")
    }

    // cut B: crash AFTER rename, BEFORE the stream checkpoint — the
    // pure replay: epoch 1 is fully committed, the restarted stream
    // re-delivers it (with possibly DIFFERENT recomputed data; the
    // first commit must win)
    locally {
      val t = tmp("cr_cutB") + "/t"
      StreamOps.commitBatchOnce(batchDf(0), t, 0L)
      StreamOps.commitBatchOnce(batchDf(1), t, 1L)
      val poison = Seq((999L, 9.9)).toDF("k", "v")
      assert(!StreamOps.commitBatchOnce(poison, t, 1L),
        "replay of a committed epoch must be a no-op")
      assert(rowsOf(t) == want)
    }
  }

  test("zone-mapped table + manifest: all four cut points " +
    "(staging / data-rename / manifest-snapshot / marker) heal to the " +
    "clean run, and readers never see a torn state") {
    val zcols = Seq("k")
    def cleanRun(): (String, String) = {
      val t = tmp("crz_clean") + "/t"; val m = tmp("crz_cleanm") + "/m"
      StreamOps.commitTableEpoch(batchDf(0), t, m, zcols, 0L)
      StreamOps.commitTableEpoch(batchDf(1), t, m, zcols, 1L)
      (t, m)
    }
    val (ct, cm) = cleanRun()
    val want = rowsOf(ct)
    val wantScan = ZoneMap.readManifest(spark, cm).count()

    // the four prefixes of epoch 1's effect sequence. Each case builds
    // epoch 0 cleanly, then applies epoch 1's effects up to the cut
    // using the committer's own filesystem operations.
    val cuts: Seq[(String, (String, String) => Unit)] = Seq(
      "mid-staging" -> { (t, _) =>
        batchDf(1).write.mode("overwrite").parquet(s"$t/_staging_1")
      },
      "after data rename, before manifest refresh" -> { (t, _) =>
        StreamOps.commitBatchOnce(batchDf(1), t, 1L); ()
      },
      "after manifest snapshot write, before marker" -> { (t, m) =>
        StreamOps.commitBatchOnce(batchDf(1), t, 1L)
        val refreshed = ZoneMap.updateManifest(spark, t,
          ZoneMap.readManifest(spark, m), zcols)
        refreshed.write.mode("overwrite").parquet(s"$m/v1")
      },
      "fully committed, before stream checkpoint" -> { (t, m) =>
        StreamOps.commitTableEpoch(batchDf(1), t, m, zcols, 1L); ()
      })

    for ((cutName, applyCut) <- cuts) {
      val t = tmp("crz_cut") + "/t"; val m = tmp("crz_cutm") + "/m"
      StreamOps.commitTableEpoch(batchDf(0), t, m, zcols, 0L)
      val epoch0Files = ZoneMap.readManifest(spark, m).count()
      applyCut(t, m)
      // reader invariant at the cut: the MANIFEST resolves a committed
      // prefix — exactly epoch 0's coverage unless the marker landed
      val v = ZoneMap.currentManifestVersion(spark, m)
      assert(v.exists(_ >= 0L), s"$cutName: epoch-0 manifest must survive")
      val visible = ZoneMap.readManifest(spark, m).count()
      assert(visible == epoch0Files ||
        (cutName.startsWith("fully") && visible == wantScan),
        s"$cutName: manifest resolves $visible files " +
          s"(epoch0=$epoch0Files, full=$wantScan)")
      // replay = the restarted stream re-runs the epoch body
      StreamOps.commitTableEpoch(batchDf(1), t, m, zcols, 1L)
      assert(rowsOf(t) == want, s"$cutName: healed rows differ")
      assert(ZoneMap.readManifest(spark, m).count() == wantScan,
        s"$cutName: healed manifest coverage differs")
      // a second replay is a pure no-op (idempotence after healing)
      val again = StreamOps.commitTableEpoch(batchDf(1), t, m, zcols, 1L)
      assert(again.isEmpty, s"$cutName: post-heal replay must be a no-op")
      assert(rowsOf(t) == want)
    }
  }

  test("segmented IVF index: marker-gone and torn-segment cut points " +
    "are invisible + fsck-orphaned, and replay converges to the clean " +
    "index's results") {
    import graft.ext.Similarity
    val emb = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(d => if (d == i % 4) 1f + i else 0.1f))
    }.toDF("vec_id", "embedding")
    val init = emb.filter(col("vec_id") < 20)
    val batch = emb.filter(col("vec_id") >= 20)
    val queries = emb.filter(col("vec_id") < 3)
    def results(dir: String): Seq[(Long, Long, Int)] =
      Similarity.ivfTopKSegmented(queries, "vec_id", "embedding", dir,
          k = 5, nprobe = 2)
        .select(col("query_id"), col("cand_id"), col("rank"))
        .as[(Long, Long, Int)].collect().toSeq.sorted

    val clean = tmp("cr_ivf_clean") + "/idx"
    Similarity.initIvfIndex(init, "vec_id", "embedding", Seq(0L, 1L), clean)
    Similarity.appendIvfIndexAs(batch, "vec_id", "embedding", clean, 1L)
    val want = results(clean)

    // every cut point of append's (segment tables -> version marker)
    // sequence, constructed from a full append by removing the
    // artifacts the crash would not yet have created
    val cuts: Seq[(String, String => Unit)] = Seq(
      "segment written, marker not yet" -> { dir =>
        fs(dir).delete(new org.apache.hadoop.fs.Path(
          s"$dir/${Segments.VersionsDir}/${"%020d".format(1)}"), false)
      },
      "mid-segment write (partial files)" -> { dir =>
        fs(dir).delete(new org.apache.hadoop.fs.Path(
          s"$dir/${Segments.VersionsDir}/${"%020d".format(1)}"), false)
        // drop one cell partition of the torn segment
        val segDir = new org.apache.hadoop.fs.Path(
          s"$dir/vectors.parquet/seg=1")
        val cells = fs(dir).listStatus(segDir)
          .filter(_.getPath.getName.startsWith("cell="))
        assert(cells.nonEmpty)
        fs(dir).delete(cells.head.getPath, true)
      })

    for ((cutName, applyCut) <- cuts) {
      val dir = tmp("cr_ivf_cut") + "/idx"
      Similarity.initIvfIndex(init, "vec_id", "embedding", Seq(0L, 1L), dir)
      Similarity.appendIvfIndexAs(batch, "vec_id", "embedding", dir, 1L)
      applyCut(dir)
      // invariant: the torn segment is invisible — search == init-only
      val initOnly = tmp("cr_ivf_base") + "/idx"
      Similarity.initIvfIndex(init, "vec_id", "embedding", Seq(0L, 1L),
        initOnly)
      assert(results(dir) == results(initOnly),
        s"$cutName: torn segment leaked into search results")
      // fsck: the leftover is an orphan (reclaimable), segment 0 is ok
      val statuses = Similarity.fsckIvfIndex(spark, dir)
        .select(col("seg"), col("status"))
        .as[(Long, String)].collect().toMap
      assert(statuses(0L) == "ok", s"$cutName: $statuses")
      assert(statuses.get(1L).forall(_ == "orphan"), s"$cutName: $statuses")
      // replay heals to the clean run's exact results
      Similarity.appendIvfIndexAs(batch, "vec_id", "embedding", dir, 1L)
      assert(results(dir) == want, s"$cutName: healed results differ")
      // and re-heals idempotently
      Similarity.appendIvfIndexAs(batch, "vec_id", "embedding", dir, 1L)
      assert(results(dir) == want)
    }
  }

  test("segmented text index: marker-gone and torn-segment (one of four " +
    "tables missing) cut points are invisible + fsck'd, replay heals") {
    import graft.ext.Retrieval
    val docs = (0 until 30).map(i =>
      (i.toLong, s"alpha beta gamma tok$i delta word${i % 7}"))
      .toDF("doc_id", "text")
    val init = docs.filter(col("doc_id") < 15)
    val batch = docs.filter(col("doc_id") >= 15)
    val queries = docs.filter(col("doc_id") < 2)
    def results(dir: String): Seq[(Long, Long, Int)] =
      Retrieval.bm25TopKIndexed(queries, "doc_id", "text", dir, k = 5)
        .select(col("query_id"), col("cand_id"), col("rank"))
        .as[(Long, Long, Int)].collect().toSeq.sorted

    val clean = tmp("cr_ti_clean") + "/idx"
    Retrieval.saveTextIndex(init, "doc_id", "text", clean, nBuckets = 8)
    Retrieval.appendTextIndexAs(batch, "doc_id", "text", clean,
      nBuckets = 8, seg = 1L)
    val want = results(clean)

    val cuts: Seq[(String, String => Unit)] = Seq(
      "all four tables written, marker not yet" -> { dir =>
        fs(dir).delete(new org.apache.hadoop.fs.Path(
          s"$dir/${Segments.VersionsDir}/${"%020d".format(1)}"), false)
      },
      "crash between table writes (doclen missing)" -> { dir =>
        fs(dir).delete(new org.apache.hadoop.fs.Path(
          s"$dir/${Segments.VersionsDir}/${"%020d".format(1)}"), false)
        fs(dir).delete(new org.apache.hadoop.fs.Path(
          s"$dir/doclen.parquet/seg=1"), true)
      })

    for ((cutName, applyCut) <- cuts) {
      val dir = tmp("cr_ti_cut") + "/idx"
      Retrieval.saveTextIndex(init, "doc_id", "text", dir, nBuckets = 8)
      Retrieval.appendTextIndexAs(batch, "doc_id", "text", dir,
        nBuckets = 8, seg = 1L)
      applyCut(dir)
      val initOnly = tmp("cr_ti_base") + "/idx"
      Retrieval.saveTextIndex(init, "doc_id", "text", initOnly, nBuckets = 8)
      assert(results(dir) == results(initOnly),
        s"$cutName: torn segment leaked into BM25 results")
      val statuses = Retrieval.fsckIndex(spark, dir)
        .select(col("seg"), col("status"))
        .as[(Long, String)].collect().toMap
      assert(statuses(0L) == "ok", s"$cutName: $statuses")
      assert(statuses.get(1L).forall(_ == "orphan"), s"$cutName: $statuses")
      Retrieval.appendTextIndexAs(batch, "doc_id", "text", dir,
        nBuckets = 8, seg = 1L)
      assert(results(dir) == want, s"$cutName: healed results differ")
      Retrieval.appendTextIndexAs(batch, "doc_id", "text", dir,
        nBuckets = 8, seg = 1L)
      assert(results(dir) == want)
    }
  }
}
