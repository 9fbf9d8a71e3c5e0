package graft.io

import java.util.concurrent.{CyclicBarrier, Executors, TimeUnit}

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ext.{Retrieval, Similarity}

/** Concurrent-writer properties for the segment-store commit protocol
  * (round-12 verdict task #4): [[SegmentsSpec]] pins the CAS conflict
  * SEQUENTIALLY (stale base, two calls in program order); these tests
  * run two REAL threads.
  *
  * Two shapes:
  *
  *   1. a barrier race on the raw claim — both threads release
  *      together and try to create the SAME version marker. This is
  *      the path that must be atomic at the filesystem: on Hadoop's
  *      local FS `create(p, overwrite=false)` is check-then-act, so
  *      the claim goes through NIO O_EXCL ([[Segments
  *      .commitVersionAfter]]); 30 raced rounds assert exactly one
  *      winner each, every round.
  *
  *   2. a deterministic lost-update interleaving against the PUBLIC
  *      append APIs (`appendIvfIndexAs` / `appendTextIndexAs`): the
  *      interloper thread waits until the appender has provably
  *      passed its base snapshot — the segment tree the appender
  *      writes BETWEEN snapshot and commit appears on disk — then
  *      claims the contested version first. The appender's commit must
  *      fail loudly naming that version, its half-landed segment must
  *      classify as `orphan` in fsck (readers never scan it), and its
  *      retry must land cleanly. Unlike a pure barrier race on the
  *      whole append (whose outcome depends on how the two multi-
  *      second Spark writes interleave), this ordering is enforced by
  *      program order — the test cannot pass by accident of timing.
  */
class SegmentsRaceSpec extends SparkTestBase {

  /** Run two thunks on two real threads released by a shared barrier. */
  private def race[T](a: => T, b: => T)
      : (Either[Throwable, T], Either[Throwable, T]) = {
    val barrier = new CyclicBarrier(2)
    val pool = Executors.newFixedThreadPool(2)
    try {
      def task(body: => T) = pool.submit(
        new java.util.concurrent.Callable[Either[Throwable, T]] {
          def call(): Either[Throwable, T] = {
            barrier.await(30, TimeUnit.SECONDS)
            try Right(body) catch { case t: Throwable => Left(t) }
          }
        })
      val fa = task(a); val fb = task(b)
      (fa.get(120, TimeUnit.SECONDS), fb.get(120, TimeUnit.SECONDS))
    } finally pool.shutdownNow()
  }

  /** Spin until `path` exists — the on-disk evidence that a writer has
    * passed its snapshot and is mid-append (segment data lands strictly
    * between snapshot and commit in program order). */
  private def awaitDir(path: String): Unit = {
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (!new java.io.File(path).exists()) {
      if (System.nanoTime() > deadline)
        fail(s"segment tree $path never appeared — appender stuck?")
      Thread.sleep(2)
    }
  }

  test("raw CAS: 30 barrier-raced rounds on the same version number — " +
    "exactly one winner per round, loser names the contested version") {
    val dir = java.nio.file.Files.createTempDirectory("seg_race")
      .toString + "/idx"
    assert(Segments.commitVersion(spark, dir, Seq(0L)) == 0L)
    var base = 0L
    for (round <- 1 to 30) {
      val (ra, rb) = race(
        Segments.commitVersionAfter(spark, dir, base, Seq(0L, 100L + round)),
        Segments.commitVersionAfter(spark, dir, base, Seq(0L, 200L + round)))
      val results = Seq(ra, rb)
      assert(results.count(_.isRight) == 1,
        s"round $round: expected exactly one winner, got $ra / $rb")
      val loser = results.collectFirst { case Left(t) => t }.get
      assert(loser.isInstanceOf[IllegalStateException], loser.toString)
      assert(loser.getMessage.contains(s"version ${base + 1}"),
        s"loser must name the contested version: ${loser.getMessage}")
      base += 1
      // the chain is intact: versions 0..base, no gap, no double-claim
      assert(Segments.listVersions(spark, dir) == (0L to base),
        s"round $round broke the version chain")
    }
  }

  test("appendIvfIndexAs raced with an interloper commit: the appender " +
    "loses loudly, its tree is an fsck orphan, and the retry lands") {
    val emb = Tables.load(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("ivf_race").toString
    Similarity.initIvfIndex(emb.filter(col("vec_id") < 200), "vec_id",
      "embedding", 10L to 17L, dir)
    val batch = emb.filter(col("vec_id") >= 200 && col("vec_id") < 300)

    val (interloper, appender) = race(
      { // claims version 1 only after the appender is provably past its
        // base snapshot (its seg=2 tree is landing); re-commits the
        // current active set, the retention-checkpoint shape
        awaitDir(s"$dir/vectors.parquet/seg=2")
        Segments.commitVersionAfter(spark, dir, 0L, Seq(0L)): Any
      },
      {
        Similarity.appendIvfIndexAs(batch, "vec_id", "embedding", dir,
          seg = 2L): Any
      })

    assert(interloper == Right(1L),
      s"interloper's claim of version 1 should win: $interloper")
    val err = appender.swap.getOrElse(
      fail(s"appender must lose the CAS, got $appender"))
    assert(err.isInstanceOf[IllegalStateException], err.toString)
    assert(err.getMessage.contains("version 1"),
      s"loser must name the contested version: ${err.getMessage}")

    // the half-landed segment is invisible to readers and classified
    // orphan — on disk, in no retained version
    assert(Segments.committedSegments(spark, dir) == Seq(0L))
    val statuses = Similarity.fsckIvfIndex(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(statuses == Map(0L -> "ok", 2L -> "orphan"), statuses.toString)

    // retry from a fresh snapshot: idempotent overwrite of the orphan
    // tree, clean commit, fsck fully green, search == one-shot rebuild
    Similarity.appendIvfIndexAs(batch, "vec_id", "embedding", dir, seg = 2L)
    assert(Segments.committedSegments(spark, dir) == Seq(0L, 2L))
    val statuses2 = Similarity.fsckIvfIndex(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(statuses2 == Map(0L -> "ok", 2L -> "ok"), statuses2.toString)
    val rebuilt = java.nio.file.Files.createTempDirectory("ivf_rb").toString
    Similarity.initIvfIndex(emb.filter(col("vec_id") < 300), "vec_id",
      "embedding", 10L to 17L, rebuilt)
    val queries = emb.filter(col("vec_id").isin(0L, 1L, 2L))
    val got = Similarity.ivfTopKSegmented(queries, "vec_id", "embedding",
      dir, k = 5, nprobe = 2).collect().toSeq
    val want = Similarity.ivfTopKSegmented(queries, "vec_id", "embedding",
      rebuilt, k = 5, nprobe = 2).collect().toSeq
    assert(got == want, "post-retry index diverged from one-shot rebuild")
  }

  test("appendTextIndexAs raced with an interloper commit: same " +
    "contract on the four-table text index") {
    val docs = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("ti_race").toString
    Retrieval.saveTextIndex(docs.filter(col("doc_id") % 3 === 0),
      "doc_id", "text", dir, nBuckets = 8)
    val batch = docs.filter(col("doc_id") % 3 === 1)

    val (interloper, appender) = race(
      {
        // postings is the FIRST of the four tables writeSegment lands,
        // so its appearance proves the appender snapshotted base = 0
        awaitDir(s"$dir/postings.parquet/seg=2")
        Segments.commitVersionAfter(spark, dir, 0L, Seq(0L)): Any
      },
      {
        Retrieval.appendTextIndexAs(batch, "doc_id", "text", dir,
          nBuckets = 8, seg = 2L): Any
      })

    assert(interloper == Right(1L), s"interloper should win: $interloper")
    val err = appender.swap.getOrElse(
      fail(s"appender must lose the CAS, got $appender"))
    assert(err.getMessage.contains("version 1"), err.getMessage)

    // all four tables landed (the thread ran to its commit), but the
    // segment is orphan: present on disk, referenced by no version
    assert(Retrieval.committedSegments(spark, dir) == Seq(0L))
    val fsck = Retrieval.fsckIndex(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq.sorted
    assert(fsck == Seq((0L, "ok", 4), (2L, "orphan", 4)), fsck.toString)

    // retry: clean commit, fsck green, ranking == one-shot rebuild
    Retrieval.appendTextIndexAs(batch, "doc_id", "text", dir,
      nBuckets = 8, seg = 2L)
    assert(Retrieval.committedSegments(spark, dir) == Seq(0L, 2L))
    val rebuilt = java.nio.file.Files.createTempDirectory("ti_rb").toString
    Retrieval.saveTextIndex(docs.filter(col("doc_id") % 3 < 2),
      "doc_id", "text", rebuilt, nBuckets = 8)
    val queries = docs.filter(col("doc_id").isin(0L, 3L, 6L))
    val got = Retrieval.bm25TopKIndexed(queries, "doc_id", "text", dir,
      k = 5).orderBy("query_id", "rank").collect().toSeq
    val want = Retrieval.bm25TopKIndexed(queries, "doc_id", "text",
      rebuilt, k = 5).orderBy("query_id", "rank").collect().toSeq
    assert(got.nonEmpty && got == want,
      "post-retry text index diverged from one-shot rebuild")
  }
}
