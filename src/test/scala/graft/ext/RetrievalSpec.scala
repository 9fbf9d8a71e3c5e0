package graft.ext

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BM25 retrieval, RRF fusion, and containment dedup: hand-computed
  * scores on a tiny corpus, ranking invariants, and the
  * asymmetric-partial-dup property Jaccard misses.
  */
class RetrievalSpec extends SparkTestBase {

  private def corpus() = {
    import spark.implicits._
    Seq(
      (0L, "apple banana cherry"),
      (1L, "apple apple durian"),
      (2L, "banana cherry durian elderberry fig"),
      (3L, "grape honeydew"),
      (4L, "apple banana cherry durian elderberry fig grape honeydew kiwi lime")
    ).toDF("doc_id", "text")
  }

  test("bm25TopK matches a hand-rolled plain-Scala BM25 on a tiny corpus") {
    val docs = Seq(
      0L -> Seq("apple", "banana", "cherry"),
      1L -> Seq("apple", "apple", "durian"),
      2L -> Seq("banana", "cherry", "durian", "elderberry", "fig"),
      3L -> Seq("grape", "honeydew"),
      4L -> Seq("apple", "banana", "cherry", "durian", "elderberry",
        "fig", "grape", "honeydew", "kiwi", "lime"))
    val n = docs.size.toDouble
    val dl = docs.map { case (id, ts) => id -> ts.size.toDouble }.toMap
    val avgdl = dl.values.sum / n
    val dfm = docs.flatMap(_._2.distinct).groupBy(identity).view
      .mapValues(_.size.toDouble).toMap
    val (k1, b) = (1.2, 0.75)
    def score(q: Long, c: Long): Double =
      docs.toMap.apply(q).distinct.map { t =>
        val tf = docs.toMap.apply(c).count(_ == t).toDouble
        if (tf == 0) BigDecimal(0)
        else BigDecimal(
          math.log((n - dfm(t) + 0.5) / (dfm(t) + 0.5) + 1) *
            (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl(c) / avgdl)))
          .setScale(9, BigDecimal.RoundingMode.HALF_UP)
      }.sum.toDouble

    val got = Retrieval.bm25TopK(corpus(), "doc_id", "text",
        queryIds = Seq(0L, 1L), k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    got.foreach { case ((q, c), s) =>
      assert(math.abs(s - score(q, c)) < 1e-9, s"($q,$c): $s vs ${score(q, c)}")
    }
    // doc 4 contains every term of doc 0 but is long; doc 2 shares 2 of 3
    // — both must appear in doc 0's top-3, ahead of the disjoint doc 3
    val top0 = got.keys.filter(_._1 == 0L).map(_._2).toSet
    assert(top0.contains(4L) && top0.contains(2L) && !top0.contains(3L))
  }

  test("bm25TopK: ranks are 1..k dense, self excluded, score descending") {
    val r = Retrieval.bm25TopK(corpus(), "doc_id", "text",
        queryIds = Seq(0L, 1L, 2L), k = 4)
      .orderBy(col("query_id"), col("rank")).collect()
    r.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getInt(3)).toSeq == (1 to rows.length))
      assert(!rows.map(_.getLong(1)).contains(q))
      val scores = rows.map(_.getDouble(2)).toSeq
      assert(scores == scores.sorted.reverse)
    }
  }

  test("bm25TopK maxDf guard drops high-df terms from scoring") {
    // query doc 2 = {banana, cherry, durian, elderberry, fig}; banana/
    // cherry/durian have df 3 and are dropped at maxDf = 2, leaving only
    // elderberry+fig (df 2) — so the sole candidate is doc 4, and doc 0
    // (sharing only the dropped banana+cherry) produces no pair at all
    val r = Retrieval.bm25TopK(corpus(), "doc_id", "text",
        queryIds = Seq(2L), k = 10, maxDf = 2)
      .collect().map(r => r.getLong(1)).toSet
    assert(r == Set(4L))
  }

  test("rrfFuse: both-list candidates beat single-list ones at equal rank") {
    import spark.implicits._
    val a = Seq((0L, 10L, 1), (0L, 11L, 2)).toDF("query_id", "cand_id", "rank")
    val bdf = Seq((0L, 10L, 2), (0L, 12L, 1)).toDF("query_id", "cand_id", "rank")
    val fused = Retrieval.rrfFuse(a, bdf, k = 3)
      .orderBy(col("rank")).collect()
    assert(fused.head.getLong(1) == 10L) // in both lists → highest rrf
    val expect10 = 1.0 / 61 + 1.0 / 62
    assert(math.abs(fused.head.getDouble(2) - expect10) < 1e-15)
    // single-list entries at rank 1 and 2 tie-break by cand_id
    assert(fused.map(_.getLong(1)).toSeq == Seq(10L, 12L, 11L))
  }

  test("containmentPairs flags short-doc-inside-long that Jaccard misses") {
    import spark.implicits._
    val df = Seq(
      (0L, "alpha beta gamma"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"),
      (2L, "phi chi psi omega")).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, "doc_id", "text", n = 1,
      candidates = lit(true), minContainment = 0.9, maxDf = 0).collect()
    assert(cont.map(r => (r.getLong(0), r.getLong(1))).toSet == Set((0L, 1L)))
    assert(cont.head.getDouble(2) == 1.0)
    val jac = Dedup.jaccardPairs(df, "doc_id", "text", n = 1,
      candidates = lit(true), minJaccard = 0.5, maxDf = 0).collect()
    assert(jac.isEmpty) // jaccard 3/20 = 0.15 — the asymmetric case
  }

  test("persisted text index: bm25TopKIndexed == bm25TopK, and the " +
    "postings scan reads ONLY the query terms' bucket partitions") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("text_idx").toString
    Retrieval.saveTextIndex(docs, "doc_id", "text", dir, nBuckets = 16)

    val queryIds = Seq(0L, 1L, 2L)
    val queries = docs.filter(col("doc_id").isin(queryIds: _*))
    val got = Retrieval.bm25TopKIndexed(queries, "doc_id", "text", dir,
        k = 10, maxDf = 50)
      .orderBy("query_id", "rank").collect().toSeq
    val want = Retrieval.bm25TopK(docs, "doc_id", "text", queryIds,
        k = 10, maxDf = 50)
      .orderBy("query_id", "rank").collect().toSeq
    assert(got == want, "indexed BM25 diverged from the in-memory path")

    // IO contract: a single SHORT query touches few buckets, the scan
    // carries partition filters, and partitions read == touched buckets
    val one = spark.createDataFrame(Seq((99999L, "spark shuffle")))
      .toDF("doc_id", "text")
    val buckets = Retrieval.queryBuckets(one, "doc_id", "text", 16)
    assert(buckets.size <= 2)
    val totalBuckets = new java.io.File(s"$dir/postings.parquet/seg=0")
      .listFiles().count(f => f.isDirectory && f.getName.startsWith("bucket="))
    assert(buckets.size < totalBuckets)
    val pruned = spark.read.parquet(s"$dir/postings.parquet")
      .filter(col("bucket").isin(buckets: _*))
    val exec = pruned.queryExecution.executedPlan.collectLeaves()
      .collectFirst { case f: FileSourceScanExec => f }.get
    assert(exec.partitionFilters.nonEmpty,
      "bucket IN (...) must plan as partition filters")
    pruned.collect()
    assert(exec.metrics("numPartitions").value == buckets.size)
    // and the pruned-scan query still answers correctly
    val hits = Retrieval.bm25TopKIndexed(one, "doc_id", "text", dir, k = 5)
    assert(hits.count() > 0)
  }

  test("appendTextIndex: incremental segments == one-shot rebuild, " +
    "bit-exactly") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val whole = java.nio.file.Files.createTempDirectory("ti_whole").toString
    val seg = java.nio.file.Files.createTempDirectory("ti_seg").toString
    Retrieval.saveTextIndex(docs, "doc_id", "text", whole, nBuckets = 16)
    Retrieval.saveTextIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", seg, nBuckets = 16)
    Retrieval.appendTextIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", seg)

    val queries = docs.filter(col("doc_id").isin(0L, 1L, 2L))
    val a = Retrieval.bm25TopKIndexed(queries, "doc_id", "text", whole,
      k = 10).orderBy("query_id", "rank").collect().toSeq
    val b = Retrieval.bm25TopKIndexed(queries, "doc_id", "text", seg,
      k = 10).orderBy("query_id", "rank").collect().toSeq
    assert(a.nonEmpty && a == b,
      "segmented index diverged from the one-shot rebuild")

    // two segment directories actually exist (the append touched only
    // its own seg=1 tree)
    val segs = new java.io.File(s"$seg/postings.parquet").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("seg="))
      .map(_.getName).sorted.toSeq
    assert(segs == Seq("seg=0", "seg=1"))
  }

  test("compactTextIndex merges to one segment with identical answers; " +
    "replay of a compacted epoch stays a no-op; vacuum reclaims trees") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("ti_cmp").toString
    Retrieval.saveTextIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", dir, nBuckets = 16)
    Retrieval.appendTextIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", dir)
    val queries = docs.filter(col("doc_id").isin(0L, 1L, 2L))
    val before = Retrieval.bm25TopKIndexed(queries, "doc_id", "text",
      dir, k = 10).orderBy("query_id", "rank").collect().toSeq

    val merged = Retrieval.compactTextIndex(spark, dir)
    assert(Retrieval.committedSegments(spark, dir) == Seq(merged))
    val after = Retrieval.bm25TopKIndexed(queries, "doc_id", "text",
      dir, k = 10).orderBy("query_id", "rank").collect().toSeq
    assert(after == before, "compaction changed the ranking")

    // replaying epoch 1 (superseded by the compaction) must be a no-op
    Retrieval.appendTextIndexAs(
      spark.createDataFrame(Seq((424242L, "spark spark")))
        .toDF("doc_id", "text"),
      "doc_id", "text", dir, nBuckets = 16, seg = 1L)
    assert(Retrieval.committedSegments(spark, dir) == Seq(merged))

    // vacuum to 1 version: pre-compaction segment trees disappear,
    // queries still answer identically
    val dead = Retrieval.vacuumTextIndex(spark, dir, keepVersions = 1)
    assert(dead.toSet == Set(0L, 1L))
    val segDirs = new java.io.File(s"$dir/postings.parquet").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("seg="))
      .map(_.getName).toSeq
    assert(segDirs == Seq(s"seg=$merged"))
    val vacuumed = Retrieval.bm25TopKIndexed(queries, "doc_id", "text",
      dir, k = 10).orderBy("query_id", "rank").collect().toSeq
    assert(vacuumed == before)
  }

  test("fsckIndex classifies ok / historical / orphan / missing " +
    "segments (planted faults)") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files.createTempDirectory("ti_fsck").toString
    Retrieval.saveTextIndex(docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text", dir, nBuckets = 16)
    Retrieval.appendTextIndex(docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", dir)
    def statusOf(): Map[Long, (String, Int)] =
      Retrieval.fsckIndex(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    // healthy two-segment index: both active and complete
    assert(statusOf() == Map(0L -> ("ok", 4), 1L -> ("ok", 4)))

    // compaction supersedes 0,1 -> historical (still on disk, older
    // version references them); merged segment is the active ok
    val merged = Retrieval.compactTextIndex(spark, dir)
    assert(statusOf() == Map(0L -> ("historical", 4),
      1L -> ("historical", 4), merged -> ("ok", 4)))

    // planted orphan: a segment tree no version ever committed (the
    // crashed half-write shape — writeSegment done, commit never ran)
    assert(new java.io.File(s"$dir/postings.parquet/seg=99").mkdirs())
    assert(statusOf()(99L) == ("orphan", 1))

    // planted corruption: delete the ACTIVE segment's doclen tree ->
    // missing with 3 of 4 tables present
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete()
    }
    deleteRec(new java.io.File(s"$dir/doclen.parquet/seg=$merged"))
    assert(statusOf()(merged) == ("missing", 3))

    // vacuum to the newest version: historical trees AND the orphan
    // are reclaimed (deleteDeadSegments drops every tree no retained
    // version references — the orphan is exactly such a tree), so the
    // report shrinks to the one corrupted active segment
    Retrieval.vacuumTextIndex(spark, dir, keepVersions = 1)
    assert(statusOf() == Map(merged -> ("missing", 3)))
  }
}
