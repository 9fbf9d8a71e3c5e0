package graft.ext

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Lexical retrieval + rank fusion for a training-data pipeline: BM25
  * top-k over an inverted index and reciprocal-rank fusion of lexical and
  * vector rankings (the standard hybrid-retrieval shape for RAG corpus
  * construction and eval-set mining).
  *
  * Scale contract: everything is postings-driven. The corpus is scanned
  * once into a (doc, token, tf) table; queries select their candidate set
  * through a token equi-join against those postings — cost ∝ the posting
  * lists of the query's terms, never ∝ corpus × queries. Corpus statistics
  * (N, total token count) travel as a broadcast 1-row aggregate; document
  * frequency joins by token. No cross product anywhere.
  *
  * Parity contract (the [[TextAnalysis.unigramLogProb]] convention):
  * per-term BM25 scores contain `ln`, which is not bit-portable across
  * engines — each term is cast to DECIMAL(28,9) before the per-pair sum,
  * making the aggregate order-independent and engine-exact at 9dp.
  * Length normalization uses only exactly-rounded IEEE ops (`+ - * /`),
  * so it needs no rounding.
  */
object Retrieval {

  /** BM25 top-k retrieval: for each query document, the `k` highest-BM25
    * candidate documents (self excluded), scored over whitespace tokens
    * with the Lucene idf form `ln((N - df + 0.5)/(df + 0.5) + 1)`.
    *
    * Queries are corpus rows (`queryIds`) — their DISTINCT token sets
    * become the term lists (query term frequency is ignored, the standard
    * short-query simplification). `maxDf` (0 = off) drops terms whose
    * document frequency exceeds it: at corpus scale, stopword postings
    * dominate the candidate join while contributing near-zero idf — the
    * same skew guard as [[Dedup.jaccardPairs]], here it also bounds the
    * per-term join fan-out to `maxDf` rows.
    *
    * Output: (query_id, cand_id, bm25, rank), rank 1..k per query with
    * deterministic (score DESC, cand_id) ordering.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queryIds: Seq[Long], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               maxDf: Long = 0): DataFrame = {
    // Postings (id, token, tf): the one corpus-sized shuffle — it IS the
    // inverted-index build. Referenced twice downstream (the dfreq
    // aggregate and the candidate scoring join) and Catalyst inlines the
    // whole tokenize+explode+aggregate subtree per reference with no
    // ReusedExchange (the broadcast wrapping differs) — the lazy
    // localCheckpoint computes the postings ONCE (the x_rec_eval
    // convention; measured: the corpus was tokenized twice per query).
    // Document length and the query term lists are deliberately NOT
    // derived from it: both are row-local projections of the source
    // (dl = token count, qterms = distinct tokens of the query rows).
    // (r14 note: widening the checkpointed postings to
    // shuffle-partitions width via an explicit pre-barrier repartition
    // was measured and REVERTED — isolated medians improved ~0.2 s but
    // the in-suite cost TRIPLED, the same more-tasks-lose pattern as
    // the suite-wide AQE-floor experiment.)
    val tf = df
      .select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), " ")).as("token"))
      .groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)

    // dl also feeds two consumers (the 1-row stats aggregate and the
    // candidate join); it is scan+project only, but the scan re-reads
    // the full text column — checkpoint the (id, dl) pairs instead.
    val dl = df.select(col(idCol).as("id"),
      size(split(lower(col(textCol)), " ")).cast("long").as("dl"))
      .localCheckpoint(false)
    // N and avgdl as one broadcast row. avgdl = Σdl / N with an integer
    // numerator — exact regardless of partitioning (sums of integral
    // doubles < 2^53 are order-independent).
    val stats = dl.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(col("dl")).cast("double").as("__toktotal"))

    val dfreq0 = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    // vocabulary-sized; barrier it so the per-token document-frequency
    // aggregate over the full postings table runs once, not once per
    // downstream action (measured ~0.3 s per run across the four BM25
    // consumers, r14 probe)
    val dfreq = (if (maxDf > 0) dfreq0.filter(col("df") <= maxDf)
                 else dfreq0).localCheckpoint(false)

    val qterms = df
      .filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"),
        explode(array_distinct(split(lower(col(textCol)), " ")))
          .as("token"))

    scoreBm25(tf, dfreq, dl, stats, qterms, k, k1, b)
  }

  /** The BM25 scoring chain shared by the in-memory and persisted-index
    * paths — shared code is what makes [[bm25TopKIndexed]] == [[bm25TopK]]
    * by construction, not by coincidence.
    *
    * Candidate generation IS the postings join: query terms × postings
    * of that token only, streamed map-side against two broadcast hash
    * joins — the corpus-sized tf never reshuffles. Joining dfreq first
    * keeps the maxDf guard upstream of the fan-out; the candidate set
    * (∝ query-term posting lists) then meets dl, where AQE broadcasts
    * the small side.
    */
  private def scoreBm25(tf: DataFrame, dfreq: DataFrame, dl: DataFrame,
                        stats: DataFrame, qterms: DataFrame,
                        k: Int, k1: Double, b: Double): DataFrame = {
    val terms = tf
      .join(broadcast(broadcast(qterms).join(dfreq, Seq("token"))),
        Seq("token"))
      .filter(col("id") =!= col("query_id"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("id").as("cand_id"),
        (log((col("__n") - col("df").cast("double") + 0.5) /
             (col("df").cast("double") + 0.5) + 1.0) *
          (col("tf").cast("double") * (k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") /
              (col("__toktotal") / col("__n")))))
          .cast(DecimalType(28, 9)).as("term"))

    val scored = terms
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("term")).cast("double").as("bm25"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Persist the inverted index, hive-partitioned BY TOKEN-HASH BUCKET —
    * the layout that makes a query read posting lists, not the corpus:
    * a query's terms map to a handful of buckets, and the scan plans
    * with static partition filters touching ONLY those directories
    * (the [[Similarity.saveIvfIndex]] contract, applied to text).
    *
    * Layout under `indexDir` — SEGMENTED, the Lucene model:
    *   postings.parquet/seg=<s>/bucket=<b>/   (token, id, tf)
    *   dfreq.parquet/seg=<s>/bucket=<b>/      (token, df) per segment —
    *                                precomputed so queries never
    *                                re-aggregate postings; cross-segment
    *                                df is an additive merge at read time
    *   doclen.parquet/seg=<s>/                (id, dl)
    *   stats.parquet/seg=<s>/                 (n, toktotal, n_buckets)
    *
    * [[saveTextIndex]] writes segment 0 (the backfill path);
    * [[appendTextIndex]] adds a new batch as the NEXT segment, touching
    * nothing already written — per-refresh cost ∝ the batch. Queries
    * read every segment's buckets for their terms (bucket partition
    * pruning applies within each segment) and merge the per-segment
    * document frequencies and corpus stats additively, which is exact
    * because df and (n, toktotal) are sums. Contract: a document id
    * lives in exactly ONE segment (append-only corpus; re-ingesting a
    * doc would double-count its postings — dedup upstream).
    *
    * One corpus scan builds a segment (tf → dfreq are one chain).
    * At 100 TB: size `nBuckets` so one bucket ≈ a few hundred MB;
    * compact segments periodically by rebuilding (the same trade
    * Lucene makes with merges).
    */
  def saveTextIndex(df: DataFrame, idCol: String, textCol: String,
                    indexDir: String, nBuckets: Int = 64): Unit = {
    require(nBuckets >= 1, s"nBuckets must be >= 1, got $nBuckets")
    // backfill owns the directory: clear any previous index + versions
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = root.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) fs.delete(root, true)
    writeSegment(df, idCol, textCol, indexDir, nBuckets, seg = 0L)
    commitVersion(df.sparkSession, indexDir, Seq(0L))
  }

  /** Append `newDocs` as the next segment of an existing index: only
    * the batch is scanned, only new `seg=` directories are written —
    * the [[graft.io.ZoneMap.updateManifest]] pattern for text. The
    * batch hashes with the index's own `n_buckets` (read from stats),
    * so bucket pruning stays consistent across segments. */
  def appendTextIndex(newDocs: DataFrame, idCol: String, textCol: String,
                      indexDir: String): Unit = {
    val spark = newDocs.sparkSession
    val committed = committedSegments(spark, indexDir)
    require(committed.nonEmpty,
      s"no committed segments under $indexDir — saveTextIndex first")
    val nBuckets = readNBuckets(spark, indexDir, committed)
    appendTextIndexAs(newDocs, idCol, textCol, indexDir, nBuckets,
      seg = allSegmentsEver(spark, indexDir).max + 1L)
  }

  /** Append a batch as an EXPLICIT segment id — the exactly-once form:
    * if `seg` was EVER part of a committed version the call is a no-op
    * (a replayed micro-batch indexes nothing twice, even if compaction
    * has since superseded its segment); a crashed half-written attempt
    * is invisible (not in any version) and the retry overwrites its
    * leftovers. This is the [[graft.streaming.StreamOps]] epoch-commit
    * idiom applied to the index. */
  def appendTextIndexAs(newDocs: DataFrame, idCol: String, textCol: String,
                        indexDir: String, nBuckets: Int, seg: Long): Unit = {
    val spark = newDocs.sparkSession
    // one coherent snapshot of the version chain (see the IVF twin,
    // [[graft.ext.Similarity.appendIvfIndexAs]]): ever-check, active
    // set, and CAS base from one read — a concurrent appender makes
    // commitVersionAfter fail loudly instead of silently dropping a
    // segment from the active set.
    val versions = graft.io.Segments.listVersions(spark, indexDir)
    val base = versions.maxOption.getOrElse(-1L)
    val ever = versions
      .flatMap(v => graft.io.Segments.readVersion(spark, indexDir, v))
    if (ever.contains(seg)) return
    writeSegment(newDocs, idCol, textCol, indexDir, nBuckets, seg)
    val active =
      if (base >= 0) graft.io.Segments.readVersion(spark, indexDir, base)
      else Seq.empty[Long]
    graft.io.Segments.commitVersionAfter(spark, indexDir, base,
      active :+ seg)
  }

  /** OPTIMIZE for the index — the Lucene merge: fold the current
    * committed segments into ONE, derived from the index tables
    * themselves (postings union verbatim, per-token df re-summed,
    * doclen union, stats re-summed — no re-tokenization, no source
    * corpus needed), committed as a new version whose segment set is
    * just the merged segment. Old segment trees stay on disk for
    * in-flight readers until [[vacuumTextIndex]]. Cuts query-side
    * file-open fan-out from |segments| back to 1 per bucket.
    */
  def compactTextIndex(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String): Long = {
    val committed = committedSegments(spark, indexDir)
    require(committed.nonEmpty, s"nothing to compact under $indexDir")
    val nBuckets = readNBuckets(spark, indexDir, committed)
    val merged = allSegmentsEver(spark, indexDir).max + 1L
    val postings = spark.read.parquet(s"$indexDir/postings.parquet")
      .filter(col("seg").isin(committed: _*))
      .select(col("id"), col("token"), col("tf"), col("bucket"))
    postings.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$indexDir/postings.parquet/seg=$merged")
    spark.read.parquet(s"$indexDir/dfreq.parquet")
      .filter(col("seg").isin(committed: _*))
      .groupBy(col("token"), col("bucket"))
      .agg(sum(col("df")).as("df"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$indexDir/dfreq.parquet/seg=$merged")
    spark.read.parquet(s"$indexDir/doclen.parquet")
      .filter(col("seg").isin(committed: _*))
      .select(col("id"), col("dl"))
      .write.mode("overwrite").parquet(s"$indexDir/doclen.parquet/seg=$merged")
    spark.read.parquet(s"$indexDir/stats.parquet")
      .filter(col("seg").isin(committed: _*))
      .agg(sum(col("n")).as("n"), sum(col("toktotal")).as("toktotal"))
      .withColumn("n_buckets", lit(nBuckets))
      .write.mode("overwrite").parquet(s"$indexDir/stats.parquet/seg=$merged")
    commitVersion(spark, indexDir, Seq(merged))
    merged
  }

  /** Retention for the index: keep the newest `keepVersions` version
    * files, then delete every segment tree no retained version
    * references. After vacuum, replay idempotence keys on the RETAINED
    * history — pair the retention window with the stream's checkpoint
    * horizon (a replay older than both cannot occur). */
  def vacuumTextIndex(spark: org.apache.spark.sql.SparkSession,
                      indexDir: String, keepVersions: Int = 2): Seq[Long] = {
    val retained = graft.io.Segments.retainVersions(spark, indexDir,
      keepVersions)
    graft.io.Segments.deleteDeadSegments(spark, indexDir,
      Seq("postings.parquet", "dfreq.parquet", "doclen.parquet",
        "stats.parquet"), retained)
  }

  /** Consistency report for the index's segment store — one row per
    * segment with status ok / historical / orphan / missing and a
    * table-presence count ([[graft.io.Segments.fsck]] over the four
    * index tables). `missing` on an ACTIVE segment means queries are
    * losing rows NOW; `orphan` is reclaimable dead weight. */
  def fsckIndex(spark: org.apache.spark.sql.SparkSession,
                indexDir: String): DataFrame =
    graft.io.Segments.fsck(spark, indexDir,
      Seq("postings.parquet", "dfreq.parquet", "doclen.parquet",
        "stats.parquet"))

  /** The ACTIVE segment set — the newest committed version file's
    * list. A version file is created atomically AFTER its segments'
    * tables land, so readers resolve a consistent set: a torn segment
    * write or an in-flight compaction is invisible by construction
    * (the [[graft.io.ZoneMap.commitManifest]] contract, carried to
    * segment SETS so compaction can atomically supersede many
    * segments with one). Protocol lives in [[graft.io.Segments]],
    * shared with the IVF vector index. */
  def committedSegments(spark: org.apache.spark.sql.SparkSession,
                        indexDir: String): Seq[Long] =
    graft.io.Segments.committedSegments(spark, indexDir)

  private def allSegmentsEver(spark: org.apache.spark.sql.SparkSession,
                              indexDir: String): Seq[Long] =
    graft.io.Segments.allSegmentsEver(spark, indexDir)

  private def commitVersion(spark: org.apache.spark.sql.SparkSession,
                            indexDir: String, segs: Seq[Long]): Long =
    graft.io.Segments.commitVersion(spark, indexDir, segs)

  private def readNBuckets(spark: org.apache.spark.sql.SparkSession,
                           indexDir: String, committed: Seq[Long]): Int = {
    val counts = spark.read.parquet(s"$indexDir/stats.parquet")
      .filter(col("seg").isin(committed: _*))
      .select(col("n_buckets")).distinct().collect().map(_.getInt(0))
    require(counts.length == 1,
      s"segments disagree on n_buckets (${counts.toSeq}) — " +
        "the index is corrupt, rebuild it")
    counts.head
  }

  /** One segment's four tables, each into its own `seg=` directory with
    * per-directory overwrite (idempotent under retries). Visibility
    * comes from the caller's [[commitVersion]], not from this write. */
  private def writeSegment(df: DataFrame, idCol: String, textCol: String,
                           indexDir: String, nBuckets: Int, seg: Long): Unit = {
    val tf = df
      .select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), " ")).as("token"))
      .groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("bucket",
        pmod(graft.functions.Hashing.hash64(col("token"), 0),
          lit(nBuckets.toLong)))
      // one chain feeds postings AND dfreq; barrier so the corpus
      // aggregate runs once, not once per sink
      .localCheckpoint(false)
    tf.write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$indexDir/postings.parquet/seg=$seg")
    tf.groupBy(col("token"), col("bucket"))
      .agg(count(lit(1)).as("df"))
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$indexDir/dfreq.parquet/seg=$seg")
    df.select(col(idCol).as("id"),
        size(split(lower(col(textCol)), " ")).cast("long").as("dl"))
      .write.mode("overwrite").parquet(s"$indexDir/doclen.parquet/seg=$seg")
    df.agg(count(lit(1)).cast("double").as("n"),
        sum(size(split(lower(col(textCol)), " ")).cast("long"))
          .cast("double").as("toktotal"))
      .withColumn("n_buckets", lit(nBuckets))
      .write.mode("overwrite").parquet(s"$indexDir/stats.parquet/seg=$seg")
  }

  /** The buckets a query set touches — driver-side, |distinct query
    * terms| hashes (the [[Similarity.probeCells]] analogue); public so
    * the IO-contract spec and monitoring can see what a query will
    * read. */
  def queryBuckets(queries: DataFrame, idCol: String, textCol: String,
                   nBuckets: Int): Seq[Long] =
    queries
      .select(explode(array_distinct(split(lower(col(textCol)), " ")))
        .as("token"))
      .select(pmod(graft.functions.Hashing.hash64(col("token"), 0),
        lit(nBuckets.toLong)).as("bucket"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted

  /** BM25 top-k against the PERSISTED index: identical scores and ranks
    * to [[bm25TopK]] over the same corpus (same scoring chain), but the
    * postings and dfreq scans carry static partition filters for the
    * query terms' buckets — IO ∝ the touched buckets, never the index.
    * `queries` supplies (idCol, textCol) rows exactly like the
    * in-memory path's query selection.
    */
  def bm25TopKIndexed(queries: DataFrame, idCol: String, textCol: String,
                      indexDir: String, k: Int,
                      k1: Double = 1.2, b: Double = 0.75,
                      maxDf: Long = 0): DataFrame = {
    val spark = queries.sparkSession
    // the index IS the committed segments: a torn or in-flight segment
    // (no marker) never reaches any scan below — seg is a partition
    // column, so the filter prunes its directories statically
    val committed = committedSegments(spark, indexDir)
    require(committed.nonEmpty,
      s"no committed segments under $indexDir")
    val nBuckets = readNBuckets(spark, indexDir, committed)
    // corpus stats merge additively across segments (sums of integral
    // doubles < 2^53 — exact, order-free)
    val stats = spark.read.parquet(s"$indexDir/stats.parquet")
      .filter(col("seg").isin(committed: _*))
      .agg(sum(col("n")).as("__n"), sum(col("toktotal")).as("__toktotal"))
    val buckets = queryBuckets(queries, idCol, textCol, nBuckets)
    val postings = spark.read.parquet(s"$indexDir/postings.parquet")
      .filter(col("seg").isin(committed: _*) &&
        col("bucket").isin(buckets: _*))
      .select(col("id"), col("token"), col("tf"))
    // per-segment document frequencies are partial counts of disjoint
    // doc sets — corpus df is their sum; the merge runs over the pruned
    // buckets only (|terms in touched buckets| × |segments| rows)
    val dfreq0 = spark.read.parquet(s"$indexDir/dfreq.parquet")
      .filter(col("seg").isin(committed: _*) &&
        col("bucket").isin(buckets: _*))
      .groupBy(col("token")).agg(sum(col("df")).as("df"))
    val dfreq = if (maxDf > 0) dfreq0.filter(col("df") <= maxDf) else dfreq0
    val dl = spark.read.parquet(s"$indexDir/doclen.parquet")
      .filter(col("seg").isin(committed: _*))
      .select(col("id"), col("dl"))
    val qterms = queries
      .select(col(idCol).as("query_id"),
        explode(array_distinct(split(lower(col(textCol)), " ")))
          .as("token"))
    scoreBm25(postings, dfreq, dl, stats, qterms, k, k1, b)
  }

  /** Reciprocal-rank fusion (Cormack et al.) of two rankings, each with
    * columns (query_id, cand_id, rank): `score = Σ 1/(c + rank)` over the
    * lists the candidate appears in, missing list contributes 0.
    *
    * The fused score is ONE addition of two exactly-rounded IEEE
    * divisions — bit-portable with no rounding step. Output:
    * (query_id, cand_id, rrf, rank 1..k) with (score DESC, cand_id)
    * deterministic ordering.
    *
    * Scale: inputs are already top-k lists (tiny relative to the corpus);
    * the fusion is a full-outer equi-join on (query_id, cand_id) — at
    * most |queries|·k rows a side, broadcastable in any realistic
    * configuration, and never touches the corpus again.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Int = 60): DataFrame = {
    val left = a.select(col("query_id"), col("cand_id"),
      col("rank").as("__ra"))
    val right = b.select(col("query_id"), col("cand_id"),
      col("rank").as("__rb"))
    val fused = left
      .join(right, Seq("query_id", "cand_id"), "full_outer")
      .select(col("query_id"), col("cand_id"),
        (coalesce(lit(1.0) / (lit(c.toDouble) + col("__ra").cast("double")),
            lit(0.0)) +
          coalesce(lit(1.0) / (lit(c.toDouble) + col("__rb").cast("double")),
            lit(0.0))).as("rrf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("cand_id"))
    fused
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }
}
