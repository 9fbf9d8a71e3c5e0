package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Structured Streaming operators over the `events` stream shape
  * (ts timestamp, user_id long, event_type string, value double).
  *
  * The reference is batch-only (SURVEY §2.10) — these are the
  * beyond-reference streaming equivalents of the batch queries
  * `x_events_tumbling` / `x_events_sessions`, expressed once as
  * transformations that work on BOTH batch and streaming DataFrames
  * (identical plan shapes; Spark plans the stateful variants when the
  * input is a stream). Correctness of the shared logic is pinned by the
  * batch oracles; streaming-specific behavior (watermarks, late-data
  * eviction, incremental state) is covered by MemoryStream tests.
  *
  * Scale: streaming state is keyed by (window, event_type) / session key —
  * state store partitions follow shuffle partitions; watermarks bound
  * state size; no per-batch collect anywhere.
  */
object StreamOps {

  /** Tumbling 10-minute windowed aggregate with a watermark for state
    * eviction. Works on batch input too (watermark is a no-op there).
    */
  def tumblingAgg(events: DataFrame,
                  windowLen: String = "10 minutes",
                  watermark: String = "30 minutes",
                  slide: Option[String] = None): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(
        slide.fold(window(col("ts"), windowLen))(s =>
          window(col("ts"), windowLen, s)),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("total_value"))
      .select(col("window.start").as("bucket_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Built-in session windows (30-minute gap). */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", gap)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  /** Stream-stream interval join: left rows enriched with right rows of
    * the same key whose event time falls in `[leftTs - lookback, leftTs]`.
    * Both sides carry watermarks so the join state is bounded: Spark can
    * discard right-side state older than the watermark minus the
    * lookback. Works identically on batch inputs (watermark is a no-op).
    *
    * Column contract: both sides need `keyCol` and `tsCol`; right-side
    * columns are suffixed `_r` in the output to avoid collisions.
    */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, lookback: String = "1 hour",
                   watermark: String = "30 minutes"): DataFrame = {
    val r = right.columns.foldLeft(right)((d, c) =>
      d.withColumnRenamed(c, s"${c}_r"))
    left.withWatermark(tsCol, watermark)
      .join(r.withWatermark(s"${tsCol}_r", watermark),
        col(keyCol) === col(s"${keyCol}_r") &&
          col(s"${tsCol}_r") <= col(tsCol) &&
          col(s"${tsCol}_r") >= col(tsCol) - expr(s"interval $lookback"))
  }

  /** Stream-static enrichment join: every micro-batch joined against a
    * static dimension table. The dimension side is marked broadcast —
    * Spark re-plans the join per micro-batch, so the stream side never
    * shuffles and there is no join state to watermark (static side is
    * re-read per batch, which also picks up dimension updates for file
    * sources). Left join keeps stream rows with no dimension match. This
    * is the stateless counterpart of [[intervalJoin]]; use it for slowly
    * changing lookups (user→tier, key→config), not for time-versioned
    * enrichment (that is the as-of join).
    */
  def enrichStream(stream: DataFrame, dim: DataFrame, keyCol: String,
                   dimCols: Seq[String]): DataFrame =
    stream.join(
      broadcast(dim.select((keyCol +: dimCols).map(col): _*)),
      Seq(keyCol), "left")

  /** Streaming exact dedup: drop rows whose `idCols` were already seen,
    * holding each key in the state store only until the watermark passes
    * it — the streaming half of the dedup family (batch exact dedup is
    * `Dedup.exactGroups`). Upstream replays and at-least-once sources
    * (Kafka redeliveries, file re-listing) are the normal case at scale;
    * without the watermark bound the seen-key state grows without limit,
    * with it the store holds only the last `watermark` of keys, evenly
    * spread across state-store partitions by key hash.
    */
  def dedupStream(events: DataFrame, idCols: Seq[String],
                  tsCol: String = "ts",
                  watermark: String = "30 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols)

  /** Streaming CDC apply: maintain a parquet table as the continuously
    * merged view of a change stream. Each micro-batch is applied with
    * [[graft.ops.Merge.mergeInto]] (update/delete/insert semantics,
    * delete scoped to matched keys via `deleteCondition` over the
    * change row) and the table is swapped atomically (write to a
    * side directory, then rename) so concurrent readers never see a
    * half-written table. `tableCols` fixes the maintained schema —
    * change rows may carry extra columns (op codes, CDC metadata)
    * that never land in the table.
    *
    * This is the parquet-directory form of the pattern; a
    * transactional table format (Delta/Iceberg/Hudi) replaces the
    * swap with a metadata commit and adds compaction — the merge plan
    * (one full-outer equi-join per batch, update side = the
    * micro-batch, typically broadcast) is identical. State lives in
    * the TABLE, not the stream — the streaming side holds nothing
    * between batches, so a 100 TB base table costs one key-partitioned
    * join per refresh, not executor memory.
    */
  def upsertSink(changes: DataFrame, tablePath: String, keys: Seq[String],
                 tableCols: Seq[String],
                 deleteCondition: org.apache.spark.sql.Column =
                   lit(false),
                 checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyChanges(batch, tablePath, keys, tableCols, deleteCondition)
      }
      .start()

  /** EXACTLY-ONCE append sink for plain parquet: each micro-batch
    * lands as a hive partition `batch_id=<epoch>` under `tablePath`,
    * committed by a staging-write + ATOMIC RENAME, with the partition
    * directory itself as the commit marker. foreachBatch is
    * at-least-once under failure/restart — the epoch id is the
    * idempotence key:
    *
    *   - crash AFTER rename, BEFORE checkpoint commit → restart
    *     replays the same batch id, the marker directory exists, the
    *     replay is SKIPPED — no duplicate rows;
    *   - crash MID-STAGING → the leftover `_staging_<id>` directory is
    *     invisible to readers (underscore-prefixed paths are ignored
    *     by the parquet source) and the replay overwrites it;
    *   - rename is atomic on HDFS-like filesystems, so readers never
    *     observe a partial partition — they see the batch entirely or
    *     not at all.
    *
    * Readers get provenance for free: `batch_id` surfaces as a
    * partition column, so "reprocess everything since epoch N" is a
    * partition-pruned scan. At 100 TB the per-batch cost is one write
    * of the micro-batch plus two namenode ops (no table rewrite —
    * contrast [[applyChanges]], which merges the full base); small
    * batch files accrete, so pair with [[graft.io.Tables.compact]] on
    * a maintenance schedule.
    */
  def exactlyOnceAppendSink(stream: DataFrame, tablePath: String,
                            checkpointDir: String
                           ): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        commitBatchOnce(batch, tablePath, id); ()
      }
      .start()

  /** One idempotent batch commit (the foreachBatch body, callable
    * directly): returns true if this call committed `batch` under
    * `tablePath/batch_id=<batchId>`, false if that epoch was already
    * committed (replay) — in which case the table is untouched.
    */
  def commitBatchOnce(batch: DataFrame, tablePath: String,
                      batchId: Long): Boolean = {
    val spark = batch.sparkSession
    val hadoop = spark.sparkContext.hadoopConfiguration
    val table = new org.apache.hadoop.fs.Path(tablePath)
    val fs = table.getFileSystem(hadoop)
    val committed = new org.apache.hadoop.fs.Path(table, s"batch_id=$batchId")
    if (fs.exists(committed)) false
    else {
      val staging = new org.apache.hadoop.fs.Path(table, s"_staging_$batchId")
      batch.write.mode("overwrite").parquet(staging.toString)
      // rename is the commit point; a concurrent committer losing the
      // race leaves `committed` in place and this attempt cleans up
      if (fs.rename(staging, committed)) true
      else { fs.delete(staging, true); false }
    }
  }

  /** One CDC batch against the parquet table at `tablePath` (the
    * foreachBatch body, callable directly for batch backfills).
    */
  def applyChanges(batch: DataFrame, tablePath: String, keys: Seq[String],
                   tableCols: Seq[String],
                   deleteCondition: org.apache.spark.sql.Column): Unit = {
    val spark = batch.sparkSession
    val hadoop = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(tablePath)
    val fs = path.getFileSystem(hadoop)
    val base =
      if (fs.exists(path)) spark.read.parquet(tablePath)
      else batch.select(tableCols.map(col): _*).filter(lit(false))
    val merged = graft.ops.Merge.mergeInto(
      base.select(tableCols.map(col): _*), batch, keys, deleteCondition)
    val tmp = new org.apache.hadoop.fs.Path(tablePath + "__next")
    merged.write.mode("overwrite").parquet(tmp.toString)
    if (fs.exists(path)) fs.delete(path, true)
    fs.rename(tmp, path)
  }

  // ---- incremental curation pipeline ----------------------------------

  /** Streaming form of the curation capstone (`x_llm_pipeline2`'s
    * stages): per micro-batch of documents — exact dedup (within the
    * batch, then against every document already seen), near-dup dedup
    * (within the batch via [[graft.ext.Dedup.nearDupSurvivors]], then
    * against the seen index via
    * [[graft.ext.Dedup.dedupAgainstBands]] over the PERSISTED band
    * table — the daily-crawl workflow: per-batch cost scales with the
    * batch, never the corpus),
    * blocklist + length gates, and an append of the survivors to the
    * curated table.
    *
    * The seen index accumulates ALL exact-dedup survivors — including
    * docs the near-dup stage then drops — because the batch pipeline's
    * pairwise-greedy rule drops the higher id of EVERY verified pair,
    * whether or not the lower side itself survived. With batches
    * arriving in ascending id order this makes the incremental run
    * exactly equal to the one-shot batch pipeline (StreamSpec pins
    * it); out-of-order ids keep first-seen-wins semantics instead.
    *
    * Delivery: the appends are AT-LEAST-ONCE under failure/restart
    * (foreachBatch may replay a batch; parquet append is not
    * transactional) — re-running dedup over `curated` is a fixpoint,
    * so a replayed batch re-drops cleanly downstream, or swap the
    * appends for [[commitBatchOnce]] (epoch-keyed atomic partition
    * commits) or an [[applyChanges]]-style MERGE keyed by doc_id for
    * exactly-once tables.
    */
  def curationSink(docs: DataFrame, dir: String, blocklist: Seq[String],
                   minChars: Long, maxChars: Long, minJaccard: Double,
                   checkpointDir: String, bands: Int = 4,
                   rowsPerBand: Int = 2
                  ): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        curateBatch(batch, dir, blocklist, minChars, maxChars,
          minJaccard, bands, rowsPerBand)
      }
      .start()

  /** One incremental curation step (the foreachBatch body, callable
    * directly for batch backfills). Maintains `dir`/seen.parquet
    * (doc_id, text, content_hash — the exact-dedup index, its text
    * read only for collided docs), `dir`/seen_bands.parquet (the
    * minhash band table, appended per batch so the near-dup index is
    * never recomputed from corpus text), and `dir`/curated.parquet
    * (gated survivors, original columns).
    */
  def curateBatch(batch: DataFrame, dir: String, blocklist: Seq[String],
                  minChars: Long, maxChars: Long, minJaccard: Double,
                  bands: Int = 4, rowsPerBand: Int = 2): Unit = {
    import graft.ext.{Dedup, TextAnalysis}
    val spark = batch.sparkSession
    val hadoop = spark.sparkContext.hadoopConfiguration
    val seenPath = new org.apache.hadoop.fs.Path(s"$dir/seen.parquet")
    val fs = seenPath.getFileSystem(hadoop)
    val seen =
      if (fs.exists(seenPath)) Some(spark.read.parquet(seenPath.toString))
      else None

    // exact dedup: min id per content within the batch, then drop
    // anything whose content the corpus has already seen
    val hashed = Dedup.dropExactDups(batch, "doc_id", "text")
      .withColumn("content_hash", md5(col("text").cast("binary")))
    val exactSurv = seen match {
      case Some(s) => hashed.join(
        s.select(col("content_hash")).distinct(),
        Seq("content_hash"), "left_anti")
      case None => hashed
    }
    // the join/anti-join cascade below references exactSurv repeatedly
    // across two actions (curated + seen appends); localCheckpoint cuts
    // the re-execution and keeps each batch's plan bounded
    val b1 = exactSurv.localCheckpoint()

    // near-dup: pairwise-greedy within the batch, then against the
    // index through its PERSISTED band table (appended below, never
    // recomputed from corpus text) — per-batch cost stays ∝ batch +
    // collisions at any corpus size
    val bandsPath = s"$dir/seen_bands.parquet"
    val withinSurv = Dedup.nearDupSurvivors(b1, "doc_id", "text",
      minJaccard, bands, rowsPerBand)
    val surv = seen match {
      case Some(s) =>
        val dropped = Dedup.dedupAgainstBands(
            spark.read.parquet(bandsPath), s, b1, "doc_id", "text",
            minJaccard, bands, rowsPerBand)
          .select(col("batch_id").as("doc_id")).distinct()
        withinSurv.join(dropped, Seq("doc_id"), "left_anti")
      case None => withinSurv
    }

    val curated = surv
      .filter(TextAnalysis.vocabHits(TextAnalysis.tokens(col("text")),
        blocklist) === 0)
      .filter(col("n_chars") >= minChars && col("n_chars") <= maxChars)
      .drop("content_hash")
    curated.write.mode("append").parquet(s"$dir/curated.parquet")
    Dedup.indexBandTable(b1, "doc_id", "text", bands, rowsPerBand)
      .write.mode("append").parquet(bandsPath)
    b1.select(col("doc_id"), col("text"), col("content_hash"))
      .write.mode("append").parquet(seenPath.toString)
  }

  /** The capstone composition: an exactly-once STREAMING TABLE with
    * snapshot isolation and time travel on plain parquet. Each
    * micro-batch (a) lands atomically via [[commitBatchOnce]] (replays
    * skipped), then (b) refreshes the zone-map manifest incrementally
    * (only the new partition's files are scanned) and commits it as
    * the next manifest version via
    * [[graft.io.ZoneMap.commitManifest]] — so every epoch becomes a
    * pinned, immutable snapshot:
    *
    *   - readers on `ZoneMap.readManifest` see whole epochs or
    *     nothing (reader-atomic versioned store);
    *   - `ZoneMap.scanAsOf(manifest, v)` time-travels to any retained
    *     epoch boundary;
    *   - `ZoneMap.skipScan` prunes by the manifest's zones;
    *   - a crash between data commit and manifest commit self-heals:
    *     the replayed epoch skips the data write (marker exists) and
    *     retries only the manifest refresh, which is incremental and
    *     idempotent (updateManifest scans only files the manifest
    *     lacks).
    *
    * Per-epoch cost: micro-batch write + stats scan of the NEW files
    * only + a |files|-row manifest snapshot write. This is the
    * Delta/Iceberg transaction-log contract assembled from the
    * engine's own parts.
    */
  def exactlyOnceTableSink(stream: DataFrame, tablePath: String,
                           manifestPath: String, zoneCols: Seq[String],
                           checkpointDir: String
                          ): org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        commitTableEpoch(batch, tablePath, manifestPath, zoneCols, id); ()
      }
      .start()

  /** One table epoch (the foreachBatch body, callable directly):
    * data commit (idempotent) + incremental manifest refresh + manifest
    * version commit. Returns the committed manifest version, or None if
    * the epoch was a pure replay (data already committed AND the
    * manifest already covers its files).
    */
  def commitTableEpoch(batch: DataFrame, tablePath: String,
                       manifestPath: String, zoneCols: Seq[String],
                       batchId: Long): Option[Long] = {
    import graft.io.ZoneMap
    val spark = batch.sparkSession
    commitBatchOnce(batch, tablePath, batchId)
    // refresh regardless of whether THIS call wrote the data: a prior
    // attempt may have crashed between data and manifest commits
    val prior =
      ZoneMap.currentManifestVersion(spark, manifestPath)
        .map(_ => ZoneMap.readManifest(spark, manifestPath))
    val refreshed = prior match {
      case Some(m) =>
        val next = ZoneMap.updateManifest(spark, tablePath, m, zoneCols)
        if (next eq m) None else Some(next) // no-op refresh = pure replay
      case None =>
        Some(ZoneMap.buildManifest(spark, tablePath, zoneCols))
    }
    refreshed.map(ZoneMap.commitManifest(_, manifestPath))
  }

  // ---- distribution drift monitoring ----------------------------------

  /** Per-micro-batch PSI drift monitor: each batch's `binCol`
    * distribution is scored against a STATIC reference distribution
    * (`ref`/`refBinCol` — e.g. the training-time score histogram) via
    * [[graft.ext.Eval.psiBins]], and one summary row
    * `(batch_id, n_rows, psi, alarm)` is appended to `outDir` — the
    * production guardrail for a deployed quality classifier: when the
    * live score distribution drifts past `alarmAt` (0.2 is the
    * customary threshold), downstream gating decisions are stale.
    *
    * The reference should be a small aggregated frame (bins, not raw
    * rows) or pre-persisted: it is re-read every micro-batch.
    */
  def driftSink(stream: DataFrame, binCol: org.apache.spark.sql.Column,
                ref: DataFrame, refBinCol: org.apache.spark.sql.Column,
                alarmAt: Double, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        driftBatch(batch, binCol, ref, refBinCol, alarmAt, id)
          .write.mode("append").parquet(outDir)
      }
      .start()

  /** One drift evaluation (the foreachBatch body, callable directly):
    * union the reference (flagged) with the batch, run the smoothed
    * per-bin PSI terms, fold to one `(batch_id, n_rows, psi, alarm)`
    * row. The bin tables are tiny; the only corpus-sized work is the
    * batch's own bin group-by inside psiBins.
    */
  def driftBatch(batch: DataFrame, binCol: org.apache.spark.sql.Column,
                 ref: DataFrame, refBinCol: org.apache.spark.sql.Column,
                 alarmAt: Double, batchId: Long): DataFrame = {
    val union = ref.select(refBinCol.cast("long").as("__bin"))
      .withColumn("__r", lit(true))
      .unionByName(batch.select(binCol.cast("long").as("__bin"))
        .withColumn("__r", lit(false)))
    graft.ext.Eval.psiBins(union, col("__bin"), col("__r"))
      .agg(sum(col("n_cur")).as("n_rows"),
        sum(col("psi_term")).as("psi"))
      .select(lit(batchId).as("batch_id"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"),
        coalesce(col("psi"), lit(0.0)).as("psi"),
        (coalesce(col("psi"), lit(0.0)) > alarmAt).as("alarm"))
  }

  /** Binning-free drift monitor: per micro-batch two-sample
    * Kolmogorov-Smirnov statistic of the live value distribution vs a
    * static reference ([[graft.ext.Eval.ksTest]]) — the complement of
    * [[driftSink]]'s PSI, which needs a bin choice; KS compares raw
    * CDFs, so it also catches within-bin shape shifts PSI smooths
    * away. One `(batch_id, n_ref, n_batch, ks_d, alarm)` row appended
    * per epoch. The value domain may be raw/continuous (ksTest runs
    * on the bucketed two-phase prefix — no data-sized window); the
    * reference is re-read per batch — keep it aggregated or
    * persisted.
    */
  def ksDriftSink(stream: DataFrame, valueCol: String, ref: DataFrame,
                  alarmAt: Double, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        // an empty micro-batch has no distribution to compare: n_b = 0
        // would make ks_d = 0/0 = NaN — skip the write entirely (the
        // textIndexBatch convention)
        if (!batch.isEmpty) {
          ksDriftBatch(batch, valueCol, ref, alarmAt, id)
            .write.mode("append").parquet(outDir)
        }
      }
      .start()

  /** One KS evaluation (the foreachBatch body, callable directly). */
  def ksDriftBatch(batch: DataFrame, valueCol: String, ref: DataFrame,
                   alarmAt: Double, batchId: Long): DataFrame =
    graft.ext.Eval.ksTest(ref, batch, valueCol)
      .select(lit(batchId).as("batch_id"),
        col("n_a").as("n_ref"), col("n_b").as("n_batch"),
        col("ks_d"), (col("ks_d") > alarmAt).as("alarm"))

  /** FOURTH drift leg — earth-mover's distance per micro-batch
    * ([[driftSink]] = binned PSI, [[ksDriftSink]] = worst-point CDF
    * gap, [[chi2DriftSink]] = category mixes; this = mass-transport
    * cost, which weights drift by HOW FAR the distribution moved —
    * a uniform small shift that KS underweights shows up here in
    * value units). `valueCol` must be exact-integer-valued (the
    * [[graft.ext.Eval.emd1d]] contract — pre-scale decimals to
    * cents); `alarmAt` is in those units. Empty batches skip.
    */
  def emdDriftSink(stream: DataFrame, valueCol: String, ref: DataFrame,
                   alarmAt: Double, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          emdDriftBatch(batch, valueCol, ref, alarmAt, id)
            .write.mode("append").parquet(outDir)
        }
      }
      .start()

  /** One EMD evaluation (the foreachBatch body, callable directly). */
  def emdDriftBatch(batch: DataFrame, valueCol: String, ref: DataFrame,
                    alarmAt: Double, batchId: Long): DataFrame =
    graft.ext.Eval.emd1d(ref, batch, valueCol)
      .select(lit(batchId).as("batch_id"),
        col("n_a").as("n_ref"), col("n_b").as("n_batch"),
        col("emd"), (col("emd") > alarmAt).as("alarm"))

  /** CATEGORICAL drift monitor — the third leg of the drift family
    * ([[driftSink]] = binned-numeric PSI, [[ksDriftSink]] =
    * binning-free numeric CDFs; this = category distributions):
    * per micro-batch, the chi-squared independence statistic between
    * "is reference" and the category column
    * ([[graft.ext.Eval.chiSquared]]) — high chi2 ⟺ the live category
    * mix differs from the reference mix. One
    * `(batch_id, n, dof, chi2, alarm)` row per epoch; compare chi2
    * against the χ²_dof critical value for the chosen significance.
    * Empty batches skip (no distribution to compare).
    */
  def chi2DriftSink(stream: DataFrame, catCol: String, ref: DataFrame,
                    refCatCol: String, alarmAt: Double, outDir: String,
                    checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        if (!batch.isEmpty) {
          chi2DriftBatch(batch, catCol, ref, refCatCol, alarmAt, id)
            .write.mode("append").parquet(outDir)
        }
      }
      .start()

  /** One chi-squared drift evaluation (the foreachBatch body). */
  def chi2DriftBatch(batch: DataFrame, catCol: String, ref: DataFrame,
                     refCatCol: String, alarmAt: Double,
                     batchId: Long): DataFrame = {
    val union = ref.select(col(refCatCol).as("__c"))
      .withColumn("__r", lit(true))
      .unionByName(batch.select(col(catCol).as("__c"))
        .withColumn("__r", lit(false)))
    graft.ext.Eval.chiSquared(union, col("__c"), col("__r"))
      .select(lit(batchId).as("batch_id"), col("n"), col("dof"),
        col("chi2"), (col("chi2") > alarmAt).as("alarm"))
  }

  // ---- incremental sketch state (quantiles, DAU/MAU) ------------------

  /** Streaming QUANTILE state maintenance — the stream feed of
    * `x_quantile_rollup`'s persisted sketch table: each micro-batch is
    * partialized to per-key KLL sketches
    * ([[graft.agg.AggState.partializeQuantile]] — O(k) mergeable state,
    * proven rank guarantee) and committed EXACTLY-ONCE under
    * `tablePath/batch_id=<id>` via [[commitBatchOnce]] (marker-rename
    * idempotence: replay = no-op, torn write = invisible). Per-batch
    * cost ∝ batch — history is never re-scanned; any later percentile
    * query over any time range merges the partials at read
    * ([[readQuantileState]]). Empty batches commit nothing.
    */
  def quantileStateSink(stream: DataFrame, keys: Seq[String],
                        valCol: String, tablePath: String,
                        checkpointDir: String, k: Int = 200)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        quantileStateBatch(batch, keys, valCol, tablePath, id, k); ()
      }
      .start()

  /** One quantile-state commit (the foreachBatch body, callable
    * directly); returns whether this call committed the epoch. */
  def quantileStateBatch(batch: DataFrame, keys: Seq[String],
                         valCol: String, tablePath: String,
                         batchId: Long, k: Int = 200): Boolean =
    !batch.isEmpty && commitBatchOnce(
      graft.agg.AggState.partializeQuantile(batch, keys, valCol, k),
      tablePath, batchId)

  /** Read path of the streamed quantile state: merge every committed
    * epoch's partials per key, estimate the requested ranks. Cost ∝
    * |keys| × |epochs| sketch rows — compact epochs with
    * [[graft.agg.AggState.mergeQuantile]] + a rewrite when they
    * accrete.
    */
  def readQuantileState(spark: SparkSession, tablePath: String,
                        keys: Seq[String],
                        ranks: Seq[Double]): DataFrame =
    graft.agg.AggState.finalizedQuantile(
      graft.agg.AggState.mergeQuantile(keys,
        spark.read.parquet(tablePath)), ranks)

  /** Streaming CROSS-MOMENT state maintenance — the stream feed of
    * `x_incr_corr`'s persisted moment table, completing the fourth
    * state tier's batch/stream symmetry (distinct/quantile/stickiness
    * gained sinks in round 8; this is the covariance/correlation
    * tier): each micro-batch is partialized to per-key exact-DECIMAL
    * moment cells ([[graft.agg.AggState.partializeMoments]]) and
    * committed EXACTLY-ONCE under `tablePath/batch_id=<id>` via
    * [[commitBatchOnce]]. Because every cell is an exact sum, the
    * streamed-then-merged state is BIT-IDENTICAL to a one-pass batch
    * aggregate — no estimator caveat like HLL's. Per-batch cost ∝
    * batch; any later correlation matrix over any epoch range merges
    * at read ([[readMomentsState]]). Empty batches commit nothing.
    */
  def momentsStateSink(stream: DataFrame, keys: Seq[String],
                       cols: Seq[String], tablePath: String,
                       checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        momentsStateBatch(batch, keys, cols, tablePath, id); ()
      }
      .start()

  /** One moment-state commit (the foreachBatch body, callable
    * directly); returns whether this call committed the epoch. */
  def momentsStateBatch(batch: DataFrame, keys: Seq[String],
                        cols: Seq[String], tablePath: String,
                        batchId: Long): Boolean =
    !batch.isEmpty && commitBatchOnce(
      graft.agg.AggState.partializeMoments(batch, keys, cols),
      tablePath, batchId)

  /** Read path of the streamed moment state: merge every committed
    * epoch's cells per key (exact DECIMAL sums — lossless under any
    * epoch split) and unfold the long-format correlation matrix.
    */
  def readMomentsState(spark: SparkSession, tablePath: String,
                       keys: Seq[String], cols: Seq[String]): DataFrame =
    graft.agg.AggState.finalizedCorr(
      graft.agg.AggState.mergeMoments(keys,
        spark.read.parquet(tablePath)), cols)

  /** Streaming DAU/MAU state — the stream feed of
    * `x_stickiness_sketch`'s per-day HLL table: each micro-batch
    * reduces to one HLL partial per active day (KB sketches — user ids
    * never persist), committed exactly-once per epoch. A day spanning
    * many epochs simply owns several partials; HLL union preserves the
    * lgK accuracy guarantee, so the read path ([[readStickiness]])
    * carries the same bound as sketching the full history in one pass.
    * (NOT bit-identical: a unioned sketch answers with the composite
    * estimator where a directly-built one may use HIP, so estimates
    * can differ by a hair — StreamSpec pins both paths inside the
    * bound and within 2% of each other.)
    */
  def stickinessStateSink(events: DataFrame, userCol: String,
                          dayCol: String, tablePath: String,
                          checkpointDir: String, lgK: Int = 12)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        stickinessStateBatch(batch, userCol, dayCol, tablePath, id, lgK)
        ()
      }
      .start()

  /** One DAU-state commit (the foreachBatch body, callable directly). */
  def stickinessStateBatch(batch: DataFrame, userCol: String,
                           dayCol: String, tablePath: String,
                           batchId: Long, lgK: Int = 12): Boolean =
    !batch.isEmpty && commitBatchOnce(
      batch.groupBy(col(dayCol).as("day"))
        .agg(hll_sketch_agg(col(userCol), lit(lgK)).as("s_hll")),
      tablePath, batchId)

  /** Streaming feed of the SPRT walk (`x_sprt`'s batch form): each
    * micro-batch reduces to one (variant, n, n_conv) partial row per
    * variant, committed exactly-once under `batch_id=<id>` — counts
    * merge additively, so replay-safety comes entirely from the
    * epoch-keyed commit, and the walk itself is DERIVED at read
    * ([[readSprt]]) rather than stored: no read-modify-write state,
    * nothing to corrupt on restart.
    */
  def sprtStateSink(events: DataFrame, variantCol: String,
                    convCol: Column, tablePath: String,
                    checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        sprtStateBatch(batch, variantCol, convCol, tablePath, id); ()
      }
      .start()

  /** One SPRT-state commit (the foreachBatch body, callable directly). */
  def sprtStateBatch(batch: DataFrame, variantCol: String,
                     convCol: Column, tablePath: String,
                     batchId: Long): Boolean =
    !batch.isEmpty && commitBatchOnce(
      batch.groupBy(col(variantCol).as("variant"))
        .agg(count(lit(1)).as("n"),
          sum(convCol.cast("long")).as("n_conv")),
      tablePath, batchId)

  /** The SPRT decision walk over the streamed state: cumulative LLR
    * per variant across committed epochs (windows PARTITIONED BY
    * variant over the bounded epoch axis), thresholds from (α, β),
    * sticky first-crossing — identical math to `x_sprt`'s batch form,
    * with epochs standing in for days. ln terms are in-plan
    * `round(log(..), 9)` literals (the PMI convention).
    */
  def readSprt(spark: SparkSession, tablePath: String,
               p0: Double, p1: Double, alpha: Double,
               beta: Double): DataFrame = {
    require(p0 > 0 && p0 < 1 && p1 > 0 && p1 < 1 && p0 != p1,
      s"need distinct p0, p1 in (0,1); got $p0, $p1")
    val l1 = round(log(lit(p1) / lit(p0)), 9)
    val l0 = round(log(lit(1.0 - p1) / lit(1.0 - p0)), 9)
    val ub = round(log(lit(1.0 - beta) / lit(alpha)), 9)
    val lb = round(log(lit(beta) / lit(1.0 - alpha)), 9)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("variant")).orderBy(col("batch_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, org.apache.spark.sql.expressions.Window
        .currentRow)
    val byVariant = org.apache.spark.sql.expressions.Window
      .partitionBy(col("variant"))
    spark.read.parquet(tablePath)
      // partition discovery infers batch_id as int; pin the contract
      .withColumn("batch_id", col("batch_id").cast("long"))
      .withColumn("cum_n", sum(col("n")).over(w))
      .withColumn("cum_conv", sum(col("n_conv")).over(w))
      .withColumn("llr", round(col("cum_conv") * l1 +
        (col("cum_n") - col("cum_conv")) * l0, 6))
      .withColumn("decision",
        when(col("llr") >= ub, "accept_h1")
          .when(col("llr") <= lb, "accept_h0")
          .otherwise("continue"))
      .withColumn("stop_epoch",
        min(when(col("decision") =!= "continue", col("batch_id")))
          .over(byVariant))
      .withColumn("stopped", col("stop_epoch").isNotNull &&
        col("batch_id") >= col("stop_epoch"))
      .select(col("variant"), col("batch_id"), col("n"), col("n_conv"),
        col("cum_n"), col("cum_conv"), col("llr"), col("decision"),
        col("stopped"))
      .orderBy(col("variant"), col("batch_id"))
  }

  /** DAU/MAU stickiness over the streamed per-day sketch table: union
    * each day's epoch partials, then union each trailing-`window`
    * span — |days|-scale work on KB sketches, the at-scale form of the
    * exact `x_stickiness` explode (estimates, lgK=12 ≈ 1.6% rsd).
    */
  def readStickiness(spark: SparkSession, tablePath: String,
                     window: Int = 30): DataFrame = {
    val perDay = spark.read.parquet(tablePath)
      .groupBy(col("day"))
      .agg(hll_union_agg(col("s_hll"), lit(false)).as("sk"))
      .localCheckpoint(false) // read by the dau leg and the window leg
    val dau = perDay.select(col("day"),
      hll_sketch_estimate(col("sk")).as("dau_est"))
    val mau = perDay.select(col("sk"),
        explode(sequence(col("day"), col("day") + (window - 1)))
          .as("day"))
      .groupBy(col("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
        .as("mau_est"))
    dau.join(mau, Seq("day"))
      .select(col("day"), col("dau_est"), col("mau_est"),
        (col("dau_est").cast("double") / col("mau_est").cast("double"))
          .as("stickiness_est"))
      .orderBy(col("day"))
  }

  // ---- custom state: streaming heavy hitters --------------------------

  case class HeavyHit(bucket: Int, key: String, minCount: Long,
                      bucketN: Long)

  case class MGState(counters: Map[String, Long], n: Long)

  /** Streaming Misra-Gries: maintain a k-counter frequent-items summary
    * per hash bucket of the key space, emitting each bucket's current
    * candidates every micro-batch (Update mode). The streaming twin of
    * `graft.agg.HeavyHitters`: any key whose GLOBAL frequency exceeds
    * N/(k+1) is guaranteed present (its whole count lives in one
    * bucket, and bucketN ≤ N only tightens the local threshold), counts
    * are lower bounds, and the exactness pass — count only the
    * candidates — is the same downstream batch verify. State is bounded
    * by `buckets × k` counters TOTAL regardless of stream length or key
    * cardinality; state-store partitioning follows the bucket key.
    */
  def heavyHittersStream(keys: Dataset[String], k: Int,
                         buckets: Int = 32): Dataset[HeavyHit] = {
    import keys.sparkSession.implicits._
    keys
      .groupByKey(s => math.floorMod(s.hashCode, buckets))
      .flatMapGroupsWithState[MGState, HeavyHit](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (bucket: Int, rows: Iterator[String], state: GroupState[MGState]) =>
          var counters = state.getOption
            .map(s => collection.mutable.HashMap.from(s.counters))
            .getOrElse(collection.mutable.HashMap.empty[String, Long])
          var n = state.getOption.map(_.n).getOrElse(0L)
          rows.foreach { x =>
            n += 1
            counters.get(x) match {
              case Some(c) => counters.update(x, c + 1)
              case None if counters.size < k => counters.update(x, 1L)
              case None =>
                val dead = List.newBuilder[String]
                counters.foreach { case (key, c) =>
                  if (c == 1L) dead += key else counters.update(key, c - 1)
                }
                dead.result().foreach(counters.remove)
            }
          }
          state.update(MGState(counters.toMap, n))
          counters.iterator.map { case (key, c) =>
            HeavyHit(bucket, key, c, n)
          }
      }
  }

  // ---- custom state: flatMapGroupsWithState sessionization ------------

  case class Event(ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(start: Long, lastSec: Long, n: Long, total: Double)
  case class SessionOut(user_id: Long, session_start: Long,
                        session_end: Long, n_events: Long)

  /** Custom sessionization with explicit state: emits a session row when
    * a `gapSec` silence closes it. The open (tail) session is held in
    * state and emitted by a processing-time timeout once the user has
    * been silent for `gapSec` of processing time (streaming runs only:
    * batch execution never fires timeouts, so a one-shot batch leaves
    * each user's final open session unemitted — the batch oracle query
    * `x_events_sessions` is the complete-count reference). Kept as the
    * template for session logic Spark's built-in `session_window` can't
    * express (caps on session length, early emission, custom merge).
    */
  def sessionizeWithState(events: Dataset[Event],
                          gapSec: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            // silence elapsed: close and emit every open session
            val open = state.getOption.getOrElse(Nil)
              .map(s => SessionOut(user, s.start, s.lastSec, s.n))
            state.remove()
            open.iterator
          } else {
            // batch-friendly: rows arrive unordered; sort this chunk.
            val secs = rows.map(e => e.ts.getTime / 1000).toSeq.sorted
            var sessions = state.getOption.getOrElse(Nil)
            val closed = List.newBuilder[SessionOut]
            secs.foreach { s =>
              sessions match {
                // same merge envelope as SessionProcessor: don't let a
                // cross-batch out-of-order event regress lastSec
                case cur :: rest if s >= cur.start - gapSec &&
                    s <= cur.lastSec + gapSec =>
                  sessions = cur.copy(start = math.min(cur.start, s),
                    lastSec = math.max(cur.lastSec, s),
                    n = cur.n + 1) :: rest
                case cur :: rest if s > cur.lastSec + gapSec =>
                  closed += SessionOut(user, cur.start, cur.lastSec, cur.n)
                  sessions = SessionState(s, s, 1, 0.0) :: rest
                case _ :: _ =>
                  closed += SessionOut(user, s, s, 1)
                case Nil =>
                  sessions = SessionState(s, s, 1, 0.0) :: Nil
              }
            }
            state.update(sessions)
            state.setTimeoutDuration(gapSec * 1000)
            closed.result().iterator
          }
      }
  }

  // ---- custom state: transformWithState sessionization (Spark 4 API) --

  /** Event-time sessionizer on the `transformWithState` arbitrary-state
    * API (the successor to [flat]mapGroupsWithState): typed ValueState
    * holds the user's OPEN sessions (plural — see below), an EVENT-TIME
    * timer registered at the earliest lastEvent + gap closes sessions
    * when the watermark passes them — so closed sessions emit
    * deterministically with event time, not wall-clock silence (the
    * flatMapGroupsWithState version above can only use processing-time
    * timeouts for this). Requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass` =
    * `...state.RocksDBStateStoreProvider`) — the only backend
    * transformWithState supports in OSS Spark.
    *
    * Out-of-order contract (== built-in `session_window`): an event
    * merges into any open session whose gap envelope
    * [start-gap, lastSec+gap] covers it — extending start backwards
    * and never regressing lastSec — and may BRIDGE two open sessions
    * into one; otherwise it opens its own session. Sessions close only
    * when the WATERMARK passes lastSec + gap, never eagerly on the
    * arrival of a newer event — an eager close would lose merges with
    * late-but-within-watermark events from later micro-batches.
    *
    * State per key is the list of open sessions + one timer. The list
    * is bounded by the watermark horizon (a session older than the
    * watermark by more than the gap has already been emitted), so
    * state stays proportional to users active within the delay window,
    * the 100 TB contract for streaming state.
    */
  class SessionProcessor(gapSec: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, SessionOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
      TimeMode, TimerValues, TTLConfig}
    import org.apache.spark.sql.Encoders

    @transient private var sessions: ListState[SessionState] = _

    override def init(outputMode: OutputMode,
                      timeMode: TimeMode): Unit =
      sessions = getHandle.getListState[SessionState]("sessions",
        Encoders.product[SessionState], TTLConfig.NONE)

    /** Converge the key's timers to the one wanted expiry. Deleting
      * only the STALE timers (and never the just-expired one, which
      * the engine already consumed — `skip`) keeps the common
      * no-change case free of state-store writes and the expiry path
      * free of per-key "timer does not exist" WARN spam, which at
      * replica scale was one log line per key per batch. */
    private def rearm(open: List[SessionState], skip: Long = -1L): Unit = {
      val want: Option[Long] =
        if (open.nonEmpty) Some((open.map(_.lastSec).min + gapSec) * 1000 + 1)
        else None
      val have = getHandle.listTimers().map(_.asInstanceOf[Long]).toSet
      have.filterNot(t => want.contains(t) || t == skip)
        .foreach(getHandle.deleteTimer)
      want.filterNot(have.contains).foreach(getHandle.registerTimer)
    }

    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[SessionOut] = {
      var open = sessions.get().toList
      rows.foreach { e =>
        val s = e.ts.getTime / 1000
        val (hit, rest) = open.partition(c =>
          s >= c.start - gapSec && s <= c.lastSec + gapSec)
        val merged = SessionState(
          (s :: hit.map(_.start)).min,
          (s :: hit.map(_.lastSec)).max,
          hit.map(_.n).sum + 1, 0.0)
        open = merged :: rest
      }
      sessions.clear()
      sessions.put(open.toArray)
      rearm(open)
      Iterator.empty
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionOut] = {
      // emit every session the watermark has passed; keep the rest and
      // re-arm for the earliest remaining close (ms comparison: the
      // timer fires at (lastSec+gap)*1000+1, i.e. once the watermark
      // is strictly past the close instant)
      val wm = tv.getCurrentWatermarkInMs()
      val open = sessions.get().toList
      val (due, keep) = open.partition(c =>
        (c.lastSec + gapSec) * 1000 < wm)
      sessions.clear()
      if (keep.nonEmpty) sessions.put(keep.toArray)
      rearm(keep, skip = info.getExpiryTimeInMs())
      due.sortBy(_.start)
        .map(c => SessionOut(user, c.start, c.lastSec, c.n)).iterator
    }
  }

  /** [[SessionProcessor]] wired to a watermarked event stream. The
    * `watermarkDelay` bounds late data; sessions close when the
    * watermark passes lastEvent + gap.
    */
  def sessionizeTws(events: Dataset[Event], gapSec: Long = 1800,
                    watermarkDelay: String = "10 seconds"
                   ): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapSec),
        TimeMode.EventTime(), OutputMode.Append())
  }

  // ---- custom state: streaming funnel (CEP-lite) ----------------------

  case class FunnelState(stage: Int, stageSec: Long, startSec: Long)
  case class Conversion(user_id: Long, start_sec: Long, end_sec: Long,
                        n_stages: Int)

  /** Streaming ordered-funnel detector — the incremental counterpart of
    * `Behavior.funnel`: per user, advance a stage cursor when the next
    * step's event type arrives within `maxGapSec` of the previous
    * stage; emit a [[Conversion]] row the moment the final stage
    * completes, then reset. A stage that times out resets the cursor to
    * whatever the current event can start (an occurrence of step 0).
    *
    * State per user is ONE fixed-size cursor struct plus one
    * EVENT-TIME cleanup timer at stageTime + gap: when the watermark
    * passes it, the abandoned cursor is dropped — state is bounded by
    * users active within the gap, not all users ever seen. (A TTL +
    * processing-time variant busy-loops empty micro-batches against
    * the RocksDB checkpointer; event-time timers only do work when
    * data moves the watermark.) Events within a micro-batch are
    * processed in event-time order (sorted per key); cross-batch order
    * is the stream's own arrival order — the deliberate CEP contract
    * (a conversion emits the moment its final stage ARRIVES, latency
    * zero), distinct from [[CusumProcessor]], whose numeric recurrence
    * is wrong under disorder and therefore buffers within the
    * watermark at the cost of watermark-delay output latency.
    * [[OrderedFunnelProcessor]] is this recurrence behind that buffer —
    * pick it when batch-`Behavior.funnel` parity under disorder is the
    * contract; the matching semantics here make arrival order a
    * coherent, spec-pinned alternative (conversion latency zero).
    */
  class FunnelProcessor(steps: Seq[String], maxGapSec: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, Conversion] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimeMode,
      TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var cursor: ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cursor = getHandle.getValueState[FunnelState]("cursor",
        Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[Conversion] = {
      val out = List.newBuilder[Conversion]
      rows.toArray.sortBy(e => e.ts.getTime).foreach { e =>
        val sec = e.ts.getTime / 1000
        val cur = if (cursor.exists()) Option(cursor.get()) else None
        val next = cur match {
          case Some(c) if e.event_type == steps(c.stage) &&
              sec - c.stageSec <= maxGapSec =>
            Some(FunnelState(c.stage + 1, sec, c.startSec))
          case Some(c) if sec - c.stageSec <= maxGapSec =>
            // in-flight cursor: unrelated events AND step-0 re-occurrences
            // are ignored — earliest-chain semantics, matching
            // Behavior.funnel / the x_funnel oracle
            Some(c)
          case _ if e.event_type == steps.head =>
            Some(FunnelState(1, sec, sec)) // no cursor or stale: (re)start
          case other => other // unrelated event, stale or no cursor
        }
        next match {
          case Some(c) if c.stage == steps.length =>
            out += Conversion(user, c.startSec, sec, steps.length)
            cursor.clear()
          case Some(c) => cursor.update(c)
          case None => ()
        }
      }
      // re-arm the cleanup timer for whatever cursor remains —
      // converging to the wanted expiry (the SessionProcessor.rearm
      // discipline) instead of delete-all-then-register
      val want: Option[Long] =
        if (cursor.exists())
          Some((cursor.get().stageSec + maxGapSec) * 1000 + 1)
        else None
      val have = getHandle.listTimers().map(_.asInstanceOf[Long]).toSet
      have.filterNot(want.contains).foreach(getHandle.deleteTimer)
      want.filterNot(have.contains).foreach(getHandle.registerTimer)
      out.result().iterator
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Conversion] = {
      cursor.clear() // abandoned funnel: drop the cursor, emit nothing
      Iterator.empty
    }
  }

  /** [[FunnelProcessor]] over a watermarked stream (event-time mode;
    * the watermark drives both lateness and state cleanup).
    */
  def funnelStream(events: Dataset[Event], steps: Seq[String],
                   maxGapSec: Long = 86400,
                   watermarkDelay: String = "10 seconds"
                  ): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new FunnelProcessor(steps, maxGapSec),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** TIME-ORDERED streaming funnel — [[FunnelProcessor]]'s stage
    * recurrence behind the [[CusumProcessor]] buffer-within-watermark
    * release: events are held until the watermark is strictly past
    * them, then stepped through the cursor in (time, type) order, so
    * the stream equals the time-ordered batch funnel for ANY arrival
    * order the watermark covers — a late-arriving EARLIER stage
    * retro-inserts and can complete (or restart) a chain the
    * arrival-order CEP variant would score differently. The price is
    * the same as cusumStream's: a conversion emits only once the
    * watermark passes its final stage (watermark-delay latency, vs the
    * CEP variant's zero), and per-key state grows by the events inside
    * the delay horizon.
    *
    * Use [[funnelStream]] when "the final stage ARRIVED" is the
    * trigger semantics (CEP, latency zero); use this when parity with
    * the batch funnel under disorder is the contract.
    */
  class OrderedFunnelProcessor(steps: Seq[String], maxGapSec: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, Conversion] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
      TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var cursor: ValueState[FunnelState] = _
    @transient private var buf: ListState[Event] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      cursor = getHandle.getValueState[FunnelState]("cursor",
        Encoders.product[FunnelState], TTLConfig.NONE)
      buf = getHandle.getListState[Event]("buffer",
        Encoders.product[Event], TTLConfig.NONE)
    }

    /** One wanted timer: the earliest pending event's release, else the
      * surviving cursor's gap horizon (to drop abandoned state), else
      * none — converged with the rearm discipline. */
    private def rearm(pending: Seq[Event], skip: Long = -1L): Unit = {
      val want: Option[Long] =
        if (pending.nonEmpty) Some(pending.map(_.ts.getTime).min + 1)
        else if (cursor.exists())
          Some((cursor.get().stageSec + maxGapSec) * 1000 + 1)
        else None
      val have = getHandle.listTimers().map(_.asInstanceOf[Long]).toSet
      have.filterNot(t => want.contains(t) || t == skip)
        .foreach(getHandle.deleteTimer)
      want.filterNot(have.contains).foreach(getHandle.registerTimer)
    }

    /** Release watermark-passed events in (time, type) order through
      * the SAME cursor recurrence as [[FunnelProcessor]]. */
    private def flush(user: Long, wm: Long,
                      skipTimer: Long = -1L): Iterator[Conversion] = {
      val (due, keep) = buf.get().toList.partition(_.ts.getTime < wm)
      val out = List.newBuilder[Conversion]
      due.sortBy(e => (e.ts.getTime, e.event_type)).foreach { e =>
        val sec = e.ts.getTime / 1000
        val cur = if (cursor.exists()) Option(cursor.get()) else None
        val next = cur match {
          case Some(c) if e.event_type == steps(c.stage) &&
              sec - c.stageSec <= maxGapSec =>
            Some(FunnelState(c.stage + 1, sec, c.startSec))
          case Some(c) if sec - c.stageSec <= maxGapSec => Some(c)
          case _ if e.event_type == steps.head =>
            Some(FunnelState(1, sec, sec))
          case other => other
        }
        next match {
          case Some(c) if c.stage == steps.length =>
            out += Conversion(user, c.startSec, sec, steps.length)
            cursor.clear()
          case Some(c) => cursor.update(c)
          case None => ()
        }
      }
      // an abandoned cursor whose gap horizon the watermark has passed
      // can never advance again (every future release is later than
      // stageSec + gap) — drop it so state stays bounded by live chains
      if (keep.isEmpty && cursor.exists() &&
          (cursor.get().stageSec + maxGapSec) * 1000 < wm)
        cursor.clear()
      buf.clear()
      if (keep.nonEmpty) buf.put(keep.toArray)
      rearm(keep, skip = skipTimer)
      out.result().iterator
    }

    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[Conversion] = {
      rows.foreach(buf.appendValue)
      flush(user, tv.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[Conversion] =
      flush(user, tv.getCurrentWatermarkInMs(),
        skipTimer = info.getExpiryTimeInMs())
  }

  /** [[OrderedFunnelProcessor]] over a watermarked stream —
    * batch-funnel parity under disorder; output delayed by the
    * watermark (drive it forward to drain the tail).
    */
  def funnelStreamOrdered(events: Dataset[Event], steps: Seq[String],
                          maxGapSec: Long = 86400,
                          watermarkDelay: String = "10 seconds"
                         ): Dataset[Conversion] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new OrderedFunnelProcessor(steps, maxGapSec),
        TimeMode.EventTime(), OutputMode.Append())
  }

  // ---- custom state: MapState heavy hitters (transformWithState) ------

  /** Misra-Gries heavy hitters on `transformWithState` with MAP state —
    * the scale-correct storage for per-bucket counter sets: an
    * increment is a point get+put of ONE RocksDB entry, where the
    * [[heavyHittersStream]] (flatMapGroupsWithState) version must
    * deserialize, mutate, and rewrite its entire k-counter map every
    * micro-batch. The O(k) full-map sweep runs only on the
    * Misra-Gries eviction path (a new key arriving with all k counter
    * slots taken); the common hot-key hit touches one entry. Same
    * deterministic guarantee as the agg/HeavyHitters batch operator:
    * any key with global frequency > n/(k+1) survives in some bucket.
    */
  class TopKProcessor(k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Int, String, HeavyHit] {
    import org.apache.spark.sql.streaming.{MapState, TimeMode,
      TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var counters: MapState[String, Long] = _
    @transient private var total: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[String, Long]("counters",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
      total = getHandle.getValueState[Long]("n",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(bucket: Int, rows: Iterator[String],
        tv: TimerValues): Iterator[HeavyHit] = {
      var n = if (total.exists()) total.get() else 0L
      // size tracked locally per batch; k is small (counter set fits)
      var size = counters.keys().size
      rows.foreach { x =>
        n += 1
        if (counters.containsKey(x)) {
          counters.updateValue(x, counters.getValue(x) + 1)
        } else if (size < k) {
          counters.updateValue(x, 1L)
          size += 1
        } else {
          // eviction sweep: decrement all, drop zeros (O(k), rare).
          // Materialize entries first — mutating a RocksDB-backed
          // MapState while iterating its WriteBatchWithIndex view is
          // provider-implementation-dependent; k is small, copy is free
          val entries = counters.iterator().toArray
          entries.foreach { case (key, c) =>
            if (c == 1L) { counters.removeKey(key); size -= 1 }
            else counters.updateValue(key, c - 1)
          }
        }
      }
      total.update(n)
      counters.iterator().map { case (key, c) =>
        HeavyHit(bucket, key, c, n)
      }
    }
  }

  /** [[TopKProcessor]] over a bucketed key stream. TimeMode.None — no
    * timers, no TTL: counters live for the stream's lifetime by design
    * (they summarize the whole history), and a time-driven mode would
    * have the micro-batch engine scheduling empty batches just to
    * advance the clock (measured as a busy-loop against the RocksDB
    * checkpointer — the FunnelProcessor lesson).
    */
  def heavyHittersTws(keys: Dataset[String], k: Int,
                      buckets: Int = 32): Dataset[HeavyHit] = {
    import keys.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    keys
      .groupByKey(s => math.floorMod(s.hashCode, buckets))
      .transformWithState(new TopKProcessor(k),
        TimeMode.None(), OutputMode.Update())
  }

  // ---- custom state: streaming CUSUM drift detection ------------------

  case class CusumState(sp: Double, sn: Double)
  case class CusumOut(user_id: Long, sec: Long, value: Double,
                      cusum_pos: Double, cusum_neg: Double, alarm: Boolean)

  /** Streaming CUSUM (`graft.ext.Forecast.cusum`'s recurrence carried
    * ACROSS micro-batches): per-key (S⁺, S⁻) in a ValueState, events
    * BUFFERED until the watermark passes them, then stepped through the
    * recurrence in (time, value) order — the [[SessionProcessor]]
    * buffer-within-watermark pattern applied to an order-dependent
    * recurrence (round-10 verdict task #4; rounds ≤10 pinned an
    * arrival-order contract instead). Emits one row per event (Append),
    * delayed by the watermark.
    *
    * Ordering contract: equals the time-ordered batch operator for ANY
    * arrival order whose lateness the watermark covers. An event is
    * released only once the watermark is strictly past its timestamp,
    * at which point (a) every earlier event already flushed sits before
    * it in the recurrence and (b) no earlier event can still arrive
    * (later ones are dropped by the engine's late-row filter) — so the
    * recurrence consumes a totally ordered stream. State per key is
    * (S⁺, S⁻) plus the events inside the watermark horizon + one
    * timer — bounded by the delay window, the 100 TB contract.
    */
  class CusumProcessor(target: Double, slack: Double, threshold: Double)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, CusumOut] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState,
      TimeMode, TimerValues, TTLConfig, ValueState}
    import org.apache.spark.sql.Encoders

    @transient private var st: ValueState[CusumState] = _
    @transient private var buf: ListState[Event] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      st = getHandle.getValueState[CusumState]("cusum",
        Encoders.product[CusumState], TTLConfig.NONE)
      buf = getHandle.getListState[Event]("buffer",
        Encoders.product[Event], TTLConfig.NONE)
    }

    /** Converge to the one wanted timer (fires once the watermark is
      * strictly past the earliest pending event); delete only STALE
      * timers and never the just-expired one (`skip`) — the
      * SessionProcessor.rearm discipline, which keeps the no-change
      * case write-free and the logs clean of per-key delete WARNs. */
    private def rearm(pending: Seq[Event], skip: Long = -1L): Unit = {
      val want: Option[Long] =
        if (pending.nonEmpty) Some(pending.map(_.ts.getTime).min + 1)
        else None
      val have = getHandle.listTimers().map(_.asInstanceOf[Long]).toSet
      have.filterNot(t => want.contains(t) || t == skip)
        .foreach(getHandle.deleteTimer)
      want.filterNot(have.contains).foreach(getHandle.registerTimer)
    }

    /** Release every buffered event the watermark has passed, in
      * (time, value) order, through the recurrence; keep the rest. */
    private def flush(user: Long, wm: Long,
                      skipTimer: Long = -1L): Iterator[CusumOut] = {
      val (due, keep) = buf.get().toList.partition(_.ts.getTime < wm)
      var cur = if (st.exists()) st.get() else CusumState(0.0, 0.0)
      val out = due.sortBy(e => (e.ts.getTime, e.value)).map { e =>
        val x = e.value
        val sp = math.max(0.0, cur.sp + (x - target - slack))
        val sn = math.max(0.0, cur.sn + (target - x - slack))
        cur = CusumState(sp, sn)
        CusumOut(user, e.ts.getTime / 1000, x, sp, sn,
          sp > threshold || sn > threshold)
      }
      st.update(cur)
      buf.clear()
      if (keep.nonEmpty) buf.put(keep.toArray)
      rearm(keep, skip = skipTimer)
      out.iterator
    }

    override def handleInputRows(user: Long, rows: Iterator[Event],
        tv: TimerValues): Iterator[CusumOut] = {
      rows.foreach(buf.appendValue)
      // opportunistic flush against the batch's watermark; the timer
      // covers keys that receive no further input
      flush(user, tv.getCurrentWatermarkInMs())
    }

    override def handleExpiredTimer(user: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[CusumOut] =
      flush(user, tv.getCurrentWatermarkInMs(),
        skipTimer = info.getExpiryTimeInMs())
  }

  /** Wire [[CusumProcessor]] over a stream of [[Event]]s keyed by user.
    * `watermarkDelay` is the disorder tolerance: events later than it
    * are dropped by the engine; everything inside it lands in exact
    * time order. Output for an event appears once the watermark passes
    * its timestamp (drive the watermark forward to drain the tail). */
  def cusumStream(events: Dataset[Event], target: Double, slack: Double,
                  threshold: Double,
                  watermarkDelay: String = "10 seconds"
                 ): Dataset[CusumOut] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new CusumProcessor(target, slack, threshold),
        TimeMode.EventTime(), OutputMode.Append())
  }

  // ---- live inverted text index ---------------------------------------

  /** LIVE search index: each micro-batch of documents lands as one
    * committed segment of the bucket-partitioned inverted index
    * ([[graft.ext.Retrieval.saveTextIndex]] layout), exactly once —
    * the segment id is the epoch (`segBase + batch_id`), and
    * [[graft.ext.Retrieval.appendTextIndexAs]] makes a replayed epoch
    * a no-op while readers only ever resolve committed segments, so
    * queries racing the stream see each batch atomically or not at
    * all. Per-batch cost ∝ the batch (one scan → postings/dfreq/
    * doclen/stats for that segment alone).
    *
    * `segBase` keeps streaming epochs disjoint from backfill segment
    * ids (a backfilled corpus occupies small integers); it must stay
    * constant across restarts — the checkpoint replays the same
    * batch ids, and idempotence is keyed on `segBase + batch_id`.
    * Segment count grows with epochs; compact by periodic rebuild
    * (the Lucene merge trade) when p99 query fan-out matters.
    */
  def textIndexSink(docs: DataFrame, idCol: String, textCol: String,
                    indexDir: String, checkpointDir: String,
                    nBuckets: Int = 64, segBase: Long = 1000000L
                   ): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        textIndexBatch(batch, idCol, textCol, indexDir, nBuckets,
          segBase + id)
      }
      .start()

  /** One index-maintenance step (the foreachBatch body, callable
    * directly): append the batch as committed segment `seg`, skipping
    * entirely if that segment already committed (replay). */
  def textIndexBatch(batch: DataFrame, idCol: String, textCol: String,
                     indexDir: String, nBuckets: Int, seg: Long): Unit =
    if (!batch.isEmpty)
      graft.ext.Retrieval.appendTextIndexAs(batch, idCol, textCol,
        indexDir, nBuckets, seg)

  // ---- live IVF vector index -------------------------------------------

  /** LIVE ANN index — [[textIndexSink]]'s twin for vectors: each
    * micro-batch of embeddings lands as one committed segment of the
    * segmented IVF index ([[graft.ext.Similarity.initIvfIndex]]
    * layout), exactly once: the segment id is the epoch
    * (`segBase + batch_id`) and
    * [[graft.ext.Similarity.appendIvfIndexAs]] makes a replayed epoch
    * a no-op while readers resolve only committed segments — a query
    * racing the stream sees each batch atomically or not at all.
    * Per-batch cost ∝ the batch (one assignment scan against the
    * broadcast centroid model → one cell-partitioned segment write).
    *
    * Requires `initIvfIndex` to have seeded the index (the centroid
    * model is FIXED at init — appends must assign with the same cells
    * or probes would miss vectors). `segBase` keeps streaming epochs
    * disjoint from backfill segment ids and must stay constant across
    * restarts (idempotence is keyed on it). Compact with
    * `compactIvfIndex` when query-side segment fan-out matters.
    */
  def ivfIndexSink(vectors: DataFrame, idCol: String, vecCol: String,
                   indexDir: String, checkpointDir: String,
                   segBase: Long = 1000000L
                  ): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        ivfIndexBatch(batch, idCol, vecCol, indexDir, segBase + id)
      }
      .start()

  /** One vector-index step (the foreachBatch body, callable directly):
    * append the batch as committed segment `seg`; a replayed epoch
    * indexes nothing twice. */
  def ivfIndexBatch(batch: DataFrame, idCol: String, vecCol: String,
                    indexDir: String, seg: Long): Unit =
    if (!batch.isEmpty)
      graft.ext.Similarity.appendIvfIndexAs(batch, idCol, vecCol,
        indexDir, seg)
}
