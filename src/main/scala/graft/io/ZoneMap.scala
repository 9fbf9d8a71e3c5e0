package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zone maps — file-level min/max statistics and the pruned scan that
  * consumes them: the data-skipping layer every lakehouse format
  * (Delta, Iceberg, Hudi) builds over parquet, implemented here with
  * nothing but public Spark APIs. Pairs with [[graft.ops.ZOrder]]: the
  * z-ordered layout is what makes BOTH dimensions' min/max ranges
  * tight per file, and this module is what turns those tight ranges
  * into files never opened.
  *
  * Scale model (the 100 TB contract):
  *  - The manifest is |files| rows — at 100 TB / 128 MB files that is
  *    ~800 k rows, kilobytes per row: driver-collectable by design,
  *    exactly like a Delta transaction log snapshot.
  *  - [[buildManifest]] scans once; production appends one manifest row
  *    per file AT WRITE TIME instead (the stats come from the same
  *    task that wrote the file). The one-scan builder is the backfill
  *    path for pre-existing tables.
  *  - [[skipScan]] prunes BEFORE the scan is planned: the non-matching
  *    files never appear in the FileScan at all (vs parquet row-group
  *    pruning, which still opens every footer — at 800 k files that is
  *    800 k round-trips to object storage that never happen).
  */
object ZoneMap {

  /** Per-file zone statistics for `cols` over the parquet table at
    * `path`: one manifest row per physical file with row count and each
    * column's min / max / null count. One full scan, partial-aggregated
    * by `input_file_name` — no shuffle wider than |files| rows.
    */
  def buildManifest(spark: SparkSession, path: String,
                    cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to map")
    val df = spark.read.parquet(path)
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"))
    }
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** Files whose [min, max] zone for `colName` intersects [lo, hi] —
    * the candidate set a range predicate must read. A file is skipped
    * only when its zone PROVES no row matches (max < lo or min > hi);
    * all-null zones (min/max null) are always kept — the row-level
    * re-filter in [[skipScan]] discards their rows, so conservatism
    * costs IO, never correctness.
    * Driver-side O(|files|), the manifest's design point.
    */
  def prunedFiles(manifest: DataFrame, colName: String,
                  lo: Any, hi: Any): Seq[String] = {
    val mn = col(s"${colName}__min")
    val mx = col(s"${colName}__max")
    manifest
      .filter(mn.isNull || mx.isNull ||
        !(mx < lit(lo) || mn > lit(hi)))
      .select(col("file"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Range scan through the zone map: plan the parquet read over ONLY
    * the files [[prunedFiles]] admits, then re-apply the predicate for
    * row-level exactness (zones prove absence, not presence). Returns
    * an empty frame with the table's schema when every file prunes.
    * The predicate also reaches the parquet reader as a pushed filter,
    * so surviving files still skip non-matching row groups.
    */
  def skipScan(spark: SparkSession, path: String, manifest: DataFrame,
               colName: String, lo: Any, hi: Any): DataFrame = {
    val files = prunedFiles(manifest, colName, lo, hi)
    val full = spark.read.parquet(path)
    if (files.isEmpty) full.limit(0)
    else spark.read.schema(full.schema).parquet(files: _*)
      .filter(col(colName) >= lit(lo) && col(colName) <= lit(hi))
  }

  /** Per-file Bloom filters — the POINT-lookup complement to min/max
    * zones: a range zone on a high-cardinality, layout-uncorrelated
    * column (a uuid, a user id under hash layout) spans the whole
    * domain in every file and prunes nothing, while a Bloom filter
    * answers "could this file contain key k?" with `fpp` false
    * positives and no false negatives (Delta's bloom index, Iceberg
    * puffin files — same idea). One manifest row per file, the filter
    * as a binary column; sized for the file's rows, not the table's.
    */
  def buildBloomManifest(spark: SparkSession, path: String,
                         colName: String, expectedPerFile: Long = 100000L,
                         bitsPerKey: Long = 10L): DataFrame = {
    val df = spark.read.parquet(path)
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"),
        org.apache.spark.sql.graft.BloomFilterFns
          .bloom_filter_agg(col(colName), expectedPerFile,
            expectedPerFile * bitsPerKey)
          .as(s"${colName}__bloom"))
  }

  /** Files whose Bloom filter admits `key` — the candidate set for an
    * equality predicate. No false negatives: every file truly holding
    * the key is returned; ~fpp of the others tag along and are
    * discarded by the row-level re-filter in [[bloomSkipScan]].
    *
    * Scale contract — unlike the min/max manifest (KBs per row), bloom
    * rows carry the filter bytes (~125 KB at 100 k keys × 10 bits), so
    * a 100 TB / 800 k-file bloom manifest is ~100 GB: NOT
    * driver-collectable. The probe therefore runs as a DISTRIBUTED
    * filter over the manifest and only the matching file PATHS come
    * back (at 1 % fpp that is ~fpp·|files| paths plus true hits). The
    * probe is a Scala UDF by necessity: the codegen'd
    * `BloomFilterMightContain` requires a foldable (plan-constant)
    * filter and here the filter is the per-row data — and the UDF runs
    * |files| times per lookup, never per data row, so it is manifest-
    * scale work, not corpus-scale. Serialized format is the standard
    * `spark.util.sketch.BloomFilter` stream.
    */
  def bloomPrunedFiles(manifest: DataFrame, colName: String,
                       key: Long): Seq[String] = {
    val probe = udf { bytes: Array[Byte] =>
      bytes != null && org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(bytes))
        .mightContainLong(key)
    }
    manifest
      .filter(probe(col(s"${colName}__bloom")))
      .select(col("file"))
      .collect().map(_.getString(0)).toSeq
  }

  /** Equality scan through the Bloom manifest: read only admitted
    * files, re-filter for exactness. */
  def bloomSkipScan(spark: SparkSession, path: String, manifest: DataFrame,
                    colName: String, key: Long): DataFrame = {
    val files = bloomPrunedFiles(manifest, colName, key)
    val full = spark.read.parquet(path)
    if (files.isEmpty) full.limit(0)
    else spark.read.schema(full.schema).parquet(files: _*)
      .filter(col(colName) === lit(key))
  }

  /** Incremental manifest maintenance — the production append path: a
    * new batch of files lands, only THEY are scanned, and their rows
    * join the existing manifest (which is never rebuilt). Files
    * already present in `existing` are skipped, so the call is
    * idempotent under retries; files the table no longer contains
    * (compaction, vacuum) are DROPPED from the manifest — a stale
    * entry is not merely wasted, [[skipScan]] would hand the deleted
    * path to the reader and fail the scan.
    */
  def updateManifest(spark: SparkSession, path: String,
                     existing: DataFrame, cols: Seq[String]): DataFrame = {
    val known = existing.select(col("file")).collect()
      .map(_.getString(0)).toSet
    val all = spark.read.parquet(path).inputFiles
    val live = all.toSet
    val kept =
      if (known.subsetOf(live)) existing
      else {
        // semi-join, not a giant IN-list: |files| can be 10^5-10^6
        import spark.implicits._
        existing.join(broadcast(all.toSeq.toDF("file")), Seq("file"),
          "left_semi")
      }
    val fresh = all.filterNot(known)
    if (fresh.isEmpty) kept
    else {
      val df = spark.read.parquet(fresh: _*)
      val aggs = cols.flatMap { c =>
        Seq(min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max"),
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"))
      }
      kept.unionByName(
        df.groupBy(input_file_name().as("file"))
          .agg(count(lit(1)).as("n_rows"), aggs: _*))
    }
  }

  /** Streaming ingestion with a live zone map — the production append
    * path end to end: each micro-batch's rows land as new parquet
    * files under `dataDir`, then [[updateManifest]] scans ONLY those
    * new files and the refreshed manifest replaces `manifestPath`
    * (materialized before the overwrite — never write a lazy plan over
    * its own input). The refresh is idempotent (file names key the
    * delta), so a retried batch cannot double-count; exactly-once for
    * the data files comes from the stream's own checkpoint.
    *
    * Reader contract: a parquet overwrite is NOT reader-atomic — a
    * reader racing the replace can observe a partial manifest, and a
    * manifest missing files makes [[skipScan]] silently drop their
    * rows (zones prove absence only when the file is listed). Readers
    * must snapshot the manifest between refreshes (read it once, reuse
    * the frame), or the manifest belongs in a transactional table
    * format that supplies the atomic swap — the single-writer,
    * snapshot-reader contract of every log-structured metadata store.
    */
  def manifestSink(stream: DataFrame, dataDir: String,
                   manifestPath: String, cols: Seq[String],
                   checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        manifestBatch(batch, dataDir, manifestPath, cols)
      }
      .start()

  /** One append + manifest refresh (the foreachBatch body, callable
    * directly for batch backfills). */
  def manifestBatch(batch: DataFrame, dataDir: String,
                    manifestPath: String, cols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    batch.write.mode("append").parquet(dataDir)
    val existing =
      try spark.read.parquet(manifestPath)
      catch { case _: Exception => buildManifest(spark, dataDir, cols).limit(0) }
    val updated = updateManifest(spark, dataDir, existing, cols)
      .localCheckpoint(true) // materialize BEFORE overwriting the input
    updated.write.mode("overwrite").parquet(manifestPath)
  }

  /** Zone-overlap audit for a layout WITHOUT writing files: assign rows
    * to `nZones` contiguous zones of `orderCol`'s sort order (rank
    * ranges, made total by `tieCol`), then per zone report each audited
    * column's min/max span — the distributable stand-in for "what would
    * per-file stats look like under this layout". Feed it a z-value to
    * audit a z-order layout, a plain column for a linear sort layout;
    * tighter spans == more skipping.
    *
    * The global rank is DISTRIBUTED (the vocabulary pattern, not a
    * single-partition `Window.orderBy`): a range-partitioned sort stays
    * spread across the cluster and `zipWithIndex` assigns ranks from
    * per-partition offsets — deterministic because the (orderCol,
    * tieCol) order is total, whatever the sampled range boundaries.
    */
  def zoneAudit(df: DataFrame, orderCol: Column, tieCol: Column,
                nZones: Int, audit: Seq[(String, Column)]): DataFrame = {
    require(nZones >= 1, s"nZones must be >= 1, got $nZones")
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = df.sparkSession
    val auditCols = audit.map { case (name, c) => c.as(s"__a_$name") }
    val sorted = df
      .select((orderCol.as("__o") +: tieCol.as("__t") +: auditCols): _*)
      .sort(col("__o"), col("__t"))
    val n = sorted.count()
    val schema = StructType(sorted.schema.fields :+
      StructField("__rank", LongType, nullable = false))
    val ranked = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (row, i) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ i)
      }, schema)
    val aggs = audit.flatMap { case (name, _) =>
      Seq(min(col(s"__a_$name")).as(s"${name}_min"),
        max(col(s"__a_$name")).as(s"${name}_max"))
    }
    ranked
      .groupBy((col("__rank") * nZones / math.max(n, 1L)).cast("int")
        .as("zone"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .orderBy(col("zone"))
  }
}
