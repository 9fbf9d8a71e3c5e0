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

  /** Canonical form for file paths so manifest keys compare equal
    * across the two ways Spark spells them: `input_file_name()` emits
    * the percent-ENCODED URI (`.../dir%20x/part-...`) while
    * `DataFrame.inputFiles` emits the decoded `Path.toString` form
    * (`.../dir x/part-...`). Without one canonical form, a table path
    * containing a space (or any URI-special character) makes every
    * manifest entry look stale in [[updateManifest]] — forcing a full
    * rescan per refresh — and [[skipScan]] would hand percent-encoded
    * paths to a reader that treats `%20` as literal characters.
    * Round-tripping through `java.net.URI` → `hadoop.fs.Path` decodes
    * the escaping; both spellings converge on the decoded form.
    */
  private[io] def normPath(s: String): String =
    org.apache.spark.sql.graft.PathNormExpr.normalizeString(s)

  /** [[normPath]] as a column op — applied AFTER the per-file groupBy,
    * so it runs once per manifest row (|files| times), never per data
    * row. A codegen'd native expression
    * ([[org.apache.spark.sql.graft.PathNormExpr]]): deliberately NOT
    * the built-in `url_decode` (form decoding turns a literal `+` in a
    * path into a space) — nothing built-in reproduces hadoop Path
    * normalization (scheme handling, `//` collapse). */
  private def normFileCol(df: DataFrame): DataFrame =
    df.withColumn("file",
      org.apache.spark.sql.graft.ManifestExprs.norm_path(col("file")))

  /** Per-file zone statistics for `cols` over the parquet table at
    * `path`: one manifest row per physical file with row count and each
    * column's min / max / null count. One full scan, partial-aggregated
    * by `input_file_name` — no shuffle wider than |files| rows.
    *
    * ZERO-ROW files (a filter that drained a partition still writes a
    * file) produce no aggregate row, so the stats are left-joined onto
    * the file LISTING: empty files land with `n_rows = 0` and null
    * zones. Without this they would be invisible to the manifest and
    * [[updateManifest]] would re-detect them as "fresh" on every
    * refresh forever; with it, [[prunedFiles]] skips them outright —
    * zero rows is the one zone that proves absence for EVERY predicate.
    */
  def buildManifest(spark: SparkSession, path: String,
                    cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column to map")
    val df = spark.read.parquet(path)
    statsOverListing(df, cols)
  }

  /** Stats agg ⟕ file listing (both |files|-scale). See [[buildManifest]]
    * on why the listing, not the agg, defines the row set. */
  private def statsOverListing(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs = cols.flatMap { c =>
      Seq(min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"))
    }
    val agg = normFileCol(
      df.groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("n_rows"), aggs: _*))
    val listing = df.inputFiles.map(normPath).toSeq.toDF("file")
    listing.join(broadcast(agg), Seq("file"), "left")
      .na.fill(0L, "n_rows" +: cols.map(c => s"${c}__nulls"))
  }

  /** Manifest rows for an EXPLICIT file list — the write-side stats
    * path: a writer that just produced `files` (an append batch, a
    * copy-on-write rewrite) derives their manifest rows by scanning
    * only those files, never the table. Same row contract as
    * [[buildManifest]] (listing defines the rows, zero-row files
    * included).
    */
  def manifestForFiles(spark: SparkSession, files: Seq[String],
                       cols: Seq[String]): DataFrame = {
    require(files.nonEmpty, "manifestForFiles needs at least one file")
    statsOverListing(spark.read.parquet(files: _*), cols)
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
      .filter(col("n_rows") > 0 &&
        (mn.isNull || mx.isNull || !(mx < lit(lo) || mn > lit(hi))))
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
    val spark2 = df.sparkSession
    import spark2.implicits._
    val agg = normFileCol(
      df.groupBy(input_file_name().as("file"))
        .agg(count(lit(1)).as("n_rows"),
          org.apache.spark.sql.graft.BloomFilterFns
            .bloom_filter_agg(col(colName), expectedPerFile,
              expectedPerFile * bitsPerKey)
            .as(s"${colName}__bloom")))
    // empty files land with a null bloom (the probe rejects null) —
    // same listing-defines-the-rows contract as buildManifest
    df.inputFiles.map(normPath).toSeq.toDF("file")
      .join(broadcast(agg), Seq("file"), "left")
      .na.fill(0L, Seq("n_rows"))
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
    * probe is a native expression
    * ([[org.apache.spark.sql.graft.BloomProbeExpr]]) because the
    * codegen'd built-in `BloomFilterMightContain` requires a foldable
    * (plan-constant) filter and here the filter is the per-row data —
    * and the probe runs |files| times per lookup, never per data row,
    * so it is manifest-scale work, not corpus-scale. A null filter
    * column null-propagates, and `filter` drops null predicates —
    * identical to the previous "null = not admitted" contract.
    * Serialized format is the standard `spark.util.sketch.BloomFilter`
    * stream.
    */
  def bloomPrunedFiles(manifest: DataFrame, colName: String,
                       key: Long): Seq[String] =
    manifest
      .filter(org.apache.spark.sql.graft.ManifestExprs.bloom_probe(
        col(s"${colName}__bloom"), lit(key)))
      .select(col("file"))
      .collect().map(_.getString(0)).toSeq

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
    // both sides through normPath: manifest keys come from
    // input_file_name() (URI-encoded), inputFiles from Path.toString
    // (decoded) — see normPath for why comparing them raw forces a
    // full rescan on any path with a URI-special character
    val all = spark.read.parquet(path).inputFiles.map(normPath)
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
    else kept.unionByName(
      statsOverListing(spark.read.parquet(fresh: _*), cols))
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
    * Reader contract: refreshes are READER-ATOMIC. Each refresh writes
    * a complete new snapshot under `manifestPath/v<N>/` and only then
    * commits it with an atomic marker create (see [[commitManifest]]);
    * [[readManifest]] resolves the highest committed marker. A reader
    * racing a refresh sees either the old snapshot or the new one —
    * never a torn mix (the failure that would make [[skipScan]]
    * silently drop rows, because zones prove absence only for files
    * the manifest lists). This is the Delta-log pattern: versioned
    * immutable snapshots plus an atomic commit record.
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
    * directly for batch backfills). The refresh never touches the
    * previous snapshot — the new version's plan may lazily read the
    * old version's parquet while writing its own directory — so no
    * materialization barrier is needed before the commit. */
  def manifestBatch(batch: DataFrame, dataDir: String,
                    manifestPath: String, cols: Seq[String]): Unit = {
    val spark = batch.sparkSession
    batch.write.mode("append").parquet(dataDir)
    val existing = currentManifestVersion(spark, manifestPath) match {
      case Some(_) => readManifest(spark, manifestPath)
      case None    => buildManifest(spark, dataDir, cols).limit(0)
    }
    commitManifest(updateManifest(spark, dataDir, existing, cols),
      manifestPath)
  }

  // ---- versioned manifest store (atomic swap) -----------------------
  //
  // Layout under `manifestPath`:
  //   v0/ v1/ ... vN/        immutable parquet snapshots
  //   _versions/<%020d>      zero-byte-ish commit markers, one per
  //                          committed snapshot
  // A snapshot becomes visible ONLY when its marker exists, and marker
  // creation (`FileSystem.create(overwrite = false)`) is a single
  // atomic metadata operation on HDFS / local disk and a conditional
  // PUT on object stores. Readers list markers and take the max, so a
  // half-written snapshot directory (no marker yet) is invisible and a
  // torn read is impossible by construction. Single-writer is enforced
  // by the same call: a concurrent writer racing to the same version
  // number fails the create instead of corrupting state.

  private val VersionsDir = "_versions"

  private def fsFor(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Highest committed manifest version under `manifestPath`, if any.
    * Driver-side listing of the marker directory — O(versions), and
    * [[vacuumManifest]] bounds that. */
  def currentManifestVersion(spark: SparkSession,
                             manifestPath: String): Option[Long] = {
    val dir = new org.apache.hadoop.fs.Path(manifestPath, VersionsDir)
    val fs = fsFor(spark, dir)
    if (!fs.exists(dir)) None
    else {
      val vs = fs.listStatus(dir).iterator.map(_.getPath.getName)
        .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
        .toSeq
      if (vs.isEmpty) None else Some(vs.max)
    }
  }

  /** Snapshot-read the current committed manifest. The returned frame
    * is pinned to one version directory, so it stays self-consistent
    * however many refreshes commit while it is in use. */
  def readManifest(spark: SparkSession, manifestPath: String): DataFrame = {
    val v = currentManifestVersion(spark, manifestPath).getOrElse {
      throw new java.io.FileNotFoundException(
        s"no committed manifest version under $manifestPath")
    }
    spark.read.parquet(s"$manifestPath/v$v")
  }

  /** Commit `manifest` as the next version: write the full snapshot to
    * `v<next>/`, then atomically create its marker. Returns the
    * committed version. Until the marker lands, readers keep resolving
    * the previous version; after it lands, they resolve this one —
    * there is no in-between. */
  def commitManifest(manifest: DataFrame, manifestPath: String): Long = {
    val spark = manifest.sparkSession
    val next = currentManifestVersion(spark, manifestPath)
      .getOrElse(-1L) + 1L
    manifest.write.mode("overwrite").parquet(s"$manifestPath/v$next")
    val marker = new org.apache.hadoop.fs.Path(
      s"$manifestPath/$VersionsDir", f"$next%020d")
    val fs = fsFor(spark, marker)
    // overwrite = false: the atomic claim of this version number
    val out = fs.create(marker, false)
    try out.write(s"v$next".getBytes("UTF-8")) finally out.close()
    next
  }

  /** Drop all but the newest `keep` committed snapshots (markers
    * first, then data — a crash between the two leaves only invisible
    * orphan directories, cleaned on the next vacuum). Bounds the
    * store at O(keep) snapshots; `keep >= 2` preserves one superseded
    * snapshot for still-running readers. */
  def vacuumManifest(spark: SparkSession, manifestPath: String,
                     keep: Int = 2): Unit = {
    require(keep >= 1, s"keep must be >= 1, got $keep")
    val dir = new org.apache.hadoop.fs.Path(manifestPath, VersionsDir)
    val fs = fsFor(spark, dir)
    if (fs.exists(dir)) {
      val vs = fs.listStatus(dir).iterator.map(_.getPath.getName)
        .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
        .toSeq.sorted
      vs.dropRight(keep).foreach { v =>
        fs.delete(new org.apache.hadoop.fs.Path(dir, f"$v%020d"), false)
        fs.delete(new org.apache.hadoop.fs.Path(s"$manifestPath/v$v"), true)
      }
    }
  }

  /** Read a SPECIFIC committed manifest version — the time-travel
    * entry point. Fails loudly if the version was never committed or
    * has been vacuumed (a pinned reader that outlives `keep` snapshots
    * should fail, not silently read the wrong file list).
    */
  def readManifestAt(spark: SparkSession, manifestPath: String,
                     version: Long): DataFrame = {
    val marker = new org.apache.hadoop.fs.Path(
      s"$manifestPath/$VersionsDir", f"$version%020d")
    if (!fsFor(spark, marker).exists(marker))
      throw new java.io.FileNotFoundException(
        s"manifest version $version not committed (or vacuumed) under " +
          manifestPath)
    spark.read.parquet(s"$manifestPath/v$version")
  }

  /** TIME TRAVEL over plain parquet: scan the table AS OF manifest
    * `version` — only the files that version's manifest lists, however
    * many files have been appended to the directory since. The
    * manifest's file list IS the snapshot (the same contract Delta /
    * Iceberg implement with their metadata logs): because data files
    * are immutable-once-written and the manifest is committed
    * atomically, every version's file list describes a consistent
    * table state forever.
    *
    * The file list is collected driver-side — |files| paths, the same
    * scale the planner's own file index holds; the scan itself is a
    * normal pruned parquet read (column pruning / predicate pushdown
    * intact). Pair with [[vacuumManifest]]`(keep)` for how far back
    * travel reaches.
    */
  def scanAsOf(spark: SparkSession, manifestPath: String,
               version: Long): DataFrame = {
    val files = readManifestAt(spark, manifestPath, version)
      .select(col("file")).collect().map(_.getString(0))
    require(files.nonEmpty, s"manifest v$version lists no files")
    spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** File-level diff between two committed versions: one row per
    * changed file, `(file, change)` with change ∈ {added, removed} —
    * the incremental-processing primitive ("process only files added
    * since the version I last saw", Delta-CDF-style but at file
    * granularity). |files|-scale anti-joins on the manifest frames;
    * no data files are touched.
    */
  def manifestDiff(spark: SparkSession, manifestPath: String,
                   fromVersion: Long, toVersion: Long): DataFrame = {
    val from = readManifestAt(spark, manifestPath, fromVersion)
      .select(col("file"))
    val to = readManifestAt(spark, manifestPath, toVersion)
      .select(col("file"))
    to.join(from, Seq("file"), "left_anti")
      .withColumn("change", lit("added"))
      .unionByName(
        from.join(to, Seq("file"), "left_anti")
          .withColumn("change", lit("removed")))
      .orderBy(col("file"))
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
