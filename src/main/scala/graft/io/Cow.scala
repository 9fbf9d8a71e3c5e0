package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Copy-on-write row-level DELETE / UPDATE over the versioned manifest
  * store — the operation that turns the append-only zone-mapped table
  * ([[ZoneMap]]) into a full lakehouse table on plain parquet, the way
  * Delta / Iceberg / Hudi implement `DELETE FROM` and `UPDATE` in
  * copy-on-write mode (reference scope: the pipeline's tables are
  * overwrite-only — `main.py:156-165` rewrites whole tables; this is
  * the surgical form a 100 TB table needs, where "rewrite the table"
  * is not an option).
  *
  * Mechanics per mutation:
  *   1. find the TOUCHED files — the (usually tiny) subset of the
  *      current snapshot's files that contain at least one matching
  *      row. One pruned scan: the predicate is pushed to parquet, and
  *      only matching rows' `input_file_name()`s come back, distinct
  *      at |files| scale.
  *   2. rewrite ONLY those files: survivors (DELETE) or transformed
  *      rows (UPDATE) are appended to the table directory as NEW
  *      parquet files. Untouched files are not read, not rewritten,
  *      not moved — at 100 TB with a selective predicate that is
  *      99.9 % of the table left alone.
  *   3. commit the next manifest version: old rows minus touched files
  *      plus freshly-scanned stats for the new files
  *      ([[ZoneMap.manifestForFiles]]), via the store's atomic marker
  *      commit. Readers ([[ZoneMap.scanAsOf]] / [[ZoneMap.readManifest]])
  *      flip from the old snapshot to the new one atomically.
  *
  * The OLD files stay on disk — they are what makes
  * [[ZoneMap.scanAsOf]] time travel to pre-mutation versions work —
  * until [[vacuumTable]] reclaims files no retained version
  * references. Consequently the MANIFEST is the table: a plain
  * directory read of `dataDir` sees dead rows next to their
  * replacements and is wrong by construction after the first mutation
  * (exactly as for a Delta table's directory). Single-writer contract,
  * enforced by the marker create in [[ZoneMap.commitManifest]]: a
  * concurrent mutator loses the version-number race and fails loudly
  * instead of corrupting state.
  */
object Cow {

  private def fsFor(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Stats columns tracked by a manifest, recovered from its schema —
    * so mutations preserve whatever zone columns the table was built
    * with, without the caller restating them. */
  private[io] def statsCols(manifest: DataFrame): Seq[String] =
    manifest.columns.toSeq.filter(_.endsWith("__min")).map(_.dropRight(5))

  /** Recursive listing of the data files currently under `dataDir`
    * (driver-side, |files|-scale — the same walk the planner's file
    * index does). Spark-hidden entries (`_staging`, `.crc`) excluded. */
  private def listDataFiles(spark: SparkSession, dataDir: String): Set[String] = {
    val root = new Path(dataDir)
    val fs = fsFor(spark, root)
    val out = scala.collection.mutable.Set[String]()
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val s = it.next()
      val name = s.getPath.getName
      val hidden = {
        // any path component under dataDir starting with _ or . is
        // invisible to Spark's listing; mirror that
        var p = s.getPath; var h = false
        while (p != null && p.toString != root.toString) {
          val n = p.getName
          if (n.startsWith("_") || n.startsWith(".")) h = true
          p = p.getParent
        }
        h
      }
      if (!hidden && name.endsWith(".parquet"))
        out += ZoneMap.normPath(s.getPath.toString)
    }
    out.toSet
  }

  /** DELETE FROM the manifest-tracked table at `dataDir` WHERE
    * `predicate`. SQL DELETE semantics: rows where the predicate is
    * TRUE go; FALSE and NULL rows stay. Returns the newly committed
    * manifest version, or the current one unchanged when no row
    * matches (no files rewritten, nothing committed — a no-op DELETE
    * leaves no version behind, like Delta).
    */
  def deleteWhere(spark: SparkSession, dataDir: String,
                  manifestPath: String, predicate: Column): Long =
    rewriteTouched(spark, dataDir, manifestPath, predicate,
      rewrite = df => df.filter(!(predicate <=> lit(true))))

  /** UPDATE the manifest-tracked table: rows matching `predicate` get
    * each column in `set` replaced by its expression (evaluated
    * against the OLD row, all assignments simultaneous); other rows in
    * touched files are rewritten verbatim. Returns the committed
    * version (current version on a no-match no-op).
    */
  def updateWhere(spark: SparkSession, dataDir: String,
                  manifestPath: String, predicate: Column,
                  set: Map[String, Column]): Long = {
    require(set.nonEmpty, "UPDATE needs at least one assignment")
    rewriteTouched(spark, dataDir, manifestPath, predicate,
      rewrite = df => {
        require(set.keySet.subsetOf(df.columns.toSet),
          s"unknown UPDATE columns: ${set.keySet -- df.columns.toSet}")
        // one select, every assignment against the pre-update row —
        // simultaneous semantics even when one assigned column reads
        // another
        df.select(df.columns.toIndexedSeq.map { c =>
          set.get(c) match {
            case Some(e) =>
              when(predicate <=> lit(true), e).otherwise(col(c)).as(c)
            case None => col(c)
          }
        }: _*)
      })
  }

  /** Shared COW core: touched-file discovery → rewrite → manifest
    * commit. `rewrite` maps a frame holding ONLY the touched files'
    * rows to the rows that replace them. */
  private def rewriteTouched(spark: SparkSession, dataDir: String,
                             manifestPath: String, predicate: Column,
                             rewrite: DataFrame => DataFrame): Long = {
    val version = ZoneMap.currentManifestVersion(spark, manifestPath)
      .getOrElse(throw new java.io.FileNotFoundException(
        s"no committed manifest under $manifestPath — build and commit " +
          "one before mutating (the manifest IS the table)"))
    val manifest = ZoneMap.readManifestAt(spark, manifestPath, version)
    val cols = statsCols(manifest)
    val snapshot = manifest.select(col("file")).collect()
      .map(_.getString(0)).filterNot(_ == null).toIndexedSeq
    require(snapshot.nonEmpty, s"manifest v$version lists no files")
    val table = spark.read.parquet(snapshot: _*)

    // 1. touched files: pushed-predicate scan, |touched| paths back
    val touched = table.filter(predicate)
      .select(input_file_name().as("file")).distinct()
      .collect().map(r => ZoneMap.normPath(r.getString(0))).toSet
    if (touched.isEmpty) return version

    // 2. rewrite only the touched files, appended as new part files.
    //    The before/after directory diff identifies them (single-writer
    //    contract; no concurrent appends race this listing).
    val before = listDataFiles(spark, dataDir)
    rewrite(spark.read.schema(table.schema).parquet(touched.toSeq: _*))
      .write.mode("append").parquet(dataDir)
    val fresh = (listDataFiles(spark, dataDir) -- before).toSeq.sorted

    // 3. next manifest: untouched rows + fresh stats (a rewrite that
    //    drained every row — DELETE matching a whole file — adds no
    //    fresh files, and the file simply leaves the manifest)
    val spark2 = spark
    import spark2.implicits._
    val kept = manifest.join(
      broadcast(touched.toSeq.toDF("file")), Seq("file"), "left_anti")
    val next =
      if (fresh.isEmpty) kept
      else kept.unionByName(ZoneMap.manifestForFiles(spark, fresh, cols))
    // materialize before committing: the commit write must not re-plan
    // over manifest state that a concurrent reader could swap under it
    ZoneMap.commitManifest(next.localCheckpoint(true), manifestPath)
  }

  /** OPTIMIZE: rewrite the CURRENT snapshot into `targetFileCount`
    * files — optionally range-clustered on `clusterBy` (pass a z-value
    * expression for multi-dimensional clustering; see
    * [[graft.ops.ZOrder]]) — and commit it as the next manifest
    * version. Compaction is the small-files cure (a streaming table
    * accretes one file per epoch per partition; reads pay per-file
    * open cost), clustering is what makes the zone map prune (tight
    * per-file ranges on the cluster keys). Old files stay for time
    * travel until [[vacuumTable]].
    *
    * Unlike DELETE/UPDATE this rewrites the whole snapshot — run it on
    * a partition's worth of files at a time in production (filter the
    * snapshot by the partition predicate first; the manifest diff
    * machinery and [[graft.agg.IncrementalRollup]]'s append-only
    * check deliberately treat the result as a REWRITE, not an append).
    */
  def compactTable(spark: SparkSession, dataDir: String,
                   manifestPath: String, targetFileCount: Int,
                   clusterBy: Seq[Column] = Nil): Long = {
    require(targetFileCount >= 1,
      s"targetFileCount must be >= 1, got $targetFileCount")
    val version = ZoneMap.currentManifestVersion(spark, manifestPath)
      .getOrElse(throw new java.io.FileNotFoundException(
        s"no committed manifest under $manifestPath"))
    val manifest = ZoneMap.readManifestAt(spark, manifestPath, version)
    val cols = statsCols(manifest)
    val snapshot = manifest.select(col("file")).collect()
      .map(_.getString(0)).toIndexedSeq
    require(snapshot.nonEmpty, s"manifest v$version lists no files")
    val table = spark.read.parquet(snapshot: _*)
    val shaped =
      if (clusterBy.nonEmpty)
        table.repartitionByRange(targetFileCount, clusterBy: _*)
      else table.repartition(targetFileCount)
    val before = listDataFiles(spark, dataDir)
    shaped.write.mode("append").parquet(dataDir)
    val fresh = (listDataFiles(spark, dataDir) -- before).toSeq.sorted
    ZoneMap.commitManifest(
      ZoneMap.manifestForFiles(spark, fresh, cols).localCheckpoint(true),
      manifestPath)
  }

  /** Table fsck — the consistency report between the manifest log and
    * the directory: per file, `ok` (current snapshot references it),
    * `historical` (only an older retained version references it — a
    * time-travel dependency, reclaimable by [[vacuumTable]]), `orphan`
    * (on disk, referenced by NO retained version — a crashed write or
    * an over-retained rewrite), or `missing` (the current manifest
    * references it but the file is GONE — the state that makes reads
    * fail; surface it before a reader does). Driver-side set algebra
    * at |files|×versions scale, no data IO.
    */
  def fsck(spark: SparkSession, dataDir: String,
           manifestPath: String): DataFrame = {
    import spark.implicits._
    val current = ZoneMap.currentManifestVersion(spark, manifestPath)
      .map(v => ZoneMap.readManifestAt(spark, manifestPath, v)
        .select(col("file")).collect().map(_.getString(0)).toSet)
      .getOrElse(Set.empty)
    val dir = new Path(manifestPath, "_versions")
    val fs = fsFor(spark, dir)
    val versions =
      if (!fs.exists(dir)) Seq.empty[Long]
      else fs.listStatus(dir).iterator.map(_.getPath.getName)
        .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong).toSeq
    val retained = versions.flatMap(v =>
      ZoneMap.readManifestAt(spark, manifestPath, v)
        .select(col("file")).collect().map(_.getString(0))).toSet
    val onDisk = listDataFiles(spark, dataDir)
    val rows = (retained ++ onDisk).toSeq.sorted.map { f =>
      val status =
        if (current.contains(f) && !onDisk.contains(f)) "missing"
        else if (current.contains(f)) "ok"
        else if (retained.contains(f) && onDisk.contains(f)) "historical"
        else if (onDisk.contains(f)) "orphan"
        else "missing" // referenced by an old version only, and gone
      (f, status)
    }
    rows.toDF("file", "status")
  }

  /** Reclaim data files no RETAINED manifest version references:
    * first bound the version history ([[ZoneMap.vacuumManifest]] keep),
    * then delete every data file under `dataDir` absent from all
    * surviving versions' file lists — dead pre-rewrite copies and
    * uncommitted leftovers both. Driver-side set algebra at |files| ×
    * keep scale. After vacuum, time travel reaches only the kept
    * versions (older `scanAsOf` fails loudly by the store's contract).
    * Runs under the table's single-writer contract: concurrent
    * appends' not-yet-committed files would look unreferenced.
    * Returns the deleted paths.
    */
  def vacuumTable(spark: SparkSession, dataDir: String,
                  manifestPath: String, keepVersions: Int = 2): Seq[String] = {
    ZoneMap.vacuumManifest(spark, manifestPath, keepVersions)
    val dir = new Path(manifestPath, "_versions")
    val fs = fsFor(spark, dir)
    val versions =
      if (!fs.exists(dir)) Seq.empty[Long]
      else fs.listStatus(dir).iterator.map(_.getPath.getName)
        .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong).toSeq
    val referenced = versions.flatMap { v =>
      ZoneMap.readManifestAt(spark, manifestPath, v)
        .select(col("file")).collect().map(_.getString(0))
    }.toSet
    val dead = (listDataFiles(spark, dataDir) -- referenced).toSeq.sorted
    dead.foreach(p => fsFor(spark, new Path(p)).delete(new Path(p), false))
    dead
  }
}
