package graft.io

import org.apache.spark.sql.SparkSession

/** Versioned segment-set commit markers — the tiny filesystem protocol
  * behind every SEGMENTED index in the engine (the text inverted index
  * in [[graft.ext.Retrieval]], the IVF vector index in
  * [[graft.ext.Similarity]]): a `_versions/<n>` marker file, created
  * atomically AFTER its segments' tables land, names the exact segment
  * set a reader may see. Consequences readers get for free:
  *
  *   - a torn or in-flight segment write (no marker) is invisible;
  *   - compaction atomically supersedes many segments with one by
  *     committing a new version whose set is just the merged segment;
  *   - replay idempotence: a segment id that was EVER part of a
  *     committed version must never be written again (the exactly-once
  *     contract streaming epoch-commits rely on), which is why
  *     [[allSegmentsEver]] spans every RETAINED version, not just the
  *     newest.
  *
  * Extracted from Retrieval (round-11) so the text and vector indexes
  * share one implementation instead of two copies of a consistency
  * protocol. All operations are driver-side metadata on KB-sized
  * marker files — never data IO.
  */
object Segments {

  val VersionsDir = "_versions"

  private def versionsPath(indexDir: String) =
    new org.apache.hadoop.fs.Path(indexDir, VersionsDir)

  private def fsOf(spark: SparkSession, p: org.apache.hadoop.fs.Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** All version numbers present, ascending. */
  def listVersions(spark: SparkSession, indexDir: String): Seq[Long] = {
    val dir = versionsPath(indexDir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).iterator.map(_.getPath.getName)
      .filter(n => n.nonEmpty && n.forall(_.isDigit)).map(_.toLong)
      .toSeq.sorted
  }

  /** The segment ids one version file names (sorted). */
  def readVersion(spark: SparkSession, indexDir: String,
                  v: Long): Seq[Long] = {
    val p = new org.apache.hadoop.fs.Path(versionsPath(indexDir), f"$v%020d")
    val fs = fsOf(spark, p)
    val in = fs.open(p)
    val bytes = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 4096, false)
      buf.toByteArray
    } finally in.close()
    val s = new String(bytes, "UTF-8").trim
    if (s.isEmpty) Seq.empty
    else s.split(",").iterator.map(_.trim.toLong).toSeq.sorted
  }

  /** Write the next version marker naming `segs` as the new active
    * set; `create(p, false)` makes claiming a version number atomic.
    * Returns the committed version number.
    *
    * Writer contract: a commit is a read-modify-write of the active
    * segment set, so version claiming doubles as lost-update
    * detection — the marker is created as `<version-read-at-base>+1`
    * with overwrite=false, and a concurrent writer that claimed the
    * same number first makes THIS call fail loudly
    * (IllegalStateException) instead of silently dropping the other
    * writer's segment from the active set. One winner per version;
    * the loser re-reads and retries (its append is already
    * idempotent: the segment data landed, only the marker is redone).
    * Single-writer-per-index remains the intended deployment (one
    * streaming query owns an index); the CAS makes a violation
    * diagnosable rather than corrupting. */
  def commitVersion(spark: SparkSession, indexDir: String,
                    segs: Seq[Long]): Long =
    commitVersionAfter(spark, indexDir,
      listVersions(spark, indexDir).maxOption.getOrElse(-1L), segs)

  /** CAS form of [[commitVersion]]: commit `segs` as exactly version
    * `base + 1`, where `base` is the newest version the CALLER read
    * when computing `segs`. Fails with IllegalStateException if
    * another writer claimed `base + 1` first — the read-modify-write
    * conflict that would otherwise silently drop a segment.
    *
    * Atomicity of the claim is filesystem-dependent, so the claim path
    * forks: on HDFS and object stores `create(p, overwrite=false)` is
    * an atomic namespace operation and is used directly; on Hadoop's
    * local filesystems (Raw/ChecksumLocalFileSystem) that call is
    * check-then-act (an exists() probe, then a plain open) — two truly
    * concurrent writers could both "succeed", the second silently
    * truncating the winner's marker, which is exactly the lost update
    * this CAS exists to catch. There the claim is taken with NIO
    * `Files.createFile` (O_CREAT|O_EXCL — atomic at the kernel), and
    * only the claim winner opens the stream. */
  def commitVersionAfter(spark: SparkSession, indexDir: String,
                         base: Long, segs: Seq[Long]): Long = {
    val dir = versionsPath(indexDir)
    val fs = fsOf(spark, dir)
    val next = base + 1L
    val marker = new org.apache.hadoop.fs.Path(dir, f"$next%020d")
    def conflict(e: Throwable) = new IllegalStateException(
      s"commitVersion: version $next under $indexDir was claimed " +
        "by a concurrent writer after this writer read version " +
        s"$base — committing would drop its segment set. Re-read " +
        "the active set and retry (one winner per version).", e)
    val out = fs match {
      case _: org.apache.hadoop.fs.LocalFileSystem |
           _: org.apache.hadoop.fs.RawLocalFileSystem =>
        fs.mkdirs(dir) // createFile needs the parent; create() made it
        val local = java.nio.file.Paths.get(
          fs.makeQualified(marker).toUri.getPath)
        try java.nio.file.Files.createFile(local) // atomic O_EXCL claim
        catch {
          case e: java.nio.file.FileAlreadyExistsException =>
            throw conflict(e)
        }
        fs.create(marker, true) // we own the claim; fill in content
      case _ =>
        try fs.create(marker, false) // atomic claim on HDFS/object FS
        catch {
          case e: java.io.IOException if fs.exists(marker) =>
            throw conflict(e)
        }
    }
    try out.write(segs.distinct.sorted.mkString(",").getBytes("UTF-8"))
    finally out.close()
    next
  }

  /** The ACTIVE segment set — the newest committed version's list. */
  def committedSegments(spark: SparkSession, indexDir: String): Seq[Long] = {
    val vs = listVersions(spark, indexDir)
    if (vs.isEmpty) Seq.empty else readVersion(spark, indexDir, vs.max)
  }

  /** Union of every retained version's segment list — the
    * replay-idempotence domain (a compacted-away epoch must stay a
    * no-op). */
  def allSegmentsEver(spark: SparkSession, indexDir: String): Seq[Long] =
    listVersions(spark, indexDir)
      .flatMap(v => readVersion(spark, indexDir, v)).distinct.sorted

  /** Retention step 1: keep the newest `keepVersions` marker files,
    * delete the rest, and return the segment ids the RETAINED versions
    * still reference (the survivors any vacuum must keep on disk). */
  def retainVersions(spark: SparkSession, indexDir: String,
                     keepVersions: Int): Set[Long] = {
    require(keepVersions >= 1, "keepVersions must be >= 1")
    val dir = versionsPath(indexDir)
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) return Set.empty
    val versions = listVersions(spark, indexDir)
    versions.dropRight(keepVersions).foreach(v =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, f"$v%020d"), false))
    versions.takeRight(keepVersions)
      .flatMap(v => readVersion(spark, indexDir, v)).toSet
  }

  /** Manifest↔directory consistency report — [[graft.io.Cow.fsck]]'s
    * classification carried to segment stores. One row per segment id
    * seen on disk or in any retained version:
    *
    *   - `ok`: in the ACTIVE (newest) version and present in every
    *     table directory — what queries actually read;
    *   - `historical`: referenced only by an older retained version,
    *     still on disk (awaiting [[retainVersions]]/vacuum);
    *   - `orphan`: on disk but referenced by NO retained version — a
    *     crashed half-write (never committed); harmless to readers
    *     (never scanned: `seg` partition filters come from version
    *     files) and reclaimed by the next vacuum's dead-segment sweep;
    *   - `missing`: referenced by a retained version but absent from
    *     one or more table directories — real corruption; if the
    *     version is active, queries WILL lose rows.
    *
    * `n_tables_present`/`n_tables` diagnose partial trees (a segment
    * present in postings but not doclen is `missing` with 3/4).
    * Driver-side directory listings only — never data IO.
    */
  def fsck(spark: SparkSession, indexDir: String,
           tables: Seq[String]): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    val active = committedSegments(spark, indexDir).toSet
    val retained = allSegmentsEver(spark, indexDir).toSet
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = fsOf(spark, root)
    val presentCount: Map[Long, Int] = (for {
      table <- tables
      p = new org.apache.hadoop.fs.Path(s"$indexDir/$table")
      if fs.exists(p)
      st <- fs.listStatus(p)
      if st.isDirectory && st.getPath.getName.startsWith("seg=")
    } yield st.getPath.getName.stripPrefix("seg=").toLong)
      .groupBy(identity).view.mapValues(_.size).toMap
    (retained ++ presentCount.keySet).toSeq.sorted.map { s =>
      val n = presentCount.getOrElse(s, 0)
      val status =
        if (active(s) && n == tables.size) "ok"
        else if (active(s)) "missing"
        else if (retained(s) && n > 0) "historical"
        else if (n > 0) "orphan"
        else "missing" // referenced by an old version only, and gone
      (s, status, n, tables.size)
    }.toDF("seg", "status", "n_tables_present", "n_tables")
  }

  /** Retention step 2: under each `<indexDir>/<table>` directory,
    * delete every `seg=<s>` tree whose id is not in `retained`.
    * Returns the deleted segment ids (distinct, sorted). */
  def deleteDeadSegments(spark: SparkSession, indexDir: String,
                         tables: Seq[String],
                         retained: Set[Long]): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(indexDir)
    val fs = fsOf(spark, root)
    (for {
      table <- tables
      p = new org.apache.hadoop.fs.Path(s"$indexDir/$table")
      if fs.exists(p)
      st <- fs.listStatus(p)
      if st.isDirectory && st.getPath.getName.startsWith("seg=")
      seg = st.getPath.getName.stripPrefix("seg=").toLong
      if !retained.contains(seg)
    } yield { fs.delete(st.getPath, true); seg }).distinct.sorted
  }
}
