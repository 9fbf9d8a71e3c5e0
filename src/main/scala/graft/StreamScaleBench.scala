package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamOps

/** Streaming leg of the scale-evidence bench (round-10 verdict task
  * #1): replay the ×1/×10/×100 `events`/`documents` replicas through
  * REAL micro-batches — a file source consuming 10 time-sliced parquet
  * files, one per trigger — against every streaming sink the engine
  * ships, and publish rows/s, per-batch latency, and state size, so
  * the streaming 100 TB claims (state bounded by live keys, per-batch
  * cost ∝ batch, not ∝ history) rest on measurements like the batch
  * side has since round 10.
  *
  * Slice prep (`ensureStreamSlices`): the replica table is split into
  * 10 contiguous slices by event time (`events`) or id (`documents`),
  * one parquet file per slice, file mtimes strictly increasing — the
  * file source with `maxFilesPerTrigger=1` then replays them as 10
  * in-order micro-batches whose size grows with the factor (×100 ⇒
  * 1M-event batches), which is exactly the "same stream, 100× the
  * volume" experiment. Time-contiguous slices keep cross-batch
  * disorder at the slice boundary, inside every watermark used here.
  *
  * Metrics come from the engine's own `StreamingQueryProgress`: wall
  * clock over all triggers (rows/s), per-trigger `triggerExecution`
  * latency (first/median/last — a last/first ratio near 1 IS the
  * cost-∝-batch-not-history evidence), and state size from
  * `stateOperators` (rows + memory) for the transformWithState sinks
  * or the on-disk index/table footprint for the foreachBatch sinks
  * (their "state" is the maintained artifact itself).
  *
  * Invoked from [[ScaleBench]] (sections arg) or standalone:
  * `runMain graft.StreamScaleBench [baseDir] [factorsCsv]`.
  */
object StreamScaleBench {

  val Slices = 10

  case class SinkRun(wallSec: Double, rows: Long, batchMsFirst: Long,
                     batchMsMed: Long, batchMsLast: Long,
                     stateRows: Long, stateMb: Double) {
    def rowsPerSec: Double =
      if (wallSec > 0) rows / wallSec else 0.0
  }

  /** 10 one-file-per-slice parquet files with increasing mtimes under
    * /tmp/graft_scale/<base>/stream/x<factor>/<table>; idempotent via
    * a `_READY` marker keyed by (base, factor, table). */
  def ensureStreamSlices(spark: SparkSession, baseDir: String,
                         dataDir: String, factor: Int, table: String,
                         orderCol: String): String = {
    val base = java.nio.file.Paths.get(baseDir).getFileName.toString
    val out = s"/tmp/graft_scale/$base/stream/x$factor/$table"
    val ready = java.nio.file.Paths.get(out, "_READY")
    if (java.nio.file.Files.exists(ready)) return out
    val outP = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(outP)
    val src = spark.read.parquet(s"$dataDir/$table.parquet")
    val tmp = s"$out/__build"
    // one global sort at prep time (not measured) tiles the table into
    // contiguous ranges; repartition by tile gives one file per slice
    src.withColumn("__tile", org.apache.spark.sql.functions.ntile(Slices)
        .over(org.apache.spark.sql.expressions.Window.orderBy(col(orderCol))))
      .repartition(Slices, col("__tile"))
      .write.partitionBy("__tile").mode("overwrite").parquet(tmp)
    import scala.jdk.CollectionConverters._
    val t0 = System.currentTimeMillis() - 3600 * 1000L
    for (i <- 1 to Slices) {
      val tileDir = java.nio.file.Paths.get(tmp, s"__tile=$i")
      val parts = java.nio.file.Files.list(tileDir).iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toSeq
      require(parts.size == 1,
        s"expected 1 file for slice $i of $table, got ${parts.size}")
      val dst = outP.resolve(f"slice_$i%02d.parquet")
      java.nio.file.Files.move(parts.head, dst,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(t0 + i * 1000L))
    }
    // drop the build scaffolding so the file source sees ONLY slices
    java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
      .sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
    java.nio.file.Files.write(ready, Array.emptyByteArray)
    out
  }

  private def fileStream(spark: SparkSession, sliceDir: String,
                         schema: org.apache.spark.sql.types.StructType
                        ): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(sliceDir)

  private def dirMb(path: String): Double = {
    import scala.jdk.CollectionConverters._
    val p = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(p)) return 0.0
    java.nio.file.Files.walk(p).iterator().asScala
      .filter(java.nio.file.Files.isRegularFile(_))
      .map(java.nio.file.Files.size).sum / 1e6
  }

  /** Start the sink, drain every slice, and distill its progress
    * events. `rows` is the replayed row count (progress-event
    * `numInputRows` over-counts foreachBatch sinks: every action the
    * batch body runs re-scans the batch file, the standard
    * scans-are-cheap Spark trade, but 3-4× the true input count).
    * `stateDir` (foreachBatch sinks) swaps the state-store metrics for
    * the maintained artifact's on-disk footprint. */
  private def measure(start: => org.apache.spark.sql.streaming.StreamingQuery,
                      rows: Long, stateDir: Option[String]): SinkRun = {
    val t0 = System.nanoTime()
    val q = start
    try q.processAllAvailable() finally q.stop()
    val wall = (System.nanoTime() - t0) / 1e9
    val progs = q.recentProgress.filter(_.numInputRows > 0)
    val lat = progs.map(_.durationMs.get("triggerExecution").longValue())
    val sortedLat = lat.sorted
    val (stRows, stMb) = stateDir match {
      case Some(d) => (-1L, dirMb(d))
      case None =>
        val last = progs.lastOption
        (last.map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(0L),
          last.map(_.stateOperators.map(_.memoryUsedBytes).sum)
            .getOrElse(0L) / 1e6)
    }
    SinkRun(wall, rows,
      lat.headOption.getOrElse(0L),
      if (sortedLat.nonEmpty) sortedLat(sortedLat.length / 2) else 0L,
      lat.lastOption.getOrElse(0L), stRows, stMb)
  }

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** Run all eleven sinks at one factor (the original six + the drift
    * family + the per-key quantile state, round-11 verdict task #7).
    * `dataDir` is the (replica) table directory. Returns
    * sink → metrics, insertion-ordered. */
  def runFactor(spark: SparkSession, baseDir: String, dataDir: String,
                factor: Int
               ): Seq[(String, SinkRun)] = {
    import spark.implicits._
    val evDir = ensureStreamSlices(spark, baseDir, dataDir, factor,
      "events", "ts")
    val docDir = ensureStreamSlices(spark, baseDir, dataDir, factor,
      "documents", "doc_id")
    val evSchema = spark.read.parquet(s"$dataDir/events.parquet").schema
    val docSchema = spark.read
      .parquet(s"$dataDir/documents.parquet").schema
    // parquet ts lands as TIMESTAMP_NTZ; watermarks require TIMESTAMP
    def events() = fileStream(spark, evDir, evSchema)
      .select(col("ts").cast("timestamp").as("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[StreamOps.Event]
    def docs() = fileStream(spark, docDir, docSchema)

    val evRows = spark.read.parquet(s"$dataDir/events.parquet").count()
    val docRows = spark.read
      .parquet(s"$dataDir/documents.parquet").count()

    val out = scala.collection.mutable.ArrayBuffer[(String, SinkRun)]()
    def run(name: String, rows: Long, stateDir: Option[String] = None)(
        start: => org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val m = measure(start, rows, stateDir)
      out += name -> m
      println(f"SCALE stream_$name%-18s x$factor%-4d ${m.wallSec}%8.2f s  " +
        f"(${m.rows} rows, ${m.rowsPerSec}%.0f rows/s, " +
        f"batch ms first/med/last ${m.batchMsFirst}/${m.batchMsMed}/" +
        f"${m.batchMsLast}, state ${m.stateRows} rows / ${m.stateMb}%.1f MB)")
    }

    // event-time sessionization on transformWithState (RocksDB state)
    run("sessionize", evRows) {
      StreamOps.sessionizeTws(events(), gapSec = 1800,
          watermarkDelay = "60 seconds")
        .writeStream.format("noop")
        .option("checkpointLocation", tmpDir("ssb_sess_ck"))
        .outputMode("append").start()
    }
    // watermark-buffered CUSUM recurrence (ValueState + event buffer)
    run("cusum", evRows) {
      StreamOps.cusumStream(events(), target = 10.0, slack = 1.0,
          threshold = 5.0, watermarkDelay = "60 seconds")
        .writeStream.format("noop")
        .option("checkpointLocation", tmpDir("ssb_cusum_ck"))
        .outputMode("append").start()
    }
    // incremental curation pipeline (its state = the on-disk indexes)
    locally {
      val dir = tmpDir("ssb_cur")
      run("curation", docRows, stateDir = Some(dir)) {
        StreamOps.curationSink(docs(), dir,
          blocklist = Seq("xxx"), minChars = 10, maxChars = 1000000,
          minJaccard = 0.8, checkpointDir = tmpDir("ssb_cur_ck"))
      }
    }
    // live inverted text index (state = the segmented index)
    locally {
      val dir = tmpDir("ssb_ti")
      graft.ext.Retrieval.saveTextIndex(
        spark.createDataFrame(Seq.empty[(Long, String)])
          .toDF("doc_id", "text"),
        "doc_id", "text", dir, nBuckets = 16)
      run("text_index", docRows, stateDir = Some(dir)) {
        StreamOps.textIndexSink(docs(), "doc_id", "text", dir,
          checkpointDir = tmpDir("ssb_ti_ck"), nBuckets = 16)
      }
    }
    // exactly-once zone-mapped table (state = table + manifest)
    locally {
      val table = tmpDir("ssb_tbl")
      val manifest = tmpDir("ssb_mf")
      run("table_sink", evRows, stateDir = Some(table)) {
        StreamOps.exactlyOnceTableSink(
          fileStream(spark, evDir, evSchema), table, manifest,
          zoneCols = Seq("event_id", "user_id"),
          checkpointDir = tmpDir("ssb_tbl_ck"))
      }
    }
    // live segmented IVF vector index (state = the on-disk index).
    // Seeded with just the 16 centroid vectors (the model is fixed at
    // init); the stream then replays the whole embeddings replica, so
    // those 16 ids land twice — a 16-row contract blemish that is
    // irrelevant to throughput and keeps the replayed volume exactly
    // the table.
    locally {
      val embDir = ensureStreamSlices(spark, baseDir, dataDir, factor,
        "embeddings", "vec_id")
      val embSchema = spark.read
        .parquet(s"$dataDir/embeddings.parquet").schema
      val embRows = spark.read.parquet(s"$dataDir/embeddings.parquet").count()
      val dir = tmpDir("ssb_ivf")
      graft.ext.Similarity.initIvfIndex(
        spark.read.parquet(s"$dataDir/embeddings.parquet")
          .filter(col("vec_id") < 16),
        "vec_id", "embedding", centroidIds = 0L to 15L, indexDir = dir)
      run("ivf_index", embRows, stateDir = Some(dir)) {
        StreamOps.ivfIndexSink(fileStream(spark, embDir, embSchema),
          "vec_id", "embedding", dir,
          checkpointDir = tmpDir("ssb_ivf_ck"))
      }
    }
    // drift family (round-11 verdict task #7): per-batch cost must be
    // ∝ the batch PLUS a FIXED reference term — the reference is
    // always the sf-base table (never the replica), so across factors
    // only the batch side grows; a flat per-batch latency curve at
    // ×100 would mean the reference dominates, a ∝F curve means the
    // batch side does (both are fine at 100 TB as long as neither is
    // ∝ history — the state column, one appended row per batch, pins
    // that). References are localCheckpoint()ed once (the sinks'
    // documented keep-it-persisted contract: they re-aggregate the
    // reference every micro-batch).
    locally {
      val refVals = spark.read.parquet(s"$baseDir/events.parquet")
        .select(floor(col("value")).cast("long").as("v")).localCheckpoint()
      val ksOut = tmpDir("ssb_ksd")
      run("ks_drift", evRows, stateDir = Some(ksOut)) {
        StreamOps.ksDriftSink(
          fileStream(spark, evDir, evSchema)
            .select(floor(col("value")).cast("long").as("v")),
          "v", refVals, alarmAt = 0.3, outDir = ksOut,
          checkpointDir = tmpDir("ssb_ksd_ck"))
      }
      val emdOut = tmpDir("ssb_emdd")
      run("emd_drift", evRows, stateDir = Some(emdOut)) {
        StreamOps.emdDriftSink(
          fileStream(spark, evDir, evSchema)
            .select(floor(col("value")).cast("long").as("v")),
          "v", refVals, alarmAt = 1000.0, outDir = emdOut,
          checkpointDir = tmpDir("ssb_emdd_ck"))
      }
      val psiOut = tmpDir("ssb_psid")
      val refBins = spark.read.parquet(s"$baseDir/events.parquet")
        .select(floor(col("value") / 10).cast("long").as("bin"))
        .localCheckpoint()
      run("psi_drift", evRows, stateDir = Some(psiOut)) {
        StreamOps.driftSink(
          fileStream(spark, evDir, evSchema)
            .select(floor(col("value") / 10).cast("long").as("bin")),
          col("bin"), refBins, col("bin"), alarmAt = 0.2,
          outDir = psiOut, checkpointDir = tmpDir("ssb_psid_ck"))
      }
      val chiOut = tmpDir("ssb_chid")
      val refCat = spark.read.parquet(s"$baseDir/events.parquet")
        .select(col("event_type").as("cat")).localCheckpoint()
      run("chi2_drift", evRows, stateDir = Some(chiOut)) {
        StreamOps.chi2DriftSink(
          fileStream(spark, evDir, evSchema)
            .select(col("event_type").as("cat")),
          "cat", refCat, "cat", alarmAt = 9.21, outDir = chiOut,
          checkpointDir = tmpDir("ssb_chid_ck"))
      }
    }
    // per-key sketch-state sinks: state ∝ |keys| (event types), not
    // history — the state column must stay flat across factors while
    // rows/s grows
    locally {
      val qsTbl = tmpDir("ssb_qst")
      run("quantile_state", evRows, stateDir = Some(qsTbl)) {
        StreamOps.quantileStateSink(
          fileStream(spark, evDir, evSchema)
            .select(col("event_type").as("g"), col("value").as("v")),
          Seq("g"), "v", tablePath = qsTbl,
          checkpointDir = tmpDir("ssb_qst_ck"))
      }
    }
    out.toSeq
  }

  /** factor → sink → metrics, for every requested factor. */
  def run(spark: SparkSession, baseDir: String, factors: Seq[Int]
         ): Seq[(Int, Seq[(String, SinkRun)])] = {
    val prior = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    try factors.map { f =>
      val dataDir =
        if (f == 1) baseDir else ScaleBench.ensureReplica(spark, baseDir, f)
      f -> runFactor(spark, baseDir, dataDir, f)
    } finally prior match {
      case Some(p) => spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset(
        "spark.sql.streaming.stateStore.providerClass")
    }
  }

  def toJson(results: Seq[(Int, Seq[(String, SinkRun)])]): String = {
    val bySink = scala.collection.mutable.LinkedHashMap[
      String, scala.collection.mutable.LinkedHashMap[Int, SinkRun]]()
    results.foreach { case (f, sinks) =>
      sinks.foreach { case (name, m) =>
        bySink.getOrElseUpdate(name,
          scala.collection.mutable.LinkedHashMap()).update(f, m)
      }
    }
    bySink.map { case (name, byF) =>
      s""""$name":{${byF.map { case (f, m) =>
        f""""$f":{"sec":${m.wallSec},"rows":${m.rows},""" +
          f""""rows_per_s":${m.rowsPerSec}%.0f,""" +
          s""""batch_ms_first":${m.batchMsFirst},""" +
          s""""batch_ms_med":${m.batchMsMed},""" +
          s""""batch_ms_last":${m.batchMsLast},""" +
          f""""state_rows":${m.stateRows},"state_mb":${m.stateMb}%.1f}"""
      }.mkString(",")}}"""
    }.mkString("{", ",", "}")
  }

  def markdown(results: Seq[(Int, Seq[(String, SinkRun)])]): String = {
    val factors = results.map(_._1)
    val bySink = results.flatMap { case (f, sinks) =>
      sinks.map { case (n, m) => (n, f, m) }
    }.groupBy(_._1)
    val names = results.headOption.map(_._2.map(_._1)).getOrElse(Seq.empty)
    val sb = new StringBuilder
    sb.append("| sink | ")
      .append(factors.map(f => s"x$f rows/s | x$f batch ms f/m/l | " +
        s"x$f state").mkString(" | ")).append(" |\n")
    sb.append("|---|").append(factors.flatMap(_ => Seq("---|", "---|", "---|"))
      .mkString).append("\n")
    names.foreach { n =>
      val cells = factors.flatMap { f =>
        bySink(n).find(_._2 == f).map(_._3) match {
          case Some(m) => Seq(
            f"${m.rowsPerSec}%.0f",
            s"${m.batchMsFirst}/${m.batchMsMed}/${m.batchMsLast}",
            if (m.stateRows >= 0) f"${m.stateRows} rows"
            else f"${m.stateMb}%.0f MB")
          case None => Seq("—", "—", "—")
        }
      }
      sb.append(s"| stream_$n | ${cells.mkString(" | ")} |\n")
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    // ERROR, not WARN: the streaming engine logs per-trigger advisories
    // (AQE-disabled, job-group cancels) that at 10 batches x 6 sinks x
    // 3 factors drown the SCALE lines
    spark.sparkContext.setLogLevel("ERROR")
    val results = run(spark, baseDir, factors)
    println("\n" + markdown(results))
    ScaleBench.writeScaleJson(streaming = Some(toJson(results)))
    spark.stop()
  }
}
