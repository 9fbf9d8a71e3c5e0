package graft.ext

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-table loading, robust to the physical timestamp unit.
  *
  * The driver's `events` parquet has shipped `ts` in two different
  * encodings across regenerations: INT64 annotated TIMESTAMP(NANOS)
  * (which Spark's vectorized reader rejects under schema inference —
  * PARQUET_TYPE_ILLEGAL) and INT64 annotated TIMESTAMP(MICROS,
  * isAdjustedToUTC=false). Hardcoding either unit silently corrupts
  * every event-time query when the other shows up (the round-6
  * incident: a year of events compressed into ~9 hours). So the loader
  * reads the column's actual parquet logical type from the file footer
  * and normalizes:
  *
  *   - a user schema `ts LONG` reads the underlying INT64 raw in the
  *     file's native unit, whatever the annotation says (scoped to this
  *     read, no session-global legacy flag);
  *   - the footer's TimestampLogicalTypeAnnotation unit (NANOS / MICROS
  *     / MILLIS) gives the exact multiplier to epoch nanos; an
  *     unannotated INT64 keeps the legacy raw-nanos contract;
  *   - `ts` is then normalized to epoch NANOS (exact integer multiply;
  *     micros×1000 fits a long until year 2262) so every downstream
  *     consumer sees one fixed contract, and `ts_sec` / `ts_us` derive
  *     with exact integer arithmetic (an ns epoch ~1.7e18 does not fit
  *     double's 53-bit mantissa).
  *
  * Scale note: the footer probe is one driver-side read of a single
  * file footer per distinct path (cached) — at cluster scale the table
  * is a directory of parts with a uniform unit, and we read the first
  * part's footer only. The guard spec in ExtSpec cross-checks the
  * normalized values against Spark's own native timestamp read, so a
  * future regeneration that changes the unit again fails loudly instead
  * of silently scaling every window.
  */
object Events {

  /** Raw read schema: `ts` as the file's physical INT64, unit-agnostic. */
  val EventsSchema: String =
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, " +
      "value DOUBLE, props STRING"

  /** Footer probes are immutable-per-path within a run; cache them so the
    * 17 query call sites cost one filesystem read, not 17.
    */
  private val factorCache = new ConcurrentHashMap[String, java.lang.Long]()

  /** Multiplier converting the file's raw INT64 `ts` to epoch nanos,
    * from the parquet footer's timestamp annotation: NANOS→1,
    * MICROS→1000, MILLIS→1e6; unannotated INT64 → 1 (legacy raw-nanos
    * contract). Public so tests and raw streaming reads can apply the
    * same normalization as [[loadEvents]].
    */
  def tsNanosFactor(spark: SparkSession, dir: String): Long = {
    val path = s"$dir/events.parquet"
    factorCache.computeIfAbsent(path, p => readTsNanosFactor(spark, p))
  }

  private def readTsNanosFactor(spark: SparkSession, pathStr: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val root = new Path(pathStr)
    val fs = root.getFileSystem(conf)
    val file =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root)
          .find(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .map(_.getPath)
          .getOrElse(throw new IllegalArgumentException(
            s"no parquet part files under $pathStr"))
      else root
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val schema = reader.getFooter.getFileMetaData.getSchema
      val prim = schema.getType(schema.getFieldIndex("ts")).asPrimitiveType()
      prim.getLogicalTypeAnnotation match {
        case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
          t.getUnit match {
            case TimeUnit.NANOS  => 1L
            case TimeUnit.MICROS => 1000L
            case TimeUnit.MILLIS => 1000000L
          }
        case _ => 1L
      }
    } finally reader.close()
  }

  /** events with `ts` normalized to epoch nanos (long) plus `ts_sec`
    * (epoch seconds, floor) and `ts_us` (epoch micros, floor) companion
    * columns — the same contract whatever unit the file stores.
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    val factor = tsNanosFactor(spark, dir)
    val raw = spark.read.schema(EventsSchema).parquet(s"$dir/events.parquet")
    val norm =
      if (factor == 1L) raw
      else raw.withColumn("ts", col("ts") * lit(factor))
    norm
      .withColumn("ts_sec", expr("ts div 1000000000"))
      .withColumn("ts_us", expr("ts div 1000"))
  }

  /** events with a proper TimestampType `ts` (microsecond floor) — the
    * form Structured Streaming and window() functions consume.
    */
  def loadEventsTimestamped(spark: SparkSession, dir: String): DataFrame =
    loadEvents(spark, dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .drop("ts_us")
}
