package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-table loading. The driver's `events` parquet stores
  * TIMESTAMP(NANOS), which Spark's vectorized reader rejects outright
  * (PARQUET_TYPE_ILLEGAL) under schema inference. Supplying an explicit
  * user schema with `ts LONG` reads the underlying INT64 nanos directly —
  * scoped to this read, no session-global legacy flag — and whole-second
  * / microsecond views derive with exact integer arithmetic (an ns epoch
  * ~1.7e18 does not fit double's 53-bit mantissa).
  */
object Events {

  /** The events table with `ts` as raw nanos (INT64). */
  val EventsSchema: String =
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, " +
      "value DOUBLE, props STRING"

  /** events with `ts` as raw nanos (long) plus `ts_sec` (epoch seconds,
    * floor) and `ts_us` (epoch micros, floor) companion columns.
    */
  def loadEvents(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(EventsSchema).parquet(s"$dir/events.parquet")
      .withColumn("ts_sec", expr("ts div 1000000000"))
      .withColumn("ts_us", expr("ts div 1000"))

  /** events with a proper TimestampType `ts` (microsecond floor) — the
    * form Structured Streaming and window() functions consume.
    */
  def loadEventsTimestamped(spark: SparkSession, dir: String): DataFrame =
    loadEvents(spark, dir)
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .drop("ts_us")
}
