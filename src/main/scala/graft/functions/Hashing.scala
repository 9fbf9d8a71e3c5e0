package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Portable deterministic hashing used by dedup/similarity operators.
  *
  * Spark's native `hash`/`xxhash64` are Murmur3/xxHash with Spark-specific
  * seeding, which no other engine reproduces. For oracle-checkable
  * operators we derive 60-bit integers from md5 (identical in every
  * engine): hash64(s, seed) = int(hex(md5(seed || '|' || s))[0:15]).
  * Interior operators that never cross the engine boundary are free to use
  * `xxhash64` instead (cheaper); the oracle-facing path pays one md5 per
  * token, still codegen'd and row-local.
  */
object Hashing {

  /** 60-bit salted hash of a string column, identical to DuckDB's
    * `CAST('0x' || substr(md5(seed || '|' || s), 1, 15) AS BIGINT)`.
    */
  def hash64(c: Column, seed: Int): Column =
    conv(substring(md5(concat(lit(s"$seed|"), c).cast("binary")), 1, 15),
         16, 10).cast("long")

  /** SQL fragment computing the same value in DuckDB. */
  def hash64Sql(expr: String, seed: Int): String =
    s"CAST(('0x' || substr(md5('$seed|' || ($expr)), 1, 15)) AS BIGINT)"
}
