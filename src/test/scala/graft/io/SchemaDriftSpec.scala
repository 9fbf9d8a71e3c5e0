package graft.io

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class SchemaDriftSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("drift").toString

  test("compareSchemas: added/dropped/type/logical drift from footers") {
    val a = tmp(); val b = tmp()
    Seq((1L, "x", 1.5, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "name", "score", "ts")
      .write.mode("overwrite").parquet(a)
    // after: name dropped, tag added, score double->long (type change),
    // ts stored as raw long (logical annotation disappears)
    Seq((1L, 2L, 9L, "t"))
      .toDF("id", "score", "ts", "tag")
      .write.mode("overwrite").parquet(b)
    val d = SchemaDrift.compareSchemas(spark, a, b).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d("name") == "dropped" && d("tag") == "added" &&
      d("score") == "type_changed")
    // timestamp vs raw long: INT96 writer -> type change, INT64 writer
    // -> logical-annotation change; either way it is flagged
    assert(Seq("type_changed", "logical_changed").contains(d("ts")))
    assert(d.size == 4)
    // identical schemas -> empty diff
    assert(SchemaDrift.compareSchemas(spark, a, a).count() == 0)
  }

  test("compareSchemas: timestamp-unit class = same primitive, new logical") {
    val a = tmp(); val b = tmp()
    // both sides INT64; before annotated TIMESTAMP(MILLIS), after raw
    Seq((1L, 1704067200000L)).toDF("id", "ts")
      .withColumn("ts", timestamp_millis(col("ts")))
      .write.mode("overwrite").parquet(a)
    Seq((1L, 1704067200000000L)).toDF("id", "ts")
      .write.mode("overwrite").parquet(b)
    val d = SchemaDrift.compareSchemas(spark, a, b)
      .filter($"column" === "ts").collect()
    assert(d.length == 1)
    // stored TIMESTAMP (INT64-backed) vs raw INT64: flagged either as a
    // type or logical change, never silent
    assert(Seq("type_changed", "logical_changed").contains(d(0).getString(1)))
  }

  test("statsDrift: 1000x unit shift shows as range_ratio ~ 1000") {
    val a = tmp(); val b = tmp()
    val base = (1 to 1000).map(i => (i.toLong, i * 1000L, if (i % 10 == 0) null else s"v$i"))
    base.toDF("id", "ts", "tag").write.mode("overwrite").parquet(a)
    base.map { case (id, ts, tag) => (id, ts * 1000L, tag) }
      .toDF("id", "ts", "tag").write.mode("overwrite").parquet(b)
    val d = SchemaDrift.statsDrift(spark, a, b, Seq("id", "ts", "tag"))
      .collect().map(r => r.getString(0) -> r).toMap
    val ratio = d("ts").getAs[Double]("range_ratio")
    assert(math.abs(ratio - 1000.0) < 1e-9, s"ratio $ratio")
    assert(d("id").getAs[Double]("range_ratio") == 1.0)
    // non-numeric: min/max reported, ratio null
    assert(d("tag").isNullAt(d("tag").fieldIndex("range_ratio")))
    assert(math.abs(d("tag").getAs[Double]("null_rate_after") - 0.1) < 1e-9)
  }
}
