package graft.io

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema / physical-type drift detection between two versions of a
  * parquet table — the generalization of the round-6 events incident,
  * where a testdata regeneration silently switched the `ts` column from
  * INT64(TIMESTAMP NANOS) to `timestamp[us]` and every event-time query
  * produced garbage until a footer probe caught it. The lesson as an
  * operator: before pointing a pipeline at a "refreshed" table, diff it
  * against the previous version at three levels —
  *
  *   1. [[compareSchemas]]: parquet FOOTER level — columns added /
  *      dropped, primitive type changes, and LOGICAL-annotation changes
  *      (the timestamp-unit case: same INT64, different meaning).
  *      Catches exactly the class of drift Spark's own schema
  *      inference hides (it maps several physical encodings to one
  *      Spark type).
  *   2. [[statsDrift]]: DATA level — per-column min / max / null-rate
  *      on both sides, one scan each, full-outer-joined by column. A
  *      unit change that survives the footer check (e.g. seconds vs
  *      millis both stored as plain INT64) shows up as a ~1000×
  *      min/max shift.
  *
  * Scale: compareSchemas is driver-side over ONE file footer per side
  * (column count, not data, bounds the work — same discipline as
  * [[graft.ext.Events.tsNanosFactor]]). statsDrift is one
  * partial-aggregated scan per side producing |cols| rows; no shuffle
  * wider than the column list.
  */
object SchemaDrift {

  /** One parquet leaf field: name, repetition, primitive type, logical
    * annotation (or "-").
    */
  private def footerFields(spark: SparkSession,
                           pathStr: String): Map[String, (String, String)] = {
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
      schema.getFields.asScala.map { f =>
        val (prim, logical) =
          if (f.isPrimitive) {
            val p = f.asPrimitiveType()
            (p.getPrimitiveTypeName.toString,
              Option(p.getLogicalTypeAnnotation).map(_.toString).getOrElse("-"))
          } else ("GROUP", "-")
        f.getName -> (prim, logical)
      }.toMap
    } finally reader.close()
  }

  /** Footer-level diff `before` → `after`: one row per drifted column,
    * `(column, kind, before, after)` with kind ∈ {added, dropped,
    * type_changed, logical_changed}. Empty result = physically
    * identical schemas. `logical_changed` is the silent-corruption
    * class: same primitive bytes, different meaning (TIMESTAMP(NANOS)
    * vs TIMESTAMP(MICROS), DECIMAL scale changes, UTF8 vs raw binary).
    */
  def compareSchemas(spark: SparkSession, beforePath: String,
                     afterPath: String): DataFrame = {
    import spark.implicits._
    val b = footerFields(spark, beforePath)
    val a = footerFields(spark, afterPath)
    val rows = Seq.newBuilder[(String, String, String, String)]
    for ((name, (bp, bl)) <- b) a.get(name) match {
      case None => rows += ((name, "dropped", s"$bp $bl", "-"))
      case Some((ap, al)) =>
        if (bp != ap) rows += ((name, "type_changed", bp, ap))
        else if (bl != al) rows += ((name, "logical_changed", bl, al))
    }
    for ((name, (ap, al)) <- a if !b.contains(name))
      rows += ((name, "added", "-", s"$ap $al"))
    rows.result().sortBy(r => (r._1, r._2))
      .toDF("column", "kind", "before", "after")
  }

  /** Data-level drift for `cols`: per column, both sides' min / max
    * (reported as strings for type-generality) and null rate, plus
    * `range_ratio` — (max−min)_after / (max−min)_before for numeric
    * columns (null otherwise) — the single number that screams "unit
    * change" (≈1000 or ≈0.001) even when the footer is unchanged.
    * One scan per side; output is |cols| rows.
    */
  def statsDrift(spark: SparkSession, beforePath: String, afterPath: String,
                 cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    def sideStats(path: String, tag: String): DataFrame = {
      val df = spark.read.parquet(path)
      val numeric = df.schema.fields.map(f => f.name ->
        f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]).toMap
      val aggs = cols.flatMap { c =>
        Seq(min(col(c)).cast("string").as(s"${c}__min"),
          max(col(c)).cast("string").as(s"${c}__max"),
          (if (numeric.getOrElse(c, false))
            (max(col(c)) - min(col(c))).cast("double")
          else lit(null).cast("double")).as(s"${c}__range"),
          avg(col(c).isNull.cast("double")).as(s"${c}__nullrate"))
      }
      val one = df.agg(aggs.head, aggs.tail: _*)
      // unpivot |cols| columns → |cols| rows, all driver-free
      val pieces = cols.map { c =>
        one.select(lit(c).as("column"),
          col(s"${c}__min").as(s"min_$tag"),
          col(s"${c}__max").as(s"max_$tag"),
          col(s"${c}__range").as(s"range_$tag"),
          col(s"${c}__nullrate").as(s"null_rate_$tag"))
      }
      pieces.reduce(_ unionAll _)
    }
    sideStats(beforePath, "before")
      .join(sideStats(afterPath, "after"), Seq("column"), "full_outer")
      .withColumn("range_ratio",
        when(col("range_before").isNotNull && col("range_before") =!= 0.0,
          col("range_after") / col("range_before")))
      .orderBy(col("column"))
  }
}
