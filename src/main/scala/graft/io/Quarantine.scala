package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Corrupt-record quarantine for semi-structured ingest (JSON lines /
  * CSV). At 100 TB a malformed row must neither abort a multi-hour job
  * (FAILFAST) nor vanish (DROPMALFORMED) — the only scale-sane policy
  * is PERMISSIVE parsing with the raw text of every rejected line
  * routed to a quarantine channel for re-ingestion after the producer
  * is fixed.
  *
  * Mechanics: the file is scanned ONCE as raw text and parsed row-ated
  * locally with `from_json` / `from_csv` carrying a corrupt-record
  * field inside the parse schema — a line that fails to parse (or
  * holds a field contradicting the schema, for JSON) surfaces its
  * verbatim text there. Splitting on that field's nullness yields:
  *
  *   - `good`: the caller's schema;
  *   - `bad`: `(raw)` — the rejected line, ready for a parquet
  *     quarantine sink.
  *
  * Deliberately NOT the json/csv datasource with
  * `columnNameOfCorruptRecord`: Spark disallows plans whose file scan
  * projects only the corrupt column (the quarantine side is exactly
  * that), and the documented workaround — cache the full parse — is
  * not a 100 TB option. Text-scan + parse expression has no such
  * restriction, keeps parse and split row-local (no shuffle), and the
  * text scan prunes to one string column by construction.
  */
object Quarantine {

  val CorruptCol = "_graft_corrupt"

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(CorruptCol, StringType))

  private val parseOpts = Map(
    "mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)

  /** JSON-lines read with quarantine: `(good, bad)`. A line lands in
    * `bad` when it is not valid JSON or a field's type contradicts
    * `schema`; missing fields are null, not corrupt (JSON is
    * schema-on-read). Blank lines are skipped, matching the json
    * datasource.
    */
  def readJsonQuarantined(spark: SparkSession, path: String,
                          schema: StructType): (DataFrame, DataFrame) = {
    val raw = spark.read.text(path).filter(length(trim(col("value"))) > 0)
    split(raw, from_json(col("value"), withCorrupt(schema), parseOpts), schema)
  }

  /** CSV read with quarantine — same contract; malformed = wrong
    * column count or (for from_csv's parser) an unparsable line. When
    * `header` is true the header text is read driver-side from the
    * first file (one line, O(1)) and matching lines are dropped —
    * multi-file tables are assumed header-uniform, and a data row
    * identical to the header is indistinguishable from it by
    * definition.
    */
  def readCsvQuarantined(spark: SparkSession, path: String,
                         schema: StructType,
                         header: Boolean = false): (DataFrame, DataFrame) = {
    val raw0 = spark.read.text(path).filter(length(trim(col("value"))) > 0)
    val raw = if (!header) raw0 else {
      val h = firstLine(spark, path)
      raw0.filter(col("value") =!= lit(h))
    }
    split(raw, from_csv(col("value"), withCorrupt(schema), parseOpts), schema)
  }

  private def firstLine(spark: SparkSession, pathStr: String): String = {
    val root = new org.apache.hadoop.fs.Path(pathStr)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val file =
      if (fs.getFileStatus(root).isDirectory)
        fs.listStatus(root).filter(_.isFile).map(_.getPath)
          .filterNot(p => p.getName.startsWith("_") || p.getName.startsWith("."))
          .sortBy(_.getName).headOption.getOrElse(
            throw new IllegalArgumentException(s"no files under $pathStr"))
      else root
    val in = new java.io.BufferedReader(
      new java.io.InputStreamReader(fs.open(file), "UTF-8"))
    try in.readLine() finally in.close()
  }

  private def split(raw: DataFrame, parser: Column,
                    schema: StructType): (DataFrame, DataFrame) = {
    val parsed = raw.select(col("value"), parser.as("__p"))
    val corrupt = col("__p").getField(CorruptCol)
    val good = parsed.filter(corrupt.isNull)
      .select(schema.fieldNames.toSeq.map(f =>
        col("__p").getField(f).as(f)): _*)
    // the raw TEXT line, not the parse struct — exactly what a
    // re-ingestion run consumes once the producer is fixed
    val bad = parsed.filter(corrupt.isNotNull).select(col("value").as("raw"))
    (good, bad)
  }

  /** Quarantine-rate gate for pipeline health: one row
    * `(n_good, n_bad, bad_rate, healthy)` — a producer change that
    * spikes malformed rows should trip an alarm BEFORE the half-empty
    * table propagates downstream (the schema-drift lesson applied to
    * row-level drift). Both counts come from one aggregate each over
    * the already-split frames.
    */
  def healthGate(good: DataFrame, bad: DataFrame,
                 maxBadRate: Double = 0.01): DataFrame = {
    val g = good.agg(count(lit(1)).as("n_good"))
    val b = bad.agg(count(lit(1)).as("n_bad"))
    g.crossJoin(b)
      .withColumn("bad_rate",
        when(col("n_good") + col("n_bad") === 0, lit(0.0))
          .otherwise(col("n_bad").cast("double") /
            (col("n_good") + col("n_bad")).cast("double")))
      .withColumn("healthy", col("bad_rate") <= lit(maxBadRate))
  }
}
