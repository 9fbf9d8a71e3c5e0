package graft.ingest

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.ops.{CleanText, Reshape}

/** Ingest layer (SURVEY §2.1 S1–S3, §2.2 P1–P7, §2.7 T6): the
  * `parse_sheet` semantics of `/root/reference/main.py:72-131` over a raw
  * all-string grid.
  *
  * Design split (SURVEY §7.3): header detection is ordinal — "first of the
  * top ≤40 rows with ≥2 state codes" (`main.py:48-53`) — which has no
  * distributed meaning, so it runs driver-side over at most 40 rows. The
  * *data* path (cleaning, coercion, melt) is a distributed DataFrame plan.
  * A workbook sheet is small; at 100 TB the parallelism axis is
  * *many sheets* — `compileAll` unions per-sheet plans lazily, so Spark
  * schedules all sheets' scans concurrently.
  */
object SheetParser {

  /** T6 (`main.py:48-53`): first row index (≤40) with ≥2 state codes. */
  def headerRow(rows: Seq[Seq[Any]]): Option[Int] = {
    def isState(v: Any): Boolean = v != null &&
      CleanText.StateCodes.contains(
        v.toString.toUpperCase.replaceAll("[^A-Z]", ""))
    rows.take(40).zipWithIndex
      .collectFirst { case (r, i) if r.count(isState) >= 2 => i }
  }

  private def normStateName(name: String): Option[String] = {
    val s = Option(name).getOrElse("").toUpperCase.replaceAll("[^A-Z]", "")
    Option.when(CleanText.StateCodes.contains(s))(s)
  }

  /** Parsed header: resolved id/state column names, in grid order.
    * Mirrors `main.py:81-113`: P1 dedup keep-first, P2 rename/normalize,
    * P3 positional unnamed→category/principal_diagnosis/dimension_i,
    * P4 drop `total`.
    */
  private[graft] case class Header(colNames: Seq[String], idCols: Seq[String],
                                    stateCols: Seq[String], keep: Seq[Int])

  private[graft] def resolveHeader(cells: Seq[Any]): Header = {
    // pandas read_excel names empty header cells "Unnamed: <i>"
    val raw = cells.zipWithIndex.map { case (c, i) =>
      if (c == null || c.toString.trim.isEmpty) s"Unnamed: $i" else c.toString
    }
    // P2: state-normalize or snake-case
    var named = raw.map(n =>
      normStateName(n).getOrElse(CleanText.snakeCase(n)))
    // P1: keep first occurrence of each duplicate name
    val seen = scala.collection.mutable.Set[String]()
    val keep = named.zipWithIndex.collect {
      case (n, i) if seen.add(n) => i
    }
    named = keep.map(named)
    val isStateAt = named.map(n => CleanText.StateCodes.contains(n))

    // P3: positional renames of unnamed id columns
    var ids = named.zip(isStateAt).collect { case (n, false) => n }
    if (ids.nonEmpty && ids.head.startsWith("unnamed")) {
      named = named.map(n => if (n == ids.head) "category" else n)
      ids = ids.updated(0, "category")
    }
    var havePrincipal = named.contains("principal_diagnosis")
    ids.zipWithIndex.drop(1).foreach { case (n, idx) =>
      if (n.startsWith("unnamed")) {
        val nn = if (!havePrincipal) { havePrincipal = true; "principal_diagnosis" }
                 else s"dimension_$idx"
        named = named.map(m => if (m == n) nn else m)
        ids = ids.updated(idx, nn)
      }
    }
    // P4: drop helper column `total`
    val keepNoTotal = keep.zip(named).filter(_._2 != "total")
    val finalNames = keepNoTotal.map(_._2)
    Header(
      colNames = finalNames,
      idCols = finalNames.filterNot(CleanText.StateCodes.contains),
      stateCols = finalNames.filter(CleanText.StateCodes.contains),
      keep = keepNoTotal.map(_._1))
  }

  /** `parse_sheet` (`main.py:72-131`): raw grid → tidy long-form plan, or
    * None when the sheet is unrecognizable (no header in 40 rows, <2 state
    * columns, or no id columns — `main.py:75-76,115-116`).
    *
    * Null-semantics parity (pinned by golden tests): the reference's
    * `_clean_text` does `astype(str)` first, so a *cell-level* missing id
    * value becomes the literal string "nan" (`main.py:120-121`), while a
    * *column-level* missing dimension (sheet lacks the column entirely)
    * stays null after union and becomes "" at the clean aggregate.
    */
  def parseSheet(spark: SparkSession, grid: Seq[Seq[String]], year: Int): Option[DataFrame] = {
    headerRow(grid).flatMap { hdr =>
      val h = resolveHeader(grid(hdr))
      if (h.stateCols.size < 2 || h.idCols.isEmpty) None
      else {
        val dataRows = grid.drop(hdr + 1).map { r =>
          Row.fromSeq(h.keep.map(i =>
            r.lift(i).flatMap(Option(_)).filter(_.nonEmpty).orNull))
        }
        val schema = StructType(h.colNames.map(StructField(_, StringType, nullable = true)))
        val raw = spark.createDataFrame(
          spark.sparkContext.parallelize(dataRows.toList), schema)

        // P5: drop rows where the first id column is null (main.py:118)
        val dropped = raw.na.drop(Seq(h.idCols.head))
        // F1 (+ astype(str) "nan" parity) on id cols; P12 coercion on states
        val cleaned = dropped.select(
          h.idCols.map(c =>
            when(col(c).isNull, lit("nan"))
              .otherwise(CleanText.cleanText(col(c))).as(c)) ++
          h.stateCols.map(c => CleanText.coerceDouble(col(c)).as(c)): _*)
        // R1 melt + P7 year literal (main.py:126-130)
        val tidy = Reshape
          .melt(cleaned, h.idCols, h.stateCols, "state", "separations")
          .withColumn("year", lit(year))
        Some(tidy)
      }
    }
  }

  /** `compile_all` (`main.py:135-151`): parse every (grid, year), skip
    * unrecognizable sheets, U1-union the rest; error if none parsed
    * (`main.py:147-148`).
    */
  def compileAll(spark: SparkSession, sheets: Seq[(Seq[Seq[String]], Int)]): DataFrame = {
    val frames = sheets.flatMap { case (g, y) => parseSheet(spark, g, y) }
    Reshape.unionAligned(frames)
  }
}
