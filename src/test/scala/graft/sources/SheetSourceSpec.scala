package graft.sources

import java.nio.file.Files

import graft.SparkTestBase
import graft.ingest.{Fetcher, Ingest}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** DataSource V2 source: the workbook-directory read must (1) equal the
  * seam-based `compileWorkbooks` lifecycle row-for-row, (2) prune
  * columns at the scan, (3) prune whole sheet partitions on pushed
  * `year` filters.
  */
class SheetSourceSpec extends SparkTestBase {

  import spark.implicits._

  private def sheet(name: String, rows: Seq[String]): String =
    (s"== $name ==" +: rows).mkString("\n")

  private val wb2023 = Seq(
    sheet("Contents", Seq("ignore me")),
    sheet("Table 4.1", Seq(
      "junk\t\t",
      "cat\tNSW\tVIC",
      "Injury\t1\t2",
      "Mental health\t3\t4")),
    sheet("Table S2", Seq(
      "cat\tprincipal diagnosis\tNSW\tVIC\tQLD",
      "Injury\tBurns\t5\t6\tn.p.")),
    sheet("Table 9", Seq(
      "cat\tNSW\tVIC",
      "ShouldNotAppear\t7\t8"))).mkString("\n")

  private val wb2024 = Seq(
    sheet("Table 5", Seq(
      "cat\tNSW\tVIC",
      "(\"Poisoning, 1.0)\t9\t10"))).mkString("\n")

  private lazy val dir: String = {
    val d = Files.createTempDirectory("sheets")
    Files.writeString(d.resolve("apc-2022-23-tables-access.txt"), wb2023)
    Files.writeString(d.resolve("apc-2023-24-tables-access.txt"), wb2024)
    d.toString
  }

  private lazy val ds = spark.read.format("graft-sheet").load(dir)

  test("reads both workbooks; rows equal the seam-based lifecycle") {
    val fileFetcher = new Fetcher {
      def fetch(url: String): Array[Byte] = Files.readAllBytes(
        java.nio.file.Paths.get(url.stripPrefix("file:")))
    }
    val expected = graft.ops.Reshape.unionAligned(Seq(
      Ingest.compileWorkbooks(spark, Seq(s"$dir/apc-2022-23-tables-access.txt"),
        fileFetcher, TextWorkbook),
      Ingest.compileWorkbooks(spark, Seq(s"$dir/apc-2023-24-tables-access.txt"),
        fileFetcher, TextWorkbook)))
    val cols = expected.columns.sorted.toSeq
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(cols.map(col): _*).collect()
        .map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|")).toSeq
    assert(ds.columns.sorted.toSeq == cols, ds.columns.toSeq)
    assert(canon(ds) == canon(expected))
  }

  test("a REAL .xlsx workbook in the directory reads identically to " +
    "its text-encoded twin (decode dispatch by extension)") {
    import java.nio.charset.StandardCharsets.UTF_8
    val d = Files.createTempDirectory("sheets_xlsx")
    // same content, two encodings, two years so rows stay distinct
    Files.writeString(d.resolve("apc-2022-23-tables-access.txt"), wb2023)
    Files.write(d.resolve("apc-2023-24-tables-access.xlsx"),
      XlsxWorkbook.encode(TextWorkbook.decode(wb2023.getBytes(UTF_8))))
    val both = spark.read.format("graft-sheet").load(d.toString)
    val years = both.groupBy($"year").count()
      .as[(Int, Long)].collect().toMap
    assert(years.keySet == Set(2023, 2024), years.toString)
    assert(years(2023) == years(2024),
      "the xlsx twin must parse to the same row count")
    val mism = both.filter($"year" === 2023).drop("year")
      .exceptAll(both.filter($"year" === 2024).drop("year")).count()
    assert(mism == 0, "xlsx rows must equal the text-encoded rows")
  }

  test("reference parse semantics ride through: clean_text, nan, coerce") {
    val rows = ds.filter($"year" === 2024).collect()
    assert(rows.map(_.getAs[String]("cat")).distinct.toSeq == Seq("Poisoning"),
      "tuple artifact stripped by clean_text")
    val np = ds.filter($"state" === "QLD" && $"year" === 2023).count()
    assert(np == 0, "n.p. coerces to null and null separations drop (main.py:128)")
    val pd = ds.filter($"year" === 2023 && $"principal_diagnosis".isNotNull)
      .select("principal_diagnosis").distinct().as[String].collect().toSeq
    assert(pd == Seq("Burns"), "second sheet's extra id column unioned in")
  }

  test("column pruning reaches the scan") {
    val pruned = ds.select("state", "separations")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name) == Seq("state", "separations"),
      scan.output.map(_.name).toString)
  }

  test("year filters prune whole sheet partitions at planning") {
    val (schema, parts) = SheetPlanning.plan(dir)
    assert(parts.size == 3, "three gated+recognizable sheets")
    val sb = new SheetScanBuilder(schema, parts)
    val residual = sb.pushFilters(Array(
      org.apache.spark.sql.sources.EqualTo("year", 2024),
      org.apache.spark.sql.sources.EqualTo("state", "NSW")))
    assert(residual.map(_.toString).toSeq
      == Seq("EqualTo(state,NSW)"), "year handled, state residual")
    val batch = sb.build().toBatch
    assert(batch.planInputPartitions().length == 1,
      "only the 2024 workbook's single sheet remains")
    // end-to-end: pushed filter still yields correct rows
    assert(ds.filter($"year" === 2024).count() == 2)
  }

  test("empty-result pushdown and schema stay consistent") {
    assert(ds.filter($"year" === 1900).count() == 0)
    assert(ds.schema == spark.read.format("graft-sheet").load(dir).schema)
    assert(ds.schema.isInstanceOf[StructType])
  }

  test("user-supplied schema skips inference and projects by name") {
    // production path at crawl scale: the known tidy schema is passed
    // in, so the driver never pre-reads workbooks for inference
    val supplied = spark.read.format("graft-sheet")
      .schema(ds.schema).load(dir)
    assert(supplied.schema == ds.schema)
    assert(supplied.count() == ds.count())
  }
}
