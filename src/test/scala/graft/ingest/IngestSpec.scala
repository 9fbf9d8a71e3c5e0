package graft.ingest

import java.nio.charset.StandardCharsets.UTF_8

import graft.SparkTestBase

/** The S1–S3 lifecycle driven end-to-end from fake-fetched bytes:
  * anchor scrape → link predicate → fetch → decode → sheet-name gate →
  * parse/union. The fakes replace only the effects (network, xlsx
  * codec); every predicate, regex, and parse step is the reference's.
  */
class IngestSpec extends SparkTestBase {

  // -- fake fetch only; decode is the real offline TextWorkbook format
  //    (`== name ==` delimited, tab-separated cells) shared with the
  //    graft-sheet DataSource V2
  private val FakeDecoder = graft.sources.TextWorkbook

  private def sheet(name: String, rows: Seq[String]): String =
    (s"== $name ==" +: rows).mkString("\n")

  private val workbook = Seq(
    sheet("Contents", Seq("ignore me")),
    sheet("Table 4.1", Seq(
      "junk\t\t",
      "cat\tNSW\tVIC",
      "Injury\t1\t2",
      "Mental health\t3\t4")),
    sheet("Table S2", Seq(
      "cat\tNSW\tVIC",
      "Injury\t5\t6")),
    sheet("Table 9", Seq(            // fails the Table\s*[45S] gate
      "cat\tNSW\tVIC",
      "ShouldNotAppear\t7\t8"))
  ).mkString("\n")

  private object FakeFetcher extends Fetcher {
    var fetched: List[String] = Nil
    def fetch(url: String): Array[Byte] = {
      fetched ::= url
      workbook.getBytes(UTF_8)
    }
  }

  test("anchorHrefs scrapes hrefs; discoverExcels applies the reference predicate") {
    val html =
      """<html><a href="/reports/admitted-patient-care/2022-23/tables-access.xlsx">x</a>
        |<a href="https://other.site/admitted-patient-care-1999-00-tables-access.xlsx">y</a>
        |<a href="/reports/admitted-patient-care/notes.pdf">no</a>
        |<a href="/reports/other-thing/tables-access.xlsx">no</a></html>""".stripMargin
    val hrefs = LinkDiscovery.anchorHrefs(html)
    assert(hrefs.size == 4)
    val links = LinkDiscovery.discoverExcels(hrefs,
      base = "https://www.aihw.gov.au", fallback = Seq("fb"))
    assert(links == Seq(
      "https://www.aihw.gov.au/reports/admitted-patient-care/2022-23/tables-access.xlsx",
      "https://other.site/admitted-patient-care-1999-00-tables-access.xlsx"))
    assert(LinkDiscovery.discoverExcels(Seq("/nope.pdf"), "b", Seq("fb")) == Seq("fb"),
      "empty discovery falls back to the pinned list")
  }

  test("yearFromUrl: (dddd)-(dd) → 2000+dd, 9999 when absent") {
    assert(LinkDiscovery.yearFromUrl(".../2022-23/tables-access.xlsx") == 2023)
    assert(LinkDiscovery.yearFromUrl("no-year-here.xlsx") == 9999)
  }

  test("sheet-name gate matches the reference regex, anchored and case-insensitive") {
    assert(Ingest.sheetNameMatches("Table 4.1"))
    assert(Ingest.sheetNameMatches("table5"))
    assert(Ingest.sheetNameMatches("TABLE S2"))
    assert(!Ingest.sheetNameMatches("Table 9"))
    assert(!Ingest.sheetNameMatches("Notes: Table 4"))
  }

  test("compileWorkbooks runs the full lifecycle from fake-fetched bytes") {
    FakeFetcher.fetched = Nil
    val url = "https://host/admitted-patient-care/2022-23/tables-access.xlsx"
    val tidy = Ingest.compileWorkbooks(spark, Seq(url), FakeFetcher, FakeDecoder)
    assert(FakeFetcher.fetched == List(url))
    val rows = tidy.collect()
    assert(rows.forall(_.getAs[Int]("year") == 2023), "year derived from URL")
    val cats = rows.map(_.getAs[String]("cat")).toSet
    assert(cats == Set("Injury", "Mental health"),
      "Table 4.1 and Table S2 parsed; Contents and Table 9 gated out")
    // Table 4.1 (2 data rows x 2 states) + Table S2 (1 x 2)
    assert(rows.length == 6)
  }

  test("compileWorkbooks from REAL xlsx bytes (JDK-only codec) == the " +
    "TextWorkbook path on the same sheets") {
    // same workbook content as the text fixture, but encoded as an
    // actual zip+SpreadsheetML file and decoded by XlsxWorkbook — the
    // S2 first-pass gap of rounds 1-4 (main.py:73,78) closed with no
    // change downstream of the WorkbookDecoder seam
    val xlsxBytes = graft.sources.XlsxWorkbook.encode(
      graft.sources.TextWorkbook.decode(workbook.getBytes(UTF_8)))
    object XlsxFetcher extends Fetcher {
      def fetch(url: String): Array[Byte] = xlsxBytes
    }
    val url = "https://host/admitted-patient-care/2022-23/tables-access.xlsx"
    val viaXlsx = Ingest.compileWorkbooks(spark, Seq(url), XlsxFetcher,
      graft.sources.XlsxWorkbook)
    val viaText = Ingest.compileWorkbooks(spark, Seq(url), FakeFetcher,
      FakeDecoder)
    val (a, b) = (viaXlsx.collect().toSet, viaText.collect().toSet)
    assert(a == b, s"xlsx-only=${a -- b} text-only=${b -- a}")
    assert(a.nonEmpty)
  }
}
