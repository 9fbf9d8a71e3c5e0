package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.scalatest.funsuite.AnyFunSuite

/** The JDK-only xlsx codec: round-trip through real zip+SpreadsheetML
  * bytes, plus hand-built workbooks covering the cell-type and sparse-
  * geometry branches a generated round-trip can't reach (inline
  * strings, booleans, numerics, rich-text shared strings, gapped cells,
  * skipped rows, out-of-order rel targets).
  */
class XlsxWorkbookSpec extends AnyFunSuite {

  private val sheets = Seq(
    "Table 4.1" -> Seq(
      Seq("cat", "NSW", "VIC"),
      Seq("Injury", "1", "2"),
      Seq("Mental health", "3", "4")),
    "Contents" -> Seq(Seq("ignore me")),
    "Table S2" -> Seq(
      Seq("cat", null, "VIC"), // gap in the middle survives
      Seq("Injury", "5", "6")))

  test("decode(encode(sheets)) round-trips names, order, grid, and gaps") {
    val got = XlsxWorkbook.decode(XlsxWorkbook.encode(sheets))
    assert(got == sheets)
  }

  test("special characters and A1 references past column Z round-trip") {
    val wide = Seq("Wide & <Weird>" -> Seq(
      (0 until 30).map(i => s"""v$i "quoted" & <tag>"""),
      (0 until 30).map(i => s"w$i")))
    assert(XlsxWorkbook.decode(XlsxWorkbook.encode(wide)) == wide)
  }

  test("colIndex parses A1-style columns") {
    assert(XlsxWorkbook.colIndex("A1") == 0)
    assert(XlsxWorkbook.colIndex("Z9") == 25)
    assert(XlsxWorkbook.colIndex("AA12") == 26)
    assert(XlsxWorkbook.colIndex("BC3") == 54)
  }

  // hand-built workbook: numeric cells, inline strings, booleans,
  // rich-text shared strings, a skipped row, and sheet2 listed FIRST in
  // workbook.xml but stored at a non-positional part name
  private def handBuilt: Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(UTF_8))
      zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    put("xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets>
        |<sheet name="Table 5" sheetId="2" r:id="rIdB"/>
        |<sheet name="Notes" sheetId="1" r:id="rIdA"/>
        |</sheets></workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rIdA" Type="t" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rIdB" Type="t" Target="worksheets/sheet77.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<si><t>plain</t></si>
        |<si><r><t>rich </t></r><r><t xml:space="preserve">text</t></r></si>
        |</sst>""".stripMargin)
    // sheet77 = "Table 5": row 1 (shared, rich shared, numeric),
    // row 2 skipped, row 3 (gapped at A/B: inline str at C, bool at D,
    // formula-cached string at E)
    put("xl/worksheets/sheet77.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1"><v>42.5</v></c></row>
        |<row r="3"><c r="C3" t="inlineStr"><is><t>inline!</t></is></c><c r="D3" t="b"><v>1</v></c><c r="E3" t="str"><v>=cached</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData><row r="1"><c r="A1" t="inlineStr"><is><t>notes</t></is></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zos.close()
    bos.toByteArray
  }

  test("hand-built workbook: cell types, rich text, sparse geometry, " +
    "rel-resolved part names, workbook.xml order") {
    val got = XlsxWorkbook.decode(handBuilt)
    assert(got.map(_._1) == Seq("Table 5", "Notes"),
      "sheet order follows workbook.xml, not part numbering")
    val t5 = got.head._2
    assert(t5 == Seq(
      Seq("plain", "rich text", "42.5"),
      Seq(), // skipped row surfaces as an empty row
      Seq(null, null, "inline!", "TRUE", "=cached")))
    assert(got(1)._2 == Seq(Seq("notes")))
  }

  test("PROPERTY: random ragged grids with gaps round-trip (30 seeded " +
    "cases)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val cellGen = Gen.frequency(
      2 -> Gen.const(null: String),
      5 -> Gen.asciiPrintableStr.map(_.take(12)),
      2 -> Gen.choose(-1e6, 1e6).map(_.toString),
      1 -> Gen.oneOf("&<>\"'", " leading", "trailing ", "\ttab"))
    val rowGen = Gen.choose(0, 8).flatMap(w => Gen.listOfN(w, cellGen))
    val gridGen = Gen.choose(0, 10).flatMap(h => Gen.listOfN(h, rowGen))
    val sheetsGen = for {
      n <- Gen.choose(1, 4)
      names <- Gen.listOfN(n, Gen.alphaNumStr.map("S" + _.take(10)))
      grids <- Gen.listOfN(n, gridGen)
    } yield names.zipWithIndex // names must be distinct for a workbook
      .map { case (nm, i) => s"$nm$i" }.zip(grids)
    (0 until 30).foreach { i =>
      val sheets = sheetsGen
        .apply(Gen.Parameters.default, Seed(1234L + i))
        .getOrElse(Seq.empty)
        .map { case (n, g) => n -> g.map(_.toSeq) }
      // the encoder skips null cells, so a row's trailing nulls,
      // all-null rows, and the grid's trailing empty rows legitimately
      // come back trimmed — normalize both sides to that canonical
      // form before comparing
      def canon(ss: Seq[(String, Seq[Seq[String]])]) = ss.map {
        case (n, g) =>
          val rows = g.map(r => r.reverse.dropWhile(_ == null).reverse)
          n -> rows.reverse.dropWhile(_.isEmpty).reverse
      }
      val got = XlsxWorkbook.decode(XlsxWorkbook.encode(sheets))
      assert(canon(got) == canon(sheets), s"seed ${1234L + i}")
    }
  }

  test("non-xlsx bytes fail loudly") {
    intercept[IllegalArgumentException] {
      XlsxWorkbook.decode("not a zip at all".getBytes(UTF_8))
    }
  }
}
