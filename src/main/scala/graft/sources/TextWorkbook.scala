package graft.sources

import java.nio.charset.StandardCharsets.UTF_8

import graft.ingest.WorkbookDecoder

/** The offline workbook encoding used throughout this repo wherever real
  * xlsx bytes would flow (the sandbox has no xlsx codec — SURVEY §7.3):
  * UTF-8 text, sheets delimited by `== name ==` lines, cells
  * tab-separated, empty cell = null. A real xlsx reader (POI) implements
  * the same [[WorkbookDecoder]] seam and drops in unchanged — everything
  * downstream (sheet gate, header resolution, parse, melt) is
  * format-agnostic.
  */
object TextWorkbook extends WorkbookDecoder {

  override def decode(bytes: Array[Byte]): Seq[(String, Seq[Seq[String]])] = {
    val lines = new String(bytes, UTF_8).split("\n").toSeq
    val starts = lines.zipWithIndex.collect {
      case (l, i) if l.startsWith("== ") => i
    }
    starts.zipAll(starts.drop(1), -1, lines.size).map { case (s, e) =>
      val name = lines(s).stripPrefix("== ").stripSuffix(" ==")
      val grid = lines.slice(s + 1, e).map(_.split("\t", -1).toSeq
        .map(c => if (c.isEmpty) null else c))
      name -> grid
    }
  }

  def encode(sheets: Seq[(String, Seq[Seq[String]])]): Array[Byte] =
    sheets.map { case (name, grid) =>
      (s"== $name ==" +: grid.map(_.map(c => if (c == null) "" else c)
        .mkString("\t"))).mkString("\n")
    }.mkString("\n").getBytes(UTF_8)
}
