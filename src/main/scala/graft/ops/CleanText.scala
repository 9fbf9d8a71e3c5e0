package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String/regex scalar functions (SURVEY §2.3 F1–F5, §2.2 P10/P12).
  *
  * Reference semantics: `_clean_text` (`/root/reference/main.py:55-68`),
  * `_norm_state` (`main.py:42-45`), header snake-casing (`main.py:90`),
  * numeric coercion (`main.py:123-124`).
  *
  * All are compositions of codegen'd built-ins — they stay inside
  * WholeStageCodegen, so the five regex passes of `cleanText` fuse into one
  * generated loop over the column; no UDF boundary, no serialization.
  */
object CleanText {

  /** Australian state/territory codes — `/root/reference/main.py:20`. */
  val StateCodes: Seq[String] =
    Seq("NSW", "VIC", "QLD", "SA", "WA", "TAS", "NT", "ACT", "AUST")

  /** F1 `_clean_text` (`main.py:55-68`): strip Excel tuple artifacts
    * `("…", 1.0)` — leading `("`, trailing `")`, trailing `,<number>` —
    * then whitespace-strip and strip surrounding double quotes.
    * Regexes mirror `_rx_tuple1/2/3` at `main.py:55-57` exactly.
    *
    * The whitespace strip matches pandas `.str.strip()` for the ASCII
    * whitespace class (space, \t, \n, \x0B, \f, \r — written explicitly
    * so Spark's Java regex and the DuckDB oracle's RE2 agree; RE2's \s
    * excludes \x0B). Exotic unicode whitespace (NBSP etc.), which Python
    * `str.strip` would also remove, is the one knowing divergence.
    */
  val WsClass = "[ \\t\\n\\x0B\\f\\r]"

  def cleanText(c: Column): Column = {
    val noTuple1 = regexp_replace(c, "^\\(\"?\\s*", "")
    val noTuple2 = regexp_replace(noTuple1, "\"?\\)$", "")
    val noTuple3 = regexp_replace(noTuple2, ",\\s*[-+]?[0-9]*\\.?[0-9]+$", "")
    val wsStripped = regexp_replace(
      regexp_replace(noTuple3, s"^$WsClass+", ""), s"$WsClass+$$", "")
    trim(wsStripped, "\"")
  }

  /** F2 (`main.py:44`): uppercase then strip every char outside A-Z. */
  def upperAlpha(c: Column): Column =
    regexp_replace(upper(c.cast("string")), "[^A-Z]", "")

  /** P10 `_norm_state` (`main.py:42-45`): canonical state code or null. */
  def normState(c: Column): Column = {
    val s = upperAlpha(c)
    when(s.isin(StateCodes: _*), s)
  }

  /** F3 (`main.py:90`): header snake-casing — trim, lower, spaces→`_`.
    * Driver-side (schema) variant; the Column variant is `snakeCaseCol`.
    */
  def snakeCase(name: String): String =
    name.trim.toLowerCase.replace(" ", "_")

  def snakeCaseCol(c: Column): Column =
    replace(lower(trim(c)), lit(" "), lit("_"))

  /** P12 (`main.py:123-124`, `streamlit_app.py:47-48`): numeric coercion
    * with null-on-error — `pd.to_numeric(errors="coerce")`. Spark's
    * `try_cast` semantics (non-ANSI cast) match exactly.
    */
  def coerceDouble(c: Column): Column = c.cast("string").try_cast("double")

  def coerceInt(c: Column): Column = c.cast("string").try_cast("int")

  /** F4 (`main.py:141-142`): financial-year extraction from a workbook URL:
    * `(\d{4})-(\d{2})` → second group + 2000.
    */
  def yearFromUrl(c: Column): Column =
    (regexp_extract(c, "(\\d{4})-(\\d{2})", 2).try_cast("int") + lit(2000))

  /** F5 (`streamlit_app.py:70`): display-case `_`→space + Title Case. */
  def displayCase(c: Column): Column =
    initcap(regexp_replace(c, "_", " "))
}
