// Lives under org.apache.spark.sql for private[sql] plumbing (see
// CleanTextExpr). Public facade: graft.functions.native_fns.
package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (NFC/NFD/NFKC/NFKD) as a native expression —
  * the first transform of any text-cleaning pipeline over web text,
  * where the same glyph arrives precomposed from one crawler and as
  * base + combining marks from another, and every downstream hash,
  * shingle, and dedup key silently misses unless the forms agree.
  *
  * Spark has no normalization built-in (tier a fails); a native
  * expression (tier b) keeps it inside whole-stage codegen — the
  * generated code calls one static helper with a fast pure-ASCII
  * bail-out (`Normalizer.isNormalized` on ASCII is a scan, and web
  * corpora are overwhelmingly ASCII, so the common row never allocates).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {
  require(UnicodeNormalizeExpr.Forms.contains(form),
    s"form must be one of ${UnicodeNormalizeExpr.Forms.mkString("/")}, got $form")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeExpr.normalize(input.asInstanceOf[UTF8String], form)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"""org.apache.spark.sql.graft.UnicodeNormalizeExpr.normalize($c, "$form")""")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

/** Accent stripping: canonical decomposition, drop combining marks,
  * recompose — `é → e`, `ü → u`, while non-accent non-ASCII (CJK,
  * symbols) passes through. The dedup canonicalization step for
  * accent-variant near-identical text.
  */
case class StripAccents(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "strip_accents"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalizeExpr.stripAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.UnicodeNormalizeExpr.stripAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object UnicodeNormalizeExpr {

  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  /** True iff every byte is ASCII — such strings are normalized under
    * every form and accent-free, so both entry points return the input
    * UTF8String untouched (zero allocation on the common row).
    */
  private def isAscii(s: UTF8String): Boolean = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) return false
      i += 1
    }
    true
  }

  def normalize(s: UTF8String, form: String): UTF8String =
    if (isAscii(s)) s
    else UTF8String.fromString(
      Normalizer.normalize(s.toString, Normalizer.Form.valueOf(form)))

  def stripAccents(s: UTF8String): UTF8String =
    if (isAscii(s)) s
    else {
      val decomposed = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
      val sb = new java.lang.StringBuilder(decomposed.length)
      var i = 0
      while (i < decomposed.length) {
        val c = decomposed.charAt(i)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        i += 1
      }
      UTF8String.fromString(
        Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
    }

  def unicode_normalize(c: Column, form: String): Column =
    ExpressionUtils.column(UnicodeNormalize(ExpressionUtils.expression(c), form))

  def strip_accents(c: Column): Column =
    ExpressionUtils.column(StripAccents(ExpressionUtils.expression(c)))
}
