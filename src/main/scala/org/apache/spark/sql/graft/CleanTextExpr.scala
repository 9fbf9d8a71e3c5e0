// Lives under org.apache.spark.sql because Expression plumbing
// (AbstractDataType, ExpressionUtils) is private[sql] — the standard
// location for third-party native expressions. Public facade:
// graft.functions.native_fns.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native fused form of the reference's `_clean_text` pipeline
  * (`/root/reference/main.py:55-68`, SURVEY §2.3 F1): one character scan
  * replaces five chained passes (3 regex_replace + 2 trim), allocating a
  * single output string per row instead of five intermediates.
  *
  * Semantics are bit-identical to [[graft.ops.CleanText.cleanText]]
  * (pinned by a cross-check test over the corpus + generated edge cases):
  *   1. `^\("?\s*`   — leading `("` artifact
  *   2. `"?\)$`      — trailing `")` artifact
  *   3. `,\s*[-+]?[0-9]*\.?[0-9]+$` — trailing tuple number (only the
  *      last comma can start a to-end match of that tail, so a backward
  *      scan is exactly the regex's leftmost successful match)
  *   4. strip of ASCII whitespace (pandas .str.strip() over the \s
  *      class), then 5. strip of `"` characters.
  *
  * Codegen calls the static scan directly ([[CleanTextExpr.clean]]), so
  * the expression stays inside WholeStageCodegen — no fallback, no
  * per-stage UTF8String churn.
  */
case class CleanTextExpr(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "clean_text"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      CleanTextExpr.clean(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"org.apache.spark.sql.graft.CleanTextExpr.clean($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): CleanTextExpr =
    copy(child = newChild)
}

object CleanTextExpr {

  /** Column API for the fused expression. */
  def clean_text(c: Column): Column =
    ExpressionUtils.column(CleanTextExpr(ExpressionUtils.expression(c)))

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** The fused scan. Public + static so generated code can call it. */
  def clean(s: String): String = {
    var st = 0
    var en = s.length
    // 1. ^\("?\s*
    if (st < en && s.charAt(st) == '(') {
      var i = st + 1
      if (i < en && s.charAt(i) == '"') i += 1
      while (i < en && isWs(s.charAt(i))) i += 1
      st = i
    }
    // 2. "?\)$
    if (en > st && s.charAt(en - 1) == ')') {
      var i = en - 1
      if (i - 1 >= st && s.charAt(i - 1) == '"') i -= 1
      en = i
    }
    // 3. ,\s*[-+]?[0-9]*\.?[0-9]+$  (backward scan from the end)
    if (en - 1 >= st && isDigit(s.charAt(en - 1))) {
      var i = en - 1
      while (i >= st && isDigit(s.charAt(i))) i -= 1
      if (i >= st && s.charAt(i) == '.') i -= 1
      while (i >= st && isDigit(s.charAt(i))) i -= 1
      if (i >= st && (s.charAt(i) == '+' || s.charAt(i) == '-')) i -= 1
      while (i >= st && isWs(s.charAt(i))) i -= 1
      if (i >= st && s.charAt(i) == ',') en = i
    }
    // 4. strip ASCII whitespace (pandas .str.strip() over \s class)
    while (st < en && isWs(s.charAt(st))) st += 1
    while (en > st && isWs(s.charAt(en - 1))) en -= 1
    // 5. strip '"' runs
    while (st < en && s.charAt(st) == '"') st += 1
    while (en > st && s.charAt(en - 1) == '"') en -= 1
    s.substring(st, en)
  }
}
