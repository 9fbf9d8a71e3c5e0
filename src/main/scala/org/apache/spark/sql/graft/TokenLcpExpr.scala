// Lives under org.apache.spark.sql for private[sql] plumbing (see
// CleanTextExpr). Public facade: graft.functions.native_fns.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Longest common prefix, in elements, of two string arrays: the count
  * of leading pairwise-equal tokens, stopping at the shorter length —
  * the inner kernel of the suffix-array LCP scan
  * ([[graft.ext.SuffixArray]]), where it runs once per adjacent suffix
  * pair over arrays as long as a document.
  *
  * Same design as [[DoubleDot]]: one codegen'd loop with primitive
  * `getUTF8String` access over unsafe array data and an early break at
  * the first mismatch. The composed
  * `aggregate(zip_with(a, b, ==), ...)` form this replaces allocates a
  * boolean array per row, walks TWO interpreted higher-order
  * evaluators, and cannot break early — it always pays min(|a|,|b|)
  * even when the prefix diverges at token 0 (the common case in an LCP
  * scan, where most neighbors share nothing). Null handling: null
  * ARRAYS propagate null; a null ELEMENT on EITHER side ends the
  * prefix there (counts as a mismatch, symmetrically — null is never
  * equal to anything, including another null). The tokenizer never
  * produces null elements, but the public facade
  * `graft.functions.native_fns.token_lcp` accepts arbitrary
  * `array<string>` columns (e.g. `transform` outputs), where a wrong-
  * side NPE would kill the task instead of returning an answer.
  */
case class TokenLcpExpr(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "token_lcp"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    while (i < n && !x.isNullAt(i) && !y.isNullAt(i) &&
        x.getUTF8String(i).equals(y.getUTF8String(i))) i += 1
    i.toLong
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $i = 0;
         |while ($i < $n && !$a.isNullAt($i) && !$b.isNullAt($i) &&
         |    $a.getUTF8String($i).equals($b.getUTF8String($i))) {
         |  $i++;
         |}
         |${ev.value} = (long) $i;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TokenLcpExpr =
    copy(left = newLeft, right = newRight)
}

object TokenLcpExpr {
  def token_lcp(a: Column, b: Column): Column =
    ExpressionUtils.column(TokenLcpExpr(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
