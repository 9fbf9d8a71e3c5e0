// Lives under org.apache.spark.sql for private[sql] plumbing (see
// CleanTextExpr). Public facade: graft.functions.native_fns.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Exact integer dot product of two quantized vectors (SURVEY §7.4
  * similarity ops): `Σ a(i)·b(i)` over `min(|a|,|b|)` elements.
  *
  * The composed form — `aggregate(zip_with(a, b, _*_), 0L, _+_)` —
  * materializes an intermediate array per row pair and walks it through
  * two higher-order evaluators; this expression is a single fused loop
  * over the unsafe array data, with codegen (no fallback), no
  * allocation, and primitive `getLong` access. It is the inner loop of
  * every cosine: with 45k pairs × 64 dims the allocation difference is
  * the query's hot path.
  *
  * Contract: elements are non-null (produced by quantization); null
  * ARRAYS propagate null.
  */
case class QuantizedDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "quantized_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDot =
    copy(left = newLeft, right = newRight)
}

object QuantizedDot {
  def quantized_dot(a: Column, b: Column): Column =
    ExpressionUtils.column(QuantizedDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
