// Lives under org.apache.spark.sql for private[sql] plumbing (see
// CleanTextExpr). Public facade: graft.functions.native_fns.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType}

/** Fused dot product of two double vectors: `Σ a(i)·b(i)` over
  * `min(|a|,|b|)` elements — the real-valued sibling of
  * [[QuantizedDot]] for the model-application tier (PCA projection,
  * whitening), where one side is a literal eigenvector whose entries
  * are irrational and cannot ride the integer kernel.
  *
  * Accumulation order is the fixed left-to-right element order of the
  * arrays, so for a FIXED pair of vectors the result is bit-stable
  * across partitionings (per-row map work; nothing reorders the
  * elements). It is NOT order-independent across different
  * parenthesizations — callers that need cross-engine parity pin the
  * downstream aggregate to DECIMAL or compare through a rounded ratio
  * (the Pca.varianceRatio contract).
  *
  * Same design as [[QuantizedDot]]: a single codegen'd loop over
  * unsafe array data, no intermediate array, primitive `getDouble`
  * access; the composed `aggregate(zip_with(...))` form allocates and
  * walks two interpreted higher-order evaluators per row. Contract:
  * elements are non-null; null ARRAYS propagate null.
  */
case class DoubleDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "double_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DoubleDot =
    copy(left = newLeft, right = newRight)
}

object DoubleDot {
  def double_dot(a: Column, b: Column): Column =
    ExpressionUtils.column(DoubleDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
