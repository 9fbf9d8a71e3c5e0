// Lives under org.apache.spark.sql for private[sql] plumbing (see
// CleanTextExpr). Public facade: graft.functions.native_fns.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** Equi-depth bucket id: `#{bounds(i) <= value}` over an ASCENDING
  * `bounds` array — the bucket-assignment kernel of every two-phase
  * rank decomposition in the engine (`ops/Ranks`, `ext/Eval`'s
  * strictly-below prefixes).
  *
  * The composed form — `aggregate(bounds, 0, (acc, x) => acc +
  * when(x <= v, 1).otherwise(0))` — walks all |bounds| elements
  * through the interpreted higher-order evaluator per row: with the
  * standard 255 boundaries that is 255 interpreted lambda steps per
  * input row, the measured dominant cost of `x_mann_whitney` and a tax
  * on every auc/prCurve/gains/rank query. This expression is a single
  * codegen'd BINARY SEARCH (upper bound, ≤8 probes at 255 bounds) over
  * the unsafe array data — same result because percentile bounds are
  * non-decreasing, so "count of elements ≤ v" equals the upper-bound
  * insertion point.
  *
  * Contracts: `bounds` sorted ascending (in Spark's SQL double order)
  * with NON-NULL elements (the `percentile_approx` output shape; a null
  * element would be read as garbage primitive data); null array or null
  * value → null. Comparisons use Spark's SQL ordering
  * (`SQLOrderingUtil.compareDoubles`), NOT raw IEEE `<=`: NaN is the
  * LARGEST value (a NaN input lands in the last bucket) and -0.0 equals
  * 0.0 — bit-matching what the HOF's `<=` predicate computed.
  */
case class BucketIndex(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(DoubleType), DoubleType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "bucket_index"

  override def nullSafeEval(boundsAny: Any, valueAny: Any): Any = {
    val bounds = boundsAny.asInstanceOf[ArrayData]
    val v = valueAny.asInstanceOf[Double]
    var lo = 0
    var hi = bounds.numElements()
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (org.apache.spark.sql.catalyst.util.SQLOrderingUtil
          .compareDoubles(bounds.getDouble(mid), v) <= 0) lo = mid + 1
      else hi = mid
    }
    lo
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bounds, v) => {
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid")
      val cmp = "org.apache.spark.sql.catalyst.util.SQLOrderingUtil" +
        ".compareDoubles"
      s"""
         |int $lo = 0;
         |int $hi = $bounds.numElements();
         |while ($lo < $hi) {
         |  int $mid = ($lo + $hi) >>> 1;
         |  if ($cmp($bounds.getDouble($mid), $v) <= 0) { $lo = $mid + 1; }
         |  else { $hi = $mid; }
         |}
         |${ev.value} = $lo;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BucketIndex =
    copy(left = newLeft, right = newRight)
}

object BucketIndex {
  def bucket_index(bounds: Column, value: Column): Column =
    ExpressionUtils.column(BucketIndex(
      ExpressionUtils.expression(bounds), ExpressionUtils.expression(value)))
}
