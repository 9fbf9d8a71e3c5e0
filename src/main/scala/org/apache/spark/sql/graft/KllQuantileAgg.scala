// Lives under org.apache.spark.sql for private[sql] plumbing (see
// CleanTextExpr). Public facade: graft.functions.native_fns and
// graft.agg.AggState.
package org.apache.spark.sql.graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, DoubleType, LongType}

/** Mergeable QUANTILE state — the percentile analogue of
  * [[graft.agg.AggState.partializeDistinct]]'s HLL tier, built on the
  * DataSketches KLL doubles sketch already on Spark's classpath (the
  * same library behind `hll_sketch_agg`).
  *
  * Why it exists: exact percentiles do not merge — the p99 of two
  * slices says nothing about the p99 of their union, so a 100 TB
  * monitoring pipeline that persists finished percentiles must re-scan
  * history on every refresh. A KLL sketch is a ~KB binary with a PROVEN
  * normalized-rank guarantee (k=200 ≈ 1.65% at 99% confidence —
  * Karnin/Lang/Liberty, FOCS'16) that merges losslessly W.R.T. that
  * guarantee: persist one sketch per (group, slice), answer any later
  * grouping-superset or time-range percentile by unioning sketches.
  *
  * Three pieces, mirroring Spark's own hll trio:
  *   - [[KllSketchAgg]]   `kll_sketch(col, k)`  double column → sketch
  *   - [[KllMergeAgg]]    `kll_merge(col, k)`   sketch column → sketch
  *   - [[KllQuantile]]    `kll_quantile(sk, r)` sketch → value at rank
  *
  * The aggregates are `TypedImperativeAggregate`s: map-side partials
  * hold one O(k) sketch per group per task, the shuffle carries sketch
  * bytes, never values. The scalar estimator is `CodegenFallback` BY
  * DESIGN: it runs once per GROUP row on the read side (|groups| rows,
  * not |data| rows), where interpreter dispatch is noise.
  *
  * Determinism note: KLL compaction flips random coins, so two runs
  * over the same data may return slightly different (both in-bound)
  * estimates once n > k. Oracle-facing queries therefore emit the
  * bound-boolean form (x_sketch_rollup convention) — the exact value
  * plus "estimate's exact rank within ε" — never the raw estimate.
  */
case class KllSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with ExpectsInputTypes {

  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_sketch"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
}

/** Union previously-built KLL sketches (BINARY column) — the read path
  * of a persisted sketch table. See [[KllSketchAgg]].
  */
case class KllMergeAgg(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with ExpectsInputTypes {

  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "kll_merge"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch,
                      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) {
      buf.merge(KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    }
    buf
  }

  override def merge(buf: KllDoublesSketch,
                     other: KllDoublesSketch): KllDoublesSketch = {
    buf.merge(other)
    buf
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] =
    buf.toByteArray
  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(o: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
}

/** Value at normalized rank `rank` (INCLUSIVE search: smallest stored
  * value whose ≤-fraction reaches the rank) of a serialized KLL sketch;
  * null for an empty sketch. Read-side, |groups|-scale — CodegenFallback
  * by design (see [[KllSketchAgg]] doc).
  */
case class KllQuantile(child: Expression, rank: Double)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  require(rank >= 0.0 && rank <= 1.0, s"rank must be in [0,1], got $rank")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantile"

  override def nullSafeEval(bytes: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null else sk.getQuantile(rank)
  }

  override protected def withNewChildInternal(
      newChild: Expression): KllQuantile = copy(child = newChild)
}

/** Number of values the sketch has absorbed (exact). */
case class KllN(child: Expression)
    extends UnaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "kll_n"

  override def nullSafeEval(bytes: Any): Any =
    KllDoublesSketch.heapify(
      Memory.wrap(bytes.asInstanceOf[Array[Byte]])).getN

  override protected def withNewChildInternal(
      newChild: Expression): KllN = copy(child = newChild)
}

object KllQuantileAgg {
  /** Build a KLL doubles sketch of a double column. */
  def kll_sketch(c: Column, k: Int): Column =
    ExpressionUtils.column(
      KllSketchAgg(ExpressionUtils.expression(c), k).toAggregateExpression())

  /** Union serialized KLL sketches. */
  def kll_merge(c: Column, k: Int): Column =
    ExpressionUtils.column(
      KllMergeAgg(ExpressionUtils.expression(c), k).toAggregateExpression())

  /** Estimate the value at normalized rank `r`; null on empty. */
  def kll_quantile(c: Column, r: Double): Column =
    ExpressionUtils.column(KllQuantile(ExpressionUtils.expression(c), r))

  /** Exact count of absorbed values. */
  def kll_n(c: Column): Column =
    ExpressionUtils.column(KllN(ExpressionUtils.expression(c)))
}
