// Lives under org.apache.spark.sql for private[sql] plumbing (see
// CleanTextExpr). Public facade: graft.functions.native_fns and
// graft.agg.AggState.
package org.apache.spark.sql.graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType}

/** The ONE missing piece of Spark 4.1's built-in KLL surface: an
  * N-row MERGE AGGREGATE over serialized sketches.
  *
  * Spark ships `kll_sketch_agg_double` (values → sketch),
  * `kll_sketch_get_quantile_double` / `kll_sketch_get_n_double`
  * (readers), and `kll_sketch_merge_double` — but the merge is
  * PAIRWISE (sketch × sketch → sketch), which cannot fold a persisted
  * state TABLE of arbitrarily many per-slice sketches back into one
  * (the read path of [[graft.agg.AggState.mergeQuantile]]: one row per
  * (group, epoch), epoch count unbounded). This
  * `TypedImperativeAggregate` supplies exactly that fold — same
  * DataSketches `KllDoublesSketch` wire format as the built-ins, so it
  * composes with them in either direction (pinned by AggStateSpec).
  * Everything the built-ins CAN express stays on the built-ins.
  *
  * Scale: O(k) buffer per group per task, map-side partials, the
  * shuffle carries sketch bytes. Determinism note: KLL compaction
  * flips random coins once n > k, so oracle-facing queries emit the
  * bound-boolean form, never raw estimates (see `x_quantile_rollup`).
  */
case class KllMergeAgg(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch]
    with ExpectsInputTypes {

  require(k >= 8 && k <= 65535, s"k must be in [8, 65535], got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  // null (not empty-sketch bytes) when every input sketch in the group
  // is null — the built-in aggregates' contract; empty-sketch bytes
  // would make the downstream kll_sketch_get_quantile_double reader
  // THROW at read time instead of yielding null
  override def nullable: Boolean = true
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

  override def eval(buf: KllDoublesSketch): Any =
    if (buf.isEmpty) null else buf.toByteArray

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

object KllQuantileAgg {
  /** Union a BINARY column of serialized KLL doubles sketches (the
    * persisted-state read path; see class doc). */
  def kll_merge(c: Column, k: Int): Column =
    ExpressionUtils.column(
      KllMergeAgg(ExpressionUtils.expression(c), k).toAggregateExpression())
}
