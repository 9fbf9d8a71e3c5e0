// Lives under org.apache.spark.sql for private[sql] plumbing (see
// CleanTextExpr). Public facade: graft.functions.native_fns.
package org.apache.spark.sql.graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitter sketch as a native Catalyst aggregate
  * (`TypedImperativeAggregate` — the mutable-buffer tier of Spark's
  * aggregate API, the same machinery behind `percentile` /
  * `hll_sketch_agg`; completes graft's extension-point coverage
  * alongside codegen scalar expressions, a planner strategy, a rewrite
  * rule, and user-facing `Aggregator`s).
  *
  * Semantics: `mg_sketch(col, k)` keeps at most `k` counters per
  * group. Stream update is classic Misra-Gries (hit: +1; room: insert;
  * full: decrement all — amortized O(1) per row with O(k) state);
  * partial-aggregate MERGE adds counters then reduces back to `k` by
  * subtracting the (k+1)-th largest count (the mergeable-summaries
  * reduction of Agarwal et al., which PRESERVES the error bound).
  * Returns a `map<string,bigint>` of candidate → count lower bound,
  * keys emitted in sorted order for deterministic output.
  *
  * Guarantee (the reason this is usable for EXACT answers): every item
  * with true frequency > N/(k+1) is present in the map, and each
  * reported count undercounts by at most N/(k+1). So candidates ⊇ the
  * true heavy set; an exact recount of just the ≤k candidates per
  * group turns the sketch into a provably-complete heavy-hitter
  * answer — see `x_mg_heavy_per_group`.
  *
  * Scale: map-side partial aggregation keeps O(k) state per group per
  * task, merges are O(k log k) — a group-by whose shuffled bytes are
  * k counters per group, not the token stream. The per-group form
  * `groupBy(g).agg(mg_sketch(...))` is the one-pass distributed
  * complement of `graft.agg.HeavyHitters`' global two-pass
  * candidate-verify.
  */
case class MisraGriesAgg(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with ExpectsInputTypes {

  require(k >= 1 && k <= 4096, s"k must be in [1, 4096], got $k")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = MapType(StringType, LongType,
    valueContainsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "mg_sketch"
  override def children: Seq[Expression] = Seq(child)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      if (buf.containsKey(key)) buf.put(key, buf.get(key) + 1L)
      else if (buf.size() < k) buf.put(key, 1L)
      else {
        // decrement-all: every counter loses 1, zeros evicted
        val it = buf.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue <= 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    buf
  }

  override def merge(buf: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long]
                    ): java.util.HashMap[String, Long] = {
    other.forEach { (key, c) =>
      buf.put(key, if (buf.containsKey(key)) buf.get(key) + c else c)
    }
    if (buf.size() > k) {
      // subtract the (k+1)-th largest count from everything; at most k
      // counters stay positive (ties with the pivot all go to zero)
      val counts = new Array[Long](buf.size())
      var i = 0
      val vit = buf.values().iterator()
      while (vit.hasNext) { counts(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val pivot = counts(counts.length - (k + 1)) // (k+1)-th largest
      val it = buf.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        if (e.getValue <= pivot) it.remove() else e.setValue(e.getValue - pivot)
      }
    }
    buf
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val keys = new Array[String](buf.size())
    buf.keySet().toArray(keys)
    java.util.Arrays.sort(keys.asInstanceOf[Array[Object]])
    new ArrayBasedMapData(
      new GenericArrayData(keys.map(UTF8String.fromString(_): Any)),
      new GenericArrayData(keys.map(buf.get(_): Any)))
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size())
    buf.forEach { (key, c) => out.writeUTF(key); out.writeLong(c) }
    out.close()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]
                          ): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) { buf.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  /** `map<string,bigint>` of ≤ `k` heavy-hitter candidates per group;
    * complete for true frequency > N/(k+1).
    */
  def mg_sketch(c: Column, k: Int): Column =
    ExpressionUtils.column(
      MisraGriesAgg(ExpressionUtils.expression(c), k).toAggregateExpression())
}
