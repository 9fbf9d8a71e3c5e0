package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.11): a custom `Aggregator` with an
  * integer-exact buffer, registered through `functions.udaf` for
  * untyped DataFrame use. The buffer holds scaled longs, so partial
  * aggregation (map-side combine) and merge order cannot perturb the
  * result — the same reproducibility discipline as the engine's
  * DECIMAL sums, here expressed through the typed API with its
  * case-class state and Encoders.
  */
object TypedAggs {

  case class WMeanBuf(sumPQ100: Long, sumQ: Long)

  /** Quantity-weighted mean price: Σ(price·qty)/Σ(qty), accumulating
    * price in cents and quantity as integers. NaN-free: empty input
    * yields null via the Option output.
    */
  object WeightedMean
      extends Aggregator[(Double, Double), WMeanBuf, Option[Double]] {
    override def zero: WMeanBuf = WMeanBuf(0L, 0L)
    override def reduce(b: WMeanBuf, in: (Double, Double)): WMeanBuf =
      WMeanBuf(b.sumPQ100 + math.round(in._1 * 100) * math.round(in._2),
        b.sumQ + math.round(in._2))
    override def merge(a: WMeanBuf, b: WMeanBuf): WMeanBuf =
      WMeanBuf(a.sumPQ100 + b.sumPQ100, a.sumQ + b.sumQ)
    override def finish(b: WMeanBuf): Option[Double] =
      if (b.sumQ == 0L) None
      else Some((b.sumPQ100.toDouble / 100.0) / b.sumQ.toDouble)
    override def bufferEncoder: Encoder[WMeanBuf] = Encoders.product
    override def outputEncoder: Encoder[Option[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[Double]]()
  }

  case class CmsBuf(cells: Array[Long])

  /** Count-min sketch over string keys: a `depth × width` counter grid,
    * mergeable by cellwise addition — the bounded-memory frequency
    * summary for key universes too large to group by (the approximate
    * complement of `graft.agg.HeavyHitters`' exact candidate-verify).
    * Buffer is `depth·width` longs per partial aggregate (8 KB at the
    * 4×256 default), independent of stream length and key cardinality.
    *
    * Guarantees (spec-pinned): estimates never undercount, and
    * overcount is ≤ 2N/width with probability 1 − 2^−depth per key.
    * Hashes are seeded polynomial hashes over the UTF-8 bytes —
    * deterministic across JVMs and partitionings.
    */
  class CountMin(depth: Int = 4, width: Int = 256)
      extends Aggregator[String, CmsBuf, Array[Long]] {
    private def rowHash(row: Int, key: String): Int = {
      var h = 0x9e3779b9 ^ (row * 0x85ebca6b)
      key.getBytes("UTF-8").foreach { b =>
        h = h * 31 + (b & 0xff)
        h ^= (h >>> 13)
      }
      math.floorMod(h, width)
    }
    override def zero: CmsBuf = CmsBuf(new Array[Long](depth * width))
    override def reduce(b: CmsBuf, key: String): CmsBuf = {
      var r = 0
      while (r < depth) {
        b.cells(r * width + rowHash(r, key)) += 1
        r += 1
      }
      b
    }
    override def merge(a: CmsBuf, b: CmsBuf): CmsBuf = {
      var i = 0
      while (i < a.cells.length) { a.cells(i) += b.cells(i); i += 1 }
      a
    }
    override def finish(b: CmsBuf): Array[Long] = b.cells
    override def bufferEncoder: Encoder[CmsBuf] = Encoders.product
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

    /** Point estimate from a finished sketch: min over the depth rows. */
    def estimate(cells: Array[Long], key: String): Long = {
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = cells(r * width + rowHash(r, key))
        if (c < best) best = c
        r += 1
      }
      best
    }
  }
}
