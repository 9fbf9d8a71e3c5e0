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
}
