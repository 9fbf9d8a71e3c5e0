package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval/range join: pair each point with every range containing it
  * (`lo <= pt < hi`) — without an equality key, Spark plans a raw range
  * condition as BroadcastNestedLoopJoin (O(|points|·|ranges|)), which is
  * the classic 100 TB trap.
  *
  * The standard fix is binning: pick a bin width, explode each range to
  * the bins it covers, map each point to its bin, equi-join on the bin,
  * then re-check the exact predicate. The equi-join hash-partitions both
  * sides — shuffle ∝ data + range-spans/width, never the cross product.
  * Bin width tunes duplication: ~median range length is a good default.
  */
object RangeJoin {

  /** @param points   rows with a numeric point column `ptCol`
    * @param ranges   rows with numeric `loCol` (inclusive) / `hiCol`
    *                 (exclusive)
    * @param binWidth bin size in the same units
    * @return every (point row ++ range row) pair with lo <= pt < hi
    */
  def binnedRangeJoin(points: DataFrame, ranges: DataFrame, ptCol: String,
                      loCol: String, hiCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val binOf: Column => Column = c => floor(c / binWidth).cast("long")
    val expanded = ranges.withColumn("__bin",
      explode(sequence(binOf(col(loCol)),
        // hi is exclusive: a range ending exactly on a bin edge does not
        // cover that bin
        binOf(col(hiCol) - 1))))
    val binned = points.withColumn("__bin", binOf(col(ptCol)))
    binned.join(expanded, Seq("__bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bin")
  }
}
