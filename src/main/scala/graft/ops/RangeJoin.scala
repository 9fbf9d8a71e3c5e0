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
    // Exact long floor-division: Column `/` is DOUBLE division, which
    // loses precision past 2^53 (epoch-nanos territory) and misassigns
    // edge bins. `(v - pmod(v, w)) div w` stays in long arithmetic; the
    // numerator is the exact floor-aligned multiple (pmod is
    // non-negative), so `div`'s truncation is exact for negatives too.
    def floorBin(v: String): Column =
      expr(s"($v - pmod($v, ${binWidth}L)) div ${binWidth}L")
    val expanded = ranges
      // degenerate (empty/reversed) ranges match nothing; without this
      // guard sequence(start, stop) would happily generate a DESCENDING
      // bin list for hi < lo and explode spurious bins
      .filter(col(hiCol) > col(loCol))
      .withColumn("__lo", col(loCol).cast("long"))
      // hi is exclusive: a range ending exactly on a bin edge does not
      // cover that bin
      .withColumn("__hi", col(hiCol).cast("long") - 1)
      .withColumn("__bin", explode(sequence(floorBin("__lo"), floorBin("__hi"))))
      .drop("__lo", "__hi")
    val binned = points
      .withColumn("__pt", col(ptCol).cast("long"))
      .withColumn("__bin", floorBin("__pt"))
      .drop("__pt")
    binned.join(expanded, Seq("__bin"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) < col(hiCol))
      .drop("__bin")
  }
}
