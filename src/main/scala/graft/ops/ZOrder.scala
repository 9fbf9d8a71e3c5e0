package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering — the multi-dimensional file-layout
  * technique behind data skipping: sort/partition a table by the
  * bit-interleaving of two columns and every contiguous run of rows
  * covers a small RANGE IN BOTH dimensions, so per-file min/max stats
  * prune scans for predicates on either column (a plain sort on x gives
  * pruning on x only; at 100 TB the difference is reading one dimension's
  * matching files vs the whole table for the second dimension).
  *
  * The z-value is built from `bits` unrolled shift/mask/add terms —
  * plan-time constants, primitive long arithmetic end to end, inside
  * whole-stage codegen; no UDF, no loop at runtime.
  */
object ZOrder {

  /** Morton z-value: interleave the low `bits` bits of non-negative `x`
    * and `y` — x owns even result bits, y odd. Aligned prefix blocks of
    * the z-space are square tiles: codes sharing all but the low 2k bits
    * form exactly a 2^k x 2^k rectangle in (x, y).
    */
  def zvalue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { j =>
      shiftright(xl, j).bitwiseAND(1) * lit(1L << (2 * j)) +
        shiftright(yl, j).bitwiseAND(1) * lit(1L << (2 * j + 1))
    }.reduce(_ + _)
  }

  /** Cluster `df` for (xCol, yCol) data skipping: range-partition by
    * z-value (contiguous z-ranges per output partition/file) and sort
    * within partitions, so parquet row-group min/max on BOTH columns
    * stay tight. The z column is kept for layout inspection; drop it
    * after write if undesired.
    */
  def clusterByZ(df: DataFrame, xCol: String, yCol: String, bits: Int,
                 numPartitions: Int, zColName: String = "zval"): DataFrame =
    df.withColumn(zColName, zvalue(col(xCol), col(yCol), bits))
      .repartitionByRange(numPartitions, col(zColName))
      .sortWithinPartitions(zColName)
}
