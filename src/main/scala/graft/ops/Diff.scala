package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot differencing — the inverse of [[Merge]]: given two versions
  * of a table, emit the change set (op ∈ insert/update/delete) that
  * transforms one into the other. This is how a pipeline without
  * upstream CDC derives increments (diff today's extract against
  * yesterday's, then feed the output to [[Merge.mergeInto]] /
  * `StreamOps.applyChanges` instead of rewriting the table) — the
  * round-trip `mergeInto(old, diff(old, new), delete = op='delete')
  * == new` is pinned by spec and oracle.
  *
  * Shape: ONE full-outer equi-join on the key, null-safe struct
  * equality for change detection (a column flipping to/from NULL is a
  * change; two NULLs are not), unchanged rows dropped before anything
  * else flows downstream. Same scale behavior as MERGE: key-partitioned
  * shuffle, AQE skew handling, no window, no sort.
  */
object Diff {

  /** Change set turning `oldDf` into `newDf` (same schema, non-null
    * keys). Output: `newDf`'s columns (the OLD values for deletes) plus
    * `op`. Unchanged rows are absent.
    */
  def diffSnapshots(oldDf: DataFrame, newDf: DataFrame,
                    keys: Seq[String]): DataFrame = {
    val dataCols = newDf.columns.toSeq
    val keyNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val o = oldDf.filter(keyNotNull)
      .select(struct(dataCols.map(col): _*).as("_o"))
      .select(col("_o") +: keys.map(k => col(s"_o.$k").as(k)): _*)
    val n = newDf.filter(keyNotNull)
      .select(struct(dataCols.map(col): _*).as("_n"))
      .select(col("_n") +: keys.map(k => col(s"_n.$k").as(k)): _*)
    o.join(n, keys, "full_outer")
      .withColumn("op",
        when(col("_o").isNull, lit("insert"))
          .when(col("_n").isNull, lit("delete"))
          .when(!col("_o").eqNullSafe(col("_n")), lit("update")))
      .filter(col("op").isNotNull)
      .select(dataCols.map(c =>
        when(col("_n").isNotNull, col(s"_n.$c"))
          .otherwise(col(s"_o.$c")).as(c)) :+ col("op"): _*)
  }
}
