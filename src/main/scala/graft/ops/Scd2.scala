package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history construction: collapse an
  * ordered change log into validity intervals — the standard warehouse
  * shape for "what was this entity's attribute at time t" and the
  * temporal-join complement of [[AsOfJoin]].
  *
  * Scale shape: all three steps (run detection, run aggregation,
  * interval chaining) are windows/aggregates partitioned BY KEY — work
  * distributes across entities, state per task is one entity's rows,
  * and there is exactly one shuffle on the key (the window and the
  * group-by reuse the same hash partitioning, and the second window
  * runs on the already-partitioned aggregate). No global window, no
  * driver-side iteration; a skewed entity bounds a task at that
  * entity's row count, never at corpus size.
  */
object Scd2 {

  /** Build type-2 intervals from a change log. For each `key`, rows are
    * ordered by (`orderCol`, `tieCol`); consecutive runs of identical
    * `trackedCol` values collapse to one row with:
    *   valid_from — first `orderCol` of the run
    *   valid_to   — first `orderCol` of the NEXT run (null for the
    *                current run: half-open [from, to) intervals)
    *   is_current — whether this is the key's latest interval
    * A value that disappears and later reappears opens a NEW interval
    * (run semantics, not grouping by value).
    *
    * `tieCol` must make the ordering total (a unique row id) — without
    * it, equal-`orderCol` rows make run boundaries nondeterministic.
    */
  def buildHistory(df: DataFrame, key: String, orderCol: String,
                   tieCol: String, trackedCol: String): DataFrame = {
    val byTime = Window.partitionBy(col(key))
      .orderBy(col(orderCol), col(tieCol))
    // run boundary: first row of a key, or tracked value differs from the
    // previous row's (null-safe: NULL→value and value→NULL are changes)
    val changed = when(lag(col(trackedCol), 1).over(byTime)
      .eqNullSafe(col(trackedCol)), lit(0)).otherwise(lit(1))
    val runs = df
      .withColumn("_run", sum(changed).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(key), col("_run"))
      .agg(first(col(trackedCol)).as(trackedCol),
        min(col(orderCol)).as("valid_from"))
    val byRun = Window.partitionBy(col(key)).orderBy(col("_run"))
    runs
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byRun))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("_run")
  }
}
