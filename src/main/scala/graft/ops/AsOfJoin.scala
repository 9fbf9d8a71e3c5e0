package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the latest right row
  * with `rightTs <= leftTs` within the same key — the standard
  * time-series enrichment operator (trade→quote, purchase→latest-signup).
  *
  * Spark has no native as-of join; per the build brief's preference order
  * this is tier (a), a composition of built-ins: tag both sides, union
  * them (schema-aligned, null-filled), and take
  * `last(struct(payload), ignoreNulls)` over a per-key window ordered by
  * (ts, side) with right-before-left at equal ts, so a right row at
  * exactly `leftTs` is visible — the `>=` convention, matching DuckDB's
  * ASOF JOIN which oracles it. The whole payload rides ONE struct
  * column, so a right row whose payload fields are null still
  * participates (no older-row bleed-through), and only one window fill
  * runs regardless of payload width.
  *
  * Scale shape: one shuffle on the key (the window's partitionBy) and a
  * per-partition sort — the cost profile of a sort-merge join with no
  * build side held in memory. Pre-deduplicate the right side to one row
  * per (key, ts) for deterministic results (ties on rightTs are
  * otherwise engine-arbitrary).
  */
object AsOfJoin {

  /** @param left    left rows; all its columns are preserved in order
    * @param right   right rows providing `keyCol`, `tsCol`, and `payload`
    * @param payload right-side columns to carry, emitted as
    *                `asof_<name>` (null when no right row precedes)
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left.withColumn("__side", lit(1))
    val r = right
      // a null key or null ts can never satisfy `l.key = r.key AND
      // l.ts >= r.ts` (SQL three-valued logic; matches the DuckDB ASOF
      // oracle) — but unfiltered they would sort nulls-first into every
      // partition's window and bleed into real left rows
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol),
        struct(payload.map(col): _*).as("__asof"))
      .withColumn("__side", lit(0))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__filled", last(col("__asof"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__filled.$p").as(s"asof_$p")): _*)
  }
}
