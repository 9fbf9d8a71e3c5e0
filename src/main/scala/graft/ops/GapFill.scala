package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series gap filling (resample-to-daily): materialize the missing
  * days of each key's [min, max] date range, zero-fill additive measures,
  * forward-fill level measures — the standard prep step before any
  * trend/YoY computation over sparse event data (a reference-dashboard
  * chart over a sparse series silently interpolates; an engine has to
  * make the spine explicit).
  *
  * Scale shape: the spine is generated PER KEY from that key's own
  * bounds (`sequence(min, max)` exploded inside the key's group — no
  * global driver-side calendar, no cross join against a calendar table),
  * the join back is an equi-join on (key, day), and the forward fill is
  * a per-key running window. Everything shuffles by key exactly once.
  * Degenerate case to avoid at 100 TB: calling this with NO keys makes
  * one global series and the window runs single-partition — callers
  * should pass the series key (entity/device/series id), which is also
  * the natural partitioning of the downstream model input.
  */
object GapFill {

  /** Fill a daily series per key.
    *
    * @param keys        series identity columns (non-empty for scale)
    * @param dateCol     DATE column; spine spans each key's [min, max]
    * @param zeroFill    additive measures → 0 on missing days
    * @param forwardFill level measures → last seen value on missing days
    */
  def fillDaily(df: DataFrame, keys: Seq[String], dateCol: String,
                zeroFill: Seq[String], forwardFill: Seq[String]): DataFrame = {
    val keyCols = keys.map(col)
    val spine = df.groupBy(keyCols: _*)
      .agg(min(col(dateCol)).as("__d0"), max(col(dateCol)).as("__d1"))
      .select(keyCols :+ explode(
        sequence(col("__d0"), col("__d1"), expr("interval 1 day")))
        .as(dateCol): _*)
    val joined = spine.join(df, keys :+ dateCol, "left")
    val zeroed = zeroFill.foldLeft(joined) { (d, c) =>
      d.withColumn(c, coalesce(col(c), lit(0)))
    }
    val w = Window.partitionBy(keyCols: _*).orderBy(col(dateCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    forwardFill.foldLeft(zeroed) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
  }
}
