package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Reshaping + set ops (SURVEY §2.5 R1/R2, §2.6 U1).
  *
  * R1 melt: `/root/reference/main.py:126-128` — pandas
  * `melt(...).dropna(subset=["separations"])`. Spark's `unpivot` keeps
  * null measure values, so the composed semantics need an explicit
  * not-null filter on the value column (codegen'd, fused into the same
  * stage — no extra pass over the data).
  *
  * R2 pivot: `/root/reference/streamlit_app.py:139`. We always pass the
  * explicit value list so Spark skips the extra distinct-collect job — at
  * 100 TB that pre-job is a full scan; with values supplied the pivot is a
  * single hash aggregate.
  *
  * U1 union: `/root/reference/main.py:149` — `pd.concat` aligns by column
  * name and null-fills gaps; `unionByName(allowMissingColumns = true)` is
  * the exact Spark equivalent. Union is a zero-shuffle operator (plan
  * concatenation), so heterogeneous inputs cost nothing extra.
  */
object Reshape {

  /** R1: wide→long. `ids` stay, each column of `values` becomes a row
    * `(varName, valueName)`; null measures are dropped (pandas
    * melt+dropna semantics).
    */
  def melt(df: DataFrame, ids: Seq[String], values: Seq[String],
           varName: String, valueName: String): DataFrame =
    df.unpivot(ids.map(col).toArray, values.map(col).toArray, varName, valueName)
      .filter(col(valueName).isNotNull)

  /** R2: long→wide with an explicit pivot-value list (skips the distinct
    * pre-job) and a single SUM measure, the reference's only pivot shape.
    */
  def pivotSum(df: DataFrame, index: Seq[String], pivotCol: String,
               pivotValues: Seq[String], valueCol: String): DataFrame =
    df.groupBy(index.map(col): _*)
      .pivot(pivotCol, pivotValues)
      .sum(valueCol)

  /** U1: schema-aligning union-all by name across frames with
    * heterogeneous column sets; missing columns null-fill.
    */
  def unionAligned(frames: Seq[DataFrame]): DataFrame = {
    require(frames.nonEmpty, "no frames parsed") // main.py:147-148 guard
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }
}
