package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The tidy-relation core (SURVEY §1, §2.2 P5–P9, §2.4 A1/A9).
  *
  * The reference's fundamental abstraction is a dynamic-schema long-form
  * relation: `(year, state, *categorical dims…, separations)` where the
  * dimension set varies per source sheet (`/root/reference/main.py:149,160`;
  * `/root/reference/streamlit_app.py:36,66`). Every op here takes the
  * dimension list as a runtime value — schema is data, not code.
  */
object Tidy {

  val KeyCols: Seq[String] = Seq("year", "state")
  val MeasureCol: String = "separations"

  /** Dimension discovery: every column not in {year, state, separations}
    * is a categorical dimension (`main.py:160`, `streamlit_app.py:36`).
    */
  def dimensions(df: DataFrame): Seq[String] =
    df.columns.toSeq.filterNot((KeyCols :+ MeasureCol).contains)

  /** A9: keep only dimensions with at least one non-null value
    * (`notna().any()` per candidate dim, `main.py:160`). One aggregate
    * pass over all candidates — a single job, not one per column.
    */
  def nonEmptyDimensions(df: DataFrame, candidates: Seq[String]): Seq[String] = {
    if (candidates.isEmpty) return Nil
    val counts = df.agg(
      count(col(candidates.head)).as(candidates.head),
      candidates.tail.map(c => count(col(c)).as(c)): _*
    ).head()
    candidates.filter(c => counts.getAs[Long](c) > 0L)
  }

  /** P5/P6: drop rows null in any of `cols` (`main.py:118,128-129`,
    * `streamlit_app.py:49`).
    */
  def dropNullRows(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop(cols)

  /** P8 + A1: the `clean_admissions` aggregate (`main.py:160-165`).
    * Null dims are filled with "" so they participate in the group keys
    * (pandas groupby drops NaN keys; the reference null-fills first —
    * exactly this), then group-sum the measure.
    *
    * Physically one shuffle: Catalyst plans partial (map-side)
    * HashAggregate → exchange on the group keys → final HashAggregate.
    * At 100 TB the partial aggregate collapses each input partition to
    * its distinct key set before the exchange, so shuffle volume is
    * bounded by cardinality(keys), not input rows.
    */
  def cleanAggregate(df: DataFrame, dims: Seq[String],
                     measure: String = MeasureCol): DataFrame = {
    val filled = df.na.fill("", dims)
    filled
      .groupBy((KeyCols ++ dims).map(col): _*)
      .agg(sum(col(measure)).as(measure))
  }

  /** P9: conjunction of IN-list predicates, applied only for dimensions
    * the user constrained (`streamlit_app.py:63,72-73`). Single filter →
    * single codegen'd predicate, pushed toward the scan by Catalyst.
    */
  def applyFilters(df: DataFrame, selections: Map[String, Seq[Any]]): DataFrame =
    selections.foldLeft(df) { case (d, (c, vs)) =>
      d.filter(col(c).isin(vs: _*))
    }

  /** Group-median imputation with a provenance flag: nulls in
    * `valueCol` are replaced by their group's exact median (the robust
    * choice — a mean follows the outliers the nulls often correlate
    * with), and `<valueCol>_imputed` records which rows were filled —
    * the flag an honest feature pipeline keeps, since imputed values
    * carry information about missingness itself. Groups that are ALL
    * null fall back to the global median.
    *
    * One per-group aggregate (exact interpolating `percentile` over
    * non-nulls) + a 1-row global aggregate, both broadcast back; the
    * fill is row-local. Bit-portable: the percentile is the
    * cross-engine-matched exact form.
    */
  def imputeGroupMedian(df: DataFrame, groupCol: String,
                        valueCol: String): DataFrame = {
    val med = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(expr(s"percentile($valueCol, 0.5)").as("__gmed"))
    val global = df.filter(col(valueCol).isNotNull)
      .agg(expr(s"percentile($valueCol, 0.5)").as("__med"))
    df.join(broadcast(med), Seq(groupCol), "left")
      .crossJoin(broadcast(global))
      .withColumn(s"${valueCol}_imputed", col(valueCol).isNull)
      .withColumn(valueCol,
        coalesce(col(valueCol), col("__gmed"), col("__med")))
      .drop("__gmed", "__med")
  }
}
