package graft.insights

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.agg.Charts

/** §2.12: `generate_insights` (`/root/reference/streamlit_app.py:78-104`) —
  * driver-side composition of tiny aggregate results into a text summary.
  * Each underlying query is a distributed plan; only ≤10-row results are
  * collected. Mirrors the reference's guards: empty frame → empty summary,
  * YoY line only when more than one year is present.
  */
object Insights {

  def generate(df: DataFrame, stateCol: String = "state",
               categoryCol: String = "category", yearCol: String = "year",
               measure: String = "separations"): Seq[String] = {
    if (df.isEmpty) return Seq.empty
    val lines = Seq.newBuilder[String]

    val topState = Charts.topKBy(df, stateCol, measure, 1).collect()
    topState.headOption.foreach { r =>
      lines += f"**${r.getString(0)}** recorded the highest separations (${r.getDouble(1)}%,.0f)."
    }

    if (df.columns.contains(categoryCol)) {
      val topCat = Charts.topKBy(df, categoryCol, measure, 1).collect()
      topCat.headOption.foreach { r =>
        lines += s"Top category: **${r.getString(0)}**."
      }
    }

    val nYears = df.agg(countDistinct(col(yearCol))).head().getLong(0)
    if (nYears > 1) {
      val r = Charts.yoyChange(df, yearCol, measure).head()
      val pct = r.getAs[Double]("pct_change")
      val dir = if (pct >= 0) "increased" else "decreased"
      lines += f"Separations $dir ${math.abs(pct)}%.1f%% between ${r.get(0)} and ${r.get(1)}."
    }
    lines.result()
  }
}
