package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, NumericType}

/** A11: column profiling (SURVEY §2.4), the dashboard's
  * `ProfileReport(minimal=True)` (`/root/reference/streamlit_app.py:206-209`).
  *
  * One wide aggregate computes every per-column statistic in a single job
  * (pandas-profiling sweeps the frame once per stat family; here partial
  * aggregation folds all stats map-side, so a 100 TB profile is one scan +
  * one tiny shuffle). Output is long-form: one row per column.
  */
object Profile {

  /** One row per profiled column:
    * (column, n, nulls, distinct, min, max, mean) — numeric stats null for
    * non-numeric columns; min/max rendered as strings for uniform schema.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val total = count(lit(1))
    val perCol = cols.flatMap { c =>
      val isNum = df.schema(c).dataType.isInstanceOf[NumericType]
      Seq(
        (total - count(col(c))).as(s"${c}__nulls"),
        count_distinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"),
        (if (isNum)
          // order-independent mean: exact decimal sum, one double division
           (sum(col(c).cast(DecimalType(28, 6))).cast("double") / count(col(c)))
         else lit(null).cast("double")).as(s"${c}__mean")
      )
    }
    val wide = df.agg(total.as("__n"), perCol: _*)

    // Reshape the single wide row to long form: one row per column.
    val stacked = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n"),
        col(s"${c}__nulls").as("nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_value"),
        col(s"${c}__max").as("max_value"),
        col(s"${c}__mean").as("mean_value")
      )
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
      .orderBy("column")
  }
}
