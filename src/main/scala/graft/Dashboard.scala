package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.agg.{Charts, Profile}
import graft.insights.Insights
import graft.ops.Tidy

/** Runnable dashboard equivalent (SURVEY §3.2): the reference's Streamlit
  * app computes 5 chart aggregations + a text insight over the loaded
  * tidy relation; this main derives the same tidy shape from the test
  * tables, persists it once (S6), runs every chart query and the insight
  * composition, and prints the results — an end-to-end driveable surface
  * for the whole dashboard query set.
  *
  * Usage: runMain graft.Dashboard [sfDir]
  */
object Dashboard {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Tidy relation from orders: year/state(status)/category(priority).
    val tidy = io.Tables.load(spark, dir, "orders").select(
      year(col("o_orderdate")).as("year"),
      col("o_orderstatus").as("state"),
      col("o_orderpriority").as("category"),
      col("o_totalprice").as("separations"))
      .persist() // S6: one materialization feeds every chart job

    // P9: a sample sidebar filter selection
    val filtered = Tidy.applyFilters(tidy, Map("state" -> Seq("F", "O")))

    println("== insights ==")
    Insights.generate(filtered).foreach(l => println(s"  $l"))

    println("== bar: totals by state (A2) ==")
    Charts.totalsBy(filtered, "state", "separations").show(10, truncate = false)
    println("== lines: totals by year x state (A3) ==")
    Charts.totalsBy2(filtered, "year", "state", "separations").show(10)
    println("== pie: top-10 categories (A4+T2) ==")
    Charts.topKBy(filtered, "category", "separations", 10).show(10, truncate = false)
    println("== heatmap: category x state pivot (A5+R2) ==")
    Charts.heatmap(filtered, "category", "state", Seq("F", "O", "P"),
      "separations").show(10, truncate = false)
    println("== profile (A11) ==")
    Profile.profile(filtered, Seq("year", "state", "separations")).show(truncate = false)
    println("== box plot: per-state quartiles/whiskers (A12) ==")
    agg.Robust.boxplotStats(filtered, "state", "separations")
      .show(10, truncate = false)
    println("== choropleth: per-capita rate by state (A13) ==")
    val geo = {
      import spark.implicits._
      Seq(("F", -33.87, 151.21, 8166000L), ("O", -37.81, 144.96, 6681000L),
        ("P", -27.47, 153.03, 5185000L))
        .toDF("state", "lat", "lon", "population")
    }
    Charts.choroplethPrep(filtered, "state", "separations", geo)
      .show(10, truncate = false)

    tidy.unpersist()
    spark.stop()
  }
}
