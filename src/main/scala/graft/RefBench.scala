package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.ops.Tidy
import graft.agg.{Charts, Profile}

/** Reference-shape throughput comparison: runs the SAME pipeline the
  * reference executes in pandas (melt → dropna → group-sum, chart
  * aggregates, minimal profile) over the same parquet, timed the same
  * way (median of 3 after a warm run per step). The pandas side is
  * `tools/pandas_baseline.py`; together they give BENCH a concrete
  * reference-implementation baseline at identical scale.
  *
  * Usage: runMain graft.RefBench [sfDir]  → one JSON line.
  */
object RefBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.count() // warm infra

    def med(f: => Long): Double = {
      f // warm (codegen)
      (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted.apply(1)
    }

    val tidy = ops.Reshape.melt(li,
      ids = Seq("l_orderkey", "l_linenumber", "l_returnflag"),
      values = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"),
      varName = "measure", valueName = "value")
    val steps = Seq(
      "melt" -> (() => tidy.count()),
      "agg" -> (() => Tidy.cleanAggregate(
        tidy.select(col("l_returnflag").as("state"),
          year(lit("1995-01-01").cast("date")).as("year"),
          col("measure"), col("value").as("separations")),
        dims = Seq("measure")).count()),
      "charts" -> (() => {
        val a = li.groupBy(col("l_returnflag"))
          .agg(sum(col("l_quantity").cast(DecimalType(18, 2)))).count()
        val b = Charts.topKBy(li.withColumn("separations",
          col("l_extendedprice")), "l_partkey", "separations", 10).count()
        val c = li.groupBy(year(col("l_shipdate")))
          .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))).count()
        a + b + c
      }),
      "profile" -> (() => Profile.profile(li,
        Seq("l_quantity", "l_extendedprice")).count()))
    val times = steps.map { case (name, f) => name -> med(f()) }
    val total = times.map(_._2).sum
    val json = times.map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}")
    println(s"""{"spark_total_sec":$total,"steps":$json,"sf":"$sfDir"}""")
    spark.stop()
  }
}
