package graft

import org.apache.spark.sql.SparkSession

import graft.ingest.SheetParser

/** Runnable ETL equivalent of the reference's `python main.py`
  * (SURVEY §3.1): parse raw wide sheets → tidy union → staging write →
  * clean aggregate write. The network/Excel edge is driver-side by
  * design (SURVEY §2.1 S1–S3); this demo feeds the parser AIHW-shaped
  * in-memory grids (FIXTURES.md §A) — a real deployment points the same
  * `SheetParser.compileAll` at grids decoded from downloaded workbooks.
  *
  * Usage: runMain graft.Etl [outDir]
  */
object Etl {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_etl").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val N = null: String
    // Two "workbook sheets" with heterogeneous dimensions (2022-23 and
    // 2023-24 financial years), shaped like the reference's inputs.
    val sheet1: Seq[Seq[String]] = Seq(
      Seq("Admitted patient care 2022-23", N, N, N, N),
      Seq(N, N, "NSW", "Vic", "Total"),
      Seq("Mental health", "(\"F00-F99\", 1.0)", "1,234", "5", "9"),
      Seq("Injury", "S00-T98", "3.5", "4", "9"),
      Seq("Respiratory", "J00-J99", "7", "n.p.", "9"))
    val sheet2: Seq[Seq[String]] = Seq(
      Seq(N, "Care type", "NSW", "Vic", "Qld"),
      Seq("Mental health", "Acute", "10", "20", "30"),
      Seq("Injury", "Rehab", "1", "2", "3"))

    val tidy = SheetParser.compileAll(spark,
      Seq((sheet1, 2023), (sheet2, 2024)))
    val (staging, clean) = Pipeline.runEtl(tidy, outDir)
    println(s"compiled ${staging.count()} tidy rows -> $outDir")
    println(s"clean_admissions: ${clean.count()} rows")
    Pipeline.loadForDashboard(spark, outDir).show(20, truncate = false)
    spark.stop()
  }
}
