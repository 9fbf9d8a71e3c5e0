package graft.io

import java.nio.file.Files

import org.apache.spark.sql.types._
import graft.SparkTestBase

class QuarantineSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private def write(lines: Seq[String], suffix: String): String = {
    val dir = Files.createTempDirectory("quar").toString
    val f = new java.io.PrintWriter(s"$dir/data.$suffix")
    lines.foreach(f.println); f.close()
    s"$dir/data.$suffix"
  }

  test("readJsonQuarantined: good rows parse, bad lines keep raw text") {
    val path = write(Seq(
      """{"id": 1, "name": "a", "score": 1.5}""",
      """{"id": 2, "name": "b"}""",          // missing field -> null, GOOD
      """not json at all""",                 // garbage -> quarantine
      """{"id": "x", "name": "c", "score": 2}""", // id wrong type -> quarantine
      """{"id": 4, "name": "d", "score": 4.0}"""
    ), "json")
    val (good, bad) = Quarantine.readJsonQuarantined(spark, path, schema)
    assert(good.schema.fieldNames.toSeq == Seq("id", "name", "score"))
    assert(good.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
    val raws = bad.as[String].collect()
    assert(raws.length == 2)
    assert(raws.exists(_.contains("not json")))
    assert(raws.exists(_.contains("\"x\"")), "raw line preserved verbatim")
  }

  test("readCsvQuarantined: malformed lines quarantine, header consumed") {
    val path = write(Seq(
      "id,name,score",
      "1,a,1.5",
      "2,b,notanumber",   // score uncastable -> quarantine
      "3,c,3.0,EXTRA,X",  // wrong column count -> quarantine
      "4,d,4.0"
    ), "csv")
    val (good, bad) = Quarantine.readCsvQuarantined(spark, path, schema,
      header = true)
    assert(good.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 4L))
    val raws = bad.as[String].collect().sorted
    assert(raws.length == 2)
    assert(raws.exists(_.contains("notanumber")) &&
      raws.exists(_.contains("EXTRA")))
  }

  test("healthGate: trips on a bad-rate spike, quiet when clean") {
    val path = write(Seq(
      """{"id": 1, "name": "a", "score": 1.0}""",
      """broken""",
      """also broken"""
    ), "json")
    val (good, bad) = Quarantine.readJsonQuarantined(spark, path, schema)
    val r = Quarantine.healthGate(good, bad, maxBadRate = 0.5).collect()(0)
    assert(r.getAs[Long]("n_good") == 1 && r.getAs[Long]("n_bad") == 2)
    assert(math.abs(r.getAs[Double]("bad_rate") - 2.0 / 3) < 1e-9)
    assert(!r.getAs[Boolean]("healthy"))
    val clean = Quarantine.healthGate(good, bad.limit(0), maxBadRate = 0.01)
      .collect()(0)
    assert(clean.getAs[Boolean]("healthy"))
  }
}
