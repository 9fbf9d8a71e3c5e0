package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkTestBase
import graft.functions.native_fns.{strip_accents, unicode_normalize}

class UnicodeNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private val decomposed = "Café über ño Å"
  private val composed = "Café über ño Å"

  test("NFC composes combining marks; NFD decomposes them back") {
    val r = Seq(decomposed).toDF("t")
      .select(
        unicode_normalize($"t", "NFC").as("nfc"),
        unicode_normalize(lit(composed), "NFD").as("nfd"))
      .as[(String, String)].head()
    assert(r._1 == composed, r._1.map(_.toInt).mkString(","))
    assert(r._2 == decomposed)
  }

  test("NFKC folds compatibility forms") {
    // U+FB01 LATIN SMALL LIGATURE FI, U+2460 CIRCLED DIGIT ONE
    val r = Seq("ﬁle ①").toDF("t")
      .select(unicode_normalize($"t", "NFKC")).as[String].head()
    assert(r == "file 1", r)
  }

  test("strip_accents removes diacritics, keeps non-accent text") {
    val r = Seq(s"$composed $decomposed 你好!").toDF("t")
      .select(strip_accents($"t")).as[String].head()
    assert(r == "Cafe uber no A Cafe uber no A 你好!", r)
  }

  test("ASCII fast path returns the input object unchanged") {
    val s = UTF8String.fromString("plain ascii only")
    assert(org.apache.spark.sql.graft.UnicodeNormalizeExpr
      .normalize(s, "NFKC") eq s)
    assert(org.apache.spark.sql.graft.UnicodeNormalizeExpr
      .stripAccents(s) eq s)
  }

  test("nulls propagate; invalid form rejected") {
    val r = Seq(Option.empty[String]).toDF("t")
      .select(unicode_normalize($"t", "NFC")).collect()
    assert(r.head.isNullAt(0))
    intercept[IllegalArgumentException] {
      Seq("x").toDF("t").select(unicode_normalize($"t", "NFX")).collect()
    }
  }

  test("normalization runs inside whole-stage codegen") {
    val df = spark.read.parquet(s"$sf/documents.parquet")
      .select(unicode_normalize(concat($"text", lit(decomposed)), "NFC").as("n"))
    // '*(n)' marks a WholeStageCodegen stage in the plan string
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[unicode_normalize.*"),
      plan)
    assert(df.as[String].head().endsWith(composed))
  }
}
