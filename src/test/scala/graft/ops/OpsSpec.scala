package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.SparkTestBase

/** Unit tests pinning the reference's semantics (SURVEY §5.1):
  * melt null-handling, union null-fill, null-fill-then-group, coercion,
  * clean-text regexes against /root/reference/main.py:55-57 patterns.
  */
class OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("R1 melt drops null measures (pandas melt+dropna semantics)") {
    val wide = Seq(
      ("a", Some(1.0), None: Option[Double]),
      ("b", Some(2.0), Some(3.0))
    ).toDF("k", "NSW", "VIC")
    val tidy = Reshape.melt(wide, Seq("k"), Seq("NSW", "VIC"), "state", "sep")
    val got = tidy.orderBy("k", "state").collect().map(r =>
      (r.getString(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq(("a", "NSW", 1.0), ("b", "NSW", 2.0), ("b", "VIC", 3.0)))
  }

  test("U1 unionAligned null-fills missing columns, keeps all rows") {
    val f1 = Seq((1, "x")).toDF("k", "a")
    val f2 = Seq((2, "y")).toDF("k", "b")
    val u = Reshape.unionAligned(Seq(f1, f2))
    assert(u.columns.toSeq == Seq("k", "a", "b"))
    val rows = u.orderBy("k").collect()
    assert(rows(0) == Row(1, "x", null) && rows(1) == Row(2, null, "y"))
  }

  test("P8+A1 cleanAggregate: null dims group as empty string") {
    val tidy = Seq(
      (2023, "NSW", Some("c1"), 1.0),
      (2023, "NSW", None: Option[String], 2.0),
      (2023, "NSW", None: Option[String], 3.0)
    ).toDF("year", "state", "category", "separations")
    val clean = Tidy.cleanAggregate(tidy, Seq("category"))
    val m = clean.collect().map(r => r.getString(2) -> r.getDouble(3)).toMap
    assert(m == Map("c1" -> 1.0, "" -> 5.0))
    // invariant: totals preserved (FIXTURES A4)
    assert(clean.agg(sum("separations")).head().getDouble(0) == 6.0)
  }

  test("A9 nonEmptyDimensions: one pass, all-null dims excluded") {
    val df = Seq(("a", Option.empty[String], Some("z")))
      .toDF("k", "dead", "live")
    assert(Tidy.nonEmptyDimensions(df, Seq("dead", "live")) == Seq("live"))
  }

  test("F1 cleanText strips Excel tuple artifacts (main.py:55-57)") {
    val cases = Seq(
      ("(\"Mental health\", 1.0)", "Mental health"),
      // pandas order is strip() THEN strip('"'): the space freed by the
      // quote strip survives — pinned reference behavior (main.py:66-67).
      ("(\" Injury \", -2.5)", "Injury "),
      ("plain", "plain"),
      ("\"quoted\"", "quoted"),
      ("ends with, 42", "ends with"),
      ("  padded  ", "padded"),
      // pandas .str.strip() strips all ASCII whitespace, not just spaces
      ("\tTabbed\t", "Tabbed"),
      ("\n\"NL quoted\"\n", "NL quoted")
    ).toDF("raw", "expected")
    val bad = cases.withColumn("got", CleanText.cleanText(col("raw")))
      .filter(col("got") =!= col("expected")).collect()
    assert(bad.isEmpty, bad.mkString(","))
  }

  test("P10 normState: canonical code or null (main.py:42-45)") {
    // "QLD (a)" → "QLDA" → not a code → null (strip happens first).
    val df = Seq("n.s.w.", "Vic!", "total", "aust", "QLD (a)")
      .toDF("raw")
      .select(CleanText.normState(col("raw")).as("st"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("NSW", "VIC", null, "AUST", null))
  }

  test("P12 coerceDouble: null on unparseable (to_numeric coerce)") {
    val df = Seq("1.5", "n.p.", "2", "").toDF("raw")
      .select(CleanText.coerceDouble(col("raw")).as("v"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(1.5), None, Some(2.0), None))
  }

  test("F4 yearFromUrl: (dddd)-(dd) second group + 2000") {
    val df = Seq("x/4-admitted-patient-care-2022-23-tables-access.xlsx")
      .toDF("url").select(CleanText.yearFromUrl(col("url")).as("y"))
    assert(df.head().getInt(0) == 2023)
  }

  test("R2 pivotSum round-trips melt (property spot-check)") {
    val wide = Seq(("k1", 1.0, 2.0), ("k2", 3.0, 4.0)).toDF("k", "NSW", "VIC")
    val long = Reshape.melt(wide, Seq("k"), Seq("NSW", "VIC"), "state", "sep")
    val back = Reshape.pivotSum(long, Seq("k"), "state", Seq("NSW", "VIC"), "sep")
    val got = back.orderBy("k").collect().map(r =>
      (r.getString(0), r.getDouble(1), r.getDouble(2))).toSeq
    assert(got == Seq(("k1", 1.0, 2.0), ("k2", 3.0, 4.0)))
  }

  test("imputeGroupMedian: group median fill, flag, all-null fallback") {
    val df = Seq(
      ("a", Some(1.0)), ("a", Some(3.0)), ("a", Some(9.0)), ("a", None),
      ("b", Some(10.0)), ("b", None),
      ("c", None), ("c", None) // all-null group -> global median
    ).toDF("g", "v")
    val out = Tidy.imputeGroupMedian(df, "g", "v")
      .select("g", "v", "v_imputed")
      .as[(String, Double, Boolean)].collect().toSeq
    assert(out.forall(_._2 != 0.0) && !out.exists(r => r._2.isNaN))
    val filledA = out.filter(r => r._1 == "a" && r._3).map(_._2)
    assert(filledA == Seq(3.0))            // median of 1,3,9
    val filledB = out.filter(r => r._1 == "b" && r._3).map(_._2)
    assert(filledB == Seq(10.0))           // single observed value
    val filledC = out.filter(r => r._1 == "c").map(_._2)
    // global median over 1,3,9,10 = interpolated 6.0
    assert(filledC == Seq(6.0, 6.0), filledC.toString)
    // untouched rows keep their values and a false flag
    assert(out.filter(!_._3).map(_._2).sorted ==
      Seq(1.0, 3.0, 9.0, 10.0))
  }
}
