package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.graft.CleanTextExpr
import graft.SparkTestBase
import graft.ops.CleanText

/** The fused native expression must be bit-identical to the composed
  * built-in pipeline — on the golden cases, on a real corpus, and on
  * adversarial generated strings (parens/quotes/commas/numbers/ws).
  */
class CleanTextExprSpec extends SparkTestBase {
  import spark.implicits._

  private def crossCheck(inputs: Seq[String]): Unit = {
    val df = inputs.toDF("raw").select(
      col("raw"),
      CleanText.cleanText(col("raw")).as("composed"),
      CleanTextExpr.clean_text(col("raw")).as("fused"))
    val diff = df.filter(not(col("composed") <=> col("fused"))).collect()
    assert(diff.isEmpty,
      diff.take(5).map(r => s"'${r.get(0)}' -> composed='${r.get(1)}' fused='${r.get(2)}'")
        .mkString("; "))
  }

  test("fused == composed on golden reference cases") {
    crossCheck(Seq(
      "(\"Mental health\", 1.0)", "(\" Injury \", -2.5)", "plain",
      "\"quoted\"", "ends with, 42", "  padded  ", "", "(", ")", "(\")",
      "x, 1.2.3", "x,.5", "x,5.", "a, 1, 2", "(abc", "abc\")",
      "\"\"\"triple\"\"\"", ", 7", ",x7", "(\"", "-3", "a,+3", "a, -0.5",
      "\tTabbed\t", "\n\"NL\"\n", "(\"\tws\t\", 1.0)", "vt"))
  }

  test("fused == composed on the documents + part corpus") {
    val parts = graft.io.Tables.load(spark, sf, "part")
      .select(concat(lit("(\""), col("p_name"), lit("\", 1.0)")).as("raw"))
      .as[String].collect().toSeq
    val docs = graft.io.Tables.load(spark, sf, "documents")
      .select(col("text")).as[String].collect().toSeq.take(200)
    crossCheck(parts ++ docs)
  }

  test("fused == composed on generated adversarial strings") {
    val charGen = Gen.frequency(
      5 -> Gen.oneOf('a', 'b'), 2 -> Gen.oneOf('0', '1', '9'),
      2 -> Gen.oneOf('(', ')', '"', ',', '.', '+', '-'),
      2 -> Gen.oneOf(' ', '\t', '\n', '\u000B'))
    val strGen = Gen.listOf(charGen).map(_.mkString).map(_.take(12))
    val cases = (0 until 400).flatMap(i =>
      strGen.apply(Gen.Parameters.default, Seed(1000L + i)))
    crossCheck(cases)
  }

  test("rolling_hash matches a reference implementation and is order-sensitive") {
    import org.apache.spark.sql.graft.RollingHash
    def ref(s: String): Long = {
      val M = BigInt(RollingHash.Mod)
      s.getBytes("UTF-8").foldLeft(BigInt(0))((h, b) =>
        (h * RollingHash.Base + (b & 0xff)) % M).toLong
    }
    val inputs = Seq("", "a", "ab", "ba", "the quick brown fox", "日本語テキスト")
    val got = inputs.toDF("s")
      .select(graft.functions.native_fns.rolling_hash(col("s")).as("h"))
      .as[Long].collect()
    assert(got.toSeq == inputs.map(ref))
    assert(ref("ab") != ref("ba"), "position sensitivity")
  }

  test("SQL registration via extensions descriptor") {
    graft.plans.GraftExtensions.register(spark)
    val got = spark.sql(
      """SELECT clean_text('("Mental health", 1.0)') AS c""")
      .as[String].head()
    assert(got == "Mental health")
    val dot = spark.sql(
      "SELECT quantized_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d")
      .as[Long].head()
    assert(dot == 32L)
    // the full native-expression surface is SQL-callable
    val norm = spark.sql(
      "SELECT unicode_normalize('école', 'NFC') AS n")
      .as[String].head()
    assert(norm == "école")
    val stripped = spark.sql("SELECT strip_accents('école') AS s")
      .as[String].head()
    assert(stripped == "ecole")
    val rh = spark.sql("SELECT rolling_hash('ab') AS h").as[Long].head()
    val rh2 = spark.sql("SELECT rolling_hash('ba') AS h").as[Long].head()
    assert(rh != rh2, "position sensitivity survives the SQL path")
    val jw = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS j")
      .as[Double].head()
    assert(math.abs(jw - 0.9611111111111111) < 1e-12)
    // non-literal form is rejected at analysis, not at runtime
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT unicode_normalize('x', lower('NFC'))").collect()
    }
  }

  test("jaro_winkler: textbook cases pinned to the DuckDB-probed values") {
    // (a, b, expected) — expected values probed from DuckDB's
    // jaro_winkler_similarity, which the x_jaro_score oracle uses;
    // they pin the boost-threshold (>0.7 only), the ≤4 prefix cap, the
    // 0-match and empty conventions, and the transposition halving
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),   // transpositions
      ("dixon", "dicksonx", 0.8133333333333332),  // boost applied
      ("jellyfish", "smellyfish", 0.8962962962962964), // no prefix
      ("CRATE", "TRACE", 0.7333333333333334),     // >0.7 but prefix 0
      ("abcdef", "abzzzz", 0.5555555555555555),   // ≤0.7: NO boost
      ("ab", "abcdefghij", 0.7866666666666667),   // boost over the gap
      ("abcdefg", "abcdefgggggggggg", 0.8875),    // prefix capped at 4
      ("", "abc", 0.0), ("", "", 0.0),            // empty convention
      ("ab", "ba", 0.0),                          // window 0: no match
      ("abc", "abc", 1.0), ("x", "x", 1.0))
    val got = cases.map(_._1).zip(cases.map(_._2)).toDF("a", "b")
      .select(graft.functions.native_fns.jaro_winkler(col("a"), col("b")))
      .as[Double].collect().toSeq
    cases.map(_._3).zip(got).foreach { case (want, g) =>
      assert(math.abs(g - want) < 1e-12, s"$g vs $want") }
  }

  test("jaro_winkler is symmetric and stays in whole-stage codegen") {
    val names = Seq("smith john", "smith jon", "taylor anne", "tailor ann",
      "unger solo", "ungar sollo").toDF("n")
    val pairs = names.crossJoin(names.withColumnRenamed("n", "m"))
    val f = graft.functions.native_fns.jaro_winkler _
    val asym = pairs
      .select(f(col("n"), col("m")).as("ab"), f(col("m"), col("n")).as("ba"))
      .filter(col("ab") =!= col("ba"))
    assert(asym.count() == 0)
    // parquet-backed scan so the projection plans as a codegen stage
    // ('*(n)' marker), not a LocalTableScan under non-final AQE
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select(f(col("text"), col("source")).as("j"))
    val plan = docs.queryExecution.executedPlan.toString
    assert(plan.matches("(?s).*\\*\\(\\d+\\) Project \\[jaro_winkler.*"),
      plan)
  }
}
