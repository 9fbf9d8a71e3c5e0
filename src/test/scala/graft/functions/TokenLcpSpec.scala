package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** The native token_lcp must agree with a Scala reference (and with
  * the composed zip_with/aggregate HOF it replaced) on random token
  * arrays, honor min-length/null contracts, and survive whole-stage
  * codegen (the collect path) AND interpreted eval (constant folding).
  */
class TokenLcpSpec extends SparkTestBase {
  import spark.implicits._

  private def hofLcp(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x <=> y),
      struct(lit(true).as("go"), lit(0L).as("n")),
      (acc, e) => struct(
        (acc.getField("go") && e).as("go"),
        when(acc.getField("go") && e, acc.getField("n") + 1L)
          .otherwise(acc.getField("n")).as("n")),
      acc => acc.getField("n"))

  test("matches the Scala reference and the replaced HOF form on " +
    "random token arrays") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("a", "b", "ab", "ba", "x")
    val rows = Seq.fill(200)((
      Array.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))),
      Array.fill(rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size)))))
    val got = rows.toDF("a", "b").select(
      col("a"), col("b"),
      native_fns.token_lcp(col("a"), col("b")).as("lcp"),
      hofLcp(col("a"), col("b")).as("ref")).collect()
    got.foreach { r =>
      val (a, b) = (r.getSeq[String](0), r.getSeq[String](1))
      val want = a.zip(b).takeWhile { case (x, y) => x == y }.size.toLong
      assert(r.getLong(2) == want, s"native: $a vs $b")
      assert(r.getLong(3) == want, s"hof: $a vs $b")
    }
  }

  test("min-length, empty, and null-array contracts") {
    val rows = Seq(
      (Some(Seq("a", "b", "c")), Some(Seq("a", "b"))),      // prefix: 2
      (Some(Seq.empty[String]), Some(Seq("a"))),            // empty: 0
      (None: Option[Seq[String]], Some(Seq("a"))),          // null -> null
      (Some(Seq("a")), None: Option[Seq[String]]))
      .toDF("a", "b")
      .select(native_fns.token_lcp(col("a"), col("b")).as("lcp"))
      .collect()
    assert(rows(0).getLong(0) == 2L)
    assert(rows(1).getLong(0) == 0L)
    assert(rows(2).isNullAt(0) && rows(3).isNullAt(0))
  }

  test("null ELEMENTS end the prefix symmetrically (no NPE) on both " +
    "eval paths") {
    // left-null, right-null, and null-vs-null must all count as a
    // mismatch at that position — never a task-killing NPE, never a
    // null==null match. Codegen path (column inputs):
    val rows = Seq(
      (Seq[String]("a", null, "c"), Seq[String]("a", "b", "c")),  // 1
      (Seq[String]("a", "b", "c"), Seq[String]("a", null, "c")),  // 1
      (Seq[String]("a", null, "c"), Seq[String]("a", null, "c")), // 1
      (Seq[String](null), Seq[String](null)))                     // 0
      .toDF("a", "b")
      .select(native_fns.token_lcp(col("a"), col("b")).as("lcp"))
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 1L, 1L, 0L))
    // interpreted path (literals constant-fold through eval):
    val lit1 = spark.range(1).select(
      native_fns.token_lcp(
        array(lit("x"), lit(null).cast("string"), lit("z")),
        array(lit("x"), lit("y"), lit("z"))).as("lcp"))
      .head().getLong(0)
    assert(lit1 == 1L)
  }

  test("interpreted eval path agrees (literal inputs constant-fold)") {
    val one = spark.range(1).select(
      native_fns.token_lcp(
        array(lit("x"), lit("y"), lit("z")),
        array(lit("x"), lit("y"), lit("q"))).as("lcp"))
      .head().getLong(0)
    assert(one == 2L)
  }
}
