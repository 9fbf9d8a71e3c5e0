package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class PrivacySpec extends SparkTestBase {
  import spark.implicits._

  // 3 classes: (a,1) x5, (a,2) x2, (b,1) x1; sensitive attr s
  private def people = Seq(
    ("a", 1, "x"), ("a", 1, "x"), ("a", 1, "y"), ("a", 1, "z"), ("a", 1, "x"),
    ("a", 2, "x"), ("a", 2, "x"),
    ("b", 1, "y")
  ).toDF("seg", "nat", "s")

  test("kAnonymity: class sizes and at-risk flags") {
    val out = Privacy.kAnonymity(people, Seq("seg", "nat"), k = 3)
      .orderBy("seg", "nat")
      .as[(String, Int, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      ("a", 1, 5L, false),
      ("a", 2, 2L, true),
      ("b", 1, 1L, true)))
  }

  test("kAnonymitySummary: the one-row gate") {
    val r = Privacy.kAnonymitySummary(people, Seq("seg", "nat"), k = 3)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(r == ((3L, 2L, 8L, 3L, 1L))) // classes, risky, rows, risky rows, min
  }

  test("suppressRisky: the release is k-anonymous by construction") {
    val out = Privacy.suppressRisky(people, Seq("seg", "nat"), k = 3)
    // only class (a,1) (5 rows) survives at k=3
    assert(out.count() == 5)
    assert(out.select("seg", "nat").distinct()
      .as[(String, Int)].collect().toSeq == Seq(("a", 1)))
    val audit = Privacy.kAnonymitySummary(out, Seq("seg", "nat"), k = 3)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(audit._2 == 0L && audit._5 >= 3L) // no risky classes left
  }

  test("lDiversity: k-anonymous class can still fail diversity") {
    // class (a,2) has 2 rows but only one sensitive value 'x'
    val out = Privacy.lDiversity(people, Seq("seg", "nat"), "s", l = 2)
      .orderBy("seg", "nat")
      .as[(String, Int, Long, Long, Boolean)].collect().toSeq
    assert(out == Seq(
      ("a", 1, 5L, 3L, true),
      ("a", 2, 2L, 1L, false),
      ("b", 1, 1L, 1L, false)))
  }
}
