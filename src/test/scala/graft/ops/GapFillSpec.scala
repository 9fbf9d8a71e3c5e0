package graft.ops

import java.sql.Date

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class GapFillSpec extends SparkTestBase {
  import spark.implicits._

  private def d(s: String) = Date.valueOf(s)

  // series "a": days 1,4 present (gap 2,3); series "b": days 2,3 present
  private def sparse = Seq(
    ("a", d("2024-01-01"), 5L, 10.0),
    ("a", d("2024-01-04"), 2L, 40.0),
    ("b", d("2024-01-02"), 1L, 7.0),
    ("b", d("2024-01-03"), 3L, 9.0)
  ).toDF("k", "day", "n", "level")

  test("spine covers each key's [min,max]; counts 0-filled; levels forward-filled") {
    val out = GapFill.fillDaily(sparse, Seq("k"), "day",
      zeroFill = Seq("n"), forwardFill = Seq("level"))
      .orderBy("k", "day")
      .as[(String, Date, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("a", d("2024-01-01"), 5L, 10.0),
      ("a", d("2024-01-02"), 0L, 10.0),
      ("a", d("2024-01-03"), 0L, 10.0),
      ("a", d("2024-01-04"), 2L, 40.0),
      ("b", d("2024-01-02"), 1L, 7.0),
      ("b", d("2024-01-03"), 3L, 9.0)))
  }

  test("dense series is a no-op; single-row series yields one row") {
    val dense = Seq(("a", d("2024-02-01"), 1L, 1.0),
      ("a", d("2024-02-02"), 2L, 2.0), ("x", d("2024-03-01"), 9L, 9.0))
      .toDF("k", "day", "n", "level")
    val out = GapFill.fillDaily(dense, Seq("k"), "day",
      Seq("n"), Seq("level")).orderBy("k", "day")
      .as[(String, Date, Long, Double)].collect().toSeq
    assert(out.size == 3 && out.last == ("x", d("2024-03-01"), 9L, 9.0))
  }

  test("partitioning-invariant") {
    val a = GapFill.fillDaily(sparse.repartition(1), Seq("k"), "day",
      Seq("n"), Seq("level")).orderBy("k", "day").collect().toSeq
    val b = GapFill.fillDaily(sparse.repartition(7), Seq("k"), "day",
      Seq("n"), Seq("level")).orderBy("k", "day").collect().toSeq
    assert(a == b)
  }

  test("plan: one shuffle by key feeds both the spine and the window") {
    val out = GapFill.fillDaily(sparse, Seq("k"), "day", Seq("n"), Seq("level"))
    val plan = out.queryExecution.executedPlan.toString
    // no global (empty-partition-key) window — fill runs per key
    assert(!plan.contains("Window [") ||
      plan.contains("windowspecdefinition(k"))
  }
}
