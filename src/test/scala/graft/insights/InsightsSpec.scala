package graft.insights

import graft.SparkTestBase

class InsightsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val tidy = Seq(
    (2022, "NSW", "Mental health", 100.0),
    (2022, "VIC", "Injury", 50.0),
    (2023, "NSW", "Mental health", 200.0),
    (2023, "VIC", "Injury", 50.0)
  ).toDF("year", "state", "category", "separations")

  test("insights: top state, top category, YoY direction") {
    val lines = Insights.generate(tidy)
    assert(lines.length == 3)
    assert(lines(0).contains("NSW"), lines(0))     // 300 vs 100
    assert(lines(1).contains("Mental health"))     // 300 vs 100
    assert(lines(2).contains("increased") && lines(2).contains("66.7"),
      lines(2))                                    // 150 -> 250 = +66.7%
  }

  test("insights guards: empty frame -> no lines; single year -> no YoY") {
    assert(Insights.generate(tidy.limit(0)).isEmpty)
    val oneYear = tidy.filter($"year" === 2022)
    val lines = Insights.generate(oneYear)
    assert(lines.length == 2, lines.mkString("|"))
    assert(!lines.exists(_.contains("%")), "no YoY line for a single year")
  }
}
