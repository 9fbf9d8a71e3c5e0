package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality gate: declarative rules evaluated either as ONE
  * aggregate pass (the gate job) or as `Dataset.observe` metrics that
  * ride an existing job's plan — at 100 TB the difference between a
  * second full scan and free telemetry. Rules are arbitrary boolean
  * violation predicates, so range/null/regex/cross-column checks all
  * take the same shape; referential integrity, which needs a second
  * table, is its own anti-join helper.
  */
object Quality {

  /** A named violation predicate: true = row violates the rule. */
  case class Rule(name: String, violation: Column)

  private def counters(rules: Seq[Rule]): Seq[Column] =
    count(lit(1)).as("n_rows") +:
      rules.map(r => sum(when(r.violation, 1L).otherwise(0L)).as(r.name))

  /** One map-side-combined aggregate pass → a single row:
    * (n_rows, <violations per rule>).
    */
  def violationCounts(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    df.agg(counters(rules).head, counters(rules).tail: _*)
  }

  /** The same counters attached to `df`'s plan as observed metrics: the
    * returned frame computes whatever the caller was computing anyway,
    * and the Observation yields the quality row after the first action
    * — no extra scan, no extra shuffle.
    */
  def observed(df: DataFrame, rules: Seq[Rule]): (DataFrame, Observation) = {
    require(rules.nonEmpty, "no rules")
    val obs = Observation("quality")
    (df.observe(obs, counters(rules).head, counters(rules).tail: _*), obs)
  }

  /** Referential integrity: child rows whose `childKey` has no match in
    * `parent.parentKey` — planned as a left-anti hash join (broadcast
    * when the parent key set is small). Null child keys never match, so
    * they surface as orphans — the useful reading of a null foreign key.
    */
  def orphans(child: DataFrame, childKey: String,
              parent: DataFrame, parentKey: String): DataFrame =
    child.join(parent.select(col(parentKey).as(childKey)).distinct(),
      Seq(childKey), "left_anti")

  /** Approximate-functional-dependency audit: for the candidate FD
    * `lhs → rhs`, one row per LHS value with its row count, the number
    * of distinct RHS values it maps to, and the VIOLATION count — the
    * minimum rows to delete to make the dependency hold on that group
    * (rows outside the group's majority RHS value; g₃-error numerator,
    * Kivinen & Mannila). `holds` marks clean groups.
    *
    * Two chained aggregates: `groupBy(lhs, rhs)` counts (map-side
    * combined over the raw scan — the only pass over the data), then a
    * `groupBy(lhs)` fold over the |lhs×rhs-distinct| table, which
    * reuses the first shuffle's partitioning (lhs is a prefix of the
    * first grouping key, so Spark plans no second exchange). No
    * windows, no self-joins; skew in a hot LHS value is one group of
    * counts, not data rows.
    */
  def fdViolations(df: DataFrame, lhs: Seq[String],
                   rhs: String): DataFrame = {
    require(lhs.nonEmpty, "need at least one LHS column")
    df.groupBy((lhs :+ rhs).map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .groupBy(lhs.map(col): _*)
      .agg(sum(col("__n")).as("n_rows"),
        count(lit(1)).as("n_rhs_values"),
        (sum(col("__n")) - max(col("__n"))).as("n_violations"))
      .withColumn("holds", col("n_violations") === 0L)
  }

  /** Benford first-digit audit (fraud/fabrication screening): the
    * distribution of first significant digits of a naturally-spanning
    * positive amount column vs Benford's law P(d) = log₁₀(1+1/d).
    * Output one row per digit 1-9: count, observed share, expected
    * share, and the signed deviation — plus the χ²-style summary via
    * [[benfordStat]].
    *
    * Digit extraction is STRING-based over a DECIMAL(18,2) rendering
    * (first char of the digits-only form) — engine-portable where a
    * log₁₀/power extraction risks boundary ulps at exact powers of
    * ten. The nine expected shares are driver-side constants riding
    * the plan as literals; no transcendental executes per row. One
    * group-by over ≤9 keys.
    *
    * The digit domain is CLOSED: all nine digits appear even at zero
    * observed count (left join against the 1-9 literal table). A digit
    * absent from the data is the strongest fabrication signal — it must
    * contribute N·P(d) to [[benfordStat]]'s χ², which a dropped row
    * silently cannot.
    */
  def benford(df: DataFrame, valueCol: String): DataFrame = {
    val expected = (1 to 9).map(d => d -> math.log10(1.0 + 1.0 / d))
    val digit = substring(regexp_replace(
      col(valueCol).cast("decimal(18,2)").cast("string"),
      "[^1-9]", ""), 1, 1).cast("int")
    val observed = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .withColumn("__d", digit)
      .filter(col("__d").isNotNull) // pure-zero amounts have no digit
      .groupBy(col("__d").as("digit"))
      .agg(count(lit(1)).as("__obs"))
    val counts = df.sparkSession.range(1, 10)
      .select(col("id").cast("int").as("digit"))
      .join(broadcast(observed), Seq("digit"), "left")
      .select(col("digit"), coalesce(col("__obs"), lit(0L)).as("n"))
    val total = counts.agg(sum(col("n")).as("__t"))
    val exp = expected.foldLeft(lit(null).cast("double")) {
      case (acc, (d, p)) => when(col("digit") === d, lit(p)).otherwise(acc)
    }
    counts.crossJoin(broadcast(total))
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("__t").cast("double")).as("share"),
        exp.as("expected"))
      .withColumn("deviation", col("share") - col("expected"))
  }

  /** One-row Benford summary: n and the χ² statistic
    * Σ n·(share−expected)²/expected over the digit table — the single
    * alarm number (compare against χ²₈ critical values).
    */
  def benfordStat(df: DataFrame, valueCol: String): DataFrame =
    benford(df, valueCol).agg(
      sum(col("n")).as("n_rows"),
      // χ² = Σ_d (O_d−E_d)²/E_d = N·Σ_d dev_d²/exp_d
      sum(col("deviation") * col("deviation") / col("expected"))
        .as("__devsum"))
      .select(col("n_rows"),
        (col("n_rows").cast("double") * col("__devsum")).as("chi2"))

  /** Corpus-level FD summary: one row — (n_groups, n_violating_groups,
    * n_rows, n_violations, g3_error = violations/rows as one IEEE
    * division). The go/no-go number for "is `lhs → rhs` a real key?".
    */
  def fdSummary(df: DataFrame, lhs: Seq[String], rhs: String): DataFrame =
    fdViolations(df, lhs, rhs).agg(
      count(lit(1)).as("n_groups"),
      sum(when(col("holds"), 0L).otherwise(1L)).as("n_violating_groups"),
      sum(col("n_rows")).as("n_rows"),
      sum(col("n_violations")).as("n_violations"),
      (sum(col("n_violations")).cast("double") /
        sum(col("n_rows")).cast("double")).as("g3_error"))
}
