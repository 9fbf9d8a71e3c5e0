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
