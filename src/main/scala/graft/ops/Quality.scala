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
}
