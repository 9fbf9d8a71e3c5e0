package graft.plans

import graft.{SparkEntry, SparkTestBase}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The plan audit as a PERMANENT gate — round 8's one-off honesty
  * encoded so it can never go stale again (the round-7 "zero
  * SinglePartition" claim rotted precisely because it was a manual
  * sweep with a broken grep spelling; see PlanAudit's scaladoc).
  *
  * For EVERY query in SparkEntry.queries this spec parses the formatted
  * physical plan and asserts the three scale-killer shapes only occur
  * over bounded inputs:
  *   - `Exchange SinglePartition` must be (a) the global-aggregate
  *     final pass (producer = keys-empty partial aggregate — one
  *     pre-combined row per upstream partition), (b) the two-phase rank
  *     machinery's `__b*` bucket-totals table (≤256 rows by
  *     construction), or (c) in the per-query bounded-domain inventory
  *     below, each entry carrying its written bound;
  *   - `CartesianProduct`: zero, everywhere, no exceptions;
  *   - global windows (windowspecdefinition without partition keys):
  *     same `__b*` / inventory rule.
  *
  * A new query that reintroduces a data-sized global window or
  * single-partition sort FAILS this spec (proven by the planted-
  * offender test at the bottom) and must either be refactored onto the
  * bucketed two-phase machinery or argue its bound into the inventory.
  */
class PlanAuditSpec extends SparkTestBase {

  /** Queries whose partition-free shapes are over DOCUMENTED bounded
    * domains (the PERF.md round-8 inventory, kept in lockstep with the
    * contracts written at each operator site). */
  private val boundedInventory: Map[String, String] = Map(
    "x_calib_iso" -> ("repartition(1) for the weighted-PAV scan over " +
      "the <=1001-row distinct-integer-score table (documented " +
      "bounded-domain contract of the isotonic series)"),
    "x_kaplan_meier" -> ("global windows over the DISTINCT event " +
      "durations table - follow-up-bounded by the KM contract"),
    "x_vocab_coverage" -> "global window over the top-500 vocab table")

  /** Bucket-machinery columns: the ≤`buckets`-row bucket-totals tables
    * of ops/Ranks and ext/Eval.strictlyBelow (`__b`, `__bk`, `__bt_*`,
    * `__bucket`, `__btot`, ...). Token-anchored, not substring: a
    * column NAMED with the `__b` prefix qualifies, an unrelated name
    * merely containing "__b" does not. */
  private def isBucketBounded(input: String): Boolean =
    input.stripPrefix("[").stripSuffix("]").split(", ")
      .exists(_.startsWith("__b"))

  test("every query plan: SinglePartition exchanges, global windows " +
    "and cartesian products only over bounded inputs") {
    val sfDir = sf
    val violations = scala.collection.mutable.ArrayBuffer[String]()
    var audited = 0
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val report = PlanAudit.audit(fn(spark, sfDir))
      audited += 1
      report.cartesianProducts.foreach(cp =>
        violations += s"$name: CartesianProduct id=${cp.id}")
      if (!boundedInventory.contains(name)) {
        report.singlePartitionExchanges
          .filterNot(PlanAudit.isPartialAggFinalPass(report, _))
          .filterNot(ex => isBucketBounded(ex.input))
          .foreach(ex => violations += s"$name: SinglePartition " +
            s"exchange id=${ex.id} over ${ex.input} (child " +
            s"${report.childOf(ex).map(_.name).getOrElse("?")})")
        report.globalWindows
          .filterNot(w => isBucketBounded(w.input))
          .foreach(w => violations += s"$name: global window " +
            s"id=${w.id} over ${w.input}")
      }
    }
    assert(audited == SparkEntry.queries.size)
    assert(violations.isEmpty,
      s"\n${violations.size} un-inventoried scale-killer shapes:\n" +
        violations.mkString("\n"))
    // the inventory can only shrink deliberately: every entry must
    // still name a live query (a renamed/removed query must clean up
    // its allowance, not leave a stale hole for a future query)
    val stale = boundedInventory.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"stale inventory entries: $stale")
  }

  test("a planted data-sized global window IS flagged (the gate bites)") {
    val df = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("rn", row_number().over(
        Window.orderBy(col("o_totalprice"))))
    val report = PlanAudit.audit(df)
    assert(report.globalWindows.nonEmpty,
      "auditor missed a no-partitionBy window")
    assert(report.globalWindows.exists(w => !isBucketBounded(w.input)),
      "planted offender wrongly classified as bucket-bounded")
    // and the single-partition exchange feeding it is not excusable as
    // a global-agg final pass
    val sp = report.singlePartitionExchanges
      .filterNot(PlanAudit.isPartialAggFinalPass(report, _))
    assert(sp.nonEmpty, "auditor missed the single-partition exchange")
  }

  test("a planted cartesian product IS flagged") {
    val a = spark.read.parquet(s"$sf/nation.parquet")
      .hint("shuffle_replicate_nl")
    val b = spark.read.parquet(s"$sf/region.parquet")
    val df = a.join(b, col("n_nationkey") > col("r_regionkey"))
    val report = PlanAudit.audit(df)
    assert(report.cartesianProducts.nonEmpty)
  }

  test("windowspecdefinition partition detection: partitioned specs " +
    "pass, global specs flag, nested parens don't confuse the scan") {
    assert(PlanAudit.hasGlobalWindowSpec(
      "[sum(x#1L) windowspecdefinition(s#2 ASC NULLS FIRST, " +
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), -1)) " +
        "AS y#3L], [s#2 ASC NULLS FIRST]"))
    assert(!PlanAudit.hasGlobalWindowSpec(
      "[sum(x#1L) windowspecdefinition(__b#9, s#2 ASC NULLS FIRST, " +
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), -1)) " +
        "AS y#3L], [__b#9], [s#2 ASC NULLS FIRST]"))
    assert(!PlanAudit.hasGlobalWindowSpec(
      "[first(coalesce(a#1, b#2)) windowspecdefinition(k#3, " +
        "specifiedwindowframe(RowFrame, unboundedpreceding$(), " +
        "currentrow$())) AS f#4]"))
    assert(!PlanAudit.hasGlobalWindowSpec("no window spec here"))
  }
}
