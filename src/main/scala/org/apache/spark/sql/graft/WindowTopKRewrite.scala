package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, ExprId, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, PredicateHelper, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer-rule tier of the custom-operator stack: rewrites the
  * canonical window-function top-k idiom
  *
  * {{{
  *   df.withColumn("rn", row_number().over(partitionBy(k...).orderBy(o...)))
  *     .filter($"rn" <= k)
  *     .drop("rn")
  * }}}
  *
  * into [[TopKPerKeyPlan]], whose physical operator keeps per-key bounded
  * heaps (one pass, O(n log k), nothing sorts or spills) instead of fully
  * sorting every key's rows just to discard all but k of them. Together
  * with [[CleanTextExpr]] (expression tier) and [[TopKPerKeyStrategy]]
  * (planner tier) this completes the extension stack: Expression →
  * Rule[LogicalPlan] → Strategy → SparkPlan.
  *
  * The rewrite fires only when it is provably safe:
  *  - the window computes exactly one expression, `row_number()` (not
  *    `rank`/`dense_rank`, whose tie semantics can return more than k
  *    rows per key);
  *  - the partition spec is non-empty (global top-k already plans as
  *    TakeOrderedAndProject) and the order spec is non-empty;
  *  - the filter bounds that row number by a literal (`rn <= k`,
  *    `rn < k`, `k >= rn`, `k > rn`, or `rn = 1`), possibly AND-ed with
  *    other predicates that do not reference the row number — those are
  *    re-applied above the rewritten operator, which is equivalent
  *    because ranking is computed before any of the conjuncts in the
  *    original plan too;
  *  - nothing above the filter references the row-number column (the
  *    projection that `drop` leaves behind proves it out of the output).
  *
  * When Spark's own `InferWindowGroupLimit` has already run (it sits in
  * the optimizer's default batches, before user-provided rules), the
  * `WindowGroupLimit` it inserted below the window is stripped: its
  * physical form requires sorted partitions — exactly the cost the heap
  * operator exists to avoid — and the heap is already exact.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** `cond` as an upper bound on the attribute `rn`, if it is one. */
  private def boundOf(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rn => Some(k)
    case LessThan(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rn => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference) if a.exprId == rn => Some(k)
    case GreaterThan(IntegerLiteral(k), a: AttributeReference) if a.exprId == rn => Some(k - 1)
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) if a.exprId == rn => Some(1)
    case EqualTo(IntegerLiteral(1), a: AttributeReference) if a.exprId == rn => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case p @ Project(projList,
        Filter(cond,
          w @ Window(Seq(Alias(WindowExpression(RowNumber(), _), _)), partSpec, ordSpec, child, _)))
        if partSpec.nonEmpty && ordSpec.nonEmpty =>
      val rnAttr = w.windowExpressions.head.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val (bounds, rest) = conjuncts.partition(c => boundOf(c, rnAttr.exprId).isDefined)
      val k = bounds match {
        case Seq(one) => boundOf(one, rnAttr.exprId)
        case _ => None // zero or conflicting bounds: leave for the window
      }
      val safe = k.exists(_ >= 1) &&
        !p.references.contains(rnAttr) &&
        rest.forall(r => !r.references.contains(rnAttr))
      if (safe) {
        // When Spark's InferWindowGroupLimit already ran (it precedes the
        // User Provided Optimizers batch, where install() puts this rule),
        // drop the WindowGroupLimit it inserted: the heap operator is
        // already exact per-key top-k, and the physical WindowGroupLimit
        // would force full partition Sorts back into the plan — the exact
        // cost this rewrite removes.
        val base = child match {
          case WindowGroupLimit(ps, os, RowNumber(), limit, grandchild)
              if ps == partSpec && os == ordSpec && limit >= k.get => grandchild
          case other => other
        }
        val topk = TopKPerKeyPlan(partSpec, ordSpec, k.get, base)
        Project(projList, rest.reduceOption(And).map(Filter(_, topk)).getOrElse(topk))
      } else p
  }

  /** Idempotently installs this rule (and the strategy that plans its
    * output) on a session built without [[graft.plans.GraftExtensions]].
    */
  def install(spark: SparkSession): Unit = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!s.experimental.extraOptimizations.contains(WindowTopKRewrite))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ WindowTopKRewrite
    if (!s.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ TopKPerKeyStrategy
  }

  /** Removes the rule again (shared-session tests). */
  def uninstall(spark: SparkSession): Unit = {
    val s = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    s.experimental.extraOptimizations =
      s.experimental.extraOptimizations.filterNot(_ == WindowTopKRewrite)
  }
}
