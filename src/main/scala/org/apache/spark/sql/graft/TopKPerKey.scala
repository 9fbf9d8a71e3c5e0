package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom-plan tier (the builder brief's option (c)):
  * grouped top-k as a first-class operator — logical node, planner
  * strategy, and a physical operator with per-key bounded heaps.
  *
  * Why not a window? `row_number().over(partitionBy(keys).orderBy(o))
  * <= k` SORTS every key's full row set (O(n log n) per partition,
  * spill-prone at 100 TB: a key with 10^8 rows sorts 10^8 rows to
  * return 10). The heap operator does one pass per partition keeping k
  * rows per key — O(n log k) time, O(|keys in partition|·k) memory,
  * nothing spills because nothing beyond the heaps is retained. Spark
  * has this trick only for GLOBAL top-k (TakeOrderedAndProject);
  * this operator is the per-key generalization, and the exchange it
  * requires is declared via requiredChildDistribution so Catalyst
  * plans (and AQE re-plans) the shuffle like any built-in aggregate.
  */
case class TopKPerKeyPlan(keyExprs: Seq[Expression], ordering: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(keyExprs: Seq[Expression], ordering: Seq[SortOrder],
                          k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  // all rows of a key in one partition; Catalyst/AQE supply the exchange
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keyExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keyE = keyExprs
    val sortE = ordering
    val childOutput = child.output
    child.execute().mapPartitionsInternal { it =>
      val keyProj = UnsafeProjection.create(keyE, childOutput)
      val rowOrd: Ordering[InternalRow] =
        new LazilyGeneratedOrdering(sortE, childOutput)
      // max-heap on the sort order: top = current worst of the kept k
      val heaps = scala.collection.mutable.LinkedHashMap
        .empty[UnsafeRow, scala.collection.mutable.PriorityQueue[UnsafeRow]]
      it.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = scala.collection.mutable.PriorityQueue
              .empty[UnsafeRow](rowOrd.on((r: UnsafeRow) => r))
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kLocal) {
          heap.enqueue(row.copy().asInstanceOf[UnsafeRow])
        } else if (rowOrd.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy().asInstanceOf[UnsafeRow])
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        // drain to per-key ascending sort order
        heap.dequeueAll.reverseIterator
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Planner strategy mapping the logical node to the heap operator. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, ordering, k, child) =>
      TopKPerKeyExec(keys, ordering, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Top `k` rows per `keys` group under `orderBy` (pass `col.asc` /
    * `col.desc`; bare columns default ascending). The ordering should
    * be TOTAL within a key (add a unique tiebreaker) for deterministic
    * results — same contract as any rank-based top-k.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], orderBy: Seq[Column],
                 k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    // sessions built withExtensions(GraftExtensions) already have the
    // strategy; for any other session, the public experimental hook
    // registers it idempotently so the operator is self-contained
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    // the node enters the plan fully RESOLVED: spark.expression()
    // materializes the real expression tree and attribute names are
    // bound against the analyzed child here, not by the analyzer
    val analyzed = df.queryExecution.analyzed
    val resolver = spark.sessionState.conf.resolver
    def resolve(e: Expression): Expression = e.transformUp {
      case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
        analyzed.output.find(a => resolver(a.name, u.name)).getOrElse(
          throw new IllegalArgumentException(
            s"column ${u.name} not among ${analyzed.output.map(_.name)}"))
    }
    val sortOrder = orderBy.map(c => spark.expression(c)).map {
      case so: SortOrder => so.copy(child = resolve(so.child))
      case e => SortOrder(resolve(e), Ascending)
    }
    val keyExprs: Seq[Expression] = keys.map(n =>
      resolve(spark.expression(org.apache.spark.sql.functions.col(n))))
    org.apache.spark.sql.classic.Dataset.ofRows(spark,
      TopKPerKeyPlan(keyExprs, sortOrder, k, analyzed))
  }
}
