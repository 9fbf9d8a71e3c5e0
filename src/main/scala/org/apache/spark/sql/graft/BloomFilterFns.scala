// Lives under org.apache.spark.sql for private[sql] plumbing (see
// CleanTextExpr). Public facade: graft.functions.native_fns and
// graft.ops.BloomJoin.
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column facade over Catalyst's runtime-filter expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`) — the same pair
  * Spark's own `InjectRuntimeFilter` rule wires up for shuffle-join
  * pruning, exposed here so an operator can build the filter on one
  * relation and prune another *explicitly* (cross-stage, cross-query, or
  * ahead of a join the optimizer can't see through).
  *
  * `BloomFilterMightContain.checkInputDataTypes` requires the filter to
  * be foldable (or a scalar subquery), so the merged filter travels as a
  * BINARY literal: build distributed (partial aggregation on executors),
  * merge to one KB–MB byte array, embed. On a cluster that literal rides
  * the task broadcast exactly like Spark's own injected filters.
  */
object BloomFilterFns {

  /** Aggregate a LONG key column into a serialized Bloom filter.
    *
    * @param estimatedItems expected distinct keys (sizes the filter)
    * @param numBits        filter bits; ~8× items ≈ 2% false positives,
    *                       ~16× ≈ 0.05%
    */
  def bloom_filter_agg(key: Column, estimatedItems: Long,
                       numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(key),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** True if `key` is possibly in the filter; false = definitely absent.
    * `bloom` must be foldable (pass the merged filter via `lit(bytes)`).
    * Codegen'd (`BloomFilterMightContain.doGenCode`), so the probe stays
    * inside the scan's WholeStageCodegen span.
    */
  def might_contain(bloom: Column, key: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloom), ExpressionUtils.expression(key)))
}
