package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MERGE INTO / upsert semantics as a pure DataFrame transform — the
  * maintenance operation every periodically-refreshed table needs
  * (dimension updates, late-arriving corrections, CDC apply) and the one
  * relational op the reference's overwrite-only sink
  * (`/root/reference/main.py:155-165` rewrites both tables wholesale)
  * cannot express incrementally.
  *
  * Semantics (the standard three-clause MERGE):
  *   - matched  + delete condition      → row removed
  *   - matched  (otherwise)             → row replaced by the update row
  *     (UPDATE SET *)
  *   - not matched (update side only)   → row inserted (INSERT *)
  *   - base row with no matching update → kept unchanged
  * The delete condition is evaluated against the UPDATE row and only for
  * matched keys — an unmatched update row inserts regardless, matching
  * `WHEN MATCHED AND <cond> THEN DELETE` scoping.
  *
  * Scale shape: one equi-join on the merge key. Catalyst broadcasts the
  * update side when it is small (the common CDC case — a day's changes
  * against years of base); otherwise it is a single key-partitioned
  * shuffle join, and AQE's skew splitting applies. Both inputs are used
  * exactly once; no window, no global sort. Each side is packed into a
  * single struct before the join so identical column names never
  * collide, and "which side produced this row" is a null-struct test,
  * not a sentinel value — correct even when every data column of a row
  * is legitimately NULL.
  */
object Merge {

  /** Apply `updates` (same schema as `base`, any extra columns ignored)
    * to `base` on equality of `keys`. Output schema = base schema.
    * Requires merge keys to be non-null on both sides (null keys never
    * match in SQL; here they are rejected by filter so a null-keyed
    * update cannot silently insert).
    */
  def mergeInto(base: DataFrame, updates: DataFrame, keys: Seq[String],
                deleteCondition: Column = lit(false)): DataFrame = {
    val dataCols = base.columns.toSeq
    val keyNotNull = keys.map(col(_).isNotNull).reduce(_ && _)
    val b = base.filter(keyNotNull)
      .select(struct(dataCols.map(col): _*).as("_b"))
      .select(col("_b") +: keys.map(k => col(s"_b.$k").as(k)): _*)
    val u = updates.filter(keyNotNull)
      .withColumn("_del", coalesce(deleteCondition, lit(false)))
      .select(struct(dataCols.map(col): _*).as("_u"), col("_del"))
      .select(Seq(col("_u"), col("_del")) ++
        keys.map(k => col(s"_u.$k").as(k)): _*)
    b.join(u, keys, "full_outer")
      .filter(!(col("_b").isNotNull && col("_u").isNotNull && col("_del")))
      .select(dataCols.map(c =>
        when(col("_u").isNotNull, col(s"_u.$c"))
          .otherwise(col(s"_b.$c")).as(c)): _*)
  }
}
