package graft.agg

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact frequent-items ("heavy hitters") via Misra-Gries candidate
  * generation plus a verification count — the two-pass shape that scales
  * where a full `groupBy(key).count` does not: pass 1 never shuffles the
  * key universe (each task keeps ≤ k counters and emits ≤ k candidate
  * keys), pass 2 counts ONLY the candidate set via a broadcast semi join.
  *
  * Guarantee (what makes the result exact, not approximate): Misra-Gries
  * with k counters over a partition of size `n_p` surfaces every item
  * whose partition frequency exceeds `n_p/(k+1)`. If an item's GLOBAL
  * frequency exceeds `N/(k+1)`, then by averaging some partition has it
  * above its local threshold, so the union of per-partition candidates
  * is a superset of the global heavy hitters. The exact verification
  * count then removes the false candidates — output is EXACTLY
  * `{key : freq(key) > N/(k+1)}` with exact counts, independent of
  * partitioning. (Candidate-then-verify, same design as the LSH→cosine
  * and MG→count patterns in published frequent-item systems; see
  * Misra & Gries 1982, "Finding repeated elements".)
  *
  * At 100 TB: pass 1 is a map-only scan emitting ≤ k keys per task; the
  * candidate table is ≤ k × tasks rows (KBs), broadcast for pass 2's
  * semi join; pass 2 shuffles only candidate-key rows. No stage ever
  * materializes the full distinct-key universe.
  */
object HeavyHitters {

  /** Per-partition Misra-Gries candidate keys (distinct, ≤ k/partition).
    * Null keys are ignored (no frequency semantics for null).
    */
  def misraGriesCandidates(df: DataFrame, keyCol: String,
                           k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull).as[String]
    keys.mapPartitions { it =>
      val counters = mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        counters.get(x) match {
          case Some(c) => counters.update(x, c + 1)
          case None if counters.size < k => counters.update(x, 1L)
          case None =>
            // decrement-all step: amortized O(1) per input item because
            // each decrement cancels one prior increment
            val dead = mutable.ArrayBuffer.empty[String]
            counters.foreach { case (key, c) =>
              if (c == 1L) dead += key else counters.update(key, c - 1)
            }
            dead.foreach(counters.remove)
        }
      }
      counters.keysIterator
    }.toDF("key").distinct()
  }

  /** Exact heavy hitters: keys with `count(key) * (k+1) > count(*)`,
    * with exact counts. Output: (key STRING, n BIGINT).
    */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val keyed = df.select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull)
    val candidates = misraGriesCandidates(df, keyCol, k)
    // total rides the plan as a broadcast 1-row aggregate (no eager
    // count() at operator-build time — same laziness contract as tfidf)
    val total = keyed.agg(count(lit(1)).as("__total"))
    keyed
      .join(broadcast(candidates), Seq("key"), "left_semi")
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") * (k + 1) > col("__total"))
      .select(col("key"), col("n"))
  }
}
