package graft.agg

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.ZoneMap

/** Incremental rollup (materialized aggregate) maintenance over an
  * append-only parquet table — the consumer of
  * [[graft.io.ZoneMap.manifestDiff]]'s "files added since version N"
  * primitive. A rollup over SUM-MERGEABLE state (per-dim sums + row
  * count; avg/rate derive at read time) can absorb new data by
  * aggregating ONLY the new files and merging — a 100 TB base table
  * refreshes for the cost of its latest increment, not a rebuild.
  *
  * The merge identity `agg(base ∪ delta) = merge(agg(base),
  * agg(delta))` holds for sums/counts (and any commutative monoid);
  * it does NOT hold for deletes or updates-in-place — the store is
  * append-only by contract, which [[refreshBetween]] enforces by
  * rejecting diffs containing removed files (a compaction rewrote
  * history; rebuild instead).
  *
  * Scale: refresh cost = scan(new files) + a |rollup| ⊎ |delta-rollup|
  * merge group-by; the rollup itself is |distinct dims| rows. Spec-
  * pinned: incremental refresh across manifest versions equals a
  * from-scratch rebuild, bit-exactly (DECIMAL(18,2) sum discipline).
  */
object IncrementalRollup {

  /** Build the mergeable rollup state for `dims` × `measures`:
    * per-group `<m>_sum DECIMAL(38,2)` for each measure plus `n_rows`.
    * DECIMAL accumulation keeps merges order-independent (the engine's
    * reproducibility convention) — derive doubles at read time.
    */
  def build(df: DataFrame, dims: Seq[String],
            measures: Seq[String]): DataFrame = {
    require(dims.nonEmpty && measures.nonEmpty, "need dims and measures")
    val aggs = measures.map(m =>
      sum(col(m).cast("decimal(18,2)")).cast("decimal(38,2)")
        .as(s"${m}_sum")) :+ count(lit(1)).as("n_rows")
    df.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two rollup states (same schema): re-group and add. */
  def merge(a: DataFrame, b: DataFrame, dims: Seq[String],
            measures: Seq[String]): DataFrame = {
    val aggs = measures.map(m =>
      sum(col(s"${m}_sum")).cast("decimal(38,2)").as(s"${m}_sum")) :+
      sum(col("n_rows")).as("n_rows")
    a.unionByName(b).groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Refresh `rollup` with exactly the files added between two
    * committed manifest versions of the table. Throws if the diff
    * contains removals (compaction/rewrite broke append-only — the
    * monoid merge would double- or under-count; rebuild from the new
    * version instead).
    */
  def refreshBetween(spark: SparkSession, rollup: DataFrame,
                     manifestPath: String, fromVersion: Long,
                     toVersion: Long, dims: Seq[String],
                     measures: Seq[String]): DataFrame = {
    val diff = ZoneMap.manifestDiff(spark, manifestPath, fromVersion,
      toVersion).collect()
    val removed = diff.filter(_.getString(1) == "removed")
    require(removed.isEmpty,
      s"append-only violated between v$fromVersion and v$toVersion: " +
        s"${removed.length} file(s) removed — rebuild the rollup")
    val added = diff.filter(_.getString(1) == "added").map(_.getString(0))
    if (added.isEmpty) rollup
    else merge(rollup,
      build(spark.read.parquet(added.toIndexedSeq: _*), dims, measures),
      dims, measures)
  }

  /** Read-time projection: derive per-group averages from the
    * mergeable state (`<m>_avg = <m>_sum / n_rows`, one exact
    * division each).
    */
  def withAverages(rollup: DataFrame, measures: Seq[String]): DataFrame =
    measures.foldLeft(rollup) { (df, m) =>
      df.withColumn(s"${m}_avg",
        col(s"${m}_sum").cast("double") / col("n_rows").cast("double"))
    }
}
