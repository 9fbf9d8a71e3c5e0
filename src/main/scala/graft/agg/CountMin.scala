package graft.agg

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Count-min sketch as RELATIONAL state (Cormode & Muthukrishnan 2005):
  * the sketch is a (row, bucket, n) TABLE of depth×width counters, not
  * an opaque binary — so building it is one group-by, merging two
  * sketches is union+sum (the mergeable-pre-aggregation pattern
  * `IncrementalRollup` uses for sums and `x_sketch_rollup` uses for
  * HLL), and every estimate is re-derivable exactly by any engine that
  * can run the same md5 bucket hash. Where Misra-Gries
  * (`MisraGriesAgg`) answers "which keys are heavy", count-min answers
  * point frequency queries over keys chosen AFTER the scan, in
  * O(depth×width) state regardless of key cardinality.
  *
  * Guarantees: estimates never undercount; overcount ≤ ε·N with
  * probability 1−δ for width=⌈e/ε⌉, depth=⌈ln(1/δ)⌉. The sketch
  * contents are DETERMINISTIC given (depth, width, seed) — hash row r
  * uses [[Hashing.hash64]] with seed+r, so an oracle rebuilds the
  * identical table in SQL.
  *
  * Scale shape: build explodes each key into `depth` (row, bucket)
  * cells — depth× the scan's rows into ONE map-side-combined group-by
  * whose output is ≤ depth×width counters (thousands, broadcastable).
  * Estimation joins the tiny sketch to the query keys; at 100 TB the
  * sketch is the small side of everything.
  */
object CountMin {

  /** Build the sketch table over `keyCol`: (row, bucket, n) with
    * row ∈ [0, depth), bucket ∈ [0, width). Null keys are skipped
    * (no defined hash), matching count-aggregate NULL semantics.
    */
  def build(df: DataFrame, keyCol: String, depth: Int, width: Int,
            seed: Int = 0): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth in [1,16], got $depth")
    require(width >= 2, s"width must be >= 2, got $width")
    val cells = array((0 until depth).map { r =>
      struct(lit(r).as("row"),
        pmod(Hashing.hash64(col(keyCol).cast("string"), seed + r),
          lit(width.toLong)).cast("int").as("bucket"))
    }: _*)
    df.filter(col(keyCol).isNotNull)
      .select(explode(cells).as("c"))
      .groupBy(col("c.row").as("row"), col("c.bucket").as("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Merge sketch tables built with the SAME (depth, width, seed):
    * cellwise sum — the linearity that makes count-min the streaming /
    * partitioned-pre-aggregation sketch.
    */
  def merge(sketches: DataFrame*): DataFrame = {
    require(sketches.nonEmpty, "nothing to merge")
    sketches.reduce(_ unionByName _)
      .groupBy(col("row"), col("bucket"))
      .agg(sum(col("n")).as("n"))
  }

  /** Point-frequency estimates for `keys` (a frame with `keyCol`):
    * est = min over the depth rows of the key's counter. The sketch
    * side broadcasts; absent counters read as 0 (a key hashing only to
    * untouched buckets was never seen).
    */
  def estimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
               depth: Int, width: Int, seed: Int = 0): DataFrame = {
    val cells = keys.select(col(keyCol),
        explode(array((0 until depth).map { r =>
          struct(lit(r).as("row"),
            pmod(Hashing.hash64(col(keyCol).cast("string"), seed + r),
              lit(width.toLong)).cast("int").as("bucket"))
        }: _*)).as("c"))
      .select(col(keyCol), col("c.row").as("row"), col("c.bucket").as("bucket"))
    cells
      .join(broadcast(sketch), Seq("row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }
}
