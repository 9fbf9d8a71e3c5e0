package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Pins the behavior x_theta_setops and the set-algebra state tier
  * rely on from Spark 4.1's BUILT-IN theta sketch functions (built-ins
  * beat custom natives wherever they express the semantics — this spec
  * is the contract that lets the engine lean on them).
  */
class ThetaSketchSpec extends SparkTestBase {
  import spark.implicits._

  test("exact mode (n < 2^lgK): estimates exact, set algebra exact, " +
    "slice merge == one-pass") {
    // A = 1..300, B = 200..500 -> |A∪B|=500 |A∩B|=101 |A\B|=199 —
    // below 2^12 theta keeps every hash, so everything is exact
    val a = (1L to 300L).toDF("k")
    val b = (200L to 500L).toDF("k")
    val ska = a.agg(theta_sketch_agg(col("k"), 12).as("sk"))
    val skb = b.agg(theta_sketch_agg(col("k"), 12).as("sk2"))
    val row = ska.crossJoin(skb).select(
      theta_sketch_estimate(col("sk")).cast("double").as("na"),
      theta_sketch_estimate(theta_union(col("sk"), col("sk2")))
        .cast("double").as("nu"),
      theta_sketch_estimate(theta_intersection(col("sk"), col("sk2")))
        .cast("double").as("ni"),
      theta_sketch_estimate(theta_difference(col("sk"), col("sk2")))
        .cast("double").as("nd")).head()
    assert((row.getDouble(0), row.getDouble(1), row.getDouble(2),
      row.getDouble(3)) == ((300.0, 500.0, 101.0, 199.0)), row.toString)
    // union AGGREGATE over arbitrarily many slice sketches — the
    // persisted-state read path — is exact too, however sliced
    val sliced = (0 until 3).map(i =>
      (1L to 500L).filter(_ % 3 == i).toDF("k")
        .agg(theta_sketch_agg(col("k"), 12).as("sk")))
      .reduce(_ unionByName _)
    val merged = sliced
      .agg(theta_sketch_estimate(theta_union_agg(col("sk"), 12))
        .cast("double")).head().getDouble(0)
    assert(merged == 500.0, s"merged union $merged")
  }

  test("estimation mode (n >> 2^lgK): bounds hold, deterministic " +
    "under repartitioning") {
    val n = 60000
    val b = ((n / 2).toLong to (3L * n / 2)).toDF("k")
    // same data, different physical layout -> identical estimate
    // (theta = k smallest hashes, order- and partition-free)
    val e1 = b.agg(theta_sketch_estimate(theta_sketch_agg(col("k"), 12))
      .cast("double")).head().getDouble(0)
    val e2 = b.repartition(13)
      .agg(theta_sketch_estimate(theta_sketch_agg(col("k"), 12))
        .cast("double")).head().getDouble(0)
    assert(e1 == e2, s"partitioning changed the estimate: $e1 vs $e2")
    // lgK=12 -> rse ~1.56%; check at ~5 sigma
    assert(math.abs(e1 - (n + 1.0)) / (n + 1.0) <= 0.08, s"|B| est $e1")
  }
}
