package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkTestBase {

  import spark.implicits._

  test("zvalue interleaves bits: x even positions, y odd") {
    // x=3 (011), y=5 (101) at 3 bits:
    //   j=0: x->1, y->2; j=1: x->4, y->0; j=2: x->0, y->32  => 39
    val out = Seq((3L, 5L)).toDF("x", "y")
      .select(ZOrder.zvalue(col("x"), col("y"), 3).as("z"))
      .as[Long].head()
    assert(out == 39L)
  }

  test("zvalue is a bijection on the tile (exhaustive 5-bit)") {
    val n = 32
    val distinctZ = spark.range(n.toLong * n)
      .select((col("id") % n).as("x"), (col("id") / n).as("y"))
      .select(ZOrder.zvalue(col("x"), col("y"), 5).as("z"))
      .distinct().count()
    assert(distinctZ == n.toLong * n)
  }

  test("aligned 64-code z-blocks are exactly 8x8 tiles (lineitem)") {
    val spans = graft.io.Tables.load(spark, sf, "lineitem")
      .select((col("l_partkey") % 256).as("x"), (col("l_suppkey") % 256).as("y"))
      .withColumn("z", ZOrder.zvalue(col("x"), col("y"), 8))
      .groupBy(shiftright(col("z"), 6).as("blk"))
      .agg((max(col("x")) - min(col("x"))).as("xs"),
        (max(col("y")) - min(col("y"))).as("ys"))
      .agg(max(col("xs")).as("mxs"), max(col("ys")).as("mys"))
      .as[(Long, Long)].head()
    assert(spans._1 <= 7 && spans._2 <= 7,
      s"z-block spans exceed an 8x8 tile: $spans")
  }

  test("clusterByZ: partitions carry disjoint, internally sorted z-ranges") {
    val clustered = ZOrder.clusterByZ(
      graft.io.Tables.load(spark, sf, "lineitem")
        .select((col("l_partkey") % 256).as("x"), (col("l_suppkey") % 256).as("y")),
      "x", "y", bits = 8, numPartitions = 8)
    val ranges = clustered.select(col("zval"))
      .mapPartitions { it =>
        val zs = it.map(_.getLong(0)).toSeq
        if (zs.isEmpty) Iterator.empty
        else Iterator((zs.head, zs.last, zs == zs.sorted))
      }.collect()
    assert(ranges.forall(_._3), "z not sorted within a partition")
    val sortedByLo = ranges.sortBy(_._1)
    val overlaps = sortedByLo.sliding(2).exists {
      case Array((_, hiA, _), (loB, _, _)) => loB < hiA
      case _ => false
    }
    assert(!overlaps, "partition z-ranges overlap")
  }
}
