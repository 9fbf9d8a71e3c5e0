package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def sym(pairs: (Long, Long)*) =
    (pairs ++ pairs.map(p => (p._2, p._1))).toDF("src", "dst")

  test("two-node graph: uniform 0.5/0.5 is the fixed point at any damping") {
    val out = Graph.pageRank(sym((1L, 2L)), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set(1L, 2L))
    out.values.foreach(v => assert(math.abs(v - 0.5) < 1e-9))
  }

  test("star graph: hub outranks leaves; mass is conserved") {
    // hub 0 connected to leaves 1..4
    val out = Graph.pageRank(sym((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)),
      iters = 6).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val hub = out(0L)
    val leaves = (1L to 4L).map(out)
    leaves.foreach(l => assert(hub > l))
    // symmetric graph, no dangling nodes → Σ pr = 1 (up to decimal pin)
    assert(math.abs(out.values.sum - 1.0) < 1e-6)
    // leaves are symmetric → identical ranks
    assert(leaves.distinct.size == 1)
  }

  test("one iteration matches the hand formula on a path graph") {
    // path 1-2-3: deg(1)=deg(3)=1, deg(2)=2; init 1/3 each
    // r1(1) = 0.15/3 + 0.85·(r0(2)/2)        = 0.05 + 0.85/6
    // r1(2) = 0.15/3 + 0.85·(r0(1) + r0(3))  = 0.05 + 0.85·2/3
    val out = Graph.pageRank(sym((1L, 2L), (2L, 3L)), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - (0.05 + 0.85 / 6)) < 1e-9)
    assert(math.abs(out(2L) - (0.05 + 0.85 * 2 / 3)) < 1e-9)
    assert(out(1L) == out(3L))
  }

  test("result is partitioning-invariant (fixed-point integer arithmetic)") {
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    val a = Graph.pageRank(edges.repartition(1), iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    val b = Graph.pageRank(edges.repartition(7), iters = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("iters=0 returns the uniform init") {
    val out = Graph.pageRank(sym((1L, 2L), (2L, 3L)), iters = 0)
      .collect().map(_.getDouble(1))
    out.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9))
  }
}
