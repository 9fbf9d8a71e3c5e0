package graft.ext

import graft.SparkTestBase

/** Random-graph equivalence of the distributed graph operators against
  * independent plain-Scala references that replay the SAME fixed-point
  * integer arithmetic — the union-find-property pattern applied to PPR
  * and the modularity-greedy rounds: the references share no Spark
  * code, so agreement pins the relational decomposition (joins,
  * aggregates, argmax tie-breaks, parity gating), not just the formula.
  */
class GraphPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val S = Graph.Scale

  private def randomSymEdges(rnd: scala.util.Random, n: Int,
                             m: Int): Seq[(Long, Long)] = {
    val undirected = Iterator.continually(
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .take(m).toSeq.distinct
    undirected ++ undirected.map(_.swap)
  }

  /** Plain-Scala personalized PageRank, same integer ops as the
    * engine: r' = jump·1_seeds + ⌊(Σ_in ⌊r/deg⌋)·d/100⌋.
    */
  private def refPpr(edges: Seq[(Long, Long)], seeds: Set[Long],
                     iters: Int): Map[Long, Double] = {
    val nodes = edges.map(_._1).toSet
    val gs = seeds & nodes
    val ns = gs.size.toLong
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val jump = ((S * 15) / 100) / ns
    var r: Map[Long, Long] = gs.map(_ -> S / ns).toMap
    for (_ <- 1 to iters) {
      val contrib = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for ((s, d) <- edges; pr <- r.get(s)) contrib(d) += pr / deg(s)
      val nr = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      contrib.foreach { case (k, v) => nr(k) += (v * 85) / 100 }
      gs.foreach(s => nr(s) += jump)
      r = nr.toMap
    }
    r.map { case (k, v) => k -> v.toDouble / S.toDouble }
  }

  /** Plain-Scala parity-alternating modularity-greedy rounds. */
  private def refGreedy(edges: Seq[(Long, Long)],
                        rounds: Int): Map[Long, Long] = {
    val nodes = edges.map(_._1).distinct.sorted
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val m2 = edges.size.toLong
    var lbl: Map[Long, Long] = nodes.map(n => n -> n).toMap
    for (r <- 1 to rounds) {
      val dmass = lbl.toSeq.groupBy(_._2)
        .map { case (c, ms) => c -> ms.map(kv => deg(kv._1)).sum }
      val next = nodes.map { i =>
        val own = lbl(i)
        val kic = edges.filter(_._1 == i)
          .groupBy(e => lbl(e._2))
          .map { case (c, es) => c -> es.size.toLong }
        val cand = if (kic.contains(own)) kic else kic + (own -> 0L)
        val best = cand.toSeq.map { case (c, k) =>
          val d = dmass(c) - (if (c == own) deg(i) else 0L)
          (c, m2 * k - deg(i) * d)
        // ties prefer OWN (Blondel's strictly-positive-gain rule),
        // then smallest label — mirrors Graph.modularityGreedyWeighted
        }.minBy { case (c, s) => (-s, if (c == own) 0L else 1L, c) }._1
        i -> (if ((i + r) % 2 == 0) best else own)
      }.toMap
      lbl = next
    }
    lbl
  }

  test("property: personalizedPageRank == plain-Scala integer replay " +
    "on random graphs") {
    val rnd = new scala.util.Random(41)
    for (trial <- 1 to 5) {
      val edges = randomSymEdges(rnd, n = 24, m = 40)
      val seeds = (0 until 4).map(_ => rnd.nextInt(24).toLong).toSet
      val got = Graph.personalizedPageRank(
          edges.toDF("src", "dst"), seeds.toSeq.toDF("node"), iters = 3)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val want = refPpr(edges, seeds, iters = 3)
      assert(got == want, s"trial $trial: $got vs $want")
      // conservation: total mass 1 up to the documented floor loss
      if ((seeds intersect edges.map(_._1).toSet).nonEmpty)
        assert(math.abs(got.values.sum - 1.0) < 1e-6)
    }
  }

  test("property: modularityGreedy == plain-Scala parity replay " +
    "on random graphs; Q never below the singleton partition") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val edges = randomSymEdges(rnd, n = 20, m = 32)
      val df = edges.toDF("src", "dst")
      val got = Graph.modularityGreedy(df, rounds = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refGreedy(edges, 4), s"trial $trial")
      // greedy ΔQ moves from singletons can't make Q negative: the
      // singleton partition scores Q0 = -Σk²/(2m)² and every accepted
      // move had the round's best (≥ stay-home) score
      val q = Graph.modularity(df,
        Graph.modularityGreedy(df, 4)).head().getDouble(2)
      val deg = edges.groupBy(_._1).map(_._2.size.toLong)
      val m2 = edges.size.toLong
      val q0 = -deg.map(k => k * k).sum.toDouble / (m2 * m2).toDouble
      assert(q >= q0, s"trial $trial: Q=$q below singleton $q0")
    }
  }
}
