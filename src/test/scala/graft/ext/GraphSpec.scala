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

  private def tri(edges: (Long, Long)*): (Long, Long, Long) = {
    import spark.implicits._
    val r = Graph.triangleCount(edges.toDF("a", "b")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  test("triangleCount: K4 has 4 triangles; path has none") {
    assert(tri((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L)) == ((4L, 6L, 4L)))
    assert(tri((1L, 2L), (2L, 3L), (3L, 4L)) == ((4L, 3L, 0L)))
  }

  test("triangleCount canonicalizes dups, reversals, and self-loops") {
    // one true triangle, each edge also present reversed/duplicated,
    // plus a self-loop that must be dropped
    assert(tri((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 3L),
      (1L, 3L), (2L, 2L)) == ((3L, 3L, 1L)))
  }

  test("triangleCount on a star plus one closing edge (skew shape)") {
    // hub 0 connected to 6 leaves; only leaves 1-2 are also adjacent:
    // exactly one triangle regardless of the hub's degree
    val star = (1L to 6L).map(l => (0L, l)) :+ (1L, 2L)
    assert(tri(star: _*) == ((7L, 7L, 1L)))
  }

  test("triangleCount matches the brute-force count on a random graph") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(120)((rnd.nextInt(15).toLong,
      rnd.nextInt(15).toLong))
    val canon = edges.map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .filter(e => e._1 != e._2).distinct
    val adj = canon.toSet
    val nodes = canon.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val expected = (for {
      i <- nodes; j <- nodes if j > i; k <- nodes if k > j
      if adj((i, j)) && adj((j, k)) && adj((i, k))
    } yield 1).size.toLong
    val got = tri(edges: _*)
    assert(got == ((nodes.size.toLong, canon.size.toLong, expected)))
  }

  test("kCore: pendant chain peels away, the clique survives") {
    // K4 on 0-3 with a tail 3-10-11: 2-core = the K4 + nothing else
    // (10 loses its support once 11 peels, then 10 peels)
    val e = sym((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L), (3L, 10L), (10L, 11L))
    val out = Graph.kCore(e, k = 2, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L), out)
  }

  test("kCore: fixed rounds converge (R == R+1) and every survivor " +
    "keeps >= k neighbors") {
    val rnd = new scala.util.Random(29)
    val edges = Seq.fill(120)((rnd.nextInt(20).toLong,
      rnd.nextInt(20).toLong)).filter(e => e._1 != e._2).distinct
    val e = sym(edges: _*)
    val r4 = Graph.kCore(e, k = 3, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r5 = Graph.kCore(e, k = 3, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r4 == r5, "not converged at 4 rounds")
    r4.foreach { case (n, d) => assert(d >= 3, s"survivor $n deg $d") }
  }

  private def ccoef(pairs: (Long, Long)*) =
    Graph.clusteringCoefficients(pairs.toDF("a", "b"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap

  test("clusteringCoefficients: K4 is all 1.0; a path is all 0") {
    val k4 = for { i <- 0L to 3L; j <- (i + 1) to 3L } yield (i, j)
    ccoef(k4: _*).foreach { case (n, (d, t, c)) =>
      assert(d == 3L && t == 3L && c == 1.0, s"node $n") }
    val path = ccoef((1L, 2L), (2L, 3L), (3L, 4L))
    path.foreach { case (_, (_, t, c)) => assert(t == 0L && c == 0.0) }
  }

  test("clusteringCoefficients: triangle + pendant — the textbook mix") {
    // triangle 1-2-3 plus pendant edge 3-4: nodes 1,2 coef 1;
    // node 3 has degree 3, one triangle -> 2*1/(3*2) = 1/3; leaf 4 -> 0
    val out = ccoef((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(out(1L) == ((2L, 1L, 1.0)) && out(2L) == ((2L, 1L, 1.0)))
    assert(out(3L) == ((3L, 1L, 1.0 / 3.0)))
    assert(out(4L) == ((1L, 0L, 0.0)))
  }

  test("clusteringCoefficients: per-node counts sum to 3x triangleCount") {
    val rnd = new scala.util.Random(19)
    val edges = Seq.fill(80)((rnd.nextInt(14).toLong, rnd.nextInt(14).toLong))
      .filter(e => e._1 != e._2)
    val perNode = ccoef(edges: _*).values.map(_._2).sum
    val total = tri(edges: _*)._3
    assert(perNode == 3 * total, s"$perNode vs 3x$total")
  }

  private def bfs(edges: org.apache.spark.sql.DataFrame, seeds: Seq[Long],
                  hops: Int) =
    Graph.bfsDistances(edges, seeds.toDF("node"), hops)
      .as[(Long, Int)].collect().toMap

  test("bfsDistances: path graph levels, horizon cut, isolated seed") {
    // path 1-2-3-4-5; seed 1; node 9 isolated but seeded
    val e = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = bfs(e, Seq(1L, 9L), hops = 3)
    assert(got == Map(1L -> 0, 9L -> 0, 2L -> 1, 3L -> 2, 4L -> 3))
  }

  test("bfsDistances: diamond takes the min distance; hops=0 is seeds") {
    val e = sym((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    assert(bfs(e, Seq(1L), 2) == Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
    assert(bfs(e, Seq(1L), 0) == Map(1L -> 0))
  }

  test("bfsDistances == brute-force min path length on a random graph") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(40)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(p => p._1 != p._2)
    val adj = (pairs ++ pairs.map(_.swap)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    val seeds = Seq(0L, 1L)
    // reference: level-synchronous BFS in plain Scala
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds.toSet
    for (i <- 1 to 3) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
        .diff(dist.keySet)
      dist = dist ++ next.map(_ -> i)
      frontier = next
    }
    val got = bfs(sym(pairs: _*), seeds, hops = 3)
    assert(got == dist)
  }

  private def wsym(triples: (Long, Long, Long)*) =
    (triples ++ triples.map(t => (t._2, t._1, t._3)))
      .toDF("src", "dst", "w")

  private def sssp(edges: org.apache.spark.sql.DataFrame, seeds: Seq[Long],
                   hops: Int) =
    Graph.ssspBounded(edges, seeds.toDF("node"), hops)
      .as[(Long, Long)].collect().toMap

  test("ssspBounded: cheaper-but-longer route wins only once the hop " +
    "budget admits it; a hop-1 discovery is improved by a later round") {
    // 1→4 direct costs 50; the 3-hop detour 1-3-5-4 costs 3
    val e = wsym((1L, 4L, 50L), (1L, 2L, 10L), (2L, 4L, 10L),
      (1L, 3L, 1L), (3L, 5L, 1L), (5L, 4L, 1L))
    assert(sssp(e, Seq(1L), 0) == Map(1L -> 0L))
    assert(sssp(e, Seq(1L), 1) ==
      Map(1L -> 0L, 4L -> 50L, 2L -> 10L, 3L -> 1L))
    assert(sssp(e, Seq(1L), 2) ==
      Map(1L -> 0L, 4L -> 20L, 2L -> 10L, 3L -> 1L, 5L -> 2L))
    assert(sssp(e, Seq(1L), 3) ==
      Map(1L -> 0L, 4L -> 3L, 2L -> 10L, 3L -> 1L, 5L -> 2L))
  }

  test("ssspBounded with unit weights == bfsDistances on a random graph") {
    val rnd = new scala.util.Random(11)
    val pairs = Seq.fill(40)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(p => p._1 != p._2)
    val seeds = Seq(0L, 1L)
    val hopDist = bfs(sym(pairs: _*), seeds, hops = 3)
    val got = sssp(wsym(pairs.map(p => (p._1, p._2, 1L)): _*), seeds, 3)
    assert(got == hopDist.view.mapValues(_.toLong).toMap)
  }

  test("ssspBounded == brute-force min over <=k-edge walks on a random " +
    "weighted graph") {
    val rnd = new scala.util.Random(23)
    val triples = Seq.fill(30)((rnd.nextInt(10).toLong,
        rnd.nextInt(10).toLong, 1L + rnd.nextInt(9)))
      .filter(t => t._1 != t._2)
    val adj = (triples ++ triples.map(t => (t._2, t._1, t._3)))
      .groupBy(_._1).view
      .mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    val seeds = Seq(0L, 3L)
    // reference: Bellman-Ford rounds in plain Scala (min over <=k edges)
    var dist = seeds.map(_ -> 0L).toMap
    for (_ <- 1 to 3) {
      val relaxed = dist.toSeq.flatMap { case (u, du) =>
        adj.getOrElse(u, Seq.empty).map { case (v, w) => v -> (du + w) }
      }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1)
        .view.mapValues(_.map(_._2).min).toMap
    }
    assert(sssp(wsym(triples: _*), seeds, 3) == dist)
  }

  private def lpa(edges: org.apache.spark.sql.DataFrame, rounds: Int) =
    Graph.labelPropagation(edges, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("labelPropagation: triangle converges to its min label") {
    // K3: round 1 -> (1->2, 2->1, 3->1); round 2 -> all 1
    assert(lpa(sym((1L, 2L), (1L, 3L), (2L, 3L)), rounds = 2) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("labelPropagation: hand-replayed rounds on two bridged " +
    "triangles (deterministic min-label tie-break)") {
    val edges = sym((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    // round 1 (labels = node ids; most-frequent neighbor, min ties):
    //   1:{2,3}->2  2:{1,3}->1  3:{1,2,4}->1  4:{3,5,6}->3
    //   5:{4,6}->4  6:{4,5}->4
    assert(lpa(edges, 1) == Map(1L -> 2L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 4L, 6L -> 4L))
    // round 2 replays over those labels:
    //   1:{1,1}->1  2:{2,1}->1  3:{2,1,3}->1  4:{1,4,4}->4
    //   5:{3,4}->3  6:{3,4}->3
    assert(lpa(edges, 2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 3L, 6L -> 3L))
  }

  test("labelPropagation: two clean cliques keep separate communities " +
    "(where components would merge them via any path)") {
    val edges = sym((1L, 2L), (1L, 3L), (2L, 3L),
      (7L, 8L), (7L, 9L), (8L, 9L))
    val got = lpa(edges, 2)
    assert(got.filterKeys(_ <= 3L).values.toSet == Set(1L))
    assert(got.filterKeys(_ >= 7L).values.toSet == Set(7L))
  }

  private def ppr(edges: org.apache.spark.sql.DataFrame,
                  seeds: Seq[Long], iters: Int) =
    Graph.personalizedPageRank(edges,
        seeds.toDF("node"), iters = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("personalizedPageRank: one iteration matches the hand formula; " +
    "mass stays near the seed") {
    // path 1-2-3-4, seed {1}: r0 = {1: S}
    // r1(2) = 0.85·(S/1) = 0.85S (node 2 gets 1's whole rank, deg(1)=1)
    // r1(1) = jump = 0.15S;  3, 4 unreached
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L))
    val r1 = ppr(edges, Seq(1L), iters = 1)
    assert(r1.keySet == Set(1L, 2L))
    assert(r1(1L) == 0.15)
    assert(r1(2L) == 0.85)
    // three iterations: reach extends hop by hop, seed keeps its jump
    val r3 = ppr(edges, Seq(1L), iters = 3)
    assert(r3.keySet == Set(1L, 2L, 3L, 4L))
    assert(r3(1L) > r3(3L) && r3(2L) > r3(4L), r3.toString)
  }

  test("personalizedPageRank: seeds outside the graph are ignored; " +
    "uniform seeding over the whole graph ranks like pageRank") {
    val edges = sym((1L, 2L), (2L, 3L))
    // seed 99 has no edges: mass comes only from seed 1
    val r = ppr(edges, Seq(1L, 99L), iters = 2)
    assert(!r.contains(99L))
    assert(math.abs(r.values.sum - 1.0) < 1e-9) // mass conserved
    // seeding EVERY node = plain PageRank (same jump per node)
    val all = ppr(edges, Seq(1L, 2L, 3L), iters = 3)
    val pr = Graph.pageRank(edges, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(all == pr)
  }

  test("personalizedPageRank is partitioning-invariant") {
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    def run(parts: Int) =
      Graph.personalizedPageRank(edges.repartition(parts),
          Seq(1L, 4L).toDF("node"), iters = 3)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
        .sortBy(_._1).toSeq
    assert(run(1) == run(7))
  }

  private def modOf(edges: org.apache.spark.sql.DataFrame,
                    comm: Seq[(Long, Long)]) = {
    val r = Graph.modularity(edges, comm.toDF("node", "label")).head()
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  private def greedy(edges: org.apache.spark.sql.DataFrame, rounds: Int) =
    Graph.modularityGreedy(edges, rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("modularityGreedy: twin triangles with a bridge resolve to the " +
    "two triangles (hand-traced parity rounds; naive sync oscillates)") {
    val edges = sym((1L, 2L), (1L, 3L), (2L, 3L),
      (7L, 8L), (7L, 9L), (8L, 9L), (3L, 7L))
    val got = greedy(edges, rounds = 4)
    // hand trace: r1 (odd movers) 1→2, 3→1, 7→8, 9→8; r2 (even) 2, 8
    // stay; r3 (odd): 3 joins {1,2}'s community 2, others hold; r4
    // stable → {1,2,3} under label 2, {7,8,9} under label 8
    assert(got == Map(1L -> 2L, 2L -> 2L, 3L -> 2L,
      7L -> 8L, 8L -> 8L, 9L -> 8L))
    // and the partition is the modularity optimum for this graph:
    // Q = (14·12 − (7² + 7²)) / 196
    val q = Graph.modularity(edges,
      Graph.modularityGreedy(edges, 4)).head().getDouble(2)
    assert(q == 70.0 / 196.0)
  }

  test("modularityGreedy beats LPA where a hub ties LPA apart") {
    // star hub 0 bridging two triangles: LPA's raw counts let the hub
    // flip-flop; greedy's mass penalty keeps the triangles whole
    val edges = sym((1L, 2L), (1L, 3L), (2L, 3L),
      (7L, 8L), (7L, 9L), (8L, 9L), (0L, 1L), (0L, 7L))
    val comm = Graph.modularityGreedy(edges, rounds = 6)
    val labels = comm.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each triangle ends in ONE community
    assert(Set(labels(1L), labels(2L), labels(3L)).size == 1)
    assert(Set(labels(7L), labels(8L), labels(9L)).size == 1)
    assert(labels(1L) != labels(7L))
    val q = Graph.modularity(edges, comm).head().getDouble(2)
    assert(q > 0.3, s"greedy modularity $q")
  }

  test("modularityGreedy is partitioning-invariant") {
    val edges = sym((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L))
    def run(parts: Int) =
      Graph.modularityGreedy(edges.repartition(parts), rounds = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy(_._1).toSeq
    assert(run(1) == run(5))
  }

  test("contract: exact supernode edge weights, internal mass as 2x " +
    "self-loops, total weight conserved") {
    val edges = sym((1L, 2L), (1L, 3L), (2L, 3L),
      (7L, 8L), (7L, 9L), (8L, 9L), (3L, 7L))
      .withColumn("w", lit(1L))
    val labels = Seq((1L, 2L), (2L, 2L), (3L, 2L),
      (7L, 8L), (8L, 8L), (9L, 8L)).toDF("node", "label")
    val got = Graph.contract(edges, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    // each triangle: 3 undirected internal edges = 6 directed rows →
    // self-loop weight 6; the bridge keeps one row per direction
    assert(got == Map((2L, 2L) -> 6L, (8L, 8L) -> 6L,
      (2L, 8L) -> 1L, (8L, 2L) -> 1L))
    assert(got.values.sum == 14L) // Σw == 2m of the input, conserved
  }

  test("modularityGreedyWeighted: self-loop mass penalizes joining; a " +
    "heavy enough bridge merges two supernodes") {
    // two supernodes with self-loop 4 (= 2 internal edges each)
    def g(bridge: Long) = Seq((1L, 1L, 4L), (2L, 2L, 4L),
      (1L, 2L, bridge), (2L, 1L, bridge)).toDF("src", "dst", "w")
    def run(bridge: Long) =
      Graph.modularityGreedyWeighted(g(bridge), rounds = 2)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // join scores 2m·w12 vs k1·k2: 14·3=42 < 49 stays; 18·5=90 > 81
    // merges (node 1 is round 1's mover, so the merged label is 2)
    assert(run(3L) == Map(1L -> 1L, 2L -> 2L))
    assert(run(5L) == Map(1L -> 2L, 2L -> 2L))
  }

  test("louvain: one level == modularityGreedy; Q never decreases " +
    "across levels (contracted moves are whole-community moves)") {
    val twin = sym((1L, 2L), (1L, 3L), (2L, 3L),
      (7L, 8L), (7L, 9L), (8L, 9L), (3L, 7L))
    val hub = sym((1L, 2L), (1L, 3L), (2L, 3L),
      (7L, 8L), (7L, 9L), (8L, 9L), (0L, 1L), (0L, 7L))
    // ring of six triangles bridged corner to corner
    val ring = sym((0 until 6).flatMap { t =>
      val b = 10L * t
      Seq((b, b + 1), (b, b + 2), (b + 1, b + 2),
        (b + 2, (10L * ((t + 1) % 6)) + 1))
    }: _*)
    for (edges <- Seq(twin, hub, ring)) {
      val flat = Graph.modularityGreedy(edges, rounds = 2)
      val lv1 = Graph.louvain(edges, levels = 1, roundsPerLevel = 2)
      assert(flat.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
        .sameElements(
          lv1.collect().map(r => (r.getLong(0), r.getLong(1))).sorted))
      val q1 = Graph.modularity(edges, lv1).head().getDouble(2)
      val q2 = Graph.modularity(edges,
        Graph.louvain(edges, levels = 2, roundsPerLevel = 2))
        .head().getDouble(2)
      val q3 = Graph.modularity(edges,
        Graph.louvain(edges, levels = 3, roundsPerLevel = 2))
        .head().getDouble(2)
      assert(q2 >= q1, s"level 2 dropped Q: $q2 < $q1")
      assert(q3 >= q2, s"level 3 dropped Q: $q3 < $q2")
    }
    // twin triangles: merging the two communities would land Q at
    // exactly 0 (< 70/196), so level 2 must KEEP them apart
    val deep = Graph.louvain(twin, levels = 2, roundsPerLevel = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Set(deep(1L), deep(2L), deep(3L)).size == 1)
    assert(deep(1L) != deep(7L))
  }

  test("modularity: two triangles with a bridge, hand formula") {
    // triangles {1,2,3} and {4,5,6}, bridge 3-4: 7 undirected edges,
    // 2m=14, internal rows 6+6, degree mass 7+7
    // Q = (14·12 − (49+49)) / 196 = 70/196
    val edges = sym((1L, 2L), (1L, 3L), (2L, 3L),
      (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
    val (nc, m, q) = modOf(edges,
      Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 2L, 6L -> 2L))
    assert(nc == 2 && m == 7)
    assert(q == 70.0 / 196.0)
  }

  test("modularity: everything in one community scores exactly 0") {
    val edges = sym((1L, 2L), (2L, 3L), (3L, 4L))
    // Q = (2m·2m − (2m)²)/(2m)² = 0 — L_c = 2m, D_c = 2m
    val (nc, m, q) = modOf(edges,
      Seq(1L -> 9L, 2L -> 9L, 3L -> 9L, 4L -> 9L))
    assert(nc == 1 && m == 3 && q == 0.0)
  }

  test("modularity: singleton communities on a clique are negative") {
    val edges = sym((1L, 2L), (1L, 3L), (2L, 3L))
    // no internal rows; D_c = 2 per node → Q = −3·4/36 = −1/3
    val (nc, m, q) = modOf(edges, Seq(1L -> 1L, 2L -> 2L, 3L -> 3L))
    assert(nc == 3 && m == 3)
    assert(q == -1.0 / 3.0)
  }

  test("modularity agrees with labelPropagation end-to-end and is " +
    "partitioning-invariant") {
    val edges = sym((1L, 2L), (1L, 3L), (2L, 3L),
      (7L, 8L), (7L, 9L), (8L, 9L), (3L, 7L))
    def run(parts: Int) = {
      val e = edges.repartition(parts)
      Graph.modularity(e, Graph.labelPropagation(e, rounds = 2))
        .head()
    }
    val a = run(1)
    val b = run(6)
    assert(a.getLong(0) == b.getLong(0) &&
      a.getLong(1) == b.getLong(1) &&
      a.getDouble(2) == b.getDouble(2))
    // synchronous 2-round LPA settles at {1,2,3}, {7}, {8,9} here
    // (the bridge node oscillates — classic sync-LPA behavior, pinned):
    // 2m=14, Σlin=6+0+2, Σdeg²=7²+3²+4² → Q=(14·8−74)/196
    assert(a.getLong(0) == 3 && a.getLong(1) == 7)
    assert(a.getDouble(2) == 38.0 / 196.0)
  }
}
