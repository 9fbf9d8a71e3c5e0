package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration graph analytics over edge lists (the companion to
  * `Dedup.connectedComponents`' min-label propagation): PageRank as
  * repeated sparse matrix-vector products expressed as join + group-by —
  * the textbook distributed formulation (each iteration shuffles the
  * edge list by src to pick up ranks, then by dst to sum contributions).
  *
  * On the training-data side this is importance weighting over the
  * document-similarity graph: near-dup clusters share rank mass, and a
  * high-rank doc is "the" canonical copy — a principled survivor choice
  * where connected-components' min-id is arbitrary.
  *
  * Determinism contract (oracle parity): ranks are FIXED-POINT LONGS in
  * units of 1e-12 and every per-iteration operation is integer
  * arithmetic (`DIV`, `*`, `SUM` of longs) — bit-identical on any
  * engine and any accumulation order, unlike a double pipeline where
  * the decimal re-pin rounds differently at the last digit per engine
  * (measured 3e-12/iteration drift vs DuckDB before the switch).
  * Floor-division mass loss is ≤ 1e-12 per edge per iteration.
  */
object Graph {

  /** 1.0 of rank mass in fixed-point units. */
  val Scale: Long = 1000000000000L // 1e12

  /** K iterations of damped PageRank over a SYMMETRIC edge list
    * (`src`, `dst`; callers union both directions for undirected
    * graphs — symmetric edges also guarantee no dangling mass).
    * Output: (node, pagerank DOUBLE = fixed-point/1e12), one row per
    * node with ≥1 edge. `dampingPct` is the damping factor in percent
    * (85 = the canonical 0.85), kept integral so the jump and damp
    * terms stay in integer arithmetic.
    *
    * At 100 TB scale: persist `edges` and `deg` before calling (they
    * are re-read every iteration), and keep `iters` fixed/small — the
    * lazy plan grows one join per round. Each iteration is two
    * shuffles; AQE handles the power-law dst skew via skew-join
    * splitting on the aggregation side.
    */
  def pageRank(edges: DataFrame, iters: Int,
               dampingPct: Int = 85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100], got $dampingPct")
    val nodes = edges.select(col("src")).distinct()
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("__d"))
    val n = nodes.agg(count(lit(1)).as("__n"))
    val init = nodes.crossJoin(broadcast(n))
      .select(col("src"), expr(s"$Scale DIV __n").as("pr"))
    val jump = s"(($Scale * ${100 - dampingPct}) DIV 100) DIV __n"
    (1 to iters).foldLeft(init) { (ranks, _) =>
      edges
        .join(ranks, Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst"), expr("pr DIV __d").as("__c"))
        .groupBy(col("dst"))
        .agg(sum(col("__c")).as("__s"))
        .crossJoin(broadcast(n))
        .select(col("dst").as("src"),
          expr(s"$jump + ((__s * $dampingPct) DIV 100)").as("pr"))
    }.select(col("src").as("node"),
      (col("pr").cast("double") / lit(Scale.toDouble)).as("pagerank"))
  }

  /** Personalized PageRank: the jump mass returns to a SEED SET
    * instead of the whole graph — "importance relative to these
    * documents", the standard seed-expansion primitive for curated
    * data selection (start from hand-picked exemplars, rank the
    * corpus-similarity graph around them). Same fixed-point integer
    * arithmetic as [[pageRank]] (1e-12 units, `DIV`, exact long sums —
    * bit-identical on any engine/partitioning; both engines' integer
    * division agree because mass is never negative).
    *
    * Iteration (all-integer): r' = jump⋅1_seeds + ⌊d⋅Σ_in r/deg⌋,
    * expressed as the damped-contribution aggregate UNION ALL the
    * static per-seed jump rows, summed by node — the union keeps seeds
    * alive even when no ranked node points at them yet. Rank rows
    * cover seeds ∪ nodes reached within `iters` hops (mass outside is
    * exactly 0 and never materializes — frontier-sized state, the BFS
    * property, not |V|-sized). Seeds are intersected with src ∪ dst:
    * a dst-only (sink) seed still receives its jump mass, as standard
    * PPR requires on directed graphs; only seeds in NEITHER column —
    * truly outside the graph — are ignored.
    *
    * At 100 TB: checkpoint `edges` before calling (re-joined per
    * iteration, the [[pageRank]] contract).
    */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame,
                           iters: Int, dampingPct: Int = 85): DataFrame = {
    require(iters >= 0, s"iters must be >= 0, got $iters")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0,100], got $dampingPct")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("__d"))
    // seeds ∩ (src ∪ dst): on a DIRECTED edge list a seed appearing
    // only as a dst is a sink — it still receives its jump mass (and
    // any link mass pointed at it) in standard PPR, it just cannot
    // pass mass on (no out-edges → the contribution join drops it,
    // the dangling-mass convention). src-only intersection would
    // silently zero such seeds; seeds in NEITHER column stay excluded
    // (truly outside the graph).
    val s = edges.select(col("src"))
      .unionByName(edges.select(col("dst").as("src")))
      .distinct()
      .join(seeds.select(col("node").as("src")), Seq("src"), "left_semi")
      .localCheckpoint(false)
    val ns = s.agg(count(lit(1)).as("__ns"))
    val init = s.crossJoin(broadcast(ns))
      .select(col("src"), expr(s"$Scale DIV __ns").as("pr"))
    val jumps = s.crossJoin(broadcast(ns))
      .select(col("src"),
        expr(s"(($Scale * ${100 - dampingPct}) DIV 100) DIV __ns")
          .as("pr"))
      .localCheckpoint(false)
    (1 to iters).foldLeft(init) { (ranks, _) =>
      edges
        .join(ranks, Seq("src"))
        .join(deg, Seq("src"))
        .select(col("dst"), expr("pr DIV __d").as("__c"))
        .groupBy(col("dst"))
        .agg(expr(s"(SUM(__c) * $dampingPct) DIV 100").as("pr"))
        .select(col("dst").as("src"), col("pr"))
        .unionByName(jumps)
        .groupBy(col("src"))
        .agg(sum(col("pr")).as("pr"))
    }.select(col("src").as("node"),
      (col("pr").cast("double") / lit(Scale.toDouble)).as("ppr"))
  }

  /** Bounded-hop BFS shortest-path distances from a seed set over a
    * SYMMETRIC edge list (`src`, `dst`): the k-hop-neighborhood
    * primitive behind "docs within 2 similarity hops of a curated
    * seed", blast-radius queries, and feature propagation.
    *
    * Level-synchronous frontier expansion as relational ops: each hop
    * joins the PREVIOUS FRONTIER ONLY (not the whole reached set)
    * against the edge list, anti-joins out already-reached nodes, and
    * unions the survivors in at distance i — so a hop's join cost is
    * ∝ frontier×degree, the textbook distributed BFS bound, and every
    * node carries its first (= minimal) discovery distance with no
    * min-aggregate over the union needed. Per-hop `localCheckpoint`
    * (the [[triangleCount]] / connectedComponents convention) pins each
    * level: reached/frontier are referenced by the next join, the
    * anti-join AND the union — inlining would re-run the whole prefix
    * per reference and the lazy plan would grow exponentially.
    *
    * Output: (node, dist) for every node within `maxHops` of a seed;
    * seeds themselves at dist 0. Exact integers throughout.
    */
  def bfsDistances(edges: DataFrame, seeds: DataFrame,
                   maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val init = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0))
      .localCheckpoint(false)
    var reached = init
    var frontier = init
    for (i <- 1 to maxHops) {
      val next = frontier
        .join(edges, frontier("node") === edges("src"))
        .select(col("dst").as("node"))
        .distinct()
        .join(reached, Seq("node"), "left_anti")
        .withColumn("dist", lit(i))
        .localCheckpoint(false)
      reached = reached.unionByName(next).localCheckpoint(false)
      frontier = next
    }
    reached
  }

  /** Bounded-hop WEIGHTED shortest-path distances (Bellman-Ford with
    * frontier pruning) from a seed set over a directed edge list
    * (`src`, `dst`, `w` — positive integer weights; feed both
    * orientations for an undirected graph): [[bfsDistances]] upgraded
    * from hop counts to path weights, the "cheapest similarity route
    * within k hops" primitive behind curated-seed expansion ranked by
    * accumulated distance rather than hop parity.
    *
    * Each round relaxes ONLY the frontier — nodes whose tentative
    * distance improved last round — against the edges (join cost ∝
    * frontier×degree, the distributed Bellman-Ford bound; a node whose
    * distance did not change cannot supply a better relaxation than it
    * already did the round it last improved). Per-round min-combine of
    * candidates BEFORE the merge join keeps the dist-table update one
    * aggregate; per-round `localCheckpoint` pins levels exactly like
    * [[bfsDistances]] (dist/frontier are each referenced twice — the
    * lazy plan would otherwise double per round).
    *
    * After round k, `dist(v)` = min weight over walks of ≤ k edges
    * from any seed (induction: a value enters the table only via a
    * real ≤k-edge walk, and any ≤k-edge walk's relaxations happen in
    * rounds ≤ k because its prefixes' values are attained no later
    * than their edge counts) — with positive weights that equals min
    * over SIMPLE paths of ≤ k edges, the bounded-hop SSSP semantics a
    * recursive-CTE oracle replays exactly. Exact longs throughout; no
    * convergence detection needed, `maxHops` IS the contract.
    *
    * Output: (node, dist) for every node within `maxHops` edges of a
    * seed; seeds themselves at dist 0.
    */
  def ssspBounded(edges: DataFrame, seeds: DataFrame,
                  maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0, got $maxHops")
    val init = seeds.select(col("node")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(false)
    var dist = init
    var frontier = init
    for (_ <- 1 to maxHops) {
      val candidates = frontier
        .join(edges, frontier("node") === edges("src"))
        .select(col("dst").as("node"),
          (col("dist") + col("w").cast("long")).as("dist"))
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      val improved = candidates
        .join(dist.withColumnRenamed("dist", "__old"), Seq("node"), "left")
        .filter(col("__old").isNull || col("dist") < col("__old"))
        .select(col("node"), col("dist"))
        .localCheckpoint(false)
      dist = dist.unionByName(improved)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint(false)
      frontier = improved
    }
    dist
  }

  /** Exact triangle count over an UNDIRECTED edge list (`a`, `b`; either
    * orientation, duplicates and self-loops tolerated — canonicalized
    * internally). Degree-ordered orientation: each edge is directed from
    * its lower endpoint in the (degree, id) total order, so every
    * out-neighborhood is O(√|E|) and the wedge join emits O(|E|^1.5)
    * candidates — the standard distributed bound — instead of Σ deg²
    * from star hubs. Every triangle then has exactly one apex with both
    * out-edges, and its closing edge appears in exactly one orientation
    * (lower order → higher), so the count is three equi-joins, no
    * window, no cross product, each triangle counted once.
    *
    * Output: one row `(n_nodes, n_edges, n_triangles)` — all exact
    * longs, engine-portable by construction.
    */
  /** k-core peeling over a SYMMETRIC edge list: repeatedly drop nodes
    * of degree < k (with the edges they carried) — the surviving
    * subgraph, where EVERY node keeps ≥ k neighbors, is the classic
    * dense-community / spam-ring extractor and the influence-seeding
    * filter degree alone fakes (a hub of leaves has huge degree and no
    * core). `rounds` fixed-point iterations as relational ops (degree
    * aggregate + two semi-joins per round, per-round lazy checkpoints
    * — the [[pageRank]] fixed-iteration convention; each peel round
    * can only remove nodes, so convergence is monotone and testable by
    * comparing rounds R and R+1). Output: (node, degree) of the
    * surviving subgraph after `rounds` peels.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var surviving = edges.select(col("src"), col("dst"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      val keep = surviving.groupBy(col("src"))
        .agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k)
        .select(col("src"))
        .localCheckpoint(false)
      surviving = surviving
        .join(keep, Seq("src"), "left_semi")
        .join(keep.select(col("src").as("dst")), Seq("dst"), "left_semi")
        .localCheckpoint(false)
    }
    surviving.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("degree"))
  }

  /** Synchronous label-propagation communities (Raghavan et al.),
    * DETERMINISTIC variant: `rounds` fixed synchronous rounds; each
    * node adopts the most frequent label among its NEIGHBORS, ties
    * broken to the smallest label (classic LPA breaks ties randomly
    * and updates asynchronously — neither of which an oracle can
    * replay). Communities are not components: a bridge edge keeps two
    * dense blobs in one connected component, but their interior label
    * mass outvotes the bridge, so LPA separates them.
    *
    * Shape per round: one equi-join (edges × labels, |E| rows), a
    * (node, label) count aggregate, and a min-struct argmax
    * ((−count, label) minimum — the highest count with the smallest
    * label, no per-node sort). `rounds` is a small fixed constant —
    * the same bounded fixed-point discipline as [[pageRank]]/[[kCore]]
    * — and each round barriers through a lazy localCheckpoint so the
    * iteration count, not plan depth, is what grows. Input edges must
    * be SYMMETRIC (both directions present, no duplicates); isolated
    * nodes (no edges) are out of scope — they'd keep their own label.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val sym = edges.select(col("src"), col("dst"))
      .localCheckpoint(false)
    var labels = sym.select(col("src").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint(false)
    for (_ <- 1 to rounds) {
      labels = sym
        .join(labels.select(col("node").as("dst"), col("label")),
          Seq("dst"))
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("src"))
        .agg(min(struct((-col("__c")).as("nc"), col("label").as("l")))
          .as("__b"))
        .select(col("src").as("node"), col("__b").getField("l")
          .as("label"))
        .localCheckpoint(false)
    }
    labels
  }

  /** Per-node local clustering coefficient: tri(v) / C(deg(v), 2) —
    * how close each node's neighborhood is to a clique (community
    * cohesion, spam-graph detection; the per-node refinement of
    * [[triangleCount]]'s global number). Same degree-ordered wedge
    * machinery and O(|E|^1.5) bound; each triangle found once at its
    * apex, then credited to ALL THREE corners (one explode), so the
    * per-node counts come from one extra group-by — no per-node
    * triangle recount. Exact integers into one IEEE division; nodes
    * with degree < 2 have no defined neighborhood pair and report 0.
    */
  def clusteringCoefficients(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false)
    val deg = canon.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .localCheckpoint(false)
    val withDeg = canon
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(fwd, col("u")).otherwise(col("v")).as("src"),
      when(fwd, col("v")).otherwise(col("u")).as("dst"),
      when(fwd, col("dv")).otherwise(col("du")).as("ddst"))
      .localCheckpoint(false)
    val w1 = oriented.select(col("src"), col("dst").as("x"),
      col("ddst").as("dx"))
    val w2 = oriented.select(col("src"), col("dst").as("y"),
      col("ddst").as("dy"))
    val wedges = w1.join(w2, Seq("src"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
      .select(col("src").as("apex"), col("x"), col("y"))
    val triCorners = wedges
      .join(oriented.select(col("src").as("x"), col("dst").as("y")),
        Seq("x", "y"))
      .select(explode(array(col("apex"), col("x"), col("y"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("n_tri"))
    deg.join(triCorners, Seq("n"), "left")
      .select(col("n").as("node"), col("d").as("degree"),
        coalesce(col("n_tri"), lit(0L)).as("n_triangles"),
        when(col("d") >= 2,
          (coalesce(col("n_tri"), lit(0L)) * 2).cast("double") /
            (col("d") * (col("d") - 1)).cast("double"))
          .otherwise(lit(0.0)).as("clustering_coef"))
  }

  /** Deterministic synchronous modularity-greedy community rounds —
    * one level of Louvain (Blondel et al. 2008) without coarsening,
    * the quality-aware upgrade of [[labelPropagation]]: where LPA
    * follows raw neighbor-label counts, each node here moves to the
    * neighbor community with the largest MODULARITY GAIN, so a few
    * high-degree bridge edges cannot pull two dense blobs together
    * (their mass term `k_i·D_c` penalizes joining a huge community).
    *
    * Per round, every node i picks argmax over its neighbor
    * communities ∪ its own of the integer score
    *   2m·k_{i,c} − k_i·(D_c − [c = c_i]·k_i)
    * (the ΔQ ranking with positive constants dropped; D_c excludes i
    * itself when evaluating staying home — the standard
    * remove-then-compare formulation). Ties go to the OWN community
    * first (Blondel's rule: move only on STRICTLY positive gain —
    * zero-gain moves are where synchronous rounds can jointly lower Q),
    * then to the smallest label among equally-scored strict improvers.
    * Classic Louvain scans nodes asynchronously in arbitrary
    * order — unreplayable by an oracle — while a naive synchronous
    * sweep OSCILLATES on symmetric structures (two nodes swap into
    * each other's community forever; hand-traced on twin triangles).
    * The deterministic middle ground is PARITY ALTERNATION, the
    * coloring trick of distributed Louvain implementations: on round
    * r only nodes with (node + r) mod 2 = 0 may move, the rest hold —
    * symmetric swaps are impossible because at most one endpoint of
    * any edge moves per round. Fixed `rounds` (use ≥ 2·expected
    * passes, each parity moves every other round); each round: two
    * label joins, two bounded aggregates, one argmax — all exact
    * integer arithmetic (contract: 2m·max-degree < 2^63). Input edges
    * must be SYMMETRIC, no duplicates, no self-loops.
    */
  def modularityGreedy(edges: DataFrame, rounds: Int): DataFrame =
    modularityGreedyWeighted(
      edges.select(col("src"), col("dst"), lit(1L).as("w")), rounds)

  /** Weighted [[modularityGreedy]] — the per-level engine of the full
    * multi-level [[louvain]]: identical parity-alternating integer
    * rounds, generalized from edge COUNTS to integer edge WEIGHTS so
    * it runs on contracted graphs. Input rows (src, dst, w): both
    * directions present for src ≠ dst; a SELF-LOOP row (i, i, w)
    * carries the contracted community's internal mass with w = 2×
    * internal weight (the standard Louvain coarsening convention), so
    * strength k_i = Σ_dst w(i,·) counts internal edges twice and
    * 2m = Σ w is conserved across levels. Self-loops are excluded
    * from k_{i,c} (they move WITH i, contributing equally to every
    * candidate community — the remove-then-compare formulation) but
    * included in k_i and hence D_c. With w ≡ 1 and no self-loops this
    * is bit-identical to the unweighted operator (sums of ones are
    * counts). Contract: 2m·max-strength < 2^63.
    */
  def modularityGreedyWeighted(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val sym = edges.select(col("src"), col("dst"), col("w"))
      .localCheckpoint(false)
    val deg = sym.groupBy(col("src").as("node"))
      .agg(sum(col("w")).as("__k"))
      .localCheckpoint(false)
    val twoM = sym.agg(sum(col("w")).as("__2m"))
    var labels = deg.select(col("node"), col("node").as("label"))
      .localCheckpoint(false)
    for (r <- 1 to rounds) {
      // degree mass per community under the current assignment
      val dmass = labels
        .join(deg, Seq("node"))
        .groupBy(col("label")).agg(sum(col("__k")).as("__D"))
      // weight from i into community c (via dst labels); self-loops
      // excluded — they follow i into any community and cancel
      val kic = sym
        .filter(col("src") =!= col("dst"))
        .join(labels.select(col("node").as("dst"), col("label")),
          Seq("dst"))
        .groupBy(col("src"), col("label"))
        .agg(sum(col("w")).as("__kic"))
      // own community enters with k_{i,c_i} = 0 when no neighbor
      // shares it; the sum-merge collapses the duplicate otherwise
      val cand = kic
        .unionByName(labels.select(col("node").as("src"), col("label"))
          .withColumn("__kic", lit(0L)))
        .groupBy(col("src"), col("label"))
        .agg(sum(col("__kic")).as("__kic"))
      labels = cand
        .join(dmass, Seq("label"))
        .join(deg.select(col("node").as("src"), col("__k")), Seq("src"))
        .join(labels.select(col("node").as("src"),
          col("label").as("__own")), Seq("src"))
        .crossJoin(broadcast(twoM))
        .select(col("src"), col("label"), col("__own"),
          (col("__2m") * col("__kic") - col("__k") *
            (col("__D") - when(col("label") === col("__own"),
              col("__k")).otherwise(lit(0L)))).as("__score"))
        .groupBy(col("src"))
        .agg(min(struct((-col("__score")).as("ns"),
          // Blondel's positive-gain rule: the OWN community wins score
          // ties, so zero-gain moves never happen — without this, two
          // non-adjacent nodes can make simultaneous ΔQ=0 joins whose
          // JOINT effect is negative (hand-traced: hub-bridged
          // triangles collapse to one community, Q 0.125 → 0). Among
          // strictly-better non-own communities, smallest label.
          when(col("label") === col("__own"), lit(0L)).otherwise(lit(1L))
            .as("oo"),
          col("label").as("l"))).as("__b"),
          first(col("__own")).as("__own"))
        .select(col("src").as("node"),
          when(pmod(col("src") + lit(r.toLong), lit(2L)) === 0,
            col("__b").getField("l"))
            .otherwise(col("__own")).as("label"))
        .localCheckpoint(false)
    }
    labels
  }

  /** Louvain graph contraction: community → supernode, edge weights
    * re-aggregated. Internal edges collapse into the supernode's
    * SELF-LOOP row automatically — both directed rows of an internal
    * edge land on (c, c), so the self-loop weight is exactly 2× the
    * community's internal weight, which is what
    * [[modularityGreedyWeighted]]'s strength accounting expects.
    * Output: (src, dst, w) over community ids, still symmetric,
    * Σ w conserved.
    */
  def contract(edges: DataFrame, labels: DataFrame): DataFrame = {
    val lab = labels.select(col("node"), col("label"))
      .localCheckpoint(false)
    edges
      .join(lab.select(col("node").as("src"), col("label").as("__cs")),
        Seq("src"))
      .join(lab.select(col("node").as("dst"), col("label").as("__cd")),
        Seq("dst"))
      .groupBy(col("__cs").as("src"), col("__cd").as("dst"))
      .agg(sum(col("w")).as("w"))
  }

  /** Full multi-level Louvain (Blondel et al. 2008): run the
    * parity-alternating greedy for `roundsPerLevel` rounds, CONTRACT
    * communities to supernodes ([[contract]] — weight re-aggregation,
    * internal mass as self-loops), and repeat on the coarsened graph,
    * composing the level mappings back down to original nodes. Level-2
    * moves relocate whole level-1 communities at once — exactly the
    * merges one flat level cannot reach once every single-node move is
    * locally unprofitable. Each accepted move has modularity gain ≥
    * staying put ON THE CONTRACTED GRAPH (with the strictly-positive
    * own-community tie rule killing the zero-gain oscillation class),
    * and contracted-graph modularity equals original-graph modularity
    * of the composed assignment. That makes each move individually
    * non-lowering, but simultaneous strictly-positive moves by two
    * same-parity nodes can in principle still jointly lower Q —
    * parity alternation only serializes edge-adjacent swaps — so
    * monotonicity across rounds/levels is pinned empirically on the
    * GraphSpec graphs, not guaranteed in general.
    *
    * Scale shape per level: the same two label joins + bounded
    * aggregates as one flat level, but on a graph that SHRINKS
    * geometrically (each contraction divides nodes by the mean
    * community size), so total cost ≈ one flat run plus a fast tail —
    * the reason Louvain is the standard 10^9-edge community algorithm.
    * Input: SYMMETRIC unweighted edges (src, dst), no self-loops, no
    * duplicates — the [[modularityGreedy]] contract. Output: (node,
    * label) at ORIGINAL node granularity; labels are level-deep
    * community representatives.
    */
  def louvain(edges: DataFrame, levels: Int,
              roundsPerLevel: Int): DataFrame = {
    require(levels >= 1, s"levels must be >= 1, got $levels")
    var g = edges.select(col("src"), col("dst"), lit(1L).as("w"))
      .localCheckpoint(false)
    var mapping: DataFrame = null
    for (lvl <- 1 to levels) {
      val lab = modularityGreedyWeighted(g, roundsPerLevel)
      mapping =
        if (mapping == null) lab.localCheckpoint(false)
        else mapping
          .join(lab.select(col("node").as("label"),
            col("label").as("__nl")), Seq("label"))
          .select(col("node"), col("__nl").as("label"))
          .localCheckpoint(false)
      if (lvl < levels) g = contract(g, lab).localCheckpoint(false)
    }
    mapping
  }

  /** Newman modularity Q of a community assignment over a SYMMETRIC
    * edge set (both directions present, no duplicate rows — the
    * [[labelPropagation]] input contract), the standard "are these
    * communities better than chance" score for a partition:
    *
    *   Q = Σ_c ( L_c/2m − (D_c/2m)² )
    *
    * with L_c = directed edge rows internal to community c, D_c = the
    * degree mass of c (directed rows whose src is in c), 2m = total
    * directed rows. Computed EXACTLY in integers via the equivalent
    *   Q = (2m·Σ_c L_c − Σ_c D_c²) / (2m)²
    * — two integer sums and ONE IEEE division at the end, so the value
    * is order/partitioning-independent and engine-exact (the
    * [[triangleCount]] convention; contract: Σ D_c² < 2^63, i.e.
    * degree mass per community below ~3·10^9 — shard and merge the
    * integer cells beyond that).
    *
    * Plan shape: two broadcast-joinable label lookups against the edge
    * list (the communities table is |V|-sized; AQE broadcasts it when
    * small, shuffles an equi-join when not), a per-community count
    * aggregate (map-side combine, ≤ |communities| groups), and a
    * bounded global fold of the per-community rows. Output: one row
    * (n_communities, m_edges, modularity). Nodes missing from
    * `communities` would drop their edge rows — assign every node
    * (labelPropagation emits all of them).
    */
  def modularity(edges: DataFrame, communities: DataFrame): DataFrame = {
    val comm = communities
      .select(col("node"), col("label"))
      .localCheckpoint(false)
    val e = edges.select(col("src"), col("dst"))
      .join(comm.select(col("node").as("src"), col("label").as("ca")),
        Seq("src"))
      .join(comm.select(col("node").as("dst"), col("label").as("cb")),
        Seq("dst"))
    val perC = e.groupBy(col("ca")).agg(
      count(lit(1)).as("deg"),
      sum(when(col("ca") === col("cb"), 1L).otherwise(0L)).as("lin"))
    val folded = perC.agg(
      sum(col("deg")).as("twoM"),
      sum(col("lin")).as("sin"),
      sum(col("deg") * col("deg")).as("sdeg2"))
    val nComm = comm.agg(
      count_distinct(col("label")).as("n_communities"))
    folded.crossJoin(broadcast(nComm))
      .select(col("n_communities"),
        (col("twoM") / 2).cast("long").as("m_edges"),
        ((col("twoM") * col("sin") - col("sdeg2")).cast("double") /
          (col("twoM") * col("twoM")).cast("double")).as("modularity"))
  }

  def triangleCount(edges: DataFrame): DataFrame = {
    // canon/deg/oriented are each referenced 3+ times downstream
    // (wedge sides, closing-edge probe, node/edge counts); without a
    // materialization barrier Catalyst inlines the whole upstream
    // subtree per reference (measured: 88 copies of the source scan
    // for a co-purchase edge build). Lazy local checkpoints compute
    // each ONCE at first action and cut the lineage — the
    // connectedComponents convention for multi-reference graph state.
    val canon = edges
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false)
    val deg = canon.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
      .localCheckpoint(false)
    // orient u→v iff (d(u), u) < (d(v), v); carry the out-endpoint's
    // order key so wedges can canonicalize without re-joining degrees
    val withDeg = canon
      .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
      .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg.select(
      when(fwd, col("u")).otherwise(col("v")).as("src"),
      when(fwd, col("v")).otherwise(col("u")).as("dst"),
      when(fwd, col("dv")).otherwise(col("du")).as("ddst"))
      .localCheckpoint(false)
    // wedges at each apex: unordered out-neighbor pairs, canonicalized
    // by the same (degree, id) order the orientation used — the closing
    // edge, if present, is oriented exactly x→y
    val w1 = oriented.select(col("src"), col("dst").as("x"),
      col("ddst").as("dx"))
    val w2 = oriented.select(col("src"), col("dst").as("y"),
      col("ddst").as("dy"))
    val wedges = w1.join(w2, Seq("src"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
      .select(col("x").as("src"), col("y").as("dst"))
    val tri = wedges.join(oriented.select(col("src"), col("dst")),
      Seq("src", "dst"))
    val nNodes = deg.agg(count(lit(1)).as("n_nodes"))
    val nEdges = canon.agg(count(lit(1)).as("n_edges"))
    tri.agg(count(lit(1)).as("n_triangles"))
      .crossJoin(broadcast(nNodes))
      .crossJoin(broadcast(nEdges))
      .select(col("n_nodes"), col("n_edges"), col("n_triangles"))
  }
}
