package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window

import graft.io.Tables
import graft.ext.{Basket, Behavior, Bpe, Classifier, Dedup, Dsir, Eval, Events, Multimodal, Pca, Retrieval, Sampling, Similarity, SuffixArray, TextAnalysis, Urls}
import graft.ops.{EditDistJoin, Quality}
import graft.functions.Hashing

/** Beyond-reference operators (builder brief + SURVEY §7.4): dedup,
  * similarity search, text analysis, multimodal features, joins, windows,
  * event-time aggregation — each with an exact-parity DuckDB oracle.
  *
  * Parity techniques (same as the core set): integer/md5-derived hashes
  * (engine-independent), quantized-integer dot products (order-independent
  * exact accumulation), DECIMAL sums, second-truncated event time, epoch
  * integers instead of timestamps at the output boundary.
  */
object ExtQueries {

  private def T(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val dsumSql = (e: String) =>
    s"CAST(SUM(CAST($e AS DECIMAL(18,2))) AS DOUBLE)"

  /** Shared eval-query scoring frame over documents: en label `y`,
    * stop-hit count `xs`, token count `xt`, and the per-mille stopword
    * ratio `s = (xs·1000) DIV xt` — all integers, row-local.
    */
  private def scoreFrame(docs: DataFrame): DataFrame =
    docs.select(
        col("doc_id"),
        (col("lang") === "en").cast("int").as("y"),
        TextAnalysis.vocabHits(split(lower(col("text")), " "),
          Seq("the", "and", "of", "to", "a")).cast("long").as("xs"),
        size(split(lower(col("text")), " ")).cast("long").as("xt"))
      .withColumn("s", expr("(xs * 1000) DIV xt"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- dedup --------------------------------------------------------

    "x_dedup_exact" -> ((s, dir) =>
      Dedup.exactGroups(T(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("content_hash"))),

    // Survivor rows of exact dedup (lowest id per content hash).
    "x_dedup_survivors" -> ((s, dir) =>
      Dedup.dropExactDups(T(s, dir, "documents"), "doc_id", "text")
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // exact-oracle queries disable the skew guards (maxBucket/maxDf = 0)
    // so both engines enumerate identical pair spaces; production callers
    // keep the safe defaults
    "x_dedup_minhash" -> ((s, dir) =>
      Dedup.minhashCandidatePairs(T(s, dir, "documents"), "doc_id", "text",
        bands = 4, rowsPerBand = 2, maxBucket = 0)
        .orderBy(col("id_a"), col("id_b"))),

    // Incremental dedup: batch (doc_id >= 400) vs corpus index
    // (doc_id < 400) — band join + Jaccard verification on collisions.
    "x_dedup_incremental" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      Dedup.dedupAgainstIndex(
          docs.filter(col("doc_id") < 400),
          docs.filter(col("doc_id") >= 400),
          "doc_id", "text", minJaccard = 0.5)
        .orderBy(col("batch_id"), col("index_id"))
    }),

    "x_dedup_simhash" -> ((s, dir) =>
      Dedup.simhashTable(T(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    "x_dedup_simhash_pairs" -> ((s, dir) =>
      Dedup.simhashBandPairs(T(s, dir, "documents"), "doc_id", "text",
        maxHamming = 3, bands = 4, maxBucket = 0)
        .orderBy(col("id_a"), col("id_b"))),

    "x_dedup_jaccard" -> ((s, dir) =>
      Dedup.jaccardPairs(T(s, dir, "documents"), "doc_id", "text", n = 1,
        candidates = col("doc_id") < 150, minJaccard = 0.8, maxDf = 0)
        .orderBy(col("id_a"), col("id_b"))),

    "x_dedup_jaccard3" -> ((s, dir) =>
      Dedup.jaccardPairs(T(s, dir, "documents"), "doc_id", "text", n = 3,
        candidates = col("doc_id") < 150, minJaccard = 0.05, maxDf = 0)
        .orderBy(col("id_a"), col("id_b"))),

    // Prefix-filtered EXACT jaccard join (PPJoin/AllPairs rule): same
    // output as jaccardPairs at the threshold, but the inverted index
    // holds only each set's df-rarest prefix — no false negatives by
    // the prefix principle, candidates fall quadratically. The oracle
    // is the plain all-postings formula: exactness IS the claim.
    "x_jaccard_prefix" -> ((s, dir) =>
      Dedup.jaccardPairsPrefix(T(s, dir, "documents"), "doc_id", "text",
          n = 1, candidates = col("doc_id") < 300, minJaccard = 0.8,
          maxDf = 0)
        .orderBy(col("id_a"), col("id_b"))),

    // KMV sketches of two key columns that never sat in one table:
    // distinct + overlap estimates for join planning / FK discovery,
    // side by side with the exact values. Deterministic md5 sketch —
    // the oracle rebuilds it value for value.
    "x_kmv_overlap" -> ((s, dir) => {
      import graft.agg.Kmv
      val k = 128
      val a = Kmv.sketch(T(s, dir, "customer"), "c_custkey", k, seed = 3)
        .localCheckpoint(false)
      val b = Kmv.sketch(T(s, dir, "orders"), "o_custkey", k, seed = 3)
        .localCheckpoint(false)
      val ca = T(s, dir, "customer").select(col("c_custkey").as("key"))
      val ob = T(s, dir, "orders").select(col("o_custkey").as("key"))
      Kmv.jaccardEstimate(a, b, k)
        .crossJoin(Kmv.distinctEstimate(a, k)
          .select(col("distinct_est").as("a_distinct_est")))
        .crossJoin(Kmv.distinctEstimate(b, k)
          .select(col("distinct_est").as("b_distinct_est")))
        .crossJoin(
          ca.intersect(ob).agg(count(lit(1)).as("n_inter_exact")))
        .crossJoin(ca.union(ob).distinct()
          .agg(count(lit(1)).as("n_union_exact")))
        .select(col("jaccard_est"), col("union_distinct_est"),
          col("a_distinct_est"), col("b_distinct_est"),
          col("n_inter_exact"), col("n_union_exact"))
    }),

    // Asymmetric partial-dup detection: containment |A∩B|/min(|A|,|B|)
    // catches a short doc embedded in a long one (Jaccard ≈ short/long
    // misses it). Same inverted-index pair path as jaccard.
    "x_dedup_containment" -> ((s, dir) =>
      Dedup.containmentPairs(T(s, dir, "documents"), "doc_id", "text",
        n = 1, candidates = col("doc_id") < 150, minContainment = 0.8,
        maxDf = 0)
        .orderBy(col("id_a"), col("id_b"))),

    // PageRank over the doc-similarity graph (importance-weighted
    // canonical-copy selection): 3 damped iterations, decimal-pinned
    // contributions for cross-engine exactness.
    "x_pagerank" -> ((s, dir) => {
      val pairs = Dedup.jaccardPairs(T(s, dir, "documents"), "doc_id",
        "text", n = 1, candidates = col("doc_id") < 150,
        minJaccard = 0.8, maxDf = 0)
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(
          pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .localCheckpoint(false)
      graft.ext.Graph.pageRank(edges, iters = 3, dampingPct = 85)
        .withColumnRenamed("node", "doc_id")
        .orderBy(col("doc_id"))
    }),

    "x_dedup_pipeline" -> ((s, dir) =>
      Dedup.nearDupSurvivors(T(s, dir, "documents"), "doc_id", "text",
        minJaccard = 0.8, maxBucket = 0)
        .orderBy(col("doc_id"))),

    // Transitive near-dup clusters: min-id label over the LSH pair graph.
    "x_dedup_clusters" -> ((s, dir) =>
      Dedup.connectedComponents(
        Dedup.minhashCandidatePairs(T(s, dir, "documents"), "doc_id", "text",
          bands = 4, rowsPerBand = 2, maxBucket = 0))
        .orderBy(col("doc_id"))),

    // Incremental component maintenance: the SAME pair graph split into
    // two arbitrary batches — full closure over batch 1, then
    // Dedup.incrementalComponents folds batch 2 in by projecting its
    // endpoints onto stored representatives and closing only that
    // batch-sized graph. The oracle is x_dedup_clusters' full recursive
    // closure over ALL pairs: the incremental path must be
    // bit-identical to recomputing from scratch.
    "x_cc_incremental" -> ((s, dir) => {
      val pairs = Dedup.minhashCandidatePairs(T(s, dir, "documents"),
        "doc_id", "text", bands = 4, rowsPerBand = 2, maxBucket = 0)
        .localCheckpoint(false)
      val stored = Dedup.connectedComponents(
        pairs.filter((col("id_a") + col("id_b")) % 2 === 0))
      Dedup.incrementalComponents(stored,
          pairs.filter((col("id_a") + col("id_b")) % 2 =!= 0))
        .orderBy(col("doc_id"))
    }),

    // Label-propagation communities over the same LSH pair graph —
    // the density-sensitive refinement of x_dedup_clusters'
    // components (a bridge edge keeps two blobs in one component; LPA
    // splits them when interior label mass outvotes the bridge). Two
    // deterministic synchronous rounds, smallest-label tie-break; the
    // oracle unrolls the identical rounds in CTEs.
    "x_label_prop" -> ((s, dir) => {
      val cand = Dedup.minhashCandidatePairs(T(s, dir, "documents"),
        "doc_id", "text", bands = 4, rowsPerBand = 2, maxBucket = 0)
      val edges = cand.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(
          cand.select(col("id_b").as("src"), col("id_a").as("dst")))
      graft.ext.Graph.labelPropagation(edges, rounds = 2)
        .withColumnRenamed("node", "doc_id")
        .withColumnRenamed("label", "community")
        .orderBy(col("doc_id"))
    }),

    // Modularity-greedy communities (one Louvain level, parity-
    // alternating synchronous rounds) over the same minhash graph —
    // the quality-aware upgrade of x_label_prop: nodes move by ΔQ,
    // so high-degree bridges can't pull dense blobs together. 4
    // rounds = two full passes per parity.
    "x_louvain" -> ((s, dir) => {
      val cand = Dedup.minhashCandidatePairs(T(s, dir, "documents"),
        "doc_id", "text", bands = 4, rowsPerBand = 2, maxBucket = 0)
      val edges = cand.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(
          cand.select(col("id_b").as("src"), col("id_a").as("dst")))
        .localCheckpoint(false)
      graft.ext.Graph.modularityGreedy(edges, rounds = 4)
        .withColumnRenamed("node", "doc_id")
        .withColumnRenamed("label", "community")
        .orderBy(col("doc_id"))
    }),

    // FULL multi-level Louvain over the same minhash graph: 2 levels ×
    // 2 parity rounds. After level 1, communities contract to
    // supernodes (edge weights re-aggregated, internal mass as
    // self-loops with 2× weight) and level 2 re-runs the WEIGHTED
    // greedy on the coarse graph — merging whole level-1 communities
    // that no single-node move could join. The oracle unrolls the
    // identical weighted integer rounds per level, contraction
    // included.
    "x_louvain_ml" -> ((s, dir) => {
      val cand = Dedup.minhashCandidatePairs(T(s, dir, "documents"),
        "doc_id", "text", bands = 4, rowsPerBand = 2, maxBucket = 0)
      val edges = cand.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(
          cand.select(col("id_b").as("src"), col("id_a").as("dst")))
        .localCheckpoint(false)
      graft.ext.Graph.louvain(edges, levels = 2, roundsPerLevel = 2)
        .withColumnRenamed("node", "doc_id")
        .withColumnRenamed("label", "community")
        .orderBy(col("doc_id"))
    }),

    // Partition quality of those communities: Newman modularity over
    // the same minhash doc graph — exact integer edge/degree sums into
    // ONE final IEEE division (engine- and partitioning-exact), per-
    // community aggregation with map-side combine. Edges checkpointed
    // once: both the LPA rounds and the modularity join read them.
    "x_modularity" -> ((s, dir) => {
      val cand = Dedup.minhashCandidatePairs(T(s, dir, "documents"),
        "doc_id", "text", bands = 4, rowsPerBand = 2, maxBucket = 0)
      val edges = cand.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(
          cand.select(col("id_b").as("src"), col("id_a").as("dst")))
        .localCheckpoint(false)
      graft.ext.Graph.modularity(edges,
        graft.ext.Graph.labelPropagation(edges, rounds = 2))
    }),

    // Personalized PageRank from seed docs 0-4 over the same jaccard
    // graph as x_pagerank — "importance relative to these exemplars",
    // the seed-expansion primitive for curated data selection. Same
    // fixed-point integer arithmetic; rank rows cover seeds ∪ the
    // 3-hop reach (frontier-sized state, never |V|-sized).
    "x_ppr" -> ((s, dir) => {
      val pairs = Dedup.jaccardPairs(T(s, dir, "documents"), "doc_id",
        "text", n = 1, candidates = col("doc_id") < 150,
        minJaccard = 0.8, maxDf = 0)
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(
          pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .localCheckpoint(false)
      graft.ext.Graph.personalizedPageRank(edges,
          T(s, dir, "documents").filter(col("doc_id") < 5)
            .select(col("doc_id").as("node")),
          iters = 3, dampingPct = 85)
        .withColumnRenamed("node", "doc_id")
        .orderBy(col("doc_id"))
    }),

    "x_dedup_embedding" -> ((s, dir) =>
      Similarity.nearDupPairs(T(s, dir, "embeddings"), "vec_id", "embedding",
        maxId = 300L, threshold = 0.3)),

    // DBSCAN over the LSH-blocked cosine neighbor graph: cores by
    // degree, clusters = min-id components of the core-core subgraph,
    // borders attach to their smallest core neighbor, the rest is
    // noise — no k, outliers stay out. Every tie-break is an id MIN.
    "x_dbscan" -> ((s, dir) =>
      Similarity.dbscan(T(s, dir, "embeddings"), "vec_id", "embedding",
          maxId = 150L, eps = 0.25, minPts = 2)
        .orderBy(col("id"))),

    // Leakage-free 80/20 split: near-dup clusters (minhash candidate
    // components) land whole in one split — the decontamination
    // guarantee; the split decision hashes the cluster REP, not the id.
    "x_split_leakfree" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      Sampling.leakFreeSplit(docs.select(col("doc_id")), "doc_id",
          Dedup.minhashCandidatePairs(docs, "doc_id", "text",
            bands = 4, rowsPerBand = 2, maxBucket = 0),
          Seq("train" -> 0.8, "test" -> 0.2), seed = 0)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("rep")).as("n_clusters"))
        .orderBy(col("split"))
    }),

    // ---- similarity search -------------------------------------------

    // One k-means training step from a deterministic 8-vector codebook:
    // literal-codebook argmin assignment (zero-shuffle), C·d-row mean.
    "x_kmeans_step" -> ((s, dir) => {
      val codebook = T(s, dir, "embeddings")
        .filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding"))
        .collect()  // KB-sized codebook = driver-side parameter
        .map(r => r.getLong(0) ->
          r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toSeq)
        .toSeq.sortBy(_._1)
      Similarity.lloydStep(T(s, dir, "embeddings"), "vec_id", "embedding",
          codebook)
        .orderBy(col("cell"), col("dim"))
    }),

    // One exact logistic-regression gradient step from w = 0 for the
    // trainable quality classifier (σ(0) = 1/2 exactly — no
    // transcendental in the plan, every term an integer multiple of
    // 1/2): the lloydStep precedent — the full training loop is
    // spec-checked against a plain-Scala reference (ClassifierSpec).
    "x_logreg_step" -> ((s, dir) =>
      Classifier.logregStepTable(T(s, dir, "documents"),
          Classifier.features(col("text")),
          labelCol = (col("lang") === "en").cast("int"),
          w = Seq(0.0, 0.0, 0.0, 0.0), lr = 0.1)
        .orderBy(col("feature"))),

    // Per-group z-score standardization from exact integer sums:
    // mean = Σx/n, var = (Σx² − (Σx)²/n)/n — only exactly-rounded IEEE
    // ops (+ − × ÷ √), so z-scores are bit-portable with no rounding.
    "x_feature_scale" -> ((s, dir) => {
      val d = T(s, dir, "documents")
      val stats = d.groupBy(col("lang")).agg(
        sum(col("n_chars")).as("sx"),
        sum(col("n_chars") * col("n_chars")).as("sq"),
        count(lit(1)).as("n"))
      val m = col("sx").cast("double") / col("n").cast("double")
      val v = (col("sq").cast("double") -
        col("sx").cast("double") * col("sx").cast("double") /
          col("n").cast("double")) / col("n").cast("double")
      d.join(broadcast(stats), Seq("lang"))
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          ((col("n_chars").cast("double") - m) / sqrt(v)).as("z"))
        .orderBy(col("doc_id"))
    }),

    // Mann-Whitney AUC of the stopword-ratio score (per-mille, integer
    // division) against the en label: per-score-value counts + two-phase
    // prefix sum (Eval.auc) — integer arithmetic to ONE final division,
    // bit-portable with no rounding.
    "x_auc" -> ((s, dir) =>
      Eval.auc(scoreFrame(T(s, dir, "documents")), col("s"), col("y"),
        bucketOf = c => floor(c.cast("double") / lit(100.0)).cast("long"))),

    // Precision-recall curve: one operating point per distinct score,
    // exact integer tp/fp/fn via the same two-phase bucketed prefix
    // sum as x_auc (cumulative-from-above = total − strictly-below, so
    // no descending window); one IEEE division per rate.
    "x_pr_curve" -> ((s, dir) =>
      Eval.prCurve(scoreFrame(T(s, dir, "documents")), col("s"), col("y"),
          bucketOf = c => floor(c.cast("double") / lit(100.0)).cast("long"))
        .orderBy(col("threshold"))),

    // Threshold confusion matrix for the integer-margin predictor
    // 20·stop_hits − n_tokens > 0 (σ(m) > ½ ⟺ m > 0 — thresholding the
    // sigmoid at 0.5 without evaluating it). Counts exact; each rate is
    // one IEEE division.
    "x_confusion" -> ((s, dir) =>
      Eval.confusion(scoreFrame(T(s, dir, "documents")),
        expr("20 * xs - xt") > 0, col("y"))),

    // Reliability-diagram bins over the per-mille score: per-bin count,
    // positives, and the single exact-division positive rate.
    "x_calibration" -> ((s, dir) =>
      Eval.calibrationBins(scoreFrame(T(s, dir, "documents")),
          expr("s DIV 100"), col("y"))
        .orderBy(col("bin"))),

    // DSIR importance selection (Xie et al. 2023): hashed unigram+bigram
    // model (256 broadcast buckets, Laplace-smoothed target/raw
    // log-ratio pinned to DECIMAL(28,9)), per-doc decimal-exact weight
    // sum, top-50 by weight — the data-selection step of a pretraining
    // pipeline. Single corpus scan: the (doc, flag, bucket, n) gram
    // table is materialized once and feeds BOTH the model fit and the
    // scoring join (the BM25 twice-computed-subtree fix, PERF.md).
    "x_dsir" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val grams = Dsir.gramCounts(docs, "doc_id", "text",
        col("lang") === "en", buckets = 256)
      val model = Dsir.modelFromCounts(grams, buckets = 256)
      Dsir.selectTopK(
        Dsir.scoresFromCounts(grams, "doc_id", model), "doc_id", 50)
    }),

    // PSI drift monitor between even- and odd-doc_id halves of the
    // score distribution: per-bin smoothed (p−q)·ln(p/q) terms.
    "x_psi" -> ((s, dir) =>
      Eval.psiBins(scoreFrame(T(s, dir, "documents")),
          expr("s DIV 100"), expr("doc_id % 2 = 0"))
        .orderBy(col("bin"))),

    // Mutual information between the binned stopword-ratio feature and
    // the en label — the feature-selection score for the classifier.
    "x_feature_mi" -> ((s, dir) =>
      Eval.mutualInformation(scoreFrame(T(s, dir, "documents")),
        expr("s DIV 100"), col("y"))),

    // Pearson χ² of independence for the same feature/label pair — the
    // transcendental-free score (exact integer inputs, exactly-rounded
    // IEEE per-cell terms, decimal-pinned sum); zero-observed cells
    // contribute their expected mass via the marginal×marginal grid.
    "x_chi2" -> ((s, dir) =>
      Eval.chiSquared(scoreFrame(T(s, dir, "documents")),
        expr("s DIV 100"), col("y"))),

    // Exact triangle count on the co-purchase graph (pairs bought
    // together in ≥2 orders): degree-ordered orientation bounds the
    // wedge join at O(|E|^1.5) — three equi-joins, no window.
    "x_triangles" -> ((s, dir) =>
      graft.ext.Graph.triangleCount(
        Basket.pairSupport(T(s, dir, "lineitem"), "l_orderkey",
            "l_partkey")
          .filter(col("pair_support") >= 2)
          .select(col("item_a").as("a"), col("item_b").as("b")))),

    // Bounded-hop BFS over the doc-similarity graph (the x_pagerank
    // edges): shortest distance from seed docs 0-4 within 3 hops —
    // frontier-only joins, anti-join dedup, per-level checkpoints.
    // Oracle: recursive CTE min-distance over the same edges.
    "x_bfs_hops" -> ((s, dir) => {
      val pairs = Dedup.jaccardPairs(T(s, dir, "documents"), "doc_id",
        "text", n = 1, candidates = col("doc_id") < 150,
        minJaccard = 0.8, maxDf = 0)
      val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(
          pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .localCheckpoint(false)  // re-joined every hop — compute once
      graft.ext.Graph.bfsDistances(edges,
          T(s, dir, "documents").filter(col("doc_id") < 5)
            .select(col("doc_id").as("node")),
          maxHops = 3)
        .orderBy(col("node"))
    }),

    // Weighted bounded-hop shortest paths over the SAME doc-similarity
    // graph as x_bfs_hops, edge cost = gram-set UNION size
    // (na + nb − inter — an exact integer both engines derive
    // identically, so the min-cost comparison has no float in it):
    // cheapest ≤3-hop route from seed docs 0-4, frontier-pruned
    // Bellman-Ford rounds. Oracle: the x_bfs_hops recursive CTE
    // accumulating the same integer weights.
    "x_sssp" -> ((s, dir) => {
      val pairs = Dedup.jaccardPairsCounts(T(s, dir, "documents"),
          "doc_id", "text", n = 1, candidates = col("doc_id") < 150,
          minJaccard = 0.8, maxDf = 0)
        .select(col("id_a"), col("id_b"),
          (col("na") + col("nb") - col("inter")).as("w"))
      val edges = pairs
        .select(col("id_a").as("src"), col("id_b").as("dst"), col("w"))
        .unionByName(pairs
          .select(col("id_b").as("src"), col("id_a").as("dst"), col("w")))
        .localCheckpoint(false)  // re-joined every relaxation round
      graft.ext.Graph.ssspBounded(edges,
          T(s, dir, "documents").filter(col("doc_id") < 5)
            .select(col("doc_id").as("node")),
          maxHops = 3)
        .orderBy(col("node"))
    }),

    // 3-core of the co-purchase graph (4 peel rounds — converged on
    // this data, pinned by the spec's R vs R+1 check): the dense
    // repeatedly-co-bought backbone degree alone can't isolate.
    "x_kcore" -> ((s, dir) => {
      val pairs = Basket.pairSupport(T(s, dir, "lineitem"), "l_orderkey",
          "l_partkey")
        .filter(col("pair_support") >= 2)
        .select(col("item_a").as("src"), col("item_b").as("dst"))
      val sym = pairs.unionByName(
        pairs.select(col("dst").as("src"), col("src").as("dst")))
      graft.ext.Graph.kCore(sym, k = 3, rounds = 4)
        .orderBy(col("node"))
    }),

    // Markov next-event prediction eval: transition argmax learned on
    // 80% of users (hash split), top-1 accuracy on held-out users'
    // transitions — unseen contexts count as misses. One row.
    "x_markov_eval" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec"), col("event_id"))
      val trans = Events.loadEvents(s, dir)
        .select(col("user_id"), col("event_type").as("cur"),
          lag(col("event_type"), 1).over(w).as("prev"))
        .filter(col("prev").isNotNull)
        .withColumn("__test",
          pmod(Hashing.hash64(col("user_id").cast("string"), 21),
            lit(5L)) === 0)
      val counts = trans.filter(!col("__test"))
        .groupBy(col("prev"), col("cur"))
        .agg(count(lit(1)).as("n"))
      val predW = Window.partitionBy(col("prev"))
        .orderBy(col("n").desc, col("cur"))
      val pred = counts.withColumn("__rk", row_number().over(predW))
        .filter(col("__rk") === 1)
        .select(col("prev"), col("cur").as("pred"))
      trans.filter(col("__test"))
        .join(broadcast(pred), Seq("prev"), "left")
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("cur") === col("pred"), 1L).otherwise(0L))
            .as("n_hits"))
        .select(col("n_test"), col("n_hits"),
          (col("n_hits").cast("double") / col("n_test").cast("double"))
            .as("accuracy"))
    }),

    // Per-node local clustering coefficient on the co-purchase graph:
    // the triangle machinery with each found triangle credited to all
    // three corners — community cohesion per item.
    "x_clustering_coef" -> ((s, dir) =>
      graft.ext.Graph.clusteringCoefficients(
          Basket.pairSupport(T(s, dir, "lineitem"), "l_orderkey",
              "l_partkey")
            .filter(col("pair_support") >= 2)
            .select(col("item_a").as("a"), col("item_b").as("b")))
        .orderBy(col("node"))),

    // Centroid silhouette per vector against the fixed 8-cell codebook
    // (the kmeans-family quality diagnostic): row-local literal-argmin
    // distances, exact integer squares, one sqrt each — no join.
    "x_silhouette" -> ((s, dir) => {
      val codebook = T(s, dir, "embeddings")
        .filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding"))
        .collect()  // KB-sized codebook = driver-side parameter
        .map(r => r.getLong(0) ->
          r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toSeq)
        .toSeq.sortBy(_._1)
      Similarity.silhouette(T(s, dir, "embeddings"), "vec_id",
          "embedding", codebook)
        .filter(col("vec_id") < 200)
        .orderBy(col("vec_id"))
    }),

    // SemDeDup: cluster-bounded semantic near-dup pruning. Fixed
    // 8-vector codebook for determinism; the synthetic corpus has no
    // true semantic dups (max pairwise cosine 0.51), so the 0.3
    // threshold exercises the pruning path.
    "x_semdedup" -> ((s, dir) => {
      val codebook = T(s, dir, "embeddings")
        .filter(col("vec_id") < 8)
        .select(col("vec_id"), col("embedding"))
        .collect()  // KB-sized codebook = driver-side parameter
        .map(r => r.getLong(0) ->
          r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000)
            .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toSeq)
        .toSeq.sortBy(_._1)
      Similarity.semDedup(T(s, dir, "embeddings"), "vec_id", "embedding",
          codebook, threshold = 0.3)
        .orderBy(col("vec_id"))
    }),

    "x_ann_brute_topk" -> ((s, dir) =>
      Similarity.bruteForceTopK(T(s, dir, "embeddings"), "vec_id",
        "embedding", queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)),

    // Nearest-centroid confusion: exact integer-sum centroids (cosine is
    // scale-invariant, so sum ≡ mean), broadcast centroid table, one
    // corpus scan, per-vector argmax window.
    "x_domain_centroids" -> ((s, dir) =>
      Similarity.nearestCentroidConfusion(T(s, dir, "embeddings"),
          "vec_id", "embedding", "label")
        .orderBy(col("label"), col("assigned"))),

    "x_ann_lsh_topk" -> ((s, dir) =>
      Similarity.lshTopK(T(s, dir, "embeddings"), "vec_id", "embedding",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10, bits = 6, tables = 8)),

    // Multi-probe variant: the query also probes every Hamming-1
    // bucket (Lv et al.) — higher recall at the same index, extra cost
    // confined to the tiny query side.
    "x_ann_lsh_multiprobe" -> ((s, dir) =>
      Similarity.lshTopK(T(s, dir, "embeddings"), "vec_id", "embedding",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10, bits = 6, tables = 8,
        multiProbe = true)),

    // Query-DIRECTED probing (full Lv et al.): only the 2 flips with
    // the smallest |coordinate| margin per table — most of the
    // multi-probe recall at a third of its probe cost.
    "x_ann_lsh_directed" -> ((s, dir) =>
      Similarity.lshTopK(T(s, dir, "embeddings"), "vec_id", "embedding",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10, bits = 6, tables = 8,
        multiProbe = true, maxProbes = 2)),

    "x_ann_ivf_topk" -> ((s, dir) =>
      Similarity.ivfTopK(T(s, dir, "embeddings"), "vec_id", "embedding",
        centroidIds = (10L to 17L), queryIds = Seq(0L, 1L, 2L, 3L, 4L),
        k = 10)),

    "x_ann_ivf_probe2" -> ((s, dir) =>
      Similarity.ivfTopK(T(s, dir, "embeddings"), "vec_id", "embedding",
        centroidIds = (10L to 17L), queryIds = Seq(0L, 1L, 2L, 3L, 4L),
        k = 10, nprobe = 2)),

    "x_ann_pq_topk" -> ((s, dir) =>
      Similarity.pqTopK(T(s, dir, "embeddings"), "vec_id", "embedding",
        codebookIds = (20L to 35L), queryIds = Seq(0L, 1L, 2L, 3L, 4L),
        k = 10, m = 8)),

    "x_ann_ivfpq_topk" -> ((s, dir) =>
      Similarity.ivfpqTopK(T(s, dir, "embeddings"), "vec_id", "embedding",
        centroidIds = (10L to 17L), codebookIds = (20L to 35L),
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10, m = 8, nprobe = 2)),

    // Incremental IVF index maintenance (the x_cc_incremental
    // convention, round-10 verdict task #5): backfill vec_id < 250 as
    // segment 0 (centroids 10..17 live in that slice, so the fixed
    // centroid model equals the full-corpus one), append the rest as
    // segment 1 (only the batch is scanned/assigned/written), then
    // search the two-segment index at nprobe=2. The oracle is the
    // FULL-REBUILD assignment (x_ann_ivf_probe2's SQL): segment-merged
    // search must be bit-identical to rebuilding from scratch — the
    // 100 TB maintenance path, per-refresh cost ∝ batch.
    "x_ann_ivf_incremental" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_ivf_idx").toString
      try {
        Similarity.initIvfIndex(emb.filter(col("vec_id") < 250),
          "vec_id", "embedding", centroidIds = (10L to 17L), tmp)
        Similarity.appendIvfIndex(emb.filter(col("vec_id") >= 250),
          "vec_id", "embedding", tmp)
        Similarity.ivfTopKSegmented(
            emb.filter(col("vec_id").isin(0L, 1L, 2L, 3L, 4L)),
            "vec_id", "embedding", tmp, k = 10, nprobe = 2)
          .localCheckpoint(true)
      } finally deleteRecursively(tmp)
    }),

    // Sign random projection 64→8 (JL dimensionality reduction): exact
    // integer sums over the quantized vectors against a literal ±1
    // matrix — row-local, shuffle-free, no transcendental. Exploded to
    // (vec_id, dim, val) rows for the oracle hash.
    "x_rand_proj" -> ((s, dir) =>
      Similarity.randomProject(T(s, dir, "embeddings"), "vec_id",
          "embedding", inDim = 64, outDim = 8, seed = 0)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "val")))
        .orderBy(col("vec_id"), col("dim"))),

    // PCA step 1, the only corpus-sized pass: exact integer co-moment
    // sums over the quantized vectors (one shuffle of ≤ dim(dim+1)/2
    // groups after map-side combine — never a corpus self-join), with
    // the covariance as one IEEE expression over those exact integers.
    "x_pca_cov" -> ((s, dir) =>
      Pca.comoments(T(s, dir, "embeddings"), "embedding", dim = 64)
        .orderBy(col("i"), col("j"))),

    // Incremental PCA fit state: per-slice co-moment tables merged into
    // the global table (every cell an exact integer sum — the AggState
    // merge-exactness pattern). Same oracle as x_pca_cov: the merged
    // path must reproduce the one-pass table bit-for-bit, which IS the
    // 100 TB fit story (one pass per new shard, no history recompute).
    "x_pca_incremental" -> ((s, dir) => {
      val emb = T(s, dir, "embeddings")
      Pca.mergeComoments(
          Pca.comoments(emb.filter(col("vec_id") < 250), "embedding", 64)
            .unionByName(Pca.comoments(
              emb.filter(col("vec_id") >= 250), "embedding", 64)))
        .orderBy(col("i"), col("j"))
    }),

    // PCA end-to-end identity: fit (driver Jacobi on the collected
    // dim×dim model), project onto the FULL basis (row-local fused
    // double_dot against literal eigenvectors), and report projected
    // variance over the DATA-derived trace — an orthonormal basis
    // preserves total variance, so fit+project must yield 1.000000.
    "x_pca_var" -> ((s, dir) =>
      Pca.varianceRatio(T(s, dir, "embeddings"), "vec_id", "embedding",
        dim = 64)),

    // Matryoshka eval: recall@10 of truncated-dimension exact cosine
    // (first 8/16/32 dims) against the full 64-dim ranking — one
    // corpus scan fanned by a row-local dims explode, broadcast query
    // side, (d, query) windows; the recall join touches only rank
    // lists.
    "x_matryoshka_recall" -> ((s, dir) =>
      Similarity.truncatedRecall(T(s, dir, "embeddings"), "vec_id",
          "embedding", queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10,
          dims = Seq(8, 16, 32), fullDim = 64)
        .orderBy(col("query_id"), col("d"))),

    // ---- text analysis ------------------------------------------------

    // Character-trigram language-ID (v2): length/replace occurrence
    // arithmetic, zero explode — linguistic behavior pinned on real
    // sentences in ExtSpec; this oracle pins the scoring arithmetic.
    "x_text_langid2" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.langIdNgram(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),

    "x_text_langid" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("lang_pred"))
        .orderBy(col("doc_id"))),

    "x_text_quality" -> ((s, dir) =>
      TextAnalysis.qualityFeatures(
        T(s, dir, "documents").select("doc_id", "text"), "text")
        .drop("text").orderBy(col("doc_id"))),

    "x_text_tokens" -> ((s, dir) =>
      TextAnalysis.tokenCounts(
        T(s, dir, "documents").select("doc_id", "text"), "text")
        .drop("text").orderBy(col("doc_id"))),

    "x_text_fingerprint" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fingerprint"))
        .orderBy(col("doc_id"))),

    // Deterministic hash sampling + train/valid/test split: counts per
    // (lang, split) — reproducible on any engine/partitioning.
    "x_sample_split" -> ((s, dir) =>
      // independent seeds: with the same seed the sampled half would
      // land entirely inside the train bucket range
      Sampling.splitByHash(
        Sampling.hashSample(T(s, dir, "documents"), "doc_id", 0.5, seed = 0),
        "doc_id", Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1),
        seed = 1)
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"), col("split"))),

    // TF-IDF scores for a bounded doc subset (exact tf/df; idf rounded
    // to 6dp at the comparison boundary).
    "x_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidf(T(s, dir, "documents"), "doc_id", "text")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
          round(col("tfidf"), 6).as("tfidf"))
        .orderBy(col("doc_id"), col("token"))),

    // Feature hashing (the hashing trick): vocabulary-free 64-bucket
    // sparse vectors, signed-sum weights — the classifier vectorizer
    // with zero learned state. One explode + one group-by.
    "x_feature_hash" -> ((s, dir) =>
      TextAnalysis.hashFeatures(
          T(s, dir, "documents").filter(col("doc_id") < 200),
          "doc_id", "text", dim = 64, seed = 0)
        .orderBy(col("doc_id"), col("bucket"))),

    // BM25 top-10 lexical retrieval for 5 query docs: postings-join
    // candidate generation (cost ∝ query-term posting lists, never
    // corpus × queries), broadcast 1-row corpus stats, DECIMAL(28,9)
    // per-term sums for order-independent engine-exact scores.
    "x_bm25_topk" -> ((s, dir) =>
      Retrieval.bm25TopK(T(s, dir, "documents"), "doc_id", "text",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
        .orderBy(col("query_id"), col("rank"))),

    // BM25 through the PERSISTED bucket-partitioned inverted index:
    // identical answer to x_bm25_topk (shared scoring chain), but the
    // postings/dfreq scans carry static partition filters for the
    // query terms' buckets — the IO shape that makes retrieval cost
    // posting lists, not the corpus, at 100 TB. Index built into a
    // temp dir at query construction (the backfill path); same oracle
    // SQL as the in-memory form because the answer IS the same.
    "x_bm25_indexed" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_text_idx").toString
      try {
        Retrieval.saveTextIndex(docs, "doc_id", "text", tmp, nBuckets = 16)
        Retrieval.bm25TopKIndexed(
            docs.filter(col("doc_id").isin(0L, 1L, 2L, 3L, 4L)),
            "doc_id", "text", tmp, k = 10)
          .orderBy(col("query_id"), col("rank"))
          .localCheckpoint(true)
      } finally deleteRecursively(tmp)
    }),

    // Retrieval eval: per-query reciprocal rank of the first RELEVANT
    // hit in the BM25 top-10 (relevance = same source label as the
    // query doc — the standard weak-label eval when no judgments
    // exist). rr = 1/rank is one exact IEEE division; queries with no
    // relevant hit in the cutoff score 0. The mean of this column is
    // MRR@10; emitting per-query rows keeps the oracle row-exact and
    // the diagnosis per-query.
    "x_retrieval_mrr" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val results = Retrieval.bm25TopK(docs, "doc_id", "text",
        queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10)
      val lbl = docs.select(col("doc_id"), col("source"))
      val firstRel = results
        .join(lbl.select(col("doc_id").as("query_id"),
          col("source").as("qsrc")), Seq("query_id"))
        .join(lbl.select(col("doc_id").as("cand_id"),
          col("source").as("csrc")), Seq("cand_id"))
        .filter(col("qsrc") === col("csrc"))
        .groupBy(col("query_id")).agg(min(col("rank")).as("first_rel"))
      results.select(col("query_id")).distinct()
        .join(firstRel, Seq("query_id"), "left")
        .select(col("query_id"),
          coalesce(lit(1.0) / col("first_rel"), lit(0.0)).as("rr"))
        .orderBy(col("query_id"))
    }),

    // nDCG@10 over the BM25 ranking (weak same-source labels) — the
    // graded-ranking companion to x_retrieval_mrr: per-rank gains
    // discounted by log2(rank+1), ideal DCG from the corpus-level
    // relevant count capped at the cutoff. Each log2 term is pinned to
    // DECIMAL(28,9) before summation (the bm25 parity convention), the
    // final ratio is one IEEE division.
    "x_ndcg" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val qids = Seq(0L, 1L, 2L, 3L, 4L)
      val top = Retrieval.bm25TopK(docs, "doc_id", "text", qids, k = 10)
      val lbl = docs.select(col("doc_id"), col("source"))
      val rel = top
        .join(broadcast(lbl.select(col("doc_id").as("query_id"),
          col("source").as("qsrc"))), Seq("query_id"))
        .join(lbl.select(col("doc_id").as("cand_id"),
          col("source").as("csrc")), Seq("cand_id"))
        .withColumn("rel", (col("qsrc") === col("csrc")).cast("long"))
      val dcg = rel.withColumn("term",
          (col("rel").cast("double") /
            log2(col("rank").cast("double") + 1.0))
            .cast(DecimalType(28, 9)))
        .groupBy(col("query_id"))
        .agg(sum(col("term")).cast("double").as("dcg"),
          sum(col("rel")).as("n_rel_topk"))
      val srcN = lbl.groupBy(col("source")).agg(count(lit(1)).as("__n"))
      val r = lbl.filter(col("doc_id").isin(qids: _*))
        .join(broadcast(srcN), Seq("source"))
        .select(col("doc_id").as("query_id"), (col("__n") - 1).as("R"))
      dcg.join(broadcast(r), Seq("query_id"))
        .filter(col("R") > 0)
        .withColumn("idcg", expr(
          "cast(aggregate(sequence(1L, least(R, 10L)), " +
            "cast(0 as decimal(28,9)), (acc, i) -> cast(acc + " +
            "cast(1.0 / log2(cast(i as double) + 1.0) " +
            "as decimal(28,9)) as decimal(28,9))) as double)"))
        .select(col("query_id"), col("n_rel_topk"), col("dcg"),
          col("idcg"), (col("dcg") / col("idcg")).as("ndcg"))
        .orderBy(col("query_id"))
    }),

    // Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    // top-20 and the exact-cosine vector top-20 (embeddings keyed by the
    // same ids). The fusion is one full-outer join over two |q|·k rank
    // lists — it never touches the corpus again.
    "x_hybrid_rrf" -> ((s, dir) => {
      val lex = Retrieval.bm25TopK(T(s, dir, "documents"), "doc_id",
        "text", queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 20)
      val sem = Similarity.bruteForceTopK(T(s, dir, "embeddings"),
        "vec_id", "embedding", queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 20)
      Retrieval.rrfFuse(lex, sem, k = 10)
        .orderBy(col("query_id"), col("rank"))
    }),

    // Vocabulary construction: top tokens by corpus frequency with dense
    // ids (tokenizer-training id assignment).
    "x_vocab" -> ((s, dir) =>
      TextAnalysis.vocabulary(T(s, dir, "documents"), "text", minCount = 2)
        .orderBy(col("token_id"))),

    // Exact heavy hitters via Misra-Gries candidates + verification count:
    // pass 1 is map-only (≤ k candidate keys per task, no key-universe
    // shuffle), pass 2 counts candidates only. Result is provably exact
    // (candidate union ⊇ true heavy hitters), so a plain HAVING-threshold
    // group-by is the oracle.
    "x_heavy_hitters" -> ((s, dir) => {
      val toks = T(s, dir, "documents")
        .select(explode(split(lower(col("text")), " ")).as("token"))
      graft.agg.HeavyHitters.heavyHitters(toks, "token", k = 35)
        .withColumnRenamed("key", "token")
        .orderBy(col("token"))
    }),

    // Count-min sketch as relational state: build over the part-key
    // stream (4×256 counters), point-estimate a key set, join the exact
    // counts — never_under must hold for every key by construction.
    // The sketch table is deterministic (md5 row hashes), so the oracle
    // rebuilds it cell-for-cell.
    "x_cms" -> ((s, dir) => {
      import graft.agg.CountMin
      val li = T(s, dir, "lineitem")
      val sketch = CountMin.build(li, "l_partkey",
        depth = 4, width = 256, seed = 7)
      val keys = T(s, dir, "part").filter(col("p_partkey") < 30)
        .select(col("p_partkey").as("key"))
      val exact = li.filter(col("l_partkey") < 30)
        .groupBy(col("l_partkey").as("key"))
        .agg(count(lit(1)).as("__n_exact"))
      CountMin.estimate(sketch, keys, "key", depth = 4, width = 256,
          seed = 7)
        .join(exact, Seq("key"), "left")
        .select(col("key"), col("est"),
          coalesce(col("__n_exact"), lit(0L)).as("n_exact"),
          (col("est") >= coalesce(col("__n_exact"), lit(0L)))
            .as("never_under"))
        .orderBy(col("key"))
    }),

    // The incremental-rollup monoid state itself, oracle-checked: build
    // over one partition split, build over the complement, MERGE — must
    // equal a plain GROUP BY of the whole table (the identity that makes
    // refresh-from-new-files-only sound). DECIMAL accumulation keeps the
    // merge order-independent; doubles only at the output boundary.
    "x_rollup_state_merge" -> ((s, dir) => {
      import graft.agg.IncrementalRollup
      val li = T(s, dir, "lineitem")
      val dims = Seq("l_returnflag"); val ms = Seq("l_quantity", "l_extendedprice")
      val a = IncrementalRollup.build(li.filter(col("l_orderkey") % 2 === 0), dims, ms)
      val b = IncrementalRollup.build(li.filter(col("l_orderkey") % 2 =!= 0), dims, ms)
      IncrementalRollup.withAverages(
          IncrementalRollup.merge(a, b, dims, ms), ms)
        .select(col("l_returnflag"),
          col("l_quantity_sum").cast("double").as("qty_sum"),
          col("l_extendedprice_sum").cast("double").as("price_sum"),
          col("n_rows"),
          col("l_quantity_avg").as("qty_avg"))
        .orderBy(col("l_returnflag"))
    }),

    // Incremental JOIN-view maintenance (insert-only deltas): refresh
    // V = orders⋈lineitem from 20%-sized deltas via the bilinear delta
    // rule — the aggregate over the maintained view must equal the
    // plain full join (the oracle), proving the identity cross-engine.
    "x_ivm_join" -> ((s, dir) => {
      import graft.ops.Ivm
      val o = T(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"))
      val l = T(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_extendedprice"))
      val oOld = o.filter(col("k") % 5 =!= 0)
      val dO = o.filter(col("k") % 5 === 0)
      val lOld = l.filter(col("k") % 5 =!= 0)
      val dL = l.filter(col("k") % 5 === 0)
      Ivm.joinDelta(oOld.join(lOld, Seq("k")), oOld, dO, lOld, dL,
          Seq("k"))
        .groupBy(col("status"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast("double").as("revenue"))
        .orderBy(col("status"))
    }),

    // Per-GROUP exact heavy hitters in one pass + candidate recount: the
    // native Misra-Gries aggregate (TypedImperativeAggregate, O(k) state
    // per group per task, mergeable partials) proposes <= k candidates
    // per language; every token with true freq > N_lang/(k+1) is
    // guaranteed present, so recounting ONLY candidate rows (broadcast
    // semi-join, partial-agg) and filtering cnt*(k+1) > N_lang yields
    // the provably-exact per-group heavy set. Shuffled bytes: k counters
    // per group + candidate rows, never the token stream.
    "x_mg_heavy_per_group" -> ((s, dir) => {
      val k = 64
      val toks = T(s, dir, "documents")
        .select(col("lang"), explode(split(lower(col("text")), " "))
          .as("token"))
      // sketch AND per-group total from ONE aggregate pass; the only
      // other stream scan is the candidate recount (unavoidable - it
      // is what makes the answer exact)
      // |langs| rows of (sketch, total); referenced twice below, so a
      // lazy barrier stops Catalyst inlining the stream aggregate per
      // reference (the multi-reference materialization lesson)
      val sketched = toks.groupBy(col("lang"))
        .agg(graft.functions.native_fns.mg_sketch(col("token"), k).as("sk"),
          count(lit(1)).as("__total"))
        .localCheckpoint(false)
      val cands = sketched
        .select(col("lang"), explode(map_keys(col("sk"))).as("token"))
      val counts = toks
        .join(broadcast(cands), Seq("lang", "token"), "left_semi")
        .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("n"))
      val totals = sketched.select(col("lang"), col("__total"))
      counts.join(totals, Seq("lang"))
        .filter(col("n") * (k + 1) > col("__total"))
        .select(col("lang"), col("token"), col("n"))
        .orderBy(col("lang"), col("token"))
    }),

    // ---- multimodal (binary column plumbing; decode is stubbed) -------

    "x_mm_features" -> ((s, dir) =>
      T(s, dir, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("content"))
        .select(
          col("doc_id"),
          length(col("content")).as("n_bytes"),
          md5(col("content")).as("content_hash"),
          (length(col("content")) % 640 + 1).as("width"),
          (length(col("content")) % 480 + 1).as("height"),
          (length(col("content")) % 10 + 1).as("n_frames"))
        .orderBy(col("doc_id"))),

    // REAL decode path: each doc_id becomes an actual binary-PPM (P6)
    // image — deterministic dims/pixels so the oracle can predict them in
    // closed form — then width/height/pixel sums and the 4×4
    // nearest-neighbor resize are read back by PARSING the payload bytes
    // (Multimodal.PpmCodec), not from the generation parameters. Encode →
    // decode → featurize is one narrow mapPartitions chain over the scan:
    // no shuffle touches media bytes, matching the 100 TB plan.
    // (All 8 media queries:) the id projection is round-robin
    // repartitioned BEFORE the synth+decode mapPartitions: the source
    // is one input split here, so the whole codec stage ran on one
    // core (measured 1.6 s single-task for x_mm_gif_frames, r14
    // probe). The exchange ships 8-byte ids — the §8 rule: move the
    // lightweight proxy, decode the heavy bytes after, in parallel.
    // At 100 TB the media table has real splits and this exchange is
    // the same tiny id shuffle.
    "x_mm_decode" -> ((s, dir) => {
      import s.implicits._
      val media = T(s, dir, "documents").select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism).as[Long]
        .mapPartitions(_.map { id =>
          val w = (id % 31 + 2).toInt
          val h = (id % 17 + 2).toInt
          Multimodal.MediaRow(id, Multimodal.PpmCodec.Mime,
            Multimodal.PpmCodec.encode(w, h,
              i => ((id * 31 + i * 7) % 256).toInt))
        })
      media.mapPartitions(_.map { r =>
        val meta = Multimodal.PpmCodec.decodeImage(r)
        val small = Multimodal.PpmCodec.resize(r, 4, 4)
        (r.media_id, meta.width, meta.height,
          Multimodal.PpmCodec.pixelSum(r),
          Multimodal.PpmCodec.pixelSum(small))
      }).toDF("doc_id", "width", "height", "pixel_sum", "resized_sum")
        .orderBy(col("doc_id"))
    }),

    // REAL PNG decode path: each doc_id becomes an actual PNG payload —
    // truecolor depth-8, scanline filter CYCLING row % 5 so all five
    // unfilter branches (None/Sub/Up/Average/Paeth) sit on the
    // oracle-checked path (h ≥ 5 guarantees each appears) — then
    // width/height/pixel sum and the 4×4 nearest-neighbor resize
    // (re-encoded as PNG, decoded AGAIN) are read back by the pure-JDK
    // Inflater chunk-walk decoder, never from the generator parameters.
    // The oracle predicts the sums in closed form, so any decode error
    // (CRC, inflate, filter reversal) breaks the hash.
    "x_mm_png" -> ((s, dir) => {
      import s.implicits._
      val media = T(s, dir, "documents").select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism).as[Long]
        .mapPartitions(_.map { id =>
          val w = (id % 13 + 5).toInt
          val h = (id % 11 + 5).toInt
          Multimodal.MediaRow(id, Multimodal.PngCodec.Mime,
            Multimodal.PngCodec.encode(w, h,
              i => ((id * 37 + i * 11) % 256).toInt))
        })
      media.mapPartitions(_.map { r =>
        val meta = Multimodal.PngCodec.decodeImage(r)
        val small = Multimodal.PngCodec.resize(r, 4, 4)
        (r.media_id, meta.width, meta.height,
          Multimodal.PngCodec.pixelSum(r),
          Multimodal.PngCodec.pixelSum(small))
      }).toDF("doc_id", "width", "height", "pixel_sum", "resized_sum")
        .orderBy(col("doc_id"))
    }),

    // REAL JPEG decode path (JDK ImageIO — no new dependency): each
    // doc_id becomes an actual JPEG of a smooth grayscale gradient
    // (r=g=b = x·255/w — zero chroma, so 4:2:0 subsampling loses
    // nothing and only DCT quantization error remains). JPEG is LOSSY,
    // so the oracle can't replay pixels; per the x_approx_sketches
    // convention the Spark side grades its own decode against the
    // generator formula — exact dims plus two tolerance booleans (mean
    // abs deviation ≤ 2/byte, max deviation ≤ 8; measured ≤ 1 on this
    // gradient) — and the oracle re-derives dims and pins the booleans.
    // Encode → decode → grade is one narrow mapPartitions chain.
    "x_mm_jpeg" -> ((s, dir) => {
      import s.implicits._
      val media = T(s, dir, "documents").select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism).as[Long]
        .mapPartitions(_.map { id =>
          val w = (id % 13 + 8).toInt
          val h = (id % 11 + 8).toInt
          Multimodal.MediaRow(id, Multimodal.ImageIoCodec.JpegMime,
            Multimodal.ImageIoCodec.encode(w, h,
              i => (i / 3 % w).toInt * 255 / w,
              Multimodal.ImageIoCodec.JpegMime))
        })
      media.mapPartitions(_.map { r =>
        val (w, h, _, rgb) = Multimodal.ImageIoCodec.decodeRgb(r.content)
        var sumDev = 0L; var maxDev = 0
        var i = 0
        while (i < rgb.length) {
          val expected = (i / 3 % w) * 255 / w
          val d = math.abs((rgb(i) & 0xff) - expected)
          sumDev += d; if (d > maxDev) maxDev = d
          i += 1
        }
        (r.media_id, w, h, sumDev <= 2L * rgb.length, maxDev <= 8)
      }).toDF("doc_id", "width", "height", "sum_ok", "maxdev_ok")
        .orderBy(col("doc_id"))
    }),

    // REAL BMP + GIF decode paths (JDK ImageIO), EXACT oracle: both
    // containers round-trip losslessly for the rasters used here (BMP
    // for any RGB raster; GIF because the grayscale raster has ≤256
    // distinct colors, so the palette covers it — both pinned in
    // MultimodalSpec), so unlike JPEG the oracle predicts full and
    // resized pixel sums in closed form, x_mm_png style: any decode
    // error in the JDK plumbing (or in our raster conversion) breaks
    // the hash. Even docs carry BMP with a rich RGB formula; odd docs
    // carry grayscale GIF. The 5×5 resize re-encodes in the SAME
    // container and decodes AGAIN, so the write path is on the checked
    // path too. Heights stay ≥ 5 everywhere (including the resize
    // target): the JDK GIF writer's palette heuristic quantizes
    // height-4 rasters to a web palette (measured: every h=4 GIF came
    // back lossy, every h≥5 one exact), which would silently break the
    // exact-sum contract.
    "x_mm_imageio" -> ((s, dir) => {
      import s.implicits._
      val media = T(s, dir, "documents").select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism).as[Long]
        .mapPartitions(_.map { id =>
          val w = (id % 9 + 4).toInt
          val h = (id % 7 + 5).toInt
          val mime = if (id % 2 == 0) Multimodal.ImageIoCodec.BmpMime
            else Multimodal.ImageIoCodec.GifMime
          val px: Int => Int =
            if (id % 2 == 0) i => ((id * 31 + i * 7) % 256).toInt
            else i => ((id * 29 + (i / 3) * 13) % 256).toInt
          Multimodal.MediaRow(id, mime,
            Multimodal.ImageIoCodec.encode(w, h, px, mime))
        })
      media.mapPartitions(_.map { r =>
        val meta = Multimodal.ImageIoCodec.decodeImage(r)
        val small = Multimodal.ImageIoCodec.resize(r, 5, 5)
        (r.media_id, r.mime, meta.width, meta.height,
          Multimodal.ImageIoCodec.pixelSum(r),
          Multimodal.ImageIoCodec.pixelSum(small))
      }).toDF("doc_id", "mime", "width", "height", "pixel_sum",
          "resized_sum")
        .orderBy(col("doc_id"))
    }),

    // REAL multi-frame video decode: each doc_id becomes an actual
    // ANIMATED GIF (the one genuine multi-frame container the JDK
    // decodes offline), frames full-size grayscale (≤256 colors →
    // lossless palette; h ≥ 5 avoids the measured JDK h=4 palette
    // quirk, the x_mm_imageio note). frameStats decodes EVERY stored
    // frame through the JDK multi-frame reader AND cross-checks the
    // frame count against the independent container block walk
    // (gifFrameOffsets), so both the pixel path and the structure path
    // sit on the oracle-checked path. One row per frame with exact
    // per-frame pixel sums the oracle re-derives in closed form — this
    // retires the byte-stride stub for the video mime.
    "x_mm_gif_frames" -> ((s, dir) => {
      import s.implicits._
      val media = T(s, dir, "documents").select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism).as[Long]
        .mapPartitions(_.map { id =>
          val n = (id % 4 + 2).toInt
          val w = (id % 9 + 4).toInt
          val h = (id % 7 + 5).toInt
          Multimodal.MediaRow(id, Multimodal.ImageIoCodec.GifMime,
            Multimodal.ImageIoCodec.encodeGifAnimation(w, h, n,
              k => i => ((id * 29 + k * 17 + (i / 3) * 13) % 256).toInt))
        })
      Multimodal.frameStats(media).toDF()
        .select(col("media_id").as("doc_id"), col("frame_idx"),
          col("width"), col("height"), col("pixel_sum"))
        .orderBy(col("doc_id"), col("frame_idx"))
    }),

    // Concatenated-P6 "video": frame count and sizes come from walking
    // the real headers (PpmCodec.frames), then cross-checked against the
    // oracle's closed-form header lengths.
    "x_mm_frames" -> ((s, dir) => {
      import s.implicits._
      val media = T(s, dir, "documents").select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism).as[Long]
        .mapPartitions(_.map { id =>
          val n = (id % 5 + 1).toInt
          val w = (id % 7 + 2).toInt
          val h = (id % 5 + 2).toInt
          val frame = Multimodal.PpmCodec.encode(w, h,
            i => ((id + i) % 256).toInt)
          val buf = new Array[Byte](frame.length * n)
          var k = 0
          while (k < n) {
            System.arraycopy(frame, 0, buf, k * frame.length, frame.length)
            k += 1
          }
          Multimodal.MediaRow(id, Multimodal.PpmCodec.Mime, buf)
        })
      media.mapPartitions(_.map { r =>
        val fs = Multimodal.PpmCodec.frames(r).toArray
        val frameBytes =
          if (fs.length > 1) fs(1).offset_bytes else r.content.length.toLong
        (r.media_id, fs.length, frameBytes, r.content.length.toLong)
      }).toDF("doc_id", "n_frames", "frame_bytes", "total_bytes")
        .orderBy(col("doc_id"))
    }),

    // Perceptual image dedup: every doc gets a real P6 payload from one
    // of 50 patterns (odd ids carry a one-pixel edit), the REAL decode
    // path computes the 64-bit average-hash (8x8 nearest-neighbor
    // luminance vs integer mean — no division, bit-portable), and
    // near-duplicate hash pairs come from the 4x16-bit band equi-join
    // (pigeonhole-lossless to Hamming 3) + popcount verify. The oracle
    // re-derives every hash in closed-form integer arithmetic from the
    // generator formula and replays the identical band join.
    "x_mm_phash" -> ((s, dir) => {
      import s.implicits._
      // NO pre-decode repartition here (unlike the other media
      // queries): the hash table is checkpointed below, so decode cost
      // sits outside the steady-state path and widening the checkpoint
      // only slowed the band join (r14: +0.37 s in-suite, reverted)
      val media = T(s, dir, "documents").select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val seed = (id % 50).toInt
          // block parity, NOT id parity: id%50 and id%2 are correlated
          // (50 is even), which would give every seed a single variant
          val noisy = ((id / 50) % 2).toInt
          // dims >= 9 so the edited pixel (0,0) downsamples to exactly
          // one of the 64 cells — the edit stays within Hamming ~1
          val w = seed % 13 + 9
          val h = seed % 11 + 9
          Multimodal.MediaRow(id, Multimodal.PpmCodec.Mime,
            Multimodal.PpmCodec.encode(w, h, i =>
              if (noisy == 1 && i == 2) 255 else (seed * 31 + i * 7) % 256))
        })
      // hash table feeds both the dup groups and the pair join — lazy
      // barrier so decode+hash runs once
      val hashes = Multimodal.imageHashes(media).localCheckpoint(false)
      val groups = hashes.groupBy(col("ahash"))
        .agg(count(lit(1)).as("n_images"), min(col("media_id")).as("min_doc"))
      Multimodal.hashNearDupPairs(hashes, maxHamming = 3)
        .join(groups.select(col("ahash").as("ahash_a"),
          col("n_images").as("n_a")), Seq("ahash_a"))
        .join(groups.select(col("ahash").as("ahash_b"),
          col("n_images").as("n_b")), Seq("ahash_b"))
        .select(col("ahash_a"), col("ahash_b"), col("hamming"),
          col("n_a"), col("n_b"))
        .orderBy(col("ahash_a"), col("ahash_b"))
    }),

    // Real AUDIO decode: each doc_id becomes an actual RIFF/WAVE 16-bit
    // PCM payload (deterministic samples), and everything reported —
    // rate/channels/sample count from the fmt/data chunk walk, abs-sum /
    // max-amplitude / zero-crossings from the decoded samples — is read
    // back by parsing the bytes. Same narrow no-shuffle shape as
    // x_mm_decode.
    "x_wav_decode" -> ((s, dir) => {
      import s.implicits._
      val media = T(s, dir, "documents").select(col("doc_id"))
        .repartition(s.sparkContext.defaultParallelism).as[Long]
        .mapPartitions(_.map { id =>
          val sr = (8000 + (id % 3) * 4000).toInt
          val ch = (id % 2 + 1).toInt
          val n = (id % 50 + 20).toInt
          Multimodal.MediaRow(id, Multimodal.WavCodec.Mime,
            Multimodal.WavCodec.encode(sr, ch, n,
              i => ((id * 7 + i * 13) % 4096 - 2048).toInt))
        })
      media.mapPartitions(_.map { r =>
        val m = Multimodal.WavCodec.decodeAudio(r)
        val (absSum, maxAbs, zc) = Multimodal.WavCodec.signalStats(r)
        (r.media_id, m.sample_rate, m.channels, m.n_samples,
          absSum, maxAbs, zc)
      }).toDF("doc_id", "sample_rate", "channels", "n_samples",
        "abs_sum", "max_abs", "zero_crossings")
        .orderBy(col("doc_id"))
    }),

    // ---- joins (beyond-reference; broadcast + semi/anti) --------------

    "x_join_broadcast" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val n = T(s, dir, "nation")
      val o = T(s, dir, "orders")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
          .as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    }),

    "x_join_semi_anti" -> ((s, dir) => {
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
      val withOrders = c.join(o, Seq("c_custkey"), "left_semi")
        .agg(count(lit(1)).as("n"))
        .select(col("n").as("n_with_orders"))
      val withoutOrders = c.join(o, Seq("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n"))
        .select(col("n").as("n_without_orders"))
      withOrders.crossJoin(withoutOrders)
    }),

    // Bloom-pruned semi join: distributed filter build over the dim keys,
    // codegen'd probe inside the fact scan (rows definitely-absent never
    // reach the shuffle), exact semi-join verify over the survivors —
    // result must equal the plain semi join (oracle).
    "x_bloom_join" -> ((s, dir) => {
      val fact = T(s, dir, "lineitem")
      val dim = T(s, dir, "supplier").filter(col("s_nationkey") < 5)
      graft.ops.BloomJoin.bloomSemiJoin(fact, dim, "l_suppkey", "s_suppkey",
          estimatedItems = 1 << 14)
        .groupBy(col("l_returnflag"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("l_returnflag"))
    }),

    // Daily gap-fill per series key: per-key spine (sequence/explode
    // inside the group), zero-filled counts, forward-filled revenue.
    "x_gap_fill" -> ((s, dir) => {
      val daily = T(s, dir, "orders")
        .groupBy(col("o_orderstatus").as("status"),
          col("o_orderdate").as("day"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
            .as("revenue"))
      graft.ops.GapFill.fillDaily(daily, Seq("status"), "day",
          zeroFill = Seq("n"), forwardFill = Seq("revenue"))
        .orderBy(col("status"), col("day"))
    }),

    // Series anomaly flags composing gap-fill: zero-filled daily revenue
    // per status, exact decimal moments (Σx, Σx² — variance is a pure
    // function of exact sums, so z is engine-deterministic), |z| > 2.
    "x_anomaly" -> ((s, dir) => {
      val daily = T(s, dir, "orders")
        .groupBy(col("o_orderstatus").as("status"),
          col("o_orderdate").as("day"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("revenue"))
      val filled = graft.ops.GapFill.fillDaily(daily, Seq("status"), "day",
        zeroFill = Seq("revenue"), forwardFill = Seq.empty)
      val moments = filled.groupBy(col("status")).agg(
        count(lit(1)).as("nd"),
        sum(col("revenue").cast(DecimalType(18, 2))).as("s1"),
        sum(col("revenue").cast(DecimalType(18, 2)) *
          col("revenue").cast(DecimalType(18, 2))).as("s2"))
      filled.join(moments, Seq("status"))
        .withColumn("mean",
          col("s1").cast("double") / col("nd").cast("double"))
        .withColumn("z",
          (col("revenue") - col("mean")) /
            sqrt(col("s2").cast("double") / col("nd").cast("double") -
              col("mean") * col("mean")))
        .filter(abs(col("z")) > 2)
        .select(col("status"), col("day"), col("revenue"),
          round(col("z"), 6).as("z"))
        .orderBy(col("status"), col("day"))
    }),

    // Holt linear-trend smoothing — the sequential per-key recurrence
    // class (each output depends on the previous OUTPUT, inexpressible
    // as a window): per-status daily revenue folded through the
    // level/trend recurrence by the higher-order `aggregate` (one
    // shuffle to gather each series, one row-local fold, no iterative
    // jobs). Dyadic α/β and in-order IEEE ops make every smoothed value
    // bit-identical to the oracle's recursive CTE.
    "x_holt_smooth" -> ((s, dir) => {
      val daily = T(s, dir, "orders")
        .groupBy(col("o_orderstatus").as("status"),
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
            .as("day"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("revenue"))
      graft.ext.Forecast.holtLinear(daily, Seq("status"), "day",
          "revenue", alpha = 0.5, beta = 0.25)
        .orderBy(col("status"), col("day"))
    }),

    // Holt-Winters additive seasonal smoothing (weekly period) — the
    // O(m)-state member of the recurrence family: level + trend + a
    // 7-slot seasonal ring, zero-seeded, stepped by the same
    // secondary-sort scan. The oracle's recursive CTE carries the ring
    // as a LIST and applies identical in-order IEEE arithmetic, so all
    // four emitted components hash-match bit-exactly.
    "x_holt_winters" -> ((s, dir) => {
      val daily = T(s, dir, "orders")
        .groupBy(col("o_orderstatus").as("status"),
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
            .as("day"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("revenue"))
      graft.ext.Forecast.holtWinters(daily, Seq("status"), "day",
          "revenue", m = 7, alpha = 0.5, beta = 0.25, gamma = 0.25)
        .orderBy(col("status"), col("day"))
    }),

    // ACF of daily revenue per status at lags 1..7 — the diagnostic
    // that says which forecasting tool fits. 9dp-pinned product terms
    // in exact decimal sums, 6dp ratios.
    "x_autocorr" -> ((s, dir) => {
      val daily = T(s, dir, "orders")
        .groupBy(col("o_orderstatus").as("status"),
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
            .as("day"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("revenue"))
      graft.ext.Forecast.autocorrelation(daily, Seq("status"), "day",
          "revenue", maxLag = 7)
        .orderBy(col("status"), col("lag"))
    }),

    // Jackknife SE of the mean price per return flag: leave-one-out
    // means are row-local once the exact decimal sum broadcasts back —
    // the assumption-free error bar with no replicate fan-out.
    "x_jackknife" -> ((s, dir) =>
      graft.agg.Robust.jackknifeSE(T(s, dir, "lineitem"),
          "l_returnflag", "l_extendedprice")
        .orderBy(col("l_returnflag"))),

    // Isotonic regression (PAV) of per-user daily spend: the least-
    // squares monotone fit — calibration-map machinery on the same
    // secondary-sort scan, but with retroactive pooling (per-key
    // buffering, not O(1) state). All merge DECISIONS are exact Long
    // cross-products over cent-quantized values; the oracle re-derives
    // the fit from PAV's minimax characterization
    // fit_i = max_{j≤i} min_{k≥i} mean(y_j..y_k) in O(n³) SQL —
    // monotone rounding makes the double max/min equal the rounded
    // exact optimum, so the match is bit-exact.
    "x_isotonic" -> ((s, dir) => {
      val daily = Events.loadEvents(s, dir)
        .filter(col("user_id") < 12)
        .groupBy(col("user_id"), expr("ts_sec div 86400").as("day"))
        .agg(sum(col("value").cast(DecimalType(18, 2)))
          .cast("double").as("dval"))
      graft.ext.Forecast.isotonic(daily, Seq("user_id"), "day", "dval",
          scale = 100L)
        .orderBy(col("user_id"), col("day"))
    }),

    // Isotonic CALIBRATION of the quality-classifier score: per distinct
    // score, positive rate weighted by group size, monotone-fitted by
    // weighted PAV — the calibration map (Zadrozny & Elkan) that
    // x_calibration's fixed bins approximate. The distinct-score domain
    // is bounded (≤1001 integer scores), so the single-key scan is a
    // codebook-sized series, the same argument as the AUC bucketing.
    "x_calib_iso" -> ((s, dir) => {
      val grouped = scoreFrame(T(s, dir, "documents"))
        .groupBy(col("s"))
        .agg(count(lit(1)).as("n"), sum(col("y")).cast("long").as("pos"))
        .withColumn("rate",
          col("pos").cast("double") / col("n").cast("double"))
        .withColumn("grp", lit(1))
      graft.ext.Forecast.isotonicWeighted(grouped, Seq("grp"), "s",
          "rate", "n", scale = 1000000L)
        .select(col("s"), col("rate"), col("weight"), col("iso_fit"))
        .orderBy(col("s"))
    }),

    // CUSUM changepoint detection — the drift a mean-shift hides from
    // per-day z-scores: per-status daily revenue against the series'
    // own mean (DECIMAL-derived, order-free), slack and threshold as
    // dyadic fractions of it, recurrence via the same secondary-sort
    // scan as x_holt_smooth. Alarmed days only, plus the one-sided
    // statistics themselves.
    "x_cusum" -> ((s, dir) => {
      val daily = T(s, dir, "orders")
        .groupBy(col("o_orderstatus").as("status"),
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
            .as("day"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .as("total_dec"))
        .withColumn("revenue", col("total_dec").cast("double"))
      val stats = daily.groupBy(col("status"))
        .agg((sum(col("total_dec")).cast("double") /
          count(lit(1))).as("target"))
      val withParams = daily.join(broadcast(stats), Seq("status"))
        .withColumn("slack", col("target") * lit(0.0625))
        .withColumn("h", col("target") * lit(0.5))
      graft.ext.Forecast.cusum(withParams, Seq("status"), "day",
          "revenue", "target", "slack", "h")
        .filter(col("alarm"))
        .orderBy(col("status"), col("day"))
    }),

    // ---- grouping sets / percentiles (beyond-reference OLAP breadth) --

    "x_rollup" -> ((s, dir) =>
      T(s, dir, "orders")
        .rollup(year(col("o_orderdate")).as("year"), col("o_orderstatus"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
          .as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("year").asc_nulls_first,
          col("o_orderstatus").asc_nulls_first)),

    // JSON extraction over the events.props payload column, then a
    // grouped aggregate on the parsed value — scan-local parse, one
    // shuffle.
    "x_json_extract" -> ((s, dir) =>
      Events.loadEvents(s, dir)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").try_cast("int").as("k"))
        .groupBy(col("event_type"), (col("k") % 10).as("k_mod"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"))
        .orderBy(col("event_type"), col("k_mod"))),

    // Set operations (distinct semantics on both engines).
    "x_set_ops" -> ((s, dir) => {
      val orderCusts = T(s, dir, "orders").select(col("o_custkey").as("k"))
      val custs = T(s, dir, "customer").select(col("c_custkey").as("k"))
      val both = orderCusts.intersect(custs).agg(count(lit(1)).as("n"))
        .select(col("n").as("n_intersect"))
      val onlyCust = custs.except(orderCusts).agg(count(lit(1)).as("n"))
        .select(col("n").as("n_except"))
      both.crossJoin(onlyCust)
    }),

    "x_cube" -> ((s, dir) =>
      T(s, dir, "customer")
        .cube(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double")
            .as("total_bal"))
        .orderBy(col("c_mktsegment").asc_nulls_first,
          col("c_nationkey").asc_nulls_first)),

    "x_string_funcs" -> ((s, dir) =>
      T(s, dir, "part").select(
        col("p_partkey"),
        concat_ws("|", col("p_brand"), col("p_type")).as("joined"),
        substring(col("p_name"), 1, 10).as("prefix10"),
        levenshtein(col("p_brand"), col("p_type")).as("edit_dist"),
        lpad(col("p_brand"), 12, ".").as("padded"),
        reverse(col("p_brand")).as("reversed"),
        locate("a", col("p_name")).as("first_a"))
        .orderBy(col("p_partkey"))),

    "x_datetime" -> ((s, dir) =>
      T(s, dir, "orders").select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        quarter(col("o_orderdate")).as("q"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
        unix_timestamp(date_trunc("month", col("o_orderdate")))
          .as("month_start_epoch"))
        .orderBy(col("o_orderkey"))),

    "x_percentiles" -> ((s, dir) =>
      T(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("p50"),
          expr("percentile(o_totalprice, 0.9)").as("p90"))
        .orderBy(col("o_orderstatus"))),

    // ---- window functions ---------------------------------------------

    "x_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      T(s, dir, "orders").select(
        col("o_orderkey"), col("o_custkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
          .cast("double").as("running_total"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Window-function breadth beyond the running sum: lag/lead, gaps
    // (rank vs dense_rank), ntile, cume_dist — one key-partitioned
    // window, no global sort.
    "x_window_suite" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_totalprice"),
          lag(col("o_totalprice"), 1).over(w).as("prev_price"),
          lead(col("o_totalprice"), 1).over(w).as("next_price"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"),
          ntile(4).over(w).as("quartile"),
          cume_dist().over(w).as("cdist"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Array-function breadth over the token arrays: sizes, sorted
    // distinct join, sorted extremes, overlap/intersection with a
    // constant keyword list — all row-local, zero shuffle.
    "x_array_funcs" -> ((s, dir) => {
      val kw = array(lit("data"), lit("query"), lit("table"))
      T(s, dir, "documents")
        .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
        .select(col("doc_id"),
          size(col("toks")).as("n_toks"),
          size(array_distinct(col("toks"))).as("n_distinct"),
          concat_ws(" ", array_sort(array_distinct(col("toks"))))
            .as("sorted_vocab"),
          element_at(array_sort(col("toks")), 1).as("first_tok"),
          element_at(array_sort(col("toks")), -1).as("last_tok"),
          arrays_overlap(col("toks"),
            array(lit("data"), lit("query"))).as("has_kw"),
          size(array_intersect(array_distinct(col("toks")), kw))
            .as("n_kw"))
        .orderBy(col("doc_id"))
    }),

    // Higher-order functions over a MATERIALIZED token array (the round-1
    // lesson: HOF lambdas sit outside codegen CSE, so the array a lambda
    // reads must be an attribute, never an inline expression):
    // transform/aggregate/filter/exists/forall, oracle re-derived
    // relationally from exploded tokens.
    "x_hof_funcs" -> ((s, dir) =>
      T(s, dir, "documents")
        .filter(col("doc_id") < 200)
        .select(col("doc_id"), split(lower(col("text")), " ").as("toks"))
        .select(col("doc_id"),
          aggregate(transform(col("toks"), t => length(t)), lit(0),
            (acc, x) => acc + x).as("sum_len"),
          size(filter(col("toks"), t => length(t) > 4)).as("n_long"),
          array_max(transform(col("toks"), t => length(t))).as("max_len"),
          exists(col("toks"), t => length(t) > 7).cast("int").as("has_long"),
          forall(col("toks"), t => length(t) > 0).cast("int")
            .as("all_nonempty"))
        .orderBy(col("doc_id"))),

    // Map column functions: construct (map_from_arrays), read
    // (element_at, size), and relationalize (explode) — all row-local,
    // zero shuffle before the presentation sort.
    "x_map_funcs" -> ((s, dir) =>
      Events.loadEvents(s, dir)
        .filter(col("event_id") < 100)
        .select(col("event_id"),
          map_from_arrays(
            array(lit("etype"), lit("k")),
            array(col("event_type"),
              get_json_object(col("props"), "$.k"))).as("m"))
        .select(col("event_id"),
          size(col("m")).as("n_keys"),
          element_at(col("m"), lit("etype")).as("etype2"),
          explode(col("m")))
        .orderBy(col("event_id"), col("key"))),

    // posexplode: token stream with ordinal positions — the
    // lateral-view shape; order is derived from the array, not from row
    // order, so it is partitioning-invariant.
    "x_explode_pos" -> ((s, dir) =>
      T(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(split(lower(col("text")), " ")))
        .select(col("doc_id"), col("pos"), col("col").as("token"))
        .orderBy(col("doc_id"), col("pos"))),

    // Typed UDAF (custom Aggregator via functions.udaf): quantity-
    // weighted mean price per return flag, integer-exact buffer.
    "x_typed_wavg" -> ((s, dir) => {
      val wm = udaf(graft.functions.TypedAggs.WeightedMean)
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(wm(col("l_extendedprice"), col("l_quantity"))
          .as("wavg_price"),
          count(lit(1)).as("n_items"))
        .orderBy(col("l_returnflag"))
    }),

    // Frame-based window aggregates: trailing moving average (3
    // preceding..current) and a centered min/max band — the sliding
    // analytics shape; frames bound state per row, key-partitioned.
    "x_window_frames" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val trailing = w.rowsBetween(-3, Window.currentRow)
      val centered = w.rowsBetween(-1, 1)
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          (sum(col("o_totalprice").cast(DecimalType(18, 2))).over(trailing)
            .cast("double") /
            count(lit(1)).over(trailing).cast("double")).as("trail_avg"),
          min(col("o_totalprice")).over(centered).as("band_lo"),
          max(col("o_totalprice")).over(centered).as("band_hi"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // Multi-aggregate pivot: explicit value list (no distinct pre-job),
    // two measures per pivot value — the general R2 form.
    "x_pivot_multi" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .withColumn("year", year(col("l_shipdate")).cast("int"))
        .groupBy(col("year"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
          .as("qty"),
          count(lit(1)).as("n"))
        .orderBy(col("year"))),

    // RANGE window frames: the value-distance frame mode (ROWS frames
    // are x_window_frames) — peers enter the frame by order-key
    // distance, not position.
    "x_window_range" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-30L * 86400, 0L) // trailing 30 days (NTZ→epoch
        // via timestamp cast; session tz is pinned UTC)
      T(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("timestamp").cast("long").as("odate"),
          count(lit(1)).over(w).as("n_30d"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(w)
            .cast("double").as("rev_30d"))
        .orderBy(col("o_custkey"), col("odate"), col("o_orderkey"))
    }),

    // NULL semantics parity: null-safe equality, coalesce/nullif,
    // null-aware aggregation counts, and grouping with null keys.
    "x_null_semantics" -> ((s, dir) => {
      val e = Events.loadEvents(s, dir)
        .select(col("event_id"),
          when(col("event_id") % 7 === 0, lit(null).cast("string"))
            .otherwise(col("event_type")).as("etype"),
          when(col("event_id") % 5 === 0, lit(null).cast("double"))
            .otherwise(col("value")).as("val"))
      e.groupBy(col("etype"))
        .agg(count(lit(1)).as("n_rows"),
          count(col("val")).as("n_vals"),
          sum(col("val").cast(DecimalType(18, 2))).cast("double")
            .as("val_sum"),
          count(when(col("etype").eqNullSafe(lit(null).cast("string")),
            1)).as("n_nullsafe_hits"),
          count(when(nullif(col("etype"), lit("click")).isNull &&
            col("etype").isNotNull, 1)).as("n_clicks_via_nullif"))
        .orderBy(col("etype").asc_nulls_first)
    }),

    // Classic 3-table analytics (TPC-H Q3 shape): join reordering +
    // broadcastable dimension + grouped decimal revenue + top-k.
    "x_mjoin_revenue" -> ((s, dir) => {
      val c = T(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = T(s, dir, "orders")
      val l = T(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    }),

    // 5-way star join (TPC-H Q5 shape): region→nation→customer +
    // orders + lineitem, revenue per nation.
    "x_mjoin_star" -> ((s, dir) => {
      val r = T(s, dir, "region").filter(col("r_name") === "ASIA")
      val n = T(s, dir, "nation")
      val c = T(s, dir, "customer")
      val o = T(s, dir, "orders")
      val l = T(s, dir, "lineitem")
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n.join(broadcast(r),
          col("n_regionkey") === col("r_regionkey"))),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast(DecimalType(18, 4))).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // ---- SQL surface: subqueries, grouping sets --------------------------
    // These run through spark.sql over temp views — the SQL entry point is
    // part of the engine's public surface, and subqueries exercise
    // Catalyst's decorrelation (RewritePredicateSubquery → semi/anti join,
    // scalar subquery → aggregate + join), which the DataFrame queries
    // never touch.

    // Correlated scalar subquery (per-nation average) + nested
    // uncorrelated IN chain. Decorrelates to one aggregate join — no
    // per-row re-execution.
    "x_subq_scalar" -> ((s, dir) => {
      T(s, dir, "customer").createOrReplaceTempView("customer")
      T(s, dir, "nation").createOrReplaceTempView("nation")
      T(s, dir, "region").createOrReplaceTempView("region")
      s.sql("""
        SELECT c.c_nationkey, COUNT(*) AS n_above_avg
        FROM customer c
        WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
          AND c.c_nationkey IN (SELECT n_nationkey FROM nation
                                WHERE n_regionkey IN (SELECT r_regionkey
                                  FROM region WHERE r_name <> 'EUROPE'))
        GROUP BY c.c_nationkey
        ORDER BY c.c_nationkey""")
    }),

    // EXISTS and NOT EXISTS legs of the same correlated predicate —
    // planned as left-semi and left-anti hash joins respectively.
    "x_subq_exists" -> ((s, dir) => {
      T(s, dir, "customer").createOrReplaceTempView("customer")
      T(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""
        SELECT 'active' AS grp, c_nationkey, COUNT(*) AS n
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 50000)
        GROUP BY c_nationkey
        UNION ALL
        SELECT 'inactive' AS grp, c_nationkey, COUNT(*) AS n
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_nationkey
        ORDER BY grp, c_nationkey""")
    }),

    // Correlated LATERAL subquery with ORDER BY + LIMIT (top-k per
    // outer row) — Catalyst decorrelates it; the SQL-surface twin of
    // the DataFrame-side TopKPerKey operator.
    "x_lateral_topk" -> ((s, dir) => {
      T(s, dir, "region").createOrReplaceTempView("region")
      T(s, dir, "nation").createOrReplaceTempView("nation")
      T(s, dir, "customer").createOrReplaceTempView("customer")
      s.sql("""
        SELECT r.r_name, t.n_name, t.n_customers
        FROM region r, LATERAL (
          SELECT n.n_name, COUNT(*) AS n_customers
          FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
          WHERE n.n_regionkey = r.r_regionkey
          GROUP BY n.n_name
          ORDER BY n_customers DESC, n.n_name
          LIMIT 2) t
        ORDER BY r.r_name, t.n_customers DESC, t.n_name""")
    }),

    // Explicit GROUPING SETS with grouping() indicator columns — the
    // general form behind rollup/cube (x_rollup/x_cube), one shuffle of
    // the expanded grouping-id keys.
    "x_grouping_sets" -> ((s, dir) => {
      T(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""
        SELECT yr, o_orderstatus,
          CAST(GROUPING(yr) AS INTEGER) AS g_yr,
          CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_st,
          CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
          COUNT(*) AS n_orders
        FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
                     o_orderstatus, o_totalprice FROM orders)
        GROUP BY GROUPING SETS ((yr, o_orderstatus), (yr), (o_orderstatus), ())
        ORDER BY g_yr, g_st, yr NULLS FIRST, o_orderstatus NULLS FIRST""")
    }),

    // Full Pearson correlation matrix of four lineitem numerics in
    // ONE scan: a single aggregate carries all per-column and cross
    // DECIMAL moments (order-free — the built-in corr's float
    // recurrences are not layout-stable), the matrix unfolds from the
    // checkpointed 1-row moment table. The EDA opener over a wide
    // fact table priced at exactly one pass.
    "x_corr_matrix" -> ((s, dir) =>
      graft.agg.Robust.corrMatrix(T(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        .orderBy(col("col_a"), col("col_b"))),

    // Pareto / ABC revenue concentration: "how many parts hold 50 /
    // 80 / 90 / 95 / 99 % of revenue" — rank AND inclusive cumulative
    // revenue both from the two-phase bucketed machinery
    // (Ranks.rowNumberDesc + cumSumDesc), so the classic
    // sort-and-running-total readout carries NO single-partition sort
    // of the |parts|-sized table; DECIMAL cum sums, 9dp-pinned shares.
    "x_pareto" -> ((s, dir) => {
      val rev = T(s, dir, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
          .as("rev"))
        .localCheckpoint(false) // ranked + cum passes + the total
      val total = rev.agg(sum(col("rev")).as("__t"))
      val ranked = graft.ops.Ranks.rowNumberDesc(
        graft.ops.Ranks.cumSumDesc(rev, "rev", "l_partkey", "rev",
          out = "cum"),
        "rev", "l_partkey")
      ranked.crossJoin(broadcast(total))
        .select(col("__rank").as("rank"),
          round(col("cum").cast("double") / col("__t").cast("double"),
            9).as("share"))
        .select(col("rank"), col("share"),
          explode(array(Seq(0.5, 0.8, 0.9, 0.95, 0.99).map(lit): _*))
            .as("threshold"))
        .filter(col("share") >= col("threshold"))
        .groupBy(col("threshold"))
        .agg(min(col("rank")).as("n_parts"),
          min_by(col("share"), col("rank")).as("share_at"))
        .orderBy(col("threshold"))
    }),

    // Incremental CORRELATION maintenance — the cross-moment fourth
    // tier of AggState (sums/HLL/KLL/moments): two disjoint slices
    // partialized to per-group DECIMAL moment rows, merged by exact
    // sums (merged state == one-pass state BIT-FOR-BIT, no bound
    // booleans needed), read out as the per-group correlation matrix.
    // The oracle computes the matrix directly from the full table —
    // merge-exactness IS the check.
    "x_incr_corr" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val keys = Seq("l_returnflag")
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
      val evens = graft.agg.AggState.partializeMoments(
        li.filter(col("l_orderkey") % 2 === 0), keys, cols)
      val odds = graft.agg.AggState.partializeMoments(
        li.filter(col("l_orderkey") % 2 =!= 0), keys, cols)
      graft.agg.AggState.finalizedCorr(
          graft.agg.AggState.mergeMoments(keys, evens, odds), cols)
        .orderBy(col("l_returnflag"), col("col_a"), col("col_b"))
    }),

    // Bivariate statistical aggregates: correlation, covariance, and
    // least-squares regression per group — single-pass decomposable
    // moments, one shuffle (rounded: the moment recurrences differ
    // across engines in the last float digits).
    "x_stats_aggs" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 6)
            .as("corr_qp"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4)
            .as("covp_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4)
            .as("covs_qp"),
          round(stddev_pop(col("l_quantity")), 6).as("sdp_q"),
          round(var_pop(col("l_quantity")), 6).as("varp_q"),
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
            .as("slope_pq"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4)
            .as("icept_pq"))
        .orderBy(col("l_returnflag"))),

    // Data-quality gate: rule violation counters in ONE aggregate pass
    // + referential-integrity orphan count (left-anti join), combined
    // by a 1-row × 1-row scalar crossJoin.
    "x_dq_gate" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      val counts = Quality.violationCounts(li, Seq(
        Quality.Rule("null_qty", col("l_quantity").isNull),
        Quality.Rule("neg_price", col("l_extendedprice") < 0),
        Quality.Rule("high_discount", col("l_discount") > 0.05),
        Quality.Rule("late_ship",
          col("l_shipdate") >= lit("1997-06-01").cast("timestamp"))))
      val orphans = Quality
        .orphans(li, "l_orderkey", T(s, dir, "orders"), "o_orderkey")
        .agg(count(lit(1)).as("n_orphans"))
      counts.crossJoin(orphans)
    }),

    // Approximate-FD audit (l_partkey → l_suppkey): per-LHS row count,
    // distinct RHS count, and g₃ violation count (rows outside the
    // majority RHS). Two chained aggregates, second reuses the first's
    // partitioning.
    "x_fd_check" -> ((s, dir) =>
      Quality.fdViolations(
          T(s, dir, "lineitem").filter(col("l_partkey") < 400),
          Seq("l_partkey"), "l_suppkey")
        .orderBy(col("l_partkey"))),

    // Corpus-level FD summary: the "is this a real key?" one-row gate
    // (g3_error = min fraction of rows to delete for the FD to hold).
    "x_fd_summary" -> ((s, dir) =>
      Quality.fdSummary(T(s, dir, "lineitem"),
        Seq("l_partkey"), "l_suppkey")),

    // Group-median imputation with provenance: 10% of quantities
    // hash-masked to null, refilled with the per-flag exact median and
    // flagged — the robust imputation + missingness-indicator pattern.
    "x_impute" -> ((s, dir) => {
      val masked = T(s, dir, "lineitem")
        .withColumn("qty_obs",
          when(pmod(Hashing.hash64(concat_ws("|", col("l_orderkey"),
            col("l_linenumber")), 5), lit(10L)) === 0,
            lit(null).cast("double"))
            .otherwise(col("l_quantity")))
        // referenced 3x inside imputeGroupMedian (group medians, global
        // median, join probe) — without a barrier each leg recomputes
        // the per-row md5 mask over the full table (measured 0.63 s of
        // the 0.92 s query, r14 probe)
        .localCheckpoint(false)
      graft.ops.Tidy.imputeGroupMedian(masked, "l_returnflag", "qty_obs")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("qty_obs_imputed"), 1L).otherwise(0L))
            .as("n_imputed"),
          sum(col("qty_obs").cast(DecimalType(18, 2))).cast("double")
            .as("qty_sum"))
        .orderBy(col("l_returnflag"))
    }),

    // Benford first-digit audit of the price column: digit shares vs
    // log10(1+1/d), string-based digit extraction over the DECIMAL
    // rendering (portable; no per-row transcendental — the nine
    // expected shares are plan literals).
    "x_benford" -> ((s, dir) =>
      Quality.benford(T(s, dir, "lineitem"), "l_extendedprice")
        .select(col("digit"), col("n"), col("share"),
          round(col("expected"), 9).as("expected"),
          round(col("deviation"), 9).as("deviation"))
        .orderBy(col("digit"))),

    // The one-row χ² alarm over the digit table (prices are
    // uniform-ish, NOT Benford — the point is the exact statistic).
    "x_benford_stat" -> ((s, dir) =>
      Quality.benfordStat(T(s, dir, "lineitem"), "l_extendedprice")
        .select(col("n_rows"), round(col("chi2"), 6).as("chi2"))),

    // ---- event-time aggregation (batch form; streaming in
    //      graft.streaming uses the identical plan over readStream) ------

    "x_events_tumbling" -> ((s, dir) =>
      Events.loadEvents(s, dir)
        .withColumn("bucket_start",
          col("ts_sec") - col("ts_sec") % 600)
        .groupBy(col("bucket_start"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double")
            .as("total_value"))
        .orderBy(col("bucket_start"), col("event_type"))),

    "x_events_sliding" -> ((s, dir) => {
      // 10-minute windows sliding by 5: every event lands in exactly two
      // windows; emit both starts row-locally, then one group-by.
      val sec = col("ts_sec")
      val w1 = sec - sec % 300
      Events.loadEvents(s, dir)
        .select(col("event_type"), col("value"),
          explode(array(w1 - 300, w1)).as("window_start"))
        .groupBy(col("window_start"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double")
            .as("total_value"))
        .orderBy(col("window_start"), col("event_type"))
    }),

    // Binned range join: "hot" 10-min windows (>= 2 events) paired with
    // every event inside a surrounding [start-300, start+900) interval.
    // Unaligned intervals force true range semantics; bins keep it an
    // equi-join.
    "x_range_join" -> ((s, dir) => {
      val e = Events.loadEvents(s, dir)
        .select(col("event_id"), col("event_type"), col("ts_sec").as("sec"))
      val hot = e
        .withColumn("bucket", col("sec") - col("sec") % 600)
        .groupBy(col("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .select(col("event_type").as("hot_type"),
          (col("bucket") - 300).as("lo"), (col("bucket") + 900).as("hi"))
      graft.ops.RangeJoin
        .binnedRangeJoin(e, hot, "sec", "lo", "hi", binWidth = 600)
        .groupBy(col("hot_type"), col("lo"), col("hi"))
        .agg(count(lit(1)).as("n_events_in_range"))
        .orderBy(col("hot_type"), col("lo"))
    }),

    // Sketch-based stats, hash-checkable form: sketch values themselves
    // are engine-specific, so the query emits (a) the exact distinct
    // count and (b) error-bound BOOLEANS asserting each sketch's
    // accuracy guarantee — HLL++ rsd 0.05 checked at 3-sigma (15%
    // relative error), GK percentile_approx(accuracy=1000) checked by
    // RANK: the approx median's rank must land in [0.45n, 0.55n]
    // (guarantee is ±0.001n). The rank check is the scale-safe form —
    // no exact percentile anywhere, just a second aggregate pass over a
    // 3-row broadcast of the sketch outputs. The DuckDB oracle
    // re-derives the same booleans from exact aggregation alone (they
    // are TRUE whenever the sketch honors its bound), so a broken
    // sketch hash-mismatches.
    "x_approx_sketches" -> ((s, dir) => {
      val o = T(s, dir, "orders")
        .select(col("o_orderstatus"), col("o_custkey"), col("o_totalprice"))
      val sketches = o.groupBy(col("o_orderstatus"))
        .agg(
          approx_count_distinct(col("o_custkey")).as("acd"),
          percentile_approx(col("o_totalprice"), lit(0.5), lit(1000))
            .as("ap50"))
      o.join(broadcast(sketches), Seq("o_orderstatus"))
        .groupBy(col("o_orderstatus"))
        .agg(
          count_distinct(col("o_custkey")).as("n_custs"),
          first(col("acd")).as("acd"),
          count(lit(1)).as("n"),
          sum(when(col("o_totalprice") <= col("ap50"), 1L).otherwise(0L))
            .as("rank_le"))
        .select(col("o_orderstatus"), col("n_custs"),
          (abs(col("acd") - col("n_custs")).cast("double") /
            col("n_custs") <= 0.15).as("cd_ok"),
          (col("rank_le") >= col("n") * 0.45 &&
            col("rank_le") <= col("n") * 0.55).as("p50_ok"))
        .orderBy(col("o_orderstatus"))
    }),

    // Mergeable-sketch rollup — the pre-aggregated distinct-count
    // pattern a 100 TB deployment persists: per-year DataSketches HLL
    // partials (binary, re-mergeable — unlike approx_count_distinct's
    // final estimate, these can roll up across ANY later grouping or
    // time range without rescanning the fact table), then
    // hll_union_agg folds the |years| partials into the corpus
    // estimate. Output is the hash-checkable bound form: per-year
    // exact counts plus booleans asserting (a) each partial's estimate
    // and (b) the merged estimate land within 15% of exact (lgK=12 is
    // ~1.6% rsd, so the bound is ~9 sigma). The oracle re-derives the
    // booleans from exact aggregation alone.
    "x_sketch_rollup" -> ((s, dir) => {
      val o = T(s, dir, "orders")
        .select(year(col("o_orderdate")).as("yr"), col("o_custkey"))
      // referenced twice (result rows + the union-merge); without a
      // barrier each reference re-scans orders — the multi-reference
      // inlining lesson. The checkpoint is |years| rows of sketches.
      val perYear = o.groupBy(col("yr")).agg(
        hll_sketch_agg(col("o_custkey"), lit(12)).as("sk"),
        count_distinct(col("o_custkey")).as("n_custs"))
        .localCheckpoint(false)
      val merged = perYear.agg(
        hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("est_total"))
      val exactTotal = o.agg(
        count_distinct(col("o_custkey")).as("n_total"))
      perYear
        .crossJoin(broadcast(merged))
        .crossJoin(broadcast(exactTotal))
        .select(col("yr"), col("n_custs"),
          (abs(hll_sketch_estimate(col("sk")) - col("n_custs"))
            .cast("double") / col("n_custs") <= 0.15).as("yr_ok"),
          (abs(col("est_total") - col("n_total")).cast("double") /
            col("n_total") <= 0.15).as("merge_ok"))
        .orderBy(col("yr"))
    }),

    // Entity resolution, equality tier — the scale path for golden
    // records: normalize each part name to its sorted distinct token
    // set (one codegen'd row-local expression), BLOCK on that
    // signature (a hash group-by — no pair enumeration, no quadratic
    // term anywhere), and emit one canonical record per entity: min
    // key as cluster id, member/brand counts, price aggregate. The
    // fuzzy tier (jaccardPairs/simhash + connectedComponents) exists
    // for corpora with real typos; on equality matching its transitive
    // closure IS these groups, at strictly higher cost.
    "x_entity_resolution" -> ((s, dir) =>
      T(s, dir, "part")
        .withColumn("entity_key",
          array_join(array_sort(array_distinct(
            split(lower(col("p_name")), " "))), " "))
        .groupBy(col("entity_key"))
        .agg(min(col("p_partkey")).as("cluster_id"),
          count(lit(1)).as("n_members"),
          count_distinct(col("p_brand")).as("n_brands"),
          sum(col("p_retailprice").cast(DecimalType(18, 2))).cast("double")
            .as("total_price"))
        .orderBy(col("cluster_id"))),

    // As-of join: each purchase enriched with the user's latest
    // signup at-or-before it (right side deduped to one row per
    // (user, sec) for determinism).
    "x_asof_join" -> ((s, dir) => {
      val e = Events.loadEvents(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"), col("ts_sec").as("sec"))
      val l = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "sec", "value")
      val r = e.filter(col("event_type") === "signup")
        .groupBy(col("user_id"), col("sec"))
        .agg(max(col("value")).as("signup_value"))
        .withColumn("signup_sec", col("sec"))
      graft.ops.AsOfJoin.asofJoin(l, r, "user_id", "sec",
        payload = Seq("signup_value", "signup_sec"))
        .orderBy(col("event_id"))
    }),

    // Last-touch attribution: each purchase attributed to the user's
    // most recent click within a 1-day lookback (as-of join + bounded
    // staleness — DuckDB's native ASOF JOIN oracles the match, the
    // lookback is a row-local post-filter). Output: corpus-level
    // attribution rate and mean click→purchase delay, both as single
    // IEEE divisions of exact accumulations.
    "x_attribution" -> ((s, dir) => {
      val e = Events.loadEvents(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("ts_sec").as("sec"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "sec")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("sec"), col("sec").as("click_sec"))
        .distinct()
      graft.ops.AsOfJoin.asofJoin(purchases, clicks, "user_id", "sec",
          payload = Seq("click_sec"))
        .withColumn("attributed", col("asof_click_sec").isNotNull &&
          col("asof_click_sec") >= col("sec") - 86400)
        .agg(count(lit(1)).as("n_purchases"),
          sum(when(col("attributed"), 1L).otherwise(0L)).as("n_attributed"),
          sum(when(col("attributed"), col("sec") - col("asof_click_sec"))
            .cast(DecimalType(18, 2))).cast("double").as("delay_sum"))
        .select(col("n_purchases"), col("n_attributed"),
          (col("n_attributed").cast("double") / col("n_purchases"))
            .as("attribution_rate"),
          (col("delay_sum") / col("n_attributed")).as("mean_delay_sec"))
    }),

    "x_events_sessions" -> ((s, dir) => {
      val ts = col("ts_sec")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(ts, col("event_id"))
      Events.loadEvents(s, dir)
        .select(col("user_id"), col("event_id"),
          when(ts - lag(ts, 1).over(w) > 1800 || lag(ts, 1).over(w).isNull, 1)
            .otherwise(0).as("is_new_session"))
        .groupBy(col("user_id"))
        .agg(sum(col("is_new_session")).cast("long").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // Built-in session_window sessionization (the Structured-Streaming-
    // native form; identical plan shape under readStream + watermark).
    // Second-truncated timestamps for engine parity. Boundary rule,
    // MEASURED (round-11 sf0.1 sweep, which planted exactly one
    // 1800 s gap): Spark merges TOUCHING sessions — an event exactly
    // gap seconds after the previous one joins the SAME session — so
    // the oracle starts a new session only on `diff > 1800`, matching
    // the lag-based twin x_events_sessions and SessionProcessor's
    // inclusive [start-gap, last+gap] envelope.
    "x_events_sessions_win" -> ((s, dir) =>
      graft.streaming.StreamOps.sessionAgg(
          Events.loadEvents(s, dir)
            .withColumn("ts", timestamp_seconds(col("ts_sec"))),
          gap = "30 minutes")
        .select(col("user_id"),
          unix_timestamp(col("session_start")).as("session_start"),
          unix_timestamp(col("session_end")).as("session_end"),
          col("n_events"), col("total_value"))
        .orderBy(col("user_id"), col("session_start"))),

    // ---- table maintenance (MERGE / SCD2) -----------------------------

    // MERGE INTO customer: a deterministic change set derived from the
    // base itself — updates (bal+100) for custkey%10==0, deletes for
    // custkey%100==0 (matched only), inserts (id-shifted rows) for
    // custkey%7==3. Exercises all three clauses plus the
    // unmatched-but-delete-flagged insert edge (custkey 500 at sf0.01).
    "x_merge_upsert" -> ((s, dir) => {
      val base = T(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val matched = base.filter(col("c_custkey") % 10 === 0)
        .select(col("c_custkey"), col("c_name"),
          (col("c_acctbal") + 100.0).as("c_acctbal"))
      val inserts = base.filter(col("c_custkey") % 7 === 3)
        .select((col("c_custkey") + 1000000L).as("c_custkey"),
          col("c_name"), col("c_acctbal"))
      graft.ops.Merge.mergeInto(base, matched.unionByName(inserts),
          Seq("c_custkey"),
          deleteCondition = col("c_custkey") % 100 === 0)
        .orderBy(col("c_custkey"))
    }),

    // Snapshot diff (CDC generation, the inverse of MERGE): old =
    // customer; new = customer with deterministic edits (drop %13==0,
    // bal+50 where %7==1, inserts at shifted ids for %11==5). The diff
    // must classify exactly the edited rows.
    "x_snapshot_diff" -> ((s, dir) => {
      val base = T(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val newSnap = base
        .filter(col("c_custkey") % 13 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 7 === 1, col("c_acctbal") + 50.0)
            .otherwise(col("c_acctbal")))
        .unionByName(base.filter(col("c_custkey") % 11 === 5)
          .select((col("c_custkey") + 2000000L).as("c_custkey"),
            col("c_name"), col("c_acctbal")))
      graft.ops.Diff.diffSnapshots(base, newSnap, Seq("c_custkey"))
        .orderBy(col("c_custkey"))
    }),

    // SCD2 history: each user's event_type change log collapsed into
    // half-open validity intervals.
    "x_scd2" -> ((s, dir) =>
      graft.ops.Scd2.buildHistory(
        Events.loadEvents(s, dir)
          .select(col("user_id"), col("event_id"), col("ts_sec"),
            col("event_type")),
        key = "user_id", orderCol = "ts_sec", tieCol = "event_id",
        trackedCol = "event_type")
        .select(col("user_id"), col("event_type"), col("valid_from"),
          col("valid_to"), col("is_current"))
        .orderBy(col("user_id"), col("valid_from"), col("event_type"))),

    // SCD2 point-in-time lookup: high-value events resolved against the
    // validity intervals of each user's state history — the
    // feature-store correctness join ("what was the state WHEN the
    // event happened", never the current state). Equi-join on user +
    // interval containment filter; fan-out bounded by a user's interval
    // count, which SCD2 construction already bounds by their change
    // count.
    "x_scd2_lookup" -> ((s, dir) => {
      val ev = Events.loadEvents(s, dir)
      val dim = graft.ops.Scd2.buildHistory(
        ev.select(col("user_id"), col("event_id"), col("ts_sec"),
          col("event_type")),
        key = "user_id", orderCol = "ts_sec", tieCol = "event_id",
        trackedCol = "event_type")
      val facts = ev.filter(col("value") > 90.0)
        .select(col("user_id"), col("event_id"), col("ts_sec"),
          col("value"))
      facts.join(dim, Seq("user_id"))
        .filter(col("valid_from") <= col("ts_sec") &&
          (col("valid_to").isNull || col("ts_sec") < col("valid_to")))
        .select(col("user_id"), col("event_id"), col("ts_sec"),
          col("value"), col("event_type").as("state_at_event"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // Field-level survivorship (golden-record completion): per customer,
    // each output field follows its own rule — latest order status by
    // (day, orderkey) recency, first-ever priority, DECIMAL-exact spend
    // total. max_by/min_by on a single composed ordering integer keeps
    // the rule deterministic and oracle-portable (arg_max/arg_min).
    "x_survivorship" -> ((s, dir) => {
      val o = T(s, dir, "orders")
        .withColumn("ord",
          expr("unix_micros(cast(o_orderdate as timestamp)) div 86400000000")
            * lit(10000000L) + col("o_orderkey"))
      o.groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          max_by(col("o_orderstatus"), col("ord")).as("latest_status"),
          min_by(col("o_orderpriority"), col("ord")).as("first_priority"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
            .as("total_spend"))
        .orderBy(col("o_custkey"))
    }),

    // Time-weighted average (TWAP): each observation weighted by how
    // long it was current (lead(ts) − ts within the user's stream; the
    // last observation has no duration and drops out) — the correct
    // mean for irregularly-sampled state, where the plain mean
    // overweights bursts. DECIMAL value×duration products keep the
    // weighted sums order-free; one IEEE division at the end.
    "x_twap" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec"), col("event_id"))
      Events.loadEvents(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_sec"),
          col("value"))
        .withColumn("dur",
          (lead(col("ts_sec"), 1).over(w) - col("ts_sec")))
        .filter(col("dur").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_obs"),
          sum(col("dur")).as("span_sec"),
          (sum(col("value").cast(DecimalType(18, 6)) * col("dur"))
            .cast("double") /
            sum(col("dur")).cast("double")).as("twap"))
        .orderBy(col("user_id"))
    }),

    // ---- layout / data skipping ---------------------------------------

    // Z-order layout audit: interleave (l_partkey%256, l_suppkey%256)
    // into a 16-bit Morton code and profile each aligned 64-code block.
    // Every block is exactly an 8x8 (x, y) tile, so min/max stats are
    // tight in BOTH dimensions — the property parquet footer pruning
    // needs after clusterByZ writes the layout.
    "x_zorder" -> ((s, dir) =>
      T(s, dir, "lineitem")
        .select((col("l_partkey") % 256).as("x"),
          (col("l_suppkey") % 256).as("y"))
        .withColumn("zval", graft.ops.ZOrder.zvalue(col("x"), col("y"), 8))
        .groupBy(shiftright(col("zval"), 6).as("z_block"))
        .agg(count(lit(1)).as("n"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"))
        .orderBy(col("z_block"))),

    // Zone-map audit — the data-skipping layer over ZOrder: rows fall
    // into 16 contiguous zones of z-value rank (the stand-in for
    // "files" under the z-ordered layout; rank distributed via sorted
    // zipWithIndex, no single-partition window) and each zone reports
    // min/max spans for BOTH interleaved dimensions — the per-file
    // stats ZoneMap.skipScan prunes with, tight in x AND y exactly
    // because the layout is z-ordered. ZoneMapSpec proves the physical
    // leg (real files, inputFiles shrink, row-exact pruned scans);
    // this query oracle-checks the zone/stat arithmetic itself.
    "x_zonemap" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
        .select((col("l_partkey") % 256).cast("int").as("x"),
          (col("l_suppkey") % 256).cast("int").as("y"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("tie"))
      graft.io.ZoneMap.zoneAudit(li,
        graft.ops.ZOrder.zvalue(col("x"), col("y"), 8), col("tie"),
        nZones = 16, audit = Seq("x" -> col("x"), "y" -> col("y")))
    }),

    // ---- sampling (corpus rebalancing / fixed-size draws) -------------

    // Shard-assignment balance audit: hash-sharded export layout with
    // per-shard doc/char totals — the check that no shard is hot before
    // a 100 TB write fans out by shard.
    "x_shard_audit" -> ((s, dir) =>
      Sampling.shardAssign(T(s, dir, "documents"), "doc_id",
          nShards = 8, seed = 11)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("shard"))),

    // Temporal train/test split with a 2-day embargo after the cut —
    // the time-series leakage guard (hash splits scatter futures into
    // training pasts; the embargo buffers serial correlation at the
    // boundary). Row-local literal comparisons.
    "x_split_temporal" -> ((s, dir) =>
      Sampling.temporalSplit(Events.loadEvents(s, dir), "ts_sec",
          trainEnd = 1705708800L, embargoTicks = 172800L)
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("ts_sec")).as("min_sec"),
          max(col("ts_sec")).as("max_sec"))
        .orderBy(col("split"))),

    // Leave-one-out target encoding of the doc source against the
    // en-language label, prior pseudo-count 10: the category-mean
    // feature with the own-label leak removed.
    "x_target_encode" -> ((s, dir) =>
      Classifier.targetEncode(
          T(s, dir, "documents").select(col("doc_id"), col("source"),
            col("lang")),
          "source", col("lang") === "en", m = 10)
        .filter(col("doc_id") < 300)
        .select(col("doc_id"), col("source"), col("target_enc"))
        .orderBy(col("doc_id"))),

    // Weight-of-evidence + information value of order priority against
    // the F-status label (the credit-scoring feature diagnostic):
    // |categories| rows, one 1-row totals broadcast, ln pinned at 9dp
    // (the PMI convention). iv_term sums to the feature's IV.
    "x_woe" -> ((s, dir) =>
      Classifier.woeTable(T(s, dir, "orders"), "o_orderpriority",
          col("o_orderstatus") === "F")
        .orderBy(col("o_orderpriority"))),

    // Heavy-change detection between two table slices — "which keys'
    // frequency SHARE moved most" (the drift-debugging readout behind
    // PSI's single number): ONE group-by with conditional slice counts
    // (one shuffle, never two scans), slice totals broadcast, share
    // delta row-local, TakeOrdered top-20 with key tie-break. At
    // 100 TB the same plan holds — |distinct keys| rows after the
    // combine; a sketch prefilter (mg_sketch per slice) only becomes
    // necessary when even the key domain won't fit a shuffle.
    "x_heavy_change" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
        .withColumn("__s1", (col("l_orderkey") % 2 === 0).cast("long"))
      val perKey = li.groupBy(col("l_partkey"))
        .agg(sum(col("__s1")).as("n1"),
          sum(lit(1L) - col("__s1")).as("n2"))
      val totals = perKey.agg(sum(col("n1")).as("__t1"),
        sum(col("n2")).as("__t2"))
      perKey.crossJoin(broadcast(totals))
        .select(col("l_partkey"), col("n1"), col("n2"),
          (col("n1").cast("double") / col("__t1").cast("double") -
            col("n2").cast("double") / col("__t2").cast("double"))
            .as("share_delta"))
        .withColumn("abs_delta", abs(col("share_delta")))
        .orderBy(col("abs_delta").desc, col("l_partkey"))
        .limit(20)
    }),

    // Curriculum quartiles: ntile(4) per source over (n_chars, doc_id)
    // — deterministic total order, windows partitioned by source.
    "x_curriculum" -> ((s, dir) =>
      T(s, dir, "documents")
        .withColumn("quartile", ntile(4).over(
          Window.partitionBy(col("source"))
            .orderBy(col("n_chars"), col("doc_id"))))
        .groupBy(col("source"), col("quartile"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"))
        .orderBy(col("source"), col("quartile"))),

    // Stratified downsample: halve en, quarter de, decimate fr, keep
    // rare strata whole — then per-lang survivor stats.
    "x_sample_stratified" -> ((s, dir) =>
      Sampling.stratifiedSample(T(s, dir, "documents"), "doc_id", "lang",
          fractions = Map("en" -> 0.5, "de" -> 0.25, "fr" -> 0.1),
          defaultFraction = 1.0, seed = 3)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy(col("lang"))),

    // Neyman-allocated stratified sample: a 3000-row budget split
    // n_h ∝ N_h·σ_h across return-flag strata over the price column
    // (the survey-sampling optimum — big AND variable strata earn
    // budget), drawn through the deterministic hash filter. Output is
    // the allocation plan plus the realized per-stratum counts; the
    // oracle replays moments, allocation, and the hash twin.
    "x_sample_neyman" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
        .withColumn("__k", concat_ws("_", col("l_orderkey"),
          col("l_linenumber")))
        .localCheckpoint(false) // allocation moments + the sample pass
      val alloc = Sampling.neymanAllocation(li, "l_returnflag",
        "l_extendedprice", totalN = 3000)
      val sampled = Sampling.neymanSample(li, "__k", "l_returnflag",
          "l_extendedprice", totalN = 3000, seed = 11)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_sampled"))
      alloc.join(sampled, Seq("l_returnflag"), "left")
        .select(col("l_returnflag"), col("n_rows"),
          round(col("sigma"), 6).as("sigma"), col("share"),
          col("n_target"), col("rate"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
        .orderBy(col("l_returnflag"))
    }),

    // Domain-mixture resampling: rebalance four sources to a 40/30/20/10
    // target mixture (no upsampling — the most-constrained domain keeps
    // 100%); other sources are dropped. Per-row survival audit.
    "x_domain_mix" -> ((s, dir) =>
      Sampling.domainMix(T(s, dir, "documents"), "doc_id", "source",
          targets = Seq("src0" -> 0.4, "src1" -> 0.3,
            "src2" -> 0.2, "src3" -> 0.1), seed = 5)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // Poisson bootstrap: 16 deterministic replicate means of the order
    // totalprice in one pass — the distributed CI recipe (per-row
    // Poisson(1) weights from integer-threshold inverse-CDF draws, no
    // float at any decision boundary, DECIMAL-exact weighted sums).
    "x_bootstrap" -> ((s, dir) =>
      Sampling.poissonBootstrap(T(s, dir, "orders"), "o_orderkey",
          "o_totalprice", replicates = 16, seed = 13)
        .orderBy(col("replicate"))),

    // Temperature mixture at α = 0.5: every domain downsampled toward
    // the smallest by sqrt(n_min/n_d) — exactly-rounded IEEE ops only,
    // so the keep set is bit-portable and row-exact against the oracle.
    "x_temperature_mix" -> ((s, dir) =>
      Sampling.temperatureMix(T(s, dir, "documents"), "doc_id", "source",
          alpha = 0.5, seed = 7)
        .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // Deterministic negative sampling: 4 pseudo-random negatives per
    // embedding anchor, reproducible across engines/partitionings.
    "x_negative_sample" -> ((s, dir) =>
      Sampling.negativeSamples(T(s, dir, "embeddings"), "vec_id",
          k = 4, seed = 11)
        .orderBy(col("anchor_id"), col("j"))),

    // Per-domain fixed-size draw (5 docs per source) via the custom
    // bounded-heap TopKPerKey operator — no per-group sort.
    "x_sample_per_group" -> ((s, dir) =>
      Sampling.reservoirPerGroup(
          T(s, dir, "documents")
            .select(col("doc_id"), col("source"), col("lang")),
          "doc_id", "source", k = 5, seed = 9)
        .orderBy(col("source"), col("doc_id"))),

    // Deterministic fixed-size draw: the 100 smallest-hash documents.
    "x_sample_reservoir" -> ((s, dir) =>
      Sampling.reservoirSample(T(s, dir, "documents"), "doc_id", 100,
          seed = 2)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // Top-N per group: each nation's 3 highest-balance suppliers —
    // rank inside key-partitioned windows (every nation ranks in
    // parallel; no global sort, no single-partition funnel).
    "x_group_topk" -> ((s, dir) => {
      val w = Window.partitionBy(col("s_nationkey"))
        .orderBy(col("s_acctbal").desc, col("s_suppkey"))
      T(s, dir, "supplier")
        .select(col("s_nationkey"), col("s_suppkey"), col("s_name"),
          col("s_acctbal"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .orderBy(col("s_nationkey"), col("rank"))
    }),

    // Same top-N-per-group via the custom whole-operator tier: logical
    // node -> planner strategy -> per-key bounded-heap physical exec
    // (O(n log k), no partition sort) — result must match the window
    // form's oracle exactly.
    "x_heap_topk" -> ((s, dir) =>
      org.apache.spark.sql.graft.TopKPerKey.topKPerKey(
          T(s, dir, "supplier")
            .select(col("s_nationkey"), col("s_suppkey"), col("s_name"),
              col("s_acctbal")),
          keys = Seq("s_nationkey"),
          orderBy = Seq(col("s_acctbal").desc, col("s_suppkey").asc),
          k = 3)
        .orderBy(col("s_nationkey"), col("s_acctbal").desc,
          col("s_suppkey"))),

    // Same contract a third way: the plain window idiom (row_number →
    // filter → drop), with the WindowTopKRewrite optimizer rule installed
    // — Catalyst itself swaps the window+sort for the bounded-heap
    // operator (Rule[LogicalPlan] tier of the extension stack). Top-2
    // customers by balance per nation so the plan is distinct from the
    // supplier variants.
    "x_rule_topk" -> ((s, dir) => {
      org.apache.spark.sql.graft.WindowTopKRewrite.install(s)
      val w = Window.partitionBy(col("c_nationkey"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      T(s, dir, "customer")
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)
        .drop("rn")
        .orderBy(col("c_nationkey"), col("c_acctbal").desc, col("c_custkey"))
    }),

    // Incremental aggregation: two disjoint slices partialized
    // separately, merged as state, finalized — must equal aggregating
    // the whole table in one pass (the DuckDB oracle does exactly that).
    "x_incr_agg" -> ((s, dir) => {
      val o = T(s, dir, "orders")
        .withColumn("year", year(col("o_orderdate")))
      val keys = Seq("year", "o_orderstatus")
      val evens = graft.agg.AggState.partialize(
        o.filter(col("o_custkey") % 2 === 0), keys, "o_totalprice")
      val odds = graft.agg.AggState.partialize(
        o.filter(col("o_custkey") % 2 =!= 0), keys, "o_totalprice")
      graft.agg.AggState.finalized(
          graft.agg.AggState.merge(keys, evens, odds))
        .orderBy(col("year"), col("o_orderstatus"))
    }),

    // Incremental DISTINCT-count maintenance: two disjoint slices
    // partialized to per-group HLL sketches, union-merged, estimated —
    // the sketch table a 100 TB rolling "distinct customers" keeps
    // instead of re-scanning history. Sketch binaries/estimates are
    // engine-specific, so output is the hash-checkable bound form
    // (x_approx_sketches pattern): the exact distinct count plus a
    // boolean asserting the merged estimate lands within 5% (lgK=12
    // ≈ 1.6% RSE, checked at ~3 sigma); the DuckDB oracle re-derives
    // both from exact aggregation.
    "x_incr_distinct" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val keys = Seq("o_orderstatus")
      val evens = graft.agg.AggState.partializeDistinct(
        o.filter(col("o_orderkey") % 2 === 0), keys, "o_custkey")
      val odds = graft.agg.AggState.partializeDistinct(
        o.filter(col("o_orderkey") % 2 =!= 0), keys, "o_custkey")
      val est = graft.agg.AggState.finalizedDistinct(
        graft.agg.AggState.mergeDistinct(keys, evens, odds))
      val exact = o.groupBy(col("o_orderstatus"))
        .agg(count_distinct(col("o_custkey")).as("n_custs"))
      exact.join(broadcast(est), keys)
        .select(col("o_orderstatus"), col("n_custs"),
          (abs(col("approx_distinct") - col("n_custs")).cast("double") /
            col("n_custs") <= 0.05).as("hll_ok"))
        .orderBy(col("o_orderstatus"))
    }),

    // Incremental QUANTILE maintenance — the percentile analogue of
    // x_incr_distinct, completing the mergeable-state story: two
    // disjoint slices partialized to per-group KLL sketches (Spark's
    // built-in kll_sketch_agg_double — KB binaries with a proven
    // ~1.65% rank guarantee at k=200 that SURVIVES union), folded by
    // the native kll_merge N-row aggregate (the one piece the built-in
    // surface lacks — its merge is pairwise only), and asked for
    // p50/p95 — the sketch table a 100 TB monitoring pipeline keeps
    // instead of re-scanning history for p99. KLL compaction is
    // randomized, so output is the bound form:
    // the EXACT rank of each estimate (one broadcast join + counting
    // pass) asserted within ±5% of its target (~3× the 99%-confidence
    // envelope); the oracle re-derives the booleans exactly.
    "x_quantile_rollup" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val keys = Seq("o_orderstatus")
      val evens = graft.agg.AggState.partializeQuantile(
        o.filter(col("o_orderkey") % 2 === 0), keys, "o_totalprice")
      val odds = graft.agg.AggState.partializeQuantile(
        o.filter(col("o_orderkey") % 2 =!= 0), keys, "o_totalprice")
      val est = graft.agg.AggState.finalizedQuantile(
        graft.agg.AggState.mergeQuantile(keys, evens, odds),
        Seq(0.5, 0.95))
      o.join(broadcast(est), keys)
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n_rows"),
          avg(when(col("o_totalprice") <= col("p50"), 1.0)
            .otherwise(0.0)).as("__r50"),
          avg(when(col("o_totalprice") <= col("p95"), 1.0)
            .otherwise(0.0)).as("__r95"),
          max(col("n")).as("__n"))
        .select(col("o_orderstatus"), col("n_rows"),
          (col("__n") === col("n_rows")).as("n_ok"),
          (abs(col("__r50") - 0.5) <= 0.05).as("p50_ok"),
          (abs(col("__r95") - 0.95) <= 0.05).as("p95_ok"))
        .orderBy(col("o_orderstatus"))
    }),

    // Theta-sketch SET ALGEBRA — the third mergeable-state tier (HLL
    // answers only |A∪B|; theta answers |A∩B| and |A\B| too), entirely
    // on Spark 4.1's BUILT-IN datasketches functions (theta_sketch_agg
    // / theta_union_agg / theta_intersection / theta_difference /
    // theta_sketch_estimate — built-ins beat custom natives wherever
    // they express the semantics): per-period customer sketches →
    // retained (∩), churned (\), total (∪) — the retention/churn
    // readout a 100 TB deployment computes from KB persisted state
    // instead of exact distincts over re-scanned history. The two
    // audiences are overlapping md5-hash segments of the customer
    // domain (buckets 0-5 vs 3-9 of 10: ~30% of each side exclusive,
    // ~50% shared — the synthetic data's customers all span every
    // period/status, so a time or attribute split would make the
    // difference sets empty and degenerate the demo; a hash split
    // keeps every set a healthy fraction AT ANY SCALE, which is also
    // what keeps the relative bounds sound). Theta is deterministic
    // (k smallest hashes), but estimates are engine-specific, so
    // output is the bound-boolean form: exact counts (the
    // checkpointed distinct tables feed both the sketches and the
    // exact legs) + estimates within 15% (lgK=12 ≈ 1.56% union rse;
    // intersection/difference rse scales with their sample share —
    // ~30-50% here, so the bound is many σ).
    "x_theta_setops" -> ((s, dir) => {
      val o = T(s, dir, "orders")
      val bucket = pmod(graft.functions.Hashing.hash64(
        col("o_custkey").cast("string"), 7), lit(10))
      val eA = o.filter(bucket <= 5)
        .select(col("o_custkey")).distinct().localCheckpoint(false)
      val eB = o.filter(bucket >= 3)
        .select(col("o_custkey")).distinct().localCheckpoint(false)
      val skA = eA.agg(theta_sketch_agg(col("o_custkey"), 12).as("ska"))
      val skB = eB.agg(theta_sketch_agg(col("o_custkey"), 12).as("skb"))
      val pair = skA.crossJoin(broadcast(skB))
        .select(
          theta_sketch_estimate(
              theta_intersection(col("ska"), col("skb")))
            .cast("double").as("est_inter"),
          theta_sketch_estimate(theta_difference(col("ska"), col("skb")))
            .cast("double").as("est_churn"))
      val uni = skA.select(col("ska").as("sk"))
        .unionByName(skB.select(col("skb").as("sk")))
        .agg(theta_sketch_estimate(theta_union_agg(col("sk"), 12))
          .cast("double").as("est_union"))
      eA.join(eB, Seq("o_custkey"))
        .agg(count(lit(1)).as("n_shared"))
        .crossJoin(broadcast(eA.join(eB, Seq("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("n_only_a"))))
        .crossJoin(broadcast(eA.agg(count(lit(1)).as("n_a"))))
        .crossJoin(broadcast(eB.agg(count(lit(1)).as("n_b"))))
        .crossJoin(broadcast(eA.unionByName(eB).distinct()
          .agg(count(lit(1)).as("n_union"))))
        .crossJoin(broadcast(pair))
        .crossJoin(broadcast(uni))
        .select(col("n_a"), col("n_b"), col("n_union"),
          col("n_shared"), col("n_only_a"),
          (abs(col("est_union") - col("n_union").cast("double")) /
            col("n_union").cast("double") <= 0.15).as("union_ok"),
          (abs(col("est_inter") - col("n_shared").cast("double")) /
            col("n_shared").cast("double") <= 0.15).as("inter_ok"),
          (abs(col("est_churn") - col("n_only_a").cast("double")) /
            col("n_only_a").cast("double") <= 0.15).as("anotb_ok"))
    }),

    // Two-phase salted aggregation: spreads a hot key over 16 reducers,
    // merges partials — result must equal the plain group-by (oracle).
    "x_skew_salted" -> ((s, dir) =>
      graft.ops.Skew.saltedGroupAgg(T(s, dir, "orders"),
          keys = Seq("o_orderstatus"), spreadOn = col("o_custkey"),
          buckets = 16,
          phase1 = Seq(
            sum(col("o_totalprice").cast(DecimalType(18, 2))).as("__p"),
            count(lit(1)).as("__n")),
          phase2 = Seq(
            sum(col("__p")).cast("double").as("revenue"),
            sum(col("__n")).as("n_orders")))
        .orderBy(col("o_orderstatus"))),

    // Salted large⋈large join: the deterministic pre-planned skew-join
    // (AQE's runtime split, planned ahead). Result == the plain join —
    // the invariant the oracle checks.
    "x_skew_join" -> ((s, dir) =>
      graft.ops.Skew.saltedJoin(
          T(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_extendedprice")),
          T(s, dir, "orders")
            .select(col("o_orderkey").as("l_orderkey"),
              col("o_orderstatus")),
          key = "l_orderkey", spreadOn = col("l_extendedprice"),
          buckets = 8)
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)))
            .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("o_orderstatus"))),

    // Verbatim 8-token spans recurring across documents (boilerplate /
    // template detection at the substring level).
    "x_dup_spans" -> ((s, dir) =>
      Dedup.duplicateSpans(
          T(s, dir, "documents").filter(col("doc_id") < 200),
          "doc_id", "text", n = 8, minDocs = 2)
        .orderBy(col("span"))),

    // Distributed suffix array over the corpus token stream — prefix
    // doubling (O(log maxDocLen) rounds of linear shuffles; ranks via
    // range-partitioned sort + zipWithIndex, never a single-partition
    // window, never a materialized-suffix sort). sa_rank = global
    // lexicographic position with (doc_id, pos) tie-break.
    "x_suffix_array" -> ((s, dir) =>
      SuffixArray.build(
          T(s, dir, "documents").filter(col("doc_id") < 1000),
          "doc_id", "text")
        .orderBy(col("sa_rank"))),

    // LCP scan over the suffix array: verbatim repeated spans of ANY
    // length >= 5 tokens in one pass — the Lee-et-al substring dedup,
    // where duplicateSpans must fix a window size n up front.
    "x_sa_repeats" -> ((s, dir) =>
      SuffixArray.repeatedSpans(
          T(s, dir, "documents").filter(col("doc_id") < 400),
          "doc_id", "text", minLcp = 5)
        .orderBy(col("sa_rank"))),

    // Longest verbatim repeated token span in the corpus (bounded
    // TakeOrdered readout of the LCP table, unique sa_rank tie-break).
    "x_sa_longest" -> ((s, dir) =>
      SuffixArray.longestRepeat(
          T(s, dir, "documents").filter(col("doc_id") < 150),
          "doc_id", "text")),

    // Per-document duplicated-token fraction (the Lee-et-al substring
    // dedup decision metric): tokens covered by any >= 5-token verbatim
    // repeat, via SA-neighbor LCP max + per-doc interval union.
    "x_sa_dupfrac" -> ((s, dir) =>
      SuffixArray.duplicatedTokenStats(
          T(s, dir, "documents").filter(col("doc_id") < 400),
          "doc_id", "text", minLcp = 5)
        .orderBy(col("doc_id"))),

    // The same decision metric over the FULL corpus — no doc_id subset
    // (round-13 verdict task: the other SA queries bound their slice so
    // DuckDB's O(n·L) suffix-string replay stays feasible; the dupfrac
    // readout is small enough per doc that the full table replays).
    "x_sa_dupfrac_full" -> ((s, dir) =>
      SuffixArray.duplicatedTokenStats(
          T(s, dir, "documents"), "doc_id", "text", minLcp = 5)
        .orderBy(col("doc_id"))),

    // The Lee-et-al ACTION step (corpus surgery): drop docs at >= 50%
    // duplicated tokens, excise the covered spans from the rest and
    // reassemble — one row per doc with the decision and the surviving
    // text. Integer-exact drop gate (dup*100 >= 50*n), horizon-bounded
    // O(n·minLcp) interval scan, per-doc window coverage decision.
    "x_sa_dedup" -> ((s, dir) =>
      SuffixArray.substringDedup(
          T(s, dir, "documents").filter(col("doc_id") < 400),
          "doc_id", "text", minLcp = 5, dropPercent = 50)
        .orderBy(col("doc_id"))),

    // Benchmark decontamination: docs sharing any verbatim 8-gram with
    // a stand-in eval set (every 97th doc) — broadcast-semi-join prune,
    // hits-only aggregate. (4-grams: sized to this corpus's tiny
    // synthetic vocabulary; real decontamination runs 8-13.)
    "x_decontaminate" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      Dedup.contaminationReport(
          docs.filter(col("doc_id") % 97 =!= 0),
          docs.filter(col("doc_id") % 97 === 0),
          "doc_id", "text", n = 4)
        .orderBy(col("doc_id"))
    }),

    // Training-sequence chunking: 32-token windows, 8-token overlap.
    "x_chunk_docs" -> ((s, dir) =>
      TextAnalysis.chunkDocuments(
          T(s, dir, "documents").filter(col("doc_id") < 100),
          "doc_id", "text", chunkSize = 32, overlap = 8)
        .orderBy(col("doc_id"), col("chunk_id"))),

    // Content-defined chunking: shift-robust token-level CDC segments
    // (boundaries where hash64(token) % 16 == 0).
    "x_cdc_chunks" -> ((s, dir) =>
      TextAnalysis.contentChunks(
          T(s, dir, "documents").filter(col("doc_id") < 150),
          "doc_id", "text", avgChunk = 16, seed = 4)
        .orderBy(col("doc_id"), col("chunk_id"))),

    // Sequence packing: contiguous-fill assignment of docs to 256-token
    // training sequences via the two-phase distributed prefix sum (no
    // global single-partition window).
    "x_seq_pack" -> ((s, dir) =>
      TextAnalysis.packSequences(T(s, dir, "documents"),
          "doc_id", "text", budget = 256, bucketWidth = 50)
        .orderBy(col("doc_id"))),

    // Capstone composition: the full LLM data-prep pipeline as ONE lazy
    // plan — exact dedup → length gate → language filter → eval-set
    // exclusion + decontamination → training-sequence chunking →
    // deterministic doc-level split. Every stage is an already-oracled
    // operator; composing them stays a single DAG (one scan of
    // documents feeds dedup+quality+langid row-locally; the only extra
    // scans are the gram semi-join legs), with the split assigned by
    // hash so the whole dataset cut is reproducible at any scale.
    "x_llm_pipeline" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val uniq = Dedup.dropExactDups(docs, "doc_id", "text")
      val quality = uniq.filter(size(split(lower(col("text")), " ")) >= 30)
      val en = quality.filter(TextAnalysis.langId(col("text")) === "en")
      // referenced by BOTH the contamination report and the anti-join
      // base — the dedup→quality→langid chain would run twice
      val corpus = en.filter(col("doc_id") % 97 =!= 0)
        .localCheckpoint(false)
      val bench = docs.filter(col("doc_id") % 97 === 0)
      val contaminated = Dedup
        .contaminationReport(corpus, bench, "doc_id", "text", n = 4)
        .select(col("doc_id"))
      val clean = corpus.join(contaminated, Seq("doc_id"), "left_anti")
      val chunks = TextAnalysis.chunkDocuments(clean, "doc_id", "text",
        chunkSize = 32, overlap = 8)
      Sampling.splitByHash(chunks, "doc_id",
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), seed = 1)
        .select(col("doc_id"), col("chunk_id"), col("split"),
          col("chunk"), col("n_toks"))
        .orderBy(col("doc_id"), col("chunk_id"))
    }),

    // Sparse retrieval: TF-IDF cosine pairs from the inverted index
    // (exact quantized-integer weights; maxDf 0 = exact for the oracle).
    "x_tfidf_sim" -> ((s, dir) =>
      TextAnalysis.tfidfSimilarPairs(
          T(s, dir, "documents").filter(col("doc_id") < 150),
          "doc_id", "text", minCosine = 0.5, maxDf = 0)
        .orderBy(col("id_a"), col("id_b"))),

    // Corpus-unigram LM scoring (perplexity proxy for quality filtering).
    "x_text_unigram_lm" -> ((s, dir) =>
      TextAnalysis.unigramLogProb(T(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Add-α smoothed bigram LM surprisal (KenLM-ladder step 2): row-local
    // bigram extraction, one corpus model group-by, context counts
    // derived from the bigram table.
    "x_bigram_lm" -> ((s, dir) =>
      TextAnalysis.bigramLogProb(T(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // BPE training, the oracle-able leg: the weighted adjacent-pair
    // count over the char-segmented vocabulary (= iteration 1's merge
    // candidate table). The full training loop is spec'd against a
    // reference implementation (BpeSpec), the kmeans precedent.
    "x_bpe_pairs" -> ((s, dir) => {
      val vocab = Bpe.wordCounts(T(s, dir, "documents"), "text")
        .select(Bpe.charSyms(col("word")).as("syms"), col("n"))
      Bpe.pairCounts(vocab)
        .orderBy(col("total").desc, col("x"), col("y"))
        .limit(30)
    }),

    // Perplexity-quantile gate: keep docs at or below the corpus p80
    // of average unigram surprisal (exact percentile for the oracle;
    // production default is the mergeable percentile_approx sketch).
    "x_quality_gate" -> ((s, dir) =>
      TextAnalysis.qualityQuantileGate(T(s, dir, "documents"),
          "doc_id", "text", p = 0.8, exact = true)
        .orderBy(col("doc_id"))),

    // Corpus card: the one-row dataset summary a corpus release ships
    // with — size, token counts, vocabulary, language mix, exact-dup
    // rate. One scan for the row-local stats + one distinct-hash
    // aggregate + one token aggregate, combined by 1-row crossJoins.
    "x_corpus_card" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val base = docs.agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("n_chars"),
        sum(size(split(col("text"), " "))).cast("long").as("n_tokens"),
        count_distinct(col("lang")).as("n_langs"),
        count_distinct(col("source")).as("n_sources"))
      val dups = docs.agg(
        count_distinct(md5(col("text").cast("binary"))).as("n_unique"))
      val vocab = docs
        .select(explode(TextAnalysis.tokens(col("text"))).as("t"))
        .filter(col("t") =!= "")
        .agg(count_distinct(col("t")).as("vocab_size"))
      base.crossJoin(broadcast(dups)).crossJoin(broadcast(vocab))
        .select(col("n_docs"), col("n_chars"), col("n_tokens"),
          col("n_langs"), col("n_sources"), col("vocab_size"),
          round(lit(1.0) - col("n_unique").cast("double") /
            col("n_docs").cast("double"), 9).as("exact_dup_rate"))
    }),

    // Per-source top-5 tokens by count — the bounded-heap TopKPerKey
    // over an aggregated (source, token, n) table.
    "x_top_tokens_per_source" -> ((s, dir) => {
      val counts = T(s, dir, "documents")
        .select(col("source"),
          explode(TextAnalysis.tokens(col("text"))).as("t"))
        .filter(col("t") =!= "")
        .groupBy(col("source"), col("t"))
        .agg(count(lit(1)).as("n"))
      org.apache.spark.sql.graft.TopKPerKey.topKPerKey(counts,
          keys = Seq("source"),
          orderBy = Seq(col("n").desc, col("t").asc), k = 5)
        .orderBy(col("source"), col("n").desc, col("t"))
    }),

    // Character-distribution entropy: the compressibility quality
    // signal, decimal-exact accumulation.
    "x_text_entropy" -> ((s, dir) =>
      TextAnalysis.charEntropy(
          T(s, dir, "documents").filter(col("doc_id") < 300),
          "doc_id", "text")
        .orderBy(col("doc_id"))),

    // Corpus bigram PMI (phrase mining): top-50 bigrams by count with
    // pointwise mutual information over corpus-wide counts.
    "x_phrase_pmi" -> ((s, dir) =>
      TextAnalysis.phraseScores(T(s, dir, "documents"), "text",
          minCount = 5)
        .orderBy(col("c_xy").desc, col("x"), col("y"))
        .limit(50)),

    // Rare-token scrub: drop tokens seen < 3 times corpus-wide,
    // reassemble documents in position order.
    "x_token_scrub" -> ((s, dir) =>
      TextAnalysis.scrubRareTokens(T(s, dir, "documents"),
          "doc_id", "text", minCount = 3)
        .orderBy(col("doc_id"))),

    // Gopher-style repetition stats + keep decision.
    "x_text_repetition" -> ((s, dir) =>
      TextAnalysis.repetitionStats(T(s, dir, "documents"), "doc_id", "text")
        .orderBy(col("doc_id"))),

    // PII scan + redaction. The corpus has no organic PII, so each doc
    // is augmented with one synthetic email/URL/phone derived from its
    // id — deterministic on both engines, and the redaction output is
    // exact-checked, not just the counts.
    "x_text_pii" -> ((s, dir) => {
      val aug = T(s, dir, "documents").filter(col("doc_id") < 300)
        .withColumn("aug_text", concat(col("text"),
          lit(" contact u"), col("doc_id").cast("string"),
          lit("@example.com see https://ex.com/d"),
          col("doc_id").cast("string"),
          lit(" call +61 2 5550 "),
          (lit(1000) + col("doc_id") % 9000).cast("string")))
      TextAnalysis.piiScan(aug, "aug_text")
        .select(col("doc_id"), col("n_email"), col("n_url"),
          col("n_phone"), col("redacted"))
        .orderBy(col("doc_id"))
    }),

    // Unicode normalization (native codegen'd expression): NFC-compose
    // combining marks appended to real text, plus accent stripping —
    // the canonicalization step before any hash/shingle dedup key.
    "x_text_normalize" -> ((s, dir) => {
      // decomposed on purpose (combining marks + one precomposed A-ring)
      // so NFC genuinely composes; output is " Caf\u00e9 \u00fcber \u00f1o \u00c5 \u00c5"
      val aug = concat(col("text"),
        lit(" Cafe\u0301 u\u0308ber n\u0303o \u00c5 A\u030a"))
      T(s, dir, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id"),
          graft.functions.native_fns.unicode_normalize(aug, "NFC")
            .as("nfc_text"),
          graft.functions.native_fns.strip_accents(aug).as("ascii_text"))
        .orderBy(col("doc_id"))
    }),

    // URL canonicalization + URL-level dedup over deterministically
    // synthesized URLs that exercise every rule: scheme/host case, www
    // prefix, default port, trailing slash, tracking params, fragment.
    "x_url_dedup" -> ((s, dir) => {
      val d = col("doc_id")
      val url = concat(
        when(d % 4 === 0, "HTTPS://").otherwise(lit("https://")),
        when(d % 3 === 0, "WWW.").otherwise(lit("")),
        lit("host"), (d % 7).cast("string"), lit(".Example.org"),
        when(d % 5 === 0, ":443").otherwise(lit("")),
        lit("/p/"), (d % 40).cast("string"),
        when(d % 2 === 0, "/").otherwise(lit("")),
        lit("?id="), (d % 40).cast("string"),
        when(d % 6 === 0, "&utm_source=feed").otherwise(lit("")),
        when(d % 9 === 0, "#frag").otherwise(lit("")))
      Urls.dedupByUrl(
          T(s, dir, "documents").select(d, url.as("url")),
          "doc_id", "url")
        .orderBy(col("url_norm"))
    }),

    // ---- behavioral analytics (events) -------------------------------

    // Ordered funnel view→click→purchase, 1-day max gap per stage:
    // per-stage reach + mean seconds from the previous stage. Event
    // table reduces to one row per (user, stage) before any join.
    "x_funnel" -> ((s, dir) =>
      Behavior.funnel(Events.loadEvents(s, dir), "user_id", "ts_sec",
          "event_type", Seq("view", "click", "purchase"),
          maxGapSec = 86400)
        .orderBy(col("stage"))),

    // Cohort retention: users bucketed by first-activity day, counted
    // per activity-day offset (the product-analytics retention matrix).
    "x_cohort" -> ((s, dir) =>
      Behavior.cohortRetention(
          Events.loadEvents(s, dir)
            .withColumn("day", expr("ts_sec div 86400")),
          "user_id", "day")
        .orderBy(col("cohort_day"), col("day_offset"))),

    // Kaplan-Meier time-to-first-purchase survival (conversion
    // analysis): duration = days from first activity to first
    // purchase, right-censored at a fixed 3-day follow-up. Curve
    // arithmetic on the |distinct durations| table only; 9dp-pinned ln
    // terms into an exact decimal sum (the PMI convention), 6dp
    // survival.
    "x_kaplan_meier" -> ((s, dir) => {
      val ev = Events.loadEvents(s, dir)
        .withColumn("day", expr("ts_sec div 86400"))
      val first = ev.groupBy(col("user_id"))
        .agg(min(col("day")).as("fd"))
      val firstPurchase = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("day")).as("pd"))
      // fixed 3-day follow-up: conversions after day 3 are CENSORED at
      // duration 4 — the real event/censor mix KM exists for
      val subjects = first.join(firstPurchase, Seq("user_id"), "left")
        .select(
          (least(coalesce(col("pd") - col("fd"), lit(3L)), lit(3L)) + 1)
            .as("duration"),
          (col("pd").isNotNull && col("pd") - col("fd") <= 3)
            .as("observed"))
      Behavior.kaplanMeier(subjects, "duration", "observed")
        .orderBy(col("t"))
    }),

    // RFM segmentation: recency/frequency/monetary quintiles per user
    // with total-order tie-breaks (the classic CRM cut). DECIMAL
    // monetary sums. Quintiles are bit-identical to
    // `ntile(5) OVER (ORDER BY metric DESC, user_id)` but computed via
    // Ranks.ntileDesc — the two-phase bucketed exact-rank decomposition
    // — because a global ntile window is a single-partition sort of the
    // whole per-user table (|users| rows through ONE task at 100×).
    // Each metric's quintile is derived independently from the
    // checkpointed per-user table and equi-joined back on user_id.
    "x_rfm" -> ((s, dir) => {
      val perUser = Events.loadEvents(s, dir)
        .filter(col("event_type") === "purchase")
        .groupBy(col("user_id"))
        .agg(max(col("ts_sec")).as("last_sec"),
          count(lit(1)).as("frequency"),
          sum(col("value").cast(DecimalType(18, 2))).cast("double")
            .as("monetary"))
        .localCheckpoint(false) // read 3x for quintiles + the spine
      def quintile(metric: String, out: String) =
        graft.ops.Ranks.ntileDesc(
          perUser.select(col("user_id"), col(metric)),
          metric, "user_id", k = 5, out = out)
          .select(col("user_id"), col(out))
      perUser
        .join(quintile("last_sec", "r"), Seq("user_id"))
        .join(quintile("frequency", "f"), Seq("user_id"))
        .join(quintile("monetary", "m"), Seq("user_id"))
        .select(col("user_id"), col("frequency"), col("monetary"),
          col("r"), col("f"), col("m"),
          concat(col("r"), col("f"), col("m")).as("segment"))
        .orderBy(col("user_id"))
    }),

    // Association rules from the pair table: both directions of every
    // frequent pair with confidence = pair/support(antecedent) and the
    // shared lift — the rule-mining readout over pairSupport's counts.
    "x_basket_rules" -> ((s, dir) => {
      val pairs = Basket.pairSupport(T(s, dir, "lineitem"), "l_orderkey",
          "l_partkey")
        .filter(col("pair_support") >= 3)
      val fwd = pairs.select(col("item_a").as("antecedent"),
        col("item_b").as("consequent"), col("pair_support"),
        (col("pair_support").cast("double") /
          col("support_a").cast("double")).as("confidence"), col("lift"))
      val bwd = pairs.select(col("item_b").as("antecedent"),
        col("item_a").as("consequent"), col("pair_support"),
        (col("pair_support").cast("double") /
          col("support_b").cast("double")).as("confidence"), col("lift"))
      fwd.unionByName(bwd)
        .orderBy(col("confidence").desc, col("antecedent"),
          col("consequent"))
        .limit(40)
    }),

    // DAU/MAU stickiness: daily actives over trailing-30-day actives.
    // Exact form: the (user, active-day) table range-joined onto the
    // day axis — |user-days|×30 rows, fine at this scale; at 100 TB
    // the mergeable form is per-day HLL partials unioned over the
    // window — implemented as x_stickiness_sketch below, trading ~2%
    // error for a |days|-sized shuffle.
    "x_stickiness" -> ((s, dir) => {
      val userDays = Events.loadEvents(s, dir)
        .select(col("user_id"), expr("ts_sec div 86400").as("day"))
        .distinct()
        .localCheckpoint(false) // dau + the 30-day expansion
      val dau = userDays.groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("dau"))
      val mau = userDays.select(col("user_id"),
          explode(sequence(col("day"), col("day") + 29)).as("day"))
        .groupBy(col("day"))
        .agg(countDistinct(col("user_id")).as("mau"))
      dau.join(mau, Seq("day"))
        .select(col("day"), col("dau"), col("mau"),
          (col("dau").cast("double") / col("mau").cast("double"))
            .as("stickiness"))
        .orderBy(col("day"))
    }),

    // The AT-SCALE stickiness twin x_stickiness's comment promises:
    // per-day HLL partials (|days| sketch rows — the table a 100 TB
    // deployment PERSISTS) fanned 30× and union-merged per window
    // position, so the trailing-30 MAU costs a |days|×30-row shuffle
    // of KB sketches instead of |user-days|×30 rows of ids. Output is
    // the hash-checkable bound form (x_sketch_rollup convention):
    // exact dau/mau/stickiness plus booleans asserting each day's
    // sketch estimate and each merged window estimate land within 15%
    // of exact (lgK=12 ≈ 1.6% rsd → ~9σ); the oracle re-derives them
    // from exact aggregation alone.
    "x_stickiness_sketch" -> ((s, dir) => {
      val userDays = Events.loadEvents(s, dir)
        .select(col("user_id"), expr("ts_sec div 86400").as("day"))
        .distinct()
        .localCheckpoint(false) // per-day sketches + the exact oracle legs
      val perDay = userDays.groupBy(col("day")).agg(
          hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
          count(lit(1)).as("dau")) // userDays is distinct → exact DAU
        .localCheckpoint(false) // |days| sketch rows, read twice
      val mauEst = perDay.select(col("sk"),
          explode(sequence(col("day"), col("day") + 29)).as("day"))
        .groupBy(col("day"))
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false)))
          .as("mau_est"))
      val mauExact = userDays.select(col("user_id"),
          explode(sequence(col("day"), col("day") + 29)).as("day"))
        .groupBy(col("day"))
        .agg(count_distinct(col("user_id")).as("mau"))
      perDay.select(col("day"), col("dau"),
          (abs(hll_sketch_estimate(col("sk")) - col("dau"))
            .cast("double") / col("dau") <= 0.15).as("dau_ok"))
        .join(mauExact, Seq("day"))
        .join(mauEst, Seq("day"))
        .select(col("day"), col("dau"), col("mau"),
          (col("dau").cast("double") / col("mau").cast("double"))
            .as("stickiness"),
          col("dau_ok"),
          (abs(col("mau_est") - col("mau")).cast("double") /
            col("mau") <= 0.15).as("mau_ok"))
        .orderBy(col("day"))
    }),

    // 2D skyline (Pareto front) per brand: parts where no same-brand
    // part is both cheaper-or-equal and larger (one strict). Exact
    // coordinate duplicates collapse to their min partkey first (a
    // defined convention — equal points never dominate each other),
    // then one by-key cummax window does the dominance test: the
    // classic SKYLINE OF in three operators.
    "x_skyline" -> ((s, dir) => {
      val pts = T(s, dir, "part")
        .groupBy(col("p_brand"), col("p_retailprice"), col("p_size"))
        .agg(min(col("p_partkey")).as("p_partkey"))
      val w = Window.partitionBy(col("p_brand"))
        .orderBy(col("p_retailprice"), col("p_size").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      pts.withColumn("__best", max(col("p_size")).over(w))
        .filter(col("__best").isNull || col("p_size") > col("__best"))
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          col("p_size"))
        .orderBy(col("p_brand"), col("p_partkey"))
    }),

    // Cohort LTV curve: cumulative purchase revenue per user by cohort
    // age — the growth-analytics readout cohortRetention's counts feed.
    // DECIMAL-exact cumulative sums per cohort over the bounded age
    // axis; one division by cohort size at the end.
    "x_ltv_curve" -> ((s, dir) => {
      val ev = Events.loadEvents(s, dir)
        .withColumn("day", expr("ts_sec div 86400"))
      val cohorts = ev.groupBy(col("user_id"))
        .agg(min(col("day")).as("cday"))
        .localCheckpoint(false) // sizes + revenue join
      val sizes = cohorts.groupBy(col("cday"))
        .agg(count(lit(1)).as("n_users"))
      val rev = ev.filter(col("event_type") === "purchase")
        .join(cohorts, Seq("user_id"))
        .groupBy(col("cday"), (col("day") - col("cday")).as("age"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).as("rev"))
      val w = Window.partitionBy(col("cday")).orderBy(col("age"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      rev.withColumn("cum_rev", sum(col("rev")).over(w))
        .join(broadcast(sizes), Seq("cday"))
        .select(col("cday"), col("age"), col("n_users"),
          col("rev").cast("double").as("age_rev"),
          (col("cum_rev").cast("double") /
            col("n_users").cast("double")).as("ltv_per_user"))
        .orderBy(col("cday"), col("age"))
    }),

    // Funnel time-to-convert distribution: exact p50/p90 of the
    // stage-to-stage gaps the funnel's mean hides.
    "x_funnel_times" -> ((s, dir) => {
      val times = Behavior.funnelTimes(Events.loadEvents(s, dir),
        "user_id", "ts_sec", "event_type",
        Seq("view", "click", "purchase"), maxGapSec = 86400)
      val g2 = times.select(lit(2).as("stage"),
        (col("t2") - col("t1")).as("gap"))
      val g3 = times.select(lit(3).as("stage"),
        (col("t3") - col("t2")).as("gap"))
      g2.unionByName(g3).filter(col("gap").isNotNull)
        .groupBy(col("stage"))
        .agg(count(lit(1)).as("n"),
          expr("percentile(gap, 0.5)").as("p50"),
          expr("percentile(gap, 0.9)").as("p90"))
        .orderBy(col("stage"))
    }),

    // LINEAR multi-touch attribution (the last-touch x_attribution's
    // fairness-minded sibling): each conversion splits unit credit
    // equally across its view/click touches in the prior 24 h; credits
    // pinned at 9 dp into exact decimal sums per channel.
    "x_attribution_linear" -> ((s, dir) => {
      val ev = Events.loadEvents(s, dir)
      val conv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("conv_id"),
          col("ts_sec").as("cts"))
      val touch = ev.filter(col("event_type").isin("view", "click"))
        .select(col("user_id"), col("event_type").as("channel"),
          col("ts_sec").as("tts"))
      val pairs = conv.join(touch, Seq("user_id"))
        .filter(col("tts") < col("cts") &&
          col("tts") >= col("cts") - 86400)
      val perConv = pairs.groupBy(col("conv_id"))
        .agg(count(lit(1)).as("__k"))
      pairs.join(broadcast(perConv), Seq("conv_id"))
        .withColumn("__credit",
          round(lit(1.0) / col("__k").cast("double"), 9)
            .cast(DecimalType(28, 9)))
        .groupBy(col("channel"))
        .agg(count(lit(1)).as("n_touches"),
          round(sum(col("__credit")).cast("double"), 6)
            .as("credited_conversions"))
        .orderBy(col("channel"))
    }),

    // Gaps-and-islands: per-user consecutive-active-day streaks via the
    // day − row_number grouping; by-user windows only, input reduced to
    // one row per (user, active day) before the window.
    "x_streaks" -> ((s, dir) =>
      Behavior.streaks(
          Events.loadEvents(s, dir)
            .withColumn("day", expr("ts_sec div 86400")),
          "user_id", "day")
        .orderBy(col("user_id"))),

    // Interval sweep-line: each event opens a 10-minute activity window;
    // peak simultaneously-open windows per event type. Deltas
    // pre-aggregated per (key, instant) so the prefix-sum window has a
    // unique order — no tie ambiguity on any engine.
    "x_max_concurrency" -> ((s, dir) =>
      Behavior.maxConcurrency(
          Events.loadEvents(s, dir)
            .select(col("event_type"), col("ts_sec").as("s0"),
              (col("ts_sec") + 600).as("s1")),
          "event_type", "s0", "s1")
        .orderBy(col("event_type"))),

    // Session path analysis: top event-type sequences per session
    // (30-min gap sessionization → per-session ordered path string →
    // corpus path counts). The per-session array is bounded by session
    // length; the only wide shuffle carries one row per session.
    "x_event_paths" -> ((s, dir) => {
      val ts = col("ts_sec")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(ts, col("event_id"))
      val sessions = Events.loadEvents(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"), ts,
          when(ts - lag(ts, 1).over(w) > 1800 ||
               lag(ts, 1).over(w).isNull, 1).otherwise(0)
            .as("is_new"))
        .withColumn("sid", sum(col("is_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sessions
        .groupBy(col("user_id"), col("sid"))
        .agg(array_sort(collect_list(
          struct(col("ts_sec"), col("event_id"), col("event_type"))))
          .as("evs"))
        .select(array_join(
          transform(col("evs"), e => e.getField("event_type")), ">")
          .as("path"))
        .groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path"))
        .limit(20)
    }),

    // Sequence-pattern matching over session paths (MATCH_RECOGNIZE-
    // lite): classify each 30-min session's ordered event string by
    // regex — conversion-with-noise ('view...purchase' with anything
    // between), bounce, and browse-only — one row per
    // pattern with session counts. RE2-safe patterns run row-local on
    // the one-row-per-session table.
    "x_seq_pattern" -> ((s, dir) => {
      val ts = col("ts_sec")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(ts, col("event_id"))
      val paths = Events.loadEvents(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"), ts,
          when(ts - lag(ts, 1).over(w) > 1800 ||
               lag(ts, 1).over(w).isNull, 1).otherwise(0)
            .as("is_new"))
        .withColumn("sid", sum(col("is_new")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sid"))
        .agg(array_sort(collect_list(
          struct(col("ts_sec"), col("event_id"), col("event_type"))))
          .as("evs"))
        .select(array_join(
          transform(col("evs"), e => e.getField("event_type")), ">")
          .as("path"))
      paths.select(
          col("path").rlike("view.*purchase").as("converted"),
          (!col("path").contains(">")).as("bounce"),
          col("path").rlike("^(view>?)+$").as("browse_only"))
        .groupBy(col("converted"), col("bounce"), col("browse_only"))
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("converted"), col("bounce"), col("browse_only"))
    }),

    // Per-stage funnel significance: the ordered view→click→purchase
    // funnel split by the A/B hash variant, each adjacent-stage
    // conversion compared by a pooled two-proportion z — "did the
    // variant move CLICK→PURCHASE, not just the blended rate". Reach
    // counts come from two Behavior.funnel runs (3 rows each); the
    // previous-stage denominators come from a 3-row self-join, so no
    // window at all; z is one 9dp-pinned IEEE chain over exact counts.
    "x_funnel_sig" -> ((s, dir) => {
      val ev = Events.loadEvents(s, dir)
        .withColumn("variant",
          when(Sampling.bucketOf(col("user_id"), 7) < 500000L, "A")
            .otherwise("B"))
        .localCheckpoint(false) // two funnel passes share the scan
      def reach(v: String, out: String) =
        Behavior.funnel(ev.filter(col("variant") === v), "user_id",
            "ts_sec", "event_type", Seq("view", "click", "purchase"),
            maxGapSec = 86400)
          .select(col("stage"), col("step"), col("n_users").as(out))
      val j = reach("A", "n_a")
        .join(reach("B", "n_b").drop("step"), Seq("stage"))
        .localCheckpoint(false) // 3 rows: numerators AND denominators
      val prev = j.select((col("stage") + 1).as("stage"),
        col("n_a").as("d_a"), col("n_b").as("d_b"))
      j.join(prev, Seq("stage"))
        .select(col("stage"), col("step"), col("d_a"), col("n_a"),
          col("d_b"), col("n_b"),
          (col("n_a").cast("double") / col("d_a").cast("double"))
            .as("p_a"),
          (col("n_b").cast("double") / col("d_b").cast("double"))
            .as("p_b"))
        .withColumn("__p", (col("n_a") + col("n_b")).cast("double") /
          (col("d_a") + col("d_b")).cast("double"))
        .withColumn("z",
          when(col("__p") > 0 && col("__p") < 1 &&
              col("d_a") > 0 && col("d_b") > 0,
            round((col("p_a") - col("p_b")) /
              sqrt(col("__p") * (lit(1.0) - col("__p")) *
                (lit(1.0) / col("d_a").cast("double") +
                  lit(1.0) / col("d_b").cast("double"))), 9)))
        .drop("__p")
        .orderBy(col("stage"))
    }),

    // CUPED variance reduction (Deng et al.): per-user pre-period
    // purchase revenue (first 15 days) as the covariate for the
    // post-period metric — Y' = Y − θ(X − E[X]) with pooled θ =
    // cov/var from exact DECIMAL moments, adjusted values 9dp-pinned
    // before re-aggregation (an IEEE double sum over rows would be
    // order-dependent). Outputs per variant the before/after variance
    // and the reduction; 6dp output pin (the seasonal_decompose
    // double→DECIMAL cross-engine convention).
    "x_cuped" -> ((s, dir) => {
      val p = Events.loadEvents(s, dir)
        .filter(col("event_type") === "purchase")
        .withColumn("day", expr("ts_sec div 86400"))
        .localCheckpoint(false) // min-day scalar + the per-user split
      val d0 = p.agg(min(col("day")).as("__d0"))
      val perUser = p.crossJoin(broadcast(d0))
        .groupBy(col("user_id"))
        .agg(
          sum(when(col("day") < col("__d0") + 15, col("value"))
            .otherwise(lit(0.0)).cast(DecimalType(18, 2)))
            .cast("double").as("x"),
          sum(when(col("day") >= col("__d0") + 15, col("value"))
            .otherwise(lit(0.0)).cast(DecimalType(18, 2)))
            .cast("double").as("y"))
        .withColumn("variant",
          when(Sampling.bucketOf(col("user_id"), 7) < 500000L, "A")
            .otherwise("B"))
      graft.ext.Experiment.cuped(perUser, "variant", col("x"), col("y"))
        .select(col("variant"), col("n"),
          round(col("mean_y"), 6).as("mean_y"),
          round(col("mean_y_adj"), 6).as("mean_y_adj"),
          round(col("var_y"), 6).as("var_y"),
          round(col("var_y_adj"), 6).as("var_y_adj"),
          round(col("var_reduction"), 6).as("var_reduction"))
        .orderBy(col("variant"))
    }),

    // Empirical-Bayes beta-binomial shrinkage of per-part return
    // rates — "rank by rate" without small-n keys owning the extremes
    // (a 1-of-1 return should not outrank 96-of-100): method-of-
    // moments Beta prior from the 9dp-pinned rate distribution,
    // per-key shrinkage row-local against the 1-row broadcast prior.
    "x_eb_shrink" -> ((s, dir) =>
      graft.ext.Experiment.ebShrinkRates(T(s, dir, "lineitem"),
          "l_partkey", col("l_returnflag") === "R")
        .filter(col("l_partkey") <= 400)
        .orderBy(col("l_partkey"))),

    // Mann-Whitney U rank-sum test — the NONPARAMETRIC twin of
    // x_ab_test below (revenue is skewed; the Welch z assumes what it
    // shouldn't): does variant A's purchase-value distribution
    // stochastically dominate B's? Reuses auc's bucketed two-phase
    // machinery verbatim (U = auc·n_a·n_b) — no global window;
    // tie-corrected normal z pinned at 9dp.
    "x_mann_whitney" -> ((s, dir) =>
      graft.ext.Eval.mannWhitney(
        Events.loadEvents(s, dir)
          .filter(col("event_type") === "purchase")
          .withColumn("a",
            Sampling.bucketOf(col("user_id"), 7) < 500000L),
        col("value"), col("a"))),

    // Wald SPRT evaluated at DAY boundaries — the early-stopping
    // complement of x_ab_test's fixed-horizon z: per variant, daily
    // conversion partials (conversion = purchase among all events,
    // base rate ~0.2 vs H0 p=0.15 / H1 p=0.20, α=0.05 β=0.10), then
    // the cumulative log-likelihood-ratio walk over the
    // experiment-calendar-bounded day axis (windows PARTITIONED BY
    // variant — no global window) with the first-crossing decision
    // held sticky. ln terms are in-plan round(log(..),9) literals
    // (the PMI convention), constant-folded by Catalyst; the llr
    // itself pins at 6dp.
    "x_sprt" -> ((s, dir) => {
      val l1 = round(log(lit(0.20) / lit(0.15)), 9)
      val l0 = round(log(lit(0.80) / lit(0.85)), 9)
      val ub = round(log(lit(0.90) / lit(0.05)), 9) // ln((1-β)/α)
      val lb = round(log(lit(0.10) / lit(0.95)), 9) // ln(β/(1-α))
      val daily = Events.loadEvents(s, dir)
        .withColumn("variant",
          when(Sampling.bucketOf(col("user_id"), 7) < 500000L, "A")
            .otherwise("B"))
        .withColumn("day", expr("ts_sec div 86400"))
        .withColumn("conv",
          (col("event_type") === "purchase").cast("long"))
        .groupBy(col("variant"), col("day"))
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("n_conv"))
      val w = Window.partitionBy(col("variant")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val byVariant = Window.partitionBy(col("variant"))
      daily
        .withColumn("cum_n", sum(col("n")).over(w))
        .withColumn("cum_conv", sum(col("n_conv")).over(w))
        .withColumn("llr", round(col("cum_conv") * l1 +
          (col("cum_n") - col("cum_conv")) * l0, 6))
        .withColumn("decision",
          when(col("llr") >= ub, "accept_h1")
            .when(col("llr") <= lb, "accept_h0")
            .otherwise("continue"))
        .withColumn("stop_day",
          min(when(col("decision") =!= "continue", col("day")))
            .over(byVariant))
        .withColumn("stopped",
          col("stop_day").isNotNull && col("day") >= col("stop_day"))
        .select(col("variant"), col("day"), col("n"), col("n_conv"),
          col("cum_n"), col("cum_conv"), col("llr"), col("decision"),
          col("stopped"))
        .orderBy(col("variant"), col("day"))
    }),

    // A/B-test analysis: users hash-split into two variants (the
    // deterministic splitByHash assignment), purchase values compared
    // by a pooled two-sample z-score. Every aggregate is an exact
    // DECIMAL accumulation; mean/variance/z use only IEEE-exact basic
    // ops (+,-,*,/ and sqrt are exactly-rounded), so the statistic is
    // bit-identical on any engine with no rounding fudge.
    "x_ab_test" -> ((s, dir) => {
      val ev = Events.loadEvents(s, dir)
        .filter(col("event_type") === "purchase")
        .withColumn("variant",
          when(Sampling.bucketOf(col("user_id"), 7) < 500000L, "A")
            .otherwise("B"))
      val perVariant = ev.groupBy(col("variant")).agg(
        count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double")
          .as("s1"),
        sum((col("value") * col("value")).cast(DecimalType(28, 6)))
          .cast("double").as("s2"))
        .select(col("variant"), col("n"),
          (col("s1") / col("n")).as("mean"),
          ((col("s2") - col("s1") * col("s1") / col("n")) /
            (col("n") - 1)).as("variance"))
      val a = perVariant.filter(col("variant") === "A")
        .select(col("n").as("n_a"), col("mean").as("mean_a"),
          col("variance").as("var_a"))
      val b = perVariant.filter(col("variant") === "B")
        .select(col("n").as("n_b"), col("mean").as("mean_b"),
          col("variance").as("var_b"))
      a.crossJoin(b).select(col("n_a"), col("n_b"),
        col("mean_a"), col("mean_b"),
        ((col("mean_a") - col("mean_b")) /
          sqrt(col("var_a") / col("n_a") + col("var_b") / col("n_b")))
          .as("z_score"))
    }),

    // Moving-average forecast baseline: per event type, each day's
    // forecast is the trailing-7-day mean of daily totals (frame
    // excludes the current day), plus the absolute error — the
    // seasonal-naive baseline every forecasting pipeline starts from.
    // Window sums are DECIMAL-exact; mean and error are IEEE divisions.
    "x_forecast_ma" -> ((s, dir) => {
      val daily = Events.loadEvents(s, dir)
        .groupBy(col("event_type"),
          expr("ts_sec div 86400").as("day"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).as("total"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-7, -1)
      daily
        .select(col("event_type"), col("day"),
          col("total").cast("double").as("total"),
          (sum(col("total")).over(w).cast("double") /
            count(col("total")).over(w)).as("forecast"))
        .filter(col("forecast").isNotNull)
        .withColumn("abs_err", abs(col("total") - col("forecast")))
        .orderBy(col("event_type"), col("day"))
    }),

    // Cumulative gains / lift deciles of the quality score against the
    // en-language label — "the top decile holds X% of positives", the
    // campaign-targeting readout. Ranking work on the distinct-score
    // table only (AUC's bounded-domain argument).
    "x_gains" -> ((s, dir) =>
      Eval.gainsTable(scoreFrame(T(s, dir, "documents")), col("s"),
          col("y"), nBuckets = 10)
        .orderBy(col("bucket"))),

    // Classical additive seasonal decomposition of daily event value
    // (weekly period): centered-MA trend, re-centered per-weekday
    // seasonal means, remainder — the diagnostic plot Holt-Winters'
    // state summarizes. DECIMAL-pinned sums throughout.
    "x_seasonal_decompose" -> ((s, dir) => {
      val daily = Events.loadEvents(s, dir)
        .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
        .agg(sum(col("value").cast(DecimalType(18, 2)))
          .cast("double").as("total"))
      graft.ext.Forecast.seasonalDecompose(daily, Seq("event_type"),
          "day", "total", period = 7)
        // 6dp pin on the phase-mean-derived columns: the decimal-cast
        // path for ARBITRARY doubles rounds differently per engine at
        // ~1e-10 (measured); trend is decimal-exact and needs none
        .select(col("event_type"), col("day"), col("total"),
          col("trend"), round(col("seasonal"), 6).as("seasonal"),
          round(col("remainder"), 6).as("remainder"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Split-conformal prediction intervals on the MA forecast: per
    // event type, the 90th-percentile absolute residual becomes every
    // interval's half-width — distribution-free coverage ≥ 0.9 on
    // exchangeable days. Exact interpolating percentile (bit-matched
    // in x_percentiles), row-local band arithmetic.
    "x_conformal" -> ((s, dir) => {
      val daily = Events.loadEvents(s, dir)
        .groupBy(col("event_type"), expr("ts_sec div 86400").as("day"))
        .agg(sum(col("value").cast(DecimalType(18, 2))).as("total"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-7, -1)
      val withF = daily
        .select(col("event_type"), col("day"),
          col("total").cast("double").as("total"),
          (sum(col("total")).over(w).cast("double") /
            count(col("total")).over(w)).as("forecast"))
        .filter(col("forecast").isNotNull)
      Eval.conformalInterval(withF, Seq("event_type"), col("forecast"),
          col("total"), alpha = 0.1)
        .select(col("event_type"), col("day"), col("total"),
          col("forecast"), col("q"), col("lo"), col("hi"), col("hit"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Two-sample Kolmogorov-Smirnov drift statistic over the bounded
    // quantity domain (50 values — the window is codebook-sized):
    // early vs late shipments. Exact integer CDF cross-products, one
    // final IEEE division.
    "x_ks_test" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
      Eval.ksTest(
        li.filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp")),
        li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")),
        "l_quantity")
    }),

    // Wasserstein-1 drift between early and late price distributions —
    // the mass-transport complement of x_ks_test, over the near-unique
    // cents domain (~60k distinct values: the two-phase bucketed
    // machinery is the point). Cents via the quantize convention
    // (round(x·100) — a double price never lands on an exact .5 tie,
    // so HALF_UP and banker's rounding agree cross-engine); exact
    // integer gaps × exact integer CDF numerators, one final IEEE
    // division; emd reported in cents.
    "x_emd_drift" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
        .withColumn("__cents",
          round(col("l_extendedprice") * 100).cast("long"))
      Eval.emd1d(
        li.filter(col("l_shipdate") < lit("1996-01-01").cast("timestamp")),
        li.filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp")),
        "__cents")
    }),

    // Event-type Markov transition matrix: P(next | current) from each
    // user's ordered event stream — one window pass for adjacent pairs,
    // one group-by for counts, transition probabilities as exact
    // integer-count IEEE divisions (bit-portable, no rounding).
    "x_markov" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_sec"), col("event_id"))
      val pairs = Events.loadEvents(s, dir)
        .select(col("user_id"), col("event_type").as("cur"),
          lag(col("event_type"), 1).over(w).as("prev"))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("cur"))
        .agg(count(lit(1)).as("n_trans"))
      val totals = pairs.groupBy(col("prev"))
        .agg(sum(col("n_trans")).as("n_from"))
      pairs.join(broadcast(totals), Seq("prev"))
        .select(col("prev"), col("cur"), col("n_trans"),
          (col("n_trans").cast("double") / col("n_from")).as("p"))
        .orderBy(col("prev"), col("cur"))
    }),

    // ---- co-occurrence mining ----------------------------------------

    // Market-basket pair support+lift: parts co-ordered within an order.
    // The default maxBasket = 64 skew guard applies at EVERY Basket
    // call site in this registry (measured-headroom rationale in the
    // Basket scaladoc: generator-bounded basket sizes 11/13/17, so 64
    // provably filters nothing — oracle parity holds — while capping
    // the quadratic/cubic per-basket emission against data drift).
    "x_copurchase" -> ((s, dir) =>
      Basket.pairSupport(T(s, dir, "lineitem"), "l_orderkey", "l_partkey")
        .orderBy(col("pair_support").desc, col("item_a"), col("item_b"))
        .limit(40)),

    // Item-item cosine over basket co-occurrence (neighborhood
    // collaborative filtering): pair/√(sa·sb) on pairSupport's grouped
    // pair machinery; 1-count noise pairs pruned at the pair aggregate.
    "x_item_cosine" -> ((s, dir) =>
      Basket.itemCosine(T(s, dir, "lineitem"), "l_orderkey", "l_partkey",
          minPairSupport = 2)
        .orderBy(col("cosine").desc, col("item_a"), col("item_b"))
        .limit(40)),

    // Recommender offline eval capstone: train/test split by order
    // hash → item-item cosine top-3 from TRAIN co-occurrence only →
    // hit-rate of TEST co-occurrence pairs against the rec lists. The
    // full neighborhood-CF evaluation loop as one lazy plan; every
    // tie-break total (cosine desc, neighbor id).
    "x_rec_eval" -> ((s, dir) => {
      val li = T(s, dir, "lineitem")
        .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
      val isTest = pmod(Hashing.hash64(col("b").cast("string"), 13),
        lit(5L)) === 0 // 20% of baskets held out
      val train = li.filter(!isTest)
      val test = li.filter(isTest)
      val sims = Basket.itemCosine(train, "b", "i",
          minPairSupport = 2)
        .select(col("item_a"), col("item_b"), col("cosine"))
        .localCheckpoint(false) // both symmetric directions below
      val sym = sims.unionByName(sims.select(col("item_b").as("item_a"),
        col("item_a").as("item_b"), col("cosine")))
      val w = Window.partitionBy(col("item_a"))
        .orderBy(col("cosine").desc, col("item_b"))
      val recs = sym.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= 3)
        .select(col("item_a"), col("item_b"))
        .localCheckpoint(false) // both rec directions below
      val testPairs = test.groupBy(col("b"))
        .agg(sort_array(collect_set(col("i"))).as("items"))
        // codegen'd pair emission (the Basket.pairSupport shape)
        .select(col("items"), posexplode(col("items")).as(Seq("j", "a")))
        .select(col("a"),
          explode(slice(col("items"), col("j") + lit(2),
            greatest(size(col("items")) - col("j") - 1, lit(0))))
            .as("c"))
        .distinct()
        .localCheckpoint(false) // the hits semi-join AND the count
      val hits = testPairs
        .join(recs.select(col("item_a").as("a"), col("item_b").as("c"))
          .unionByName(recs.select(col("item_b").as("a"),
            col("item_a").as("c")))
          .distinct(), Seq("a", "c"), "left_semi")
      testPairs.agg(count(lit(1)).as("n_test_pairs"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
        .select(col("n_test_pairs"), col("n_hits"),
          (col("n_hits").cast("double") /
            col("n_test_pairs").cast("double")).as("hit_rate"))
    }),

    // Frequent triples (the 3-itemset step): C(b,3) row-local emission
    // from the sorted basket array, support-pruned at the aggregate.
    "x_itemsets3" -> ((s, dir) =>
      Basket.tripleSupport(T(s, dir, "lineitem"), "l_orderkey",
          "l_partkey", minSupport = 2)
        .orderBy(col("support").desc, col("item_a"), col("item_b"),
          col("item_c"))
        .limit(30)),

    // ---- string similarity join --------------------------------------

    // Edit-distance self-join (exact recall): part names within
    // Levenshtein 1..2 via PassJoin segment blocking — candidates are
    // pairs sharing an exact segment at a compatible position, so cost
    // scales with matches, not length-band density² (the selfJoin
    // band form measured 20× cost for 10× rows). Input bounded to one
    // size decile to keep the oracle's cross-join re-derivation cheap.
    // distinct-value form: the name domain is tiny relative to rows
    // (64 values over 20 k parts at sf0.1), so the segment machinery
    // runs over |values|, the value-pair relation broadcasts back, and
    // no identical-string candidate is ever enumerated (measured
    // 4.7 s → sub-second; the row-level form re-verified each value
    // pair n_a·n_b times).
    // p_partkey < 2000 is the replica-stable id bound (the
    // x_sorted_neighborhood convention): with only 64 distinct names,
    // the EXPANDED id-pair relation is quadratic in ids-per-name, so
    // an unbounded probe set at the ×F oracle replica (ids stride,
    // values replicate verbatim) inflates the OUTPUT by F² — the ×100
    // sweep measured ~19 B pre-limit rows, hours on both engines. The
    // bound keeps the query constant-cost at any replication factor
    // (strided replicas never qualify) without touching the
    // operator's own cost model (∝ matches).
    "x_editdist_join" -> ((s, dir) =>
      EditDistJoin.segmentJoinDistinct(
          T(s, dir, "part")
            .filter(col("p_size") <= 10 && col("p_partkey") < 2000),
          "p_partkey", "p_name", maxDist = 2, minDist = 1)
        .orderBy(col("dist"), col("id_a"), col("id_b"))
        .limit(100)),

    // Sorted-neighborhood ER blocking (merge/purge): candidates = parts
    // within 2 positions in the per-block (first name token) sort of
    // p_name — lead() over one by-block window, no self-join. The
    // prefix-adjacency complement to the segment/band blocking above.
    "x_sorted_neighborhood" -> ((s, dir) =>
      Dedup.sortedNeighborhoodPairs(
          T(s, dir, "part").filter(col("p_partkey") < 500),
          "p_partkey", "p_name",
          k => substring_index(k, " ", 1), window = 2)
        .orderBy(col("id_a"), col("id_b"))),

    // The full ER candidate pipeline: sorted-neighborhood blocking →
    // native codegen'd Jaro-Winkler scoring → similarity threshold.
    // Scores rounded to 6 dp on both engines (summation-order ulps
    // inside another engine's kernel are not contractual); DuckDB's
    // jaro_winkler_similarity is the oracle scorer.
    "x_jaro_score" -> ((s, dir) =>
      Dedup.sortedNeighborhoodPairs(
          T(s, dir, "part").filter(col("p_partkey") < 500),
          "p_partkey", "p_name",
          k => substring_index(k, " ", 1), window = 2)
        .select(col("id_a"), col("id_b"),
          round(graft.functions.native_fns.jaro_winkler(
            col("key_a"), col("key_b")), 6).as("jw"))
        .filter(col("jw") >= 0.8)
        .orderBy(col("id_a"), col("id_b"))),

    // ---- weighted sampling -------------------------------------------

    // Sequential Poisson (Ohlsson) πps sample: 50 docs weighted by
    // n_chars, priority = hash-uniform / weight — engine-portable
    // (IEEE divisions only), TakeOrderedAndProject plan.
    "x_sample_weighted" -> ((s, dir) =>
      Sampling.weightedPrioritySample(T(s, dir, "documents"),
          "doc_id", "n_chars", k = 50)
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id"))),

    // ---- skip-gram co-occurrence -------------------------------------

    // word2vec-style (center, context) pairs within a ±2 window
    // (directional), counted corpus-wide; pair generation is row-local
    // zip_with against shifted slices — the only shuffle is the count.
    "x_skipgram" -> ((s, dir) =>
      TextAnalysis.skipgramPairs(T(s, dir, "documents"), "text",
          window = 2)
        .orderBy(col("n_pairs").desc, col("w"), col("c"))
        .limit(50)),

    // TextRank keyword extraction (Mihalcea & Tarau): PageRank over the
    // word co-occurrence graph — skipgram pairs ≥2 → undirected edges →
    // 3 damped integer-fixed-point iterations (Graph.pageRank, so the
    // ranks are engine-exact by construction). Top-25 corpus keywords.
    "x_textrank" -> ((s, dir) => {
      val pairs = TextAnalysis.skipgramPairs(
          T(s, dir, "documents").filter(col("doc_id") < 120), "text",
          window = 2)
        .filter(col("n_pairs") >= 2)
      val canon = pairs
        .select(least(col("w"), col("c")).as("u"),
          greatest(col("w"), col("c")).as("v"))
        .filter(col("u") =!= col("v")).distinct()
      val edges = canon.select(col("u").as("src"), col("v").as("dst"))
        .unionByName(canon.select(col("v").as("src"), col("u").as("dst")))
        .localCheckpoint(false) // referenced by nodes/deg/3 iterations
      graft.ext.Graph.pageRank(edges, iters = 3, dampingPct = 85)
        .withColumnRenamed("node", "token")
        .orderBy(col("pagerank").desc, col("token"))
        .limit(25)
    }),

    // Equi-depth histogram (the optimizer-statistics form; complements
    // a11_histogram's equal-width bins): decile boundaries come from
    // `approx_percentile` — a MERGEABLE GK sketch (map-side partials,
    // measured 0.38 s vs 2 s for exact `percentile`, whose
    // per-partition value->count maps merge in ONE task and whose cost
    // grows with the column's distinct count — the round-4 verdict's
    // single scale-killer, now gone). Boundaries ride the plan as one
    // broadcast row; bucket assignment is nine codegen'd element_at
    // comparisons, NOT a filter() lambda (the interpreted-HOF trap:
    // the lambda form measured 3.2 s extra). Approx boundaries are
    // engine-specific, so the output is the hash-checkable bound form
    // (like x_approx_sketches): per-bucket depth booleans — GK rank
    // error at accuracy=1000 is ±0.1% of n per boundary, so each of
    // the 10 buckets must hold 10% +- 2% of rows — plus the exact
    // corpus count, which the oracle re-derives exactly.
    "x_histogram_eqdepth" -> ((s, dir) => {
      val qs = (1 to 9).map(_ / 10.0).mkString(", ")
      val bounds = T(s, dir, "lineitem")
        .agg(expr(
          s"approx_percentile(l_extendedprice, array($qs), 1000)").as("bs"))
      val bucket = (1 to 9)
        .map(i => when(element_at(col("bs"), i) < col("v"), 1)
          .otherwise(0))
        .reduce(_ + _)
      T(s, dir, "lineitem")
        .select(col("l_extendedprice").as("v"))
        .crossJoin(broadcast(bounds))
        .select(col("v"), bucket.as("bucket"))
        .groupBy(col("bucket"))
        .agg(count(lit(1)).as("n_rows"))
        .agg(collect_list(struct(col("bucket"), col("n_rows"))).as("bl"),
          sum(col("n_rows")).as("n_total"))
        .select(explode(col("bl")).as("b"), col("n_total"))
        .select(col("b.bucket").as("bucket"), col("n_total"),
          (col("b.n_rows") >= col("n_total") * 0.08 &&
            col("b.n_rows") <= col("n_total") * 0.12).as("depth_ok"))
        .orderBy(col("bucket"))
    }),

    // Round-5 curation capstone: exact dedup → blocklist → length gate
    // → deterministic train split → shard assignment, ONE lazy plan
    // ending in a per-shard manifest (the export-audit row a training
    // run consumes). Every stage is the oracle-checked operator above;
    // the composition never materializes, collects, or re-scans.
    "x_llm_pipeline2" -> ((s, dir) => {
      val docs = T(s, dir, "documents")
      val surv = Dedup.dropExactDups(docs, "doc_id", "text")
      val clean = surv
        .filter(TextAnalysis.vocabHits(TextAnalysis.tokens(col("text")),
          Seq("slow", "broken", "spill")) === 0)
        .filter(col("n_chars") >= 100 && col("n_chars") <= 2000)
      val train = Sampling.splitByHash(clean, "doc_id",
          Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1), seed = 1)
        .filter(col("split") === "train")
      Sampling.shardAssign(train, "doc_id", nShards = 8, seed = 2)
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("total_chars"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy(col("shard"))
    }),

    // Blocklist scan — the word-filter curation stage (NSFW/toxicity
    // blocklists): per-doc hit count against a term list + keep flag.
    // Row-local (one scan, no shuffle); the list broadcasts as plan
    // literals, the production shape for the usual few-thousand-term
    // lists.
    "x_blocklist" -> ((s, dir) => {
      val blocklist = Seq("slow", "broken", "spill")
      T(s, dir, "documents").select(
        col("doc_id"),
        TextAnalysis.vocabHits(TextAnalysis.tokens(col("text")),
          blocklist).as("n_hits"))
        .withColumn("keep", col("n_hits") === 0)
        .orderBy(col("doc_id"))
    }),

    // ---- robust statistics -------------------------------------------

    // Per-group winsorized stats: clip to [p05, p95], count clips,
    // decimal-exact clipped sum + one-division mean.
    // Theil-Sen robust trend of MONTHLY revenue per status: median of
    // all pairwise slopes + median-residual intercept — OLS-breaking
    // outlier periods move the answer by nothing. O(n²) pairs per
    // group is the operator's contract, which is exactly why the
    // series is the ~84-month aggregate, not 2.4k days: the daily form
    // measured 23 s (8.6M slopes through an exact percentile) vs
    // sub-second monthly — Theil-Sen is a bounded-series operator.
    "x_theil_sen" -> ((s, dir) => {
      val monthly = T(s, dir, "orders")
        .groupBy(col("o_orderstatus").as("status"),
          expr("unix_micros(cast(o_orderdate as timestamp)) " +
            "div 86400000000 div 30").as("month"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("revenue"))
      graft.agg.Robust.theilSen(monthly, "status", "month", "revenue")
        .orderBy(col("status"))
    }),

    // Robust scaling (median/IQR) of quantity per return flag, fitted
    // on the full data, shown on a keyed subset — the outlier-immune
    // standardization next to x_feature_scale's z-score.
    "x_robust_scale" -> ((s, dir) =>
      graft.agg.Robust.robustScale(T(s, dir, "lineitem"),
          "l_returnflag", "l_quantity")
        .filter(col("l_orderkey") < 2000)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_returnflag"), col("l_quantity"),
          col("l_quantity_scaled"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // Quantile transform (percent_rank to uniform [0,1]) of account
    // balance within each segment — the rank-based feature map that
    // kills both scale and shape.
    "x_quantile_transform" -> ((s, dir) =>
      T(s, dir, "customer")
        .withColumn("q_acctbal", percent_rank().over(
          Window.partitionBy(col("c_mktsegment"))
            .orderBy(col("c_acctbal"), col("c_custkey"))))
        .filter(col("c_custkey") < 300)
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          col("q_acctbal"))
        .orderBy(col("c_custkey"))),

    // Exact Gini coefficient of per-customer spend within each market
    // segment (revenue-concentration / inequality audit): DECIMAL rank
    // sums, tie-permutation-invariant, one IEEE division per group.
    "x_gini" -> ((s, dir) => {
      val spend = T(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("spend"))
      val seg = T(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      graft.agg.Robust.gini(spend.join(seg, Seq("o_custkey")),
          "c_mktsegment", "spend")
        .orderBy(col("c_mktsegment"))
    }),

    // Exact lower weighted median (interpolation-free integer rule —
    // the only weighted-median convention with a cross-engine
    // contract): revenue-weighted quantity center per return flag.
    // Quantity's 50-value domain keeps the per-group cumulative window
    // codebook-sized — the operator's intended bounded-domain shape
    // (a near-unique value column would drag the window to data size).
    "x_weighted_median" -> ((s, dir) =>
      graft.agg.Robust.weightedMedian(
          T(s, dir, "lineitem").withColumn("w_cents",
            round(col("l_extendedprice") * 100).cast("long")),
          "l_returnflag", "l_quantity", "w_cents")
        .orderBy(col("l_returnflag"))),

    // Blocked k-NN graph over the embedding corpus: sign-band LSH
    // candidates (the nearDupPairs machinery, no threshold) → per-node
    // top-3 by exact quantized cosine. The all-pairs neighbor-graph
    // primitive behind SemDeDup-style curation, bucketed not O(n²);
    // the oracle replays the same candidate blocks.
    "x_knn_graph" -> ((s, dir) => {
      val cand = Similarity.nearDupPairs(T(s, dir, "embeddings"),
          "vec_id", "embedding", maxId = 150L, threshold = -1.0)
        // referenced by BOTH directions of the symmetric union — the
        // LSH candidate derivation ran twice (8 scans, no reuse)
        .localCheckpoint(false)
      val sym = cand.select(col("id_a").as("vec_id"), col("id_b").as("nb"),
          col("cosine"))
        .unionByName(cand.select(col("id_b").as("vec_id"),
          col("id_a").as("nb"), col("cosine")))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cosine").desc, col("nb"))
      sym.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .select(col("vec_id"), col("rk"), col("nb"), col("cosine"))
        .orderBy(col("vec_id"), col("rk"))
    }),

    // k-NN label-noise audit over the same sign-band blocks as
    // x_knn_graph: 5 nearest candidates vote with their labels; rows
    // where a majority disagrees with the own label are the suspected
    // mislabels. Exact integer votes; oracle replays blocks + vote.
    "x_label_noise" -> ((s, dir) =>
      Similarity.knnLabelDisagreement(T(s, dir, "embeddings"),
        "vec_id", "embedding", "label", k = 5, maxId = 150L)),

    // k-center greedy coreset (farthest-point traversal) over the
    // pinned embedding subset: 8 maximally-spread exemplars from seed
    // 0, integer-exact quantized squared-L2 argmax, running min-dist
    // folded per round against only the newest center. Oracle unrolls
    // the identical 8 steps as chained 1-row CTEs.
    "x_kcenter" -> ((s, dir) =>
      Similarity.kCenterGreedy(
        T(s, dir, "embeddings").filter(col("vec_id") < 150),
        "vec_id", "embedding", k = 8, seedId = 0L)),

    // Source×source shingle-vocabulary overlap — the corpus-level
    // cross-contamination matrix (x_decontaminate is the per-document
    // view). Posting lists are ≤|sources| long, pair work ∝ grams ×
    // C(|sources|,2), never corpus².
    "x_source_overlap" -> ((s, dir) =>
      graft.ext.TextAnalysis.sourceOverlap(T(s, dir, "documents"),
        "source", "text")),

    "x_winsorize" -> ((s, dir) =>
      graft.agg.Robust.winsorizedStats(T(s, dir, "lineitem"),
          "l_returnflag", "l_extendedprice", 0.05, 0.95)
        // the exact-decimal sum compares as a fixed-scale STRING: at
        // ×100 it exceeds double's 17 significant digits, and DuckDB's
        // pandas bridge degrades wide decimals to float64 — the padded
        // string form is exact on both engines at any magnitude
        .withColumn("clipped_sum", col("clipped_sum").cast("string"))
        .orderBy(col("l_returnflag"))),

    // ---- join breadth: full outer ------------------------------------

    // Full-outer join of per-customer order totals vs the customer dim,
    // folded to a 3-row presence summary (both/cust_only/order_only).
    "x_join_full" -> ((s, dir) => {
      val totals = T(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .cast("double").as("total_price"),
          count(lit(1)).as("n_orders"))
      T(s, dir, "customer").join(totals,
          col("c_custkey") === col("o_custkey"), "full_outer")
        .groupBy(
          when(col("c_custkey").isNull, "order_only")
            .when(col("o_custkey").isNull, "cust_only")
            .otherwise("both").as("side"))
        .agg(count(lit(1)).as("n_rows"),
          sum(col("n_orders")).as("n_orders"),
          sum(col("total_price").cast(DecimalType(18, 2))).cast("double")
            .as("total_price"))
        .orderBy(col("side"))
    }),

    // ---- ordered string aggregation ----------------------------------

    // Deterministic grouped concat: sorted names per (segment, nation)
    // — collect_list is unordered by contract, so sort inside the
    // aggregate buffer via array_sort before joining.
    "x_string_agg" -> ((s, dir) =>
      T(s, dir, "customer")
        .filter(col("c_nationkey").isin(1, 2))
        .groupBy(col("c_mktsegment"), col("c_nationkey"))
        .agg(count(lit(1)).as("n_names"),
          array_join(array_sort(collect_list(col("c_name"))), "|")
            .as("names"))
        .orderBy(col("c_mktsegment"), col("c_nationkey"))),

    // ---- table equality at scale --------------------------------------

    // Order-independent table checksum — the migration-validation
    // primitive ("did the copy/engine-swap/compaction preserve every
    // row?"): each row folds to a 60-bit md5-derived hash of its
    // canonical string (DECIMAL renderings for floats — engine-stable
    // text), and the table signature is count + XOR-fold + min/max of
    // the row hashes. XOR is order- and partitioning-independent with
    // no overflow; count catches the even-duplicate cancellation XOR
    // alone would miss. One scan, one 4-value aggregate — at 100 TB
    // this is the cheapest whole-table equality proof available.
    "x_table_checksum" -> ((s, dir) => {
      val rowStr = concat_ws("|",
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"),
        col("l_quantity").cast(DecimalType(18, 2)).cast("string"),
        col("l_extendedprice").cast(DecimalType(18, 2)).cast("string"),
        col("l_discount").cast(DecimalType(18, 2)).cast("string"),
        col("l_tax").cast(DecimalType(18, 2)).cast("string"),
        col("l_returnflag"), col("l_linestatus"),
        expr("unix_micros(cast(l_shipdate as timestamp)) div 1000000"))
      T(s, dir, "lineitem")
        .select(Hashing.hash64(rowStr, 42).as("h"))
        .agg(count(lit(1)).as("n_rows"),
          expr("bit_xor(h)").as("xor_sig"),
          min(col("h")).as("min_h"), max(col("h")).as("max_h"))
    }),

    // ---- copy-on-write table mutations (io/Cow over the versioned
    // manifest store) ---------------------------------------------------

    // Row-level DELETE, copy-on-write: the part table lands as a 4-file
    // manifest-tracked table, `DELETE WHERE p_size < 15` rewrites ONLY
    // files containing matching rows (new parquet + next manifest
    // version; old files stay for time travel), and the post-delete
    // snapshot aggregates to exactly "WHERE NOT (p_size < 15)" — which
    // is the oracle. CowSpec pins the physical side (untouched files
    // keep their paths, pre-delete version still serves deleted rows);
    // this query oracle-checks the visible table state.
    "x_cow_delete" -> ((s, dir) =>
      withCowTable(s, dir, "part", Seq("p_partkey", "p_size")) {
        (data, man) =>
          graft.io.Cow.deleteWhere(s, data, man, col("p_size") < 15)
          graft.io.ZoneMap.scanAsOf(s, man,
              graft.io.ZoneMap.currentManifestVersion(s, man).get)
            .groupBy(col("p_brand"))
            .agg(count(lit(1)).as("n_parts"),
              sum(col("p_size").cast("long")).as("size_sum"),
              sum(col("p_retailprice").cast(DecimalType(18, 2)))
                .cast("double").as("price_sum"))
            .orderBy(col("p_brand"))
      }),

    // Row-level UPDATE, copy-on-write: small parts get +100 size (the
    // assignment reads the PREDICATE column — proving set-expressions
    // evaluate against the pre-update row), untouched files never
    // rewritten. The post-update snapshot equals the CASE expression
    // the oracle states; integer arithmetic, exact across engines.
    "x_cow_update" -> ((s, dir) =>
      withCowTable(s, dir, "part", Seq("p_partkey", "p_size")) {
        (data, man) =>
          graft.io.Cow.updateWhere(s, data, man, col("p_size") < 15,
            Map("p_size" -> (col("p_size") + 100)))
          graft.io.ZoneMap.scanAsOf(s, man,
              graft.io.ZoneMap.currentManifestVersion(s, man).get)
            .groupBy(col("p_brand"))
            .agg(count(lit(1)).as("n_parts"),
              sum(col("p_size").cast("long")).as("size_sum"),
              min(col("p_size")).as("min_size"))
            .orderBy(col("p_brand"))
      }),

    // ---- privacy risk audits ------------------------------------------

    // k-anonymity: every (segment, nation) equivalence class of the
    // customer table with its size and the re-identifiability flag
    // (class smaller than k = 10), plus the one-row corpus gate.
    "x_k_anonymity" -> ((s, dir) =>
      graft.ext.Privacy.kAnonymity(T(s, dir, "customer"),
          Seq("c_mktsegment", "c_nationkey"), k = 10)
        .orderBy(col("c_mktsegment"), col("c_nationkey"))),

    "x_k_anon_summary" -> ((s, dir) =>
      graft.ext.Privacy.kAnonymitySummary(T(s, dir, "customer"),
        Seq("c_mktsegment", "c_nationkey"), k = 10)),

    // Enforcement, not just audit: suppress rows in sub-k classes, then
    // re-audit — the released table must be k-anonymous by construction
    // (0 risky classes, min class size >= k).
    "x_k_suppress" -> ((s, dir) =>
      graft.ext.Privacy.kAnonymitySummary(
        graft.ext.Privacy.suppressRisky(T(s, dir, "customer"),
          Seq("c_mktsegment", "c_nationkey"), k = 3),
        Seq("c_mktsegment", "c_nationkey"), k = 3)),

    // Randomized response (LOCAL DP): 40% of rows report a uniform
    // segment keyed on deterministic md5 draws; the debiased estimates
    // recover the true histogram to sampling noise. Released beside
    // the exact counts so the oracle pins mechanism AND estimator.
    "x_rr_release" -> ((s, dir) => {
      val segs = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY")
      val noisy = graft.ext.Privacy.randomizedResponse(
        T(s, dir, "customer"), "c_custkey", "c_mktsegment", segs,
        pThousandths = 400, seed = 2)
      val truth = T(s, dir, "customer").groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_true"))
      graft.ext.Privacy.rrDebias(noisy, "c_mktsegment", segs,
          pThousandths = 400)
        .join(truth, Seq("c_mktsegment"))
        .orderBy(col("c_mktsegment"))
    }),

    // ε-DP count release (Laplace mechanism, ε=0.5): per-segment counts
    // + deterministic inverse-CDF noise from the md5 hash of the group
    // key — re-running the release never spends fresh budget. True
    // counts deliberately absent from the output.
    "x_dp_counts" -> ((s, dir) =>
      graft.ext.Privacy.dpCounts(T(s, dir, "customer"),
          Seq("c_mktsegment"), epsilon = 0.5, seed = 0)
        .orderBy(col("c_mktsegment"))),

    // l-diversity: a class can be k-anonymous yet expose its sensitive
    // attribute when all members share one value — per-class distinct
    // count of the sensitive column (here: nation as the sensitive
    // attribute of a segment-level release).
    "x_l_diversity" -> ((s, dir) =>
      graft.ext.Privacy.lDiversity(T(s, dir, "customer"),
          Seq("c_mktsegment"), "c_nationkey", l = 3)
        .orderBy(col("c_mktsegment"))),

    // ---- corpus coverage ----------------------------------------------

    // Vocabulary coverage curve: what fraction of all token occurrences
    // the top-k tokens cover, at the standard checkpoints — the
    // tokenizer-budget planning curve (Zipf head mass). Corpus counts
    // are one group-by; the curve itself lives on the top-500 rows
    // (driver-bounded by construction, like a codebook), so the global
    // rank window is over 500 rows, never the vocabulary.
    "x_vocab_coverage" -> ((s, dir) => {
      // |vocab|-row count table referenced twice (total + top) — lazy
      // barrier so the corpus scan runs once, not per reference
      val counts = T(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
        .localCheckpoint(false)
      val total = counts.agg(sum(col("n")).as("__total"))
      val top = counts.orderBy(col("n").desc, col("token")).limit(500)
      val w = Window.orderBy(col("n").desc, col("token"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val ranked = top
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n").desc, col("token"))))
        .withColumn("cum_n", sum(col("n")).over(w))
      ranked.filter(col("rank").isin(1, 2, 3, 5, 10, 20, 50, 100, 250, 500))
        .crossJoin(broadcast(total))
        .select(col("rank"), col("cum_n"),
          (col("cum_n").cast("double") / col("__total")).as("coverage"))
        .orderBy(col("rank"))
    }),

    // ---- training-batch construction ----------------------------------

    // Length-bucketed batches: docs bucketed by n_chars edge list, then
    // packed into 32-doc batches in doc_id order within each bucket via
    // the two-phase distributed prefix rank (no per-bucket global
    // window). Per-batch audit: size, id span, length span — the
    // padding-waste planning table.
    "x_length_batches" -> ((s, dir) =>
      TextAnalysis.lengthBatches(T(s, dir, "documents"), "doc_id",
          "n_chars", bucketBounds = Seq(200L, 500L, 1000L),
          batchSize = 32)
        .groupBy(col("len_bucket"), col("batch_idx"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"),
          min(col("len")).as("min_len"), max(col("len")).as("max_len"))
        .orderBy(col("len_bucket"), col("batch_idx")))
  )

  /** COW query fixture: copy table `name` into a fresh manifest-tracked
    * temp table (4 range-partitioned files), run `body(dataDir,
    * manifestPath)`, materialize its result, clean the temp dir up.
    * The eager localCheckpoint is what lets the backing files vanish
    * while the returned frame stays usable.
    */
  private def withCowTable(s: SparkSession, dir: String, name: String,
                           statsCols: Seq[String])(
      body: (String, String) => DataFrame): DataFrame = {
    val tmp = java.nio.file.Files
      .createTempDirectory(s"graft_cow_$name").toString
    try {
      val data = s"$tmp/data"; val man = s"$tmp/manifest"
      T(s, dir, name)
        .repartitionByRange(4, col(statsCols.head))
        .write.parquet(data)
      graft.io.ZoneMap.commitManifest(
        graft.io.ZoneMap.buildManifest(s, data, statsCols), man)
      body(data, man).localCheckpoint(true)
    } finally deleteRecursively(tmp)
  }

  private def deleteRecursively(p: String): Unit = {
    import java.nio.file.{Files, Paths, Path}
    val root = Paths.get(p)
    if (Files.exists(root)) {
      val stream = Files.walk(root)
      try {
        stream.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
      } finally stream.close()
    }
  }

  // ---- oracles --------------------------------------------------------

  /** Shared BM25 CTE chain ending at `bmranked(query_id, cand_id, bm25,
    * rank)` — mirrors [[graft.ext.Retrieval.bm25TopK]] op-for-op: Lucene
    * idf, `(1.2 + 1)` / `(1 - 0.75 + …)` written as the same IEEE
    * expression trees Spark folds, per-term DECIMAL(28,9) cast before the
    * order-independent sum.
    */
  private def bm25Ctes: String =
    """tf AS (
         SELECT doc_id, t AS token, COUNT(*) AS tf FROM (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
           FROM documents)
         GROUP BY 1, 2),
       dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
              FROM tf GROUP BY 1),
       stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                        CAST(SUM(dl) AS DOUBLE) AS toktotal FROM dl),
       dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
       qt AS (SELECT doc_id AS query_id, token FROM tf
              WHERE doc_id IN (0, 1, 2, 3, 4)),
       terms AS (
         SELECT qt.query_id, tf.doc_id AS cand_id,
           CAST(ln((n - CAST(df AS DOUBLE) + 0.5) /
                   (CAST(df AS DOUBLE) + 0.5) + 1)
             * (CAST(tf.tf AS DOUBLE) * (1.2 + 1))
             / (CAST(tf.tf AS DOUBLE) +
                1.2 * (1 - 0.75 + 0.75 * CAST(dl.dl AS DOUBLE) /
                  (toktotal / n)))
             AS DECIMAL(28,9)) AS term
         FROM qt JOIN tf USING (token) JOIN dfreq USING (token)
              JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats
         WHERE tf.doc_id <> qt.query_id),
       bmscored AS (SELECT query_id, cand_id,
                      CAST(SUM(term) AS DOUBLE) AS bm25
                    FROM terms GROUP BY 1, 2),
       bmranked AS (SELECT query_id, cand_id, bm25,
         CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY bm25 DESC, cand_id) AS INTEGER) AS rank
         FROM bmscored)"""

  /** Portable quantized-vector expression (DuckDB side). */
  private val qvec =
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"

  /** Exact co-moment / covariance re-derivation over the explicit
    * (i, j) upper-triangle index grid — shared by x_pca_cov (one-pass)
    * and x_pca_incremental (sliced + merged; same answer by the
    * merge-exactness contract).
    */
  private def pcaCovOracle: String =
    s"""WITH e AS (SELECT $qvec AS q FROM embeddings),
        pairs AS (
          SELECT i.i AS i, j.j AS j, q[i.i] AS xi, q[j.j] AS xj
          FROM e CROSS JOIN range(1, 65) i(i) CROSS JOIN range(1, 65) j(j)
          WHERE j.j >= i.i)
        SELECT CAST(i AS INTEGER) AS i, CAST(j AS INTEGER) AS j,
          COUNT(*) AS n, CAST(SUM(xi) AS BIGINT) AS sx,
          CAST(SUM(xj) AS BIGINT) AS sy,
          CAST(SUM(xi * xj) AS BIGINT) AS sxy,
          (CAST(SUM(xi * xj) AS DOUBLE) - CAST(SUM(xi) AS DOUBLE)
             * CAST(SUM(xj) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
            / CAST(COUNT(*) AS DOUBLE) AS cov
        FROM pairs GROUP BY 1, 2 ORDER BY i, j"""
  private def cosSql(a: String, b: String) =
    s"list_dot_product($a,$b) / (sqrt(list_dot_product($a,$a)) * sqrt(list_dot_product($b,$b)))"

  /** k-center greedy unrolled as chained 1-row CTEs: c_i = the argmax
    * of the running min-dist d_{i-1}, d_i = d_{i-1} folded with the
    * distance to c_i — the literal SQL replay of
    * [[graft.ext.Similarity.kCenterGreedy]]'s incremental rounds.
    * Squared L2 between quantized vectors is three integer-exact dot
    * products on both engines.
    */
  private def kcenterOracle(k: Int): String = {
    def sq(a: String, b: String) =
      s"(list_dot_product($a,$a) - 2*list_dot_product($a,$b)" +
        s" + list_dot_product($b,$b))"
    val sb = new StringBuilder
    sb.append(
      s"""WITH pts AS (SELECT vec_id, $qvec AS q
                       FROM embeddings WHERE vec_id < 150),
          c1 AS (SELECT vec_id, q, CAST(0 AS DOUBLE) AS mind
                 FROM pts WHERE vec_id = 0),
          d1 AS (SELECT p.vec_id, p.q, ${sq("p.q", "c.q")} AS mind
                 FROM pts p CROSS JOIN c1 c)""")
    for (i <- 2 to k) {
      val excl = (1 until i).map(j => s"SELECT vec_id FROM c$j")
        .mkString(" UNION ALL ")
      sb.append(s""",
          c$i AS (SELECT vec_id, q, mind FROM d${i - 1}
                  WHERE vec_id NOT IN ($excl)
                  ORDER BY mind DESC, vec_id LIMIT 1)""")
      if (i < k) sb.append(s""",
          d$i AS (SELECT d.vec_id, d.q,
                    LEAST(d.mind, ${sq("d.q", "c.q")}) AS mind
                  FROM d${i - 1} d CROSS JOIN c$i c)""")
    }
    val sel = (1 to k).map(i =>
      s"SELECT $i AS rk, vec_id, CAST(mind AS DOUBLE) AS mindist FROM c$i")
      .mkString("\n          UNION ALL ")
    sb.append(s"\n          $sel\n          ORDER BY rk").toString
  }

  /** SimHash oracle: 32 per-bit signed sums, assembled programmatically
    * so Spark and SQL stay in lockstep on bit count/seed. `simhashCtes`
    * ends at a `sigs(doc_id, simhash)` CTE shared by the signature dump
    * and the Hamming-band pair oracle.
    */
  private def simhashCtes: String = {
    val h = Hashing.hash64Sql("t", 0)
    val sums = (0 until Dedup.SimhashBits)
      .map(j => s"SUM(CASE WHEN (h >> $j) & 1 = 1 THEN 1 ELSE -1 END) AS c$j")
      .mkString(", ")
    val assemble = (0 until Dedup.SimhashBits)
      .map(j => s"(CASE WHEN c$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""toks AS (
          SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
          FROM documents),
        h AS (SELECT doc_id, $h AS h FROM toks),
        bits AS (SELECT doc_id, $sums FROM h GROUP BY doc_id),
        sigs AS (SELECT doc_id, CAST($assemble AS BIGINT) AS simhash
                 FROM bits)"""
  }

  private def simhashOracle: String =
    s"""WITH $simhashCtes
        SELECT doc_id, simhash FROM sigs ORDER BY doc_id"""

  /** Hamming-band pair oracle: same 4×15-bit banding as
    * [[Dedup.simhashBandPairs]], verify by bit_count(xor) — both
    * portable DuckDB builtins.
    */
  private def simhashPairsOracle: String = {
    val width = Dedup.SimhashBits / 4
    val mask = (1L << width) - 1
    s"""WITH $simhashCtes,
        bands AS (
          SELECT doc_id, simhash, band,
                 (simhash >> (band * $width)) & $mask AS band_val
          FROM sigs CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band)),
        cand AS (
          SELECT DISTINCT a.doc_id AS id_a, a.simhash AS sig_a,
                          b.doc_id AS id_b, b.simhash AS sig_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_val = b.band_val
           AND a.doc_id < b.doc_id)
        SELECT id_a, id_b,
               CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
        FROM cand
        WHERE bit_count(xor(sig_a, sig_b)) <= 3
        ORDER BY id_a, id_b"""
  }

  /** MinHash oracle: 8 affine-permutation signatures over word
    * 3-shingles (one md5 base hash per shingle, k integer permutations
    * `(a·h+b) mod P`), 4 bands × 2 — constants shared with
    * [[Dedup.minhashSigTable]] so both engines compute identical sigs.
    */
  /** DuckDB word-3-shingle list expression over `text`. */
  private val shingleSql =
    """CASE WHEN len(string_split(lower(text), ' ')) >= 3
         THEN list_transform(
           range(1, len(string_split(lower(text), ' ')) - 1),
           i -> string_split(lower(text), ' ')[i] || ' ' ||
                string_split(lower(text), ' ')[i+1] || ' ' ||
                string_split(lower(text), ' ')[i+2])
         ELSE [lower(text)] END"""

  /** Shared CTE chain: shingles → base hash → 8 sigs → 4 bands → distinct
    * candidate pairs. Constants shared with [[Dedup.minhashSigTable]].
    * sigs/bands/cand are MATERIALIZED: downstream graph oracles
    * (labelProp / modularity) reference `cand` through `edges` several
    * times, and DuckDB's default CTE inlining re-derives this whole
    * minhash prefix per reference — the same blowup [[louvainOracle]]
    * documents (x_modularity at the x10 replica: >120 s inlined,
    * 2.5 s materialized, identical result). Hints only; semantics
    * unchanged.
    */
  private def minhashCtes: String = {
    val sigs = (0 until 8).map(j =>
      s"MIN((h * ${Dedup.MinhashA(j)} + ${Dedup.MinhashB(j)}) % ${Dedup.MinhashP}) AS sig$j")
      .mkString(", ")
    val band = (b: Int) =>
      s"(SELECT doc_id, $b AS band, md5(CAST(sig${2 * b} AS VARCHAR) || '_' || CAST(sig${2 * b + 1} AS VARCHAR)) AS band_hash FROM sigs)"
    val bandsUnion = (0 until 4).map(band).mkString(" UNION ALL ")
    s"""sh AS (SELECT doc_id, $shingleSql AS sh FROM documents),
        base AS (
          SELECT doc_id, ${Hashing.hash64Sql("s", 0)} % 2147483648 AS h
          FROM (SELECT doc_id, unnest(sh) AS s FROM sh)),
        sigs AS MATERIALIZED (SELECT doc_id, $sigs FROM base GROUP BY doc_id),
        bands AS MATERIALIZED ($bandsUnion),
        cand AS MATERIALIZED (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_hash = b.band_hash
           AND a.doc_id < b.doc_id)"""
  }

  private def minhashOracle: String =
    s"""WITH $minhashCtes
        SELECT id_a, id_b FROM cand ORDER BY id_a, id_b"""

  /** Incremental (batch-vs-index) oracle: same band derivation, split
    * at doc_id 400, Jaccard-verified collisions.
    */
  private def incrementalOracle: String =
    s"""WITH $minhashCtes,
        icand AS (
          SELECT DISTINCT b.doc_id AS batch_id, a.doc_id AS index_id
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_hash = b.band_hash
          WHERE a.doc_id < 400 AND b.doc_id >= 400),
        gsets AS (SELECT doc_id AS gid, list_distinct(sh) AS g FROM sh),
        verified AS (
          SELECT batch_id, index_id,
            CAST(len(list_intersect(bg.g, ig.g)) AS DOUBLE)
              / (len(bg.g) + len(ig.g) - len(list_intersect(bg.g, ig.g)))
              AS jaccard
          FROM icand
          JOIN gsets bg ON icand.batch_id = bg.gid
          JOIN gsets ig ON icand.index_id = ig.gid)
        SELECT batch_id, index_id, jaccard FROM verified
        WHERE jaccard >= 0.5 ORDER BY batch_id, index_id"""

  /** Transitive-closure oracle for [[Dedup.connectedComponents]]: full
    * reachability via a recursive CTE (quadratic per component — fine at
    * oracle scale), then cluster id = min reachable id.
    */
  /** Two unrolled synchronous LPA rounds over the symmetric candidate
    * graph — most-frequent neighbor label, smallest-label tie-break,
    * exactly [[graft.ext.Graph.labelPropagation]]'s semantics.
    */
  private def labelPropOracle: String =
    s"""WITH $minhashCtes,
        edges AS MATERIALIZED (
          SELECT id_a AS src, id_b AS dst FROM cand
          UNION ALL SELECT id_b, id_a FROM cand),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
        n1 AS (SELECT e.src, l.label, COUNT(*) AS c
               FROM edges e JOIN l0 l ON e.dst = l.node GROUP BY 1, 2),
        l1 AS (SELECT src AS node, label FROM (
                 SELECT src, label, row_number() OVER (
                   PARTITION BY src ORDER BY c DESC, label) AS rn
                 FROM n1) WHERE rn = 1),
        n2 AS (SELECT e.src, l.label, COUNT(*) AS c
               FROM edges e JOIN l1 l ON e.dst = l.node GROUP BY 1, 2),
        l2 AS (SELECT src AS node, label FROM (
                 SELECT src, label, row_number() OVER (
                   PARTITION BY src ORDER BY c DESC, label) AS rn
                 FROM n2) WHERE rn = 1)
        SELECT node AS doc_id, label AS community
        FROM l2 ORDER BY doc_id"""

  /** Same minhash graph + 2-round LPA CTEs as [[labelPropOracle]], then
    * Newman modularity of that partition as exact integer sums into one
    * final division — mirrors Graph.modularity operation-for-operation.
    */
  private def modularityOracle: String =
    s"""WITH $minhashCtes,
        edges AS MATERIALIZED (
          SELECT id_a AS src, id_b AS dst FROM cand
          UNION ALL SELECT id_b, id_a FROM cand),
        l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges),
        n1 AS (SELECT e.src, l.label, COUNT(*) AS c
               FROM edges e JOIN l0 l ON e.dst = l.node GROUP BY 1, 2),
        l1 AS MATERIALIZED (SELECT src AS node, label FROM (
                 SELECT src, label, row_number() OVER (
                   PARTITION BY src ORDER BY c DESC, label) AS rn
                 FROM n1) WHERE rn = 1),
        n2 AS (SELECT e.src, l.label, COUNT(*) AS c
               FROM edges e JOIN l1 l ON e.dst = l.node GROUP BY 1, 2),
        l2 AS MATERIALIZED (SELECT src AS node, label FROM (
                 SELECT src, label, row_number() OVER (
                   PARTITION BY src ORDER BY c DESC, label) AS rn
                 FROM n2) WHERE rn = 1),
        em AS (
          SELECT a.label AS ca, b.label AS cb
          FROM edges JOIN l2 a ON edges.src = a.node
                     JOIN l2 b ON edges.dst = b.node),
        perc AS (
          SELECT ca, COUNT(*) AS deg,
            SUM(CASE WHEN ca = cb THEN 1 ELSE 0 END) AS lin
          FROM em GROUP BY ca),
        tot AS (
          SELECT CAST(SUM(deg) AS BIGINT) AS twoM,
            CAST(SUM(lin) AS BIGINT) AS sin,
            CAST(SUM(deg * deg) AS BIGINT) AS sdeg2
          FROM perc),
        nc AS (SELECT COUNT(DISTINCT label) AS n_communities FROM l2)
        SELECT nc.n_communities AS n_communities,
          CAST(twoM // 2 AS BIGINT) AS m_edges,
          CAST(twoM * sin - sdeg2 AS DOUBLE)
            / CAST(twoM * twoM AS DOUBLE) AS modularity
        FROM tot, nc"""

  /** Same minhash graph as [[labelPropOracle]], four parity-alternating
    * modularity-greedy rounds unrolled — mirrors Graph.modularityGreedy
    * operation-for-operation in exact integers. Every label table is
    * `AS MATERIALIZED`: each round references its predecessor FOUR
    * times (mass, k_{i,c}, own-community union, own-label join), and
    * DuckDB's default CTE inlining would re-derive the whole minhash
    * prefix 4^rounds times (measured: the inlined form did not return
    * in 6 minutes; materialized, milliseconds).
    */
  private def louvainOracle: String = {
    def round(prev: String, cur: String, r: Int) =
      s"""dm$r AS (SELECT l.label AS label, SUM(dg.k) AS D
             FROM $prev l JOIN deg dg ON l.node = dg.node GROUP BY 1),
          ki$r AS (SELECT e.src AS src, l.label AS label, COUNT(*) AS kic
             FROM e JOIN $prev l ON e.dst = l.node GROUP BY 1, 2),
          ca$r AS (SELECT src, label, SUM(kic) AS kic FROM (
               SELECT src, label, kic FROM ki$r
               UNION ALL SELECT node AS src, label, 0 AS kic FROM $prev) u
             GROUP BY 1, 2),
          sc$r AS (SELECT c.src AS src, c.label AS label, o.label AS own,
               tm.m2 * c.kic - dg.k *
                 (d.D - CASE WHEN c.label = o.label THEN dg.k ELSE 0 END)
                 AS score
             FROM ca$r c JOIN dm$r d ON c.label = d.label
             JOIN deg dg ON c.src = dg.node
             JOIN $prev o ON c.src = o.node
             CROSS JOIN tm),
          $cur AS MATERIALIZED (SELECT src AS node,
               CASE WHEN (src + $r) % 2 = 0 THEN best ELSE own END AS label
             FROM (SELECT src, own, label AS best,
                     row_number() OVER (PARTITION BY src
                       ORDER BY score DESC,
                         CASE WHEN label = own THEN 0 ELSE 1 END,
                         label) AS rn
                   FROM sc$r) WHERE rn = 1)"""
    s"""WITH $minhashCtes,
        e AS MATERIALIZED (SELECT id_a AS src, id_b AS dst FROM cand
              UNION ALL SELECT id_b, id_a FROM cand),
        deg AS MATERIALIZED (
          SELECT src AS node, COUNT(*) AS k FROM e GROUP BY 1),
        tm AS (SELECT COUNT(*) AS m2 FROM e),
        l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label
                            FROM e),
        ${round("l0", "l1", 1)},
        ${round("l1", "l2", 2)},
        ${round("l2", "l3", 3)},
        ${round("l3", "l4", 4)}
        SELECT node AS doc_id, label AS community
        FROM l4 ORDER BY doc_id"""
  }

  /** [[louvainOracle]]'s weighted two-level extension: the same
    * parity-alternating integer rounds with COUNT(*) generalized to
    * SUM(w) (every sum cast back to BIGINT — DuckDB widens integer
    * sums to HUGEINT) and self-loops excluded from k_{i,c}, plus the
    * level-1 → level-2 contraction (group-by on endpoint labels; both
    * directed rows of an internal edge land on the (c,c) self-loop, so
    * its weight is 2× internal — exactly Graph.contract). Final select
    * composes the two mappings. Same AS MATERIALIZED discipline as
    * louvainOracle: each label table is referenced four times per
    * round.
    */
  private def louvainMlOracle: String = {
    def round(e: String, deg: String, tm: String, prev: String,
              cur: String, r: Int) =
      s"""dm$cur AS (SELECT l.label AS label,
               CAST(SUM(dg.k) AS BIGINT) AS D
             FROM $prev l JOIN $deg dg ON l.node = dg.node GROUP BY 1),
          ki$cur AS (SELECT e.src AS src, l.label AS label,
               CAST(SUM(e.w) AS BIGINT) AS kic
             FROM $e e JOIN $prev l ON e.dst = l.node
             WHERE e.src <> e.dst GROUP BY 1, 2),
          ca$cur AS (SELECT src, label, CAST(SUM(kic) AS BIGINT) AS kic
             FROM (
               SELECT src, label, kic FROM ki$cur
               UNION ALL SELECT node AS src, label, 0 AS kic FROM $prev) u
             GROUP BY 1, 2),
          sc$cur AS (SELECT c.src AS src, c.label AS label, o.label AS own,
               $tm.m2 * c.kic - dg.k *
                 (d.D - CASE WHEN c.label = o.label THEN dg.k ELSE 0 END)
                 AS score
             FROM ca$cur c JOIN dm$cur d ON c.label = d.label
             JOIN $deg dg ON c.src = dg.node
             JOIN $prev o ON c.src = o.node
             CROSS JOIN $tm),
          $cur AS MATERIALIZED (SELECT src AS node,
               CASE WHEN (src + $r) % 2 = 0 THEN best ELSE own END AS label
             FROM (SELECT src, own, label AS best,
                     row_number() OVER (PARTITION BY src
                       ORDER BY score DESC,
                         CASE WHEN label = own THEN 0 ELSE 1 END,
                         label) AS rn
                   FROM sc$cur) WHERE rn = 1)"""
    s"""WITH $minhashCtes,
        e1 AS MATERIALIZED (
          SELECT id_a AS src, id_b AS dst, CAST(1 AS BIGINT) AS w FROM cand
          UNION ALL SELECT id_b, id_a, CAST(1 AS BIGINT) FROM cand),
        deg1 AS MATERIALIZED (
          SELECT src AS node, CAST(SUM(w) AS BIGINT) AS k
          FROM e1 GROUP BY 1),
        tm1 AS (SELECT CAST(SUM(w) AS BIGINT) AS m2 FROM e1),
        a0 AS MATERIALIZED (
          SELECT DISTINCT src AS node, src AS label FROM e1),
        ${round("e1", "deg1", "tm1", "a0", "a1", 1)},
        ${round("e1", "deg1", "tm1", "a1", "a2", 2)},
        e2 AS MATERIALIZED (
          SELECT x.label AS src, y.label AS dst,
            CAST(SUM(e.w) AS BIGINT) AS w
          FROM e1 e JOIN a2 x ON e.src = x.node
          JOIN a2 y ON e.dst = y.node
          GROUP BY 1, 2),
        deg2 AS MATERIALIZED (
          SELECT src AS node, CAST(SUM(w) AS BIGINT) AS k
          FROM e2 GROUP BY 1),
        tm2 AS (SELECT CAST(SUM(w) AS BIGINT) AS m2 FROM e2),
        b0 AS MATERIALIZED (
          SELECT DISTINCT src AS node, src AS label FROM e2),
        ${round("e2", "deg2", "tm2", "b0", "b1", 1)},
        ${round("e2", "deg2", "tm2", "b1", "b2", 2)}
        SELECT m.node AS doc_id, f.label AS community
        FROM a2 m JOIN b2 f ON m.label = f.node
        ORDER BY doc_id"""
  }

  private def clustersOracle: String =
    s"""WITH RECURSIVE $minhashCtes,
        edges AS (
          SELECT id_a AS src, id_b AS dst FROM cand
          UNION SELECT id_b, id_a FROM cand),
        reach(src, dst) AS (
          SELECT src, dst FROM edges
          UNION
          SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
        SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
        FROM reach GROUP BY src ORDER BY src"""

  /** Full pipeline: candidates → shingle-set Jaccard ≥ t verification →
    * greedy drop of id_b → surviving document rows.
    */
  private def dedupPipelineOracle: String =
    s"""WITH $minhashCtes,
        gsets AS (SELECT doc_id AS gid, list_distinct(sh) AS g FROM sh),
        verified AS (
          SELECT id_a, id_b,
            CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
              / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS j
          FROM cand
          JOIN gsets a ON cand.id_a = a.gid
          JOIN gsets b ON cand.id_b = b.gid),
        dropped AS (SELECT DISTINCT id_b FROM verified WHERE j >= 0.8)
        SELECT d.* FROM documents d
        WHERE NOT EXISTS (SELECT 1 FROM dropped WHERE dropped.id_b = d.doc_id)
        ORDER BY d.doc_id"""

  private def jaccard3Oracle: String =
    s"""WITH d AS (
          SELECT doc_id, list_distinct($shingleSql) AS g
          FROM documents WHERE doc_id < 150),
        docs AS (SELECT doc_id, len(g) AS ng, unnest(g) AS gram FROM d),
        pairs AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.ng AS na, b.ng AS nb,
                 COUNT(*) AS inter
          FROM docs a JOIN docs b ON a.gram = b.gram AND a.doc_id < b.doc_id
          GROUP BY 1, 2, 3, 4)
        SELECT id_a, id_b,
               CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
        FROM pairs
        WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.05
        ORDER BY id_a, id_b"""

  /** Multi-table sign-LSH bands (DuckDB side): one SELECT per table over
    * `src`, dimensions [t·bits, (t+1)·bits) per table — mirrors
    * [[Similarity.signBands]] (out-of-range list index is NULL → CASE
    * falls to 0 on both engines).
    */
  /** Query-DIRECTED probe bands: the home bucket plus only the
    * `maxProbes` flips with the smallest |coordinate| margin per
    * table (ties to the lower bit), mirroring
    * `Similarity.signBandsMultiProbeDirected`.
    */
  private def directedProbeSql(tables: Int, bits: Int, maxProbes: Int,
                               src: String): String = {
    val coords = (0 until tables).flatMap { t =>
      (0 until bits).map { j =>
        s"""SELECT vec_id, $t AS tbl, $j AS j,
            abs(CAST(embedding[${t * bits + j + 1}] AS DOUBLE)) AS m
            FROM $src"""
      }
    }.mkString(" UNION ALL ")
    s"""WITH h AS (${signBandsSql(tables, bits, src)}),
        coords AS ($coords),
        rankedc AS (
          SELECT vec_id, tbl, j,
            row_number() OVER (PARTITION BY vec_id, tbl
                               ORDER BY m, j) AS r
          FROM coords),
        flips AS (SELECT vec_id, tbl, j FROM rankedc
                  WHERE r <= $maxProbes)
        SELECT vec_id, tbl, bucket FROM h
        UNION ALL
        SELECT h.vec_id, h.tbl,
               xor(h.bucket, CAST(1 AS BIGINT) << f.j) AS bucket
        FROM h JOIN flips f ON h.vec_id = f.vec_id AND h.tbl = f.tbl"""
  }

  /** Query-side multi-probe bands: the home bucket plus each one-bit
    * flip, mirroring `Similarity.signBandsMultiProbe`.
    */
  private def multiProbeSql(tables: Int, bits: Int, src: String): String = {
    val flips = (0 until bits).map(j =>
      s"SELECT vec_id, tbl, xor(bucket, CAST(${1L << j} AS BIGINT)) AS bucket FROM h")
    s"""WITH h AS (${signBandsSql(tables, bits, src)})
        SELECT vec_id, tbl, bucket FROM h
        UNION ALL ${flips.mkString(" UNION ALL ")}"""
  }

  private def signBandsSql(tables: Int, bits: Int, src: String): String =
    (0 until tables).map { t =>
      val bucket = (0 until bits).map(j =>
        s"(CASE WHEN CAST(embedding[${t * bits + j + 1}] AS DOUBLE) >= 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
        .mkString(" + ")
      s"SELECT vec_id, $t AS tbl, $bucket AS bucket FROM $src"
    }.mkString(" UNION ALL ")

  private val langScores = TextAnalysis.LangStopwords.map { case (l, ws) =>
    val vocab = ws.map(w => s"'$w'").mkString(", ")
    l -> s"len(list_filter(string_split(lower(text), ' '), t -> t IN ($vocab)))"
  }

  def oracleSql: Map[String, String] = Map(

    "x_dedup_exact" ->
      """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
                COUNT(*) AS n_copies
         FROM documents GROUP BY 1 ORDER BY 1""",

    // Exact side of the incremental-distinct bound check: the boolean
    // asserts the merged-HLL estimate's accuracy guarantee.
    "x_incr_distinct" ->
      """SELECT o_orderstatus,
                CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
                TRUE AS hll_ok
         FROM orders GROUP BY 1 ORDER BY 1""",

    // Booleans assert the KLL sketch's rank guarantee (exact rank of
    // each estimate within ±5%) and lossless count; exact aggregation
    // makes them trivially TRUE.
    "x_quantile_rollup" ->
      """SELECT o_orderstatus, COUNT(*) AS n_rows, TRUE AS n_ok,
                TRUE AS p50_ok, TRUE AS p95_ok
         FROM orders GROUP BY 1 ORDER BY 1""",

    // Booleans assert the theta union/intersection/difference bounds;
    // exact set algebra makes them trivially TRUE.
    "x_theta_setops" -> {
      val bucket =
        s"${Hashing.hash64Sql("CAST(o_custkey AS VARCHAR)", 7)} % 10"
      s"""WITH a AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE $bucket <= 5),
          b AS (SELECT DISTINCT o_custkey FROM orders
                WHERE $bucket >= 3)
         SELECT (SELECT COUNT(*) FROM a) AS n_a,
                (SELECT COUNT(*) FROM b) AS n_b,
                (SELECT COUNT(*) FROM
                  (SELECT o_custkey FROM a UNION
                   SELECT o_custkey FROM b)) AS n_union,
                (SELECT COUNT(*) FROM
                  (SELECT o_custkey FROM a INTERSECT
                   SELECT o_custkey FROM b)) AS n_shared,
                (SELECT COUNT(*) FROM
                  (SELECT o_custkey FROM a EXCEPT
                   SELECT o_custkey FROM b)) AS n_only_a,
                TRUE AS union_ok, TRUE AS inter_ok,
                TRUE AS anotb_ok"""
    },

    // The booleans assert the sketch accuracy guarantees; exact
    // aggregation makes them trivially TRUE, so any sketch violating
    // its bound on the Spark side hash-mismatches here.
    "x_approx_sketches" ->
      """SELECT o_orderstatus,
                CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
                TRUE AS cd_ok, TRUE AS p50_ok
         FROM orders GROUP BY 1 ORDER BY 1""",

    // Booleans assert the sketch + merge accuracy bounds; exact
    // aggregation makes them trivially TRUE.
    "x_sketch_rollup" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
                CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_custs,
                TRUE AS yr_ok, TRUE AS merge_ok
         FROM orders GROUP BY 1 ORDER BY 1""",

    "x_entity_resolution" ->
      """WITH t AS (
           SELECT p_partkey, p_brand, p_retailprice,
             array_to_string(list_sort(list_distinct(
               string_split(lower(p_name), ' '))), ' ') AS entity_key
           FROM part)
         SELECT entity_key,
                MIN(p_partkey) AS cluster_id,
                COUNT(*) AS n_members,
                CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n_brands,
                CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
                  AS total_price
         FROM t GROUP BY entity_key ORDER BY cluster_id""",

    "x_dedup_minhash" -> minhashOracle,

    "x_dedup_incremental" -> incrementalOracle,

    "x_dedup_jaccard3" -> jaccard3Oracle,

    "x_dedup_pipeline" -> dedupPipelineOracle,

    "x_dedup_clusters" -> clustersOracle,
    // the incremental fold must equal the full recomputed closure
    "x_cc_incremental" -> clustersOracle,

    "x_label_prop" -> labelPropOracle,

    "x_modularity" -> modularityOracle,

    "x_louvain" -> louvainOracle,
    "x_louvain_ml" -> louvainMlOracle,

    "x_split_leakfree" ->
      s"""WITH RECURSIVE $minhashCtes,
          edges AS (
            SELECT id_a AS src, id_b AS dst FROM cand
            UNION SELECT id_b, id_a FROM cand),
          reach(src, dst) AS (
            SELECT src, dst FROM edges
            UNION
            SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
          comp AS (
            SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
            FROM reach GROUP BY src),
          r AS (
            SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS rep
            FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id),
          a AS (
            SELECT rep,
              CASE WHEN ${Sampling.bucketSql("rep", 0)} < 800000
                THEN 'train' ELSE 'test' END AS split
            FROM r)
          SELECT split, COUNT(*) AS n_docs,
            CAST(COUNT(DISTINCT rep) AS BIGINT) AS n_clusters
          FROM a GROUP BY 1 ORDER BY 1""",

    "x_events_sliding" ->
      s"""SELECT window_start, event_type, COUNT(*) AS n_events,
            ${dsumSql("value")} AS total_value
          FROM (
            SELECT event_type, value,
              unnest([sec - sec % 300 - 300, sec - sec % 300]) AS window_start
            FROM (SELECT event_type, value,
                    CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
                  FROM events))
          GROUP BY 1, 2 ORDER BY 1, 2""",

    "x_dedup_simhash" -> simhashOracle,

    "x_dedup_simhash_pairs" -> simhashPairsOracle,

    "x_dedup_jaccard" ->
      """WITH d AS (
           SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS g
           FROM documents WHERE doc_id < 150),
         docs AS (SELECT doc_id, len(g) AS ng, unnest(g) AS gram FROM d),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.ng AS na, b.ng AS nb,
                  COUNT(*) AS inter
           FROM docs a JOIN docs b ON a.gram = b.gram AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4)
         SELECT id_a, id_b,
                CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
         FROM pairs
         WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8
         ORDER BY id_a, id_b""",

    // exactness claim: the prefix-filtered engine result must equal
    // the plain all-postings jaccard at the threshold
    "x_jaccard_prefix" ->
      """WITH d AS (
           SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS g
           FROM documents WHERE doc_id < 300),
         docs AS (SELECT doc_id, len(g) AS ng, unnest(g) AS gram FROM d),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.ng AS na, b.ng AS nb,
                  COUNT(*) AS inter
           FROM docs a JOIN docs b ON a.gram = b.gram AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4)
         SELECT id_a, id_b,
                CAST(inter AS DOUBLE) / (na + nb - inter) AS jaccard
         FROM pairs
         WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8
         ORDER BY id_a, id_b""",

    "x_kmv_overlap" -> {
      def sk(expr: String, table: String) =
        s"""SELECT DISTINCT ${Hashing.hash64Sql(expr, 3)} AS hv
            FROM $table ORDER BY hv LIMIT 128"""
      s"""WITH a AS (${sk("CAST(c_custkey AS VARCHAR)", "customer")}),
          b AS (${sk("CAST(o_custkey AS VARCHAR)", "orders")}),
          u AS (SELECT DISTINCT hv FROM
                  (SELECT hv FROM a UNION ALL SELECT hv FROM b)
                ORDER BY hv LIMIT 128),
          m AS (SELECT COUNT(*) AS m FROM u
                WHERE hv IN (SELECT hv FROM a)
                  AND hv IN (SELECT hv FROM b)),
          us AS (SELECT COUNT(*) AS ku, MAX(hv) AS mx FROM u),
          sa AS (SELECT COUNT(*) AS n, MAX(hv) AS mx FROM a),
          sb AS (SELECT COUNT(*) AS n, MAX(hv) AS mx FROM b),
          ex AS (
            SELECT
              (SELECT COUNT(*) FROM
                (SELECT DISTINCT c_custkey FROM customer
                 INTERSECT SELECT DISTINCT o_custkey FROM orders))
                AS n_inter_exact,
              (SELECT COUNT(*) FROM
                (SELECT DISTINCT c_custkey FROM customer
                 UNION SELECT DISTINCT o_custkey FROM orders))
                AS n_union_exact)
          SELECT
            CAST(m.m AS DOUBLE) / CAST(us.ku AS DOUBLE) AS jaccard_est,
            CASE WHEN us.ku < 128 THEN CAST(us.ku AS DOUBLE)
                 ELSE 127.0 * 1152921504606846976.0
                      / CAST(us.mx AS DOUBLE) END AS union_distinct_est,
            CASE WHEN sa.n < 128 THEN CAST(sa.n AS DOUBLE)
                 ELSE 127.0 * 1152921504606846976.0
                      / CAST(sa.mx AS DOUBLE) END AS a_distinct_est,
            CASE WHEN sb.n < 128 THEN CAST(sb.n AS DOUBLE)
                 ELSE 127.0 * 1152921504606846976.0
                      / CAST(sb.mx AS DOUBLE) END AS b_distinct_est,
            n_inter_exact, n_union_exact
          FROM m, us, sa, sb, ex"""
    },

    "x_dedup_containment" ->
      """WITH d AS (
           SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS g
           FROM documents WHERE doc_id < 150),
         docs AS (SELECT doc_id, len(g) AS ng, unnest(g) AS gram FROM d),
         pairs AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.ng AS na, b.ng AS nb,
                  COUNT(*) AS inter
           FROM docs a JOIN docs b ON a.gram = b.gram AND a.doc_id < b.doc_id
           GROUP BY 1, 2, 3, 4)
         SELECT id_a, id_b,
                CAST(inter AS DOUBLE) / least(na, nb) AS containment
         FROM pairs
         WHERE CAST(inter AS DOUBLE) / least(na, nb) >= 0.8
         ORDER BY id_a, id_b""",

    "x_bm25_topk" ->
      s"""WITH $bm25Ctes
          SELECT query_id, cand_id, bm25, rank FROM bmranked
          WHERE rank <= 10 ORDER BY query_id, rank""",

    // same oracle as x_bm25_topk: the persisted-index path must return
    // the identical ranking or the index layout lost postings
    "x_bm25_indexed" ->
      s"""WITH $bm25Ctes
          SELECT query_id, cand_id, bm25, rank FROM bmranked
          WHERE rank <= 10 ORDER BY query_id, rank""",

    "x_retrieval_mrr" ->
      s"""WITH $bm25Ctes,
          res AS (
            SELECT query_id, cand_id, rank FROM bmranked
            WHERE rank <= 10),
          lbl AS (SELECT doc_id, source FROM documents),
          fr AS (
            SELECT r.query_id, MIN(r.rank) AS first_rel
            FROM res r
            JOIN lbl q ON q.doc_id = r.query_id
            JOIN lbl c ON c.doc_id = r.cand_id
            WHERE q.source = c.source
            GROUP BY 1),
          qs AS (SELECT DISTINCT query_id FROM res)
          SELECT query_id, COALESCE(1.0 / first_rel, 0.0) AS rr
          FROM qs LEFT JOIN fr USING (query_id) ORDER BY query_id""",

    // nDCG@10: per-term DECIMAL(28,9) pinning makes the log2 discounts
    // engine-exact; ideal DCG from per-source corpus counts − self.
    "x_ndcg" ->
      s"""WITH $bm25Ctes,
          res AS (SELECT query_id, cand_id, rank FROM bmranked
                  WHERE rank <= 10),
          lbl AS (SELECT doc_id, source FROM documents),
          relrows AS (
            SELECT r.query_id, r.rank,
              CASE WHEN q.source = c.source THEN 1 ELSE 0 END AS rel
            FROM res r JOIN lbl q ON q.doc_id = r.query_id
                       JOIN lbl c ON c.doc_id = r.cand_id),
          dcg AS (
            SELECT query_id,
              CAST(SUM(CAST(CAST(rel AS DOUBLE) /
                log2(CAST(rank AS DOUBLE) + 1.0) AS DECIMAL(28,9)))
                AS DOUBLE) AS dcg,
              CAST(SUM(rel) AS BIGINT) AS n_rel_topk
            FROM relrows GROUP BY 1),
          srcn AS (SELECT source, COUNT(*) AS n FROM lbl GROUP BY 1),
          rc AS (
            SELECT doc_id AS query_id, n - 1 AS R
            FROM lbl JOIN srcn USING (source)
            WHERE doc_id IN (0, 1, 2, 3, 4)),
          iexp AS (
            SELECT query_id, R,
              unnest(generate_series(1, LEAST(R, 10))) AS i
            FROM rc),
          idcg AS (
            SELECT query_id, R,
              CAST(SUM(CAST(1.0 / log2(CAST(i AS DOUBLE) + 1.0)
                AS DECIMAL(28,9))) AS DOUBLE) AS idcg
            FROM iexp GROUP BY 1, 2)
          SELECT d.query_id, d.n_rel_topk, d.dcg, i.idcg,
            d.dcg / i.idcg AS ndcg
          FROM dcg d JOIN idcg i ON d.query_id = i.query_id
          WHERE i.R > 0
          ORDER BY d.query_id""",

    "x_logreg_step" ->
      """WITH f AS (
           SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                  1 AS xb,
                  len(string_split(lower(text), ' ')) AS xt,
                  length(text) AS xc,
                  len(list_filter(string_split(lower(text), ' '),
                      t -> t IN ('the', 'and', 'of', 'to', 'a'))) AS xs
           FROM documents),
         g AS (SELECT
           CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(CAST(xb * (0.5 - y) AS DECIMAL(28,9))) AS DOUBLE) AS gb,
           CAST(SUM(CAST(xt * (0.5 - y) AS DECIMAL(28,9))) AS DOUBLE) AS gt,
           CAST(SUM(CAST(xc * (0.5 - y) AS DECIMAL(28,9))) AS DOUBLE) AS gc,
           CAST(SUM(CAST(xs * (0.5 - y) AS DECIMAL(28,9))) AS DOUBLE) AS gs
           FROM f)
         SELECT feature, grad, 0.0 - 0.1 * (grad / n) AS w_next FROM (
           SELECT 'bias' AS feature, gb AS grad, n FROM g
           UNION ALL SELECT 'n_chars', gc, n FROM g
           UNION ALL SELECT 'n_tokens', gt, n FROM g
           UNION ALL SELECT 'stop_hits', gs, n FROM g)
         ORDER BY feature""",

    "x_feature_scale" ->
      """WITH s AS (
           SELECT lang, CAST(SUM(n_chars) AS BIGINT) AS sx,
                  CAST(SUM(n_chars * n_chars) AS BIGINT) AS sq,
                  COUNT(*) AS n
           FROM documents GROUP BY 1)
         SELECT doc_id, d.lang AS lang, n_chars,
           (CAST(n_chars AS DOUBLE) -
              CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) /
           sqrt((CAST(sq AS DOUBLE) -
              CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
              / CAST(n AS DOUBLE)) AS z
         FROM documents d JOIN s ON d.lang = s.lang
         WHERE doc_id < 100 ORDER BY doc_id""",

    "x_auc" ->
      """WITH f AS (
           SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                  (len(list_filter(string_split(lower(text), ' '),
                      t -> t IN ('the', 'and', 'of', 'to', 'a'))) * 1000)
                    // len(string_split(lower(text), ' ')) AS s
           FROM documents),
         c AS (SELECT s, CAST(SUM(y) AS BIGINT) AS pos_v,
                  CAST(SUM(1 - y) AS BIGINT) AS neg_v
               FROM f GROUP BY 1),
         w AS (SELECT pos_v, neg_v,
                  COALESCE(CAST(SUM(neg_v) OVER (ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS BIGINT), 0) AS lt
               FROM c)
         SELECT CAST(SUM(pos_v) AS BIGINT) AS n_pos,
           CAST(SUM(neg_v) AS BIGINT) AS n_neg,
           CAST(SUM(pos_v * (2 * lt + neg_v)) AS DOUBLE)
             / CAST(2 * SUM(pos_v) * SUM(neg_v) AS DOUBLE) AS auc
         FROM w""",

    "x_pr_curve" ->
      """WITH f AS (
           SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                  (len(list_filter(string_split(lower(text), ' '),
                      t -> t IN ('the', 'and', 'of', 'to', 'a'))) * 1000)
                    // len(string_split(lower(text), ' ')) AS s
           FROM documents),
         c AS (SELECT s, CAST(SUM(y) AS BIGINT) AS pos_v,
                  CAST(SUM(1 - y) AS BIGINT) AS neg_v
               FROM f GROUP BY 1),
         tot AS (SELECT CAST(SUM(pos_v) AS BIGINT) AS tpos,
                        CAST(SUM(neg_v) AS BIGINT) AS tneg FROM c),
         w AS (SELECT s, pos_v, neg_v,
                  COALESCE(CAST(SUM(pos_v) OVER (ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS BIGINT), 0) AS ltpos,
                  COALESCE(CAST(SUM(neg_v) OVER (ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS BIGINT), 0) AS ltneg
               FROM c)
         SELECT s AS threshold,
           tpos - ltpos AS tp, tneg - ltneg AS fp, ltpos AS fn,
           CAST(tpos - ltpos AS DOUBLE)
             / CAST((tpos - ltpos) + (tneg - ltneg) AS DOUBLE)
             AS "precision",
           CASE WHEN tpos = 0 THEN 0.0
                ELSE CAST(tpos - ltpos AS DOUBLE) / CAST(tpos AS DOUBLE)
           END AS recall
         FROM w, tot ORDER BY threshold""",

    "x_confusion" ->
      """WITH f AS (
           SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                  CASE WHEN 20 * len(list_filter(string_split(lower(text), ' '),
                      t -> t IN ('the', 'and', 'of', 'to', 'a')))
                    - len(string_split(lower(text), ' ')) > 0
                    THEN 1 ELSE 0 END AS p
           FROM documents),
         m AS (SELECT
           CAST(SUM(p * y) AS BIGINT) AS tp,
           CAST(SUM(p * (1 - y)) AS BIGINT) AS fp,
           CAST(SUM((1 - p) * (1 - y)) AS BIGINT) AS tn,
           CAST(SUM((1 - p) * y) AS BIGINT) AS fn
           FROM f)
         SELECT tp, fp, tn, fn,
           CAST(tp + tn AS DOUBLE)
             / CAST(tp + fp + tn + fn AS DOUBLE) AS accuracy,
           CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS precision,
           CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS recall
         FROM m""",

    "x_calibration" ->
      """WITH f AS (
           SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                  (len(list_filter(string_split(lower(text), ' '),
                      t -> t IN ('the', 'and', 'of', 'to', 'a'))) * 1000)
                    // len(string_split(lower(text), ' ')) AS s
           FROM documents)
         SELECT s // 100 AS bin, COUNT(*) AS n,
           CAST(SUM(y) AS BIGINT) AS n_pos,
           CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS pos_rate
         FROM f GROUP BY 1 ORDER BY 1""",

    "x_dsir" -> {
      val h = Hashing.hash64Sql("g", 41)
      s"""WITH toks AS (
           SELECT doc_id, lang, CAST(i AS INTEGER) AS pos, l[i] AS t
           FROM (SELECT doc_id, lang, string_split(lower(text), ' ') AS l
                 FROM documents) d,
             LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) g),
         grams AS (
           SELECT doc_id, lang, t AS g FROM toks
           UNION ALL
           SELECT a.doc_id, a.lang, a.t || ' ' || b.t AS g
           FROM toks a JOIN toks b
             ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         h AS (SELECT doc_id, lang, $h % 256 AS b FROM grams),
         m AS (SELECT b,
             CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)
               AS BIGINT) AS ct,
             CAST(COUNT(*) AS BIGINT) AS c
           FROM h GROUP BY 1),
         tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
             CAST(SUM(c) AS BIGINT) AS n FROM m),
         model AS (SELECT b,
             CAST(ln((CAST(ct + 1 AS DOUBLE) / CAST(nt + 256 AS DOUBLE))
               / (CAST(c - ct + 1 AS DOUBLE)
                  / CAST(n - nt + 256 AS DOUBLE)))
               AS DECIMAL(28, 9)) AS lr
           FROM m, tot),
         scores AS (SELECT doc_id, COUNT(*) AS n_ngrams,
             CAST(SUM(lr) AS DOUBLE) AS weight
           FROM h JOIN model USING (b) GROUP BY 1)
         SELECT doc_id, n_ngrams, weight FROM scores
         ORDER BY weight DESC, doc_id LIMIT 50"""
    },

    "x_psi" ->
      """WITH f AS (
           SELECT doc_id,
                  (len(list_filter(string_split(lower(text), ' '),
                      t -> t IN ('the', 'and', 'of', 'to', 'a'))) * 1000)
                    // len(string_split(lower(text), ' ')) AS s
           FROM documents),
         c AS (SELECT s // 100 AS bin,
             CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_ref,
             CAST(SUM(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END)
               AS BIGINT) AS n_cur
           FROM f GROUP BY 1),
         t AS (SELECT CAST(SUM(n_ref) AS BIGINT) AS tr,
             CAST(SUM(n_cur) AS BIGINT) AS tc,
             CAST(COUNT(*) AS BIGINT) AS nb FROM c)
         SELECT bin, n_ref, n_cur,
           CAST(CAST(
             ((CAST(n_ref + 1 AS DOUBLE) / CAST(tr + nb AS DOUBLE))
              - (CAST(n_cur + 1 AS DOUBLE) / CAST(tc + nb AS DOUBLE)))
             * ln((CAST(n_ref + 1 AS DOUBLE) / CAST(tr + nb AS DOUBLE))
                / (CAST(n_cur + 1 AS DOUBLE) / CAST(tc + nb AS DOUBLE)))
             AS DECIMAL(28, 9)) AS DOUBLE) AS psi_term
         FROM c, t ORDER BY bin""",

    "x_feature_mi" ->
      """WITH f AS (
           SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                  (len(list_filter(string_split(lower(text), ' '),
                      t -> t IN ('the', 'and', 'of', 'to', 'a'))) * 1000)
                    // len(string_split(lower(text), ' ')) AS s
           FROM documents),
         j AS (SELECT s // 100 AS x, y, CAST(COUNT(*) AS BIGINT) AS cxy
           FROM f GROUP BY 1, 2),
         mx AS (SELECT x, CAST(SUM(cxy) AS BIGINT) AS cx FROM j GROUP BY 1),
         my AS (SELECT y, CAST(SUM(cxy) AS BIGINT) AS cy FROM j GROUP BY 1),
         t AS (SELECT CAST(SUM(cxy) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_cells FROM j)
         SELECT n, n_cells,
           CAST(SUM(CAST(
             (CAST(cxy AS DOUBLE) / CAST(n AS DOUBLE))
             * ln((CAST(cxy AS DOUBLE) * CAST(n AS DOUBLE))
                / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)))
             AS DECIMAL(28, 9))) AS DOUBLE) AS mi
         FROM j JOIN mx USING (x) JOIN my USING (y), t
         GROUP BY n, n_cells""",

    "x_chi2" ->
      """WITH f AS (
           SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                  (len(list_filter(string_split(lower(text), ' '),
                      t -> t IN ('the', 'and', 'of', 'to', 'a'))) * 1000)
                    // len(string_split(lower(text), ' ')) AS s
           FROM documents),
         j AS (SELECT s // 100 AS x, y, CAST(COUNT(*) AS BIGINT) AS cxy
           FROM f GROUP BY 1, 2),
         mx AS (SELECT x, CAST(SUM(cxy) AS BIGINT) AS cx FROM j GROUP BY 1),
         my AS (SELECT y, CAST(SUM(cxy) AS BIGINT) AS cy FROM j GROUP BY 1),
         t AS (SELECT CAST(SUM(cxy) AS BIGINT) AS n FROM j),
         cells AS (SELECT mx.x AS x, my.y AS y, cx, cy,
             COALESCE(cxy, 0) AS o
           FROM mx CROSS JOIN my
           LEFT JOIN j ON j.x = mx.x AND j.y = my.y)
         SELECT n,
           CAST((SELECT COUNT(*) - 1 FROM mx)
             * (SELECT COUNT(*) - 1 FROM my) AS BIGINT) AS dof,
           CAST(SUM(CAST(
             (CAST(o AS DOUBLE)
               - CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)
                 / CAST(n AS DOUBLE))
             * (CAST(o AS DOUBLE)
               - CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)
                 / CAST(n AS DOUBLE))
             / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE)
                 / CAST(n AS DOUBLE))
             AS DECIMAL(28, 9))) AS DOUBLE) AS chi2
         FROM cells, t GROUP BY n""",

    "x_triangles" ->
      """WITH bi AS (
           SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         p AS (SELECT a.i AS u, b.i AS v, COUNT(*) AS c
               FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
               GROUP BY 1, 2),
         e AS (SELECT u, v FROM p WHERE c >= 2),
         nn AS (SELECT CAST(COUNT(DISTINCT n) AS BIGINT) AS n_nodes
                FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e)),
         ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e),
         nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
                FROM e e1
                JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
                JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v)
         SELECT n_nodes, n_edges, n_triangles FROM nn, ne, nt""",

    "x_skew_join" ->
      """SELECT o_orderstatus,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1 ORDER BY 1""",

    "x_hybrid_rrf" ->
      s"""WITH $bm25Ctes,
          eq AS (SELECT vec_id AS query_id, $qvec AS qv FROM embeddings
                 WHERE vec_id IN (0, 1, 2, 3, 4)),
          ec AS (SELECT vec_id AS cand_id, $qvec AS cv FROM embeddings),
          escored AS (
            SELECT query_id, cand_id, ${cosSql("qv", "cv")} AS cosine
            FROM ec CROSS JOIN eq WHERE query_id <> cand_id),
          sem AS (SELECT query_id, cand_id, rb FROM (
            SELECT query_id, cand_id,
              row_number() OVER (PARTITION BY query_id
                ORDER BY cosine DESC, cand_id) AS rb
            FROM escored) WHERE rb <= 20),
          lex AS (SELECT query_id, cand_id, rank AS ra FROM bmranked
                  WHERE rank <= 20),
          fused AS (
            SELECT coalesce(l.query_id, s.query_id) AS query_id,
                   coalesce(l.cand_id, s.cand_id) AS cand_id,
                   coalesce(1.0 / (60 + CAST(ra AS DOUBLE)), 0) +
                   coalesce(1.0 / (60 + CAST(rb AS DOUBLE)), 0) AS rrf
            FROM lex l FULL OUTER JOIN sem s
              ON l.query_id = s.query_id AND l.cand_id = s.cand_id),
          franked AS (SELECT query_id, cand_id, rrf,
            CAST(row_number() OVER (PARTITION BY query_id
                 ORDER BY rrf DESC, cand_id) AS INTEGER) AS rank
            FROM fused)
          SELECT query_id, cand_id, rrf, rank FROM franked
          WHERE rank <= 10 ORDER BY query_id, rank""",

    "x_pagerank" -> {
      // fixed-point longs in 1e-12 units, integer DIV everywhere —
      // bit-identical across engines by construction (see Graph.pageRank)
      def iterCte(cur: String, prev: String) =
        s"""$cur AS (
            SELECT e.dst AS src,
              ((1000000000000 * 15) // 100) // nn.n +
                ((SUM($prev.pr // deg.d) * 85) // 100) AS pr
            FROM e JOIN $prev ON e.src = $prev.src
            JOIN deg ON e.src = deg.src CROSS JOIN nn
            GROUP BY e.dst, nn.n)"""
      s"""WITH d AS (
           SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS g
           FROM documents WHERE doc_id < 150),
         docs AS (SELECT doc_id, len(g) AS ng, unnest(g) AS gram FROM d),
         jp AS (
           SELECT id_a, id_b FROM (
             SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.ng AS na,
               b.ng AS nb, COUNT(*) AS inter
             FROM docs a JOIN docs b
               ON a.gram = b.gram AND a.doc_id < b.doc_id
             GROUP BY 1, 2, 3, 4)
           WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8),
         e AS (SELECT id_a AS src, id_b AS dst FROM jp
               UNION ALL SELECT id_b, id_a FROM jp),
         nodes AS (SELECT DISTINCT src FROM e),
         nn AS (SELECT COUNT(*) AS n FROM nodes),
         deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
         r0 AS (SELECT src, 1000000000000 // nn.n AS pr
                FROM nodes CROSS JOIN nn),
         ${iterCte("r1", "r0")},
         ${iterCte("r2", "r1")},
         ${iterCte("r3", "r2")}
         SELECT src AS doc_id,
           CAST(pr AS DOUBLE) / CAST(1000000000000 AS DOUBLE) AS pagerank
         FROM r3 ORDER BY 1"""
    },

    // same graph as x_pagerank, jump mass to the seed set only; the
    // union leg keeps seeds alive before any ranked node reaches them.
    "x_ppr" -> {
      def iterCte(cur: String, prev: String) =
        s"""$cur AS (
            SELECT src, SUM(pr) AS pr FROM (
              SELECT e.dst AS src,
                (SUM($prev.pr // deg.d) * 85) // 100 AS pr
              FROM e JOIN $prev ON e.src = $prev.src
              JOIN deg ON e.src = deg.src
              GROUP BY e.dst
              UNION ALL SELECT src, pr FROM jumps) u GROUP BY src)"""
      s"""WITH d AS (
           SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS g
           FROM documents WHERE doc_id < 150),
         docs AS (SELECT doc_id, len(g) AS ng, unnest(g) AS gram FROM d),
         jp AS (
           SELECT id_a, id_b FROM (
             SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.ng AS na,
               b.ng AS nb, COUNT(*) AS inter
             FROM docs a JOIN docs b
               ON a.gram = b.gram AND a.doc_id < b.doc_id
             GROUP BY 1, 2, 3, 4)
           WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8),
         e AS (SELECT id_a AS src, id_b AS dst FROM jp
               UNION ALL SELECT id_b, id_a FROM jp),
         nodes AS (SELECT src FROM e UNION SELECT dst FROM e),
         s AS (SELECT src FROM nodes WHERE src < 5),
         ns AS (SELECT COUNT(*) AS n FROM s),
         deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
         r0 AS (SELECT src, 1000000000000 // ns.n AS pr
                FROM s CROSS JOIN ns),
         jumps AS (SELECT src, ((1000000000000 * 15) // 100) // ns.n AS pr
                   FROM s CROSS JOIN ns),
         ${iterCte("r1", "r0")},
         ${iterCte("r2", "r1")},
         ${iterCte("r3", "r2")}
         SELECT src AS doc_id,
           CAST(pr AS DOUBLE) / CAST(1000000000000 AS DOUBLE) AS ppr
         FROM r3 ORDER BY 1"""
    },

    // same jaccard-graph edges as x_pagerank; min distance within 3
    // hops from seed docs 0-4 via a recursive CTE.
    "x_bfs_hops" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS g
           FROM documents WHERE doc_id < 150),
         docs AS (SELECT doc_id, len(g) AS ng, unnest(g) AS gram FROM d),
         jp AS (
           SELECT id_a, id_b FROM (
             SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.ng AS na,
               b.ng AS nb, COUNT(*) AS inter
             FROM docs a JOIN docs b
               ON a.gram = b.gram AND a.doc_id < b.doc_id
             GROUP BY 1, 2, 3, 4)
           WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8),
         e AS (SELECT id_a AS src, id_b AS dst FROM jp
               UNION ALL SELECT id_b, id_a FROM jp),
         walk(node, dist) AS (
           SELECT doc_id, 0 FROM documents WHERE doc_id < 5
           UNION ALL
           SELECT e.dst, walk.dist + 1
           FROM walk JOIN e ON walk.node = e.src
           WHERE walk.dist < 3)
         SELECT node, CAST(MIN(dist) AS INTEGER) AS dist
         FROM walk GROUP BY 1 ORDER BY 1""",

    // same jaccard-graph edges as x_bfs_hops, weighted by gram-set
    // union size; min accumulated weight within 3 hops from seeds 0-4.
    "x_sssp" ->
      """WITH RECURSIVE d AS (
           SELECT doc_id, list_distinct(string_split(lower(text), ' ')) AS g
           FROM documents WHERE doc_id < 150),
         docs AS (SELECT doc_id, len(g) AS ng, unnest(g) AS gram FROM d),
         jp AS (
           SELECT id_a, id_b, na + nb - inter AS w FROM (
             SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.ng AS na,
               b.ng AS nb, COUNT(*) AS inter
             FROM docs a JOIN docs b
               ON a.gram = b.gram AND a.doc_id < b.doc_id
             GROUP BY 1, 2, 3, 4)
           WHERE CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.8),
         e AS (SELECT id_a AS src, id_b AS dst, w FROM jp
               UNION ALL SELECT id_b, id_a, w FROM jp),
         walk(node, hops, dist) AS (
           SELECT doc_id, 0, CAST(0 AS BIGINT) FROM documents
           WHERE doc_id < 5
           UNION ALL
           SELECT e.dst, walk.hops + 1, walk.dist + e.w
           FROM walk JOIN e ON walk.node = e.src
           WHERE walk.hops < 3)
         SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
         FROM walk GROUP BY 1 ORDER BY 1""",

    // blocked on the same 8-bit sign bucket the Spark operator uses:
    // only same-bucket pairs are candidates on BOTH engines.
    "x_dedup_embedding" ->
      s"""WITH e AS (SELECT vec_id, $qvec AS v
                     FROM embeddings WHERE vec_id < 300),
          bands AS (${signBandsSql(8, 6, "embeddings WHERE vec_id < 300")}),
          ea AS (SELECT e.vec_id, v, tbl, bucket
                 FROM e JOIN bands ON e.vec_id = bands.vec_id),
          cand AS (
            SELECT DISTINCT a.vec_id AS id_a, a.v AS va,
                            b.vec_id AS id_b, b.v AS vb
            FROM ea a JOIN ea b
              ON a.tbl = b.tbl AND a.bucket = b.bucket
             AND a.vec_id < b.vec_id)
          SELECT id_a, id_b, ${cosSql("va", "vb")} AS cosine
          FROM cand WHERE ${cosSql("va", "vb")} > 0.3
          ORDER BY id_a, id_b""",

    // same blocked neighbor graph, then textbook DBSCAN in SQL:
    // degrees -> cores -> recursive core-core closure -> border attach
    "x_dbscan" ->
      s"""WITH RECURSIVE e AS (SELECT vec_id, $qvec AS v
                     FROM embeddings WHERE vec_id < 150),
          bands AS (${signBandsSql(8, 6, "embeddings WHERE vec_id < 150")}),
          ea AS (SELECT e.vec_id, v, tbl, bucket
                 FROM e JOIN bands ON e.vec_id = bands.vec_id),
          cand AS (
            SELECT DISTINCT a.vec_id AS id_a, a.v AS va,
                            b.vec_id AS id_b, b.v AS vb
            FROM ea a JOIN ea b
              ON a.tbl = b.tbl AND a.bucket = b.bucket
             AND a.vec_id < b.vec_id),
          pairs AS (
            SELECT id_a, id_b FROM cand
            WHERE ${cosSql("va", "vb")} > 0.25),
          sym AS (SELECT id_a, id_b FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
          deg AS (SELECT id_a AS id, COUNT(*) AS d FROM sym GROUP BY 1),
          cores AS (SELECT id FROM deg WHERE d >= 2),
          ce AS (
            SELECT id_a, id_b FROM pairs
            WHERE id_a IN (SELECT id FROM cores)
              AND id_b IN (SELECT id FROM cores)),
          cedges AS (SELECT id_a AS src, id_b AS dst FROM ce
                     UNION SELECT id_b, id_a FROM ce),
          reach(src, dst) AS (
            SELECT src, dst FROM cedges
            UNION
            SELECT r.src, e2.dst FROM reach r JOIN cedges e2
              ON r.dst = e2.src),
          comp AS (
            SELECT src AS id, LEAST(src, MIN(dst)) AS cluster_id
            FROM reach GROUP BY src),
          corec AS (
            SELECT c.id, COALESCE(comp.cluster_id, c.id) AS cluster
            FROM cores c LEFT JOIN comp ON c.id = comp.id),
          borderc AS (
            SELECT s.id_a AS id, MIN(cc.cluster) AS cluster
            FROM sym s JOIN corec cc ON s.id_b = cc.id
            WHERE s.id_a NOT IN (SELECT id FROM cores)
            GROUP BY 1)
          SELECT v.vec_id AS id,
            CASE WHEN cc.id IS NOT NULL THEN 'core'
                 WHEN bc.id IS NOT NULL THEN 'border'
                 ELSE 'noise' END AS role,
            COALESCE(cc.cluster, bc.cluster) AS cluster
          FROM e v
          LEFT JOIN corec cc ON v.vec_id = cc.id
          LEFT JOIN borderc bc ON v.vec_id = bc.id
          ORDER BY v.vec_id""",

    // ±1 signs re-derived per (input dim i, output dim j) from the same
    // md5 formula Similarity.signProjSigns computes driver-side; exact
    // integer sums over the quantized vectors.
    "x_rand_proj" ->
      s"""WITH v AS (SELECT vec_id, $qvec AS q FROM embeddings),
          u AS (
            SELECT vec_id, unnest(q) AS x,
              unnest(range(len(q))) AS i
            FROM v),
          cells AS (
            SELECT u.vec_id, j.j,
              u.x * ((CAST(('0x' || substr(md5('0|' ||
                  CAST(u.i AS VARCHAR) || '|' || CAST(j.j AS VARCHAR)),
                  1, 15)) AS BIGINT) % 2) * 2 - 1) AS term
            FROM u CROSS JOIN (SELECT unnest(range(8)) AS j) j)
          SELECT vec_id, CAST(j AS INTEGER) AS dim,
            CAST(SUM(term) AS DOUBLE) AS val
          FROM cells GROUP BY 1, 2 ORDER BY vec_id, dim""",

    // exact integer co-moment sums re-derived over the explicit (i, j)
    // upper-triangle index grid; covariance mirrors the Spark formula
    // operation-for-operation on the same exact integers.
    "x_pca_cov" -> pcaCovOracle,

    // deliberately the SAME oracle as x_pca_cov: the sliced-and-merged
    // state must reproduce the one-pass table bit-for-bit — merge-
    // exactness IS the check (the x_incr_corr convention).
    "x_pca_incremental" -> pcaCovOracle,

    // identity oracle: an orthonormal eigenbasis preserves total
    // variance, so Σ Var(projected component) / trace(covariance)
    // rounded to 6dp must be EXACTLY 1.0 — the denominator comes from
    // the exact co-moment diagonal (data), the numerator from the
    // driver eigensolve + fused double_dot projection, so a broken
    // rotation cannot cancel. No SQL eigensolver exists; this identity
    // is what a second engine CAN check, and PcaSpec pins the rest
    // (eigen-residuals, orthonormality, reconstruction) in-process.
    "x_pca_var" ->
      ("SELECT CAST(64 AS INTEGER) AS n_components, " +
        "CAST(1.0 AS DOUBLE) AS var_ratio"),

    // full re-derivation: per-d truncated quantization, cosine top-10
    // windows, hits against the d=64 reference list.
    "x_matryoshka_recall" -> {
      val tq = "list_transform(embedding[1:d], " +
        "x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT))"
      s"""WITH dims AS (SELECT unnest([8, 16, 32, 64]) AS d),
          q AS (SELECT vec_id AS query_id, d, $tq AS qv
                FROM embeddings CROSS JOIN dims
                WHERE vec_id IN (0, 1, 2, 3, 4)),
          c AS (SELECT vec_id AS cand_id, d, $tq AS cv
                FROM embeddings CROSS JOIN dims),
          scored AS (
            SELECT query_id, cand_id, q.d, ${cosSql("qv", "cv")} AS cosine
            FROM c JOIN q ON c.d = q.d AND q.query_id <> c.cand_id),
          topk AS (
            SELECT query_id, cand_id, d FROM (
              SELECT query_id, cand_id, d, row_number() OVER (
                PARTITION BY d, query_id ORDER BY cosine DESC, cand_id)
                AS rk
              FROM scored) WHERE rk <= 10),
          fullk AS (SELECT query_id, cand_id FROM topk WHERE d = 64),
          hits AS (
            SELECT t.query_id AS query_id, t.d AS d, COUNT(*) AS n_hits
            FROM topk t JOIN fullk f
              ON t.query_id = f.query_id AND t.cand_id = f.cand_id
            GROUP BY 1, 2),
          dom AS (SELECT DISTINCT query_id, d FROM q)
          SELECT dom.query_id AS query_id, dom.d AS d,
            CAST(COALESCE(hits.n_hits, 0) AS BIGINT) AS n_hits,
            CAST(COALESCE(hits.n_hits, 0) AS DOUBLE) / 10.0 AS recall
          FROM dom LEFT JOIN hits
            ON dom.query_id = hits.query_id AND dom.d = hits.d
          ORDER BY query_id, d"""
    },

    "x_silhouette" ->
      s"""WITH cents AS (
            SELECT vec_id AS cell, $qvec AS cv FROM embeddings
            WHERE vec_id < 8),
          v AS (SELECT vec_id, $qvec AS v FROM embeddings
                WHERE vec_id < 200),
          scored AS (
            SELECT vec_id, cell,
              list_sum(list_transform(list_zip(v, cv),
                p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
            FROM v CROSS JOIN cents),
          rk AS (
            SELECT vec_id, cell, dist,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY dist, cell) AS r
            FROM scored),
          ab AS (
            SELECT a.vec_id, a.cell,
              sqrt(CAST(a.dist AS DOUBLE)) AS a,
              sqrt(CAST(b.dist AS DOUBLE)) AS b
            FROM rk a JOIN rk b
              ON a.vec_id = b.vec_id AND a.r = 1 AND b.r = 2)
          SELECT vec_id, cell, a, b,
            CASE WHEN greatest(a, b) > 0.0
              THEN round((b - a) / greatest(a, b), 6) ELSE 0.0 END
              AS silhouette
          FROM ab ORDER BY vec_id""",

    "x_kmeans_step" ->
      s"""WITH cents AS (
            SELECT vec_id AS cell, $qvec AS cv FROM embeddings
            WHERE vec_id < 8),
          v AS (SELECT vec_id, $qvec AS v FROM embeddings),
          scored AS (
            SELECT vec_id, cell,
              list_sum(list_transform(list_zip(v, cv),
                p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
            FROM v CROSS JOIN cents),
          assigned AS (
            SELECT vec_id, cell FROM (
              SELECT vec_id, cell, row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, cell) AS rn
              FROM scored) WHERE rn = 1),
          dims AS (
            SELECT a.cell, CAST(p[2] AS INTEGER) AS dim,
              CAST(p[1] AS BIGINT) AS x
            FROM v JOIN assigned a USING (vec_id),
              LATERAL (SELECT unnest(list_zip(v, range(0, len(v)))) AS p) u)
          SELECT cell, dim,
            round(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
              AS mean_q,
            COUNT(*) AS n_members
          FROM dims GROUP BY 1, 2 ORDER BY cell, dim""",

    "x_semdedup" ->
      s"""WITH cents AS (
            SELECT vec_id AS cell, $qvec AS cv FROM embeddings
            WHERE vec_id < 8),
          v AS (SELECT vec_id, $qvec AS v FROM embeddings),
          scoredc AS (
            SELECT vec_id, cell,
              list_sum(list_transform(list_zip(v, cv),
                p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
            FROM v CROSS JOIN cents),
          assigned AS (
            SELECT vec_id, cell FROM (
              SELECT vec_id, cell, row_number() OVER (
                PARTITION BY vec_id ORDER BY dist, cell) AS rn
              FROM scoredc) WHERE rn = 1),
          av AS (SELECT a.vec_id, a.cell, v.v
                 FROM assigned a JOIN v USING (vec_id)),
          dropped AS (
            SELECT DISTINCT b.vec_id
            FROM av a JOIN av b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE ${cosSql("a.v", "b.v")} >= 0.3)
          SELECT vec_id, cell FROM assigned
          WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
          ORDER BY vec_id""",

    "x_domain_centroids" ->
      s"""WITH e AS (SELECT vec_id, label, $qvec AS v FROM embeddings),
          d AS (SELECT label, generate_subscripts(v, 1) AS pos,
                  unnest(v) AS x FROM e),
          cs AS (SELECT label, pos, CAST(SUM(x) AS BIGINT) AS s
                 FROM d GROUP BY 1, 2),
          cent AS (SELECT label AS assigned, list(s ORDER BY pos) AS c
                   FROM cs GROUP BY 1),
          scored AS (
            SELECT e.vec_id, e.label, cent.assigned,
              ${cosSql("e.v", "cent.c")} AS cos
            FROM e CROSS JOIN cent),
          r AS (SELECT vec_id, label, assigned,
                  row_number() OVER (PARTITION BY vec_id
                    ORDER BY cos DESC, assigned) AS rn
                FROM scored)
          SELECT label, assigned, COUNT(*) AS n FROM r WHERE rn = 1
          GROUP BY 1, 2 ORDER BY 1, 2""",

    "x_ann_brute_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, $qvec AS qv FROM embeddings
                     WHERE vec_id IN (0, 1, 2, 3, 4)),
          c AS (SELECT vec_id AS cand_id, $qvec AS cv FROM embeddings),
          scored AS (
            SELECT query_id, cand_id, ${cosSql("qv", "cv")} AS cosine
            FROM c CROSS JOIN q WHERE query_id <> cand_id),
          ranked AS (
            SELECT query_id, cand_id, cosine,
              CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, cand_id) AS INTEGER) AS rank
            FROM scored)
          SELECT query_id, cand_id, cosine, rank FROM ranked
          WHERE rank <= 10 ORDER BY query_id, rank""",

    "x_ann_ivfpq_topk" -> {
      val sq = (a: String, b: String) =>
        s"CAST(list_dot_product($a,$a) - 2*list_dot_product($a,$b) " +
          s"+ list_dot_product($b,$b) AS DOUBLE)"
      s"""WITH e AS (SELECT vec_id, $qvec AS v FROM embeddings),
          coarse AS (SELECT vec_id AS centroid_id, v AS centv FROM e
                     WHERE vec_id IN (10,11,12,13,14,15,16,17)),
          cellrank AS (
            SELECT e.vec_id, centroid_id,
              row_number() OVER (PARTITION BY e.vec_id
                ORDER BY ${cosSql("e.v", "centv")} DESC, centroid_id) AS rk
            FROM e CROSS JOIN coarse),
          ccells AS (SELECT vec_id AS cand_id, centroid_id AS cell
                     FROM cellrank WHERE rk = 1),
          qcells AS (SELECT vec_id AS query_id, centroid_id AS cell
                     FROM cellrank WHERE rk <= 2
                       AND vec_id IN (0, 1, 2, 3, 4)),
          cand AS (
            SELECT query_id, cand_id FROM ccells JOIN qcells USING (cell)
            WHERE query_id <> cand_id),
          subs AS (SELECT unnest(range(8)) AS sub),
          corpsub AS (
            SELECT vec_id, sub, list_slice(v, sub*8 + 1, sub*8 + 8) AS sv
            FROM e, subs),
          cbook AS (
            SELECT sub, vec_id AS code, sv AS cv FROM corpsub
            WHERE vec_id BETWEEN 20 AND 35),
          codes AS (
            SELECT vec_id AS cand_id, sub, code FROM (
              SELECT c.vec_id, c.sub, b.code,
                row_number() OVER (PARTITION BY c.vec_id, c.sub
                  ORDER BY ${sq("c.sv", "b.cv")}, b.code) AS rn
              FROM corpsub c JOIN cbook b USING (sub)) WHERE rn = 1),
          qdist AS (
            SELECT q.vec_id AS query_id, q.sub, b.code,
                   ${sq("q.sv", "b.cv")} AS qd
            FROM corpsub q JOIN cbook b USING (sub)
            WHERE q.vec_id IN (0, 1, 2, 3, 4)),
          adc AS (
            SELECT cand.query_id, cand.cand_id, SUM(qd) AS approx_dist
            FROM cand
            JOIN codes ON codes.cand_id = cand.cand_id
            JOIN qdist ON qdist.query_id = cand.query_id
              AND qdist.sub = codes.sub AND qdist.code = codes.code
            GROUP BY 1, 2)
          SELECT query_id, cand_id, approx_dist, rank FROM (
            SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY approx_dist, cand_id) AS INTEGER) AS rank
            FROM adc) WHERE rank <= 10
          ORDER BY query_id, rank"""
    },

    "x_ann_pq_topk" -> {
      val sq = (a: String, b: String) =>
        s"CAST(list_dot_product($a,$a) - 2*list_dot_product($a,$b) " +
          s"+ list_dot_product($b,$b) AS DOUBLE)"
      s"""WITH subs AS (SELECT unnest(range(8)) AS sub),
          corp AS (SELECT vec_id, $qvec AS v FROM embeddings),
          cents AS (
            SELECT sub, vec_id AS code,
                   list_slice(v, sub*8 + 1, sub*8 + 8) AS cv
            FROM corp, subs WHERE vec_id BETWEEN 20 AND 35),
          corpsub AS (
            SELECT vec_id AS cand_id, sub,
                   list_slice(v, sub*8 + 1, sub*8 + 8) AS sv
            FROM corp, subs),
          codes AS (
            SELECT cand_id, sub, code FROM (
              SELECT cand_id, sub, code,
                row_number() OVER (PARTITION BY cand_id, sub
                  ORDER BY ${sq("sv", "cv")}, code) AS rn
              FROM corpsub JOIN cents USING (sub)) WHERE rn = 1),
          qdist AS (
            SELECT q.query_id, q.sub, c.code, ${sq("q.sv", "c.cv")} AS qd
            FROM (SELECT cand_id AS query_id, sub, sv FROM corpsub
                  WHERE cand_id IN (0, 1, 2, 3, 4)) q
            JOIN cents c USING (sub)),
          adc AS (
            SELECT query_id, cand_id, SUM(qd) AS approx_dist
            FROM codes JOIN qdist USING (sub, code)
            WHERE query_id <> cand_id GROUP BY 1, 2)
          SELECT query_id, cand_id, approx_dist, rank FROM (
            SELECT *, CAST(row_number() OVER (PARTITION BY query_id
              ORDER BY approx_dist, cand_id) AS INTEGER) AS rank
            FROM adc) WHERE rank <= 10
          ORDER BY query_id, rank"""
    },

    "x_ann_lsh_topk" ->
      s"""WITH e AS (SELECT vec_id, $qvec AS v FROM embeddings),
          bands AS (${signBandsSql(8, 6, "embeddings")}),
          q AS (SELECT e.vec_id AS query_id, v AS qv, tbl, bucket
                FROM e JOIN bands ON e.vec_id = bands.vec_id
                WHERE e.vec_id IN (0, 1, 2, 3, 4)),
          c AS (SELECT e.vec_id AS cand_id, v AS cv, tbl, bucket
                FROM e JOIN bands ON e.vec_id = bands.vec_id),
          cand AS (
            SELECT DISTINCT query_id, qv, cand_id, cv
            FROM c JOIN q USING (tbl, bucket) WHERE query_id <> cand_id),
          scored AS (
            SELECT query_id, cand_id, ${cosSql("qv", "cv")} AS cosine
            FROM cand),
          ranked AS (
            SELECT query_id, cand_id, cosine,
              CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, cand_id) AS INTEGER) AS rank
            FROM scored)
          SELECT query_id, cand_id, cosine, rank FROM ranked
          WHERE rank <= 10 ORDER BY query_id, rank""",

    "x_ann_lsh_multiprobe" ->
      s"""WITH e AS (SELECT vec_id, $qvec AS v FROM embeddings),
          bands AS (${signBandsSql(8, 6, "embeddings")}),
          probes AS (${multiProbeSql(8, 6, "embeddings")}),
          q AS (SELECT e.vec_id AS query_id, v AS qv, tbl, bucket
                FROM e JOIN probes ON e.vec_id = probes.vec_id
                WHERE e.vec_id IN (0, 1, 2, 3, 4)),
          c AS (SELECT e.vec_id AS cand_id, v AS cv, tbl, bucket
                FROM e JOIN bands ON e.vec_id = bands.vec_id),
          cand AS (
            SELECT DISTINCT query_id, qv, cand_id, cv
            FROM c JOIN q USING (tbl, bucket) WHERE query_id <> cand_id),
          scored AS (
            SELECT query_id, cand_id, ${cosSql("qv", "cv")} AS cosine
            FROM cand),
          ranked AS (
            SELECT query_id, cand_id, cosine,
              CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, cand_id) AS INTEGER) AS rank
            FROM scored)
          SELECT query_id, cand_id, cosine, rank FROM ranked
          WHERE rank <= 10 ORDER BY query_id, rank""",

    "x_ann_lsh_directed" ->
      s"""WITH e AS (SELECT vec_id, $qvec AS v FROM embeddings),
          bands AS (${signBandsSql(8, 6, "embeddings")}),
          probes AS (${directedProbeSql(8, 6, 2, "embeddings")}),
          q AS (SELECT e.vec_id AS query_id, v AS qv, tbl, bucket
                FROM e JOIN probes ON e.vec_id = probes.vec_id
                WHERE e.vec_id IN (0, 1, 2, 3, 4)),
          c AS (SELECT e.vec_id AS cand_id, v AS cv, tbl, bucket
                FROM e JOIN bands ON e.vec_id = bands.vec_id),
          cand AS (
            SELECT DISTINCT query_id, qv, cand_id, cv
            FROM c JOIN q USING (tbl, bucket) WHERE query_id <> cand_id),
          scored AS (
            SELECT query_id, cand_id, ${cosSql("qv", "cv")} AS cosine
            FROM cand),
          ranked AS (
            SELECT query_id, cand_id, cosine,
              CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, cand_id) AS INTEGER) AS rank
            FROM scored)
          SELECT query_id, cand_id, cosine, rank FROM ranked
          WHERE rank <= 10 ORDER BY query_id, rank""",

    "x_ann_ivf_topk" ->
      s"""WITH e AS (SELECT vec_id, $qvec AS v FROM embeddings),
          cents AS (SELECT vec_id AS centroid_id, v AS centv FROM e
                    WHERE vec_id IN (10,11,12,13,14,15,16,17)),
          scoredc AS (
            SELECT e.vec_id, e.v, centroid_id,
                   ${cosSql("e.v", "centv")} AS ccos
            FROM e CROSS JOIN cents),
          assigned AS (
            SELECT vec_id, v, centroid_id FROM (
              SELECT *, row_number() OVER (PARTITION BY vec_id
                ORDER BY ccos DESC, centroid_id) AS rk FROM scoredc)
            WHERE rk = 1),
          q AS (SELECT vec_id AS query_id, v AS qv, centroid_id AS cell
                FROM assigned WHERE vec_id IN (0, 1, 2, 3, 4)),
          c AS (SELECT vec_id AS cand_id, v AS cv, centroid_id AS cell
                FROM assigned),
          scored AS (
            SELECT query_id, cand_id, ${cosSql("qv", "cv")} AS cosine
            FROM c JOIN q USING (cell) WHERE query_id <> cand_id),
          ranked AS (
            SELECT query_id, cand_id, cosine,
              CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, cand_id) AS INTEGER) AS rank
            FROM scored)
          SELECT query_id, cand_id, cosine, rank FROM ranked
          WHERE rank <= 10 ORDER BY query_id, rank""",

    // nprobe=2: queries keep their TWO nearest cells; corpus vectors
    // still live in exactly one cell.
    "x_ann_ivf_probe2" ->
      s"""WITH e AS (SELECT vec_id, $qvec AS v FROM embeddings),
          cents AS (SELECT vec_id AS centroid_id, v AS centv FROM e
                    WHERE vec_id IN (10,11,12,13,14,15,16,17)),
          scoredc AS (
            SELECT e.vec_id, e.v, centroid_id,
                   ${cosSql("e.v", "centv")} AS ccos
            FROM e CROSS JOIN cents),
          ranked_cells AS (
            SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY ccos DESC, centroid_id) AS rk FROM scoredc),
          q AS (SELECT vec_id AS query_id, v AS qv, centroid_id AS cell
                FROM ranked_cells WHERE rk <= 2 AND vec_id IN (0, 1, 2, 3, 4)),
          c AS (SELECT vec_id AS cand_id, v AS cv, centroid_id AS cell
                FROM ranked_cells WHERE rk = 1),
          scored AS (
            SELECT query_id, cand_id, ${cosSql("qv", "cv")} AS cosine
            FROM c JOIN q USING (cell) WHERE query_id <> cand_id),
          ranked AS (
            SELECT query_id, cand_id, cosine,
              CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, cand_id) AS INTEGER) AS rank
            FROM scored)
          SELECT query_id, cand_id, cosine, rank FROM ranked
          WHERE rank <= 10 ORDER BY query_id, rank""",

    // The incremental two-segment index must equal a FULL REBUILD:
    // same SQL as x_ann_ivf_probe2 (centroids 10..17 sit in the
    // backfill slice, so the fixed centroid model is the full-corpus
    // one, and per-vector cell assignment is batch-independent).
    "x_ann_ivf_incremental" ->
      s"""WITH e AS (SELECT vec_id, $qvec AS v FROM embeddings),
          cents AS (SELECT vec_id AS centroid_id, v AS centv FROM e
                    WHERE vec_id IN (10,11,12,13,14,15,16,17)),
          scoredc AS (
            SELECT e.vec_id, e.v, centroid_id,
                   ${cosSql("e.v", "centv")} AS ccos
            FROM e CROSS JOIN cents),
          ranked_cells AS (
            SELECT *, row_number() OVER (PARTITION BY vec_id
              ORDER BY ccos DESC, centroid_id) AS rk FROM scoredc),
          q AS (SELECT vec_id AS query_id, v AS qv, centroid_id AS cell
                FROM ranked_cells WHERE rk <= 2 AND vec_id IN (0, 1, 2, 3, 4)),
          c AS (SELECT vec_id AS cand_id, v AS cv, centroid_id AS cell
                FROM ranked_cells WHERE rk = 1),
          scored AS (
            SELECT query_id, cand_id, ${cosSql("qv", "cv")} AS cosine
            FROM c JOIN q USING (cell) WHERE query_id <> cand_id),
          ranked AS (
            SELECT query_id, cand_id, cosine,
              CAST(row_number() OVER (PARTITION BY query_id
                   ORDER BY cosine DESC, cand_id) AS INTEGER) AS rank
            FROM scored)
          SELECT query_id, cand_id, cosine, rank FROM ranked
          WHERE rank <= 10 ORDER BY query_id, rank""",

    "x_text_langid" -> {
      val best = langScores.map(_._2).reduce((a, b) => s"greatest($a, $b)")
      val cases = langScores.map { case (l, sc) =>
        s"WHEN $sc = ($best) AND ($best) > 0 THEN '$l'"
      }.mkString(" ")
      s"""SELECT doc_id, CASE $cases ELSE 'und' END AS lang_pred
          FROM documents ORDER BY doc_id"""
    },

    "x_text_langid2" -> {
      // same trigram profiles, same length/replace arithmetic, same
      // precedence (later CASE arms shadowed by earlier = Spark's
      // reverse-fold); CJK branch sized by ideograph count
      val scores = TextAnalysis.LangTrigrams.map { case (l, tris) =>
        l -> tris.map(t =>
          s"(length(t) - length(replace(t, '$t', '')))")
          .mkString("(", " + ", ")")
      }
      val best = scores.map(_._2).reduce((a, b) => s"greatest($a, $b)")
      val cases = scores.map { case (l, sc) =>
        s"WHEN $sc = ($best) AND ($best) > 0 THEN '$l'"
      }.mkString(" ")
      s"""WITH p AS (
            SELECT doc_id, ' ' || lower(text) || ' ' AS t,
              CAST(len(regexp_extract_all(text,
                '[\\x{4e00}-\\x{9fff}]')) AS DOUBLE) AS cjk,
              length(text) AS n
            FROM documents)
          SELECT doc_id,
            CASE WHEN cjk > n * 0.3 THEN 'zh'
                 $cases ELSE 'und' END AS lang_pred
          FROM p ORDER BY doc_id"""
    },

    "x_text_quality" ->
      """SELECT doc_id,
           CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS n_words,
           CAST(length(text) AS INTEGER) AS n_chars_obs,
           CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1) AS punct_ratio,
           CAST(len(list_filter(string_split(lower(text), ' '),
                t -> t IN ('the','and','of','to','a','der','die','und','das',
                           'ist','el','los','y','que','en','le','la','et',
                           'les','des'))) AS DOUBLE)
             / greatest(len(string_split(lower(text), ' ')), 1) AS stopword_ratio,
           CAST(length(text) - (len(string_split(lower(text), ' ')) - 1) AS DOUBLE)
             / greatest(len(string_split(lower(text), ' ')), 1) AS mean_word_len
         FROM documents ORDER BY doc_id""",

    "x_text_tokens" ->
      """SELECT doc_id,
           CAST(len(string_split(lower(text), ' ')) AS INTEGER) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text),
                '[a-z]+|[0-9]+|[^a-z0-9 \t\n\x0B\f\r]+')) AS INTEGER) AS re_tokens
         FROM documents ORDER BY doc_id""",

    "x_text_fingerprint" ->
      """SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
             string_split(lower(text), ' '))), ' ')) AS fingerprint
         FROM documents ORDER BY doc_id""",

    "x_sample_split" -> {
      val sampleBucket = Sampling.bucketSql("doc_id", 0)
      val splitBucket = Sampling.bucketSql("doc_id", 1)
      s"""WITH sampled AS (
            SELECT *, $splitBucket AS b FROM documents
            WHERE $sampleBucket < 500000),
          labeled AS (
            SELECT lang, n_chars,
              CASE WHEN b < 800000 THEN 'train'
                   WHEN b < 900000 THEN 'valid'
                   ELSE 'test' END AS split
            FROM sampled)
          SELECT lang, split, COUNT(*) AS n_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS total_chars
          FROM labeled GROUP BY 1, 2 ORDER BY 1, 2"""
    },

    "x_tfidf" ->
      """WITH tf AS (
           SELECT doc_id, t AS token, COUNT(*) AS tf FROM (
             SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
             FROM documents)
           GROUP BY 1, 2),
         dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents)
         SELECT doc_id, tf.token AS token, tf, df,
                round(tf * ln(n.n / df), 6) AS tfidf
         FROM tf JOIN dfreq USING (token) CROSS JOIN n
         WHERE doc_id < 20
         ORDER BY doc_id, token""",

    // bucket from md5 seed 0, sign from seed 1 — the same engine-
    // portable hash pair hashFeatures compiles into expressions
    "x_feature_hash" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
           FROM documents WHERE doc_id < 200),
         t2 AS (
           SELECT doc_id,
             CAST(CAST(('0x' || substr(md5('0|' || tok), 1, 15))
               AS BIGINT) % 64 AS INTEGER) AS bucket,
             (CAST(('0x' || substr(md5('1|' || tok), 1, 15))
               AS BIGINT) % 2) * 2 - 1 AS sgn
           FROM toks WHERE tok <> '')
         SELECT doc_id, bucket, CAST(SUM(sgn) AS BIGINT) AS weight
         FROM t2 GROUP BY 1, 2 HAVING SUM(sgn) <> 0
         ORDER BY doc_id, bucket""",

    "x_cdc_chunks" -> {
      val h = Hashing.hash64Sql("t", 4)
      s"""WITH toks AS (
            SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, l[i] AS t
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
                  FROM documents WHERE doc_id < 150) d,
              LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) g),
          marked AS (
            SELECT doc_id, pos, t,
              CASE WHEN ($h) % 16 = 0 THEN 1 ELSE 0 END AS b
            FROM toks),
          cum AS (
            SELECT doc_id, pos, t,
              CAST(SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS chunk_id
            FROM marked)
          SELECT doc_id, chunk_id,
            CAST(MIN(pos) AS INTEGER) AS start_pos,
            CAST(COUNT(*) AS INTEGER) AS n_toks,
            string_agg(t, ' ' ORDER BY pos) AS chunk
          FROM cum GROUP BY 1, 2
          ORDER BY doc_id, chunk_id"""
    },

    "x_seq_pack" ->
      """WITH d AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
           FROM documents),
         o AS (
           SELECT doc_id, n_toks,
             COALESCE(SUM(n_toks) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
           FROM d)
         SELECT doc_id, n_toks,
           CAST(off // 256 AS BIGINT) AS seq_id,
           CAST(off % 256 AS BIGINT) AS seq_offset
         FROM o ORDER BY doc_id""",

    "x_llm_pipeline" -> {
      val best = langScores.map(_._2).reduce((a, b) => s"greatest($a, $b)")
      val langCase = langScores.map { case (l, sc) =>
        s"WHEN $sc = ($best) AND ($best) > 0 THEN '$l'"
      }.mkString(" ")
      val splitBucket = Sampling.bucketSql("doc_id", 1)
      s"""WITH uniq AS (
            SELECT * FROM documents WHERE doc_id IN (
              SELECT MIN(doc_id) FROM documents GROUP BY md5(text))),
          quality AS (
            SELECT * FROM uniq
            WHERE len(string_split(lower(text), ' ')) >= 30),
          en AS (
            SELECT * FROM quality
            WHERE (CASE $langCase ELSE 'und' END) = 'en'),
          corpus AS (SELECT * FROM en WHERE doc_id % 97 <> 0),
          bench AS (
            SELECT string_split(lower(text), ' ') AS l
            FROM documents WHERE doc_id % 97 = 0),
          cg AS (
            SELECT doc_id, array_to_string(l[i:i+3], ' ') AS gram
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
                  FROM corpus) c,
              LATERAL (SELECT unnest(generate_series(1, len(l) - 3)) AS i) g),
          bg AS (
            SELECT DISTINCT array_to_string(l[i:i+3], ' ') AS gram
            FROM bench,
              LATERAL (SELECT unnest(generate_series(1, len(l) - 3)) AS i) g),
          bad AS (SELECT DISTINCT doc_id FROM cg JOIN bg USING (gram)),
          clean AS (
            SELECT * FROM corpus
            WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
          d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM clean),
          chunks AS (
            SELECT doc_id, toks, CAST(i AS INTEGER) AS start
            FROM d, LATERAL (
              SELECT unnest(generate_series(0, len(toks) - 1, 24)) AS i) g)
          SELECT doc_id,
            CAST(start // 24 AS INTEGER) AS chunk_id,
            CASE WHEN $splitBucket < 800000 THEN 'train'
                 WHEN $splitBucket < 900000 THEN 'valid'
                 ELSE 'test' END AS split,
            array_to_string(toks[start + 1 : start + 32], ' ') AS chunk,
            CAST(LEAST(len(toks) - start, 32) AS INTEGER) AS n_toks
          FROM chunks ORDER BY doc_id, chunk_id"""
    },

    "x_tfidf_sim" ->
      """WITH d AS (SELECT doc_id, text FROM documents WHERE doc_id < 150),
         tf AS (
           SELECT doc_id, t AS token, COUNT(*) AS tf FROM (
             SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
             FROM d)
           GROUP BY 1, 2),
         dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
         n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM d),
         wq AS (
           SELECT doc_id, token,
             CAST(round(tf * round(ln(n.nd / df), 9) * 1e6) AS BIGINT)
               AS wq
           FROM tf JOIN dfreq USING (token) CROSS JOIN n),
         norms AS (
           SELECT doc_id, CAST(SUM(CAST(wq AS HUGEINT) * wq) AS DOUBLE)
             AS norm2
           FROM wq GROUP BY 1),
         dots AS (
           SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(SUM(CAST(a.wq AS HUGEINT) * b.wq) AS DOUBLE) AS dot
           FROM wq a JOIN wq b ON a.token = b.token
             AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
         SELECT id_a, id_b,
           round(dot / (sqrt(na.norm2) * sqrt(nb.norm2)), 6) AS cosine
         FROM dots
         JOIN norms na ON na.doc_id = id_a
         JOIN norms nb ON nb.doc_id = id_b
         WHERE round(dot / (sqrt(na.norm2) * sqrt(nb.norm2)), 6) >= 0.5
         ORDER BY id_a, id_b""",

    "x_vocab" ->
      """WITH counts AS (
           SELECT t AS token, COUNT(*) AS n FROM (
             SELECT unnest(string_split(lower(text), ' ')) AS t
             FROM documents)
           GROUP BY 1 HAVING COUNT(*) >= 2)
         SELECT token, n,
           CAST(row_number() OVER (ORDER BY n DESC, token) AS INTEGER)
             AS token_id
         FROM counts ORDER BY token_id""",

    "x_heavy_hitters" ->
      """WITH toks AS (
           SELECT unnest(string_split(lower(text), ' ')) AS t
           FROM documents)
         SELECT t AS token, COUNT(*) AS n FROM toks GROUP BY 1
         HAVING COUNT(*) * 36 > (SELECT COUNT(*) FROM toks)
         ORDER BY 1""",

    // the sketch is deterministic given (depth=4, width=256, seed=7):
    // rebuild every counter with the same md5 row hashes, estimate =
    // min over rows, join exact counts
    "x_cms" ->
      """WITH rws AS (SELECT unnest(range(4)) AS r),
         cells AS (
           SELECT rws.r,
             CAST(CAST(('0x' || substr(md5(CAST(7 + rws.r AS VARCHAR) ||
               '|' || CAST(l.l_partkey AS VARCHAR)), 1, 15)) AS BIGINT)
               % 256 AS INTEGER) AS bucket
           FROM lineitem l CROSS JOIN rws
           WHERE l.l_partkey IS NOT NULL),
         sketch AS (SELECT r, bucket, COUNT(*) AS n
                    FROM cells GROUP BY 1, 2),
         q AS (SELECT p_partkey AS key FROM part WHERE p_partkey < 30),
         qc AS (
           SELECT q.key, rws.r,
             CAST(CAST(('0x' || substr(md5(CAST(7 + rws.r AS VARCHAR) ||
               '|' || CAST(q.key AS VARCHAR)), 1, 15)) AS BIGINT)
               % 256 AS INTEGER) AS bucket
           FROM q CROSS JOIN rws),
         est AS (
           SELECT key, MIN(COALESCE(n, 0)) AS est
           FROM qc LEFT JOIN sketch USING (r, bucket) GROUP BY 1),
         ex AS (SELECT l_partkey AS key, COUNT(*) AS n_exact
                FROM lineitem WHERE l_partkey < 30 GROUP BY 1)
         SELECT key, est, COALESCE(n_exact, 0) AS n_exact,
           est >= COALESCE(n_exact, 0) AS never_under
         FROM est LEFT JOIN ex USING (key) ORDER BY key""",

    "x_mm_features" ->
      """SELECT doc_id,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           md5(text) AS content_hash,
           CAST(octet_length(encode(text)) % 640 + 1 AS INTEGER) AS width,
           CAST(octet_length(encode(text)) % 480 + 1 AS INTEGER) AS height,
           CAST(octet_length(encode(text)) % 10 + 1 AS INTEGER) AS n_frames
         FROM documents ORDER BY doc_id""",

    "x_rollup_state_merge" ->
      """SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS price_sum,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
             AS qty_avg
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    // the maintained view must equal the plain full join
    "x_ivm_join" ->
      """SELECT o_orderstatus AS status, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey
         GROUP BY 1 ORDER BY 1""",

    // The sketch is only a candidate proposer; the final filter is an
    // exact count vs an exact per-group total, so plain SQL is the
    // oracle (same construction as x_heavy_hitters, per group).
    "x_mg_heavy_per_group" ->
      """WITH toks AS (
           SELECT lang, unnest(string_split(lower(text), ' ')) AS token
           FROM documents),
         tot AS (SELECT lang, COUNT(*) AS n_total FROM toks GROUP BY 1),
         cnt AS (SELECT lang, token, COUNT(*) AS n FROM toks GROUP BY 1, 2)
         SELECT c.lang, c.token, c.n
         FROM cnt c JOIN tot t USING (lang)
         WHERE c.n * 65 > t.n_total
         ORDER BY c.lang, c.token""",

    // Closed-form prediction of what the REAL P6 parse must read back:
    // dims from the generator, pixel sums by enumerating the raster
    // (pixel i = (doc_id*31 + i*7) % 256), and the 4x4 nearest-neighbor
    // resample via the same floor source mapping the codec uses
    // (src = out*in/4, integer division).
    "x_mm_decode" ->
      """WITH dims AS (
           SELECT doc_id,
                  CAST(doc_id % 31 + 2 AS INTEGER) AS width,
                  CAST(doc_id % 17 + 2 AS INTEGER) AS height
           FROM documents),
         px AS (
           SELECT doc_id, width, height,
                  unnest(range(0, CAST(3*width*height AS BIGINT))) AS i
           FROM dims),
         fullsum AS (
           SELECT doc_id, width, height,
                  SUM((doc_id*31 + i*7) % 256) AS pixel_sum
           FROM px GROUP BY 1, 2, 3),
         rz AS (
           SELECT doc_id, width, height, unnest(range(0, 48)) AS j
           FROM dims),
         rsum AS (
           SELECT doc_id,
                  SUM((doc_id*31 +
                       (3*(((j // 12) * height // 4) * width
                           + ((j // 3) % 4) * width // 4)
                        + j % 3) * 7) % 256) AS resized_sum
           FROM rz GROUP BY 1)
         SELECT f.doc_id, f.width, f.height,
                CAST(f.pixel_sum AS BIGINT) AS pixel_sum,
                CAST(r.resized_sum AS BIGINT) AS resized_sum
         FROM fullsum f JOIN rsum r USING (doc_id)
         ORDER BY f.doc_id""",

    // Same closed-form convention as x_mm_decode: the PNG round-trip is
    // lossless, so the oracle predicts the decoded sums straight from
    // the generator formula — the Spark side must inflate, CRC-check,
    // and unfilter correctly to reproduce them.
    "x_mm_png" ->
      """WITH dims AS (
           SELECT doc_id,
                  CAST(doc_id % 13 + 5 AS INTEGER) AS width,
                  CAST(doc_id % 11 + 5 AS INTEGER) AS height
           FROM documents),
         px AS (
           SELECT doc_id, width, height,
                  unnest(range(0, CAST(3*width*height AS BIGINT))) AS i
           FROM dims),
         fullsum AS (
           SELECT doc_id, width, height,
                  SUM((doc_id*37 + i*11) % 256) AS pixel_sum
           FROM px GROUP BY 1, 2, 3),
         rz AS (
           SELECT doc_id, width, height, unnest(range(0, 48)) AS j
           FROM dims),
         rsum AS (
           SELECT doc_id,
                  SUM((doc_id*37 +
                       (3*(((j // 12) * height // 4) * width
                           + ((j // 3) % 4) * width // 4)
                        + j % 3) * 11) % 256) AS resized_sum
           FROM rz GROUP BY 1)
         SELECT f.doc_id, f.width, f.height,
                CAST(f.pixel_sum AS BIGINT) AS pixel_sum,
                CAST(r.resized_sum AS BIGINT) AS resized_sum
         FROM fullsum f JOIN rsum r USING (doc_id)
         ORDER BY f.doc_id""",

    // JPEG is lossy — the oracle re-derives the exact dims and pins the
    // decode-tolerance booleans the Spark side computed against the
    // generator formula (x_approx_sketches convention).
    "x_mm_jpeg" ->
      """SELECT doc_id,
           CAST(doc_id % 13 + 8 AS INTEGER) AS width,
           CAST(doc_id % 11 + 8 AS INTEGER) AS height,
           TRUE AS sum_ok, TRUE AS maxdev_ok
         FROM documents ORDER BY doc_id""",

    // BMP (even docs, rich RGB) and GIF (odd docs, grayscale ≤256
    // colors) round-trip losslessly, so full and 5x5-resized pixel sums
    // are predicted in closed form exactly like x_mm_png. Heights ≥ 5
    // dodge the JDK GIF writer's h=4 quantization quirk.
    "x_mm_imageio" ->
      """WITH dims AS (
           SELECT doc_id,
                  CAST(doc_id % 9 + 4 AS INTEGER) AS width,
                  CAST(doc_id % 7 + 5 AS INTEGER) AS height,
                  doc_id % 2 AS odd
           FROM documents),
         px AS (
           SELECT doc_id, width, height, odd,
                  unnest(range(0, CAST(3*width*height AS BIGINT))) AS i
           FROM dims),
         fullsum AS (
           SELECT doc_id, width, height, odd,
                  SUM(CASE WHEN odd = 0 THEN (doc_id*31 + i*7) % 256
                      ELSE (doc_id*29 + (i // 3)*13) % 256 END) AS pixel_sum
           FROM px GROUP BY 1, 2, 3, 4),
         rz AS (
           SELECT doc_id, width, height, odd, unnest(range(0, 75)) AS j
           FROM dims),
         rsum AS (
           SELECT doc_id,
                  SUM(CASE WHEN odd = 0 THEN
                      (doc_id*31 +
                       (3*(((j // 15) * height // 5) * width
                           + ((j // 3) % 5) * width // 5)
                        + j % 3) * 7) % 256
                    ELSE
                      (doc_id*29 +
                       (((j // 15) * height // 5) * width
                        + ((j // 3) % 5) * width // 5) * 13) % 256
                    END) AS resized_sum
           FROM rz GROUP BY 1)
         SELECT f.doc_id,
                CASE WHEN f.odd = 0 THEN 'image/bmp'
                     ELSE 'image/gif' END AS mime,
                f.width, f.height,
                CAST(f.pixel_sum AS BIGINT) AS pixel_sum,
                CAST(r.resized_sum AS BIGINT) AS resized_sum
         FROM fullsum f JOIN rsum r USING (doc_id)
         ORDER BY f.doc_id""",

    // Per-frame pixel sums re-derived in closed form from the
    // generator formula: frame k of doc d is the grayscale raster
    // byte(i) = (d*29 + k*17 + (i//3)*13) % 256 over 3wh interleaved
    // bytes (r=g=b, so the sum is 3× the per-pixel series).
    "x_mm_gif_frames" ->
      """WITH dims AS (
           SELECT doc_id,
                  CAST(doc_id % 4 + 2 AS BIGINT) AS n,
                  CAST(doc_id % 9 + 4 AS INTEGER) AS width,
                  CAST(doc_id % 7 + 5 AS INTEGER) AS height
           FROM documents),
         frames AS (
           SELECT doc_id, width, height,
                  unnest(range(0, n)) AS k
           FROM dims),
         px AS (
           SELECT doc_id, width, height, k,
                  unnest(range(0, CAST(width*height AS BIGINT))) AS p
           FROM frames)
         SELECT doc_id, CAST(k AS INTEGER) AS frame_idx, width, height,
                CAST(SUM(3 * ((doc_id*29 + k*17 + p*13) % 256))
                  AS BIGINT) AS pixel_sum
         FROM px GROUP BY 1, 2, 3, 4
         ORDER BY doc_id, frame_idx""",

    // Header length is 'P6\n' + w + ' ' + h + '\n' + '255\n' = 9 + the
    // dims' digit counts; each frame is header + 3wh raster bytes.
    "x_mm_frames" ->
      """SELECT doc_id,
           CAST(doc_id % 5 + 1 AS INTEGER) AS n_frames,
           CAST(9 + length(CAST(doc_id % 7 + 2 AS VARCHAR))
                  + length(CAST(doc_id % 5 + 2 AS VARCHAR))
                  + 3*(doc_id % 7 + 2)*(doc_id % 5 + 2) AS BIGINT)
             AS frame_bytes,
           CAST((doc_id % 5 + 1) *
                (9 + length(CAST(doc_id % 7 + 2 AS VARCHAR))
                   + length(CAST(doc_id % 5 + 2 AS VARCHAR))
                   + 3*(doc_id % 7 + 2)*(doc_id % 5 + 2)) AS BIGINT)
             AS total_bytes
         FROM documents ORDER BY doc_id""",

    // aHash re-derived in closed-form integer arithmetic: per distinct
    // (seed, noisy) variant, 64 cells map to source pixels by the
    // nearest-neighbor floor rule, luminance = 299R+587G+114B off the
    // generator formula, bit set iff lum*64 > total (no division), and
    // the band join + popcount replay the Spark pair generation.
    "x_mm_phash" ->
      """WITH variants AS (
           SELECT DISTINCT CAST(doc_id % 50 AS BIGINT) AS seed,
                  CAST((doc_id // 50) % 2 AS BIGINT) AS noisy
           FROM documents),
         dims AS (
           SELECT seed, noisy, seed % 13 + 9 AS w, seed % 11 + 9 AS h
           FROM variants),
         cells AS (
           SELECT seed, noisy, c,
             (((c // 8) * h) // 8) * w + ((c % 8) * w) // 8 AS p
           FROM dims, generate_series(0, 63) t(c)),
         lums AS (
           SELECT seed, noisy, c,
             299 * ((seed * 31 + (3 * p) * 7) % 256)
           + 587 * ((seed * 31 + (3 * p + 1) * 7) % 256)
           + 114 * (CASE WHEN noisy = 1 AND p = 0 THEN 255
                    ELSE (seed * 31 + (3 * p + 2) * 7) % 256 END) AS lum
           FROM cells),
         tot AS (
           SELECT seed, noisy, SUM(lum) AS total FROM lums GROUP BY 1, 2),
         hashes AS (
           SELECT l.seed, l.noisy,
             CAST(SUM(CASE WHEN l.lum * 64 <= t.total THEN 0
                  WHEN l.c = 63 THEN CAST(-9223372036854775807 AS BIGINT) - 1
                  ELSE (CAST(1 AS BIGINT) << l.c) END) AS BIGINT)
               AS ahash
           FROM lums l JOIN tot t ON l.seed = t.seed AND l.noisy = t.noisy
           GROUP BY 1, 2),
         perdoc AS (
           SELECT d.doc_id, h.ahash
           FROM documents d JOIN hashes h
             ON d.doc_id % 50 = h.seed
             AND (d.doc_id // 50) % 2 = h.noisy),
         groups AS (
           SELECT ahash, COUNT(*) AS n_images, MIN(doc_id) AS min_doc
           FROM perdoc GROUP BY 1),
         dh AS (SELECT DISTINCT ahash FROM hashes),
         bands AS (
           SELECT ahash, j, (ahash >> (16 * j)) & 65535 AS band
           FROM dh, generate_series(0, 3) s(j)),
         cand AS (
           SELECT DISTINCT a.ahash AS ahash_a, b.ahash AS ahash_b
           FROM bands a JOIN bands b ON a.j = b.j AND a.band = b.band
           WHERE ROW((a.ahash >> 48) & 65535, (a.ahash >> 32) & 65535,
                     (a.ahash >> 16) & 65535, a.ahash & 65535)
               < ROW((b.ahash >> 48) & 65535, (b.ahash >> 32) & 65535,
                     (b.ahash >> 16) & 65535, b.ahash & 65535)),
         pairs AS (
           SELECT ahash_a, ahash_b,
             CAST(bit_count(xor(ahash_a, ahash_b)) AS INTEGER) AS hamming
           FROM cand)
         SELECT p.ahash_a, p.ahash_b, p.hamming,
           ga.n_images AS n_a, gb.n_images AS n_b
         FROM pairs p
           JOIN groups ga ON p.ahash_a = ga.ahash
           JOIN groups gb ON p.ahash_b = gb.ahash
         WHERE p.hamming <= 3
         ORDER BY p.ahash_a, p.ahash_b""",

    // Samples are s_i = (doc_id*7 + i*13) % 4096 - 2048 over the
    // interleaved stream; zero crossings pair consecutive samples via
    // lag(), matching the codec's sign-flip walk.
    "x_wav_decode" ->
      """WITH dims AS (
           SELECT doc_id,
                  CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
                  CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
                  CAST(doc_id % 50 + 20 AS BIGINT) AS n_samples
           FROM documents),
         sm AS (
           SELECT doc_id, sample_rate, channels, n_samples,
                  unnest(range(0, n_samples * channels)) AS i
           FROM dims),
         vals AS (
           SELECT doc_id, sample_rate, channels, n_samples, i,
                  (doc_id*7 + i*13) % 4096 - 2048 AS v
           FROM sm),
         stats AS (
           SELECT doc_id, sample_rate, channels, n_samples,
                  SUM(ABS(v)) AS abs_sum, MAX(ABS(v)) AS max_abs
           FROM vals GROUP BY 1, 2, 3, 4),
         zc AS (
           SELECT doc_id,
                  SUM(CASE WHEN prev IS NOT NULL AND
                            ((prev < 0 AND v >= 0) OR (prev >= 0 AND v < 0))
                      THEN 1 ELSE 0 END) AS zero_crossings
           FROM (SELECT doc_id, v,
                        lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
                 FROM vals)
           GROUP BY 1)
         SELECT s.doc_id, s.sample_rate, s.channels, s.n_samples,
                CAST(s.abs_sum AS BIGINT) AS abs_sum,
                CAST(s.max_abs AS INTEGER) AS max_abs,
                CAST(z.zero_crossings AS BIGINT) AS zero_crossings
         FROM stats s JOIN zc z USING (doc_id)
         ORDER BY s.doc_id""",

    "x_join_broadcast" ->
      s"""SELECT n_name, ${dsumSql("o_totalprice")} AS revenue,
            COUNT(*) AS n_orders
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1 ORDER BY 1""",

    "x_join_semi_anti" ->
      """SELECT
           (SELECT COUNT(*) FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
             AS n_with_orders,
           (SELECT COUNT(*) FROM customer
            WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey))
             AS n_without_orders""",

    "x_bloom_join" ->
      s"""SELECT l_returnflag, ${dsumSql("l_extendedprice")} AS revenue,
            COUNT(*) AS n_rows
          FROM lineitem
          WHERE l_suppkey IN
            (SELECT s_suppkey FROM supplier WHERE s_nationkey < 5)
          GROUP BY 1 ORDER BY 1""",

    "x_gap_fill" ->
      s"""WITH agg AS (
            SELECT o_orderstatus AS status, o_orderdate AS day,
              COUNT(*) AS n, ${dsumSql("o_totalprice")} AS revenue
            FROM orders GROUP BY 1, 2),
          bounds AS (SELECT status, MIN(day) AS d0, MAX(day) AS d1
                     FROM agg GROUP BY 1),
          spine AS (
            SELECT status,
              CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                AS day
            FROM bounds),
          j AS (
            SELECT s.status, s.day, COALESCE(a.n, 0) AS n, a.revenue
            FROM spine s LEFT JOIN agg a USING (status, day))
          SELECT status, day, n,
            LAST_VALUE(revenue IGNORE NULLS) OVER (
              PARTITION BY status ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue
          FROM j ORDER BY status, day""",

    "x_anomaly" ->
      s"""WITH agg AS (
            SELECT o_orderstatus AS status, o_orderdate AS day,
              ${dsumSql("o_totalprice")} AS revenue
            FROM orders GROUP BY 1, 2),
          bounds AS (SELECT status, MIN(day) AS d0, MAX(day) AS d1
                     FROM agg GROUP BY 1),
          spine AS (
            SELECT status,
              CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                AS day
            FROM bounds),
          filled AS (
            SELECT s.status, s.day, COALESCE(a.revenue, 0) AS revenue
            FROM spine s LEFT JOIN agg a USING (status, day)),
          m AS (
            SELECT status, COUNT(*) AS nd,
              SUM(CAST(revenue AS DECIMAL(18,2))) AS s1,
              -- 19,2 not 18,2: DuckDB keeps an 18+18 product in int64
              -- and overflows at sf0.1 revenue magnitudes (~1.02e9 in
              -- scaled units, squared > 2^63); 19+19 -> DECIMAL(38,4)
              -- int128, matching Spark's exact DECIMAL(37,4) product
              SUM(CAST(revenue AS DECIMAL(19,2)) *
                  CAST(revenue AS DECIMAL(19,2))) AS s2
            FROM filled GROUP BY 1),
          z AS (
            SELECT f.status, f.day, f.revenue,
              (f.revenue - CAST(s1 AS DOUBLE) / nd) /
                sqrt(CAST(s2 AS DOUBLE) / nd -
                  (CAST(s1 AS DOUBLE) / nd) * (CAST(s1 AS DOUBLE) / nd))
                AS z
            FROM filled f JOIN m USING (status))
          SELECT status, day, revenue, round(z, 6) AS z
          FROM z WHERE abs(z) > 2 ORDER BY status, day""",

    "x_rollup" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS year, o_orderstatus,
            ${dsumSql("o_totalprice")} AS revenue, COUNT(*) AS n_orders
          FROM orders
          GROUP BY ROLLUP (1, 2)
          ORDER BY year NULLS FIRST, o_orderstatus NULLS FIRST""",

    "x_json_extract" ->
      """SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS k_mod,
           COUNT(*) AS n,
           CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS k_sum
         FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "x_set_ops" ->
      """SELECT
           (SELECT COUNT(*) FROM
             (SELECT o_custkey FROM orders INTERSECT SELECT c_custkey FROM customer))
             AS n_intersect,
           (SELECT COUNT(*) FROM
             (SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders))
             AS n_except""",

    "x_cube" ->
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
         FROM customer
         GROUP BY CUBE (c_mktsegment, c_nationkey)
         ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""",

    "x_string_funcs" ->
      """SELECT p_partkey,
           concat_ws('|', p_brand, p_type) AS joined,
           substring(p_name, 1, 10) AS prefix10,
           CAST(levenshtein(p_brand, p_type) AS INTEGER) AS edit_dist,
           lpad(p_brand, 12, '.') AS padded,
           reverse(p_brand) AS reversed,
           CAST(CASE WHEN position('a' IN p_name) IS NULL THEN 0
                ELSE position('a' IN p_name) END AS INTEGER) AS first_a
         FROM part ORDER BY p_partkey""",

    "x_datetime" ->
      """SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS y,
           CAST(quarter(o_orderdate) AS INTEGER) AS q,
           CAST(month(o_orderdate) AS INTEGER) AS m,
           CAST(day(o_orderdate) AS INTEGER) AS d,
           strftime(o_orderdate, '%Y-%m') AS ym,
           CAST(epoch(date_trunc('month', o_orderdate)) AS BIGINT)
             AS month_start_epoch
         FROM orders ORDER BY o_orderkey""",

    "x_percentiles" ->
      """SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90
         FROM orders GROUP BY 1 ORDER BY 1""",

    "x_window_running" ->
      """SELECT o_orderkey, o_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS running_total
         FROM orders ORDER BY o_custkey, o_orderkey""",

    "x_window_suite" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           CAST(rank() OVER w AS INTEGER) AS rnk,
           CAST(dense_rank() OVER w AS INTEGER) AS drnk,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           cume_dist() OVER w AS cdist
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey)
         ORDER BY o_custkey, o_orderkey""",

    "x_dedup_survivors" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
         WHERE doc_id IN (
           SELECT MIN(doc_id) FROM documents GROUP BY md5(text))
         ORDER BY doc_id""",

    "x_array_funcs" ->
      """WITH t AS (
           SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents)
         SELECT doc_id,
           CAST(len(toks) AS INTEGER) AS n_toks,
           CAST(len(list_distinct(toks)) AS INTEGER) AS n_distinct,
           array_to_string(list_sort(list_distinct(toks)), ' ')
             AS sorted_vocab,
           list_sort(toks)[1] AS first_tok,
           list_sort(toks)[-1] AS last_tok,
           len(list_intersect(toks, ['data', 'query'])) > 0 AS has_kw,
           CAST(len(list_intersect(list_distinct(toks),
             ['data', 'query', 'table'])) AS INTEGER) AS n_kw
         FROM t ORDER BY doc_id""",

    // Relational re-derivation of the HOF results: explode tokens with
    // unnest, then plain aggregates.
    "x_hof_funcs" ->
      """WITH d AS (
           SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents WHERE doc_id < 200),
         tok AS (
           SELECT doc_id, unnest(toks) AS t FROM d)
         SELECT doc_id,
           CAST(SUM(len(t)) AS INTEGER) AS sum_len,
           CAST(COUNT(CASE WHEN len(t) > 4 THEN 1 END) AS INTEGER)
             AS n_long,
           CAST(MAX(len(t)) AS INTEGER) AS max_len,
           CAST(MAX(CASE WHEN len(t) > 7 THEN 1 ELSE 0 END) AS INTEGER)
             AS has_long,
           CAST(MIN(CASE WHEN len(t) > 0 THEN 1 ELSE 0 END) AS INTEGER)
             AS all_nonempty
         FROM tok GROUP BY doc_id ORDER BY doc_id""",

    "x_map_funcs" ->
      """WITH e AS (
           SELECT event_id, event_type,
             json_extract_string(props, '$.k') AS k
           FROM events WHERE event_id < 100)
         SELECT * FROM (
           SELECT event_id, 2 AS n_keys, event_type AS etype2,
             'etype' AS key, event_type AS value FROM e
           UNION ALL
           SELECT event_id, 2, event_type, 'k', k FROM e)
         ORDER BY event_id, key""",

    "x_explode_pos" ->
      """WITH d AS (
           SELECT doc_id, string_split(lower(text), ' ') AS toks
           FROM documents WHERE doc_id < 50),
         z AS (
           SELECT doc_id,
             unnest(list_zip(toks, range(0, len(toks)))) AS p
           FROM d)
         SELECT doc_id, CAST(p[2] AS INTEGER) AS pos,
           p[1] AS token
         FROM z ORDER BY doc_id, pos""",

    "x_typed_wavg" ->
      """SELECT l_returnflag,
           (CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                     * CAST(round(l_quantity) AS BIGINT)) AS DOUBLE) / 100.0)
             / CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
             AS wavg_price,
           COUNT(*) AS n_items
         FROM lineitem GROUP BY 1 ORDER BY 1""",

    "x_window_frames" ->
      """SELECT o_orderkey, o_custkey, o_totalprice,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER wt AS DOUBLE)
             / CAST(COUNT(*) OVER wt AS DOUBLE) AS trail_avg,
           MIN(o_totalprice) OVER wc AS band_lo,
           MAX(o_totalprice) OVER wc AS band_hi
         FROM orders
         WINDOW wt AS (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
                wc AS (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
         ORDER BY o_custkey, o_orderkey""",

    "x_pivot_multi" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS year,
           CAST(SUM(CASE WHEN l_returnflag = 'A'
             THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS A_qty,
           COUNT(CASE WHEN l_returnflag = 'A' THEN 1 END) AS A_n,
           CAST(SUM(CASE WHEN l_returnflag = 'N'
             THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS N_qty,
           COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS N_n,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
             THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS R_qty,
           COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS R_n
         FROM lineitem GROUP BY 1 ORDER BY year""",

    "x_window_range" ->
      """SELECT o_orderkey, o_custkey,
           CAST(epoch(o_orderdate) AS BIGINT) AS odate,
           COUNT(*) OVER w AS n_30d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
             AS rev_30d
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
           RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, odate, o_orderkey""",

    "x_null_semantics" ->
"""WITH e AS (
           SELECT event_id,
             CASE WHEN event_id % 7 = 0 THEN NULL
                  ELSE event_type END AS etype,
             CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS val
           FROM events)
         SELECT etype, COUNT(*) AS n_rows, COUNT(val) AS n_vals,
           CAST(SUM(CAST(val AS DECIMAL(18,2))) AS DOUBLE) AS val_sum,
           COUNT(CASE WHEN etype IS NOT DISTINCT FROM NULL THEN 1 END)
             AS n_nullsafe_hits,
           COUNT(CASE WHEN nullif(etype, 'click') IS NULL
                       AND etype IS NOT NULL THEN 1 END)
             AS n_clicks_via_nullif
         FROM e GROUP BY 1 ORDER BY 1 NULLS FIRST""",

    "x_mjoin_revenue" ->
      """SELECT l_orderkey, o_orderdate,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE c_mktsegment = 'BUILDING'
         GROUP BY 1, 2
         ORDER BY revenue DESC, l_orderkey LIMIT 20""",

    "x_mjoin_star" ->
      """SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
             AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
         GROUP BY 1 ORDER BY revenue DESC, n_name""",

    "x_subq_scalar" ->
      """SELECT c.c_nationkey, COUNT(*) AS n_above_avg
         FROM customer c
         WHERE c.c_acctbal > (SELECT AVG(c2.c_acctbal) FROM customer c2
                              WHERE c2.c_nationkey = c.c_nationkey)
           AND c.c_nationkey IN (SELECT n_nationkey FROM nation
                                 WHERE n_regionkey IN (SELECT r_regionkey
                                   FROM region WHERE r_name <> 'EUROPE'))
         GROUP BY c.c_nationkey
         ORDER BY c.c_nationkey""",

    "x_lateral_topk" ->
      """SELECT r.r_name, t.n_name, t.n_customers
         FROM region r, LATERAL (
           SELECT n.n_name, COUNT(*) AS n_customers
           FROM nation n JOIN customer c ON c.c_nationkey = n.n_nationkey
           WHERE n.n_regionkey = r.r_regionkey
           GROUP BY n.n_name
           ORDER BY n_customers DESC, n.n_name
           LIMIT 2) t
         ORDER BY r.r_name, t.n_customers DESC, t.n_name""",

    "x_subq_exists" ->
      """SELECT 'active' AS grp, c_nationkey, COUNT(*) AS n
         FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_totalprice > 50000)
         GROUP BY c_nationkey
         UNION ALL
         SELECT 'inactive' AS grp, c_nationkey, COUNT(*) AS n
         FROM customer c
         WHERE NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey)
         GROUP BY c_nationkey
         ORDER BY grp, c_nationkey""",

    "x_grouping_sets" ->
      """SELECT yr, o_orderstatus,
           CAST(GROUPING(yr) AS INTEGER) AS g_yr,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_st,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS revenue,
           COUNT(*) AS n_orders
         FROM (SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
                      o_orderstatus, o_totalprice FROM orders)
         GROUP BY GROUPING SETS ((yr, o_orderstatus), (yr),
           (o_orderstatus), ())
         ORDER BY g_yr, g_st, yr NULLS FIRST, o_orderstatus NULLS FIRST""",

    "x_stats_aggs" ->
      """SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           round(covar_pop(l_quantity, l_extendedprice), 4) AS covp_qp,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS covs_qp,
           round(stddev_pop(l_quantity), 6) AS sdp_q,
           round(var_pop(l_quantity), 6) AS varp_q,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope_pq,
           round(regr_intercept(l_extendedprice, l_quantity), 4)
             AS icept_pq
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",

    "x_dq_gate" ->
      """SELECT
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS null_qty,
           CAST(SUM(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)
             AS BIGINT) AS neg_price,
           CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END)
             AS BIGINT) AS high_discount,
           CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-06-01'
             THEN 1 ELSE 0 END) AS BIGINT) AS late_ship,
           (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
             (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
             AS n_orphans
         FROM lineitem""",

    "x_fd_check" ->
      """WITH c AS (
           SELECT l_partkey, l_suppkey, COUNT(*) AS n
           FROM lineitem WHERE l_partkey < 400 GROUP BY 1, 2)
         SELECT l_partkey, CAST(SUM(n) AS BIGINT) AS n_rows,
           COUNT(*) AS n_rhs_values,
           CAST(SUM(n) - MAX(n) AS BIGINT) AS n_violations,
           (SUM(n) - MAX(n)) = 0 AS holds
         FROM c GROUP BY 1 ORDER BY 1""",

    "x_fd_summary" ->
      """WITH c AS (
           SELECT l_partkey, l_suppkey, COUNT(*) AS n
           FROM lineitem GROUP BY 1, 2),
         g AS (
           SELECT l_partkey, SUM(n) AS n_rows, SUM(n) - MAX(n) AS viol
           FROM c GROUP BY 1)
         SELECT COUNT(*) AS n_groups,
           CAST(SUM(CASE WHEN viol = 0 THEN 0 ELSE 1 END) AS BIGINT)
             AS n_violating_groups,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(SUM(viol) AS BIGINT) AS n_violations,
           CAST(SUM(viol) AS DOUBLE) / CAST(SUM(n_rows) AS DOUBLE)
             AS g3_error
         FROM g""",

    "x_kcore" -> {
      // Every eN is referenced three times by the next peel round (the
      // k-table GROUP BY plus both IN subqueries); without MATERIALIZED
      // DuckDB inlines each reference, re-deriving the whole pairs
      // self-join 3^rounds times — the x10 replica sweep measured
      // >120 s inlined vs 4.4 s materialized, identical rows.
      def peel(ePrev: String, kTbl: String, eNext: String) =
        s"""$kTbl AS (SELECT src FROM $ePrev GROUP BY src
              HAVING COUNT(*) >= 3),
            $eNext AS MATERIALIZED (
              SELECT $ePrev.src, $ePrev.dst FROM $ePrev
              WHERE src IN (SELECT src FROM $kTbl)
                AND dst IN (SELECT src FROM $kTbl))"""
      s"""WITH bi AS MATERIALIZED (
            SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
          pairs AS MATERIALIZED (
            SELECT a.i AS u, b.i AS v
            FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
          e0 AS MATERIALIZED (SELECT u AS src, v AS dst FROM pairs
                 UNION ALL SELECT v, u FROM pairs),
          ${peel("e0", "k1", "e1")},
          ${peel("e1", "k2", "e2")},
          ${peel("e2", "k3", "e3")},
          ${peel("e3", "k4", "e4")}
          SELECT src AS node, COUNT(*) AS degree
          FROM e4 GROUP BY 1 ORDER BY 1"""
    },

    "x_markov_eval" -> {
      val isTest =
        s"${Hashing.hash64Sql("CAST(user_id AS VARCHAR)", 21)} % 5 = 0"
      s"""WITH t AS (
            SELECT user_id, event_type,
              CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
                AS BIGINT) AS sec, event_id
            FROM events),
          o AS (
            SELECT user_id, event_type AS cur,
              lag(event_type) OVER (PARTITION BY user_id
                ORDER BY sec, event_id) AS prev
            FROM t),
          tr AS (
            SELECT user_id, cur, prev, $isTest AS tst
            FROM o WHERE prev IS NOT NULL),
          cnt AS (
            SELECT prev, cur, COUNT(*) AS n FROM tr
            WHERE NOT tst GROUP BY 1, 2),
          pred AS (
            SELECT prev, cur AS pred FROM (
              SELECT prev, cur,
                row_number() OVER (PARTITION BY prev
                  ORDER BY n DESC, cur) AS rk
              FROM cnt)
            WHERE rk = 1)
          SELECT COUNT(*) AS n_test,
            CAST(SUM(CASE WHEN cur = pred THEN 1 ELSE 0 END) AS BIGINT)
              AS n_hits,
            CAST(SUM(CASE WHEN cur = pred THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE) AS accuracy
          FROM tr LEFT JOIN pred USING (prev) WHERE tst"""
    },

    "x_clustering_coef" ->
      """WITH bi AS (
           SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         pairs AS (
           SELECT a.i AS u, b.i AS v
           FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
           GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         deg AS (
           SELECT n, COUNT(*) AS d FROM (
             SELECT u AS n FROM pairs UNION ALL SELECT v FROM pairs)
           GROUP BY 1),
         tri AS (
           SELECT e1.u AS a, e1.v AS b, e2.v AS c
           FROM pairs e1
           JOIN pairs e2 ON e2.u = e1.v
           JOIN pairs e3 ON e3.u = e1.u AND e3.v = e2.v),
         corners AS (
           SELECT unnest([a, b, c]) AS n FROM tri),
         tc AS (SELECT n, COUNT(*) AS t FROM corners GROUP BY 1)
         SELECT deg.n AS node, deg.d AS degree,
           COALESCE(tc.t, 0) AS n_triangles,
           CASE WHEN deg.d >= 2 THEN
             CAST(COALESCE(tc.t, 0) * 2 AS DOUBLE)
               / CAST(deg.d * (deg.d - 1) AS DOUBLE)
           ELSE 0.0 END AS clustering_coef
         FROM deg LEFT JOIN tc ON deg.n = tc.n
         ORDER BY node""",

    "x_impute" -> {
      val mask = "CAST(('0x' || substr(md5('5|' || " +
        "CAST(l_orderkey AS VARCHAR) || '|' || " +
        "CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT) % 10 = 0"
      s"""WITH m AS (
            SELECT l_returnflag,
              CASE WHEN $mask THEN NULL ELSE l_quantity END AS q
            FROM lineitem),
          gm AS (
            SELECT l_returnflag, quantile_cont(q, 0.5) AS gmed
            FROM m WHERE q IS NOT NULL GROUP BY 1),
          gg AS (SELECT quantile_cont(q, 0.5) AS med
                 FROM m WHERE q IS NOT NULL),
          f AS (
            SELECT m.l_returnflag, q IS NULL AS imputed,
              COALESCE(q, gm.gmed, gg.med) AS qf
            FROM m LEFT JOIN gm ON m.l_returnflag = gm.l_returnflag
            CROSS JOIN gg)
          SELECT l_returnflag, COUNT(*) AS n,
            CAST(SUM(CASE WHEN imputed THEN 1 ELSE 0 END) AS BIGINT)
              AS n_imputed,
            CAST(SUM(CAST(qf AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
          FROM f GROUP BY 1 ORDER BY 1"""
    },

    // digit from the DECIMAL(18,2) string rendering; expected shares
    // re-derived via log10 and pinned at 9 dp on both engines
    // the 1-9 domain is closed on both sides: an absent digit rows out
    // with n=0 (and contributes N*p to the chi2 below)
    "x_benford" ->
      """WITH v AS (
           SELECT substr(regexp_replace(
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
             '[^1-9]', '', 'g'), 1, 1) AS ds
           FROM lineitem
           WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0),
         c0 AS (SELECT CAST(ds AS INTEGER) AS digit, COUNT(*) AS obs
               FROM v WHERE ds <> '' GROUP BY 1),
         c AS (SELECT d9.digit, CAST(COALESCE(obs, 0) AS BIGINT) AS n
               FROM (SELECT CAST(unnest(range(1, 10)) AS INTEGER)
                       AS digit) d9
               LEFT JOIN c0 USING (digit)),
         t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c)
         SELECT digit, n,
           CAST(n AS DOUBLE) / CAST(tot AS DOUBLE) AS share,
           round(log10(1.0 + 1.0 / digit), 9) AS expected,
           round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)
             - log10(1.0 + 1.0 / digit), 9) AS deviation
         FROM c CROSS JOIN t ORDER BY digit""",

    "x_benford_stat" ->
      """WITH v AS (
           SELECT substr(regexp_replace(
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR),
             '[^1-9]', '', 'g'), 1, 1) AS ds
           FROM lineitem
           WHERE l_extendedprice IS NOT NULL AND l_extendedprice > 0),
         c0 AS (SELECT CAST(ds AS INTEGER) AS digit, COUNT(*) AS obs
               FROM v WHERE ds <> '' GROUP BY 1),
         c AS (SELECT d9.digit, CAST(COALESCE(obs, 0) AS BIGINT) AS n
               FROM (SELECT CAST(unnest(range(1, 10)) AS INTEGER)
                       AS digit) d9
               LEFT JOIN c0 USING (digit)),
         t AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM c),
         d AS (
           SELECT n,
             CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)
               - log10(1.0 + 1.0 / digit) AS dev,
             log10(1.0 + 1.0 / digit) AS expd
           FROM c CROSS JOIN t)
         SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
           round(CAST(SUM(n) AS DOUBLE) * SUM(dev * dev / expd), 6)
             AS chi2
         FROM d""",

    "x_split_temporal" ->
      """WITH e AS (
           SELECT user_id,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) AS sec
           FROM events),
         s AS (
           SELECT user_id, sec,
             CASE WHEN sec <= 1705708800 THEN 'train'
                  WHEN sec > 1705708800 + 172800 THEN 'test'
                  ELSE 'embargo' END AS split
           FROM e)
         SELECT split, COUNT(*) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           MIN(sec) AS min_sec, MAX(sec) AS max_sec
         FROM s GROUP BY 1 ORDER BY 1""",

    "x_target_encode" ->
      """WITH d AS (
           SELECT doc_id, source,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM documents),
         pc AS (SELECT source, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS s
                FROM d GROUP BY 1),
         g AS (SELECT CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                 AS gmean FROM d)
         SELECT doc_id, source,
           (CAST(s - y AS DOUBLE) + 10.0 * gmean)
             / CAST(n - 1 + 10 AS DOUBLE) AS target_enc
         FROM d JOIN pc USING (source) CROSS JOIN g
         WHERE doc_id < 300 ORDER BY doc_id""",

    // ln pinned at 9dp on both engines (the PMI convention); iv_term
    // is the pinned product, so its sum is engine-portable too
    "x_woe" ->
      """WITH pc AS (
           SELECT o_orderpriority,
             COUNT(*) AS n,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_pos,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END)
               AS BIGINT) AS n_neg
           FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1),
         t AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS tp,
                 CAST(SUM(n_neg) AS BIGINT) AS tn,
                 CAST(COUNT(*) AS BIGINT) AS k FROM pc),
         w AS (
           SELECT o_orderpriority, n, n_pos, n_neg,
             round(ln(((CAST(n_pos AS DOUBLE) + 0.5)
                 / (CAST(tp AS DOUBLE) + 0.5 * CAST(k AS DOUBLE)))
               / ((CAST(n_neg AS DOUBLE) + 0.5)
                 / (CAST(tn AS DOUBLE) + 0.5 * CAST(k AS DOUBLE)))), 9)
               AS woe,
             ((CAST(n_pos AS DOUBLE) + 0.5)
                 / (CAST(tp AS DOUBLE) + 0.5 * CAST(k AS DOUBLE)))
               - ((CAST(n_neg AS DOUBLE) + 0.5)
                 / (CAST(tn AS DOUBLE) + 0.5 * CAST(k AS DOUBLE)))
               AS dd
           FROM pc CROSS JOIN t)
         SELECT o_orderpriority, n, n_pos, n_neg, woe,
           round(dd * woe, 9) AS iv_term
         FROM w ORDER BY o_orderpriority""",

    "x_heavy_change" ->
      """WITH pk AS (
           SELECT l_partkey,
             CAST(SUM(CASE WHEN l_orderkey % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN l_orderkey % 2 = 0 THEN 0 ELSE 1 END)
               AS BIGINT) AS n2
           FROM lineitem GROUP BY 1),
         t AS (SELECT CAST(SUM(n1) AS BIGINT) AS t1,
                 CAST(SUM(n2) AS BIGINT) AS t2 FROM pk)
         SELECT l_partkey, n1, n2,
           CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE)
             - CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE) AS share_delta,
           abs(CAST(n1 AS DOUBLE) / CAST(t1 AS DOUBLE)
             - CAST(n2 AS DOUBLE) / CAST(t2 AS DOUBLE)) AS abs_delta
         FROM pk CROSS JOIN t
         ORDER BY abs_delta DESC, l_partkey LIMIT 20""",

    "x_events_tumbling" ->
      s"""SELECT CAST(epoch(time_bucket(INTERVAL '10 minutes',
                 CAST(ts AS TIMESTAMP))) AS BIGINT) AS bucket_start,
            event_type, COUNT(*) AS n_events,
            ${dsumSql("value")} AS total_value
          FROM events GROUP BY 1, 2 ORDER BY 1, 2""",

    "x_range_join" ->
      """WITH e AS (
           SELECT event_id, event_type,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
           FROM events),
         hot AS (
           SELECT event_type AS hot_type, bucket - 300 AS lo,
                  bucket + 900 AS hi
           FROM (SELECT sec - sec % 600 AS bucket, event_type,
                        COUNT(*) AS n FROM e GROUP BY 1, 2)
           WHERE n >= 2)
         SELECT hot_type, lo, hi, COUNT(*) AS n_events_in_range
         FROM hot JOIN e ON e.sec >= hot.lo AND e.sec < hot.hi
         GROUP BY 1, 2, 3 ORDER BY 1, 2""",

    "x_asof_join" ->
      """WITH e AS (
           SELECT event_id, user_id, event_type, value,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
           FROM events),
         l AS (SELECT event_id, user_id, sec, value FROM e
               WHERE event_type = 'purchase'),
         r AS (SELECT user_id, sec, max(value) AS signup_value,
                      sec AS signup_sec
               FROM e WHERE event_type = 'signup' GROUP BY user_id, sec)
         SELECT l.event_id, l.user_id, l.sec, l.value,
                r.signup_value AS asof_signup_value,
                r.signup_sec AS asof_signup_sec
         FROM l ASOF LEFT JOIN r
           ON l.user_id = r.user_id AND l.sec >= r.sec
         ORDER BY l.event_id""",

    "x_forecast_ma" ->
      """WITH daily AS (
           SELECT event_type,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) // 86400 AS day,
             SUM(CAST(value AS DECIMAL(18,2))) AS total
           FROM events GROUP BY 1, 2),
         f AS (
           SELECT event_type, day, CAST(total AS DOUBLE) AS total,
             CAST(SUM(total) OVER w AS DOUBLE)
               / COUNT(total) OVER w AS forecast
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
         SELECT event_type, day, total, forecast,
           abs(total - forecast) AS abs_err
         FROM f WHERE forecast IS NOT NULL
         ORDER BY event_type, day""",

    "x_gains" ->
      """WITH f AS (
           SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                  (len(list_filter(string_split(lower(text), ' '),
                      t -> t IN ('the', 'and', 'of', 'to', 'a'))) * 1000)
                    // len(string_split(lower(text), ' ')) AS s
           FROM documents),
         c AS (SELECT s, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos
               FROM f GROUP BY 1),
         t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn,
                 CAST(SUM(pos) AS BIGINT) AS tp FROM c),
         r AS (
           SELECT s, n, pos,
             CAST(SUM(n) OVER (ORDER BY s DESC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
             CAST(SUM(pos) OVER (ORDER BY s DESC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp
           FROM c),
         b AS (
           SELECT CAST((cn - 1) * 10 // tn AS INTEGER) + 1 AS bucket,
             cn, cp, tn, tp
           FROM r CROSS JOIN t)
         SELECT bucket, MAX(cn) AS n_cum, MAX(cp) AS pos_cum,
           CAST(MAX(cp) AS DOUBLE) / CAST(MAX(tp) AS DOUBLE) AS gain,
           (CAST(MAX(cp) AS DOUBLE) / CAST(MAX(tp) AS DOUBLE))
             / (CAST(MAX(cn) AS DOUBLE) / CAST(MAX(tn) AS DOUBLE))
             AS lift
         FROM b GROUP BY bucket ORDER BY bucket""",

    "x_seasonal_decompose" ->
      """WITH daily AS (
           SELECT event_type,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) // 86400 AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
           FROM events GROUP BY 1, 2),
         tr AS (
           SELECT event_type, day, total,
             COUNT(total) OVER w AS wn,
             CASE WHEN COUNT(total) OVER w = 7 THEN
               CAST(SUM(CAST(total AS DECIMAL(28,9))) OVER w AS DOUBLE)
                 / 7.0 END AS trend,
             day % 7 AS phase
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
         pm AS (
           SELECT event_type, phase,
             CAST(SUM(CAST(total - trend AS DECIMAL(28,9))) AS DOUBLE)
               / COUNT(*) AS pmv
           FROM tr WHERE trend IS NOT NULL GROUP BY 1, 2),
         pc AS (
           SELECT event_type,
             CAST(SUM(CAST(pmv AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*)
               AS pcv
           FROM pm GROUP BY 1),
         j AS (
           SELECT tr.event_type, day, total, trend,
             CASE WHEN trend IS NOT NULL THEN pm.pmv - pc.pcv END
               AS seasonal
           FROM tr
           LEFT JOIN pm ON tr.event_type = pm.event_type
             AND tr.phase = pm.phase
           LEFT JOIN pc ON tr.event_type = pc.event_type)
         SELECT event_type, day, total, trend,
           round(seasonal, 6) AS seasonal,
           round(total - trend - seasonal, 6) AS remainder
         FROM j ORDER BY event_type, day""",

    "x_conformal" ->
      """WITH daily AS (
           SELECT event_type,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) // 86400 AS day,
             SUM(CAST(value AS DECIMAL(18,2))) AS total
           FROM events GROUP BY 1, 2),
         f AS (
           SELECT event_type, day, CAST(total AS DOUBLE) AS total,
             CAST(SUM(total) OVER w AS DOUBLE)
               / COUNT(total) OVER w AS forecast
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day
             ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
         r AS (SELECT *, abs(total - forecast) AS resid
               FROM f WHERE forecast IS NOT NULL),
         q AS (SELECT event_type, quantile_cont(resid, 0.9) AS q
               FROM r GROUP BY 1)
         SELECT r.event_type, day, total, forecast, q.q AS q,
           forecast - q.q AS lo, forecast + q.q AS hi,
           total >= forecast - q.q AND total <= forecast + q.q AS hit
         FROM r JOIN q ON r.event_type = q.event_type
         ORDER BY r.event_type, day""",

    "x_ks_test" ->
      """WITH av AS (
           SELECT l_quantity AS v, COUNT(*) AS ca FROM lineitem
           WHERE l_shipdate < TIMESTAMP '1996-01-01'
             AND l_quantity IS NOT NULL GROUP BY 1),
         bv AS (
           SELECT l_quantity AS v, COUNT(*) AS cb FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_quantity IS NOT NULL GROUP BY 1),
         p AS (
           SELECT COALESCE(av.v, bv.v) AS v, COALESCE(ca, 0) AS ca,
             COALESCE(cb, 0) AS cb
           FROM av FULL OUTER JOIN bv ON av.v = bv.v),
         t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                 CAST(SUM(cb) AS BIGINT) AS nb FROM p),
         c AS (
           SELECT v,
             CAST(SUM(ca) OVER w AS BIGINT) AS fa,
             CAST(SUM(cb) OVER w AS BIGINT) AS fb
           FROM p WINDOW w AS (ORDER BY v ROWS BETWEEN
             UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT t.na AS n_a, t.nb AS n_b,
           CAST(MAX(abs(fa * t.nb - fb * t.na)) AS DOUBLE)
             / CAST(t.na * t.nb AS DOUBLE) AS ks_d
         FROM c CROSS JOIN t GROUP BY t.na, t.nb""",

    // the same pooled-CDF frame as x_ks_test, integrated over the value
    // axis: HUGEINT products mirror the engine's exact DECIMAL(38,0)
    // terms (both are the same exact integer, cast to double once).
    "x_emd_drift" ->
      """WITH av AS (
           SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
             COUNT(*) AS ca
           FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01'
           GROUP BY 1),
         bv AS (
           SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
             COUNT(*) AS cb
           FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           GROUP BY 1),
         p AS (
           SELECT COALESCE(av.v, bv.v) AS v, COALESCE(ca, 0) AS ca,
             COALESCE(cb, 0) AS cb
           FROM av FULL OUTER JOIN bv ON av.v = bv.v),
         t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                 CAST(SUM(cb) AS BIGINT) AS nb FROM p),
         c AS (
           SELECT v,
             CAST(SUM(ca) OVER w AS BIGINT) AS fa,
             CAST(SUM(cb) OVER w AS BIGINT) AS fb,
             lead(v) OVER (ORDER BY v) AS nxt
           FROM p WINDOW w AS (ORDER BY v ROWS BETWEEN
             UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT t.na AS n_a, t.nb AS n_b,
           CAST(SUM(CAST(nxt - v AS HUGEINT)
               * CAST(abs(fa * t.nb - fb * t.na) AS HUGEINT)) AS DOUBLE)
             / CAST(t.na * t.nb AS DOUBLE) AS emd
         FROM c CROSS JOIN t
         WHERE nxt IS NOT NULL
         GROUP BY t.na, t.nb""",

    "x_theil_sen" ->
      """WITH monthly AS (
           SELECT o_orderstatus AS status,
             CAST(epoch(date_trunc('second', CAST(o_orderdate
               AS TIMESTAMP))) AS BIGINT) // 86400 // 30 AS month,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
           FROM orders GROUP BY 1, 2),
         sl AS (
           SELECT a.status,
             (b.revenue - a.revenue)
               / CAST(b.month - a.month AS DOUBLE) AS s
           FROM monthly a JOIN monthly b
             ON a.status = b.status AND a.month < b.month),
         m AS (
           SELECT status, quantile_cont(s, 0.5) AS slope,
             COUNT(*) AS n_pairs
           FROM sl GROUP BY 1),
         r AS (
           SELECT d.status, slope, n_pairs,
             revenue - slope * CAST(month AS DOUBLE) AS r
           FROM monthly d JOIN m ON d.status = m.status)
         SELECT status, slope, quantile_cont(r, 0.5) AS intercept,
           n_pairs
         FROM r GROUP BY status, slope, n_pairs ORDER BY status""",

    "x_robust_scale" ->
      """WITH st AS (
           SELECT l_returnflag,
             quantile_cont(l_quantity, 0.5) AS med,
             quantile_cont(l_quantity, 0.75)
               - quantile_cont(l_quantity, 0.25) AS iqr
           FROM lineitem WHERE l_quantity IS NOT NULL GROUP BY 1)
         SELECT l_orderkey, l_linenumber, l.l_returnflag, l_quantity,
           CASE WHEN iqr <> 0.0 THEN (l_quantity - med) / iqr END
             AS l_quantity_scaled
         FROM lineitem l JOIN st ON l.l_returnflag = st.l_returnflag
         WHERE l_orderkey < 2000
         ORDER BY l_orderkey, l_linenumber""",

    "x_quantile_transform" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
           percent_rank() OVER (PARTITION BY c_mktsegment
             ORDER BY c_acctbal, c_custkey) AS q_acctbal
         FROM customer
         QUALIFY c_custkey < 300
         ORDER BY c_custkey""",

    "x_gini" ->
      """WITH spend AS (
           SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS spend
           FROM orders GROUP BY 1),
         j AS (
           SELECT c_mktsegment, spend,
             CAST(spend AS DECIMAL(18,2)) AS v
           FROM spend JOIN customer ON o_custkey = c_custkey),
         r AS (
           SELECT c_mktsegment, v,
             CAST(row_number() OVER (PARTITION BY c_mktsegment
               ORDER BY spend) AS BIGINT) AS i,
             CAST(COUNT(*) OVER (PARTITION BY c_mktsegment) AS BIGINT)
               AS n
           FROM j)
         SELECT c_mktsegment, MAX(n) AS n,
           ROUND(CAST(SUM((i * 2 - n - 1) * v) AS DOUBLE)
             / CAST(MAX(n) * SUM(v) AS DOUBLE), 9) AS gini
         FROM r GROUP BY c_mktsegment ORDER BY c_mktsegment""",

    "x_markov" ->
      """WITH t AS (
           SELECT user_id, event_type,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) AS sec, event_id
           FROM events),
         o AS (
           SELECT event_type AS cur,
             lag(event_type) OVER (PARTITION BY user_id
               ORDER BY sec, event_id) AS prev
           FROM t),
         pairs AS (
           SELECT prev, cur, COUNT(*) AS n_trans FROM o
           WHERE prev IS NOT NULL GROUP BY 1, 2),
         totals AS (
           SELECT prev, CAST(SUM(n_trans) AS BIGINT) AS n_from
           FROM pairs GROUP BY 1)
         SELECT prev, cur, n_trans,
           CAST(n_trans AS DOUBLE) / n_from AS p
         FROM pairs JOIN totals USING (prev)
         ORDER BY prev, cur""",

    "x_event_paths" ->
      """WITH t AS (
           SELECT user_id, event_id, event_type,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) AS sec
           FROM events),
         o AS (
           SELECT user_id, event_id, event_type, sec,
             CASE WHEN lag(sec) OVER w IS NULL
                    OR sec - lag(sec) OVER w > 1800 THEN 1
                  ELSE 0 END AS is_new
           FROM t
           WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
         s AS (
           SELECT user_id, event_id, event_type, sec,
             SUM(is_new) OVER (PARTITION BY user_id
               ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM o),
         p AS (
           SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY sec, event_id) AS path
           FROM s GROUP BY 1, 2)
         SELECT path, COUNT(*) AS n_sessions FROM p
         GROUP BY 1 ORDER BY n_sessions DESC, path LIMIT 20""",

    "x_seq_pattern" ->
      """WITH t AS (
           SELECT user_id, event_id, event_type,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) AS sec
           FROM events),
         o AS (
           SELECT user_id, event_id, event_type, sec,
             CASE WHEN lag(sec) OVER w IS NULL
                    OR sec - lag(sec) OVER w > 1800 THEN 1
                  ELSE 0 END AS is_new
           FROM t
           WINDOW w AS (PARTITION BY user_id ORDER BY sec, event_id)),
         s AS (
           SELECT user_id, event_id, event_type, sec,
             SUM(is_new) OVER (PARTITION BY user_id
               ORDER BY sec, event_id ROWS UNBOUNDED PRECEDING) AS sid
           FROM o),
         p AS (
           SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY sec, event_id) AS path
           FROM s GROUP BY 1, 2),
         m AS (
           SELECT
             regexp_matches(path, 'view.*purchase') AS converted,
             path NOT LIKE '%>%' AS bounce,
             regexp_matches(path, '^(view>?)+$') AS browse_only
           FROM p)
         SELECT converted, bounce, browse_only,
           COUNT(*) AS n_sessions
         FROM m GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""",

    "x_ab_test" -> {
      val bucket = Sampling.bucketSql("user_id", 7)
      s"""WITH p AS (
            SELECT CASE WHEN $bucket < 500000 THEN 'A' ELSE 'B' END
              AS variant, value
            FROM events WHERE event_type = 'purchase'),
          g AS (
            SELECT variant, COUNT(*) AS n,
              CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
              CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
                AS s2
            FROM p GROUP BY 1),
          v AS (
            SELECT variant, n, s1 / n AS mean,
              (s2 - s1 * s1 / n) / (n - 1) AS variance
            FROM g)
          SELECT a.n AS n_a, b.n AS n_b,
            a.mean AS mean_a, b.mean AS mean_b,
            (a.mean - b.mean)
              / sqrt(a.variance / a.n + b.variance / b.n) AS z_score
          FROM (SELECT * FROM v WHERE variant = 'A') a
          CROSS JOIN (SELECT * FROM v WHERE variant = 'B') b"""
    },

    // exact DECIMAL(18,4) moments mirrored term for term; r unfolds
    // with the same op order; zero-variance pairs null out
    "x_corr_matrix" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount",
        "l_tax")
      val short = cs.map(c => c -> c.stripPrefix("l_").take(2)).toMap
      val sel = cs.map(c =>
        s"CAST($c AS DECIMAL(18,4)) AS ${short(c)}").mkString(", ")
      val notNull = cs.map(c => s"$c IS NOT NULL").mkString(" AND ")
      // operands up-cast to DECIMAL(19,4) before multiplying: DuckDB
      // stores width<=18 in int64 and its raw product overflows on
      // price-sized values; width 19 forces int128, result (38,8)
      // exact — identical values to Spark's (18,4)x(18,4)->(37,8)
      def wide(c: String) = s"CAST($c AS DECIMAL(19,4))"
      val moments = (cs.map(c =>
        s"CAST(SUM(${short(c)}) AS DOUBLE) AS s_${short(c)}") ++
        cs.map(c => s"CAST(SUM(CAST(${wide(short(c))} * " +
          s"${wide(short(c))} AS " +
          s"DECIMAL(38,8))) AS DOUBLE) AS ss_${short(c)}") ++
        (for (i <- cs.indices; j <- (i + 1) until cs.size) yield
          s"CAST(SUM(CAST(${wide(short(cs(i)))} * ${wide(short(cs(j)))} AS " +
            s"DECIMAL(38,8))) AS DOUBLE) AS x_${short(cs(i))}_${short(cs(j))}"))
        .mkString(",\n              ")
      val rows = (for (i <- cs.indices; j <- (i + 1) until cs.size)
        yield {
          val (a, b) = (short(cs(i)), short(cs(j)))
          s"""SELECT '${cs(i)}' AS col_a, '${cs(j)}' AS col_b, n,
             CASE WHEN (ss_$a - s_$a * s_$a / n)
                 * (ss_$b - s_$b * s_$b / n) > 0
               THEN round((x_${a}_$b - s_$a * s_$b / n)
                 / sqrt((ss_$a - s_$a * s_$a / n)
                   * (ss_$b - s_$b * s_$b / n)), 9) END AS r
           FROM m"""
        }).mkString(" UNION ALL ")
      s"""WITH d AS (SELECT $sel FROM lineitem WHERE $notNull),
          m AS (SELECT COUNT(*) AS n, $moments FROM d)
          $rows ORDER BY col_a, col_b"""
    },

    // a plain global window is fine ORACLE-side; the engine's
    // two-phase form must reproduce it exactly
    "x_pareto" ->
      """WITH pr AS (
            SELECT l_partkey,
              SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
            FROM lineitem GROUP BY 1),
          t AS (SELECT SUM(rev) AS tot FROM pr),
          r AS (
            SELECT l_partkey, rev,
              CAST(row_number() OVER (ORDER BY rev DESC, l_partkey)
                AS BIGINT) AS rank,
              SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                ROWS UNBOUNDED PRECEDING) AS cum
            FROM pr),
          s AS (SELECT rank,
              round(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 9)
                AS share
            FROM r CROSS JOIN t),
          th AS (SELECT unnest([0.5, 0.8, 0.9, 0.95, 0.99])
              AS threshold)
          SELECT threshold, MIN(rank) AS n_parts,
            min_by(share, rank) AS share_at
          FROM th JOIN s ON s.share >= th.threshold
          GROUP BY 1 ORDER BY 1""",

    // direct per-group DECIMAL-moment correlations over the FULL
    // table — the engine's two-slice merge must equal this exactly
    // (exact sums merge losslessly); operands up-cast to (19,4) for
    // DuckDB's int64 multiply
    "x_incr_corr" -> {
      val cs = Seq("l_quantity", "l_extendedprice", "l_discount")
      val short = Map("l_quantity" -> "qu", "l_extendedprice" -> "ex",
        "l_discount" -> "di")
      val sel = cs.map(c =>
        s"CAST($c AS DECIMAL(18,4)) AS ${short(c)}").mkString(", ")
      val notNull = cs.map(c => s"$c IS NOT NULL").mkString(" AND ")
      def wide(c: String) = s"CAST($c AS DECIMAL(19,4))"
      val moments = (cs.map(c =>
        s"CAST(SUM(${short(c)}) AS DOUBLE) AS s_${short(c)}") ++
        cs.map(c => s"CAST(SUM(CAST(${wide(short(c))} * " +
          s"${wide(short(c))} AS DECIMAL(38,8))) AS DOUBLE) " +
          s"AS ss_${short(c)}") ++
        (for (i <- cs.indices; j <- (i + 1) until cs.size) yield
          s"CAST(SUM(CAST(${wide(short(cs(i)))} * " +
            s"${wide(short(cs(j)))} AS DECIMAL(38,8))) AS DOUBLE) " +
            s"AS x_${short(cs(i))}_${short(cs(j))}"))
        .mkString(",\n              ")
      val rows = (for (i <- cs.indices; j <- (i + 1) until cs.size)
        yield {
          val (a, b) = (short(cs(i)), short(cs(j)))
          s"""SELECT g AS l_returnflag, '${cs(i)}' AS col_a,
             '${cs(j)}' AS col_b, n,
             CASE WHEN (ss_$a - s_$a * s_$a / n)
                 * (ss_$b - s_$b * s_$b / n) > 0
               THEN round((x_${a}_$b - s_$a * s_$b / n)
                 / sqrt((ss_$a - s_$a * s_$a / n)
                   * (ss_$b - s_$b * s_$b / n)), 9) END AS r
           FROM m"""
        }).mkString(" UNION ALL ")
      s"""WITH d AS (SELECT l_returnflag AS g, $sel FROM lineitem
            WHERE $notNull),
          m AS (SELECT g, COUNT(*) AS n, $moments FROM d GROUP BY 1)
          $rows ORDER BY l_returnflag, col_a, col_b"""
    },

    // two Behavior.funnel replays split by the hash variant; pooled
    // two-proportion z with the engine's exact op order
    "x_funnel_sig" -> {
      val bucket = Sampling.bucketSql("user_id", 7)
      s"""WITH e AS (
            SELECT user_id, event_type,
              CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
                AS BIGINT) AS sec,
              CASE WHEN $bucket < 500000 THEN 'A' ELSE 'B' END
                AS variant
            FROM events),
          s1 AS (SELECT variant, user_id, MIN(sec) AS t1 FROM e
                 WHERE event_type = 'view' GROUP BY 1, 2),
          s2 AS (SELECT e.user_id, MIN(sec) AS t2 FROM e
                 JOIN s1 USING (user_id)
                 WHERE event_type = 'click'
                   AND sec >= t1 AND sec <= t1 + 86400 GROUP BY 1),
          s3 AS (SELECT e.user_id, MIN(sec) AS t3 FROM e
                 JOIN s2 USING (user_id)
                 WHERE event_type = 'purchase'
                   AND sec >= t2 AND sec <= t2 + 86400 GROUP BY 1),
          r AS (SELECT s1.variant, COUNT(t1) AS n1, COUNT(t2) AS n2,
                  COUNT(t3) AS n3
                FROM s1 LEFT JOIN s2 USING (user_id)
                  LEFT JOIN s3 USING (user_id)
                GROUP BY 1),
          w AS (SELECT
              MAX(CASE WHEN variant = 'A' THEN n1 END) AS a1,
              MAX(CASE WHEN variant = 'A' THEN n2 END) AS a2,
              MAX(CASE WHEN variant = 'A' THEN n3 END) AS a3,
              MAX(CASE WHEN variant = 'B' THEN n1 END) AS b1,
              MAX(CASE WHEN variant = 'B' THEN n2 END) AS b2,
              MAX(CASE WHEN variant = 'B' THEN n3 END) AS b3
            FROM r),
          st AS (
            SELECT CAST(2 AS INTEGER) AS stage, 'click' AS step,
              a1 AS d_a, a2 AS n_a, b1 AS d_b, b2 AS n_b FROM w
            UNION ALL
            SELECT CAST(3 AS INTEGER), 'purchase',
              a2, a3, b2, b3 FROM w),
          pp AS (
            SELECT stage, step, d_a, n_a, d_b, n_b,
              CAST(n_a AS DOUBLE) / CAST(d_a AS DOUBLE) AS p_a,
              CAST(n_b AS DOUBLE) / CAST(d_b AS DOUBLE) AS p_b,
              CAST(n_a + n_b AS DOUBLE) / CAST(d_a + d_b AS DOUBLE)
                AS p
            FROM st)
          SELECT stage, step, d_a, n_a, d_b, n_b, p_a, p_b,
            CASE WHEN p > 0 AND p < 1 AND d_a > 0 AND d_b > 0
              THEN round((p_a - p_b) / sqrt(p * (1.0 - p)
                * (1.0 / d_a + 1.0 / d_b)), 9) END AS z
          FROM pp ORDER BY stage"""
    },

    // mirrors the engine's exact chain: DECIMAL(18,2) per-user period
    // sums -> DECIMAL(18,4) quantization -> exact DECIMAL moments ->
    // 9dp-pinned theta/E[X]/adjusted values -> exact DECIMAL
    // re-aggregation -> 6dp output pin
    "x_cuped" -> {
      val bucket = Sampling.bucketSql("user_id", 7)
      s"""WITH p AS (
            SELECT user_id, value,
              CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
                AS BIGINT) // 86400 AS day
            FROM events WHERE event_type = 'purchase'),
          d0 AS (SELECT MIN(day) AS d0 FROM p),
          u AS (
            SELECT user_id,
              CAST(SUM(CAST(CASE WHEN day < d0 + 15 THEN value
                ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS x,
              CAST(SUM(CAST(CASE WHEN day >= d0 + 15 THEN value
                ELSE 0.0 END AS DECIMAL(18,2))) AS DOUBLE) AS y
            FROM p CROSS JOIN d0 GROUP BY 1),
          q AS (
            SELECT CASE WHEN $bucket < 500000 THEN 'A' ELSE 'B' END
                AS variant,
              CAST(x AS DECIMAL(18,4)) AS xq,
              CAST(y AS DECIMAL(18,4)) AS yq
            FROM u WHERE x IS NOT NULL AND y IS NOT NULL),
          m AS (
            SELECT COUNT(*) AS n,
              CAST(SUM(xq) AS DOUBLE) AS sx,
              CAST(SUM(yq) AS DOUBLE) AS sy,
              CAST(SUM(CAST(xq * yq AS DECIMAL(38,8))) AS DOUBLE)
                AS sxy,
              CAST(SUM(CAST(xq * xq AS DECIMAL(38,8))) AS DOUBLE)
                AS sxx
            FROM q),
          t AS (SELECT
              round((sxy - sx * sy / n) / (sxx - sx * sx / n), 9)
                AS theta,
              round(sx / n, 9) AS mx
            FROM m),
          a AS (
            SELECT variant, yq,
              round(CAST(yq AS DOUBLE)
                - theta * (CAST(xq AS DOUBLE) - mx), 9) AS yadj
            FROM q CROSS JOIN t),
          g AS (
            SELECT variant, COUNT(*) AS n,
              CAST(SUM(yq) AS DOUBLE) AS vsy,
              CAST(SUM(CAST(yq * yq AS DECIMAL(38,8))) AS DOUBLE)
                AS vsyy,
              CAST(SUM(CAST(yadj AS DECIMAL(28,9))) AS DOUBLE) AS vsa,
              CAST(SUM(CAST(round(yadj * yadj, 9) AS DECIMAL(38,9)))
                AS DOUBLE) AS vsaa
            FROM a GROUP BY 1)
          SELECT variant, n,
            round(vsy / n, 6) AS mean_y,
            round(vsa / n, 6) AS mean_y_adj,
            round((vsyy - vsy * vsy / n) / (n - 1), 6) AS var_y,
            round((vsaa - vsa * vsa / n) / (n - 1), 6) AS var_y_adj,
            round(1.0 - ((vsaa - vsa * vsa / n) / (n - 1))
              / ((vsyy - vsy * vsy / n) / (n - 1)), 6) AS var_reduction
          FROM g ORDER BY variant"""
    },

    // mirrors the engine: 9dp-pinned per-key rates, exact DECIMAL
    // prior moments, method-of-moments alpha/beta, row-local shrinkage
    "x_eb_shrink" ->
      """WITH pk AS (
            SELECT l_partkey, COUNT(*) AS n,
              CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                AS BIGINT) AS s
            FROM lineitem GROUP BY 1),
          pr AS (SELECT l_partkey, n, s,
              round(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 9) AS p_raw
            FROM pk),
          mo AS (
            SELECT COUNT(*) AS k,
              CAST(SUM(CAST(p_raw AS DECIMAL(28,9))) AS DOUBLE) AS sp,
              CAST(SUM(CAST(round(p_raw * p_raw, 9) AS DECIMAL(38,9)))
                AS DOUBLE) AS spp
            FROM pr),
          pm AS (SELECT sp / k AS m,
              (spp - sp * sp / k) / (k - 1) AS var
            FROM mo),
          ab AS (
            SELECT
              CASE WHEN var > 0 AND m * (1.0 - m) > var
                THEN round(m * (m * (1.0 - m) / var - 1), 9) END
                AS alpha,
              CASE WHEN var > 0 AND m * (1.0 - m) > var
                THEN round((1.0 - m) * (m * (1.0 - m) / var - 1), 9)
                END AS beta
            FROM pm)
          SELECT l_partkey, n, s, p_raw,
            round(alpha, 9) AS alpha, round(beta, 9) AS beta,
            CASE WHEN alpha IS NOT NULL
              THEN round((CAST(s AS DOUBLE) + alpha)
                / (CAST(n AS DOUBLE) + alpha + beta), 9)
              ELSE p_raw END AS p_shrunk
          FROM pr CROSS JOIN ab
          WHERE l_partkey <= 400
          ORDER BY l_partkey""",

    // U from per-distinct-value counts (pairs below + half-ties);
    // tie-corrected normal z, 9dp-pinned; op order mirrors the engine
    "x_mann_whitney" -> {
      val bucket = Sampling.bucketSql("user_id", 7)
      s"""WITH e AS (
            SELECT CASE WHEN $bucket < 500000 THEN 1 ELSE 0 END AS a,
              value AS v
            FROM events WHERE event_type = 'purchase'
              AND value IS NOT NULL),
          c AS (SELECT v, CAST(SUM(a) AS BIGINT) AS pa,
                  CAST(SUM(1 - a) AS BIGINT) AS pb
                FROM e GROUP BY 1),
          r AS (SELECT pa, pb,
                  COALESCE(CAST(SUM(pb) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS BIGINT), 0) AS ltb
                FROM c),
          agg AS (SELECT CAST(SUM(pa) AS BIGINT) AS na,
                    CAST(SUM(pb) AS BIGINT) AS nb,
                    CAST(SUM(pa * (2 * ltb + pb)) AS BIGINT) AS num2,
                    CAST(SUM((pa + pb) * (pa + pb) * (pa + pb)
                      - (pa + pb)) AS BIGINT) AS ties
                  FROM r)
          SELECT na AS n_a, nb AS n_b,
            CAST(num2 AS DOUBLE) / 2.0 AS u,
            CAST(num2 AS DOUBLE) / 2.0
              / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) AS auc,
            CASE WHEN na > 0 AND nb > 0 AND
                CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0 *
                  ((CAST(na + nb AS DOUBLE) + 1.0)
                    - CAST(ties AS DOUBLE) / (CAST(na + nb AS DOUBLE)
                      * (CAST(na + nb AS DOUBLE) - 1.0))) > 0
              THEN round((CAST(num2 AS DOUBLE) / 2.0
                  - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0)
                / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0 *
                  ((CAST(na + nb AS DOUBLE) + 1.0)
                    - CAST(ties AS DOUBLE) / (CAST(na + nb AS DOUBLE)
                      * (CAST(na + nb AS DOUBLE) - 1.0)))), 9)
            END AS z
          FROM agg"""
    },

    // same 9dp-pinned ln literals and op order as the engine; llr
    // pinned at 6dp
    "x_sprt" -> {
      val bucket = Sampling.bucketSql("user_id", 7)
      s"""WITH e AS (
            SELECT CASE WHEN $bucket < 500000 THEN 'A' ELSE 'B' END
                AS variant,
              CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
                AS BIGINT) // 86400 AS day,
              CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                AS conv
            FROM events),
          d AS (SELECT variant, day, COUNT(*) AS n,
                  CAST(SUM(conv) AS BIGINT) AS n_conv
                FROM e GROUP BY 1, 2),
          c AS (SELECT variant, day, n, n_conv,
                  CAST(SUM(n) OVER w AS BIGINT) AS cum_n,
                  CAST(SUM(n_conv) OVER w AS BIGINT) AS cum_conv
                FROM d WINDOW w AS (PARTITION BY variant ORDER BY day
                  ROWS UNBOUNDED PRECEDING)),
          l AS (SELECT *,
                  round(CAST(cum_conv AS DOUBLE)
                      * round(ln(0.20 / 0.15), 9)
                    + CAST(cum_n - cum_conv AS DOUBLE)
                      * round(ln(0.80 / 0.85), 9), 6) AS llr
                FROM c),
          dec AS (SELECT *,
                  CASE WHEN llr >= round(ln(0.90 / 0.05), 9)
                         THEN 'accept_h1'
                       WHEN llr <= round(ln(0.10 / 0.95), 9)
                         THEN 'accept_h0'
                       ELSE 'continue' END AS decision
                FROM l),
          st AS (SELECT *,
                  MIN(CASE WHEN decision <> 'continue' THEN day END)
                    OVER (PARTITION BY variant) AS stop_day
                FROM dec)
          SELECT variant, day, n, n_conv, cum_n, cum_conv, llr,
            decision, stop_day IS NOT NULL AND day >= stop_day
              AS stopped
          FROM st ORDER BY variant, day"""
    },

    "x_attribution" ->
      """WITH e AS (
           SELECT event_id, user_id, event_type,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) AS sec
           FROM events),
         p AS (SELECT event_id, user_id, sec FROM e
               WHERE event_type = 'purchase'),
         c AS (SELECT DISTINCT user_id, sec AS click_sec FROM e
               WHERE event_type = 'click'),
         j AS (
           SELECT p.event_id, p.sec, c.click_sec
           FROM p ASOF LEFT JOIN c
             ON p.user_id = c.user_id AND p.sec >= c.click_sec),
         f AS (
           SELECT sec, click_sec,
             (click_sec IS NOT NULL AND click_sec >= sec - 86400)
               AS attributed
           FROM j),
         g AS (
           SELECT COUNT(*) AS n_purchases,
             CAST(SUM(CASE WHEN attributed THEN 1 ELSE 0 END) AS BIGINT)
               AS n_attributed,
             CAST(SUM(CASE WHEN attributed
               THEN CAST(sec - click_sec AS DECIMAL(18,2)) END) AS DOUBLE)
               AS delay_sum
           FROM f)
         SELECT n_purchases, n_attributed,
           CAST(n_attributed AS DOUBLE) / n_purchases AS attribution_rate,
           delay_sum / n_attributed AS mean_delay_sec
         FROM g""",

    "x_events_sessions" ->
      """WITH t AS (
           SELECT user_id, event_id,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
           FROM events),
         flags AS (
           SELECT user_id,
             CASE WHEN lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
                       IS NULL THEN 1
                  WHEN sec - lag(sec) OVER (PARTITION BY user_id ORDER BY sec, event_id)
                       > 1800 THEN 1
                  ELSE 0 END AS is_new
           FROM t)
         SELECT user_id, CAST(SUM(is_new) AS BIGINT) AS n_sessions,
                COUNT(*) AS n_events
         FROM flags GROUP BY 1 ORDER BY 1""",

    "x_events_sessions_win" ->
      s"""WITH t AS (
           SELECT user_id, value,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) AS sec
           FROM events),
         o AS (
           SELECT user_id, value, sec,
             CASE WHEN lag(sec) OVER w IS NULL
                    OR sec - lag(sec) OVER w > 1800 THEN 1
                  ELSE 0 END AS is_new
           FROM t
           WINDOW w AS (PARTITION BY user_id ORDER BY sec)),
         s AS (
           SELECT user_id, value, sec,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY sec
               ROWS UNBOUNDED PRECEDING) AS sid
           FROM o)
         SELECT user_id, MIN(sec) AS session_start,
           MAX(sec) + 1800 AS session_end, COUNT(*) AS n_events,
           ${dsumSql("value")} AS total_value
         FROM s GROUP BY user_id, sid ORDER BY 1, 2""",

    "x_merge_upsert" ->
      """WITH upd AS (
           SELECT c_custkey, c_name, c_acctbal + 100.0 AS c_acctbal
           FROM customer WHERE c_custkey % 10 = 0
           UNION ALL
           SELECT c_custkey + 1000000, c_name, c_acctbal
           FROM customer WHERE c_custkey % 7 = 3)
         SELECT
           COALESCE(u.c_custkey, b.c_custkey) AS c_custkey,
           CASE WHEN u.c_custkey IS NOT NULL THEN u.c_name
                ELSE b.c_name END AS c_name,
           CASE WHEN u.c_custkey IS NOT NULL THEN u.c_acctbal
                ELSE b.c_acctbal END AS c_acctbal
         FROM customer b FULL OUTER JOIN upd u
           ON b.c_custkey = u.c_custkey
         WHERE NOT (b.c_custkey IS NOT NULL AND u.c_custkey IS NOT NULL
                    AND u.c_custkey % 100 = 0)
         ORDER BY c_custkey""",

    "x_snapshot_diff" ->
      """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
         newsnap AS (
           SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 7 = 1 THEN c_acctbal + 50.0
                  ELSE c_acctbal END AS c_acctbal
           FROM base WHERE c_custkey % 13 <> 0
           UNION ALL
           SELECT c_custkey + 2000000, c_name, c_acctbal FROM base
           WHERE c_custkey % 11 = 5)
         SELECT c_custkey, c_name, c_acctbal, op FROM (
           SELECT
             COALESCE(n.c_custkey, o.c_custkey) AS c_custkey,
             CASE WHEN n.c_custkey IS NOT NULL THEN n.c_name
                  ELSE o.c_name END AS c_name,
             CASE WHEN n.c_custkey IS NOT NULL THEN n.c_acctbal
                  ELSE o.c_acctbal END AS c_acctbal,
             CASE WHEN o.c_custkey IS NULL THEN 'insert'
                  WHEN n.c_custkey IS NULL THEN 'delete'
                  WHEN o.c_acctbal <> n.c_acctbal
                    OR o.c_name <> n.c_name THEN 'update' END AS op
           FROM base o FULL OUTER JOIN newsnap n
             ON o.c_custkey = n.c_custkey)
         WHERE op IS NOT NULL ORDER BY c_custkey""",

    "x_scd2" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
           FROM events),
         marked AS (
           SELECT user_id, event_id, event_type, sec,
             CASE WHEN lag(event_type) OVER
                    (PARTITION BY user_id ORDER BY sec, event_id)
                  IS NOT DISTINCT FROM event_type THEN 0 ELSE 1 END AS chg
           FROM e),
         numbered AS (
           SELECT *, SUM(chg) OVER
             (PARTITION BY user_id ORDER BY sec, event_id
              ROWS UNBOUNDED PRECEDING) AS run
           FROM marked),
         runs AS (
           SELECT user_id, run, MIN(event_type) AS event_type,
                  MIN(sec) AS valid_from
           FROM numbered GROUP BY 1, 2),
         chained AS (
           SELECT user_id, event_type, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY run)
               AS valid_to
           FROM runs)
         SELECT user_id, event_type, valid_from, valid_to,
                valid_to IS NULL AS is_current
         FROM chained ORDER BY user_id, valid_from, event_type""",

    // SCD2 lookup: same interval-derivation CTEs as x_scd2, then the
    // containment join per high-value event.
    "x_scd2_lookup" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type, value,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
           FROM events),
         marked AS (
           SELECT user_id, event_id, event_type, sec,
             CASE WHEN lag(event_type) OVER
                    (PARTITION BY user_id ORDER BY sec, event_id)
                  IS NOT DISTINCT FROM event_type THEN 0 ELSE 1 END AS chg
           FROM e),
         numbered AS (
           SELECT *, SUM(chg) OVER
             (PARTITION BY user_id ORDER BY sec, event_id
              ROWS UNBOUNDED PRECEDING) AS run
           FROM marked),
         runs AS (
           SELECT user_id, run, MIN(event_type) AS event_type,
                  MIN(sec) AS valid_from
           FROM numbered GROUP BY 1, 2),
         chained AS (
           SELECT user_id, event_type, valid_from,
             lead(valid_from) OVER (PARTITION BY user_id ORDER BY run)
               AS valid_to
           FROM runs),
         facts AS (
           SELECT user_id, event_id, sec, value FROM e
           WHERE value > 90.0)
         SELECT f.user_id, f.event_id, f.sec AS ts_sec, f.value,
           c.event_type AS state_at_event
         FROM facts f JOIN chained c ON f.user_id = c.user_id
           AND c.valid_from <= f.sec
           AND (c.valid_to IS NULL OR f.sec < c.valid_to)
         ORDER BY f.user_id, f.event_id""",

    "x_survivorship" ->
      """WITH o AS (
           SELECT o_custkey, o_orderstatus, o_orderpriority, o_totalprice,
             (CAST(epoch(date_trunc('second', CAST(o_orderdate AS TIMESTAMP)))
                AS BIGINT) // 86400) * 10000000 + o_orderkey AS ord
           FROM orders)
         SELECT o_custkey, COUNT(*) AS n_orders,
           arg_max(o_orderstatus, ord) AS latest_status,
           arg_min(o_orderpriority, ord) AS first_priority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_spend
         FROM o GROUP BY 1 ORDER BY 1""",

    "x_twap" ->
      """WITH t AS (
           SELECT user_id, event_id,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS BIGINT) AS ts_sec,
             value
           FROM events),
         d AS (
           SELECT user_id, ts_sec, value,
             lead(ts_sec) OVER (PARTITION BY user_id
               ORDER BY ts_sec, event_id) - ts_sec AS dur
           FROM t)
         SELECT user_id, COUNT(*) AS n_obs,
           CAST(SUM(dur) AS BIGINT) AS span_sec,
           CAST(SUM(CAST(value AS DECIMAL(18,6)) * dur) AS DOUBLE)
             / CAST(SUM(dur) AS DOUBLE) AS twap
         FROM d WHERE dur IS NOT NULL
         GROUP BY 1 ORDER BY 1""",

    "x_zorder" -> {
      val zexpr = (0 until 8).map { j =>
        s"(((x >> $j) & 1) * ${1L << (2 * j)} + " +
          s"((y >> $j) & 1) * ${1L << (2 * j + 1)})"
      }.mkString(" + ")
      s"""WITH t AS (
            SELECT l_partkey % 256 AS x, l_suppkey % 256 AS y FROM lineitem),
          z AS (SELECT x, y, ($zexpr) AS zval FROM t)
          SELECT zval >> 6 AS z_block, COUNT(*) AS n,
                 MIN(x) AS x_min, MAX(x) AS x_max,
                 MIN(y) AS y_min, MAX(y) AS y_max
          FROM z GROUP BY 1 ORDER BY 1"""
    },

    "x_negative_sample" -> {
      val h = Hashing.hash64Sql(
        "CAST(anchor_id AS VARCHAR) || '#' || CAST(j AS VARCHAR)", 11)
      s"""WITH m AS (SELECT MAX(vec_id) + 1 AS mm FROM embeddings),
          a AS (
            SELECT vec_id AS anchor_id, CAST(unnest(range(4)) AS INTEGER) AS j
            FROM embeddings)
          SELECT anchor_id, j, ($h) % mm AS neg_id
          FROM a CROSS JOIN m
          WHERE ($h) % mm <> anchor_id
          ORDER BY anchor_id, j"""
    },

    "x_sample_per_group" -> {
      val h = Hashing.hash64Sql("CAST(doc_id AS VARCHAR)", 9)
      s"""SELECT doc_id, source, lang FROM (
            SELECT doc_id, source, lang,
              row_number() OVER (PARTITION BY source
                ORDER BY $h, doc_id) AS rn
            FROM documents) WHERE rn <= 5
          ORDER BY source, doc_id"""
    },

    "x_domain_mix" -> {
      val bucket = Sampling.bucketSql("doc_id", 5)
      s"""WITH w AS (
            SELECT * FROM (VALUES ('src0', 0.4), ('src1', 0.3),
              ('src2', 0.2), ('src3', 0.1)) AS t(source, w)),
          counts AS (
            SELECT d.source, CAST(COUNT(*) AS DOUBLE) AS n, w.w
            FROM documents d JOIN w USING (source)
            GROUP BY d.source, w.w),
          s AS (SELECT MIN(n / w) AS scale FROM counts),
          fracs AS (
            SELECT source, LEAST(1.0, w * scale / n) AS frac
            FROM counts CROSS JOIN s)
          SELECT doc_id, source, lang, n_chars
          FROM documents JOIN fracs USING (source)
          WHERE CAST($bucket AS DOUBLE) < frac * 1000000
          ORDER BY doc_id"""
    },

    "x_bootstrap" -> {
      val h = Hashing.hash64Sql(
        "CAST(o_orderkey AS VARCHAR) || '#' || CAST(j AS VARCHAR)", 13)
      s"""WITH r AS (
            SELECT o_orderkey, o_totalprice,
                   CAST(unnest(range(16)) AS INTEGER) AS j
            FROM orders),
          w AS (
            SELECT j AS replicate, o_totalprice,
              CASE WHEN ($h) % 1000000 < 367879 THEN 0
                   WHEN ($h) % 1000000 < 735758 THEN 1
                   WHEN ($h) % 1000000 < 919698 THEN 2
                   WHEN ($h) % 1000000 < 981011 THEN 3
                   WHEN ($h) % 1000000 < 996340 THEN 4
                   WHEN ($h) % 1000000 < 999405 THEN 5
                   WHEN ($h) % 1000000 < 999850 THEN 6
                   WHEN ($h) % 1000000 < 999956 THEN 7
                   ELSE 8 END AS w
            FROM r)
          SELECT replicate, CAST(SUM(w) AS BIGINT) AS n_eff,
                 ROUND(CAST(SUM(CAST(w * o_totalprice AS DECIMAL(28,6)))
                   AS DOUBLE) / CAST(SUM(w) AS DOUBLE), 6) AS boot_mean
          FROM w GROUP BY 1 ORDER BY 1"""
    },

    "x_temperature_mix" -> {
      val bucket = Sampling.bucketSql("doc_id", 7)
      s"""WITH counts AS (
            SELECT source, CAST(COUNT(*) AS DOUBLE) AS n
            FROM documents GROUP BY source),
          m AS (SELECT MIN(n) AS nmin FROM counts),
          fracs AS (
            SELECT source, sqrt(nmin / n) AS frac
            FROM counts CROSS JOIN m)
          SELECT doc_id, source, lang, n_chars
          FROM documents JOIN fracs USING (source)
          WHERE CAST($bucket AS DOUBLE) < frac * 1000000
          ORDER BY doc_id"""
    },

    "x_zonemap" -> {
      val zexpr = (0 until 8).map { j =>
        s"(((x >> $j) & 1) * ${1L << (2 * j)} + " +
          s"((y >> $j) & 1) * ${1L << (2 * j + 1)})"
      }.mkString(" + ")
      s"""WITH t AS (
            SELECT CAST(l_partkey % 256 AS INTEGER) AS x,
                   CAST(l_suppkey % 256 AS INTEGER) AS y,
                   l_orderkey * 10 + l_linenumber AS tie
            FROM lineitem),
          z AS (SELECT x, y, tie, ($zexpr) AS zval FROM t),
          r AS (
            SELECT x, y,
              CAST(((row_number() OVER (ORDER BY zval, tie) - 1) * 16)
                // (COUNT(*) OVER ()) AS INTEGER) AS zone
            FROM z)
          SELECT zone, COUNT(*) AS n_rows,
                 MIN(x) AS x_min, MAX(x) AS x_max,
                 MIN(y) AS y_min, MAX(y) AS y_max
          FROM r GROUP BY 1 ORDER BY 1"""
    },

    "x_shard_audit" -> {
      val shard = Sampling.shardSql("doc_id", 8, 11)
      s"""SELECT $shard AS shard, COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS total_chars
          FROM documents GROUP BY 1 ORDER BY 1"""
    },

    "x_curriculum" ->
      """WITH q AS (
           SELECT source, CAST(ntile(4) OVER (PARTITION BY source
             ORDER BY n_chars, doc_id) AS INTEGER) AS quartile, n_chars
           FROM documents)
         SELECT source, quartile, COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
         FROM q GROUP BY 1, 2 ORDER BY 1, 2""",

    "x_sample_stratified" -> {
      val bucket = Sampling.bucketSql("doc_id", 3)
      s"""SELECT lang, COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS total_chars
          FROM documents
          WHERE $bucket < CASE lang WHEN 'en' THEN 500000
                                    WHEN 'de' THEN 250000
                                    WHEN 'fr' THEN 100000
                                    ELSE 1000000 END
          GROUP BY 1 ORDER BY 1"""
    },

    // mirrors the engine's chain: DECIMAL(18,4) moments (operands
    // up-cast to (19,4) — the DuckDB int64 decimal-multiply overflow),
    // 9dp sigma, 6dp-pinned weights totalled in DECIMAL, 9dp
    // shares/rates, hash-twin sample counts
    "x_sample_neyman" -> {
      val k = "CAST(l_orderkey AS VARCHAR) || '_' || " +
        "CAST(l_linenumber AS VARCHAR)"
      val bucket = Sampling.bucketSql(k, 11)
      s"""WITH v AS (
            SELECT l_returnflag AS g,
              CAST(l_extendedprice AS DECIMAL(18,4)) AS vq
            FROM lineitem WHERE l_extendedprice IS NOT NULL),
          ps AS (
            SELECT g, COUNT(*) AS n_rows,
              CAST(SUM(vq) AS DOUBLE) AS s,
              CAST(SUM(CAST(CAST(vq AS DECIMAL(19,4))
                * CAST(vq AS DECIMAL(19,4)) AS DECIMAL(38,8)))
                AS DOUBLE) AS ss
            FROM v GROUP BY 1),
          sg AS (
            SELECT g, n_rows,
              CASE WHEN n_rows > 1 THEN
                round(sqrt(greatest((ss - s * s / n_rows)
                  / (n_rows - 1), 0.0)), 9)
              ELSE 0.0 END AS sigma
            FROM ps),
          w AS (SELECT g, n_rows, sigma,
              round(CAST(n_rows AS DOUBLE) * sigma, 6) AS wp
            FROM sg),
          tw AS (SELECT CAST(SUM(CAST(wp AS DECIMAL(28,6))) AS DOUBLE)
              AS tw FROM w),
          al AS (
            SELECT g, n_rows, sigma,
              round(wp / tw, 9) AS share,
              least(n_rows, CAST(round(3000.0 * round(wp / tw, 9), 0)
                AS BIGINT)) AS n_target,
              round(least(1.0, 3000.0 * round(wp / tw, 9)
                / CAST(n_rows AS DOUBLE)), 9) AS rate
            FROM w CROSS JOIN tw),
          smp AS (
            SELECT l_returnflag AS g, COUNT(*) AS n_sampled
            FROM lineitem JOIN al ON lineitem.l_returnflag = al.g
            WHERE $bucket < CAST(floor(rate * 1000000) AS BIGINT)
            GROUP BY 1)
          SELECT al.g AS l_returnflag, n_rows,
            round(sigma, 6) AS sigma, share, n_target, rate,
            COALESCE(n_sampled, 0) AS n_sampled
          FROM al LEFT JOIN smp USING (g) ORDER BY 1"""
    },

    "x_sample_reservoir" -> {
      val h = Hashing.hash64Sql("CAST(doc_id AS VARCHAR)", 2)
      s"""SELECT doc_id, lang, n_chars FROM (
            SELECT doc_id, lang, n_chars FROM documents
            ORDER BY $h, doc_id LIMIT 100)
          ORDER BY doc_id"""
    },

    "x_text_unigram_lm" ->
      """WITH tf AS (
           SELECT doc_id, t AS token, COUNT(*) AS tf FROM (
             SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
             FROM documents)
           GROUP BY 1, 2),
         counts AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS c
                    FROM tf GROUP BY 1),
         total AS (SELECT CAST(SUM(c) AS DOUBLE) AS total FROM counts),
         terms AS (
           SELECT tf.doc_id, tf.tf,
                  CAST(tf.tf * -ln(counts.c / total.total)
                    AS DECIMAL(28,9)) AS term
           FROM tf JOIN counts ON tf.token = counts.token CROSS JOIN total)
         SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                CAST(SUM(term) AS DOUBLE) AS neg_logprob_sum,
                CAST(SUM(term) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE)
                  AS avg_neg_logprob
         FROM terms GROUP BY 1 ORDER BY 1""",

    "x_bigram_lm" ->
      """WITH t AS (
           SELECT doc_id, string_split(lower(text), ' ') AS l
           FROM documents),
         tok AS (
           SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS pos
           FROM t),
         bg AS (
           SELECT a.doc_id, a.w AS w1, b.w AS w2
           FROM tok a JOIN tok b
             ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         tf AS (SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bg
                GROUP BY 1, 2, 3),
         cb AS (SELECT w1, w2, CAST(SUM(tf) AS BIGINT) AS cb FROM tf
                GROUP BY 1, 2),
         ctx AS (SELECT w1, CAST(SUM(cb) AS BIGINT) AS ctx FROM cb
                 GROUP BY 1),
         v AS (SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS v FROM tok),
         terms AS (
           SELECT tf.doc_id, tf.tf,
             CAST(tf.tf * -ln((cb.cb + 0.5) / (ctx.ctx + 0.5 * v.v))
               AS DECIMAL(28,9)) AS term
           FROM tf JOIN cb USING (w1, w2) JOIN ctx USING (w1)
           CROSS JOIN v)
         SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
           CAST(SUM(term) AS DOUBLE) AS neg_logprob_sum,
           CAST(SUM(term) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE)
             AS avg_neg_logprob
         FROM terms GROUP BY 1 ORDER BY 1""",

    "x_bpe_pairs" ->
      """WITH words AS (
           SELECT w AS word, COUNT(*) AS n FROM (
             SELECT unnest(string_split(lower(text), ' ')) AS w
             FROM documents)
           WHERE w <> '' GROUP BY 1),
         chars AS (SELECT string_split(word, '') AS cs, n FROM words),
         pairs AS (
           SELECT cs[i] AS x, cs[i + 1] AS y, n
           FROM chars, LATERAL (
             SELECT unnest(generate_series(1, len(cs) - 1)) AS i) g)
         SELECT x, y, CAST(SUM(n) AS BIGINT) AS total
         FROM pairs GROUP BY 1, 2
         ORDER BY total DESC, x, y LIMIT 30""",

    "x_corpus_card" ->
      """WITH base AS (
           SELECT COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
             CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
           FROM documents),
         dups AS (
           SELECT CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_unique
           FROM documents),
         vocab AS (
           SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS vocab_size FROM (
             SELECT unnest(string_split(lower(text), ' ')) AS t
             FROM documents) WHERE t <> '')
         SELECT n_docs, n_chars, n_tokens, n_langs, n_sources, vocab_size,
           round(1.0 - CAST(n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE), 9)
             AS exact_dup_rate
         FROM base CROSS JOIN dups CROSS JOIN vocab""",

    "x_top_tokens_per_source" ->
      """SELECT source, t, n FROM (
           SELECT source, t, n,
             row_number() OVER (PARTITION BY source
               ORDER BY n DESC, t) AS rn
           FROM (
             SELECT source, t, COUNT(*) AS n FROM (
               SELECT source, unnest(string_split(lower(text), ' ')) AS t
               FROM documents)
             WHERE t <> '' GROUP BY 1, 2))
         WHERE rn <= 5
         ORDER BY source, n DESC, t""",

    "x_token_scrub" ->
      """WITH toks AS (
           SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, l[i] AS t
           FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
                 FROM documents) d,
             LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) g
           WHERE l[i] <> ''),
         keep AS (
           SELECT t FROM toks GROUP BY t HAVING COUNT(*) >= 3),
         marked AS (SELECT doc_id, pos, t FROM toks JOIN keep USING (t)),
         kept AS (
           SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_kept,
             string_agg(t, ' ' ORDER BY pos) AS clean_text
           FROM marked GROUP BY 1),
         totals AS (
           SELECT doc_id, CAST(COUNT(*) AS INTEGER) AS n_total
           FROM toks GROUP BY 1)
         SELECT d.doc_id,
           COALESCE(kept.clean_text, '') AS clean_text,
           COALESCE(kept.n_kept, 0) AS n_kept,
           COALESCE(totals.n_total, 0) - COALESCE(kept.n_kept, 0)
             AS n_removed
         FROM documents d
         LEFT JOIN kept ON d.doc_id = kept.doc_id
         LEFT JOIN totals ON d.doc_id = totals.doc_id
         ORDER BY d.doc_id""",

    "x_text_entropy" ->
      """WITH ch AS (
           SELECT doc_id, g, COUNT(*) AS c FROM (
             SELECT doc_id, unnest(string_split(text, '')) AS g
             FROM documents WHERE doc_id < 300)
           GROUP BY 1, 2),
         agg AS (
           SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CAST(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
               AS DECIMAL(28,9))) AS DOUBLE) AS s
           FROM ch GROUP BY 1)
         SELECT doc_id, n,
           round(ln(CAST(n AS DOUBLE)) - s / CAST(n AS DOUBLE), 9)
             AS char_entropy
         FROM agg ORDER BY doc_id""",

    "x_phrase_pmi" ->
      """WITH toks AS (
           SELECT string_split(lower(text), ' ') AS l FROM documents),
         bi AS (
           SELECT l[i] AS x, l[i + 1] AS y, COUNT(*) AS c_xy
           FROM toks, LATERAL (
             SELECT unnest(generate_series(1, len(l) - 1)) AS i) g
           GROUP BY 1, 2 HAVING COUNT(*) >= 5),
         uni AS (
           SELECT t, COUNT(*) AS c FROM (
             SELECT unnest(string_split(lower(text), ' ')) AS t
             FROM documents)
           WHERE t <> '' GROUP BY 1),
         tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni)
         SELECT x, y, c_xy,
           round(ln(CAST(c_xy * n AS DOUBLE) / CAST(ux.c * uy.c AS DOUBLE)),
             9) AS pmi
         FROM bi JOIN uni ux ON bi.x = ux.t
           JOIN uni uy ON bi.y = uy.t CROSS JOIN tot
         ORDER BY c_xy DESC, x, y LIMIT 50""",

    "x_quality_gate" ->
      """WITH tf AS (
           SELECT doc_id, t AS token, COUNT(*) AS tf FROM (
             SELECT doc_id, unnest(string_split(lower(text), ' ')) AS t
             FROM documents)
           GROUP BY 1, 2),
         counts AS (SELECT token, CAST(SUM(tf) AS BIGINT) AS c
                    FROM tf GROUP BY 1),
         total AS (SELECT CAST(SUM(c) AS DOUBLE) AS total FROM counts),
         terms AS (
           SELECT tf.doc_id, tf.tf,
                  CAST(tf.tf * -ln(counts.c / total.total)
                    AS DECIMAL(28,9)) AS term
           FROM tf JOIN counts ON tf.token = counts.token CROSS JOIN total),
         lm AS (
           SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
                  CAST(SUM(term) AS DOUBLE) AS neg_logprob_sum,
                  CAST(SUM(term) AS DOUBLE) / CAST(SUM(tf) AS DOUBLE)
                    AS avg_neg_logprob
           FROM terms GROUP BY 1),
         thr AS (SELECT quantile_cont(avg_neg_logprob, 0.8) AS t FROM lm)
         SELECT doc_id, n_tokens, neg_logprob_sum, avg_neg_logprob
         FROM lm CROSS JOIN thr
         WHERE avg_neg_logprob <= t
         ORDER BY doc_id""",

    "x_text_repetition" ->
      """WITH toks AS (
           SELECT doc_id, length(text) AS n_chars_obs,
                  string_split(lower(text), ' ') AS l FROM documents),
         uni AS (
           SELECT doc_id, t, COUNT(*) AS c FROM (
             SELECT doc_id, unnest(l) AS t FROM toks) GROUP BY 1, 2),
         base AS (
           SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                  COUNT(*) AS n_distinct,
                  CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                    AS top_unigram_frac
           FROM uni GROUP BY 1),
         big AS (
           SELECT doc_id, g, COUNT(*) AS c FROM (
             SELECT doc_id, array_to_string(l[i:i+1], ' ') AS g
             FROM toks, LATERAL (
               SELECT unnest(generate_series(1, len(l) - 1)) AS i) s)
           GROUP BY 1, 2),
         topbig AS (
           SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                    AS top_bigram_frac
           FROM big GROUP BY 1),
         merged AS (
           SELECT b.doc_id, b.n_tokens, b.n_distinct,
             CAST(b.n_distinct AS DOUBLE) / CAST(b.n_tokens AS DOUBLE)
               AS distinct_ratio,
             b.top_unigram_frac, t2.top_bigram_frac,
             CAST(c.n_chars_obs - (b.n_tokens - 1) AS DOUBLE)
               / CAST(b.n_tokens AS DOUBLE) AS mean_word_len
           FROM base b
           JOIN topbig t2 ON b.doc_id = t2.doc_id
           JOIN (SELECT doc_id, n_chars_obs FROM toks) c
             ON b.doc_id = c.doc_id)
         SELECT *, (n_tokens >= 50 AND mean_word_len BETWEEN 3.0 AND 10.0
                    AND distinct_ratio > 0.2 AND top_unigram_frac < 0.3
                    AND top_bigram_frac < 0.18) AS gopher_keep
         FROM merged ORDER BY doc_id""",

    "x_text_pii" -> {
      val augSql = "text || ' contact u' || CAST(doc_id AS VARCHAR) || " +
        "'@example.com see https://ex.com/d' || CAST(doc_id AS VARCHAR) " +
        "|| ' call +61 2 5550 ' || CAST(1000 + doc_id % 9000 AS VARCHAR)"
      val countCols = TextAnalysis.PiiPatterns.map { case (name, rx, _) =>
        s"CAST(len(regexp_extract_all(t, '$rx')) AS INTEGER) AS n_$name"
      }.mkString(",\n           ")
      val redacted = TextAnalysis.PiiPatterns.foldLeft("t") {
        case (acc, (_, rx, tok)) => s"regexp_replace($acc, '$rx', '$tok', 'g')"
      }
      s"""WITH aug AS (
            SELECT doc_id, $augSql AS t FROM documents WHERE doc_id < 300)
          SELECT doc_id,
           $countCols,
           $redacted AS redacted
          FROM aug ORDER BY doc_id"""
    },

    "x_text_normalize" ->
      """WITH aug AS (
           SELECT doc_id,
             text || ' Cafe' || chr(769) || ' u' || chr(776) || 'ber n'
               || chr(771) || 'o ' || chr(197) || ' A' || chr(778) AS t
           FROM documents WHERE doc_id < 200)
         SELECT doc_id,
           nfc_normalize(t) AS nfc_text,
           strip_accents(nfc_normalize(t)) AS ascii_text
         FROM aug ORDER BY doc_id""",

    "x_url_dedup" ->
      """WITH u AS (
           SELECT doc_id,
             concat(
               CASE WHEN doc_id % 4 = 0 THEN 'HTTPS://' ELSE 'https://' END,
               CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,
               'host', CAST(doc_id % 7 AS VARCHAR), '.Example.org',
               CASE WHEN doc_id % 5 = 0 THEN ':443' ELSE '' END,
               '/p/', CAST(doc_id % 40 AS VARCHAR),
               CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
               '?id=', CAST(doc_id % 40 AS VARCHAR),
               CASE WHEN doc_id % 6 = 0 THEN '&utm_source=feed' ELSE '' END,
               CASE WHEN doc_id % 9 = 0 THEN '#frag' ELSE '' END) AS url
           FROM documents),
         st1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS s FROM u),
         st2 AS (SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(s,
                   '&(?:utm_[a-z]+|fbclid|gclid)=[^&]*', '', 'g'),
                 '\?(?:utm_[a-z]+|fbclid|gclid)=[^&]*&', '?'),
               '\?(?:utm_[a-z]+|fbclid|gclid)=[^&]*$', '') AS s
           FROM st1),
         st3 AS (SELECT doc_id,
             regexp_replace(s, '/+(\?|$)', '\1') AS s FROM st2),
         norm AS (
           SELECT doc_id,
             concat(
               lower(regexp_extract(s,
                 '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)), '://',
               regexp_replace(
                 regexp_replace(
                   lower(regexp_extract(s,
                     '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)),
                   '^www\.', ''),
                 ':(80|443)$', ''),
               regexp_extract(s,
                 '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+(.*)$', 1)) AS url_norm
           FROM st3)
         SELECT url_norm, MIN(doc_id) AS survivor_id, COUNT(*) AS n_dups
         FROM norm GROUP BY 1 ORDER BY 1""",

    "x_group_topk" ->
      """SELECT s_nationkey, s_suppkey, s_name, s_acctbal, rank FROM (
           SELECT s_nationkey, s_suppkey, s_name, s_acctbal,
             CAST(row_number() OVER (PARTITION BY s_nationkey
               ORDER BY s_acctbal DESC, s_suppkey) AS INTEGER) AS rank
           FROM supplier)
         WHERE rank <= 3 ORDER BY s_nationkey, rank""",

    "x_heap_topk" ->
      """SELECT s_nationkey, s_suppkey, s_name, s_acctbal FROM (
           SELECT *, row_number() OVER (PARTITION BY s_nationkey
             ORDER BY s_acctbal DESC, s_suppkey) AS rn
           FROM supplier) WHERE rn <= 3
         ORDER BY s_nationkey, s_acctbal DESC, s_suppkey""",

    "x_rule_topk" ->
      """SELECT c_nationkey, c_custkey, c_acctbal FROM (
           SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
               ORDER BY c_acctbal DESC, c_custkey) AS rn
           FROM customer) WHERE rn <= 2
         ORDER BY c_nationkey, c_acctbal DESC, c_custkey""",

    "x_incr_agg" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS year, o_orderstatus,
            ${dsumSql("o_totalprice")} AS total,
            COUNT(o_totalprice) AS n,
            ${dsumSql("o_totalprice")} / COUNT(o_totalprice) AS mean,
            MIN(o_totalprice) AS vmin, MAX(o_totalprice) AS vmax
          FROM orders GROUP BY 1, 2 ORDER BY 1, 2""",

    "x_skew_salted" ->
      s"""SELECT o_orderstatus, ${dsumSql("o_totalprice")} AS revenue,
            COUNT(*) AS n_orders
          FROM orders GROUP BY 1 ORDER BY 1""",

    "x_dup_spans" ->
      """WITH toks AS (
           SELECT doc_id, string_split(lower(text), ' ') AS l
           FROM documents WHERE doc_id < 200),
         spans AS (
           SELECT doc_id, array_to_string(l[i:i+7], ' ') AS span
           FROM toks, LATERAL (
             SELECT unnest(generate_series(1, len(l) - 7)) AS i) g),
         per_doc AS (
           SELECT span, doc_id, COUNT(*) AS occ FROM spans GROUP BY 1, 2)
         SELECT span, COUNT(*) AS n_docs, CAST(SUM(occ) AS BIGINT) AS n_occ
         FROM per_doc GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY 1""",

    // Space-joined string order == token-sequence order here: the
    // separator 0x20 sorts below every corpus character (single-spaced
    // lowercase alnum text), so the naive ORDER BY suffix string is the
    // same total order the engine's per-token prefix doubling produces.
    "x_suffix_array" ->
      """WITH toks AS (
           SELECT doc_id, string_split(lower(text), ' ') AS l
           FROM documents WHERE doc_id < 1000),
         sfx AS (
           SELECT doc_id, i - 1 AS pos, l[i:] AS s
           FROM toks, LATERAL (
             SELECT unnest(generate_series(1, len(l))) AS i) g)
         SELECT row_number() OVER (
                  ORDER BY array_to_string(s, ' '), doc_id, pos) - 1
                  AS sa_rank,
                doc_id, CAST(pos AS BIGINT) AS pos
         FROM sfx ORDER BY sa_rank""",

    "x_sa_repeats" ->
      """WITH toks AS (
           SELECT doc_id, string_split(lower(text), ' ') AS l
           FROM documents WHERE doc_id < 400),
         sfx AS (
           SELECT doc_id, i - 1 AS pos, l[i:] AS s
           FROM toks, LATERAL (
             SELECT unnest(generate_series(1, len(l))) AS i) g),
         ord AS (
           SELECT doc_id, pos, s,
             row_number() OVER (
               ORDER BY array_to_string(s, ' '), doc_id, pos) - 1 AS sa_rank
           FROM sfx),
         adj AS (
           SELECT a.sa_rank, a.doc_id, a.pos, a.s AS sa,
             coalesce(nullif(list_position(
               list_transform(
                 generate_series(1, least(len(a.s), len(b.s))),
                 k -> a.s[k] = b.s[k]), false), 0) - 1,
               least(len(a.s), len(b.s))) AS lcp
           FROM ord a JOIN ord b ON b.sa_rank = a.sa_rank + 1)
         SELECT sa_rank, doc_id, CAST(pos AS BIGINT) AS pos,
                CAST(lcp AS BIGINT) AS lcp,
                array_to_string(sa[1:lcp], ' ') AS span
         FROM adj WHERE lcp >= 5 ORDER BY sa_rank""",

    "x_sa_longest" ->
      """WITH toks AS (
           SELECT doc_id, string_split(lower(text), ' ') AS l
           FROM documents WHERE doc_id < 150),
         sfx AS (
           SELECT doc_id, i - 1 AS pos, l[i:] AS s
           FROM toks, LATERAL (
             SELECT unnest(generate_series(1, len(l))) AS i) g),
         ord AS (
           SELECT doc_id, pos, s,
             row_number() OVER (
               ORDER BY array_to_string(s, ' '), doc_id, pos) - 1 AS sa_rank
           FROM sfx),
         adj AS (
           SELECT a.sa_rank, a.doc_id, a.pos, a.s AS sa,
             coalesce(nullif(list_position(
               list_transform(
                 generate_series(1, least(len(a.s), len(b.s))),
                 k -> a.s[k] = b.s[k]), false), 0) - 1,
               least(len(a.s), len(b.s))) AS lcp
           FROM ord a JOIN ord b ON b.sa_rank = a.sa_rank + 1)
         SELECT sa_rank, doc_id, CAST(pos AS BIGINT) AS pos,
                CAST(lcp AS BIGINT) AS lcp,
                array_to_string(sa[1:lcp], ' ') AS span
         FROM adj WHERE lcp >= 1 ORDER BY lcp DESC, sa_rank LIMIT 1""",

    "x_sa_dupfrac" ->
      """WITH toks AS MATERIALIZED (
           SELECT doc_id, string_split(lower(text), ' ') AS l
           FROM documents WHERE doc_id < 400),
         sfx AS (
           SELECT doc_id, i - 1 AS pos, l[i:] AS s
           FROM toks, LATERAL (
             SELECT unnest(generate_series(1, len(l))) AS i) g),
         ord AS MATERIALIZED (
           SELECT doc_id, pos, s,
             row_number() OVER (
               ORDER BY array_to_string(s, ' '), doc_id, pos) - 1 AS sa_rank
           FROM sfx),
         lcp AS MATERIALIZED (
           SELECT a.sa_rank,
             coalesce(nullif(list_position(
               list_transform(
                 generate_series(1, least(len(a.s), len(b.s))),
                 k -> a.s[k] = b.s[k]), false), 0) - 1,
               least(len(a.s), len(b.s))) AS lcp
           FROM ord a JOIN ord b ON b.sa_rank = a.sa_rank + 1),
         rep AS (
           SELECT o.doc_id, o.pos,
             greatest(coalesce(ln.lcp, 0), coalesce(lp.lcp, 0)) AS rep
           FROM ord o
           LEFT JOIN lcp ln ON ln.sa_rank = o.sa_rank
           LEFT JOIN lcp lp ON lp.sa_rank = o.sa_rank - 1),
         ints AS (
           SELECT doc_id, pos, pos + rep AS e FROM rep WHERE rep >= 5),
         cov AS (
           SELECT doc_id, pos, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
           FROM ints),
         agg AS (
           SELECT doc_id,
             CAST(SUM(greatest(0, e - greatest(pos, coalesce(pe, pos))))
               AS BIGINT) AS dup
           FROM cov GROUP BY 1)
         SELECT t.doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
           coalesce(dup, 0) AS dup_tokens,
           round(CAST(coalesce(dup, 0) AS DOUBLE) / len(l), 6) AS dup_frac
         FROM toks t LEFT JOIN agg USING (doc_id) ORDER BY t.doc_id""",

    "x_sa_dupfrac_full" ->
      """WITH toks AS MATERIALIZED (
           SELECT doc_id, string_split(lower(text), ' ') AS l
           FROM documents),
         sfx AS (
           SELECT doc_id, i - 1 AS pos, l[i:] AS s
           FROM toks, LATERAL (
             SELECT unnest(generate_series(1, len(l))) AS i) g),
         ord AS MATERIALIZED (
           SELECT doc_id, pos, s,
             row_number() OVER (
               ORDER BY array_to_string(s, ' '), doc_id, pos) - 1 AS sa_rank
           FROM sfx),
         lcp AS MATERIALIZED (
           SELECT a.sa_rank,
             coalesce(nullif(list_position(
               list_transform(
                 generate_series(1, least(len(a.s), len(b.s))),
                 k -> a.s[k] = b.s[k]), false), 0) - 1,
               least(len(a.s), len(b.s))) AS lcp
           FROM ord a JOIN ord b ON b.sa_rank = a.sa_rank + 1),
         rep AS (
           SELECT o.doc_id, o.pos,
             greatest(coalesce(ln.lcp, 0), coalesce(lp.lcp, 0)) AS rep
           FROM ord o
           LEFT JOIN lcp ln ON ln.sa_rank = o.sa_rank
           LEFT JOIN lcp lp ON lp.sa_rank = o.sa_rank - 1),
         ints AS (
           SELECT doc_id, pos, pos + rep AS e FROM rep WHERE rep >= 5),
         cov AS (
           SELECT doc_id, pos, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
           FROM ints),
         agg AS (
           SELECT doc_id,
             CAST(SUM(greatest(0, e - greatest(pos, coalesce(pe, pos))))
               AS BIGINT) AS dup
           FROM cov GROUP BY 1)
         SELECT t.doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
           coalesce(dup, 0) AS dup_tokens,
           round(CAST(coalesce(dup, 0) AS DOUBLE) / len(l), 6) AS dup_frac
         FROM toks t LEFT JOIN agg USING (doc_id) ORDER BY t.doc_id""",

    // The oracle derives coverage from UNCAPPED repeat intervals
    // (pos + true rep) while the engine runs the horizon-bounded
    // O(n·minLcp) scan (intervals capped at minLcp) — an exact match
    // here is the strongest cross-check of the horizon-invariance
    // argument in SuffixArray.repeatCoverIntervals.
    "x_sa_dedup" ->
      """WITH toks AS MATERIALIZED (
           SELECT doc_id, string_split(lower(text), ' ') AS l
           FROM documents WHERE doc_id < 400),
         sfx AS (
           SELECT doc_id, i - 1 AS pos, l[i:] AS s
           FROM toks, LATERAL (
             SELECT unnest(generate_series(1, len(l))) AS i) g),
         ord AS MATERIALIZED (
           SELECT doc_id, pos, s,
             row_number() OVER (
               ORDER BY array_to_string(s, ' '), doc_id, pos) - 1 AS sa_rank
           FROM sfx),
         lcp AS MATERIALIZED (
           SELECT a.sa_rank,
             coalesce(nullif(list_position(
               list_transform(
                 generate_series(1, least(len(a.s), len(b.s))),
                 k -> a.s[k] = b.s[k]), false), 0) - 1,
               least(len(a.s), len(b.s))) AS lcp
           FROM ord a JOIN ord b ON b.sa_rank = a.sa_rank + 1),
         rep AS (
           SELECT o.doc_id, o.pos,
             greatest(coalesce(ln.lcp, 0), coalesce(lp.lcp, 0)) AS rep
           FROM ord o
           LEFT JOIN lcp ln ON ln.sa_rank = o.sa_rank
           LEFT JOIN lcp lp ON lp.sa_rank = o.sa_rank - 1),
         ints AS MATERIALIZED (
           SELECT doc_id, pos, pos + rep AS e FROM rep WHERE rep >= 5),
         cov AS (
           SELECT doc_id, pos, e,
             max(e) OVER (PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
           FROM ints),
         agg AS (
           SELECT doc_id,
             CAST(SUM(greatest(0, e - greatest(pos, coalesce(pe, pos))))
               AS BIGINT) AS dup
           FROM cov GROUP BY 1),
         tok2 AS (
           SELECT doc_id, i - 1 AS tpos, l[i] AS tok
           FROM toks, LATERAL (
             SELECT unnest(generate_series(1, len(l))) AS i) g),
         kept AS (
           SELECT t.doc_id,
             CAST(COUNT(*) AS BIGINT) AS kept_tokens,
             string_agg(t.tok, ' ' ORDER BY t.tpos) AS text_kept
           FROM tok2 t
           WHERE NOT EXISTS (
             SELECT 1 FROM ints v
             WHERE v.doc_id = t.doc_id
               AND v.pos <= t.tpos AND t.tpos < v.e)
           GROUP BY 1),
         base AS (
           SELECT t.doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
             coalesce(dup, 0) AS dup_tokens,
             round(CAST(coalesce(dup, 0) AS DOUBLE) / len(l), 6) AS dup_frac
           FROM toks t LEFT JOIN agg USING (doc_id))
         SELECT b.doc_id, b.n_tokens, b.dup_tokens, b.dup_frac,
           CASE WHEN b.dup_tokens * 100 >= 50 * b.n_tokens THEN 'drop'
                WHEN b.dup_tokens > 0 THEN 'trim'
                ELSE 'keep' END AS action,
           CASE WHEN b.dup_tokens * 100 >= 50 * b.n_tokens
                THEN CAST(0 AS BIGINT)
                ELSE coalesce(k.kept_tokens, 0) END AS kept_tokens,
           CASE WHEN b.dup_tokens * 100 >= 50 * b.n_tokens THEN NULL
                ELSE k.text_kept END AS text_deduped
         FROM base b LEFT JOIN kept k USING (doc_id)
         ORDER BY b.doc_id""",

    "x_decontaminate" ->
      """WITH corpus AS (
           SELECT doc_id, string_split(lower(text), ' ') AS l
           FROM documents WHERE doc_id % 97 <> 0),
         bench AS (
           SELECT string_split(lower(text), ' ') AS l
           FROM documents WHERE doc_id % 97 = 0),
         cg AS (
           SELECT doc_id, array_to_string(l[i:i+3], ' ') AS gram
           FROM corpus, LATERAL (
             SELECT unnest(generate_series(1, len(l) - 3)) AS i) g),
         bg AS (
           SELECT DISTINCT array_to_string(l[i:i+3], ' ') AS gram
           FROM bench, LATERAL (
             SELECT unnest(generate_series(1, len(l) - 3)) AS i) g)
         SELECT doc_id,
           COUNT(DISTINCT cg.gram) AS n_hit_grams,
           COUNT(*) AS n_hits
         FROM cg JOIN bg ON cg.gram = bg.gram
         GROUP BY doc_id ORDER BY doc_id""",

    "x_chunk_docs" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS toks
           FROM documents WHERE doc_id < 100),
         s AS (
           SELECT doc_id, toks, CAST(i AS INTEGER) AS start
           FROM d, LATERAL (
             SELECT unnest(generate_series(0, len(toks) - 1, 24)) AS i) g)
         SELECT doc_id,
           CAST(start // 24 AS INTEGER) AS chunk_id,
           array_to_string(toks[start + 1 : start + 32], ' ') AS chunk,
           CAST(LEAST(len(toks) - start, 32) AS INTEGER) AS n_toks
         FROM s ORDER BY doc_id, chunk_id""",

    "x_funnel" ->
      """WITH e AS (
           SELECT user_id, event_type,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) AS sec
           FROM events),
         s1 AS (SELECT user_id, MIN(sec) AS t1 FROM e
                WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, MIN(sec) AS t2 FROM e
                JOIN s1 USING (user_id)
                WHERE event_type = 'click'
                  AND sec >= t1 AND sec <= t1 + 86400 GROUP BY 1),
         s3 AS (SELECT e.user_id, MIN(sec) AS t3 FROM e
                JOIN s2 USING (user_id)
                WHERE event_type = 'purchase'
                  AND sec >= t2 AND sec <= t2 + 86400 GROUP BY 1),
         j AS (SELECT s1.user_id, t1, t2, t3 FROM s1
               LEFT JOIN s2 USING (user_id)
               LEFT JOIN s3 USING (user_id))
         SELECT CAST(1 AS INTEGER) AS stage, 'view' AS step,
           COUNT(t1) AS n_users, CAST(NULL AS DOUBLE) AS mean_gap_sec
         FROM j
         UNION ALL
         SELECT 2, 'click', COUNT(t2),
           CASE WHEN COUNT(t2) > 0 THEN
             CAST(SUM(CAST(t2 - t1 AS DECIMAL(18,2))) AS DOUBLE) / COUNT(t2)
           END
         FROM j
         UNION ALL
         SELECT 3, 'purchase', COUNT(t3),
           CASE WHEN COUNT(t3) > 0 THEN
             CAST(SUM(CAST(t3 - t2 AS DECIMAL(18,2))) AS DOUBLE) / COUNT(t3)
           END
         FROM j
         ORDER BY 1""",

    "x_cohort" ->
      """WITH e AS (
           SELECT DISTINCT user_id,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) // 86400 AS day
           FROM events),
         c AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1)
         SELECT cohort_day, day - cohort_day AS day_offset,
           COUNT(*) AS n_users
         FROM e JOIN c USING (user_id)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "x_rfm" ->
      """WITH p AS (
           SELECT user_id,
             MAX(CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT)) AS last_sec,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary
           FROM events WHERE event_type = 'purchase' GROUP BY 1),
         q AS (
           SELECT user_id, frequency, monetary,
             CAST(ntile(5) OVER (ORDER BY last_sec DESC, user_id)
               AS INTEGER) AS r,
             CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id)
               AS INTEGER) AS f,
             CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id)
               AS INTEGER) AS m
           FROM p)
         SELECT user_id, frequency, monetary, r, f, m,
           CAST(r AS VARCHAR) || CAST(f AS VARCHAR)
             || CAST(m AS VARCHAR) AS segment
         FROM q ORDER BY user_id""",

    "x_basket_rules" ->
      """WITH bi AS (
           SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         pairs AS (
           SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS pair_support
           FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i
           GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         s AS (SELECT i, COUNT(*) AS s FROM bi GROUP BY 1),
         n AS (SELECT COUNT(DISTINCT b) AS n FROM bi),
         j AS (
           SELECT item_a, item_b, pair_support,
             sa.s AS support_a, sb.s AS support_b,
             round(CAST(pair_support * n.n AS DOUBLE)
                   / CAST(sa.s * sb.s AS DOUBLE), 9) AS lift
           FROM pairs
           JOIN s sa ON pairs.item_a = sa.i
           JOIN s sb ON pairs.item_b = sb.i
           CROSS JOIN n),
         rules AS (
           SELECT item_a AS antecedent, item_b AS consequent,
             pair_support,
             CAST(pair_support AS DOUBLE) / CAST(support_a AS DOUBLE)
               AS confidence, lift
           FROM j
           UNION ALL
           SELECT item_b, item_a, pair_support,
             CAST(pair_support AS DOUBLE) / CAST(support_b AS DOUBLE),
             lift
           FROM j)
         SELECT * FROM rules
         ORDER BY confidence DESC, antecedent, consequent LIMIT 40""",

    "x_stickiness" ->
      """WITH ud AS (
           SELECT DISTINCT user_id,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) // 86400 AS day
           FROM events),
         dau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT)
                   AS dau FROM ud GROUP BY 1),
         ex AS (
           SELECT user_id, day + g.g AS day
           FROM ud, (SELECT unnest(range(30)) AS g) g),
         mau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT)
                   AS mau FROM ex GROUP BY 1)
         SELECT dau.day, dau, mau,
           CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE) AS stickiness
         FROM dau JOIN mau ON dau.day = mau.day
         ORDER BY dau.day""",

    // Booleans assert the per-day and merged-window HLL bounds; exact
    // aggregation makes them trivially TRUE (x_sketch_rollup pattern).
    "x_stickiness_sketch" ->
      """WITH ud AS (
           SELECT DISTINCT user_id,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) // 86400 AS day
           FROM events),
         dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
                 FROM ud GROUP BY 1),
         ex AS (
           SELECT user_id, day + g.g AS day
           FROM ud, (SELECT unnest(range(30)) AS g) g),
         mau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT)
                   AS mau FROM ex GROUP BY 1)
         SELECT dau.day, dau, mau,
           CAST(dau AS DOUBLE) / CAST(mau AS DOUBLE) AS stickiness,
           TRUE AS dau_ok, TRUE AS mau_ok
         FROM dau JOIN mau ON dau.day = mau.day
         ORDER BY dau.day""",

    // dominance via NOT EXISTS — deliberately a DIFFERENT formulation
    // than the engine's cummax window, so the equivalence itself is
    // what the oracle checks
    "x_skyline" ->
      """WITH pts AS (
           SELECT p_brand, p_retailprice, p_size,
             MIN(p_partkey) AS p_partkey
           FROM part GROUP BY 1, 2, 3)
         SELECT p_brand, p_partkey, p_retailprice, p_size
         FROM pts a
         WHERE NOT EXISTS (
           SELECT 1 FROM pts b
           WHERE b.p_brand = a.p_brand
             AND b.p_retailprice <= a.p_retailprice
             AND b.p_size >= a.p_size
             AND (b.p_retailprice < a.p_retailprice
                  OR b.p_size > a.p_size))
         ORDER BY p_brand, p_partkey""",

    "x_ltv_curve" ->
      """WITH e AS (
           SELECT user_id, event_type, value,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) // 86400 AS day
           FROM events),
         c AS (SELECT user_id, MIN(day) AS cday FROM e GROUP BY 1),
         sz AS (SELECT cday, COUNT(*) AS n_users FROM c GROUP BY 1),
         r AS (
           SELECT cday, day - cday AS age,
             SUM(CAST(value AS DECIMAL(18,2))) AS rev
           FROM e JOIN c USING (user_id)
           WHERE event_type = 'purchase'
           GROUP BY 1, 2),
         cum AS (
           SELECT cday, age, rev,
             SUM(rev) OVER (PARTITION BY cday ORDER BY age
               ROWS UNBOUNDED PRECEDING) AS cum_rev
           FROM r)
         SELECT cum.cday, age, n_users,
           CAST(rev AS DOUBLE) AS age_rev,
           CAST(cum_rev AS DOUBLE) / CAST(n_users AS DOUBLE)
             AS ltv_per_user
         FROM cum JOIN sz ON cum.cday = sz.cday
         ORDER BY cum.cday, age""",

    "x_funnel_times" ->
      """WITH e AS (
           SELECT user_id, event_type,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) AS sec
           FROM events),
         s1 AS (SELECT user_id, MIN(sec) AS t1 FROM e
                WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, MIN(sec) AS t2 FROM e
                JOIN s1 USING (user_id)
                WHERE event_type = 'click'
                  AND sec >= t1 AND sec <= t1 + 86400 GROUP BY 1),
         s3 AS (SELECT e.user_id, MIN(sec) AS t3 FROM e
                JOIN s2 USING (user_id)
                WHERE event_type = 'purchase'
                  AND sec >= t2 AND sec <= t2 + 86400 GROUP BY 1),
         gaps AS (
           SELECT 2 AS stage, t2 - t1 AS gap
           FROM s1 JOIN s2 USING (user_id)
           UNION ALL
           SELECT 3, t3 - t2 FROM s2 JOIN s3 USING (user_id))
         SELECT CAST(stage AS INTEGER) AS stage, COUNT(*) AS n,
           quantile_cont(gap, 0.5) AS p50,
           quantile_cont(gap, 0.9) AS p90
         FROM gaps GROUP BY 1 ORDER BY 1""",

    "x_attribution_linear" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) AS sec
           FROM events),
         conv AS (SELECT user_id, event_id AS conv_id, sec AS cts
                  FROM e WHERE event_type = 'purchase'),
         touch AS (SELECT user_id, event_type AS channel, sec AS tts
                   FROM e WHERE event_type IN ('view', 'click')),
         pairs AS (
           SELECT conv_id, channel
           FROM conv JOIN touch USING (user_id)
           WHERE tts < cts AND tts >= cts - 86400),
         k AS (SELECT conv_id, COUNT(*) AS k FROM pairs GROUP BY 1)
         SELECT channel, COUNT(*) AS n_touches,
           round(CAST(SUM(CAST(round(1.0 / CAST(k AS DOUBLE), 9)
             AS DECIMAL(28,9))) AS DOUBLE), 6) AS credited_conversions
         FROM pairs JOIN k USING (conv_id)
         GROUP BY 1 ORDER BY 1""",

    "x_streaks" ->
      """WITH e AS (
           SELECT DISTINCT user_id,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) // 86400 AS day
           FROM events),
         r AS (
           SELECT user_id, day,
             day - row_number() OVER (PARTITION BY user_id
               ORDER BY day) AS island
           FROM e),
         i AS (
           SELECT user_id, island, COUNT(*) AS len, MIN(day) AS st
           FROM r GROUP BY 1, 2),
         i2 AS (
           SELECT *, MAX(len) OVER (PARTITION BY user_id) AS mx FROM i)
         SELECT user_id, CAST(SUM(len) AS BIGINT) AS n_active_days,
           COUNT(*) AS n_streaks, MAX(len) AS longest_streak,
           MIN(CASE WHEN len = mx THEN st END) AS streak_start_day
         FROM i2 GROUP BY 1 ORDER BY 1""",

    "x_kaplan_meier" ->
      """WITH e AS (
           SELECT user_id, event_type,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) // 86400 AS day
           FROM events),
         u AS (SELECT user_id, MIN(day) AS fd FROM e GROUP BY 1),
         p AS (SELECT user_id, MIN(day) AS pd FROM e
               WHERE event_type = 'purchase' GROUP BY 1),
         subj AS (
           SELECT least(COALESCE(pd - fd, 3), 3) + 1 AS t,
             CASE WHEN pd IS NOT NULL AND pd - fd <= 3 THEN 1 ELSE 0 END
               AS obs
           FROM u LEFT JOIN p USING (user_id)),
         byd AS (
           SELECT t, CAST(SUM(obs) AS BIGINT) AS d,
             CAST(SUM(1 - obs) AS BIGINT) AS c
           FROM subj GROUP BY 1),
         risk AS (
           SELECT t, d, c,
             CAST(SUM(d + c) OVER () AS BIGINT)
               - COALESCE(CAST(SUM(d + c) OVER (ORDER BY t ROWS BETWEEN
                   UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
               AS n_risk
           FROM byd),
         terms AS (
           SELECT *,
             CAST(CASE WHEN d = n_risk THEN -99.0
               ELSE round(ln(CAST(n_risk - d AS DOUBLE)
                 / CAST(n_risk AS DOUBLE)), 9) END
               AS DECIMAL(28,9)) AS term
           FROM risk),
         curve AS (
           SELECT t, n_risk, d, c,
             round(exp(CAST(SUM(term) OVER (ORDER BY t ROWS BETWEEN
               UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)), 6)
               AS survival
           FROM terms)
         SELECT t, n_risk, d AS n_events, c AS n_censored, survival
         FROM curve WHERE d > 0 ORDER BY t""",

    "x_max_concurrency" ->
      """WITH e AS (
           SELECT event_type,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) AS sec
           FROM events),
         d AS (
           SELECT event_type, t, CAST(SUM(dd) AS BIGINT) AS net FROM (
             SELECT event_type, sec AS t, 1 AS dd FROM e
             UNION ALL
             SELECT event_type, sec + 600, -1 FROM e)
           GROUP BY 1, 2),
         r AS (
           SELECT event_type, t,
             CAST(SUM(net) OVER (PARTITION BY event_type ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS open
           FROM d),
         r2 AS (
           SELECT *, MAX(open) OVER (PARTITION BY event_type) AS mx FROM r)
         SELECT event_type, MAX(open) AS max_concurrent,
           MIN(CASE WHEN open = mx THEN t END) AS peak_at
         FROM r2 GROUP BY 1 ORDER BY 1""",

    "x_copurchase" ->
      """WITH bi AS (
           SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         pairs AS (
           SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS pair_support
           FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i GROUP BY 1, 2),
         s AS (SELECT i, COUNT(*) AS s FROM bi GROUP BY 1),
         n AS (SELECT COUNT(DISTINCT b) AS n FROM bi)
         SELECT item_a, item_b, pair_support,
           sa.s AS support_a, sb.s AS support_b,
           round(CAST(pair_support * n.n AS DOUBLE)
                 / CAST(sa.s * sb.s AS DOUBLE), 9) AS lift
         FROM pairs
         JOIN s sa ON pairs.item_a = sa.i
         JOIN s sb ON pairs.item_b = sb.i
         CROSS JOIN n
         ORDER BY pair_support DESC, item_a, item_b LIMIT 40""",

    "x_item_cosine" ->
      """WITH bi AS (
           SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem),
         pairs AS (
           SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS pair_support
           FROM bi a JOIN bi b ON a.b = b.b AND a.i < b.i GROUP BY 1, 2),
         s AS (SELECT i, COUNT(*) AS s FROM bi GROUP BY 1)
         SELECT item_a, item_b, pair_support,
           sa.s AS support_a, sb.s AS support_b,
           round(CAST(pair_support AS DOUBLE)
                 / sqrt(CAST(sa.s * sb.s AS DOUBLE)), 9) AS cosine
         FROM pairs
         JOIN s sa ON pairs.item_a = sa.i
         JOIN s sb ON pairs.item_b = sb.i
         WHERE pair_support >= 2
         ORDER BY cosine DESC, item_a, item_b LIMIT 40""",

    "x_rec_eval" -> {
      val isTest = s"${Hashing.hash64Sql("CAST(b AS VARCHAR)", 13)} % 5 = 0"
      s"""WITH li AS (
            SELECT l_orderkey AS b, l_partkey AS i FROM lineitem),
          bi_tr AS (SELECT DISTINCT b, i FROM li WHERE NOT ($isTest)),
          bi_te AS (SELECT DISTINCT b, i FROM li WHERE $isTest),
          pairs AS (
            SELECT a.i AS item_a, b2.i AS item_b, COUNT(*) AS ps
            FROM bi_tr a JOIN bi_tr b2 ON a.b = b2.b AND a.i < b2.i
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
          s AS (SELECT i, COUNT(*) AS s FROM bi_tr GROUP BY 1),
          sims AS (
            SELECT item_a, item_b,
              round(CAST(ps AS DOUBLE)
                / sqrt(CAST(sa.s * sb.s AS DOUBLE)), 9) AS cosine
            FROM pairs
            JOIN s sa ON pairs.item_a = sa.i
            JOIN s sb ON pairs.item_b = sb.i),
          sym AS (SELECT item_a, item_b, cosine FROM sims
                  UNION ALL
                  SELECT item_b, item_a, cosine FROM sims),
          recs AS (
            SELECT item_a, item_b FROM (
              SELECT item_a, item_b,
                row_number() OVER (PARTITION BY item_a
                  ORDER BY cosine DESC, item_b) AS rk
              FROM sym)
            WHERE rk <= 3),
          tp AS (
            SELECT DISTINCT a.i AS a, b2.i AS c
            FROM bi_te a JOIN bi_te b2 ON a.b = b2.b AND a.i < b2.i),
          rboth AS (SELECT item_a AS a, item_b AS c FROM recs
                    UNION SELECT item_b, item_a FROM recs),
          h AS (SELECT COUNT(*) AS n_hits FROM tp
                WHERE EXISTS (SELECT 1 FROM rboth r
                              WHERE r.a = tp.a AND r.c = tp.c)),
          n AS (SELECT COUNT(*) AS n_test_pairs FROM tp)
          SELECT n_test_pairs, n_hits,
            CAST(n_hits AS DOUBLE) / CAST(n_test_pairs AS DOUBLE)
              AS hit_rate
          FROM n, h"""
    },

    "x_itemsets3" ->
      """WITH bi AS MATERIALIZED (
           SELECT DISTINCT l_orderkey AS b, l_partkey AS i FROM lineitem)
         SELECT a.i AS item_a, c.i AS item_b, d.i AS item_c,
           COUNT(*) AS support
         FROM bi a
         JOIN bi c ON a.b = c.b AND a.i < c.i
         JOIN bi d ON a.b = d.b AND c.i < d.i
         GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2
         ORDER BY support DESC, item_a, item_b, item_c LIMIT 30""",

    "x_sorted_neighborhood" ->
      """WITH b AS (
           SELECT p_partkey AS id, p_name AS key,
             string_split(p_name, ' ')[1] AS blk
           FROM part WHERE p_partkey < 500),
         r AS (
           SELECT id, key,
             lead(id, 1) OVER w AS id1, lead(key, 1) OVER w AS key1,
             lead(id, 2) OVER w AS id2, lead(key, 2) OVER w AS key2
           FROM b WINDOW w AS (PARTITION BY blk ORDER BY key, id))
         SELECT id AS id_a, id1 AS id_b, key AS key_a, key1 AS key_b
         FROM r WHERE id1 IS NOT NULL
         UNION ALL
         SELECT id, id2, key, key2 FROM r WHERE id2 IS NOT NULL
         ORDER BY id_a, id_b""",

    "x_jaro_score" ->
      """WITH b AS (
           SELECT p_partkey AS id, p_name AS key,
             string_split(p_name, ' ')[1] AS blk
           FROM part WHERE p_partkey < 500),
         r AS (
           SELECT id, key,
             lead(id, 1) OVER w AS id1, lead(key, 1) OVER w AS key1,
             lead(id, 2) OVER w AS id2, lead(key, 2) OVER w AS key2
           FROM b WINDOW w AS (PARTITION BY blk ORDER BY key, id)),
         cand AS (
           SELECT id AS id_a, id1 AS id_b, key AS key_a, key1 AS key_b
           FROM r WHERE id1 IS NOT NULL
           UNION ALL
           SELECT id, id2, key, key2 FROM r WHERE id2 IS NOT NULL)
         SELECT id_a, id_b,
           round(jaro_winkler_similarity(key_a, key_b), 6) AS jw
         FROM cand
         WHERE round(jaro_winkler_similarity(key_a, key_b), 6) >= 0.8
         ORDER BY id_a, id_b""",

    "x_editdist_join" ->
      """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
           CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
         FROM part a JOIN part b
           ON a.p_partkey < b.p_partkey
          AND abs(length(a.p_name) - length(b.p_name)) <= 2
         WHERE a.p_size <= 10 AND b.p_size <= 10
           AND a.p_partkey < 2000 AND b.p_partkey < 2000
           AND levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2
         ORDER BY dist, id_a, id_b LIMIT 100""",

    "x_sample_weighted" -> {
      val pri = Sampling.prioritySql("doc_id", "n_chars", 0)
      s"""SELECT doc_id, lang, n_chars FROM (
            SELECT doc_id, lang, n_chars FROM documents
            WHERE n_chars > 0
            ORDER BY $pri, doc_id LIMIT 50)
          ORDER BY doc_id"""
    },

    "x_skipgram" ->
      """WITH toks AS (
           SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, l[i] AS t
           FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
                 FROM documents) d,
             LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) g),
         pairs AS (
           SELECT a.t AS w, b.t AS c
           FROM toks a JOIN toks b
             ON a.doc_id = b.doc_id
            AND b.pos - a.pos BETWEEN 1 AND 2
           WHERE a.t <> '' AND b.t <> '')
         SELECT w, c, COUNT(*) AS n_pairs FROM pairs
         GROUP BY 1, 2
         ORDER BY n_pairs DESC, w, c LIMIT 50""",

    // co-occurrence edges re-derived in SQL, then the x_pagerank
    // integer-fixed-point iteration over them
    "x_textrank" -> {
      def iterCte(cur: String, prev: String) =
        s"""$cur AS (
            SELECT e.dst AS src,
              ((1000000000000 * 15) // 100) // nn.n +
                ((SUM($prev.pr // deg.d) * 85) // 100) AS pr
            FROM e JOIN $prev ON e.src = $prev.src
            JOIN deg ON e.src = deg.src CROSS JOIN nn
            GROUP BY e.dst, nn.n)"""
      s"""WITH toks AS (
            SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, l[i] AS t
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS l
                  FROM documents WHERE doc_id < 120) d,
              LATERAL (SELECT unnest(generate_series(1, len(l))) AS i) g),
          pc AS (
            SELECT a.t AS w, b.t AS c, COUNT(*) AS n
            FROM toks a JOIN toks b
              ON a.doc_id = b.doc_id AND b.pos - a.pos BETWEEN 1 AND 2
            WHERE a.t <> '' AND b.t <> ''
            GROUP BY 1, 2 HAVING COUNT(*) >= 2),
          canon AS (
            SELECT DISTINCT least(w, c) AS u, greatest(w, c) AS v
            FROM pc WHERE w <> c),
          e AS (SELECT u AS src, v AS dst FROM canon
                UNION ALL SELECT v, u FROM canon),
          nodes AS (SELECT DISTINCT src FROM e),
          nn AS (SELECT COUNT(*) AS n FROM nodes),
          deg AS (SELECT src, COUNT(*) AS d FROM e GROUP BY 1),
          r0 AS (SELECT src, 1000000000000 // nn.n AS pr
                 FROM nodes CROSS JOIN nn),
          ${iterCte("r1", "r0")},
          ${iterCte("r2", "r1")},
          ${iterCte("r3", "r2")}
          SELECT src AS token,
            CAST(pr AS DOUBLE) / CAST(1000000000000 AS DOUBLE) AS pagerank
          FROM r3 ORDER BY pagerank DESC, token LIMIT 25"""
    },

    "x_llm_pipeline2" -> {
      val split = Sampling.bucketSql("doc_id", 1)
      val shard = Sampling.shardSql("doc_id", 8, 2)
      s"""WITH keepers AS (
            SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
          surv AS (
            SELECT d.* FROM documents d JOIN keepers USING (doc_id)),
          clean AS (
            SELECT * FROM surv
            WHERE len(list_filter(string_split(lower(text), ' '),
                t -> t IN ('slow', 'broken', 'spill'))) = 0
              AND n_chars BETWEEN 100 AND 2000),
          train AS (
            SELECT * FROM clean WHERE $split < 800000),
          sharded AS (
            SELECT $shard AS shard, doc_id, n_chars FROM train)
          SELECT shard, COUNT(*) AS n_docs,
            CAST(SUM(n_chars) AS BIGINT) AS total_chars,
            MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
          FROM sharded GROUP BY 1 ORDER BY 1"""
    },

    "x_blocklist" ->
      """SELECT doc_id,
           CAST(len(list_filter(string_split(lower(text), ' '),
             t -> t IN ('slow', 'broken', 'spill'))) AS INTEGER)
             AS n_hits,
           len(list_filter(string_split(lower(text), ' '),
             t -> t IN ('slow', 'broken', 'spill'))) = 0 AS keep
         FROM documents ORDER BY doc_id""",

    // Exact-side re-derivation of the equi-depth bound booleans: exact
    // decile buckets trivially hold 10% each, so depth_ok is TRUE for
    // all ten buckets whenever the engine's GK sketch honors its
    // +-0.1% rank guarantee (checked at +-2%); n_total is exact.
    "x_histogram_eqdepth" ->
      """SELECT CAST(x AS INTEGER) AS bucket,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_total,
                TRUE AS depth_ok
         FROM range(10) t(x) ORDER BY 1""",

    "x_weighted_median" ->
      """WITH g AS (
           SELECT l_returnflag, l_quantity AS v,
             CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS w
           FROM lineitem
           WHERE l_quantity IS NOT NULL AND l_extendedprice > 0
           GROUP BY 1, 2),
         c AS (
           SELECT l_returnflag, v,
             CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT)
               AS tot
           FROM g)
         SELECT l_returnflag, MIN(v) AS weighted_median
         FROM c WHERE cum * 2 >= tot GROUP BY 1 ORDER BY 1""",

    "x_knn_graph" ->
      s"""WITH e AS (SELECT vec_id, $qvec AS v
                     FROM embeddings WHERE vec_id < 150),
          bands AS (${signBandsSql(8, 6, "embeddings WHERE vec_id < 150")}),
          ea AS (SELECT e.vec_id, v, tbl, bucket
                 FROM e JOIN bands ON e.vec_id = bands.vec_id),
          cand AS (
            SELECT DISTINCT a.vec_id AS id_a, a.v AS va,
                            b.vec_id AS id_b, b.v AS vb
            FROM ea a JOIN ea b
              ON a.tbl = b.tbl AND a.bucket = b.bucket
             AND a.vec_id < b.vec_id),
          pairs AS (
            SELECT id_a, id_b, ${cosSql("va", "vb")} AS cosine
            FROM cand WHERE ${cosSql("va", "vb")} > -1.0),
          sym AS (SELECT id_a AS vec_id, id_b AS nb, cosine FROM pairs
                  UNION ALL SELECT id_b, id_a, cosine FROM pairs),
          rk AS (
            SELECT vec_id, nb, cosine,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY cosine DESC, nb) AS rk
            FROM sym)
          SELECT vec_id, CAST(rk AS INTEGER) AS rk, nb, cosine
          FROM rk WHERE rk <= 3 ORDER BY vec_id, rk""",

    // unrolled farthest-point steps; see kcenterOracle.
    "x_kcenter" -> kcenterOracle(8),

    // same candidate blocks as x_knn_graph, rk <= 5; labels joined on
    // both endpoints, majority-disagreement filter in exact integers.
    "x_label_noise" ->
      s"""WITH e AS (SELECT vec_id, $qvec AS v
                     FROM embeddings WHERE vec_id < 150),
          bands AS (${signBandsSql(8, 6, "embeddings WHERE vec_id < 150")}),
          ea AS (SELECT e.vec_id, v, tbl, bucket
                 FROM e JOIN bands ON e.vec_id = bands.vec_id),
          cand AS (
            SELECT DISTINCT a.vec_id AS id_a, a.v AS va,
                            b.vec_id AS id_b, b.v AS vb
            FROM ea a JOIN ea b
              ON a.tbl = b.tbl AND a.bucket = b.bucket
             AND a.vec_id < b.vec_id),
          pairs AS (
            SELECT id_a, id_b, ${cosSql("va", "vb")} AS cosine
            FROM cand WHERE ${cosSql("va", "vb")} > -1.0),
          sym AS (SELECT id_a AS vec_id, id_b AS nb, cosine FROM pairs
                  UNION ALL SELECT id_b, id_a, cosine FROM pairs),
          rk AS (
            SELECT vec_id, nb,
              row_number() OVER (PARTITION BY vec_id
                ORDER BY cosine DESC, nb) AS rk
            FROM sym),
          lab AS (SELECT vec_id, label FROM embeddings WHERE vec_id < 150),
          agg AS (
            SELECT r.vec_id, l.label AS own_label,
              CAST(COUNT(*) AS BIGINT) AS n_nb,
              CAST(SUM(CASE WHEN nl.label <> l.label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_disagree
            FROM rk r
            JOIN lab l ON r.vec_id = l.vec_id
            JOIN lab nl ON r.nb = nl.vec_id
            WHERE r.rk <= 5 GROUP BY 1, 2)
          SELECT vec_id, own_label, n_nb, n_disagree FROM agg
          WHERE n_disagree * 2 > n_nb ORDER BY vec_id""",

    // per-source DISTINCT 60-bit gram hashes -> per-gram source BITMASK
    // (bit_or of 1 << sorted-source index) -> (mask, n) counts -> pair
    // sums over set bits; the identical md5 gram hash on both engines
    // makes any collision change both sides the same way.
    "x_source_overlap" ->
      s"""WITH g AS (
            SELECT DISTINCT src,
              ${graft.functions.Hashing.hash64Sql("gram", 71)} AS g
            FROM (
              SELECT source AS src,
                unnest(list_distinct($shingleSql)) AS gram
              FROM documents)),
          idx AS (
            SELECT src, row_number() OVER (ORDER BY src) - 1 AS idx
            FROM (SELECT DISTINCT src FROM g)),
          m AS (
            SELECT g.g, bit_or(CAST(1 AS BIGINT) << idx.idx) AS mask
            FROM g JOIN idx ON g.src = idx.src GROUP BY 1),
          mc AS (SELECT mask, COUNT(*) AS n FROM m GROUP BY 1),
          p AS (
            SELECT a.src AS source_a, b.src AS source_b,
              CAST(SUM(n) AS BIGINT) AS inter
            FROM mc
            JOIN idx a ON ((mask >> a.idx) & 1) = 1
            JOIN idx b ON ((mask >> b.idx) & 1) = 1 AND a.src < b.src
            GROUP BY 1, 2),
          s AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS ng
                FROM g GROUP BY 1)
          SELECT source_a, source_b, sa.ng AS na, sb.ng AS nb, inter,
            CAST(inter AS DOUBLE) / (sa.ng + sb.ng - inter) AS jaccard
          FROM p
          JOIN s sa ON p.source_a = sa.src
          JOIN s sb ON p.source_b = sb.src
          ORDER BY 1, 2""",

    "x_winsorize" ->
      """WITH b AS (
           SELECT l_returnflag,
             quantile_cont(l_extendedprice, 0.05) AS blo,
             quantile_cont(l_extendedprice, 0.95) AS bhi
           FROM lineitem GROUP BY 1),
         g AS (
           SELECT l.l_returnflag, COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN l_extendedprice < blo THEN 1 ELSE 0 END)
               AS BIGINT) AS n_clipped_lo,
             CAST(SUM(CASE WHEN l_extendedprice > bhi THEN 1 ELSE 0 END)
               AS BIGINT) AS n_clipped_hi,
             MIN(blo) AS lo, MIN(bhi) AS hi,
             CAST(SUM(CAST(round(LEAST(GREATEST(l_extendedprice, blo), bhi),
               6) AS DECIMAL(28,6))) AS DECIMAL(38,6)) AS clipped_sum
           FROM lineitem l JOIN b USING (l_returnflag)
           GROUP BY 1)
         SELECT l_returnflag, n_rows, n_clipped_lo, n_clipped_hi, lo, hi,
           CAST(clipped_sum AS VARCHAR) AS clipped_sum,
           ROUND(CAST(clipped_sum AS DOUBLE) / n_rows, 6) AS clipped_mean
         FROM g ORDER BY 1""",

    "x_join_full" ->
      """WITH totals AS (
           SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price,
             COUNT(*) AS n_orders
           FROM orders GROUP BY 1)
         SELECT CASE WHEN c_custkey IS NULL THEN 'order_only'
                     WHEN o_custkey IS NULL THEN 'cust_only'
                     ELSE 'both' END AS side,
           COUNT(*) AS n_rows,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(total_price AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
         FROM customer FULL OUTER JOIN totals
           ON c_custkey = o_custkey
         GROUP BY 1 ORDER BY 1""",

    "x_string_agg" ->
      """SELECT c_mktsegment, c_nationkey,
           COUNT(*) AS n_names,
           string_agg(c_name, '|' ORDER BY c_name) AS names
         FROM customer
         WHERE c_nationkey IN (1, 2)
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "x_table_checksum" -> {
      val rowStr = "concat_ws('|', l_orderkey, l_partkey, l_suppkey, " +
        "l_linenumber, " +
        "CAST(CAST(l_quantity AS DECIMAL(18,2)) AS VARCHAR), " +
        "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR), " +
        "CAST(CAST(l_discount AS DECIMAL(18,2)) AS VARCHAR), " +
        "CAST(CAST(l_tax AS DECIMAL(18,2)) AS VARCHAR), " +
        "l_returnflag, l_linestatus, " +
        "CAST(epoch(date_trunc('second', CAST(l_shipdate AS TIMESTAMP))) " +
        "AS BIGINT))"
      s"""WITH r AS (
            SELECT ${graft.functions.Hashing.hash64Sql(rowStr, 42)} AS h
            FROM lineitem)
          SELECT COUNT(*) AS n_rows, bit_xor(h) AS xor_sig,
            MIN(h) AS min_h, MAX(h) AS max_h
          FROM r"""
    },

    // COW DELETE: the visible snapshot after `DELETE WHERE p_size < 15`
    // is, by SQL delete semantics, exactly the complement.
    "x_cow_delete" ->
      """SELECT p_brand, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS size_sum,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
             AS price_sum
         FROM part WHERE NOT (p_size < 15)
         GROUP BY 1 ORDER BY 1""",

    // COW UPDATE: snapshot equals the CASE projection of the original.
    "x_cow_update" ->
      """WITH u AS (
           SELECT p_brand,
             CASE WHEN p_size < 15 THEN p_size + 100 ELSE p_size END
               AS p_size
           FROM part)
         SELECT p_brand, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS size_sum,
           MIN(p_size) AS min_size
         FROM u GROUP BY 1 ORDER BY 1""",

    // Holt recurrence as a recursive CTE walking each status series in
    // rn order — the same IEEE ops in the same order as the Spark fold,
    // so level/trend/fit hash-match bit-exactly.
    // daily/idx MATERIALIZED for the same reason as x_cusum: the
    // recursive member joins idx every day-step, and inlined it
    // re-runs the full orders aggregation per step (~2000 scans of
    // the fact table at the x100 replica).
    "x_holt_smooth" ->
      """WITH RECURSIVE daily AS MATERIALIZED (
           SELECT o_orderstatus AS status,
             CAST(epoch(date_trunc('second', CAST(o_orderdate AS TIMESTAMP)))
               AS BIGINT) // 86400 AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
           FROM orders GROUP BY 1, 2),
         idx AS MATERIALIZED (
           SELECT status, day, revenue,
             CAST(row_number() OVER (PARTITION BY status ORDER BY day)
               AS BIGINT) AS rn
           FROM daily),
         rec AS (
           SELECT status, rn, day, revenue,
             revenue AS level, CAST(0.0 AS DOUBLE) AS trend,
             CAST(NULL AS DOUBLE) AS fit
           FROM idx WHERE rn = 1
           UNION ALL
           SELECT d.status, d.rn, d.day, d.revenue,
             0.5 * d.revenue + 0.5 * (r.level + r.trend) AS level,
             0.25 * ((0.5 * d.revenue + 0.5 * (r.level + r.trend))
               - r.level) + 0.75 * r.trend AS trend,
             r.level + r.trend AS fit
           FROM rec r JOIN idx d ON d.status = r.status
             AND d.rn = r.rn + 1)
         SELECT status, day, revenue, level, trend, fit
         FROM rec ORDER BY status, day""",

    // Holt-Winters: the seasonal ring rides the recursion as a LIST
    // (1-based slicing; Spark's 0-based index i maps to s[i+1]); every
    // repeated subexpression re-evaluates to the same IEEE bits.
    "x_holt_winters" -> {
      val si = "r.s[CAST((i.rn - 1) % 7 AS INTEGER) + 1]"
      val lvl = s"0.5 * (i.revenue - $si) + 0.5 * (r.level + r.trend)"
      val ssn = s"0.25 * (i.revenue - ($lvl)) + 0.75 * $si"
      // daily/idx MATERIALIZED: same per-iteration re-derivation fix
      // as x_cusum / x_holt_smooth.
      s"""WITH RECURSIVE daily AS MATERIALIZED (
            SELECT o_orderstatus AS status,
              CAST(epoch(date_trunc('second', CAST(o_orderdate AS TIMESTAMP)))
                AS BIGINT) // 86400 AS day,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                AS revenue
            FROM orders GROUP BY 1, 2),
          idx AS MATERIALIZED (
            SELECT status, day, revenue,
              CAST(row_number() OVER (PARTITION BY status ORDER BY day)
                AS BIGINT) AS rn
            FROM daily),
          rec AS (
            SELECT status, rn, day, revenue,
              revenue AS level, CAST(0.0 AS DOUBLE) AS trend,
              CAST(0.0 AS DOUBLE) AS seasonal, CAST(NULL AS DOUBLE) AS fit,
              CAST([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] AS DOUBLE[]) AS s
            FROM idx WHERE rn = 1
            UNION ALL
            SELECT i.status, i.rn, i.day, i.revenue,
              $lvl AS level,
              0.25 * (($lvl) - r.level) + 0.75 * r.trend AS trend,
              $ssn AS seasonal,
              r.level + r.trend + $si AS fit,
              r.s[1:CAST((i.rn - 1) % 7 AS INTEGER)] || [$ssn]
                || r.s[CAST((i.rn - 1) % 7 AS INTEGER) + 2:] AS s
            FROM rec r JOIN idx i ON i.status = r.status
              AND i.rn = r.rn + 1)
          SELECT status, day, revenue, level, trend, seasonal, fit
          FROM rec ORDER BY status, day"""
    },

    // CUSUM as a recursive CTE: same left-associated IEEE arithmetic in
    // the same series order, greatest(0, ·) == max(0, ·). daily/idx are
    // MATERIALIZED: the recursive member references idx every iteration,
    // and without the hint DuckDB re-derived the full orders aggregation
    // per day-step (~2000 scans of the fact table — >180 s at the x100
    // replica vs 2.7 s materialized, identical rows).
    "x_cusum" ->
      """WITH RECURSIVE daily AS MATERIALIZED (
           SELECT o_orderstatus AS status,
             CAST(epoch(date_trunc('second', CAST(o_orderdate AS TIMESTAMP)))
               AS BIGINT) // 86400 AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_dec
           FROM orders GROUP BY 1, 2),
         stats AS (
           SELECT status,
             CAST(SUM(total_dec) AS DOUBLE) / COUNT(*) AS target
           FROM daily GROUP BY 1),
         idx AS MATERIALIZED (
           SELECT d.status, CAST(d.total_dec AS DOUBLE) AS revenue,
             d.day, s.target, s.target * 0.0625 AS slack,
             s.target * 0.5 AS h,
             CAST(row_number() OVER (PARTITION BY d.status ORDER BY d.day)
               AS BIGINT) AS rn
           FROM daily d JOIN stats s ON d.status = s.status),
         rec AS (
           SELECT status, rn, day, revenue, target, slack, h,
             greatest(0.0, revenue - target - slack) AS cusum_pos,
             greatest(0.0, target - revenue - slack) AS cusum_neg
           FROM idx WHERE rn = 1
           UNION ALL
           SELECT i.status, i.rn, i.day, i.revenue, i.target, i.slack,
             i.h,
             greatest(0.0, r.cusum_pos + (i.revenue - i.target - i.slack))
               AS cusum_pos,
             greatest(0.0, r.cusum_neg + (i.target - i.revenue - i.slack))
               AS cusum_neg
           FROM rec r JOIN idx i ON i.status = r.status
             AND i.rn = r.rn + 1)
         SELECT status, day, revenue, cusum_pos, cusum_neg,
           TRUE AS alarm
         FROM rec
         WHERE cusum_pos > h OR cusum_neg > h
         ORDER BY status, day""",

    "x_autocorr" -> {
      val lagCols = (1 to 7).map(l =>
        s"lag(revenue, $l) OVER w AS l$l").mkString(", ")
      val unions = (1 to 7).map(l =>
        s"""SELECT status, $l AS lag, n_obs, revenue, mu, l$l AS xl
            FROM wl""").mkString(" UNION ALL ")
      s"""WITH daily AS (
            SELECT o_orderstatus AS status,
              CAST(epoch(date_trunc('second', CAST(o_orderdate
                AS TIMESTAMP))) AS BIGINT) // 86400 AS day,
              CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                AS revenue
            FROM orders GROUP BY 1, 2),
          st AS (
            SELECT status,
              CAST(SUM(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE) AS mu,
              COUNT(*) AS n_obs
            FROM daily GROUP BY 1),
          wl AS (
            SELECT daily.status, day, revenue, mu, n_obs, $lagCols
            FROM daily JOIN st ON daily.status = st.status
            WINDOW w AS (PARTITION BY daily.status ORDER BY day)),
          den AS (
            SELECT status,
              SUM(CAST(round((revenue - mu) * (revenue - mu), 9)
                AS DECIMAL(28,9))) AS den
            FROM wl GROUP BY 1),
          terms AS ($unions),
          num AS (
            SELECT status, lag, MAX(n_obs) AS n_obs,
              SUM(CAST(round((revenue - mu) * (xl - mu), 9)
                AS DECIMAL(28,9))) AS num
            FROM terms WHERE xl IS NOT NULL GROUP BY 1, 2)
          SELECT num.status, lag, n_obs,
            round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS acf
          FROM num JOIN den ON num.status = den.status
          ORDER BY num.status, lag"""
    },

    "x_jackknife" ->
      """WITH st AS (
           SELECT l_returnflag, COUNT(*) AS n,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS s
           FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1),
         st2 AS (
           SELECT *, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean
           FROM st),
         loo AS (
           SELECT l.l_returnflag, n, mean,
             CAST(s - CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE)
               / CAST(n - 1 AS DOUBLE) AS lm
           FROM lineitem l JOIN st2 ON l.l_returnflag = st2.l_returnflag
           WHERE l_extendedprice IS NOT NULL)
         SELECT l_returnflag, MAX(n) AS n, MAX(mean) AS mean,
           round(sqrt(CAST(MAX(n) - 1 AS DOUBLE)
             / CAST(MAX(n) AS DOUBLE)
             * CAST(SUM(CAST(round((lm - mean) * (lm - mean), 9)
               AS DECIMAL(28,9))) AS DOUBLE)), 6) AS jk_se
         FROM loo GROUP BY l_returnflag ORDER BY l_returnflag""",

    // PAV via its minimax characterization over cent-quantized prefix
    // sums: fit_i = max_{j<=i} min_{k>=i} mean(y_j..y_k). Doubles enter
    // only at the correctly-rounded segment-mean division, and max/min
    // commute with monotone rounding — so this O(n³) closed form equals
    // the engine's stack PAV bit-for-bit.
    "x_isotonic" ->
      """WITH e AS (
           SELECT user_id,
             CAST(epoch(date_trunc('second', CAST(ts AS TIMESTAMP)))
               AS BIGINT) // 86400 AS day,
             CAST(value AS DECIMAL(18,2)) AS v
           FROM events WHERE user_id < 12),
         d AS (
           SELECT user_id, day,
             CAST(round(CAST(SUM(v) AS DOUBLE) * 100) AS BIGINT) AS yq
           FROM e GROUP BY 1, 2),
         r AS (
           SELECT user_id, day, yq,
             row_number() OVER w AS rn,
             CAST(SUM(yq) OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS s
           FROM d WINDOW w AS (PARTITION BY user_id ORDER BY day)),
         seg AS (
           SELECT a.user_id, a.rn AS j, b.rn AS k,
             CAST(b.s - a.s + a.yq AS DOUBLE)
               / ((b.rn - a.rn + 1) * 100.0) AS m
           FROM r a JOIN r b
             ON a.user_id = b.user_id AND b.rn >= a.rn),
         tri AS (
           SELECT seg.user_id, seg.j, i.rn AS i, seg.m
           FROM seg JOIN r i ON seg.user_id = i.user_id
             AND seg.j <= i.rn AND seg.k >= i.rn),
         inner_min AS (
           SELECT user_id, j, i, MIN(m) AS m1
           FROM tri GROUP BY 1, 2, 3),
         fitv AS (
           SELECT user_id, i, MAX(m1) AS iso_fit
           FROM inner_min GROUP BY 1, 2)
         SELECT r.user_id, r.day, CAST(r.yq AS DOUBLE) / 100.0 AS dval,
           f.iso_fit
         FROM r JOIN fitv f ON r.user_id = f.user_id AND r.rn = f.i
         ORDER BY 1, 2""",

    // weighted PAV minimax over the per-score positive rates (weights =
    // group sizes, rates quantized at 1e-6): fit_i = max_j min_k of the
    // weighted segment mean — same monotone-rounding argument as
    // x_isotonic, weighted prefix sums in exact BIGINTs
    "x_calib_iso" ->
      """WITH f AS (
           SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
                  (len(list_filter(string_split(lower(text), ' '),
                      t -> t IN ('the', 'and', 'of', 'to', 'a'))) * 1000)
                    // len(string_split(lower(text), ' ')) AS s
           FROM documents),
         g AS (SELECT s, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS pos
               FROM f GROUP BY 1),
         q AS (SELECT s, n,
                 CAST(round((CAST(pos AS DOUBLE) / CAST(n AS DOUBLE))
                   * 1000000) AS BIGINT) AS yq
               FROM g),
         r AS (SELECT s, n, yq, row_number() OVER (ORDER BY s) AS rn,
                 CAST(SUM(yq * n) OVER (ORDER BY s ROWS BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS swy,
                 CAST(SUM(n) OVER (ORDER BY s ROWS BETWEEN
                   UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sw
               FROM q),
         seg AS (
           SELECT a.rn AS j, b.rn AS k,
             CAST(b.swy - a.swy + a.yq * a.n AS DOUBLE)
               / CAST((b.sw - a.sw + a.n) * 1000000 AS DOUBLE) AS m
           FROM r a JOIN r b ON b.rn >= a.rn),
         tri AS (
           SELECT seg.j, i.rn AS i, seg.m
           FROM seg JOIN r i ON seg.j <= i.rn AND seg.k >= i.rn),
         im AS (SELECT j, i, MIN(m) AS m1 FROM tri GROUP BY 1, 2),
         fv AS (SELECT i, MAX(m1) AS iso_fit FROM im GROUP BY 1)
         SELECT r.s, CAST(r.yq AS DOUBLE) / 1000000.0 AS rate,
           r.n AS weight, fv.iso_fit
         FROM r JOIN fv ON r.rn = fv.i
         ORDER BY r.s""",

    "x_k_anonymity" ->
      """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_rows,
           COUNT(*) < 10 AS at_risk
         FROM customer GROUP BY 1, 2 ORDER BY 1, 2""",

    "x_k_anon_summary" ->
      """WITH c AS (
           SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_rows
           FROM customer GROUP BY 1, 2)
         SELECT COUNT(*) AS n_classes,
           CAST(SUM(CASE WHEN n_rows < 10 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_risky_classes,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN n_rows < 10 THEN n_rows ELSE 0 END)
             AS BIGINT) AS n_risky_rows,
           MIN(n_rows) AS min_class_size
         FROM c""",

    // post-suppression audit: surviving classes keep their full counts
    // (suppression removes whole classes), so the CASE arms evaluate
    // over n_rows >= 3 only.
    "x_k_suppress" ->
      """WITH c AS (
           SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_rows
           FROM customer GROUP BY 1, 2),
         safe AS (SELECT n_rows FROM c WHERE n_rows >= 3)
         SELECT COUNT(*) AS n_classes,
           CAST(SUM(CASE WHEN n_rows < 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_risky_classes,
           CAST(SUM(n_rows) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN n_rows < 3 THEN n_rows ELSE 0 END)
             AS BIGINT) AS n_risky_rows,
           MIN(n_rows) AS min_class_size
         FROM safe""",

    "x_rr_release" -> {
      val fl = Hashing.hash64Sql("CAST(c_custkey AS VARCHAR)", 2)
      val dr = Hashing.hash64Sql("CAST(c_custkey AS VARCHAR)", 3)
      s"""WITH c AS (
            SELECT c_mktsegment, $fl % 1000 AS fl, $dr % 5 AS dw
            FROM customer),
          noisy AS (
            SELECT CASE WHEN fl < 400 THEN
                CASE dw WHEN 0 THEN 'AUTOMOBILE' WHEN 1 THEN 'BUILDING'
                  WHEN 2 THEN 'FURNITURE' WHEN 3 THEN 'HOUSEHOLD'
                  ELSE 'MACHINERY' END
              ELSE c_mktsegment END AS seg
            FROM c),
          cnt AS (SELECT seg, COUNT(*) AS n_noisy FROM noisy GROUP BY 1),
          dom AS (SELECT unnest(['AUTOMOBILE', 'BUILDING', 'FURNITURE',
            'HOUSEHOLD', 'MACHINERY']) AS seg),
          fullc AS (
            SELECT dom.seg, COALESCE(n_noisy, 0) AS n_noisy
            FROM dom LEFT JOIN cnt ON dom.seg = cnt.seg),
          t AS (SELECT CAST(SUM(n_noisy) AS BIGINT) AS n FROM fullc),
          tr AS (SELECT c_mktsegment, COUNT(*) AS n_true
                 FROM customer GROUP BY 1)
          SELECT f.seg AS c_mktsegment, f.n_noisy,
            (CAST(f.n_noisy AS DOUBLE)
              - CAST(t.n AS DOUBLE) * 0.4 / 5.0) / 0.6 AS n_est,
            tr.n_true
          FROM fullc f CROSS JOIN t
          JOIN tr ON f.seg = tr.c_mktsegment
          ORDER BY 1"""
    },

    // deterministic Laplace: u from the md5 hash of '0|'||key masked to
    // 52 bits (52-bit int + 0.5 is exactly representable, so u ∈ (0,1)
    // strictly — no ln(0) edge), noise =
    // -(1/eps)*sgn(u-1/2)*ln(1-2|u-1/2|), pinned at 6 dp
    // (eps = 0.5 -> scale -2.0); 2^52 = 4503599627370496
    "x_dp_counts" ->
      """WITH g AS (
           SELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY 1),
         h AS (
           SELECT c_mktsegment, n,
             (CAST((CAST(('0x' || substr(md5('0|' || c_mktsegment), 1, 15))
                AS BIGINT) & 4503599627370495) AS DOUBLE) + 0.5)
               / 4503599627370496.0 AS u
           FROM g)
         SELECT c_mktsegment,
           CAST(n AS DOUBLE) +
             round(-2.0 * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5)), 6)
             AS n_noisy
         FROM h ORDER BY c_mktsegment""",

    "x_l_diversity" ->
      """SELECT c_mktsegment, COUNT(*) AS n_rows,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_sensitive,
           COUNT(DISTINCT c_nationkey) >= 3 AS diverse
         FROM customer GROUP BY 1 ORDER BY 1""",

    // Coverage curve: head mass of the token frequency distribution at
    // the standard rank checkpoints; total order (n DESC, token) makes
    // the top-500 cut and the running sum deterministic.
    "x_vocab_coverage" ->
      """WITH counts AS (
           SELECT t.token, COUNT(*) AS n
           FROM documents,
             unnest(string_split(lower(text), ' ')) AS t(token)
           GROUP BY 1),
         total AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM counts),
         ranked AS (
           SELECT token, n,
             CAST(row_number() OVER (ORDER BY n DESC, token) AS INTEGER)
               AS rank,
             CAST(SUM(n) OVER (ORDER BY n DESC, token
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_n
           FROM counts)
         SELECT rank, cum_n,
           CAST(cum_n AS DOUBLE) / tot AS coverage
         FROM ranked, total
         WHERE rank IN (1, 2, 3, 5, 10, 20, 50, 100, 250, 500)
         ORDER BY rank""",

    // Length-bucketed batches: per-bucket doc_id-ordered rank packs 32
    // docs per batch; the per-batch audit is order-free aggregation.
    "x_length_batches" ->
      """WITH b AS (
           SELECT doc_id, n_chars AS len,
             CAST(CASE WHEN n_chars > 200 THEN 1 ELSE 0 END
               + CASE WHEN n_chars > 500 THEN 1 ELSE 0 END
               + CASE WHEN n_chars > 1000 THEN 1 ELSE 0 END AS BIGINT)
               AS len_bucket
           FROM documents),
         r AS (
           SELECT doc_id, len, len_bucket,
             CAST(row_number() OVER (PARTITION BY len_bucket
               ORDER BY doc_id) - 1 AS BIGINT) AS rnk
           FROM b)
         SELECT len_bucket, rnk // 32 AS batch_idx,
           COUNT(*) AS n_docs,
           MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc,
           MIN(len) AS min_len, MAX(len) AS max_len
         FROM r GROUP BY 1, 2 ORDER BY 1, 2"""
  )
}
