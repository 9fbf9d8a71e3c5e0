package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deduplication operators (builder brief + SURVEY §7.4): exact,
  * MinHash+LSH, SimHash, n-gram Jaccard. Embedding near-dup lives in
  * [[Similarity]].
  *
  * Scale design: every signature (minhash sigs, simhash, fingerprints) is
  * a row-local column expression — the only shuffles are the final
  * group-by-signature / band-bucket joins, whose keys are high-entropy
  * hashes (uniformly distributed → no skew, AQE-friendly). Candidate
  * verification joins operate on LSH buckets, never on the raw cross
  * product: at 100 TB the cross product is 10^21 pairs; bucketed it is
  * Σ|bucket|², bounded by band width.
  */
object Dedup {

  /** Production-safe default for the degenerate-bucket / stopword-gram
    * skew guards (`maxBucket` / `maxDf`): a bucket of 10⁶ identical docs
    * emits 10¹² pairs unguarded, so the guards default ON — exact-
    * semantics callers (oracles, tests) pass 0 to disable.
    */
  val DefaultMaxBucket = 1000

  // ---- exact ----------------------------------------------------------

  /** Exact dedup via content hash: one row per distinct text, keeping the
    * lowest doc id as the canonical representative. A single hash
    * group-by: map-side partial collapses each partition to its distinct
    * hashes before the exchange.
    */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup, returning the surviving rows. */
  def dropExactDups(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val keep = exactGroups(df, idCol, textCol).select(col("keep_id").as(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  // ---- MinHash + LSH --------------------------------------------------

  /** Word 3-shingles over a tokens array; texts shorter than 3 tokens use
    * the whole (re-joined) text as a single shingle.
    *
    * IMPORTANT perf contract: `toks` must be a materialized attribute, not
    * an inline `split(...)` expression — codegen's common-subexpression
    * elimination does not reach inside higher-order-function lambdas, so
    * an inline split would be re-evaluated for every `element_at` (O(n²)
    * per row; measured 6× slowdown on the shingle explode).
    */
  def shinglesOf(toks: Column): Column = ngramsOf(toks, 3)

  /** Word n-grams over a tokens array (same attribute contract as
    * [[shinglesOf]]); texts shorter than n tokens use the whole
    * (re-joined) text as a single gram. n=1 returns the tokens as-is.
    */
  def ngramsOf(toks: Column, n: Int): Column = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    if (n == 1) toks
    else when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*)))
      .otherwise(array(concat_ws(" ", toks)))
  }

  /** Convenience single-column form (fine for tests/small inputs; hot
    * paths go through [[shingleRows]]/[[ngramRows]]).
    */
  def shingles(text: Column): Column = shinglesOf(split(lower(text), " "))

  /** (id, gram) ROWS for an n-gram stream — the hot-path form. Same
    * gram semantics as [[ngramsOf]] (short texts fall back to the whole
    * text as one gram) but a different execution shape: instead of a
    * per-row `transform` lambda (interpreted per ELEMENT — higher-order
    * functions have no codegen, measured ~6× the explode cost on the
    * bigram stream), the n windows are `arrays_zip`-ed slices of the
    * token array, exploded as structs, and the gram string is
    * assembled by a post-explode `concat_ws` Project that whole-stage
    * codegen compiles. The short-text fallback rides the same struct
    * shape with null tail fields (`concat_ws` skips nulls).
    */
  def ngramRows(df: DataFrame, idCol: String, textCol: String, n: Int,
                gramCol: String = "gram", strict: Boolean = false): DataFrame = {
    require(n >= 1, s"n-gram size must be >= 1, got $n")
    // strict = drop docs shorter than n (no whole-text fallback); the
    // filter reads the materialized token attribute, not a re-split
    val allToks = df.select(col(idCol),
      split(lower(col(textCol)), " ").as("toks"))
    val toksed =
      if (strict) allToks.filter(size(col("toks")) >= n) else allToks
    if (n == 1)
      toksed.select(col(idCol), explode(col("toks")).as(gramCol))
    else {
      val m = size(col("toks")) - (n - 1)
      val zipped = arrays_zip((0 until n).map(k =>
        slice(col("toks"), lit(k + 1), m)): _*)
      val fallback = array(struct(
        concat_ws(" ", col("toks")).as("0") +:
          (1 until n).map(i => lit(null).cast("string").as(i.toString)): _*))
      toksed
        .select(col(idCol),
          explode(when(size(col("toks")) >= n, zipped)
            .otherwise(fallback)).as("_g"))
        .select(col(idCol), concat_ws(" ",
          (0 until n).map(i => col("_g").getField(i.toString)): _*)
          .as(gramCol))
    }
  }

  /** (id, shingle) rows with the token array materialized in its own
    * projection so the shingle lambda reads an attribute.
    */
  def shingleRows(df: DataFrame, idCol: String, textCol: String): DataFrame =
    ngramRows(df, idCol, textCol, 3, gramCol = "shingle")

  /** MinHash universe: signatures are affine permutations of ONE md5-
    * derived base hash per shingle — `sig_j = min (a_j·h + b_j) mod P` —
    * the classic k-permutation scheme. One md5 per shingle total (not
    * k), and the k mins are plain integer aggregates with map-side
    * partial aggregation: the shuffle carries exactly one row of k longs
    * per document, regardless of document length.
    */
  val MinhashP: Long = 2147483647L   // Mersenne prime 2^31-1
  private val Two31 = 2147483648L
  val MinhashA = Seq(1000003L, 1000333L, 1001467L, 1002343L,
    1003141L, 1004077L, 1005007L, 1006003L)
  val MinhashB = Seq(12345L, 54321L, 98765L, 13579L,
    24680L, 86420L, 97531L, 11111L)

  /** One row per doc with columns sig0..sig{k-1} (k ≤ 8). */
  def minhashSigTable(df: DataFrame, idCol: String, textCol: String,
                      k: Int): DataFrame = {
    require(k <= MinhashA.size, s"at most ${MinhashA.size} permutations")
    // (r14: spreading the md5-per-shingle work with a pre-tokenize
    // round-robin repartition was measured and REVERTED — 0.65 ->
    // 0.94 s isolated; at this corpus size the exchange + task fan-out
    // costs more than the single-split scan it relieves.)
    val base = shingleRows(df, idCol, textCol)
      .select(col(idCol),
        (Hashing.hash64(col("shingle"), 0) % Two31).as("h"))
    val sigAggs = (0 until k).map(j =>
      min((col("h") * MinhashA(j) + MinhashB(j)) % MinhashP).as(s"sig$j"))
    base.groupBy(col(idCol)).agg(sigAggs.head, sigAggs.tail: _*)
  }

  /** LSH banding: `bands` buckets per doc, each hashing `rowsPerBand`
    * consecutive signature values. Output long form:
    * (id, band, band_hash) — ready for a bucket self-join. Signatures
    * are materialized attributes after the aggregate, so band hashing
    * never recomputes them.
    */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
                   bands: Int, rowsPerBand: Int): DataFrame = {
    val sigs = minhashSigTable(df, idCol, textCol, bands * rowsPerBand)
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand)
        .map(r => col(s"sig${b * rowsPerBand + r}").cast("string"))
      struct(lit(b).as("band"),
        md5(concat_ws("_", slice: _*).cast("binary")).as("band_hash"))
    }
    sigs.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"),
        col("bb.band_hash").as("band_hash"))
  }

  /** All (a<b) pairs from an array column of ids. */
  private def pairsOf(ids: Column): Column =
    filter(
      flatten(transform(ids, x => transform(ids, y =>
        struct(x.as("id_a"), y.as("id_b"))))),
      p => p.getField("id_a") < p.getField("id_b"))

  /** Candidate near-duplicate pairs: docs sharing any LSH band bucket.
    *
    * Shape: bands → group by (band, band_hash) collecting member lists →
    * emit each bucket's (a<b) pairs → distinct. One pass over the
    * signature subtree (a self-join would plan and execute it twice) and
    * one shuffle on the high-entropy bucket key (uniform → no skew). The
    * pair count is Σ|bucket|² — the LSH guarantee, not |docs|².
    */
  /** @param maxBucket degenerate-bucket guard: a bucket of k docs emits
    *   k² pairs, so one bucket of 10^6 identical documents would emit
    *   10^12 — buckets larger than the cap emit star pairs to their
    *   minimum id instead (O(k), sufficient to drop all members against
    *   one representative). Defaults ON (1000) — production-safe; exact
    *   oracles pass 0 explicitly to disable.
    */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            bands: Int = 4, rowsPerBand: Int = 2,
                            maxBucket: Int = DefaultMaxBucket): DataFrame = {
    val bb = minhashBands(df, idCol, textCol, bands, rowsPerBand)
    val buckets = bb.groupBy(col("band"), col("band_hash"))
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1)
    val pairsCol =
      if (maxBucket > 0) {
        // star pairs: rep (array_min) is an argument of array_repeat —
        // evaluated once per row, never inside a lambda (CSE contract)
        val star = filter(
          zip_with(array_repeat(array_min(col("ids")), size(col("ids"))),
            col("ids"), (r, x) => struct(r.as("id_a"), x.as("id_b"))),
          p => p.getField("id_a") < p.getField("id_b"))
        when(size(col("ids")) <= maxBucket, pairsOf(col("ids")))
          .otherwise(star)
      } else pairsOf(col("ids"))
    buckets
      .select(explode(pairsCol).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
  }

  /** The full near-dup dedup pipeline a training-data job runs:
    * LSH candidates ([[minhashCandidatePairs]]) → exact shingle-set
    * Jaccard verification on just those pairs (row-local
    * `array_intersect`, no inverted index needed at candidate volume) →
    * greedy drop of the higher id of each verified pair → surviving rows.
    *
    * Scale: verification work is |candidates| (LSH-bounded), not
    * |docs|²; the only shuffles are the LSH bucket group-by and two
    * joins keyed by doc id.
    */
  def nearDupSurvivors(df: DataFrame, idCol: String, textCol: String,
                       minJaccard: Double, bands: Int = 4,
                       rowsPerBand: Int = 2,
                       maxBucket: Int = DefaultMaxBucket): DataFrame = {
    // Candidate pairs are persisted: they are referenced three times
    // below (two id projections + the verification join), and each
    // reference would otherwise re-execute the whole signature subtree.
    // The pair list is tiny relative to the corpus (the LSH guarantee);
    // a production pipeline would checkpoint it to a table instead.
    val cand = minhashCandidatePairs(df, idCol, textCol, bands, rowsPerBand,
      maxBucket).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // verification gram sets are built ONLY for docs that appear in a
    // candidate pair (semi-join prune): after LSH, that is a small
    // fraction of the corpus — the shingle recompute for verification
    // scales with |candidates|, not |docs|
    val candDocs = cand.select(col("id_a").as(idCol))
      .union(cand.select(col("id_b").as(idCol))).distinct()
    // both verification sides read the gram sets; the barrier keeps the
    // (interpreted-HOF) shingle computation to one pass over the
    // candidate docs instead of one per side
    val gramSets = df
      .join(candDocs, Seq(idCol), "left_semi")
      .select(col(idCol).as("gid"), split(lower(col(textCol)), " ").as("toks"))
      .select(col("gid"), array_distinct(shinglesOf(col("toks"))).as("g"))
      .localCheckpoint(false)
    val verified = cand
      .join(gramSets.select(col("gid").as("id_a"), col("g").as("ga")), Seq("id_a"))
      .join(gramSets.select(col("gid").as("id_b"), col("g").as("gb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        (size(array_intersect(col("ga"), col("gb"))).cast("double") /
          (size(col("ga")) + size(col("gb"))
            - size(array_intersect(col("ga"), col("gb")))).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
    val dropped = verified.select(col("id_b").as(idCol)).distinct()
    df.join(dropped, Seq(idCol), "left_anti")
  }

  /** Incremental dedup: which documents of a NEW batch near-duplicate
    * the EXISTING corpus — the daily-crawl workflow, where re-running
    * corpus-wide dedup per batch would be quadratic in days. The
    * index's band table depends only on the index (at scale: computed
    * once, persisted bucketed by (band, band_hash)); the batch computes
    * bands for itself only and equi-joins — per-batch cost scales with
    * the batch, not the corpus. Collisions verify with exact shingle
    * Jaccard built ONLY for collided docs (the nearDupSurvivors prune).
    * Returns (batch_id, index_id, jaccard) pairs at or above
    * `minJaccard`.
    */
  def dedupAgainstIndex(index: DataFrame, batch: DataFrame, idCol: String,
                        textCol: String, minJaccard: Double,
                        bands: Int = 4, rowsPerBand: Int = 2): DataFrame =
    dedupAgainstBands(indexBandTable(index, idCol, textCol, bands,
      rowsPerBand), index, batch, idCol, textCol, minJaccard, bands,
      rowsPerBand)

  /** The persistable band table of a dedup index: (index_id, band,
    * band_hash) — what "computed once, persisted bucketed by
    * (band, band_hash)" stores. Grows by appending each new batch's
    * bands; no corpus re-scan ever.
    */
  def indexBandTable(index: DataFrame, idCol: String, textCol: String,
                     bands: Int = 4, rowsPerBand: Int = 2): DataFrame =
    minhashBands(index, idCol, textCol, bands, rowsPerBand)
      .select(col(idCol).as("index_id"), col("band"), col("band_hash"))

  /** [[dedupAgainstIndex]] against a PRECOMPUTED [[indexBandTable]] —
    * the true incremental form: per-batch work is the batch's own
    * signatures plus one equi-join against the stored band table, and
    * index texts are touched only for collided docs (semi-join prune),
    * so cost scales with the batch and its collisions, never with the
    * corpus.
    */
  def dedupAgainstBands(indexBands: DataFrame, index: DataFrame,
                        batch: DataFrame, idCol: String, textCol: String,
                        minJaccard: Double, bands: Int = 4,
                        rowsPerBand: Int = 2): DataFrame = {
    val ib = indexBands
      .select(col("index_id"), col("band"), col("band_hash"))
    val bb = minhashBands(batch, idCol, textCol, bands, rowsPerBand)
      .select(col(idCol).as("batch_id"), col("band"), col("band_hash"))
    // referenced three times (both semi-join prunes + the verify join);
    // without a barrier each reference re-derives BOTH band tables —
    // the checkpoint is the collided-pair list, ∝ collisions
    val cand = bb.join(ib, Seq("band", "band_hash"))
      .select(col("batch_id"), col("index_id")).distinct()
      .localCheckpoint(false)
    def gramSets(df: DataFrame, ids: DataFrame, as: String) = df
      .join(ids, Seq(idCol), "left_semi")
      .select(col(idCol).as(as),
        array_distinct(shingles(col(textCol))).as(s"g_$as"))
    val bg = gramSets(batch,
      cand.select(col("batch_id").as(idCol)).distinct(), "batch_id")
    val ig = gramSets(index,
      cand.select(col("index_id").as(idCol)).distinct(), "index_id")
    cand.join(bg, Seq("batch_id")).join(ig, Seq("index_id"))
      .select(col("batch_id"), col("index_id"),
        (size(array_intersect(col("g_batch_id"), col("g_index_id")))
          .cast("double") /
          (size(col("g_batch_id")) + size(col("g_index_id"))
            - size(array_intersect(col("g_batch_id"), col("g_index_id"))))
          .cast("double")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Connected components over a near-dup pair list: every doc that
    * appears in at least one pair gets a `cluster_id` = the minimum doc
    * id reachable through the pair graph. The pairwise greedy drop in
    * [[nearDupSurvivors]] handles A~B; this handles A~B~C where A and C
    * never paired directly — the transitive cluster a dedup job needs to
    * keep exactly one representative per group.
    *
    * Algorithm: alternating large-star/small-star contraction (Kiveris
    * et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    * O(log n) rounds on ANY graph, unlike min-label propagation's
    * O(diameter) (an adversarial near-dup chain at corpus scale would
    * make round count data-dependent). Each round:
    *   - large-star: every node links its LARGER neighbors to the
    *     minimum of its closed neighborhood — emit (v, m(u)) for
    *     v ∈ Γ(u), v > u, m(u) = min(Γ(u) ∪ {u});
    *   - small-star: every node links its smaller neighbors and itself
    *     to their minimum — per u over (hi=u, lo<u) edges, emit
    *     (v, m) for v ∈ N ∪ {u} \ {m}, m = min(N ∪ {u}).
    * Both keep every edge strictly (hi > lo), both are one group-by +
    * one join over the PAIR list — never the corpus — and the fixpoint
    * is the star forest (every node → its component min). Convergence
    * is checked by exact set equality of consecutive edge sets (count
    * + one-sided exceptAll — sound because both are distinct);
    * `localCheckpoint` truncates lineage so plans don't grow across
    * rounds. `maxIter` still bounds the loop: ⌈log₂ n⌉ + a few rounds
    * suffice, so the default 20 covers graphs to ~10⁵ nodes per
    * component and beyond.
    *
    * Returns (doc_id, cluster_id), one row per distinct doc in `pairs`
    * (self-pairs label themselves). If `maxIter` is exhausted before
    * the fixpoint, labels are the best-known minimum (still a valid
    * clustering refinement, possibly not fully transitive).
    */
  def connectedComponents(pairs: DataFrame,
                          idACol: String = "id_a", idBCol: String = "id_b",
                          maxIter: Int = 20): DataFrame =
    connectedComponentsStats(pairs, idACol, idBCol, maxIter)._1

  /** [[connectedComponents]] plus the number of star rounds executed —
    * the observable the O(log n) convergence spec pins. */
  def connectedComponentsStats(pairs: DataFrame,
                               idACol: String = "id_a",
                               idBCol: String = "id_b",
                               maxIter: Int = 20): (DataFrame, Int) = {
    val ids = pairs.select(col(idACol).as("doc_id"))
      .union(pairs.select(col(idBCol).as("doc_id")))
      .distinct()
      .localCheckpoint(false)
    var e = pairs
      .select(greatest(col(idACol), col(idBCol)).as("hi"),
        least(col(idACol), col(idBCol)).as("lo"))
      .filter(col("hi") =!= col("lo"))
      .distinct()
      .localCheckpoint(true)
    var eCount = e.count()
    var converged = eCount == 0
    var i = 0
    while (!converged && i < maxIter) {
      // large-star: neighborhoods in both directions, larger neighbors
      // re-point at the closed-neighborhood minimum
      val nbrs = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = nbrs.groupBy(col("u")).agg(min(col("v")).as("mv"))
      val e1 = nbrs.join(mins, Seq("u"))
        .filter(col("v") > col("u"))
        .select(col("v").as("hi"), least(col("u"), col("mv")).as("lo"))
        .distinct()
        .localCheckpoint(true) // read by both small-star passes
      // small-star: per hi, all (strictly smaller) members re-point at
      // the group minimum, hi itself included
      val mins2 = e1.groupBy(col("hi")).agg(min(col("lo")).as("m"))
        .localCheckpoint(true) // read by part1's join and as part2
      val next = e1.join(mins2, Seq("hi"))
        .filter(col("lo") =!= col("m"))
        .select(col("lo").as("hi"), col("m").as("lo"))
        .union(mins2.select(col("hi"), col("m").as("lo")))
        .distinct()
        .localCheckpoint(true)
      val nextCount = next.count()
      converged = nextCount == eCount && next.exceptAll(e).isEmpty
      e = next
      eCount = nextCount
      i += 1
    }
    val labels = e.groupBy(col("hi").as("doc_id"))
      .agg(min(col("lo")).as("cluster_id"))
    (ids.join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id")),
      i)
  }

  /** Incremental connected-components maintenance — the CLUSTER
    * complement of [[dedupAgainstIndex]]: fold a new batch of near-dup
    * edges into stored components without recomputing the closure over
    * history. Key invariant: a stored `cluster_id` is the component's
    * MINIMUM doc id, so projecting each batch endpoint onto its current
    * representative (unknown nodes map to themselves) yields a
    * batch-sized graph whose component minima are exactly the merged
    * components' true minima — min over {cluster minima ∪ new ids} =
    * min over all member ids. The expensive star-contraction loop
    * therefore runs ONLY on the projected graph (∝ batch edges, never
    * ∝ |history|); the stored table is touched by exactly one
    * broadcast-sized relabel join (reps absent from the batch pass
    * through unchanged) — the plan-shape claim `DedupPropertySpec`
    * pins. Result: (doc_id, cluster_id) over stored docs ∪ batch docs,
    * bit-identical to a full [[connectedComponents]] recompute on the
    * union of all edges ever seen.
    */
  def incrementalComponents(components: DataFrame, batchPairs: DataFrame,
                            idACol: String = "id_a",
                            idBCol: String = "id_b",
                            maxIter: Int = 20): DataFrame = {
    // referenced three times: both endpoint projections + the final
    // relabel join / anti-join
    val comp = components.select(col("doc_id"), col("cluster_id"))
      .localCheckpoint(false)
    def rep(side: String) = comp.select(col("doc_id").as(side),
      col("cluster_id").as(s"__r_$side"))
    val projected = batchPairs
      .select(col(idACol).as("a"), col(idBCol).as("b"))
      .join(rep("a"), Seq("a"), "left")
      .join(rep("b"), Seq("b"), "left")
      .select(coalesce(col("__r_a"), col("a")).as("id_a"),
        coalesce(col("__r_b"), col("b")).as("id_b"))
    // O(log batch) star rounds over representatives ∪ new nodes only
    val relabel = connectedComponents(projected, "id_a", "id_b", maxIter)
      .localCheckpoint(false)
    val updatedOld = comp
      .join(relabel.select(col("doc_id").as("cluster_id"),
        col("cluster_id").as("__new")), Seq("cluster_id"), "left")
      .select(col("doc_id"),
        coalesce(col("__new"), col("cluster_id")).as("cluster_id"))
    val newNodes = relabel
      .join(comp.select(col("doc_id")), Seq("doc_id"), "left_anti")
    updatedOld.unionByName(newNodes)
  }

  // ---- SimHash --------------------------------------------------------

  /** Signature width. [[Hashing.hash64]] yields 60-bit values (15 hex
    * digits of md5), so 60 is the full usable entropy of the token hash;
    * it also keeps every `1L << j` term positive, which both Spark and
    * portable SQL sum without signed-overflow special cases. 60 = 4
    * bands × 15 bits → 32,768 bucket values per band, vs 256 for the
    * 8-bit bands a 32-bit signature would force (which degenerate into
    * huge buckets on any corpus with correlated vocabulary).
    */
  val SimhashBits = 60

  /** 60-bit SimHash over whitespace tokens: bit j of the result is set
    * when Σ_tokens (2·bit_j(hash(token)) − 1) > 0. Computed entirely with
    * array higher-order functions (aggregate over a 32-wide count vector)
    * — row-local, shuffle-free, codegen'd. Bit positions are unrolled at
    * plan-build time (Scala ints), so shifts are constant.
    */
  def simhash(text: Column): Column = {
    val toks = split(lower(text), " ")
    val counts = aggregate(
      toks,
      array_repeat(lit(0L), SimhashBits),
      (acc, t) => {
        val h = Hashing.hash64(t, 0)
        val tokenBits = array((0 until SimhashBits).map(j =>
          shiftright(h, j).bitwiseAND(1) * 2 - 1): _*)
        zip_with(acc, tokenBits, (a, b) => a + b)
      })
    (0 until SimhashBits).map(j =>
      when(element_at(counts, j + 1) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  /** Table-form SimHash: one md5 per token via explode, then 32 signed
    * bit-count sums with map-side partial aggregation — the same shape as
    * [[minhashSigTable]] and 2-3× cheaper than the per-row array
    * aggregate of [[simhash]] (kept for the expression-level API).
    * Returns (idCol, simhash).
    *
    * Contract: rows with null `textCol` are OMITTED from the output
    * (explode drops them), whereas the expression form returns them with
    * a null simhash — callers needing those rows should coalesce the
    * text column first.
    */
  def simhashTable(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Shape notes from measurement (sf0.1): the 60 bit expressions +
    // map-side partial aggregation over the raw token stream beat both
    // (a) a tf pre-aggregation (the extra 5M-row group-by costs more
    // than the expression work it saves, 1.4 s → 2.1 s on the pair
    // query) and (b) an explicit repartition for self-join exchange
    // reuse (1.4 s → 2.5 s). The pair query pays the signature subtree
    // once per join side by design — the lazy-plan tradeoff; a real
    // deployment checkpoints the signature table between stages.
    val toks = df.select(col(idCol),
      explode(split(lower(col(textCol)), " ")).as("t"))
      .select(col(idCol), Hashing.hash64(col("t"), 0).as("h"))
    val bitSums = (0 until SimhashBits).map(j =>
      sum(shiftright(col("h"), j).bitwiseAND(1) * 2 - 1).as(s"c$j"))
    val counts = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val assemble = (0 until SimhashBits).map(j =>
      when(col(s"c$j") > 0, lit(1L << j)).otherwise(lit(0L))).reduce(_ + _)
    counts.select(col(idCol), assemble.as("simhash"))
  }

  /** SimHash near-dup retrieval: band the signature into `bands` equal
    * bit slices and bucket docs by (band, slice value) — by the
    * pigeonhole principle, any pair within Hamming distance < `bands`
    * agrees on at least one full band, so recall at `maxHamming ≤
    * bands − 1` is 100%. Candidates are verified exactly with
    * `bit_count(sig_a XOR sig_b) <= maxHamming`.
    *
    * Pair generation is a self-equi-join on the (band, slice) key, not a
    * per-bucket `collect_list` + nested transform: a sort-merge join
    * streams arbitrarily large buckets through the shuffle machinery,
    * whereas materializing Σ|bucket|² pair structs inside single rows
    * dies on the first degenerate bucket (a 682-doc bucket is a 465k-
    * element array in ONE row; a 10⁶-doc bucket overflows the 2 GB row
    * limit outright). Both join sides are the same signature subtree —
    * tiny relative to the corpus (|docs|×bands fixed-width rows, no
    * text) — so Catalyst is free to broadcast one side or reuse the
    * exchange; recomputing it is one aggregate over the token stream,
    * not a second corpus pass of pair work. `maxBucket` is the
    * degenerate-bucket star-pair guard: oversized buckets emit only
    * (min-id, x) spanning pairs (0 disables — exact oracle semantics).
    *
    * Returns (id_a, id_b, hamming) with hamming as int.
    */
  def simhashBandPairs(df: DataFrame, idCol: String, textCol: String,
                       maxHamming: Int = 3, bands: Int = 4,
                       maxBucket: Int = DefaultMaxBucket): DataFrame = {
    require(bands >= 1 && SimhashBits % bands == 0,
      s"bands must divide $SimhashBits, got $bands")
    require(maxHamming < bands,
      s"recall guarantee needs maxHamming < bands ($maxHamming >= $bands)")
    val width = SimhashBits / bands
    val mask = (1L << width) - 1
    // both pair sides descend from the signature table; the 60-wide
    // HOF signature computation is the dominant compute and the
    // checkpoint is (id, long) — materialize once, not per side
    val sigs = simhashTable(df, idCol, textCol).localCheckpoint(false)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftright(col("simhash"), b * width).bitwiseAND(mask).as("band_val"))
    }
    val bb = sigs
      .select(col(idCol).as("id"), col("simhash"),
        explode(array(bandCols: _*)).as("bb"))
      .select(col("id"), col("simhash"),
        col("bb.band").as("band"), col("bb.band_val").as("band_val"))
    // Bucket stats ride the same (band, band_val) shuffle the join needs,
    // so the guard costs a sort within already-shuffled partitions, not
    // an extra exchange.
    val guarded = if (maxBucket > 0) {
      val w = Window.partitionBy(col("band"), col("band_val"))
      bb.withColumn("bsz", count(lit(1)).over(w))
        .withColumn("min_id", min(col("id")).over(w))
    } else bb
    val a = guarded.select(
      (Seq(col("band"), col("band_val"), col("id").as("id_a"),
        col("simhash").as("sig_a")) ++
        (if (maxBucket > 0) Seq(col("bsz"), col("min_id")) else Nil)): _*)
    val b = guarded.select(col("band"), col("band_val"),
      col("id").as("id_b"), col("simhash").as("sig_b"))
    val joined = a.join(b, Seq("band", "band_val"))
      .filter(col("id_a") < col("id_b"))
    val kept =
      if (maxBucket > 0)
        joined.filter(col("bsz") <= maxBucket || col("id_a") === col("min_id"))
      else joined
    kept.select("id_a", "id_b", "sig_a", "sig_b")
      .distinct()
      .select(col("id_a"), col("id_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("int")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Cross-document repeated span detection — the substring-level dedup
    * diagnostic for training corpora (boilerplate, license blocks,
    * templated text recur VERBATIM across documents even when whole-doc
    * similarity is low). Every n-token window of every doc is emitted
    * once, then aggregated twice: (span, doc) with map-side partials,
    * then span → (distinct docs, total occurrences). Work and shuffle
    * are linear in corpus tokens (each token starts exactly one span);
    * both aggregates combine map-side, and no per-doc structure ever
    * exceeds the doc itself. Docs shorter than n tokens contribute no
    * spans (strict windows — no whole-doc fallback like [[ngramsOf]]).
    * At production scale the first aggregate would key on a 64-bit span
    * hash instead of the text; the text form keeps the operator
    * oracle-checkable and the output human-readable.
    *
    * Returns (span, n_docs, n_occ) for spans in >= minDocs documents.
    */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String, n: Int,
                     minDocs: Int = 2): DataFrame = {
    require(n >= 1, s"span length must be >= 1, got $n")
    // strict windows: docs shorter than n contribute no spans
    val spans = ngramRows(df, idCol, textCol, n, gramCol = "span",
      strict = true)
    spans.groupBy(col("span"), col(idCol))
      .agg(count(lit(1)).as("occ"))
      .groupBy(col("span"))
      .agg(count(lit(1)).as("n_docs"), sum(col("occ")).as("n_occ"))
      .filter(col("n_docs") >= minDocs)
  }

  /** Benchmark decontamination: corpus documents sharing any verbatim
    * n-token window with an evaluation set, with hit counts — the
    * pretraining-hygiene scan run before training on scraped data.
    * The benchmark side is DISTINCT grams and broadcast (eval suites
    * are thousands of docs; the corpus is the 100 TB side), so corpus
    * grams are filtered map-side by a broadcast semi-join as they
    * stream out of the scan — no corpus-sized shuffle; only the
    * (rare) hits reach the per-doc aggregate. Returns
    * (id, n_hit_grams distinct, n_hits total occurrences).
    */
  def contaminationReport(corpus: DataFrame, bench: DataFrame,
                          idCol: String, textCol: String,
                          n: Int): DataFrame = {
    val corpusGrams = ngramRows(corpus, idCol, textCol, n, strict = true)
    val benchGrams = ngramRows(bench, idCol, textCol, n, strict = true)
      .select(col("gram")).distinct()
    corpusGrams
      .join(broadcast(benchGrams), Seq("gram"), "left_semi")
      .groupBy(col(idCol))
      .agg(count_distinct(col("gram")).as("n_hit_grams"),
        count(lit(1)).as("n_hits"))
  }

  // ---- n-gram Jaccard -------------------------------------------------

  /** Exact Jaccard similarity over distinct word n-grams for candidate
    * pairs, via an inverted index (gram → postings list), never a cross
    * product: group by gram collecting (id, set-size) postings, emit each
    * posting list's (a<b) co-occurrence pairs, count pairs → intersection
    * size, then |A∪B| = na + nb − inter. The gram subtree is planned once
    * (a self-join would execute it twice).
    *
    * `candidates` restricts the pair space — in production the candidate
    * set comes from [[minhashCandidatePairs]]; here any predicate works.
    * `maxDf` drops grams whose posting list exceeds it (ultra-common
    * grams generate quadratic pairs while carrying no signal — the
    * standard skew guard; defaults ON (1000), exact oracles pass 0 to
    * disable).
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
                   candidates: Column, minJaccard: Double,
                   maxDf: Int = DefaultMaxBucket): DataFrame =
    gramPairCounts(df.filter(candidates), idCol, textCol, n, maxDf)
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)

  /** [[jaccardPairs]] keeping the integer evidence: (id_a, id_b, na,
    * nb, inter, jaccard) — set sizes and intersection count alongside
    * the score. The exact-integer columns let downstream operators
    * derive engine-portable edge weights (e.g. the union size
    * `na + nb - inter` as a shortest-path cost) with no float in the
    * comparison path.
    */
  def jaccardPairsCounts(df: DataFrame, idCol: String, textCol: String,
                         n: Int, candidates: Column, minJaccard: Double,
                         maxDf: Int = DefaultMaxBucket): DataFrame =
    gramPairCounts(df.filter(candidates), idCol, textCol, n, maxDf)
      .withColumn("jaccard",
        col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= minJaccard)

  /** Exact containment `|A∩B| / min(|A|,|B|)` over distinct word n-grams
    * — the asymmetric partial-duplicate measure Jaccard misses: a short
    * document wholly embedded in a long one scores containment 1.0 but
    * Jaccard ≈ |short|/|long|. Same inverted-index pair generation as
    * [[jaccardPairs]] (shared via [[gramPairCounts]]), same `maxDf` skew
    * guard; the division is a single exactly-rounded IEEE op, so the
    * score is bit-portable with no rounding step.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int, candidates: Column, minContainment: Double,
                       maxDf: Int = DefaultMaxBucket): DataFrame =
    gramPairCounts(df.filter(candidates), idCol, textCol, n, maxDf)
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          least(col("na"), col("nb")).cast("double"))
          .as("containment"))
      .filter(col("containment") >= minContainment)

  /** Shared inverted-index pair counting: (id_a < id_b, na, nb, inter)
    * over distinct word n-grams. Group by gram collecting (id, set-size)
    * postings, emit each posting list's co-occurrence pairs, count pairs
    * → intersection size. The gram subtree is planned once (a self-join
    * would execute it twice).
    */
  /** Prefix-filtered exact Jaccard join (the PPJoin/AllPairs candidate
    * rule, Bayardo et al. / Xiao et al.): identical OUTPUT to
    * [[jaccardPairs]], but candidate pairs come only from the PREFIX of
    * each gram set — its first |g| − ⌈t·|g|⌉ + 1 grams in the global
    * (document-frequency asc, gram) order. Two sets with Jaccard ≥ t
    * must overlap in ≥ ⌈t/(1+t)·(|a|+|b|)⌉ grams, which forces at
    * least one shared gram into both prefixes — so the filter has NO
    * false negatives and the result stays exact while the inverted
    * index shrinks from every posting to prefix postings. At t = 0.8
    * that is ~20 % of the postings and candidate volume falls
    * quadratically with posting-list length; rare-first ordering
    * additionally puts the surviving postings on the SHORTEST lists
    * (the whole point of df-ascending order).
    *
    * Shape: one dfreq aggregate (reused as the global order key — no
    * materialized rank table, no global row numbering), a per-doc
    * window for the prefix cut, the prefix-postings self-join, then a
    * verify join against the full sorted gram arrays (`array_intersect`
    * on candidates only). The gram-set table is lazily checkpointed —
    * referenced by dfreq, the prefix explode, and both verify sides.
    */
  def jaccardPairsPrefix(df: DataFrame, idCol: String, textCol: String,
                         n: Int, candidates: Column, minJaccard: Double,
                         maxDf: Int = DefaultMaxBucket): DataFrame = {
    require(minJaccard > 0 && minJaccard <= 1,
      s"prefix filtering needs a positive threshold, got $minJaccard")
    val withG = df.filter(candidates)
      .select(col(idCol).as("id"),
        array_sort(array_distinct(
          ngramsOf(split(lower(col(textCol)), " "), n))).as("g"))
      .withColumn("sz", size(col("g")))
      .localCheckpoint(false)
    val entries = withG.select(col("id"), col("sz"),
      explode(col("g")).as("gram"))
    val dfreq = entries.groupBy(col("gram")).agg(count(lit(1)).as("gdf"))
    val capped =
      if (maxDf > 0) dfreq.filter(col("gdf") <= maxDf) else dfreq
    // prefix length |g| − ⌈t·|g|⌉ + 1; ceil in exact integer arithmetic
    // over the scaled threshold so the cut is engine-independent.
    // FLOOR the scaling: ts/1e6 ≤ t keeps the computed prefix a
    // superset of the exact rule's — never a false negative
    val tScaled = math.floor(minJaccard * 1000000L).toLong
    val prefLen = col("sz") -
      ((col("sz") * tScaled + 999999L) / 1000000L).cast("long") + 1
    val w = Window.partitionBy(col("id")).orderBy(col("gdf"), col("gram"))
    val prefix = entries.join(capped, Seq("gram"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= prefLen)
      .select(col("id"), col("gram"))
    val cand = prefix.select(col("gram"), col("id").as("id_a"))
      .join(prefix.select(col("gram"), col("id").as("id_b")), Seq("gram"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).distinct()
    cand
      .join(withG.select(col("id").as("id_a"), col("g").as("ga"),
        col("sz").as("na")), Seq("id_a"))
      .join(withG.select(col("id").as("id_b"), col("g").as("gb"),
        col("sz").as("nb")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("ga"), col("gb"))))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo's merge/purge):
    * candidate record pairs are rows within `window` positions of each
    * other in the sort order of a fuzzy blocking key — the classic
    * entity-resolution complement to the equality blocking above
    * (minhash/simhash catch token overlap; sorted order catches
    * typo-adjacent keys that share a PREFIX, e.g. misspelled names
    * sorting next to their correction).
    *
    * Distributed form: the sort is WITHIN blocks (`blockOf(key)` — e.g.
    * a key prefix), never global, so ranking is a by-block window and
    * pairing is `lead(i)` over the same window — the candidate set is
    * block-local positions ≤ `window` apart, emitted row-locally with
    * no self-join (a rank-range self-join would re-shuffle the ranked
    * table; `lead` reuses the one sort). Records in different blocks
    * are never compared — the standard recall trade, mitigated in
    * practice by multi-pass runs with different keys.
    *
    * Output: (id_a, id_b, key_a, key_b) candidate pairs, id_a = the
    * sort-order earlier record. Ties in the blocking key are ordered by
    * id — total order, engine-portable.
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, keyCol: String,
                              blockOf: Column => Column,
                              window: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val base = df.select(col(idCol).as("id_a"), col(keyCol).as("key_a"),
      blockOf(col(keyCol)).as("__blk"))
    val w = Window.partitionBy(col("__blk"))
      .orderBy(col("key_a"), col("id_a"))
    val withLeads = (1 to window).foldLeft(base) { (acc, i) =>
      acc.withColumn(s"__n$i",
        lead(struct(col("id_a").as("id"), col("key_a").as("key")), i).over(w))
    }
    withLeads
      .select(col("id_a"), col("key_a"),
        explode(filter(
          array((1 to window).map(i => col(s"__n$i")): _*),
          n => n.isNotNull)).as("__nb"))
      .select(col("id_a"), col("__nb.id").as("id_b"),
        col("key_a"), col("__nb.key").as("key_b"))
  }

  private def gramPairCounts(df: DataFrame, idCol: String, textCol: String,
                             n: Int, maxDf: Int): DataFrame = {
    // tokens materialized first — see shinglesOf's perf contract. The
    // gram array feeds explode ONCE; referencing it from a second
    // expression (size) in the same projection planned as a
    // multi-second interpreted Project (HOFs have no codegen) — set
    // sizes are recovered from the exploded postings instead.
    val withToks = df
      .select(col(idCol).as("id"), split(lower(col(textCol)), " ").as("toks"))
    val grams = array_distinct(ngramsOf(col("toks"), n))
    val exploded = withToks
      .select(col("id"), explode(grams).as("gram"))
    // |gram set| per doc: grams are distinct, so a count-over-window on
    // the exploded rows — attaches ng without ever re-evaluating the
    // (interpreted, HOF-heavy) grams subtree or re-referencing the array.
    val withNg = exploded.withColumn("ng",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("id"))))
    val postings = withNg
      .groupBy(col("gram"))
      .agg(collect_list(struct(col("id"), col("ng"))).as("docs"))
    val capped =
      if (maxDf > 0) postings.filter(size(col("docs")) <= maxDf) else postings
    capped
      .filter(size(col("docs")) > 1)
      .select(explode(filter(
        flatten(transform(col("docs"), a => transform(col("docs"), b =>
          struct(a.getField("id").as("id_a"), b.getField("id").as("id_b"),
            a.getField("ng").as("na"), b.getField("ng").as("nb"))))),
        p => p.getField("id_a") < p.getField("id_b"))).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"),
        col("p.na").as("na"), col("p.nb").as("nb"))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
  }
}
