package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** String similarity self-join: all pairs within Levenshtein distance
  * `maxDist`, with zero recall loss.
  *
  * Two candidate generators, both exact-recall, both pure equi-joins
  * (no theta join, no BroadcastNestedLoopJoin anywhere):
  *
  * - [[selfJoin]] — length-band blocking: edit distance ≤ d implies
  *   |len(a) − len(b)| ≤ d, so the probe side emits 2d+1 candidate
  *   lengths and joins the anchor's own length. Simple, but candidates
  *   are ALL pairs inside a length band: as the table grows, band
  *   occupancy grows linearly and candidates quadratically (measured
  *   20× cost for 10× rows at sf0.01→0.1). The small-N baseline.
  *
  * - [[segmentJoin]] — PassJoin-style segment blocking (pigeonhole
  *   scheme of Li, Deng & Feng, "PASS-JOIN: a partition-based method
  *   for similarity joins", PVLDB 2011): partition every string into
  *   d+1 contiguous segments; if dist(a,b) ≤ d, the d edits cannot
  *   touch all d+1 segments of b, so a contains at least one of b's
  *   segments EXACTLY, starting within ±d of its position in b. The
  *   index side emits its d+1 segments, the probe side emits the
  *   substrings that could match a segment of a partner of each
  *   feasible length at each feasible position (a constant ≤
  *   (2d+1)·(d+1)·(2d+1) fan-out), and candidates are the equi-join on
  *   (partner-length, segment-index, content). Candidates scale with
  *   the number of near-matches, not with band density² — the 100 TB
  *   path.
  *
  * Verification is the bounded `levenshtein(a, b, d)` form: banded DP,
  * O(d·len) per candidate with early exit.
  */
object EditDistJoin {

  /** Pairs (id_a < id_b) with `minDist ≤ levenshtein ≤ maxDist`.
    * Output columns: id_a, id_b, dist.
    */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
               maxDist: Int, minDist: Int = 0): DataFrame = {
    require(maxDist >= 0 && minDist >= 0 && minDist <= maxDist,
      "need 0 <= minDist <= maxDist")
    val anchor = df.select(col(idCol).as("id_a"), col(strCol).as("s_a"),
      length(col(strCol)).as("len_key"))
    val probe = df.select(col(idCol).as("id_b"), col(strCol).as("s_b"),
        explode(sequence(length(col(strCol)) - maxDist,
          length(col(strCol)) + maxDist)).as("len_key"))
    verified(anchor.join(probe, Seq("len_key"))
      .filter(col("id_a") < col("id_b")), maxDist, minDist)
  }

  /** PassJoin-partition parameters for a string of length `L` split
    * into `k` segments: segment `i` (0-based) has length
    * `L div k` (+1 for the last `L mod k` segments) and 0-based start
    * `i·(L div k) + max(0, i − (k − L mod k))`.
    */
  private def segStart(L: Column, i: Int, k: Int): Column =
    lit(i) * (L.cast("int") / k).cast("int") +
      greatest(lit(0), lit(i) - (lit(k) - pmod(L, lit(k))))

  private def segLen(L: Column, i: Int, k: Int): Column =
    (L.cast("int") / k).cast("int") +
      when(lit(i) >= lit(k) - pmod(L, lit(k)), 1).otherwise(0)

  /** Same contract and output as [[selfJoin]], via segment blocking.
    * Strings shorter than maxDist+1 characters (which cannot host d+1
    * non-empty segments) are routed through a length-band leg over the
    * tiny short-string slice; every other pair comes from the segment
    * equi-join. Exact recall overall.
    */
  def segmentJoin(df: DataFrame, idCol: String, strCol: String,
                  maxDist: Int, minDist: Int = 0): DataFrame = {
    require(maxDist >= 1 && minDist >= 0 && minDist <= maxDist,
      "need 1 <= maxDist and 0 <= minDist <= maxDist")
    val k = maxDist + 1
    val d = maxDist
    val base = df.select(col(idCol).as("id"), col(strCol).as("s"),
      length(col(strCol)).as("L"))
    val long = base.filter(col("L") >= k)

    // index side: the d+1 segments of each string
    val segs = long.select(col("id"), col("s"), col("L"),
      explode(array((0 until k).map { i =>
        struct(lit(i).as("seg_i"),
          col("s").substr(segStart(col("L"), i, k) + 1,
            segLen(col("L"), i, k)).as("seg"))
      }: _*)).as("e"))
      .select(col("id"), col("s"), col("L"),
        col("e.seg_i"), col("e.seg"))

    // probe side: every substring that could equal segment seg_i of a
    // partner of length Lp ∈ [L−d, L+d], at a start shift `sh` from the
    // segment's home position satisfying the exact alignment budget
    // |sh| + |Δ − sh| ≤ d (Δ = probeLen − partnerLen): the prefix must
    // absorb ≥|sh| edits, the suffix ≥|Δ−sh|, and with the segment
    // matched exactly they share the d budget — the PassJoin substring
    // selection, pruned statically over the (Δ, sh) literals (25 → 13
    // combos per segment at d=2). Emissions falling outside the probe
    // string are dropped, and duplicates dedup before the join.
    val combos = for {
      dl <- -d to d; i <- 0 until k; sh <- -d to d
      if math.abs(sh) + math.abs(dl + sh) <= d
    } yield (dl, i, sh)
    val probe = long.select(col("id"), col("s"), col("L"),
      explode(array(combos.map { case (dl, i, sh) =>
        val lp = col("L") + dl
        val st = segStart(lp, i, k) + sh // 0-based in the probe string
        val ln = segLen(lp, i, k)
        struct(lp.as("lp"), lit(i).as("seg_i"), st.as("st"), ln.as("ln"))
      }: _*)).as("e"))
      .filter(col("e.lp") >= k && col("e.st") >= 0 &&
        col("e.st") + col("e.ln") <= col("L"))
      .select(col("id"), col("s"), col("e.lp").as("L_idx"),
        col("e.seg_i").as("seg_i"),
        col("s").substr(col("e.st") + 1, col("e.ln")).as("seg"))
      // dedup duplicate (id, Lp, seg_i, content) emissions before the
      // join: repeated-char shifts produce identical substrings, and
      // at sf0.1 skipping this shuffle measured 1.8× slower overall
      // (duplicate join hits inflate the candidate distinct)
      .distinct()

    // a pair within d is found in BOTH role assignments (the invariant
    // is symmetric), so keeping probe.id < index.id loses nothing
    val candidates = probe.alias("p")
      .join(segs.alias("x"),
        col("p.L_idx") === col("x.L") && col("p.seg_i") === col("x.seg_i")
          && col("p.seg") === col("x.seg") && col("p.id") < col("x.id"))
      .select(col("p.id").as("id_a"), col("p.s").as("s_a"),
        col("x.id").as("id_b"), col("x.s").as("s_b"))
      .distinct()

    // short-string leg: any pair involving a string with < k chars has
    // both sides ≤ 2d chars; run the band join with the short side
    // anchored so the legs partition the pair space (min-side < k here,
    // both ≥ k above)
    val shorts = base.filter(col("L") < k)
      .select(col("id").as("sid"), col("s").as("ss"),
        col("L").as("len_key"))
    val partners = base.filter(col("L") <= 2 * d)
      .select(col("id").as("pid"), col("s").as("ps"),
        explode(sequence(col("L") - d, col("L") + d)).as("len_key"))
    val shortPairs = shorts.join(partners, Seq("len_key"))
      .filter(col("sid") =!= col("pid"))
      .select(least(col("sid"), col("pid")).as("id_a"),
        when(col("sid") < col("pid"), col("ss")).otherwise(col("ps"))
          .as("s_a"),
        greatest(col("sid"), col("pid")).as("id_b"),
        when(col("sid") < col("pid"), col("ps")).otherwise(col("ss"))
          .as("s_b"))
      .distinct()

    verified(candidates.unionByName(shortPairs), maxDist, minDist)
  }

  /** [[segmentJoin]] lifted to the DISTINCT value domain — the form
    * that survives duplicated strings. The row-level join verifies the
    * same (value_a, value_b) combination n_a·n_b times and enumerates
    * C(n_v, 2) identical-string candidates per value only to discard
    * them when `minDist ≥ 1`; with heavy duplication (a part-name
    * domain of 64 values over 20 k rows, or any production catalog)
    * that is almost all of the work. Here the segment machinery runs
    * once per distinct VALUE (the string is its own id — `<` is
    * lexicographic, which is all the pairing needs), the value-pair
    * relation — bounded by |values|², usually broadcast-sized — maps
    * back to row ids by two equi-joins, and identical-value row pairs
    * are emitted directly from the duplicate groups when `minDist = 0`
    * (they ARE the output there, never candidates to verify). Output
    * contract identical to [[segmentJoin]]: (id_a < id_b, dist),
    * each pair once.
    */
  def segmentJoinDistinct(df: DataFrame, idCol: String, strCol: String,
                          maxDist: Int, minDist: Int = 0): DataFrame = {
    val rows = df.select(col(idCol).as("__rid"), col(strCol).as("__rs"))
    // segmentJoin references its input 4× (segments, probe, two
    // short-string legs); without a barrier each reference re-runs the
    // DISTINCT shuffle. The checkpoint is |values| rows.
    val vals = rows.select(col("__rs").as("v")).distinct()
      .localCheckpoint(false)
    val valPairs = segmentJoin(vals, "v", "v", maxDist, math.max(minDist, 1))
      .select(col("id_a").as("__va"), col("id_b").as("__vb"), col("dist"))
    val expanded = valPairs
      .join(rows.select(col("__rid").as("__ida"), col("__rs").as("__va")),
        Seq("__va"))
      .join(rows.select(col("__rid").as("__idb"), col("__rs").as("__vb")),
        Seq("__vb"))
      .select(least(col("__ida"), col("__idb")).as("id_a"),
        greatest(col("__ida"), col("__idb")).as("id_b"), col("dist"))
    if (minDist > 0) expanded
    else {
      // dist-0 pairs: all row pairs inside each duplicated value, via a
      // value-keyed self-equi-join — C(n,2) output is inherent (these
      // ARE the result rows), but the join spreads a hot value's pairs
      // across tasks (AQE skew-split), where a grouped array emission
      // would build all of them inside ONE row
      val dups = rows.select(col("__rs"), col("__rid").as("id_a"))
        .join(rows.select(col("__rs"), col("__rid").as("id_b")),
          Seq("__rs"))
        .filter(col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"), lit(0).as("dist"))
      expanded.unionByName(dups)
    }
  }

  private def verified(pairs: DataFrame, maxDist: Int,
                       minDist: Int): DataFrame =
    pairs
      // bounded form: banded DP, O(maxDist·len) per pair with early
      // exit, returns -1 above the bound — which minDist >= 0 excludes
      .withColumn("dist", levenshtein(col("s_a"), col("s_b"), maxDist))
      .filter(col("dist") >= minDist && col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
}
