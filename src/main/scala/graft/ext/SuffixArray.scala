package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed suffix-array construction over the corpus token stream,
  * and the LCP (longest-common-prefix) tier built on it (builder brief
  * + SURVEY §7.4 dedup tier; beyond-reference) — the exact
  * substring-level dedup primitive for training corpora (Lee et al.
  * 2022, "Deduplicating Training Data Makes Language Models Better",
  * builds precisely this structure to find verbatim repeats of ANY
  * length, where fixed-n span scans like [[Dedup.duplicateSpans]] must
  * pick n up front). [[substringDedup]] closes the paper's loop: the
  * ACTION step that drops high-duplication documents and excises the
  * repeated spans from the rest.
  *
  * The suffix set is per-document (a suffix runs from its start
  * position to the END OF ITS DOCUMENT, never across documents — the
  * concatenate-with-unique-separators formulation collapses to this),
  * ordered globally and lexicographically by token sequence with
  * (doc, pos) as the deterministic tie-break between identical
  * suffixes.
  *
  * Scale design — why prefix doubling and not "sort the suffixes":
  * materializing each suffix for a direct sort ships O(total²/docs)
  * token bytes through the exchange (every token appears in every
  * suffix that covers it — ~50× blow-up even at this corpus's ~100
  * token docs, unbounded at book-length docs). Prefix doubling never
  * materializes a suffix: each round carries ONE constant-width row
  * per position (doc, pos, rank) and refines ranks by pairing each
  * position's rank with the rank 2^j positions ahead — after round j,
  * ranks order suffixes by their first 2^(j+1) tokens, so
  * ceil(log2 L) rounds finish, where L is the LONGEST DOCUMENT's
  * token count (not the corpus length — per-doc suffixes cap the
  * horizon a comparison can need). Each round is a constant number of
  * linear shuffles: one equi-join on (doc, pos) against the round's
  * shifted ranks, one distinct on (rank, rank'), one range-partitioned
  * sort of the distinct pairs, one join back. Rank assignment is the
  * repo's distributed-rank idiom (sorted `zipWithIndex` over
  * per-partition offsets — [[graft.io.ZoneMap.zoneAudit]]), NEVER a
  * single-partition `Window.orderBy`: the sort stays range-partitioned
  * across the cluster. At 100 TB this is log2(doc tokens) ≈ 17 rounds
  * of linear shuffles for megabyte documents — the same O(n log L)
  * sort-rounds class as TeraSort.
  *
  * Cost classes in the LCP tier (stated honestly; the round-13 review
  * caught an earlier docstring claiming "nothing quadratic
  * materializes" in aggregate):
  *  - [[build]]: constant-width rows throughout — O(n) rows ×
  *    O(log L) rounds, plus one O(n · W) round-0 key sort.
  *  - [[repeatedSpans]] / [[longestRepeat]] at the default unbounded
  *    `maxLcp`: the adjacency scan attaches each suffix's token slice,
  *    so per ROW the payload is bounded by its document's length but
  *    in AGGREGATE the two shuffles carry O(Σ_doc len²) ≈ O(n · L)
  *    token bytes — fine at ~100-token docs (the [[Dedup
  *    .duplicateSpans]] class at n = L), NOT at book-length docs.
  *    Pass a finite `maxLcp` to cap the payload at O(n · maxLcp)
  *    constant-width rows; reported lcp/span then truncate at the
  *    horizon (the ≥ minLcp DECISION stays exact for maxLcp ≥ minLcp).
  *  - [[duplicatedTokenStats]] / [[substringDedup]]: always run the
  *    scan at horizon = minLcp, because the coverage measure is
  *    HORIZON-INVARIANT (proof at [[duplicatedTokenStats]]) — the
  *    whole decision tier is O(n · minLcp), the same
  *    constant-width-row class as the builder.
  */
object SuffixArray {

  /** Build metadata beside the array itself — the knobs the scale
    * story rests on, measured instead of asserted: `rounds` is the
    * number of doubling rounds actually run (ceil(log2(maxDocLen /
    * prefixWidth)) worst case, fewer when every rank separates early),
    * `prefixWidth` the round-0 key width used (the auto-picked value
    * when [[build]]'s default 0 was passed).
    */
  final case class SaBuild(sa: DataFrame, prefixWidth: Int, rounds: Int,
                           maxDocLen: Long, nSuffixes: Long,
                           distinctRanks: Long)

  /** Round-0 key width from a corpus length percentile — replaces the
    * round-13 hand-picked 16. Cost model: round-0 ships W tokens of
    * sort key per suffix row through ONE range-partitioned sort (short
    * suffixes pay only their own length — the slice stops at the doc
    * end), and starting at h = W saves log2(W) doubling rounds, each
    * ~3 linear shuffles. W ≈ p50/2 makes round 0 fully order the back
    * half of every typical document's suffixes, and the measured ×1
    * rounds-vs-width table (scale_bench `sa_build_w4..w32`: 36.5 /
    * 26.6 / 22.5 / 15.7 s at w = 4/8/16/32, rounds 5/4/3/2 on the
    * p50 ≈ 55 corpus) shows each halved round count beating the added
    * key bytes all the way out to the cap — wider keys are nearly
    * free on short docs precisely because the slice truncates at the
    * doc end. The floor 4 keeps tiny-doc corpora from paying width
    * they can't use; the cap 32 stops book-length corpora paying
    * LINEAR key bytes for rounds that are only LOGARITHMIC in wall
    * (the long-doc bench runs at the cap).
    */
  def autoPrefixWidth(p50DocLen: Long): Int = {
    val target = math.max(1L, (p50DocLen + 1) / 2)
    var w = 4
    while (w < 32 && w < target) w *= 2
    w
  }

  /** Reuse barrier for the builder's large intermediates: a
    * materialized columnar cache (compressed batches, a fraction of
    * deserialized row blocks for token-array payloads) whose LINEAGE
    * STAYS INTACT — an evicted or lost block recomputes. The first cut
    * used `localCheckpoint` here like the repo's smaller operators and
    * the ×100 scale cell (10.8M suffixes in one JVM) found the
    * documented localCheckpoint caveat the hard way: truncated lineage
    * plus the context cleaner collecting the now-unreachable parent
    * shuffle = FetchFailed with no recompute path, a dead job. Callers
    * unpersist each barrier as soon as its successor is materialized.
    */
  private def barrier(df: DataFrame): DataFrame = {
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    p.count()
    p
  }

  /** Rebase a persisted barrier onto its own cached RDD, replacing the
    * Catalyst plan with one LogicalRDD node. Catalyst plans are TREES
    * (no subtree sharing): in the doubling loop each round's plan
    * embeds the previous round's TWICE (the rank self-join), so with
    * lineage-intact barriers alone the driver-side plan grows
    * 2^rounds nodes — invisible at this corpus's 3 rounds, fatal at
    * the long-doc bench's 8-11 rounds (measured: the driver spent
    * 15+ min inside AQE plan-string generation and OOM'd before
    * round 5). The cached RDD's dependency DAG shares nodes, so the
    * recompute path stays LINEAR in rounds and a lost or evicted
    * block still recomputes (the property [[barrier]] exists for;
    * `localCheckpoint` would lose it). Cost: the LogicalRDD hides the
    * barrier's hash partitioning from EnsureRequirements, so each
    * round pays its equi-join shuffles explicitly instead of reusing
    * the parent's exchange — a constant factor on the round's
    * already-linear shuffle bill, paid to keep driver planning O(1)
    * per round.
    */
  private def cutPlan(p: DataFrame): DataFrame =
    p.sparkSession.createDataFrame(p.rdd, p.schema)

  /** Attach a 0-based global rank (dense over rows, so callers wanting
    * key-dense ranks pass DISTINCT rows) by a range-partitioned sort +
    * `zipWithIndex` — per-partition offsets, no single-partition
    * funnel. Deterministic because callers sort by a total order.
    */
  private def rankBySort(df: DataFrame, sortCols: Seq[Column],
                         rankCol: String): DataFrame = {
    val sorted = df.sort(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+
      StructField(rankCol, LongType, nullable = false))
    df.sparkSession.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (row, i) =>
        Row.fromSeq(row.toSeq :+ i)
      }, schema)
  }

  /** The suffix array: (sa_rank, idCol, pos) — `sa_rank` is the
    * suffix's 0-based position in the lexicographic order of ALL
    * corpus suffixes (token-sequence order; ties between identical
    * suffixes broken by (idCol, pos)), `pos` the 0-based token offset
    * of the suffix's start in its document.
    *
    * `prefixWidth` = 0 (the default) derives the round-0 key width
    * from the corpus itself via [[autoPrefixWidth]] on the median
    * token count — one aggregate that rides the SAME pass that already
    * measures the longest document, so auto-width costs no extra scan.
    * The array's CONTENT is width-independent (any width yields the
    * identical order); width only moves work between the round-0 key
    * sort and the doubling rounds — see [[autoPrefixWidth]].
    *
    * Round 0 ranks each suffix by its first `prefixWidth` tokens
    * DIRECTLY — the slice is an array<string> sort key, and Spark's
    * array ordering (element-wise, shorter-prefix-first) is exactly
    * suffix order out to that horizon — so the doubling loop starts at
    * h = prefixWidth and runs log2(L / prefixWidth) rounds instead of
    * log2(L). Rounds also terminate early once every rank is unique
    * (all suffixes separated) — with real text that happens at h ≈ the
    * longest verbatim repeat, far below the longest document.
    *
    * The returned index is persisted (MEMORY_AND_DISK) with its
    * lineage INTACT and already counted, so every consumer (the LCP
    * scan, repeated readouts) reads the built structure instead of
    * replaying the final sort — and unlike the first cut's
    * `localCheckpoint`, a lost or evicted block recomputes instead of
    * killing the job on executor loss (the same caveat [[barrier]]
    * documents; an index is exactly the artifact that must survive a
    * long consumer job). Callers that loop builds (benchmarks) should
    * `unpersist()` the returned frame when done with it.
    */
  def build(df: DataFrame, idCol: String, textCol: String,
            prefixWidth: Int = 0): DataFrame =
    buildStats(df, idCol, textCol, prefixWidth).sa

  /** [[build]] plus the measured build metadata ([[SaBuild]]). */
  def buildStats(df: DataFrame, idCol: String, textCol: String,
                 prefixWidth: Int = 0): SaBuild = {
    require(prefixWidth >= 0,
      s"prefixWidth must be >= 1, or 0 for auto, got $prefixWidth")
    // one pass measures both the doubling horizon (max doc tokens) and
    // the auto-width driver (median doc tokens)
    val (maxLen, p50Len) = df
      .agg(max(size(TextAnalysis.tokens(col(textCol)))),
        percentile_approx(size(TextAnalysis.tokens(col(textCol))),
          lit(0.5), lit(10000))).head() match {
        case Row(null, _)         => (1L, 1L)
        case Row(n: Int, p: Int)  => (n.toLong, p.toLong)
      }
    val width =
      if (prefixWidth > 0) prefixWidth else autoPrefixWidth(p50Len)
    // one row per suffix: (id, pos, first-W-token slice); repartition
    // spreads the per-doc explode across the cluster even when the
    // source is a handful of input files
    // barriered: the slice explode is the single most expensive
    // narrow stage (O(tokens × W) array building) and three consumers
    // read it (the distinct-keys rank samples + sorts it, then the
    // rank join) — without the barrier it recomputes per consumer
    val prefP = barrier(df.repartition(col(idCol))
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        posexplode(transform(col("__toks"),
          (_, i) => slice(col("__toks"), i + 1, lit(width)))))
      .withColumnRenamed("col", "__pref")
      .withColumnRenamed("pos", "__pos"))
    val pref = cutPlan(prefP)
    // round 0: dense rank of the W-token prefix slices
    val keys0 = barrier(rankBySort(
      pref.select(col("__pref")).distinct(), Seq(col("__pref")), "__r"))
    // each round's working set is held as (persisted handle, plan-cut
    // view): the view keeps every downstream plan constant-size (see
    // [[cutPlan]]); the handle is what unpersist releases
    var posRankP = barrier(pref.join(keys0, "__pref")
      .select(col(idCol), col("__pos"), col("__r").as("__rank")))
    var posRank = cutPlan(posRankP)
    val nPos = posRankP.count()
    var distinctRanks = keys0.count()
    prefP.unpersist()
    keys0.unpersist()
    var h = width.toLong
    var rounds = 0
    while (h < maxLen && distinctRanks < nPos) {
      // rank 2^j ahead, -1 past the doc end (the shorter suffix is a
      // strict prefix of the longer → sorts first; -1 < every rank)
      val shifted = posRank.select(col(idCol),
        (col("__pos") - h).as("__pos"), col("__rank").as("__rnext"))
      val paired = posRank.join(shifted, Seq(idCol, "__pos"), "left")
        .select(col(idCol), col("__pos"), col("__rank").as("__r1"),
          coalesce(col("__rnext"), lit(-1L)).as("__r2"))
      val keys = barrier(rankBySort(
        paired.select(col("__r1"), col("__r2")).distinct(),
        Seq(col("__r1"), col("__r2")), "__nr"))
      distinctRanks = keys.count()
      val next = barrier(paired.join(keys, Seq("__r1", "__r2"))
        .select(col(idCol), col("__pos"), col("__nr").as("__rank")))
      posRankP.unpersist()
      keys.unpersist()
      posRankP = next
      posRank = cutPlan(next)
      h *= 2L
      rounds += 1
    }
    val sa = barrier(rankBySort(posRank,
        Seq(col("__rank"), col(idCol), col("__pos")), "sa_rank")
      .select(col("sa_rank"), col(idCol),
        col("__pos").cast("long").as("pos")))
    posRankP.unpersist()
    SaBuild(sa, width, rounds, maxLen, nPos, distinctRanks)
  }

  /** Token-level LCP of two token arrays: the count of leading
    * pairwise-equal tokens, stopping at the shorter length — the
    * native [[org.apache.spark.sql.graft.TokenLcpExpr]] (one codegen'd
    * loop, early break at the first mismatch; the interpreted
    * zip_with+aggregate HOF form it replaced always walked
    * min(|a|,|b|) and allocated a boolean array per pair).
    */
  def lcpLen(a: Column, b: Column): Column =
    graft.functions.native_fns.token_lcp(a, b)

  /** The LCP array beside the suffix array: (sa_rank, idCol, pos,
    * __sfx, lcp) — one row per suffix, `lcp` the longest common prefix
    * (in tokens) with the NEXT suffix in SA order (0 for the last),
    * both lcp and the attached `__sfx` slice capped at `maxLcp`.
    *
    * The adjacency join is a self equi-join on sa_rank (rank r with
    * rank r+1); suffix token slices are attached per side by a
    * docs-sized join. Cost: with `maxLcp` = ∞ the attached slice is
    * the WHOLE remaining suffix, so the two shuffles carry
    * O(Σ_doc len²) token bytes in aggregate — the blow-up [[build]]
    * exists to avoid, acceptable only at short docs. A finite `maxLcp`
    * attaches min(maxLcp + 1, remaining) tokens (the +1 lets callers
    * distinguish "lcp = maxLcp exactly" from "lcp ≥ maxLcp" never
    * mattering here because we cap the reported value), keeping the
    * scan at O(n · maxLcp) constant-width rows.
    */
  private def adjacentLcp(df: DataFrame, idCol: String, textCol: String,
                          maxLcp: Int): DataFrame = {
    require(maxLcp >= 1, s"maxLcp must be >= 1, got $maxLcp")
    val sa = build(df, idCol, textCol)
    val toksByDoc = df.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
    val sliceLen =
      if (maxLcp >= Int.MaxValue) size(col("__toks"))
      else least(size(col("__toks")), lit(maxLcp))
    val withSfx = sa.join(toksByDoc, idCol)
      .select(col("sa_rank"), col(idCol), col("pos"),
        slice(col("__toks"), col("pos") + 1, sliceLen).as("__sfx"))
    val next = withSfx.select((col("sa_rank") - 1L).as("sa_rank"),
      col("__sfx").as("__sfxb"))
    withSfx.join(next, Seq("sa_rank"), "left")
      .withColumn("lcp", when(col("__sfxb").isNull, 0L)
        .otherwise(lcpLen(col("__sfx"), col("__sfxb"))))
      .drop("__sfxb")
  }

  /** Verbatim repeated substrings of length >= `minLcp` tokens, found
    * the suffix-array way: adjacent suffixes in SA order share their
    * longest common prefix with SOME other suffix exactly when they
    * repeat — one LCP scan finds repeats of EVERY length at once.
    * Returns (sa_rank, idCol, pos, lcp, span): the left suffix of each
    * adjacent pair with lcp >= minLcp, `span` the repeated prefix.
    *
    * `maxLcp` (default unbounded) caps the attached-slice payload for
    * long-document corpora — see the class doc's cost table: the
    * WHICH-positions-repeat answer stays exact for any maxLcp >=
    * minLcp; reported lcp and span truncate at the horizon.
    */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    minLcp: Int, maxLcp: Int = Int.MaxValue): DataFrame = {
    require(minLcp >= 1, s"minLcp must be >= 1, got $minLcp")
    require(maxLcp >= minLcp,
      s"maxLcp ($maxLcp) must be >= minLcp ($minLcp)")
    adjacentLcp(df, idCol, textCol, maxLcp)
      .filter(col("lcp") >= minLcp)
      .select(col("sa_rank"), col(idCol), col("pos"), col("lcp"),
        concat_ws(" ", slice(col("__sfx"), lit(1), col("lcp")))
          .as("span"))
  }

  /** Raw repeat-coverage intervals (idCol, pos, __e): one row per
    * suffix whose repeat horizon (max LCP against its two SA
    * neighbors — the textbook identity: the longest repeated prefix of
    * ANY suffix is attained against an SA neighbor) reaches `minLcp`,
    * covering [pos, pos + min(rep, minLcp)).
    *
    * The scan runs at horizon = minLcp ON PURPOSE: interval-union
    * coverage is HORIZON-INVARIANT for any horizon >= minLcp. Sketch:
    * if position q is covered by an uncapped interval from suffix s
    * (true rep_s > q - s), then for the suffix s' = max(s, q - minLcp
    * + 1) the shifted-partner argument gives rep_s' >= rep_s - (s' -
    * s) >= q - s' + 1 >= minLcp, so s' qualifies and its CAPPED
    * interval [s', s' + minLcp) still contains q — capped intervals
    * chain across any long repeat and the union is unchanged. (Pinned
    * by SuffixArraySpec against brute force and by the unchanged
    * DuckDB oracle, which computes coverage UNCAPPED.) This keeps the
    * whole decision tier at O(n · minLcp) constant-width rows — the
    * builder's own scale class — where round 13 shipped whole
    * suffixes, O(n · L).
    */
  private def repeatCoverIntervals(df: DataFrame, idCol: String,
                                   textCol: String,
                                   minLcp: Int): DataFrame = {
    val lcp = adjacentLcp(df, idCol, textCol, maxLcp = minLcp)
      .select(col("sa_rank"), col(idCol), col("pos"), col("lcp"))
    val prev = lcp.select((col("sa_rank") + 1L).as("sa_rank"),
      col("lcp").as("__lp"))
    lcp.join(prev, Seq("sa_rank"), "left")
      .select(col(idCol), col("pos"),
        greatest(col("lcp"), coalesce(col("__lp"), lit(0L))).as("__rep"))
      .filter(col("__rep") >= minLcp)
      .select(col(idCol), col("pos"), (col("pos") + col("__rep")).as("__e"))
  }

  /** Per-document duplicated-token profile — the Lee-et-al substring
    * dedup DECISION metric: the fraction of each document's tokens
    * covered by some verbatim repeat of >= `minLcp` tokens occurring
    * elsewhere in the corpus (in another document or the same one).
    * Returns (idCol, n_tokens, dup_tokens, dup_frac).
    *
    * Each qualifying suffix contributes the interval [pos, pos + rep)
    * (rep capped at minLcp — coverage is horizon-invariant, see
    * [[repeatCoverIntervals]]); per-document coverage is the interval
    * union via a running-max window PARTITIONED BY DOCUMENT (bounded
    * work per partition — never a global window), summing only each
    * interval's uncovered tail.
    */
  def duplicatedTokenStats(df: DataFrame, idCol: String, textCol: String,
                           minLcp: Int): DataFrame = {
    require(minLcp >= 1, s"minLcp must be >= 1, got $minLcp")
    coverageStats(df, idCol, textCol,
      repeatCoverIntervals(df, idCol, textCol, minLcp))
  }

  /** Interval-union coverage per document over raw (possibly
    * overlapping) intervals: (idCol, n_tokens, dup_tokens, dup_frac).
    */
  private def coverageStats(df: DataFrame, idCol: String, textCol: String,
                            ints: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val dup = ints
      .withColumn("__pe", max(col("__e")).over(w))
      .groupBy(col(idCol))
      .agg(sum(greatest(lit(0L), col("__e") -
        greatest(col("pos"), coalesce(col("__pe"), col("pos")))))
        .as("__dup"))
    df.select(col(idCol),
        size(TextAnalysis.tokens(col(textCol))).cast("long").as("n_tokens"))
      .join(dup, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        coalesce(col("__dup"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("__dup"), lit(0L)).cast("double") /
          col("n_tokens").cast("double"), 6).as("dup_frac"))
  }

  /** The Lee-et-al ACTION step — corpus surgery driven by the suffix
    * array: documents whose duplicated-token fraction reaches
    * `dropPercent`% are DROPPED outright; every other document has the
    * covered spans EXCISED (tokens inside any >= `minLcp` verbatim
    * repeat removed, the remainder reassembled in order). Returns one
    * row per input document:
    * (idCol, n_tokens, dup_tokens, dup_frac, action, kept_tokens,
    * text_deduped) with action ∈ drop | trim | keep; dropped documents
    * carry kept_tokens = 0 and a null text_deduped; fully-clean
    * documents keep every token. `text_deduped` is the tokenized
    * normal form (lowercased, single-spaced) — the same normalization
    * the coverage measure itself is defined over.
    *
    * The drop gate compares exact integers (dup_tokens × 100 >=
    * dropPercent × n_tokens), never the rounded double, so the
    * decision is bit-identical on any engine. kept_tokens ==
    * n_tokens − dup_tokens for surviving documents by construction
    * (the excision removes exactly the covered positions — spec-pinned).
    *
    * Scale shape: the interval scan is the horizon-bounded
    * O(n · minLcp) tier ([[repeatCoverIntervals]]); per-token
    * coverage is decided by ONE running-max window partitioned by
    * document over the merged (token ∪ interval-start) event stream —
    * no per-token × per-interval join, no array-of-intervals HOF probe
    * (which would be O(L²) per doc on pathological corpora) — and
    * reassembly is a per-document sort inside `collect_list`, bounded
    * by the document length like every other per-doc array here.
    */
  def substringDedup(df: DataFrame, idCol: String, textCol: String,
                     minLcp: Int, dropPercent: Int = 50): DataFrame = {
    require(minLcp >= 1, s"minLcp must be >= 1, got $minLcp")
    require(dropPercent >= 1 && dropPercent <= 100,
      s"dropPercent must be in [1, 100], got $dropPercent")
    // two consumers (the coverage stats and the excision events) —
    // materialize once; lineage intact so a lost block recomputes
    val ints = barrier(repeatCoverIntervals(df, idCol, textCol, minLcp))
    val stats = coverageStats(df, idCol, textCol, ints)
    // excision: merge token rows and interval rows into one per-doc
    // event stream ordered by position (interval starts first at equal
    // positions); a token at position p is covered iff the running max
    // of interval ends over starts <= p exceeds p
    val tokRows = df
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol), posexplode(col("__toks")))
      .select(col(idCol), col("pos").cast("long").as("__p"),
        col("col").as("__tok"), lit(null).cast("long").as("__e"),
        lit(1).as("__tag"))
    val events = tokRows.unionByName(
      ints.select(col(idCol), col("pos").as("__p"),
        lit(null).cast("string").as("__tok"), col("__e"),
        lit(0).as("__tag")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__p"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val kept = events
      .withColumn("__cov", max(col("__e")).over(w))
      .filter(col("__tag") === 1 &&
        coalesce(col("__cov"), lit(0L)) <= col("__p"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("__p"), col("__tok")))),
          v => v("__tok")), " ").as("__text"))
    val isDrop =
      col("dup_tokens") * 100L >= lit(dropPercent.toLong) * col("n_tokens")
    stats.join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("dup_tokens"),
        col("dup_frac"),
        when(isDrop, "drop").when(col("dup_tokens") > 0L, "trim")
          .otherwise("keep").as("action"),
        when(isDrop, 0L).otherwise(coalesce(col("__kept"), lit(0L)))
          .as("kept_tokens"),
        when(isDrop, lit(null).cast("string")).otherwise(col("__text"))
          .as("text_deduped"))
  }

  /** The corpus's single longest verbatim repeated token span —
    * ORDER BY (lcp DESC, sa_rank) LIMIT 1 over [[repeatedSpans]], a
    * bounded TakeOrdered, deterministic via the unique sa_rank
    * tie-break.
    */
  def longestRepeat(df: DataFrame, idCol: String,
                    textCol: String): DataFrame =
    repeatedSpans(df, idCol, textCol, minLcp = 1)
      .orderBy(col("lcp").desc, col("sa_rank"))
      .limit(1)
}
