package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed suffix-array construction over the corpus token stream,
  * and the LCP (longest-common-prefix) scan built on it (builder brief
  * + SURVEY §7.4 dedup tier; beyond-reference) — the exact
  * substring-level dedup primitive for training corpora (Lee et al.
  * 2022, "Deduplicating Training Data Makes Language Models Better",
  * builds precisely this structure to find verbatim repeats of ANY
  * length, where fixed-n span scans like [[Dedup.duplicateSpans]] must
  * pick n up front).
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
  */
object SuffixArray {

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
    * Round 0 ranks each suffix by its first `prefixWidth` tokens
    * DIRECTLY — the slice is an array<string> sort key, and Spark's
    * array ordering (element-wise, shorter-prefix-first) is exactly
    * suffix order out to that horizon — so the doubling loop starts at
    * h = prefixWidth and runs log2(L / prefixWidth) rounds instead of
    * log2(L). The width trades one-pass key bytes (W tokens shipped
    * through a single sort) against whole extra rounds of shuffles;
    * 16 covers typical prose in 0 rounds at 16-token docs and cuts
    * megabyte docs from ~17 to ~13 rounds. Rounds also terminate
    * early once every rank is unique (all suffixes separated) — with
    * real text that happens at h ≈ the longest verbatim repeat, far
    * below the longest document.
    */
  def build(df: DataFrame, idCol: String, textCol: String,
            prefixWidth: Int = 16): DataFrame = {
    require(prefixWidth >= 1, s"prefixWidth must be >= 1, got $prefixWidth")
    // one row per suffix: (id, pos, first-W-token slice); repartition
    // spreads the per-doc explode across the cluster even when the
    // source is a handful of input files
    // barriered: the slice explode is the single most expensive
    // narrow stage (O(tokens × W) array building) and three consumers
    // read it (the distinct-keys rank samples + sorts it, then the
    // rank join) — without the barrier it recomputes per consumer
    val pref = barrier(df.repartition(col(idCol))
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col(idCol),
        posexplode(transform(col("__toks"),
          (_, i) => slice(col("__toks"), i + 1, lit(prefixWidth)))))
      .withColumnRenamed("col", "__pref")
      .withColumnRenamed("pos", "__pos"))
    val maxLen = df
      .agg(max(size(TextAnalysis.tokens(col(textCol))))).head() match {
        case Row(null)   => 1L
        case Row(n: Int) => n.toLong
      }
    // round 0: dense rank of the W-token prefix slices
    val keys0 = barrier(rankBySort(
      pref.select(col("__pref")).distinct(), Seq(col("__pref")), "__r"))
    var posRank = barrier(pref.join(keys0, "__pref")
      .select(col(idCol), col("__pos"), col("__r").as("__rank")))
    val nPos = posRank.count()
    var distinctRanks = keys0.count()
    pref.unpersist()
    keys0.unpersist()
    var h = prefixWidth.toLong
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
      posRank.unpersist()
      keys.unpersist()
      posRank = next
      h *= 2L
    }
    // the array is an INDEX — materialize it (like the IVF/text segment
    // stores) so every consumer (LCP scan, repeated readouts) starts
    // from the built structure instead of replaying the final sort;
    // small fixed-width rows, so the localCheckpoint caveat (see
    // [[barrier]]) doesn't bite here and lineage truncation keeps
    // repeated consumer plans flat
    val sa = rankBySort(posRank,
        Seq(col("__rank"), col(idCol), col("__pos")), "sa_rank")
      .select(col("sa_rank"), col(idCol), col("__pos").cast("long").as("pos"))
      .localCheckpoint()
    posRank.unpersist()
    sa
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
    * (in tokens) with the NEXT suffix in SA order (0 for the last).
    *
    * The adjacency join is a self equi-join on sa_rank (rank r with
    * rank r+1); suffix token arrays are attached per side by a
    * docs-sized join and sliced from the doc's token array — per-row
    * payload is bounded by the document length, the [[Dedup
    * .duplicateSpans]] class, and nothing quadratic materializes.
    */
  private def adjacentLcp(df: DataFrame, idCol: String,
                          textCol: String): DataFrame = {
    val sa = build(df, idCol, textCol)
    val toksByDoc = df.select(col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__toks"))
    val withSfx = sa.join(toksByDoc, idCol)
      .select(col("sa_rank"), col(idCol), col("pos"),
        slice(col("__toks"), col("pos") + 1, size(col("__toks")))
          .as("__sfx"))
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
    */
  def repeatedSpans(df: DataFrame, idCol: String, textCol: String,
                    minLcp: Int): DataFrame = {
    require(minLcp >= 1, s"minLcp must be >= 1, got $minLcp")
    adjacentLcp(df, idCol, textCol)
      .filter(col("lcp") >= minLcp)
      .select(col("sa_rank"), col(idCol), col("pos"), col("lcp"),
        concat_ws(" ", slice(col("__sfx"), lit(1), col("lcp")))
          .as("span"))
  }

  /** Per-document duplicated-token profile — the Lee-et-al substring
    * dedup DECISION metric: the fraction of each document's tokens
    * covered by some verbatim repeat of >= `minLcp` tokens occurring
    * elsewhere in the corpus (in another document or the same one).
    * Returns (idCol, n_tokens, dup_tokens, dup_frac).
    *
    * A suffix's repeat horizon is max(LCP with its SA-predecessor,
    * LCP with its SA-successor) — the textbook identity: the longest
    * repeated prefix of ANY suffix is attained against one of its SA
    * neighbors. Each qualifying suffix contributes the interval
    * [pos, pos + rep); per-document coverage is the interval union via
    * a running-max window PARTITIONED BY DOCUMENT (bounded work per
    * partition — never a global window), summing only each interval's
    * uncovered tail.
    */
  def duplicatedTokenStats(df: DataFrame, idCol: String, textCol: String,
                           minLcp: Int): DataFrame = {
    require(minLcp >= 1, s"minLcp must be >= 1, got $minLcp")
    val lcp = adjacentLcp(df, idCol, textCol)
      .select(col("sa_rank"), col(idCol), col("pos"), col("lcp"))
    val prev = lcp.select((col("sa_rank") + 1L).as("sa_rank"),
      col("lcp").as("__lp"))
    val rep = lcp.join(prev, Seq("sa_rank"), "left")
      .select(col(idCol), col("pos"),
        greatest(col("lcp"), coalesce(col("__lp"), lit(0L))).as("__rep"))
    val ints = rep.filter(col("__rep") >= minLcp)
      .select(col(idCol), col("pos"), (col("pos") + col("__rep")).as("__e"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
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
