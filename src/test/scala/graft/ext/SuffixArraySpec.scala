package graft.ext

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** [[SuffixArray]] — the prefix-doubling build is cross-checked against
  * a naive in-memory suffix sort (materialize every suffix, sort by
  * token sequence with (doc, pos) tie-break) on crafted docs AND on the
  * real sf0.001 corpus, so the distributed O(n log L) path and the
  * obviously-correct O(n²) path must agree exactly.
  */
class SuffixArraySpec extends SparkTestBase {
  import spark.implicits._

  /** Naive oracle: all (doc, pos, suffix-token-seq), sorted. */
  private def naiveSa(docs: Seq[(Long, String)]): Seq[(Long, Long, Long)] = {
    val sfx = for {
      (id, text) <- docs
      toks = text.toLowerCase.split(" ", -1).toSeq
      p <- toks.indices
    } yield (id, p.toLong, toks.drop(p))
    implicit val ord: Ordering[Seq[String]] =
      Ordering.Implicits.seqOrdering[Seq, String]
    sfx.sortBy { case (id, p, s) => (s, id, p) }
      .zipWithIndex
      .map { case ((id, p, _), r) => (r.toLong, id, p) }
  }

  private def built(docs: Seq[(Long, String)],
                    prefixWidth: Int = 16): Seq[(Long, Long, Long)] =
    SuffixArray.build(docs.toDF("doc_id", "text"), "doc_id", "text",
        prefixWidth)
      .orderBy("sa_rank")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq

  test("build matches the naive suffix sort on crafted docs, at " +
    "prefixWidth 16 (round-0 only) AND 1 (maximum doubling rounds)") {
    val docs = Seq(
      1L -> "b a n a n a",
      2L -> "a n a b",
      3L -> "the quick brown fox jumps over the lazy dog",
      4L -> "a a a a a")
    val want = naiveSa(docs)
    assert(built(docs) == want)
    assert(built(docs, prefixWidth = 1) == want)
  }

  test("identical documents: ties broken by (doc, pos), ranks unique") {
    val docs = Seq(7L -> "x y x y", 3L -> "x y x y", 5L -> "x y")
    val got = built(docs, prefixWidth = 2)
    assert(got == naiveSa(docs))
    assert(got.map(_._1) == got.indices.map(_.toLong))
  }

  test("single-token and single-doc corpora") {
    assert(built(Seq(1L -> "solo")) == Seq((0L, 1L, 0L)))
    val one = Seq(9L -> "c b a")
    assert(built(one) == naiveSa(one))
  }

  test("build matches the naive sort on the real sf0.001 corpus") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 40)
      .select(col("doc_id"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .toSeq
    assert(docs.nonEmpty)
    assert(built(docs) == naiveSa(docs))
  }

  test("lcpLen: equal, prefix, disjoint, empty-overlap cases") {
    val df = Seq(
      (Seq("a", "b", "c"), Seq("a", "b", "c"), 3L),
      (Seq("a", "b"), Seq("a", "b", "c"), 2L),
      (Seq("a", "b", "c"), Seq("a", "b"), 2L),
      (Seq("a", "b"), Seq("x", "b"), 0L),
      (Seq("a"), Seq("a"), 1L)
    ).toDF("a", "b", "want")
    val got = df.select(SuffixArray.lcpLen(col("a"), col("b")).as("lcp"),
      col("want")).collect()
    got.foreach { case Row(lcp: Long, want: Long) => assert(lcp == want) }
  }

  test("repeatedSpans finds the planted verbatim repeat and its " +
    "nested tail, and nothing else") {
    // "one two three four" appears verbatim in docs 1 and 2. Its own
    // 3-token tail "two three four" therefore repeats too (every
    // suffix of a repeat is a repeat) — minLcp = 3 must surface
    // exactly those two spans and nothing else.
    val docs = Seq(
      1L -> "alpha one two three four beta",
      2L -> "gamma delta one two three four",
      3L -> "epsilon zeta eta theta iota").toDF("doc_id", "text")
    val got = SuffixArray.repeatedSpans(docs, "doc_id", "text", minLcp = 3)
      .orderBy("sa_rank").collect()
    assert(got.map(r => (r.getAs[String]("span"), r.getAs[Long]("lcp")))
      .toSet ==
      Set("one two three four" -> 4L, "two three four" -> 3L))
  }

  test("repeatedSpans lcp values match a naive adjacent-pair scan") {
    val docs = Seq(
      1L -> "a b c a b c a b",
      2L -> "c a b c",
      3L -> "b c a a b")
    val naive = {
      val sfx = for {
        (id, text) <- docs
        toks = text.split(" ").toSeq
        p <- toks.indices
      } yield (id, p.toLong, toks.drop(p))
      implicit val ord: Ordering[Seq[String]] =
        Ordering.Implicits.seqOrdering[Seq, String]
      val sorted = sfx.sortBy { case (id, p, s) => (s, id, p) }
      sorted.zip(sorted.drop(1)).zipWithIndex.flatMap {
        case (((id, p, s), (_, _, s2)), r) =>
          val lcp = s.zip(s2).takeWhile { case (x, y) => x == y }.size
          if (lcp >= 2)
            Some((r.toLong, id, p, lcp.toLong, s.take(lcp).mkString(" ")))
          else None
      }
    }
    val got = SuffixArray
      .repeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text",
        minLcp = 2)
      .orderBy("sa_rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .toSeq
    assert(got == naive)
  }

  /** Brute-force duplicated-token profile: rep(d,p) = the longest
    * common prefix of suffix (d,p) against EVERY other suffix in the
    * corpus — no suffix array involved, so this independently validates
    * the SA-neighbor-max identity the operator relies on — then the
    * per-doc interval union of [p, p+rep) for rep >= minLcp.
    */
  private def naiveDupStats(docs: Seq[(Long, String)], minLcp: Int)
      : Seq[(Long, Long, Long, Double)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val sfx = for { (id, l) <- toks; p <- l.indices } yield (id, p, l.drop(p))
    def cp(a: Seq[String], b: Seq[String]) =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    toks.map { case (id, l) =>
      val ints = l.indices.flatMap { p =>
        val rep = sfx.collect {
          case (i2, p2, s2) if (i2, p2) != ((id, p)) =>
            cp(l.drop(p), s2)
        }.maxOption.getOrElse(0)
        if (rep >= minLcp) Some((p, p + rep)) else None
      }
      var covered = 0L
      var hi = 0
      ints.sortBy(_._1).foreach { case (s, e) =>
        val from = math.max(s, hi)
        if (e > from) { covered += e - from; hi = e }
        else hi = math.max(hi, e)
      }
      (id, l.size.toLong, covered,
        BigDecimal(covered.toDouble / l.size)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("duplicatedTokenStats matches the brute-force all-pairs profile") {
    val docs = Seq(
      1L -> "a b c d e f g h",
      2L -> "x y a b c d e z",     // 5-token overlap with doc 1
      3L -> "p q r s t",           // no repeats
      4L -> "a b c d e f g h",     // exact dup of doc 1 -> frac 1.0
      5L -> "m m m m m m")         // self-repeat: [m x6] vs [m x5] ...
    val got = SuffixArray
      .duplicatedTokenStats(docs.toDF("doc_id", "text"), "doc_id", "text",
        minLcp = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == naiveDupStats(docs, minLcp = 4))
    // spot-check the planted structure
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(4L)._4 == 1.0)                  // exact duplicate doc
    assert(byId(3L)._3 == 0L)                   // clean doc
    assert(byId(2L)._3 == 5L)                   // the a-e overlap
  }

  test("duplicatedTokenStats: overlapping intervals union, not sum") {
    // "a b c d e" repeats in doc 2 twice, overlapping inside doc 1's
    // longer run — union coverage must not double-count
    val docs = Seq(
      1L -> "a b c d e a b c d e",
      2L -> "a b c d e")
    val got = SuffixArray
      .duplicatedTokenStats(docs.toDF("doc_id", "text"), "doc_id", "text",
        minLcp = 5)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == naiveDupStats(docs, minLcp = 5))
    assert(got.head._3 == 10L) // whole of doc 1 covered, counted once
  }

  test("duplicatedTokenStats is horizon-invariant: a repeat far longer " +
    "than minLcp is covered exactly (capped intervals chain)") {
    // The engine caps every interval at minLcp tokens; the brute-force
    // reference uses TRUE repeat lengths. A 20-token shared block at
    // minLcp = 4 only matches if capped intervals chain across the
    // whole block — the proof in repeatCoverIntervals, pinned here.
    val block = (1 to 20).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      1L -> s"alpha $block omega",
      2L -> s"$block zeta",
      3L -> "clean doc with no repeats at all")
    val got = SuffixArray
      .duplicatedTokenStats(docs.toDF("doc_id", "text"), "doc_id", "text",
        minLcp = 4)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq
    assert(got == naiveDupStats(docs, minLcp = 4))
    assert(got(0)._3 == 20L && got(1)._3 == 20L && got(2)._3 == 0L)
  }

  /** Brute-force substringDedup reference: true-rep intervals → per-doc
    * covered position set → drop gate on exact integers → kept tokens
    * in order.
    */
  private def naiveDedup(docs: Seq[(Long, String)], minLcp: Int,
                         dropPercent: Int)
      : Seq[(Long, Long, Long, Double, String, Long, Option[String])] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split(" ", -1).toSeq }
    val sfx = for { (id, l) <- toks; p <- l.indices } yield (id, p, l.drop(p))
    def cp(a: Seq[String], b: Seq[String]) =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    toks.map { case (id, l) =>
      val covered = l.indices.flatMap { p =>
        val rep = sfx.collect {
          case (i2, p2, s2) if (i2, p2) != ((id, p)) => cp(l.drop(p), s2)
        }.maxOption.getOrElse(0)
        if (rep >= minLcp) (p until math.min(l.size, p + rep)) else Nil
      }.toSet
      val dup = covered.size.toLong
      val n = l.size.toLong
      val frac = BigDecimal(dup.toDouble / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val drop = dup * 100 >= dropPercent * n
      val keptIdx = l.indices.filterNot(covered)
      val action = if (drop) "drop" else if (dup > 0) "trim" else "keep"
      val keptN = if (drop) 0L else keptIdx.size.toLong
      val text = if (drop || keptIdx.isEmpty) None
                 else Some(keptIdx.map(l).mkString(" "))
      (id, n, dup, frac, action, keptN, text)
    }
  }

  test("substringDedup matches the brute-force surgery on planted " +
    "drop/trim/keep docs") {
    val docs = Seq(
      1L -> "a b c d e f g h i j",
      2L -> "x y a b c d e f q r s t zz",  // 6 of 13 covered -> trim
      3L -> "a b c d e f g h i j",         // exact dup -> frac 1.0 -> drop
      4L -> "pp qq rr ss tt uu vv ww",     // clean -> keep
      5L -> "k k k k k k k k k k k k")     // self-repeat -> drop
    val got = SuffixArray
      .substringDedup(docs.toDF("doc_id", "text"), "doc_id", "text",
        minLcp = 4, dropPercent = 50)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getString(4), r.getLong(5), Option(r.getString(6))))
      .toSeq
    assert(got == naiveDedup(docs, minLcp = 4, dropPercent = 50))
    val byId = got.map(g => g._1 -> g).toMap
    assert(byId(3L)._5 == "drop" && byId(3L)._7.isEmpty)
    assert(byId(4L)._5 == "keep" &&
      byId(4L)._7.contains("pp qq rr ss tt uu vv ww"))
    assert(byId(2L)._5 == "trim")
  }

  test("substringDedup invariants: kept_tokens == n_tokens - dup_tokens " +
    "for survivors, and excised text re-tokenizes to the kept positions " +
    "exactly (real corpus slice)") {
    // doc_id < 500 = the full sf0.001 corpus: the smallest slice where
    // all three actions occur (measured: 443 keep / 12 trim / 45 drop)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 500).select("doc_id", "text")
    val got = SuffixArray
      .substringDedup(docs, "doc_id", "text", minLcp = 5, dropPercent = 50)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, dup, action, keptN) = (r.getLong(1), r.getLong(2),
        r.getString(4), r.getLong(5))
      if (action == "drop") {
        assert(keptN == 0L && r.isNullAt(6))
      } else {
        assert(keptN == n - dup,
          s"doc ${r.getLong(0)}: kept $keptN != $n - $dup")
        val text = Option(r.getString(6))
        assert(text.map(_.split(" ", -1).length.toLong).getOrElse(0L)
          == keptN)
      }
      if (action == "keep") assert(dup == 0L)
      if (action == "trim") assert(dup > 0L && dup * 100 < 50 * n)
    }
    // the surgery acts on this corpus: the synthetic slice is
    // duplicate-dense, so all three actions must occur
    assert(got.map(_.getString(4)).toSet == Set("drop", "trim", "keep"))
  }

  test("autoPrefixWidth: half-median, clamped to [4, 32], " +
    "power of two") {
    assert(SuffixArray.autoPrefixWidth(1) == 4)
    assert(SuffixArray.autoPrefixWidth(8) == 4)
    assert(SuffixArray.autoPrefixWidth(9) == 8)
    assert(SuffixArray.autoPrefixWidth(17) == 16)
    assert(SuffixArray.autoPrefixWidth(55) == 32)   // the measured corpus
    assert(SuffixArray.autoPrefixWidth(100000) == 32)
    (1L to 300L).foreach { n =>
      val w = SuffixArray.autoPrefixWidth(n)
      assert(w >= 4 && w <= 32 && Integer.bitCount(w) == 1)
    }
  }

  test("buildStats pins the doubling-round count: 0 rounds when the " +
    "prefix width covers every doc, ceil(log2(L/W)) on duplicate-dense " +
    "docs, early termination once ranks separate") {
    // (a) every doc shorter than W: round 0 fully sorts, 0 rounds
    val short = Seq(1L -> "a b c", 2L -> "c b a", 3L -> "b b")
      .toDF("doc_id", "text")
    val b0 = SuffixArray.buildStats(short, "doc_id", "text",
      prefixWidth = 8)
    assert(b0.rounds == 0 && b0.prefixWidth == 8)
    assert(b0.sa.count() == b0.nSuffixes)
    b0.sa.unpersist()

    // (b) two IDENTICAL 64-token docs: ties persist until h >= maxLen,
    // so rounds = ceil(log2(64 / 4)) = 4 at W = 4 (h: 4,8,16,32 — the
    // h=64 round is cut by the h < maxLen bound, ties broken by id)
    val t64 = (1 to 64).map(i => s"t$i").mkString(" ")
    val dup = Seq(1L -> t64, 2L -> t64).toDF("doc_id", "text")
    val b1 = SuffixArray.buildStats(dup, "doc_id", "text", prefixWidth = 4)
    assert(b1.rounds == 4, s"rounds = ${b1.rounds}")
    assert(b1.maxDocLen == 64L && b1.nSuffixes == 128L)
    // correctness at the forced-deep config too
    assert(b1.sa.orderBy("sa_rank").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ==
      naiveSa(Seq(1L -> t64, 2L -> t64)))
    b1.sa.unpersist()

    // (c) unique tokens everywhere: every rank separates in round 0
    // even though maxLen >> W — early termination, 0 rounds
    val uniq = Seq(
      1L -> (1 to 40).map(i => s"u$i").mkString(" "),
      2L -> (41 to 80).map(i => s"u$i").mkString(" "))
      .toDF("doc_id", "text")
    val b2 = SuffixArray.buildStats(uniq, "doc_id", "text", prefixWidth = 4)
    assert(b2.rounds == 0 && b2.distinctRanks == b2.nSuffixes)
    b2.sa.unpersist()

    // (d) the auto width on the real corpus slice resolves to the
    // measured-corpus value (p50 ~ 55-59 tokens -> 32) and matches the
    // explicit-width build exactly
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") < 40).select("doc_id", "text")
    val auto = SuffixArray.buildStats(docs, "doc_id", "text")
    assert(auto.prefixWidth == 32, s"auto width = ${auto.prefixWidth}")
    val autoRows = auto.sa.orderBy("sa_rank").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    auto.sa.unpersist()
    val explicit = SuffixArray.build(docs, "doc_id", "text",
      prefixWidth = 32)
    assert(autoRows == explicit.orderBy("sa_rank").collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq)
    explicit.unpersist()
  }

  test("longestRepeat returns the max-lcp span with rank tie-break") {
    val docs = Seq(
      1L -> "p q r s t u v",
      2L -> "m n p q r s t u v w").toDF("doc_id", "text")
    val got = SuffixArray.longestRepeat(docs, "doc_id", "text").collect()
    assert(got.length == 1)
    assert(got.head.getAs[Long]("lcp") == 7L)
    assert(got.head.getAs[String]("span") == "p q r s t u v")
  }
}
