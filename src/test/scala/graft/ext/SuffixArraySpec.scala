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
