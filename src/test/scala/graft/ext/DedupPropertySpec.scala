package graft.ext

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkTestBase

/** Property-style invariants for the dedup family over generated corpora
  * (fixed seeds — see PropertySpec for the rationale).
  */
class DedupPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val wordGen = Gen.oneOf("alpha", "beta", "gamma", "delta",
    "epsilon", "zeta", "eta", "theta")
  private val docGen = Gen.chooseNum(3, 12)
    .flatMap(n => Gen.listOfN(n, wordGen)).map(_.mkString(" "))
  private def corpus(seedBase: Long, n: Int): Seq[(Long, String)] =
    (0 until n).flatMap(i =>
      docGen.apply(Gen.Parameters.default, Seed(seedBase + i))
        .map(t => (i.toLong, t)))

  test("property: jaccard values are within [0,1] and symmetric-by-construction") {
    val docs = corpus(7L, 30).toDF("doc_id", "text")
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 1,
      candidates = lit(true), minJaccard = 0.0).collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { r =>
      val j = r.getDouble(2)
      j >= 0.0 && j <= 1.0 && r.getLong(0) < r.getLong(1)
    })
  }

  test("property: identical docs always collide in minhash, survivors drop them") {
    val base = corpus(99L, 20)
    val withClones = base ++ base.take(5).map { case (id, t) => (id + 100, t) }
    val df = withClones.toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidatePairs(df, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    (0L until 5L).foreach(i =>
      assert(pairs.contains((i, i + 100)), s"clone pair $i missing"))
    val survivors = Dedup.nearDupSurvivors(df, "doc_id", "text",
      minJaccard = 0.99).select("doc_id").as[Long].collect().toSet
    (0L until 5L).foreach { i =>
      assert(survivors.contains(i), "lower clone id survives")
      assert(!survivors.contains(i + 100), "higher clone id dropped")
    }
  }

  test("property: simhash hamming distance is 0 iff token multisets equal (sampled)") {
    val docs = corpus(555L, 40).toDF("doc_id", "text")
    val h = Dedup.simhashTable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    val byText = corpus(555L, 40).toMap
    for {
      (a, ta) <- byText; (b, tb) <- byText if a < b
    } {
      val sameTokens = ta.split(" ").sorted.sameElements(tb.split(" ").sorted)
      if (sameTokens) assert(h(a) == h(b), s"equal multisets $a,$b must hash equal")
    }
  }

  test("property: simhash band pairs = exactly the pairs within maxHamming (pigeonhole recall)") {
    val docs = corpus(777L, 40).toDF("doc_id", "text")
    val sigs = Dedup.simhashTable(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    // ground truth by brute force: maxHamming = bands-1 = 3 ⇒ at least
    // one 8-bit band agrees, so banding has 100% recall; verification
    // makes precision exact — the operator output must EQUAL this set
    // iterate a Seq, not the Map — yielding (a, b) pairs into a Map would
    // collapse pairs sharing id_a
    val sigSeq = sigs.toSeq
    val expected = (for {
      (a, sa) <- sigSeq; (b, sb) <- sigSeq
      if a < b && java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (a, b)).toSet
    val got = Dedup.simhashBandPairs(docs, "doc_id", "text",
      maxHamming = 3, bands = 4, maxBucket = 0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("connected components: chains collapse transitively, components stay apart") {
    import spark.implicits._
    // 1-2-3 chained (1~2, 2~3 but never 1~3), {10,11} separate, 20-21-22 star
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (20L, 22L))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("connected components: long path converges within maxIter rounds") {
    import spark.implicits._
    // path graph 0-1-2-...-9: worst case for label propagation (diameter 9)
    val pairs = (0L until 9L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 10 && got.values.forall(_ == 0L))
  }

  test("connected components: a 256-node chain converges in O(log n) " +
    "star rounds, not O(diameter)") {
    import spark.implicits._
    // an adversarial dedup chain (each doc pairs only with the next):
    // min-label propagation needs n-1 = 255 rounds; the large-star/
    // small-star contraction must finish in ~log2(256) = 8 + slack
    val n = 256L
    val pairs = (0L until n - 1).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val (labels, rounds) = Dedup.connectedComponentsStats(pairs)
    val got = labels.as[(Long, Long)].collect().toMap
    assert(got.size == n && got.values.forall(_ == 0L),
      s"wrong labels: ${got.filter(_._2 != 0L).take(5)}")
    assert(rounds <= 12, s"took $rounds rounds — not O(log n)")
  }

  test("property: connected components == driver-side union-find on " +
    "random graphs (mixed components, dups, self-loops)") {
    import spark.implicits._
    for (seed <- Seq(3, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val n = 120
      // sparse random graph + guaranteed dups/self-loops
      val edges = (0 until 150).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val pairs = (edges ++ edges.take(10)).toDF("id_a", "id_b")
      // reference: classic union-find with min-label extraction
      val parent = Array.tabulate(n.toLong.toInt)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val touched = edges.flatMap { case (a, b) => Seq(a, b) }.toSet
      val expected = touched.map(id =>
        id -> {
          // min label of the component = the root after full path walk
          var r = id.toInt; while (parent(r) != r) r = parent(r); r.toLong
        }).toMap
      val got = Dedup.connectedComponents(pairs)
        .as[(Long, Long)].collect().toMap
      assert(got == expected, s"seed=$seed: " +
        s"${(got.toSet -- expected.toSet).take(5)} vs expected " +
        s"${(expected.toSet -- got.toSet).take(5)}")
    }
  }

  test("incrementalComponents: merges stored clusters, admits new " +
    "nodes, leaves untouched components alone") {
    import spark.implicits._
    // stored: {1,2,3} under 1, {10,11} under 10, {20,21} under 20
    val stored = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L)).toDF("doc_id", "cluster_id")
    // batch: bridge a NON-representative member (3) to 11 (merging
    // clusters 1 and 10), plus a brand-new chain 30-31
    val batch = Seq((3L, 11L), (30L, 31L)).toDF("id_a", "id_b")
    val got = Dedup.incrementalComponents(stored, batch)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      20L -> 20L, 21L -> 20L, 30L -> 30L, 31L -> 30L))
  }

  test("property: incrementalComponents over random 2-batch splits == " +
    "full recompute over all edges") {
    import spark.implicits._
    for (seed <- Seq(5, 13, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 80
      val edges = (0 until 90).map(_ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val (b1, b2) = edges.splitAt(45)
      val full = Dedup.connectedComponents(edges.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      val stored = Dedup.connectedComponents(b1.toDF("id_a", "id_b"))
      val inc = Dedup.incrementalComponents(stored,
          b2.toDF("id_a", "id_b"))
        .as[(Long, Long)].collect().toMap
      assert(inc == full, s"seed=$seed: " +
        s"${(inc.toSet -- full.toSet).take(5)} vs " +
        s"${(full.toSet -- inc.toSet).take(5)}")
    }
  }

  test("incrementalComponents: the star loop runs on the PROJECTED " +
    "batch graph — a huge stored chain costs zero closure rounds") {
    import spark.implicits._
    // stored: one 200-node component already closed (all → 0); the
    // batch touches it with ONE edge. A from-scratch recompute would
    // walk the 199-edge chain (~8 star rounds); the incremental path
    // closes a 2-node projected graph in 1 round.
    val stored = (0L until 200L).map(i => (i, 0L)).toDF("doc_id", "cluster_id")
    val batch = Seq((199L, 500L)).toDF("id_a", "id_b")
    val got = Dedup.incrementalComponents(stored, batch)
      .as[(Long, Long)].collect().toMap
    assert(got.size == 201 && got.values.forall(_ == 0L))
    // plan-shape pin: the projected rep graph {0, 500} converges in
    // one star round — the closure never saw the 200-node history
    val projected = Seq((0L, 500L)).toDF("id_a", "id_b")
    val (_, rounds) = Dedup.connectedComponentsStats(projected)
    assert(rounds <= 1, s"projected graph took $rounds rounds")
  }

  test("connected components: self-pairs and isolated ids label " +
    "themselves; string ids order lexicographically") {
    import spark.implicits._
    val pairs = Seq(("solo", "solo"), ("b", "c"), ("c", "a"))
      .toDF("id_a", "id_b")
    val got = Dedup.connectedComponents(pairs)
      .as[(String, String)].collect().toMap
    assert(got == Map("solo" -> "solo", "a" -> "a", "b" -> "a",
      "c" -> "a"), got.toString)
  }

  test("property: exact dedup survivors have no duplicate texts") {
    val base = corpus(31L, 25)
    val df = (base ++ base.map { case (id, t) => (id + 1000, t) })
      .toDF("doc_id", "text")
    val kept = Dedup.dropExactDups(df, "doc_id", "text")
    assert(kept.count() == kept.select("text").distinct().count())
    // totals: one survivor per distinct text
    assert(kept.count() == df.select("text").distinct().count())
  }

  test("duplicateSpans: shared window found, short docs strict, counts exact") {
    val df = Seq(
      (1L, "a b c d e f"),      // shares the c-d-e-f window via doc 2
      (2L, "x y c d e f"),
      (3L, "c d e"),            // 3 tokens < n=4: contributes nothing
      (4L, "q q q q q q q q q") // repeats within ONE doc only
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(df, "doc_id", "text", n = 4)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("c d e f", 2L, 2L)),
      s"single cross-doc span expected, got $out")
  }

  test("property: jaccardPairsPrefix == jaccardPairs at every threshold") {
    val docs = corpus(41L, 50).toDF("doc_id", "text")
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val full = Dedup.jaccardPairs(docs, "doc_id", "text", n = 1,
          candidates = lit(true), minJaccard = t, maxDf = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      val pref = Dedup.jaccardPairsPrefix(docs, "doc_id", "text", n = 1,
          candidates = lit(true), minJaccard = t, maxDf = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .toSet
      assert(pref == full,
        s"t=$t missing=${(full -- pref).take(5)} extra=${(pref -- full).take(5)}")
    }
  }

  test("prefix filter indexes strictly fewer postings than all-pairs") {
    // at t=0.8 each set indexes |g| − ⌈0.8|g|⌉ + 1 grams — about a
    // fifth of the full posting volume the plain inverted index carries
    val docs = corpus(42L, 60).toDF("doc_id", "text")
    val tokens = docs.select(explode(array_distinct(
      split(lower(col("text")), " "))).as("g"))
    val fullPostings = tokens.count()
    val prefixPostings = docs
      .select(size(array_distinct(split(lower(col("text")), " "))).as("sz"))
      .collect().map { r =>
        val sz = r.getInt(0); sz - math.ceil(0.8 * sz).toInt + 1
      }.sum
    assert(prefixPostings * 2 < fullPostings,
      s"$prefixPostings vs $fullPostings")
  }

  test("sortedNeighborhood: typo-adjacent names pair; blocks never mix") {
    val recs = Seq(
      (1L, "smith john"), (2L, "smith jon"), (3L, "smith zachary"),
      (4L, "taylor ann"), (5L, "taylor anne"),
      (6L, "unger solo")
    ).toDF("id", "name")
    val pairs = Dedup.sortedNeighborhoodPairs(recs, "id", "name",
        k => substring_index(k, " ", 1), window = 1)
      .as[(Long, Long, String, String)].collect()
      .map(p => (p._1, p._2)).toSet
    // window 1: only sort-adjacent within a block; id_a = sort-earlier
    // ("smith john" < "smith jon" < "smith zachary"; singleton block
    // "unger" pairs with nothing)
    assert(pairs == Set((1L, 2L), (2L, 3L), (4L, 5L)), pairs.toString)
  }

  test("property: sortedNeighborhood == rank-difference<=w reference") {
    val recs = corpus(99L, 60).toDF("id", "key")
    for (w <- Seq(1, 2, 3)) {
      val got = Dedup.sortedNeighborhoodPairs(recs, "id", "key",
          k => substring(k, 1, 3), window = w)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      // reference: per-block total sort in plain Scala
      val expected = corpus(99L, 60).groupBy(_._2.take(3)).values.flatMap {
        blk =>
          val sorted = blk.map { case (id, k) => (k, id) }.toSeq.sorted
          for {
            i <- sorted.indices; j <- (i + 1) to math.min(i + w, sorted.size - 1)
          } yield (sorted(i)._2, sorted(j)._2)
      }.toSet
      assert(got == expected, s"w=$w diff=${got.diff(expected).take(5)} " +
        s"missing=${expected.diff(got).take(5)}")
    }
  }
}
