package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class ExtSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 0
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 0
    (3L, "completely different words entirely here now")
  ).toDF("doc_id", "text")

  test("exact dedup keeps lowest id per identical text") {
    val survivors = Dedup.dropExactDups(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(survivors.toSeq == Seq(0L, 1L, 3L))
  }

  test("minhash LSH pairs exact dups always, unrelated docs never") {
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L)), "identical texts must share all bands")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc should share no band")
  }

  test("simhash: identical texts equal, near-dups within small hamming distance") {
    val h = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    assert(h(0L) == h(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(0L), h(1L)) < hamming(h(0L), h(3L)),
      "near-dup must be closer than unrelated doc")
  }

  test("minhash maxBucket guard: big buckets degrade to star pairs") {
    // 6 identical docs share every band -> one bucket of 6.
    val clones = (0L to 5L).map(i => (i, "spark makes big data small again"))
      .toDF("doc_id", "text")
    val full = Dedup.minhashCandidatePairs(clones, "doc_id", "text")
      .count() // 6*5/2 = 15 all-pairs
    assert(full == 15)
    val starred = Dedup.minhashCandidatePairs(clones, "doc_id", "text",
      maxBucket = 4).as[(Long, Long)].collect().toSet
    assert(starred == (1L to 5L).map(i => (0L, i)).toSet,
      "star pairs to the min id only")
  }

  test("simhash band pairs: clones found at hamming 0, star guard caps buckets") {
    val clones = (0L to 5L).map(i => (i, "spark makes big data small again"))
      .toDF("doc_id", "text")
    val full = Dedup.simhashBandPairs(clones, "doc_id", "text",
      maxHamming = 3, bands = 4, maxBucket = 0).collect()
    assert(full.length == 15 && full.forall(_.getInt(2) == 0))
    val starred = Dedup.simhashBandPairs(clones, "doc_id", "text",
      maxHamming = 3, bands = 4, maxBucket = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(starred == (1L to 5L).map(i => (0L, i)).toSet,
      "star pairs to the min id only")
  }

  test("simhashTable == expression simhash on the documents corpus") {
    val docs100 = graft.io.Tables.load(spark, sf, "documents").limit(100)
    val viaExpr = docs100
      .select(col("doc_id"), Dedup.simhash(col("text")).as("simhash"))
      .as[(Long, Long)].collect().toMap
    val viaTable = Dedup.simhashTable(docs100, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(viaExpr == viaTable)
  }

  test("ngramsOf honors n (bigram vs trigram vs unigram)") {
    val t = Seq("a b c d").toDF("text")
      .select(split(col("text"), " ").as("toks"))
    def grams(n: Int): Seq[String] =
      t.select(Dedup.ngramsOf(col("toks"), n).as("g"))
        .head().getSeq[String](0)
    assert(grams(1) == Seq("a", "b", "c", "d"))
    assert(grams(2) == Seq("a b", "b c", "c d"))
    assert(grams(3) == Seq("a b c", "b c d"))
    assert(grams(5) == Seq("a b c d")) // shorter than n -> whole text
  }

  test("jaccard pairs: exact dup = 1.0, near-dup high, unrelated absent") {
    val j = Dedup.jaccardPairs(docs, "doc_id", "text", n = 1,
      candidates = lit(true), minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(j((0L, 2L)) == 1.0)
    assert(j((0L, 1L)) == 7.0 / 9.0) // 7 shared of 8+8-7 distinct words
    assert(!j.contains((0L, 3L)))
  }

  test("sourceOverlap: hand shingle sets, per-source dedup across docs, " +
    "zero-overlap pairs absent") {
    val df = Seq(
      ("A", "w1 w2 w3 w4"),          // shingles {w1 w2 w3, w2 w3 w4}
      ("A", "w1 w2 w3 w4"),          // same doc again — dedups inside A
      ("B", "w2 w3 w4 w5"),          // {w2 w3 w4, w3 w4 w5} — inter 1 with A
      ("C", "u1 u2 u3")              // {u1 u2 u3} — disjoint from both
    ).toDF("source", "text")
    val got = TextAnalysis.sourceOverlap(df, "source", "text")
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("A", "B", 2L, 2L, 1L, 1.0 / 3.0)),
      s"expected the single A-B row, got $got")
  }

  test("sourceOverlap: 63 sources is the boundary — 64 rejected " +
    "(bit 63 is the Long sign bit), 63 computes the full pair set") {
    def corpus(n: Int) =
      (0 until n).map(i => (f"s$i%02d", "w1 w2 w3")).toDF("source", "text")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.sourceOverlap(corpus(64), "source", "text").collect()
    }
    assert(e.getMessage.contains("<= 63"), e.getMessage)
    // 63 sources sharing one gram: all 63*62/2 pairs, jaccard 1.0
    val got = TextAnalysis.sourceOverlap(corpus(63), "source", "text")
      .collect()
    assert(got.length == 63 * 62 / 2)
    assert(got.forall(r => r.getLong(4) == 1L && r.getDouble(5) == 1.0))
  }

  test("quantized cosine: identical vectors = 1.0, orthogonal = 0.0") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding",
      maxId = 10L, threshold = -1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(pairs((0L, 1L)) == 1.0 && pairs((0L, 2L)) == 0.0)
  }

  test("brute-force top-k ranks nearest first, excludes self") {
    val got = Similarity.bruteForceTopK(
      graft.io.Tables.load(spark, sf, "embeddings"), "vec_id", "embedding",
      queryIds = Seq(0L), k = 5)
    val rows = got.collect()
    assert(rows.length == 5)
    assert(!rows.exists(_.getLong(1) == 0L), "self excluded")
    val cosines = rows.map(_.getDouble(2)).toSeq
    assert(cosines == cosines.sorted.reverse, "descending cosine")
  }

  test("LSH top-k results are a subset-quality approximation of brute force") {
    val emb = graft.io.Tables.load(spark, sf, "embeddings")
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", Seq(0L), 10)
      .select("cand_id").as[Long].collect().toSet
    val lsh = Similarity.lshTopK(emb, "vec_id", "embedding", Seq(0L), 10, bits = 4)
      .select("cand_id").as[Long].collect().toSet
    // same-bucket candidates that brute force also ranked top-10 must agree
    assert(lsh.nonEmpty, "bucket should contain some candidates")
  }

  test("native quantized_dot == composed zip_with/aggregate on real embeddings") {
    val emb = graft.io.Tables.load(spark, sf, "embeddings").limit(200)
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("q"))
    val paired = emb.as("a").join(emb.as("b"),
      col("a.vec_id") < col("b.vec_id") && col("b.vec_id") < 20)
    val diff = paired.select(
      Similarity.dotQ(col("a.q"), col("b.q")).as("native"),
      Similarity.dotQComposed(col("a.q"), col("b.q")).as("composed"))
      .filter(col("native") =!= col("composed"))
    assert(diff.isEmpty)
  }

  test("langId picks the language with most stopword hits, 'und' when none") {
    val df = Seq("the cat and the hat of a house",
                 "der hund und die katze ist gut",
                 "xyz qrs").toDF("text")
      .select(TextAnalysis.langId(col("text")).as("l"))
    assert(df.as[String].collect().toSeq == Seq("en", "de", "und"))
  }

  test("fingerprint is word-order and duplication invariant") {
    val fp = Seq("b a c a", "a b c", "a b x")
      .toDF("text").select(TextAnalysis.fingerprint(col("text")).as("f"))
      .as[String].collect()
    assert(fp(0) == fp(1) && fp(0) != fp(2))
  }

  test("events load: ts_sec is exact epoch seconds whatever the file unit") {
    val e = Events.loadEvents(spark, sf)
    val r = e.select(min(col("ts_sec"))).head().getLong(0)
    // 2024-01-01 00:00 UTC epoch = 1704067200
    assert(r >= 1704067200L && r < 1704067200L + 86400L * 366)
  }

  test("events unit guard: loadEvents agrees with the native timestamp read") {
    // Cross-check the footer-driven normalization against Spark's own
    // logical-type interpretation of the same file, so a testdata
    // regeneration that changes the physical unit fails loudly here
    // instead of silently scaling every window (the round-6 incident).
    val ours = Events.loadEvents(spark, sf)
      .agg(min(col("ts_us")), max(col("ts_us"))).head()
    val native =
      try Some(spark.read.parquet(s"$sf/events.parquet"))
      catch { case _: Exception => None } // e.g. unannotated TIMESTAMP(NANOS)
    native match {
      case None =>
        // inference rejects the file: only the raw-nanos contract applies
        assert(Events.tsNanosFactor(spark, sf) == 1L)
      case Some(df) =>
        import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
        val tsCol = df.schema("ts").dataType match {
          case TimestampType => unix_micros(col("ts"))
          case TimestampNTZType =>
            // NTZ→LTZ cast applies the session zone; the agg below is
            // built under a pinned-UTC session so the comparison is
            // tz-free (epoch-of-naive, DuckDB semantics)
            unix_micros(col("ts").cast(TimestampType))
          case other => fail(s"unexpected native ts type $other")
        }
        val prevTz = spark.conf.get("spark.sql.session.timeZone")
        try {
          spark.conf.set("spark.sql.session.timeZone", "UTC")
          val theirs = df.agg(min(tsCol), max(tsCol)).head()
          assert(ours.getLong(0) == theirs.getLong(0) &&
                 ours.getLong(1) == theirs.getLong(1),
            s"unit drift: loadEvents ts_us [${ours.getLong(0)}, ${ours.getLong(1)}] " +
              s"vs native [${theirs.getLong(0)}, ${theirs.getLong(1)}]")
        } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
    }
  }

  test("unigramLogProb: all-distinct corpus scores ln(N) per token") {
    // 6 tokens, each appearing once: every term is -ln(1/6) = ln 6
    val df = Seq((1L, "aa bb cc"), (2L, "dd ee ff")).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(df, "doc_id", "text")
      .select("doc_id", "n_tokens", "avg_neg_logprob")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._2).toSeq == Seq(3L, 3L))
    out.foreach { case (_, _, avg) =>
      assert(math.abs(avg - math.log(6.0)) < 1e-6, s"expected ln 6, got $avg")
    }
  }

  test("bigramLogProb: hand-computed add-α surprisal on a 2-doc corpus") {
    // corpus bigrams: (a,b)×2 from doc 1, (a,c)×1 from doc 2
    // ctx(a) = 3, V = 3 distinct tokens, α = 0.5:
    //   P(b|a) = (2+0.5)/(3+1.5) = 5/9;  P(c|a) = (1+0.5)/(3+1.5) = 1/3
    val df = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(df, "doc_id", "text")
      .select("doc_id", "n_bigrams", "neg_logprob_sum")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // doc 1: bigrams (a,b),(b,a),(a,b) — (b,a) exists too: recount
    // corpus: doc1 "a b a b" → (a,b),(b,a),(a,b); doc2 → (a,c)
    // cb: (a,b)=2, (b,a)=1, (a,c)=1; ctx(a)=3, ctx(b)=1; V=3
    val pAB = (2 + 0.5) / (3 + 1.5)
    val pBA = (1 + 0.5) / (1 + 1.5)
    val pAC = (1 + 0.5) / (3 + 1.5)
    assert(out.map(_._2).toSeq == Seq(3L, 1L))
    assert(math.abs(out(0)._3 - (2 * -math.log(pAB) - math.log(pBA))) < 1e-6)
    assert(math.abs(out(1)._3 - -math.log(pAC)) < 1e-6)
  }

  test("bigramLogProb: single-token and empty docs emit no rows; repeated text scores lower") {
    val df = Seq((1L, "solo"), (2L, ""), (3L, "x y x y x y x y"),
      (4L, "x q y p x r")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(df, "doc_id", "text")
      .select("doc_id", "avg_neg_logprob")
      .as[(Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(3L, 4L))
    // the repetitive doc's bigrams dominate the corpus model → lower
    // average surprisal than the all-novel doc
    assert(out(0)._2 < out(1)._2)
  }

  test("repetitionStats: looping doc fails gopher, varied doc passes") {
    val varied = (1 to 60).map(i => s"word$i").mkString(" ")
    val looping = Seq.fill(60)("spam").mkString(" ")
    val out = TextAnalysis.repetitionStats(
      Seq((1L, varied), (2L, looping)).toDF("doc_id", "text"),
      "doc_id", "text")
      .select("doc_id", "distinct_ratio", "top_unigram_frac", "gopher_keep")
      .as[(Long, Double, Double, Boolean)].collect().sortBy(_._1)
    assert(out(0)._4, s"varied doc should keep: ${out(0)}")
    assert(!out(1)._4 && out(1)._2 < 0.02 && out(1)._3 == 1.0,
      s"looping doc should drop: ${out(1)}")
  }

  test("redactPii replaces email, url, and phone with typed tokens") {
    val red = Seq("mail a.b@x.org or https://x.org/p?q=1 or +61 2 5550 1234 end")
      .toDF("t").select(TextAnalysis.redactPii(col("t")).as("r"))
      .as[String].head()
    assert(red == "mail <EMAIL> or <URL> or <PHONE> end", red)
  }

  test("chunkDocuments: non-overlapping chunks reassemble the text exactly") {
    val real = graft.io.Tables.load(spark, sf, "documents")
      .filter($"doc_id" < 20).select($"doc_id", $"text")
    val rebuilt = TextAnalysis
      .chunkDocuments(real, "doc_id", "text", chunkSize = 7, overlap = 0)
      .groupBy("doc_id")
      .agg(concat_ws(" ", array_sort(collect_list(
        struct($"chunk_id", $"chunk"))).getField("chunk")).as("rebuilt"))
    val diff = real.join(rebuilt, "doc_id")
      .filter($"text" =!= $"rebuilt").count()
    assert(diff == 0, "concat of overlap-0 chunks must equal the source text")
  }

  test("chunkDocuments: overlap windows start every (size - overlap) tokens") {
    val one = Seq((1L, (0 until 10).map(i => s"t$i").mkString(" ")))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.chunkDocuments(one, "doc_id", "text", 4, 2)
      .orderBy("chunk_id")
      .select("chunk", "n_toks").as[(String, Int)].collect().toSeq
    assert(rows == Seq(
      ("t0 t1 t2 t3", 4), ("t2 t3 t4 t5", 4), ("t4 t5 t6 t7", 4),
      ("t6 t7 t8 t9", 4), ("t8 t9", 2)), rows.toString)
  }

  test("langIdNgram classifies real sentences (the synthetic corpus can't)") {
    val samples = Seq(
      ("the quick brown fox is jumping over the lazy dog again", "en"),
      ("der schnelle braune fuchs springt über den faulen hund", "de"),
      ("el perro que duerme bien no tiene los problemas de nadie", "es"),
      ("les enfants mangent une pomme dans le jardin des voisins", "fr"),
      ("这是一个完全用中文写成的句子没有空格", "zh"),
      ("zzz qqq xxx", "und")
    ).toDF("text", "expected")
    val got = samples
      .select($"expected", TextAnalysis.langIdNgram($"text").as("got"))
      .filter($"expected" =!= $"got").collect()
    assert(got.isEmpty, got.mkString(", "))
  }

  test("tfidfSimilarPairs: identical docs score 1.0, disjoint docs absent") {
    val pairs = TextAnalysis.tfidfSimilarPairs(docs, "doc_id", "text",
        minCosine = 0.0, maxDf = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    assert(pairs((0L, 2L)) == 1.0, s"identical docs: ${pairs.get((0L, 2L))}")
    // the one differing token ("cat", df=1) carries maximal idf in a
    // 4-doc corpus, so the near-dup lands mid-range, clearly separated
    // from both identical (1.0) and disjoint (absent)
    assert(pairs((0L, 1L)) > 0.3 && pairs((0L, 1L)) < 1.0,
      s"near-dup in between: ${pairs.get((0L, 1L))}")
    assert(!pairs.contains((0L, 3L)),
      "no shared token -> no pair from the inverted index")
  }

  test("contaminationReport flags exactly the docs sharing an n-gram") {
    val corpus = docs.filter($"doc_id" =!= 0L)
    val bench = docs.filter($"doc_id" === 0L)
    val hits = Dedup.contaminationReport(corpus, bench, "doc_id", "text", 8)
      .orderBy("doc_id")
      .select("doc_id", "n_hit_grams").as[(Long, Long)].collect().toSeq
    // doc 2 is verbatim (2 distinct 8-grams of a 9-token doc); doc 1
    // shares the first 8-gram only; doc 3 shares nothing
    assert(hits == Seq((1L, 1L), (2L, 2L)), hits.toString)
  }

  test("charEntropy: 0 for constant text, ln(k) for uniform chars") {
    val df = Seq((1L, "aaaaaaaa"), (2L, "abcdabcd"), (3L, "abcdefgh"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.charEntropy(df, "doc_id", "text")
      .orderBy("doc_id").select("char_entropy").as[Double].collect()
    assert(rows(0) == 0.0, s"constant text: ${rows(0)}")
    assert(math.abs(rows(1) - math.log(4)) < 1e-9, s"4 uniform: ${rows(1)}")
    assert(math.abs(rows(2) - math.log(8)) < 1e-9, s"8 uniform: ${rows(2)}")
  }

  test("phraseScores: collocated bigram outranks independent pair") {
    // "new york" always adjacent; "red" and "dog" co-occur only once
    val text = (Seq.fill(10)("new york") ++
      Seq.fill(10)("red car") ++ Seq.fill(10)("big dog") ++
      Seq("red dog")).mkString(" ")
    val scores = TextAnalysis.phraseScores(Seq(text).toDF("text"), "text",
        minCount = 1)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getDouble(3))).toSeq
    val m = scores.map { case (x, y, _, p) => (x, y) -> p }.toMap
    assert(m(("new", "york")) > m(("red", "dog")),
      s"collocation must outscore chance: $m")
  }

  test("qualityQuantileGate keeps the p-fraction cleanest docs, cleanly split") {
    val real = graft.io.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text")
    val n = real.count()
    val kept = TextAnalysis.qualityQuantileGate(real, "doc_id", "text",
      p = 0.6, exact = true)
    val all = TextAnalysis.unigramLogProb(real, "doc_id", "text")
    val k = kept.count()
    // exact quantile_cont keeps ~p of the corpus (interpolation can
    // include the boundary doc either way)
    assert(math.abs(k - 0.6 * n) <= 1, s"kept $k of $n")
    val maxKept = kept.agg(max($"avg_neg_logprob")).as[Double].head()
    val minDropped = all.join(kept.select($"doc_id"), Seq("doc_id"), "left_anti")
      .agg(min($"avg_neg_logprob")).as[Double].head()
    assert(maxKept < minDropped,
      s"gate must split the metric: maxKept=$maxKept minDropped=$minDropped")
  }

  test("scrubRareTokens drops below-floor tokens, preserves order") {
    val df = Seq(
      (1L, "the cat zzqx9 sat on the mat"),
      (2L, "the cat sat near the mat"),
      (3L, "qqqq")) // all-rare doc scrubs to empty
      .toDF("doc_id", "text")
    val rows = TextAnalysis.scrubRareTokens(df, "doc_id", "text",
        minCount = 2)
      .orderBy("doc_id")
      .as[(Long, String, Int, Int)].collect().toSeq
    // "zzqx9", "on", "near", "qqqq" all appear once -> scrubbed
    assert(rows == Seq(
      (1L, "the cat sat the mat", 5, 2),
      (2L, "the cat sat the mat", 5, 1),
      (3L, "", 0, 1)), rows.toString)
  }

  test("negativeSamples: k in-domain draws per anchor, partition-invariant") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val n = emb.count()
    val s1 = Sampling.negativeSamples(emb, "vec_id", k = 3, seed = 7)
    val rows = s1.as[(Long, Int, Long)].collect().toSeq
    assert(rows.size >= 3 * n - 5 && rows.size <= 3 * n,
      s"${rows.size} of ${3 * n} (few self-hits allowed)")
    assert(rows.forall { case (a, _, g) => g != a && g >= 0 && g < n },
      "negatives must be in-domain and never the anchor")
    val s2 = Sampling.negativeSamples(emb.repartition(7), "vec_id",
      k = 3, seed = 7).as[(Long, Int, Long)].collect().toSeq
    assert(s2.toSet == rows.toSet, "draws must not depend on partitioning")
  }

  test("dedupAgainstIndex flags planted dup, passes novel doc") {
    val index = graft.io.Tables.load(spark, sf, "documents")
      .filter($"doc_id" < 40).select($"doc_id", $"text")
    val copied = index.filter($"doc_id" === 7L).as[(Long, String)].head()._2
    val batch = Seq(
      (1000L, copied),
      (1001L, "utterly novel content that matches nothing else at all" +
        " in this corpus with unique vocabulary zyxw qwer asdf"))
      .toDF("doc_id", "text")
    val hits = Dedup.dedupAgainstIndex(index, batch, "doc_id", "text",
        minJaccard = 0.8)
      .as[(Long, Long, Double)].collect().toSeq
    assert(hits.exists(h => h._1 == 1000L && h._2 == 7L && h._3 == 1.0),
      s"planted copy must hit its source: $hits")
    assert(!hits.exists(_._1 == 1001L), s"novel doc must pass: $hits")
  }

  test("contentChunks: chunk boundaries survive a prefix shift") {
    val base = graft.io.Tables.load(spark, sf, "documents")
      .filter($"doc_id" === 0L).select($"text").as[String].head()
    val df = Seq((1L, base), (2L, s"inserted prefix tokens here $base"))
      .toDF("doc_id", "text")
    val chunks = TextAnalysis.contentChunks(df, "doc_id", "text",
        avgChunk = 8, seed = 4)
      .select($"doc_id", $"chunk")
      .as[(Long, String)].collect().groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2).toSet }
    val orig = chunks(1L)
    val shifted = chunks(2L)
    // all original chunks except (at most) the head chunk re-align
    assert((orig -- shifted).size <= 1,
      s"CDC must re-align after a shift; lost ${(orig -- shifted).size} of ${orig.size}")
    assert(orig.size > 3, s"doc should split into several chunks: ${orig.size}")
  }

  test("qualityQuantileGate: approx sketch path agrees with exact path") {
    val real = graft.io.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text")
    val exact = TextAnalysis.qualityQuantileGate(real, "doc_id", "text",
      p = 0.7, exact = true).select("doc_id").as[Long].collect().toSet
    val approx = TextAnalysis.qualityQuantileGate(real, "doc_id", "text",
      p = 0.7, exact = false).select("doc_id").as[Long].collect().toSet
    val sym = (exact -- approx).size + (approx -- exact).size
    info(s"exact=${exact.size} approx=${approx.size} symdiff=$sym")
    assert(sym <= math.max(2, exact.size / 20),
      s"sketch threshold must track the exact quantile: symdiff $sym of ${exact.size}")
  }

  test("packSequences: two-phase prefix sum == naive global window") {
    import org.apache.spark.sql.expressions.Window
    val real = graft.io.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text")
    val naive = real
      .select($"doc_id", size(split(lower($"text"), " ")).cast("long").as("n_toks"))
      .withColumn("off", coalesce(sum($"n_toks").over(
        Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select($"doc_id", $"n_toks",
        ($"off" / 128).cast("long").as("seq_id"),
        ($"off" % 128).as("seq_offset"))
    val packed = TextAnalysis.packSequences(
      real.repartition(7), "doc_id", "text", budget = 128, bucketWidth = 13)
    assert(packed.exceptAll(naive).isEmpty && naive.exceptAll(packed).isEmpty,
      "two-phase packing must equal the single-window reference")
  }

  test("packSequences: offsets are contiguous and budget-bounded") {
    val one = Seq(
      (10L, "a b c"), (20L, "d e f g"), (30L, "h i"), (40L, "j k l m n"))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.packSequences(one, "doc_id", "text",
        budget = 5, bucketWidth = 25)
      .orderBy("doc_id")
      .select("doc_id", "n_toks", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // offsets 0,3,7,9 -> seqs 0,0,1,1; in-seq offsets 0,3,2,4
    assert(rows == Seq((10L, 3L, 0L, 0L), (20L, 4L, 0L, 3L),
      (30L, 2L, 1L, 2L), (40L, 5L, 1L, 4L)), rows.toString)
  }
}
