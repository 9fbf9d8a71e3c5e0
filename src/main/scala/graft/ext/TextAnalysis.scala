package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Text-analysis operators for a training-data pipeline (builder brief +
  * SURVEY §7.4): language ID, quality scoring, token counting, document
  * fingerprinting. All are row-local column expressions — no shuffle, no
  * UDF, fully codegen'd — so they scale linearly with input splits: the
  * 100 TB plan is scan → project, nothing else.
  */
object TextAnalysis {

  /** Whitespace tokens (lowercased). */
  def tokens(text: Column): Column = split(lower(text), " ")

  /** Stopword lists per language for the n-gram/stopword lang-ID
    * heuristic. Tiny on purpose: they live in the closure as literals,
    * broadcast with the plan, never a join.
    */
  val LangStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "los", "y", "que", "en"),
    "fr" -> Seq("le", "la", "et", "les", "des"))

  /** Count of tokens belonging to a fixed vocabulary (multiset count —
    * repeated stopwords count every occurrence).
    */
  def vocabHits(toks: Column, vocab: Seq[String]): Column =
    size(filter(toks, t => t.isin(vocab: _*)))

  /** Language-ID: argmax of per-language stopword hits with a fixed
    * precedence order on ties (earlier list wins). Returns the language
    * code, or "und" when no stopword matched at all.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = LangStopwords.map { case (l, ws) => l -> vocabHits(toks, ws) }
    val best = scores.tail.foldLeft(scores.head._2)((m, s) => greatest(m, s._2))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (l, sc)) =>
      when(sc === best && best > 0, lit(l)).otherwise(acc)
    }
    pick
  }

  /** Characteristic character trigrams per language (function-word
    * morphology, space-padded to catch word boundaries). Literal lists —
    * they ride the plan, never a join.
    */
  val LangTrigrams: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" th", "the", "he ", "ing", " an", "nd ", " of", "ion"),
    "de" -> Seq("der", "ein", "sch", "ich", "die", "und", "ung", "cht"),
    "es" -> Seq(" de", "que", " la", "ien", "los", " es", "ado", "nte"),
    "fr" -> Seq(" de", "les", "ent", " le", "des", "une", "eur", "ais"))

  /** Occurrence count of a literal substring — `(len - len(remove)) `,
    * pure `length`/`replace` arithmetic: stays inside whole-stage
    * codegen, no token explode, no regex engine. (Counts are 3× the
    * occurrence count for trigrams; uniform across patterns, so argmax
    * and ties are unchanged.)
    */
  private def charHits(padded: Column, pat: String): Column =
    length(padded) - length(replace(padded, lit(pat), lit("")))

  /** Language-ID v2, the character-n-gram heuristic: score = summed
    * profile-trigram occurrences over the space-padded lowercased text,
    * argmax with fixed precedence (earlier profile wins ties), "und"
    * when nothing matches; CJK scripts short-circuit to "zh" when more
    * than 30% of characters fall in the unified-ideograph range (trigram
    * profiles are useless without word separators). Unlike [[langId]]'s
    * whole-token stopword hits, trigrams see inflected forms
    * ("thing" hits " th"/"ing") — the standard trick langid.c/fastText
    * distill down to.
    */
  def langIdNgram(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val cjk = size(split(text, "[\\u4e00-\\u9fff]")) - 1
    val scores = LangTrigrams.map { case (l, tris) =>
      l -> tris.map(charHits(padded, _)).reduce(_ + _)
    }
    val best = scores.map(_._2).reduce(greatest(_, _))
    val pick = scores.reverse.foldLeft(lit("und")) { case (acc, (l, sc)) =>
      when(sc === best && best > 0, lit(l)).otherwise(acc)
    }
    when(cjk.cast("double") > length(text) * lit(0.3), lit("zh"))
      .otherwise(pick)
  }

  /** Quality features (length / punctuation / stopword ratios) and a
    * composite keep-score in [0,1].
    */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nWords = size(toks)
    val nChars = length(t)
    val punct = length(regexp_replace(t, "[a-z0-9 ]", ""))
    val stop = vocabHits(toks, LangStopwords.flatMap(_._2).distinct)
    df.withColumn("n_words", nWords)
      .withColumn("n_chars_obs", nChars)
      .withColumn("punct_ratio",
        punct.cast("double") / greatest(nChars, lit(1)).cast("double"))
      .withColumn("stopword_ratio",
        stop.cast("double") / greatest(nWords, lit(1)).cast("double"))
      .withColumn("mean_word_len",
        (nChars - (nWords - lit(1))).cast("double") /
          greatest(nWords, lit(1)).cast("double"))
  }

  /** Token counting: whitespace tokens + a BPE-ish regex segmentation
    * (letter runs, digit runs, punctuation runs).
    */
  /** Feature hashing (the hashing trick, Weinberger et al. 2009): map
    * each document to a sparse `dim`-bucket vector with no vocabulary —
    * bucket = hash(token) mod dim, weight = Σ ±1 per occurrence (the
    * sign hash makes collisions cancel in expectation, keeping inner
    * products unbiased). The vectorizer for classifiers at corpus scale:
    * nothing is learned, so there is no vocab table to build, broadcast,
    * or version — new tokens hash like any other.
    *
    * One explode + one (id, bucket) group-by — map-side combined, output
    * ∝ non-zero buckets. Both hashes are [[Hashing.hash64]] md5 derivations
    * (engine-portable): bucket from seed, sign from seed+1.
    * Output: (idCol, bucket INT, weight LONG) sparse rows; zero-weight
    * buckets (exact cancellation) are DROPPED.
    */
  def hashFeatures(df: DataFrame, idCol: String, textCol: String,
                   dim: Int, seed: Int = 0): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    df.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
      .filter(col("__tok") =!= "")
      .select(col(idCol),
        pmod(Hashing.hash64(col("__tok"), seed), lit(dim.toLong))
          .cast("int").as("bucket"),
        (pmod(Hashing.hash64(col("__tok"), seed + 1), lit(2L)) * 2 - 1)
          .as("__sgn"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("__sgn")).as("weight"))
      .filter(col("weight") =!= 0L)
  }

  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("ws_tokens", size(tokens(col(textCol))))
      .withColumn("re_tokens",
        size(regexp_extract_all(lower(col(textCol)),
          lit("[a-z]+|[0-9]+|[^a-z0-9 \\t\\n\\x0B\\f\\r]+"), lit(0))))

  /** Content-defined document fingerprint: hash of the sorted distinct
    * token set (word-order/duplication invariant — catches shuffled or
    * re-joined copies that exact hashing misses).
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ",
      array_sort(array_distinct(tokens(text)))).cast("binary"))

  /** Position-sensitive rolling-hash fingerprint (Karp-Rabin over UTF-8
    * bytes, native codegen'd expression) — the complement to
    * [[fingerprint]]: detects byte-identical prefixes/content order,
    * and is the primitive for content-defined chunking.
    */
  def rollingFingerprint(text: Column): Column =
    graft.functions.native_fns.rolling_hash(text)

  /** TF-IDF over whitespace tokens: tf = in-document term count,
    * df = documents containing the term, idf = ln(N/df),
    * score = tf·idf. Two aggregates ((doc,token) counts and doc
    * frequency) + one broadcast-sized join on the distinct-token table.
    * N rides the plan as a broadcast 1-row aggregate (`crossJoin`), so
    * the operator is fully lazy — no driver-side action at plan-build
    * time, and the count leg is a zero-column scan (parquet answers it
    * from footer metadata, not data pages). Exact integer tf/df; the
    * transcendental idf is the only double (rounded by callers needing
    * cross-engine reproducibility).
    */
  /** Source×source n-gram overlap matrix — the corpus-level
    * cross-contamination audit: for each pair of sources WITH at least
    * one shared gram, the Jaccard of their DISTINCT shingle
    * vocabularies (3-gram shingles, the dedup family's gram semantics
    * via [[Dedup.shinglesOf]]). Zero-intersection pairs are ABSENT
    * from the output (the inner pair-join never materializes them) —
    * callers wanting the dense matrix outer-join against the source
    * list and fill jaccard 0. High
    * overlap between a train source and an eval source is the leakage
    * signal the per-document `x_decontaminate` check inspects one doc
    * at a time; this is the fleet-level view.
    *
    * Shape (measured 6.0 s → sub-second at sf0.1 over the naive
    * posting-list formulation): grams fold to 60-bit md5 ids BEFORE
    * the per-source distinct, so the big shuffle moves fixed-width
    * longs instead of 3-gram strings ([[graft.functions.Hashing]] —
    * identical in DuckDB, so a collision changes both engines the same
    * way); each gram then folds to ONE source-BITMASK row (`bit_or` of
    * `1 << source_index`, ≤ 63 sources by contract), and the mask
    * table aggregates to (mask, n) — everything past the two gram
    * aggregates is MASK-cardinality-sized, and a corpus that shares
    * its vocabulary across all sources produces a handful of mask
    * rows, not grams × pairs. Pair counts come from exploding each
    * mask's set-bit list twice (tiny: ≤ 64² per mask row) and summing
    * n; per-source sizes and names join back by broadcast. Counts
    * exact longs; jaccard one IEEE division.
    *
    * The source→bit index is the sorted distinct source list — a
    * bounded (≤ 64-row) driver collect, the codebook convention.
    *
    * Output: (source_a, source_b, na, nb, inter, jaccard), ordered.
    */
  def sourceOverlap(df: DataFrame, sourceCol: String,
                    textCol: String): DataFrame = {
    val spark = df.sparkSession
    // shingleRows (not shinglesOf+explode): the array-HOF convenience
    // form re-evaluates its interpreted lambda tower per row and
    // measured 5.8 s end-to-end at sf0.1; the zipped-slice row form
    // reads a materialized token attribute
    val grams = Dedup.shingleRows(
        df.select(col(sourceCol).as("src"), col(textCol).as("__text")),
        "src", "__text")
      .select(col("src"),
        graft.functions.Hashing.hash64(col("shingle"), 71).as("g"))
      .distinct()
      // referenced three times below (source list, sizes, masks) — the
      // explode+hash+distinct must not re-run per reference
      .localCheckpoint(false)
    val srcNames = grams.select(col("src")).distinct()
      .collect().map(_.getString(0)).sorted
    // 63, not 64: bit index 63 is Long's sign bit — Spark's
    // shiftleft(1, 63) wraps to Long.MinValue while an ANSI engine
    // (the DuckDB oracle) raises on CAST(1 AS BIGINT) << 63, a
    // cross-engine break right at the boundary. 63 sources keep the
    // mask arithmetic in the non-negative Long domain on both.
    require(srcNames.length <= 63,
      s"sourceOverlap bitmask holds <= 63 sources (bit 63 is the " +
        s"Long sign bit), got ${srcNames.length}")
    import scala.jdk.CollectionConverters._
    val idxDf = spark.createDataFrame(
      srcNames.zipWithIndex.map { case (s, i) =>
        org.apache.spark.sql.Row(s, i.toLong) }.toSeq.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("src",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("idx",
          org.apache.spark.sql.types.LongType))))
    val sizes = grams.groupBy(col("src")).agg(count(lit(1)).as("ng"))
    val maskCounts = grams.join(broadcast(idxDf), Seq("src"))
      .select(col("g"), expr("shiftleft(CAST(1 AS BIGINT), idx)").as("bit"))
      .groupBy(col("g")).agg(expr("bit_or(bit)").as("mask"))
      .groupBy(col("mask")).agg(count(lit(1)).as("n"))
    val interIdx = maskCounts
      .withColumn("bits", expr(
        "filter(sequence(0, 62), i -> (shiftright(mask, i) & 1) = 1)"))
      .select(col("n"), explode(col("bits")).as("ia"), col("bits"))
      .select(col("n"), col("ia"), explode(col("bits")).as("ib"))
      .filter(col("ia") < col("ib"))
      .groupBy(col("ia"), col("ib")).agg(sum(col("n")).as("inter"))
    interIdx
      .join(broadcast(idxDf.select(col("src").as("source_a"),
        col("idx").as("ia"))), Seq("ia"))
      .join(broadcast(idxDf.select(col("src").as("source_b"),
        col("idx").as("ib"))), Seq("ib"))
      .join(broadcast(sizes.select(col("src").as("source_a"),
        col("ng").as("na"))), Seq("source_a"))
      .join(broadcast(sizes.select(col("src").as("source_b"),
        col("ng").as("nb"))), Seq("source_b"))
      .select(col("source_a"), col("source_b"), col("na"), col("nb"),
        col("inter"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
          .as("jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  def tfidf(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val nDocs = df.agg(count(lit(1)).cast("double").as("__n_docs"))
    // tf feeds dfreq AND the weighting join — one tokenize pass, not
    // two (the bm25TopK/unigramLogProb convention)
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val dfreq = tf.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
    tf.join(dfreq, Seq("token"))
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf", col("tf") * log(col("__n_docs") / col("df")))
      .drop("__n_docs")
  }

  /** Sparse retrieval counterpart of the dense ANN family: TF-IDF
    * cosine similarity between all document pairs sharing at least one
    * token, generated from the inverted index (postings self-equi-join
    * on token — pair work is Σ df², never |docs|²; `maxDf` drops
    * stopword-grade tokens that would go quadratic while carrying no
    * signal, the [[Dedup.jaccardPairs]] guard).
    *
    * Reproducibility: weights are quantized to an integer grid
    * (tf · round(idf, 9) · 10⁶, exact in a long), dot products and
    * norms accumulate those integers in DECIMAL (exact, order-
    * independent under any partitioning), and cosine divides at the
    * output boundary in double. A float tf-idf dotted in doubles would
    * change low bits with every shuffle reorder; this never does.
    *
    * Returns (id_a, id_b, cosine) for pairs with cosine >= minCosine.
    *
    * The quantized-weight table is referenced three times (norms and
    * both postings sides) and its token-frequency parent twice; a lazy
    * `localCheckpoint` on each materializes the weight derivation ONCE
    * (the multi-reference-subtree convention — lazy checkpoints keep
    * the plan action-free and oracle-deterministic). Measured 1.0 s →
    * 0.41 s at sf0.1; at corpus scale the checkpoint doubles as the
    * materialized tf-idf table a production pipeline would persist.
    */
  def tfidfSimilarPairs(df: DataFrame, idCol: String, textCol: String,
                        minCosine: Double,
                        maxDf: Long = 1000): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val n = df.agg(count(lit(1)).cast("double").as("nd"))
    val tf = df
      .select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val wq = tf.join(dfreq, Seq("token"))
      .filter(if (maxDf > 0) col("df") <= maxDf else lit(true))
      .crossJoin(broadcast(n))
      .select(col(idCol), col("token"),
        round(col("tf") * round(log(col("nd") / col("df")), 9) * 1e6)
          .cast("long").as("wq"))
      .localCheckpoint(false)
    val norms = wq.groupBy(col(idCol))
      .agg(sum(col("wq").cast(DecimalType(38, 0)) * col("wq"))
        .cast("double").as("norm2"))
    val a = wq.select(col(idCol).as("id_a"), col("token"), col("wq").as("wa"))
    val b = wq.select(col(idCol).as("id_b"), col("token"), col("wq").as("wb"))
    val dots = a.join(b, Seq("token"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("wa").cast(DecimalType(38, 0)) * col("wb"))
        .cast("double").as("dot"))
    dots
      .join(norms.select(col(idCol).as("id_a"), col("norm2").as("na")), Seq("id_a"))
      .join(norms.select(col(idCol).as("id_b"), col("norm2").as("nb")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        round(col("dot") / (sqrt(col("na")) * sqrt(col("nb"))), 6)
          .as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** Corpus-unigram language-model scoring — the perplexity-proxy
    * quality signal: tokens that are rare IN THIS CORPUS are surprising,
    * and documents dominated by surprising tokens (gibberish, OCR noise,
    * wrong-language fragments) score high. score = Σ tf·(−ln c/N) / Σ tf
    * with c = corpus count of the token, N = corpus token total.
    *
    * Shape: the same two aggregates as [[tfidf]] plus a join of the
    * (doc, token) table against the unigram table keyed by token —
    * zipfian-skewed at scale, which AQE's skew join handles (or
    * broadcast the head of the vocabulary; the tail is tiny). N rides
    * the plan as a broadcast 1-row aggregate — fully lazy, no driver
    * action. Per-token terms are rounded into DECIMAL(28,9) before the
    * per-doc sum so accumulation is exact and order-independent — the
    * repo-wide reproducibility discipline (a double sum re-ordered by a
    * shuffle changes low bits; a decimal sum never does).
    *
    * Returns (idCol, n_tokens, neg_logprob_sum, avg_neg_logprob).
    */
  def unigramLogProb(df: DataFrame, idCol: String,
                     textCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // tf feeds BOTH the corpus model aggregate and the scoring join —
    // barrier it so the tokenize+aggregate runs once (the bm25TopK
    // convention; Catalyst inlines the subtree per reference)
    val tf = df.select(col(idCol), explode(tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val counts = tf.groupBy(col("token")).agg(sum(col("tf")).as("c"))
    val total = counts.agg(sum(col("c")).cast("double").as("__total"))
    tf.join(counts, Seq("token"))
      .crossJoin(broadcast(total))
      .select(col(idCol), col("tf"),
        (col("tf").cast("double") *
          -log(col("c").cast("double") / col("__total")))
          .cast(DecimalType(28, 9)).as("term"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("term")).cast("double").as("neg_logprob_sum"))
      .withColumn("avg_neg_logprob",
        col("neg_logprob_sum") / col("n_tokens").cast("double"))
  }

  /** Per-document add-α smoothed bigram LM surprisal — the next step up
    * from [[unigramLogProb]] on the KenLM-style quality-filter ladder:
    * `P(w2|w1) = (c(w1,w2) + α) / (c(w1) + α·V)` with corpus-wide
    * counts, scored as `Σ tf·-ln P` over each document's adjacent pairs.
    *
    * Shapes for scale: bigram extraction is ROW-LOCAL (slice+zip of the
    * materialized token array — no posexplode self-join, no per-doc
    * window shuffle); corpus model = one group-by of the per-doc bigram
    * partials; context counts c(w1) are derived FROM the bigram table
    * (Σ_w2 c(w1,w2)), so model mass is self-consistent and the corpus
    * is never re-scanned; V and the model join back by bigram key.
    * Terms are DECIMAL(28,9)-cast before summing (order-independent
    * doubles — the unigramLogProb parity contract).
    */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
                    alpha: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    // materialize the token array BEFORE the lambdas index it (HOF
    // lambdas sit outside codegen CSE — the round-1 shingle trap)
    val toks = df.select(col(idCol), tokens(col(textCol)).as("t"))
    val pairs = toks.select(col(idCol),
      explode(zip_with(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    // tf feeds the model derivation AND the scoring join, cb feeds ctx
    // AND the join — without barriers each reference re-runs the bigram
    // explode+aggregate (measured 0.93 s → 0.44 s with them). The tf
    // checkpoint is the (doc, bigram) count table — the same size class
    // as the shuffle output that already exists for it.
    val tf = pairs.groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(false)
    val cb = tf.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("cb"))
      .localCheckpoint(false)
    val ctx = cb.groupBy(col("w1")).agg(sum(col("cb")).as("ctx"))
    val vocabSize = df
      .select(explode(tokens(col(textCol))).as("token"))
      .agg(countDistinct(col("token")).cast("double").as("__v"))
    tf.join(cb, Seq("w1", "w2"))
      .join(ctx, Seq("w1"))
      .crossJoin(broadcast(vocabSize))
      .select(col(idCol), col("tf"),
        (col("tf").cast("double") *
          -log((col("cb").cast("double") + alpha) /
               (col("ctx").cast("double") + col("__v") * alpha)))
          .cast(DecimalType(28, 9)).as("term"))
      .groupBy(col(idCol))
      .agg(sum(col("tf")).as("n_bigrams"),
        sum(col("term")).cast("double").as("neg_logprob_sum"))
      .withColumn("avg_neg_logprob",
        col("neg_logprob_sum") / col("n_bigrams").cast("double"))
  }

  /** Per-document character-distribution entropy — the cheap
    * "compressibility" quality signal (near-zero for repeated-char
    * spam, high for natural text; the poor man's gzip-ratio filter).
    * Computed as `H = ln(n) - (Σ c·ln c)/n` so the only shuffled rows
    * are the per-(doc, char) partial counts; the per-char `c·ln c`
    * terms are DECIMAL-cast before summing so accumulation order
    * cannot move the double result (the unigramLogProb trick).
    */
  def charEntropy(df: DataFrame, idCol: String,
                  textCol: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    df.select(col(idCol),
      explode(filter(split(col(textCol), ""), s => s =!= "")).as("ch"))
      .groupBy(col(idCol), col("ch")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n"),
        sum((col("c").cast("double") * log(col("c").cast("double")))
          .cast(DecimalType(28, 9))).cast("double").as("__s"))
      .select(col(idCol), col("n"),
        // 9dp: JVM and C libm ln() disagree in the last ulp for some
        // inputs; the metric is meaningful to ~1e-9 at most
        round(log(col("n").cast("double")) -
          col("__s") / col("n").cast("double"), 9).as("char_entropy"))
  }

  /** Corpus-level bigram phrase mining (word2vec/gensim-style): for
    * every adjacent token pair, `pmi = ln(c_xy · N / (c_x · c_y))`
    * over corpus-wide counts — the signal that turns "new york" into
    * one token before embedding training. Three partial-aggregated
    * group-bys (unigrams, bigrams, total) and two hash joins of the
    * bigram table against the unigram table; nothing touches the
    * corpus more than once.
    */
  def phraseScores(df: DataFrame, textCol: String,
                   minCount: Long = 2): DataFrame = {
    val toks = df.select(tokens(col(textCol)).as("syms"), lit(1L).as("n"))
    val bigrams = Bpe.pairCounts(toks)
      .filter(col("total") >= minCount)
      .select(col("x"), col("y"), col("total").as("c_xy"))
    val uni = df.select(explode(tokens(col(textCol))).as("t"))
      .filter(col("t") =!= "")
      .groupBy(col("t")).agg(count(lit(1)).as("c"))
    val total = uni.agg(sum(col("c")).as("__n_tokens"))
    bigrams
      .join(uni.select(col("t").as("x"), col("c").as("c_x")), Seq("x"))
      .join(uni.select(col("t").as("y"), col("c").as("c_y")), Seq("y"))
      .crossJoin(broadcast(total))
      .select(col("x"), col("y"), col("c_xy"),
        // 9dp: last-ulp libm ln() portability (see charEntropy)
        round(log((col("c_xy") * col("__n_tokens")).cast("double") /
          (col("c_x") * col("c_y")).cast("double")), 9).as("pmi"))
  }

  /** Skip-gram context pairs — the word2vec/GloVe co-occurrence input:
    * every ordered token pair (w, c) with c at distance 1..`window`
    * AFTER w, counted corpus-wide (the directional half; symmetric
    * counts are the sum of both directions).
    *
    * Pair generation is ROW-LOCAL: for each offset k the token array is
    * zip_with'ed against its own k-shifted slice (the bigramLogProb
    * idiom generalized), so no posexplode self-join, no per-doc window
    * shuffle — the only exchange is the final count group-by, which
    * map-side combines. Fan-out per token is exactly `window` struct
    * rows; at 100 TB the shuffle carries (pair, partial-count) rows,
    * bounded by the distinct-pair count per partition, not token count.
    */
  def skipgramPairs(df: DataFrame, textCol: String,
                    window: Int = 2): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    // Two chained codegen'd Generates (posexplode + explode of the
    // w-anchored slice) replace the per-offset zip_with/slice tower:
    // higher-order functions are CodegenFallback (interpreted per row),
    // and the tower built window× struct arrays per document before the
    // flatten — measured 0.53 s single-stage for x_skipgram at sf0.1 vs
    // 0.2 s for this shape (r14). Whole-stage codegen pipelines both
    // loops over the SAME array reference — per-token fan-out is still
    // exactly `window` (w, c) rows and the only exchange is still the
    // map-side-combined count group-by, so the 100 TB contract is
    // unchanged.
    val toks = df.select(tokens(col(textCol)).as("t"))
    toks
      .select(col("t"), posexplode(col("t")).as(Seq("i", "w")))
      .select(col("w"),
        explode(slice(col("t"), col("i") + lit(2), lit(window))).as("c"))
      .filter(col("w") =!= "" && col("c") =!= "")
      .groupBy(col("w"), col("c"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Perplexity-quantile quality gate: keep the documents whose
    * average unigram surprisal falls at or below the corpus p-quantile
    * — the "drop the weirdest (1-p) of the corpus" filter of LM data
    * curation, with the threshold learned from the corpus itself
    * rather than hand-tuned. One extra aggregate over the per-doc
    * metric table plus a broadcast of the single threshold row; the
    * metric table is computed once (same DAG feeds both sides).
    *
    * `exact = false` (production default) estimates the quantile with
    * the mergeable `percentile_approx` sketch — per-partition sketches
    * combine, nothing gathers the full distribution. `exact = true`
    * (oracle/testing) uses exact `percentile`, which buffers the
    * distribution in one aggregation buffer: fine to ~10⁷ docs, not a
    * 100 TB path.
    */
  def qualityQuantileGate(df: DataFrame, idCol: String, textCol: String,
                          p: Double, exact: Boolean = false): DataFrame = {
    require(p > 0.0 && p < 1.0, s"p must be in (0, 1), got $p")
    // the LM scoring pass feeds BOTH the threshold aggregate and the
    // gate filter — without a barrier the whole unigram pipeline runs
    // twice (measured: 6 scans, no reuse)
    val lm = unigramLogProb(df, idCol, textCol).localCheckpoint(false)
    val thrAgg =
      if (exact) expr(s"percentile(avg_neg_logprob, $p)")
      else percentile_approx(col("avg_neg_logprob"), lit(p), lit(10000))
    val thr = lm.agg(thrAgg.as("__thr"))
    lm.crossJoin(broadcast(thr))
      .filter(col("avg_neg_logprob") <= col("__thr"))
      .drop("__thr")
  }

  /** Repetition statistics (the Gopher/C4 quality-filter family):
    * per-document token counts, distinct ratio, and the mass of the
    * most-repeated unigram/bigram — the signals that catch boilerplate,
    * keyword-stuffed, and looping documents. Computed with explode +
    * partial-aggregated group-bys keyed by doc id (one shuffle per
    * n-gram order, map-side combine does the heavy lifting), never a
    * per-row nested loop over the token array.
    *
    * `gopher_keep` applies the published Gopher-style thresholds:
    * 50 ≤ tokens, mean word length in [3, 10], distinct-token ratio
    * > 0.2, top-unigram mass < 0.3, top-bigram mass < 0.18.
    *
    * Returns (idCol, n_tokens, n_distinct, distinct_ratio,
    * top_unigram_frac, top_bigram_frac, mean_word_len, gopher_keep).
    */
  def repetitionStats(df: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    def topFrac(n: Int, frac: String) = {
      // explode-first gram stream (codegen'd concat) — the per-row
      // transform-lambda form measured 3.4s of the 3.6s query at sf0.1
      val grams = Dedup.ngramRows(df, idCol, textCol, n, gramCol = "g")
      grams.groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
        .groupBy(col(idCol))
        .agg((max(col("c")).cast("double") / sum(col("c")).cast("double"))
          .as(frac))
    }
    val base = {
      val toks = df.select(col(idCol),
        length(col(textCol)).as("n_chars_obs"),
        explode(tokens(col(textCol))).as("t"))
      toks.groupBy(col(idCol))
        .agg(count(lit(1)).as("n_tokens"),
          count_distinct(col("t")).as("n_distinct"),
          // constant per group; max() rather than first() for a
          // deterministic plan
          max(col("n_chars_obs")).as("n_chars_obs"))
    }
    base
      .join(topFrac(1, "top_unigram_frac"), Seq(idCol))
      .join(topFrac(2, "top_bigram_frac"), Seq(idCol))
      .select(col(idCol), col("n_tokens"), col("n_distinct"),
        (col("n_distinct").cast("double") / col("n_tokens").cast("double"))
          .as("distinct_ratio"),
        col("top_unigram_frac"), col("top_bigram_frac"),
        ((col("n_chars_obs") - (col("n_tokens") - 1)).cast("double") /
          col("n_tokens").cast("double")).as("mean_word_len"))
      .withColumn("gopher_keep",
        col("n_tokens") >= 50 &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("distinct_ratio") > 0.2 &&
          col("top_unigram_frac") < 0.3 &&
          col("top_bigram_frac") < 0.18)
  }

  /** PII patterns shared with the SQL oracle: no lookarounds, no
    * engine-specific classes — the subset Java regex and RE2 agree on.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", "https?://[^ ]+", "<URL>"),
    ("phone", "\\+[0-9][0-9()\\- ]{6,}[0-9]", "<PHONE>"))

  /** PII redaction: replace emails, URLs, and international-format
    * phone numbers with typed placeholder tokens — the standard scrub
    * step before corpus release. Row-local regexp chain, codegen'd;
    * order matters (emails before URLs would double-hit rarely, so URL
    * runs after email and the phone pattern requires a leading `+` to
    * stay out of ordinary digit runs).
    */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, rx, tok)) =>
      regexp_replace(c, rx, tok)
    }

  /** Per-document PII hit counts + the redacted text. */
  def piiScan(df: DataFrame, textCol: String): DataFrame =
    PiiPatterns.foldLeft(df) { case (d, (name, rx, _)) =>
      d.withColumn(s"n_$name",
        size(regexp_extract_all(col(textCol), lit(rx), lit(0))))
    }.withColumn("redacted", redactPii(col(textCol)))

  /** Vocabulary construction: token → corpus frequency → dense id by
    * (count desc, token asc) — the id assignment step of tokenizer
    * training. One explode + one partial-aggregated group-by, then a
    * DISTRIBUTED global rank: the counts table is range-sorted (stays
    * spread across partitions) and ids come from `zipWithIndex`, whose
    * per-partition offsets are computed by a cheap count job over the
    * already-shuffled sort output (the shuffle files are reused, the
    * corpus is scanned once). No single-partition `Window.orderBy`
    * funnel — a web-scale vocabulary (10⁸–10⁹ distinct tokens) ranks in
    * parallel across the cluster.
    */
  def vocabulary(df: DataFrame, textCol: String,
                 minCount: Long = 1): DataFrame = {
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    val spark = df.sparkSession
    val sorted = df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .sort(col("n").desc, col("token"))
    val schema = StructType(sorted.schema.fields :+
      StructField("token_id", IntegerType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (row, i) =>
      org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1).toInt)
    }
    spark.createDataFrame(indexed, schema)
  }

  /** Fixed token-window chunking for training sequences: windows of
    * `chunkSize` tokens starting every `chunkSize - overlap` tokens;
    * trailing windows may be short, and a doc shorter than a window
    * yields one chunk. Entirely row-local — per-doc starts explode from
    * a `sequence`, the slice reads the materialized token attribute
    * carried through the Generate — so the operator is a narrow map at
    * any corpus size; chunk ids are (doc, start)-derived, never a
    * global counter.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkSize: Int, overlap: Int = 0): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val step = chunkSize - overlap
    df.select(col(idCol), split(col(textCol), " ").as("toks"))
      .select(col(idCol), col("toks"),
        explode(sequence(lit(0),
          greatest(size(col("toks")) - 1, lit(0)), lit(step))).as("start"))
      .select(col(idCol),
        (col("start") / step).cast("int").as("chunk_id"),
        concat_ws(" ",
          slice(col("toks"), col("start") + 1, lit(chunkSize))).as("chunk"),
        least(size(col("toks")) - col("start"), lit(chunkSize))
          .as("n_toks"))
  }

  /** Rare-token scrub: rewrite each document with tokens below a
    * corpus-frequency floor removed — the gibberish/typo/token-noise
    * cleaning pass (OCR garbage and random strings are exactly the
    * tokens the corpus has never seen twice). One corpus scan builds
    * the token counts; the keep decision is a hash semi-join of the
    * positional token stream against the ABOVE-floor vocabulary
    * (common tokens match, so the join is the cheap direction); docs
    * reassemble by position. Returns (id, clean_text, n_kept,
    * n_removed).
    */
  def scrubRareTokens(df: DataFrame, idCol: String, textCol: String,
                      minCount: Long): DataFrame = {
    val toks = df.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("pos", "t")))
      .filter(col("t") =!= "")
    val keep = toks.groupBy(col("t")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount).select(col("t"))
    val marked = toks.join(keep, Seq("t"), "left_semi")
    val kept = marked.groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_kept"),
        concat_ws(" ", array_sort(collect_list(struct(col("pos"),
          col("t")))).getField("t")).as("clean_text"))
    df.select(col(idCol),
      size(filter(tokens(col(textCol)), t => t =!= "")).as("n_total"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        (col("n_total") - coalesce(col("n_kept"), lit(0))).as("n_removed"))
  }

  /** Content-defined chunking at token granularity: a chunk boundary
    * opens at every token whose hash lands in a 1/`avgChunk` bucket —
    * the Rabin/gear-CDC idea, lifted to tokens so it is engine-portable
    * and oracle-checkable. Unlike fixed-size windows, chunk boundaries
    * are a function of CONTENT: insert a paragraph at the front of a
    * document and every downstream chunk still hashes identically, so
    * chunk-level exact dedup catches shifted duplicates that
    * fixed-offset chunking never re-aligns. The cumulative boundary
    * count is windowed PER DOCUMENT (bounded by doc length, shuffled by
    * doc id) — no global state.
    */
  def contentChunks(df: DataFrame, idCol: String, textCol: String,
                    avgChunk: Int = 16, seed: Int = 0): DataFrame = {
    require(avgChunk >= 2, s"avgChunk must be >= 2, got $avgChunk")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, 0)
    df.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .withColumn("b",
        (pmod(graft.functions.Hashing.hash64(col("tok"), seed),
          lit(avgChunk.toLong)) === 0).cast("long"))
      .withColumn("chunk_id", sum(col("b")).over(w))
      .groupBy(col(idCol), col("chunk_id"))
      .agg(min(col("pos")).as("start_pos"),
        count(lit(1)).cast("int").as("n_toks"),
        concat_ws(" ", array_sort(collect_list(struct(col("pos"),
          col("tok")))).getField("tok")).as("chunk"))
  }

  /** Training-sequence packing: assign documents, in ascending `idCol`
    * order, to fixed token-budget sequences by contiguous fill — doc d's
    * sequence is `floor(offset(d) / budget)` where `offset(d)` is the
    * total token count of all earlier docs (concat-and-chunk packing; a
    * doc whose tokens straddle a budget boundary belongs to the sequence
    * it starts in). Returns (id, n_toks, seq_id, seq_offset).
    *
    * The global prefix sum is the scale hazard here: a naive
    * `sum(...).over(Window.orderBy(id))` has no partitionBy, so the whole
    * corpus funnels through ONE task. Instead, a two-phase distributed
    * prefix sum: docs map to order-preserving coarse buckets
    * (`id / bucketWidth` — monotone in id, so bucket order == id order);
    * phase 1 computes per-bucket token totals (a few hundred rows at any
    * corpus size) whose running totals become per-bucket starting
    * offsets; phase 2 adds a within-bucket cumulative sum, windowed BY
    * BUCKET — every partition does bounded work, and the only global
    * step is a window over the tiny bucket-totals table. One wide
    * shuffle (the per-bucket window), one broadcast join.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budget: Long, bucketWidth: Long = 1000L): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    val counted = df.select(col(idCol),
      (col(idCol).cast("long") / bucketWidth).cast("long").as("__bucket"),
      size(tokens(col(textCol))).cast("long").as("n_toks"))
    // phase 1: bucket totals -> exclusive running offsets (tiny table)
    val bucketOffsets = counted
      .groupBy(col("__bucket")).agg(sum(col("n_toks")).as("__btot"))
      .withColumn("__boff",
        coalesce(sum(col("__btot")).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("__bucket"))
            .rowsBetween(org.apache.spark.sql.expressions.Window
              .unboundedPreceding, -1)), lit(0L)))
      .drop("__btot")
    // phase 2: within-bucket exclusive cumsum + bucket offset
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__bucket")).orderBy(col(idCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    counted
      .join(broadcast(bucketOffsets), Seq("__bucket"))
      .withColumn("__off",
        col("__boff") + coalesce(sum(col("n_toks")).over(wb), lit(0L)))
      .select(col(idCol), col("n_toks"),
        (col("__off") / budget).cast("long").as("seq_id"),
        (col("__off") % budget).as("seq_offset"))
  }

  /** Length-bucketed batch construction — the training-loader trick
    * that cuts padding waste: documents land in a length bucket
    * (`bucketBounds` are the inclusive upper edges; the last bucket is
    * open-ended), and within each bucket are packed into fixed-size
    * batches in ascending `idCol` order, so every batch holds
    * similar-length sequences and pads only to its own bucket's edge.
    * Returns (id, len, len_bucket, batch_idx, batch_pos).
    *
    * The per-bucket rank is the [[packSequences]] two-phase prefix sum
    * (counts per (bucket, coarse id range) → running offsets over the
    * tiny range table → within-range `row_number`), NOT a
    * `Window.partitionBy(len_bucket)` — with a handful of buckets that
    * window funnels 1/|buckets| of the corpus through single tasks;
    * here every partition does bounded work and the only global window
    * runs over |buckets| × |ranges| rows.
    */
  def lengthBatches(df: DataFrame, idCol: String, lenCol: String,
                    bucketBounds: Seq[Long], batchSize: Int,
                    idBucketWidth: Long = 1000L): DataFrame = {
    require(bucketBounds.nonEmpty, "need at least one bucket bound")
    require(bucketBounds == bucketBounds.sorted && bucketBounds.distinct
      .lengthCompare(bucketBounds.size) == 0,
      "bucketBounds must be strictly increasing")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    require(idBucketWidth >= 1,
      s"idBucketWidth must be >= 1, got $idBucketWidth")
    import org.apache.spark.sql.expressions.Window
    // row-local bucket id: number of bounds strictly below len
    val lenBucket = bucketBounds.map(b =>
      when(col(lenCol) > b, 1L).otherwise(0L)).reduce(_ + _)
    val based = df.select(col(idCol), col(lenCol).cast("long").as("len"),
      lenBucket.as("len_bucket"),
      (col(idCol).cast("long") / idBucketWidth).cast("long").as("__coarse"))
    // phase 1: per-(bucket, coarse) counts -> exclusive running offsets
    // within each bucket; |buckets| x |coarse ranges| rows, broadcastable
    val offsets = based.groupBy(col("len_bucket"), col("__coarse"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off",
        coalesce(sum(col("__n")).over(
          Window.partitionBy(col("len_bucket")).orderBy(col("__coarse"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__n")
    // phase 2: within-(bucket, coarse) rank + offset = global per-bucket
    // rank; batch index and position fall out arithmetically
    val wr = Window.partitionBy(col("len_bucket"), col("__coarse"))
      .orderBy(col(idCol))
    based.join(broadcast(offsets), Seq("len_bucket", "__coarse"))
      .withColumn("__rank",
        col("__off") + row_number().over(wr).cast("long") - 1L)
      .select(col(idCol), col("len"), col("len_bucket"),
        (col("__rank") / batchSize).cast("long").as("batch_idx"),
        (col("__rank") % batchSize).as("batch_pos"))
  }
}
