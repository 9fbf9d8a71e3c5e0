package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Word 3-shingles of a text column; texts shorter than 3 tokens use the
    * whole text as a single shingle.
    */
  def shingles(text: Column): Column = {
    val toks = split(lower(text), " ")
    when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2))))
      .otherwise(array(lower(text)))
  }

  /** k MinHash signature values: sig_j = min over shingles of
    * hash64(shingle, seed=j). Pure column math (array transform + min) —
    * no explode, no shuffle, one pass per row.
    */
  def minhashSigs(text: Column, k: Int): Seq[Column] = {
    val sh = shingles(text)
    (0 until k).map(j => array_min(transform(sh, s => Hashing.hash64(s, j))))
  }

  /** LSH banding: `bands` buckets per doc, each hashing `rowsPerBand`
    * consecutive signature values. Output long form:
    * (id, band, band_hash) — ready for a bucket self-join.
    */
  def minhashBands(df: DataFrame, idCol: String, textCol: String,
                   bands: Int, rowsPerBand: Int): DataFrame = {
    val sigs = minhashSigs(col(textCol), bands * rowsPerBand)
    val bandCols = (0 until bands).map { b =>
      val slice = (0 until rowsPerBand).map(r => sigs(b * rowsPerBand + r))
      struct(lit(b).as("band"),
        md5(concat_ws("_", slice.map(_.cast("string")): _*).cast("binary"))
          .as("band_hash"))
    }
    df.select(col(idCol), explode(array(bandCols: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"),
        col("bb.band_hash").as("band_hash"))
  }

  /** Candidate near-duplicate pairs: docs sharing any LSH band bucket.
    * The self-join key (band, band_hash) is uniformly distributed; the
    * pair set is Σ|bucket|² — the LSH guarantee, not |docs|².
    */
  def minhashCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                            bands: Int = 4, rowsPerBand: Int = 2): DataFrame = {
    val bb = minhashBands(df, idCol, textCol, bands, rowsPerBand)
    val a = bb.select(col("band"), col("band_hash"), col(idCol).as("id_a"))
    val b = bb.select(col("band"), col("band_hash"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  // ---- SimHash --------------------------------------------------------

  val SimhashBits = 32

  /** 32-bit SimHash over whitespace tokens: bit j of the result is set
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

  // ---- n-gram Jaccard -------------------------------------------------

  /** Exact Jaccard similarity over distinct word n-grams for candidate
    * pairs, via an inverted-index self-join (token → docs), never a cross
    * product. `candidates` restricts the pair space — in production the
    * candidate set comes from [[minhashCandidatePairs]]; here any
    * predicate works.
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
                   candidates: Column, minJaccard: Double): DataFrame = {
    val grams =
      if (n == 1) array_distinct(split(lower(col(textCol)), " "))
      else array_distinct(shingles(col(textCol)))
    val docs = df.filter(candidates)
      .select(col(idCol).as("id"), grams.as("grams"),
        size(grams).as("n_grams"))
    val inv = docs.select(col("id"), col("n_grams"),
      explode(col("grams")).as("gram"))
    val a = inv.select(col("gram"), col("id").as("id_a"),
      col("n_grams").as("na"))
    val b = inv.select(col("gram"), col("id").as("id_b"),
      col("n_grams").as("nb"))
    a.join(b, Seq("gram")).filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"), col("na"), col("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(col("id_a"), col("id_b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double"))
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }
}
