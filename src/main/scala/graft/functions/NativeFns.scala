package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.CleanTextExpr

/** Public facade over graft's native Catalyst expressions (which live in
  * org.apache.spark.sql.graft for access to private[sql] plumbing).
  */
object native_fns {
  /** Fused single-pass _clean_text (SURVEY §2.3 F1) with codegen. */
  def clean_text(c: Column): Column = CleanTextExpr.clean_text(c)

  /** Fused exact integer dot product over quantized vectors. */
  def quantized_dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.QuantizedDot.quantized_dot(a, b)

  /** Fused dot product over double vectors (the model-application
    * sibling of quantized_dot — PCA projection against irrational
    * literal eigenvectors).
    */
  def double_dot(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.DoubleDot.double_dot(a, b)

  /** Karp-Rabin polynomial fingerprint of a string's UTF-8 bytes. */
  def rolling_hash(c: Column): Column =
    org.apache.spark.sql.graft.RollingHash.rolling_hash(c)

  /** Unicode normalization (NFC/NFD/NFKC/NFKD), codegen'd with an
    * ASCII fast path.
    */
  def unicode_normalize(c: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graft.UnicodeNormalizeExpr.unicode_normalize(c, form)

  /** Accent stripping (NFD → drop combining marks → NFC). */
  def strip_accents(c: Column): Column =
    org.apache.spark.sql.graft.UnicodeNormalizeExpr.strip_accents(c)

  /** Distributed Bloom-filter build over a LONG key column (Catalyst's
    * runtime-filter aggregate; returns the serialized filter as BINARY).
    */
  def bloom_filter_agg(key: Column, estimatedItems: Long,
                       numBits: Long): Column =
    org.apache.spark.sql.graft.BloomFilterFns
      .bloom_filter_agg(key, estimatedItems, numBits)

  /** Bloom probe: false = definitely absent. `bloom` must be foldable
    * (`lit(filterBytes)`); codegen'd so it rides the scan.
    */
  def might_contain(bloom: Column, key: Column): Column =
    org.apache.spark.sql.graft.BloomFilterFns.might_contain(bloom, key)

  /** Jaro-Winkler string similarity (prefix-boosted), codegen'd —
    * the entity-resolution pair scorer.
    */
  def jaro_winkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.JaroWinklerExpr.jaro_winkler(a, b)

  /** Longest common prefix (in elements) of two string arrays — the
    * suffix-array LCP kernel: one codegen'd loop with an early break
    * at the first mismatch, vs the interpreted zip_with+aggregate HOF
    * pair that always walks min(|a|,|b|).
    */
  def token_lcp(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.TokenLcpExpr.token_lcp(a, b)

  /** Equi-depth bucket id `#{bounds <= value}` via a codegen'd binary
    * search over an ascending bounds array — the bucket-assignment
    * kernel of the two-phase rank machinery (O(log |bounds|) probes vs
    * the interpreted HOF scan's O(|bounds|) lambda steps per row).
    */
  def bucket_index(bounds: Column, value: Column): Column =
    org.apache.spark.sql.graft.BucketIndex.bucket_index(bounds, value)

  /** Misra-Gries heavy-hitter sketch aggregate (TypedImperativeAggregate,
    * O(k) state, mergeable): `map<string,bigint>` of ≤ k candidates,
    * complete for true frequency > N/(k+1).
    */
  def mg_sketch(c: Column, k: Int): Column =
    org.apache.spark.sql.graft.MisraGriesAgg.mg_sketch(c, k)

  /** N-row merge aggregate over serialized KLL doubles sketches — the
    * one piece Spark 4.1's built-in KLL surface lacks (its
    * `kll_sketch_merge_double` is pairwise only; a persisted state
    * table has one sketch per (group, epoch) with unbounded epochs).
    * Wire-compatible with the `kll_sketch_agg_double` /
    * `kll_sketch_get_quantile_double` built-ins, which cover
    * everything else.
    */
  def kll_merge(c: Column, k: Int = 200): Column =
    org.apache.spark.sql.graft.KllQuantileAgg.kll_merge(c, k)
}
