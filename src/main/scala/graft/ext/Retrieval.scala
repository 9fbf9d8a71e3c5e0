package graft.ext

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Lexical retrieval + rank fusion for a training-data pipeline: BM25
  * top-k over an inverted index and reciprocal-rank fusion of lexical and
  * vector rankings (the standard hybrid-retrieval shape for RAG corpus
  * construction and eval-set mining).
  *
  * Scale contract: everything is postings-driven. The corpus is scanned
  * once into a (doc, token, tf) table; queries select their candidate set
  * through a token equi-join against those postings — cost ∝ the posting
  * lists of the query's terms, never ∝ corpus × queries. Corpus statistics
  * (N, total token count) travel as a broadcast 1-row aggregate; document
  * frequency joins by token. No cross product anywhere.
  *
  * Parity contract (the [[TextAnalysis.unigramLogProb]] convention):
  * per-term BM25 scores contain `ln`, which is not bit-portable across
  * engines — each term is cast to DECIMAL(28,9) before the per-pair sum,
  * making the aggregate order-independent and engine-exact at 9dp.
  * Length normalization uses only exactly-rounded IEEE ops (`+ - * /`),
  * so it needs no rounding.
  */
object Retrieval {

  /** BM25 top-k retrieval: for each query document, the `k` highest-BM25
    * candidate documents (self excluded), scored over whitespace tokens
    * with the Lucene idf form `ln((N - df + 0.5)/(df + 0.5) + 1)`.
    *
    * Queries are corpus rows (`queryIds`) — their DISTINCT token sets
    * become the term lists (query term frequency is ignored, the standard
    * short-query simplification). `maxDf` (0 = off) drops terms whose
    * document frequency exceeds it: at corpus scale, stopword postings
    * dominate the candidate join while contributing near-zero idf — the
    * same skew guard as [[Dedup.jaccardPairs]], here it also bounds the
    * per-term join fan-out to `maxDf` rows.
    *
    * Output: (query_id, cand_id, bm25, rank), rank 1..k per query with
    * deterministic (score DESC, cand_id) ordering.
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
               queryIds: Seq[Long], k: Int,
               k1: Double = 1.2, b: Double = 0.75,
               maxDf: Long = 0): DataFrame = {
    // Postings (id, token, tf): the one corpus-sized shuffle — it IS the
    // inverted-index build. Document length and the query term lists are
    // deliberately NOT derived from it: both are row-local projections of
    // the source (dl = token count, qterms = distinct tokens of 5 rows),
    // so they cost a scan, not a shuffle, and the tf exchange is reused
    // only where a postings aggregate is genuinely needed (dfreq).
    val tf = df
      .select(col(idCol).as("id"),
        explode(split(lower(col(textCol)), " ")).as("token"))
      .groupBy(col("id"), col("token"))
      .agg(count(lit(1)).as("tf"))

    val dl = df.select(col(idCol).as("id"),
      size(split(lower(col(textCol)), " ")).cast("long").as("dl"))
    // N and avgdl as one broadcast row. avgdl = Σdl / N with an integer
    // numerator — exact regardless of partitioning (sums of integral
    // doubles < 2^53 are order-independent).
    val stats = dl.agg(
      count(lit(1)).cast("double").as("__n"),
      sum(col("dl")).cast("double").as("__toktotal"))

    val dfreq0 = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val dfreq = if (maxDf > 0) dfreq0.filter(col("df") <= maxDf) else dfreq0

    val qterms = df
      .filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"),
        explode(array_distinct(split(lower(col(textCol)), " ")))
          .as("token"))

    // Candidate generation IS the postings join: query terms × postings
    // of that token only, streamed map-side against two broadcast hash
    // joins — the corpus-sized tf never reshuffles. Joining dfreq first
    // keeps the maxDf guard upstream of the fan-out; the candidate set
    // (∝ query-term posting lists) then meets dl, where AQE broadcasts
    // the small side.
    val terms = tf
      .join(broadcast(broadcast(qterms).join(dfreq, Seq("token"))),
        Seq("token"))
      .filter(col("id") =!= col("query_id"))
      .join(dl, Seq("id"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("id").as("cand_id"),
        (log((col("__n") - col("df").cast("double") + 0.5) /
             (col("df").cast("double") + 0.5) + 1.0) *
          (col("tf").cast("double") * (k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") /
              (col("__toktotal") / col("__n")))))
          .cast(DecimalType(28, 9)).as("term"))

    val scored = terms
      .groupBy(col("query_id"), col("cand_id"))
      .agg(sum(col("term")).cast("double").as("bm25"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** Reciprocal-rank fusion (Cormack et al.) of two rankings, each with
    * columns (query_id, cand_id, rank): `score = Σ 1/(c + rank)` over the
    * lists the candidate appears in, missing list contributes 0.
    *
    * The fused score is ONE addition of two exactly-rounded IEEE
    * divisions — bit-portable with no rounding step. Output:
    * (query_id, cand_id, rrf, rank 1..k) with (score DESC, cand_id)
    * deterministic ordering.
    *
    * Scale: inputs are already top-k lists (tiny relative to the corpus);
    * the fusion is a full-outer equi-join on (query_id, cand_id) — at
    * most |queries|·k rows a side, broadcastable in any realistic
    * configuration, and never touches the corpus again.
    */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int, c: Int = 60): DataFrame = {
    val left = a.select(col("query_id"), col("cand_id"),
      col("rank").as("__ra"))
    val right = b.select(col("query_id"), col("cand_id"),
      col("rank").as("__rb"))
    val fused = left
      .join(right, Seq("query_id", "cand_id"), "full_outer")
      .select(col("query_id"), col("cand_id"),
        (coalesce(lit(1.0) / (lit(c.toDouble) + col("__ra").cast("double")),
            lit(0.0)) +
          coalesce(lit(1.0) / (lit(c.toDouble) + col("__rb").cast("double")),
            lit(0.0))).as("rrf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("cand_id"))
    fused
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }
}
