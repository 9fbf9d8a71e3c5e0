package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer training — the other iterative-algorithm
  * workload of an LLM data pipeline (k-means being the first, see
  * [[Similarity.kmeans]]). The Spark shape matters more than the
  * algorithm: the corpus is touched EXACTLY ONCE, by the word-count
  * aggregation (words with counts are the sufficient statistic for BPE);
  * every training iteration then runs against the vocabulary table,
  * whose size is bounded by the language (~10⁵–10⁶ distinct words)
  * regardless of corpus size — iteration cost is O(vocab), never
  * O(corpus). Driver state is the merge list, O(numMerges).
  *
  * Pair semantics are the classic Sennrich et al. greedy: one merge per
  * iteration (the highest weighted count of ADJACENT symbol pairs, ties
  * to the lexicographically smallest pair), applied left-to-right
  * non-overlapping within each word. No end-of-word marker — words are
  * the tokenization unit, and the marker is orthogonal to the engine
  * mechanics.
  */
object Bpe {

  /** Single-character initial segmentation of a word (split("") leaves
    * a trailing empty string on some engines — filtered).
    */
  def charSyms(word: Column): Column =
    filter(split(word, ""), s => s =!= "")

  /** One left-to-right non-overlapping merge pass of the pair (x, y)
    * over a symbol array — a fold carrying (emitted, pending): the
    * pending symbol merges with the current one iff they equal (x, y);
    * a merged symbol is emitted and cannot re-merge this pass.
    */
  def applyMerge(syms: Column, x: String, y: String): Column = {
    val zero = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("pend"))
    val step = (acc: Column, s: Column) =>
      when(acc.getField("pend").isNull,
        struct(acc.getField("out").as("out"), s.as("pend")))
        .when(acc.getField("pend") === x && s === y,
          struct(concat(acc.getField("out"), array(lit(x + y))).as("out"),
            lit(null).cast("string").as("pend")))
        .otherwise(
          struct(concat(acc.getField("out"), array(acc.getField("pend")))
            .as("out"), s.as("pend")))
    val finish = (acc: Column) =>
      when(acc.getField("pend").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("pend"))))
    aggregate(syms, zero, step, finish)
  }

  /** The corpus-scale step: one scan collapsing the corpus to
    * (word, n) — everything after runs on this vocabulary table.
    */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** Weighted adjacent-pair counts over a (syms, n) vocabulary table:
    * `zip(syms, syms[1:])` explodes to one row per adjacent pair,
    * weighted by the word count. Partial aggregation collapses the
    * explode before the (tiny) shuffle.
    */
  def pairCounts(vocab: DataFrame): DataFrame =
    vocab.select(col("n"),
      explode(arrays_zip(
        slice(col("syms"), lit(1), greatest(size(col("syms")) - 1, lit(0))),
        slice(col("syms"), lit(2), greatest(size(col("syms")) - 1, lit(0)))))
        .as("p"))
      .select(col("p.0").as("x"), col("p.1").as("y"), col("n"))
      .groupBy(col("x"), col("y")).agg(sum(col("n")).as("total"))

  /** Greedy disjoint-symbol selection from a count-sorted candidate
    * list, capped at `m` — the batch a single training round may apply.
    * A pair joins the batch only if its symbols x, y AND its merged
    * symbol x+y are unseen among already-selected pairs (x+y too: if
    * "ab" already exists as a symbol, merging (a,b) mints more of it
    * and would invalidate the counted rank of any ("ab", ·)
    * candidate); conflicting candidates are SKIPPED, not applied —
    * they stay in the table and win a later round with fresh counts.
    * Disjointness makes the batch order-independent within the round;
    * divergence from one-at-a-time Sennrich training comes only from
    * deferring conflicted pairs and from pairs newly created by this
    * round's merges — the standard batched-BPE approximation (a
    * prefix-stop variant measured ~1.5 merges/round on real text
    * because top pairs share letters; skipping fills the batch).
    */
  private[ext] def disjointBatch(cands: Seq[(String, String)],
                                 m: Int): Seq[(String, String)] = {
    val used = scala.collection.mutable.Set.empty[String]
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val it = cands.iterator
    while (out.size < m && it.hasNext) {
      val (x, y) = it.next()
      if (!used(x) && !used(y) && !used(x + y)) {
        out += ((x, y))
        used ++= Seq(x, y, x + y)
      }
    }
    out.toSeq
  }

  /** Train `numMerges` merges. Returns the ordered merge list.
    *
    * `batchSize = 1` (default) is EXACT classic greedy — one merge per
    * round, bit-identical to the plain-Scala reference (BpeSpec).
    * `batchSize = m` applies up to m merges per driver round (the
    * [[disjointBatch]] of the count-sorted pair table), cutting the
    * round count — and with it the number of Spark jobs, the scheduler
    * cost that dominates a production 32k-merge vocabulary — by ~m
    * while keeping every round's cost O(vocab). Each round: count
    * pairs, collect a bounded candidate head (KB-sized driver
    * round-trip), fold the batch's merges over the vocabulary in ONE
    * select. `localCheckpoint` truncates the plan per round so round N
    * doesn't re-execute rounds 1..N-1 (the standard Spark
    * iterative-algorithm guard).
    */
  def train(df: DataFrame, textCol: String, numMerges: Int,
            batchSize: Int = 1): Seq[(String, String)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    require(batchSize >= 1, s"batchSize must be >= 1, got $batchSize")
    var vocab = wordCounts(df, textCol)
      .select(charSyms(col("word")).as("syms"), col("n"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.size < numMerges && !exhausted) {
      val want = math.min(batchSize, numMerges - merges.size)
      val top = pairCounts(vocab)
        .orderBy(col("total").desc, col("x"), col("y"))
        .limit(math.max(want * 8, 64)).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      val batch = disjointBatch(top, want)
      if (batch.isEmpty) exhausted = true
      else {
        merges ++= batch
        vocab = vocab
          .select(batch.foldLeft(col("syms")) {
            case (syms, (x, y)) => applyMerge(syms, x, y)
          }.as("syms"), col("n"))
          .localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** Encode documents with a trained merge list: per word, the initial
    * char segmentation folded through every merge in training order
    * (row-local; the merge list rides the plan as literals), then words
    * re-concatenated in document order.
    *
    * PLAN-SIZE caveat: each merge nests one more `aggregate` HOF, so
    * the expression tree is |merges| deep — fine for the tens of
    * merges a test vocabulary has, hostile to Catalyst at a production
    * 32k-merge list. [[encodeDocumentsPartitioned]] is the long-list
    * form: same semantics, constant plan size.
    */
  def encodeDocuments(df: DataFrame, idCol: String, textCol: String,
                      merges: Seq[(String, String)]): DataFrame = {
    val words = df.select(col(idCol),
      posexplode(TextAnalysis.tokens(col(textCol))).as(Seq("pos", "word")))
      .filter(col("word") =!= "")
    val encoded = merges.foldLeft(charSyms(col("word"))) {
      case (syms, (x, y)) => applyMerge(syms, x, y)
    }
    words.select(col(idCol), col("pos"), encoded.as("toks"))
      .groupBy(col(idCol))
      .agg(flatten(array_sort(collect_list(struct(col("pos"), col("toks"))))
        .getField("toks")).as("bpe_tokens"))
  }

  /** [[encodeDocuments]] for production-sized merge lists: the merges
    * ship ONCE per task as a broadcast-closure array and apply in a
    * `mapPartitions` loop, so the plan is one narrow projection no
    * matter whether the vocabulary has 60 merges or 64k. The
    * deliberate `mapPartitions` exception to the functions-first rule:
    * the alternative is an expression tree |merges| deep, which is the
    * worse engine citizen. Tokenization (lowercase split, empty-word
    * drop, left-to-right non-overlapping merge order) mirrors the
    * expression path exactly — BpeSpec pins cross-implementation
    * equality on real documents.
    */
  def encodeDocumentsPartitioned(df: DataFrame, idCol: String,
                                 textCol: String,
                                 merges: Seq[(String, String)]): DataFrame = {
    val spark = df.sparkSession
    val mergeArr = merges.toArray
    val idIdx = 0
    val rdd = df.select(col(idCol), col(textCol)).rdd.mapPartitions { it =>
      def applyOne(syms: List[String], x: String, y: String): List[String] =
        syms match {
          case a :: b :: rest if a == x && b == y =>
            (x + y) :: applyOne(rest, x, y)
          case a :: rest => a :: applyOne(rest, x, y)
          case Nil => Nil
        }
      it.map { row =>
        val toks = row.getString(1)
          .toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          .filter(_.nonEmpty)
        val out = toks.iterator.flatMap { w =>
          var syms = w.split("").filter(_.nonEmpty).toList
          var i = 0
          while (i < mergeArr.length) {
            val (x, y) = mergeArr(i)
            syms = applyOne(syms, x, y)
            i += 1
          }
          syms
        }.toSeq
        org.apache.spark.sql.Row(row.get(idIdx), out)
      }
    }
    spark.createDataFrame(rdd, org.apache.spark.sql.types.StructType(Seq(
      df.select(col(idCol)).schema.head,
      org.apache.spark.sql.types.StructField("bpe_tokens",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType), nullable = true))))
  }
}
