package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** BPE training pinned against a plain-Scala reference implementation
  * (the iterative-loop analogue of AnnRecallSpec's kmeans checks).
  */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  // ---- reference implementation (driver-side, obviously-correct) ----

  private def refMerge(syms: List[String], x: String, y: String): List[String] =
    syms match {
      case a :: b :: rest if a == x && b == y => (x + y) :: refMerge(rest, x, y)
      case a :: rest => a :: refMerge(rest, x, y)
      case Nil => Nil
    }

  private def refTrain(words: Map[String, Long], k: Int): List[(String, String)] = {
    var vocab: Map[List[String], Long] =
      words.map { case (w, n) => w.split("").filter(_.nonEmpty).toList -> n }
    var merges = List.empty[(String, String)]
    var continue = true
    while (merges.size < k && continue) {
      val pairs = vocab.toSeq.flatMap { case (syms, n) =>
        syms.zip(syms.drop(1)).map(p => p -> n)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      if (pairs.isEmpty) continue = false
      else {
        val ((x, y), _) = pairs.toSeq
          .sortBy { case ((x, y), n) => (-n, x, y) }.head
        merges = merges :+ (x -> y)
        vocab = vocab.toSeq
          .map { case (syms, n) => refMerge(syms, x, y) -> n }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    merges
  }

  /** Independent plain-Scala mirror of the BATCHED algorithm: per
    * round, greedy disjoint-symbol selection (x, y, and x+y all
    * unseen; conflicts skipped) from the head of the count-sorted pair
    * list — including the engine's candidate-head truncation — applied
    * sequentially to every word.
    */
  private def refTrainBatched(words: Map[String, Long], k: Int,
                              m: Int): List[(String, String)] = {
    var vocab: Map[List[String], Long] =
      words.map { case (w, n) => w.split("").filter(_.nonEmpty).toList -> n }
    var merges = List.empty[(String, String)]
    var continue = true
    while (merges.size < k && continue) {
      val pairs = vocab.toSeq.flatMap { case (syms, n) =>
        syms.zip(syms.drop(1)).map(p => p -> n)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val want = math.min(m, k - merges.size)
      val sorted = pairs.toSeq
        .sortBy { case ((x, y), n) => (-n, x, y) }.map(_._1)
        .take(math.max(want * 8, 64))
      var used = Set.empty[String]
      var batch = List.empty[(String, String)]
      for ((x, y) <- sorted if batch.size < want) {
        if (!used(x) && !used(y) && !used(x + y)) {
          batch = batch :+ ((x, y))
          used = used ++ Set(x, y, x + y)
        }
      }
      if (batch.isEmpty) continue = false
      else {
        merges = merges ++ batch
        vocab = vocab.toSeq.map { case (syms, n) =>
          batch.foldLeft(syms) { case (s, (x, y)) => refMerge(s, x, y) } -> n
        }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      }
    }
    merges
  }

  test("applyMerge: left-to-right, non-overlapping, merged can't re-merge") {
    val cases = Seq(
      (Seq("a", "a", "a", "a"), "a", "a"),
      (Seq("a", "a", "a"), "a", "a"),
      (Seq("x", "a", "a", "y", "a", "a"), "a", "a"),
      (Seq("aa", "a", "a"), "aa", "a"),
      (Seq("b"), "a", "a"),
      (Seq.empty[String], "a", "a"))
    for ((syms, x, y) <- cases) {
      val got = Seq(Tuple1(syms)).toDF("syms")
        .select(Bpe.applyMerge($"syms", x, y)).as[Seq[String]].head()
      assert(got == refMerge(syms.toList, x, y),
        s"merge($x,$y) on $syms: got $got")
    }
  }

  test("train matches the reference on the classic toy corpus") {
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = Seq(corpus.mkString(" ")).toDF("text")
    val wordCounts = corpus.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val expected = refTrain(wordCounts, 8)
    val got = Bpe.train(df, "text", numMerges = 8)
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("train matches the reference on real documents") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
      .filter($"doc_id" < 30)
    val words = Bpe.wordCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    val expected = refTrain(words, 12)
    val got = Bpe.train(docs, "text", numMerges = 12)
    assert(got == expected, s"got $got\nexpected $expected")
  }

  test("BATCHED training matches its plain-Scala mirror (toy + real)") {
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val toyDf = Seq(corpus.mkString(" ")).toDF("text")
    val toyWords = corpus.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    assert(Bpe.train(toyDf, "text", 8, batchSize = 3)
      == refTrainBatched(toyWords, 8, 3))

    val docs = graft.io.Tables.load(spark, sf, "documents")
      .filter($"doc_id" < 30)
    val words = Bpe.wordCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(Bpe.train(docs, "text", 12, batchSize = 4)
      == refTrainBatched(words, 12, 4))
    // batchSize=1 degenerates to exact classic greedy
    assert(refTrainBatched(words, 6, 1) == refTrain(words, 6))
  }

  test("batched training cuts driver rounds: far fewer Spark jobs " +
    "for the same merge count") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
      .filter($"doc_id" < 30)
    val tracker = spark.sparkContext.statusTracker
    def jobsFor(group: String)(body: => Unit): Int = {
      spark.sparkContext.setJobGroup(group, group)
      try body finally spark.sparkContext.clearJobGroup()
      Thread.sleep(500) // app-status store is fed asynchronously
      tracker.getJobIdsForGroup(group).length
    }
    val sequential = jobsFor("bpe_seq") { Bpe.train(docs, "text", 12) }
    val batched = jobsFor("bpe_bat") {
      Bpe.train(docs, "text", 12, batchSize = 6)
    }
    assert(batched * 2 <= sequential,
      s"expected <= half the jobs: batched=$batched sequential=$sequential")
  }

  test("encodeDocumentsPartitioned == the expression-tree encode " +
    "(cross-implementation parity on real documents)") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
      .filter($"doc_id" < 20)
    val merges = Bpe.train(docs, "text", numMerges = 10, batchSize = 5)
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id", $"bpe_tokens")
        .as[(Long, Seq[String])].collect().toMap
    val planned = canon(Bpe.encodeDocuments(docs, "doc_id", "text", merges))
    val parted = canon(
      Bpe.encodeDocumentsPartitioned(docs, "doc_id", "text", merges))
    assert(parted.keySet == planned.keySet)
    val diff = planned.keySet.filter(k => planned(k) != parted(k))
    assert(diff.isEmpty, s"diverging docs: ${diff.take(3)}")
  }

  test("encodeDocuments: token concat reassembles the de-spaced text") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
      .filter($"doc_id" < 10)
    val merges = Bpe.train(docs, "text", numMerges = 6)
    val enc = Bpe.encodeDocuments(docs, "doc_id", "text", merges)
    val diff = docs
      .select($"doc_id",
        regexp_replace(lower($"text"), " ", "").as("squashed"))
      .join(enc, "doc_id")
      .filter(concat_ws("", $"bpe_tokens") =!= $"squashed")
      .count()
    assert(diff == 0, "BPE tokens must reassemble every document")
    // and at least one multi-char token was actually produced
    val multi = enc.select(explode($"bpe_tokens").as("t"))
      .filter(length($"t") > 1).count()
    assert(multi > 0, "expected merged tokens in the encoding")
  }
}
