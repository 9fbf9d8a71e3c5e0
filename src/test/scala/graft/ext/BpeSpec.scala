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
