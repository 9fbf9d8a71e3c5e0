package graft.ext

import graft.SparkTestBase
import graft.io.Tables
import org.apache.spark.sql.functions._

/** Logistic-regression quality classifier: exact first step vs hand
  * computation, full training loop vs a plain-Scala reference (the
  * BpeSpec/kmeans cross-implementation pattern), and loss improvement
  * on real documents.
  */
class ClassifierSpec extends SparkTestBase {

  // plain-Scala mirror of Classifier.features over one text
  private def feats(text: String): Seq[Long] = {
    val toks = text.toLowerCase.split(" ", -1).toSeq // keep trailing empties, like Spark split
    val stop = Set("the", "and", "of", "to", "a")
    Seq(1L, toks.size.toLong, text.length.toLong,
      toks.count(stop.contains).toLong)
  }

  test("logregStepTable at w=0 matches hand-computed exact gradients") {
    import spark.implicits._
    val rows = Seq(
      ("the cat sat", 1),
      ("der hund lief und lief", 0),
      ("a dog and the bird", 1),
      ("xyz", 0))
    val df = rows.toDF("text", "y")
    val got = Classifier.logregStepTable(df,
        Classifier.features(col("text")), col("y"),
        w = Seq(0.0, 0.0, 0.0, 0.0), lr = 0.1)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val names = Seq("bias", "n_tokens", "n_chars", "stop_hits")
    val n = rows.size.toDouble
    names.zipWithIndex.foreach { case (name, j) =>
      val grad = rows.map { case (t, y) => feats(t)(j) * (0.5 - y) }.sum
      assert(got(name)._1 == grad, s"$name grad")
      assert(got(name)._2 == 0.0 - 0.1 * (grad / n), s"$name w_next")
    }
  }

  test("train matches a plain-Scala reference run exactly") {
    import spark.implicits._
    val data = Seq(
      ("the cat sat on the mat and slept", 1),
      ("a quick brown fox jumps over the lazy dog", 1),
      ("the rain and the wind came to a stop", 1),
      ("der hund lief schnell durch den wald heute", 0),
      ("el gato negro duerme en la casa grande", 0),
      ("le chien court vite dans le jardin vert", 0))
    val df = data.toDF("text", "y")
    val sparkW = Classifier.train(df, Classifier.features(col("text")),
      col("y"), iters = 5, lr = 0.5)

    // reference: same scaler, same standardization, same DECIMAL(28,9)
    // per-term rounding, same update — plain Scala end to end
    val x = data.map { case (t, _) => feats(t).map(_.toDouble) }
    val y = data.map(_._2.toDouble)
    val n = data.size.toDouble
    val scale = x.head.indices.map { j =>
      val sx = x.map(_(j)).sum; val sq = x.map(v => v(j) * v(j)).sum
      val m = sx / n; val v = (sq - sx * sx / n) / n
      (m, if (v > 0) math.sqrt(v) else 1.0)
    }
    val z = x.map(_.zipWithIndex.map { case (v, j) =>
      if (j == 0) v else (v - scale(j)._1) / scale(j)._2 })
    var w = Seq.fill(4)(0.0)
    (0 until 5).foreach { _ =>
      val grads = w.indices.map { j =>
        z.zip(y).map { case (zi, yi) =>
          val p =
            if (w.forall(_ == 0.0)) 0.5
            else 1.0 / (1.0 + math.exp(-zi.zip(w).map { case (a, b) => a * b }.sum))
          BigDecimal(zi(j) * (p - yi))
            .setScale(9, BigDecimal.RoundingMode.HALF_UP)
        }.sum.toDouble
      }
      w = w.indices.map(j => w(j) - 0.5 * (grads(j) / n))
    }
    sparkW.zip(w).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12, s"$sparkW vs $w")
    }
  }

  test("training reduces log-loss and separates en from non-en docs") {
    val docs = Tables.load(spark, sf, "documents")
      .withColumn("y", (col("lang") === "en").cast("int"))
    val fs = Classifier.features(col("text"))
    val w = Classifier.train(docs, fs, col("y"), iters = 20, lr = 1.0)

    // apply the same standardization train used for scoring
    val scale = Classifier.fitScaler(docs, fs)
    val zf = fs.zip(scale).zipWithIndex.map { case (((name, c), (m, s)), j) =>
      if (j == 0) name -> c.cast("double")
      else name -> ((c.cast("double") - lit(m)) / lit(s))
    }
    val scored = docs.withColumn("p", Classifier.scoreWith(zf, w))
    val eps = 1e-12
    val loss = (wts: Seq[Double]) => docs
      .withColumn("p", Classifier.scoreWith(zf, wts))
      .agg(avg(-(col("y") * log(col("p") + eps) +
        (lit(1) - col("y")) * log(lit(1.0) - col("p") + eps))))
      .head().getDouble(0)
    assert(loss(w) < loss(Seq.fill(4)(0.0)),
      s"trained loss ${loss(w)} not below ln2")
    // stopword count is the discriminative feature — the classifier must
    // rank en docs above non-en on average
    val m = scored.groupBy(col("y")).agg(avg(col("p")).as("mp"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(m(1) > m(0), s"mean p(en)=${m(1)} !> mean p(other)=${m(0)}")
  }

  test("targetEncode: hand-computed LOO means, singleton falls to prior") {
    import spark.implicits._
    // cat a: y = 1,1,0 (n=3, s=2); cat b: y = 0 (singleton)
    val df = Seq((1L, "a", 1), (2L, "a", 1), (3L, "a", 0), (4L, "b", 0))
      .toDF("id", "cat", "y")
    val gmean = 2.0 / 4.0
    val m = 2L
    val got = graft.ext.Classifier.targetEncode(df, "cat",
        org.apache.spark.sql.functions.col("y"), m)
      .select("id", "target_enc")
      .as[(Long, Double)].collect().toMap
    // LOO for id1 (y=1): (2-1 + 2*0.5)/(3-1+2) = 2/4 = 0.5
    assert(got(1L) == (1.0 + 2.0 * gmean) / 4.0)
    // id3 (y=0): (2-0 + 1)/4 = 0.75
    assert(got(3L) == (2.0 + 2.0 * gmean) / 4.0)
    // singleton b: (0-0 + 1)/(0+2) = prior-pulled 0.5
    assert(got(4L) == (0.0 + 2.0 * gmean) / 2.0)
    // the leak check: identical rows in the same category get the SAME
    // encoding, but rows with different OWN labels differ
    assert(got(1L) == got(2L) && got(1L) != got(3L))
  }

  test("woeTable: hand-computed smoothed WoE/IV, one-sided cell finite") {
    import spark.implicits._
    // cat a: 3 pos / 1 neg; cat b: 0 pos / 4 neg (one-sided); K=2
    val df = (Seq.fill(3)(("a", 1)) ++ Seq(("a", 0)) ++
      Seq.fill(4)(("b", 0))).toDF("cat", "y")
    val got = graft.ext.Classifier.woeTable(df, "cat",
        org.apache.spark.sql.functions.col("y") === 1)
      .orderBy("cat")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    def pin(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (tp, tn, k) = (3.0, 5.0, 2.0)
    def woe(p: Double, n: Double) = pin(math.log(
      ((p + 0.5) / (tp + 0.5 * k)) / ((n + 0.5) / (tn + 0.5 * k))))
    def iv(p: Double, n: Double) = pin(
      ((p + 0.5) / (tp + 0.5 * k) - (n + 0.5) / (tn + 0.5 * k)) *
        woe(p, n))
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
      Seq(("a", 4L, 3L, 1L), ("b", 4L, 0L, 4L)))
    assert(got(0)._5 == woe(3, 1) && got(0)._6 == iv(3, 1))
    // the all-negative category stays FINITE (smoothing) and negative
    assert(got(1)._5 == woe(0, 4) && got(1)._5 < 0)
    assert(got(1)._6 == iv(0, 4) && got(1)._6 > 0) // iv terms are >= 0
  }
}
