package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** PCA tier: the Jacobi eigensolver's linear-algebra invariants, the
  * exact co-moment pass against a hand computation, projection /
  * whitening end-to-end properties, and the variance-preservation
  * identity the oracle-checked `x_pca_var` query rides.
  */
class PcaSpec extends SparkTestBase {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)

  /** Random symmetric matrix with controlled spectrum. */
  private def symMatrix(dim: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](dim, dim)
    for (i <- 0 until dim; j <- i until dim) {
      val v = rnd.nextDouble() * 2 - 1
      m(i)(j) = v; m(j)(i) = v
    }
    m
  }

  private def matVec(m: Array[Array[Double]], v: Array[Double]) =
    m.map(row => row.indices.map(i => row(i) * v(i)).sum)

  test("jacobi: eigen-residual, orthonormality, descending order") {
    val dim = 12
    val m = symMatrix(dim)
    val (vals, vecs) = Pca.jacobiEigen(m)
    // descending eigenvalues
    vals.sliding(2).foreach { case Array(a, b) => assert(a >= b) }
    // A·v = λ·v per pair
    for (k <- 0 until dim) {
      val av = matVec(m, vecs(k))
      av.indices.foreach { i =>
        assert(math.abs(av(i) - vals(k) * vecs(k)(i)) < 1e-9,
          s"eigen residual at k=$k i=$i")
      }
    }
    // orthonormal rows
    for (a <- 0 until dim; b <- a until dim) {
      val dot = vecs(a).indices.map(i => vecs(a)(i) * vecs(b)(i)).sum
      assert(math.abs(dot - (if (a == b) 1.0 else 0.0)) < 1e-10)
    }
    // trace preserved
    val trace = (0 until dim).map(i => m(i)(i)).sum
    assert(math.abs(vals.sum - trace) < 1e-9)
  }

  test("jacobi: recovers a known diagonal spectrum") {
    val m = Array(
      Array(5.0, 0.0, 0.0),
      Array(0.0, 2.0, 0.0),
      Array(0.0, 0.0, -1.0))
    val (vals, vecs) = Pca.jacobiEigen(m)
    assert(vals.toSeq == Seq(5.0, 2.0, -1.0))
    // sign-canonical axis vectors
    assert(vecs(0).toSeq == Seq(1.0, 0.0, 0.0))
    assert(vecs(1).toSeq == Seq(0.0, 1.0, 0.0))
    assert(vecs(2).toSeq == Seq(0.0, 0.0, 1.0))
  }

  test("comoments matches a hand computation on a tiny corpus") {
    // 3 vectors of dim 2, values chosen so quantization is exact
    val df = Seq(
      (1L, Array(0.001f, 0.002f)),
      (2L, Array(0.003f, -0.001f)),
      (3L, Array(-0.002f, 0.004f))).toDF("vec_id", "embedding")
    // quantized: (1,2), (3,-1), (-2,4)
    val rows = Pca.comoments(df, "embedding", dim = 2)
      .orderBy("i", "j").collect()
    val asTuple = rows.map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(asTuple.toSeq == Seq(
      (1, 1, 3L, 2L, 2L, 14L),   // Σx=2, Σx²=1+9+4
      (1, 2, 3L, 2L, 5L, -9L),   // Σxy=2-3-8
      (2, 2, 3L, 5L, 5L, 21L)))  // Σy=5, Σy²=4+1+16
    // population covariance of dim 1: (14 - 2·2/3)/3
    val cov11 = rows(0).getDouble(6)
    assert(math.abs(cov11 - (14.0 - 2.0 * 2.0 / 3.0) / 3.0) < 1e-12)
  }

  test("property: comoments == plain-Scala quantize-and-sum replay " +
    "on random vectors") {
    val dim = 6
    val vecs = Seq.fill(40)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    // math.round (half toward +inf) == Spark round (HALF_UP away from
    // zero) here because an exact .5 tie is impossible: inputs are
    // j/2^23 and 1000·j/2^23 is never n + 1/2 (125 does not divide a
    // power of two) — the same no-tie argument as the price quantize
    val q = vecs.map(_.map(x => math.round(x.toDouble * 1000)))
    val want = (for (i <- 1 to dim; j <- i to dim) yield {
      val xs = q.map(_(i - 1)); val ys = q.map(_(j - 1))
      (i, j, q.size.toLong, xs.sum, ys.sum,
        xs.zip(ys).map { case (a, b) => a * b }.sum)
    }).toSeq
    val got = Pca.comoments(
        vecs.zipWithIndex.map { case (v, k) => (k.toLong, v) }
          .toDF("vec_id", "embedding"), "embedding", dim)
      .orderBy("i", "j").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want)
  }

  test("merged shard co-moments == one-pass co-moments bit-for-bit; " +
    "fitCells agrees") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val onePass = Pca.comoments(emb, "embedding", dim = 64)
    val merged = Pca.mergeComoments(
      Pca.comoments(emb.filter(col("vec_id") % 3 === 0), "embedding", 64)
        .unionByName(Pca.comoments(
          emb.filter(col("vec_id") % 3 === 1), "embedding", 64))
        .unionByName(Pca.comoments(
          emb.filter(col("vec_id") % 3 === 2), "embedding", 64)))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("i", "j").collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5),
          java.lang.Double.doubleToLongBits(r.getDouble(6)))).toSeq
    assert(rows(onePass) == rows(merged))
    // the model from merged state is the model from one-pass state
    val mA = Pca.fitCells(onePass, 64)
    val mB = Pca.fitCells(merged, 64)
    assert(mA.eigenvalues.toSeq == mB.eigenvalues.toSeq)
    assert(mA.components.map(_.toSeq).toSeq ==
      mB.components.map(_.toSeq).toSeq)
  }

  test("fit + full projection preserves total variance (the x_pca_var identity)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = Pca.varianceRatio(emb, "vec_id", "embedding", dim = 64)
      .collect()
    assert(out.length == 1)
    assert(out(0).getInt(0) == 64)
    assert(out(0).getDouble(1) == 1.0)
  }

  test("top-k projection: components are uncorrelated, variances match eigenvalues desc") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = Pca.fit(emb, "embedding", dim = 64)
    val proj = Pca.project(emb, "vec_id", "embedding", model, k = 4)
    val rows = proj.select(col("proj")).collect()
      .map(_.getSeq[Double](0).toArray)
    val n = rows.length.toDouble
    def mean(j: Int) = rows.map(_(j)).sum / n
    def covp(a: Int, b: Int) = {
      val (ma, mb) = (mean(a), mean(b))
      rows.map(r => (r(a) - ma) * (r(b) - mb)).sum / n
    }
    for (j <- 0 until 4) {
      val rel = math.abs(covp(j, j) - model.eigenvalues(j)) /
        model.eigenvalues(j)
      assert(rel < 1e-9, s"component $j variance vs eigenvalue")
    }
    // off-diagonals vanish relative to the component scales
    for (a <- 0 until 4; b <- a + 1 until 4) {
      val denom = math.sqrt(covp(a, a) * covp(b, b))
      assert(math.abs(covp(a, b)) / denom < 1e-9, s"corr($a,$b)")
    }
    // eigenvalues descending
    model.eigenvalues.sliding(2).foreach {
      case Array(x, y) => assert(x >= y - 1e-9)
    }
  }

  test("whitened projection has unit variance per component") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = Pca.fit(emb, "embedding", dim = 64)
    val proj = Pca.project(emb, "vec_id", "embedding", model, k = 3,
      whiten = true)
    val rows = proj.select(col("proj")).collect()
      .map(_.getSeq[Double](0).toArray)
    val n = rows.length.toDouble
    for (j <- 0 until 3) {
      val m = rows.map(_(j)).sum / n
      val v = rows.map(r => (r(j) - m) * (r(j) - m)).sum / n
      assert(math.abs(v - 1.0) < 1e-9, s"whitened var($j) = $v")
    }
  }

  test("projection is partitioning-invariant (literal model, row-local map)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val model = Pca.fit(emb, "embedding", dim = 64)
    def run(df: org.apache.spark.sql.DataFrame) =
      Pca.project(df, "vec_id", "embedding", model, k = 2)
        .select(col("vec_id"), col("proj"))
        .collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
        .sortBy(_._1).toSeq
    assert(run(emb.repartition(1)) == run(emb.repartition(7)))
  }
}
