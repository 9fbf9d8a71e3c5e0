package graft.ext

import graft.SparkTestBase

/** Approximation quality of the ANN paths, measured against
  * [[Similarity.bruteForceTopK]] ground truth on the real embeddings
  * table — recall is a tested number, not a doc-comment claim. The
  * floors are deliberately below the measured values (printed on every
  * run) so the assertions pin regressions, not noise.
  */
class AnnRecallSpec extends SparkTestBase {

  private val queryIds = Seq(0L, 1L, 2L, 3L, 4L)
  private val k = 10

  private lazy val emb = spark.read.parquet(s"$sf/embeddings.parquet")

  private lazy val exact: Map[Long, Set[Long]] =
    Similarity.bruteForceTopK(emb, "vec_id", "embedding", queryIds, k)
      .select("query_id", "cand_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }

  private def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
    val got = df.select("query_id", "cand_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val per = queryIds.map(q =>
      (exact(q) & got.getOrElse(q, Set.empty)).size.toDouble / k)
    per.sum / per.size
  }

  test("LSH top-k recall vs brute force has a measured floor") {
    val single = recallOf(
      Similarity.lshTopK(emb, "vec_id", "embedding", queryIds, k,
        bits = 8, tables = 1))
    val multi = recallOf(
      Similarity.lshTopK(emb, "vec_id", "embedding", queryIds, k,
        bits = 6, tables = 8))
    info(f"lshTopK recall@$k: 1 table x 8 bits $single%.3f, 8 tables x 6 bits $multi%.3f")
    assert(multi > single, "OR-construction must beat a single table")
    assert(multi >= 0.1, f"multi-table LSH recall collapsed: $multi%.3f")
    val probed = recallOf(
      Similarity.lshTopK(emb, "vec_id", "embedding", queryIds, k,
        bits = 6, tables = 8, multiProbe = true))
    info(f"lshTopK multi-probe recall@$k: $probed%.3f")
    assert(probed >= multi,
      "probing Hamming-1 buckets must never lose candidates")
    assert(probed >= 0.5,
      f"multi-probe recall floor (measured 0.98 at pinning): $probed%.3f")
    // query-directed probing: 2 smallest-margin flips instead of all 6
    // — most of the recall at a third of the probe cost
    val directed = recallOf(
      Similarity.lshTopK(emb, "vec_id", "embedding", queryIds, k,
        bits = 6, tables = 8, multiProbe = true, maxProbes = 2))
    info(f"lshTopK DIRECTED(2) recall@$k: $directed%.3f")
    assert(directed >= multi,
      "directed probing must never fall below home-bucket-only")
    assert(directed <= probed,
      "a probe subset cannot find more than the full probe set")
  }

  test("IVF top-k recall vs brute force, and nprobe=2 never below nprobe=1") {
    val r1 = recallOf(Similarity.ivfTopK(emb, "vec_id", "embedding",
      centroidIds = (10L to 17L), queryIds, k, nprobe = 1))
    val r2 = recallOf(Similarity.ivfTopK(emb, "vec_id", "embedding",
      centroidIds = (10L to 17L), queryIds, k, nprobe = 2))
    info(f"ivfTopK recall@$k: nprobe=1 $r1%.3f, nprobe=2 $r2%.3f")
    assert(r1 >= 0.1, f"IVF nprobe=1 recall collapsed: $r1%.3f")
    assert(r2 >= r1, "probing more cells must never lose candidates")
  }

  test("PQ top-k recall vs exact-L2 ground truth has a measured floor") {
    // PQ approximates L2 — grade it against the L2 exact ranking, not
    // the cosine one (unnormalized vectors rank differently per metric)
    val exactL2 = Similarity.bruteForceTopKL2(emb, "vec_id", "embedding",
        queryIds, k)
      .select("query_id", "cand_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val got = Similarity.pqTopK(emb, "vec_id", "embedding",
        codebookIds = (20L to 35L), queryIds, k, m = 8)
      .select("query_id", "cand_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val per = queryIds.map(q =>
      (exactL2(q) & got.getOrElse(q, Set.empty)).size.toDouble / k)
    val r = per.sum / per.size
    // these embeddings are structure-free random vectors — the hardest
    // case for PQ; measured 0.20 here (random baseline: k/N ≈ 0.02)
    info(f"pqTopK recall@$k vs exact L2: m=8, 16-entry codebooks $r%.3f")
    assert(r >= 0.1, f"PQ recall collapsed: $r%.3f")
  }

  test("IVFPQ recall: cell pruning costs recall vs plain PQ, never adds") {
    val exactL2 = Similarity.bruteForceTopKL2(emb, "vec_id", "embedding",
        queryIds, k)
      .select("query_id", "cand_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    def recallVsL2(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.select("query_id", "cand_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      queryIds.map(q =>
        (exactL2(q) & got.getOrElse(q, Set.empty)).size.toDouble / k)
        .sum / queryIds.size
    }
    val pq = recallVsL2(Similarity.pqTopK(emb, "vec_id", "embedding",
      codebookIds = (20L to 35L), queryIds, k, m = 8))
    val ivfpq = recallVsL2(Similarity.ivfpqTopK(emb, "vec_id", "embedding",
      centroidIds = (10L to 17L), codebookIds = (20L to 35L),
      queryIds, k, m = 8, nprobe = 2))
    info(f"recall@$k vs exact L2: pq $pq%.3f, ivfpq(nprobe=2) $ivfpq%.3f")
    assert(ivfpq <= pq + 1e-9,
      "cell pruning can only remove candidates, never add recall")
    assert(ivfpq >= 0.02, f"IVFPQ recall collapsed below random: $ivfpq%.3f")
  }

  test("PQ codes table is m codes per vector (index compression holds)") {
    // pqTopK's encode leg, reproduced: every (vector, subspace) must
    // resolve to exactly ONE code — the 8x compression that lets ADC
    // scoring touch codes instead of vectors.
    val n = emb.count()
    val scored = Similarity.pqTopK(emb, "vec_id", "embedding",
      codebookIds = (20L to 35L), queryIds = Seq(0L), k = n.toInt, m = 8)
    // one approx distance per (query, candidate): no subspace fan-out
    assert(scored.count() == n - 1)
  }

  test("blocked near-dup pairs recover most exact pairs at high threshold") {
    val exactPairs = Similarity.nearDupPairsExact(emb, "vec_id", "embedding",
      maxId = 300, threshold = 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity.nearDupPairs(emb, "vec_id", "embedding",
      maxId = 300, threshold = 0.3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(exactPairs), "blocking must never invent pairs")
    val recall =
      if (exactPairs.isEmpty) 1.0
      else (exactPairs & blocked).size.toDouble / exactPairs.size
    info(f"blocked near-dup recall = $recall%.3f over ${exactPairs.size} exact pairs")
    assert(recall >= 0.1, f"blocking recall collapsed: $recall%.3f")
  }

  test("kCenterGreedy: hand 1-D geometry picks the farthest point then " +
    "the best-spread third; radius curve non-increasing on real data") {
    import spark.implicits._
    // dim-0 positions 0, 0.1, 1.0, 1.1, 5.0 -> quantized 0/100/1000/1100/5000
    val pts = Seq(0.0f, 0.1f, 1.0f, 1.1f, 5.0f).zipWithIndex.map {
      case (x, i) => (i.toLong, Array.tabulate(64)(d => if (d == 0) x else 0f))
    }.toDF("vec_id", "embedding")
    val got = Similarity.kCenterGreedy(pts, "vec_id", "embedding",
        k = 3, seedId = 0L)
      .as[(Int, Long, Double)].collect().toSeq
    // from 0: farthest is 5000 (d=5000^2); then min-dists to {0,5000}
    // are 1e4 / 1e6 / 1.21e6 -> id 3 wins
    assert(got == Seq((1, 0L, 0.0), (2, 4L, 2.5e7), (3, 3L, 1.21e6)),
      s"got $got")

    val emb = graft.io.Tables.load(spark, sf, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") < 100)
    val real = Similarity.kCenterGreedy(emb, "vec_id", "embedding",
        k = 6, seedId = 0L)
      .as[(Int, Long, Double)].collect().toSeq
    assert(real.map(_._2).distinct.size == 6, "centers must be distinct")
    val radii = real.drop(1).map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a },
      s"coreset radius curve must be non-increasing, got $radii")
  }

  test("kCenterGreedy: missing seed id fails fast with a named message") {
    import spark.implicits._
    val pts = Seq((0L, Array.fill(64)(1f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.kCenterGreedy(pts, "vec_id", "embedding",
        k = 1, seedId = 99L)
    }
    assert(e.getMessage.contains("seed id 99 not found"), e.getMessage)
  }

  test("knnLabelDisagreement: a planted mislabel inside a tight cluster " +
    "is the ONLY suspect; relabeling it empties the report") {
    import spark.implicits._
    // all-positive coordinates put every vector in the same sign bucket
    // of every table, so LSH candidates = all pairs and the neighbor
    // vote is over the EXACT top-k
    val u = Array.tabulate(64)(i => if (i == 0) 10f else 0.1f)
    val v = Array.tabulate(64)(i => if (i == 1) 10f else 0.1f)
    def corpus(labelOf3: Int) = Seq(
      (0L, u, 0), (1L, u, 0), (2L, u, 0), (3L, u, labelOf3),
      (4L, v, 1), (5L, v, 1), (6L, v, 1), (7L, v, 1)
    ).toDF("vec_id", "embedding", "label")
    val flagged = Similarity.knnLabelDisagreement(corpus(labelOf3 = 1),
        "vec_id", "embedding", "label", k = 3, maxId = 0L)
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(flagged == Seq((3L, 1, 3L, 3L)),
      s"expected only the planted mislabel, got $flagged")
    val clean = Similarity.knnLabelDisagreement(corpus(labelOf3 = 0),
        "vec_id", "embedding", "label", k = 3, maxId = 0L)
      .count()
    assert(clean == 0L, "a consistent labelling must flag nothing")
  }

  test("lloydStep recovers true cluster means from off-center seeds") {
    import spark.implicits._
    // two tight clusters around (0,0) and (10,10) in embedding space;
    // seeds deliberately off-center but on the correct sides
    val pts = Seq(
      (0L, Array(0.001f, 0.002f)), (1L, Array(-0.001f, 0.0f)),
      (2L, Array(0.002f, -0.001f)),
      (10L, Array(0.010f, 0.010f)), (11L, Array(0.012f, 0.010f)),
      (12L, Array(0.011f, 0.008f))
    ).toDF("vec_id", "embedding")
    val seeds = Seq(0L -> Seq(3L, 3L), 1L -> Seq(8L, 8L)) // quantized grid
    val got = Similarity.lloydStep(pts, "vec_id", "embedding", seeds)
      .orderBy("cell", "dim")
      .select("cell", "dim", "mean_q", "n_members")
      .as[(Long, Int, Double, Long)].collect().toSeq
    // quantized coords: cluster A {(1,2),(-1,0),(2,-1)} mean (2/3, 1/3);
    // cluster B {(10,10),(12,10),(11,8)} mean (11, 28/3)
    assert(got == Seq(
      (0L, 0, 0.666667, 3L), (0L, 1, 0.333333, 3L),
      (1L, 0, 11.0, 3L), (1L, 1, 9.333333, 3L)), got.toString)
  }

  test("IVF with a kmeans-learned codebook vs seed member vectors") {
    val seeds = (20L to 27L).toSeq
    val learned = Similarity.kmeans(emb, "vec_id", "embedding", seeds, iters = 3)
    val rLearned = recallOf(Similarity.ivfTopKCodebook(
      emb, "vec_id", "embedding", learned, queryIds, k, nprobe = 2))
    val rFixed = recallOf(Similarity.ivfTopK(
      emb, "vec_id", "embedding", seeds, queryIds, k, nprobe = 2))
    info(f"IVF recall@$k nprobe=2: learned $rLearned%.3f vs seed-vector $rFixed%.3f")
    // structure-free random vectors don't reward training much — pin
    // that learning is at least not harmful, and absolute floor holds
    assert(rLearned >= rFixed - 0.1,
      f"learned centroids collapsed recall: $rLearned%.3f vs $rFixed%.3f")
    assert(rLearned >= 0.1, f"learned-IVF recall floor: $rLearned%.3f")
  }

  test("kmeans training: inertia never increases across rounds") {
    val seeds = Seq(3L, 17L, 42L, 99L)
    val cb0 = Similarity.kmeans(emb, "vec_id", "embedding", seeds, iters = 1)
    val cb2 = Similarity.kmeans(emb, "vec_id", "embedding", seeds, iters = 3)
    val i0 = Similarity.inertia(emb, "vec_id", "embedding", cb0)
    val i2 = Similarity.inertia(emb, "vec_id", "embedding", cb2)
    info(f"inertia after 1 round = $i0%.0f, after 3 rounds = $i2%.0f")
    assert(i2 <= i0 * 1.000001,
      s"Lloyd iterations must not increase the objective: $i0 -> $i2")
    assert(cb2.size == seeds.size && cb2.forall(_._2.size == 64))
  }

  test("semDedup: threshold monotone, idempotent, rule holds per survivor") {
    val codebook = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => BigDecimal(x.toDouble * 1000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong).toSeq)
      .toSeq.sortBy(_._1)
    def survivors(t: Double, of: org.apache.spark.sql.DataFrame = emb) =
      Similarity.semDedup(of, "vec_id", "embedding", codebook, t)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    val loose = survivors(0.3)
    val tight = survivors(0.45)
    info(s"survivors: t=0.3 -> ${loose.size}, t=0.45 -> ${tight.size} of ${emb.count()}")
    assert(loose.size < emb.count(), "0.3 must actually prune this corpus")
    assert(loose.subsetOf(tight),
      "raising the threshold can only add survivors")
    val again = survivors(0.3,
      emb.filter(org.apache.spark.sql.functions.col("vec_id")
        .isin(loose.toSeq: _*)))
    assert(again == loose, "semDedup must be idempotent at a fixed threshold")
  }

  test("labelCentroids: sum vector is exact; separable clusters classify perfectly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two well-separated 4-dim clusters
    val rows = Seq(
      (1L, Seq(1.0f, 0.9f, 0.0f, 0.0f), 0), (2L, Seq(0.9f, 1.1f, 0.1f, 0.0f), 0),
      (3L, Seq(0.0f, 0.1f, 1.0f, 1.1f), 1), (4L, Seq(0.1f, 0.0f, 0.9f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    val cents = Similarity.labelCentroids(rows, "embedding", "label")
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1)).toMap
    assert(cents(0) == Seq(1900L, 2000L, 100L, 0L))
    assert(cents(1) == Seq(100L, 100L, 1900L, 2100L))
    val conf = Similarity.nearestCentroidConfusion(rows, "vec_id",
      "embedding", "label")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(conf == Set((0, 0, 2L), (1, 1, 2L)))
  }

  test("nearestCentroidConfusion: real labels are mostly self-assigned and rows sum to corpus") {
    val conf = Similarity.nearestCentroidConfusion(emb, "vec_id",
      "embedding", "label").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(conf.map(_._3).sum == emb.count())
    val diag = conf.filter(c => c._1 == c._2).map(_._3).sum.toDouble
    val nLabels = conf.map(_._1).distinct.length
    info(f"self-assignment rate: ${diag / emb.count()}%.2f over $nLabels labels")
    // the synthetic labels are weakly separable (measured ~0.37); the
    // invariant worth pinning is "well above the 1/|labels| chance rate"
    assert(diag / emb.count() > 2.0 / nLabels)
  }

  test("lloydStep assignment is join-free (literal codebook, one exchange)") {
    val step = Similarity.lloydStep(emb, "vec_id", "embedding",
      Seq(0L -> Seq.fill(64)(0L), 1L -> Seq.fill(64)(500L)))
    val plan = step.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    assert(plan.sliding("Exchange".length).count(_ == "Exchange") <= 1,
      "corpus must shuffle once (partial-agged cell/dim means):\n" + plan)
  }

  test("silhouette: hand geometry — centered point scores 1, midpoint 0") {
    import spark.implicits._
    val codebook = Seq(0L -> Seq(0L, 0L), 1L -> Seq(1000L, 0L))
    val rows = Seq(
      (10L, Array(0.0f, 0.0f)),   // exactly on centroid 0: s = 1
      (11L, Array(0.5f, 0.0f)),   // midpoint: a = b -> s = 0
      (12L, Array(0.9f, 0.0f)))   // near centroid 1: s = (900-100)/900
    val got = Similarity.silhouette(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", codebook)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(4)))).toMap
    assert(got(10L) == ((0L, 1.0)))
    assert(got(11L)._2 == 0.0) // tie assignment -> smaller cell, s = 0
    assert(got(11L)._1 == 0L)  // (dist, cell) struct min picks cell 0
    assert(got(12L)._1 == 1L)
    assert(math.abs(got(12L)._2 - 800.0 / 900.0) < 1e-6)
  }

  test("dbscan: two planted blobs cluster, stragglers stay noise") {
    import spark.implicits._
    // 8-dim vectors: blob A around e1, blob B around e2, two isolates
    def v(base: Int, jitter: Float) = Array.tabulate(8)(i =>
      (if (i == base) 1.0f else 0.0f) + (if (i == (base + 1) % 8) jitter
       else 0.0f))
    val rows = Seq(
      (0L, v(0, 0.05f)), (1L, v(0, 0.1f)), (2L, v(0, 0.15f)),
      (10L, v(2, 0.05f)), (11L, v(2, 0.1f)), (12L, v(2, 0.15f)),
      (20L, v(5, 0.0f)), (21L, v(7, 0.0f))) // isolated directions
    val out = Similarity.dbscan(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", maxId = 0, eps = 0.9, minPts = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    // blob A -> one cluster labelled by its min id 0
    Seq(0L, 1L, 2L).foreach(i => assert(out(i) == (("core", 0L)), s"$i"))
    Seq(10L, 11L, 12L).foreach(i => assert(out(i) == (("core", 10L))))
    Seq(20L, 21L).foreach(i => assert(out(i)._1 == "noise" &&
      out(i)._2 == -1L))
  }

  test("dbscan: border points attach to the smallest core neighbor") {
    import spark.implicits._
    // chain: 1-2-3 dense (cores), 9 touches only core 3 with a single
    // neighbor -> border of cluster 1
    def u(a: Double, b: Double) = Array(a.toFloat, b.toFloat)
    val rows = Seq(
      (1L, u(1, 0)), (2L, u(0.995, 0.0999)), (3L, u(0.98, 0.198)),
      (9L, u(0.93, 0.36)))
    val out = Similarity.dbscan(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", maxId = 0, eps = 0.98, minPts = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(2L)._1 == "core")
    assert(out(9L)._1 == "border" && out(9L)._2 == out(2L)._2,
      out.toString)
  }

  test("randomProject == plain-Scala signed sums over quantized values") {
    import spark.implicits._
    val vecs = Seq(
      (1L, Array(0.25f, -0.5f, 1.0f)),
      (2L, Array(0.0f, 0.0004f, -0.0004f)), // rounds to all-zero
      (3L, Array(2.5f, 2.5f, 2.5f)))
    val signs = Similarity.signProjSigns(3, 2, seed = 0)
    assert(signs.flatten.forall(s => s == 1L || s == -1L))
    val expected = vecs.map { case (id, v) =>
      val q = v.map(x => BigDecimal(x.toDouble * 1000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
      id -> signs.map(row => row.zip(q).map { case (s, x) => s * x }.sum
        .toDouble).toSeq
    }.toMap
    val got = Similarity.randomProject(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", inDim = 3, outDim = 2, seed = 0)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(got == expected, s"got=$got expected=$expected")
    assert(got(2L) == Seq(0.0, 0.0))
  }

  test("randomProject: row-local plan (no exchange), seeds independent") {
    val proj = Similarity.randomProject(emb, "vec_id", "embedding", 64, 8)
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"), plan)
    val s0 = Similarity.signProjSigns(64, 8, 0).flatten.toSeq
    val s1 = Similarity.signProjSigns(64, 8, 1).flatten.toSeq
    assert(s0 != s1)
    // a ±1 matrix from a fair hash is roughly balanced
    val bal = s0.count(_ == 1L).toDouble / s0.size
    assert(bal > 0.35 && bal < 0.65, s"sign balance $bal")
  }
}
