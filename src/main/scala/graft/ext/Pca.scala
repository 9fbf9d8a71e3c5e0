package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality
  * reduction / whitening front end a 100 TB embedding pipeline runs
  * before ANN indexing or clustering (reference has no linear-algebra
  * surface; this is builder-brief extension territory, the
  * [[Similarity.randomProject]] tier's data-driven sibling: JL
  * projection is oblivious, PCA is the optimal linear map for a GIVEN
  * corpus).
  *
  * Decomposition of the work by scale:
  *   - [[comoments]] — the only corpus-sized pass: exact integer
  *     co-moment sums over QUANTIZED vectors (the [[Similarity.quantize]]
  *     convention, round(x·1000) → long), one shuffle of at most
  *     dim(dim+1)/2 groups after map-side partial aggregation. Every
  *     (n, Σx, Σy, Σxy) cell is an exact integer — order-independent,
  *     partitioning-independent, engine-exact — so the covariance
  *     matrix an oracle rebuilds in SQL hash-matches bit for bit.
  *   - [[fit]] — collects the ≤ dim(dim+1)/2 co-moment rows (MODEL
  *     state, the k-means-codebook collect convention: bounded by dim²,
  *     never by data) and eigensolves the dim×dim covariance on the
  *     driver with cyclic Jacobi rotations. dim is an embedding width
  *     (64-4096): O(dim³) per sweep is microseconds-to-milliseconds,
  *     and Jacobi on a real symmetric matrix is unconditionally
  *     convergent with orthonormal eigenvectors by construction.
  *   - [[project]] — applies the model as PLAN LITERALS (the
  *     signProjSigns convention): p_j = q·v_j − mean·v_j, one fused
  *     codegen'd [[graft.functions.native_fns.double_dot]] per output
  *     component against the literal eigenvector, with the scalar
  *     mean·v_j folded at plan time. Row-local, no shuffle, no join;
  *     whitening divides by √λ_j, another literal.
  *
  * Scale contract: one corpus scan to fit (the co-moment pass), one
  * row-local map to project. Nothing data-sized ever sits on the
  * driver and no stage's cardinality exceeds the corpus. Co-moment
  * sums hold exactly in Long for n·(1000·|x|)² < 2^63 — at |x| ≤ 30
  * (quantized ≤ 30k) that is ~10^10 rows per... cell; beyond that,
  * pre-aggregate per shard with [[comoments]] and merge the integer
  * cells additively (they are plain sums).
  */
object Pca {

  /** Fitted PCA model: quantized-space mean and the eigen-decomposition
    * of the quantized-space covariance, eigenvalues descending,
    * eigenvectors orthonormal rows of `components` (components(j)(i) =
    * loading of input dim i on output component j), each row
    * sign-canonicalized so its largest-|loading| entry is positive
    * (Jacobi's column signs are otherwise arbitrary — canonical signs
    * make fits reproducible).
    */
  case class PcaModel(dim: Int, n: Long, mean: Array[Double],
                      eigenvalues: Array[Double],
                      components: Array[Array[Double]]) {
    require(components.length == dim && eigenvalues.length == dim)
    /** Total variance = trace of the covariance = Σ eigenvalues. */
    def totalVariance: Double = eigenvalues.sum
  }

  /** Exact upper-triangle co-moment table of the quantized embedding:
    * one row per (i, j), 1-based, i ≤ j ≤ dim, with
    * (n, sx=Σxᵢ, sy=Σxⱼ, sxy=Σxᵢxⱼ) as exact Long sums and the
    * population covariance `cov = (sxy − sx·sy/n)/n` as one IEEE
    * double expression over those exact integers.
    *
    * Plan shape: two CHAINED row-local generators — posexplode of the
    * quantized vector (component i), then posexplode of its suffix
    * slice from position i (component j ≥ i) — feed a hash aggregate
    * keyed by (i, j). The dim(dim+1)/2-fold row blowup happens inside
    * one whole-stage-codegen'd map stage and collapses to ≤ 2080
    * groups per task via map-side combine before the single shuffle;
    * no self-join of the corpus, no dim²-sized shuffle. Vectors
    * shorter than `dim` contribute only the pairs they have (the
    * try_element_at convention); the per-cell `n` counts actual
    * contributions, so ragged inputs stay mathematically consistent.
    */
  def comoments(emb: DataFrame, vecCol: String, dim: Int): DataFrame = {
    require(dim > 0, s"dim must be positive, got $dim")
    val q = emb.select(Similarity.quantize(col(vecCol)).as("__q"))
    val ei = q.select(col("__q"),
      posexplode(col("__q")).as(Seq("__i0", "xi")))
    val eij = ei.select(col("__i0"), col("xi"),
      posexplode(slice(col("__q"), col("__i0") + 1, lit(dim)))
        .as(Seq("__j0", "xj")))
    eij
      .select((col("__i0") + 1).as("i"),
        (col("__i0") + 1 + col("__j0")).as("j"),
        col("xi"), col("xj"))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(col("xi")).as("sx"),
        sum(col("xj")).as("sy"),
        sum(col("xi") * col("xj")).as("sxy"))
      .withColumn("cov",
        (col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double") /
            col("n").cast("double")) / col("n").cast("double"))
  }

  /** Merge co-moment tables (the mergeable-state tier, AggState's
    * pattern applied to the PCA model): every cell is a plain integer
    * sum, so per-shard / per-day [[comoments]] outputs fold LOSSLESSLY
    * into the global table — `merge(comoments(A), comoments(B)) ==
    * comoments(A ∪ B)` bit-for-bit, which is the 100 TB fit path (one
    * pass per new shard, never a recompute over history). Input: any
    * union of co-moment tables (the `cov` column, if present, is
    * dropped and re-derived — it is a RATIO, not mergeable state).
    */
  def mergeComoments(cells: DataFrame): DataFrame =
    cells
      .groupBy(col("i"), col("j"))
      .agg(sum(col("n")).as("n"), sum(col("sx")).as("sx"),
        sum(col("sy")).as("sy"), sum(col("sxy")).as("sxy"))
      .withColumn("cov",
        (col("sxy").cast("double") -
          col("sx").cast("double") * col("sy").cast("double") /
            col("n").cast("double")) / col("n").cast("double"))

  /** Fit a PCA model: run [[comoments]], collect the bounded triangle,
    * assemble the symmetric covariance, Jacobi-eigensolve on the
    * driver. The collect is dim(dim+1)/2 rows of five numbers — model
    * state, not data.
    */
  def fit(emb: DataFrame, vecCol: String, dim: Int): PcaModel =
    fitCells(comoments(emb, vecCol, dim), dim)

  /** Fit from an existing co-moment table (one-pass or merged shard
    * states — identical models either way, since the cells are exact).
    */
  def fitCells(cells: DataFrame, dim: Int): PcaModel = {
    val rows = cells
      .select(col("i"), col("j"), col("n"), col("sx"), col("sy"),
        col("sxy"), col("cov"))
      .collect()
    require(rows.nonEmpty, "empty input: nothing to fit")
    val cov = Array.ofDim[Double](dim, dim)
    val mean = new Array[Double](dim)
    val diagSeen = new Array[Boolean](dim)
    var n = 0L
    rows.foreach { r =>
      val i = r.getInt(0) - 1
      val j = r.getInt(1) - 1
      require(i >= 0 && j >= 0 && i < dim && j < dim,
        s"cell (${i + 1},${j + 1}) outside declared dim=$dim")
      val c = r.getDouble(6)
      cov(i)(j) = c
      cov(j)(i) = c
      if (i == j) {
        mean(i) = r.getLong(3).toDouble / r.getLong(2).toDouble
        diagSeen(i) = true
        // ragged inputs give each diagonal its own n; the model's n is
        // the corpus row count = the largest per-dimension count
        n = math.max(n, r.getLong(2))
      }
    }
    // fail fast on silently-degraded models: a dimension with NO data
    // would otherwise fit as mean 0 / zero variance with no signal
    val missing = (0 until dim).filterNot(diagSeen)
    require(missing.isEmpty,
      s"no data for dimension(s) ${missing.map(_ + 1).mkString(", ")}: " +
        s"every diagonal co-moment cell (i,i), i in 1..$dim, must be " +
        "present — is `dim` larger than the actual vector width?")
    val (vals, vecs) = jacobiEigen(cov)
    PcaModel(dim, n, mean, vals, vecs)
  }

  /** Cyclic Jacobi eigensolver for a real symmetric matrix: repeatedly
    * zero the largest-magnitude off-diagonal entry's row-sweep until
    * the off-diagonal Frobenius mass is below tolerance. Returns
    * (eigenvalues desc, orthonormal eigenvector ROWS in matching
    * order, sign-canonicalized). O(dim³) per sweep, ~log(1/tol) sweeps
    * — driver-side model math, same tier as the k-means codebook.
    */
  private[ext] def jacobiEigen(
      m: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val dim = m.length
    val a = m.map(_.clone())
    // v starts as identity; accumulates the rotations COLUMN-wise:
    // column k of v is the eigenvector of eigenvalue a(k)(k).
    val v = Array.tabulate(dim, dim)((i, j) => if (i == j) 1.0 else 0.0)
    def offMass(): Double = {
      var s = 0.0
      var i = 0
      while (i < dim) {
        var j = i + 1
        while (j < dim) { s += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
      s
    }
    val tol = 1e-22 * math.max(1.0,
      (0 until dim).map(i => a(i)(i) * a(i)(i)).sum)
    var sweep = 0
    while (offMass() > tol && sweep < 64) {
      sweep += 1
      var p = 0
      while (p < dim - 1) {
        var q = p + 1
        while (q < dim) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            // classic Jacobi rotation zeroing a(p)(q)
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              case s => s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < dim) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < dim) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < dim) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
    }
    // order by eigenvalue DESC (ties by original index for determinism),
    // extract eigenvector COLUMNS as rows, canonicalize signs
    val order = (0 until dim)
      .sortBy(k => (-a(k)(k), k))
    val vals = order.map(k => a(k)(k)).toArray
    val vecs = order.map { k =>
      val col = Array.tabulate(dim)(i => v(i)(k))
      val imax = col.indices.maxBy(i => (math.abs(col(i)), -i))
      if (col(imax) < 0) col.map(x => -x) else col
    }.toArray
    (vals, vecs)
  }

  /** The literal projection columns for `model`'s top `k` components
    * applied to a MATERIALIZED quantized-as-double vector column `qd`:
    * p_j = double_dot(qd, v_j) − (mean·v_j), both model legs plan-time
    * literals, one fused codegen'd loop per component. With
    * `whiten = true` each component is scaled by 1/√λ_j (components
    * with λ ≤ 0 — numerically empty directions — emit 0.0 rather than
    * an infinity).
    */
  private def projCols(model: PcaModel, k: Int, whiten: Boolean,
                       qd: Column): Seq[Column] =
    (0 until k).map { j =>
      val vrow = model.components(j)
      val shift = vrow.indices.map(i => model.mean(i) * vrow(i)).sum
      val raw = graft.functions.native_fns
        .double_dot(qd, lit(vrow)) - lit(shift)
      if (!whiten) raw
      else if (model.eigenvalues(j) > 0)
        raw / lit(math.sqrt(model.eigenvalues(j)))
      else lit(0.0)
    }

  /** Project embeddings onto the model's top `k` principal components
    * (quantized space, centered). Output: (idCol, proj ARRAY<DOUBLE>
    * of length k). Row-local — no shuffle, no join; the model rides
    * the plan as literals.
    */
  def project(emb: DataFrame, idCol: String, vecCol: String,
              model: PcaModel, k: Int, whiten: Boolean = false): DataFrame = {
    require(k >= 1 && k <= model.dim, s"k must be in [1, ${model.dim}]")
    emb
      .select(col(idCol),
        Similarity.quantize(col(vecCol)).cast("array<double>").as("__qd"))
      .select(col(idCol),
        array(projCols(model, k, whiten, col("__qd")): _*).as("proj"))
  }

  /** End-to-end identity check used by the oracle-checked `x_pca_var`
    * query: fit on the corpus, project onto the FULL basis, and report
    * Σ_j Var_pop(p_j) / Σ_i Cov(i,i) rounded to 6dp. An orthonormal
    * basis preserves total variance exactly, so a correct
    * fit + projection yields 1.000000 — while the denominator comes
    * from the DATA (the exact co-moment diagonal), not from the
    * eigensolve, so a broken rotation cannot cancel out. Numerator
    * variance is a per-component aggregate over the projected corpus:
    * posexplode (row-local) → groupBy(component) sums → one bounded
    * global fold of ≤ dim partial rows.
    */
  def varianceRatio(emb: DataFrame, idCol: String, vecCol: String,
                    dim: Int): DataFrame = {
    // ONE co-moment corpus pass, lazily materialized: both the fit
    // collect and the trace filter below read the same ≤dim(dim+1)/2
    // cached rows (inlining would run the corpus scan twice — the
    // twice-computed-subtree class). The denominator stays
    // data-derived, so the identity-check property is preserved.
    val cells = comoments(emb, vecCol, dim).localCheckpoint(false)
    val model = fitCells(cells, dim)
    val proj = project(emb, idCol, vecCol, model, k = dim)
    val perComp = proj
      .select(posexplode(col("proj")).as(Seq("__j", "p")))
      .groupBy(col("__j"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("sp"),
        sum(col("p") * col("p")).as("spp"))
      .select(((col("spp") - col("sp") * col("sp") / col("n")) /
        col("n")).as("v"))
    val traceCov = cells
      .filter(col("i") === col("j"))
      .agg(sum(col("cov")).as("trace"))
    perComp.agg(sum(col("v")).as("pvar"))
      .crossJoin(broadcast(traceCov))
      .select(lit(dim).as("n_components"),
        round(col("pvar") / col("trace"), 6).as("var_ratio"))
  }
}
