package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Dsir, Graph, Retrieval, Similarity, SuffixArray}

/** Scale-evidence bench: replicate `documents` / `embeddings` /
  * `events` 10× and 100× (the BASELINE.md RefBench replica method) and
  * measure the headliner operators at each factor, so the 100 TB
  * design claims rest on MEASURED scaling curves instead of plan-shape
  * argument (round-9 verdict task #1).
  *
  * Replica construction (`ensureReplica`): replica r > 0 of a document
  * salts EVERY token with `_r`, so the within-replica duplicate
  * structure is preserved exactly while replicas share no vocabulary —
  * pair-generating operators (minhash buckets, prefix postings) scale
  * with corpus size, the honest measurement, instead of quadratically
  * with the replication factor (an artifact of byte-identical clones:
  * F copies of one near-dup group form C(F·g,2) pairs). Embeddings
  * replicate as-is (LSH bucket population grows ×F — exactly the
  * candidate-growth a bigger corpus brings to a top-k query); ids get
  * a per-replica stride so the fixed query ids 0-4 stay replica-0
  * rows. All other tables are symlinked from the base directory, so
  * any `SparkEntry` query runs unchanged against a replica dir.
  *
  * Usage: `runMain graft.ScaleBench [baseDir] [factorsCsv] [runs]`
  * (defaults: /root/testdata/sf0.1, "1,10,100", 3). Output: one
  * PERF.md-ready markdown table + `scale_bench.json`.
  */
object ScaleBench {

  val BaseTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem")

  /** Keyed by the BASE directory's name: a replica built from sf0.01
    * must never satisfy a request for sf0.1's (the `_READY` marker is
    * per (base, factor), not per factor).
    */
  def replicaDir(baseDir: String, factor: Int): String = {
    val base = java.nio.file.Paths.get(baseDir).getFileName.toString
    s"/tmp/graft_scale/$base/x$factor"
  }

  def ensureReplica(spark: SparkSession, baseDir: String,
                    factor: Int): String = {
    val dir = replicaDir(baseDir, factor)
    val done = java.nio.file.Paths.get(dir, "_READY")
    if (java.nio.file.Files.exists(done)) return dir
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    for (t <- BaseTables) {
      val link = java.nio.file.Paths.get(dir, s"$t.parquet")
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(link,
          java.nio.file.Paths.get(s"$baseDir/$t.parquet"))
    }
    replicateCorpus(spark, baseDir, dir, factor)
    java.nio.file.Files.write(done, Array.emptyByteArray)
    dir
  }

  /** The LLM-corpus tables (documents token-salted, embeddings/events
    * id-strided), shared by [[ensureReplica]] and
    * [[ensureOracleReplica]]. */
  private def replicateCorpus(spark: SparkSession, baseDir: String,
                              dir: String, factor: Int): Unit = {
    val r = spark.range(factor).toDF("__r")
    val docs = spark.read.parquet(s"$baseDir/documents.parquet")
    val docStride = 1L + docs.agg(max(col("doc_id"))).head().getLong(0)
    docs.crossJoin(r)
      .select((col("doc_id") + col("__r") * docStride).as("doc_id"),
        when(col("__r") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            t => concat(t, lit("_"), col("__r"))), " ")).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$baseDir/embeddings.parquet")
    val vecStride = 1L + emb.agg(max(col("vec_id"))).head().getLong(0)
    emb.crossJoin(r)
      .select((col("vec_id") + col("__r") * vecStride).as("vec_id"),
        col("embedding"), col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val ev = spark.read.parquet(s"$baseDir/events.parquet")
    val evStride = 1L + ev.agg(max(col("event_id"))).head().getLong(0)
    val userStride = 1L + ev.agg(max(col("user_id"))).head().getLong(0)
    ev.crossJoin(r)
      .select((col("event_id") + col("__r") * evStride).as("event_id"),
        col("ts"),
        (col("user_id") + col("__r") * userStride).as("user_id"),
        col("event_type"), col("value"), col("props"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  /** FK-consistent FULL-star replica for the ×F ORACLE sweep (round-11
    * verdict task #2). [[ensureReplica]] symlinks the TPC-H tables
    * (the batch scale bench only drives the corpus tables); the oracle
    * sweep instead needs every FACT table ×F so the DuckDB compare
    * exercises overflow/window/prefix-sum behavior at real 10×
    * magnitudes. Keys stride COHERENTLY so join queries stay
    * referentially intact across replicas: c_custkey with o_custkey,
    * o_orderkey with l_orderkey, p_partkey with l_partkey, s_suppkey
    * with l_suppkey. region/nation stay shared (grouping dims — their
    * per-group counts grow ×F, which is the point). Value columns
    * replicate verbatim: sums grow ×F, distributions are unchanged,
    * so any cross-engine disagreement at ×F is a genuine
    * magnitude-class defect, not a data-shape artifact.
    */
  def ensureOracleReplica(spark: SparkSession, baseDir: String,
                          factor: Int): String = {
    val base = java.nio.file.Paths.get(baseDir).getFileName.toString
    val dir = s"/tmp/graft_scale/$base/oracle_x$factor"
    val done = java.nio.file.Paths.get(dir, "_READY")
    if (java.nio.file.Files.exists(done)) return dir
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    for (t <- Seq("region", "nation")) {
      val link = java.nio.file.Paths.get(dir, s"$t.parquet")
      if (!java.nio.file.Files.exists(link))
        java.nio.file.Files.createSymbolicLink(link,
          java.nio.file.Paths.get(s"$baseDir/$t.parquet"))
    }
    val r = spark.range(factor).toDF("__r")
    def stride(table: String, key: String): Long =
      1L + spark.read.parquet(s"$baseDir/$table.parquet")
        .agg(max(col(key))).head().getLong(0)
    val custS = stride("customer", "c_custkey")
    val ordS = stride("orders", "o_orderkey")
    val partS = stride("part", "p_partkey")
    val suppS = stride("supplier", "s_suppkey")
    def write(table: String, strided: Map[String, Long]): Unit = {
      val src = spark.read.parquet(s"$baseDir/$table.parquet")
      val cols = src.schema.fieldNames.map { c =>
        strided.get(c) match {
          case Some(s) => (col(c) + col("__r") * s).as(c)
          case None => col(c)
        }
      }
      src.crossJoin(r).select(cols.toSeq: _*).repartition(32)
        .write.mode("overwrite").parquet(s"$dir/$table.parquet")
    }
    write("customer", Map("c_custkey" -> custS))
    write("supplier", Map("s_suppkey" -> suppS))
    write("part", Map("p_partkey" -> partS))
    write("orders", Map("o_orderkey" -> ordS, "o_custkey" -> custS))
    write("lineitem", Map("l_orderkey" -> ordS, "l_partkey" -> partS,
      "l_suppkey" -> suppS))
    replicateCorpus(spark, baseDir, dir, factor)
    java.nio.file.Files.write(done, Array.emptyByteArray)
    dir
  }

  /** Locate the balanced `{...}` object of a top-level member; the
    * file holds only identifier keys and numbers, so a brace count
    * needs no string-escape handling. Returns (keyStart, objEnd+1,
    * raw object). */
  private def extractMember(json: String,
                            key: String): Option[(Int, Int, String)] = {
    val k = "\"" + key + "\":"
    val i = json.indexOf(k)
    if (i < 0) return None
    var j = i + k.length
    val start = j
    var depth = 0
    while (j < json.length) {
      val c = json.charAt(j)
      if (c == '{') depth += 1
      else if (c == '}') {
        depth -= 1
        if (depth == 0) return Some((i, j + 1, json.substring(start, j + 1)))
      }
      j += 1
    }
    None
  }

  /** Remove a named top-level object member, returning the json
    * without it plus the raw extracted object. */
  private def removeMember(json: String,
                           key: String): (String, Option[String]) =
    extractMember(json, key) match {
      case None => (json, None)
      case Some((i, e, raw)) =>
        var s = i; var t = e
        if (t < json.length && json.charAt(t) == ',') t += 1
        else {
          var p = i - 1
          while (p >= 0 && json.charAt(p).isWhitespace) p -= 1
          if (p >= 0 && json.charAt(p) == ',') s = p
        }
        (json.substring(0, s) + json.substring(t), Some(raw))
    }

  /** (batch members without outer braces, raw streaming object, raw
    * longdoc object). */
  private def splitSections(old: String)
      : (String, Option[String], Option[String]) = {
    val (noStream, stream) = removeMember(old, "streaming")
    val (noBoth, longdoc) = removeMember(noStream, "suffix_array_longdoc")
    (noBoth.trim.stripPrefix("{").stripSuffix("}").trim, stream, longdoc)
  }

  /** `scale_bench.json` = the batch operators' flat members plus one
    * `"streaming"` object and one `"suffix_array_longdoc"` object.
    * Each writer ([[ScaleBench]] batch, [[StreamScaleBench]],
    * [[SaLongDocBench]]) replaces ONLY its own section and carries
    * the others forward from the existing file, so the mains can
    * run independently without clobbering each other's evidence. */
  def writeScaleJson(batchBody: Option[String] = None,
                     streaming: Option[String] = None,
                     longdoc: Option[String] = None): Unit = {
    val path = java.nio.file.Paths.get("scale_bench.json")
    val old =
      if (java.nio.file.Files.exists(path))
        new String(java.nio.file.Files.readAllBytes(path),
          java.nio.charset.StandardCharsets.UTF_8)
      else "{}"
    val (oldBatch, oldStream, oldLong) = splitSections(old)
    val members = Seq(
      batchBody.orElse(Some(oldBatch)).filter(_.nonEmpty),
      streaming.orElse(oldStream).map(x => s""""streaming":$x"""),
      longdoc.orElse(oldLong).map(x => s""""suffix_array_longdoc":$x"""))
      .flatten.mkString(",")
    java.nio.file.Files.write(path,
      ("{" + members + "}\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Warm once (pays codegen), then median of `runs` timed counts. */
  private def deleteTree(dir: String): Unit = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .sorted(java.util.Comparator.reverseOrder())
      .iterator().asScala.foreach(java.nio.file.Files.deleteIfExists(_))
  }

  private def timeDf(df: DataFrame, runs: Int): (Double, Long) = {
    val rows = df.count()
    val ts = (1 to runs).map { _ =>
      val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
    }.sorted
    (ts(runs / 2), rows)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = args.lift(1).getOrElse("1,10,100")
      .split(",").map(_.trim.toInt).toSeq
    val runs = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // op -> factor -> (sec, rows); insertion order drives the table
    val results = scala.collection.mutable.LinkedHashMap[
      String, scala.collection.mutable.LinkedHashMap[Int, (Double, Long)]]()
    def record(op: String, factor: Int, sec: Double, rows: Long): Unit = {
      results.getOrElseUpdate(op,
        scala.collection.mutable.LinkedHashMap()).update(factor, (sec, rows))
      println(f"SCALE $op%-22s x$factor%-4d ${sec}%8.2f s  ($rows rows)")
    }

    val docStride = 1L + spark.read
      .parquet(s"$baseDir/documents.parquet")
      .agg(max(col("doc_id"))).head().getLong(0)

    for (factor <- factors) {
      val dir =
        if (factor == 1) baseDir else ensureReplica(spark, baseDir, factor)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")

      locally {
        val (s, n) = timeDf(Dedup.nearDupSurvivors(docs, "doc_id", "text",
          minJaccard = 0.8, maxBucket = 0), runs)
        record("minhash_pipeline", factor, s, n)
        spark.catalog.clearCache() // nearDupSurvivors persists candidates
      }
      locally {
        // candidates: a fixed 300-doc window PER REPLICA (the
        // x_jaccard_prefix shape, replicated F-fold). Full-corpus
        // exact-Jaccard on this template-dense synthetic data is
        // OUTPUT-bound — duplicate groups grow with the corpus, so
        // verified pairs grow quadratically (measured: 3.0M pairs /
        // 116 s at the 5k-doc base) — which would measure result
        // materialization, not the prefix-filter machinery. The
        // per-replica window keeps the workload ∝ F.
        val (s, n) = timeDf(Dedup.jaccardPairsPrefix(docs, "doc_id", "text",
          n = 1, candidates = col("doc_id") % lit(docStride) < 300,
          minJaccard = 0.8, maxDf = 0), runs)
        record("jaccard_prefix_w300", factor, s, n)
      }
      locally { // the round-10 single-scan composition
        val grams = Dsir.gramCounts(docs, "doc_id", "text",
          col("lang") === "en", buckets = 256)
        val model = Dsir.modelFromCounts(grams, buckets = 256)
        val (s, n) = timeDf(Dsir.selectTopK(
          Dsir.scoresFromCounts(grams, "doc_id", model), "doc_id", 50), runs)
        record("dsir_select", factor, s, n)
      }
      locally {
        val (s, n) = timeDf(Retrieval.bm25TopK(docs, "doc_id", "text",
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10), runs)
        record("bm25_topk", factor, s, n)
      }
      locally {
        // bitmask contamination matrix: replicas salt tokens, so the
        // distinct-gram table grows ∝ F while the source set (and so
        // the mask cardinality + pair output) stays fixed — the op's
        // claimed shape is "cost ∝ gram scan, never grams × pairs".
        // The operator localCheckpoints its gram table internally, so
        // each run builds a FRESH plan end-to-end (timeDf would only
        // re-count the cached mask side).
        def once(): (Double, Long) = {
          val t0 = System.nanoTime()
          val n = graft.ext.TextAnalysis
            .sourceOverlap(docs, "source", "text").count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        once() // warm (codegen + shuffle machinery)
        val timed = (1 to runs).map(_ => once()).sortBy(_._1)
        val (s, n) = timed(runs / 2)
        record("source_overlap", factor, s, n)
      }
      locally {
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_scale_idx").toString
        try {
          val t0 = System.nanoTime()
          Retrieval.saveTextIndex(docs, "doc_id", "text", tmp, nBuckets = 16)
          record("bm25_index_build", factor,
            (System.nanoTime() - t0) / 1e9, -1L)
          val (s, n) = timeDf(Retrieval.bm25TopKIndexed(
            docs.filter(col("doc_id").isin(0L, 1L, 2L, 3L, 4L)),
            "doc_id", "text", tmp, k = 10), runs)
          record("bm25_indexed_query", factor, s, n)
        } finally {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(java.nio.file.Paths.get(tmp))
            .sorted(java.util.Comparator.reverseOrder())
            .iterator().asScala
            .foreach(java.nio.file.Files.deleteIfExists(_))
        }
      }
      locally {
        val (s, n) = timeDf(Similarity.lshTopK(emb, "vec_id", "embedding",
          queryIds = Seq(0L, 1L, 2L, 3L, 4L), k = 10, bits = 6, tables = 8,
          multiProbe = true), runs)
        record("ann_lsh_multiprobe", factor, s, n)
      }
      locally {
        // pair-graph build is charged to minhash_pipeline above; the
        // eager checkpoint isolates pagerank's own per-iteration joins
        val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
          bands = 4, rowsPerBand = 2, maxBucket = 0).localCheckpoint()
        val edges = pairs
          .select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(pairs
            .select(col("id_b").as("src"), col("id_a").as("dst")))
          .localCheckpoint()
        val (s, n) = timeDf(Graph.pageRank(edges, iters = 3), runs)
        record("pagerank_3it", factor, s, n)
        // connected components: the star loop executes EAGERLY during
        // construction (per-round convergence counts), so the honest
        // number is a construction+count — best of two, because a
        // single shot is exposed to one GC pause across ~10 jobs
        // (measured: a 13 s blip on a 4 s loop). The ROUND COUNT is
        // the O(log n) evidence — it must stay flat as the graph grows.
        def ccOnce(): (Double, Int, Long) = {
          val t0 = System.nanoTime()
          val (labels, r) = Dedup.connectedComponentsStats(pairs)
          val n = labels.count()
          ((System.nanoTime() - t0) / 1e9, r, n)
        }
        val best = Seq(ccOnce(), ccOnce()).minBy(_._1)
        record("conn_components", factor, best._1, best._3)
        record("cc_star_rounds(count)", factor, best._2.toDouble, best._3)
      }
      locally {
        val (s, n) = timeDf(
          SparkEntry.queries("x_llm_pipeline2")(spark, dir), runs)
        record("llm_pipeline2", factor, s, n)
      }
      locally {
        // distributed suffix array (prefix doubling): a 2000-doc
        // window PER REPLICA (workload ∝ F — the full synthetic
        // corpus is duplicate-dense, so unbounded growth would
        // measure duplicate-run pathology, not the builder). Claims
        // this measures: build ∝ corpus tokens × rounds, rounds =
        // log2(maxDocLen / prefixWidth) CONSTANT across factors
        // (doc length doesn't grow with corpus size) — the curve
        // should be ~linear in F. Fresh-build protocol (the builder
        // checkpoints internally, so timeDf would only re-count).
        def saOnce(width: Int): (Double, Long, Int) = {
          val t0 = System.nanoTime()
          val b = SuffixArray.buildStats(
            docs.filter(col("doc_id") % lit(docStride) < 2000),
            "doc_id", "text", prefixWidth = width)
          val n = b.sa.count() // build() already counted; cached read
          val sec = (System.nanoTime() - t0) / 1e9
          // release the persisted index BEFORE the next timed run:
          // back-to-back builds would otherwise accumulate resident
          // indexes in the shared JVM and race the context cleaner
          // during later runs (round-13 ADVICE)
          b.sa.unpersist(true)
          (sec, n, b.rounds)
        }
        saOnce(0) // warm (codegen + shuffle machinery)
        val timed = (1 to runs).map(_ => saOnce(0)).sortBy(_._1)
        val (s, n, rounds) = timed(runs / 2)
        record("suffix_array_build", factor, s, n)
        record("sa_rounds(count)", factor, rounds.toDouble, n)
        if (factor == 1) {
          // rounds-vs-width sensitivity at ×1 (the autoPrefixWidth
          // calibration evidence): widths bracket the auto pick; the
          // array CONTENT is width-independent, only where the work
          // lands moves (round-0 key bytes vs doubling rounds)
          for (w <- Seq(4, 8, 16, 32)) {
            val (sw, nw, rw) = saOnce(w)
            record(s"sa_build_w$w", factor, sw, nw)
            record(s"sa_rounds_w$w(count)", factor, rw.toDouble, nw)
          }
        }
      }
      locally {
        // segment-store lifecycle (round-11 verdict task #5): the IVF
        // index's full maintenance cycle — build on a fifth of the
        // corpus, append the other four fifths as segments, search the
        // 5-segment index, compact to one segment, search again,
        // vacuum. Claims this measures: append ∝ ITS batch (each
        // append indexes corpus/5 regardless of how big the index
        // already is — the medians across the four appends should be
        // flat within a factor and grow ∝ F across factors), compact
        // ∝ total live rows, search bounded by probed (seg × cell)
        // partitions, vacuum driver-side metadata + dead-tree deletes.
        val lifeDir = java.nio.file.Files
          .createTempDirectory("graft_scale_ivf_life").toString
        try {
          // centroid ids ≡ 0 (mod 5): all inside the init slice, and
          // replica id-striding preserves id % 5 (stride 2000 ≡ 0)
          val cents = (0L to 75L by 5L).toSeq
          var t0 = System.nanoTime()
          Similarity.initIvfIndex(emb.filter(col("vec_id") % 5 === 0),
            "vec_id", "embedding", cents, lifeDir)
          record("ivf_init_fifth", factor,
            (System.nanoTime() - t0) / 1e9, -1L)
          val appendSecs = (1 to 4).map { b =>
            val t = System.nanoTime()
            Similarity.appendIvfIndexAs(
              emb.filter(col("vec_id") % 5 === b),
              "vec_id", "embedding", lifeDir, seg = b.toLong)
            (System.nanoTime() - t) / 1e9
          }
          record("ivf_append_med4", factor, appendSecs.sorted.apply(2), -1L)
          val q = emb.filter(col("vec_id").isin(0L, 5L, 10L, 15L, 20L))
          val (s5, n5) = timeDf(Similarity.ivfTopKSegmented(q, "vec_id",
            "embedding", lifeDir, k = 10, nprobe = 2), runs)
          record("ivf_search_5seg", factor, s5, n5)
          t0 = System.nanoTime()
          Similarity.compactIvfIndex(spark, lifeDir)
          record("ivf_compact", factor, (System.nanoTime() - t0) / 1e9, -1L)
          val (s1, n1) = timeDf(Similarity.ivfTopKSegmented(q, "vec_id",
            "embedding", lifeDir, k = 10, nprobe = 2), runs)
          record("ivf_search_compacted", factor, s1, n1)
          t0 = System.nanoTime()
          val deleted = Similarity.vacuumIvfIndex(spark, lifeDir,
            keepVersions = 1)
          record("ivf_vacuum", factor, (System.nanoTime() - t0) / 1e9,
            deleted.size.toLong)
        } finally deleteTree(lifeDir)
      }
      locally {
        // text-index twin of the lifecycle cycle: build fifth, append
        // four segments, compact, query. bm25_index_build above
        // measures the one-shot build; this pins the MAINTENANCE
        // claims (append ∝ batch, compact ∝ live postings).
        val lifeDir = java.nio.file.Files
          .createTempDirectory("graft_scale_ti_life").toString
        try {
          var t0 = System.nanoTime()
          Retrieval.saveTextIndex(docs.filter(col("doc_id") % 5 === 0),
            "doc_id", "text", lifeDir, nBuckets = 16)
          record("text_init_fifth", factor,
            (System.nanoTime() - t0) / 1e9, -1L)
          val appendSecs = (1 to 4).map { b =>
            val t = System.nanoTime()
            Retrieval.appendTextIndexAs(docs.filter(col("doc_id") % 5 === b),
              "doc_id", "text", lifeDir, nBuckets = 16, seg = b.toLong)
            (System.nanoTime() - t) / 1e9
          }
          record("text_append_med4", factor, appendSecs.sorted.apply(2), -1L)
          t0 = System.nanoTime()
          Retrieval.compactTextIndex(spark, lifeDir)
          record("text_compact", factor, (System.nanoTime() - t0) / 1e9, -1L)
          val (sq, nq) = timeDf(Retrieval.bm25TopKIndexed(
            docs.filter(col("doc_id").isin(0L, 1L, 2L, 3L, 4L)),
            "doc_id", "text", lifeDir, k = 10), runs)
          record("text_query_compacted", factor, sq, nq)
          t0 = System.nanoTime()
          val deleted = Retrieval.vacuumTextIndex(spark, lifeDir,
            keepVersions = 1)
          record("text_vacuum", factor, (System.nanoTime() - t0) / 1e9,
            deleted.size.toLong)
        } finally deleteTree(lifeDir)
      }
      locally {
        // k-center coreset (round-11 verdict task #6): the claim is k
        // bounded corpus scans — wall should grow ∝ F at fixed k.
        // Internally checkpoints per round, so timing is FRESH-BUILD
        // per run (the sourceOverlap protocol): repeated counts of one
        // build would only re-read the last checkpoint.
        def once(): Double = {
          val t = System.nanoTime()
          Similarity.kCenterGreedy(emb, "vec_id", "embedding", k = 8,
            seedId = 0L).count()
          (System.nanoTime() - t) / 1e9
        }
        once() // warm
        val med = (1 to runs).map(_ => once()).sorted.apply(runs / 2)
        record("kcenter_k8", factor, med, 8L)
      }
      // events-table headliners (10M rows at ×100): windowed
      // sessionization, the 3-step funnel, and the adjacent-pair
      // Markov transitions — the behavioral family's contract is
      // shuffles bounded by |users|/|groups|, so these must stay
      // near-flat as event volume grows
      for (q <- Seq("x_events_sessions_win", "x_funnel", "x_markov")) {
        val (s, n) = timeDf(SparkEntry.queries(q)(spark, dir), runs)
        record(q.stripPrefix("x_"), factor, s, n)
      }
      System.gc()
    }

    // PERF.md-ready table + machine-readable artifact
    val fs = factors.map(f => s"x$f").mkString(" | ")
    println(s"\n| operator | $fs |")
    println("|---|" + factors.map(_ => "---|").mkString)
    results.foreach { case (op, byF) =>
      val cells = factors.map(f =>
        byF.get(f).map { case (s, _) => f"$s%.2f s" }.getOrElse("—"))
      println(s"| $op | ${cells.mkString(" | ")} |")
    }
    val body = results.map { case (op, byF) =>
      s""""$op":{${byF.map { case (f, (s, n)) =>
        s""""$f":{"sec":$s,"rows":$n}"""
      }.mkString(",")}}"""
    }.mkString(",")
    writeScaleJson(batchBody = Some(body))
    spark.stop()
  }
}

/** Long-document suffix-array evidence (round-13 verdict task #5): the
  * 100 TB story leans on O(log L) doubling rounds for megabyte
  * documents, but the corpus's ~55-token docs finish in 3 rounds —
  * this main builds the array over synthetic 10k-100k-token documents
  * whose repeat structure FORCES the doubling chain deep and measures
  * wall, rounds, and the persist-barrier chain under the same 8 GiB
  * driver the ×100 cell ran in.
  *
  * Synthetic shape (fully deterministic — hash-derived tokens, no RNG):
  * each document is a doc-specific half-length block written TWICE,
  * then a unique tail. The self-repeat of L/2 tokens keeps suffix
  * ranks tied until h >= L/2, so rounds = ceil(log2((L/2) / W)) by
  * construction — 8-11 rounds at L = 10k-100k — while the unique
  * tails guarantee termination. Total token volume stays ~constant
  * (2M) across L, so the wall curve isolates the ROUND count, not
  * data growth: the builder's claim (rounds ∝ log L, each round
  * linear) predicts wall growing only logarithmically as docs get
  * 10× longer at fixed corpus size.
  *
  * Usage: `runMain graft.SaLongDocBench [lengthsCsv] [totalTokens]`
  * (defaults "10000,30000,100000", 2000000). Output: SCALE lines +
  * the `suffix_array_longdoc` section of scale_bench.json.
  */
object SaLongDocBench {
  def main(args: Array[String]): Unit = {
    val lengths = args.headOption.getOrElse("10000,30000,100000")
      .split(",").map(_.trim.toInt).toSeq
    val totalTokens = args.lift(1).map(_.toInt).getOrElse(2000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val out = scala.collection.mutable.LinkedHashMap[String, String]()
    for (len <- lengths) {
      val nDocs = math.max(4, totalTokens / len)
      val half = len / 2
      // block token j of doc i: vocabulary of 50k hash-derived words;
      // tail tokens carry the doc id so they are globally unique
      val docs = spark.range(nDocs).select(col("id").as("doc_id"),
        array_join(concat(
          transform(sequence(lit(0), lit(half - 1)),
            j => concat(lit("w"),
              pmod(xxhash64(col("id"), j), lit(50000L)))),
          transform(sequence(lit(0), lit(half - 1)),
            j => concat(lit("w"),
              pmod(xxhash64(col("id"), j), lit(50000L)))),
          transform(sequence(lit(0), lit(7)),
            j => concat(lit("u"), col("id"), lit("_"), j))), " ")
          .as("text"))
        .repartition(32)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      docs.count()
      val t0 = System.nanoTime()
      val b = SuffixArray.buildStats(docs, "doc_id", "text")
      val n = b.sa.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val expect = math.ceil(math.log((half.toDouble) / b.prefixWidth)
        / math.log(2.0)).toInt
      println(f"SCALE sa_longdoc_L$len%-7d ${sec}%8.2f s  " +
        f"($n rows, rounds=${b.rounds} expect~$expect, " +
        f"W=${b.prefixWidth}, ${nDocs} docs)")
      out(s"L$len") = s"""{"sec":$sec,"rows":$n,"rounds":${b.rounds},""" +
        s""""expect_rounds":$expect,"prefix_width":${b.prefixWidth},""" +
        s""""n_docs":$nDocs}"""
      b.sa.unpersist(true)
      docs.unpersist(true)
      System.gc()
    }
    ScaleBench.writeScaleJson(longdoc = Some(
      out.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")))
    spark.stop()
  }
}

/** Standalone oracle-replica builder:
  * `runMain graft.OracleReplica [baseDir] [factor]` — materializes the
  * FK-consistent ×F star ([[ScaleBench.ensureOracleReplica]]) and
  * prints its directory, for the round-close ×F oracle sweep
  * (Verify + tools/check.py against the replica dir).
  */
object OracleReplica {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = ScaleBench.ensureOracleReplica(spark, baseDir, factor)
    println(s"ORACLE_REPLICA $dir")
    spark.stop()
  }
}
