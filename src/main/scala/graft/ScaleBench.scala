package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Dsir, Graph, Retrieval, Similarity}

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

  /** (batch members without outer braces, raw streaming object). */
  private def splitSections(old: String): (String, Option[String]) =
    extractMember(old, "streaming") match {
      case None =>
        (old.trim.stripPrefix("{").stripSuffix("}").trim, None)
      case Some((i, e, raw)) =>
        var s = i; var t = e
        if (t < old.length && old.charAt(t) == ',') t += 1
        else {
          var p = i - 1
          while (p >= 0 && old.charAt(p).isWhitespace) p -= 1
          if (p >= 0 && old.charAt(p) == ',') s = p
        }
        val without = old.substring(0, s) + old.substring(t)
        (without.trim.stripPrefix("{").stripSuffix("}").trim, Some(raw))
    }

  /** `scale_bench.json` = the batch operators' flat members plus one
    * `"streaming"` object. Either writer ([[ScaleBench]] batch,
    * [[StreamScaleBench]]) replaces ONLY its own section and carries
    * the other forward from the existing file, so the two mains can
    * run independently without clobbering each other's evidence. */
  def writeScaleJson(batchBody: Option[String] = None,
                     streaming: Option[String] = None): Unit = {
    val path = java.nio.file.Paths.get("scale_bench.json")
    val old =
      if (java.nio.file.Files.exists(path))
        new String(java.nio.file.Files.readAllBytes(path),
          java.nio.charset.StandardCharsets.UTF_8)
      else "{}"
    val (oldBatch, oldStream) = splitSections(old)
    val members = Seq(
      batchBody.orElse(Some(oldBatch)).filter(_.nonEmpty),
      streaming.orElse(oldStream).map(x => s""""streaming":$x"""))
      .flatten.mkString(",")
    java.nio.file.Files.write(path,
      ("{" + members + "}\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** Warm once (pays codegen), then median of `runs` timed counts. */
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
