package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** Infer the current round from the driver's committed artifacts:
    * max n over BENCH_r{N}.json files in cwd, plus one (the driver
    * writes round N's artifact AFTER this bench runs). Defaults to 0
    * when none exist (fresh checkout / local experiments).
    */
  def inferRound(): Int = {
    val dir = java.nio.file.Paths.get(".")
    val re = """BENCH_r(\d+)\.json""".r
    val stream = java.nio.file.Files.list(dir)
    var maxN = -1
    try {
      val it = stream.iterator()
      while (it.hasNext) {
        it.next().getFileName.toString match {
          case re(n) => maxN = math.max(maxN, n.toInt)
          case _ =>
        }
      }
    } finally stream.close()
    maxN + 1
  }

  /** The driver captures only the LAST 2000 chars of stdout into the
    * BENCH_r{N}.json artifact and tries to parse them — a 271-query
    * map is ~11 KB, so a full-map final line truncates at the front
    * and the artifact's `parsed` field comes back null (rounds 7-9).
    * This builds a line that FITS: headline total + as many of the
    * slowest queries as the budget allows (slowest first — they are
    * the ones regressions hide in) + a pointer to the full-map file.
    */
  def compactLine(results: Map[String, Double], total: Double,
                  sfDir: String, fullFile: String,
                  budget: Int = 1900): String = {
    val head = f"""{"metric":"total","value":$total%.3f,"unit":"sec","sf":"$sfDir","n_queries":${results.size},"n_failed":${results.values.count(_ < 0)},"full_map":"$fullFile","queries":{"""
    val tail = "}}"
    val entries = results.toSeq.filter(_._2 >= 0).sortBy(-_._2)
      .map { case (k, v) => f""""$k":$v%.3f""" }
    val sb = new StringBuilder(head)
    var first = true
    entries.foreach { e =>
      val add = (if (first) 0 else 1) + e.length
      if (sb.length + add + tail.length <= budget) {
        if (!first) sb.append(',')
        sb.append(e)
        first = false
      }
    }
    sb.append(tail)
    sb.toString
  }

  private def writeFile(path: String, content: String): Unit =
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      content.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm Spark infra (classloading, codegen compiler, shuffle machinery)
    // with one throwaway job so the first timed query isn't charged for it.
    try {
      import org.apache.spark.sql.functions._
      spark.read.parquet(s"$sfDir/nation.parquet")
        .groupBy(col("n_regionkey")).count().count()
    } catch { case _: Throwable => () }
    // Per-query: one untimed warm run of the SAME plan (pays Janino
    // codegen compilation — measured at 0.3-3s per query, cached per
    // identical plan), then the MEDIAN of three timed runs measures
    // steady-state engine execution — one scheduler/GC hiccup can no
    // longer double the suite total (round 1 recorded a 22.4 s phantom
    // for a 0.23 s query from an n=1 sample).
    // Known protocol property: a query whose operator localCheckpoints
    // an intermediate internally (sssp/kcenter/bfs/dsir/bm25/
    // source_overlap/...) materializes it during the warm run, so the
    // timed medians measure the post-checkpoint tail — the right
    // REGRESSION metric for the suite, but not the operator's fresh
    // end-to-end cost. ScaleBench's fresh-build protocol covers that
    // (PERF.md round-11: the source_overlap 0.9-vs-5.8 s lesson).
    // Failures report as -1 per-query but are excluded from the total.
    // Between queries: drop any caches an operator registered (the dedup
    // pipeline persists its candidate-pair list for its own three-way
    // reuse; that cache is dead once the query is timed) and nudge GC so
    // the ContextCleaner reclaims dead broadcasts/shuffles — without
    // this, 271 queries x 4 executions accumulate driver/executor garbage
    // and late queries absorb multi-second full-GC pauses that read as
    // phantom engine cost (round 3 recorded 5.8 s in-suite for a query
    // that measures 0.5 s in a clean JVM).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.count()
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          df.count()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        spark.catalog.clearCache()
        System.gc()
        name -> times(1)
      } catch { case _: Throwable => name -> -1.0 }
    }.toMap
    val qs = results.toSeq.sortBy(_._1)
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // Full map to disk twice: the stable working file AND a
    // round-stamped artifact that survives round close in git —
    // round-over-round attribution reads BENCH_full_r{N}.json instead
    // of reverse-engineering a truncated stdout tail (round-8/9
    // verdict task).
    val round = try inferRound() catch { case _: Throwable => -1 }
    val fullFile = s"BENCH_full_r$round.json"
    writeFile("bench.json", line + "\n")
    writeFile(fullFile, line + "\n")
    spark.stop()
    // stdout carries ONLY the compact line, as the very last thing
    // printed, so the driver's 2000-char tail capture parses it.
    println(compactLine(results, total, sfDir, fullFile))
  }
}
