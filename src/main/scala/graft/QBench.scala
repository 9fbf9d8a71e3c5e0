package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing: `runMain graft.QBench <sfDir> <query>...`.
  * Same harness shape as [[Bench]] (warm run, median of three) but scoped
  * to the named queries, for iterating on one operator without paying the
  * full-suite cost.
  *
  * Every run also MERGES its medians into `bench_isolated.json`
  * (query → isolated median seconds) — the per-query artifact that
  * makes round-over-round comparisons attributable: the in-suite
  * Bench totals carry 20-40% shared-machine drift, so a code-change
  * claim needs the isolated number persisted, not quoted from prose.
  */
object QBench {

  /** Merge medians into bench_isolated.json (flat {"name":sec,...},
    * later runs overwrite same-name entries). */
  def persistIsolated(medians: Map[String, Double]): Unit = {
    val path = java.nio.file.Paths.get("bench_isolated.json")
    val existing: Map[String, Double] =
      if (java.nio.file.Files.exists(path)) {
        val txt = new String(java.nio.file.Files.readAllBytes(path),
          java.nio.charset.StandardCharsets.UTF_8)
        """"([^"]+)":([-0-9.eE]+)""".r.findAllMatchIn(txt)
          .map(m => m.group(1) -> m.group(2).toDouble).toMap
      } else Map.empty
    val merged = (existing ++ medians).toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }
      .mkString("{", ",", "}\n")
    java.nio.file.Files.write(path,
      merged.getBytes(java.nio.charset.StandardCharsets.UTF_8))
  }

  /** The `--top N` selector: the N slowest queries per the last full
    * in-suite run (`bench.json`), so one round-close invocation
    * refreshes the isolated medians for exactly the tail where
    * regressions hide — mechanical drift-vs-code attribution instead
    * of hand-picked coverage (round-9 verdict task #4).
    */
  def topFromBench(n: Int): Seq[String] = {
    val path = java.nio.file.Paths.get("bench.json")
    require(java.nio.file.Files.exists(path),
      "bench.json not found: run graft.Bench first")
    val txt = new String(java.nio.file.Files.readAllBytes(path),
      java.nio.charset.StandardCharsets.UTF_8)
    val inner = txt.substring(txt.indexOf("\"queries\":{") + 11)
    """"([^"]+)":([-0-9.eE]+)""".r.findAllMatchIn(inner)
      .map(m => m.group(1) -> m.group(2).toDouble)
      .filter { case (k, v) => v >= 0 && SparkEntry.queries.contains(k) }
      .toSeq.sortBy(-_._2).take(n).map(_._1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 2 && args(1) == "--top") topFromBench(args(2).toInt)
      // --all: isolated medians for EVERY registered query (round-11
      // verdict task #4) — one mechanical round-close pass so every
      // regression argument is artifact-backed, not just the top-40
      else if (args.length > 1 && args(1) == "--all")
        SparkEntry.queries.keys.toSeq.sorted
      else if (args.length > 1) args.tail.toSeq
      else Seq("x_json_extract")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    val medians = scala.collection.mutable.Map[String, Double]()
    for (n <- names) {
      // build time covers query CONSTRUCTION — lazily-planned queries
      // spend ~0 here, but fixture-style queries (the COW mutations)
      // do their table work eagerly inside the builder, and this is the
      // only place that cost is visible (Bench medians time the
      // post-construction count of an already-materialized result)
      val t0b = System.nanoTime()
      val df = SparkEntry.queries(n)(spark, sfDir)
      val build = (System.nanoTime() - t0b) / 1e9
      val t0w = System.nanoTime()
      df.count()
      val warm = (System.nanoTime() - t0w) / 1e9
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); df.count(); (System.nanoTime() - t0) / 1e9
      }.sorted
      medians(n) = BigDecimal(ts(1)).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble
      // same between-query hygiene as Bench (r14): drop the previous
      // query's checkpoint blocks so a multi-query (esp. --all) run
      // doesn't accrete dead block sets into later timed regions
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
      println(f"QBENCH $n build=$build%.3f warm=$warm%.3f median=${ts(1)}%.3f all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    // stamp the era's machine load beside the medians (flat numeric
    // members, "__"-prefixed so they can never collide with a query
    // name) — makes isolated-vs-in-suite drift arbitration mechanical
    val (l1, l5, nj) = Bench.loadMeta()
    persistIsolated(medians.toMap ++ Map(
      "__loadavg1" -> l1, "__loadavg5" -> l5, "__n_java" -> nj.toDouble,
      "__epoch_sec" -> (System.currentTimeMillis / 1000).toDouble))
    spark.stop()
  }
}
