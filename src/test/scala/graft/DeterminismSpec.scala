package graft

/** Partitioning-invariance sweep: every registered query must produce
  * IDENTICAL rows under different shuffle fan-out and scan split sizes.
  * This is the engine-side half of the oracle contract — the DuckDB
  * gate catches Spark-vs-DuckDB divergence, but same-engine
  * nondeterminism (a double sum whose value depends on accumulation
  * order, a tie broken by partition layout) can agree with the oracle
  * on one layout and flake on another. The repo-wide disciplines this
  * pins: DECIMAL accumulation for cross-row sums, md5-derived hashing,
  * explicit tie-break columns in every ORDER BY / top-k.
  */
class DeterminismSpec extends SparkTestBase {

  private def runAll(): Map[String, Seq[String]] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (n, fn) =>
      val rows = fn(spark, sf).collect()
        .map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
      n -> rows
    }.toMap

  test("every query is bit-identical under different shuffle fan-out " +
      "and scan split sizes") {
    val conf = spark.conf
    val origShuffle = conf.get("spark.sql.shuffle.partitions")
    val origSplit = conf.get("spark.sql.files.maxPartitionBytes")
    val base =
      try runAll()
      finally {
        conf.set("spark.sql.shuffle.partitions", origShuffle)
        conf.set("spark.sql.files.maxPartitionBytes", origSplit)
      }
    val alt =
      try {
        conf.set("spark.sql.shuffle.partitions", "13")
        conf.set("spark.sql.files.maxPartitionBytes", "262144") // 256 KB
        runAll()
      } finally {
        conf.set("spark.sql.shuffle.partitions", origShuffle)
        conf.set("spark.sql.files.maxPartitionBytes", origSplit)
      }
    val diverged = base.keys.toSeq.sorted.filter(n => base(n) != alt(n))
    assert(diverged.isEmpty,
      s"layout-dependent results: ${diverged.mkString(", ")}")
  }
}
