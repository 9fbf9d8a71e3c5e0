package graft.io

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import graft.SparkTestBase

class TablesSpec extends SparkTestBase {
  import spark.implicits._

  test("savePartitioned: partition filters prune before IO") {
    val out = java.nio.file.Files.createTempDirectory("parts").toString
    val tidy = Seq(
      (2022, "NSW", 1.0), (2022, "VIC", 2.0),
      (2023, "NSW", 3.0), (2023, "VIC", 4.0)
    ).toDF("year", "state", "separations")
    Tables.savePartitioned(tidy, out, "clean", Seq("year", "state"))

    val scan = Tables.load(spark, out, "clean")
      .filter(col("year") === 2023 && col("state") === "NSW")
    // the physical scan must carry partition filters and read 1 partition
    val exec = scan.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: FileSourceScanExec => f
    }.get
    assert(exec.partitionFilters.nonEmpty, "partition filters missing")
    assert(scan.collect().map(_.getDouble(0)).toSeq == Seq(3.0))
    // directory layout is hive-style
    assert(new java.io.File(s"$out/clean.parquet/year=2023/state=NSW").exists)
  }

  test("dynamic partition pruning: dim filter prunes the fact scan at " +
    "runtime") {
    val out = java.nio.file.Files.createTempDirectory("dpp").toString
    val fact = (1 to 2000).map(i => (i % 20, i.toLong, i * 1.0))
      .toDF("part_year", "k", "v")
    Tables.savePartitioned(fact, out, "fact", Seq("part_year"))
    (0 until 20).map(y => (y, if (y < 2) "keep" else "drop"))
      .toDF("dim_year", "tag")
      .write.parquet(s"$out/dim.parquet")
    // DPP needs the join key to be the partition column, a real Filter
    // on the dim side (a Seq-backed dim constant-folds to a
    // LocalRelation and the rule sees no filter), and a selective
    // predicate only known at runtime
    val dim = spark.read.parquet(s"$out/dim.parquet")
    val joined = Tables.load(spark, out, "fact")
      .join(dim.filter(col("tag") === "keep"),
        col("part_year") === col("dim_year"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan not DPP-pruned:\n$plan")
    assert(joined.count() == 200) // 2 of 20 partitions survive
  }

  test("malformed-record tolerance: PERMISSIVE captures bad rows, " +
    "DROPMALFORMED filters them") {
    val dir = java.nio.file.Files.createTempDirectory("badrec").toString
    val f = new java.io.PrintWriter(s"$dir/data.json")
    f.println("""{"k": 1, "v": "ok"}""")
    f.println("""{broken json""")
    f.println("""{"k": 3, "v": "ok2"}""")
    f.close()
    // (type-mismatch rows are deliberately absent: whether they land in
    // _corrupt_record or silently null the field depends on which
    // columns the first action parses — a null-count audit, not the
    // corrupt channel, is the stable catch for those)
    val schema = "k LONG, v STRING, _corrupt_record STRING"
    val permissive = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$dir/data.json")
    // json needs the corrupt column materialized before filtering on it
    val cached = permissive.cache()
    try {
      assert(cached.filter(col("_corrupt_record").isNotNull).count() == 1)
      assert(cached.filter(col("_corrupt_record").isNull).count() == 2)
      assert(cached.filter(col("k") === 3).select("v")
        .head().getString(0) == "ok2")
    } finally cached.unpersist()
    val dropped = spark.read.schema("k LONG, v STRING")
      .option("mode", "DROPMALFORMED")
      .json(s"$dir/data.json")
    assert(dropped.count() == 2)
  }

  test("join strategy control: hints force SMJ / shuffle-hash / " +
    "broadcast picks") {
    val big = (1 to 1000).map(i => (i.toLong, i * 1.0)).toDF("k", "v")
    val dim = (1 to 50).map(i => (i.toLong, s"n$i")).toDF("k", "name")
    def planOf(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.executedPlan.toString
    assert(planOf(big.join(dim.hint("merge"), "k"))
      .contains("SortMergeJoin"))
    assert(planOf(big.join(dim.hint("shuffle_hash"), "k"))
      .contains("ShuffledHashJoin"))
    assert(planOf(big.join(broadcast(dim), "k"))
      .contains("BroadcastHashJoin"))
  }

  test("saveBucketed: co-bucketed join plans without a shuffle") {
    Seq("orders_b", "lineitem_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    val o = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_totalprice")
    val l = Tables.load(spark, sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    Tables.saveBucketed(o, "orders_b", "o_orderkey", 4)
    Tables.saveBucketed(l.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 4)
    // disable broadcast so the planner actually exercises the co-located
    // path (at test scale everything is broadcastable; at 100 TB the
    // fact-fact join is not — that is the case bucketing exists for)
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("lineitem_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(joined.count() == l.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("compact: many small files -> numFiles, identical content, atomic swap") {
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val path = s"$dir/t.parquet"
    val df = Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    df.repartition(37).write.parquet(path)
    def parquetFiles = new java.io.File(path).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles == 37)
    val before = df.orderBy("o_orderkey").collect()
    Tables.compact(spark, path, numFiles = 3)
    assert(parquetFiles == 3, s"expected 3 files, got $parquetFiles")
    val after = spark.read.parquet(path).orderBy("o_orderkey").collect()
    assert(after.sameElements(before), "compaction must not change rows")
    assert(!new java.io.File(path + "__compact").exists(),
      "side directory must be swapped away")
  }

  test("saveSorted: disjoint ordered shards, name order == total order, " +
    "manifest prunes range reads") {
    val out = java.nio.file.Files.createTempDirectory("sorted").toString
    val rnd = new scala.util.Random(3)
    val df = (0 until 5000).map(i => (rnd.nextInt(100000), i))
      .toDF("k", "payload")
    val version = Tables.saveSorted(df, out, "t", Seq("k"), numShards = 8)
    assert(version == 0L)
    val manifest = ZoneMap.readManifest(spark, s"$out/t.manifest")
    val zones = manifest.orderBy(col("file"))
      .select(col("file"), col("k__min"), col("k__max"), col("n_rows"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getLong(3)))
    assert(zones.length == 8, s"expected 8 shards, got ${zones.length}")
    assert(zones.map(_._4).sum == 5000L)
    // shard ranges are DISJOINT and ordered by file name: file order is
    // the global order
    zones.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 < b._2, s"overlap: ${a._1} max ${a._3} vs ${b._1} " +
        s"min ${b._2}")
    }
    // each shard is internally sorted -> concatenation in name order is
    // the globally sorted table
    val concat = zones.flatMap { case (f, _, _, _) =>
      spark.read.parquet(f).select("k").collect().map(_.getInt(0))
    }
    assert(concat.toSeq == df.collect().map(_.getInt(0)).sorted.toSeq)
    // a narrow range predicate prunes to O(1) shards, same rows
    val (lo, hi) = (zones(3)._2, zones(3)._2 + 50)
    val admitted = ZoneMap.prunedFiles(manifest, "k", lo, hi)
    assert(admitted.size <= 2, s"pruning admitted ${admitted.size} shards")
    val viaScan = ZoneMap.skipScan(spark, s"$out/t.parquet", manifest,
      "k", lo, hi).count()
    val full = df.filter(col("k") >= lo && col("k") <= hi).count()
    assert(viaScan == full)
  }

  test("withFallback: primary empty -> fallback plan, else primary") {
    val primary = Seq(1).toDF("x").filter(col("x") > 99)
    val got = Tables.withFallback(primary)(Seq(7).toDF("x"))
    assert(got.as[Int].collect().toSeq == Seq(7))
    val got2 = Tables.withFallback(Seq(5).toDF("x"))(Seq(7).toDF("x"))
    assert(got2.as[Int].collect().toSeq == Seq(5))
  }

  test("format breadth: csv/json/orc round-trip rows, schema, and nulls") {
    val dir = java.nio.file.Files.createTempDirectory("fmt").toString
    val src = Tables.load(spark, sf, "nation")
      .withColumn("n_name",
        when(col("n_nationkey") % 2 === 0, col("n_name"))) // plant nulls
    val before = src.orderBy("n_nationkey").collect().toSeq
    for (fmt <- Seq("csv", "json", "orc")) {
      Tables.saveFormat(src, dir, "nation", fmt,
        options = if (fmt == "csv") Map("header" -> "true") else Map.empty)
      val back = Tables.loadFormat(spark, dir, "nation", fmt,
        schema = if (fmt == "orc") None else Some(src.schema),
        options = if (fmt == "csv") Map("header" -> "true") else Map.empty)
      assert(back.schema == src.schema, s"$fmt schema")
      assert(back.orderBy("n_nationkey").collect().toSeq == before,
        s"$fmt rows (incl. null round-trip)")
    }
    intercept[IllegalArgumentException] {
      Tables.loadFormat(spark, dir, "nation", "csv") // schemaless text read
    }
  }
}
