package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Copy-on-write DELETE / UPDATE over the versioned manifest store:
  * row-level semantics, minimal-rewrite physical behavior, time travel
  * across mutations, and data-file vacuum.
  */
class CowSpec extends SparkTestBase {
  import spark.implicits._

  /** Fresh manifest-tracked table: ids 0..29, 3 range files. */
  private def freshTable(): (String, String, String) = {
    val tmp = Files.createTempDirectory("cow_spec").toString
    val data = s"$tmp/data"; val man = s"$tmp/manifest"
    (0 until 30).map(i => (i.toLong, s"g${i % 3}", i * 10.0))
      .toDF("id", "grp", "v")
      .repartitionByRange(3, col("id"))
      .write.parquet(data)
    ZoneMap.commitManifest(
      ZoneMap.buildManifest(spark, data, Seq("id")), man)
    (tmp, data, man)
  }

  private def snapshot(man: String) =
    ZoneMap.scanAsOf(spark, man,
      ZoneMap.currentManifestVersion(spark, man).get)

  test("deleteWhere removes matching rows; NULL predicate rows stay") {
    val (tmp, data, man) = freshTable()
    try {
      // make one value NULL so the predicate is NULL there
      Cow.updateWhere(spark, data, man, col("id") === 7,
        Map("v" -> lit(null).cast("double")))
      val v = Cow.deleteWhere(spark, data, man, col("v") > 200.0)
      assert(v == ZoneMap.currentManifestVersion(spark, man).get)
      val ids = snapshot(man).select("id").as[Long].collect().sorted
      // deleted: v>200 → ids 21..29 (id 7 has NULL v → stays)
      assert(ids.toSeq == ((0L to 20L)))
    } finally deleteRec(tmp)
  }

  test("only touched files rewritten; untouched paths survive verbatim") {
    val (tmp, data, man) = freshTable()
    try {
      val before = ZoneMap.readManifest(spark, man)
        .select("file").as[String].collect().toSet
      assert(before.size == 3)
      // which physical files actually hold matching rows (range layout
      // boundaries are sampled, so derive rather than assume)
      val touched = spark.read.parquet(before.toSeq: _*)
        .filter(col("id") < 3)
        .select(input_file_name()).distinct().as[String].collect()
        .map(f => new org.apache.hadoop.fs.Path(new java.net.URI(f)).toString)
        .toSet
      assert(touched.nonEmpty && touched.size < before.size)
      Cow.deleteWhere(spark, data, man, col("id") < 3)
      val after = ZoneMap.readManifest(spark, man)
        .select("file").as[String].collect().toSet
      // untouched files keep their exact paths; touched ones leave
      assert((before -- touched).subsetOf(after))
      assert((after intersect touched).isEmpty)
      assert((after -- before).nonEmpty)
      val rows = snapshot(man).count()
      assert(rows == 27)
    } finally deleteRec(tmp)
  }

  test("no-op delete commits nothing") {
    val (tmp, data, man) = freshTable()
    try {
      val v0 = ZoneMap.currentManifestVersion(spark, man).get
      val v = Cow.deleteWhere(spark, data, man, col("id") > 1000)
      assert(v == v0)
      assert(ZoneMap.currentManifestVersion(spark, man).get == v0)
    } finally deleteRec(tmp)
  }

  test("time travel: pre-delete version still serves deleted rows") {
    val (tmp, data, man) = freshTable()
    try {
      val v0 = ZoneMap.currentManifestVersion(spark, man).get
      Cow.deleteWhere(spark, data, man, col("id") >= 15)
      assert(snapshot(man).count() == 15)
      assert(ZoneMap.scanAsOf(spark, man, v0).count() == 30)
    } finally deleteRec(tmp)
  }

  test("update is simultaneous against the pre-update row") {
    val (tmp, data, man) = freshTable()
    try {
      // swap-flavored: v reads id, id reads v — both must see OLD values
      Cow.updateWhere(spark, data, man, col("id") === 4,
        Map("v" -> (col("id") * 1000.0), "id" -> (col("v") + 1).cast("long")))
      val r = snapshot(man).filter(col("v") === 4000.0)
        .select("id", "v").as[(Long, Double)].collect()
      assert(r.toSeq == Seq((41L, 4000.0))) // old v = 40.0 → id 41
    } finally deleteRec(tmp)
  }

  test("delete draining a whole file drops it from the manifest") {
    val (tmp, data, man) = freshTable()
    try {
      val files0 = ZoneMap.readManifest(spark, man).count()
      // drain the lowest range file completely (ids 0..9 in file 1 of 3)
      Cow.deleteWhere(spark, data, man, col("id") < 10)
      val m = ZoneMap.readManifest(spark, man)
      assert(m.count() <= files0) // no stray replacement for an empty file
      assert(snapshot(man).count() == 20)
      assert(snapshot(man).agg(min(col("id"))).as[Long].head() == 10L)
    } finally deleteRec(tmp)
  }

  test("compactTable: content identical, file count shrinks, travel intact") {
    val (tmp, data, man) = freshTable()
    try {
      val v0 = ZoneMap.currentManifestVersion(spark, man).get
      Cow.compactTable(spark, data, man, targetFileCount = 1)
      val m = ZoneMap.readManifest(spark, man)
      assert(m.count() == 1)
      val after = snapshot(man).orderBy("id")
        .as[(Long, String, Double)].collect().toSeq
      val orig = ZoneMap.scanAsOf(spark, man, v0).orderBy("id")
        .as[(Long, String, Double)].collect().toSeq
      assert(after == orig)
    } finally deleteRec(tmp)
  }

  test("compactTable clusterBy produces pruning-tight zones") {
    val (tmp, data, man) = freshTable()
    try {
      // scatter the layout first so ids spread across every file
      Cow.compactTable(spark, data, man, 3) // hash repartition: scattered
      val scattered = ZoneMap.readManifest(spark, man)
      val scatteredHit = ZoneMap.prunedFiles(scattered, "id", 0, 4).size
      Cow.compactTable(spark, data, man, 3, clusterBy = Seq(col("id")))
      val clustered = ZoneMap.readManifest(spark, man)
      val clusteredHit = ZoneMap.prunedFiles(clustered, "id", 0, 4).size
      assert(clusteredHit < scatteredHit)
      assert(ZoneMap.skipScan(spark, data, clustered, "id", 0, 4).count() == 5)
    } finally deleteRec(tmp)
  }

  test("fsck: ok / historical / orphan / missing classification") {
    val (tmp, data, man) = freshTable()
    try {
      Cow.deleteWhere(spark, data, man, col("id") < 3) // makes historicals
      // plant an orphan (never referenced) and a missing file (current,
      // deleted from disk behind the manifest's back)
      val orphan = new java.io.File(s"$data/orphan_plant.parquet")
      java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
      val current = ZoneMap.readManifest(spark, man)
        .select("file").as[String].collect()
      val victim = new java.io.File(new java.net.URI(
        if (current.head.startsWith("file:")) current.head
        else "file:" + current.head))
      assert(victim.delete())
      val report = Cow.fsck(spark, data, man)
        .as[(String, String)].collect().toMap
      assert(report.values.toSet ==
        Set("ok", "historical", "orphan", "missing"))
      assert(report(current.head) == "missing")
      assert(report.find(_._1.endsWith("orphan_plant.parquet"))
        .get._2 == "orphan")
    } finally deleteRec(tmp)
  }

  test("vacuumTable reclaims dead files; old versions fail loudly after") {
    val (tmp, data, man) = freshTable()
    try {
      val v0 = ZoneMap.currentManifestVersion(spark, man).get
      Cow.deleteWhere(spark, data, man, col("id") < 3)
      Cow.deleteWhere(spark, data, man, col("id") >= 27)
      val vN = ZoneMap.currentManifestVersion(spark, man).get
      val dead = Cow.vacuumTable(spark, data, man, keepVersions = 1)
      assert(dead.nonEmpty)
      // current snapshot unaffected
      assert(snapshot(man).count() == 24)
      // pre-vacuum version gone
      intercept[java.io.FileNotFoundException] {
        ZoneMap.readManifestAt(spark, man, v0)
      }
      assert(ZoneMap.currentManifestVersion(spark, man).get == vN)
    } finally deleteRec(tmp)
  }

  test("zone stats refresh for rewritten files (skipScan stays exact)") {
    val (tmp, data, man) = freshTable()
    try {
      Cow.deleteWhere(spark, data, man, col("id").between(10, 14))
      val m = ZoneMap.readManifest(spark, man)
      // pruned read through the refreshed manifest is row-exact
      val hits = ZoneMap.skipScan(spark, data, m, "id", 15, 19).count()
      assert(hits == 5)
      val none = ZoneMap.skipScan(spark, data, m, "id", 10, 14).count()
      assert(none == 0)
    } finally deleteRec(tmp)
  }

  private def deleteRec(p: String): Unit = {
    val root = java.nio.file.Paths.get(p)
    if (Files.exists(root)) {
      val s = Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
  }
}
