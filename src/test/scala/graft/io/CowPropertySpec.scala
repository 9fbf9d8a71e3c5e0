package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Model-based testing of the copy-on-write table: a seeded random
  * sequence of DELETE / UPDATE / OPTIMIZE ops runs against both the
  * manifest-tracked table and a plain in-memory model; after every op
  * the visible snapshot must equal the model, and at the end EVERY
  * recorded version must still time-travel to exactly the state the
  * model had when that version committed — the transaction-log
  * invariant that makes incremental consumers sound.
  */
class CowPropertySpec extends SparkTestBase {
  import spark.implicits._

  private type Row3 = (Long, String, Double)

  private def freshTable(rows: Seq[Row3]): (String, String, String) = {
    val tmp = Files.createTempDirectory("cow_prop").toString
    val data = s"$tmp/data"; val man = s"$tmp/manifest"
    rows.toDF("id", "grp", "v")
      .repartitionByRange(4, col("id"))
      .write.parquet(data)
    ZoneMap.commitManifest(
      ZoneMap.buildManifest(spark, data, Seq("id", "v")), man)
    (tmp, data, man)
  }

  private def snapshot(man: String): Seq[Row3] =
    ZoneMap.scanAsOf(spark, man,
        ZoneMap.currentManifestVersion(spark, man).get)
      .as[Row3].collect().toSeq.sorted

  test("random DELETE/UPDATE/OPTIMIZE sequences == in-memory model, " +
    "with exact time travel to every version") {
    for (seed <- Seq(7, 21)) {
      val rnd = new scala.util.Random(seed)
      var model: Seq[Row3] =
        (0 until 40).map(i => (i.toLong, s"g${i % 5}", (i * 3 % 17) * 1.0))
      val (tmp, data, man) = freshTable(model)
      try {
        val history = scala.collection.mutable.Map[Long, Seq[Row3]]()
        history(ZoneMap.currentManifestVersion(spark, man).get) =
          model.sorted
        for (_ <- 0 until 8 if model.nonEmpty) {
          rnd.nextInt(3) match {
            case 0 => // DELETE on a random id range or value threshold
              if (rnd.nextBoolean()) {
                val lo = rnd.nextInt(45).toLong
                val hi = lo + rnd.nextInt(10)
                Cow.deleteWhere(spark, data, man,
                  col("id").between(lo, hi))
                model = model.filterNot(r => r._1 >= lo && r._1 <= hi)
              } else {
                val t = rnd.nextInt(17).toDouble
                Cow.deleteWhere(spark, data, man, col("v") > t)
                model = model.filterNot(_._3 > t)
              }
            case 1 => // UPDATE a group's values (reads a non-set column)
              val g = s"g${rnd.nextInt(5)}"
              val delta = (rnd.nextInt(9) + 1).toDouble
              Cow.updateWhere(spark, data, man, col("grp") === g,
                Map("v" -> (col("v") + delta)))
              model = model.map(r =>
                if (r._2 == g) (r._1, r._2, r._3 + delta) else r)
            case _ => // OPTIMIZE (sometimes clustered)
              if (model.nonEmpty) {
                val k = rnd.nextInt(3) + 1
                if (rnd.nextBoolean())
                  Cow.compactTable(spark, data, man, k,
                    clusterBy = Seq(col("id")))
                else Cow.compactTable(spark, data, man, k)
              }
          }
          if (model.nonEmpty) {
            assert(snapshot(man) == model.sorted,
              s"seed=$seed: snapshot diverged from model")
            history(ZoneMap.currentManifestVersion(spark, man).get) =
              model.sorted
          }
        }
        // the full log still replays: every version == its model state
        history.foreach { case (v, want) =>
          val got = ZoneMap.scanAsOf(spark, man, v)
            .as[Row3].collect().toSeq.sorted
          assert(got == want, s"seed=$seed: time travel to v$v diverged")
        }
      } finally {
        val root = java.nio.file.Paths.get(tmp)
        val s = Files.walk(root)
        try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => Files.deleteIfExists(f))
        finally s.close()
      }
    }
  }
}
