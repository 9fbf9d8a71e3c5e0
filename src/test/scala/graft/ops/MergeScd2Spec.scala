package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantics pins for [[Merge.mergeInto]] and [[Scd2.buildHistory]] on
  * hand-computable inputs — the oracle queries (x_merge_upsert, x_scd2)
  * cover scale/parity; these cover the clause-scoping edges.
  */
class MergeScd2Spec extends SparkTestBase {

  import spark.implicits._

  test("mergeInto: update replaces, insert appends, unmatched base kept") {
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val upd = Seq((2L, "b2", 99.0), (4L, "d", 40.0)).toDF("k", "name", "v")
    val out = Merge.mergeInto(base, upd, Seq("k"))
      .orderBy("k").as[(Long, String, Double)].collect()
    assert(out.toSeq == Seq((1L, "a", 10.0), (2L, "b2", 99.0),
      (3L, "c", 30.0), (4L, "d", 40.0)))
  }

  test("mergeInto: delete condition only fires on MATCHED rows") {
    val base = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    // k=2 matched+flagged -> deleted; k=9 unmatched+flagged -> inserted
    val upd = Seq((2L, 0.0), (9L, 9.0)).toDF("k", "v")
    val out = Merge.mergeInto(base, upd, Seq("k"),
        deleteCondition = col("v") <= 0.0 || col("k") === 9L)
      .orderBy("k").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 1.0), (9L, 9.0)))
  }

  test("mergeInto: NULL data column in an update row overwrites, not falls back") {
    val base = Seq((1L, Some("x"))).toDF("k", "name")
    val upd = Seq((1L, Option.empty[String])).toDF("k", "name")
    val out = Merge.mergeInto(base, upd, Seq("k")).collect()
    assert(out.length == 1 && out.head.isNullAt(1))
  }

  test("mergeInto: null-keyed rows on either side are dropped, never matched") {
    val base = Seq((Some(1L), "a"), (None, "ghost")).toDF("k", "name")
    val upd = Seq((Option.empty[Long], "phantom")).toDF("k", "name")
    val out = Merge.mergeInto(base, upd, Seq("k"))
      .as[(Option[Long], String)].collect()
    assert(out.toSeq == Seq((Some(1L), "a")))
  }

  test("diffSnapshots classifies insert/update/delete; unchanged absent") {
    val old = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
      .toDF("k", "name", "v")
    val neu = Seq((1L, "a", 1.0), (2L, "b", 9.0), (4L, "d", 4.0))
      .toDF("k", "name", "v")
    val d = Diff.diffSnapshots(old, neu, Seq("k"))
      .orderBy("k").as[(Long, String, Double, String)].collect()
    assert(d.toSeq == Seq((2L, "b", 9.0, "update"), (3L, "c", 3.0, "delete"),
      (4L, "d", 4.0, "insert")))
  }

  test("round trip: mergeInto(old, diff(old, new)) == new (real table)") {
    val base = graft.io.Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
    val neu = base.filter(col("c_custkey") % 5 =!= 0)
      .withColumn("c_acctbal",
        when(col("c_custkey") % 3 === 1, col("c_acctbal") * 2.0)
          .otherwise(col("c_acctbal")))
      .unionByName(base.filter(col("c_custkey") % 4 === 2)
        .select((col("c_custkey") + 500000L).as("c_custkey"),
          col("c_name"), col("c_acctbal")))
    val changes = Diff.diffSnapshots(base, neu, Seq("c_custkey"))
    val rebuilt = Merge.mergeInto(base, changes, Seq("c_custkey"),
      deleteCondition = col("op") === "delete")
    assert(rebuilt.exceptAll(neu).isEmpty && neu.exceptAll(rebuilt).isEmpty,
      "applying the diff must reproduce the new snapshot exactly")
  }

  test("buildHistory: runs collapse; reappearing value opens a NEW interval") {
    val log = Seq(
      (1L, 1L, 10L, "A"), (1L, 2L, 20L, "A"), (1L, 3L, 30L, "B"),
      (1L, 4L, 40L, "A"), // A returns: new interval, not merged with run 1
      (2L, 5L, 15L, "Z"))
      .toDF("user_id", "event_id", "sec", "event_type")
    val h = Scd2.buildHistory(log, "user_id", "sec", "event_id", "event_type")
      .orderBy("user_id", "valid_from")
      .select("user_id", "event_type", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Boolean)].collect()
    assert(h.toSeq == Seq(
      (1L, "A", 10L, Some(30L), false),
      (1L, "B", 30L, Some(40L), false),
      (1L, "A", 40L, None, true),
      (2L, "Z", 15L, None, true)))
  }

  test("buildHistory: intervals are half-open and tile each key's timeline") {
    val h = Scd2.buildHistory(
      graft.ext.Events.loadEvents(spark, sf)
        .select(col("user_id"), col("event_id"), col("ts_sec"),
          col("event_type")),
      "user_id", "ts_sec", "event_id", "event_type")
    // exactly one current interval per user
    val perUser = h.groupBy("user_id")
      .agg(sum(when(col("is_current"), 1).otherwise(0)).as("n_current"))
      .filter(col("n_current") =!= 1)
    assert(perUser.isEmpty)
    // every non-current interval's valid_to equals the next valid_from
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("valid_from")
    val broken = h.withColumn("nxt", lead(col("valid_from"), 1).over(w))
      .filter(col("valid_to").isNotNull && col("valid_to") =!= col("nxt"))
    assert(broken.isEmpty)
  }
}
