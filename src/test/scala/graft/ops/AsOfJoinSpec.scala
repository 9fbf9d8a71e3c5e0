package graft.ops

import org.apache.spark.sql.Row
import graft.SparkTestBase

class AsOfJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("asofJoin picks the latest right row at-or-before each left ts") {
    val trades = Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "B", 5L))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(("A", 5L, 1.0), ("A", 10L, 2.0), ("A", 15L, 3.0),
      ("B", 9L, 9.0))
      .toDF("sym", "t", "px")
    val got = AsOfJoin.asofJoin(trades, quotes, "sym", "t", Seq("px"))
      .orderBy("trade_id").collect()
    // trade 1 at t=10: quote at t=10 (>= convention); trade 2: t=15;
    // trade 3 at t=5: no B quote yet -> null
    assert(got(0) == Row(1L, "A", 10L, 2.0))
    assert(got(1) == Row(2L, "A", 20L, 3.0))
    assert(got(2) == Row(3L, "B", 5L, null))
  }

  test("asofJoin: null-ts/null-key right rows never match (SQL semantics)") {
    val l = Seq((1L, "A", 10L)).toDF("id", "k", "t")
    val r = Seq((Some("A"), Option.empty[Long], Some(9.0)),
      (Option.empty[String], Some(5L), Some(8.0)))
      .toDF("k", "t", "v")
    val got = AsOfJoin.asofJoin(l, r, "k", "t", Seq("v")).collect()
    assert(got(0) == Row(1L, "A", 10L, null))
  }

  test("asofJoin: right rows with null payload fields still win") {
    val l = Seq((1L, "A", 10L)).toDF("id", "k", "t")
    val r = Seq(("A", 3L, Some(1.0)), ("A", 7L, Option.empty[Double]))
      .toDF("k", "t", "v")
    val got = AsOfJoin.asofJoin(l, r, "k", "t", Seq("v")).collect()
    // the t=7 row is the as-of match; its null v must NOT fall back to
    // the older t=3 value
    assert(got(0) == Row(1L, "A", 10L, null))
  }
}
