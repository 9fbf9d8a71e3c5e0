package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class IvmSpec extends SparkTestBase {
  import spark.implicits._

  test("joinDelta == full re-join under row-level (key-overlapping) deltas") {
    val rnd = new scala.util.Random(13)
    val a = (0 until 80).map(i => (rnd.nextInt(12).toLong, s"a$i"))
      .toDF("k", "va")
    val b = (0 until 120).map(i => (rnd.nextInt(12).toLong, s"b$i"))
      .toDF("k", "vb")
    // row splits, NOT key splits: delta rows share keys with old rows,
    // so all three delta legs are non-empty
    val aOld = a.filter(substring(col("va"), 2, 9).cast("int") % 3 =!= 0)
    val dA = a.filter(substring(col("va"), 2, 9).cast("int") % 3 === 0)
    val bOld = b.filter(substring(col("vb"), 2, 9).cast("int") % 4 =!= 0)
    val dB = b.filter(substring(col("vb"), 2, 9).cast("int") % 4 === 0)
    assert(dA.join(bOld, Seq("k")).count() > 0)
    assert(aOld.join(dB, Seq("k")).count() > 0)
    assert(dA.join(dB, Seq("k")).count() > 0)
    val maintained = Ivm.joinDelta(aOld.join(bOld, Seq("k")),
        aOld, dA, bOld, dB, Seq("k"))
      .as[(Long, String, String)].collect().sorted.toSeq
    val full = a.join(b, Seq("k"))
      .as[(Long, String, String)].collect().sorted.toSeq
    assert(maintained == full)
  }

  test("empty deltas are a no-op refresh") {
    val a = Seq((1L, "x"), (2L, "y")).toDF("k", "va")
    val b = Seq((1L, "p"), (1L, "q")).toDF("k", "vb")
    val view = a.join(b, Seq("k"))
    val got = Ivm.joinDelta(view, a, a.limit(0), b, b.limit(0), Seq("k"))
    assert(got.collect().toSeq == view.collect().toSeq)
  }
}
