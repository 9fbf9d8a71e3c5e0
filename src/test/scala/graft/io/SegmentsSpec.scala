package graft.io

import graft.SparkTestBase

/** The version-chain commit protocol shared by the segmented text and
  * IVF indexes: atomic version claiming doubles as lost-update
  * detection for read-modify-write committers.
  */
class SegmentsSpec extends SparkTestBase {

  test("commitVersionAfter: a concurrent claim of the same version " +
    "fails loudly instead of silently dropping a segment") {
    val dir = java.nio.file.Files.createTempDirectory("seg_cas").toString +
      "/idx"
    assert(Segments.commitVersion(spark, dir, Seq(0L)) == 0L)
    // two writers both read base = 0 and each append their own segment;
    // the first CAS wins version 1, the second must fail — committing
    // it would publish an active set missing segment 1
    val base = 0L
    assert(Segments.commitVersionAfter(spark, dir, base, Seq(0L, 1L)) == 1L)
    val e = intercept[IllegalStateException] {
      Segments.commitVersionAfter(spark, dir, base, Seq(0L, 2L))
    }
    assert(e.getMessage.contains("concurrent writer"), e.getMessage)
    // the winner's set is intact and the loser published nothing
    assert(Segments.committedSegments(spark, dir) == Seq(0L, 1L))
    assert(Segments.listVersions(spark, dir) == Seq(0L, 1L))
  }

  test("commitVersion delegates through the CAS: sequential commits " +
    "chain versions 0,1,2 and the newest set is active") {
    val dir = java.nio.file.Files.createTempDirectory("seg_chain")
      .toString + "/idx"
    assert(Segments.commitVersion(spark, dir, Seq(7L)) == 0L)
    assert(Segments.commitVersion(spark, dir, Seq(7L, 8L)) == 1L)
    assert(Segments.commitVersion(spark, dir, Seq(9L)) == 2L)
    assert(Segments.committedSegments(spark, dir) == Seq(9L))
    assert(Segments.allSegmentsEver(spark, dir) == Seq(7L, 8L, 9L))
  }
}
