package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkTestBase

class EditDistJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val words = Seq(
    (1L, "kitten"), (2L, "sitten"), (3L, "sittin"), (4L, "sitting"),
    (5L, "kitten"),            // exact duplicate of 1
    (6L, "completely-other"), (7L, "ktten")
  ).toDF("id", "s")

  test("selfJoin == naive cross-join verification (exact recall)") {
    val got = EditDistJoin.selfJoin(words, "id", "s", maxDist = 2)
      .orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    val a = words.select(col("id").as("id_a"), col("s").as("s_a"))
    val b = words.select(col("id").as("id_b"), col("s").as("s_b"))
    val naive = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b")).as("d"))
      .filter(col("d") <= 2).orderBy("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == naive)
    assert(got.contains((1L, 2L, 1)))  // kitten ~ sitten
    assert(got.contains((1L, 5L, 0)))  // exact dup at dist 0
    assert(!got.exists(p => p._1 == 6L || p._2 == 6L))
  }

  test("minDist excludes exact duplicates; each pair emitted once") {
    val got = EditDistJoin.selfJoin(words, "id", "s", maxDist = 2,
      minDist = 1).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(!got.contains((1L, 5L)))
    assert(got.distinct.length == got.length, "pairs must be unique")
    assert(got.forall(p => p._1 < p._2))
  }

  test("plan is an equi-join on the candidate-length key (no BNLJ)") {
    val plan = EditDistJoin.selfJoin(words, "id", "s", maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("segmentJoin == selfJoin == naive on adversarial data " +
    "(short strings, planted dups, edits in every segment)") {
    // lengths from 1 (below the segment minimum) to 40; edits planted
    // at the front, middle, and back so every segment position is the
    // one the pigeonhole must catch
    val base = Seq(
      "a", "ab", "abc", "abcd",                       // short-leg strings
      "kitten", "sitten", "kittens", "ktten",
      "the quick brown fox jumps over dogs",
      "Xhe quick brown fox jumps over dogs",           // front edit
      "the quick brXwn fox jumps over dogs",           // middle edit
      "the quick brown fox jumps over dogX",           // back edit
      "the quick brown fox jumps over do",             // back deletions
      "completely unrelated string here")
    val df = base.zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    for (d <- Seq(1, 2, 3)) {
      val seg = EditDistJoin.segmentJoin(df, "id", "s", maxDist = d)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      val band = EditDistJoin.selfJoin(df, "id", "s", maxDist = d)
        .orderBy("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      assert(seg == band, s"segment vs band mismatch at d=$d")
    }
  }

  test("segmentJoin: exact recall on the real part-name slice") {
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .select(col("p_partkey").as("id"), col("p_name").as("s"))
    val seg = EditDistJoin.segmentJoin(parts, "id", "s", maxDist = 2,
      minDist = 1).count()
    val band = EditDistJoin.selfJoin(parts, "id", "s", maxDist = 2,
      minDist = 1).count()
    assert(seg == band, s"segment $seg vs band $band")
  }

  test("segmentJoin == naive on random corpora with random edits " +
    "(ScalaCheck, fixed seeds)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // base strings over a 3-letter alphabet (forces collisions), with
    // mutated variants: substitution, insertion, deletion at random
    // positions — then every d in 1..2 checked against the naive join
    val baseGen = Gen.listOfN(12,
      Gen.chooseNum(1, 14).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString)))
    def mutate(s: String, seed: Long): String = {
      val r = new scala.util.Random(seed)
      if (s.isEmpty) "a"
      else r.nextInt(3) match {
        case 0 => val i = r.nextInt(s.length) // substitute
          s.updated(i, ('a' + r.nextInt(3)).toChar)
        case 1 => val i = r.nextInt(s.length + 1) // insert
          s.take(i) + ('a' + r.nextInt(3)).toChar + s.drop(i)
        case _ => val i = r.nextInt(s.length) // delete
          s.take(i) + s.drop(i + 1)
      }
    }
    (0 until 8).foreach { trial =>
      val base = baseGen(Gen.Parameters.default, Seed(7L + trial)).get
      val all = base ++ base.zipWithIndex.map { case (s, i) =>
        mutate(s, trial * 100L + i)
      }
      val df = all.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "s")
      for (d <- Seq(1, 2)) {
        val seg = EditDistJoin.segmentJoin(df, "id", "s", maxDist = d)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          .toSet
        val a = df.select(col("id").as("id_a"), col("s").as("s_a"))
        val naive = a.crossJoin(
            df.select(col("id").as("id_b"), col("s").as("s_b")))
          .filter(col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
            levenshtein(col("s_a"), col("s_b")).as("dist"))
          .filter(col("dist") <= d)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
          .toSet
        assert(seg == naive,
          s"trial=$trial d=$d missing=${naive -- seg} extra=${seg -- naive}")
      }
    }
  }

  test("segmentJoinDistinct == segmentJoin under heavy duplication, " +
      "minDist 0 and 1") {
    // 6 distinct strings, each in 5-25 copies — the duplicated-domain
    // shape the distinct form exists for
    val vals = Seq("abcab", "abcaa", "bbcab", "cab", "cabb", "aaaaa")
    val r = new scala.util.Random(42)
    val rows = vals.flatMap(v =>
      (0 until 5 + r.nextInt(21)).map(_ => v))
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = rows.toDF("id", "s").repartition(5)
    for (minD <- Seq(0, 1); d <- Seq(1, 2)) {
      val byValue = EditDistJoin.segmentJoinDistinct(df, "id", "s",
          maxDist = d, minDist = minD)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
        .toSet
      val byRow = EditDistJoin.segmentJoin(df, "id", "s",
          maxDist = d, minDist = minD)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2)))
        .toSet
      assert(byValue == byRow,
        s"minD=$minD d=$d missing=${byRow -- byValue} " +
          s"extra=${byValue -- byRow}")
      assert(byValue.size == byValue.map(t => (t._1, t._2)).size,
        "each pair must appear once")
    }
  }

  test("segmentJoin plans equi-joins only (no BNLJ/cartesian)") {
    val plan = EditDistJoin.segmentJoin(words, "id", "s", maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
