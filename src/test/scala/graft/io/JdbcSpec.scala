package graft.io

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** JDBC source/sink round trip against embedded Derby (in-memory, on the
  * Spark classpath) — the reference's actual sink is a SQL database
  * (`main.py:156-165`, `to_sql(if_exists="replace")`), and until this
  * spec the JDBC path was environment-blocked "untested". Derby stands
  * in for PostgreSQL: same Spark JDBC source, same dialect machinery,
  * zero network. Scale notes unchanged: `numPartitions` bounds
  * concurrent connections on write; pushdown reaches the database as a
  * WHERE clause on read.
  */
class JdbcSpec extends SparkTestBase {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftjdbc;create=true"

  test("saveJdbc/loadJdbc: overwrite round trip preserves rows and types") {
    val df = Seq(
      (1L, "ALGERIA", 0, 7.5), (2L, "BRAZIL", 1, 3.25),
      (3L, "CANADA", 1, -1.0), (4L, "EGYPT", 4, 0.0)
    ).toDF("n_key", "n_name", "n_region", "score")
    Tables.saveJdbc(df, url, "nation_rt")
    val back = Tables.loadJdbc(spark, url, "nation_rt")
    assert(back.schema.fieldNames.map(_.toLowerCase).sorted.toSeq ==
      Seq("n_key", "n_name", "n_region", "score"))
    val rows = back.select("n_key", "n_name", "n_region", "score")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2),
        r.getDouble(3))).toSet
    assert(rows == Set((1L, "ALGERIA", 0, 7.5), (2L, "BRAZIL", 1, 3.25),
      (3L, "CANADA", 1, -1.0), (4L, "EGYPT", 4, 0.0)))

    // overwrite semantics (to_sql if_exists="replace"): second save
    // replaces, never appends
    Tables.saveJdbc(df.filter($"n_region" === 1), url, "nation_rt")
    assert(Tables.loadJdbc(spark, url, "nation_rt").count() == 2)
  }

  test("loadJdbc: filter and projection push down to the database") {
    val df = (1 to 100).map(i => (i.toLong, i % 7, i * 1.5))
      .toDF("id", "bucket", "v")
    Tables.saveJdbc(df, url, "push_rt")
    val q = Tables.loadJdbc(spark, url, "push_rt")
      .filter($"bucket" === 3).select("id", "v")
    // the JDBC relation must carry the predicate (PushedFilters) and
    // prune to the two requested columns — visible in the scan metadata
    val scan = q.queryExecution.executedPlan.collectLeaves().head
    val meta = scan.toString
    assert(meta.contains("PushedFilters") && meta.contains("bucket"),
      s"filter not pushed: $meta")
    val got = q.collect().map(_.getLong(0)).sorted
    assert(got.sameElements((1 to 100).filter(_ % 7 == 3).map(_.toLong)))
    // column pruning: the relation's output is exactly the projection
    assert(q.schema.fieldNames.toSeq == Seq("id", "v"))
  }

  test("saveJdbc: numPartitions bounds write concurrency without changing data") {
    val df = (1 to 50).map(i => (i.toLong, s"row_$i")).toDF("id", "tag")
      .repartition(8)
    Tables.saveJdbc(df, url, "conc_rt", Map("numPartitions" -> "2"))
    assert(Tables.loadJdbc(spark, url, "conc_rt").count() == 50)
  }
}
