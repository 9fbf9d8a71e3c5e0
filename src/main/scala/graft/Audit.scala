package graft

import org.apache.spark.sql.SparkSession

import graft.plans.PlanAudit

/** Plan-audit tool: runs [[graft.plans.PlanAudit]] over every query (or
  * a named subset) and prints one `AUDIT` line per hit that is NOT the
  * universally-benign global-agg final pass — the same classification
  * PlanAuditSpec gates on, available ad hoc for iterating on one
  * operator. Usage:
  *   runMain graft.Audit <sfDir> [queryName ...]
  */
object Audit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var hits = 0
    names.foreach { n =>
      try {
        val report = PlanAudit.audit(SparkEntry.queries(n)(spark, sfDir))
        // scan census: a high parquet-scan count with zero reuse is the
        // signature of a multi-referenced subtree Catalyst re-inlines
        // per reference (the x_pagerank/bm25/quality_gate class —
        // measured 2-5x wins from barriering those). Not gated (multi
        // scans are often by-design: different projections, one-row
        // aggregates); printed so rounds can DIFF the census.
        // parquet scans only: checkpointed frames re-read as cheap
        // "Scan ExistingRDD" and do not indicate recompute
        val scans = report.nodes.values
          .count(_.name.startsWith("Scan parquet"))
        val reused = report.nodes.values.count(_.reuses.nonEmpty)
        if (scans >= 4 && reused == 0)
          println(s"AUDIT $n SCANCENSUS scans=$scans reused=0 " +
            "(multi-referenced subtree? check for a missing barrier)")
        report.singlePartitionExchanges
          .filterNot(PlanAudit.isPartialAggFinalPass(report, _))
          .foreach { ex =>
            hits += 1
            println(s"AUDIT $n SINGLEPARTITION id=${ex.id} " +
              s"child=${report.childOf(ex).map(_.name).getOrElse("?")} " +
              s"args=${ex.arguments.take(60)} input=${ex.input}")
          }
        report.cartesianProducts.foreach { cp =>
          hits += 1
          println(s"AUDIT $n CARTESIAN id=${cp.id}")
        }
        report.globalWindows.foreach { w =>
          hits += 1
          println(s"AUDIT $n GLOBALWINDOW id=${w.id} input=${w.input}")
        }
        report.broadcastNestedLoops
          .filterNot(PlanAudit.isScalarBroadcastBNLJ(report, _))
          .foreach { b =>
            hits += 1
            println(s"AUDIT $n BNLJ id=${b.id} args=" +
              s"${b.arguments.take(80)}")
          }
      } catch {
        case e: Throwable =>
          hits += 1
          println(s"AUDIT $n ERROR ${e.getClass.getSimpleName}: " +
            s"${String.valueOf(e.getMessage).take(120)}")
      }
    }
    println(s"AUDIT TOTAL non-benign hits: $hits over ${names.size} queries")
    spark.stop()
  }
}
