package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-stage profiler for the optimization loop (guide §1: measure
  * first, empirically, at stage granularity). For each named query:
  * build, warm twice (so internal lazy checkpoints materialize and
  * codegen compiles — the same steady state Bench's timed medians see),
  * then run ONE timed count with a stage listener attached and print
  * every stage of that run: wall duration, task count, executor CPU
  * sum, input/shuffle bytes. The slowest stage is the optimization
  * target; a 1-task stage with high wall time is the
  * single-file-scan-parallelism signature.
  *
  * Usage: tools/run_main.sh graft.Probe <sfDir> <query>...
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.tail.toSeq
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/nation.parquet").count()
    for (n <- names) {
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.count(); df.count()
      case class Row(id: Int, name: String, tasks: Int, wallMs: Long,
                     runMs: Long, cpuMs: Long, gcMs: Long, spillB: Long,
                     fetchMs: Long, swMs: Long,
                     inB: Long, srB: Long, swB: Long, rows: Long)
      val done = mutable.ArrayBuffer[Row]()
      val listener = new SparkListener {
        override def onStageCompleted(
            sc: SparkListenerStageCompleted): Unit = done.synchronized {
          val si = sc.stageInfo
          val m = si.taskMetrics
          done += Row(si.stageId, si.name.takeWhile(_ != '\n'), si.numTasks,
            (for {a <- si.completionTime; b <- si.submissionTime}
              yield a - b).getOrElse(-1L),
            m.executorRunTime, m.executorCpuTime / 1000000L,
            m.jvmGCTime, m.memoryBytesSpilled + m.diskBytesSpilled,
            m.shuffleReadMetrics.fetchWaitTime,
            m.shuffleWriteMetrics.writeTime / 1000000L,
            m.inputMetrics.bytesRead, m.shuffleReadMetrics.totalBytesRead,
            m.shuffleWriteMetrics.bytesWritten,
            m.outputMetrics.recordsWritten)
        }
      }
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime(); df.count()
      val el = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"\nPROBE $n timed=$el%.3f s  (${done.size} stages)")
      println(f"${"stage"}%5s ${"tasks"}%5s ${"wall_ms"}%8s " +
        f"${"run_ms"}%8s ${"cpu_ms"}%8s ${"gc_ms"}%6s ${"spill"}%8s " +
        f"${"fetch"}%6s ${"swMs"}%5s ${"input"}%10s ${"shRead"}%10s " +
        f"${"shWrite"}%10s")
      done.sortBy(-_.wallMs).foreach { r =>
        println(f"${r.id}%5d ${r.tasks}%5d ${r.wallMs}%8d ${r.runMs}%8d " +
          f"${r.cpuMs}%8d ${r.gcMs}%6d ${r.spillB}%8d ${r.fetchMs}%6d " +
          f"${r.swMs}%5d ${r.inB}%10d ${r.srB}%10d ${r.swB}%10d")
      }
    }
    spark.stop()
  }
}
