package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Stage-level profiling aid: runs ONE registry query once (cold) on a
  * given dir under optional conf overrides, and prints per-stage
  * aggregate executor metrics — run/CPU/GC time, shuffle read/write
  * bytes+records, memory/disk spill, task count — sorted by executor
  * run time. This is the drill-down the [[ScaleStress]] exponent audit
  * hands off to: the exponent says WHETHER a query left its cost model;
  * this says WHICH stage did it and whether the time went to CPU, GC,
  * spill, or shuffle I/O (a per-stage breakdown the wall clock can't
  * give). Not driver-run; its output is quoted in NOTES_r09.
  *
  * Usage:
  *   sbt "runMain graft.StageAudit <query> <dir> [k=v,k=v...]"
  * where <dir> is a fixture dir, or `synth:<smallDir>:<factor>` to
  * (re)build the [[ScaleStress.synthesize]] corpus and audit on it.
  */
object StageAudit {

  private case class StageRow(
      id: Int, name: String, tasks: Int,
      runMs: Long, cpuMs: Long, gcMs: Long,
      shufReadMB: Long, shufReadRec: Long,
      shufWriteMB: Long, shufWriteRec: Long,
      spillMemMB: Long, spillDiskMB: Long,
      inputMB: Long, outRec: Long)

  def main(args: Array[String]): Unit = {
    val query = args(0)
    val dirArg = args(1)
    val conf: Map[String, String] = args.lift(2)
      .map(_.split(",").filter(_.contains("=")).map { kv =>
        val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1))
      }.toMap).getOrElse(Map.empty)

    val (cpuStr, cpus) = GraftConf.cpuSpec(32)
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpuStr]")
      .appName("graft-stage-audit")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dir =
      if (dirArg.startsWith("synth:")) {
        val parts = dirArg.split(":")
        ScaleStress.synthesize(spark, parts(1), parts(2).toInt)
      } else dirArg

    val stages = mutable.LinkedHashMap.empty[Int, StageRow]
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val si = e.stageInfo
        val m = si.taskMetrics
        stages.synchronized {
          stages(si.stageId) = StageRow(
            si.stageId, si.name, si.numTasks,
            m.executorRunTime, m.executorCpuTime / 1000000L,
            m.jvmGCTime,
            m.shuffleReadMetrics.totalBytesRead >> 20,
            m.shuffleReadMetrics.recordsRead,
            m.shuffleWriteMetrics.bytesWritten >> 20,
            m.shuffleWriteMetrics.recordsWritten,
            m.memoryBytesSpilled >> 20, m.diskBytesSpilled >> 20,
            m.inputMetrics.bytesRead >> 20,
            m.outputMetrics.recordsWritten)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    conf.foreach { case (k, v) => spark.conf.set(k, v) }
    val t0 = System.nanoTime()
    val n = SparkEntry.queries(query)(spark, dir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    // drain queued listener events before reading the map (the listener
    // bus is async and its waitUntilEmpty is private[spark])
    Thread.sleep(3000)

    println(f"%n== $query on $dir: $n rows, wall=$wall%.1fs, conf=$conf")
    println(f"${"stage"}%6s ${"tasks"}%6s ${"run_s"}%8s ${"cpu_s"}%8s " +
      f"${"gc_s"}%6s ${"sRdMB"}%8s ${"sRdRec"}%12s ${"sWrMB"}%8s " +
      f"${"sWrRec"}%12s ${"spillM"}%7s ${"spillD"}%7s ${"inMB"}%7s  name")
    stages.values.toSeq.sortBy(-_.runMs).foreach { s =>
      println(f"${s.id}%6d ${s.tasks}%6d ${s.runMs / 1e3}%8.1f " +
        f"${s.cpuMs / 1e3}%8.1f ${s.gcMs / 1e3}%6.1f ${s.shufReadMB}%8d " +
        f"${s.shufReadRec}%12d ${s.shufWriteMB}%8d ${s.shufWriteRec}%12d " +
        f"${s.spillMemMB}%7d ${s.spillDiskMB}%7d ${s.inputMB}%7d  " +
        s.name.take(110))
    }
    val totRun = stages.values.map(_.runMs).sum / 1e3
    val totCpu = stages.values.map(_.cpuMs).sum / 1e3
    val totGc = stages.values.map(_.gcMs).sum / 1e3
    val totSpill = stages.values.map(_.spillDiskMB).sum
    println(f"== totals: run=$totRun%.1fs cpu=$totCpu%.1fs gc=$totGc%.1fs " +
      f"diskSpillMB=$totSpill ($cpus threads => wall floor ${totRun / cpus}%.1fs)")
    spark.stop()
  }
}
