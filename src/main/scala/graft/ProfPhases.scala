package graft

import org.apache.spark.sql.SparkSession

/** Phase-profiling aid (r18; kept as a standing audit tool alongside
  * StageAudit/TimeOne — the r18 advice to de-temporize it): splits a
  * registry query's warm wall time into build / analyze / optimize /
  * physical-plan / execute phases, to separate driver planning cost from
  * executor work, then re-times without AQE and without codegen. The
  * AQE/codegen conf mutations are restored to their defaults after each
  * query; like the other audit mains it is never driver-run.
  * Usage: runMain graft.ProfPhases <query> [query...]
  * (`SPARK_GRAFT_CPUS`, `SPARK_GRAFT_SF_DIR` honored like Bench.)
  */
object ProfPhases {
  def main(args: Array[String]): Unit = {
    val (cpuStr, cpus) = GraftConf.cpuSpec(32)
    val spark = SparkSession.builder()
      .withExtensions(new graft.plans.GraftExtensions)
      .master(s"local[$cpuStr]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def phase(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          jobs.incrementAndGet()
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          stages.incrementAndGet(); tasks.addAndGet(e.stageInfo.numTasks)
        }
      })
    for (q <- args) {
      println(s"===== $q")
      phase("warmup-full") { SparkEntry.queries(q)(spark, sf).count() }
      phase("build") { SparkEntry.queries(q)(spark, sf) }
      val df2 = SparkEntry.queries(q)(spark, sf)
      phase("analyze") { df2.queryExecution.analyzed }
      phase("optimize") { df2.queryExecution.optimizedPlan }
      phase("plan") { df2.queryExecution.executedPlan }
      val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
      phase("execute") { df2.count() }
      Thread.sleep(500)
      println(s"JOBS ${jobs.get - j0} STAGES ${stages.get - s0} TASKS ${tasks.get - t0}")
      val df3 = SparkEntry.queries(q)(spark, sf)
      phase("all-again") { df3.count() }
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df4 = SparkEntry.queries(q)(spark, sf)
      phase("noaqe-build+run") { df4.count() }
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val df5 = SparkEntry.queries(q)(spark, sf)
      phase("nocodegen-build+run") { df5.count() }
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    spark.stop()
  }
}
