package graft

import java.util.concurrent.TimeoutException

import graft.ops.GuardOps

/** O12 monitor/await-with-timeout (reference `MonitorTasks`,
  * `Program.cs:397-425`): a runaway action is terminated at the bound
  * via `cancelJobGroup`, and the session — like the reference's Batch
  * pool — stays fully usable for the next query. */
class GuardOpsSpec extends SparkSpec {

  test("runaway action is cancelled at the bound; session survives") {
    import spark.implicits._
    val t0 = System.nanoTime()
    intercept[TimeoutException] {
      GuardOps.runBounded(spark, "o12-slow", 2000L) {
        // 16 tasks × 120 s of sleep on local[4] — a ~8-minute job if the
        // cancel did NOT propagate; interruptOnCancel unwinds the sleeps
        spark.range(16).repartition(16)
          .mapPartitions { it => Thread.sleep(120000); it }
          .count()
      }
    }
    val elapsedS = (System.nanoTime() - t0) / 1e9
    assert(elapsedS < 60.0,
      s"cancel did not propagate: bounded action took ${elapsedS}s")
    // scoped cancellation: the session immediately runs new work
    assert(spark.range(10).count() === 10L)
  }

  test("an action within its bound returns its value unwrapped") {
    assert(GuardOps.runBounded(spark, "o12-fast", 60000L)(
      spark.range(5).count()) === 5L)
  }

  test("an action's own failure is rethrown unwrapped, not masked as timeout") {
    import spark.implicits._
    val ex = intercept[org.apache.spark.SparkException] {
      GuardOps.runBounded(spark, "o12-fail", 60000L) {
        spark.range(4).map(i => if (i >= 0) sys.error("boom") else i).count()
      }
    }
    assert(ex.getMessage != null)
  }
}
