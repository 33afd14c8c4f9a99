package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Task-metric meter for SCALE evidence: local[32] shuffles at RAM speed
  * and parses small objects inside job-overhead noise, so wall-seconds
  * systematically hide exactly the wins (skipped bytes, avoided shuffle)
  * that dominate on a real cluster. BYTES read and shuffled are the
  * resources a 1000-executor cluster pays network/disk for — the bench
  * records them alongside seconds for the scale-claim queries so a plan
  * regression shows as a byte delta even when wall time cannot see it. */
object Meter {

  final case class Metrics(inputBytes: Long, shuffleBytes: Long, taskMs: Long,
                           // store round-trips (LIST/GET/PUT/DELETE) the
                           // query issued through graft.lake.StoreOps —
                           // the deterministic metadata meter (task_ms is
                           // hostage to GC/host contention; RPC counts
                           // are a property of the plan)
                           storeOps: Long = 0L)

  private final class TaskMeter extends SparkListener {
    val written = new java.util.concurrent.atomic.AtomicLong(0L)
    val read = new java.util.concurrent.atomic.AtomicLong(0L)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        read.addAndGet(m.inputMetrics.bytesRead)
        taskMs.addAndGet(m.executorRunTime)
      }
    }
    def snapshot: (Long, Long, Long) = (read.get, written.get, taskMs.get)
  }

  /** Run `f` with a fresh task-metrics listener and return its metrics.
    * Listener events drain asynchronously (the bus is private API), so
    * the counters are polled to STABILITY across two reads rather than
    * trusted after a fixed sleep — on a loaded machine events can still
    * be in flight after any fixed delay, silently under-counting. */
  def measure[A](spark: SparkSession)(f: => A): (A, Metrics) = {
    val meter = new TaskMeter
    val ops0 = graft.lake.StoreOps.total
    spark.sparkContext.addSparkListener(meter)
    try {
      val r = f
      var prev = (-1L, -1L, -1L)
      var cur = meter.snapshot
      var waitedMs = 0
      while (cur != prev && waitedMs < 30000) {
        Thread.sleep(100); waitedMs += 100
        prev = cur
        cur = meter.snapshot
      }
      (r, Metrics(cur._1, cur._2, cur._3,
        storeOps = graft.lake.StoreOps.total - ops0))
    } finally spark.sparkContext.removeSparkListener(meter)
  }
}
