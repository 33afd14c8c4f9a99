package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Scratch profiler (round 17): per-stage executorRunTime breakdown of the
  * metered streaming queries, to localize the r14→ task-time regression
  * the judge flagged (l23 task_ms 13.6s→46.3s at identical bytes). */
object ProfileStreams {
  private final class StageMeter extends SparkListener {
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Int)]()
    val times = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val counts = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit =
      stages.put(s.stageInfo.stageId, (s.stageInfo.name.take(120), s.stageInfo.numTasks))
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) {
        times.computeIfAbsent(te.stageId, _ => new java.util.concurrent.atomic.AtomicLong(0L))
          .addAndGet(m.executorRunTime)
        counts.computeIfAbsent(te.stageId, _ => new java.util.concurrent.atomic.AtomicLong(0L))
          .addAndGet(1L)
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.local()
    val which = args.headOption.getOrElse("l23_lake_stream_read")
    val fn = SparkEntry.queries(which)
    // warm
    try fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    catch { case e: Throwable => println(s"warm: $e") }
    val meter = new StageMeter
    spark.sparkContext.addSparkListener(meter)
    val ops0 = graft.lake.StoreOps.total
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    val wall = (System.nanoTime() - t0) / 1e9
    val ops = graft.lake.StoreOps.total - ops0
    Thread.sleep(2000)
    spark.sparkContext.removeSparkListener(meter)
    import scala.jdk.CollectionConverters._
    val rows = meter.times.asScala.toSeq.map { case (sid, t) =>
      val (name, ntasks) = Option(meter.stages.get(sid)).getOrElse(("?", -1))
      (sid, name, ntasks, Option(meter.counts.get(sid)).map(_.get).getOrElse(0L), t.get)
    }.sortBy(-_._5)
    val total = rows.map(_._5).sum
    println(f"== $which wall=$wall%.2fs total_task_ms=$total store_ops=$ops")
    rows.take(40).foreach { case (sid, name, ntasks, done, t) =>
      println(f"  stage=$sid%4d task_ms=$t%7d tasks=$done%4d/$ntasks%-4d $name")
    }
    spark.stop()
  }
}
