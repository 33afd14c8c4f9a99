package graft.examples
import graft.{Meter, Sessions, SparkEntry}

/** Developer probe: meter named queries exactly like [[graft.Bench]]'s
  * metered pass (input/shuffle bytes, task ms, store RPCs) without
  * running the whole bench — the loop for sizing a new
  * [[graft.BenchGates]] ceiling before the driver's contract run.
  *
  * Usage: scripts/run.sh graft.examples.MeterProbe <sfDir> <q1,q2,...>
  */
object MeterProbe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    names.split(',').map(_.trim).filter(_.nonEmpty).foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query '$n'"))
      val t0 = System.nanoTime()
      val (_, m) = Meter.measure(spark) {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      val wallMs = (System.nanoTime() - t0) / 1000000L
      println(f"PROBE $n%-28s input=${m.inputBytes / 1048576.0}%.2fMB " +
        f"shuffle=${m.shuffleBytes / 1048576.0}%.2fMB task_ms=${m.taskMs} " +
        f"store_ops=${m.storeOps} wall_ms=$wallMs")
    }
    spark.stop()
  }
}
