package graft.examples

import graft.{Sessions, SparkEntry}

/** Time one registered query by name (bench methodology: warm once at
  * sf0.001, then min of N interleavable timed runs to a noop sink) —
  * the single-query iteration loop `Bench` is too coarse for.
  *
  * Usage: TimeQuery <query_name> [sfDir] [reps]
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    val spark = Sessions.local()
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(f"TIME $name min=${times.min}%.3f s all=${times.map(t => f"$t%.3f").mkString(",")}")
    spark.stop()
  }
}
