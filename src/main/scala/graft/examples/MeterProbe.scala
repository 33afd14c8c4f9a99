package graft.examples

import graft.{Meter, SparkEntry}

/** Ad-hoc byte-meter probe: `MeterProbe <sfDir> <query...>` measures
  * each named QueryDef end-to-end (the bench's meter shape) and prints
  * input/shuffle bytes — how BenchGates ceilings get their recorded
  * values before they are asserted. */
object MeterProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MeterProbe <sfDir> <query...>")
    val spark = graft.Sessions.local()
    args.drop(1).foreach { n =>
      val fn = SparkEntry.queries(n)
      val (_, m) = Meter.measure(spark) {
        fn(spark, args(0)).write.format("noop").mode("overwrite").save()
      }
      println(f"METER $n input=${m.inputBytes}%,d shuffle=${m.shuffleBytes}%,d task_ms=${m.taskMs}%,d store_ops=${m.storeOps}%,d")
    }
    spark.stop()
  }
}
