package graft.examples

import graft.collector.{Collector, CollectorConfig}
import graft.lake.HadoopStore

import java.nio.file.Files

/** Single-node ingest throughput of the Collector edge — the comparable
  * number to the reference's demonstrated load (30k records at ~1ms
  * cadence ≈ 1,000 rec/s offered, `tests/Collector-test.ts:81,95-113`).
  * The scale path (LakeSink) is benchmarked separately by its volume
  * spec; this measures the synchronous track() facade itself. */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val dir = Files.createTempDirectory("graft-ingest-bench").toFile
    val store = new HadoopStore(s"file://${dir.getAbsolutePath}")
    val c = new Collector(store, CollectorConfig(batchRecordLimit = 200000))
    var flushed = 0L
    c.onFlush(f => flushed += f.records)
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) {
      c.track("bench_event", Collector.rec(
        "user_id" -> (i % 9973).toLong, "score" -> i.toLong,
        "at" -> new java.sql.Timestamp(1700000000000L + i),
        "tag" -> s"payload-$i"))
      i += 1
    }
    val trackSecs = (System.nanoTime() - t0) / 1e9
    c.stop() // awaits async uploads
    val totalSecs = (System.nanoTime() - t0) / 1e9
    println(f"INGEST records=$n track_secs=$trackSecs%.2f track_rec_per_sec=${n / trackSecs}%.0f " +
      f"total_secs=$totalSecs%.2f flushed=$flushed")
    // clean the temp lake (gzipped output would otherwise accumulate in /tmp)
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(dir)
  }
}
