package graft

import graft.collector.{Collector, CollectorConfig}
import graft.lake.HadoopStore

import java.nio.file.Files

/** Harness main: single-node ingest throughput of the Collector edge — the
  * comparable number to the reference's demonstrated load (30k records at
  * ~1ms cadence ≈ 1,000 rec/s offered, `tests/Collector-test.ts:81,95-113`)
  * and to BASELINE.md's ≥1,000 rec/s/table target. The scale path
  * (LakeSink) is benchmarked separately by its volume spec; this measures
  * the synchronous track() facade itself.
  *
  * Writes `INGEST_LOCAL.json` the BENCH_LOCAL way (stdout of harness runs
  * is tail-truncated; the file is the durable record), so the throughput
  * claim is reproducible from an artifact at HEAD instead of a round-log
  * quote. */
object IngestBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val dir = Files.createTempDirectory("graft-ingest-bench").toFile
    val store = new HadoopStore(s"file://${dir.getAbsolutePath}")
    val c = new Collector(store, CollectorConfig(batchRecordLimit = 200000))
    var flushed = 0L
    var flushes = 0L
    c.onFlush { f => flushed += f.records; flushes += 1 }
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
    val json =
      f"""{"metric":"ingest_track_rec_per_sec","value":${n / trackSecs}%.0f,"unit":"rec/s","records":$n,"track_secs":$trackSecs%.3f,"total_secs":$totalSecs%.3f,"total_rec_per_sec":${n / totalSecs}%.0f,"flushed":$flushed,"flushes":$flushes}"""
    println(json)
    try {
      val w = new java.io.PrintWriter("INGEST_LOCAL.json", "UTF-8")
      try w.println(json) finally w.close()
    } catch { case e: Throwable => System.err.println(s"[ingest-bench] INGEST_LOCAL.json: $e") }
    // clean the temp lake (gzipped output would otherwise accumulate in /tmp)
    Fs.deleteRecursively(dir)
  }
}
