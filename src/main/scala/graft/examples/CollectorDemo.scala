package graft.examples

import graft.collector.{Collector, CollectorConfig, FlushTrigger}
import graft.lake.{HadoopStore, LakeReader}
import graft.types.ColType
import graft.Sessions

/** Library-surface demo: Collector → lake objects → Spark read-back. */
object CollectorDemo {
  def main(args: Array[String]): Unit = {
    val root = "file:///tmp/demo/lake"
    val store = new HadoopStore(root)
    // ratio override: the first record's 0.0 would otherwise infer INTEGER
    // (the reference's JS whole-number hazard, SURVEY.md §7.4)
    val cfg = CollectorConfig(
      columnTypes = Map("game_user_event" -> Map(
        "user_id" -> ColType.CUuid, "ratio" -> ColType.CFloat)),
      batchZip = true, batchRecordLimit = 1000)
    val c = new Collector(store, cfg)
    var flushes = List.empty[String]
    c.onFlush(i => { flushes ::= s"${i.table} trigger=${i.trigger} records=${i.records} key=${i.key}"; () })
    c.onError(e => println(s"ERROR: $e"))

    // volume path: 3000 records → 3 RecordLimit flushes
    val t0 = java.time.Instant.parse("2024-03-01T10:00:00Z")
    for (i <- 0 until 3000)
      c.track("game_user_event", Collector.rec(
        "user_id" -> java.util.UUID.nameUUIDFromBytes(Array(i.toByte)).toString,
        "score" -> i.toLong, "ratio" -> (i / 7.0), "active" -> (i % 2 == 0),
        "at" -> java.sql.Timestamp.from(t0.plusSeconds(i)),
        "note" -> (if (i % 100 == 0) s"has,comma and \"quote\" #$i" else s"plain $i")))
    // wildcard family
    c.track("game_custom_event_$", Collector.rec("kind" -> "spawn", "n" -> 1L), token = Some("pool"))
    c.stop()
    // track after stop → must surface on onError, not throw
    c.track("game_user_event", Collector.rec("score" -> 1L))
    println("FLUSHES:"); flushes.reverse.foreach(f => println("  " + f))

    val spark = Sessions.local("4")
    val back = LakeReader.read(spark, root, "game_user_event")
    back.printSchema()
    println("rows=" + back.count())
    back.orderBy("score").show(3, false)
    val pool = LakeReader.read(spark, root, "game_custom_event_pool")
    println("pool rows=" + pool.count())
    // quoting round-trip check
    val q = back.filter(org.apache.spark.sql.functions.col("score") === 100)
      .select("note").collect()(0).getString(0)
    println("note@100=" + q)
    spark.stop()
  }
}
