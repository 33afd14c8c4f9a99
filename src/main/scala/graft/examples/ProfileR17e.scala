package graft.examples

import org.apache.spark.sql.functions._

/** r17: fixture-vs-operator split of l35 (changes feed). Builds the l35
  * lake fixture once with timers around each stage, then times the
  * LakeChanges.since read alone (min of 3) — so the optimization targets
  * the piece that actually dominates. */
object ProfileR17e {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.lake.{LakeCatalog, LakeChanges, LakeWriter}
    import graft.types.{ColType, TableSchema}

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val schema = TableSchema("events_cf", Seq(
      "event_id" -> ColType.CInteger, "user_id" -> ColType.CInteger,
      "vc" -> ColType.CInteger))
    val root = "file:///tmp/graft-prof-l35"
    val store = new graft.lake.HadoopStore(root)
    store.deletePrefix("")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("vc"))
    time("l35 fixture: 2 lake writes") {
      for (h <- 0 until 2)
        LakeWriter.write(
          ev.filter(pmod(col("event_id"), lit(2)) === h)
            .repartitionByRange(4, col("event_id")),
          schema, root, java.time.Instant.parse(f"2024-06-01T0$h%d:00:00Z"),
          zoneMaps = true)
    }
    val cat = s"l35cat${math.abs(root.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    time("l35 retention+tag")(spark.sql(
      s"CALL $cat.system.set_retention(table => 'events_cf', retain => true)")
      .collect())
    spark.sql(s"CALL $cat.system.tag(table => 'events_cf', name => 'run-x')")
    val k = ev.count() / 10
    time("l35 DELETE")(
      spark.sql(s"DELETE FROM $cat.events_cf WHERE user_id = 3"))
    time("l35 UPDATE")(
      spark.sql(s"UPDATE $cat.events_cf SET vc = vc + 1000000 " +
        s"WHERE event_id < $k"))
    ev.filter(pmod(col("event_id"), lit(10)) === 7)
      .select(col("event_id").as("sid"), lit("u").as("act"))
      .unionByName(spark.range(1, 101).select(
        (lit(10000000000L) + col("id")).as("sid"), lit("i").as("act")))
      .createOrReplaceTempView("l35_src")
    time("l35 MERGE")(spark.sql(
      s"""MERGE INTO $cat.events_cf t USING l35_src s ON t.event_id = s.sid
         |WHEN MATCHED AND s.act = 'u' THEN UPDATE SET vc = vc * 2 + 1
         |WHEN NOT MATCHED AND s.act = 'i' THEN
         |  INSERT (event_id, user_id, vc, _event_hour)
         |  VALUES (s.sid, -1, 9,
         |    TIMESTAMP '2024-06-01 05:00:00+00:00')""".stripMargin))
    for (i <- 1 to 3)
      time(s"l35 feed read #$i") {
        LakeChanges.since(spark, root, "events_cf", "run-x")
          .agg(
            sum(when(col("_change_type") === "delete", 1L).otherwise(0L)),
            sum(when(col("_change_type") === "insert", 1L).otherwise(0L)))
          .write.format("noop").mode("overwrite").save()
      }
    spark.stop()
  }
}
