package graft.examples

import graft.Sessions
import graft.lake.{HadoopStore, LakeReader, LakeWriter}
import graft.types.{ColType, TableSchema}

import java.time.Instant
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-12 measured evidence, part b: STORAGE-PARTITIONED execution
  * (`clusterByHour`) and the DSv2 MICRO-BATCH source at rehearsal scale
  * (10M rows across 48 hours, ~150 objects).
  *
  * The claim worth metering for hour clustering is `count(DISTINCT …)
  * GROUP BY _event_hour`: without the clustering proof Spark must
  * shuffle every distinct (hour, user) PAIR — data-sized; with it the
  * whole rollup runs in place, zero exchanges. (Plain count/sum rollups
  * shuffle only algebraic partials either way — small at any scale —
  * so they are not the claim.) The one-side-shuffle join is metered the
  * same way: the lake side ships nothing.
  *
  * The stream section prints drain throughput of
  * `readStream.format("graft-lake")` against the batch scan of the
  * same lake — the micro-batch source pays offsets + per-batch
  * planning, and the number says what that overhead costs. */
object RehearsalR12b {

  private def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"REHEARSE $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  private def metered[A](spark: org.apache.spark.sql.SparkSession, label: String)
                        (f: => A): A = {
    val (r, m) = graft.Meter.measure(spark)(f)
    println(f"REHEARSE $label%-52s ${m.inputBytes / 1e6}%8.2f MB input, " +
      f"${m.shuffleBytes / 1e6}%8.2f MB shuffled, " +
      f"${m.taskMs / 1e3}%7.2f task-s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfBig = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()

    val root = "file:///tmp/graft-rehearse-r12b-lake"
    val store = new HadoopStore(root)
    store.deletePrefix("")
    val schema = TableSchema("hours_r12", Seq(
      "event_id" -> ColType.CInteger, "user_id" -> ColType.CInteger))
    val Hours = 48
    val base = Instant.parse("2024-06-01T00:00:00Z")
    // 10M rows spread over 48 hours: one write per hour (a day's worth of
    // hourly flushes, each rolled into ~3 objects)
    val ev = spark.read.parquet(s"$sfBig/events.parquet")
      .select(col("event_id"), col("user_id"))
      .crossJoin(spark.range(100).select(col("id").as("rep")))
      .select((col("event_id") * 100 + col("rep")).as("event_id"),
        col("user_id"), pmod(col("event_id") * 100 + col("rep"), lit(Hours))
          .cast("int").as("h"))
      .cache()
    val n = ev.count()
    time(s"land $n rows as $Hours hourly flushes") {
      (0 until Hours).foreach { h =>
        LakeWriter.write(ev.filter(col("h") === h).drop("h").repartition(3),
          schema, root, base.plus(h.toLong, ChronoUnit.HOURS))
      }
    }
    ev.unpersist()
    val total = LakeReader.listTableKeys(store, "hours_r12", None).size
    println(s"lake: $n rows in $total objects across $Hours hours")

    def fact(clustered: Boolean): DataFrame = {
      val rd = spark.read.format("graft-lake").option("table", "hours_r12")
      (if (clustered) rd.option("clusterByHour", "true") else rd).load(root)
    }

    // ---- 1. hour-grouped count(DISTINCT): the data-sized shuffle -------
    def rollup(clustered: Boolean): Long = {
      val q = fact(clustered).groupBy(col("_event_hour"))
        .agg(countDistinct(col("user_id")).as("u"), count(lit(1)).as("c"))
      if (clustered)
        require(!q.queryExecution.executedPlan.toString
            .split("== Initial Plan ==").head.contains("Exchange"),
          "the clustered rollup must plan no exchange")
      q.queryExecution.executedPlan.executeCollect().length.toLong
    }
    require(rollup(true) == Hours.toLong && rollup(false) == Hours.toLong)
    for (i <- 1 to 3) {
      time(s"count(DISTINCT) by hour, CLUSTERED   #$i")(rollup(true))
      time(s"count(DISTINCT) by hour, unclustered #$i")(rollup(false))
    }
    metered(spark, "count(DISTINCT) by hour, CLUSTERED")(rollup(true))
    metered(spark, "count(DISTINCT) by hour, unclustered")(rollup(false))

    // ---- 2. one-side-shuffle join: the lake never moves ----------------
    spark.conf.set("spark.sql.sources.v2.bucketing.shuffle.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val dimRows = (0 until Hours).map(h =>
      (java.sql.Timestamp.from(base.plus(h.toLong, ChronoUnit.HOURS)), s"h$h"))
    import spark.implicits._
    val dim = dimRows.toDF("_event_hour", "label")
    def spjJoin(clustered: Boolean): Long = {
      val q = fact(clustered).join(dim, Seq("_event_hour"))
        .groupBy(col("label")).agg(count(lit(1)).as("c"))
      q.queryExecution.executedPlan.executeCollect().length.toLong
    }
    require(spjJoin(true) == Hours.toLong && spjJoin(false) == Hours.toLong)
    for (i <- 1 to 3) {
      time(s"join dim ON hour, CLUSTERED (SPJ)     #$i")(spjJoin(true))
      time(s"join dim ON hour, unclustered         #$i")(spjJoin(false))
    }
    metered(spark, "join dim ON hour, CLUSTERED (SPJ)")(spjJoin(true))
    metered(spark, "join dim ON hour, unclustered")(spjJoin(false))
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.unset("spark.sql.sources.v2.bucketing.shuffle.enabled")

    // ---- 3. micro-batch drain vs batch scan ----------------------------
    val ckpt = java.nio.file.Files.createTempDirectory("r12b-ckpt")
      .toFile.getAbsolutePath
    def drainStream(): Long = {
      spark.catalog.dropTempView("r12b_drain")
      val q = spark.readStream.format("graft-lake")
        .option("table", "hours_r12").option("maxObjectsPerTrigger", "64")
        .load(root)
        .groupBy().count()
        .writeStream.format("memory").queryName("r12b_drain")
        .outputMode("complete")
        .option("checkpointLocation",
          s"$ckpt/${java.util.UUID.randomUUID()}")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(300000)
      spark.table("r12b_drain").collect().head.getLong(0)
    }
    def batchScan(): Long = fact(clustered = false).count()
    require(batchScan() == n)
    val t0 = System.nanoTime()
    val drained = drainStream()
    val streamSec = (System.nanoTime() - t0) / 1e9
    require(drained == n, s"stream must drain every row: $drained vs $n")
    println(f"REHEARSE stream drain ($total objects, 64/trigger)      " +
      f"$streamSec%8.2f s  ${n / streamSec / 1e6}%6.2f M rows/s")
    for (i <- 1 to 3) time(s"batch scan of the same lake #$i")(batchScan())
  }
}
