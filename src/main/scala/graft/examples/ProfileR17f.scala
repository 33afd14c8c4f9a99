package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** r17: how many Spark jobs/stages does ONE lake SQL DML statement run,
  * and what do the store-op counters say it did? Local per-statement
  * wall is job-count x scheduler floor, so the job census IS the
  * cost model. */
object ProfileR17f {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import graft.lake.{LakeCatalog, LakeWriter, StoreOps}
    import graft.types.{ColType, TableSchema}

    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    val stages = new java.util.concurrent.atomic.AtomicLong(0L)
    val tasks = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
      }
    })
    def census[A](label: String)(f: => A): A = {
      Thread.sleep(300)
      val (j0, s0, t0) = (jobs.get, stages.get, tasks.get)
      val (l0, r0, w0, d0) = (StoreOps.lists.get, StoreOps.reads.get,
        StoreOps.writes.get, StoreOps.deletes.get)
      val n0 = System.nanoTime()
      val r = f
      Thread.sleep(300)
      println(f"CENSUS $label%-22s ${(System.nanoTime() - n0) / 1e9}%6.3f s  " +
        f"jobs=${jobs.get - j0}%3d stages=${stages.get - s0}%3d " +
        f"tasks=${tasks.get - t0}%4d  store l/r/w/d=${StoreOps.lists.get - l0}/" +
        f"${StoreOps.reads.get - r0}/${StoreOps.writes.get - w0}/" +
        f"${StoreOps.deletes.get - d0}")
      r
    }

    val schema = TableSchema("events_cf", Seq(
      "event_id" -> ColType.CInteger, "user_id" -> ColType.CInteger,
      "vc" -> ColType.CInteger))
    val root = "file:///tmp/graft-prof-l35f"
    val store = new graft.lake.HadoopStore(root)
    store.deletePrefix("")
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .select(col("event_id"), col("user_id"),
        floor(col("value") * 100 + 0.5).cast("long").as("vc"))
      .localCheckpoint()
    census("lake write hour0")(LakeWriter.write(
      ev.filter(pmod(col("event_id"), lit(2)) === 0)
        .repartitionByRange(4, col("event_id")),
      schema, root, java.time.Instant.parse("2024-06-01T00:00:00Z"),
      zoneMaps = true))
    census("lake write hour1")(LakeWriter.write(
      ev.filter(pmod(col("event_id"), lit(2)) === 1)
        .repartitionByRange(4, col("event_id")),
      schema, root, java.time.Instant.parse("2024-06-01T01:00:00Z"),
      zoneMaps = true))
    val cat = s"profcat${math.abs(root.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    census("DELETE user3")(
      spark.sql(s"DELETE FROM $cat.events_cf WHERE user_id = 3"))
    census("UPDATE below k")(
      spark.sql(s"UPDATE $cat.events_cf SET vc = vc + 1000000 " +
        "WHERE event_id < 10000"))
    spark.range(1, 101).select((lit(10000000000L) + col("id")).as("sid"),
        lit("i").as("act"))
      .createOrReplaceTempView("prof_src")
    census("MERGE 100 ins")(spark.sql(
      s"""MERGE INTO $cat.events_cf t USING prof_src s ON t.event_id = s.sid
         |WHEN NOT MATCHED AND s.act = 'i' THEN
         |  INSERT (event_id, user_id, vc, _event_hour)
         |  VALUES (s.sid, -1, 9,
         |    TIMESTAMP '2024-06-01 05:00:00+00:00')""".stripMargin))
    census("read back agg")(
      spark.sql(s"SELECT sum(vc) FROM $cat.events_cf").collect())
    spark.stop()
  }
}
