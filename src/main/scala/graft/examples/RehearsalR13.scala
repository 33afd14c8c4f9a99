package graft.examples

import graft.lake.{HadoopStore, LakeWriter}
import graft.types.{ColType, TableSchema}

import java.time.Instant
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 measured evidence: OBJECT-LEVEL PRUNING ON THE STREAMING
  * SCAN. The shape under test is the filtered backfill — "reprocess
  * tenant X from T" — which before this round read every object in the
  * window. Now the pushed `_event_hour` range narrows DISCOVERY itself
  * and the bloom probe drops non-matching objects at plan time, so the
  * stream's input-row total is the matching objects', not the window's. */
object RehearsalR13 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("rehearse-r13").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ org.apache.spark.sql.graft.StreamLakePrune
    import spark.implicits._

    val root = "file:///tmp/graft-rehearse-r13-lake"
    new HadoopStore(root).deletePrefix("")
    val ckpt = "file:///tmp/graft-rehearse-r13-ckpt"
    new HadoopStore(ckpt).deletePrefix("")

    val schema = TableSchema("evs", Seq(
      "event_id" -> ColType.CInteger, "tenant" -> ColType.CString,
      "amount" -> ColType.CFloat))
    val base = Instant.parse("2024-03-01T00:00:00Z")
    val Hours = 12
    val RowsPerTenantHour = 2000
    // 4 tenants × 12 hours, one object per (tenant, hour) → 48 objects;
    // the probe tenant owns 12 of them, the hour window covers 6
    for (h <- 0 until Hours; tn <- Seq("acme", "bcorp", "cinc", "dltd")) {
      val df = spark.range(RowsPerTenantHour.toLong)
        .select((col("id") + h * 100000L).as("event_id"),
          lit(tn).as("tenant"), (col("id") % 97 * 1.5).as("amount"))
      LakeWriter.write(df.coalesce(1), schema, root,
        base.plus(h.toLong, ChronoUnit.HOURS),
        zoneMaps = true, bloomColumns = Seq("tenant"))
    }

    val winLo = java.sql.Timestamp.from(base.plus(3, ChronoUnit.HOURS))
    val winHi = java.sql.Timestamp.from(base.plus(8, ChronoUnit.HOURS))

    spark.catalog.dropTempView("r13_drained")
    val t0 = System.nanoTime()
    val q = spark.readStream.format("graft-lake").option("table", "evs")
      .load(root)
      .where(col("tenant") === "acme" &&
        col("_event_hour") >= winLo && col("_event_hour") <= winHi)
      .writeStream.format("memory").queryName("r13_drained")
      .outputMode("append")
      .option("checkpointLocation", s"$ckpt/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    val secs = (System.nanoTime() - t0) / 1e9
    val inputRows = q.asInstanceOf[org.apache.spark.sql.streaming.StreamingQuery]
      .recentProgress.map(_.numInputRows).sum
    val drained = spark.table("r13_drained").count()

    val totalRows = Hours.toLong * 4 * RowsPerTenantHour
    val expectRows = 6L * RowsPerTenantHour // acme × hours 3..8
    println(f"REHEARSE stream prune: drained=$drained expect=$expectRows " +
      f"inputRows=$inputRows totalLakeRows=$totalRows in $secs%.2f s")
    require(drained == expectRows, s"wrong rows: $drained vs $expectRows")
    require(inputRows < totalRows,
      s"stream read the whole lake: $inputRows of $totalRows")
    println(f"REHEARSE input ratio: ${inputRows.toDouble / totalRows}%.4f " +
      "(1.0 = no pruning, 0.125 = perfect hour+bloom prune)")
    spark.stop()
  }
}
