package graft.examples

import graft.Meter
import graft.lake.{HadoopStore, LakeCatalog, LakeReader}
import graft.types.{ColType, TableSchema}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 measured evidence, part d: the SQL DML surface at a size
  * where the byte claims are visible — a 48-object / 1.92M-row lake,
  * two tenants per object so rewrites are the GDPR shape (surviving
  * co-tenant rows republished, never dropped).
  *
  *  1. `DELETE FROM ... WHERE tenant = X` (METADATA path): the bloom
  *     probe bounds input bytes to the victim's 2 objects + sidecars —
  *     not the lake — with 46 objects never opened.
  *  2. `UPDATE ... WHERE tenant = Y` (COPY-ON-WRITE): static bloom
  *     pushdown + the `_object_key` runtime group filter bound the
  *     ReplaceData read/rewrite to the 2 containing objects; input
  *     stays a small multiple of the touched objects vs the full-scan
  *     constant.
  *  3. `MERGE INTO` upsert throughput over the whole lake (every
  *     object matched — the worst-case full rewrite), rows/s.
  */
object RehearsalR13d {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("rehearse-r13d").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val schema = TableSchema("evd", Seq(
      "event_id" -> ColType.CInteger, "tenant" -> ColType.CString,
      "score" -> ColType.CInteger))
    val root = "file:///tmp/graft-rehearse-r13d"
    val store = new HadoopStore(root)
    store.deletePrefix("")
    val TenantPairs = 24
    def buildTable(name: String, blooms: Seq[String]): Unit =
      for (h <- 0 until 2; p <- 0 until TenantPairs) {
        graft.lake.LakeWriter.write(
          spark.range(40000L).select(
            (col("id") + h * 1000000L).as("event_id"),
            concat(lit("tenant-"),
              (lit(2 * p) + col("id") % 2).cast("string")).as("tenant"),
            (col("id") % 1000L).as("score"))
            .coalesce(1),
          schema.copy(name = name), root,
          java.time.Instant.parse(f"2024-03-01T0$h%d:00:00Z"),
          zoneMaps = true, bloomColumns = blooms)
      }
    buildTable("evd", Seq("tenant"))
    // the CONTRAST table: identical rows, NO bloom sidecars — the same
    // DELETE cannot bound its candidates and must visit every object
    buildTable("evn", Nil)
    val cat = "r13d"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    def keys() = LakeReader.listTableKeys(store, "evd", None)
    val total = keys().size
    require(total == 48, s"fixture: $total")

    // full-scan constant for contrast
    val (_, full) = Meter.measure(spark) {
      // sum() does NOT push to the sidecar aggregate — a real full scan
      spark.table(s"$cat.evd").agg(sum("score")).collect()
    }

    // ---- 1. SQL DELETE, metadata path: bloomed vs bloomless contrast.
    // (The meter counts CACHED-block re-reads too — deleteWhere
    // snapshots each candidate via localCheckpoint and folds over it
    // three times — so the honest claim is input ∝ CANDIDATES, shown by
    // the same statement against the sidecar-less twin visiting all 48.)
    val before1 = keys().toSet
    val t0 = System.nanoTime()
    val (_, mDel) = Meter.measure(spark) {
      val d = spark.sql(s"DELETE FROM $cat.evd WHERE tenant = 'tenant-7'")
      require(d.queryExecution.executedPlan.toString.contains("DeleteFromTable"),
        "probe DELETE must take the metadata path")
    }
    val sDel = (System.nanoTime() - t0) / 1e9
    val after1 = keys().toSet
    val survived1 = before1.intersect(after1).size
    val t0n = System.nanoTime()
    val (_, mDelN) = Meter.measure(spark) {
      spark.sql(s"DELETE FROM $cat.evn WHERE tenant = 'tenant-7'")
    }
    val sDelN = (System.nanoTime() - t0n) / 1e9
    println(f"REHEARSE sql-delete: bloomed input ${mDel.inputBytes / 1e6}%.2f MB" +
      f" / $sDel%.2f s vs bloomless ${mDelN.inputBytes / 1e6}%.2f MB" +
      f" / $sDelN%.2f s; $survived1/$total originals untouched")
    require(survived1 == total - 2,
      s"the probe must bound the rewrite to tenant-7's 2 objects: $survived1")
    require(mDel.inputBytes < mDelN.inputBytes / 8,
      s"the bloom probe must bound the delete's input to its candidates: " +
        s"${mDel.inputBytes} vs unindexed ${mDelN.inputBytes}")

    // ---- 2. SQL UPDATE, copy-on-write under the group filter
    val before2 = keys().toSet
    val t1 = System.nanoTime()
    val (_, mUpd) = Meter.measure(spark) {
      spark.sql(s"UPDATE $cat.evd SET score = score + 100000 " +
        "WHERE tenant = 'tenant-13'")
    }
    val sUpd = (System.nanoTime() - t1) / 1e9
    val after2 = keys().toSet
    val survived2 = before2.intersect(after2).size
    println(f"REHEARSE sql-update: input ${mUpd.inputBytes / 1e6}%.2f MB " +
      f"vs full-scan ${full.inputBytes / 1e6}%.2f MB, " +
      f"$survived2/${before2.size} originals untouched, $sUpd%.2f s")
    require(survived2 == before2.size - 2,
      s"bloom pushdown + group filter must bound the rewrite to " +
        s"tenant-13's 2 objects: $survived2 of ${before2.size}")
    require(mUpd.inputBytes < full.inputBytes / 4,
      s"COW update must read the touched objects, not the lake: " +
        s"${mUpd.inputBytes} vs ${full.inputBytes}")
    val updated = spark.table(s"$cat.evd")
      .filter(col("tenant") === "tenant-13" && col("score") >= 100000).count()
    require(updated == 40000L, s"all tenant-13 rows updated: $updated")

    // ---- 3. MERGE upsert over every object (worst-case full rewrite)
    val rows = spark.table(s"$cat.evd").count()
    spark.range(0L, 40000L, 4L).select(col("id").as("event_id"),
        lit(5L).as("score"),
        lit(java.sql.Timestamp.from(
          java.time.Instant.parse("2024-03-01T03:00:00Z"))).as("_event_hour"))
      .unionByName(spark.range(10000L).select(
        (col("id") + 5000000L).as("event_id"), lit(1L).as("score"),
        lit(java.sql.Timestamp.from(
          java.time.Instant.parse("2024-03-01T03:00:00Z"))).as("_event_hour")))
      .createOrReplaceTempView("r13d_src")
    val t2 = System.nanoTime()
    spark.sql(
      s"""MERGE INTO $cat.evd t USING r13d_src s ON t.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET score = s.score
         |WHEN NOT MATCHED THEN INSERT (event_id, tenant, score, _event_hour)
         |  VALUES (s.event_id, 'merged', s.score, s._event_hour)""".stripMargin)
    val sMrg = (System.nanoTime() - t2) / 1e9
    val rowsAfter = spark.table(s"$cat.evd").count()
    println(f"REHEARSE sql-merge: $rows rows upserted+10k inserts in " +
      f"$sMrg%.2f s (${rows / sMrg / 1e6}%.2f M rows/s), " +
      f"rows $rows -> $rowsAfter")
    require(rowsAfter == rows + 10000L, s"inserts must land: $rowsAfter")
    require(keys().exists(_.startsWith("2024/03/01/03/")),
      "inserted rows land under their stated hour")

    // ---- 4. hour REPAIR via replaceWhere: input is the SOURCE only —
    // the overwrite never reads the table (contrast: the COW UPDATE
    // above must read its groups), and every other hour is untouched
    val repairHour = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-03-01T03:00:00Z"))
    val beforeRepair = keys().toSet
    val others = beforeRepair.filterNot(_.startsWith("2024/03/01/03/"))
    val t3 = System.nanoTime()
    val (_, mOvw) = Meter.measure(spark) {
      spark.range(25000L).select(col("id").as("event_id"),
          lit("repaired").as("tenant"), lit(0L).as("score"))
        .withColumn("_event_hour", lit(repairHour))
        .writeTo(s"$cat.evd")
        .overwrite(col("_event_hour") === lit(repairHour))
    }
    val sOvw = (System.nanoTime() - t3) / 1e9
    println(f"REHEARSE sql-overwrite: hour repair input " +
      f"${mOvw.inputBytes / 1e6}%.2f MB (source only, table never read) " +
      f"vs full-scan ${full.inputBytes / 1e6}%.2f MB, $sOvw%.2f s")
    require(keys().toSet.intersect(others) == others,
      "out-of-scope hours keep every object")
    require(spark.table(s"$cat.evd")
      .where(col("_event_hour") === lit(repairHour)).count() == 25000L)
    require(mOvw.inputBytes < full.inputBytes / 4,
      s"hour repair must not read the table: ${mOvw.inputBytes}")
    spark.stop()
  }
}
