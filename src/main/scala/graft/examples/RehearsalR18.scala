package graft.examples

import graft.Meter
import graft.lake._
import graft.types.{ColType, TableSchema}

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._

/** Round-18 metered evidence: SIZE-TIERED AUTO-COMPACTION vs the full
  * compact, isolated on a prebuilt long-lived table — 48 hours of
  * history where only THREE hours carry small-file debt (16 tiny
  * objects each, the DML/frequent-flush shape) and the other 45 are
  * already consolidated. Both runs leave the same logical table; what
  * differs is what they READ and REWRITE:
  *
  *  - `compact` (the full pass): every object of every hour through
  *    the rewrite — maintenance proportional to the TABLE;
  *  - `auto_compact`: the three debt hours only, clean hours never
  *    opened — maintenance proportional to the DEBT.
  *
  * Metered as input bytes, store write RPCs, and objects rewritten,
  * on two identically-built lakes. The claim that matters at 100 TB:
  * the auto pass's cost tracks the debt hours (3/48 of the data),
  * so scheduled maintenance on a mostly-clean table stays BOUNDED
  * however large the table's history grows.
  */
object RehearsalR18 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()

    val schema = TableSchema("ev", Seq(
      "id" -> ColType.CInteger, "uid" -> ColType.CInteger,
      "v" -> ColType.CFloat))
    val RowsPerHour = 40000
    val DirtyHours = Set(7, 23, 41)

    def buildLake(): (String, HadoopStore) = {
      val root =
        s"file://${Files.createTempDirectory("graft-r18").toFile.getAbsolutePath}"
      val store = new HadoopStore(root)
      for (h <- 0 until 48) {
        val df = spark.range(h.toLong * RowsPerHour, (h + 1L) * RowsPerHour)
          .select(col("id"), pmod(col("id"), lit(5000)).as("uid"),
            (col("id") * 1.0).as("v"))
        val (day, hod) = (1 + h / 24, h % 24)
        LakeWriter.write(
          if (DirtyHours(h)) df.repartition(16) else df.coalesce(1),
          schema, root,
          Instant.parse(f"2024-06-0$day%dT$hod%02d:00:00Z"),
          zoneMaps = true)
      }
      (root, store)
    }

    def fmtMb(b: Long): String = f"${b / 1048576.0}%.2f MB"

    // ---- full compact: the whole table through the rewrite
    val (rootA, storeA) = buildLake()
    val w0 = StoreOps.writes.get
    val (repFull, mFull) = Meter.measure(spark) {
      LakeMaintenance.compact(spark, storeA, "ev",
        targetRecords = RowsPerHour.toLong, zoneMaps = true)
    }
    val fullWrites = StoreOps.writes.get - w0
    println(s"FULL   compact: old=${repFull.oldObjects} " +
      s"new=${repFull.newObjects} input=${fmtMb(mFull.inputBytes)} " +
      s"writeRPCs=$fullWrites")

    // ---- auto_compact: only the three debt hours
    val (rootB, storeB) = buildLake()
    val w1 = StoreOps.writes.get
    val (repAuto, mAuto) = Meter.measure(spark) {
      LakeMaintenance.autoCompact(spark, storeB, "ev",
        targetRecords = RowsPerHour.toLong, minObjects = 4, zoneMaps = true)
    }
    val autoWrites = StoreOps.writes.get - w1
    println(s"AUTO   compact: hours=${repAuto.hoursSelected}/" +
      s"${repAuto.hoursTotal} old=${repAuto.compaction.oldObjects} " +
      s"new=${repAuto.compaction.newObjects} " +
      s"input=${fmtMb(mAuto.inputBytes)} writeRPCs=$autoWrites")
    require(repAuto.hoursSelected == 3 &&
      repAuto.compaction.oldObjects == 48 &&
      repFull.oldObjects == 48 + 45,
      s"selection drifted: $repAuto vs $repFull")

    // both tables answer identically after their passes
    val a = LakeReader.read(spark, rootA, "ev")
      .agg(count(lit(1)), sum("id")).collect().head
    val b = LakeReader.read(spark, rootB, "ev")
      .agg(count(lit(1)), sum("id")).collect().head
    require(a == b, s"the two passes must leave the same table: $a vs $b")

    // debt paid: the NEXT auto run on table B is free (no selection,
    // no generation, constant metadata cost)
    val ops0 = StoreOps.total
    val again = LakeMaintenance.autoCompact(spark, storeB, "ev",
      targetRecords = RowsPerHour.toLong, minObjects = 4)
    val idleOps = StoreOps.total - ops0
    println(s"IDLE   re-run: hours=${again.hoursSelected} storeOps=$idleOps")
    // one listing pass over 48 hour directories (~50 RPCs) is the
    // floor any correct selection pays; the point is no DATA reads
    require(again.hoursSelected == 0 && idleOps < 80,
      s"a debt-free run must cost O(hour listings): $idleOps ops")

    // ---- record-weighted ranking (round 19): equal OBJECT counts,
    // opposite debt. Hour 00 holds 16 tiny objects (debt 15 — one
    // object suffices at the target); hour 01 holds 16 objects ALREADY
    // at the target (debt 0). Object-count tiers rank them equal and
    // would rewrite 640k packed rows for nothing; record-weighted debt
    // selects only the tiny hour and never opens the packed one.
    val rootC =
      s"file://${Files.createTempDirectory("graft-r18c").toFile.getAbsolutePath}"
    val storeC = new HadoopStore(rootC)
    LakeWriter.write(
      spark.range(0L, 40000L).select(col("id"),
        pmod(col("id"), lit(5000)).as("uid"), (col("id") * 1.0).as("v"))
        .repartition(16),
      schema, rootC, Instant.parse("2024-06-01T00:00:00Z"), zoneMaps = true)
    for (b <- 0 until 16)
      LakeWriter.write(
        spark.range(100000L + b * 40000L, 100000L + (b + 1) * 40000L)
          .select(col("id"), pmod(col("id"), lit(5000)).as("uid"),
            (col("id") * 1.0).as("v")).coalesce(1),
        schema, rootC, Instant.parse("2024-06-01T01:00:00Z"), zoneMaps = true)
    val (repRank, mRank) = Meter.measure(spark) {
      LakeMaintenance.autoCompact(spark, storeC, "ev",
        targetRecords = 40000L, minObjects = 4, zoneMaps = true)
    }
    println(s"RANK   tiny-vs-packed: hours=${repRank.hoursSelected}/" +
      s"${repRank.hoursTotal} old=${repRank.compaction.oldObjects} " +
      s"rows=${repRank.compaction.records} input=${fmtMb(mRank.inputBytes)}")
    require(repRank.hoursSelected == 1 &&
      repRank.compaction.oldObjects == 16 &&
      repRank.compaction.records == 40000L,
      s"record-weighted debt must select ONLY the tiny hour: $repRank")

    println(f"CLAIM: auto reads ${mAuto.inputBytes * 100.0 / mFull.inputBytes}%.1f%% " +
      f"of the full pass's bytes and lands ${autoWrites * 100.0 / fullWrites}%.1f%% " +
      "of its write RPCs, on a table where 3 of 48 hours carry debt; " +
      "record-weighted tiers skip a target-packed hour outright")
    spark.stop()
  }
}
