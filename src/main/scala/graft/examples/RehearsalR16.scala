package graft.examples

import graft.Meter
import graft.lake._
import graft.types.{ColType, TableSchema}

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._

/** Round-16 metered evidence: MERGE-ON-READ position deletes vs the
  * copy-on-write twin, isolated on prebuilt 2M-row lakes (fixture cost
  * excluded — the per-query bench meters can't give this split):
  *
  *  1. WRITE AMPLIFICATION: a sparse DELETE (0.1% of rows, spread over
  *     every object) lands KILOBYTES of delete vectors under MOR where
  *     the COW twin republishes every touched object wholesale —
  *     landed-bytes ratio is the headline number.
  *  2. READ TAX: the vectored table's full scan answers exactly and
  *     pays only the vectors' own small reads on top; COUNT(*) stays
  *     metadata-only (sidecar records − vector counts).
  *  3. FOLD: `CALL compact` returns the table to clean objects and
  *     reclaims every vector file.
  */
object RehearsalR16 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()

    val schema = TableSchema("ev", Seq(
      "id" -> ColType.CInteger, "tag" -> ColType.CString,
      "v" -> ColType.CFloat))
    val N = 2000000

    def buildLake(): (String, HadoopStore, String) = {
      val root =
        s"file://${Files.createTempDirectory("graft-r16").toFile.getAbsolutePath}"
      val store = new HadoopStore(root)
      for (h <- 0 until 8)
        LakeWriter.write(
          spark.range(h * N / 8, (h + 1) * N / 8)
            .select(col("id"), concat(lit("t"), pmod(col("id"), lit(97))).as("tag"),
              (col("id") * 1.0).as("v"))
            .repartitionByRange(6, col("id")),
          schema, root, Instant.parse(f"2024-06-01T0$h%d:00:00Z"),
          maxRecordsPerObject = 50000L, zoneMaps = true)
      val cat = s"r16${math.abs(root.hashCode)}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      (root, store, cat)
    }

    /** Total bytes of every key under the lake root (data + sidecars +
      * vectors + version records) — the landed-state inventory whose
      * before/after DIFF is a statement's true write amplification. */
    def inventory(store: HadoopStore): Map[String, Long] =
      store.list("").map { k =>
        val in = store.open(k)
        try {
          var n = 0L
          val buf = new Array[Byte](65536)
          var r = in.read(buf)
          while (r >= 0) { n += r; r = in.read(buf) }
          k -> n
        } finally in.close()
      }.toMap

    def landedAfter(before: Map[String, Long], after: Map[String, Long]): Long =
      after.collect { case (k, sz) if !before.contains(k) => sz }.sum

    // every 1000th id dies: 2000 rows, present in EVERY 50k-row object
    val deletePred = "id % 1000 = 333"

    // ---- copy-on-write twin first (the baseline)
    val (_, cowStore, cowCat) = buildLake()
    val cowBefore = inventory(cowStore)
    val (_, mCow) = Meter.measure(spark) {
      spark.sql(s"DELETE FROM $cowCat.ev WHERE $deletePred")
    }
    val cowLanded = landedAfter(cowBefore, inventory(cowStore))

    // ---- merge-on-read
    val (morRoot, morStore, morCat) = buildLake()
    spark.sql(s"CALL $morCat.system.set_dml_mode(table => 'ev', " +
      "mode => 'merge-on-read')").collect()
    val morBefore = inventory(morStore)
    val (_, mMor) = Meter.measure(spark) {
      spark.sql(s"DELETE FROM $morCat.ev WHERE $deletePred")
    }
    val morLanded = landedAfter(morBefore, inventory(morStore))

    println(f"MOR_VS_COW_DELETE rows=$N%d deleted=${N / 1000}%d " +
      f"cowLandedMB=${cowLanded / 1e6}%.2f morLandedMB=${morLanded / 1e6}%.4f " +
      f"ratio=${cowLanded.toDouble / math.max(1L, morLanded)}%.0fx " +
      f"cowInputMB=${mCow.inputBytes / 1e6}%.2f morInputMB=${mMor.inputBytes / 1e6}%.2f")
    require(morLanded * 20 < cowLanded,
      s"merge-on-read must land a small fraction of the COW rewrite: " +
        s"$morLanded vs $cowLanded")
    val dvs = LakeVersions.currentDvs(morStore, "ev")
    require(dvs.values.map(_.count).sum == (N / 1000).toLong,
      s"vector counts must equal deleted rows, got $dvs")

    // ---- read tax: exact answers on the vectored table; COUNT(*) is
    // metadata-only (no data object opened by the agg pushdown)
    val expectSum = spark.range(N.toLong).where(s"NOT (id % 1000 = 333)")
      .agg(sum(col("id") * 1.0)).head.getDouble(0)
    val (gotSum, mScan) = Meter.measure(spark) {
      spark.sql(s"SELECT sum(v) FROM $morCat.ev").head.getDouble(0)
    }
    require(math.abs(gotSum - expectSum) < 1e-3,
      s"vectored scan must answer exactly: $gotSum vs $expectSum")
    val (nLive, mCount) = Meter.measure(spark) {
      spark.sql(s"SELECT count(*) FROM $morCat.ev").head.getLong(0)
    }
    require(nLive == (N - N / 1000).toLong, s"live count wrong: $nLive")
    println(f"MOR_READ_TAX scanMB=${mScan.inputBytes / 1e6}%.2f " +
      f"countMB=${mCount.inputBytes / 1e6}%.4f liveRows=$nLive%d")
    require(mCount.inputBytes * 100 < mScan.inputBytes,
      s"COUNT(*) must stay metadata-only on a vectored table: " +
        s"${mCount.inputBytes} vs scan ${mScan.inputBytes}")

    // ---- fold: compact returns clean objects and reclaims vectors
    spark.sql(s"CALL $morCat.system.compact(table => 'ev')").collect()
    require(LakeVersions.currentDvs(morStore, "ev").isEmpty &&
      morStore.list(LakeDvs.dir("ev")).isEmpty,
      "compact must fold and reclaim every vector")
    val folded = spark.sql(s"SELECT sum(v), count(*) FROM $morCat.ev").head
    require(math.abs(folded.getDouble(0) - expectSum) < 1e-3 &&
      folded.getLong(1) == nLive, "fold must preserve rows exactly")
    println(s"MOR_FOLD ok rows=$nLive root=$morRoot")

    spark.stop()
  }
}
