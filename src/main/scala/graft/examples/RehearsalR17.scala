package graft.examples

import graft.Meter
import graft.lake._
import graft.types.{ColType, TableSchema}

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._

/** Round-17 metered evidence: EQUALITY DELETES vs the two older delete
  * shapes, isolated on prebuilt 2M-row lakes. The GDPR statement —
  * `DELETE WHERE uid = X` where the user's 40 rows spread across all
  * 40 objects — under three plans that remove the SAME logical rows:
  *
  *  1. PROBE REWRITE (copy-on-write, bloom-bounded): republishes every
  *     containing object — all 40 here, the worst case the layout
  *     allows;
  *  2. POSITION VECTORS (merge-on-read): one small vector file per
  *     containing object — 40 writes;
  *  3. EQUALITY DELETE: ONE value file + one CAS, whatever the spread —
  *     the O(1)-write claim, metered as landed bytes AND store write
  *     RPCs.
  *
  * Plus the read side: the eq-filtered table answers exactly, a
  * post-delete insert with the same uid survives, and compact folds
  * the filter and unblocks backfills.
  */
object RehearsalR17 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()

    val schema = TableSchema("ev", Seq(
      "id" -> ColType.CInteger, "uid" -> ColType.CInteger,
      "v" -> ColType.CFloat))
    val N = 2000000

    def buildLake(): (String, HadoopStore, String) = {
      val root =
        s"file://${Files.createTempDirectory("graft-r17").toFile.getAbsolutePath}"
      val store = new HadoopStore(root)
      for (h <- 0 until 8)
        LakeWriter.write(
          spark.range(h * N / 8, (h + 1) * N / 8)
            .select(col("id"), pmod(col("id"), lit(50000)).as("uid"),
              (col("id") * 1.0).as("v"))
            .repartitionByRange(6, col("id")),
          schema, root, Instant.parse(f"2024-06-01T0$h%d:00:00Z"),
          maxRecordsPerObject = 50000L, zoneMaps = true,
          bloomColumns = Seq("uid"))
      val cat = s"r17${math.abs(root.hashCode)}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      (root, store, cat)
    }

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

    // uid 333 appears once per 50k-row object: 40 rows, 40 objects
    val doomedUid = 333L
    val doomedRows = N / 50000

    def runDelete(cat: String, store: HadoopStore,
                  pred: String): (Long, Long, Meter.Metrics) = {
      val before = inventory(store)
      val w0 = StoreOps.writes.get
      val (_, m) = Meter.measure(spark) {
        spark.sql(s"DELETE FROM $cat.ev WHERE $pred")
      }
      (landedAfter(before, inventory(store)), StoreOps.writes.get - w0, m)
    }

    // ---- 1. probe rewrite (copy-on-write mode)
    val (_, cowStore, cowCat) = buildLake()
    val (cowLanded, cowWrites, _) = runDelete(cowCat, cowStore, s"uid = $doomedUid")
    require(spark.table(s"$cowCat.ev").count() == (N - doomedRows).toLong)

    // ---- 2. position vectors (MOR mode, arithmetic predicate matching
    // the same rows — mod shapes never translate to the probe/eq paths)
    val (_, vecStore, vecCat) = buildLake()
    spark.sql(s"CALL $vecCat.system.set_dml_mode(table => 'ev', " +
      "mode => 'merge-on-read')").collect()
    val (vecLanded, vecWrites, _) =
      runDelete(vecCat, vecStore, s"id % 50000 = $doomedUid")
    require(LakeVersions.currentDvs(vecStore, "ev").size == doomedRows,
      "one vector per containing object")
    require(spark.table(s"$vecCat.ev").count() == (N - doomedRows).toLong)

    // ---- 3. equality delete (MOR mode, the eq-eligible shape)
    val (_, eqStore, eqCat) = buildLake()
    spark.sql(s"CALL $eqCat.system.set_dml_mode(table => 'ev', " +
      "mode => 'merge-on-read')").collect()
    val (eqLanded, eqWrites, _) = runDelete(eqCat, eqStore, s"uid = $doomedUid")
    require(eqStore.list(LakeEqDeletes.dir("ev")).size == 1 &&
      LakeVersions.currentDvs(eqStore, "ev").isEmpty,
      "one eq file, zero vectors, zero rewrites")
    require(spark.table(s"$eqCat.ev").count() == (N - doomedRows).toLong)

    println(f"EQ_VS_VECTORS_VS_COW rows=$N%d deleted=$doomedRows%d " +
      f"cowLandedMB=${cowLanded / 1e6}%.2f cowWrites=$cowWrites%d " +
      f"vecLandedKB=${vecLanded / 1e3}%.1f vecWrites=$vecWrites%d " +
      f"eqLandedKB=${eqLanded / 1e3}%.3f eqWrites=$eqWrites%d " +
      f"bytesVsCow=${cowLanded.toDouble / math.max(1L, eqLanded)}%.0fx " +
      f"writesVsVectors=${vecWrites.toDouble / math.max(1L, eqWrites)}%.1fx")
    require(eqWrites * 3 < vecWrites,
      s"the eq delete must land a FRACTION of the vector path's write " +
        s"RPCs: $eqWrites vs $vecWrites")
    require(eqLanded * 10 < cowLanded,
      s"…and a fraction of the rewrite's bytes: $eqLanded vs $cowLanded")

    // ---- read side: exact answers; a later insert with the doomed uid
    // survives; compact folds and unblocks backfills
    val expectSum = spark.range(N.toLong)
      .where(s"NOT (id % 50000 = $doomedUid)")
      .agg(sum(col("id") * 1.0)).head.getDouble(0)
    val gotSum = spark.sql(s"SELECT sum(v) FROM $eqCat.ev").head.getDouble(0)
    require(math.abs(gotSum - expectSum) < 1e-3,
      s"eq-filtered scan must answer exactly: $gotSum vs $expectSum")
    import spark.implicits._
    LakeWriter.write(
      Seq((9000000000L, doomedUid, 1.5)).toDF("id", "uid", "v"),
      schema, eqStore.rootUri)
    require(spark.sql(
      s"SELECT count(*) FROM $eqCat.ev WHERE uid = $doomedUid")
      .head.getLong(0) == 1L,
      "a post-delete insert with the deleted uid must survive")
    spark.sql(s"CALL $eqCat.system.compact(table => 'ev')").collect()
    require(LakeVersions.currentEqdels(eqStore, "ev").isEmpty,
      "a full compact folds and drops the eq list")
    val folded = spark.sql(s"SELECT count(*) FROM $eqCat.ev").head.getLong(0)
    require(folded == (N - doomedRows + 1).toLong,
      s"fold must preserve rows exactly: $folded")
    println(s"EQ_READ_AND_FOLD ok rows=$folded")

    spark.stop()
  }
}
