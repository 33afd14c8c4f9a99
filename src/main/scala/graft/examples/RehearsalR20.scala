package graft.examples

import graft.lake._
import graft.types.{ColType, TableSchema}

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._

/** Round-20 metered evidence: ROLLBACK's protocol cost is O(changed
  * keys + chain records), not O(table) — the property that makes
  * `CALL lake.system.rollback` a safe panic button on a 100-TB
  * warehouse (the whole point of a bad-commit remedy is that it stays
  * cheap precisely when the table is huge and the mistake is small).
  *
  * Two identically-shaped retained lakes, one small (100k rows, ~64
  * objects over 8 hours) and one with 100× the rows and ~10× the
  * objects. Each takes the SAME bad commit (a COW DELETE of the
  * newest 1000 ids — a one-object rewrite on both), and the meter
  * isolates `rollback(version => '1')` itself: the chain walk, the
  * hour-directory listings (one RPC per hour directory, NOT per
  * object), the presence probes on the handful of resurrected keys,
  * and ONE record CAS. The claim asserted: the large lake's rollback
  * pays the same store RPCs as the small one's (± a few), both under a
  * fixed ceiling, and ZERO data objects move on either — the same
  * metered-flatness discipline RehearsalR19 applies to the
  * cross-table transaction. */
object RehearsalR20 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()

    val schema = TableSchema("events_rbx", Seq(
      "id" -> ColType.CInteger, "uid" -> ColType.CInteger,
      "v" -> ColType.CFloat))

    def build(tag: String, rows: Long, rollsPerPartition: Long)
        : (String, HadoopStore, String) = {
      val root =
        s"file://${Files.createTempDirectory(s"graft-r20-$tag").toFile.getAbsolutePath}"
      val store = new HadoopStore(root)
      val hours = 8
      for (h <- 0 until hours)
        LakeWriter.write(
          spark.range(h * rows / hours, (h + 1) * rows / hours)
            .select(col("id"), pmod(col("id"), lit(5000)).as("uid"),
              (col("id") * 1.0).as("v"))
            .repartitionByRange(4, col("id")),
          schema, root, Instant.parse(f"2024-06-01T0$h%d:00:00Z"),
          maxRecordsPerObject =
            math.max(1L, rows / hours / 4 / rollsPerPartition),
          zoneMaps = true)
      val cat = s"r20$tag${math.abs(root.hashCode)}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      (root, store, cat)
    }

    def rollbackOps(store: HadoopStore, cat: String, rows: Long)
        : (Long, Long) = {
      spark.sql(s"CALL $cat.system.set_retention(" +
        "table => 'events_rbx', retain => true)").collect()       // gen 1
      spark.sql(s"DELETE FROM $cat.events_rbx " +
        s"WHERE id >= ${rows - 1000}")                            // gen 2
      val dataBefore = store.list("")
        .filter(k => LakeKeys.parseKey(k).exists(_._2 == "events_rbx"))
        .sorted
      val ops0 = StoreOps.total
      val t0 = System.nanoTime()
      spark.sql(s"CALL $cat.system.rollback(table => 'events_rbx', " +
        "version => '1')").collect()
      val ms = (System.nanoTime() - t0) / 1000000L
      val ops = StoreOps.total - ops0
      val dataAfter = store.list("")
        .filter(k => LakeKeys.parseKey(k).exists(_._2 == "events_rbx"))
        .sorted
      require(dataAfter == dataBefore,
        "rollback must move ZERO data objects at any scale")
      (ops, ms)
    }

    val (rootS, storeS, catS) = build("small", 100000L, 2L)
    val (rootL, storeL, catL) = build("large", 10000000L, 10L)
    val objsS = LakeReader.listTableKeys(storeS, "events_rbx", None).size
    val objsL = LakeReader.listTableKeys(storeL, "events_rbx", None).size
    println(s"SHAPE  small objects=$objsS, large=$objsL (100x rows)")

    val (opsS, msS) = rollbackOps(storeS, catS, 100000L)
    val (opsL, msL) = rollbackOps(storeL, catL, 10000000L)
    println(s"ROLLBACK small=$opsS RPCs/${msS}ms, large=$opsL RPCs/${msL}ms")

    // both rolled back exactly: full row count restored
    require(LakeReader.read(spark, rootS, "events_rbx").count() == 100000L)
    require(LakeReader.read(spark, rootL, "events_rbx").count() == 10000000L)

    // THE CLAIM: rollback cost is flat in table size and bounded. The
    // statement touches the version chain (a listing whose entries are
    // GENERATIONS), the 8 hour-directory listings, presence probes on
    // the ~2 resurrected keys, and ONE record CAS — nothing
    // proportional to the 10x object spread or 100x rows.
    require(opsL <= opsS + 15 && opsL < 120,
      s"rollback protocol cost must be O(changed), flat in table " +
        s"size: small=$opsS large=$opsL")
    println(s"CLAIM: rolling back a bad commit costs ~$opsS store RPCs " +
      s"on a 100k-row lake and ~$opsL on a 10M-row one, moving zero " +
      "data bytes — O(changed keys + chain), flat at 100x the data")
    spark.stop()
  }
}
