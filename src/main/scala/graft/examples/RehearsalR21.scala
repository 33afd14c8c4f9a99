package graft.examples

import graft.lake._
import graft.types.{ColType, TableSchema}

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._

/** Round-20 metered evidence: the STREAMING CDF's per-commit cost is
  * O(that commit's changed objects), not O(table) — the property that
  * makes a standing "what changed in the corpus" subscription viable on
  * a 100-TB warehouse (the whole point of an incremental feed is that a
  * small commit costs small, however big the table grew).
  *
  * Two retained lakes with IDENTICAL object sizes (3125 rows each), one
  * 100k rows (~32 objects), one 100× that (10M rows, ~3200 objects).
  * Each takes the SAME small commit (a COW UPDATE confined to one
  * object), and the meter isolates the CDF drain of exactly that
  * commit's window: input bytes ≈ the two changed objects (the retired
  * original + its rewrite), store RPCs ≈ chain walk + hour listings +
  * the pair of opens — nothing proportional to the 100× object spread.
  * The claim asserted: large-lake drain bytes and RPCs are flat against
  * the small lake's, both under fixed ceilings — the RehearsalR19/R20
  * metered-flatness discipline applied to the feed. */
object RehearsalR21 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()

    val schema = TableSchema("events_cfx", Seq(
      "id" -> ColType.CInteger, "uid" -> ColType.CInteger,
      "v" -> ColType.CFloat))

    def build(tag: String, rows: Long): (String, HadoopStore, String) = {
      val root =
        s"file://${Files.createTempDirectory(s"graft-r21-$tag").toFile.getAbsolutePath}"
      val store = new HadoopStore(root)
      val hours = 8
      for (h <- 0 until hours)
        LakeWriter.write(
          spark.range(h * rows / hours, (h + 1) * rows / hours)
            .select(col("id"), pmod(col("id"), lit(5000)).as("uid"),
              (col("id") * 1.0).as("v"))
            .repartitionByRange(4, col("id")),
          schema, root, Instant.parse(f"2024-06-01T0$h%d:00:00Z"),
          maxRecordsPerObject = 3125L, zoneMaps = true)
      val cat = s"r21$tag${math.abs(root.hashCode)}"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      (root, store, cat)
    }

    def drainOps(root: String, cat: String): (Long, Long) = {
      spark.sql(s"CALL $cat.system.set_retention(" +
        "table => 'events_cfx', retain => true)").collect()       // gen 1
      // the SAME one-object commit on both lakes: ids 0..999 live in
      // the first 3125-row object of hour 0
      spark.sql(s"UPDATE $cat.events_cfx SET v = -1.0 WHERE id < 1000")
      val ckpt =
        Files.createTempDirectory("graft-r21-ckpt").toFile.getAbsolutePath
      val n = new java.util.concurrent.atomic.AtomicLong(0L)
      val ops0 = StoreOps.total
      val (_, m) = graft.Meter.measure(spark) {
        val q = spark.readStream.format("graft-lake-cdf")
          .option("table", "events_cfx").option("startingVersion", "1")
          .load(root).writeStream
          .option("checkpointLocation", ckpt)
          .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
            n.addAndGet(df.count()); ()
          }
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination(120000)
      }
      val ops = StoreOps.total - ops0
      require(n.get() == 2000L, // 1000 deletes + 1000 inserts
        s"the drain must deliver exactly the commit's change: ${n.get()}")
      (ops, m.inputBytes)
    }

    val (rootS, _, catS) = build("small", 100000L)
    val (rootL, _, catL) = build("large", 10000000L)
    val objsS = LakeReader.listTableKeys(new HadoopStore(rootS),
      "events_cfx", None).size
    val objsL = LakeReader.listTableKeys(new HadoopStore(rootL),
      "events_cfx", None).size
    println(s"SHAPE  small objects=$objsS, large=$objsL (100x rows, " +
      "identical object size)")

    val (opsS, bytesS) = drainOps(rootS, catS)
    val (opsL, bytesL) = drainOps(rootL, catL)
    println(f"CDF DRAIN small=$opsS RPCs/${bytesS / 1024.0}%.1fKB, " +
      f"large=$opsL RPCs/${bytesL / 1024.0}%.1fKB")

    // THE CLAIM: the feed's per-commit cost follows the CHANGE, not the
    // table. Input ≈ the retired original + its rewrite (identical
    // object sizes by construction); RPCs ≈ chain walk + 8 hour-dir
    // listings + the pair of opens with their sidecars.
    require(bytesL <= bytesS * 3 / 2 && opsL <= opsS + 20 && opsL < 200,
      s"CDF per-commit cost must be O(changed objects), flat in table " +
        s"size: small=($opsS, $bytesS) large=($opsL, $bytesL)")
    println(f"CLAIM: draining one small commit's changes costs " +
      f"~${bytesS / 1024.0}%.0fKB/$opsS RPCs on a 100k-row lake and " +
      f"~${bytesL / 1024.0}%.0fKB/$opsL RPCs on a 10M-row one — " +
      "O(changed objects), flat at 100x the data")
    spark.stop()
  }
}
