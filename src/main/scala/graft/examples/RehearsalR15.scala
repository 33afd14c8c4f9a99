package graft.examples

import graft.Meter
import graft.lake._
import graft.types.{ColType, TableSchema}

import java.nio.file.Files
import java.time.Instant

import org.apache.spark.sql.functions._

/** Round-15 metered evidence, on a prebuilt lake (the isolated-path
  * numbers the per-query bench meters can't give — fixture cost
  * excluded):
  *
  *  1. POSITION-DELTA MERGE: a 1%-selective MERGE on a 2M-row lake —
  *     the plan ships only changed rows (shuffle bytes ~ changed rows,
  *     not touched-object rows), the rewrite touches only containing
  *     objects, and every untouched object stays byte-identical.
  *  2. CHANGES FEED: after one surgical DELETE on a 48-object lake,
  *     `LakeChanges.since(tag)` reads TWO objects (gone + fresh), not
  *     the lake.
  *  3. SCHEMA EVOLUTION: ALTER ADD COLUMN on the same lake is
  *     metadata-only (zero data bytes moved), and the evolved read's
  *     extra cost is one version-directory listing + one small record.
  */
object RehearsalR15 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    import spark.implicits._

    val root =
      s"file://${Files.createTempDirectory("graft-r15").toFile.getAbsolutePath}"
    val store = new HadoopStore(root)
    val schema = TableSchema("ev", Seq(
      "id" -> ColType.CInteger, "tag" -> ColType.CString,
      "v" -> ColType.CFloat))
    val cat = s"r15${math.abs(root.hashCode)}"
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)

    val N = 2000000
    for (h <- 0 until 8)
      LakeWriter.write(
        spark.range(h * N / 8, (h + 1) * N / 8)
          .select(col("id"), concat(lit("t"), pmod(col("id"), lit(97))).as("tag"),
            (col("id") * 1.0).as("v"))
          .repartitionByRange(6, col("id")),
        schema, root, Instant.parse(f"2024-06-01T0$h%d:00:00Z"),
        maxRecordsPerObject = 50000L, zoneMaps = true)
    val keys0 = LakeReader.listTableKeys(store, "ev", None)
    def bytesOf(k: String): Array[Byte] = {
      val in = store.open(k); try in.readAllBytes() finally in.close()
    }

    // ---- 1a. matched-only delta MERGE (the UPDATE-arm upsert shape):
    // the join is inner, the small source broadcasts, and the whole
    // statement's shuffle is the CHANGED rows' patch exchange — never
    // the 2M target rows
    spark.range(0, N.toLong, 100L).select(col("id").as("sid"))
      .createOrReplaceTempView("r15_upd")
    val (_, m1a) = Meter.measure(spark) {
      spark.sql(
        s"""MERGE INTO $cat.ev t USING r15_upd s ON t.id = s.sid
           |WHEN MATCHED THEN UPDATE SET v = t.v * 2""".stripMargin)
    }
    println(f"MERGE_DELTA_MATCHED rows=$N%d changed=${N / 100}%d " +
      f"shuffleMB=${m1a.shuffleBytes / 1e6}%.2f inputMB=${m1a.inputBytes / 1e6}%.2f")
    require(m1a.shuffleBytes < 10L * 1000 * 1000,
      s"matched-only delta MERGE shuffled ${m1a.shuffleBytes} — the " +
        "changed rows alone should ride the exchange (a group-based " +
        "rewrite ships every row of every touched object)")

    // ---- 1b. two-arm MERGE (insert arm forces the right-outer join —
    // ONE target exchange, which group-based pays too, PLUS its full
    // touched-group rewrite exchange that delta does NOT pay)
    spark.range(0, N.toLong, 100L).select(col("id").as("sid"))
      .unionByName(spark.range(1000).select((lit(100000000L) + col("id")).as("sid")))
      .createOrReplaceTempView("r15_src")
    val (_, m1) = Meter.measure(spark) {
      spark.sql(
        s"""MERGE INTO $cat.ev t USING r15_src s ON t.id = s.sid
           |WHEN MATCHED THEN UPDATE SET v = t.v * 2
           |WHEN NOT MATCHED THEN INSERT (id, tag, v, _event_hour)
           |  VALUES (s.sid, 'new', 1.0,
           |    TIMESTAMP '2024-06-01 09:00:00+00:00')""".stripMargin)
    }
    val rec = LakeVersions.head(store, "ev", LakeVersions.listDir(store, "ev")).get
    println(f"MERGE_DELTA_UPSERT rows=$N%d changed=${N / 100 + 1000}%d " +
      f"shuffleMB=${m1.shuffleBytes / 1e6}%.2f inputMB=${m1.inputBytes / 1e6}%.2f " +
      f"removed=${rec.removed.size}%d added=${rec.added.size}%d " +
      f"inserted=${rec.inserted.size}%d of ${keys0.size}%d objects")
    require(m1.shuffleBytes < 120L * 1000 * 1000,
      s"two-arm delta MERGE shuffled ${m1.shuffleBytes} — should be ~one " +
        "target join exchange, not join + full rewrite")

    // ---- 2. changes feed bounded by changed objects
    spark.sql(s"CALL $cat.system.set_retention(table => 'ev', retain => true)")
    spark.sql(s"CALL $cat.system.tag(table => 'ev', name => 'pin')")
    spark.sql(s"DELETE FROM $cat.ev WHERE id IN (777, 888)")
    val (nFeed, m2) = Meter.measure(spark) {
      LakeChanges.since(spark, root, "ev", "pin").count()
    }
    val (_, mFull) = Meter.measure(spark) {
      LakeReader.read(spark, root, "ev").agg(sum("v")).head()
    }
    println(f"CHANGES_FEED rows=$nFeed%d feedMB=${m2.inputBytes / 1e6}%.2f " +
      f"fullScanMB=${mFull.inputBytes / 1e6}%.2f " +
      f"ratio=${m2.inputBytes.toDouble / mFull.inputBytes}%.4f")
    require(nFeed == 2 && m2.inputBytes * 10 < mFull.inputBytes,
      "the feed must read a fraction of the lake")

    // ---- 3. ALTER is metadata-only; appends stay header-exact
    val liveKeys = LakeReader.listTableKeys(store, "ev", None)
    val sample = liveKeys.take(3).map(k => k -> bytesOf(k)).toMap
    val t0 = System.nanoTime()
    spark.sql(s"ALTER TABLE $cat.ev ADD COLUMN score DOUBLE")
    val alterMs = (System.nanoTime() - t0) / 1e6
    sample.foreach { case (k, b) => require(bytesOf(k).sameElements(b),
      s"ALTER must not touch $k") }
    val nNull = spark.sql(
      s"SELECT count(*) FROM $cat.ev WHERE score IS NULL").head.getLong(0)
    println(f"EVOLUTION alterMs=$alterMs%.0f nullScoreRows=$nNull%d " +
      s"(all pre-ALTER rows) objects=${liveKeys.size}")

    store.deletePrefix("")
    spark.stop()
  }
}
