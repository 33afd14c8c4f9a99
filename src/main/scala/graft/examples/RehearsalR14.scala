package graft.examples

import graft.lake.{HadoopStore, LakeCatalog, LakeMaintenance, LakeReader, LakeVersions, LakeWriter}
import graft.types.{ColType, TableSchema}

import java.time.Instant
import java.util.concurrent.{CountDownLatch, TimeUnit}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-14 measured evidence: the generation pointer's claims at a
  * size where they are visible.
  *
  *  1. CONCURRENCY: two overlapping COW UPDATEs interleaved at the CAS
  *     — exactly one commits, the loser aborts loudly, the table holds
  *     every row exactly once (pre-r14: kept rows silently DOUBLED).
  *  2. VERSION-READ OVERHEAD: the per-scan cost of tombstone-aware
  *     listing on a 192-object table — planning-time delta between a
  *     never-mutated table (empty fast path) and one with a 10-commit
  *     chain.
  *  3. CDC SKIP: a stream that delivered a 96-object backlog, then a
  *     broad UPDATE — the next trigger's input rows (pre-r14: the whole
  *     rewritten slice re-delivered).
  *  4. TIME TRAVEL: a retained table read at three generations —
  *     row-exact per generation, snapshot read planning its own keys. */
object RehearsalR14 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("rehearse-r14").master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val schema = TableSchema("rt", Seq(
      "id" -> ColType.CInteger, "vc" -> ColType.CInteger))
    def freshRoot(tag: String): (String, HadoopStore, String) = {
      val root = s"file:///tmp/graft-rehearse-r14-$tag"
      val store = new HadoopStore(root)
      store.deletePrefix("")
      val cat = s"r14$tag"
      spark.conf.set(s"spark.sql.catalog.$cat", classOf[LakeCatalog].getName)
      spark.conf.set(s"spark.sql.catalog.$cat.root", root)
      (root, store, cat)
    }
    def land(root: String, n: Int, perObject: Long): Unit =
      LakeWriter.write(
        (0 until n).map(i => (i.toLong, i.toLong)).toDF("id", "vc")
          .orderBy("id").coalesce(1),
        schema, root, Instant.parse("2024-07-01T08:00:00Z"),
        maxRecordsPerObject = perObject, zoneMaps = true)

    // ---- 1. the concurrency claim
    {
      val (root, store, cat) = freshRoot("race")
      land(root, 100000, 12500L) // 8 objects
      val entered = new CountDownLatch(1); val gate = new CountDownLatch(1)
      val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
      LakeVersions.beforeCasHook = _ =>
        if (armed.getAndSet(false)) { entered.countDown(); gate.await(60, TimeUnit.SECONDS); () }
      val err = new java.util.concurrent.atomic.AtomicReference[Throwable]()
      val t = new Thread(() =>
        try { spark.sql(s"UPDATE $cat.rt SET vc = vc + 1 WHERE id < 60000"); () }
        catch { case e: Throwable => err.set(e) })
      t.start(); entered.await(60, TimeUnit.SECONDS)
      spark.sql(s"UPDATE $cat.rt SET vc = vc + 1000000 WHERE id < 20000")
      gate.countDown(); t.join(120000)
      LakeVersions.beforeCasHook = _ => ()
      val r = spark.table(s"$cat.rt")
        .agg(count(lit(1)), countDistinct("id"), sum("vc")).head
      val loser = Option(err.get()).map(_ => "aborted loudly").getOrElse("COMMITTED (!!)")
      println(f"RACE  overlapping UPDATEs: loser $loser; rows=${r.getLong(0)}%,d " +
        f"distinct=${r.getLong(1)}%,d (pre-r14: overlap rows doubled silently); " +
        s"winner's sum=${r.getLong(2)} " +
        s"expected=${(0L until 100000L).sum + 1000000L * 20000L}")
      assert(r.getLong(0) == 100000 && r.getLong(1) == 100000)
      assert(r.getLong(2) == (0L until 100000L).sum + 1000000L * 20000L)
      assert(err.get() != null)
      store.deletePrefix("")
    }

    // ---- 2. version-read overhead per scan
    {
      val (root, _, cat) = freshRoot("cost")
      land(root, 96000, 500L) // 192 objects
      def planMs(): Double = {
        val t0 = System.nanoTime()
        spark.table(s"$cat.rt").where(col("id").between(1000, 1999)).count()
        (System.nanoTime() - t0) / 1e6
      }
      val cold = planMs()
      val plain = (0 until 5).map(_ => planMs()).min
      for (i <- 0 until 10)
        spark.sql(s"DELETE FROM $cat.rt WHERE id = ${90000 + i}")
      val chained = (0 until 5).map(_ => planMs()).min
      println(f"COST  pruned scan of a 192-object table: never-mutated ${plain}%.0f ms " +
        f"vs 10-commit chain ${chained}%.0f ms (cold $cold%.0f) — the version " +
        "consult is one listing + one record read per scan")
    }

    // ---- 3. CDC skip under an active stream
    {
      val (root, _, cat) = freshRoot("cdc")
      land(root, 48000, 500L) // 96 objects
      val ckpt = java.nio.file.Files.createTempDirectory("r14-cdc").toString
      val delivered = new java.util.concurrent.atomic.AtomicLong()
      val q = spark.readStream.format("graft-lake").option("table", "rt")
        .load(root).writeStream.option("checkpointLocation", ckpt)
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
          delivered.addAndGet(df.count()); () }
        .start()
      q.processAllAvailable()
      val base = delivered.get()
      spark.sql(s"UPDATE $cat.rt SET vc = -1 WHERE id < 24000") // half the lake
      q.processAllAvailable()
      val afterDml = delivered.get() - base
      q.stop()
      println(f"CDC   stream had delivered $base%,d rows; a broad UPDATE " +
        f"(half the lake rewritten) re-delivered $afterDml%,d rows " +
        f"(pre-r14: ~24,000 — every rewritten object replayed)")
      assert(afterDml == 0L)
    }

    // ---- 4. time travel
    {
      val (root, store, cat) = freshRoot("tt")
      land(root, 50000, 12500L)
      spark.sql(s"CALL $cat.system.set_retention(table => 'rt', retain => true)")
      spark.sql(s"UPDATE $cat.rt SET vc = vc + 1 WHERE id < 25000")   // gen 2
      spark.sql(s"DELETE FROM $cat.rt WHERE id >= 40000")             // gen 3
      val counts = (1 to 3).map(g => spark.sql(
        s"SELECT count(*), sum(vc) FROM $cat.rt VERSION AS OF $g").head)
      println(s"TIME  gen1 ${counts(0).getLong(0)} rows / sum ${counts(0).getLong(1)}; " +
        s"gen2 ${counts(1).getLong(0)} / ${counts(1).getLong(1)}; " +
        s"gen3 ${counts(2).getLong(0)} / ${counts(2).getLong(1)} " +
        "(= current); retained objects on disk: " +
        store.list("").count(k => graft.lake.LakeKeys.parseKey(k).exists(_._2 == "rt")))
      assert(counts(0).getLong(0) == 50000 &&
        counts(0).getLong(1) == (0L until 50000L).sum)
      assert(counts(1).getLong(1) == (0L until 50000L).sum + 25000L)
      assert(counts(2).getLong(0) == 40000)
      LakeMaintenance.sweepStaging(store, Instant.now().plusSeconds(1)) // tidy
    }

    println("R14 rehearsal OK")
    spark.stop()
  }
}
