package graft.examples

import graft.Sessions
import graft.operators.Entity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-10 measurements, kept as a driver so the numbers stay
  * regenerable:
  *
  * 1. MULTI-MATCH-AWARE PassJoin substring selection (Li/Deng/Feng
  *    VLDB'11 §4) vs the plain symmetric ±k window, on the e03 corpus
  *    shape (documents.head(24), k=2): probe-row count, distinct
  *    candidate count, and a full verified-pair cross-check proving both
  *    windows yield the IDENTICAL true-pair set (the spec proves
  *    completeness brute-force at small q×k; this proves it at corpus
  *    scale).
  *
  * 2. The `Guards.perKeyRows` price, armed vs disarmed, on the two
  *    queries that carry it hottest (e01's blocked canonicalization and
  *    t17's blocked fuzzy match) at sf0.1 — the round-9 verdict asked
  *    for this number to stay tracked (it was ~0.3-0.4s of the ~4s
  *    totals when introduced).
  *
  * Usage: scripts/run.sh graft.examples.RehearsalR10 \
  *          [/root/testdata/sf0.01 [/root/testdata/sf0.1]]
  */
object RehearsalR10 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"REHEARSE $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val sfBig = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.local()

    // ---- 1. multi-match-aware window vs plain ±k window ----------------
    val k = 2
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").as("_id"),
        substring(col("text"), 1, 24).as("_key"))
      .withColumn("_len", length(col("_key")).cast("long"))
      .cache()
    base.count()

    def candidates(mma: Boolean): DataFrame =
      Entity.segIndexRows(base, k)
        .join(Entity.segProbeRows(base, k, multiMatchAware = mma),
          col("_iseg") === col("_psub") && col("_ii") === col("_pi") &&
            col("_ilen") === col("_pla") && col("_iid") =!= col("_pid"))
        .select(least(col("_iid"), col("_pid")).as("a_id"),
          greatest(col("_iid"), col("_pid")).as("b_id"))
        .dropDuplicates("a_id", "b_id")

    def verified(mma: Boolean): DataFrame = {
      val keys = base.select(col("_id"), col("_key"))
      candidates(mma)
        .join(keys.select(col("_id").as("a_id"), col("_key").as("_ak")), "a_id")
        .join(keys.select(col("_id").as("b_id"), col("_key").as("_bk")), "b_id")
        .select(col("a_id"), col("b_id"),
          levenshtein(col("_ak"), col("_bk"), k).cast("long").as("dist"))
        .filter(col("dist") =!= -1)
    }

    val counts = Seq(false, true).map { mma =>
      val nProbe = time(s"segProbeRows(mma=$mma).count")(
        Entity.segProbeRows(base, k, multiMatchAware = mma).count())
      val nCand = time(s"candidates(mma=$mma).count")(candidates(mma).count())
      println(s"REHEARSE mma=$mma: probeRows=$nProbe candidates=$nCand")
      (mma, nProbe, nCand)
    }
    // completeness cross-check at corpus scale: identical verified pairs
    val plain = verified(mma = false).cache(); val nPlain = plain.count()
    val aware = verified(mma = true).cache(); val nAware = aware.count()
    val missing = plain.except(aware).count()
    require(missing == 0 && nPlain == nAware,
      s"multi-match-aware window dropped pairs: plain=$nPlain aware=$nAware missing=$missing")
    println(s"REHEARSE verified-pair sets identical: $nAware pairs both ways")
    counts.foreach { case (mma, p, c) =>
      println(s"REHEARSE summary mma=$mma probeRows=$p candidates=$c") }
    plain.unpersist(); aware.unpersist(); base.unpersist()

    // ---- 2. guard price: armed vs disarmed at sf0.1 --------------------
    val docsBig = spark.read.parquet(s"$sfBig/documents.parquet")
      .select(col("doc_id"), col("source"), col("text")).cache()
    docsBig.count()

    def e01(maxBlockRows: Long): Long =
      Entity.canonicalize(docsBig, "doc_id", col("source"),
        substring(col("text"), 1, 24), maxDist = 10,
        maxBlockRows = maxBlockRows).count()

    def t17(armed: Boolean): Long = {
      val d = docsBig.select(col("doc_id"), col("source"),
        substring(col("text"), 1, 24).as("head"))
      val ga = if (armed) Entity.guardBlockSize(d, col("source"), 100000L,
                  "t17 fuzzy-match rehearsal")
               else d
      val a = ga.select(col("doc_id").as("a_id"), col("source"),
        col("head").as("a_head"))
      val b = d.select(col("doc_id").as("b_id"), col("source"),
        col("head").as("b_head"))
      val half = a.join(b, "source").filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          levenshtein(col("a_head"), col("b_head")).cast("long").as("dist"))
      val sym = half.unionAll(half.select(col("b_id").as("a_id"),
        col("a_id").as("b_id"), col("dist")))
      sym.groupBy(col("a_id"))
        .agg(min(struct(col("dist"), col("b_id"))).as("m"))
        .select(col("a_id"), col("m.b_id"), col("m.dist")).count()
    }

    for (run <- 1 to 2) {
      time(s"e01 canonicalize ARMED   (run $run)")(e01(100000L))
      time(s"e01 canonicalize DISARMED(run $run)")(e01(0L))
      time(s"t17 fuzzy-match ARMED   (run $run)")(t17(armed = true))
      time(s"t17 fuzzy-match DISARMED(run $run)")(t17(armed = false))
    }
    docsBig.unpersist()

    // ---- 3. bloom point-probe vs full scan on a string column ----------
    // The l13 shape at sf0.1 volume: the events table landed as an
    // etype-clustered lake with bloom sidecars; "find every row of one
    // etype" as (a) a full read + filter and (b) a bloom-pruned read +
    // filter. The probe's win is the skipped objects' decompress+parse.
    locally {
      import graft.lake.{HadoopStore, LakeReader, LakeWriter}
      import graft.types.{ColType, TableSchema}
      val root = "file://" + java.nio.file.Files
        .createTempDirectory("graft-r10-bloom").toFile.getAbsolutePath
      val schema = TableSchema("ev_bloom", Seq(
        "event_id" -> ColType.CInteger, "etype" -> ColType.CString))
      val ev = spark.read.parquet(s"$sfBig/events.parquet")
        .select(col("event_id"),
          concat(lit("e"), (col("user_id") % 97).cast("string")).as("etype"))
      val written = time("bloom lake build (untimed baseline)")(
        LakeWriter.write(ev.repartition(32, col("etype")), schema, root,
          bloomColumns = Seq("etype")))
      println(s"REHEARSE bloom lake: ${written.size} objects, " +
        s"${written.map(_.records).sum} rows")
      for (run <- 1 to 2) {
        val full = time(s"full scan + filter    (run $run)")(
          LakeReader.read(spark, root, "ev_bloom")
            .filter(col("etype") === "e13").count())
        val (pruned, rep) = LakeReader.readPrunedEq(spark, root, "ev_bloom",
          "etype", "e13")
        val n = time(s"bloom probe + filter   (run $run)")(
          pruned.filter(col("etype") === "e13").count())
        require(n == full, s"pruned read must match the scan: $n vs $full")
        println(s"REHEARSE bloom probe kept ${rep.kept}/${rep.candidates} objects")
      }
      new HadoopStore(root).deletePrefix("")
    }
    spark.stop()
  }
}
