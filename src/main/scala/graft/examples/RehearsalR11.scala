package graft.examples

import graft.Sessions
import graft.lake.{HadoopStore, LakeReader, LakeWriter}
import graft.operators.Frequency
import graft.types.{ColType, TableSchema}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-11 scale rehearsals — measured evidence for the round log.
  *
  * 1. `lakeSemiJoin` vs full-read + join: the dim-driven object prune on
  *    a user-ordered lake should answer from the few objects that can
  *    hold the dim's keys, while the plain join decompresses and parses
  *    every object first.
  * 2. `Frequency.heavyHitters` vs the naive GROUP BY / HAVING on a
  *    fat-tail corpus: both exact, but the naive plan shuffles millions
  *    of singleton groups while MG shuffles k·partitions candidates.
  */
object RehearsalR11 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"REHEARSE $label%-52s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  /** Bytes, not local wall-seconds, are the honest scale evidence —
    * see [[graft.Meter]] (the bench's shared task-metric meter, with
    * counter-stability polling for the async listener bus). */
  def metered[A](spark: org.apache.spark.sql.SparkSession, label: String)
                (f: => A): A = {
    val (r, m) = graft.Meter.measure(spark)(f)
    println(f"REHEARSE $label%-52s ${m.inputBytes / 1e6}%8.2f MB input, " +
      f"${m.shuffleBytes / 1e6}%8.2f MB shuffled, " +
      f"${m.taskMs / 1e3}%7.2f task-s")
    r
  }

  def main(args: Array[String]): Unit = {
    val sfBig = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()

    // ---- 1. lake semi-join vs full-scan join ---------------------------
    val root = "file:///tmp/graft-rehearse-r11-lake"
    val store = new HadoopStore(root)
    store.deletePrefix("")
    val schema = TableSchema("events_r11", Seq(
      "event_id" -> ColType.CInteger, "user_id" -> ColType.CInteger))
    // replicate events 100× (~10M rows): at 100k rows the whole lake
    // decompresses in the job-overhead noise and the prune cannot show —
    // the win IS the skipped objects' decompress+parse, so give the
    // objects real mass. Range-partitioning by user gives ~30 user-banded
    // objects written in parallel (the rehearsal doesn't need the specs'
    // exact-boundary determinism).
    val ev = spark.read.parquet(s"$sfBig/events.parquet")
      .select(col("event_id"), col("user_id"))
      .crossJoin(spark.range(100).select(col("id").as("rep")))
      .select((col("event_id") * 100 + col("rep")).as("event_id"), col("user_id"))
    val n = ev.count()
    LakeWriter.write(ev.repartitionByRange(30, col("user_id"), col("event_id")),
      schema, root, zoneMaps = true, bloomColumns = Seq("user_id"))
    println(s"lake: $n rows in ${LakeReader.listTableKeys(store, "events_r11", None).size} user-ordered objects")

    import spark.implicits._
    // ~20 keys in a narrow range: the shape of "events for this cohort"
    val dim = (0 until 20).map(i => i.toLong * 2).toDF("uid")
    def semi(): (Long, LakeReader.PruneReport) = {
      val (df, rep) = LakeReader.lakeSemiJoin(spark, root, "events_r11",
        "user_id", dim, "uid")
      (df.count(), rep)
    }
    def full(): Long =
      LakeReader.read(spark, root, "events_r11")
        .join(broadcast(dim.distinct()), col("user_id") === col("uid"), "left_semi")
        .count()
    // warm both paths once (JVM/codegen), then measure
    val (semiRows, rep) = semi(); val fullRows = full()
    require(semiRows == fullRows, s"semi=$semiRows full=$fullRows must agree")
    println(s"semi-join rows=$semiRows, prune=$rep")
    for (i <- 1 to 3) {
      time(s"lakeSemiJoin (pruned objects) #$i")(semi())
      time(s"full read + broadcast semi-join #$i")(full())
    }
    // wall-seconds hide the prune on local[32] — 30 small objects parse
    // in parallel under the fixed probe overhead. The cluster-bound
    // resources are bytes opened and task-seconds: the full path pays
    // for every object, the pruned path for the kept ones
    metered(spark, "lakeSemiJoin (pruned objects)")(semi())
    metered(spark, "full read + broadcast semi-join")(full())

    // ---- 2. exact heavy hitters vs naive GROUP BY ----------------------
    // 20M rows: 10% split over 3 heavy values, 90% singleton tail of
    // 32-char values (18M distinct groups, ~1 GB of shuffle payload —
    // the regime the naive plan pays for and MG never ships)
    val corpus = spark.range(20000000L).select(
      when(col("id") % 10 < 1, concat(lit("h"), col("id") % 3))
        .otherwise(md5(col("id").cast("string"))).as("v"))
      .repartition(32)
      .localCheckpoint() // measure the operators, not the generator
    def mg(): Set[(String, Long)] =
      Frequency.heavyHitters(corpus, "v", 2, 100)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    def naive(): Set[(String, Long)] = {
      val vals = corpus.where(col("v").isNotNull)
      val total = vals.count()
      vals.groupBy("v").agg(count(lit(1)).as("cnt"))
        .where(col("cnt") * 100 >= lit(total) * 2)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    }
    val a = mg(); val b = naive()
    require(a == b && a.size == 3, s"exactness: mg=$a naive=$b")
    println(s"heavy hitters: $a")
    for (i <- 1 to 3) {
      time(s"Misra-Gries + exact recount #$i")(mg())
      time(s"naive GROUP BY / HAVING (18M tail groups) #$i")(naive())
    }
    // seconds lie on local[32] (the shuffle is RAM-speed); BYTES are what
    // a cluster pays the network for
    metered(spark, "Misra-Gries + exact recount")(mg())
    metered(spark, "naive GROUP BY / HAVING")(naive())

    store.deletePrefix("")
    spark.stop()
  }
}
