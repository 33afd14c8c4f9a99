package graft.examples

import graft.Sessions
import graft.operators.{Multimodal, RangeJoin}

import org.apache.spark.sql.functions._

/** Round-7 scale rehearsal (not library surface) for the round's new
  * operators, in the RehearsalR4/R5 pattern: planted structure so the
  * expected outcome is ARITHMETIC, verified exactly, with wall-clock
  * printed for the survey log.
  *
  * 1. Keyed range join at 100× the fixture volume: 5M points across 100k
  *    users, one 30-minute window per user anchored at the user's first
  *    event. Each user emits 50 events at strict 60s spacing, so exactly
  *    the first 30 land inside the window → expected pairs = 100k × 30 =
  *    3,000,000, no more (the window is half-open) and no cross-user
  *    leakage (asserted by construction: user bases are staggered so a
  *    cross-user match would need a different count).
  *
  * 2. WAV codec at 4× the sf0.1 clip volume: 200k synthesized PCM clips
  *    encoded and decoded through javax.sound.sampled; every decoded
  *    (rate, frames, amp) must equal the planted arithmetic.
  */
object RehearsalR7 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"REHEARSE $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    import spark.implicits._

    // --- 1. keyed range join, 5M × 100k ---------------------------------
    val nUsers = 100000L
    val perUser = 50L
    val events = spark.range(nUsers * perUser)
      .select(
        (col("id") / perUser).cast("long").as("user_id"),
        pmod(col("id"), lit(perUser)).as("k"))
      // stagger users over ~1000 distinct hours; events 60s apart
      .select(col("user_id"), col("k"),
        timestamp_seconds(lit(1700000000L) + pmod(col("user_id"), lit(1000L)) * 3600L
          + col("k") * 60L).as("ts"))
    val windows = events.groupBy(col("user_id"))
      .agg(min(col("ts")).as("start_ts"))
      .withColumn("end_ts", col("start_ts") + expr("INTERVAL 30 MINUTES"))
    val matched = time("keyed range join 5M pts × 100k windows") {
      RangeJoin.pointInInterval(
        events.select(col("user_id"), col("k"), col("ts")), "ts",
        windows, "start_ts", "end_ts", equiKeys = Seq("user_id")).count()
    }
    // half-open [start, start+30min): k*60 < 1800 → k in 0..29, 30/user
    val expected = nUsers * 30L
    assert(matched == expected, s"keyed range join: $matched != $expected")
    println(s"REHEARSE keyed-range-join pairs=$matched (exact)")

    // --- 2. WAV encode→decode, 200k clips -------------------------------
    val clips = spark.range(200000).toDF("doc_id")
    val bad = time("WAV encode+decode 200k clips") {
      Multimodal.decodeFeatures(
          Multimodal.synthesizeWav(clips, "doc_id"), Multimodal.WavDecoder)
        .filter(col => col.width != (8000 + 4000 * (col.media_id % 3)).toInt ||
          col.height != 1 ||
          col.feature(0) != (100 + col.media_id % 400).toFloat ||
          col.feature(1) != (col.media_id % 30000).toFloat)
        .count()
    }
    assert(bad == 0L, s"WAV round-trip: $bad clips decoded off-oracle")
    println("REHEARSE wav-roundtrip all 200k clips exact")

    spark.stop()
  }
}
