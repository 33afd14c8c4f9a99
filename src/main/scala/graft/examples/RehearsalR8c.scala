package graft.examples

import graft.Sessions
import graft.operators.Timeseries

import org.apache.spark.sql.functions._

/** Third round-8 rehearsal: the exact-integer time-series aggregates at
  * 10M events, planted so the expected outcome is arithmetic.
  *
  * 1. TWAP over 100k users × 100 observations: each user u holds the
  *    constant value u mod 1000 cents at ts = i·10 — a constant's
  *    time-weighted average IS the constant, so twa_milli must equal
  *    (u mod 1000)·1000 exactly for every user, with num = v·990 and
  *    den = 990 (99 segments × 10s).
  *
  * 2. Interval coverage over 100k users × 200 intervals: per slot i two
  *    overlapping intervals [100i, 100i+50) and [100i+25, 100i+75) must
  *    merge into one island [100i, 100i+75) — exactly 100 islands and
  *    7500 covered seconds per user, every overlap resolved.
  */
object RehearsalR8c {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"REHEARSE $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    import spark.implicits._

    val nUsers = 100000L
    val perUser = 100L

    // --- 1. TWAP -------------------------------------------------------
    // integer DIV throughout: `/` on long COLUMNS is double division,
    // and (k + u/1e5)·100 rounds below integer boundaries for some ids —
    // the first run of this rehearsal caught exactly that (31 deviating
    // users whose island starts disagreed between the two interval sets)
    val obs = spark.range(nUsers * perUser).select(
      ($"id" % nUsers).as("u"),
      (expr(s"id DIV $nUsers") * 10).as("ts"),
      $"id".as("tie"),
      ($"id" % nUsers % 1000).as("v"))
    val twa = time("TWAP 10M observations / 100k users") {
      Timeseries.timeWeightedAvg(obs, $"u", $"ts", $"tie", $"v").localCheckpoint()
    }
    assert(twa.count() == nUsers, "every user has >= 2 observations")
    val twaBad = twa.filter(
      $"twa_milli" =!= ($"key" % 1000) * 1000 ||
      $"num" =!= ($"key" % 1000) * 990 || $"den" =!= 990).count()
    assert(twaBad == 0, s"$twaBad users deviate from the constant-value TWAP")
    println(s"  twap: ${nUsers} users, twa == value exactly")

    // --- 2. interval coverage -----------------------------------------
    val slots = spark.range(nUsers * perUser)
    val a = slots.select(($"id" % nUsers).as("u"),
      (expr(s"id DIV $nUsers") * 100).as("s"))
      .withColumn("e", $"s" + 50)
    val b = slots.select(($"id" % nUsers).as("u"),
      (expr(s"id DIV $nUsers") * 100 + 25).as("s"))
      .withColumn("e", $"s" + 50)
    val cov = time("interval coverage 20M intervals / 100k users") {
      Timeseries.intervalCoverage(a.unionAll(b), $"u", $"s", $"e").localCheckpoint()
    }
    assert(cov.count() == nUsers)
    val covBad = cov.filter($"n_islands" =!= perUser ||
      $"covered" =!= perUser * 75).count()
    assert(covBad == 0, s"$covBad users deviate from the planted island arithmetic")
    println(s"  coverage: ${nUsers} users, 100 islands x 75s exact")

    spark.stop()
  }
}
