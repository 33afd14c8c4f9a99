package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: project an irregular event stream onto a
  * fixed per-key time grid, forward-filling the last observation — the
  * "resample + ffill" every metrics/feature pipeline needs and SQL engines
  * express awkwardly (Spark has no native gap-fill operator; the composed
  * plan below is all built-ins).
  *
  * Semantics per key: grid points at every `step` from the key's first
  * observed bucket to its last; each point carries the latest observation
  * at-or-before it (so points inside gaps repeat the prior value — never
  * null, because the grid starts AT the first observation).
  *
  * Scale shape: three key-partitioned stages — (1) last-observation-per-
  * bucket dedup (one shuffle, map-side partial via the rank filter),
  * (2) per-key span aggregate + `sequence()` explode to mint the grid
  * (rows = Σ span/step, linear, no shuffle beyond the span agg),
  * (3) forward fill as `last(ignoreNulls)` over a key-partitioned window —
  * no single-partition stage anywhere; a key's grid must fit a task's
  * spillable sort (a year of minutes = 525k rows — fine), keys fan out
  * freely. */
object Timeseries {

  /** Gap-fill `valueCol` onto a per-key grid of `step` (a Spark interval
    * Column, e.g. `expr("INTERVAL 1 HOUR")`) aligned to `bucket` (a
    * function of the event time that must floor TO grid resolution, e.g.
    * `date_trunc("hour", ...)`). Within a bucket the kept observation is
    * the latest by (event time, value) — a total order, so ties are
    * deterministic. Output: `(key, bucket_ts, value)`. */
  def gapFill(df: DataFrame, key: Column, ts: Column, value: Column,
              bucketOf: Column => Column, step: Column): DataFrame = {
    val obs = df.select(key.as("key"), bucketOf(ts).as("bucket_ts"),
      ts.as("_gf_ts"), value.as("value"))
    // last observation per (key, bucket) IS an upsert view — one shuffle,
    // per-partition top-1, (ts, value) descending for a total order. The
    // filter collapses before the next shuffle, so gap-fill cost tracks
    // BUCKETS, not raw events. Materialized once: both the span aggregate
    // and the grid join consume it (the semDedup multi-consumer lesson).
    val hourly = Upsert.latest(obs, Seq("key", "bucket_ts"),
        col("_gf_ts"), col("value"))
      .select("key", "bucket_ts", "value")
      .transform(Materialize.cut)
    val grid = hourly.groupBy("key")
      .agg(min("bucket_ts").as("_gf_t0"), max("bucket_ts").as("_gf_t1"))
      .select(col("key"),
        explode(sequence(col("_gf_t0"), col("_gf_t1"), step)).as("bucket_ts"))
    grid.join(hourly, Seq("key", "bucket_ts"), "left")
      .withColumn("value",
        last(col("value"), ignoreNulls = true).over(
          Window.partitionBy("key").orderBy("bucket_ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** [[gapFill]] specialized to hourly buckets. */
  def gapFillHourly(df: DataFrame, key: Column, ts: Column, value: Column): DataFrame =
    gapFill(df, key, ts, value, date_trunc("hour", _), expr("INTERVAL 1 HOUR"))

  /** Time-weighted average under step-function (last-observation-carried-
    * forward) semantics, ENTIRELY in exact integer arithmetic: per key,
    * Σ valueᵢ·(tᵢ₊₁ − tᵢ) over consecutive observation pairs, divided by
    * the observed span — the TWAP/meter-reading aggregate a plain `avg`
    * gets wrong whenever sampling is irregular (a value held for an hour
    * must weigh 3600× one held a second). `tsSec` and `value` must be
    * integral columns (epoch seconds / scaled units); output carries the
    * exact numerator and denominator plus `twa_milli = 1000·num div den`,
    * so the caller picks its rounding. Keys with fewer than two
    * observations drop (zero span — undefined average, surfaced by
    * absence rather than a fabricated value).
    *
    * Scale shape: one key-partitioned lead() window + one keyed aggregate
    * — two exchanges on the same key (the aggregate reuses the window's
    * partitioning). Overflow bound: |value|·span·1000 must fit a BIGINT —
    * at cent/second resolution that is ~10¹² value-seconds per key, far
    * past any realistic per-key history; decimal(38,0) is the escape
    * hatch beyond. */
  def timeWeightedAvg(df: DataFrame, key: Column, tsSec: Column, tie: Column,
                      value: Column): DataFrame = {
    val w = Window.partitionBy("key").orderBy("ts", "tie")
    df.select(key.as("key"), tsSec.cast("long").as("ts"), tie.as("tie"),
        value.cast("long").as("v"))
      .withColumn("nts", lead("ts", 1).over(w))
      .filter(col("nts").isNotNull)
      .groupBy(col("key"))
      .agg(sum(col("v") * (col("nts") - col("ts"))).as("num"),
        sum(col("nts") - col("ts")).as("den"))
      .filter(col("den") > 0)
      .withColumn("twa_milli", expr("num * 1000 DIV den"))
  }

  /** Merge possibly-overlapping per-key intervals into maximal disjoint
    * islands and report per-key coverage: `(key, n_islands, covered)` in
    * the integral units of `startCol`/`endCol` (half-open [start, end)).
    * The classic sweep, distributed: within each key, order intervals by
    * (start, end); an interval opens a new island exactly when its start
    * exceeds the running max of all previous ends (a key-partitioned
    * cumulative-max window — no self-join, no explode of the covered
    * range); island ids are the running sum of those open flags; two
    * keyed aggregates (per-island extent, then per-key rollup) close it.
    * Everything stays partitioned by key; per-key interval counts fan out
    * across keys freely. Zero-or-negative-length intervals are ignored. */
  def intervalCoverage(df: DataFrame, key: Column, startCol: Column,
                       endCol: Column): DataFrame = {
    val byStart = Window.partitionBy("key").orderBy("s", "e")
    val prevMax = byStart.rowsBetween(Window.unboundedPreceding, -1)
    df.select(key.as("key"), startCol.cast("long").as("s"), endCol.cast("long").as("e"))
      .filter(col("e") > col("s"))
      .withColumn("open", when(max(col("e")).over(prevMax).isNull ||
        col("s") > max(col("e")).over(prevMax), 1L).otherwise(0L))
      .withColumn("island", sum(col("open")).over(byStart))
      .groupBy(col("key"), col("island"))
      .agg(min(col("s")).as("is_s"), max(col("e")).as("is_e"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("is_e") - col("is_s")).as("covered"))
  }
}
