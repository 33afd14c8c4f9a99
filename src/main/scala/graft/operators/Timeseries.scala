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
      .localCheckpoint()
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
}
