package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) join — pair each point with every interval containing
  * it, with no equi-key. Spark plans the raw inequality condition as a
  * nested-loop join (quadratic); the scale shape is BUCKETING: quantize
  * the range dimension, replicate each interval to the buckets it spans
  * (bounded by interval length / bucket width), map each point to its one
  * bucket, equi-join on bucket, and post-filter with the exact predicate.
  * One shuffle by bucket key; each qualifying (point, interval) pair is
  * produced exactly once because a point lives in exactly one bucket.
  * DuckDB evaluates the same query with its native range-join — the q41
  * oracle. */
object RangeJoin {

  /** All (point, interval) pairs with `startTs ≤ point < endTs` (and equal
    * values on `equiKeys`, when given). Both timestamp columns must be
    * TimestampType or TIMESTAMP_NTZ; point and interval column sets must
    * not collide except on the equi keys. `bucketSeconds` trades interval
    * replication (length/bucket) against bucket population — set it near
    * the typical interval length.
    *
    * `equiKeys` is the scale lever when intervals are per-entity (per-user
    * sessions, per-device maintenance windows): the shuffle key becomes
    * (key, bucket), so a bucket's population shrinks from ALL concurrent
    * intervals to one entity's — and the post-filter evaluates per-entity,
    * not across the global time slice.
    *
    * `maxBucketsPerInterval` guards the replication degenerate: a single
    * years-long interval at the default 1h bucket would silently fan out
    * to ~10⁴ copies PER ROW. Any interval spanning more buckets fails the
    * job loudly (inside the plan — no extra driver pass) with the two
    * remedies in the message: widen `bucketSeconds` toward the true
    * interval length, or raise the cap deliberately. */
  def pointInInterval(points: DataFrame, pointTs: String,
                      intervals: DataFrame, startTs: String, endTs: String,
                      bucketSeconds: Long = 3600L,
                      equiKeys: Seq[String] = Nil,
                      maxBucketsPerInterval: Long = 10000L): DataFrame = {
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be >= 1, got $maxBucketsPerInterval")
    // Column checks honor the session's resolver semantics (Names.matcher)
    // — a key that Spark would resolve must not be rejected here, and a
    // column Spark would see as colliding with _b must be.
    val matches = Names.matcher(points)
    for (reserved <- Seq("_b", "_sb", "_eb"))
      require(!(points.columns ++ intervals.columns).exists(matches(_, reserved)),
        s"column name $reserved is reserved by RangeJoin.pointInInterval")
    for (k <- equiKeys) require(
      points.columns.exists(matches(_, k)) && intervals.columns.exists(matches(_, k)),
      s"equi key $k must exist on both sides")
    // TIMESTAMP_NTZ forbids a direct cast to BIGINT; routing through
    // TimestampType first is an identity for TZ inputs and, under a UTC
    // session, for NTZ inputs too — so the operator accepts both flavors.
    def epochSec(c: String) = col(c).cast("timestamp").cast("long")
    val p = points.withColumn("_b", floor(epochSec(pointTs) / bucketSeconds))
    val iv = intervals
      .withColumn("_sb", floor(epochSec(startTs) / bucketSeconds))
      // raise_error branch: evaluated per row during the scan, so a
      // degenerate interval aborts the job before it can fan out
      // (NullType coerces to the when-branch's LongType). Three cases,
      // in order: a NULL endpoint keeps its pre-guard semantics (the
      // sequence is NULL, explode emits nothing — an open-ended row is
      // data, not an error); a REVERSED interval raises (sequence's
      // default step -1 would silently fan out |span| descending buckets
      // that the post-filter then discards — the exact replication the
      // guard exists to stop); an over-cap span raises with remedies.
      .withColumn("_eb", {
        val eb = floor(epochSec(endTs) / bucketSeconds)
        val span = eb - col("_sb")
        when(col("_sb").isNull || eb.isNull, lit(null).cast("long"))
          .when(span >= 0 && span < lit(maxBucketsPerInterval), eb)
          .when(span < 0, raise_error(format_string(
            "RangeJoin: reversed interval [%s, %s) (end before start) — " +
              "fix the producing join/ETL or swap the bound columns",
            col(startTs), col(endTs))))
          .otherwise(raise_error(format_string(
            s"RangeJoin: interval [%s, %s) spans %s buckets at bucketSeconds=$bucketSeconds, " +
              s"over the maxBucketsPerInterval=$maxBucketsPerInterval guard — widen bucketSeconds " +
              "toward the typical interval length, or raise the cap deliberately",
            col(startTs), col(endTs), span + 1)))
      })
      .withColumn("_b", explode(sequence(col("_sb"), col("_eb"))))
      .drop("_sb", "_eb")
    p.join(iv, "_b" +: equiKeys)
      .filter(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("_b")
  }
}
