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
    val p = points.withColumn("_b", floor(epochSec(pointTs) / bucketSeconds))
    val iv = replicateToBuckets(intervals, startTs, endTs,
      bucketSeconds, maxBucketsPerInterval)
    p.join(iv, "_b" +: equiKeys)
      .filter(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("_b")
  }

  /** All (left, right) interval pairs that OVERLAP — `l.start < r.end AND
    * r.start < l.end`, half-open — with no equi-key (or per-entity via
    * `equiKeys`). Both sides replicate to their bucket spans and
    * equi-join on the bucket; each overlapping pair emits EXACTLY once,
    * not once per shared bucket, because the join keeps only the pair's
    * FIRST common bucket (the bucket of `max(l.start, r.start)`) — a
    * pure per-row predicate replacing what would otherwise be a
    * distinct over the whole pair fan-out. Same bucketSeconds trade and
    * degenerate-interval guard as [[pointInInterval]]; left and right
    * column names must not collide except on the equi keys. */
  def intervalOverlap(left: DataFrame, lStart: String, lEnd: String,
                      right: DataFrame, rStart: String, rEnd: String,
                      bucketSeconds: Long = 3600L,
                      equiKeys: Seq[String] = Nil,
                      maxBucketsPerInterval: Long = 10000L): DataFrame = {
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be >= 1, got $maxBucketsPerInterval")
    val matches = Names.matcher(left)
    for (reserved <- Seq("_b", "_sb", "_eb"))
      require(!(left.columns ++ right.columns).exists(matches(_, reserved)),
        s"column name $reserved is reserved by RangeJoin.intervalOverlap")
    for (k <- equiKeys) require(
      left.columns.exists(matches(_, k)) && right.columns.exists(matches(_, k)),
      s"equi key $k must exist on both sides")
    val collide = left.columns.filter(c =>
      right.columns.exists(matches(c, _)) && !equiKeys.exists(matches(c, _)))
    require(collide.isEmpty,
      s"non-key columns ${collide.mkString(", ")} exist on both sides — alias one side")
    // EMPTY half-open intervals ([t, t)) intersect nothing, but the
    // two-sided strict predicate below is only an overlap test for
    // NON-empty intervals — an empty left interval inside a right one
    // would satisfy it. Drop EXACTLY the empty ones, on the RAW columns
    // (null-safe, so both-null rows — which emit nothing anyway — also
    // drop): truncated-epoch equality would silently drop a non-empty
    // sub-second interval ([10:00:00.2, 10:00:00.8)) with all its
    // overlap pairs. Truncation only affects BUCKETING, where the exact
    // post-join predicate compensates. Reversed intervals keep flowing
    // into replicateToBuckets' loud raise rather than vanishing here.
    val lNE = left.filter(!(col(lEnd) <=> col(lStart)))
    val rNE = right.filter(!(col(rEnd) <=> col(rStart)))
    val l = replicateToBuckets(lNE, lStart, lEnd, bucketSeconds, maxBucketsPerInterval)
    val r = replicateToBuckets(rNE, rStart, rEnd, bucketSeconds, maxBucketsPerInterval)
    l.join(r, "_b" +: equiKeys)
      .filter(col(lStart) < col(rEnd) && col(rStart) < col(lEnd))
      // first-common-bucket: emit the pair only in the bucket where the
      // overlap STARTS — every other shared bucket drops the row here
      .filter(col("_b") ===
        floor(greatest(epochSec(lStart), epochSec(rStart)) / bucketSeconds))
      .drop("_b")
  }

  /** TIMESTAMP_NTZ forbids a direct cast to BIGINT; routing through
    * TimestampType first is an identity for TZ inputs and, under a UTC
    * session, for NTZ inputs too — so the operators accept both flavors. */
  private def epochSec(c: String) = col(c).cast("timestamp").cast("long")

  /** Replicate each interval row to every bucket it spans, with the
    * degenerate-interval guard evaluated per row during the scan:
    * a NULL endpoint emits nothing (open-ended rows are data, not an
    * error); a REVERSED interval raises (sequence's default step -1
    * would silently fan out |span| descending buckets the post-filter
    * then discards); an over-cap span raises with the two remedies. */
  private def replicateToBuckets(df: DataFrame, startTs: String, endTs: String,
                                 bucketSeconds: Long, cap: Long): DataFrame =
    df.withColumn("_sb", floor(epochSec(startTs) / bucketSeconds))
      .withColumn("_eb", {
        val eb = floor(epochSec(endTs) / bucketSeconds)
        val span = eb - col("_sb")
        when(col("_sb").isNull || eb.isNull, lit(null).cast("long"))
          // reversed check on the RAW values, before the span branch: a
          // same-second reversed interval has bucket span 0 and would
          // otherwise slip past as "valid" instead of raising
          .when(col(endTs).cast("timestamp") < col(startTs).cast("timestamp"),
            raise_error(format_string(
              "RangeJoin: reversed interval [%s, %s) (end before start) — " +
                "fix the producing join/ETL or swap the bound columns",
              col(startTs), col(endTs))))
          .when(span >= 0 && span < lit(cap), eb)
          .otherwise(raise_error(format_string(
            s"RangeJoin: interval [%s, %s) spans %s buckets at bucketSeconds=$bucketSeconds, " +
              s"over the maxBucketsPerInterval=$cap guard — widen bucketSeconds " +
              "toward the typical interval length, or raise the cap deliberately",
            col(startTs), col(endTs), span + 1)))
      })
      .withColumn("_b", explode(sequence(col("_sb"), col("_eb"))))
      .drop("_sb", "_eb")
}
