package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hash-bucketed table layout — Spark's pre-shuffled storage format.
  *
  * A table written with `bucketBy(n, key)` is physically split into `n`
  * files per write-task group by `hash(key) % n`, and the bucket spec is
  * recorded in the catalog. A join (or aggregate) on the bucket key can
  * then reuse that layout as its required distribution: two tables
  * bucketed to the SAME bucket count on their join keys sort-merge-join
  * with ZERO Exchange on either side — the shuffle happened once, at
  * write time, and is amortized over every subsequent query.
  *
  * At 100 TB this is the difference between re-shuffling the fact table on
  * every run and never shuffling it at all: land `lineitem`/`orders` keyed
  * by their join keys once per ingest, and the daily join workload becomes
  * scan + merge. `sortBy` on the same key additionally pre-sorts each
  * bucket file so the merge phase needs no sort either.
  *
  * BucketingSpec proves the property: the co-located join's executed plan
  * contains no Exchange, while the identical join over plain parquet does.
  */
object Bucketing {

  /** Write `df` as a bucketed (and per-bucket sorted) parquet table
    * registered in the session catalog at an explicit `path`. Overwrites
    * any previous contents — the catalog entry is dropped first so a
    * changed bucket spec can never silently coexist with old files. */
  def writeBucketed(spark: SparkSession, df: DataFrame, name: String, path: String,
                    buckets: Int, key: String): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    df.write.format("parquet").mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(name)
  }

  /** Equi-join two bucketed catalog tables on `leftKey === rightKey`.
    * When both tables are bucketed on those keys with equal bucket counts,
    * the planner emits a shuffle-free sort-merge join. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
