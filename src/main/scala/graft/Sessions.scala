package graft

import org.apache.spark.sql.SparkSession

/** One place for engine session config so Verify, Bench, and tests agree.
  *
  * Scale posture: AQE on (runtime re-plan, skew-join splitting, dynamic
  * coalescing), shuffle partitions sized to the local core count (on a real
  * cluster this would be executors×cores×2-3; AQE coalesces down from
  * there), UTC session time for oracle parity, nanos-as-long so the events
  * table's TIMESTAMP(NANOS) parquet is readable.
  */
object Sessions {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // storage-partitioned execution for DSv2 scans that PROVE a
      // clustering (the graft-lake connector's opt-in clusterByHour
      // hour-grouping): inert unless a scan reports partition keys
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.compression.codec", "snappy")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")

  def local(cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")): SparkSession = {
    val spark = builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // the engine's advisory optimizer rules (see GraftExtensions for the
    // declarative path); idempotent across getOrCreate reuse
    val rules = Seq(org.apache.spark.sql.graft.StreamLakePrune,
      org.apache.spark.sql.graft.ZOrderWriteLayout)
    val missing = rules.filterNot(spark.experimental.extraOptimizations.contains)
    if (missing.nonEmpty)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations ++ missing
    spark
  }
}
