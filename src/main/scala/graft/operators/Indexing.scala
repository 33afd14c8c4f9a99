package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Contiguous global row numbering (1..N in key order) without a
  * single-partition window.
  *
  * `row_number() OVER (ORDER BY key)` — the obvious formulation — moves the
  * ENTIRE dataset through one task (Spark plans an empty-partition window
  * exchange; the WindowExec warning names it), which is the canonical
  * scale-killer for the "assign stable training-example ids" step of a
  * corpus build. The scalable shape is the classic two-pass:
  *
  *   1. shard rows into range buckets of the key (`floor((key−min)/width)` —
  *      a pure per-row expression once min/max are known; one cheap
  *      min/max aggregate determines them);
  *   2. count rows per bucket and turn the counts into exclusive prefix
  *      offsets — a window over the BUCKET TABLE, which has `buckets` rows,
  *      not N (the only sequential step, deliberately model-sized);
  *   3. rank within each bucket in parallel
  *      (`row_number() OVER (PARTITION BY bucket ORDER BY key)`) and add
  *      the bucket's offset.
  *
  * The result is identical to the global window for any distinct-keyed
  * input (ties would be ordered arbitrarily by either plan; callers wanting
  * tie stability should pass a unique key). Cost: one extra aggregate +
  * one broadcast join vs. an unshufflable single task — at 100 TB the
  * global window is not merely slow, it does not finish.
  *
  * Bucket-width caveat: equal-width range buckets assume the key is not
  * pathologically clustered (ids, timestamps, hashes are fine). For skewed
  * keys, compose with a rolling-hash bucket on a SECONDARY pass or use
  * `repartitionByRange`'s sampled boundaries — sampled boundaries are not
  * deterministic across runs, which is why the default here is the
  * deterministic arithmetic split.
  */
object Indexing {

  /** Append `global_idx` (1-based, contiguous, ordered by `key`, null keys
    * first — Spark's ascending-sort default, so the numbering matches
    * `row_number() OVER (ORDER BY key)` row for row) to `df`. `buckets`
    * bounds the parallel fan-out of the ranking pass (choose ~ cluster
    * cores; each bucket's rows must fit a task's spillable sort). */
  def globalIndex(df: DataFrame, key: Column, buckets: Int = 64): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(!df.columns.contains("global_idx"), "input already has 'global_idx'")
    // Integral keys only, checked loudly: any value whose cast("long") is
    // null (a non-numeric string, a decimal beyond Long range) would get a
    // null bucket and silently VANISH through the offsets join.
    val keyType = df.select(key).schema.head.dataType
    require(Seq[org.apache.spark.sql.types.DataType](
        org.apache.spark.sql.types.ByteType, org.apache.spark.sql.types.ShortType,
        org.apache.spark.sql.types.IntegerType, org.apache.spark.sql.types.LongType)
      .contains(keyType),
      s"globalIndex requires an integral key column (got $keyType); " +
        "hash or rank non-integral keys into a long first")
    // THREE downstream consumers (the bounds aggregate, the offsets
    // aggregate, the index join) would each re-expand the caller's whole
    // upstream — p09's source-sequence window ran three times before this
    // (r16, guide §3.3). Materialize once; consumers scan the blocks.
    val d = df.transform(Materialize.cut)
    val bounds = d.agg(min(key).cast("long").as("lo"), max(key).cast("long").as("hi")).head()
    if (bounds.isNullAt(0)) return d.withColumn("global_idx",
      row_number().over(Window.orderBy(key)).cast("long")) // degenerate all-null input: plain window
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    // All bucket arithmetic in BigInt/decimal(38,0): a hash-valued key
    // column legitimately spans nearly the full Long range, where both
    // `hi - lo` and a double-typed division would silently overflow/round
    // (a span > 2^63 wraps negative; > 2^53 loses low bits). Decimal ops
    // are exact and still codegen'd.
    val span = BigInt(hi) - BigInt(lo)
    val width = (span / buckets + 1).max(1) // ceil-ish: bucket ids stay in [0, buckets)
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    // Null keys form bucket -1: they sort first (min bucket id) and join by
    // a non-null literal, so they keep their rows and take indexes 1..#null
    // — exactly the global window's NULLS FIRST behavior.
    val bucketExpr = when(key.isNull, lit(-1L).cast(dec)).otherwise(
      floor((key.cast("long").cast(dec) - lit(new java.math.BigDecimal(lo)))
        / lit(new java.math.BigDecimal(width.bigInteger))))
    val withB = d.withColumn("_gidx_bucket", bucketExpr.cast("long"))
    // bucket table: `buckets` rows — the prefix-sum window here is single-
    // partition BY DESIGN (model-sized state, like a centroid table)
    val offsets = withB.groupBy("_gidx_bucket").agg(count(lit(1)).as("_gidx_n"))
      .withColumn("_gidx_off",
        coalesce(sum(col("_gidx_n")).over(
          Window.orderBy("_gidx_bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("_gidx_n")
    withB
      .join(broadcast(offsets), Seq("_gidx_bucket"))
      .withColumn("global_idx",
        col("_gidx_off") + row_number().over(
          Window.partitionBy("_gidx_bucket").orderBy(key)).cast("long"))
      .drop("_gidx_bucket", "_gidx_off")
  }
}
