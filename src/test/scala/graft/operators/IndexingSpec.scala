package graft.operators

import graft.SparkSuite

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** globalIndex must equal the single-partition global window it replaces,
  * on every bucket-count and key-distribution edge. */
class IndexingSpec extends SparkSuite {

  private def reference(keys: Seq[Long]) =
    keys.sorted.zipWithIndex.map { case (k, i) => k -> (i + 1L) }.toMap

  test("matches row_number() OVER (ORDER BY key) on sparse non-contiguous keys") {
    import spark.implicits._
    // clustered + sparse: a dense run, a lone far outlier, negatives
    val keys = (0L until 500L).map(_ * 3L) ++ Seq(1000000L, -50L, -49L, 7L + 1500L)
    val df = keys.toDF("k").repartition(7)
    for (buckets <- Seq(1, 4, 64, 5000)) {
      val got = Indexing.globalIndex(df, col("k"), buckets)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == reference(keys), s"buckets=$buckets")
    }
  }

  test("agrees with the global window on real data and keeps other columns") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .select(col("doc_id"), col("source"))
    val got = Indexing.globalIndex(docs, col("doc_id"), buckets = 32)
    val expected = docs.withColumn("global_idx",
      row_number().over(Window.orderBy("doc_id")).cast("long"))
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    assert(got.columns.toSeq == Seq("doc_id", "source", "global_idx"))
  }

  test("keys spanning the full Long range (hash-valued keys) stay exact") {
    import spark.implicits._
    // xxhash64-shaped keys: extremes plus a spread across the whole range —
    // `hi - lo` here overflows 64-bit subtraction and breaks double math
    val keys = Seq(Long.MinValue, Long.MinValue + 1, -1L, 0L, 1L,
      Long.MaxValue - 1, Long.MaxValue) ++
      (1L to 200L).map(i => i * 92233720368547758L - 4611686018427387904L)
    val df = keys.toDF("k").repartition(5)
    val got = Indexing.globalIndex(df, col("k"), buckets = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == reference(keys))
  }

  test("null keys keep their rows and number first (NULLS FIRST parity)") {
    import spark.implicits._
    val df = Seq(Some(10L), None, Some(20L), None, Some(-5L)).toDF("k")
    val got = Indexing.globalIndex(df, col("k"), buckets = 4)
      .collect().map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0))) -> r.getLong(1))
    // two null rows take indexes {1,2}; non-nulls follow in key order
    assert(got.filter(_._1.isEmpty).map(_._2).sorted.toSeq == Seq(1L, 2L))
    assert(got.filter(_._1.isDefined).toMap ==
      Map(Some(-5L) -> 3L, Some(10L) -> 4L, Some(20L) -> 5L))
    // degenerate all-null input still numbers 1..N
    val allNull = Seq[Option[Long]](None, None, None).toDF("k")
    assert(Indexing.globalIndex(allNull, col("k")).select("global_idx")
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("empty input and reserved-column guard") {
    import spark.implicits._
    val empty = Seq.empty[Long].toDF("k")
    assert(Indexing.globalIndex(empty, col("k")).count() == 0)
    val clash = Seq(1L).toDF("global_idx")
    intercept[IllegalArgumentException] {
      Indexing.globalIndex(clash, col("global_idx"))
    }
  }
}
