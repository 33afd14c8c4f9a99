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
