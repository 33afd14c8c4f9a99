package graft.operators

import graft.functions.{HashFunctions, Text}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing: assign documents to fixed token-budget
  * training sequences ("bins") — the step between a curated corpus and a
  * context-window-shaped training set.
  *
  * Packing rule (contiguous fill): within a bucket, docs are taken in id
  * order and a doc starts the bin its exclusive cumulative token count
  * falls into (`bin = floor(cum_before / capacity)`). A doc may overflow
  * its bin boundary (training pipelines truncate or span-split at read
  * time), so a bin holds ≤ capacity + max_doc_tokens tokens; the rule is a
  * pure function of (bucket, id order, token counts) — reproducible on any
  * cluster layout and in plain SQL, unlike first-fit-decreasing, which is
  * inherently sequential and order-chaotic.
  *
  * Scale shape: a GLOBAL packing order would be one sequential cumsum — a
  * single-partition window, the classic scale-killer. Instead docs are
  * sharded into `buckets` independent streams by the SQL-reproducible
  * rolling hash of their id ([[Sampling]]'s portability argument), and
  * each bucket packs independently: parallelism = `buckets`, choose it
  * ~ O(cluster cores). Bin ids are (bucket, bin) pairs — stable across
  * runs, layouts, and engines.
  */
object Packing {

  /** Per-doc packing assignment `(doc_id, bucket, bin, n_tokens)` for an
    * ARBITRARY per-row size expression — whitespace tokens, exact subword
    * counts ([[graft.functions.Text.wordpieceStats]]), byte budgets:
    * the packing algebra is the same, only the size column changes. */
  def packBy(df: DataFrame, idCol: String, sizeExpr: Column,
             capacity: Long, buckets: Int): DataFrame = {
    require(capacity > 0 && buckets > 0, "capacity and buckets must be positive")
    val base = df.select(
      col(idCol).cast("long").as("doc_id"),
      sizeExpr.cast("long").as("n_tokens"),
      pmod(HashFunctions.rolling_hash(col(idCol).cast("string")), lit(buckets.toLong))
        .as("bucket"))
    val w = Window.partitionBy("bucket").orderBy("doc_id")
    base
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("bin", floor(col("cum_before") / lit(capacity)).cast("long"))
      .select("doc_id", "bucket", "bin", "n_tokens")
  }

  /** Per-doc packing assignment: `(doc_id, bucket, bin, n_tokens)` sized
    * by whitespace token count. */
  def pack(df: DataFrame, idCol: String, textCol: String,
           capacity: Long, buckets: Int): DataFrame =
    packBy(df, idCol, size(Text.tokens(col(textCol))), capacity, buckets)

  /** Bin-level summary: `(bucket, bin, n_docs, sum_tokens)` — the shape a
    * packing audit wants (fill factor, straggler bins). */
  def packedBins(df: DataFrame, idCol: String, textCol: String,
                 capacity: Long, buckets: Int): DataFrame =
    binSummary(pack(df, idCol, textCol, capacity, buckets))

  /** [[packedBins]] over a [[packBy]] result. */
  def binSummary(packed: DataFrame): DataFrame =
    packed.groupBy("bucket", "bin")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("sum_tokens"))
}
