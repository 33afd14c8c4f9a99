package graft.operators

import graft.functions.Text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic document chunking for training-data preparation: split
  * each document into overlapping fixed-size token windows (the standard
  * "context window packing" precursor — long documents become multiple
  * training sequences, short ones a single chunk).
  *
  * Chunk layout for a document of `n` tokens, window `W`, stride `S ≤ W`:
  * chunk `i` covers tokens `[i·S, i·S + W)` (0-based), for
  * `i ∈ [0, 1 + ceil((n − W)/S))` clamped so a document always yields at
  * least one chunk and the last chunk keeps `((n − W − 1) mod S) + 1 … W`
  * tokens. Consecutive chunks overlap by `W − S` tokens so no token-level
  * context is lost at boundaries.
  *
  * Scale shape: per-row compute + one `explode` — no shuffle, no state; the
  * output is `Σ chunks` rows, linear in corpus token count. Chunk identity
  * is `(doc_id, chunk_no)`, a pure function of the input, so re-runs are
  * idempotent on any cluster layout.
  */
object Chunking {

  /** Overlapping token-window chunks of `textCol`. Output:
    * `(doc_id, chunk_no, n_tokens, chunk_md5)` — the md5 is over the
    * space-rejoined token window, pinning the exact chunk content. */
  def tokenChunks(df: DataFrame, idCol: String, textCol: String,
                  window: Int = 64, stride: Int = 48): DataFrame = {
    require(window > 0, s"window must be positive, got $window")
    require(stride > 0 && stride <= window,
      s"stride must be in [1, window=$window], got $stride")
    val base = df.select(col(idCol).as("doc_id"), Text.tokens(col(textCol)).as("w"))
      .withColumn("n", size(col("w")).cast("long"))
      .filter(col("n") > 0) // empty docs yield no chunks
    // chunks past the first: ceil(max(n − W, 0)/S) — the inner clamp keeps
    // the division non-negative (engines disagree on negative integer
    // division: floor vs truncate), so the oracle can mirror it verbatim.
    // DIV (integral division), not floor(a / b): Spark's `/` on longs is
    // DOUBLE division, exact only while the dividend stays below 2^53 —
    // fine for token counts, but DIV is exact for ALL long inputs.
    base
      .withColumn("_ceil_num",
        greatest(col("n") - lit(window), lit(0L)) + lit(stride - 1L))
      .withColumn("chunk_no", explode(sequence(lit(0L), expr(s"_ceil_num DIV $stride"))))
      .drop("_ceil_num")
      .select(col("doc_id"), col("chunk_no"),
        least(lit(window.toLong), col("n") - col("chunk_no") * stride).as("n_tokens"),
        md5(array_join(
          slice(col("w"), (col("chunk_no") * stride + 1).cast("int"), lit(window)), " "))
          .as("chunk_md5"))
  }
}
