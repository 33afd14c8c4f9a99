package graft.operators

import graft.functions.{HashFunctions, Text}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Apply a trained linear text classifier (fastText/logistic-regression
  * shape: hashed bag-of-tokens features · weight vector) to every document
  * — the standard "quality model" gate of a pre-training pipeline, where
  * the model is trained offline and INFERENCE is the 100-TB problem.
  *
  * Scale shape: the model is a literal weight array (model-sized state,
  * like [[Clustering]]'s centroids) compiled into the per-row expression —
  * scoring is one unshuffled corpus scan, no join, no UDF (token hashing
  * is the codegen'd RollingHash expression; the dot product is
  * `transform` + `aggregate` over the token array).
  *
  * Determinism: weights and bias are integer MILLI-units and the hash
  * fold is the SQL-reproducible rolling hash, so scores are exact longs —
  * bit-identical on any engine (the sigmoid is monotone, so thresholding
  * on the raw margin `score ≥ 0` equals thresholding the probability at
  * 0.5 without ever computing a float). */
object Scoring {

  /** Append `(n_tokens, score_milli, keep)` to `df`, where
    * `score_milli = biasMilli + Σ_tokens weightsMilli[h(token) mod |w|]`
    * (per occurrence, not per distinct token) and `keep = score ≥ 0`.
    * Input columns pass through so downstream stages (per-source quotas,
    * joins) need no re-join against the source table. */
  def linearScore(df: DataFrame, textCol: String,
                  weightsMilli: Seq[Long], biasMilli: Long): DataFrame = {
    require(weightsMilli.nonEmpty, "weight vector must be non-empty")
    Seq("_score_toks", "n_tokens", "score_milli", "keep").foreach(c =>
      require(!df.columns.contains(c), s"input already has a '$c' column"))
    val n = weightsMilli.size
    val w = typedLit(weightsMilli)
    df.withColumn("_score_toks", Text.tokens(col(textCol)))
      .withColumn("n_tokens", size(col("_score_toks")).cast("long"))
      .withColumn("score_milli",
        lit(biasMilli) + aggregate(
          transform(col("_score_toks"), t => element_at(w,
            pmod(HashFunctions.rolling_hash(t), lit(n.toLong)).cast("int") + 1)),
          lit(0L), (acc, x) => acc + x))
      .withColumn("keep", col("score_milli") >= 0L)
      .drop("_score_toks")
  }
}
