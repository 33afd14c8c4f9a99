package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Explicit skew mitigation: salted equi-join.
  *
  * A hot join key pins all its rows into one reducer of a shuffled join.
  * Salting spreads them: the fact side gets a deterministic pseudo-random
  * salt in `[0, salts)`, the (smaller) other side is replicated once per
  * salt value, and the join key becomes `(key, salt)` — same result set,
  * hot key spread over `salts` tasks.
  *
  * When to reach for this instead of AQE's skew-join splitting (on by
  * default in [[graft.Sessions]]): AQE splits skewed SORT-MERGE partitions
  * adaptively, but can't help when the skewed operator is a streaming
  * join (no runtime re-plan), or when a downstream groupBy on the same key
  * re-concentrates the rows. The salt column composes with the follow-up
  * aggregation (partial agg per salt, final agg across salts).
  *
  * Decision rule, both sides test-pinned: a plain batch SMJ with a hot key
  * needs NOTHING from this file — PlanShapeSpec's AQE case plants 95%-hot
  * skew and asserts Spark's own OptimizeSkewedJoin marks the join
  * `skew=true`; reach for [[saltedJoin]]/[[saltedSum]] only in the AQE
  * blind spots above (q45 proves the salted path broadcast-disabled).
  */
object Skew {

  /** Inner equi-join of `fact` (large, possibly skewed on `key`) with
    * `other` (replicated ×`salts` — keep it the smaller side). Result is
    * identical to `fact.join(other, key)`; only the shuffle layout changes.
    * The salt is a hash of the whole fact row: deterministic, and rows
    * identical across all columns still collide — real skew rows differ
    * somewhere, and correctness never depends on the spread. */
  def saltedJoin(fact: DataFrame, other: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!fact.columns.contains("_salt") && !other.columns.contains("_salt"),
      "inputs must not already contain the reserved _salt column")
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(fact.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int"))
    val replicated = other.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-level (salted) aggregation for a skewed group key: partial
    * aggregate on `(keys, salt)`, then final aggregate on `keys`. Use for
    * aggregates that re-aggregate associatively (sum/count/min/max).
    * Catalyst's map-side partial aggregation already handles most skew;
    * this forces an extra reduce level for keys so hot that even one
    * reducer's final-merge input is too large. */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: String, salts: Int,
                resultName: String = "sum"): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!df.columns.contains("_salt") && !keys.contains("_salt"),
      "input must not already contain the reserved _salt column")
    val salted = df.withColumn("_salt",
      pmod(xxhash64(df.columns.map(col).toIndexedSeq: _*), lit(salts)))
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(sum(col(valueCol)).as("_partial"))
    partial.groupBy(keys.map(col): _*).agg(sum(col("_partial")).as(resultName))
  }
}
