package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution end to end: blocked fuzzy matching → connected
  * components → survivorship.
  *
  * Edges form only WITHIN a block (the per-block pair join is what bounds
  * the quadratic: an unblocked corpus would use the d02 prefix index as
  * the candidate generator with the edit distance as verifier); each
  * unordered pair evaluates the Levenshtein DP once, in threshold form —
  * the DP abandons past `maxDist` (O(len·k) cells), and the predicate
  * never needs the exact distance. Components come from
  * [[Dedup.connectedComponents]] (min-label + pointer doubling, O(log
  * diameter) rounds); survivorship is the classic min-id keeper. The
  * output is a TOTAL mapping — singletons included via the left join —
  * which is what a downstream "replace each record with its canonical
  * form" step actually consumes.
  */
object Entity {

  /** Map every record to its duplicate-cluster: returns `(idCol,
    * cluster_id, is_canonical, n_members)`, one row per input record,
    * `cluster_id` = the component's minimum id. `keyCol` is the match key
    * (e.g. a normalized name or a text head window); records match when
    * their keys' edit distance is ≤ `maxDist` AND they share `blockCol`. */
  def canonicalize(df: DataFrame, idCol: String, blockCol: Column,
                   keyCol: Column, maxDist: Int): DataFrame = {
    val base = df.select(col(idCol), blockCol.as("_blk"), keyCol.as("_key"))
    val a = base.select(col(idCol).as("a_id"), col("_blk"), col("_key").as("a_key"))
    val b = base.select(col(idCol).as("b_id"), col("_blk"), col("_key").as("b_key"))
    val pairs = a.join(b, "_blk").filter(col("a_id") < col("b_id"))
      .filter(levenshtein(col("a_key"), col("b_key"), maxDist) =!= -1)
      .select("a_id", "b_id")
    val cc = Dedup.connectedComponents(pairs)
    df.select(col(idCol))
      .join(cc.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("component_id"), col(idCol)).as("cluster_id"))
      .withColumn("is_canonical", col(idCol) === col("cluster_id"))
      .withColumn("n_members", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("cluster_id")))
  }
}
