package graft.examples

import org.apache.spark.sql.functions._

/** r17 plan evidence for the pre-checkpoint pair-DP subtrees of e01/t17
  * (the final query plans read the checkpointed blocks, so the DP stage
  * is invisible there — this prints the subtree that actually executes
  * at checkpoint time, with and without the r17 `spread`). */
object PlanAuditR17 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val d = docs.select(col("doc_id"), col("source"),
      substring(col("text"), 1, 24).as("head"))
    def pairsOf(a0: org.apache.spark.sql.DataFrame) = {
      val a = a0.select(col("doc_id").as("a_id"), col("source"),
        col("head").as("a_head"))
      val b = d.select(col("doc_id").as("b_id"), col("source"),
        col("head").as("b_head"))
      a.join(b, "source").filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          levenshtein(col("a_head"), col("b_head")).cast("long").as("dist"))
    }
    println("========== t17/e01 pair-DP subtree WITHOUT spread (before) ==========")
    pairsOf(d).explain("formatted")
    println("========== t17/e01 pair-DP subtree WITH spread (after) ==========")
    pairsOf(graft.operators.Materialize.spread(d, col("doc_id")))
      .explain("formatted")
    spark.stop()
  }
}
