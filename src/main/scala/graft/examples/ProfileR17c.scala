package graft.examples

import org.apache.spark.sql.functions._

/** r17: connected-components loop cost on the oracle-scale edge sets —
  * how many rounds, and what does each round's fixed cost (checkpoint
  * jobs + convergence count) amount to relative to the data? */
object ProfileR17c {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val d = docs.select(col("doc_id"), col("source"),
      substring(col("text"), 1, 24).as("head"))
    val a = d.select(col("doc_id").as("a_id"), col("source"),
      col("head").as("a_head"))
    val b = d.select(col("doc_id").as("b_id"), col("source"),
      col("head").as("b_head"))
    val pairs = a.join(b, "source").filter(col("a_id") < col("b_id"))
      .filter(levenshtein(col("a_head"), col("b_head"), 10) =!= -1)
      .select("a_id", "b_id").localCheckpoint()
    println("EDGES = " + pairs.count())
    // warm
    graft.operators.Dedup.connectedComponents(pairs)
      .write.format("noop").mode("overwrite").save()
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val (cc, rounds) =
        graft.operators.Dedup.connectedComponentsWithRounds(pairs)
      cc.write.format("noop").mode("overwrite").save()
      println(f"CC pass $i rounds=$rounds time=${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    spark.stop()
  }
}
