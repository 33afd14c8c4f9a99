package graft.examples

import graft.{Sessions, SparkEntry}

/** One-off round-4 plan audit for the new operators (not library surface). */
object PlanAuditR4 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dir = "/root/testdata/sf0.01"
    val names =
      if (args.filterNot(_ == "-v").nonEmpty) args.filterNot(_ == "-v").toSeq
      else Seq("t07_repetition", "d13_decontaminate", "d14_kmeans_assign",
        "d15_semdedup", "p02_pack_sequences", "d16_dedup_incremental", "d03_minhash_pairs")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val p = df.queryExecution.executedPlan.toString
      def count(s: String) = s.r.findAllIn(p).length
      println(s"== $n  shuffles=${count("Exchange hashpartitioning") + count("Exchange rangepartitioning")} " +
        s"broadcasts=${count("BroadcastExchange")} reused=${count("ReusedExchange")}")
      if (args.contains("-v")) println(df.queryExecution.executedPlan.treeString.take(6000))
    }
    spark.stop()
  }
}
