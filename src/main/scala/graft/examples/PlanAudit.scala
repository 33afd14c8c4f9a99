package graft.examples

/** Prints formatted physical plans of selected queries for scale audits
  * (shuffle count, broadcast choices, pushed filters, codegen spans). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "d02_jaccard_pairs", "d08_embedding_neardup", "d09_embedding_neardup_lsh",
      "d10_knn_ivf", "q34_range_frame", "q35_json_map_ops")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
