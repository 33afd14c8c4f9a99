package graft.examples

import graft.{Sessions, SparkEntry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-3 profiling scratchpad: per-query warm timings at sf0.1 for the
  * bench tail, plus plan dumps for the suspects (q35 from_json arity,
  * t02 stopword scans). Not part of the library surface.
  */
object ProfileR3 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"PROF $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }

  def runNoop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    val dir = "/root/testdata/sf0.1"
    val targets = if (args.nonEmpty) args.toSeq
      else Seq("t02_langid", "t01_text_stats", "q35_json_map_ops",
        "p01_corpus_curation", "d02_jaccard_pairs", "d11_dedup_clusters",
        "q34_range_frame", "t03_token_count")
    // warm (IO + codegen)
    targets.foreach { n =>
      time(s"cold:$n")(runNoop(SparkEntry.queries(n)(spark, dir)))
    }
    targets.foreach { n =>
      time(s"warm:$n")(runNoop(SparkEntry.queries(n)(spark, dir)))
    }
    // q35 plan: does from_json appear once or 4x in the projection?
    val q35 = SparkEntry.queries("q35_json_map_ops")(spark, dir)
    val plan = q35.queryExecution.optimizedPlan.toString
    println("Q35 from_json occurrences in optimized plan: " +
      "from_json".r.findAllIn(plan).length)
    println(q35.queryExecution.optimizedPlan.treeString.take(3000))
    spark.stop()
  }
}
