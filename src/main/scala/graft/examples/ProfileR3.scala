package graft.examples

import graft.{Sessions, SparkEntry}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Profiling harness: cold + warm per-query timings at sf0.1 for any named
  * queries (defaults to the current bench tail), plus a plan dump for the
  * from_json arity check. Cold−warm separates one-time costs (IO, codegen)
  * from engine steady state. Not part of the library surface.
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
      else Seq("d02_jaccard_pairs", "d11_dedup_clusters", "p01_corpus_curation",
        "d03_minhash_pairs", "q42_percentile_exact", "t05_tfidf",
        "t06_redact_pii", "q46_latest_by_key")
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
