package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-17 piece-wise profiling: where do the slowest bench entries
  * actually spend their wall time? Times each named sub-stage with the
  * bench's own methodology (noop sink, warm session) so the optimization
  * targets the dominant piece instead of the query name. */
object ProfileR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = graft.Sessions.local()
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFILE $label%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def drain(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    // ---- e01 pieces ----------------------------------------------------
    {
      val d = docs.select(col("doc_id"), col("source"),
        substring(col("text"), 1, 24).as("head"))
      val a = d.select(col("doc_id").as("a_id"), col("source"),
        col("head").as("a_head"))
      val b = d.select(col("doc_id").as("b_id"), col("source"),
        col("head").as("b_head"))
      val pairs = a.join(b, "source").filter(col("a_id") < col("b_id"))
        .filter(levenshtein(col("a_head"), col("b_head"), 10) =!= -1)
        .select("a_id", "b_id")
      time("e01 warm pairs")(drain(pairs))
      time("e01 pairs only")(drain(pairs))
      val cc = time("e01 cc build")(
        graft.operators.Dedup.connectedComponents(pairs))
      time("e01 cc drain")(drain(cc))
      time("e01 full query")(drain(
        graft.SparkEntry.queries("e01_entity_canonical")(spark, sfDir)))
    }

    // ---- t17 pieces ----------------------------------------------------
    {
      val d = docs.select(col("doc_id"), col("source"),
        substring(col("text"), 1, 24).as("head"))
      val a = d.select(col("doc_id").as("a_id"), col("source"),
        col("head").as("a_head"))
      val b = d.select(col("doc_id").as("b_id"), col("source"),
        col("head").as("b_head"))
      val half = a.join(b, "source").filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          levenshtein(col("a_head"), col("b_head")).cast("long").as("dist"))
      time("t17 half (DP) only")(drain(half))
      time("t17 full query")(drain(
        graft.SparkEntry.queries("t17_fuzzy_match")(spark, sfDir)))
    }

    // ---- q49 pieces ----------------------------------------------------
    {
      val ev = spark.read.parquet(s"$sfDir/events.parquet")
        .select($"user_id", $"ts",
          floor($"value" * 100 + 0.5).cast("long").as("vc"))
      time("q49 gapfill full")(drain(
        graft.SparkEntry.queries("q49_gapfill")(spark, sfDir)))
      val gf = graft.operators.Timeseries.gapFillHourly(
        ev, $"user_id", $"ts", $"vc")
      time("q49 gapfill no orderBy")(drain(gf))
    }

    // ---- d02 / d22 / e02 / e04 / p13 / l35 / l47 full, for reference ---
    for (n <- Seq("d02_jaccard_pairs", "d22_dup_passages", "d23_passage_scrub",
        "e02_entity_canonical_indexed", "e04_entity_canonical_incremental",
        "d11_dedup_clusters", "p13_corpus_diff", "l35_lake_changes_feed",
        "l47_lake_rollback", "l48_lake_cdf_stream",
        "p14_incremental_curation")) {
      time(s"$n full")(drain(graft.SparkEntry.queries(n)(spark, sfDir)))
    }
    spark.stop()
  }
}
