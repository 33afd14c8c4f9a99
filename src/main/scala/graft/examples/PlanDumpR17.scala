package graft.examples

import java.io.{File, PrintWriter}

import org.apache.spark.sql.functions._

/** Writes plans/r17/<q>_{before,after}.txt for every query round 17
  * touched, from ONE binary: `before` = r17 mechanisms off
  * (spark.graft.spread.enabled=false, cc.localEdgeCap=0), `after` =
  * defaults. Queries whose moved work hides behind a localCheckpoint
  * cut get a header note pointing at the kernel-subtree section /
  * the A/B table in OPTIMIZATION_r17.md. q49's cut is unconditional,
  * so its `before` plan is reconstructed inline without the cut. */
object PlanDumpR17 {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import spark.implicits._
    new File("plans/r17").mkdirs()

    def explainStr(df: org.apache.spark.sql.DataFrame): String = {
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out, true, "UTF-8")) {
        df.explain("formatted")
      }
      out.toString("UTF-8")
    }
    def dump(path: String, note: String, body: String): Unit = {
      val w = new PrintWriter(s"plans/r17/$path", "UTF-8")
      try { w.println(note); w.println(); w.println(body) } finally w.close()
    }
    def setArm(on: Boolean): Unit = {
      spark.conf.set("spark.graft.spread.enabled", on.toString)
      spark.conf.set("spark.graft.cc.localEdgeCap", if (on) "1048576" else "0")
    }

    val cutNote = "NOTE: this query's r17 change moves work INSIDE a " +
      "localCheckpoint cut —\nthe final plan below reads the checkpointed " +
      "blocks (ExistingRDD), so the moved\nexchange is visible in the " +
      "kernel-subtree section at the END of this file\n(printed from the " +
      "same binary) and in OPTIMIZATION_r17.md's same-process A/B\ntable, " +
      "not in this top-level tree."

    val qs = Seq("e01_entity_canonical", "e02_entity_canonical_indexed",
      "e03_entity_canonical_segment", "e04_entity_canonical_incremental",
      "t17_fuzzy_match", "d03_minhash_pairs", "d05_simhash_pairs",
      "d11_dedup_clusters", "d22_dup_passages", "d23_passage_scrub",
      "d24_source_overlap")
    qs.foreach { q =>
      setArm(false)
      val before = explainStr(graft.SparkEntry.queries(q)(spark, dir))
      setArm(true)
      val after = explainStr(graft.SparkEntry.queries(q)(spark, dir))
      dump(s"${q}_before.txt",
        s"r17 BEFORE plan (spread disabled, cc fast path disabled)\n$cutNote",
        before)
      dump(s"${q}_after.txt",
        s"r17 AFTER plan (defaults)\n$cutNote", after)
      println(s"dumped $q")
    }

    // q49: before = no cut ahead of the global sort (reconstructed)
    {
      val ev = spark.read.parquet(s"$dir/events.parquet")
        .select($"user_id", $"ts",
          floor($"value" * 100 + 0.5).cast("long").as("vc"))
      val gf = graft.operators.Timeseries.gapFillHourly(
          ev, $"user_id", $"ts", $"vc")
        .select($"key".as("user_id"), $"bucket_ts", $"value".as("v_cents"))
      dump("q49_gapfill_before.txt",
        "r17 BEFORE plan: global sort directly over the grid+fill segment —\n" +
          "RangePartitioning bounds-sampling re-executes everything under " +
          "the Sort's Exchange.",
        explainStr(gf.orderBy("user_id", "bucket_ts")))
      dump("q49_gapfill_after.txt",
        "r17 AFTER plan: the segment materializes once (localCheckpoint); " +
          "the sort\n(and its bounds sampling) reads the blocks.",
        explainStr(graft.SparkEntry.queries("q49_gapfill")(spark, dir)))
      println("dumped q49")
    }

    // kernel subtrees: the pair-DP (e01/t17 shape) and the minhash
    // banding (d03/d05/d16 shape), with and without spread — appended to
    // the files whose top-level plans hide them.
    setArm(true)
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def appendSubtree(file: String, title: String, body: String): Unit = {
      val w = new java.io.FileWriter(s"plans/r17/$file", true)
      try w.write(s"\n\n===== $title =====\n$body")
      finally w.close()
    }
    {
      val slim = docs.select(col("doc_id"), col("text"))
      val withSpread = explainStr(
        graft.operators.Materialize.spread(slim, col("doc_id"))
          .select(col("doc_id"),
            graft.functions.HashFunctions.minhash(
              graft.functions.Text.shinglesOfText(col("text"), 3), 128, 1L)
              .as("sig")))
      val without = explainStr(slim.select(col("doc_id"),
        graft.functions.HashFunctions.minhash(
          graft.functions.Text.shinglesOfText(col("text"), 3), 128, 1L)
          .as("sig")))
      for (f <- Seq("d03_minhash_pairs", "d05_simhash_pairs",
          "d22_dup_passages", "d24_source_overlap")) {
        appendSubtree(s"${f}_before.txt",
          "kernel subtree WITHOUT spread (executes at the cut; " +
            "one task per input split)", without)
        appendSubtree(s"${f}_after.txt",
          "kernel subtree WITH spread (Exchange hashpartitioning raises " +
            "it to session parallelism)", withSpread)
      }
      println("dumped kernel subtrees")
    }
    spark.stop()
  }
}
