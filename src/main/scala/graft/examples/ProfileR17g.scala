package graft.examples

import org.apache.spark.sql.functions._

/** r17 same-process A/B: every spread/CC-touched query timed with the
  * r17 mechanisms ON vs OFF (spark.graft.spread.enabled /
  * spark.graft.cc.localEdgeCap) in ONE JVM, interleaved, min-of-2 per
  * arm — immune to the host's multi-minute interference windows that
  * make cross-run wall comparisons lie. Also dumps the pre-checkpoint
  * kernel subtrees of d02/e02 under both settings (the final query
  * plans read checkpointed blocks, so the moved exchange is only
  * visible at subtree level). */
object ProfileR17g {
  def main(args: Array[String]): Unit = {
    val spark = graft.Sessions.local()
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val qs = Seq("e01_entity_canonical", "e02_entity_canonical_indexed",
      "e03_entity_canonical_segment", "e04_entity_canonical_incremental",
      "t17_fuzzy_match", "d02_jaccard_pairs", "d03_minhash_pairs",
      "d05_simhash_pairs", "d11_dedup_clusters", "d13_decontaminate",
      "d22_dup_passages", "d23_passage_scrub", "d24_source_overlap")

    def setArm(on: Boolean): Unit = {
      spark.conf.set("spark.graft.spread.enabled", on.toString)
      spark.conf.set("spark.graft.cc.localEdgeCap", if (on) "1048576" else "0")
    }
    def once(q: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(q)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both arms (codegen/classload) once
    qs.foreach { q => setArm(false); once(q); setArm(true); once(q) }
    val results = qs.map { q =>
      // interleave: off,on,off,on — min per arm
      val offs = collection.mutable.Buffer[Double]()
      val ons = collection.mutable.Buffer[Double]()
      for (_ <- 1 to 2) {
        setArm(false); offs += once(q)
        setArm(true); ons += once(q)
      }
      (q, offs.min, ons.min)
    }
    println("AB query, before(min-of-2), after(min-of-2)")
    results.foreach { case (q, b, a) =>
      println(f"AB $q%-36s $b%7.3f $a%7.3f  (${b / a}%4.2fx)")
    }
    spark.stop()
  }
}
