package graft.examples

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r17 CC-loop diagnosis: per-round changed counts under variant hop
  * schemes, on the e01 edge set. */
object ProfileR17d {
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
    println("EDGES=" + pairs.count())

    def run(tag: String, squarings: Int): Unit = {
      val t0 = System.nanoTime()
      val p = pairs
      val edges = p.select(col("a_id").as("u"), col("b_id").as("v"))
        .union(p.select(col("b_id").as("u"), col("a_id").as("v")))
        .distinct().localCheckpoint()
      var labels = edges.groupBy(col("u").as("node"))
        .agg(least(min(col("v")), first(col("u"))).as("label"))
        .localCheckpoint()
      var changed = 1L
      var i = 0
      while (changed > 0 && i < 30) {
        val neighborMin = edges
          .join(labels.select(col("node").as("v"), col("label").as("vlabel")), "v")
          .groupBy(col("u").as("node")).agg(min(col("vlabel")).as("nmin"))
        val half = labels.join(neighborMin, Seq("node"), "left_outer")
          .select(col("node"),
            least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
            col("label").as("prev"))
          .localCheckpoint()
        def hop(t: DataFrame, lookup: DataFrame, tag2: String): DataFrame =
          t.as("h")
            .join(lookup.select(col("node").as(s"pn$tag2"),
                col("label").as(s"pl$tag2")),
              col("h.label") === col(s"pn$tag2"), "left_outer")
            .select(col("h.node").as("node"),
              least(col("h.label"),
                coalesce(col(s"pl$tag2"), col("h.label"))).as("label"),
              col("h.prev").as("prev"))
        var t: DataFrame = half
        for (s <- 1 to squarings) t = hop(t, t, s.toString)
        val next = t.localCheckpoint()
        changed = next.filter(col("label") =!= col("prev")).count()
        println(s"  [$tag] round ${i + 1} changed=$changed")
        labels = next.select("node", "label")
        i += 1
      }
      println(f"CCVAR $tag rounds=$i time=${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    run("warm", 1)
    run("sq1", 1)
    run("sq2", 2)
    run("sq3", 3)
    spark.stop()
  }
}
