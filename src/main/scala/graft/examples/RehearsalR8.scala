package graft.examples

import graft.Sessions
import graft.operators.{Layout, PageRank, Sampling}
import graft.functions.Text

import org.apache.spark.sql.functions._

/** Round-8 scale rehearsal (not library surface) for the round's new
  * operators, in the RehearsalR4/R5/R7 pattern: planted structure so the
  * expected outcome is ARITHMETIC, verified exactly, wall-clock printed
  * for the survey log.
  *
  * 1. Z-order layout at 10M rows over a 4096×4096 key grid into 256
  *    partitions: all but the ≤15 Morton-boundary-crossing partitions
  *    (15 interior 1024×1024-superblock boundaries; see the Layout
  *    scaladoc for why crossers span wide — a property of every z-order
  *    layout) must stay inside one superblock, i.e. extent ≤ 1023 in
  *    BOTH dimensions — where a single-column sort leaves the other
  *    dimension spanning the full 4095 in EVERY partition.
  *
  * 2. PageRank on a 3M-edge synthetic graph (1M nodes, 3 affine out-links
  *    each — the g01 shape at 2000×): mass conservation to 1e-6 (no
  *    dangling nodes by construction) and a finite, positive rank for
  *    every node.
  *
  * 3. Wordpiece segmentation throughput over 500k synthetic docs (~60
  *    chars each): n_pieces + n_fallback must equal the exact per-doc
  *    arithmetic of the planted text ("the" + "qx"·k → 1 piece + 2k
  *    fallbacks per word by the vocab's construction).
  */
object RehearsalR8 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"REHEARSE $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    import spark.implicits._

    // --- 1. z-order layout, 10M × (4096 × 4096) ------------------------
    val n = 10000000L
    val grid = spark.range(n).select(
      pmod(col("id") * 2654435761L, lit(4096L)).as("x"),
      pmod(col("id") * 40503L + 7L, lit(4096L)).as("y"))
    val extents = time("zorder 10M rows → 256 partitions") {
      Layout.zorder(grid, col("x"), col("y"), 256)
        .withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x")).as("xe"), (max("y") - min("y")).as("ye"),
          count(lit(1)).as("cnt"))
        .collect()
    }
    assert(extents.map(_.getAs[Long]("cnt")).sum == n, "zorder dropped rows")
    val tight = extents.count(r =>
      r.getAs[Long]("xe") <= 1023 && r.getAs[Long]("ye") <= 1023)
    assert(tight >= 236,
      s"expected ≥236/256 partitions inside one 1024×1024 superblock, got $tight")
    println(s"REHEARSE zorder $tight/256 partitions ≤1023 in BOTH dims " +
      "(x-sort baseline: 0/256 — every partition spans y=4095)")

    // --- 2. PageRank, 1M nodes × 3M edges ------------------------------
    val nodes = spark.range(1000000L).select(col("id"))
    def edgeSet(a: Long, b: Long) = nodes.select(col("id").as("src"),
      pmod(col("id") * a + b, lit(1000000L)).as("dst"))
    val edges = edgeSet(7, 1).unionAll(edgeSet(13, 5)).unionAll(edgeSet(31, 11))
    val pr = time("pagerank 1M nodes × 3M edges × 10 iters") {
      PageRank.run(nodes, edges, 0.85, 10)
    }
    val agg = pr.agg(sum("pr").as("mass"), min("pr").as("lo"), count(lit(1)).as("n"))
      .collect()(0)
    assert(agg.getLong(2) == 1000000L, "pagerank lost nodes")
    assert(math.abs(agg.getDouble(0) - 1.0) < 1e-6,
      s"mass not conserved: ${agg.getDouble(0)} (graph has no dangling nodes)")
    assert(agg.getDouble(1) > 0.0, "non-positive rank")
    println(f"REHEARSE pagerank mass=${agg.getDouble(0)}%.9f min=${agg.getDouble(1)}%.3e (exact invariants)")

    // --- 3. wordpiece, 500k docs ---------------------------------------
    // Planted text: per doc, 5 words of "the" + "qx"·(doc_id mod 4 + 1).
    // Greedy walk: "the" is a piece; no piece starts with 'q' or 'x', and
    // "eq"/"ex" are not pieces, so every q and x falls back → per word
    // exactly 1 piece + 2·k fallbacks; per doc 5 of each.
    val docs = spark.range(500000L).select(col("id"),
      concat_ws(" ", (1 to 5).map(_ =>
        concat(lit("the"), repeat(lit("qx"), (pmod(col("id"), lit(4L)) + 1).cast("int")))): _*)
        .as("text"))
    val counted = time("wordpiece 500k docs × 5 words") {
      docs.select(col("id"),
          Text.wordpieceStats(Text.tokens(col("text"))).as("st"))
        .select(col("id"), element_at(col("st"), 1).as("p"), element_at(col("st"), 2).as("f"))
        .filter(col("p") =!= 5L || col("f") =!= (pmod(col("id"), lit(4L)) + 1) * 10L)
        .count()
    }
    assert(counted == 0L, s"wordpiece arithmetic mismatch on $counted docs")
    println("REHEARSE wordpiece per-doc counts exact on 500k docs")

    spark.stop()
  }
}
