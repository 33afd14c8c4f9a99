package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge table — the classic link-graph
  * authority signal web-corpus curation uses to weight domains/pages
  * (seed-quality propagation, crawl prioritization, junk-farm damping).
  *
  * Power iteration, damping `d`: pr'(v) = (1−d)/N + d·Σ_{u→v} pr(u)/out(u),
  * run a FIXED number of rounds (deterministic output — a convergence
  * threshold would make the row values depend on float drift). Parallel
  * edges are honored (each edge row carries pr/outdeg; duplicates count
  * twice), matching the multigraph reading of a link table. Dangling
  * nodes (no out-edges) simply leak their mass — the "pseudo-rank"
  * formulation; redistribute upstream by adding explicit edges if the
  * graph needs it.
  *
  * 100-TB shape: the edge table is the big side and it NEVER moves after
  * the one-time outdegree join — each iteration shuffles only the
  * node-sized rank table to the edge partitioning (join on src), then one
  * aggregation by dst. O(iters) shuffles of node-sized data,
  * `localCheckpoint` per round truncating the lineage (the d11/CC loop
  * pattern — 10 rounds of joins would otherwise stack a 30-deep plan).
  * No driver state beyond the loop counter.
  */
object PageRank {

  /** @param nodes one `id` column, every vertex (isolated ones included)
    * @param edges `src`, `dst` columns; parallel edges allowed
    * @return `id`, `pr` (doubles; Σpr ≤ 1, < 1 iff dangling nodes exist) */
  def run(nodes: DataFrame, edges: DataFrame, damping: Double, iters: Int): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    val n = nodes.count()
    val outDeg = edges.groupBy("src").agg(count(lit(1)).as("outdeg"))
    // one-time: pin outdeg onto the edges; everything downstream re-joins
    // only node-sized tables
    val e = edges.join(outDeg, "src").transform(Materialize.cut)
    var pr = nodes.select(col("id"), lit(1.0 / n).as("pr")).transform(Materialize.cut)
    for (_ <- 1 to iters) {
      val inflow = e.join(pr, e("src") === pr("id"))
        .select(e("dst").as("id"), (col("pr") / col("outdeg")).as("c"))
        .groupBy("id").agg(sum("c").as("inflow"))
      pr = nodes.join(inflow, Seq("id"), "left")
        .select(col("id"),
          (lit((1 - damping) / n) + lit(damping) * coalesce(col("inflow"), lit(0.0))).as("pr"))
        .transform(Materialize.cut)
    }
    pr
  }
}
