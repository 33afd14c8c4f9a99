package graft.queries

import graft.{SparkEntry, SparkSuite}

/** Plan-shape guards: the scale claims the survey makes about the
  * pipeline queries, asserted on the physical plan so a refactor that
  * silently adds an exchange (or drops a broadcast) fails a test instead
  * of surfacing as a 100-TB regression. Counts use the pre-adaptive plan —
  * AQE only ever removes/coalesces exchanges at runtime, never adds. */
class PlanShapeSpec extends SparkSuite {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf("sf0.001")).queryExecution.executedPlan.toString

  private def shuffles(p: String): Int =
    "Exchange (hash|range)partitioning".r.findAllIn(p).length

  test("per-row pipeline queries carry ONLY the final ordering exchange") {
    val perRow = Seq("t01_text_stats", "t02_langid", "t03_token_count",
      "t04_fingerprint", "t07_repetition", "t08_chunk_tokens",
      "t09_quality_model", "p03_resample_mixture", "m01_binary_stats",
      "d04_simhash")
    for (q <- perRow) {
      val n = shuffles(plan(q))
      assert(n <= 1, s"$q: expected at most the final sort exchange, found $n")
    }
    // one-shuffle group-by dedups: the keyed aggregation + the final sort
    for (q <- Seq("d01_dedup_exact", "d12_dedup_normalized")) {
      val n = shuffles(plan(q))
      assert(n <= 2, s"$q: expected agg + sort exchanges only, found $n")
    }
  }

  test("decontamination streams the corpus through a broadcast join, unshuffled") {
    val p = plan("d13_decontaminate")
    assert(p.contains("BroadcastExchange"), "eval-set side must broadcast")
    // post-join shuffles only: the two countDistincts plan a two-phase
    // distinct aggregate (2 exchanges over the RARE contamination hits)
    // plus the final ordering — the corpus itself reaches the join unmoved
    assert(shuffles(p) <= 3, s"corpus must not shuffle before the join:\n$p")
  }

  test("kmeans assignment is an unshuffled scan (centroids are literals)") {
    val p = plan("d14_kmeans_assign")
    assert(shuffles(p) <= 1, s"assignment must not shuffle (sort only):\n$p")
    assert(!p.contains("BroadcastExchange"), "centroid literals need no join at all")
  }

  test("brute-force ANN broadcasts the query side, never shuffles the corpus") {
    val p = plan("d06_knn_bruteforce")
    assert(p.contains("BroadcastExchange"), "query vectors must broadcast")
  }

  test("semantic decontamination broadcasts the eval side, corpus unshuffled") {
    val p = plan("d18_decontaminate_semantic")
    assert(p.contains("BroadcastExchange"), "eval vectors must broadcast")
    // hits-only aggregation (+ distinct phase) and the final sort
    assert(shuffles(p) <= 3, s"corpus must reach the join unmoved:\n$p")
  }
}
