package graft.operators

import graft.SparkSuite

/** Structural invariants of the fixed-iteration power method (value-level
  * verification is g01's unrolled-CTE oracle): symmetry gives equal ranks,
  * in-link concentration raises rank, and a dangling-free graph conserves
  * probability mass. */
class PageRankSpec extends SparkSuite {

  test("cycle is uniform; star concentrates; mass conserved without dangling") {
    import spark.implicits._
    val nodes = (0L to 3L).toDF("id")

    // 4-cycle: perfectly symmetric → every node exactly 1/4
    val cyc = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val pr = PageRank.run(nodes, cyc, 0.85, 20).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((_, v) <- pr) assert(math.abs(v - 0.25) < 1e-12, s"cycle not uniform: $pr")

    // star into 0 (plus 0→1 so nothing dangles): 0 outranks the leaves,
    // the two symmetric leaves tie, and Σpr = 1 (mass conserved)
    val star = Seq((1L, 0L), (2L, 0L), (3L, 0L), (0L, 1L)).toDF("src", "dst")
    val pr2 = PageRank.run(nodes, star, 0.85, 30).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr2(0L) > pr2(2L), s"hub must outrank leaf: $pr2")
    assert(pr2(1L) > pr2(2L), s"hub's target must outrank plain leaf: $pr2")
    assert(math.abs(pr2(2L) - pr2(3L)) < 1e-12, s"symmetric leaves must tie: $pr2")
    assert(math.abs(pr2.values.sum - 1.0) < 1e-9, s"mass leaked: $pr2")

    // dangling node (3 has no out-edges) leaks mass, documented behavior
    val dang = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val pr3 = PageRank.run(nodes, dang, 0.85, 10).collect().map(_.getDouble(1)).sum
    assert(pr3 < 1.0 - 1e-6, "dangling graph should NOT conserve mass (pseudo-rank)")
  }
}
