package graft.queries

import graft.{SparkEntry, SparkSuite}

/** Smoke every declared query at sf0.001 (value-level correctness is the
  * DuckDB oracle differential — scripts/check.py / the driver gate; this
  * guards plan validity and column contracts). */
class QueriesSpec extends SparkSuite {

  test("every query has oracle SQL or a documented rows-only reason") {
    val noOracle = SparkEntry.all.collect { case (k, QueryDef(_, None)) => k }.toSet
    // approximate / engine-specific-hash operators only (round 5 converted
    // d07/d10 to planted exact-top-k oracles and m02 to a real PNG codec
    // round-trip with an arithmetic oracle)
    assert(noOracle == Set("q28_approx_distinct", "d04_simhash", "d05_simhash_pairs",
      "q43_percentile_approx"))
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001 and returns rows") {
      val df = fn(spark, sf("sf0.001"))
      val n = df.count()
      // anti-join style queries may legitimately return few rows, but the
      // fixtures are built so every declared query is non-vacuous
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry flagship returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("column names match between spark output and oracle SQL aliases") {
    // the driver's compare sorts columns by name — a drift here breaks the
    // hash even with identical values, so enforce it statically
    for ((name, QueryDef(fn, Some(sql))) <- SparkEntry.all.toSeq.sortBy(_._1)) {
      val sparkCols = fn(spark, sf("sf0.001")).columns.toSet
      for (c <- sparkCols) {
        assert(sql.toLowerCase.contains(c.toLowerCase),
          s"$name: spark column '$c' not mentioned in oracle SQL")
      }
    }
  }
}
