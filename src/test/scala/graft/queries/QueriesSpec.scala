package graft.queries

import graft.{SparkEntry, SparkSuite}

/** Smoke every declared query at sf0.001 (value-level correctness is the
  * DuckDB oracle differential — scripts/check.py / the driver gate; this
  * guards plan validity and column contracts). */
class QueriesSpec extends SparkSuite {

  test("every query has oracle SQL or a documented rows-only reason") {
    val noOracle = SparkEntry.all.collect { case (k, QueryDef(_, None)) => k }.toSet
    // EMPTY since round 17: the last two sketches (q28 HLL, q43 GK)
    // oracle by ERROR BOUND — exact counts plus booleans asserting the
    // sketch held its declared accuracy, hash-compared like any row
    assert(noOracle == Set.empty[String],
      s"every query must carry oracle SQL, rows-only found: $noOracle")
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

  // --- schema-drift guards -------------------------------------------------
  // Round 6: /root/testdata was regenerated mid-round and events.ts /
  // orders.o_orderdate changed parquet type (TIMESTAMP(NANOS) →
  // timestamp[us], read as TIMESTAMP_NTZ), which made two queries throw at
  // ANALYSIS time — at sf0.01/sf0.1, dirs no other test touches. These
  // guards fail loudly, by name, on the next re-type.

  test("Tables.t normalizes every time column to TimestampType at all SFs") {
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
    for (sfName <- Seq("sf0.001", "sf0.01", "sf0.1"); tbl <- Tables.names) {
      val schema = Tables.t(spark, sf(sfName), tbl).schema
      for (f <- schema.fields) {
        assert(f.dataType != TimestampNTZType,
          s"$sfName/$tbl.${f.name}: TIMESTAMP_NTZ leaked through Tables.t")
        if (Tables.timeColumns(f.name))
          assert(f.dataType == TimestampType,
            s"$sfName/$tbl.${f.name}: expected TimestampType, got ${f.dataType} " +
              "(raw-nanos LongType here means the nanosAsLong branch missed)")
      }
    }
  }

  test("table schemas are identical across sf0.001/sf0.01/sf0.1 (analysis transfers)") {
    // Query analysis depends only on the input SCHEMA, not the data — so
    // the full sf0.001 executions above, combined with schema equality
    // across the three dirs, prove every query also analyzes at the
    // driver-scale dirs (sf0.01 for Verify, sf0.1 for Bench) without
    // re-running anything there. (A naive per-query analyze loop at those
    // SFs is NOT cheap: ten of the query builders run real jobs — centroid
    // collects, CC iteration, bucketed writes — during construction.)
    for (tbl <- Tables.names) {
      val base = Tables.t(spark, sf("sf0.001"), tbl).schema
      for (other <- Seq("sf0.01", "sf0.1")) {
        val s = Tables.t(spark, sf(other), tbl).schema
        assert(s == base,
          s"$tbl schema diverges at $other:\n  sf0.001: $base\n  $other: $s")
      }
    }
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
