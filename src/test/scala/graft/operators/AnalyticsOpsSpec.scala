package graft.operators

import graft.SparkSuite

import org.apache.spark.sql.functions._

/** Unit specs for the round-8 analytics operators: the generalized funnel
  * fold (q55), degree-orientation triangle counting (g02), passage-level
  * dup detection (d22), and the exact-integer time-series aggregates
  * (q64/q65) — the fixtures pin the edge semantics the oracle queries
  * don't reach (strict stage ordering on ties, nested/chained intervals,
  * single-observation keys, clique-free graphs). */
class AnalyticsOpsSpec extends SparkSuite {

  test("Funnel.stages: strict ordering, decoys, and per-stage gating") {
    import spark.implicits._
    // key 1: full path; key 2: click BEFORE view only (must not convert);
    // key 3: click AT the view instant (strict > excludes it); key 4: view
    // only; key 5: stage-2 event of the wrong type between valid ones.
    val ev = Seq(
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "buy"),
      (2L, 5L, 4L, "click"), (2L, 10L, 5L, "view"),
      (3L, 10L, 6L, "view"), (3L, 10L, 7L, "click"), (3L, 20L, 8L, "buy"),
      (4L, 10L, 9L, "view"),
      (5L, 10L, 10L, "view"), (5L, 15L, 11L, "noise"), (5L, 20L, 12L, "buy")
    ).toDF("u", "ts", "id", "tp")
    val got = Funnel.stages(ev, col("u"), col("ts"), col("id"), col("tp"),
        Seq("view", "click", "buy"), Seq("v", "c", "b"))
      .collect().map(r => r.getLong(0) ->
        (Option(r.get(1)), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(got(1L) == ((Some(10L), Some(20L), Some(30L))))
    assert(got(2L) == ((Some(10L), None, None)), "pre-view click must not count")
    assert(got(3L) == ((Some(10L), None, None)), "same-instant click fails strict >")
    assert(got(4L) == ((Some(10L), None, None)))
    assert(got(5L) == ((Some(10L), None, None)), "buy needs a click first")
    // duplicate output names rejected loudly
    intercept[IllegalArgumentException] {
      Funnel.stages(ev, col("u"), col("ts"), col("id"), col("tp"),
        Seq("a", "b"), Seq("x", "x"))
    }
    // duplicate stage labels rejected loudly (shared contract with the
    // streaming twin, whose indexOf fold cannot express them)
    intercept[IllegalArgumentException] {
      Funnel.stages(ev, col("u"), col("ts"), col("id"), col("tp"),
        Seq("view", "click", "view"), Seq("a", "b", "c"))
    }
  }

  test("Funnel.stages: stage labels containing quotes are data, not expression text") {
    import spark.implicits._
    // a label with a single quote (and one with a backslash) must fold
    // correctly — the label is escaped before interpolation into the
    // aggregate lambda, so it can neither break parsing nor inject
    val ev = Seq(
      (1L, 10L, 1L, "o'clock"), (1L, 20L, 2L, raw"back\slash"),
      (2L, 10L, 3L, "o'clock")
    ).toDF("u", "ts", "id", "tp")
    val got = Funnel.stages(ev, col("u"), col("ts"), col("id"), col("tp"),
        Seq("o'clock", raw"back\slash"), Seq("s0", "s1"))
      .collect().map(r => r.getLong(0) -> (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got(1L) == ((Some(10L), Some(20L))), s"quoted labels must match: $got")
    assert(got(2L) == ((Some(10L), None)))
  }

  test("Graph.triangleCounts: cliques count, trees/cycles don't, dirt tolerated") {
    import spark.implicits._
    // K4 on 0-3 (each node in 3 triangles), a 4-cycle on 10-13 (none), a
    // path 20-22 (none), plus duplicate/reversed/self-loop edges.
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    val cyc = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L))
    val path = Seq((20L, 21L), (21L, 22L))
    val dirt = Seq((1L, 0L), (0L, 1L), (5L, 5L))
    val edges = (k4 ++ cyc ++ path ++ dirt).toDF("u", "v")
    val got = Graph.triangleCounts(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L),
      s"only the K4 nodes triangulate: $got")
  }

  test("Dedup.dupPassages: only cross-document runs, maximal and min-length gated") {
    import spark.implicits._
    // docs 1/2 share an 8-token passage (4 consecutive 5-gram shingles);
    // docs 3/4 share only a single 5-gram (1 shingle < minShingles);
    // doc 5 repeats doc 1's passage words in a DIFFERENT order (no dup).
    val p = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two three $p"),
      (2L, s"$p nine ten"),
      (3L, "aa bb cc dd ee unique3"),
      (4L, "aa bb cc dd ee unique4"),
      (5L, "theta eta zeta epsilon delta gamma beta alpha")
    ).toDF("doc_id", "text")
    val got = Dedup.dupPassages(docs, "doc_id", "text", n = 5, minShingles = 2)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1: passage at tokens 3..10; doc 2: tokens 0..7 — both 4 shingles
    assert(got == Map(1L -> ((3L, 10L, 4L)), 2L -> ((0L, 7L, 4L))),
      s"expected exactly the two planted spans: $got")
    // minShingles=1 admits the single shared 5-gram of docs 3/4
    val loose = Dedup.dupPassages(docs, "doc_id", "text", n = 5, minShingles = 1)
      .collect().map(_.getLong(0)).toSet
    assert(loose == Set(1L, 2L, 3L, 4L), s"single-shingle spans gated wrong: $loose")
  }

  test("Funnel.stages maxEventsPerKey: a bot key raises in-plan; decoys don't charge the bound") {
    import spark.implicits._
    // key 1: normal path (2 stage events); key 9: bot with 6 stage events;
    // key 5: 1 stage event + 8 DECOY events of an un-staged type (must not
    // charge the bound — the guard counts after the stage filter)
    val ev = (Seq((1L, 10L, 1L, "view"), (1L, 20L, 2L, "click")) ++
      (0 until 6).map(i => (9L, 30L + i, 10L + i, "view")) ++
      Seq((5L, 40L, 20L, "view")) ++
      (0 until 8).map(i => (5L, 50L + i, 30L + i, "noise")))
      .toDF("k", "ts", "eid", "tp")
    val e = intercept[Exception] {
      Funnel.stages(ev, col("k"), col("ts"), col("eid"), col("tp"),
        Seq("view", "click"), Seq("t_view", "t_click"),
        maxEventsPerKey = 5).collect()
    }
    assert(e.getMessage.contains("maxEventsPerKey=5") && e.getMessage.contains("9"),
      s"guard must name the hot key and the bound: ${e.getMessage}")
    // at the bound (bot dropped to 5) and with decoy-heavy key 5: passes
    val ok = Funnel.stages(ev.filter(col("ts") =!= 35L), col("k"), col("ts"),
      col("eid"), col("tp"), Seq("view", "click"), Seq("t_view", "t_click"),
      maxEventsPerKey = 5)
    assert(ok.count() == 3, "guard at the bound must not fire")
    // disarmed (default 0): identical result to the guarded run
    val base = Funnel.stages(ev.filter(col("ts") =!= 35L), col("k"), col("ts"),
      col("eid"), col("tp"), Seq("view", "click"), Seq("t_view", "t_click"))
    assert(base.collect().toSet == ok.collect().toSet,
      "the armed guard must not change funnel semantics")
  }

  test("Dedup.sourceOverlap: pair counts exact; a viral shingle raises at maxSources") {
    import spark.implicits._
    // s1/s2 share 'a b c d e'; s1/s3 share 'p q r s t'; s2/s3 share none
    val docs = Seq(
      (1L, "s1", "a b c d e x p q r s t"),
      (2L, "s2", "a b c d e y"),
      (3L, "s3", "z p q r s t")).toDF("doc_id", "source", "text")
    val got = Dedup.sourceOverlap(docs, "source", "text", n = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == Map(("s1", "s2") -> 1L, ("s1", "s3") -> 1L),
      s"expected exactly the two planted overlaps: $got")
    // five sources sharing one shingle: over maxSources=4 raises, at 5 passes
    val viral = (1 to 5).map(i => (i.toLong, s"v$i", "w1 w2 w3 w4 w5"))
      .toDF("doc_id", "source", "text")
    val e = intercept[Exception] {
      Dedup.sourceOverlap(viral, "source", "text", n = 5, maxSources = 4).collect()
    }
    assert(e.getMessage.contains("maxSources=4"),
      s"viral shingle must raise with the bound: ${e.getMessage}")
    assert(Dedup.sourceOverlap(viral, "source", "text", n = 5, maxSources = 5)
      .count() == 10, "5 sources pairing over one shared shingle")
  }

  test("Entity.canonicalize: blocks isolate, singletons total, keeper is min id") {
    import spark.implicits._
    // ids 1/2 match in block A; id 3 has the SAME key but a different
    // block (must stay singleton); id 4 is a block-A non-match.
    val recs = Seq(
      (1L, "A", "acme corp"), (2L, "A", "acme corp"),
      (3L, "B", "acme corp"), (4L, "A", "zzzzzzzzz")
    ).toDF("id", "blk", "key")
    val got = Entity.canonicalize(recs, "id", col("blk"), col("key"), maxDist = 1)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2), r.getLong(3)))
      .toMap
    assert(got(1L) == ((1L, true, 2L)) && got(2L) == ((1L, false, 2L)),
      s"in-block twins must cluster under the min id: $got")
    assert(got(3L) == ((3L, true, 1L)), s"same key, other block: singleton: $got")
    assert(got(4L) == ((4L, true, 1L)), s"non-match stays singleton: $got")
    // no edges at all: every record is its own canonical cluster
    val none = Entity.canonicalize(recs, "id", col("blk"), col("key"), maxDist = 0)
      .filter(col("n_members") =!= 1L || !col("is_canonical")).count()
    assert(none == 2, "maxDist 0 still unites exact-equal keys only") // ids 1,2
  }

  test("RangeJoin.intervalOverlap: once per pair across buckets, strict half-open") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // left interval spans MANY buckets and shares several with the right
    // one — the first-common-bucket rule must still emit the pair once
    val l = Seq((1L, ts(0), ts(10000)), (2L, ts(50000), ts(50010)))
      .toDF("l_id", "l_s", "l_e")
    val r = Seq((10L, ts(5000), ts(9000)),   // overlaps 1 across buckets
                (11L, ts(10000), ts(10100)), // TOUCHES 1 (l_e == r_s): no pair
                (12L, ts(49000), ts(50005))) // overlaps 2
      .toDF("r_id", "r_s", "r_e")
    val got = RangeJoin.intervalOverlap(l, "l_s", "l_e", r, "r_s", "r_e",
        bucketSeconds = 100L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 12L)),
      s"expected each overlapping pair exactly once, touching excluded: $got")
    // an EMPTY interval ([t, t)) inside a non-empty one pairs with nothing
    val lEmpty = Seq((3L, ts(6000), ts(6000))).toDF("l_id", "l_s", "l_e")
    val none = RangeJoin.intervalOverlap(lEmpty, "l_s", "l_e", r, "r_s", "r_e",
      bucketSeconds = 100L).count()
    assert(none == 0, "empty half-open intervals intersect nothing")
    // non-key column collision rejected loudly
    intercept[IllegalArgumentException] {
      RangeJoin.intervalOverlap(l, "l_s", "l_e",
        r.withColumnRenamed("r_s", "l_s"), "l_s", "r_e")
    }
  }

  test("RangeJoin sub-second intervals: non-empty within one second pair, reversed raise") {
    import spark.implicits._
    def tms(ms: Long) = new java.sql.Timestamp(ms)
    // [6000.2s, 6000.8s) is NON-empty — truncated-epoch equality must not
    // silently drop it: it overlaps [5000s, 9000s)
    val lSub = Seq((1L, tms(6000200), tms(6000800))).toDF("l_id", "l_s", "l_e")
    val r = Seq((10L, tms(5000000), tms(9000000))).toDF("r_id", "r_s", "r_e")
    val got = RangeJoin.intervalOverlap(lSub, "l_s", "l_e", r, "r_s", "r_e",
        bucketSeconds = 100L)
      .select("l_id", "r_id").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(got == Set((1L, 10L)), s"sub-second non-empty interval must pair: $got")
    // a SAME-SECOND reversed interval ([.8, .2)) has bucket span 0 — it
    // must still hit the loud reversed raise, not slip through as valid
    val lRev = Seq((2L, tms(6000800), tms(6000200))).toDF("l_id", "l_s", "l_e")
    val e = intercept[Exception] {
      RangeJoin.intervalOverlap(lRev, "l_s", "l_e", r, "r_s", "r_e",
        bucketSeconds = 100L).count()
    }
    assert(e.getMessage.contains("reversed interval"),
      s"same-second reversed must raise loudly: ${e.getMessage}")
  }

  test("AsOf.join tolerance: in-window matches survive, stale ones null out") {
    import spark.implicits._
    val probe = Seq((1L, 5L, "p1"), (1L, 500L, "p2"), (2L, 50L, "p3"))
      .toDF("k", "ts", "tag")
    val build = Seq((1L, 0L, 77L)).toDF("k", "ts", "v")
    val out = AsOf.join(probe, build, Seq("k"), "ts", "ts",
        tolerance = Some(100L))
      .collect().map(r => r.getString(2) ->
        (if (r.isNullAt(4)) None else Some(r.getLong(4)))).toMap
    assert(out("p1") == Some(77L), s"in-window match must survive: $out")
    assert(out("p2") == None, s"stale match must null out, not attribute: $out")
    assert(out("p3") == None, s"keys with no build rows stay null: $out")
    intercept[IllegalArgumentException] {
      AsOf.join(probe, build, Seq("k"), "ts", "ts", tolerance = Some(-1L))
    }
  }

  test("Sampling.temperatureBalance: NULL strata are a real group, reserved names guarded") {
    import spark.implicits._
    // 'a' 8 rows, NULL 2 rows: c_min = 2 (the NULL group), so NULL keeps
    // everything (rate 1000) and 'a' halves (floor(sqrt(2/8)*1000+.5) =
    // 500) — a non-null-safe join would drop the NULL rows AND still let
    // their count deflate 'a'
    val df = ((1 to 8).map(i => (i.toLong, Some("a"))) ++
      Seq((9L, None), (10L, None))).toDF("id", "st")
    val got = Sampling.temperatureBalance(df, col("id"), col("st"))
    val rates = got.select("st", "rate_milli").distinct().collect()
      .map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(rates.get(None).contains(1000L), s"NULL stratum keeps all: $rates")
    assert(rates.get(Some("a")).contains(500L), s"big stratum halves: $rates")
    assert(got.filter(col("st").isNull).count() == 2,
      "every NULL-stratum row survives at rate 1000")
    intercept[IllegalArgumentException] {
      Sampling.temperatureBalance(df.withColumnRenamed("id", "rate_milli"),
        col("rate_milli"), col("st"))
    }
  }

  test("Timeseries.timeWeightedAvg: step weighting, ties, single-obs keys drop") {
    import spark.implicits._
    // key 1: 100 cents held 10s then 200 held 30s → twa = (1000+6000)/40
    // = 175.00 exactly → 175000 milli. key 2: one observation → dropped.
    // key 3: two obs in the same second (dt 0) then one later — the
    // zero-length segment contributes nothing either way.
    val ev = Seq(
      (1L, 0L, 1L, 100L), (1L, 10L, 2L, 200L), (1L, 40L, 3L, 999L),
      (2L, 0L, 4L, 50L),
      (3L, 0L, 5L, 7L), (3L, 0L, 6L, 9L), (3L, 10L, 7L, 11L)
    ).toDF("k", "ts", "id", "v")
    val got = Timeseries.timeWeightedAvg(ev, col("k"), col("ts"), col("id"), col("v"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got(1L) == ((100L * 10 + 200L * 30, 40L, 175000L)), s"got $got")
    assert(!got.contains(2L), "single-observation key must drop")
    assert(got(3L) == ((9L * 10, 10L, 9000L)), s"tie segment must weigh zero: $got")
  }

  test("Timeseries.intervalCoverage: overlap, nesting, chains, and gaps") {
    import spark.implicits._
    // key 1: [0,10) ∪ [5,20) ∪ [30,40) → 2 islands, 30 covered;
    // key 2: [0,100) ⊃ [10,20) nested → 1 island, 100;
    // key 3: [0,10) [10,20) touching (half-open: contiguous) → 1 island;
    // key 4: zero-length [5,5) ignored entirely.
    val iv = Seq(
      (1L, 0L, 10L), (1L, 5L, 20L), (1L, 30L, 40L),
      (2L, 0L, 100L), (2L, 10L, 20L),
      (3L, 0L, 10L), (3L, 10L, 20L),
      (4L, 5L, 5L)
    ).toDF("k", "s", "e")
    val got = Timeseries.intervalCoverage(iv, col("k"), col("s"), col("e"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(1L) == ((2L, 30L)), s"got $got")
    assert(got(2L) == ((1L, 100L)), s"nested interval must not extend: $got")
    assert(got(3L) == ((1L, 20L)), s"touching half-open intervals chain: $got")
    assert(!got.contains(4L), "zero-length intervals contribute nothing")
  }
}
