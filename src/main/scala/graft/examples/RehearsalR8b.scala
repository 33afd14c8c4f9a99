package graft.examples

import graft.Sessions
import graft.operators.{Dedup, Funnel, Graph}

import org.apache.spark.sql.functions._

/** Round-8 second rehearsal: the late-round operators at scale, planted so
  * every expected outcome is ARITHMETIC (RehearsalR4/R5/R7/R8 pattern) —
  * verified exactly, wall-clock printed for the survey log.
  *
  * 1. Funnel over 5M users / ~14.4M events, four stages: user u gets a
  *    decoy click BEFORE its first view (must never count — pins the
  *    strict ordering at scale), a view at u·1000+1, then click/addcart/
  *    purchase at +2/+3/+4 only when u ≡ 0 mod 2/4/8. Expected stage
  *    populations 5M / 2.5M / 1.25M / 625k with exact per-row timestamps.
  *
  * 2. Triangle counting over 2M nodes in planted K4 blocks (3M canonical
  *    edges, 2M triangles): every node must count exactly 3 — the
  *    degree-orientation DAG enumerates each triangle once, so any
  *    over/under-count is a correctness failure, not noise.
  *
  * 3. Passage-level dup detection over 500k docs (~11M tokens): docs with
  *    u ≡ 0 mod 10 carry one shared 10-token passage at token offset 12
  *    inside otherwise-unique filler. Expected: exactly 50k spans, every
  *    one (start 12, end 21, 6 shingles) — the shared passage's posting
  *    lists are the planted hot keys (50k docs per shingle).
  */
object RehearsalR8b {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"REHEARSE $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    import spark.implicits._

    // --- 1. funnel, 5M users ---------------------------------------------
    val nUsers = 5000000L
    val users = spark.range(nUsers)
    def stageEvents(mod: Long, off: Long, tp: String) =
      users.filter($"id" % mod === 0L).select($"id".as("u"),
        ($"id" * 1000 + off).as("ts"), lit(tp).as("tp"))
    val events =
      stageEvents(1, 0, "click")      // decoy: precedes the view, must not count
        .unionAll(stageEvents(1, 1, "view"))
        .unionAll(stageEvents(2, 2, "click"))
        .unionAll(stageEvents(4, 3, "addcart"))
        .unionAll(stageEvents(8, 4, "purchase"))
    val fun = time(s"funnel 4 stages over ${nUsers / 1000000}M users") {
      Funnel.stages(events, $"u", $"ts", $"ts", $"tp",
          stages = Seq("view", "click", "addcart", "purchase"),
          names = Seq("s_view", "s_click", "s_cart", "s_buy"))
        .localCheckpoint()
    }
    val counts = fun.agg(count($"s_view"), count($"s_click"), count($"s_cart"),
      count($"s_buy"), count(lit(1))).head()
    assert(counts.getLong(4) == nUsers, s"funnel lost users: $counts")
    assert(counts.getLong(0) == nUsers && counts.getLong(1) == nUsers / 2 &&
      counts.getLong(2) == nUsers / 4 && counts.getLong(3) == nUsers / 8,
      s"stage populations off: $counts")
    // null-safe (<=>) both ways: a NULL where a value is expected AND a
    // value where NULL is expected must both count as bad — plain =!=
    // evaluates to NULL on the former and the guard hides the latter,
    // which would let a membership swap slip through the count checks
    val bad = fun.filter(
      !($"s_view" <=> $"key" * 1000 + 1) ||
      ($"key" % 2 === 0 && !($"s_click" <=> $"key" * 1000 + 2)) ||
      ($"key" % 2 =!= 0 && $"s_click".isNotNull) ||
      ($"key" % 4 === 0 && !($"s_cart" <=> $"key" * 1000 + 3)) ||
      ($"key" % 4 =!= 0 && $"s_cart".isNotNull) ||
      ($"key" % 8 === 0 && !($"s_buy" <=> $"key" * 1000 + 4)) ||
      ($"key" % 8 =!= 0 && $"s_buy".isNotNull)).count()
    assert(bad == 0, s"$bad users with wrong stage timestamps")
    println(s"  funnel: ${counts.getLong(0)}/${counts.getLong(1)}/" +
      s"${counts.getLong(2)}/${counts.getLong(3)} exact")

    // --- 2. triangles, 2M nodes in K4 blocks -----------------------------
    val nNodes = 2000000L
    val ids = spark.range(nNodes)
    val edges = (1 to 3).map(j => ids.selectExpr("id AS u",
      s"id DIV 4 * 4 + ((id % 4 + $j) % 4) AS v")).reduce(_ unionAll _)
    val tri = time("triangles over 2M nodes / 3M edges") {
      Graph.triangleCounts(edges).localCheckpoint()
    }
    val triStats = tri.agg(count(lit(1)), min($"n_tri"), max($"n_tri")).head()
    assert(triStats.getLong(0) == nNodes && triStats.getLong(1) == 3 &&
      triStats.getLong(2) == 3,
      s"expected every node in exactly 3 triangles: $triStats")
    println(s"  triangles: ${triStats.getLong(0)} nodes, all n_tri=3 exact")

    // --- 3. passage dup detection, 500k docs -----------------------------
    val nDocs = 500000L
    val passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = spark.range(nDocs).select($"id".as("doc_id"),
      concat(
        array_join(transform(sequence(lit(0), lit(11)),
          i => concat(lit("u"), $"id", lit("t"), i)), " "),
        when($"id" % 10 === 0, lit(" " + passage)).otherwise(lit(""))).as("text"))
    val spans = time("dupPassages over 500k docs (~11M tokens)") {
      Dedup.dupPassages(docs, "doc_id", "text", n = 5, minShingles = 2)
        .localCheckpoint()
    }
    val nSpans = spans.count()
    assert(nSpans == nDocs / 10, s"expected ${nDocs / 10} planted spans, got $nSpans")
    val off = spans.filter($"start_tok" =!= 12L || $"end_tok" =!= 21L ||
      $"n_shingles" =!= 6L || $"doc_id" % 10 =!= 0L).count()
    assert(off == 0, s"$off spans deviate from the planted arithmetic")
    println(s"  passages: $nSpans spans, all (12, 21, 6) exact")

    // --- 4. zone-map pruning at 1024 objects --------------------------
    // The driver-side cost readPruned's scaladoc owns: one sidecar read
    // per candidate object. 1024 objects with disjoint 64-key bands
    // (ordered single-partition write + record-limit rolling); a 64-wide
    // predicate must keep exactly ONE object, and the timed number is the
    // full listing + 1024 sidecar consults + plan of the surviving scan.
    import graft.lake.{LakeReader, LakeWriter}
    import graft.types.{ColType, TableSchema}
    val zroot = s"file://${java.nio.file.Files
      .createTempDirectory("graft-zmap-rehearse").toFile.getAbsolutePath}"
    val zschema = TableSchema("zr", Seq("k" -> ColType.CInteger))
    LakeWriter.write(
      spark.range(1024L * 64).select($"id".as("k")).orderBy("k").coalesce(1),
      zschema, zroot, maxRecordsPerObject = 64L, zoneMaps = true)
    // band-aligned range (bands are [64i, 64i+63]): exactly one object
    val (zdf, zrep) = time("zone-map prune over 1024 objects") {
      LakeReader.readPruned(spark, zroot, "zr", "k",
        java.math.BigDecimal.valueOf(9984), java.math.BigDecimal.valueOf(10047))
    }
    assert(zrep.candidates == 1024 && zrep.kept == 1,
      s"expected 1 of 1024 objects kept: $zrep")
    val zn = zdf.filter($"k".between(9984, 10047)).count()
    assert(zn == 64, s"pruned read lost rows: $zn")
    println(s"  zonemap: ${zrep.kept}/${zrep.candidates} objects opened, 64 rows exact")
    graft.Fs.deleteRecursively(new java.io.File(new java.net.URI(zroot)))

    // --- 5. entity canonicalization, 200k records / 2000 blocks ---------
    // Each id < 100k pairs with id+100k (same block: 100000 ≡ 0 mod 2000);
    // match keys encode id%100k with every digit QUADRUPLED — two distinct
    // numbers differ in ≥1 digit → ≥4 edits (equal lengths; any shift
    // costs more than it saves against the repeated-block structure), so
    // threshold 3 connects EXACTLY the planted twins, provably, with no
    // randomness. ~10M in-block Levenshtein pairs + components + windowed
    // survivorship — the full Entity.canonicalize path, block-bounded.
    val nEnt = 200000L
    val ent = spark.range(nEnt).select($"id",
      ($"id" % 2000).as("blk"),
      concat_ws("", transform(
        split(lpad(($"id" % 100000).cast("string"), 6, "0"), ""),
        d => concat(d, d, d, d))).as("key"))
    val canon = time("entity canonicalization 200k / 2000 blocks") {
      graft.operators.Entity.canonicalize(ent, "id", $"blk", $"key", maxDist = 3)
        .localCheckpoint()
    }
    val cstats = canon.agg(count(lit(1)), sum($"is_canonical".cast("long")),
      min($"n_members"), max($"n_members")).head()
    assert(cstats.getLong(0) == nEnt && cstats.getLong(1) == nEnt / 2 &&
      cstats.getLong(2) == 2 && cstats.getLong(3) == 2,
      s"expected ${nEnt / 2} exact twin clusters: $cstats")
    val wrong = canon.filter($"cluster_id" =!= $"id" % 100000).count()
    assert(wrong == 0, s"$wrong records mapped to the wrong twin cluster")
    println(s"  entity: ${cstats.getLong(1)} twin clusters exact")

    spark.stop()
  }
}
