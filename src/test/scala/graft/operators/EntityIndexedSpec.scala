package graft.operators

import graft.SparkSuite

import org.apache.spark.sql.functions._

/** The indexed (Ed-Join) edit-distance path and the viral-block guards:
  * [[Entity.editPairs]] must find EXACTLY the pairs the quadratic finds —
  * on a corpus that includes repeated-gram keys (prefix tie closure),
  * sub-q·k short strings (the pool), and empty keys — and both quadratic
  * regimes (blocked join, short pool) must fail loudly at their bounds.
  */
class EntityIndexedSpec extends SparkSuite {

  /** Deterministic mixed-shape corpus: clustered long keys, repeated-char
    * keys, shorts, and an empty key. */
  private def corpus: Seq[(Long, String)] = {
    val rnd = new scala.util.Random(42)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val bases = Seq.fill(8)((0 until 20).map(_ => alpha(rnd.nextInt(26))).mkString)
    val perturbed = for {
      (b, ci) <- bases.zipWithIndex
      j <- 0 until 6
    } yield {
      val pos = rnd.nextInt(b.length)
      val s = if (j == 0) b else b.updated(pos, alpha(rnd.nextInt(26)))
      (ci * 100L + j, s)
    }
    val shorts = Seq((900L, "ab"), (901L, "ba"), (902L, "a"), (903L, ""),
      (904L, "abd"), (905L, "xyz"))
    val runs = Seq((950L, "aaaaaaaaaaaaaaaaaaaa"), (951L, "aaaaaaaaaaaaaaaaaaab"),
      (952L, "bbbbbbbbbbbbbbbbbbbb"))
    perturbed ++ shorts ++ runs
  }

  private def brutePairs(maxDist: Int): Set[(Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val c = corpus
    (for {
      (ia, sa) <- c; (ib, sb) <- c
      if ia < ib && lev(sa, sb) <= maxDist
    } yield (ia, ib)).toSet
  }

  test("editPairs == brute force on a mixed-shape corpus (q=1 and q=2)") {
    import spark.implicits._
    val df = corpus.toDF("id", "key")
    for (q <- Seq(1, 2); k <- Seq(1, 2, 3)) {
      val got = Entity.editPairs(df, "id", col("key"), maxDist = k, q = q)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = brutePairs(k)
      assert(got == want,
        s"q=$q maxDist=$k: indexed=${got.size} brute=${want.size}; " +
          s"missing=${want -- got}, extra=${got -- want}")
    }
  }

  test("segmentPairs (PassJoin) == brute force on the same mixed-shape corpus") {
    import spark.implicits._
    val df = corpus.toDF("id", "key")
    for (k <- Seq(1, 2, 3)) {
      val got = Entity.segmentPairs(df, "id", col("key"), maxDist = k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = brutePairs(k)
      assert(got == want,
        s"segment maxDist=$k: got=${got.size} brute=${want.size}; " +
          s"missing=${want -- got}, extra=${got -- want}")
    }
    // the two generators and the quadratic agree end-to-end
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getLong(3)))).toMap
    val seg = canon(Entity.canonicalizeIndexed(df, "id", col("key"),
      maxDist = 2, generator = "segment").collect())
    val blk = canon(Entity.canonicalize(df, "id", lit(1), col("key"),
      maxDist = 2).collect())
    assert(seg == blk, "segment-generated canonicalization must match the quadratic")
  }

  test("canonicalizeIndexed matches the single-block quadratic end to end") {
    import spark.implicits._
    val df = corpus.toDF("id", "key")
    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getLong(3)))).toMap
    val idx = canon(Entity.canonicalizeIndexed(df, "id", col("key"),
      maxDist = 2, q = 2).collect())
    val blk = canon(Entity.canonicalize(df, "id", lit(1), col("key"),
      maxDist = 2).collect())
    assert(idx == blk, s"indexed and blocked disagree: ${
      idx.toSet.diff(blk.toSet)} vs ${blk.toSet.diff(idx.toSet)}")
  }

  test("canonicalizeIncremental: bridging batch record MERGES corpus clusters; random split == full") {
    import spark.implicits._
    // corpus clusters A={1:"aaaaaaaa"} and B={2:"aaaaabbb"} sit at
    // distance 3 > k=2; batch record 10="aaaaaabb" is within 2 of BOTH —
    // the incremental fold must merge A and B through it
    val corpusDf = Seq((1L, 1L, "aaaaaaaa"), (2L, 2L, "aaaaabbb"))
      .toDF("id", "cluster_id", "key")
    val batch = Seq((10L, "aaaaaabb"), (11L, "zzzzzzzz")).toDF("id", "key")
    val got = Entity.canonicalizeIncremental(batch, corpusDf, "id", "cluster_id",
        col("key"), col("key"), maxDist = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(got == Map(1L -> ((1L, 3L)), 2L -> ((1L, 3L)), 10L -> ((1L, 3L)),
      11L -> ((11L, 1L))), s"bridge must merge both clusters under min id: $got")

    // and the merge case equals the full resolution of the same records
    val full = Entity.canonicalizeIndexed(corpusDf.select("id", "key")
        .unionByName(batch), "id", col("key"),
        maxDist = 2, generator = "segment")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(got == full, s"incremental must equal full: ${got.toSet.diff(full.toSet)}")

    // parity split of the mixed-shape suite corpus: incremental == full
    val all = corpus.toDF("id", "key")
    val corp = all.filter(col("id") % 2 === 0)
    val resolved = Entity.canonicalizeIndexed(corp, "id", col("key"),
        maxDist = 2, generator = "segment")
      .select(col("id"), col("cluster_id")).join(corp, "id")
    val inc = Entity.canonicalizeIncremental(all.filter(col("id") % 2 =!= 0),
        resolved, "id", "cluster_id", col("key"), col("key"), maxDist = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2),
        r.getLong(3)))).toMap
    val fullAll = Entity.canonicalizeIndexed(all, "id", col("key"),
        maxDist = 2, generator = "segment")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2),
        r.getLong(3)))).toMap
    assert(inc == fullAll,
      s"mixed-corpus incremental != full: ${inc.toSet.diff(fullAll.toSet)} / ${fullAll.toSet.diff(inc.toSet)}")
  }

  test("blocked-path guard: a block over maxBlockRows raises in-plan, under passes") {
    import spark.implicits._
    val recs = Seq((1L, "A", "k1"), (2L, "A", "k2"), (3L, "A", "k3"),
      (4L, "A", "k4"), (5L, "B", "k5")).toDF("id", "blk", "key")
    val e = intercept[Exception] {
      Entity.canonicalize(recs, "id", col("blk"), col("key"), maxDist = 1,
        maxBlockRows = 3).collect()
    }
    assert(e.getMessage.contains("maxBlockRows=3") && e.getMessage.contains("A"),
      s"guard must name the viral block and the bound: ${e.getMessage}")
    // at the bound (block A = 4 ≤ 4) and with the guard disarmed: both fine
    assert(Entity.canonicalize(recs, "id", col("blk"), col("key"), 1,
      maxBlockRows = 4).count() == 5)
    assert(Entity.canonicalize(recs, "id", col("blk"), col("key"), 1).count() == 5)
    // the guard's working columns are reserved loudly, not silently eaten
    val clash = recs.withColumnRenamed("key", "_gn")
    val ex = intercept[IllegalArgumentException] {
      Guards.perKeyRows(clash, col("blk"), 10L, "spec", "maxRows", "r")
    }
    assert(ex.getMessage.contains("_gn"), s"reserved-name raise: ${ex.getMessage}")
    // an oversized NULL-key group must raise WITH the key/bound/remedy
    // diagnostic (format_string is null-strict — unguarded, the message
    // itself would be NULL and the guard's whole point is lost)
    val nulls = Seq[(String, Int)]((null, 1), (null, 2), (null, 3), ("a", 1))
      .toDF("blk", "x")
    val en = intercept[Exception] {
      Guards.perKeyRows(nulls, col("blk"), 2L, "spec", "maxRows",
        "split the key").collect()
    }
    val msg = Option(en.getMessage).getOrElse("") +
      Option(en.getCause).map(c => " " + c.getMessage).getOrElse("")
    assert(msg.contains("NULL") && msg.contains("maxRows=2") &&
      msg.contains("split the key"),
      s"null-key raise must keep key/bound/remedy: $msg")
  }

  test("editCandidates plan: the gram join is keyed — the only nested loop is the bounded pool") {
    import spark.implicits._
    val df = corpus.toDF("id", "key")
    val p = Entity.editCandidates(df, "id", col("key"), maxDist = 2, q = 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"the index path must never plan a cartesian:\n$p")
    // the prefix self-join must be an equi join on the gram key (hash or
    // sort-merge — either is keyed), never a nested loop over the corpus
    assert(p.contains("_gram"), s"candidates must join on the gram key:\n$p")
    // exactly the pool machinery may nested-loop: the two 1-row
    // count-check broadcasts (one per join side) and the guarded pool
    // pair join itself — never a corpus-scale loop
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnl <= 3,
      s"only the maxShortPool-guarded pool may nested-loop (found $bnl):\n$p")
  }

  test("segmentCandidates plan: the segment join is a keyed equi-join, never corpus-scale nested loop") {
    import spark.implicits._
    val df = corpus.toDF("id", "key")
    val p = Entity.segmentCandidates(df, "id", col("key"), maxDist = 2)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"the segment path must never plan a cartesian:\n$p")
    assert(p.contains("_iseg") && p.contains("_psub"),
      s"candidates must equi-join on the segment content key:\n$p")
    // only the pool machinery may nested-loop (two 1-row count checks +
    // the guarded pool pair join) — loosening the (_ilen, _ii, _iseg)
    // equi keys into conditions would add a fourth and fail here
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnl <= 3,
      s"only the maxShortPool-guarded pool may nested-loop (found $bnl):\n$p")
  }

  test("short-pool guard: a corpus of sub-q·k keys raises with maxShortPool") {
    import spark.implicits._
    // q=2, maxDist=3 → short means len ≤ 7; plant 5 shorts, cap at 4
    val df = (1L to 5L).map(i => (i, s"k$i")).toDF("id", "key")
    val e = intercept[Exception] {
      Entity.editPairs(df, "id", col("key"), maxDist = 3, q = 2,
        maxShortPool = 4).collect()
    }
    assert(e.getMessage.contains("maxShortPool=4"),
      s"pool guard must state the bound: ${e.getMessage}")
    // at the cap: completes, and still finds the true pairs
    val got = Entity.editPairs(df, "id", col("key"), maxDist = 3, q = 2,
      maxShortPool = 5).count()
    assert(got == 10, s"5 shorts within distance 3 of each other: $got")
  }
}
