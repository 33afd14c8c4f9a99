package graft.examples

import graft.Sessions
import graft.operators.Entity

import org.apache.spark.sql.functions._

/** Round-9 scale rehearsal: the VIRAL-BLOCK case for the edit-distance
  * family — one blocking key holding 120k records (one hot domain is
  * routine in web data), planted so the expected clustering is
  * ARITHMETIC.
  *
  * Corpus: 1200 base keys (30 random lowercase chars, generator-verified
  * pairwise distance ≥ 7), 100 records each = 120,000 records, every
  * record a ≤1-substitution perturbation of its base — so intra-cluster
  * distance ≤ 2 and inter-cluster distance ≥ 5, and at maxDist=2 the
  * exact answer is 1200 clusters of exactly 100 members.
  *
  * 1. The BLOCKED path with maxBlockRows=50,000 must raise its in-plan
  *    guard (the 120k block would be 7.2·10⁹ DP evaluations pinned to
  *    one key's tasks).
  * 2. The q-gram INDEXED path ([[Entity.canonicalizeIndexed]], q=3) must
  *    complete and return the planted clustering exactly — the positional
  *    trigram prefix index never self-joins the corpus, so one viral
  *    block is just 120k more rows through the index.
  * 3. The SEGMENT (PassJoin) generator must produce the identical
  *    clustering — measurably faster here (and the recommended default
  *    on low-entropy keys).
  * 4. The INCREMENTAL fold: 12k fresh perturbations against the resolved
  *    120k corpus — 1000 planted clusters grow to exactly 112 members,
  *    200 stay at 100, with the corpus contributing only slim segment
  *    rows (never a self-join).
  */
object RehearsalR9 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"REHEARSE $label%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    import spark.implicits._

    // --- planted viral block: 1200 clusters × 100 perturbed copies -----
    val rnd = new scala.util.Random(1009)
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    def randKey(): String = (0 until 30).map(_ => alpha(rnd.nextInt(26))).mkString
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = d(0); d(0) = i
        for (j <- 1 to b.length) {
          val t = d(j)
          d(j) = math.min(math.min(d(j) + 1, d(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      d(b.length)
    }
    val bases = Iterator.continually(randKey()).distinct.take(1200).toVector
    // generator-verified separation: min pairwise base distance ≥ 7 so the
    // planted clusters are provably disjoint at maxDist=2 (≥ 7 − 2 = 5)
    val minSep = (for (i <- bases.indices; j <- (i + 1) until bases.length)
      yield lev(bases(i), bases(j))).min
    require(minSep >= 7, s"planted bases too close: $minSep")
    println(s"REHEARSE base separation min=$minSep (need ≥ 7)")

    val recs = bases.zipWithIndex.flatMap { case (b, ci) =>
      (0 until 100).map { j =>
        val key = if (j == 0) b
          else b.updated(rnd.nextInt(30), alpha(rnd.nextInt(26)))
        (ci * 1000L + j, key)
      }
    }
    val df = recs.toDF("id", "key").repartition(32)
      .localCheckpoint() // materialize once; both paths read the same rows

    // --- 1. blocked path: the guard must refuse the viral block --------
    val raised = time("blocked path: guard raises on 120k block") {
      try {
        Entity.canonicalize(df, "id", lit("hot-domain"), col("key"),
          maxDist = 2, maxBlockRows = 50000).count()
        false
      } catch {
        case e: Exception =>
          val m = Option(e.getMessage).getOrElse("") + Option(e.getCause)
            .map(_.getMessage).getOrElse("")
          m.contains("maxBlockRows=50000")
      }
    }
    require(raised, "blocked-path guard did not raise on the viral block")

    // --- 2. indexed path: completes, and the clustering is exact -------
    val got = time("indexed path: canonicalizeIndexed 120k, maxDist=2, q=3") {
      Entity.canonicalizeIndexed(df, "id", col("key"), maxDist = 2, q = 3)
        .groupBy("cluster_id")
        .agg(max("n_members").as("n"), sum(when(col("is_canonical"), 1L)
          .otherwise(0L)).as("n_canon"))
        .collect()
    }
    require(got.length == 1200, s"expected 1200 clusters, got ${got.length}")
    require(got.forall(r => r.getLong(1) == 100L && r.getLong(2) == 1L),
      s"every cluster must have exactly 100 members and 1 canonical: " +
        got.filterNot(r => r.getLong(1) == 100L && r.getLong(2) == 1L)
          .take(3).mkString(","))
    println(s"REHEARSE clusters=1200 × members=100 exact — viral block survives the index")

    // --- 3. segment (PassJoin) generator: same viral block, same answer
    val gotSeg = time("segment path: canonicalizeIndexed 120k, maxDist=2") {
      Entity.canonicalizeIndexed(df, "id", col("key"), maxDist = 2,
          generator = "segment")
        .groupBy("cluster_id")
        .agg(max("n_members").as("n"), sum(when(col("is_canonical"), 1L)
          .otherwise(0L)).as("n_canon"))
        .collect()
    }
    require(gotSeg.length == 1200 &&
      gotSeg.forall(r => r.getLong(1) == 100L && r.getLong(2) == 1L),
      s"segment generator must produce the identical planted clustering")
    println(s"REHEARSE segment generator: clusters=1200 × members=100 exact")

    // --- 4. incremental fold: 12k new records against the resolved 120k —
    // the corpus contributes only slim segment rows, never a self-join.
    // The first 1000 bases get 12 new perturbed copies each; their
    // clusters must grow to exactly 112 while the other 200 stay at 100.
    // materialize the resolved corpus first (in production this is the
    // stored entity table) so the timing below is the incremental fold
    // alone, not a lazy re-resolution of the corpus
    val resolved = Entity.canonicalizeIndexed(df, "id", col("key"),
        maxDist = 2, generator = "segment")
      .select(col("id"), col("cluster_id"))
      .join(df, "id")
      .localCheckpoint()
    val batch = bases.take(1000).zipWithIndex.flatMap { case (b, ci) =>
      (0 until 12).map { j =>
        (2000000L + ci * 100L + j,
          b.updated(rnd.nextInt(30), alpha(rnd.nextInt(26))))
      }
    }.toDF("id", "key").repartition(8)
    val inc = time("incremental fold: 12k batch vs 120k resolved corpus") {
      Entity.canonicalizeIncremental(batch, resolved, "id", "cluster_id",
          col("key"), col("key"), maxDist = 2)
        .groupBy("cluster_id").agg(max("n_members").as("n"))
        .collect()
    }
    require(inc.length == 1200, s"still 1200 clusters, got ${inc.length}")
    val sizes = inc.map(_.getLong(1)).groupBy(identity).view.mapValues(_.length).toMap
    require(sizes == Map(112L -> 1000, 100L -> 200),
      s"1000 clusters must grow to 112, 200 stay at 100: $sizes")
    println(s"REHEARSE incremental: 1000 clusters -> 112 members, 200 -> 100, exact")
    spark.stop()
  }
}
