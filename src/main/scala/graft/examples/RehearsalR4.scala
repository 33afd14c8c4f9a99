package graft.examples

import graft.Sessions
import graft.operators.{Dedup, Indexing, Sampling}

import org.apache.spark.sql.functions._

/** Round-4 scale rehearsal (not library surface): drives the new operators
  * at 100×+ the fixture row counts with synthesized data, checking the
  * properties that matter at scale — result-identity of the skew-bounded
  * plans, exactness of the two-pass global index, and the Bloom screen's
  * zero-false-drop guarantee — with wall-clock printed for the record.
  *
  * Why synthetic: sf0.1 tops out at 5×10⁴ documents; the failure modes
  * these operators exist for (a viral stratum, a 10⁷-row numbering, a
  * million-row corpus screen) need volumes the fixtures don't reach.
  * `spark.range` synthesis is codegen'd and deterministic. */
object RehearsalR4 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"REHEARSE $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    import spark.implicits._

    // ---- p05 capPerStratum under skew: 5M rows, one stratum holds 4M ----
    // (the "one domain is 80% of the crawl" shape). The salted plan must
    // return the IDENTICAL kept set while bounding per-task window size.
    val skewed = spark.range(5000000L).select(
      when($"id" < 4000000L, lit("viral.example"))
        .otherwise(concat(lit("site"), pmod($"id", lit(97L)))).as("src"),
      $"id",
      pmod($"id" * 2654435761L, lit(1000001L)).as("prio"))
      .localCheckpoint() // rehearse the operator, not the synthesis
    val plain = time("p05 cap k=100 plain window")(
      Sampling.capPerStratum(skewed, $"src", $"prio", $"id", k = 100)
        .agg(count(lit(1)), sum($"id"), sum($"prio")).head())
    val salted = time("p05 cap k=100 presalts=16")(
      Sampling.capPerStratum(skewed, $"src", $"prio", $"id", k = 100, presalts = 16)
        .agg(count(lit(1)), sum($"id"), sum($"prio")).head())
    require(plain == salted, s"salted plan diverged: $plain vs $salted")
    println(s"REHEARSE p05 kept=${plain.getLong(0)} rows (98 strata × ≤100)")

    // ---- p04 globalIndex at 10M sparse keys -----------------------------
    // Sum/min/max of the assigned index verify the FULL contiguous 1..N
    // numbering without collecting a single row to the driver.
    val n = 10000000L
    val keys = spark.range(n).select(($"id" * 7L + 13L).as("k")).localCheckpoint()
    val idx = time("p04 globalIndex 10M keys")(
      Indexing.globalIndex(keys, $"k", buckets = 64)
        .agg(count(lit(1)).as("c"), min($"global_idx").as("lo"),
          max($"global_idx").as("hi"), sum($"global_idx").as("s")).head())
    require(idx.getLong(0) == n && idx.getLong(1) == 1L && idx.getLong(2) == n
      && idx.getLong(3) == n * (n + 1) / 2,
      s"index not a contiguous 1..$n permutation: $idx")
    println(s"REHEARSE p04 verified sum=${idx.getLong(3)}")

    // ---- d17 Bloom screen: 2M-doc corpus, 200k batch, 25% true dups -----
    // Every planted duplicate must drop; every novel row must survive
    // (false positives are screened out by the exact verify join).
    val corpus = spark.range(2000000L)
      .select($"id", concat(lit("corpus text body #"), $"id").as("text"))
    val batch = spark.range(200000L).select(
      ($"id" + 10000000L).as("id"),
      when(pmod($"id", lit(4L)) === 0L, concat(lit("corpus text body #"), $"id"))
        .otherwise(concat(lit("novel batch text #"), $"id")).as("text"))
    val kept = time("d17 bloom screen 2M corpus / 200k batch")(
      Dedup.exactIncremental(batch, corpus, "id", "text",
        expectedItems = 2000000L).count())
    require(kept == 150000L, s"expected 150000 survivors, got $kept")
    println(s"REHEARSE d17 kept=$kept of 200000 (50k planted dups dropped)")

    spark.stop()
  }
}
