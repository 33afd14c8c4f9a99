package graft.examples

import graft.Sessions
import graft.operators.{Dedup, Similarity}

import org.apache.spark.sql.DataFrame

import org.apache.spark.sql.functions._

/** Round-5 scale rehearsal (not library surface), extending RehearsalR4's
  * pattern to the round-4 judge's asks: incremental NEAR-dedup (d16) and
  * semantic decontamination (d18) at 10–100× the fixture volumes, with
  * planted structure so the expected outcome is known exactly and verified,
  * not eyeballed. Wall-clock printed for the survey log.
  *
  * Why synthetic: sf0.1 tops out at 5×10⁴ documents / 5×10³ embeddings;
  * the properties under rehearsal (banded-LSH candidate volume on a
  * half-million-doc corpus, a 2×10⁸-pair broadcast cosine screen) need
  * volumes the fixtures don't reach. `spark.range` + xxhash64 synthesis is
  * codegen'd and deterministic. */
object RehearsalR5 {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"REHEARSE $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    import spark.implicits._

    // ---- d16 incremental near-dedup: 500k corpus, 50k batch, 25% planted
    // near-dups. Corpus docs are 30 unique tokens; a planted near-dup is
    // its source plus ONE appended token → shingle Jaccard 28/29 ≈ 0.966,
    // comfortably over the 0.8 threshold and recalled by the LSH bands with
    // P[miss] ≈ 0 (d03's argument). Novel batch docs share no shingles with
    // anything. Expected survivors: exactly the 37,500 novel rows.
    def text30(id: org.apache.spark.sql.Column) = concat_ws(" ",
      transform(sequence(lit(0), lit(29)),
        k => concat(lit("w"), id, lit("_"), k)))
    val corpus = spark.range(500000L).select($"id", text30($"id").as("text"))
    // two-step select: a single select would let Spark's LATERAL COLUMN
    // ALIAS resolution bind the text expression's $"id" to the re-aliased
    // (id + 10⁷) column, silently planting near-dups of NONEXISTENT corpus
    // docs (found the hard way — the rehearsal's first run dropped zero)
    val batch = spark.range(50000L).select(
      $"id",
      when(pmod($"id", lit(4L)) === 0L,
        concat(text30($"id"), lit(" zzz")))         // near-dup of corpus doc id
        .otherwise(text30($"id" + 20000000L)).as("text")) // novel
      .select(($"id" + 10000000L).as("id"), $"text")
    val kept16 = time("d16 incremental near-dedup 500k/50k")(
      Dedup.incremental(batch, corpus, "id", "text",
        shingleN = 3, threshold = 0.8).count())
    require(kept16 == 37500L, s"expected 37500 survivors, got $kept16")
    println(s"REHEARSE d16 kept=$kept16 of 50000 (12.5k planted near-dups dropped)")

    // ---- d18 semantic decontamination: 200k train vectors (dim 64),
    // 1k-vector eval set of which 500 are VERBATIM copies of train vectors
    // (train ids 0, 100, 200, …, 49900). xxhash64 synthesis makes the rest
    // effectively random: cosine std ≈ 1/√64 ≈ 0.125, so a spurious 0.95
    // hit is a >7σ event (expected count over 2×10⁸ pairs ≈ 1e-5) — the
    // flagged set must be EXACTLY the 500 copy sources at cos = 1.0.
    def vec64(id: org.apache.spark.sql.Column) =
      transform(sequence(lit(0), lit(63)),
        k => pmod(xxhash64(id, k), lit(2000001L)).cast("double") / 1000000.0 - 1.0)
    val train = spark.range(200000L)
      .select($"id".as("vec_id"), vec64($"id").as("embedding"))
    val eval = spark.range(1000L).select(
      ($"id" + 5000000L).as("vec_id"),
      when($"id" < 500L, vec64($"id" * 100L))        // verbatim copy of train
        .otherwise(vec64($"id" + 7000000L)).as("embedding")) // random
    val flagged = Similarity.decontaminateSemantic(train, eval, 0.95).cache()
    val n18 = time("d18 semantic decontam 200k x 1k")(flagged.count())
    val exact = flagged.filter($"max_cos_milli" === 1000L).count()
    val idsOk = flagged.filter(pmod($"vec_id", lit(100L)) === 0L && $"vec_id" < 50000L).count()
    require(n18 == 500L && exact == 500L && idsOk == 500L,
      s"expected exactly the 500 planted sources at cos=1.0; got n=$n18 exact=$exact idsOk=$idsOk")
    println(s"REHEARSE d18 flagged=$n18 (all planted, all cos_milli=1000, zero spurious)")

    // ---- d07/d10 ANN at 1M vectors: the planted-top-k contract the new
    // oracles pin at fixture scale, re-proven at 200×. Three perturbed
    // copies per query (cos ≈ 0.999+) are planted; each query's top-3 must
    // be exactly its copies — the max natural cosine among 1M random
    // vectors is ≈ 5σ·0.125 ≈ 0.64, far below the copies. Band sizing is
    // the top-k scale knob: the fixture default (12 bands × 4 bits = 16
    // buckets/band) would pull ~12/16 of a 1M corpus as candidates per
    // query; 8 bands × 8 bits = 256 buckets/band prunes to ~3% with
    // P[miss a 0.999-copy] ≈ 2e-10. IVF probes 4 of 64 cells ≈ 6%.
    val annCorpusBase = spark.range(1000000L)
      .select($"id".as("vec_id"), vec64($"id").as("embedding"))
    val annPlanted = annCorpusBase.filter($"vec_id" < 5)
      .select($"vec_id", $"embedding",
        explode(sequence(lit(0L), lit(2L))).as("j"))
      .select(($"vec_id" * 10 + $"j" + 2000000L).as("vec_id"),
        concat(slice($"embedding", 1, 32),
          transform(slice($"embedding", 33, 32),
            x => x * (lit(1.0) + ($"j" + 1).cast("double") * lit(0.01))))
          .as("embedding"))
    val annCorpus = annCorpusBase.unionByName(annPlanted).localCheckpoint()
    val annQueries = annCorpus.filter($"vec_id" < 5)
    def checkTop3(got: DataFrame, label: String): Unit = {
      // collect INSIDE time(): the operator is lazy, the action is the cost
      val rows = time(label)(got.select("query_id", "neighbor_id", "rank")
        .orderBy("query_id", "rank").collect())
      require(rows.length == 15, s"$label: expected 5 queries x top-3, got ${rows.length}")
      rows.foreach { r =>
        val (q, n, rk) = (r.getLong(0), r.getLong(1), r.getLong(2))
        require(n == 2000000L + q * 10 + (rk - 1),
          s"$label: query $q rank $rk returned $n, not its planted copy")
      }
    }
    checkTop3(Similarity.srpTopK(annCorpus, annQueries, 3,
      bands = 8, bitsPerBand = 8), "d07 srpTopK 1M vectors (8x8-bit bands)")
    checkTop3(Similarity.ivfTopK(annCorpus, annQueries, 3,
      nlist = 64, nprobe = 4), "d10 ivfTopK 1M vectors (nlist=64)")
    println("REHEARSE d07/d10 top-3 = planted copies for every query at 1M")

    spark.stop()
  }
}
