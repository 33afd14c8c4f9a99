package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths, as a training-data pipeline needs both:
  *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
  *    set against the full corpus; one pass, no shuffle of the corpus, then
  *    a per-query top-k window. The correctness baseline.
  *  - [[srpTopK]]: signed-random-projection LSH — each vector gets a B-bit
  *    signature from the signs of B fixed pseudo-random hyperplane dots;
  *    candidates are vectors sharing a signature band with the query; exact
  *    cosine re-ranks within buckets. At 100 TB the corpus never joins
  *    itself — it shuffles only by short bucket keys.
  *
  * Cosine is computed in double precision as a sequential fold
  * (`zip_with` + `aggregate`) so results are bit-reproducible across
  * engines (matches DuckDB's list_cosine_similarity on DOUBLE[]).
  */
object Similarity {

  /** `cosine(a, b)` over two array<double> columns: the single-pass
    * [[graft.functions.HashImpls.cosineSim]] expression — the same
    * sequential-fold arithmetic as an `aggregate(zip_with(...))` chain (and
    * DuckDB's list_cosine_similarity), but one compiled sweep instead of
    * three interpreted HOF passes per pair. */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.functions.HashFunctions.cosine_sim(a, b)

  private def asDouble(c: org.apache.spark.sql.Column) = transform(c, _.cast("double"))

  /** Semantic benchmark decontamination — [[Dedup.decontaminate]]'s
    * embedding-space cousin: flag every training vector whose cosine
    * against ANY evaluation vector reaches `threshold` (paraphrased or
    * re-encoded eval material that n-gram overlap misses). Returns one row
    * per contaminated training vector:
    * `(vec_id, n_eval_hits, max_cos_milli)`.
    *
    * Scale shape: eval sets are metadata-sized next to the corpus, so the
    * eval side is `broadcast()` and the corpus streams through UNSHUFFLED
    * — per-row cost is |eval| compiled cosine sweeps, and only the rare
    * hits reach the aggregation. For eval sets too large to broadcast,
    * SRP-bucket both sides first ([[srpNearDupPairs]]' banding) and verify
    * the collisions exactly. */
  def decontaminateSemantic(train: DataFrame, eval: DataFrame, threshold: Double,
                            idCol: String = "vec_id", embCol: String = "embedding",
                            evalIdCol: String = "vec_id", evalEmbCol: String = "embedding"): DataFrame = {
    val tm = (threshold * 1000).toLong
    val ev = broadcast(eval.select(col(evalIdCol).as("eval_id"),
      asDouble(col(evalEmbCol)).as("e_emb")))
    train.select(col(idCol).as("vec_id"), asDouble(col(embCol)).as("t_emb"))
      .crossJoin(ev)
      .withColumn("cos_milli",
        floor(cosine(col("t_emb"), col("e_emb")) * 1000 + 0.5).cast("long"))
      .filter(col("cos_milli") >= tm)
      .groupBy("vec_id")
      .agg(countDistinct(col("eval_id")).as("n_eval_hits"),
        max(col("cos_milli")).as("max_cos_milli"))
  }

  /** Exact top-k neighbors for each query vector. `queries` is expected to
    * be small (it is broadcast); `corpus` streams through unshuffled. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), asDouble(col(embCol)).as("q_emb")))
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(embCol)).as("c_emb"))
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** SYMMETRIC int8 quantization (the inference-style scheme): one global
    * scale s = max|x| over the corpus, bins = round(x/s·127) in
    * [−127, 127], NO offset. At embedding-store scale this is THE memory
    * lever — a 1024-dim float32 corpus is 4 KB/vector, int8 is 1 KB: the
    * difference between a store that fits executor memory and one that
    * spills — and the integer dot of two symmetric-quantized vectors is
    * directly proportional to the float dot (up to quantization noise),
    * so ANN ranking carries over.
    *
    * Symmetric-with-no-offset is load-bearing, measured twice on the way
    * here: a per-VECTOR min/max map gives every vector its own scale
    * (integer dots not comparable across neighbors — top-10 overlap with
    * the float dot collapsed to 0.07), and a per-DIMENSION min/max map
    * still injects its OFFSETS into every product (a Σ lo·b bias that
    * varies per neighbor — overlap identically 0.07). The offset-free
    * global scale makes the integer score an unbiased monotone estimate
    * (spec-asserted overlap ≥ 0.6 vs the float dot).
    *
    * Bit-exact reproducible: training is an exact max of |x|; the bin
    * formula uses only IEEE-exact ops (÷, ×, +, floor — no libm), so any
    * engine computes identical bins and the integer ordering has no float
    * surface. Model state = ONE double on the driver. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val c0 = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(embCol)).as("c_emb"))
    // train: global scale = exact max |x| (one-double driver model state)
    val scaleRow = c0.select(max(array_max(transform(col("c_emb"), x => abs(x)))))
      .collect()(0)
    // max over an EMPTY (or all-null) relation is NULL — check before
    // getDouble, which would throw an opaque NPE ahead of the message
    require(!scaleRow.isNullAt(0),
      "quantizedTopK: empty corpus (or all-null embeddings) has no scale")
    val scale = scaleRow.getDouble(0)
    require(scale > 0.0, "quantizedTopK: all-zero corpus has no scale")
    def quant(e: Column): Column =
      transform(e, x => floor(x / scale * 127 + 0.5).cast("long"))
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      quant(asDouble(col(embCol))).as("q_q")))
    val c = c0.select(col("neighbor_id"), quant(col("c_emb")).as("c_q"))
    // integer dot product: the ordering has no float surface at all
    val dot = aggregate(zip_with(col("q_q"), col("c_q"), (a, b) => a * b),
      lit(0L), (acc, v) => acc + v)
    val scored = q.crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("score", dot)
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("rank"), col("score"))
  }

  /** IVF (inverted-file) approximate top-k: a coarse quantizer of `nlist`
    * deterministically-sampled corpus vectors partitions the corpus into
    * cells; each query probes its `nprobe` nearest cells and re-ranks
    * candidates with exact cosine.
    *
    * Scale shape: the centroids are the only fitted state — bounded by
    * `nlist`, collected once on the driver and inlined as literals, so cell
    * assignment is per-row compute on an UNSHUFFLED corpus scan (no
    * centroid join, no explode). Candidate selection is a broadcast join of
    * the (tiny) probe list against the assigned corpus: the corpus never
    * self-joins and shuffles only by the matched cell rows. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 32, nprobe: Int = 4,
              idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), asDouble(col(embCol)).as("c_emb"))
    // Coarse quantizer: the nlist lowest-id vectors (a deterministic sample;
    // ids are uncorrelated with geometry). Driver-side collect is bounded by
    // nlist — this is model state, not data.
    val cents: Array[(Long, Seq[Double])] = c.orderBy("neighbor_id").limit(nlist)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))
    def centScores(emb: org.apache.spark.sql.Column) = array(cents.map { case (cid, v) =>
      struct(cosine(emb, typedLit(v)).as("cos"), lit(cid).as("cid"))
    }: _*)
    // cell assignment = per-row argmax over the literal centroid set
    val assigned = c.withColumn("cid", array_max(centScores(col("c_emb"))).getField("cid"))
    // each query probes its nprobe closest cells (per-row top-n, no shuffle)
    val probes = queries
      .select(col(idCol).as("query_id"), asDouble(col(embCol)).as("q_emb"))
      .withColumn("probe",
        explode(slice(reverse(array_sort(centScores(col("q_emb")))), 1, nprobe)))
      .select(col("query_id"), col("q_emb"), col("probe.cid").as("cid"))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    broadcast(probes).join(assigned, Seq("cid"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
        round(col("cosine"), 6).as("cosine"))
  }

  /** Exact embedding near-dup pairs: every (a < b) pair with cosine ≥
    * `threshold`, in integer milli-units. Deliberately quadratic in
    * COMPUTE — the correctness baseline the banded [[srpNearDupPairs]] is
    * verified against — but tiled so the quadratic part is dense kernel
    * work, not join machinery: the corpus groups into `blocks` tiles (one
    * shuffle), the B·(B+1)/2 tile pairs join as B² rows, and a compiled
    * loop scores each tile pair (each unordered vector pair visited
    * exactly once: i<j within a tile, min-id orientation across tiles).
    * Per-pair arithmetic is the identical sequential fold as
    * [[graft.functions.HashImpls.cosineSim]], so the oracle contract is
    * unchanged. Size `blocks` so a tile pair fits task memory. */
  def cosinePairs(corpus: DataFrame, threshold: Double,
                  idCol: String = "vec_id", embCol: String = "embedding",
                  blocks: Int = 32): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // The tile kernel encodes ids as longs (every engine table keys by
    // long); fail fast with a clear message rather than a null-encoder
    // crash deep inside a task.
    require({
      import org.apache.spark.sql.types._
      Seq(ByteType, ShortType, IntegerType, LongType).contains(corpus.schema(idCol).dataType)
    }, s"cosinePairs requires an integral id column; '$idCol' is ${corpus.schema(idCol).dataType}")
    val tm = (threshold * 1000).toLong
    val tiles = corpus
      // null id/embedding rows are dropped, matching the expression path's
      // null-propagating filter semantics
      .filter(col(idCol).isNotNull && col(embCol).isNotNull)
      .select(col(idCol).cast("long").as("id"), asDouble(col(embCol)).as("emb"),
        // hash-assign tiles: pmod on raw ids degenerates on strided or
        // power-of-two id distributions (one tile swallows the corpus)
        pmod(xxhash64(col(idCol).cast("long")), lit(blocks.toLong)).cast("int").as("bid"))
      .as[(Long, Seq[Double], Int)]
      .groupByKey(_._3)
      // canonical id order WITHIN each tile: the self-join's two sides are
      // independent evaluations whose shuffle-fetch order is not
      // deterministic on a cluster — the same-tile upper-triangle walk
      // (i < j) is only correct if both sides agree on element order
      .mapGroups { (bid, it) =>
        (bid, it.map(t => (t._1, t._2.toArray)).toArray.sortBy(_._1))
      }
    tiles.toDF("abid", "avs").join(tiles.toDF("bbid", "bvs"), col("abid") <= col("bbid"))
      .as[(Int, Array[(Long, Array[Double])], Int, Array[(Long, Array[Double])])]
      .flatMap { case (abid, avs, bbid, bvs) =>
        val out = Seq.newBuilder[(Long, Long, Long)]
        val same = abid == bbid
        var i = 0
        while (i < avs.length) {
          val (ida, va) = avs(i)
          var j = if (same) i + 1 else 0
          while (j < bvs.length) {
            val (idb, vb) = bvs(j)
            if (ida != idb) { // strict a < b: duplicate ids never self-pair
              val milli = math.floor(
                graft.functions.HashImpls.cosineSimArrays(va, vb) * 1000 + 0.5).toLong
              if (milli >= tm)
                out += (if (ida < idb) (ida, idb, milli) else (idb, ida, milli))
            }
            j += 1
          }
          i += 1
        }
        out.result()
      }
      .toDF("a_id", "b_id", "cos_milli")
  }

  /** SRP-banded embedding near-dup pairs: candidates share at least one
    * signature band, then exact cosine verifies ≥ `threshold`. Only
    * (id, band, bkey) rows cross the shuffle — embeddings are re-attached to
    * the few surviving candidates (the same 100-TB shape as
    * [[graft.operators.Dedup.minhashPairs]]).
    *
    * Band sizing is the scale knob: short band keys hash the corpus into
    * few buckets and the bucket self-join degrades quadratically (8-bit
    * keys = 256 buckets/band was measured 70× better than 4-bit keys = 16
    * buckets on a dup-heavy 10k corpus). Wider bands need >64 signature
    * bits, so the signature is composed of multiple 64-bit SRP words over
    * disjoint plane families. Recall at the defaults (16 bands × 8 bits,
    * τ = 0.95): P[bit agree] = 1 − θ/π ≈ 0.90 ⇒ P[miss] = (1 − 0.9⁸)¹⁶ ≈
    * 1e-4 at the threshold boundary, and ≈ 1e-20 for the ~0.999-cosine
    * pairs dedup actually targets. */
  def srpNearDupPairs(corpus: DataFrame, threshold: Double,
                      bands: Int = 16, bitsPerBand: Int = 8,
                      idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    require(64 % bitsPerBand == 0, "bands must not straddle 64-bit signature words")
    val bits = bands * bitsPerBand
    val nWords = (bits + 63) / 64
    val emb = asDouble(col(embCol))
    val sigWords = (0 until nWords).map { w =>
      graft.functions.HashFunctions.srp_sig(emb, math.min(64, bits - w * 64), w * 64).as(s"sig$w")
    }
    val bandCols = (0 until bands).map { b =>
      val g = b * bitsPerBand
      shiftrightunsigned(col(s"sig${g / 64}"), g % 64)
        .bitwiseAND(lit((1L << bitsPerBand) - 1))
    }
    val banded = corpus
      .select((col(idCol).as("id") +: sigWords): _*)
      .select(col("id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    val candIds = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    val embs = corpus.select(col(idCol).as("id"), asDouble(col(embCol)).as("emb"))
    candIds
      .join(embs.select(col("id").as("a_id"), col("emb").as("a_emb")), "a_id")
      .join(embs.select(col("id").as("b_id"), col("emb").as("b_emb")), "b_id")
      .withColumn("cos_milli",
        floor(cosine(col("a_emb"), col("b_emb")) * 1000 + 0.5).cast("long"))
      .filter(col("cos_milli") >= (threshold * 1000).toLong)
      .select("a_id", "b_id", "cos_milli")
  }

  /** Approximate top-k: bucket by SRP signature bands, exact cosine within
    * candidate buckets. `bands` bands of `bitsPerBand` bits; a pair is a
    * candidate if any band matches. The B-bit signature is the single-pass
    * [[graft.functions.HashImpls.srpSignature]] Catalyst expression — all B
    * hyperplane dot products accumulate in one compiled sweep of the vector
    * (a per-bit `aggregate(zip_with(...))` fold would be B interpreted
    * passes). */
  def srpTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bands: Int = 12, bitsPerBand: Int = 4,
              idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val bits = bands * bitsPerBand
    def withBands(df: DataFrame, id: String, emb: String) = {
      val sig = graft.functions.HashFunctions.srp_sig(asDouble(col(emb)), bits)
      df.select(col(id), asDouble(col(emb)).as(emb), sig.as("sig"))
        .select(col(id), col(emb), posexplode(
          array((0 until bands).map(b =>
            shiftrightunsigned(col("sig"), b * bitsPerBand)
              .bitwiseAND(lit((1L << bitsPerBand) - 1))): _*)))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bkey")
    }
    val q = broadcast(withBands(queries.toDF(), idCol, embCol)
      .withColumnRenamed(idCol, "query_id").withColumnRenamed(embCol, "q_emb"))
    val c = withBands(corpus, idCol, embCol)
      .withColumnRenamed(idCol, "neighbor_id").withColumnRenamed(embCol, "c_emb")
    val cands = q.join(c, Seq("band", "bkey"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .dropDuplicates("query_id", "neighbor_id")
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    cands
      .withColumn("cosine", cosine(col("q_emb"), col("c_emb")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank").cast("long").as("rank"),
        round(col("cosine"), 6).as("cosine"))
  }
}
