package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-space clustering for training-data pipelines: deterministic
  * cosine k-means and SemDedup-style semantic deduplication (Abbas et al.
  * 2023: cluster the corpus, then remove near-duplicates WITHIN each
  * cluster — the clustering bounds the quadratic pair search).
  *
  * Scale design: centroids are the only fitted state — k × dim doubles,
  * collected once per iteration and inlined as literals — so every
  * assignment pass is per-row compute over an UNSHUFFLED corpus scan (the
  * same shape as [[Similarity.ivfTopK]]'s coarse quantizer, which is this
  * module's single-assignment special case). The per-iteration centroid
  * update is a posexplode + (cluster, dim) aggregation: map-side partial
  * aggregation reduces each task's contribution to k × dim cells before
  * the exchange, so the shuffle is model-sized, not data-sized.
  */
object Clustering {

  private def asDouble(c: org.apache.spark.sql.Column) = transform(c, _.cast("double"))

  /** Deterministic seeds: the k lowest-id vectors (ids are uncorrelated
    * with geometry in a hashed/assigned id space — a free deterministic
    * sample; k-means++ would need a sequential scan-per-seed). */
  def seedCentroids(corpus: DataFrame, k: Int,
                    idCol: String = "vec_id", embCol: String = "embedding"): Array[(Long, Seq[Double])] =
    corpus.select(col(idCol).cast("long").as("id"), asDouble(col(embCol)).as("emb"))
      .orderBy("id").limit(k)
      .collect().map(r => (r.getLong(0), r.getSeq[Double](1)))

  /** Per-row argmax-cosine centroid scores as a literal array — shared by
    * assignment and probing. Ties break to the HIGHER centroid id (struct
    * max order), mirrored by the oracle's `ORDER BY cos DESC, cid DESC`. */
  private def centScores(emb: org.apache.spark.sql.Column,
                         cents: Seq[(Long, Seq[Double])]) =
    array(cents.map { case (cid, v) =>
      struct(Similarity.cosine(emb, typedLit(v)).as("cos"), lit(cid).as("cid"))
    }: _*)

  /** Assign every vector to its max-cosine centroid:
    * `(vec_id, cluster_id, cos_milli)`. One unshuffled corpus scan. */
  def assign(corpus: DataFrame, cents: Seq[(Long, Seq[Double])],
             idCol: String = "vec_id", embCol: String = "embedding"): DataFrame =
    assigned(corpus, cents, idCol, embCol)
      .select(col("vec_id"), col("cluster_id"),
        floor(col("cos") * 1000 + 0.5).cast("long").as("cos_milli"))

  /** [[assign]] keeping the embedding column (for downstream pair search). */
  private def assigned(corpus: DataFrame, cents: Seq[(Long, Seq[Double])],
                       idCol: String, embCol: String): DataFrame =
    corpus
      .select(col(idCol).cast("long").as("vec_id"), asDouble(col(embCol)).as("emb"))
      .withColumn("best", array_max(centScores(col("emb"), cents)))
      .select(col("vec_id"), col("emb"),
        col("best.cid").as("cluster_id"), col("best.cos").as("cos"))

  /** Lloyd's k-means with cosine assignment and mean-update, a fixed
    * `iters` rounds (fixed-round loops are reproducible on any cluster —
    * convergence deltas are float-order-sensitive). Returns the final
    * centroids; compose with [[assign]] for the labeling. Cosine is
    * norm-invariant, so plain (unnormalized) means are a valid spherical
    * update. Each round: one unshuffled assignment scan + one model-sized
    * aggregation; nothing but k × dim cells ever reaches the driver. */
  def kmeans(corpus: DataFrame, k: Int, iters: Int,
             idCol: String = "vec_id", embCol: String = "embedding"): Array[(Long, Seq[Double])] = {
    var cents = seedCentroids(corpus, k, idCol, embCol)
    var it = 0
    while (it < iters) {
      val a = assigned(corpus, cents.toSeq, idCol, embCol)
      val means = a
        .select(col("cluster_id"), posexplode(col("emb")))
        .groupBy(col("cluster_id"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      val byCluster = means.groupBy(_._1)
      cents = cents.map { case (cid, old) =>
        byCluster.get(cid) match {
          // a cluster that lost every member keeps its previous centroid
          case None => (cid, old)
          case Some(cells) => (cid, cells.sortBy(_._2).map(_._3).toSeq)
        }
      }
      it += 1
    }
    cents
  }

  /** SemDedup: within each cluster, drop every vector that has a
    * near-duplicate (cosine ≥ `threshold`) with a LOWER id in the same
    * cluster; returns the kept `(vec_id, cluster_id)` rows. The pair
    * search is cluster-scoped — the whole point of clustering first: with
    * k sized so clusters fit task memory (k ~ N/c), the quadratic search
    * is bounded per cluster instead of corpus-wide. Cross-cluster
    * near-dups are NOT examined (the documented SemDedup approximation);
    * for clusters still too large, chain [[Similarity.srpNearDupPairs]]
    * inside the cluster instead of the pairwise join. */
  def semDedup(corpus: DataFrame, cents: Seq[(Long, Seq[Double])], threshold: Double,
               idCol: String = "vec_id", embCol: String = "embedding"): DataFrame = {
    val tm = (threshold * 1000).toLong
    // Three consumers (both self-join sides + the final anti-join): without
    // materialization the anti-join side re-runs the full k×dim cosine
    // assignment scan (the self-join sides can share an exchange, the
    // vec_id-partitioned anti-join cannot) — the d16 banded-rows lesson.
    val a = assigned(corpus, cents, idCol, embCol)
      .select(col("vec_id"), col("emb"), col("cluster_id"))
      .transform(Materialize.cut)
    val dropped = a.as("a")
      .join(a.as("b"),
        col("a.cluster_id") === col("b.cluster_id") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos_milli",
        floor(Similarity.cosine(col("a.emb"), col("b.emb")) * 1000 + 0.5).cast("long"))
      .filter(col("cos_milli") >= tm)
      .select(col("b.vec_id").as("vec_id")).distinct()
    a.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cluster_id"))
  }
}
