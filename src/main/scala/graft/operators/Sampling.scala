package graft.operators

import graft.functions.HashFunctions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, cluster-layout-independent sampling for training-data
  * pipelines.
  *
  * `df.sample()` / `TABLESAMPLE` draw from a per-partition seeded RNG: the
  * selected rows change with partitioning, task scheduling, and cluster
  * size — unacceptable for reproducible corpus splits. Here membership is a
  * pure function of a row key: `rolling_hash(key) mod 1000 < rate‰`. The
  * same key lands on the same side of every split, on any cluster, in any
  * engine — the rolling hash is the SQL-reproducible fold the t04 oracle
  * replays in DuckDB — so sampled corpora are verifiable end-to-end.
  *
  * Scale shape: a stateless per-row filter — no shuffle, no driver data
  * path, pushdown-friendly surrounding columns; exactly what a 100 TB
  * train/val/test split needs.
  */
object Sampling {

  /** Deterministic bucket in [0, 1000) from a row key. */
  def bucketMilli(key: Column): Column =
    pmod(HashFunctions.rolling_hash(key.cast("string")), lit(1000))

  /** Keep ~`rateMilli`/1000 of rows, keyed deterministically. */
  def hashSample(df: DataFrame, key: Column, rateMilli: Int): DataFrame =
    df.filter(bucketMilli(key) < rateMilli)

  /** Stratified deterministic sampling: per-stratum keep rates (in milli),
    * e.g. keep purchases at 500‰ but views at 100‰. Strata absent from the
    * map fall back to `defaultRateMilli`. */
  def stratified(df: DataFrame, key: Column, stratum: Column,
                 rates: Map[String, Int], defaultRateMilli: Int = 0): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRateMilli)) { case (acc, (s, r)) =>
      when(stratum === s, lit(r)).otherwise(acc)
    }
    df.filter(bucketMilli(key) < rate)
  }

  /** Temperature-balanced mixture sampling (α = 0.5): downsample each
    * stratum so its expected post-sample mass ∝ √count — the standard
    * multilingual/multi-source rebalancing knob (big sources shrink
    * toward the small ones without flattening entirely). Keep rate per
    * stratum: f = √(c_min / c), so the SMALLEST stratum keeps everything
    * and normalization needs NO sum — deliberately, because a float SUM
    * over strata would make the rates depend on summation order, while
    * c_min/c, √ and the milli floor are all IEEE-exact single operations
    * any engine reproduces bit-for-bit. One count aggregate (model-sized
    * result, broadcast back); the corpus itself never shuffles. Returns
    * the kept rows plus each row's stratum `rate_milli`. */
  def temperatureBalance(df: DataFrame, key: Column, stratum: Column): DataFrame = {
    // reserved-name guards, like every operator in this file — an input
    // rate_milli would make the post-join filter ambiguous, an input _st
    // would be silently dropped
    for (reserved <- Seq("_st", "_c", "_cmin", "rate_milli"))
      require(!df.columns.map(_.toLowerCase).contains(reserved),
        s"column name $reserved is reserved by temperatureBalance")
    val counts = df.groupBy(stratum.as("_st")).agg(count(lit(1)).as("_c"))
    val cmin = counts.agg(min(col("_c")).as("_cmin"))
    val rates = counts.crossJoin(broadcast(cmin))
      .select(col("_st"),
        floor(sqrt(col("_cmin").cast("double") / col("_c").cast("double")) * 1000 + 0.5)
          .cast("long").as("rate_milli"))
    // null-safe join: a NULL stratum is a legitimate group (it counted
    // toward the rates, possibly AS c_min) and must keep its rows — a
    // plain === would silently drop every NULL-stratum row while still
    // letting the NULL group's count deflate the other strata's rates
    df.join(broadcast(rates), stratum <=> col("_st"))
      .filter(bucketMilli(key) < col("rate_milli"))
      .drop("_st")
  }

  /** Deterministic weighted sampling WITHOUT replacement, size k — the
    * Efraimidis–Spirakis A-ES scheme: each row draws u ∈ (0,1) (here a
    * pure function of its key via the rolling hash, so the draw is
    * reproducible on any cluster and replayable in SQL) and the k largest
    * u^(1/w) win. Inclusion probability is proportional to weight at
    * every prefix, which is exactly the "temperature-sample sources by
    * quality score" step of corpus assembly — and unlike rejection
    * sampling it needs ONE pass and no retries.
    *
    * Scale shape: per-row key arithmetic + global top-k — plans
    * TakeOrderedAndProject (per-partition heap of k, merged on the
    * driver), never a full sort.
    *
    * Weights must be strictly positive, and that is ENFORCED in-plan: a
    * NULL weight would give a NULL sort key, zero gives u^∞ = 0 (silently
    * never sampled), and a NEGATIVE weight gives u^(1/w) > 1 — the row
    * would outrank every valid row, the exact opposite of down-weighting.
    * Silent corruption of a sample is worse than a failed job. */
  def weightedTopK(df: DataFrame, key: Column, weight: Column, k: Int): DataFrame = {
    val matches = Names.matcher(df)
    require(!df.columns.exists(matches(_, "_aes_key")),
      "column name _aes_key is reserved by Sampling.weightedTopK")
    // h ∈ [0, 2^31−1) ⇒ u = (h+1)/2^31 ∈ (0, 1]; u=1 maps the best hash
    // to aesKey=1 for every weight — a measure-zero tie broken by key
    val u = (HashFunctions.rolling_hash(key.cast("string")) + 1).cast("double") /
      lit(2147483648.0)
    val checkedW = when(weight.isNull || weight <= 0,
        raise_error(format_string(
          "weightedTopK: weight must be strictly positive, got %s", weight)))
      .otherwise(weight)
    df.withColumn("_aes_key", pow(u, lit(1.0) / checkedW))
      .orderBy(col("_aes_key").desc, key)
      .limit(k)
      .drop("_aes_key")
  }

  /** Disjoint deterministic split `(train, holdout)` at `holdoutMilli`/1000:
    * the same key always lands on the same side, across runs and clusters. */
  def split(df: DataFrame, key: Column, holdoutMilli: Int): (DataFrame, DataFrame) = {
    val b = bucketMilli(key)
    (df.filter(b >= holdoutMilli), df.filter(b < holdoutMilli))
  }

  /** Per-stratum quota: keep at most `k` rows per stratum (the per-domain
    * cap of web-corpus curation — no single site may dominate the mixture),
    * preferring higher `priority` and breaking ties toward the lower `key`
    * — a total, deterministic order, so the kept set is reproducible.
    *
    * Scale shape: the plain formulation is one `row_number` window
    * partitioned by stratum — but a window partition is NOT AQE-splittable,
    * so a viral stratum (one domain with 10⁸ pages) pins to a single task.
    * `presalts > 1` bounds that: a first window ranks within
    * (stratum, hash-salt) keeping k per salt — every global top-k row is
    * necessarily in its salt's top-k, so the final per-stratum window
    * re-ranks at most `presalts × k` rows per stratum. Result-identical to
    * the unsalted plan (PrepOpsSpec asserts it); costs one extra shuffle,
    * buys a hard per-task bound. */
  def capPerStratum(df: DataFrame, stratum: Column, priority: Column, key: Column,
                    k: Int, presalts: Int = 0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(!df.columns.contains("_cap_rk"), "input already has a '_cap_rk' column")
    val W = org.apache.spark.sql.expressions.Window
    val pre = if (presalts > 1) {
      val salt = pmod(HashFunctions.rolling_hash(key.cast("string")), lit(presalts.toLong))
      val w1 = W.partitionBy(stratum, salt).orderBy(priority.desc, key.asc)
      df.withColumn("_cap_rk", row_number().over(w1))
        .filter(col("_cap_rk") <= k).drop("_cap_rk")
    } else df
    val w = W.partitionBy(stratum).orderBy(priority.desc, key.asc)
    pre.withColumn("_cap_rk", row_number().over(w))
      .filter(col("_cap_rk") <= k).drop("_cap_rk")
  }

  /** Deterministic mixture resampling: replicate/drop rows so each stratum
    * approaches a target weight, expressed in milli-copies (1000 = keep as
    * is, 2500 = 2.5×, 400 = keep 40%). A row with weight `w` yields
    * `⌊w/1000⌋` full copies plus one more iff its hash bucket falls below
    * `w mod 1000` — so fractional weights are realized EXACTLY in
    * expectation and deterministically per key: the same row replicates the
    * same way on every run, cluster, and engine (this is how a pre-training
    * data mixture up-weights rare domains/languages without RNG state).
    *
    * Output = input columns + `copy` (1-based replica index). Per-row
    * compute + one `explode`; no shuffle. Strata absent from `weightsMilli`
    * get `defaultMilli`. */
  def resampleMixture(df: DataFrame, key: Column, stratum: Column,
                      weightsMilli: Map[String, Int],
                      defaultMilli: Int = 1000): DataFrame = {
    require((weightsMilli.values ++ Seq(defaultMilli)).forall(_ >= 0),
      "weights must be non-negative")
    require(!df.columns.contains("copy"), "input already has a 'copy' column")
    require(!df.columns.contains("_copies"), "input already has a '_copies' column")
    val w = weightsMilli.foldLeft(lit(defaultMilli)) { case (acc, (s, r)) =>
      when(stratum === s, lit(r)).otherwise(acc)
    }
    val copies = (floor(w / 1000) +
      when(bucketMilli(key) < pmod(w, lit(1000)), 1).otherwise(0)).cast("long")
    df.withColumn("_copies", copies)
      .filter(col("_copies") > 0) // guard: sequence(1, 0) would DEscend
      .withColumn("copy", explode(sequence(lit(1L), col("_copies"))))
      .drop("_copies")
  }
}
