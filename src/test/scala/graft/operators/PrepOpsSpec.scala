package graft.operators

import graft.SparkSuite

import org.apache.spark.sql.functions._

/** Unit specs for the training-prep operators added in round 4: token
  * chunking (t08), mixture resampling (p03), and Bloom-prefiltered exact
  * incremental dedup (d17). */
class PrepOpsSpec extends SparkSuite {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("tokenChunks: boundaries, overlap arithmetic, and empty docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 100).map(i => s"t$i").mkString(" ")), // 100 tokens → 4 chunks
      (2L, (1 to 32).map(i => s"t$i").mkString(" ")),  // exactly one window
      (3L, "only three tokens"),
      (4L, "")                                         // empty → no chunks
    ).toDF("doc_id", "text")
    val got = Chunking.tokenChunks(docs, "doc_id", "text", window = 32, stride = 24)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getString(3))).toMap
    // doc 1: extra = ceil((100−32)/24) = 3 → chunks 0..3; last covers 100−72=28
    assert(got.keys.count(_._1 == 1L) == 4)
    assert((0 to 2).forall(i => got((1L, i.toLong))._1 == 32L))
    assert(got((1L, 3L))._1 == 28L)
    // overlap: chunk 1 starts at token 25 (0-based 24) — 8 tokens shared
    assert(got((1L, 1L))._2 == md5Hex((25 to 56).map(i => s"t$i").mkString(" ")))
    // single-window and sub-window docs yield exactly one chunk
    assert(got.keys.count(_._1 == 2L) == 1 && got((2L, 0L))._1 == 32L)
    assert(got.keys.count(_._1 == 3L) == 1 && got((3L, 0L))._1 == 3L)
    assert(got((3L, 0L))._2 == md5Hex("only three tokens"))
    // empty doc contributes nothing
    assert(!got.keys.exists(_._1 == 4L))
  }

  test("resampleMixture: deterministic fractional replication, zero-weight drop") {
    import spark.implicits._
    val docs = (0L until 1000L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "lang")
    def run() = Sampling.resampleMixture(docs, col("id"), col("lang"),
      Map("a" -> 2500, "b" -> 0), defaultMilli = 1000)
    val out = run().cache()
    // zero weight drops the stratum entirely
    assert(out.filter(col("lang") === "b").count() == 0)
    // every 'a' row lands 2 or 3 copies, totalling ≈2.5× (hash buckets are
    // near-uniform over 500 keys — generous tolerance)
    val perDoc = out.filter(col("lang") === "a").groupBy("id")
      .agg(count(lit(1)).as("c"), max("copy").as("mx")).collect()
    assert(perDoc.length == 500)
    assert(perDoc.forall(r => r.getLong(1) == 2L || r.getLong(1) == 3L))
    assert(perDoc.forall(r => r.getLong(2) == r.getLong(1))) // copy is 1..c
    // the extra-copy population is exactly the keys whose hash bucket is
    // below frac(w)=500‰ (no uniformity assumption: 3-char numeric keys
    // hash into a structured bucket set)
    val expectExtra = docs.filter(col("lang") === "a")
      .filter(Sampling.bucketMilli(col("id")) < 500).count()
    val total = perDoc.map(_.getLong(1)).sum
    assert(total == 2 * 500 + expectExtra, s"total $total != ${2 * 500 + expectExtra}")
    // reproducible: the same rows replicate the same way on a rerun
    val again = run()
    assert(out.except(again).isEmpty && again.except(out).isEmpty)
    out.unpersist()
  }

  test("linearScore: bias on empty docs, per-occurrence additivity, keep flag") {
    import spark.implicits._
    val w: Seq[Long] = (0 until 64).map(i => (i * 2654435761L) % 2001L - 1000L)
    val docs = Seq((1L, ""), (2L, "foo"), (3L, "foo foo"), (4L, "foo bar"))
      .toDF("doc_id", "text")
    val out = Scoring.linearScore(docs, "text", w, biasMilli = 50L)
    assert(out.columns.toSeq == Seq("doc_id", "text", "n_tokens", "score_milli", "keep"))
    val got = out.select("doc_id", "n_tokens", "score_milli", "keep")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got(1L) == ((0L, 50L, true))) // no tokens → score = bias
    val fooW = got(2L)._2 - 50L
    assert(w.contains(fooW)) // a single token contributes exactly one weight
    assert(got(3L) == ((2L, 50L + 2 * fooW, 50L + 2 * fooW >= 0))) // per occurrence
    val barW = got(4L)._2 - 50L - fooW
    assert(w.contains(barW)) // mixed doc = sum of per-token weights
    assert(got.values.forall(v => v._3 == (v._2 >= 0L)))
  }

  test("capPerStratum: quota, priority order, ties, and salted == unsalted") {
    import spark.implicits._
    // stratum a: 10 rows, priorities 0..9; stratum b: 3 rows sharing one
    // priority (ties resolve to lower key); stratum c: under quota
    val rows = (0L until 10L).map(i => ("a", i, i % 5)) ++
      Seq(("b", 20L, 7L), ("b", 21L, 7L), ("b", 22L, 7L), ("c", 30L, 1L))
    val df = rows.toDF("src", "id", "prio")
    def run(presalts: Int) = Sampling.capPerStratum(
      df, col("src"), col("prio"), col("id"), k = 2, presalts = presalts)
    val plain = run(0).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // a: prio 4 appears at ids 4 and 9 → both kept; b: tie → ids 20,21; c: all
    assert(plain == Set(("a", 4L), ("a", 9L), ("b", 20L), ("b", 21L), ("c", 30L)))
    val salted = run(4).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(salted == plain) // the skew-bounded plan is result-identical
  }

  test("gapFill: grid completeness, in-bucket last wins, fill across gaps") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.from(java.time.Instant.parse(s))
    val ev = Seq(
      // user 1: two obs in hour 0 (later one wins), gap over hours 1-2, obs at hour 3
      (1L, ts("2024-05-01T00:10:00Z"), 100L),
      (1L, ts("2024-05-01T00:40:00Z"), 200L),
      (1L, ts("2024-05-01T03:05:00Z"), 300L),
      // user 2: single observation → single grid point
      (2L, ts("2024-05-02T07:30:00Z"), 900L)
    ).toDF("uid", "t", "v")
    val got = Timeseries.gapFillHourly(ev, col("uid"), col("t"), col("v"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toInstant.toString, r.getLong(2)))
      .toSet
    assert(got == Set(
      (1L, "2024-05-01T00:00:00Z", 200L), // later in-bucket obs wins
      (1L, "2024-05-01T01:00:00Z", 200L), // gap hours repeat the prior value
      (1L, "2024-05-01T02:00:00Z", 200L),
      (1L, "2024-05-01T03:00:00Z", 300L),
      (2L, "2024-05-02T07:00:00Z", 900L)))
  }

  test("exactIncremental == plain exact anti-join on planted duplicates") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet").cache()
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
      .select(col("doc_id"), col("text"))
      .unionByName(docs.filter(pmod(col("doc_id"), lit(15)) === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    val got = Dedup.exactIncremental(batch, corpus, "doc_id", "text",
      expectedItems = 10000L)
    // reference result: plain anti-join on the content hash + min-id keeper
    val expected = batch.select(col("doc_id"), md5(col("text")).as("h"))
      .join(corpus.select(md5(col("text")).as("h")), Seq("h"), "left_anti")
      .groupBy("h").agg(min("doc_id").as("doc_id")).select("doc_id")
    assert(got.except(expected).isEmpty && expected.except(got).isEmpty)
    // the plant is live: some batch docs were actually dropped
    assert(got.count() < batch.count())
  }

  test("exactIncremental: empty corpus keeps every distinct batch doc") {
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val got = Dedup.exactIncremental(batch, docs.limit(0), "doc_id", "text")
    assert(got.count() == batch.select(md5(col("text"))).distinct().count())
  }

  test("exactIncremental's Bloom-cap raise never touches the caller session") {
    // the build runs on a throwaway child session; a sizing far past the
    // AQE default caps (4e6 items / 6.7e7 bits) must leave the caller's
    // runtime-bloom confs byte-identical — concurrent AQE runtime-filter
    // queries read these keys mid-build
    val itemsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumItems"
    val bitsKey = "spark.sql.optimizer.runtime.bloomFilter.maxNumBits"
    val (items0, bits0) = (spark.conf.get(itemsKey), spark.conf.get(bitsKey))
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
    val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
    val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
    val n = Dedup.exactIncremental(batch, corpus, "doc_id", "text",
      expectedItems = 50000000L).count()
    assert(n > 0)
    assert(spark.conf.get(itemsKey) == items0 && spark.conf.get(bitsKey) == bits0)
  }
}
