package graft.queries

import graft.functions.{HashFunctions, Redact, Text}
import graft.operators.{AsOf, Chunking, Clustering, Dedup, Indexing, Multimodal, Packing, RangeJoin, Sampling, Similarity, Upsert}

import org.apache.spark.sql.functions._

/** Training-data pipeline operators as verifiable queries (SURVEY.md §2B
  * "extensions" row + the builder brief): deduplication (exact, n-gram
  * Jaccard, MinHash+LSH, SimHash), embedding similarity search, text
  * analysis (language-ID, quality, token counts, fingerprints), multimodal
  * binary plumbing, and a lake-codec round-trip.
  *
  * Oracle notes: the DuckDB SQL is generated from the same Scala constants
  * (stopword lists, shingle size, thresholds) as the Spark plan, so the two
  * sides cannot drift. Ratio-valued outputs are integer milli-units
  * (floor(x*1000+0.5)) — exact cross-engine comparison, no float rounding
  * hazard. Approximate operators (SimHash pairs, SRP-LSH ANN) get rows-only
  * checks; their exact counterparts (Jaccard pairs, brute-force ANN) are
  * the oracle-checked ground truth, and MinHash is verified against the
  * EXACT Jaccard oracle — its banded recall at the 0.8 threshold leaves
  * P[miss] ≈ 5e-8, so agreement is expected, not hoped for.
  */
object Pipeline {
  import Tables.t

  private val ShingleN = 3
  private val JaccardThreshold = 0.8
  /** Stop-shingle cap for the registered d02: shingles shared by more docs
    * than this are dropped from the Jaccard universe (posting lists longer
    * than the cap contribute O(len²) candidate pairs for near-zero signal —
    * the standard exact-dedup scale guard). Mirrored in the oracle SQL. */
  private val MaxShingleFreq = 1000

  /** Tokenizer in DuckDB terms — must mirror [[Text.tokens]]. The
    * whitespace class is EXPLICIT, not `\s`: Java (Spark's regex engine)
    * counts vertical tab in `\s`, RE2 (DuckDB's) does not — the same
    * dialect trap [[Dedup.exactNormalized]] documents. */
  private val sqlTokens =
    """list_filter(string_split_regex(lower(text), '[ \t\n\x0B\f\r]+'), x -> len(x) > 0)"""

  /** CTE chain computing capped-universe Jaccard pairs ≥ threshold from a
    * `(doc_id, text)` source relation `src` (mirrors [[Dedup.jaccardPairs]]'
    * semantics — the prefix-filter plan computes the identical result set).
    * Terminal CTE: `jpairs(a_id, b_id, jaccard_milli)`. */
  private def jaccardCtes(cap: Int, src: String): String = {
    val posting =
      if (cap > 0)
        s"""posting AS (
           |  SELECT doc_id, sh FROM sh
           |  WHERE sh NOT IN (SELECT sh FROM sh GROUP BY sh HAVING count(*) > $cap)),""".stripMargin
      else "posting AS (SELECT doc_id, sh FROM sh),"
    s"""toks AS (
       |  SELECT doc_id, $sqlTokens AS w FROM $src),
       |sh AS (
       |  SELECT DISTINCT doc_id, array_to_string(w[i:i+${ShingleN - 1}], ' ') AS sh
       |  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(w) - ${ShingleN - 1}, 0) + 1)) AS i) g),
       |$posting
       |sizes AS (SELECT doc_id, count(*) AS sz FROM posting GROUP BY doc_id),
       |pairs AS (
       |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
       |  FROM posting a JOIN posting b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |jpairs AS (
       |  SELECT a_id, b_id,
       |    CAST(floor(inter * 1000.0 / (sa.sz + sb.sz - inter) + 0.5) AS BIGINT) AS jaccard_milli
       |  FROM pairs
       |  JOIN sizes sa ON sa.doc_id = a_id
       |  JOIN sizes sb ON sb.doc_id = b_id
       |  WHERE floor(inter * 1000.0 / (sa.sz + sb.sz - inter) + 0.5) >= ${(JaccardThreshold * 1000).toInt})""".stripMargin
  }

  private def jaccardOracle(cap: Int): String =
    s"""WITH ${jaccardCtes(cap, "documents")}
       |SELECT a_id, b_id, jaccard_milli FROM jpairs ORDER BY a_id, b_id""".stripMargin

  /** Near-dup cosine threshold for d08/d09 (milli-units in the output). */
  private val CosineThreshold = 0.95

  /** Embeddings corpus with planted near-dups: perturbed copies (second
    * half of the vector scaled ×1.05) of the first 50 vectors, ids offset
    * by 1,000,000. Mirrored exactly by [[cosinePairOracle]]'s CTE. */
  private def plantedEmbeddings(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val base = t(s, dir, "embeddings")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("embedding"))
    val planted = base.filter(col("vec_id") < 50)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        concat(slice(col("embedding"), 1, 32),
          transform(slice(col("embedding"), 33, 32), x => x * 1.05)).as("embedding"))
    base.unionByName(planted)
  }

  /** Exact near-dup pair SQL over the same planted corpus (mirrors
    * [[Similarity.cosinePairs]] on [[plantedEmbeddings]]). */
  private val cosinePairOracle: String =
    s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
       |planted AS (
       |  SELECT vec_id + 1000000 AS vec_id,
       |    list_concat(emb[1:32], list_transform(emb[33:64], x -> x * 1.05)) AS emb
       |  FROM base WHERE vec_id < 50),
       |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
       |p AS (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |    list_cosine_similarity(a.emb, b.emb) AS c
       |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
       |SELECT a_id, b_id, CAST(floor(c * 1000 + 0.5) AS BIGINT) AS cos_milli
       |FROM p WHERE floor(c * 1000 + 0.5) >= ${(CosineThreshold * 1000).toInt}
       |ORDER BY a_id, b_id""".stripMargin

  /** Stopword-hit expression in DuckDB terms — mirrors [[Text.stopwordHits]]. */
  private def sqlHits(words: Seq[String]): String =
    words.map(w => s"CAST(((' ' || lower(text) || ' ') LIKE '% $w %') AS BIGINT)").mkString(" + ")

  /** Language-ID CASE expression in DuckDB terms — mirrors [[Text.langId]]
    * (max stopword score wins, ties to the earlier language, no hits →
    * 'unknown'). Shared by t02 and the curation pipeline. */
  private def langCaseSql: String = {
    val scores = Text.StopwordSets.map { case (lang, ws) => lang -> s"(${sqlHits(ws)})" }
    val Seq((l1, s1), (l2, s2), (l3, s3), (l4, s4)) = scores
    s"""CASE WHEN text IS NULL THEN 'unknown'
       |     WHEN $s1 = 0 AND $s2 = 0 AND $s3 = 0 AND $s4 = 0 THEN 'unknown'
       |     WHEN $s1 >= $s2 AND $s1 >= $s3 AND $s1 >= $s4 THEN '$l1'
       |     WHEN $s2 >= $s3 AND $s2 >= $s4 THEN '$l2'
       |     WHEN $s3 >= $s4 THEN '$l3'
       |     ELSE '$l4' END""".stripMargin
  }

  /** Alpha-ratio (milli) expression in DuckDB terms — mirrors
    * [[Text.qualityColumns]]'s `alpha_ratio_milli`. */
  private val alphaMilliSql: String =
    """CASE WHEN length(text) > 0
      |  THEN CAST(floor(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000.0 / length(text) + 0.5) AS BIGINT)
      |  ELSE 0 END""".stripMargin

  /** Oracle for the end-to-end curation pipeline (quality → language →
    * exact dedup → near-dup removal), each stage mirroring its Spark
    * operator. */
  private def curationOracle: String =
    s"""WITH quality AS (
       |  SELECT doc_id, text FROM documents
       |  WHERE CAST(len($sqlTokens) AS BIGINT) >= 10
       |    AND ($alphaMilliSql) >= 500
       |    AND ($langCaseSql) = 'en'),
       |keep AS (SELECT min(doc_id) AS doc_id FROM quality GROUP BY md5(text)),
       |kept AS (SELECT doc_id, text FROM quality WHERE doc_id IN (SELECT doc_id FROM keep)),
       |${jaccardCtes(0, "kept")},
       |nd AS (SELECT DISTINCT b_id AS doc_id FROM jpairs)
       |SELECT doc_id FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM nd)
       |ORDER BY doc_id""".stripMargin

  def defs: Map[String, QueryDef] = Map(

    // ------------------------------------------------------------- dedup
    "d01_dedup_exact" -> QueryDef(
      (s, dir) => Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("content_hash"),
      Some("""SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin)),

    "d12_dedup_normalized" -> QueryDef(
      (s, dir) => Dedup.exactNormalized(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("content_hash"),
      Some("""SELECT md5(regexp_replace(trim(lower(text)), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS content_hash,
             |  min(doc_id) AS keep_id, count(*) AS n_copies
             |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin)),

    "d02_jaccard_pairs" -> QueryDef(
      (s, dir) => Dedup.jaccardPairs(t(s, dir, "documents"), "doc_id", "text",
        ShingleN, JaccardThreshold, MaxShingleFreq).orderBy("a_id", "b_id"),
      Some(jaccardOracle(MaxShingleFreq))),

    // MinHash+LSH candidates verified with exact Jaccard — checked against
    // the exact (uncapped) oracle (recall argument in the header).
    "d03_minhash_pairs" -> QueryDef(
      (s, dir) => Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
        ShingleN, JaccardThreshold).orderBy("a_id", "b_id"),
      Some(jaccardOracle(0))),

    "d04_simhash" -> QueryDef(
      (s, dir) => Dedup.simhash(t(s, dir, "documents"), "doc_id", "text")
        .orderBy("id"),
      None),

    "d05_simhash_pairs" -> QueryDef(
      (s, dir) => Dedup.simhashPairs(t(s, dir, "documents"), "doc_id", "text", 3)
        .orderBy("a_id", "b_id"),
      None),

    // Incremental dedup: the steady-state pipeline shape — a new batch
    // (every 5th doc) screened against the already-deduplicated corpus
    // (the rest) plus its own earlier arrivals, without any corpus
    // self-join. LSH + exact verify on the Spark side; the oracle computes
    // the exact cross-relation Jaccard directly (d03's recall argument
    // makes agreement expected, not hoped for).
    "d16_dedup_incremental" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
        Dedup.incremental(batch, corpus, "doc_id", "text",
          ShingleN, JaccardThreshold).orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $sqlTokens AS w FROM documents),
              |sh AS (
              |  SELECT DISTINCT doc_id, array_to_string(w[i:i+${ShingleN - 1}], ' ') AS sh
              |  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(w) - ${ShingleN - 1}, 0) + 1)) AS i) g),
              |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
              |pairs AS (
              |  SELECT b.doc_id AS b_id, o.doc_id AS o_id, count(*) AS inter
              |  FROM sh b JOIN sh o ON b.sh = o.sh
              |  WHERE b.doc_id % 5 = 0 AND b.doc_id <> o.doc_id
              |    AND (o.doc_id % 5 <> 0 OR o.doc_id < b.doc_id)
              |  GROUP BY 1, 2),
              |dropped AS (
              |  SELECT DISTINCT b_id FROM pairs
              |  JOIN sizes sb ON sb.doc_id = b_id
              |  JOIN sizes so ON so.doc_id = o_id
              |  WHERE floor(inter * 1000.0 / (sb.sz + so.sz - inter) + 0.5)
              |    >= ${(JaccardThreshold * 1000).toInt})
              |SELECT doc_id FROM documents
              |WHERE doc_id % 5 = 0 AND doc_id NOT IN (SELECT b_id FROM dropped)
              |ORDER BY doc_id""".stripMargin)),

    // Bloom-prefiltered incremental EXACT dedup (the "same page crawled
    // again" steady state, d16's exact sibling). Built on Spark's native
    // BloomFilterAggregate / BloomFilterMightContain — distributed build,
    // codegen'd probe, no UDF. The fixture has no cross-doc exact dups, so
    // duplicates are PLANTED: the corpus additionally carries re-id'd
    // copies of every 15th doc's text (t06's planted-ground-truth pattern)
    // — those batch docs must drop, everything else survives. Bloom false
    // positives can't affect the result (every hit is exact-verified), so
    // the oracle is plain exact SQL.
    "d17_dedup_bloom" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val batch = docs.filter(pmod(col("doc_id"), lit(5)) === 0)
        val corpus = docs.filter(pmod(col("doc_id"), lit(5)) =!= 0)
          .select(col("doc_id"), col("text"))
          .unionByName(docs.filter(pmod(col("doc_id"), lit(15)) === 0)
            .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
        Dedup.exactIncremental(batch, corpus, "doc_id", "text",
          expectedItems = 100000L).orderBy("doc_id")
      },
      Some("""WITH corpus AS (
             |  SELECT text FROM documents WHERE doc_id % 5 <> 0
             |  UNION ALL SELECT text FROM documents WHERE doc_id % 15 = 0),
             |batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
             |survivors AS (
             |  SELECT doc_id, md5(text) AS h FROM batch
             |  WHERE md5(text) NOT IN (SELECT md5(text) FROM corpus))
             |SELECT min(doc_id) AS doc_id FROM survivors GROUP BY h
             |ORDER BY doc_id""".stripMargin)),

    // Benchmark decontamination: flag training docs sharing any 5-gram
    // with the eval set. The fixture has no external benchmark, so the
    // eval set is PLANTED as verbatim 12-token spans lifted from every
    // 50th doc (the real contamination scenario: benchmark items quote
    // the crawl) — span extraction mirrored exactly in the oracle. Flags
    // the span sources plus their near-dup twins.
    "d13_decontaminate" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents")
        val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
          .select(col("doc_id").as("bench_id"),
            concat_ws(" ", slice(Text.tokens(col("text")), 6, 12)).as("bench_text"))
        Dedup.decontaminate(docs, "doc_id", "text",
          bench, "bench_id", "bench_text", shingleN = 5)
          .orderBy("doc_id")
      },
      Some(s"""WITH toks AS (SELECT doc_id, $sqlTokens AS w FROM documents),
              |bsh AS (
              |  SELECT DISTINCT bench_id, array_to_string(w[i:i+4], ' ') AS sh
              |  FROM (SELECT doc_id AS bench_id, w[6:17] AS w FROM toks
              |        WHERE doc_id % 50 = 0) b,
              |  LATERAL (SELECT unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS i) g),
              |tsh AS (
              |  SELECT DISTINCT doc_id, array_to_string(w[i:i+4], ' ') AS sh
              |  FROM toks, LATERAL (SELECT unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS i) g)
              |SELECT doc_id, count(DISTINCT bench_id) AS n_bench_docs,
              |  count(DISTINCT sh) AS n_shared_shingles
              |FROM tsh JOIN bsh USING (sh)
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // -------------------------------------------------------- similarity
    "d06_knn_bruteforce" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 10), 5)
          .orderBy("query_id", "rank")
      },
      Some("""WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qe
             |          FROM embeddings WHERE vec_id < 10),
             |c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS ce FROM embeddings),
             |s AS (SELECT query_id, neighbor_id, list_cosine_similarity(qe, ce) AS cosine
             |      FROM q, c WHERE query_id <> neighbor_id),
             |r AS (SELECT query_id, neighbor_id, cosine,
             |        row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
             |      FROM s)
             |SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, round(cosine, 6) AS cosine
             |FROM r WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin)),

    "d07_knn_srp" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.srpTopK(emb, emb.filter(col("vec_id") < 10), 5)
          .orderBy("query_id", "rank")
      },
      None),

    // IVF ANN: coarse-quantizer cells + probe re-rank (the second scale
    // path next to SRP-LSH; recall vs brute force asserted in PipelineSpec).
    "d10_knn_ivf" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), 5)
          .orderBy("query_id", "rank")
      },
      None),

    // Embedding-cosine near-dup. The synthetic embeddings carry no natural
    // near-dups (max pairwise cosine ≈ 0.51), so the corpus is augmented
    // in-query with perturbed copies of the first 50 vectors (second half
    // scaled ×1.05 → cosine ≈ 0.9997) — identical augmentation in the
    // oracle SQL, so ground truth is planted and verifiable at any SF.
    // d08 = exact quadratic baseline; d09 = SRP-banded scale path, checked
    // against the SAME exact oracle (recall argument at srpNearDupPairs).
    "d08_embedding_neardup" -> QueryDef(
      (s, dir) => Similarity.cosinePairs(plantedEmbeddings(s, dir), CosineThreshold)
        .orderBy("a_id", "b_id"),
      Some(cosinePairOracle)),

    "d09_embedding_neardup_lsh" -> QueryDef(
      (s, dir) => Similarity.srpNearDupPairs(plantedEmbeddings(s, dir), CosineThreshold)
        .orderBy("a_id", "b_id"),
      Some(cosinePairOracle)),

    // Embedding clustering: deterministic cosine argmax over fixed seed
    // centroids (the k-means assignment step / IVF coarse quantizer —
    // per-row compute, unshuffled corpus scan). Seeds = the 8 lowest-id
    // vectors on both sides; full Lloyd iterations are covered by the
    // PipelineSpec k-means test (the iterative means are float-order-
    // sensitive, so the hash-exact gate pins the assignment step).
    "d14_kmeans_assign" -> QueryDef(
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        val cents = Clustering.seedCentroids(emb.filter(col("vec_id") < 8), 8)
        Clustering.assign(emb, cents.toSeq).orderBy("vec_id")
      },
      Some("""WITH c AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
             |cent AS (SELECT vec_id AS cid, emb AS cemb FROM c WHERE vec_id < 8),
             |scored AS (SELECT c.vec_id, cent.cid,
             |    list_cosine_similarity(c.emb, cent.cemb) AS cos
             |  FROM c, cent),
             |best AS (SELECT vec_id, cid, cos,
             |    row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid DESC) AS rn
             |  FROM scored)
             |SELECT vec_id, cid AS cluster_id,
             |  CAST(floor(cos * 1000 + 0.5) AS BIGINT) AS cos_milli
             |FROM best WHERE rn = 1 ORDER BY vec_id""".stripMargin)),

    // SemDedup (cluster-then-dedup): near-dup removal scoped WITHIN each
    // cluster — clustering bounds the quadratic pair search. Runs on the
    // planted near-dup corpus (d08's pattern) so there is real ground
    // truth to remove; the oracle mirrors assignment + in-cluster pair
    // drop exactly.
    "d15_semdedup" -> QueryDef(
      (s, dir) => {
        val corpus = plantedEmbeddings(s, dir)
        val cents = Clustering.seedCentroids(corpus.filter(col("vec_id") < 8), 8)
        Clustering.semDedup(corpus, cents.toSeq, CosineThreshold).orderBy("vec_id")
      },
      Some(s"""WITH base AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
              |planted AS (
              |  SELECT vec_id + 1000000 AS vec_id,
              |    list_concat(emb[1:32], list_transform(emb[33:64], x -> x * 1.05)) AS emb
              |  FROM base WHERE vec_id < 50),
              |corpus AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
              |cent AS (SELECT vec_id AS cid, emb AS cemb FROM corpus WHERE vec_id < 8),
              |scored AS (SELECT c.vec_id, c.emb, cent.cid,
              |    list_cosine_similarity(c.emb, cent.cemb) AS cos
              |  FROM corpus c, cent),
              |asg AS (SELECT vec_id, emb, cid FROM (
              |    SELECT vec_id, emb, cid,
              |      row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, cid DESC) AS rn
              |    FROM scored) t WHERE rn = 1),
              |dropped AS (
              |  SELECT DISTINCT b.vec_id
              |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id
              |  WHERE floor(list_cosine_similarity(a.emb, b.emb) * 1000 + 0.5)
              |    >= ${(CosineThreshold * 1000).toInt})
              |SELECT vec_id, cid AS cluster_id FROM asg
              |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
              |ORDER BY vec_id""".stripMargin)),

    // ------------------------------------------------------ text analysis
    "t01_text_stats" -> QueryDef(
      (s, dir) => {
        val cols = Text.qualityColumns(col("text")).map { case (n, c) => c.as(n) }
        t(s, dir, "documents").select((col("doc_id") +: cols): _*).orderBy("doc_id")
      },
      Some(s"""WITH tk AS (SELECT doc_id, text, $sqlTokens AS w FROM documents)
              |SELECT doc_id,
              |  CAST(length(text) AS BIGINT) AS n_chars,
              |  CAST(len(w) AS BIGINT) AS n_words,
              |  CASE WHEN len(w) > 0
              |    THEN CAST(floor((length(text) - (len(w) - 1)) * 1000.0 / len(w) + 0.5) AS BIGINT)
              |    ELSE 0 END AS mean_word_len_milli,
              |  CASE WHEN length(text) > 0
              |    THEN CAST(floor(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1000.0 / length(text) + 0.5) AS BIGINT)
              |    ELSE 0 END AS alpha_ratio_milli,
              |  ${sqlHits(Text.StopwordSets.flatMap(_._2).distinct)} AS stopword_hits
              |FROM tk ORDER BY doc_id""".stripMargin)),

    "t02_langid" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), Text.langId(col("text")).as("pred_lang"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id, $langCaseSql AS pred_lang
              |FROM documents ORDER BY doc_id""".stripMargin)),

    "t03_token_count" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          size(Text.tokens(col("text"))).cast("long").as("ws_tokens"),
          size(Text.lexTokens(col("text"))).cast("long").as("lex_tokens"))
        .orderBy("doc_id"),
      Some(s"""SELECT doc_id,
              |  CAST(len($sqlTokens) AS BIGINT) AS ws_tokens,
              |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \\t\\n\\x0B\\f\\r]')) AS BIGINT) AS lex_tokens
              |FROM documents ORDER BY doc_id""".stripMargin)),

    // Custom Catalyst expression (RollingHash) vs the oracle computing the
    // identical fold with list_reduce — the expression's contract is
    // SQL-reproducibility.
    "t04_fingerprint" -> QueryDef(
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), HashFunctions.rolling_hash(col("text")).as("fingerprint"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  list_reduce(
             |    list_prepend(7::BIGINT, list_transform(string_split(text, ''), c -> ord(c)::BIGINT)),
             |    (acc, c) -> (acc * 31 + c) % 2147483647) AS fingerprint
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // -------------------------------------------------------- multimodal
    "m01_binary_stats" -> QueryDef(
      (s, dir) => Multimodal.binaryStats(
        Multimodal.synthesize(t(s, dir, "documents"), "doc_id", "text").toDF())
        .orderBy("media_id"),
      Some("""SELECT doc_id AS media_id,
             |  CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
             |  sha256(text) AS sha256,
             |  hex(left(text, 8)) AS magic_hex
             |FROM documents ORDER BY media_id""".stripMargin)),

    "m02_decode_features" -> QueryDef(
      (s, dir) => Multimodal.decodeFeatures(
        Multimodal.synthesize(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select(col("media_id"), col("n_bytes"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          floor(element_at(col("feature"), 1) * 1000 + 0.5).cast("long").as("f0_milli"))
        .orderBy("media_id"),
      None),

    // Near-dup clusters: connected components of the near-dup pair graph,
    // each doc labeled with its cluster's min id (the keeper). Pairs come
    // from the MinHash path — the scale default, which verifies against
    // UNCAPPED exact Jaccard (d03's oracle) — so the reachability oracle
    // uses the uncapped universe too.
    "d11_dedup_clusters" -> QueryDef(
      (s, dir) => Dedup.connectedComponents(
        Dedup.minhashPairs(t(s, dir, "documents"), "doc_id", "text",
          ShingleN, JaccardThreshold))
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE ${jaccardCtes(0, "documents")},
              |edges AS (
              |  SELECT a_id AS u, b_id AS v FROM jpairs
              |  UNION SELECT b_id, a_id FROM jpairs),
              |cc(node, label) AS (
              |  SELECT u, u FROM (SELECT DISTINCT u FROM edges) t
              |  UNION
              |  SELECT e.u, c.label FROM edges e JOIN cc c ON c.node = e.v)
              |SELECT node AS doc_id, min(label) AS component_id
              |FROM cc GROUP BY node ORDER BY doc_id""".stripMargin)),

    // As-of join: each view event paired with the user's most recent
    // purchase at-or-before it — verified against DuckDB's NATIVE ASOF
    // JOIN (build rows are unique per (user, ts) in the fixture).
    "q40_asof_join" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val views = ev.filter(col("event_type") === "view")
          .select("event_id", "user_id", "ts")
        // pre-aggregate to ONE build row per (user, ts): with duplicate
        // timestamps both Spark's ordered forward-fill and DuckDB's ASOF
        // pick an arbitrary winner — max() pins the tie identically on
        // both sides (AsOf.join's documented uniqueness contract)
        val purchases = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id"), col("ts"))
          .agg(max(floor(col("value") * 100 + 0.5).cast("long")).as("pval_cents"))
        AsOf.join(views, purchases, Seq("user_id"), "ts", "ts")
          .select(col("event_id"), col("user_id"), col("ts"),
            col("asof_ts").as("last_purchase_ts"),
            col("asof_pval_cents").as("last_purchase_cents"))
          .orderBy("event_id")
      },
      Some("""WITH v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
             |p AS (SELECT user_id, ts AS pts,
             |        max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS pval_cents
             |      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
             |SELECT v.event_id, v.user_id, v.ts,
             |  p.pts AS last_purchase_ts, p.pval_cents AS last_purchase_cents
             |FROM v ASOF LEFT JOIN p ON v.user_id = p.user_id AND v.ts >= p.pts
             |ORDER BY v.event_id""".stripMargin)),

    // Range join: clicks landing inside each signup's 2-hour window —
    // bucketed equi-join + exact post-filter on the Spark side, DuckDB's
    // native range join as the oracle. No equi-key exists; intervals
    // overlap, so pairs are genuinely many-to-many.
    "q41_range_join" -> QueryDef(
      (s, dir) => {
        val ev = t(s, dir, "events")
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("ts"),
            floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        val windows = ev.filter(col("event_type") === "signup")
          .select(col("event_id").as("iv_id"), col("ts").as("start_ts"),
            (col("ts") + expr("INTERVAL 2 HOURS")).as("end_ts"))
        RangeJoin.pointInInterval(clicks, "ts", windows, "start_ts", "end_ts")
          .groupBy("iv_id")
          .agg(count(lit(1)).as("n_clicks"), sum(col("cents")).as("sum_cents"))
          .orderBy("iv_id")
      },
      Some("""WITH c AS (SELECT event_id, ts, CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
             |          FROM events WHERE event_type = 'click'),
             |w AS (SELECT event_id AS iv_id, ts AS start_ts, ts + INTERVAL 2 HOUR AS end_ts
             |      FROM events WHERE event_type = 'signup')
             |SELECT iv_id, count(*) AS n_clicks, CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM w JOIN c ON c.ts >= w.start_ts AND c.ts < w.end_ts
             |GROUP BY iv_id ORDER BY iv_id""".stripMargin)),

    // --------------------------------------------------- curation capstone
    // The end-to-end training-data use case: quality gates → language
    // filter → exact dedup (min-id keeper) → near-dup removal (greedy:
    // drop the higher id of each surviving Jaccard pair). Every stage is
    // the already-verified operator; the oracle mirrors the whole chain.
    "p01_corpus_curation" -> QueryDef(
      (s, dir) => {
        val docs = t(s, dir, "documents").select(col("doc_id"), col("text"))
        val qc = Text.qualityColumns(col("text")).toMap
        // Materialize the stage boundary with localCheckpoint: everything
        // downstream (exact dedup, the near-dup chain's several
        // self-references, the final anti-join) would otherwise re-run the
        // full quality+langid scan per reference. Unlike persist(), the
        // checkpointed blocks are freed by the ContextCleaner once the
        // query's result is consumed — no per-run cache leak. (On a real
        // cluster, prefer reliable checkpoint() for executor-loss
        // tolerance.)
        val quality = docs.filter(
          qc("n_words") >= 10 && qc("alpha_ratio_milli") >= 500 &&
            Text.langId(col("text")) === "en").localCheckpoint()
        val keep = Dedup.exact(quality, "doc_id", "text").select(col("keep_id").as("doc_id"))
        val kept = quality.join(keep, Seq("doc_id"), "left_semi").localCheckpoint()
        // Near-dup stage uses the MinHash path — the scale default, which
        // verifies against UNCAPPED exact Jaccard (d03's oracle); the
        // curation oracle's near-dup CTE is uncapped to match.
        val nearDropped = Dedup.minhashPairs(kept, "doc_id", "text",
          ShingleN, JaccardThreshold)
          .select(col("b_id").as("doc_id")).distinct()
        kept.join(nearDropped, Seq("doc_id"), "left_anti")
          .select("doc_id").orderBy("doc_id")
      },
      Some(curationOracle)),

    // Sequence packing: curated docs → fixed token-budget training bins.
    // Deterministic contiguous fill within rolling-hash buckets (global
    // packing is one sequential cumsum = a single-partition window; the
    // bucketed rule is the parallel, layout-stable variant). The oracle
    // reproduces the identical hash, order, cumsum, and bin arithmetic.
    "p02_pack_sequences" -> QueryDef(
      (s, dir) => Packing.packedBins(t(s, dir, "documents"),
          "doc_id", "text", capacity = 512L, buckets = 8)
        .orderBy("bucket", "bin"),
      Some(s"""WITH tk AS (
              |  SELECT doc_id, CAST(len($sqlTokens) AS BIGINT) AS n_tokens,
              |    list_reduce(
              |      list_prepend(7::BIGINT, list_transform(
              |        string_split(CAST(doc_id AS VARCHAR), ''), c -> ord(c)::BIGINT)),
              |      (acc, c) -> (acc * 31 + c) % 2147483647) % 8 AS bucket
              |  FROM documents),
              |c AS (
              |  SELECT doc_id, bucket, n_tokens,
              |    COALESCE(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
              |  FROM tk)
              |SELECT bucket, CAST(floor(cum_before / 512) AS BIGINT) AS bin,
              |  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
              |FROM c GROUP BY 1, 2 ORDER BY bucket, bin""".stripMargin)),

    // Frame sampling through the batched media path: the slicing stub is
    // deterministic, so the oracle reproduces the exact byte windows —
    // verifying schema, batching, and stride math end-to-end.
    "m03_frame_sample" -> QueryDef(
      (s, dir) => Multimodal.sampleFrames(
        Multimodal.synthesize(t(s, dir, "documents"), "doc_id", "text"))
        .toDF()
        .select(col("media_id"), col("frame_no").cast("long").as("frame_no"),
          hex(col("payload")).as("frame_hex"))
        .orderBy("media_id", "frame_no"),
      // DuckDB can't slice BLOBs; the fixture text is pure ASCII (asserted:
      // octet_length(encode(text)) == length(text) at every SF), so char
      // substring == byte window and encode() yields the same bytes.
      Some("""WITH f AS (
             |  SELECT doc_id AS media_id, octet_length(encode(text)) AS n, text
             |  FROM documents),
             |k AS (SELECT unnest(range(0, 3)) AS frame_no)
             |SELECT media_id, CAST(frame_no AS BIGINT) AS frame_no,
             |  hex(encode(substring(text,
             |    CAST(1 + frame_no * greatest((n - 16) // 2, 0) AS INT), 16))) AS frame_hex
             |FROM f, k ORDER BY media_id, frame_no""".stripMargin)),

    // ------------------------------------------------------------- TF-IDF
    // Per-document top-3 salient terms by tf·idf. idf here is the RAW
    // inverse frequency N/df — kept rational so tf·N·1000/df is integer-
    // exact on both engines (log-smoothed idf has the same plan shape but
    // ln() differs in final ulps across libms, which an exact hash compare
    // can't tolerate). Plan: explode → (doc,term) counts → term df —
    // two shuffles — then a per-doc top-k window, never a global sort.
    "t05_tfidf" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val docs = t(s, dir, "documents")
        val n = docs.count() // corpus size: one cheap metadata-ish job
        val terms = docs.select(col("doc_id"),
          explode(Text.tokens(col("text"))).as("term"))
        val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id")
          .orderBy(col("tfidf_milli").desc, col("term"))
        tf.join(dfreq, "term")
          .withColumn("tfidf_milli",
            floor(col("tf") * lit(n) * 1000 / col("df") + 0.5).cast("long"))
          .withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .select(col("doc_id"), col("rk"), col("term"), col("tfidf_milli"))
          .orderBy("doc_id", "rk")
      },
      Some(s"""WITH terms AS (
              |  SELECT doc_id, unnest($sqlTokens) AS term FROM documents),
              |tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY 1, 2),
              |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
              |n AS (SELECT count(*) AS n FROM documents),
              |scored AS (
              |  SELECT doc_id, term,
              |    CAST(floor(tf * n * 1000 / df + 0.5) AS BIGINT) AS tfidf_milli
              |  FROM tf JOIN dfreq USING (term), n),
              |ranked AS (
              |  SELECT doc_id, term, tfidf_milli,
              |    row_number() OVER (PARTITION BY doc_id
              |                       ORDER BY tfidf_milli DESC, term) AS rk
              |  FROM scored)
              |SELECT doc_id, rk, term, tfidf_milli FROM ranked
              |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)),

    // ------------------------------------------------ deterministic sample
    // Stratified reproducible sampling (see [[Sampling]]): membership is a
    // pure function of the row key, so the drawn corpus is identical on
    // any cluster layout AND reproducible by the oracle — the rolling-hash
    // fold is the same one t04 verifies in DuckDB. sample()/TABLESAMPLE
    // can't do this (per-partition RNG).
    "q44_hash_sample" -> QueryDef(
      (s, dir) => Sampling.stratified(t(s, dir, "events"),
          col("event_id"), col("event_type"),
          Map("purchase" -> 500, "view" -> 100), defaultRateMilli = 50)
        .select(col("event_id"), col("event_type"))
        .orderBy(col("event_id")),
      Some("""WITH h AS (
             |  SELECT event_id, event_type,
             |    list_reduce(
             |      list_prepend(7::BIGINT, list_transform(
             |        string_split(CAST(event_id AS VARCHAR), ''), c -> ord(c)::BIGINT)),
             |      (acc, c) -> (acc * 31 + c) % 2147483647) % 1000 AS bucket
             |  FROM events)
             |SELECT event_id, event_type FROM h
             |WHERE bucket < CASE event_type WHEN 'purchase' THEN 500
             |                               WHEN 'view' THEN 100 ELSE 50 END
             |ORDER BY event_id""".stripMargin)),

    // ------------------------------------------------------ PII redaction
    // The fixture text carries no natural PII, so each doc gets ONE planted
    // email and ONE planted phone (derived from doc_id — deterministic at
    // any SF, mirrored in the oracle, the d08 planted-pair pattern). The
    // hash of the redacted text verifies the exact replacement spans, not
    // just the counts.
    "t06_redact_pii" -> QueryDef(
      (s, dir) => {
        val planted = t(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            lit(" contact u"), col("doc_id").cast("string"), lit("@mail.example.org or "),
            (pmod(col("doc_id"), lit(900)) + 100).cast("string"), lit("-555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")).as("text"))
        val Seq((_, nEmails), (_, nPhones)) = Redact.counts(col("text"))
        planted.select(col("doc_id"),
            nEmails.as("n_emails"),
            // counted after email redaction (redact()'s precedence), so
            // counts reconcile with emitted tokens even on overlap
            nPhones.as("n_phones"),
            md5(Redact.redact(col("text"))).as("redacted_md5"))
          .orderBy("doc_id")
      },
      Some(s"""WITH planted AS (
              |  SELECT doc_id,
              |    text || ' contact u' || CAST(doc_id AS VARCHAR) || '@mail.example.org or ' ||
              |    CAST(doc_id % 900 + 100 AS VARCHAR) || '-555-' ||
              |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
              |  FROM documents)
              |SELECT doc_id,
              |  CAST(len(regexp_extract_all(text, '${Redact.Patterns(0)._2}')) AS BIGINT) AS n_emails,
              |  CAST(len(regexp_extract_all(regexp_replace(text,
              |    '${Redact.Patterns(0)._2}', '<EMAIL>', 'g'),
              |    '${Redact.Patterns(1)._2}')) AS BIGINT) AS n_phones,
              |  md5(regexp_replace(regexp_replace(text,
              |    '${Redact.Patterns(0)._2}', '<EMAIL>', 'g'),
              |    '${Redact.Patterns(1)._2}', '<PHONE>', 'g')) AS redacted_md5
              |FROM planted ORDER BY doc_id""".stripMargin)),

    // -------------------------------------------- repetition signals (t07)
    // Gopher-style repetition filters: duplicate-line fraction, duplicate-
    // line char fraction, top-2-gram char fraction — the standard "machine-
    // generated boilerplate" gates next to t01's quality stats. The fixture
    // texts are single-line, so each doc gets a deterministic multi-line
    // page planted in-query (text + a header line + doc_id%4 copies of its
    // own 40-char prefix — the t06 planted-ground-truth pattern), mirrored
    // exactly in the oracle. Both kernels are single-pass compiled
    // expressions; the whole query is per-row, shuffle-free.
    "t07_repetition" -> QueryDef(
      (s, dir) => {
        val planted = t(s, dir, "documents").select(col("doc_id"),
          concat(col("text"), lit("\nhdr "), pmod(col("doc_id"), lit(7)).cast("string"),
            repeat(concat(lit("\n"), substring(col("text"), 1, 40)),
              pmod(col("doc_id"), lit(4)).cast("int"))).as("text"))
        // materialize the stat arrays once per row (a flat projection would
        // re-evaluate the kernel per derived column)
        planted.select(col("doc_id"), length(col("text")).cast("long").as("n_chars"),
            Text.lineStats(col("text")).as("ls"),
            Text.topBigramCover(col("text")).as("cover"))
          .select(col("doc_id"),
            element_at(col("ls"), 1).as("n_lines"),
            when(element_at(col("ls"), 1) > 0,
              floor((element_at(col("ls"), 1) - element_at(col("ls"), 2)) * lit(1000.0)
                / element_at(col("ls"), 1) + 0.5).cast("long"))
              .otherwise(lit(0L)).as("dup_line_frac_milli"),
            when(element_at(col("ls"), 3) > 0,
              floor(element_at(col("ls"), 4) * lit(1000.0)
                / element_at(col("ls"), 3) + 0.5).cast("long"))
              .otherwise(lit(0L)).as("dup_line_char_frac_milli"),
            when(col("n_chars") > 0,
              floor(col("cover") * lit(1000.0) / col("n_chars") + 0.5).cast("long"))
              .otherwise(lit(0L)).as("top_bigram_frac_milli"))
          .orderBy("doc_id")
      },
      Some(s"""WITH planted AS (
              |  SELECT doc_id,
              |    text || chr(10) || 'hdr ' || CAST(doc_id % 7 AS VARCHAR) ||
              |    repeat(chr(10) || substring(text, 1, 40), CAST(doc_id % 4 AS INT)) AS text
              |  FROM documents),
              |lines AS (
              |  SELECT doc_id, x AS line FROM planted,
              |  LATERAL (SELECT unnest(string_split(text, chr(10))) AS x) g
              |  WHERE length(x) > 0),
              |lc AS (SELECT doc_id, line, count(*) AS cnt, length(line) AS ln
              |       FROM lines GROUP BY 1, 2),
              |lagg AS (
              |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_lines,
              |    CAST(count(*) AS BIGINT) AS n_distinct,
              |    CAST(sum(cnt * ln) AS BIGINT) AS line_chars,
              |    CAST(sum((cnt - 1) * ln) AS BIGINT) AS dup_chars
              |  FROM lc GROUP BY doc_id),
              |toks AS (SELECT doc_id, $sqlTokens AS w FROM planted),
              |bg AS (
              |  SELECT doc_id, array_to_string(w[i:i+1], ' ') AS bg FROM toks,
              |  LATERAL (SELECT unnest(range(1, greatest(len(w) - 1, 0) + 1)) AS i) g),
              |bc AS (SELECT doc_id, bg, count(*) AS cnt FROM bg GROUP BY 1, 2),
              |bagg AS (SELECT doc_id, max(cnt * length(bg)) AS cover FROM bc GROUP BY doc_id)
              |SELECT p.doc_id,
              |  COALESCE(l.n_lines, 0) AS n_lines,
              |  CASE WHEN COALESCE(l.n_lines, 0) > 0
              |    THEN CAST(floor((l.n_lines - l.n_distinct) * 1000.0 / l.n_lines + 0.5) AS BIGINT)
              |    ELSE 0 END AS dup_line_frac_milli,
              |  CASE WHEN COALESCE(l.line_chars, 0) > 0
              |    THEN CAST(floor(l.dup_chars * 1000.0 / l.line_chars + 0.5) AS BIGINT)
              |    ELSE 0 END AS dup_line_char_frac_milli,
              |  CASE WHEN length(p.text) > 0 AND b.cover IS NOT NULL
              |    THEN CAST(floor(b.cover * 1000.0 / length(p.text) + 0.5) AS BIGINT)
              |    ELSE 0 END AS top_bigram_frac_milli
              |FROM planted p
              |LEFT JOIN lagg l ON l.doc_id = p.doc_id
              |LEFT JOIN bagg b ON b.doc_id = p.doc_id
              |ORDER BY p.doc_id""".stripMargin)),

    // ------------------------------------------------- chunking (t08)
    // Overlapping token-window chunking — long documents become multiple
    // training sequences (window 32, stride 24 → 8-token overlap). Chunk
    // identity is (doc_id, chunk_no), a pure function of the input; the
    // md5 pins the exact token window content. Per-row + one explode, no
    // shuffle.
    "t08_chunk_tokens" -> QueryDef(
      (s, dir) => Chunking.tokenChunks(t(s, dir, "documents"), "doc_id", "text",
          window = 32, stride = 24).orderBy("doc_id", "chunk_no"),
      Some(s"""WITH tk AS (SELECT doc_id, $sqlTokens AS w FROM documents),
              |c AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n FROM tk
              |      WHERE len(w) > 0),
              |idx AS (
              |  SELECT doc_id, w, n, CAST(i AS BIGINT) AS chunk_no
              |  FROM c, LATERAL (SELECT unnest(range(0,
              |    1 + (greatest(n - 32, 0) + 23) // 24)) AS i) g)
              |SELECT doc_id, chunk_no,
              |  least(32, n - chunk_no * 24) AS n_tokens,
              |  md5(array_to_string(w[chunk_no * 24 + 1 : chunk_no * 24 + 32], ' ')) AS chunk_md5
              |FROM idx ORDER BY doc_id, chunk_no""".stripMargin)),

    // --------------------------------------------- mixture resampling (p03)
    // Deterministic data-mixture resampling: per-language milli-weights
    // (es ×2.4, de ×2, en ×1.5, fr ×0.7, everything else ×0.25) realized as
    // ⌊w⌋ full copies + one more iff the doc's hash bucket < frac(w) — the
    // same rolling-hash fold q44 verifies, so replication is reproducible
    // on any cluster AND by the oracle. Per-row + one explode, no shuffle.
    "p03_resample_mixture" -> QueryDef(
      (s, dir) => Sampling.resampleMixture(
          t(s, dir, "documents")
            .select(col("doc_id"), Text.langId(col("text")).as("pred_lang")),
          col("doc_id"), col("pred_lang"),
          Map("en" -> 1500, "es" -> 2400, "fr" -> 700, "de" -> 2000),
          defaultMilli = 250)
        .orderBy("doc_id", "copy"),
      Some(s"""WITH l AS (
              |  SELECT doc_id, $langCaseSql AS pred_lang,
              |    list_reduce(
              |      list_prepend(7::BIGINT, list_transform(
              |        string_split(CAST(doc_id AS VARCHAR), ''), c -> ord(c)::BIGINT)),
              |      (acc, c) -> (acc * 31 + c) % 2147483647) % 1000 AS bucket
              |  FROM documents),
              |w AS (SELECT doc_id, pred_lang, bucket,
              |    CASE pred_lang WHEN 'en' THEN 1500 WHEN 'es' THEN 2400
              |                   WHEN 'fr' THEN 700 WHEN 'de' THEN 2000
              |                   ELSE 250 END AS wm FROM l),
              |cp AS (SELECT doc_id, pred_lang,
              |    wm // 1000 + CASE WHEN bucket < wm % 1000 THEN 1 ELSE 0 END AS copies
              |  FROM w)
              |SELECT doc_id, pred_lang, CAST(i AS BIGINT) AS copy
              |FROM cp, LATERAL (SELECT unnest(range(1, copies + 1)) AS i) g
              |WHERE copies > 0 ORDER BY doc_id, copy""".stripMargin)),

    // --------------------------------------------- global indexing (p04)
    // Contiguous stable training-example ids, 1..N in doc_id order. The
    // oracle IS the single-partition global window; the Spark side is the
    // scale-safe two-pass (range buckets → model-sized offset table →
    // parallel per-bucket ranks) that produces the identical numbering
    // without moving the corpus through one task.
    "p04_global_index" -> QueryDef(
      (s, dir) => Indexing.globalIndex(
          t(s, dir, "documents").select(col("doc_id"), col("source")),
          col("doc_id"), buckets = 32)
        .orderBy("doc_id"),
      Some("""SELECT doc_id, source,
             |  CAST(row_number() OVER (ORDER BY doc_id) AS BIGINT) AS global_idx
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // ------------------------------------------------- latest-by-key view
    // Upsert view over the append-only event log: current state per user =
    // the row with the max (ts, event_id). One shuffle + per-partition
    // top-1 — the standard CDC "latest record wins" materialization.
    "q46_latest_by_key" -> QueryDef(
      (s, dir) => Upsert.latest(t(s, dir, "events"),
          Seq("user_id"), col("ts"), col("event_id"))
        .select(col("user_id"), col("event_id").as("last_event_id"),
          col("ts").as("last_ts"), col("event_type").as("last_type"))
        .orderBy(col("user_id")),
      Some("""SELECT user_id, event_id AS last_event_id, ts AS last_ts,
             |  event_type AS last_type
             |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
             |        ORDER BY ts DESC, event_id DESC) AS rn FROM events) t
             |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // ----------------------------------------------- lake codec round-trip
    // events → typed-CSV lake objects → read back → aggregate; the oracle
    // aggregates the ORIGINAL parquet, so any codec loss would mismatch.
    "l01_lake_roundtrip" -> QueryDef(
      (s, dir) => {
        import graft.lake.{LakeReader, LakeWriter}
        import graft.types.{ColType, TableSchema}
        val schema = TableSchema("events_rt", Seq(
          "event_id" -> ColType.CInteger, "ts" -> ColType.CTime,
          "user_id" -> ColType.CInteger, "event_type" -> ColType.CString,
          "value" -> ColType.CFloat, "props" -> ColType.CString))
        val root = s"file:///tmp/graft-lake-rt/${java.util.UUID.randomUUID()}"
        LakeWriter.write(t(s, dir, "events").repartition(4), schema, root)
        LakeReader.read(s, root, "events_rt")
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"),
            round(sum(col("value")), 2).as("sum_value"),
            max(get_json_object(col("props"), "$.k").cast("long")).as("max_k"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
             |  min(event_id) AS min_id, max(event_id) AS max_id,
             |  round(sum(value), 2) AS sum_value,
             |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin))
  )
}
