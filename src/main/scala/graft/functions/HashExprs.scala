package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the custom Catalyst expressions (the expression nodes
  * themselves live in [[org.apache.spark.sql.graft.exprs]] — see the note
  * there). Public so generated code can call them directly. */
object HashImpls {
  /** 2^31-1 (Mersenne): small enough that `acc*31 + cp` never overflows. */
  final val Mod: Long = 2147483647L
  final val Seed: Long = 42L

  /** Polynomial rolling hash (Karp-Rabin) over Unicode code points with the
    * fixed recurrence `acc = (acc*31 + cp) mod 2^31-1`, seed 7. Chosen to be
    * reproducible in plain SQL on any engine (the DuckDB oracle computes the
    * identical fold), unlike murmur/xxhash which are engine-specific. */
  def rollingHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 7L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    acc
  }

  /** xxhash64 of a UTF8String's bytes (Spark's own XXH64 kernel). */
  def hashToken(t: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
      t.getBaseObject, t.getBaseOffset, t.numBytes, Seed)

  /** Per-token hash for SimHash: TWO rolling-hash lanes (seeds 7 and 13,
    * same `acc·31 + cp mod 2^31-1` recurrence as [[rollingHash]]) packed as
    * `lane7 | lane13 << 31` — 62 well-mixed bits whose every step is plain
    * integer SQL, so the full SimHash fold is reproducible in the DuckDB
    * oracle (the d04/d05 gate). xxhash64 would give 64 bits but is
    * engine-specific; two independent Mersenne lanes trade 2 dead top bits
    * for cross-engine verifiability. */
  def simTokenHash(t: UTF8String): Long = {
    val str = t.toString
    var a7 = 7L
    var a13 = 13L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      a7 = (a7 * 31 + cp) % Mod
      a13 = (a13 * 31 + cp) % Mod
      i += Character.charCount(cp)
    }
    a7 | (a13 << 31)
  }

  /** 62-bit SimHash over an array of string tokens: each token votes ±1 on
    * every bit of its [[simTokenHash]]; the fingerprint takes the sign.
    * Near-dup texts differ in few tokens → few bit flips → small Hamming
    * distance. Bits 62-63 are always 0 (the hash is 62-bit) — harmless for
    * banding, and the price of an SQL-reproducible fingerprint. */
  def simHash64(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](62)
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = simTokenHash(tokens.getUTF8String(i))
        var b = 0
        while (b < 62) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 62) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** MinHash signature: K min-wise hashes over the element set in ONE pass
    * (vs K `array_min(transform(...))` trees = K passes). Permutations are
    * the universal family g_k(h) = a_k*h + b_k (wrapping 64-bit, compared
    * unsigned), a_k/b_k from a split-mix LCG of (seed, k). */
  def minHash(elems: ArrayData, k: Int, seed: Long): ArrayData = {
    val as = new Array[Long](k); val bs = new Array[Long](k)
    var s = seed
    var j = 0
    while (j < k) {
      s = s * 6364136223846793005L + 1442695040888963407L; as(j) = s | 1L
      s = s * 6364136223846793005L + 1442695040888963407L; bs(j) = s
      j += 1
    }
    val mins = Array.fill(k)(-1L) // unsigned max
    val n = elems.numElements()
    var i = 0
    while (i < n) {
      if (!elems.isNullAt(i)) {
        val h = hashToken(elems.getUTF8String(i))
        var kk = 0
        while (kk < k) {
          val g = as(kk) * h + bs(kk)
          if (java.lang.Long.compareUnsigned(g, mins(kk)) < 0) mins(kk) = g
          kk += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Distinct n-gram shingles over a token array in ONE pass: sliding
    * windows joined with " ", first-occurrence order preserved (the same
    * contract as `array_distinct(transform(sequence(...), slice+array_join))`
    * — which evaluates the token subexpression once per window in
    * interpreted HOF mode, an O(L²) re-tokenization this kernel avoids).
    * Shorter-than-n inputs yield the empty set. */
  def shingles(toks: ArrayData, n: Int): ArrayData = {
    val m = toks.numElements()
    val cnt = m - n + 1
    if (cnt <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String](cnt * 2)
    val sep = UTF8String.fromString(" ")
    var i = 0
    while (i < cnt) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        parts(j) = if (toks.isNullAt(i + j)) null else toks.getUTF8String(i + j)
        j += 1
      }
      seen.add(UTF8String.concatWs(sep, parts: _*)) // concatWs skips nulls, like array_join
      i += 1
    }
    new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
  }

  /** Deterministic pseudo-random hyperplane coefficient for (plane, dim):
    * splitmix64 finalizer mapped to [-0.5, 0.5). Pure function of its
    * arguments — any executor recomputes it identically, no fitted state. */
  private def planeCoef(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL
    z ^= (z >>> 31)
    z.toDouble / 1.8446744073709552E19
  }

  /** Exact Jaccard similarity of two string-array SETS in integer
    * milli-units: `floor(|∩|·1000/|∪| + 0.5)` — the identical double
    * arithmetic as the `size(array_intersect(...))` column formula (and the
    * oracle SQL), but one hash-set pass instead of interpreted
    * array_intersect allocation per pair. Inputs are assumed distinct
    * (shingle sets are). */
  def jaccardMilli(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    val (small, big, ns, nbg) = if (na <= nb) (a, b, na, nb) else (b, a, nb, na)
    val set = new java.util.HashSet[UTF8String](ns * 2)
    var i = 0
    while (i < ns) { if (!small.isNullAt(i)) set.add(small.getUTF8String(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < nbg) {
      if (!big.isNullAt(i) && set.contains(big.getUTF8String(i))) inter += 1
      i += 1
    }
    math.floor(inter * 1000.0 / (na + nb - inter) + 0.5).toLong
  }

  /** Cosine similarity of two equal-length array<double> vectors as the
    * canonical sequential fold `dot/(√Σa²·√Σb²)` — the same operation order
    * as the `aggregate(zip_with(...))` Column fold and DuckDB's
    * list_cosine_similarity, so results are bit-reproducible across engines
    * (the dedup/ANN oracle contract), in one compiled pass instead of three
    * interpreted HOF folds. */
  def cosineSim(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i); val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** [[cosineSim]] over plain double arrays (identical fold order) — the
    * dense-tile kernel used by the blocked exact all-pairs path. */
  def cosineSimArrays(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i); val y = b(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Line-repetition sufficient statistics over a document, one pass:
    * `[n_lines, n_distinct_lines, line_chars, dup_line_chars]` where lines
    * split on `\n` (byte 0x0A — never inside a UTF-8 multi-byte sequence),
    * EMPTY lines are excluded, lengths are in characters (SQL `length()`
    * semantics), and `dup_line_chars` counts every occurrence of a line
    * beyond its first — the Gopher-style duplicate-line signals' numerators
    * and denominators, left raw so callers derive the milli fractions with
    * the exact arithmetic their oracle mirrors. */
  def lineStats(text: UTF8String): ArrayData = {
    val counts = new java.util.HashMap[UTF8String, Array[Long]](16)
    var nLines = 0L; var lineChars = 0L
    val bytes = text.getBytes
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == '\n') {
        if (i > start) {
          val line = UTF8String.fromBytes(bytes, start, i - start)
          val len = line.numChars().toLong
          nLines += 1; lineChars += len
          val e = counts.get(line)
          if (e == null) counts.put(line, Array(1L, len)) else e(0) += 1
        }
        start = i + 1
      }
      i += 1
    }
    var nDistinct = 0L; var dupChars = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val e = it.next()
      nDistinct += 1; dupChars += (e(0) - 1) * e(1)
    }
    new GenericArrayData(Array(nLines, nDistinct, lineChars, dupChars))
  }

  /** Characters covered by the most frequent token 2-gram:
    * `max over adjacent pairs of count(pair) · chars("w1 w2")` (0 when the
    * input has fewer than two tokens). With `n_chars` as the denominator
    * this is the Gopher "fraction of characters in the most frequent
    * 2-gram" repetition signal. One pass, one hash map. */
  def topBigramCover(toks: ArrayData): Long = {
    val n = toks.numElements()
    if (n < 2) return 0L
    val sep = UTF8String.fromString(" ")
    val counts = new java.util.HashMap[UTF8String, Array[Long]](n * 2)
    var i = 0
    while (i < n - 1) {
      val a = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      val b = if (toks.isNullAt(i + 1)) null else toks.getUTF8String(i + 1)
      val bg = UTF8String.concatWs(sep, a, b)
      val e = counts.get(bg)
      if (e == null) counts.put(bg, Array(1L, bg.numChars().toLong)) else e(0) += 1
      i += 1
    }
    var best = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cover = e(0) * e(1)
      if (cover > best) best = cover
    }
    best
  }

  /** Morton/Z-order interleave of the low 31 bits of two keys: bit i of
    * `a` lands at position 2i, bit i of `b` at 2i+1, so the result is a
    * 62-bit non-negative long (31 bits per dimension keeps the sign bit
    * clear — SQL engines with checked BIGINT shifts reproduce it without
    * overflow). Sorting by the z-value clusters rows that are close in
    * BOTH dimensions, which is what makes parquet min/max pruning work on
    * two filter columns at once (a single-column sort gives perfect
    * pruning on one dimension and none on the other). Callers normalize
    * keys into [0, 2^31) first — rank, bucket, or epoch-seconds all fit.
    * SQL-reproducible: the oracle computes the identical per-bit OR. */
  def zInterleave(a: Long, b: Long): Long =
    spreadBits(a) | (spreadBits(b) << 1)

  /** Low 31 bits of x spread to even positions 0,2,4,…,60 (the standard
    * parallel-prefix bit spread). */
  private def spreadBits(x: Long): Long = {
    var v = x & 0x7FFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Shannon entropy of the code-point distribution in milli-nats:
    * `floor((ln N − Σ cᵢ·ln cᵢ / N) · 1000 + 0.5)` over per-code-point
    * counts cᵢ. A standard corpus-quality signal: binary junk and
    * key-mash text score high, repeated-template boilerplate scores low.
    * SQL-reproducible by contract (the oracle computes the identical
    * formula): the Σ folds over code points in ASCENDING order — UTF-8
    * byte order equals code-point order, so DuckDB's `ORDER BY c` on the
    * character visits the same sequence — and milli-rounding absorbs the
    * ≤1-ulp libm-vs-Math.log divergence. Empty input → 0. */
  def charEntropyMilli(s: UTF8String): Long = {
    val str = s.toString
    if (str.isEmpty) return 0L
    val counts = new java.util.TreeMap[Integer, Array[Long]]()
    var i = 0
    var n = 0L
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val e = counts.get(cp)
      if (e == null) counts.put(cp, Array(1L)) else e(0) += 1
    }
    var sum = 0.0
    val it = counts.values().iterator() // TreeMap: ascending code point
    while (it.hasNext) {
      val k = it.next()(0).toDouble
      sum += k * math.log(k)
    }
    val nats = math.log(n.toDouble) - sum / n
    math.floor(nats * 1000.0 + 0.5).toLong
  }

  /** Signed-random-projection signature word: bit p = sign of
    * dot(plane_{planeOffset+p}, v). All `bits` (≤ 64) dot products
    * accumulate in ONE pass over the vector (vs a per-bit
    * `aggregate(zip_with(...))` tree = `bits` passes). `planeOffset`
    * selects a disjoint plane family so signatures wider than 64 bits
    * compose words at offsets 0, 64, 128, …. */
  def srpSignature(vec: ArrayData, bits: Int, planeOffset: Int): Long = {
    val n = vec.numElements()
    val dots = new Array[Double](bits)
    var i = 0
    while (i < n) {
      if (!vec.isNullAt(i)) {
        val v = vec.getDouble(i)
        var p = 0
        while (p < bits) { dots(p) += v * planeCoef(planeOffset + p, i); p += 1 }
      }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < bits) { if (dots(p) >= 0) sig |= (1L << p); p += 1 }
    sig
  }
}

/** Precompiled stopword lookup for single-pass language scoring.
  *
  * Semantics contract (mirrored by the oracle SQL): a word of a group
  * "hits" iff `' ' || lower(text) || ' '` contains `' ' || word || ' '` —
  * i.e. iff some single-space-delimited chunk of `lower(text)` equals the
  * word; repeated occurrences count once. The Column formulation
  * (`contains` per word) rescans — and re-lowercases — the full text once
  * per word (20× for the 4×5 language inventories); this kernel lowercases
  * once and walks the bytes once, scoring every group in that single pass.
  * UTF-8-safe: the space byte 0x20 never occurs inside a multi-byte
  * sequence, so byte-level chunking cannot split a code point.
  *
  * Groups are capped at 64 words (hits are a per-group bitmask so distinct
  * words count once); the inventories here are 5 words/language.
  */
final class StopwordMatcher(labels: Array[String], groups: Array[Array[String]])
    extends Serializable {
  StopwordMatcher.validate(labels, groups)
  val numGroups: Int = groups.length

  @transient private lazy val labelU: Array[UTF8String] =
    labels.map(UTF8String.fromString)
  @transient private lazy val unknownU: UTF8String = UTF8String.fromString("unknown")
  /** word → every (group << 8 | bit) membership — a word may appear in
    * several inventories (e.g. "la" is both Spanish and French). Words are
    * lowercase by construction. */
  @transient private lazy val lookup: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]](64)
    var g = 0
    while (g < groups.length) {
      var w = 0
      while (w < groups(g).length) {
        val key = UTF8String.fromString(groups(g)(w).toLowerCase)
        val prev = m.get(key)
        val entry = (g << 8) | w
        m.put(key, if (prev == null) Array(entry) else prev :+ entry)
        w += 1
      }
      g += 1
    }
    m
  }
  // over the LOWERCASED keys: lowercase can change byte length (e.g. İ →
  // i̇ grows 2→3 bytes) and the scan guard compares against chunk bytes
  @transient private lazy val maxWordBytes: Int =
    if (groups.forall(_.isEmpty)) 0
    else groups.flatten.map(w => UTF8String.fromString(w.toLowerCase).numBytes).max

  /** Distinct-hit count per group, one pass over the text. */
  def scores(text: UTF8String): Array[Long] = {
    val masks = new Array[Long](numGroups)
    val lower = text.toLowerCase
    val bytes = lower.getBytes
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        val len = i - start
        if (len > 0 && len <= maxWordBytes) {
          val hits = lookup.get(UTF8String.fromBytes(bytes, start, len))
          if (hits != null) {
            var h = 0
            while (h < hits.length) {
              masks(hits(h) >> 8) |= 1L << (hits(h) & 0xff)
              h += 1
            }
          }
        }
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Long](numGroups)
    var g = 0
    while (g < numGroups) { out(g) = java.lang.Long.bitCount(masks(g)).toLong; g += 1 }
    out
  }

  /** [[scores]] boxed for the expression's ArrayType output. */
  def scoresArray(text: UTF8String): ArrayData = new GenericArrayData(scores(text))

  /** Argmax label: highest score wins, ties go to the earlier group, all
    * zero → "unknown" — the [[graft.functions.Text.langId]] contract. */
  def label(text: UTF8String): UTF8String = {
    val sc = scores(text)
    var best = -1
    var bestScore = 0L
    var g = 0
    while (g < sc.length) {
      if (sc(g) > bestScore) { bestScore = sc(g); best = g } // strict: ties keep earlier
      g += 1
    }
    if (best < 0) unknownU else labelU(best)
  }
}

object StopwordMatcher {
  /** Inventory validation, separated from construction so the expression
    * nodes can run it EAGERLY on the driver at plan-build time: the matcher
    * itself is `@transient lazy` inside the expressions (it first
    * initializes at codegen/eval on executors), so without this a bad
    * inventory would surface as a mid-job task failure instead of an
    * immediate, readable error where the query was built. */
  def validate(labels: Array[String], groups: Array[Array[String]]): Unit = {
    require(labels.length == groups.length, "one label per group")
    require(groups.forall(_.length <= 64), "≤64 words per group (bitmask)")
    // The single-pass chunk scan can only match single tokens: a phrase key
    // ("of the") can never equal a space-delimited chunk, so reject it here
    // rather than silently scoring 0 (the padded-LIKE formula DID match
    // phrases; use it directly if that's ever needed).
    require(groups.forall(_.forall(w => !w.contains(' ') && w.nonEmpty)),
      "stopwords must be single non-empty tokens (no spaces)")
  }
}

/** Greedy longest-prefix subword tokenizer — "wordpiece with character
  * fallback" over a fixed vocabulary. At each position the longest vocab
  * piece that prefixes the remainder is taken; when none matches, ONE code
  * point is consumed and counted as fallback (the `<unk>`-free formulation:
  * any string tokenizes, unknown material degrades to characters). This is
  * the shape of production subword counting for token-budget packing and
  * per-token pricing; real BPE differs only in how the vocab was LEARNED,
  * not in how greedy application walks the word.
  *
  * SQL-reproducible by contract: the vocabulary is ASCII-only (validated),
  * so Java's char-indexed prefix compare visits the same boundaries as an
  * engine counting code points, and the oracle replays the identical greedy
  * walk with a recursive CTE. Same-length tie among matching pieces is
  * impossible (two equal-length prefixes of one string are equal), so
  * "longest wins" fully determines the segmentation.
  */
final class WordpieceMatcher(vocab: Array[String]) extends Serializable {
  WordpieceMatcher.validate(vocab)
  @transient private lazy val vocabSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](vocab.length * 2)
    vocab.foreach(s.add)
    s
  }
  @transient private lazy val maxLen: Int =
    if (vocab.isEmpty) 0 else vocab.map(_.length).max

  /** `[n_pieces, n_fallback]` summed over every token in the array. */
  def stats(toks: ArrayData): ArrayData = {
    var np = 0L
    var nf = 0L
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        val w = toks.getUTF8String(t).toString
        var i = 0
        while (i < w.length) {
          val hit = longestAt(w, i)
          if (hit > 0) { np += 1; i += hit }
          else { nf += 1; i += Character.charCount(w.codePointAt(i)) }
        }
      }
      t += 1
    }
    new GenericArrayData(Array[Any](np, nf))
  }

  /** The subword pieces themselves, in order across the token array —
    * feeds exact token-budget chunking/packing downstream. */
  def segment(toks: ArrayData): ArrayData = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val n = toks.numElements()
    var t = 0
    while (t < n) {
      if (!toks.isNullAt(t)) {
        val w = toks.getUTF8String(t).toString
        var i = 0
        while (i < w.length) {
          val hit = longestAt(w, i)
          val step = if (hit > 0) hit else Character.charCount(w.codePointAt(i))
          out += UTF8String.fromString(w.substring(i, i + step))
          i += step
        }
      }
      t += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def longestAt(w: String, i: Int): Int = {
    var l = math.min(maxLen, w.length - i)
    while (l >= 1) {
      if (vocabSet.contains(w.substring(i, i + l))) return l
      l -= 1
    }
    0
  }
}

object WordpieceMatcher {
  /** Eager driver-side validation (same rationale as
    * [[StopwordMatcher.validate]]): the ASCII-only bound is what makes the
    * char-indexed walk equal the oracle's code-point walk. */
  def validate(vocab: Array[String]): Unit = {
    require(vocab.forall(_.nonEmpty), "vocab pieces must be non-empty")
    require(vocab.forall(_.forall(c => c >= ' ' && c < 127 && c != '\'')),
      "vocab pieces must be printable ASCII without quotes (SQL-reproducibility contract)")
  }
}

/** Column-API entry points for the custom expressions. */
object HashFunctions {
  def rolling_hash(c: Column): Column = org.apache.spark.sql.graft.exprs.rolling_hash(c)
  def simhash64(c: Column): Column = org.apache.spark.sql.graft.exprs.simhash64(c)
  def minhash(c: Column, k: Int, seed: Long = 1L): Column =
    org.apache.spark.sql.graft.exprs.minhash(c, k, seed)
  def srp_sig(c: Column, bits: Int, planeOffset: Int = 0): Column =
    org.apache.spark.sql.graft.exprs.srp_sig(c, bits, planeOffset)
  def cosine_sim(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.exprs.cosine_sim(a, b)
  def jaccard_milli(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.exprs.jaccard_milli(a, b)
}
