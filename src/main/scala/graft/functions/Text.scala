package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for training-data pipelines, all composed
  * from codegen'd built-ins (no UDFs): tokenization, shingling, language-ID
  * scoring, quality heuristics. Everything here is per-row compute — no
  * shuffle, scales linearly with input.
  */
object Text {

  /** Whitespace tokens, lowercased, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** BPE-ish lexical tokens: letter runs, digit runs, single punctuation. */
  def lexTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  /** Distinct n-gram shingles over the token array (the unit set for
    * Jaccard/MinHash dedup). A single-pass custom expression: the HOF
    * composition (`array_distinct(transform(sequence, slice+array_join))`)
    * runs interpreted and re-evaluates the token subexpression per window —
    * O(L²) per document; the kernel is one compiled pass. */
  def shingles(toks: Column, n: Int): Column =
    org.apache.spark.sql.graft.exprs.shingles(toks, n)

  def shinglesOfText(text: Column, n: Int): Column = shingles(tokens(text), n)

  /** Tiny deterministic subword vocabulary for [[wordpieceStats]] — common
    * English/Romance morphemes, 2-3 chars each. Real pipelines load a
    * learned BPE/WordPiece vocab (30-100k pieces) into the same matcher;
    * this inventory is deliberately small enough for the SQL oracle to
    * replay the greedy walk. */
  val SubwordVocab: Seq[String] = Seq(
    "the", "ing", "ion", "ent", "and", "er", "re", "in", "on", "at",
    "or", "an", "en", "es", "ed", "is", "it", "al", "le", "de",
    "un", "qu", "th", "ou", "st", "ar", "te", "ti", "se", "la")

  /** `[n_pieces, n_fallback]` of the greedy longest-prefix subword walk
    * over the token array — the exact token-count primitive for budget
    * packing and per-token accounting (see
    * [[graft.functions.WordpieceMatcher]] for the determinism contract). */
  def wordpieceStats(toks: Column, vocab: Seq[String] = SubwordVocab): Column =
    org.apache.spark.sql.graft.exprs.wordpiece_stats(toks, vocab)

  /** The subword pieces themselves, in order. */
  def wordpieceSegment(toks: Column, vocab: Seq[String] = SubwordVocab): Column =
    org.apache.spark.sql.graft.exprs.wordpiece_segment(toks, vocab)

  /** Shannon entropy of the code-point distribution, in milli-nats —
    * binary junk / key-mash scores high, template boilerplate scores low.
    * Single-pass codegen'd kernel, SQL-reproducible (see
    * [[HashImpls.charEntropyMilli]] for the determinism contract). */
  def charEntropyMilli(text: Column): Column =
    org.apache.spark.sql.graft.exprs.char_entropy_milli(text)

  /** Tiny deterministic stopword inventories per language. Real language-ID
    * uses char n-gram models; this heuristic is deliberately simple enough
    * to reproduce in ANSI SQL so the oracle can verify the plumbing. */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "de" -> Seq("der", "die", "und", "das", "ist"))

  /** Number of distinct stopwords of `words` present in the text — word-
    * boundary semantics of the padded-LIKE formula (`' '||lower(text)||' '`
    * contains `' '||w||' '`), computed by the single-pass
    * [[StopwordMatcher]] kernel: the Column composition rescans (and
    * re-lowercases) the text once per word — 20 passes for the combined
    * inventory. */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    // null text scores 0, as the when/otherwise formulation did
    coalesce(
      element_at(org.apache.spark.sql.graft.exprs.stopword_scores(text, Seq(words)), 1),
      lit(0L))

  /** Predicted language: the stopword set with the most hits wins (ties →
    * earlier language in [[StopwordSets]]); no hits at all — including null
    * text — → 'unknown'. Single kernel pass scoring all four inventories
    * at once. */
  def langId(text: Column): Column =
    coalesce(org.apache.spark.sql.graft.exprs.lang_id(text, StopwordSets), lit("unknown"))

  /** Raw line-repetition statistics `[n_lines, n_distinct_lines,
    * line_chars, dup_line_chars]` (non-empty `\n`-split lines, char
    * lengths) — one compiled pass; see the kernel for the exact contract. */
  def lineStats(text: Column): Column =
    org.apache.spark.sql.graft.exprs.line_stats(text)

  /** Characters covered by the most frequent token 2-gram — the numerator
    * of the Gopher top-2-gram repetition fraction. */
  def topBigramCover(text: Column): Column =
    org.apache.spark.sql.graft.exprs.top_bigram_cover(tokens(text))

  /** Quality heuristics: char/word counts, mean word length, alpha ratio,
    * stopword ratio — standard pre-training corpus filters. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nChars = length(text).cast("long")
    val nWords = size(toks).cast("long")
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("long")
    // .distinct: "la" is in both the es and fr inventories — the combined
    // count must score each distinct WORD once (the oracle's sqlHits list
    // is deduped the same way; without this, one " la " counts 2 vs 1)
    val stop = stopwordHits(text, StopwordSets.flatMap(_._2).distinct)
    Seq(
      "n_chars" -> nChars,
      "n_words" -> nWords,
      // integer micro-units: cross-engine float-safe (see q02 note)
      "mean_word_len_milli" ->
        when(nWords > 0, floor((nChars - (nWords - 1)) * lit(1000.0) / nWords + 0.5).cast("long")).otherwise(lit(0L)),
      "alpha_ratio_milli" ->
        when(nChars > 0, floor(alpha * lit(1000.0) / nChars + 0.5).cast("long")).otherwise(lit(0L)),
      "stopword_hits" -> stop)
  }
}
