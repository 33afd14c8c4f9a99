package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL/domain analysis for web-corpus curation — per-row compute composed
  * from codegen'd built-ins (no UDFs), so it scales linearly and stays
  * inside whole-stage codegen. Web-scraped training corpora key most of
  * their curation policy off the URL: per-domain quotas, domain block
  * lists, path-shape junk filters (calendar pages, session ids).
  *
  * Spark's `parse_url` is the extraction primitive (a native expression);
  * everything here is reproducible in plain SQL, which is how the t10
  * oracle verifies the plumbing.
  */
object Web {

  /** Hostname as it appears in the URL (includes any `www.`). */
  def host(url: Column): Column = parse_url(url, lit("HOST"))

  /** URL path (leading slash, no query/fragment). */
  def path(url: Column): Column = parse_url(url, lit("PATH"))

  /** Value of one query-string parameter (null when absent). */
  def queryParam(url: Column, key: String): Column =
    parse_url(url, lit("QUERY"), lit(key))

  /** Registrable domain by the last-two-labels heuristic (`a.b.c.org` →
    * `c.org`). Production curation swaps in the Public Suffix List — the
    * heuristic is wrong for ccSLDs like `co.uk` — but the aggregation
    * shape (group by registrable domain) is identical. */
  def registrableDomain(hostCol: Column): Column =
    regexp_extract(hostCol, "([^.]+\\.[^.]+)$", 1)

  /** Number of non-empty path segments (`/en/docs/x.html` → 3). Deep
    * paths correlate with auto-generated page farms — a standard
    * quota/junk signal. */
  def pathDepth(pathCol: Column): Column =
    size(filter(split(pathCol, "/"), s => length(s) > 0)).cast("long")

  /** The five XML-predefined entities, decoded in the standard order
    * (`&amp;` LAST, so an encoded `&amp;lt;` cannot double-decode into
    * `<`). Shared with the t16 oracle, which replays the identical
    * sequence. */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  /** Markup → text: drop tags, decode the predefined entities, collapse
    * whitespace — the first step of every web-corpus pipeline (quality
    * signals and dedup run on TEXT; raw markup both inflates n-grams with
    * boilerplate tags and splits identical prose into distinct shingles).
    * Composed from codegen'd built-ins; deterministic for any input
    * (a literal `<` in prose consumes to the next `>` — the standard
    * regex-stripper behavior, identical on both engines). Real pipelines
    * swap in a structural parser for layout-aware extraction; the
    * aggregate shape (per-row, shuffle-free) is the same. */
  def stripHtml(html: Column): Column = {
    val noTags = regexp_replace(html, "<[^>]*>", " ")
    val decoded = HtmlEntities.foldLeft(noTags) { case (c, (entity, ch)) =>
      replace(c, lit(entity), lit(ch))
    }
    // explicit whitespace class, not \s: Java counts vertical tab, RE2
    // does not (the Dedup.exactNormalized dialect trap)
    trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " "))
  }
}
