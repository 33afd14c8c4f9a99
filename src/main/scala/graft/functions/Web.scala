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
}
