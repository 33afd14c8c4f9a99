package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: replace common identifier shapes
  * with stable placeholder tokens before text ships to a training set —
  * a per-row, shuffle-free transform that composes with the quality /
  * dedup stages of the curation pipeline.
  *
  * Patterns deliberately use the portable regex subset (explicit character
  * classes, bounded quantifiers; no `\d`/`\w` shorthands, no lookaround)
  * that means the SAME pattern string behaves identically under Java's
  * regex engine (Spark) and RE2-family engines (the DuckDB oracle, most
  * log pipelines). Real deployments extend [[Patterns]]; the mechanism —
  * counted + replaced per pattern, verified by hash — is what's engineered.
  */
object Redact {

  /** (token, pattern) in application order. */
  val Patterns: Seq[(String, String)] = Seq(
    "<EMAIL>" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+",
    "<PHONE>" -> "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}")

  /** Text with every pattern occurrence replaced by its token. */
  def redact(text: Column): Column =
    Patterns.foldLeft(text) { case (acc, (token, re)) =>
      regexp_replace(acc, re, token)
    }

  /** Raw occurrence count of one pattern on the given text. NOTE: measured
    * on `text` as passed — when patterns can overlap (a phone shape inside
    * an email local part), raw counts don't reconcile with the tokens
    * [[redact]] emits; use [[counts]] for numbers that do. */
  def count(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")

  /** Per-pattern occurrence counts, each measured with all EARLIER patterns
    * already redacted — the same precedence [[redact]] applies, so these
    * reconcile exactly with the emitted tokens even when shapes overlap. */
  def counts(text: Column): Seq[(String, Column)] =
    Patterns.zipWithIndex.map { case ((token, re), i) =>
      val prior = Patterns.take(i).foldLeft(text) { case (acc, (tk, p)) =>
        regexp_replace(acc, p, tk)
      }
      token -> regexp_count(prior, lit(re)).cast("long")
    }
}
