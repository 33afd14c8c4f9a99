package graft.lake

import java.time.format.DateTimeFormatter
import java.time.{Instant, ZoneOffset}
import java.util.UUID

/** Lake object-key layout: `YYYY/MM/DD/HH/{TABLE}/{UUID}.csv[.gz]` where the
  * date prefix is the UTC flush time (reference `createDatePrefix`
  * `Collector.ts:135-142`, key composition `Collector.ts:341-350`, spec
  * `README.md:119-123`).
  *
  * The hour-prefixed layout is what gives the read side partition pruning:
  * the lake reader materializes the prefix as an `event_hour` partition-ish
  * column (see [[LakeReader]]).
  */
object LakeKeys {
  private val PrefixFmt =
    DateTimeFormatter.ofPattern("yyyy/MM/dd/HH").withZone(ZoneOffset.UTC)

  def datePrefix(t: Instant): String = PrefixFmt.format(t)

  /** An object key's `YYYY/MM/DD/HH` prefix — the one place that knows
    * it is the first 13 characters (zero-padded, so string order =
    * chronological order). */
  def hourPrefixOf(key: String): String = key.take(13)

  /** Every `YYYY/MM/DD/HH` prefix whose hour intersects `[from, to]` — the
    * listing plan for a pruned read: list exactly these directories, never
    * the whole lake (at 100 TB the full recursive listing is itself a
    * driver bottleneck). */
  def hourPrefixes(from: Instant, to: Instant): Seq[String] = {
    import java.time.temporal.ChronoUnit
    val start = from.truncatedTo(ChronoUnit.HOURS)
    val end = to.truncatedTo(ChronoUnit.HOURS)
    Iterator.iterate(start)(_.plus(1, ChronoUnit.HOURS))
      .takeWhile(!_.isAfter(end)).map(datePrefix).toSeq
  }

  /** A table name valid as ONE key segment: no `/` (a slash would shift
    * [[parseKey]]'s positional fields, landing the data under a DIFFERENT
    * table and making it invisible to its own reads) and no path-special
    * names. Table names sit at the key's fifth segment, so they cannot
    * collide with root-level prefixes like `_staging/`. */
  def isValidTableName(table: String): Boolean =
    table.nonEmpty && table != "." && table != ".." &&
      table.forall(c => c.isLetterOrDigit || c == '_' || c == '-' || c == '.' || c == '$')

  def objectKey(table: String, flushTime: Instant, id: UUID, gzip: Boolean): String = {
    val ext = if (gzip) ".csv.gz" else ".csv"
    s"${datePrefix(flushTime)}/$table/$id$ext"
  }

  /** Parse `YYYY/MM/DD/HH/table/uuid.csv[.gz]` → (hourUtc, table, id). */
  def parseKey(key: String): Option[(Instant, String, String)] = {
    val parts = key.split('/')
    if (parts.length < 6) None
    else try {
      val Array(y, m, d, h) = parts.slice(0, 4)
      val inst = Instant.parse(f"${y.toInt}%04d-${m.toInt}%02d-${d.toInt}%02dT${h.toInt}%02d:00:00Z")
      Some((inst, parts(4), parts(5)))
    } catch { case _: Exception => None }
  }
}
