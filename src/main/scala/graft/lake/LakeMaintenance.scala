package graft.lake

import java.time.Instant

import org.apache.spark.sql.SparkSession

/** Lake maintenance: small-file compaction.
  *
  * The `YYYY/MM/DD/HH/table/uuid` layout (reference `Collector.ts:341-350`)
  * accumulates one object per flush — at high flush rates that is the
  * classic small-file problem: scans pay per-object open/seek cost and the
  * driver pays per-object listing cost. `compact` rewrites a table's
  * objects (optionally restricted to an hour range) into objects of
  * `targetRecords` rows: a distributed read through [[LakeReader]], a
  * distributed write through [[LakeWriter]] (which rolls objects at the
  * target size), then deletion of the replaced objects.
  *
  * Crash behavior: new objects land before old keys are deleted, so a
  * failure mid-compaction leaves duplicates (at-least-once), never loss —
  * the same durability bias as the reference's flush (store first, dispose
  * after, `Collector.ts:310-339`). Concurrency: the read consumes EXACTLY
  * the listed key snapshot, so objects flushed while compaction runs are
  * neither rewritten nor deleted — they simply survive untouched.
  * Rewritten objects land under the `flushTime` hour, which defaults to
  * the range start (when given) so compacted rows stay inside the pruned
  * window.
  */
object LakeMaintenance {

  final case class CompactionReport(
      oldObjects: Int, newObjects: Int, records: Long, newKeys: Seq[String])

  def compact(spark: SparkSession, store: Store, table: String,
              hourRange: Option[(Instant, Instant)] = None,
              targetRecords: Long = 200000L,
              flushTime: Instant = null,
              gzip: Boolean = true): CompactionReport = {
    val oldKeys = hourRange match {
      case Some((from, to)) =>
        LakeKeys.hourPrefixes(from, to)
          .flatMap(pfx => store.list(s"$pfx/$table"))
          .filter(k => LakeKeys.parseKey(k).exists(_._2 == table))
      case None =>
        store.list("").filter(k => LakeKeys.parseKey(k).exists(_._2 == table))
    }
    if (oldKeys.isEmpty) return CompactionReport(0, 0, 0L, Seq.empty)
    val outTime = Option(flushTime)
      .orElse(hourRange.map(_._1))
      .getOrElse(LakeKeys.parseKey(oldKeys.min).map(_._1).getOrElse(Instant.now()))
    // Read the SNAPSHOT, not a re-listing: a concurrent flush between the
    // listing and the read would otherwise be rewritten but not deleted —
    // permanent duplication, not the benign crash-duplication above.
    val df = LakeReader.readKeys(spark, store, table, oldKeys).drop("_event_hour")
    val schema = LakeReader.peekSchema(store, oldKeys.head, table)
    // Size the write: ceil(total/target) tasks, each rolling at the target.
    val n = df.count()
    val parts = math.max(1L, (n + targetRecords - 1) / targetRecords).toInt
    val written = LakeWriter.write(
      df.repartition(parts), schema, store.rootUri, outTime, gzip,
      maxRecordsPerObject = targetRecords)
    oldKeys.foreach(store.delete)
    CompactionReport(oldKeys.size, written.size, written.map(_.records).sum,
      written.map(_.key))
  }
}
