package graft.lake

import graft.types.{ColType, TableSchema}

import java.io.{BufferedReader, BufferedWriter, InputStreamReader, OutputStreamWriter}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** DECLARED-SCHEMA records — metadata-only schema evolution for the
  * lake (`ALTER TABLE lake.t ADD COLUMN …` without touching a byte of
  * data, the Delta/Iceberg schema-evolution contract on the reference's
  * wire format, whose objects each carry their OWN header —
  * `README.md:131-138`).
  *
  * '''Model''': a table without a record behaves exactly as before (its
  * schema IS the wire headers, strict single-header reads). The first
  * `ALTER TABLE` publishes `_versions/<t>/schema-NNNNNNNNN` — from then
  * on the DECLARED schema is authoritative: reads resolve every object's
  * rows BY NAME against its own header (columns an old object lacks
  * read as null, `INTEGER`-written wires widen under a `FLOAT`-declared
  * column — the reconciling reader's proven machinery), and every write
  * path (appends, COW DML, MERGE rewrites, compaction) emits the
  * declared header, so the table converges to it object by object;
  * `CALL compact` converges it wholesale.
  *
  * '''Active streams''': a stream STARTED on an evolved table reads by
  * name and rides later ALTERs' objects fine; a stream started before
  * the table's FIRST ALTER adopts restart-free (r16 — the reader
  * re-checks for a schema record on a header mismatch,
  * [[LakeObjectReader]]'s `adoptEvolved`): evolved objects resolve by
  * name onto the stream's own start-time schema, shared columns
  * deliver values, and the output shape stays fixed until restart
  * (Spark pins a stream's schema at start). Genuine drift — no
  * declared schema — still fails loudly.
  *
  * '''Concurrency''': records are immutable and CAS-published with
  * [[Store.createExclusive]] like generation records — two concurrent
  * ALTERs serialize; the loser re-reads the winner's schema, re-applies
  * its own changes on top, and retries (or fails loudly when the
  * changes no longer apply). Readers take the highest parseable record;
  * a torn record (crashed mid-publish) is skipped and its slot
  * reclaimed by the next ALTER. */
object LakeSchemas {

  def schemaKey(table: String, v: Long): String =
    f"${LakeVersions.dir(table)}/schema-$v%09d"

  final case class Declared(schema: TableSchema, version: Long)

  // ------------------------------------------------------------- wire

  private def writeRecord(store: Store, key: String, schema: TableSchema): Unit = {
    val out = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(store.createExclusive(key)), StandardCharsets.UTF_8))
    try {
      out.write(s"graft-schema v1 table=${schema.name} " +
        s"cols=${schema.columns.size}\n")
      schema.columns.foreach { case (n, t) =>
        out.write(s"$n ${t.wire}\n")
      }
      out.write("end\n")
    } finally out.close()
  }

  private val HeaderRe = """^graft-schema v1 table=(\S+) cols=(\d+)$""".r

  /** Strict parse; None = torn/absent (an uncommitted crash — skipped,
    * slot reclaimable). */
  def readRecord(store: Store, table: String, v: Long): Option[TableSchema] = {
    val raw = try store.open(schemaKey(table, v))
              catch { case _: Exception => return None }
    try {
      val rd = new BufferedReader(new InputStreamReader(
        new GZIPInputStream(raw), StandardCharsets.UTF_8))
      val m = HeaderRe.findFirstMatchIn(Option(rd.readLine()).getOrElse(""))
        .getOrElse(return None)
      if (m.group(1) != table) return None
      val n = m.group(2).toInt
      val cols = Vector.newBuilder[(String, ColType)]
      var i = 0
      while (i < n) {
        val line = Option(rd.readLine()).getOrElse(return None).split(' ')
        if (line.length != 2) return None
        cols += ((line(0), ColType.fromWire(line(1))))
        i += 1
      }
      if (rd.readLine() != "end") return None
      Some(TableSchema(table, cols.result()))
    } catch { case _: Exception => None }
    finally { try raw.close() catch { case _: Exception => () } }
  }

  /** The table's declared schema, if any ALTER ever ran: highest
    * parseable record off ONE listing of the version directory (the
    * same directory every versioned read already lists). */
  def current(store: Store, table: String): Option[Declared] = {
    val dir = LakeVersions.dir(table)
    val versions = store.list(dir).map(_.stripPrefix(dir + "/"))
      .collect { case s if s.startsWith("schema-") =>
        s.stripPrefix("schema-").toLong }.sorted.reverse
    versions.view.flatMap(v =>
      readRecord(store, table, v).map(Declared(_, v))).headOption
  }

  /** CAS-publish `schema` as version `expected + 1`. Returns the new
    * version, or None when the slot was taken by a COMMITTED record (a
    * racing ALTER won — re-resolve and re-apply). A torn occupant is
    * reclaimed after a quiesce wait, exactly like a torn generation. */
  def publish(store: Store, table: String, schema: TableSchema,
              expected: Long): Option[Long] = {
    val v = expected + 1
    val won =
      try { writeRecord(store, schemaKey(table, v), schema); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false
              case e: java.io.IOException
                if Option(e.getMessage).exists(_.toLowerCase.contains("exist")) =>
                  false }
    if (won) Some(v)
    else {
      // a torn occupant (crashed committer) is reclaimed only when its
      // BYTES are stable across the quiesce wait — an alive writer's
      // stream either finishes or grows within it (the LakeVersions
      // torn-slot rule; without the stability check a slow winner's
      // half-written record could be deleted out from under it and its
      // ALTER silently lost)
      if (readRecord(store, table, v).isEmpty) {
        val sizeBefore = sizeOf(store, schemaKey(table, v))
        Thread.sleep(1000L)
        if (readRecord(store, table, v).isEmpty &&
            sizeOf(store, schemaKey(table, v)) == sizeBefore)
          store.delete(schemaKey(table, v))
      }
      None
    }
  }

  private def sizeOf(store: Store, key: String): Long =
    try {
      val in = store.open(key)
      try {
        var n = 0L
        val buf = new Array[Byte](8192)
        var r = in.read(buf)
        while (r >= 0) { n += r; r = in.read(buf) }
        n
      } finally in.close()
    } catch { case _: Exception => -1L }

  /** Every column name ANY schema version of `table` ever declared —
    * what [[LakeCatalog]]'s ADD COLUMN consults to refuse resurrecting
    * a dropped column whose values may still sit in old objects (the
    * wire format has no column IDs, so a re-added name would read the
    * OLD data back instead of NULL). */
  def historicalColumns(store: Store, table: String): Set[String] = {
    val dir = LakeVersions.dir(table)
    store.list(dir).map(_.stripPrefix(dir + "/"))
      .collect { case s if s.startsWith("schema-") =>
        s.stripPrefix("schema-").toLong }
      .flatMap(v => readRecord(store, table, v))
      .flatMap(_.columnNames).toSet
  }
}
