package graft.lake

import graft.types.{ColType, TableSchema}

import java.io.{BufferedReader, InputStreamReader}
import java.nio.charset.StandardCharsets
import java.time.Instant
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{DeltaBatchWrite, DeltaWrite, DeltaWriteBuilder, DeltaWriter, DeltaWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, SupportsDelta, WriterCommitMessage}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DELTA-based MERGE for the lake — `SupportsDelta`, the position-delta
  * idea Iceberg v2 popularized (`_file`/`_pos` row ids + per-row change
  * ops), re-derived on the lake's immutable rolled objects (the
  * reference's queryable-lake contract, `README.md:113-117`; objects
  * land once and never mutate in place, `Collector.ts:310-350`, which
  * is exactly what makes `(_object_key, _row_pos)` a stable row id). This is the
  * second of Spark's two row-level rewrite shapes ([[LakeRowLevelOperation]]
  * is the GROUP-based one, which UPDATE/DELETE keep): instead of routing
  * every row of every touched group through the plan, Spark's
  * `RewriteMergeIntoTable` emits only the CHANGED rows, each tagged with
  * its operation and its row id `(_object_key, _row_pos)`, and the
  * connector applies them.
  *
  * Why MERGE gets the delta path (and UPDATE/DELETE do not): the
  * group-based ReplaceData write carries only table columns, so a MERGE's
  * surviving rows and its NOT-MATCHED inserts are per-row
  * indistinguishable there — r13/r14 had to record every MERGE object
  * `inserted` (at-least-once under an active stream). The delta plan
  * names each row's operation, so:
  *
  *  - CDC becomes EXACT: updated/surviving rows land in `added`
  *    (rewrites — a stream that already delivered their originals skips
  *    them), insert rows land in `inserted` (always delivered) — MERGE
  *    under an active stream is now exactly-once per logical row, the
  *    same contract as UPDATE/DELETE/compact;
  *  - the plan ships only changed rows: a MERGE matching 1% of a 100-TB
  *    table moves 1% of it through the shuffle/write instead of every
  *    row of every touched object.
  *
  * '''Execution shape''': each write task streams its not-matched
  * INSERT rows straight into per-hour staged objects (`ins/`, final
  * form), and its DELETE/UPDATE changes into staged PATCH files (typed
  * CSV: op, object key, row position, new values). Commit then runs one
  * distributed job keyed by `_object_key` — each touched object is
  * rewritten LOCALLY in its task (open original, drop deleted
  * positions, swap updated rows in, route every kept row by its own
  * `_event_hour`) — and publishes through the [[LakeVersions]] protocol
  * exactly like every other mutating statement: intent → renames → CAS
  * (validating the touched originals are still live — a racing commit
  * aborts this one loudly) → retire (skipped under retention).
  *
  * Memory is bounded twice: a patch file is streamed, and the rewrite
  * task holds one object's patches (an object is bounded by the
  * writer's record limit). The rewrite job scales with TOUCHED objects,
  * never table size.
  *
  * Small-file note: insert objects land one-per-(task, hour) — a MERGE
  * whose few inserts scatter over many join partitions lands many
  * small objects (the group-based COW write had the same shape).
  * `CALL lake.system.compact` consolidates; scheduled compaction is
  * the standing posture for any DML-heavy table. */
object LakeDelta {

  /** Patch-file schema: positional names (`p0`,`p1`,...) because the
    * payload columns shadow the table's own (including the RESERVED
    * `_event_hour`, which [[TableSchema]] refuses by name) — the file
    * is written and read only here, so names carry no meaning. Layout:
    * p0=op (`u`/`d`), p1=object key, p2=row position, p3.. = the
    * table's columns, last = the row's `_event_hour`. */
  private[lake] def patchSchema(schema: TableSchema): TableSchema =
    TableSchema(schema.name,
      Seq("p0" -> ColType.CString, "p1" -> ColType.CString,
        "p2" -> ColType.CInteger) ++
        schema.colTypes.zipWithIndex.map { case (t, i) => s"p${i + 3}" -> t } :+
        (s"p${schema.columns.size + 3}" -> ColType.CTime))

  /** Wire field → EXTERNAL value (what [[LakeWriter.RollingObjectWriter]]
    * writes): the read path's PERMISSIVE contract — empty = null,
    * unparseable = null — producing the exact value classes
    * [[TypedCsv.formatValue]] round-trips. */
  private[lake] def externalFromWire(t: ColType): String => Any = t match {
    case ColType.CString | ColType.CUuid => s => s
    case ColType.CInteger => s =>
      try java.lang.Long.valueOf(s) catch { case _: NumberFormatException => null }
    case ColType.CFloat => s =>
      try java.lang.Double.valueOf(s) catch { case _: NumberFormatException => null }
    case ColType.CBoolean => s =>
      if (s == "true") java.lang.Boolean.TRUE
      else if (s == "false") java.lang.Boolean.FALSE
      else null
    case ColType.CTime => s =>
      LakeObjectReader.converter(ColType.CTime)(s) match {
        case micros: java.lang.Long =>
          new java.sql.Timestamp(Math.floorDiv(micros.longValue(), 1000L))
        case _ => null
      }
  }

  /** One patch row shipped through the rewrite shuffle. `vals` stays in
    * WIRE form (deletes carry none) — converted once, in the rewrite
    * task that consumes it. */
  private[lake] final case class Patch(pos: Long, op: String,
                                       vals: Array[String])

  /** Stream a staged patch file: (object key, patch) pairs, lazily —
    * the reader closes itself at exhaustion (Spark's flatMap always
    * drains; a task failure abandons the handle to the JVM, which is
    * the standard hadoop-stream failure posture). */
  private[lake] def readPatch(store: Store, key: String,
                              pschema: TableSchema): Iterator[(String, Patch)] = {
    val raw = store.open(key)
    val rd = new BufferedReader(new InputStreamReader(
      if (key.endsWith(".gz")) new GZIPInputStream(raw) else raw,
      StandardCharsets.UTF_8))
    val types = TypedCsv.parseTypesHeader(rd.readLine())
    val names = TypedCsv.splitLine(rd.readLine())
    require(names == pschema.columnNames && types == pschema.colTypes,
      s"not a graft-lake MERGE patch file: $key ($names : $types)")
    new Iterator[(String, Patch)] {
      private var nextRec: Array[String] = advance()
      private def advance(): Array[String] = {
        val r = LakeObjectReader.readRecord(rd)
        if (r == null) rd.close()
        r
      }
      override def hasNext: Boolean = nextRec != null
      override def next(): (String, Patch) = {
        val f = nextRec
        nextRec = advance()
        (f(1), Patch(f(2).toLong, f(0), f.drop(3)))
      }
    }
  }

  /** The commit-time rewrite job: every touched object (keyed by the
    * patches) is rewritten in ONE task — survivors keep their hour,
    * updated rows route by their own new `_event_hour` — into staged
    * replacements under `rwPrefix`. Returns (original key, its staged
    * replacement keys). */
  private[lake] def rewriteTouched(spark: SparkSession, rootUri: String,
                                   schema: TableSchema, patchKeys: Seq[String],
                                   rwPrefix: String,
                                   policy: LakeRowLevel.SidecarPolicy,
                                   byName: Boolean = false)
      : Seq[(String, Seq[String])] = {
    if (patchKeys.isEmpty) return Nil
    val pschema = patchSchema(schema)
    val patches = spark.sparkContext
      .parallelize(patchKeys, patchKeys.size)
      .flatMap { pk => readPatch(new HadoopStore(rootUri), pk, pschema) }
    patches.groupByKey().map { case (objKey, ps) =>
      rewriteOne(new HadoopStore(rootUri), schema, objKey, ps, rwPrefix,
        policy, byName)
    }.collect().toSeq
  }

  private[lake] def rewriteOne(store: Store, schema: TableSchema,
                               objKey: String, patches: Iterable[Patch],
                               rwPrefix: String,
                               policy: LakeRowLevel.SidecarPolicy,
                               byName: Boolean = false)
      : (String, Seq[String]) = {
    val n = schema.columns.size
    val byPos = new scala.collection.mutable.HashMap[Long, Patch]
    patches.foreach { p =>
      if (byPos.put(p.pos, p).isDefined)
        throw new IllegalStateException(
          s"graft-lake MERGE: two changes target row ${p.pos} of $objKey — " +
            "the ON condition matched one target row twice (Spark's " +
            "cardinality check should have failed the statement)")
    }
    val raw = store.open(objKey) // a missing original would fail the CAS
                                 // validation anyway; failing here is earlier
    val rd = new BufferedReader(new InputStreamReader(
      if (objKey.endsWith(".gz")) new GZIPInputStream(raw) else raw,
      StandardCharsets.UTF_8))
    val convs: Array[String => Any] =
      schema.colTypes.map(externalFromWire).toArray
    val hourConv = externalFromWire(ColType.CTime)
    def externalRow(wire: Array[String]): Array[Any] = {
      val out = new Array[Any](n)
      var i = 0
      while (i < n) {
        out(i) = if (i >= wire.length || wire(i).isEmpty) null else convs(i)(wire(i))
        i += 1
      }
      out
    }
    val rollers = scala.collection.mutable.LinkedHashMap
      .empty[Long, LakeWriter.RollingObjectWriter]
    def rollerFor(hourSec: Long) = rollers.getOrElseUpdate(hourSec,
      new LakeWriter.RollingObjectWriter(store, schema,
        Instant.ofEpochSecond(hourSec), policy.gzip, 0L, rwPrefix,
        policy.zoneMaps, policy.bloomColumns))
    try {
      val types = TypedCsv.parseTypesHeader(rd.readLine())
      val names = TypedCsv.splitLine(rd.readLine())
      if (!byName)
        require(names == schema.columnNames && types == schema.colTypes,
          s"schema drift in $objKey: header ($names : $types) does not match " +
            s"declared ${schema.columnNames} : ${schema.colTypes} — MERGE " +
            "refuses drifted tables (ALTER TABLE or compact first)")
      // EVOLVED tables resolve the object's OWN header by name against
      // the declared schema: absent columns null-fill, INTEGER wires
      // widen under FLOAT, anything else refuses loudly (the alignTo
      // rule) — survivors land rewritten onto the declared header.
      val srcOf: Array[Int] =
        if (!byName) Array.tabulate(n)(identity)
        else schema.columns.map { case (cn, ct) =>
          val j = names.indexOf(cn)
          if (j < 0) -1
          else {
            val wt = types(j)
            require(wt == ct ||
              (wt == ColType.CInteger && ct == ColType.CFloat),
              s"irreconcilable drift in $objKey: column $cn is $wt on " +
                s"the wire but declared $ct — only INTEGER->FLOAT widens")
            j
          }
        }.toArray
      def survivorRow(wire: Array[String]): Array[Any] = {
        val out = new Array[Any](n)
        var i = 0
        while (i < n) {
          val j = srcOf(i)
          out(i) = if (j < 0 || j >= wire.length || wire(j).isEmpty) null
                   else convs(i)(wire(j))
          i += 1
        }
        out
      }
      val originalHourSec =
        LakeKeys.parseKey(objKey).get._1.getEpochSecond
      var pos = 0L
      var rec = LakeObjectReader.readRecord(rd)
      while (rec != null) {
        byPos.remove(pos) match {
          case None =>
            // survivor: stays under the object's own hour
            rollerFor(originalHourSec).write(survivorRow(rec))
          case Some(Patch(_, "d", _)) => () // deleted
          case Some(Patch(_, "u", vals)) =>
            // updated: route by the row's NEW hour (an explicit
            // `SET _event_hour` is a MOVE, same as the group-based path)
            val ts = if (n >= vals.length || vals(n).isEmpty) null
                     else hourConv(vals(n))
            ts match {
              case t: java.sql.Timestamp =>
                rollerFor(Math.floorDiv(t.getTime, 3600000L) * 3600L)
                  .write(externalRow(vals))
              case _ => throw new IllegalArgumentException(
                "graft-lake MERGE: NULL _event_hour in an UPDATE arm — " +
                  "every row must name its hour")
            }
          case Some(Patch(_, op, _)) => throw new IllegalStateException(
            s"graft-lake MERGE: unknown patch op '$op' for $objKey")
        }
        pos += 1L
        rec = LakeObjectReader.readRecord(rd)
      }
      if (byPos.nonEmpty)
        throw new IllegalStateException(
          s"graft-lake MERGE: patches name row positions past the end of " +
            s"$objKey (e.g. ${byPos.keys.take(3).mkString(", ")} >= $pos) — " +
            "the scanned object changed under the statement")
      (objKey, rollers.values.flatMap(_.finish().map(_.key)).toSeq)
    } catch { case e: Throwable =>
      rollers.values.foreach(_.abort())
      throw e
    } finally rd.close()
  }
}

/** The MERGE operation face: `SupportsDelta` with row id
  * `(_object_key, _row_pos)` — both non-null metadata columns of
  * [[LakeTable]], so Spark's `resolveRowIdAttrs` finds them on the
  * relation and its nullability check passes. Updates stay whole rows
  * (`representUpdateAsDeleteAndInsert = false`): the update op is what
  * lets the rewrite keep updated rows in `added` (CDC: a rewrite, not a
  * new logical row). */
final class LakeDeltaOperation(rootUri: String, tableName: String,
                               lakeSchema: TableSchema,
                               // evolved table: scan + rewrite resolve
                               // per object by name against the DECLARED
                               // lakeSchema
                               byName: Boolean = false)
    extends RowLevelOperation with SupportsDelta {

  override def command(): RowLevelOperation.Command =
    RowLevelOperation.Command.MERGE
  override def description(): String =
    s"graft-lake MERGE position-delta table=$tableName"

  override def rowId(): Array[NamedReference] = Array(
    Expressions.column(LakeDataSource.ObjectKeyCol),
    Expressions.column(LakeDataSource.RowPosCol))

  override def representUpdateAsDeleteAndInsert(): Boolean = false

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    // cowMode: refuse aggregate/limit/TopN pushdown on the row scan (it
    // must produce rows, not sidecar answers); the delta path needs no
    // plannedKeys contract — the patches name the touched objects exactly
    new LakeScanBuilder(rootUri, tableName, lakeSchema, byName = byName,
      cowMode = true)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite =
        new LakeDeltaWrite(rootUri, lakeSchema, info, byName)
    }
}

/** The MERGE write: tasks stage inserts (final-form objects) and
  * patches; commit rewrites the touched objects and publishes through
  * the [[LakeVersions]] protocol (op `merge`; removed = touched
  * originals, added = their rewrites, inserted = the insert objects —
  * the exact CDC split). */
final class LakeDeltaWrite(rootUri: String, lakeSchema: TableSchema,
                           info: LogicalWriteInfo, byName: Boolean = false)
    extends DeltaWrite with DeltaBatchWrite {

  private val staging = s"_staging/delta-${java.util.UUID.randomUUID()}"
  @volatile private var policy: LakeRowLevel.SidecarPolicy = _

  override def toBatch: DeltaBatchWrite = this
  override def description(): String =
    s"graft-lake MERGE delta table=${lakeSchema.name} staging=$staging"

  override def createBatchWriterFactory(pInfo: PhysicalWriteInfo): DeltaWriterFactory = {
    policy = LakeRowLevel.policyFor(new HadoopStore(rootUri),
      lakeSchema.name, lakeSchema)
    new LakeDeltaWriterFactory(rootUri, lakeSchema, info.schema(),
      info.rowIdSchema().orElseThrow(() => new IllegalStateException(
        "graft-lake MERGE delta write without a row-id schema")),
      staging, policy)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val store = new HadoopStore(rootUri)
    val table = lakeSchema.name
    try {
      val p = if (policy != null) policy
              else LakeRowLevel.policyFor(store, table, lakeSchema)
      val staged = messages.flatMap { case LakeCommitMessage(keys) => keys }
      val (stagedIns, stagedPatch) =
        staged.partition(_.startsWith(s"$staging/ins/"))
      // a MERGE that matched nothing and inserted nothing is a true
      // no-op: no rewrite job, no generation
      if (stagedIns.isEmpty && stagedPatch.isEmpty) return
      // the rewrite job: touched objects → staged replacements (runs
      // BEFORE any publish — a failure here aborts with the table
      // untouched, staging swept by the finally)
      val rewrites = LakeDelta.rewriteTouched(SparkSession.active, rootUri,
        lakeSchema, stagedPatch.toSeq, s"$staging/rw/", p, byName)
      val removed = rewrites.map(_._1)
      val stagedRw = rewrites.flatMap(_._2)
      def dstOf(k: String): String =
        k.stripPrefix(s"$staging/ins/").stripPrefix(s"$staging/rw/")
      val added = stagedRw.map(dstOf)
      val inserted = stagedIns.map(dstOf).toSeq
      val hours = (added ++ inserted).map(LakeKeys.hourPrefixOf) ++
        removed.map(LakeKeys.hourPrefixOf)
      if (hours.nonEmpty)
        Manifests.invalidateIfCovers(store, table, hours.min)
      val intentId = java.util.UUID.randomUUID().toString
      LakeVersions.writeIntent(store, table, intentId, added ++ inserted)
      (stagedRw ++ stagedIns).foreach { k =>
        val dst = dstOf(k)
        store.rename(k, dst)
        if (p.zoneMaps) store.rename(ZoneMaps.statsKey(k), ZoneMaps.statsKey(dst))
        if (p.bloomColumns.nonEmpty)
          store.rename(BloomMaps.bloomKey(k), BloomMaps.bloomKey(dst))
      }
      try LakeVersions.commit(store, table, op = "merge",
        removed = removed, added = added, inserted = inserted,
        intentId = Some(intentId))
      catch { case e: Throwable =>
        (added ++ inserted).foreach { dst =>
          store.delete(dst)
          ZoneMaps.deleteSidecarSignaled(store, dst, "graft-lake merge abort")
          store.delete(BloomMaps.bloomKey(dst))
        }
        store.delete(LakeVersions.intentKey(table, intentId))
        throw e
      }
      if (removed.nonEmpty && !LakeVersions.isRetained(store, table)) {
        LakeMaintenance.physicalRetireDistributed(
          SparkSession.active, rootUri, removed)
        LakeVersions.pruneChainIfLarge(store, table, removed.size)
      }
      if (hours.nonEmpty)
        Manifests.invalidateIfCovers(store, table, hours.min)
    } finally cleanupStaging(store)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    cleanupStaging(new HadoopStore(rootUri))

  private def cleanupStaging(store: Store): Unit = {
    try store.deletePrefix(staging) catch { case _: Throwable => () }
    try store.deletePrefix(ZoneMaps.Prefix + staging) catch { case _: Throwable => () }
  }
}

final class LakeDeltaWriterFactory(rootUri: String, lakeSchema: TableSchema,
                                   rowSchema: StructType, idSchema: StructType,
                                   staging: String,
                                   policy: LakeRowLevel.SidecarPolicy)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new LakeDeltaDataWriter(rootUri, lakeSchema, rowSchema, idSchema,
      staging, policy)
}

/** One task's delta writer: inserts roll into final-form per-hour
  * objects under `ins/`; updates/deletes append to ONE patch file
  * (op, object key, position, new values) — both streamed, nothing
  * buffered per row. */
final class LakeDeltaDataWriter(rootUri: String, lakeSchema: TableSchema,
                                rowSchema: StructType, idSchema: StructType,
                                staging: String,
                                policy: LakeRowLevel.SidecarPolicy)
    extends DeltaWriter[InternalRow] {

  private val store = new HadoopStore(rootUri)
  private val n = lakeSchema.columns.size
  private val hourIdx = rowSchema.fieldIndex(LakeDataSource.EventHourCol)
  private val idKeyIdx = idSchema.fieldIndex(LakeDataSource.ObjectKeyCol)
  private val idPosIdx = idSchema.fieldIndex(LakeDataSource.RowPosCol)

  // the shared declared-schema conversion table — see
  // LakeDataSource.externalGetters
  private val getters: Array[InternalRow => Any] =
    LakeDataSource.externalGetters(lakeSchema, rowSchema)

  private def hourTs(row: InternalRow): java.sql.Timestamp = {
    require(!row.isNullAt(hourIdx),
      s"graft-lake MERGE: NULL ${LakeDataSource.EventHourCol} — every row " +
        "must name its hour (UPDATE SET / INSERT must assign a non-null " +
        "timestamp)")
    new java.sql.Timestamp(Math.floorDiv(row.getLong(hourIdx), 1000L))
  }

  private val insRollers = scala.collection.mutable.LinkedHashMap
    .empty[Long, LakeWriter.RollingObjectWriter]
  private lazy val patchRoller = new LakeWriter.RollingObjectWriter(
    store, LakeDelta.patchSchema(lakeSchema), Instant.EPOCH, gzip = true,
    maxRecordsPerObject = 0L, keyPrefix = s"$staging/patch/",
    zoneMaps = false, bloomColumns = Nil)
  private var patchUsed = false

  private def values(row: InternalRow): Array[Any] = {
    val vals = new Array[Any](n)
    var i = 0
    while (i < n) { vals(i) = getters(i)(row); i += 1 }
    vals
  }

  private def writePatch(op: String, id: InternalRow, row: InternalRow): Unit = {
    val out = new Array[Any](n + 4)
    out(0) = op
    out(1) = id.getUTF8String(idKeyIdx).toString
    out(2) = java.lang.Long.valueOf(id.getLong(idPosIdx))
    if (row != null) {
      val vals = values(row)
      var i = 0
      while (i < n) { out(i + 3) = vals(i); i += 1 }
      out(n + 3) = hourTs(row)
    }
    patchUsed = true
    patchRoller.write(out)
  }

  override def insert(row: InternalRow): Unit = {
    val ts = hourTs(row)
    val hourSec = Math.floorDiv(ts.getTime, 3600000L) * 3600L
    insRollers.getOrElseUpdate(hourSec,
      new LakeWriter.RollingObjectWriter(store, lakeSchema,
        Instant.ofEpochSecond(hourSec), policy.gzip, 0L, s"$staging/ins/",
        policy.zoneMaps, policy.bloomColumns))
      .write(values(row))
  }

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit =
    writePatch("u", id, row)

  override def delete(meta: InternalRow, id: InternalRow): Unit =
    writePatch("d", id, null)

  override def commit(): WriterCommitMessage = {
    val insKeys = insRollers.values.flatMap(_.finish().map(_.key)).toSeq
    val patchKeys = if (patchUsed) patchRoller.finish().map(_.key) else Nil
    LakeCommitMessage(insKeys ++ patchKeys)
  }

  override def abort(): Unit = {
    insRollers.values.foreach(_.abort())
    if (patchUsed) patchRoller.abort()
  }
  override def close(): Unit = ()
}
