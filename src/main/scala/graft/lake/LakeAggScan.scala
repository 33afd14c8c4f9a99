package graft.lake

import graft.types.{ColType, TableSchema}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.NamedReference
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._

/** Aggregate pushdown for the typed-CSV lake: `SELECT count(*) /
  * count(c) / min(c) / max(c) … [GROUP BY _event_hour]` answers from
  * the stats SIDECARS — the metadata-only aggregate contract
  * ([[LakeReader.statsSummary]]) on the DSv2 surface, where plain SQL
  * reaches it with no bespoke entry point. Per object:
  *
  *  - a readable sidecar answers from METADATA (exact `records`,
  *    exact per-column null counts, exact min/max bounds — the
  *    write-time tracker records read-back values, never approximations)
  *    and the object is NEVER OPENED;
  *  - a missing/torn sidecar, or bounds lost to NaN/±Inf POISONING,
  *    falls back to streaming that object's rows as raw per-record
  *    contributions — Spark's final merge (this scan never claims
  *    complete pushdown) keeps the result exact either way, including
  *    Spark's own NaN/-0.0 ordering on the poisoned fallback.
  *
  * Pushdown is accepted only for: no pushed filters (sidecars describe
  * WHOLE objects), grouping by nothing or by `_event_hour` (an object
  * belongs to exactly one hour), and Count/CountStar/Min/Max where
  * Min/Max columns are zone-map-TRACKED types (INTEGER/FLOAT/TIME) or
  * the key-derived `_event_hour` itself. Everything else falls back to
  * the normal row scan — Spark aggregates it the usual way.
  *
  * Output rows follow Spark's pushed-aggregate schema contract: group
  * columns first, then one column per aggregate, merged positionally by
  * the final aggregation Spark plans on top. */
private[lake] object LakeAgg {

  sealed trait Spec extends Serializable
  case object SCountStar extends Spec
  /** count(col): records − nulls(col); `_event_hour` is never null. */
  final case class SCount(col: String) extends Spec
  final case class SMin(col: String) extends Spec
  final case class SMax(col: String) extends Spec

  final case class Pushed(groupByHour: Boolean, specs: Seq[Spec])
      extends Serializable

  private def singleName(e: org.apache.spark.sql.connector.expressions.Expression)
      : Option[String] = e match {
    case nr: NamedReference if nr.fieldNames().length == 1 =>
      Some(nr.fieldNames()(0))
    case _ => None
  }

  /** Translate Spark's pushed [[Aggregation]]; None = not supported
    * (Spark then plans the ordinary row scan + aggregate). */
  def translate(agg: Aggregation, schema: TableSchema): Option[Pushed] = {
    val cols = schema.columns.toMap
    def minMaxable(c: String): Boolean =
      c == LakeDataSource.EventHourCol || cols.get(c).exists {
        case ColType.CInteger | ColType.CFloat | ColType.CTime => true
        case _ => false
      }
    val groupByHour = agg.groupByExpressions.toSeq match {
      case Seq() => Some(false)
      case Seq(g) if singleName(g).contains(LakeDataSource.EventHourCol) =>
        Some(true)
      case _ => None
    }
    val specs = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(SCountStar)
      case c: Count if !c.isDistinct =>
        singleName(c.column)
          .filter(n => cols.contains(n) || n == LakeDataSource.EventHourCol)
          .map(SCount)
      case m: Min => singleName(m.column).filter(minMaxable).map(SMin)
      case m: Max => singleName(m.column).filter(minMaxable).map(SMax)
      case _ => None
    }
    for (g <- groupByHour; ss <- sequence(specs)) yield Pushed(g, ss)
  }

  private def sequence[A](xs: Seq[Option[A]]): Option[Seq[A]] =
    if (xs.forall(_.isDefined)) Some(xs.map(_.get)) else None

  def sparkTypeOf(schema: TableSchema, col: String): DataType =
    if (col == LakeDataSource.EventHourCol) TimestampType
    else schema.columns.toMap.apply(col).sparkType

  /** The scan's output struct: group columns first, then aggregates —
    * the positional contract Spark's final aggregation merges by. */
  def outputStruct(schema: TableSchema, pushed: Pushed): StructType = {
    val group =
      if (pushed.groupByHour)
        Seq(StructField(LakeDataSource.EventHourCol, TimestampType, nullable = false))
      else Nil
    val aggs = pushed.specs.zipWithIndex.map {
      case (SCountStar, i) => StructField(s"agg_${i}_count_star", LongType, nullable = false)
      case (SCount(c), i) => StructField(s"agg_${i}_count_$c", LongType, nullable = false)
      case (SMin(c), i) => StructField(s"agg_${i}_min_$c", sparkTypeOf(schema, c))
      case (SMax(c), i) => StructField(s"agg_${i}_max_$c", sparkTypeOf(schema, c))
    }
    StructType(group ++ aggs)
  }
}

/** One partition = a CHUNK of object keys: each task reads one small
  * stats sidecar per object (and only FALLBACK objects' data), so a
  * million-object lake fans out as thousands of metadata tasks, not one
  * driver loop. Each key rides with its committed delete vector (key,
  * position count) when one exists (merge-on-read). */
final case class LakeAggInputPartition(
    keys: Seq[(String, Option[(String, Long)])],
    // equality deletes in scope per key ([[LakeEqDeletes]]): an
    // eq-scoped object's metadata answers are wrong (matches need a
    // read), so it always takes the fallback reader, filters applied
    eqs: Seq[Seq[LakeEqDeletes.Filter]] = Nil) extends InputPartition

final class LakeAggScan(rootUri: String, table: String,
                        lakeSchema: TableSchema, pushed: LakeAgg.Pushed,
                        // byName (evolved/reconcile) tables push ONLY
                        // COUNT(*): the sidecar-less fallback reader
                        // then resolves mixed headers by name
                        byName: Boolean = false)
    extends Scan with Batch {

  override def readSchema(): StructType = LakeAgg.outputStruct(lakeSchema, pushed)
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-lake-agg table=$table root=$rootUri " +
      s"PushedAggregates: ${pushed.specs.mkString("[", ", ", "]")}" +
      (if (pushed.groupByHour) s" GroupBy: [${LakeDataSource.EventHourCol}]" else "")

  /** Object keys per task: big enough to amortize task overhead over
    * sidecar reads, small enough that a modest lake still fans out. */
  private val ChunkSize = 16

  override def planInputPartitions(): Array[InputPartition] = {
    val store = new HadoopStore(rootUri)
    val view = LakeVersions.tableView(store, table)
    val keys = LakeReader.listTableKeys(store, table, None, Some(view))
    if (keys.isEmpty && LakeReader.firstTableKey(store, table).isEmpty)
      throw new IllegalArgumentException(
        s"no lake objects for table $table under $rootUri")
    val eqCompiled = LakeEqDeletes.compile(store, table, view.eqdels)
    keys.map(k => (
        (k, view.dvs.get(k).map(r => (r.key, r.count))),
        eqCompiled.filter(_.inScope(k)).map(_.filter)))
      .grouped(ChunkSize).map(ks => LakeAggInputPartition(
        ks.map(_._1), ks.map(_._2)): InputPartition)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new LakeAggReaderFactory(rootUri, lakeSchema, pushed, byName)
}

final class LakeAggReaderFactory(rootUri: String, lakeSchema: TableSchema,
                                 pushed: LakeAgg.Pushed,
                                 byName: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new LakeAggReader(rootUri, lakeSchema, pushed,
      partition.asInstanceOf[LakeAggInputPartition], byName)
}

/** Emits, per object: ONE metadata row (sidecar answers everything) or
  * that object's raw per-record contribution rows (fallback — missing/
  * torn sidecar, poisoned bounds, anything unparseable). Spark's final
  * aggregation merges both shapes identically. */
final class LakeAggReader(rootUri: String, lakeSchema: TableSchema,
                          pushed: LakeAgg.Pushed, part: LakeAggInputPartition,
                          byName: Boolean = false)
    extends PartitionReader[InternalRow] {
  import LakeAgg._

  private val store = new HadoopStore(rootUri)
  private val groupWidth = if (pushed.groupByHour) 1 else 0

  // fallback objects stream through the batch reader over exactly the
  // DATA columns the aggregates need (count(*) needs none)
  private val neededCols: Seq[String] = pushed.specs.collect {
    case SCount(c) if c != LakeDataSource.EventHourCol => c
    case SMin(c) if c != LakeDataSource.EventHourCol => c
    case SMax(c) if c != LakeDataSource.EventHourCol => c
  }.distinct
  private val fallbackStruct = StructType(neededCols.map { c =>
    StructField(c, sparkTypeOf(lakeSchema, c))
  })
  private val fallbackIdx: Map[String, Int] =
    neededCols.zipWithIndex.toMap

  private val keyIter = part.keys.zipAll(part.eqs,
    ("", None: Option[(String, Long)]), Seq.empty[LakeEqDeletes.Filter])
    .iterator
  private var rowIter: Iterator[InternalRow] = Iterator.empty
  private var inner: LakeObjectReader = _
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (!rowIter.hasNext) {
      if (inner != null) { inner.close(); inner = null }
      if (!keyIter.hasNext) return false
      val ((k, dv), eq) = keyIter.next()
      rowIter = rowsFor(k, dv, eq)
    }
    current = rowIter.next()
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = if (inner != null) inner.close()

  private def hourMicrosOf(key: String): Long =
    LakeKeys.parseKey(key).map(_._1.toEpochMilli * 1000L).getOrElse(
      throw new IllegalArgumentException(s"unparseable lake key $key"))

  private def rowsFor(key: String, dv: Option[(String, Long)],
                      eq: Seq[LakeEqDeletes.Filter]): Iterator[InternalRow] = {
    val hourMicros = hourMicrosOf(key)
    // an eq-scoped object's live-row answers need a read (the filter's
    // matches are invisible to the sidecar) — straight to fallback,
    // which applies the filters through the object reader
    val meta =
      if (eq.nonEmpty) None
      else try ZoneMaps.read(store, key).flatMap(metadataRow(_, hourMicros, dv))
      catch { case _: Exception => None }
    meta match {
      case Some(row) => Iterator.single(row)
      case None => fallbackRows(key, hourMicros, dv.map(_._1), eq)
    }
  }

  /** All aggregates answered from one sidecar, or None → fallback. A
    * VECTORED object (merge-on-read) stays metadata-answerable only for
    * row counts that cannot see the dead rows' VALUES — COUNT(*) and
    * count(_event_hour) are exactly `records − vector count` (the count
    * rides the generation record); per-column null counts and MIN/MAX
    * may live in deleted rows, so those objects read their (vector-
    * applied) data instead. */
  private def metadataRow(s: ZoneMaps.ObjectStats, hourMicros: Long,
                          dv: Option[(String, Long)])
      : Option[InternalRow] = {
    val dead = dv.fold(0L)(_._2)
    val vals = new Array[Any](groupWidth + pushed.specs.length)
    if (pushed.groupByHour) vals(0) = java.lang.Long.valueOf(hourMicros)
    var i = 0
    while (i < pushed.specs.length) {
      val v: Option[Any] = pushed.specs(i) match {
        case SCountStar => Some(java.lang.Long.valueOf(s.records - dead))
        case SCount(c) =>
          if (c == LakeDataSource.EventHourCol) // key-derived, never null
            Some(java.lang.Long.valueOf(s.records - dead))
          else if (dead > 0L) None // nulls among dead rows unknown → read
          else s.cols.get(c).map(cs => java.lang.Long.valueOf(s.records - cs.nulls))
        case SMin(c) =>
          if (dead > 0L) None else bound(s, c, hourMicros, min = true)
        case SMax(c) =>
          if (dead > 0L) None else bound(s, c, hourMicros, min = false)
      }
      v match {
        case Some(x) => vals(groupWidth + i) = x
        case None => return None // not answerable → whole object falls back
      }
      i += 1
    }
    Some(new GenericInternalRow(vals))
  }

  /** One bound as a Catalyst value: Some(null) is a legitimate answer
    * (all-null column aggregates to NULL); None = not answerable
    * (poisoned/absent bounds with non-null values present). */
  private def bound(s: ZoneMaps.ObjectStats, c: String, hourMicros: Long,
                    min: Boolean): Option[Any] = {
    if (c == LakeDataSource.EventHourCol)
      return Some(java.lang.Long.valueOf(hourMicros))
    val cs = s.cols.getOrElse(c, return None)
    val b = if (min) cs.min else cs.max
    b match {
      case Some(bd) => lakeSchema.columns.toMap.apply(c) match {
        case ColType.CInteger => Some(java.lang.Long.valueOf(bd.longValueExact()))
        case ColType.CFloat => Some(java.lang.Double.valueOf(bd.doubleValue()))
        case ColType.CTime => Some(java.lang.Long.valueOf(bd.longValueExact()))
        case _ => None // untracked type: translate() never accepts these
      }
      case None =>
        // bounds absent: an ALL-NULL column min/max-es to NULL (exact
        // from the null counts); otherwise bounds were poisoned — the
        // object must be read
        if (cs.nulls == s.records) Some(null) else None
    }
  }

  /** Raw per-record contributions off the object's rows: count columns
    * 0/1, min/max columns the row's value — Spark's final merge owns
    * the ordering semantics (NaN, -0.0) exactly as a row scan would.
    *
    * A fallback object that yields NO rows (sidecar-less AND retired by
    * the maintenance race, or header-only) emits one explicit ZERO
    * contribution in the UNGROUPED case: counts 0, min/max null — it
    * changes no answer, but guarantees a global aggregate's final merge
    * never runs over an empty scan (where `sum` of zero partial counts
    * would be NULL, not 0). Grouped-by-hour scans correctly emit
    * nothing — a vanished hour is no group, same as a row scan. */
  private def fallbackRows(key: String, hourMicros: Long,
                           dvKey: Option[String] = None,
                           eq: Seq[LakeEqDeletes.Filter] = Nil): Iterator[InternalRow] = {
    inner = new LakeObjectReader(rootUri, lakeSchema, fallbackStruct,
      LakeInputPartition(key, hourMicros / 1000L, dvKey), byName, eqs = eq)
    new Iterator[InternalRow] {
      private var ready = false
      private var done = false
      private var emitted = false
      private var zeroPending = false
      override def hasNext: Boolean = {
        if (zeroPending) return true
        if (done) return false
        if (!ready) {
          ready = inner.next(); done = !ready
          if (done && !emitted && !pushed.groupByHour) { zeroPending = true; return true }
        }
        ready
      }
      private def zeroRow(): InternalRow = {
        zeroPending = false
        val vals = new Array[Any](groupWidth + pushed.specs.length)
        var i = 0
        while (i < pushed.specs.length) {
          vals(groupWidth + i) = pushed.specs(i) match {
            case SCountStar | SCount(_) => java.lang.Long.valueOf(0L)
            case _ => null
          }
          i += 1
        }
        new GenericInternalRow(vals)
      }
      override def next(): InternalRow = {
        if (!hasNext) throw new NoSuchElementException
        if (zeroPending) return zeroRow()
        ready = false
        emitted = true
        val r = inner.get()
        val vals = new Array[Any](groupWidth + pushed.specs.length)
        if (pushed.groupByHour) vals(0) = java.lang.Long.valueOf(hourMicros)
        var i = 0
        while (i < pushed.specs.length) {
          vals(groupWidth + i) = pushed.specs(i) match {
            case SCountStar => java.lang.Long.valueOf(1L)
            case SCount(c) =>
              if (c == LakeDataSource.EventHourCol) java.lang.Long.valueOf(1L)
              else java.lang.Long.valueOf(
                if (r.isNullAt(fallbackIdx(c))) 0L else 1L)
            case SMin(c) => valueAt(r, c, hourMicros)
            case SMax(c) => valueAt(r, c, hourMicros)
          }
          i += 1
        }
        new GenericInternalRow(vals)
      }
    }
  }

  private def valueAt(r: InternalRow, c: String, hourMicros: Long): Any = {
    if (c == LakeDataSource.EventHourCol)
      return java.lang.Long.valueOf(hourMicros)
    val i = fallbackIdx(c)
    if (r.isNullAt(i)) null
    else lakeSchema.columns.toMap.apply(c) match {
      case ColType.CInteger => java.lang.Long.valueOf(r.getLong(i))
      case ColType.CFloat => java.lang.Double.valueOf(r.getDouble(i))
      case ColType.CTime => java.lang.Long.valueOf(r.getLong(i))
      case _ => null // unreachable: translate() never accepts these
    }
  }
}
