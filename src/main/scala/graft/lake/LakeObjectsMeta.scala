package graft.lake

import java.time.Instant
import java.util.{Map => JMap}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType, StringType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** The OBJECTS metadata read — the Iceberg `table$files` / Delta
  * `DESCRIBE DETAIL` idea on the key layout:
  *
  * {{{
  * spark.read.format("graft-lake")
  *   .option("table", "events").option("metadata", "objects")
  *   .load(root)   // one row per LIVE object
  * }}}
  *
  * Columns: `_object_key`, `_event_hour`, `bytes` (one stat RPC; null
  * where the backend cannot answer), `records` / `live_records` (stats
  * sidecar; `live_records` = `records` − delete-vector count — the same
  * metadata-exact arithmetic COUNT(*) pushdown uses; both null when the
  * object has no stats sidecar; equality-delete victims are NOT
  * subtracted — the `eq_deletes_in_scope` column says when that
  * caveat applies), `dv_key` / `dv_count` (the object's live delete
  * vector, if any), `eq_deletes_in_scope` (how many live equality
  * deletes scope this object), `has_stats` / `has_bloom`.
  *
  * '''Scale posture''': the DRIVER holds only the key list (the same
  * listing every scan already does — version-aware: tombstoned and
  * uncommitted-intent keys excluded, `asOfGeneration` reads a retained
  * snapshot's listing instead); per-object work (stat + two sidecar
  * probes) runs on EXECUTORS, keys chunked into bounded partitions. A
  * million-object table costs the driver one listing and the cluster
  * one metadata-sized read wave — no data object is ever opened. */
object LakeObjectsMeta {

  val MetadataOption = "metadata"

  val Schema: StructType = StructType(Seq(
    StructField("_object_key", StringType, nullable = false),
    StructField("_event_hour", TimestampType, nullable = false),
    StructField("bytes", LongType, nullable = true),
    StructField("records", LongType, nullable = true),
    StructField("live_records", LongType, nullable = true),
    StructField("dv_key", StringType, nullable = true),
    StructField("dv_count", LongType, nullable = true),
    StructField("eq_deletes_in_scope", IntegerType, nullable = false),
    StructField("has_stats", BooleanType, nullable = false),
    StructField("has_bloom", BooleanType, nullable = false)))

  /** Keys per input partition: small enough to parallelize a modest
    * table, large enough that a million-object listing stays a few
    * thousand tasks. */
  private val KeysPerPartition = 512

  def requested(options: CaseInsensitiveStringMap): Boolean =
    options.containsKey(MetadataOption)

  def validate(options: CaseInsensitiveStringMap): Unit = {
    val v = options.get(MetadataOption)
    require(v == "objects",
      s"graft-lake: unknown metadata table '$v' — only 'objects' exists")
  }

  /** One per-object planning row: everything the executor cannot derive
    * from the key alone. */
  final case class Entry(key: String, dvKey: String, dvCount: Long,
                         eqInScope: Int) extends Serializable

  final case class Chunk(entries: Array[Entry]) extends InputPartition

  /** The functional face (what the connector table delegates to, and
    * the directly-callable API). */
  def read(spark: org.apache.spark.sql.SparkSession, rootUri: String,
           table: String, asOfGeneration: Option[Long] = None)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.read.format("graft-lake").option("table", table)
      .option(MetadataOption, "objects")
      .options(asOfGeneration.map(g =>
        Map("asOfGeneration" -> g.toString)).getOrElse(Map.empty))
      .load(rootUri).select(Schema.fieldNames.map(col).toSeq: _*)
  }

  private[lake] def plan(root: String, table: String,
                         asOf: Option[Long]): Array[InputPartition] = {
    val store = new HadoopStore(root)
    val (keys, dvs, eqdels) = asOf match {
      case Some(g) =>
        (LakeVersions.liveAt(store, table, g),
          LakeVersions.dvsAt(store, table, g),
          LakeVersions.eqdelsAt(store, table, g))
      case None =>
        val view = LakeVersions.tableView(store, table)
        (LakeReader.listTableKeys(store, table, None, Some(view)),
          view.dvs, view.eqdels)
    }
    val compiled = LakeEqDeletes.compile(store, table, eqdels)
    keys.sorted.map { k =>
      val dv = dvs.get(k)
      Entry(k, dv.map(_.key).orNull, dv.map(_.count).getOrElse(-1L),
        compiled.count(_.inScope(k)))
    }.grouped(KeysPerPartition).map(g => Chunk(g.toArray))
      .toArray[InputPartition]
  }
}

/** The DSv2 table the provider returns for `option("metadata",
  * "objects")` — a plain batch scan of [[LakeObjectsMeta.Schema]]. */
final class LakeObjectsTable(rootUri: String, tableName: String,
                             asOfGeneration: Option[Long])
    extends Table with SupportsRead {

  override def name(): String = s"graft-lake://$tableName$$objects"
  override def schema(): StructType = LakeObjectsMeta.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = LakeObjectsMeta.Schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        LakeObjectsMeta.plan(rootUri, tableName, asOfGeneration)
      override def createReaderFactory(): PartitionReaderFactory =
        new LakeObjectsReaderFactory(rootUri)
    }
}

private final class LakeObjectsReaderFactory(rootUri: String)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val entries = partition.asInstanceOf[LakeObjectsMeta.Chunk].entries
    new PartitionReader[InternalRow] {
      private val store = new HadoopStore(rootUri)
      private var i = -1
      override def next(): Boolean = { i += 1; i < entries.length }
      override def get(): InternalRow = {
        val e = entries(i)
        val hourMicros = LakeKeys.parseKey(e.key)
          .map(_._1).getOrElse(Instant.EPOCH).toEpochMilli * 1000L
        val bytes = store.size(e.key)
        val stats = ZoneMaps.read(store, e.key)
        val records = stats.map(_.records)
        val dvCount = if (e.dvKey == null) 0L else e.dvCount
        val row = new org.apache.spark.sql.catalyst.expressions
          .GenericInternalRow(10)
        row.update(0, UTF8String.fromString(e.key))
        row.setLong(1, hourMicros)
        bytes match {
          case Some(b) => row.setLong(2, b)
          case None => row.setNullAt(2)
        }
        records match {
          case Some(r) =>
            row.setLong(3, r)
            row.setLong(4, r - dvCount)
          case None =>
            row.setNullAt(3); row.setNullAt(4)
        }
        if (e.dvKey == null) { row.setNullAt(5); row.setNullAt(6) }
        else {
          row.update(5, UTF8String.fromString(e.dvKey))
          row.setLong(6, e.dvCount)
        }
        row.setInt(7, e.eqInScope)
        row.setBoolean(8, stats.isDefined)
        row.setBoolean(9, store.exists(BloomMaps.bloomKey(e.key)))
        row
      }
      override def close(): Unit = ()
    }
  }
}
