package graft.lake

import org.apache.spark.sql.catalyst.analysis.{NoSuchNamespaceException, NoSuchTableException}
import org.apache.spark.sql.connector.catalog.{Identifier, Table, TableCatalog, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL catalog for a typed-CSV lake: name lake tables in PLAIN SQL —
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.lake", classOf[LakeCatalog].getName)
  * spark.conf.set("spark.sql.catalog.lake.root", "s3a://bucket/prefix")
  * spark.sql("SELECT count(*) FROM lake.events WHERE ...")
  * spark.sql("INSERT INTO lake.events SELECT ...")   // staged-publish append
  * }}}
  *
  * `loadTable` hands back the same [[LakeTable]] as
  * `spark.read.format("graft-lake")`, so every connector behavior —
  * filter/limit/aggregate pushdown, runtime dynamic pruning, the
  * staged-publish append — applies identically to SQL-resolved tables.
  * Tables LIVE in the key layout (`YYYY/MM/DD/HH/table/…`): listing
  * walks the hour-directory levels (never a full-lake recursive
  * listing), existence = at least one object. DDL is refused loudly —
  * lake tables are CREATED by landing data (Collector, LakeWriter, the
  * connector's append), their schema IS the wire headers, and deletes
  * belong to the retention/maintenance protocol, not a SQL drop.
  *
  * The catalog is namespace-flat: identifiers are `<catalog>.<table>`. */
final class LakeCatalog extends TableCatalog {

  private var catName: String = _
  private var root: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catName = name
    root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException(
        s"graft-lake catalog '$name' needs spark.sql.catalog.$name.root=<lake root URI>"))
  }

  override def name(): String = catName

  private def requireFlat(ns: Array[String]): Unit =
    if (ns.nonEmpty) throw new NoSuchNamespaceException(ns)

  /** Table names = the distinct table directories under the existing
    * hour prefixes — O(hour dirs), the same pruned level walk as every
    * lake read. */
  override def listTables(namespace: Array[String]): Array[Identifier] = {
    requireFlat(namespace)
    val store = new HadoopStore(root)
    LakeReader.walkHourPrefixes(store)
      .flatMap(h => store.listDirs(h))
      .distinct.sorted
      .map(t => Identifier.of(Array.empty, t)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    requireFlat(ident.namespace())
    val store = new HadoopStore(root)
    if (LakeReader.firstTableKey(store, ident.name()).isEmpty)
      throw new NoSuchTableException(ident)
    new LakeTable(root, ident.name())
  }

  override def tableExists(ident: Identifier): Boolean =
    ident.namespace().isEmpty &&
      LakeReader.firstTableKey(new HadoopStore(root), ident.name()).isDefined

  private def refuse(what: String): Nothing =
    throw new UnsupportedOperationException(
      s"graft-lake catalog '$catName': $what — lake tables are created by " +
        "landing data (Collector / LakeWriter / connector append), their " +
        "schema is the wire headers, and deletes belong to " +
        "LakeMaintenance.expire, not SQL DDL")

  override def createTable(ident: Identifier, schema: StructType,
                           partitions: Array[Transform],
                           properties: java.util.Map[String, String]): Table =
    refuse(s"CREATE TABLE ${ident.name()} is not supported")

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    refuse(s"ALTER TABLE ${ident.name()} is not supported")

  override def dropTable(ident: Identifier): Boolean =
    refuse(s"DROP TABLE ${ident.name()} is not supported")

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    refuse(s"RENAME TABLE ${oldIdent.name()} is not supported")
}
