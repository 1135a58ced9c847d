package graft.lake.catalog

import java.util

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{
  NoSuchNamespaceException, NoSuchTableException, TableAlreadyExistsException}
import org.apache.spark.sql.connector.catalog.{
  Identifier, NamespaceChange, SupportsNamespaces, Table, TableCatalog,
  TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.lake.{TxLog, TxTable}

/** Name-addressed lake tables: a DataSource V2 [[TableCatalog]] whose
  * backing store is a WAREHOUSE DIRECTORY — `catalog.namespace.table`
  * resolves to `<warehouse>/namespace/table`, a transaction-log root.
  * The reference deployment's equivalent is its catalog default
  * (spark/conf/spark-defaults.conf:9 `spark.sql.catalog.spark_catalog =
  * DeltaCatalog` + Hive support in etl/test/conftest.py:69): a user
  * writes `SELECT * FROM db.tbl` / `CREATE TABLE db.tbl` and the name
  * reaches the lake, never a path. Registration is one conf pair, and
  * works AT RUNTIME on an already-built session (catalogs load lazily
  * on first reference):
  *
  * {{{
  * spark.conf.set("spark.sql.catalog.lake",
  *   "graft.lake.catalog.TxCatalog")
  * spark.conf.set("spark.sql.catalog.lake.warehouse", "/data/lake")
  * spark.sql("CREATE TABLE lake.gold.orders (k BIGINT, v STRING) " +
  *   "USING txlog PARTITIONED BY (v)")
  * spark.sql("INSERT INTO lake.gold.orders SELECT ...")
  * spark.sql("SELECT * FROM lake.gold.orders VERSION AS OF 0")
  * }}}
  *
  * Time travel is native: Spark's `VERSION AS OF` / `TIMESTAMP AS OF`
  * resolve through the [[loadTable]] overloads. DDL surface: CREATE
  * (including CTAS), DROP, RENAME, ALTER ADD/RENAME/DROP COLUMN
  * (routed to the log's schema-evolution commits), SHOW TABLES,
  * CREATE/DROP NAMESPACE. The filesystem IS the metastore: a
  * namespace is a directory, a table is a directory with a `_txlog` —
  * so the catalog needs no server, survives restarts, and two sessions
  * pointed at the same warehouse see the same tables (the log's
  * optimistic concurrency already arbitrates writes).
  *
  * For replacing the SESSION catalog itself (bare `db.tbl` with Hive
  * registration, the reference's exact shape) see [[TxSessionCatalog]].
  */
class TxCatalog extends TableCatalog with SupportsNamespaces {

  private var catName: String = _
  private var warehouse: Path = _
  private def spark: SparkSession = SparkSession.active
  private def fs: FileSystem =
    warehouse.getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def initialize(name: String,
      options: CaseInsensitiveStringMap): Unit = {
    catName = name
    val wh = options.get("warehouse")
    require(wh != null && wh.nonEmpty,
      s"catalog $name needs spark.sql.catalog.$name.warehouse")
    warehouse = new Path(wh)
    TxCatalog.instances.put(name, this): Unit
  }

  override def name(): String = catName

  /** `<warehouse>/<ns...>/<table>` — the one name→path rule. */
  def pathOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name())
      .foldLeft(warehouse)(new Path(_, _)).toString

  private def isTable(p: Path): Boolean =
    TxLog.latestVersion(fs, p) >= 0

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(warehouse)(new Path(_, _))
    if (!fs.exists(dir)) throw new NoSuchNamespaceException(namespace)
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(isTable).map(p => Identifier.of(namespace, p.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(new Path(pathOf(ident)))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new TxLakeTable(pathOf(ident), None, fullName(ident))
  }

  /** `VERSION AS OF <v>` (Spark passes the literal as a string). */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new TxLakeTable(pathOf(ident), Some(version.toLong), fullName(ident))
  }

  /** `TIMESTAMP AS OF <t>` — Spark hands MICROseconds; the log's
    * in-commit stamps are millis. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val path = pathOf(ident)
    val v = new TxTable(spark, path)
      .versionAtTimestamp(timestampMicros / 1000L)
    new TxLakeTable(path, Some(v), fullName(ident))
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    if (tableExists(ident)) throw new TableAlreadyExistsException(ident)
    val provider = Option(properties.get("provider"))
    require(provider.forall(_.equalsIgnoreCase("txlog")),
      s"catalog $catName stores txlog tables; got USING ${provider.get}")
    val path = Option(properties.get("location")).getOrElse(pathOf(ident))
    val partCols = partitions.map(TxCatalog.identityColumn).toSeq
    require(new TxTable(spark, path).createIfAbsent(schema, partCols),
      s"createTable($ident) lost a race at $path")
    new TxLakeTable(path, None, fullName(ident))
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val tab = new TxTable(spark, pathOf(ident))
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    changes.foreach {
      case a: TableChange.AddColumn =>
        require(a.fieldNames.length == 1,
          "txlog ALTER supports top-level columns only")
        tab.addColumn(a.fieldNames()(0), a.dataType().sql): Unit
      case r: TableChange.RenameColumn =>
        require(r.fieldNames.length == 1,
          "txlog ALTER supports top-level columns only")
        tab.renameColumn(r.fieldNames()(0), r.newName): Unit
      case d: TableChange.DeleteColumn =>
        require(d.fieldNames.length == 1,
          "txlog ALTER supports top-level columns only")
        tab.dropColumn(d.fieldNames()(0)): Unit
      case u: TableChange.UpdateColumnNullability =>
        if (u.nullable) tab.dropNotNull(u.fieldNames()(0))
        else tab.addNotNull(u.fieldNames()(0)): Unit
      case other => throw new UnsupportedOperationException(
        s"txlog catalog cannot apply $other")
    }
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(pathOf(ident))
    if (!isTable(p)) false
    else fs.delete(p, true)
  }

  override def renameTable(oldIdent: Identifier,
      newIdent: Identifier): Unit = {
    if (!tableExists(oldIdent)) throw new NoSuchTableException(oldIdent)
    if (tableExists(newIdent))
      throw new TableAlreadyExistsException(newIdent)
    val dest = new Path(pathOf(newIdent))
    fs.mkdirs(dest.getParent)
    require(fs.rename(new Path(pathOf(oldIdent)), dest),
      s"rename $oldIdent -> $newIdent failed")
  }

  override def invalidateTable(ident: Identifier): Unit = ()

  // ---- namespaces: directories without a _txlog ----

  override def listNamespaces(): Array[Array[String]] =
    if (!fs.exists(warehouse)) Array.empty
    else fs.listStatus(warehouse).filter(_.isDirectory).map(_.getPath)
      .filterNot(isTable).map(p => Array(p.getName))

  override def listNamespaces(
      namespace: Array[String]): Array[Array[String]] = {
    if (namespace.isEmpty) return listNamespaces()
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Array.empty // one level deep — namespaces do not nest
  }

  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.isEmpty || {
      val dir = namespace.foldLeft(warehouse)(new Path(_, _))
      fs.exists(dir) && !isTable(dir)
    }

  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchNamespaceException(namespace)
    Map("location" ->
      namespace.foldLeft(warehouse)(new Path(_, _)).toString).asJava
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit = {
    require(namespace.length == 1,
      s"txlog namespaces are one level deep, got ${namespace.mkString(".")}")
    fs.mkdirs(new Path(warehouse, namespace(0))): Unit
  }

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException(
      "txlog namespaces carry no mutable metadata")

  override def dropNamespace(namespace: Array[String],
      cascade: Boolean): Boolean = {
    if (!namespaceExists(namespace) || namespace.isEmpty) return false
    if (!cascade && listTables(namespace).nonEmpty)
      throw new IllegalStateException(
        s"namespace ${namespace.mkString(".")} is not empty")
    fs.delete(namespace.foldLeft(warehouse)(new Path(_, _)), true)
  }

  private def fullName(ident: Identifier): String =
    (catName +: ident.namespace() :+ ident.name()).mkString(".")
}

object TxCatalog {
  /** Live instances by catalog name — how the lake's SQL statement
    * parser resolves `DESCRIBE HISTORY cat.db.t`-style identifier
    * targets to table roots without private catalog-manager API. */
  private[graft] val instances = TrieMap.empty[String, TxCatalog]

  private[lake] def identityColumn(t: Transform): String = {
    require(t.name == "identity",
      s"txlog tables partition by column identity only, got $t")
    t.references()(0).fieldNames().mkString(".")
  }

  /** Resolve a dotted identifier (`cat.ns.table`, `cat.table`) through
    * a registered [[TxCatalog]] to its table root, if the leading part
    * names one and the table exists. */
  private[graft] def resolve(parts: Seq[String]): Option[String] =
    parts match {
      case cat +: rest if rest.nonEmpty =>
        instances.get(cat).flatMap { c =>
          val ident =
            Identifier.of(rest.init.toArray, rest.last)
          if (c.tableExists(ident)) Some(c.pathOf(ident)) else None
        }
      case _ => None
    }
}
