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
    // session-scoped registration: two sessions in one JVM may bind the
    // same catalog NAME to different warehouses (multi-tenant notebook
    // server) — a name-keyed global would let one session's maintenance
    // SQL resolve through the other's warehouse
    TxCatalog.instances.put(
      (TxCatalog.sessionKey(spark), name), this): Unit
  }

  override def name(): String = catName

  /** `<warehouse>/<ns...>/<table>` — the one name→path rule for
    * MANAGED tables; external tables (explicit LOCATION) keep this
    * directory too, holding only the `_location` pointer file. */
  def pathOf(ident: Identifier): String =
    (ident.namespace() :+ ident.name())
      .foldLeft(warehouse)(new Path(_, _)).toString

  /** The table's actual transaction-log root: the warehouse directory
    * itself (managed), or the target of its persisted `_location`
    * pointer (external — CREATE TABLE ... LOCATION). The pointer lives
    * IN the filesystem metastore, so external tables survive restarts
    * and are visible to every session on the warehouse. */
  def resolvedPath(ident: Identifier): String = {
    val p = new Path(pathOf(ident))
    externalTarget(p).getOrElse(p.toString)
  }

  private def externalTarget(dir: Path): Option[String] = {
    val ptr = new Path(dir, TxCatalog.LocationPointer)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  private def isTable(p: Path): Boolean =
    TxLog.latestVersion(fs, p) >= 0

  /** A warehouse entry counts as a table when it IS a log root or
    * POINTS at one. */
  private def isTableDir(p: Path): Boolean =
    isTable(p) || externalTarget(p).exists(t => isTable(new Path(t)))

  // ---- tables ----

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = namespace.foldLeft(warehouse)(new Path(_, _))
    if (!fs.exists(dir)) {
      // the root namespace exists by definition (namespaceExists agrees)
      // even before the first CREATE materializes the warehouse dir
      if (namespace.isEmpty) return Array.empty
      throw new NoSuchNamespaceException(namespace)
    }
    fs.listStatus(dir).filter(_.isDirectory).map(_.getPath)
      .filter(isTableDir).map(p => Identifier.of(namespace, p.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    isTable(new Path(resolvedPath(ident)))

  override def loadTable(ident: Identifier): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new TxLakeTable(resolvedPath(ident), None, fullName(ident))
  }

  /** `VERSION AS OF <v>` (Spark passes the literal as a string). */
  override def loadTable(ident: Identifier, version: String): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    new TxLakeTable(resolvedPath(ident), Some(version.toLong),
      fullName(ident))
  }

  /** `TIMESTAMP AS OF <t>` — Spark hands MICROseconds; the log's
    * in-commit stamps are millis. */
  override def loadTable(ident: Identifier, timestampMicros: Long): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    val path = resolvedPath(ident)
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
    val managed = new Path(pathOf(ident))
    val external = Option(properties.get("location"))
      .filter(loc => new Path(loc) != managed)
    // TBLPROPERTIES validate FIRST and fold into the create commit
    // itself: a typo'd txlog.* key or bad value refuses before any
    // table is registered (a create-then-configure split would leave
    // a half-made table a retry then trips over), and one DDL costs
    // one log version
    val userProps = properties.asScala.toMap --
      TxCatalog.reservedTableProps
    TxTable.validateTblProperties(userProps)
    external match {
      case Some(loc) =>
        // external table: persist the name→location pointer in the
        // warehouse, then create the log (or ATTACH to one already
        // there — the re-registration flow after metastore loss; the
        // declared schema must then match the stored one)
        val tab = new TxTable(spark, loc)
        if (isTable(new Path(loc))) {
          val stored = tab.read().schema
          require(schema.isEmpty ||
              TxCatalog.sameColumns(schema, stored),
            s"createTable($ident): $loc already holds a table whose " +
              s"schema differs from the declared one (stored: " +
              s"${stored.simpleString})")
          // ATTACH to an existing log: properties can't ride its v0,
          // so they land as one configure commit (already validated)
          if (userProps.nonEmpty) tab.setTblProperties(userProps): Unit
        } else {
          require(tab.createIfAbsent(schema,
              partitions.map(TxCatalog.identityColumn).toSeq, userProps),
            s"createTable($ident) lost a race at $loc")
        }
        fs.mkdirs(managed)
        val out = fs.create(new Path(managed, TxCatalog.LocationPointer),
          true)
        try out.write(loc.getBytes("UTF-8")) finally out.close()
      case None =>
        require(new TxTable(spark, managed.toString).createIfAbsent(
            schema, partitions.map(TxCatalog.identityColumn).toSeq,
            userProps),
          s"createTable($ident) lost a race at $managed")
    }
    new TxLakeTable(resolvedPath(ident), None, fullName(ident))
  }

  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    if (!tableExists(ident)) throw new NoSuchTableException(ident)
    TxCatalog.applyTableChanges(
      new TxTable(spark, resolvedPath(ident)), changes)
    loadTable(ident)
  }

  override def dropTable(ident: Identifier): Boolean = {
    val p = new Path(pathOf(ident))
    if (externalTarget(p).isDefined)
      // external table: DROP unregisters the name (deletes the pointer
      // directory) and leaves the data in place — Delta's semantics
      fs.delete(p, true)
    else if (!isTable(p)) false
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
      .filterNot(isTableDir).map(p => Array(p.getName))

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
      fs.exists(dir) && !isTableDir(dir)
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
  /** The pointer file a CREATE TABLE ... LOCATION leaves at the
    * table's warehouse directory: its content is the external log
    * root. Underscore-prefixed, so data readers ignore it. */
  private[catalog] val LocationPointer = "_location"

  /** Keys Spark itself stuffs into a CREATE TABLE's property map —
    * engine bookkeeping, not user TBLPROPERTIES; they stay out of the
    * log's configuration. */
  private[catalog] val reservedTableProps: Set[String] =
    Set("provider", "location", "owner", "external", "comment",
      "is_managed_location", "option.path", "path")

  /** The DSv2 `TableChange` → log-commit translation both catalog
    * faces share ([[TxCatalog.alterTable]] and the session catalog's
    * override for `USING txlog` tables): each change lands as its own
    * metadata commit through the ordinary [[TxTable]] surface —
    * optimistic-concurrency, history-visible, time-travel correct. */
  private[catalog] def applyTableChanges(tab: TxTable,
      changes: Seq[TableChange]): Unit =
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
      case t: TableChange.UpdateColumnType =>
        require(t.fieldNames.length == 1,
          "txlog ALTER supports top-level columns only")
        tab.widenColumnType(t.fieldNames()(0), t.newDataType().sql): Unit
      case c: TableChange.UpdateColumnComment =>
        require(c.fieldNames.length == 1,
          "txlog ALTER supports top-level columns only")
        tab.setColumnComment(c.fieldNames()(0), c.newComment()): Unit
      case p: TableChange.SetProperty =>
        tab.setTblProperties(Map(p.property -> p.value)): Unit
      case p: TableChange.RemoveProperty =>
        tab.unsetTblProperties(Seq(p.property)): Unit
      case other => throw new UnsupportedOperationException(
        s"txlog catalog cannot apply $other")
    }

  /** Live instances keyed by (owning session, catalog name) — how the
    * lake's SQL statement parser resolves `DESCRIBE HISTORY cat.db.t`-
    * style identifier targets to table roots without private
    * catalog-manager API. Session-scoped because catalog conf is:
    * the same name may bind different warehouses in different sessions
    * of one JVM. */
  private[graft] val instances =
    TrieMap.empty[(String, String), TxCatalog]

  private[catalog] def sessionKey(s: SparkSession): String =
    // identity, not equality: each session object is one catalog scope
    // (the public API exposes no session UUID)
    Integer.toHexString(System.identityHashCode(s))

  /** Column-shape equality for ATTACH (re-registering an existing
    * external table): same names (case-insensitive) and types in
    * order; nullability is the stored schema's business. */
  private[catalog] def sameColumns(declared: StructType,
      stored: StructType): Boolean =
    declared.length == stored.length &&
      declared.fields.zip(stored.fields).forall { case (a, b) =>
        a.name.equalsIgnoreCase(b.name) && a.dataType == b.dataType
      }

  private[lake] def identityColumn(t: Transform): String = {
    require(t.name == "identity",
      s"txlog tables partition by column identity only, got $t")
    t.references()(0).fieldNames().mkString(".")
  }

  /** Resolve a dotted identifier (`cat.ns.table`, `cat.table`) through
    * a [[TxCatalog]] registered by the ACTIVE session to its table
    * root, if the leading part names one and the table exists. When no
    * INSTANCE is registered for this session, fall back to the
    * session's own `spark.sql.catalog.<cat>` conf — a streaming query
    * runs on a CLONED session (fresh identity, inherited conf), so the
    * stream-thread resolution must come from conf, not from the
    * parent's instance registration. The fallback instantiates and
    * initializes through the normal path, so it self-registers for
    * the clone and stays session-scoped. */
  private[graft] def resolve(parts: Seq[String]): Option[String] =
    parts match {
      case cat +: rest if rest.nonEmpty =>
        scala.util.Try(SparkSession.active).toOption
          .flatMap(s => instances.get((sessionKey(s), cat))
            .orElse(fromConf(s, cat)))
          .flatMap { c =>
            val ident =
              Identifier.of(rest.init.toArray, rest.last)
            if (c.tableExists(ident)) Some(c.resolvedPath(ident))
            else None
          }
      case _ => None
    }

  /** The MANAGED path a dotted identifier WOULD occupy in a registered
    * [[TxCatalog]] — no existence check (a CLONE destination does not
    * exist yet). Writing a transaction log there IS registration (the
    * filesystem is the metastore). None when the leading part names no
    * TxCatalog of the active session. */
  private[graft] def pathFor(parts: Seq[String]): Option[String] =
    parts match {
      case cat +: rest if rest.nonEmpty =>
        scala.util.Try(SparkSession.active).toOption
          .flatMap(s => instances.get((sessionKey(s), cat))
            .orElse(fromConf(s, cat)))
          .map(_.pathOf(Identifier.of(rest.init.toArray, rest.last)))
      case _ => None
    }

  private def fromConf(s: SparkSession, cat: String): Option[TxCatalog] =
    scala.util.Try(s.conf.get(s"spark.sql.catalog.$cat")).toOption
      .filter(_ == classOf[TxCatalog].getName)
      .flatMap { _ =>
        val prefix = s"spark.sql.catalog.$cat."
        val opts = s.conf.getAll.collect {
          case (k, v) if k.startsWith(prefix) =>
            k.stripPrefix(prefix) -> v
        }
        scala.util.Try {
          val c = new TxCatalog
          c.initialize(cat, new CaseInsensitiveStringMap(opts.asJava))
          c
        }.toOption
      }
}
