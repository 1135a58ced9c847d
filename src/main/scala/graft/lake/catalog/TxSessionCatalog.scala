package graft.lake.catalog

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.TableIdentifier
import org.apache.spark.sql.connector.catalog.{
  DelegatingCatalogExtension, Identifier, Table, TableChange}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.types.StructType

import graft.lake.TxTable

/** The reference deployment's EXACT catalog shape: the SESSION catalog
  * (`spark_catalog`) extended so that tables registered `USING txlog`
  * in the ordinary metastore resolve to transaction-log reads/writes,
  * while every other table (parquet, csv, views, Hive) passes through
  * untouched — Delta's `DeltaCatalog extends DelegatingCatalogExtension`
  * (reference spark/conf/spark-defaults.conf:9 sets
  * `spark.sql.catalog.spark_catalog` to it; etl/utils/base_table.py:49
  * addresses tables as `database.name` through it). Enable at session
  * build:
  *
  * {{{
  * .config("spark.sql.catalog.spark_catalog",
  *   "graft.lake.catalog.TxSessionCatalog")
  * }}}
  *
  * Then `CREATE TABLE db.t (...) USING txlog` registers the table in
  * the session metastore AND creates its transaction log (at the
  * explicit LOCATION or the metastore's default table path);
  * `SELECT/INSERT/DELETE ... db.t` and `VERSION AS OF`/`TIMESTAMP AS
  * OF` resolve by NAME through [[TxLakeTable]]. Because `txlog` is
  * also a registered V1 DataSource ([[graft.lake.TxLogProvider]]),
  * a session WITHOUT this extension still reads/writes the same
  * registered tables through Spark's V1 resolution — this class adds
  * the DSv2 surfaces (time travel by name, native DELETE, create-time
  * log initialization).
  */
class TxSessionCatalog extends DelegatingCatalogExtension {

  private def spark: SparkSession = SparkSession.active

  private def isTx(t: Table): Boolean =
    "txlog".equalsIgnoreCase(t.properties.get("provider"))

  private def locationOf(t: Table, ident: Identifier): String = {
    val loc = t.properties.get("location")
    require(loc != null && loc.nonEmpty,
      s"txlog table $ident has no location in the session catalog")
    loc
  }

  private def wrap(t: Table, ident: Identifier,
      asOf: Option[Long]): Table =
    new TxLakeTable(locationOf(t, ident), asOf,
      (ident.namespace() :+ ident.name()).mkString("."))

  override def loadTable(ident: Identifier): Table = {
    val t = super.loadTable(ident)
    if (isTx(t)) wrap(t, ident, None) else t
  }

  override def loadTable(ident: Identifier, version: String): Table = {
    val t = super.loadTable(ident)
    if (isTx(t)) wrap(t, ident, Some(version.toLong))
    else super.loadTable(ident, version)
  }

  override def loadTable(ident: Identifier,
      timestampMicros: Long): Table = {
    val t = super.loadTable(ident)
    if (!isTx(t)) return super.loadTable(ident, timestampMicros)
    val path = locationOf(t, ident)
    val v = new TxTable(spark, path)
      .versionAtTimestamp(timestampMicros / 1000L)
    wrap(t, ident, Some(v))
  }

  /** Spark's CreateTableExec calls the `Column[]` variant, which
    * [[DelegatingCatalogExtension]] forwards STRAIGHT to the delegate —
    * intercept it here and route through the StructType logic below. */
  /** `ALTER TABLE db.t ...` on a `USING txlog` table routes to the
    * LOG (each change is its own metadata commit — history-visible,
    * time-travel correct, and the source of truth every path-route
    * reader resolves), not to the delegate's metastore entry alone;
    * anything else delegates untouched. SET/UNSET TBLPROPERTIES is
    * ALSO mirrored to the delegate so `SHOW TBLPROPERTIES` (answered
    * by the metastore) agrees with the log. */
  override def alterTable(ident: Identifier,
      changes: TableChange*): Table = {
    val t = super.loadTable(ident)
    if (!isTx(t)) return super.alterTable(ident, changes: _*)
    TxCatalog.applyTableChanges(
      new TxTable(spark, locationOf(t, ident)), changes)
    val propChanges = changes.filter(c =>
      c.isInstanceOf[TableChange.SetProperty] ||
        c.isInstanceOf[TableChange.RemoveProperty])
    if (propChanges.nonEmpty)
      scala.util.Try(super.alterTable(ident, propChanges: _*)): Unit
    loadTable(ident)
  }

  override def createTable(ident: Identifier,
      columns: Array[org.apache.spark.sql.connector.catalog.Column],
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val provider = properties.get("provider")
    if (provider == null || !provider.equalsIgnoreCase("txlog"))
      return super.createTable(ident, columns, partitions, properties)
    createTable(ident,
      StructType(columns.map(c =>
        org.apache.spark.sql.types.StructField(
          c.name(), c.dataType(), c.nullable()))),
      partitions, properties)
  }

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val provider = properties.get("provider")
    if (provider == null || !provider.equalsIgnoreCase("txlog"))
      return super.createTable(ident, schema, partitions, properties)
    // name availability FIRST: claiming the log before a doomed
    // metastore registration would orphan a v0 at the default table
    // path and poison every retry of the same CREATE
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis
        .TableAlreadyExistsException(ident)
    val explicitLoc = Option(properties.get("location"))
    val path = explicitLoc.getOrElse(
      spark.sessionState.catalog.defaultTablePath(TableIdentifier(
        ident.name(),
        ident.namespace().headOption.orElse(Some("default")))).toString)
    val partCols = partitions.map(TxCatalog.identityColumn).toSeq
    val tab = new TxTable(spark, path)
    val preExisting = tab.exists
    if (preExisting) {
      // an explicit LOCATION over an existing log ATTACHES (the
      // re-registration flow after metastore loss — Delta's standard
      // CREATE-over-existing-location behavior); the declared schema,
      // when given, must match the stored one. A pre-existing log at
      // the DEFAULT path is refused: nothing registered it, so it is
      // debris from a dropped-name race, not a table to adopt silently.
      require(explicitLoc.isDefined,
        s"createTable($ident): default table path $path already holds " +
          "a transaction log — register it with an explicit LOCATION " +
          "or remove it")
      val stored = tab.read().schema
      require(schema.isEmpty || TxCatalog.sameColumns(schema, stored),
        s"createTable($ident): $path already holds a table whose " +
          s"schema differs from the declared one (stored: " +
          s"${stored.simpleString})")
    } else {
      require(tab.createIfAbsent(schema, partCols),
        s"createTable($ident) lost a race at $path")
    }
    val withLoc = new util.HashMap[String, String](properties)
    withLoc.put("location", path)
    try super.createTable(ident, schema, partitions, withLoc)
    catch {
      case e: Throwable =>
        // roll back only a log WE just created — never attached data
        if (!preExisting) scala.util.Try {
          val p = new org.apache.hadoop.fs.Path(path)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(p, true)
        }
        throw e
    }
    loadTable(ident)
  }
}
