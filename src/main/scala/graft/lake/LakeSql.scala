package graft.lake

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types._

/** SQL surface for lake MAINTENANCE — the statement family Delta
  * exposes through its parser extension (OPTIMIZE / VACUUM / DESCRIBE
  * HISTORY / RESTORE), re-expressed over [[TxTable]]:
  *
  *   - `OPTIMIZE '<path>'` — bin-pack / incremental re-cluster
  *   - `OPTIMIZE '<path>' ZORDER BY (a, b)` — global 2-D re-cluster
  *   - `VACUUM '<path>' [RETAIN <n> VERSIONS]` — reclaim unreferenced
  *     data/sidecar files (version-based retention; default 1)
  *   - `VACUUM LOG '<path>' [RETAIN <n> VERSIONS]` — log retention
  *     ([[TxLog.cleanLog]]; default 10)
  *   - `DESCRIBE HISTORY '<path>'` — the commit ledger with operation
  *     metrics
  *   - `RESTORE '<path>' TO VERSION AS OF <v>` — rewind as a new commit
  *
  * Two routes to the same commands: `spark.sql(...)` on a session built
  * with [[graft.functions.GraftExtensions]] (injectParser delegates
  * everything that is not one of these shapes to Spark's parser
  * verbatim), or [[LakeSql.run]] on ANY session — the harness/test
  * entry, since a session's parser is fixed at build time.
  */
object LakeSql {

  private val OptZ =
    """(?is)\s*OPTIMIZE\s+'([^']+)'\s+ZORDER\s+BY\s*\(\s*(\w+)\s*,\s*(\w+)\s*\)\s*""".r
  private val Opt = """(?is)\s*OPTIMIZE\s+'([^']+)'\s*""".r
  private val VacLog =
    """(?is)\s*VACUUM\s+LOG\s+'([^']+)'(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*""".r
  private val Vac =
    """(?is)\s*VACUUM\s+'([^']+)'(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*""".r
  private val Hist = """(?is)\s*DESCRIBE\s+HISTORY\s+'([^']+)'\s*""".r
  private val Rest =
    """(?is)\s*RESTORE\s+'([^']+)'\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*""".r

  /** One of the maintenance statement shapes, or None — the caller
    * (the injected parser) delegates None to Spark's own parser. */
  def parse(sqlText: String): Option[LogicalPlan] = sqlText match {
    case OptZ(p, a, b) => Some(OptimizeCommand(p, Some((a, b))))
    case Opt(p)        => Some(OptimizeCommand(p, None))
    case VacLog(p, n)  =>
      Some(VacuumLogCommand(p, Option(n).map(_.toInt).getOrElse(10)))
    case Vac(p, n)     =>
      Some(VacuumCommand(p, Option(n).map(_.toInt).getOrElse(1)))
    case Hist(p)       => Some(HistoryCommand(p))
    case Rest(p, v)    => Some(RestoreCommand(p, v.toLong))
    case _             => None
  }

  /** Parse-and-execute on an arbitrary session (no parser injection
    * needed): the same command objects `spark.sql` would plan. Refuses
    * non-maintenance SQL — that belongs to `spark.sql` itself. */
  def run(spark: SparkSession, sqlText: String): DataFrame =
    parse(sqlText) match {
      case Some(cmd: LeafRunnableCommand) =>
        spark.createDataFrame(
          cmd.run(spark).asJava,
          StructType(cmd.output.map(a =>
            StructField(a.name, a.dataType, a.nullable))))
      case _ => throw new IllegalArgumentException(
        s"not a lake maintenance statement: $sqlText")
    }

  private def attr(name: String, dt: DataType,
      nullable: Boolean = false): Attribute =
    AttributeReference(name, dt, nullable)()

  case class OptimizeCommand(path: String,
      zorder: Option[(String, String)]) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(attr("version", LongType))
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(new TxTable(spark, path).optimize(zorderBy = zorder)))
  }

  case class VacuumCommand(path: String, keepVersions: Int)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(attr("removed_path", StringType))
    override def run(spark: SparkSession): Seq[Row] =
      new TxTable(spark, path).vacuum(keepVersions).map(Row(_))
  }

  case class VacuumLogCommand(path: String, keepVersions: Int)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] =
      Seq(attr("removed_log_file", StringType))
    override def run(spark: SparkSession): Seq[Row] =
      new TxTable(spark, path).vacuumLog(keepVersions).map(Row(_))
  }

  case class HistoryCommand(path: String) extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(
      attr("version", LongType), attr("op", StringType),
      attr("read_version", LongType),
      attr("timestamp_ms", LongType, nullable = true),
      attr("operation_metrics", MapType(StringType, LongType),
        nullable = true))
    override def run(spark: SparkSession): Seq[Row] =
      new TxTable(spark, path).history().collect().toSeq
  }

  case class RestoreCommand(path: String, toVersion: Long)
      extends LeafRunnableCommand {
    override val output: Seq[Attribute] = Seq(attr("version", LongType))
    override def run(spark: SparkSession): Seq[Row] =
      Seq(Row(new TxTable(spark, path).restore(toVersion)))
  }
}
