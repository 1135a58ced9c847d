package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.checks.{Check, Checks}

/** Template-method ETL node — the Scala rebuild of the reference's
  * `TableETL` ABC (etl/utils/base_table.py:53-240). Five-step lifecycle:
  * extractUpstream → transformUpstream → validate → write → read, with
  * `run()` final (reference: base_table.py:222-240).
  *
  * Deliberate divergences (documented in SURVEY.md §3.4/§7.5):
  *   - lineage execution is memoized via [[RunRegistry]] (the reference
  *     re-runs shared upstreams once per consumer);
  *   - the load timestamp comes from an injectable [[Clock]] (the
  *     reference calls `datetime.now()` inline);
  *   - validation is the [[graft.checks.Check]] ADT instead of Great
  *     Expectations suites (same two rule kinds, no dependency).
  */
abstract class TableEtl(
    val spark: SparkSession,
    val runUpstream: Boolean = true,
    val writeData: Boolean = true,
    val clock: Clock = SystemClock,
    val registry: RunRegistry = new RunRegistry) {

  def name: String
  def primaryKeys: Seq[String]
  def storagePath: String
  def dataFormat: String = "parquet"
  def database: String = "graft"
  /** Every table partitions on the synthetic load timestamp, like the
    * reference (etl/layers/bronze/orders.py:45,105).
    */
  def partitionKeys: Seq[String] = Seq("etl_inserted")
  def upstreams: Seq[TableEtl] = Seq.empty
  def checks: Seq[Check] = Seq.empty

  /** The schema contract: the explicit projection every read() applies
    * (reference pattern: etl/layers/bronze/orders.py:163-170 — "explicitly
    * defined columns for easier debugging", README.md:101).
    */
  def outputColumns: Seq[String]

  /** In-memory result of the last transform, served by read() when
    * writeData=false (the reference's dry-run/test path,
    * etl/layers/bronze/orders.py:133-142).
    */
  protected var currentData: Option[DataFrame] = None

  protected final def dataset(df: DataFrame): EtlDataSet =
    EtlDataSet(name, df, primaryKeys, storagePath, dataFormat, database,
      partitionKeys)

  /** Extract = run-if-asked then read each upstream node, memoized
    * (reference loop: etl/layers/silver/dim_buyer_silver.py:75-87).
    * Upstreams are kicked off CONCURRENTLY (each lineage branch is one
    * [[RunRegistry]] Future), so sibling branches overlap on the cluster
    * instead of executing depth-first one at a time; results are awaited
    * in declaration order, keeping semantics identical.
    */
  def extractUpstream(): Seq[EtlDataSet] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: scala.concurrent.ExecutionContext =
      RunRegistry.sharedExecutionContext
    val fs = upstreams.map { up =>
      Future {
        if (runUpstream) registry.runOnce(up) else registry.readOnce(up)
      }
    }
    fs.map(Await.result(_, Duration.Inf))
  }

  def transformUpstream(upstream: Seq[EtlDataSet]): EtlDataSet

  /** Evaluate this table's checks; empty = pass
    * (replaces base_table.py:140-196).
    */
  final def validate(ds: EtlDataSet): Seq[graft.checks.CheckViolation] =
    Checks.evaluate(ds.data, checks)

  /** Partitioned overwrite, format-parametric
    * (reference: base_table.py:198-220; `mergeSchema` is honored by Delta
    * and ignored by parquet — kept for format parity).
    * Divergence: partitionOverwriteMode=dynamic. The reference's plain
    * overwrite drops ALL prior loads on every run, which makes its
    * "latest etl_inserted partition" read trivially single-valued; dynamic
    * overwrite keeps load history (only same-timestamp partitions are
    * replaced), so the latest-partition read prunes meaningfully and
    * re-runs stay idempotent.
    *
    * The REBALANCE hint sizes write partitions to the data: without it
    * every node writes one file per transform partition (up to
    * shuffle.partitions files for a 150-row dimension — the round-1
    * write-amplification hotspot: 13 lineage nodes × 32 tiny files), and
    * a skewed partition writes one huge file. With AQE, rebalance
    * coalesces small outputs to a single file and splits oversized
    * partitions at the advisory size — the same optimize-on-write shape
    * production lakehouses use.
    */
  /** Per-format reader/writer options: self-describing formats need
    * none; csv needs its header written and read back (and schema
    * inference on read — a production deployment would pin an explicit
    * schema instead).
    */
  private def formatOptions(fmt: String): Map[String, String] = fmt match {
    case "csv" => Map("header" -> "true", "inferSchema" -> "true")
    case _ => Map.empty
  }

  final def write(ds: EtlDataSet): Unit =
    ds.data.hint("rebalance").write
      .option("mergeSchema", "true")
      .option("partitionOverwriteMode", "dynamic")
      .options(formatOptions(ds.dataFormat))
      .format(ds.dataFormat)
      .mode("overwrite")
      .partitionBy(ds.partitionKeys: _*)
      .save(ds.storagePath)

  /** extract → transform → validate (throw on violation) → write-if-enabled
    * (reference: base_table.py:222-240).
    */
  final def run(): Unit = {
    val transformed = transformUpstream(extractUpstream())
    currentData = Some(transformed.data)
    val violations = validate(transformed)
    if (violations.nonEmpty) {
      val detail = violations
        .map(v => s"${v.check.description}: ${v.detail}").mkString("; ")
      throw new InvalidDataException(
        s"The $name dataset did not pass validation: $detail")
    }
    if (writeData) write(transformed)
  }

  /** Consumption path (reference: etl/layers/bronze/orders.py:121-182):
    * dry-run → cached frame; partitionValues → conjunctive equality filter;
    * else latest `etl_inserted` partition (scalar max + equality — both
    * prune to a single partition directory at scan time, so the "latest
    * run" read touches one load's files no matter how much history the
    * table holds).
    */
  def read(partitionValues: Map[String, String] = Map.empty): EtlDataSet = {
    val projected: DataFrame =
      if (!writeData) {
        val df = currentData.getOrElse(throw new IllegalStateException(
          s"read() before run() with writeData=false on $name"))
        df.selectExpr(outputColumns: _*)
      } else {
        // mergeSchema on read gives parquet the reference's Delta-style
        // schema-evolution contract (etl/utils/base_table.py:211-217
        // writes with mergeSchema=true): a column added by a later load
        // resolves against old partitions as NULL instead of failing the
        // outputColumns projection. Documented degradation vs Delta: the
        // union schema comes from a footer merge instead of a transaction
        // log — at very large file counts a real deployment would carry
        // the schema in table metadata (Delta/Iceberg); the contract
        // itself is exercised by TableEtlSpec's evolution round-trip.
        val full = spark.read.option("mergeSchema", "true")
          .options(formatOptions(dataFormat))
          .format(dataFormat).load(storagePath)
        val filtered =
          if (partitionValues.nonEmpty)
            full.where(partitionValues
              .map { case (k, v) => col(k) === lit(v) }
              .reduce(_ && _))
          else {
            val latest = full.agg(max(col("etl_inserted"))).first()
            if (latest.isNullAt(0)) full
            else full.where(col("etl_inserted") === lit(latest.get(0)))
          }
        filtered.selectExpr(outputColumns: _*)
      }
    dataset(projected)
  }
}
