package graft.layers

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core._
import graft.checks.Check
import graft.sources.UpstreamSource

/** Shared wiring for one pipeline run: session, upstream system, lake root,
  * format, flags, clock, and the memoizing run-registry. The reference
  * passes (spark, run_upstream, write_data) to every node constructor
  * (etl/layers/silver/dim_buyer_silver.py:75-87); we add the rest so tests
  * can pin time and storage.
  *
  * `dataFormat` defaults to "txlog" — the ACID transaction log IS the
  * default medallion storage, matching the reference whose default
  * format is Delta (spark/conf/spark-defaults.conf:14 sets
  * spark.sql.sources.default=delta): EVERY entry point (RunEtl, the
  * bench lineage, ad-hoc contexts) writes atomic commits unless a
  * caller explicitly opts into plain files ("parquet"/"orc"/"csv"/
  * "json" all remain supported and oracle-covered).
  */
final case class EtlContext(
    spark: SparkSession,
    source: UpstreamSource,
    basePath: String,
    dataFormat: String = "txlog",
    runUpstream: Boolean = true,
    writeData: Boolean = true,
    clock: Clock = SystemClock,
    registry: RunRegistry = new RunRegistry,
    checkSuiteDir: Option[String] = None)

/** A pipeline node bound to a context; storage layout mirrors the
  * reference's `s3a://rainforest/delta/<layer>/<name>`
  * (etl/layers/silver/dim_buyer_silver.py:46).
  */
abstract class Node(val ctx: EtlContext)
    extends TableEtl(ctx.spark, ctx.runUpstream, ctx.writeData, ctx.clock,
      ctx.registry) {
  def layer: String
  override def dataFormat: String = ctx.dataFormat
  override def storagePath: String = s"${ctx.basePath}/$layer/$name"
  override def checkSuiteDir: Option[String] = ctx.checkSuiteDir

  /** Stamp the load timestamp (P7 — reference adds it in every transform,
    * e.g. etl/layers/bronze/orders.py:103-105).
    */
  protected final def stamped(df: DataFrame): DataFrame =
    df.withColumn("etl_inserted", lit(ctx.clock.now()))

}

object Transforms {
  /** P2 prefix-rename projection (reference:
    * etl/layers/silver/dim_buyer_silver.py:106-124): prefix the columns
    * common to the join inputs, keeping join keys unprefixed.
    */
  def prefixCommon(
      df: DataFrame, common: Set[String], prefix: String,
      keys: Set[String]): DataFrame =
    df.select(df.columns.map { c =>
      if (common.contains(c) && !keys.contains(c)) col(c).as(s"${prefix}_$c")
      else col(c)
    }.toIndexedSeq: _*)
}

/** One bronze ingestion node. The reference's 13 bronze classes
  * (~185 LoC each, SURVEY.md §0) differ only in name/keys/columns; they
  * collapse to this single parameterized class: load the upstream table,
  * stamp `etl_inserted`, write partitioned by it.
  */
final class BronzeNode(
    ctx: EtlContext,
    override val name: String,
    val sourceTable: String,
    override val primaryKeys: Seq[String],
    val baseColumns: Seq[String],
    override val checks: Seq[Check] = Seq.empty)
    extends Node(ctx) {
  override def layer: String = "bronze"
  override def outputColumns: Seq[String] = baseColumns :+ "etl_inserted"
  override def transformUpstream(upstream: Seq[EtlDataSet]): EtlDataSet =
    dataset(stamped(ctx.source.load(ctx.spark, sourceTable)))
}

/** A derived node defined by its upstreams, a transform function, and its
  * read-side column contract — covers every silver/gold shape in the
  * reference once the join/agg logic is supplied as `fn`.
  */
final class DerivedNode(
    ctx: EtlContext,
    override val name: String,
    override val layer: String,
    override val primaryKeys: Seq[String],
    override val upstreams: Seq[TableEtl],
    override val outputColumns: Seq[String],
    override val checks: Seq[Check],
    fn: (EtlContext, Seq[DataFrame]) => DataFrame)
    extends Node(ctx) {
  override def transformUpstream(upstream: Seq[EtlDataSet]): EtlDataSet =
    dataset(stamped(fn(ctx, upstream.map(_.data))))
}
