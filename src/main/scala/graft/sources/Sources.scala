package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Upstream-system abstraction. The reference hardcodes a single JDBC
  * Postgres upstream (etl/utils/database.py:9-38, env-var connection); we
  * make the upstream pluggable so the same bronze nodes run against JDBC in
  * production and local parquet (the driver testdata) in the harness.
  */
trait UpstreamSource {
  def load(spark: SparkSession, table: String): DataFrame
}

/** JDBC upstream — parity with etl/utils/database.py:36-38
  * (`spark.read.jdbc(url, table, props)`); connection settings are
  * constructor-injected instead of env-vars so they are testable.
  * Partitioned reads (partitionColumn/lowerBound/upperBound/numPartitions)
  * matter at scale: a single-connection JDBC scan of a large table
  * serializes the entire extract through one executor.
  */
final case class JdbcSource(
    url: String,
    user: String,
    password: String,
    driver: String = "org.postgresql.Driver",
    partitionOptions: Map[String, String] = Map.empty)
    extends UpstreamSource {
  override def load(spark: SparkSession, table: String): DataFrame = {
    val props = new java.util.Properties()
    props.setProperty("user", user)
    props.setProperty("password", password)
    props.setProperty("driver", driver)
    partitionOptions.foreach { case (k, v) => props.setProperty(k, v) }
    spark.read.jdbc(url, table, props)
  }
}

/** Local/cluster file upstream: one parquet per table under `dir` —
  * the shape of the driver testdata (TESTDATA.md).
  */
final case class ParquetSource(dir: String) extends UpstreamSource {
  override def load(spark: SparkSession, table: String): DataFrame =
    spark.read.parquet(s"$dir/$table.parquet")
}

/** In-memory upstream for unit tests (mirrors the reference's pytest
  * pattern of handing transform_upstream hand-built frames,
  * etl/test/unit_tests/bronze/test_orders_bronze.py:35-100).
  */
final case class InMemorySource(tables: Map[String, DataFrame])
    extends UpstreamSource {
  override def load(spark: SparkSession, table: String): DataFrame =
    tables.getOrElse(
      table, throw new IllegalArgumentException(s"no such table: $table"))
}
