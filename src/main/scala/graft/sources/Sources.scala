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

object JdbcSource {
  /** Deployment parity with the reference (etl/utils/database.py:19-33):
    * the connection comes from `UPSTREAM_*` environment variables with the
    * reference's exact names and defaults, so the same deploy manifests
    * drive either engine. `env` is injectable so the mapping is testable
    * without mutating process env (the sandbox has no Postgres; the JDBC
    * path itself is exercised against Derby in JdbcSourceSpec).
    */
  def fromEnv(
      env: Map[String, String] = sys.env,
      partitionOptions: Map[String, String] = Map.empty): JdbcSource = {
    val host = env.getOrElse("UPSTREAM_HOST", "upstream")
    val port = env.getOrElse("UPSTREAM_PORT", "5432")
    val database = env.getOrElse("UPSTREAM_DATABASE", "upstreamdb")
    JdbcSource(
      url = s"jdbc:postgresql://$host:$port/$database",
      user = env.getOrElse("UPSTREAM_USERNAME", "sdeuser"),
      password = env.getOrElse("UPSTREAM_PASSWORD", "sdepassword"),
      partitionOptions = partitionOptions)
  }
}

/** Object-store wiring parity with the reference deployment
  * (spark/conf/spark-defaults.conf:1-6: S3A endpoint/credentials/
  * path-style for MinIO). All storage in this library already goes
  * through the Hadoop FileSystem API (`Path.getFileSystem` — TxLog,
  * TableEtl, sinks), so an `s3a://` basePath works wherever the
  * hadoop-aws jars are on the classpath; this helper only translates the
  * deployment env into the session settings the reference sets in conf.
  * Untestable end-to-end offline (no S3 endpoint, no hadoop-aws jar in
  * the sandbox) — the mapping itself is spec-pinned.
  *
  * MULTI-WRITER CAVEAT: S3A rename is not atomic, so TxLog commits on
  * `s3a://` additionally need a claim registered via
  * [[graft.lake.LogStore.register]] (a conditional-PUT client — MinIO
  * honors `If-None-Match: *` — or an external coordinator, Delta's
  * S3DynamoDBLogStore pattern), or the explicit
  * `graft.txlog.unsafeSingleWriter=true` acknowledgment for
  * one-writer deployments. With neither, commits REFUSE loudly
  * (TxLogStoreSpec) instead of silently racing.
  */
object ObjectStoreConf {
  /** `spark.hadoop.fs.s3a.*` settings from `S3A_*` env (empty when no
    * S3A_ENDPOINT is configured — local FS deployments add nothing).
    */
  def s3aSettings(env: Map[String, String] = sys.env): Map[String, String] =
    env.get("S3A_ENDPOINT") match {
      case None => Map.empty
      case Some(endpoint) => Map(
        "spark.hadoop.fs.s3a.endpoint" -> endpoint,
        "spark.hadoop.fs.s3a.access.key" ->
          env.getOrElse("S3A_ACCESS_KEY", "minio"),
        "spark.hadoop.fs.s3a.secret.key" ->
          env.getOrElse("S3A_SECRET_KEY", "minio123"),
        "spark.hadoop.fs.s3a.region" ->
          env.getOrElse("S3A_REGION", "us-east-1"),
        "spark.hadoop.fs.s3a.impl" ->
          "org.apache.hadoop.fs.s3a.S3AFileSystem",
        "spark.hadoop.fs.s3a.path.style.access" ->
          env.getOrElse("S3A_PATH_STYLE", "true"))
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
