package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.core.FixedClock
import graft.layers.{BronzeNode, EtlContext}
import graft.sources.{JdbcSource, ObjectStoreConf}

/** S1 (JDBC table scan) exercised for real against an embedded Derby
  * database — the same `spark.read.jdbc` path the reference uses for its
  * Postgres upstream (etl/utils/database.py:36-38), minus the network.
  */
class JdbcSourceSpec extends SparkSpec {
  import spark.implicits._

  test("bronze node extracts from a JDBC upstream end to end") {
    val dbDir = Files.createTempDirectory("graft_derby")
    val url = s"jdbc:derby:$dbDir/db;create=true"
    val driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"
    val props = new java.util.Properties()
    props.setProperty("driver", driver)

    Seq((100, 10, 100.0), (101, 11, 150.0))
      .toDF("order_id", "buyer_id", "total_price")
      .write.jdbc(url, "orders", props)

    val src = JdbcSource(url, user = "", password = "", driver = driver)
    val ctx = EtlContext(spark, src,
      Files.createTempDirectory("graft_jdbc_lake").toString,
      writeData = false,
      clock = FixedClock(Timestamp.valueOf("2026-01-01 00:00:00")))
    val node = new BronzeNode(ctx, "orders", "orders", Seq("order_id"),
      Seq("ORDER_ID", "BUYER_ID", "TOTAL_PRICE"))
    node.run()
    val out = node.read().data
    assert(out.count() === 2)
    assert(out.columns.contains("etl_inserted"))
    assert(out.select("ORDER_ID").collect().map(_.getInt(0)).sorted
      === Array(100, 101))
  }

  test("fromEnv maps the reference's UPSTREAM_* variables and defaults " +
    "(etl/utils/database.py:19-33)") {
    val defaulted = JdbcSource.fromEnv(env = Map.empty)
    assert(defaulted.url === "jdbc:postgresql://upstream:5432/upstreamdb")
    assert(defaulted.user === "sdeuser")
    assert(defaulted.password === "sdepassword")
    assert(defaulted.driver === "org.postgresql.Driver")
    val custom = JdbcSource.fromEnv(env = Map(
      "UPSTREAM_HOST" -> "db.prod", "UPSTREAM_PORT" -> "5433",
      "UPSTREAM_DATABASE" -> "sales", "UPSTREAM_USERNAME" -> "svc",
      "UPSTREAM_PASSWORD" -> "hunter2"))
    assert(custom.url === "jdbc:postgresql://db.prod:5433/sales")
    assert(custom.user === "svc" && custom.password === "hunter2")
  }

  test("s3aSettings mirrors spark-defaults.conf:1-6, and is empty when " +
    "no endpoint is deployed") {
    assert(ObjectStoreConf.s3aSettings(Map.empty) === Map.empty)
    val s = ObjectStoreConf.s3aSettings(Map(
      "S3A_ENDPOINT" -> "http://minio:9000"))
    assert(s("spark.hadoop.fs.s3a.endpoint") === "http://minio:9000")
    assert(s("spark.hadoop.fs.s3a.access.key") === "minio")
    assert(s("spark.hadoop.fs.s3a.secret.key") === "minio123")
    assert(s("spark.hadoop.fs.s3a.path.style.access") === "true")
    assert(s("spark.hadoop.fs.s3a.impl")
      === "org.apache.hadoop.fs.s3a.S3AFileSystem")
  }
}
