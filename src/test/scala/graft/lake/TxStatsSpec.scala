package graft.lake

import java.nio.file.Files

import graft.SparkSpec

/** Log-derived table statistics ([[TxRelation.logStats]] →
  * `SupportsReportStatistics` on the catalog scan, `sizeInBytes` on
  * both V1 relations): a small lake table must read SMALL to
  * Catalyst's join strategy, whichever access route names it.
  * Before this, every V1-faced lake relation reported
  * `spark.sql.defaultSizeInBytes` (≈ infinite) and a join against a
  * tiny name-addressed dimension sort-merged — at 100 TB, a full
  * shuffle of the fact side paid for nothing.
  */
class TxStatsSpec extends SparkSpec {
  import spark.implicits._

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("catalog-name lake dimension broadcasts in a join") {
    spark.conf.set("spark.sql.catalog.stcat",
      "graft.lake.catalog.TxCatalog")
    val wh = Files.createTempDirectory("txstats_wh").toString
    spark.conf.set("spark.sql.catalog.stcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS stcat.d")
    spark.sql("CREATE TABLE stcat.d.dim (k BIGINT, label STRING) " +
      "USING txlog")
    spark.sql("INSERT INTO stcat.d.dim " +
      "SELECT id, concat('l-', id) FROM range(50)")
    spark.range(100000).selectExpr("id % 50 AS k", "id AS v")
      .createOrReplaceTempView("txstats_fact")
    val joined = spark.sql(
      "SELECT f.v, d.label FROM txstats_fact f " +
        "JOIN stcat.d.dim d ON f.k = d.k")
    val plan = planOf(joined)
    assert(plan.contains("BroadcastHashJoin"),
      s"a 50-row catalog dim must broadcast, plan was:\n$plan")
    assert(joined.count() === 100000)
  }

  test("path-route format(\"txlog\") read reports log bytes too") {
    val root = Files.createTempDirectory("txstats_path")
      .resolve("t").toString
    val tab = new TxTable(spark, root)
    tab.create(spark.range(50).selectExpr("id AS k",
      "concat('l-', id) AS label"))
    val dim = spark.read.format("txlog").load(root)
    val fact = spark.range(100000).selectExpr("id % 50 AS k", "id AS v")
    val joined = fact.join(dim, "k")
    val plan = planOf(joined)
    assert(plan.contains("BroadcastHashJoin"),
      s"a 50-row path-read dim must broadcast, plan was:\n$plan")
    assert(joined.count() === 100000)
    // the estimate really is the log's byte sum, not a fallback
    val (bytes, rows) = TxRelation.logStats(spark, root, None)
    assert(rows === 50L)
    assert(bytes > 0L && bytes < 10L * 1024 * 1024)
  }

  test("time-travel reads report the VERSION'S size, not the head's") {
    val root = Files.createTempDirectory("txstats_tt")
      .resolve("t").toString
    val tab = new TxTable(spark, root)
    tab.create(spark.range(10).selectExpr("id AS k"))
    tab.append(spark.range(10, 100000).selectExpr("id AS k"))
    val (bytesV0, rowsV0) = TxRelation.logStats(spark, root, Some(0L))
    val (bytesHead, rowsHead) = TxRelation.logStats(spark, root, None)
    assert(rowsV0 === 10L)
    assert(rowsHead === 100000L)
    assert(bytesV0 < bytesHead)
  }
}
