package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Predicate-scoped atomic overwrite (Delta's `replaceWhere`): one
  * commit replaces exactly the matching slice — the idempotent
  * backfill primitive — across the programmatic surface, the V1
  * `option("replaceWhere")` write, and the DSv2 by-name
  * `writeTo(...).overwrite(expr)` route.
  */
class TxReplaceWhereSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"txrw_$tag").resolve("t").toString

  private def seed(root: String): TxTable = {
    val tab = new TxTable(spark, root)
    tab.create(spark.range(100)
      .selectExpr("id AS k", "id % 4 AS bucket", "id * 10 AS v").toDF())
    tab
  }

  test("one commit replaces exactly the slice; survivors untouched; " +
      "stray rows refuse; empty-match still lands the incoming rows") {
    val root = fresh("core")
    val tab = seed(root)
    val v0Commits = tab.history().count()
    // replace bucket 1 with a recomputed slice
    val repl = spark.range(200, 210)
      .selectExpr("id AS k", "CAST(1 AS BIGINT) AS bucket",
        "id * 100 AS v").toDF()
    tab.replaceWhere($"bucket" === 1, repl)
    assert(tab.history().count() === v0Commits + 1,
      "replaceWhere is ONE atomic commit")
    val after = tab.read()
    assert(after.where($"bucket" === 1).count() === 10)
    assert(after.where($"bucket" === 1 && $"v" < 1000).count() === 0,
      "every old slice row replaced")
    assert(after.where($"bucket" =!= 1).count() === 75,
      "rows outside the slice survive verbatim")
    // incoming rows outside the predicate refuse up front, no commit
    val commits = tab.history().count()
    intercept[IllegalArgumentException] {
      tab.replaceWhere($"bucket" === 2,
        spark.range(1).selectExpr("id AS k",
          "CAST(3 AS BIGINT) AS bucket", "id AS v").toDF())
    }
    assert(tab.history().count() === commits, "refusal commits nothing")
    // a predicate matching nothing still lands the incoming slice
    tab.replaceWhere($"bucket" === 99,
      spark.range(500, 502).selectExpr("id AS k",
        "CAST(99 AS BIGINT) AS bucket", "id AS v").toDF())
    assert(tab.read().where($"bucket" === 99).count() === 2)
  }

  test("CDF captures the replacement as deletes + inserts") {
    val root = fresh("cdf")
    val tab = new TxTable(spark, root)
    tab.create(spark.range(20)
      .selectExpr("id AS k", "id % 2 AS bucket").toDF(),
      enableChangeDataFeed = true)
    val v = tab.replaceWhere($"bucket" === 0,
      spark.range(100, 103)
        .selectExpr("id AS k", "CAST(0 AS BIGINT) AS bucket").toDF())
    val feed = tab.readChanges(v, v)
    val byType = feed.groupBy($"_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType.get("delete").contains(10L), s"got $byType")
    assert(byType.get("insert").contains(3L), s"got $byType")
  }

  test("appendOnly refuses replaceWhere") {
    val root = fresh("ao")
    val tab = seed(root)
    tab.setTblProperties(Map(TxLog.propAppendOnly -> "true"))
    val e = intercept[IllegalArgumentException] {
      tab.replaceWhere($"bucket" === 0,
        spark.range(1).selectExpr("id AS k",
          "CAST(0 AS BIGINT) AS bucket", "id AS v").toDF())
    }
    assert(e.getMessage.contains("appendOnly"))
  }

  test("V1 write route: mode overwrite + option(replaceWhere) scopes " +
      "the overwrite; without the option it replaces the table") {
    val root = fresh("v1opt")
    seed(root)
    spark.range(300, 305)
      .selectExpr("id AS k", "CAST(2 AS BIGINT) AS bucket", "id AS v")
      .write.format("txlog").mode("overwrite")
      .option("replaceWhere", "bucket = 2")
      .option("path", root).save()
    val tab = new TxTable(spark, root)
    assert(tab.read().count() === 80,
      "75 survivors + 5 replacement rows")
    assert(tab.read().where($"bucket" === 2).count() === 5)
  }

  test("DSv2 by-name route: writeTo(...).overwrite(expr) becomes an " +
      "atomic replaceWhere; untranslatable predicates refuse") {
    spark.conf.set("spark.sql.catalog.rwcat",
      "graft.lake.catalog.TxCatalog")
    spark.conf.set("spark.sql.catalog.rwcat.warehouse",
      Files.createTempDirectory("txrw_wh").toString)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rwcat.ns")
    spark.sql("CREATE TABLE rwcat.ns.t (k BIGINT, bucket BIGINT, " +
      "v BIGINT) USING txlog")
    spark.range(100)
      .selectExpr("id AS k", "id % 4 AS bucket", "id * 10 AS v")
      .writeTo("rwcat.ns.t").append()
    spark.range(400, 408)
      .selectExpr("id AS k", "CAST(3 AS BIGINT) AS bucket", "id AS v")
      .writeTo("rwcat.ns.t").overwrite($"bucket" === 3)
    val t = spark.table("rwcat.ns.t")
    assert(t.count() === 83, "75 survivors + 8 replacement rows")
    assert(t.where($"bucket" === 3 && $"v" < 400).count() === 0)
    // the ledger shows ONE replace commit, not delete+append
    val ops = LakeSql.run(spark, "DESCRIBE HISTORY rwcat.ns.t")
      .orderBy($"version").select($"op").as[String].collect().toSeq
    assert(ops.last === "REPLACE_WHERE", s"got $ops")
  }
}
