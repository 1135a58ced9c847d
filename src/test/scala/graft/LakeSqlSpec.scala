package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.lake.{LakeSql, TxTable}

/** The SQL maintenance surface ([[graft.lake.LakeSql]]): statement
  * parsing, command execution over a real table through BOTH routes —
  * direct dispatch (`LakeSql.run`) and `spark.sql(...)` on a session
  * built with [[graft.functions.GraftExtensions]]'s injected parser —
  * and verbatim delegation of everything that is not a maintenance
  * statement.
  */
class LakeSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"lakesql_$tag").resolve("tbl").toString

  test("parse recognizes exactly the maintenance shapes") {
    assert(LakeSql.parse("OPTIMIZE '/t/x'").isDefined)
    assert(LakeSql.parse("optimize '/t/x' zorder by (a, b)").isDefined)
    assert(LakeSql.parse("VACUUM '/t/x'").isDefined)
    assert(LakeSql.parse("VACUUM '/t/x' RETAIN 3 VERSIONS").isDefined)
    assert(LakeSql.parse("VACUUM LOG '/t/x' RETAIN 5 VERSIONS").isDefined)
    assert(LakeSql.parse("DESCRIBE HISTORY '/t/x'").isDefined)
    assert(LakeSql.parse("RESTORE '/t/x' TO VERSION AS OF 2").isDefined)
    assert(LakeSql.parse("SELECT 1").isEmpty)
    assert(LakeSql.parse("DESCRIBE TABLE t").isEmpty)
    assert(LakeSql.parse("OPTIMIZE tbl").isEmpty,
      "only quoted-path form is ours; bare identifiers delegate")
  }

  test("the command family drives a real table end-to-end") {
    val root = freshRoot("e2e")
    val tab = new TxTable(spark, root)
    tab.create(spark.range(0L, 100L).toDF("id").repartition(2))   // v0
    tab.append(spark.range(100L, 200L).toDF("id").repartition(2)) // v1
    tab.deleteWhere($"id" < 50L)                                  // v2
    val vOpt = LakeSql.run(spark, s"OPTIMIZE '$root'")
      .as[Long].head()
    assert(vOpt === 3L)
    val hist = LakeSql.run(spark, s"DESCRIBE HISTORY '$root'")
      .orderBy("version")
    assert(hist.select("op").as[String].collect().toSeq ===
      Seq("CREATE", "APPEND", "DELETE", "OPTIMIZE"))
    assert(hist.columns.contains("operation_metrics"))
    val vRest = LakeSql.run(spark, s"RESTORE '$root' TO VERSION AS OF 1")
      .as[Long].head()
    assert(vRest === 4L)
    assert(tab.read().count() === 200L, "the SQL restore undid the delete")
    val removed = LakeSql.run(spark, s"VACUUM '$root' RETAIN 1 VERSIONS")
      .as[String].collect()
    assert(removed.nonEmpty, "the delete/optimize era files are unreferenced")
    assert(tab.read().count() === 200L, "vacuum never touches live files")
    intercept[IllegalArgumentException](LakeSql.run(spark, "SELECT 1"))
  }

  test("spark.sql drives the same statements through the injected " +
      "parser; non-maintenance SQL delegates verbatim") {
    val root = freshRoot("inj")
    new TxTable(spark, root)
      .create(spark.range(0L, 60L).toDF("id").repartition(2))
    // a second session over the SAME SparkContext, built with the
    // extensions — a session's parser is fixed at build time, so the
    // suite-wide session cannot be retrofitted
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val s2 = SparkSession.builder()
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(s2 ne spark, "must be a fresh session, not the suite's")
      val tab2 = new TxTable(s2, root)
      tab2.append(s2.range(60L, 120L).toDF("id").repartition(2))
      val v = s2.sql(s"OPTIMIZE '$root'")
        .collect().head.getLong(0)
      assert(v === 2L)
      val ops = s2.sql(s"DESCRIBE HISTORY '$root'")
        .orderBy("version").select("op")
        .collect().map(_.getString(0)).toSeq
      assert(ops === Seq("CREATE", "APPEND", "OPTIMIZE"))
      // delegation: ordinary SQL still parses and runs
      assert(s2.sql("SELECT 1 + 1").collect().head.getInt(0) === 2)
      // and the injected native functions resolve by name
      assert(s2.sql("SELECT poly_hash('a', 31, 7)").collect().nonEmpty)
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
