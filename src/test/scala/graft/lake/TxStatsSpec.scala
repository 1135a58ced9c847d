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

  test("COLUMN stats reach CBO: attributeStats carry the log's " +
      "min/max + NDV bound + null count, and join order FLIPS with " +
      "stats on") {
    // the pre-CBO reorder rule rides GraftExtensions (a session's
    // rules are fixed at build time), so this runs on a FRESH
    // extensions session over the same SparkContext
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
    import s.implicits._
    s.conf.set("spark.sql.catalog.cbocat",
      "graft.lake.catalog.TxCatalog")
    val wh = Files.createTempDirectory("txstats_cbo").toString
    s.conf.set("spark.sql.catalog.cbocat.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS cbocat.c")
    s.sql("CREATE TABLE cbocat.c.big (k BIGINT, v BIGINT) " +
      "USING txlog")
    s.sql("INSERT INTO cbocat.c.big " +
      "SELECT id % 2000, id FROM range(100000)")
    s.sql("CREATE TABLE cbocat.c.mid (k BIGINT, m STRING) " +
      "USING txlog")
    s.sql("INSERT INTO cbocat.c.mid " +
      "SELECT id, concat('m-', id) FROM range(2000)")
    s.sql("CREATE TABLE cbocat.c.tiny (k BIGINT, t STRING) " +
      "USING txlog")
    s.sql("INSERT INTO cbocat.c.tiny " +
      "SELECT id * 100, concat('t-', id) FROM range(20)")
    // JOIN ORDER flips: written (big ⋈ mid) ⋈ tiny — with CBO reading
    // the log's stats, the reorder joins the selective tiny side
    // before the 2000-row mid, off it stays syntactic
    val sql = "SELECT b.v, m.m, t.t FROM cbocat.c.big b " +
      "JOIN cbocat.c.mid m ON b.k = m.k " +
      "JOIN cbocat.c.tiny t ON b.k = t.k"
    def leafOrder(): Seq[String] =
      s.sql(sql).queryExecution.optimizedPlan.collectLeaves()
        .map(_.toString)
        .map { t =>
          Seq("big", "mid", "tiny").find(t.contains).getOrElse("?")
        }
    def withConf[T](on: Boolean)(f: => T): T = {
      s.conf.set("spark.sql.cbo.enabled", on.toString)
      s.conf.set("spark.sql.cbo.joinReorder.enabled", on.toString)
      try f finally {
        s.conf.unset("spark.sql.cbo.enabled")
        s.conf.unset("spark.sql.cbo.joinReorder.enabled")
      }
    }
    // the catalyst stats of a lake relation carry column-level stats
    // at the stage CBO's join reorder runs (the ANALYZED
    // DataSourceV2Relation — the later V1ScanWrapper leaf reports
    // defaults, but reorder has already happened by then)
    withConf(true) {
      val rel = s.table("cbocat.c.big").queryExecution.analyzed
        .collectLeaves().collectFirst {
          case r: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2Relation => r
        }.get
      val stats = rel.computeStats()
      assert(stats.rowCount.contains(BigInt(100000)))
      val kStats = stats.attributeStats.find(_._1.name == "k").map(_._2)
      assert(kStats.isDefined, s"column stats for k must flow to " +
        s"catalyst, got ${stats.attributeStats}")
      assert(kStats.get.min.contains(0L) &&
        kStats.get.max.contains(1999L),
        s"k min/max must combine across files, got ${kStats.get}")
      assert(kStats.get.distinctCount.contains(BigInt(2000)),
        s"dense-key NDV bound (span) expected, got ${kStats.get}")
    }
    val off = withConf(false)(leafOrder())
    val on = withConf(true)(leafOrder())
    assert(off === Seq("big", "mid", "tiny"),
      s"CBO off must keep the written order, got $off")
    assert(on !== off,
      s"CBO on must REORDER the join from the log's column stats — " +
        s"got $on both ways")
    // and the reordered plan computes the same result: 20 tiny keys ×
    // 50 big rows per key, each matching exactly one mid row
    assert(withConf(true)(s.sql(sql).count()) === 1000L)
    assert(s.sql(sql).count() === 1000L)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
  }

  test("STRING-key column stats reach CBO: per-file HLL sketches " +
      "union to a real NDV, and join order FLIPS with stats on") {
    // string join keys are the common dimension case; integer keys get
    // a span bound but strings have none — without the sketch-backed
    // NDV, CBO reorders on size alone (round-13 verdict item 6)
    val base = spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    try {
    s.conf.set("spark.sql.catalog.cbscat",
      "graft.lake.catalog.TxCatalog")
    val wh = Files.createTempDirectory("txstats_cbos").toString
    s.conf.set("spark.sql.catalog.cbscat.warehouse", wh)
    s.sql("CREATE NAMESPACE IF NOT EXISTS cbscat.c")
    s.sql("CREATE TABLE cbscat.c.big (k STRING, v BIGINT) " +
      "USING txlog")
    // two inserts → the NDV must union across FILES, not just within
    s.sql("INSERT INTO cbscat.c.big SELECT concat('k-', id % 2000), " +
      "id FROM range(50000)")
    s.sql("INSERT INTO cbscat.c.big SELECT concat('k-', id % 2000), " +
      "id FROM range(50000, 100000)")
    s.sql("CREATE TABLE cbscat.c.mid (k STRING, m STRING) " +
      "USING txlog")
    s.sql("INSERT INTO cbscat.c.mid SELECT concat('k-', id), " +
      "concat('m-', id) FROM range(2000)")
    s.sql("CREATE TABLE cbscat.c.tiny (k STRING, t STRING) " +
      "USING txlog")
    s.sql("INSERT INTO cbscat.c.tiny SELECT concat('k-', id * 100), " +
      "concat('t-', id) FROM range(20)")
    val sql = "SELECT b.v, m.m, t.t FROM cbscat.c.big b " +
      "JOIN cbscat.c.mid m ON b.k = m.k " +
      "JOIN cbscat.c.tiny t ON b.k = t.k"
    def leafOrder(): Seq[String] =
      s.sql(sql).queryExecution.optimizedPlan.collectLeaves()
        .map(_.toString)
        .map { t =>
          Seq("big", "mid", "tiny").find(t.contains).getOrElse("?")
        }
    def withConf[T](on: Boolean)(f: => T): T = {
      s.conf.set("spark.sql.cbo.enabled", on.toString)
      s.conf.set("spark.sql.cbo.joinReorder.enabled", on.toString)
      try f finally {
        s.conf.unset("spark.sql.cbo.enabled")
        s.conf.unset("spark.sql.cbo.joinReorder.enabled")
      }
    }
    withConf(true) {
      val rel = s.table("cbscat.c.big").queryExecution.analyzed
        .collectLeaves().collectFirst {
          case r: org.apache.spark.sql.execution.datasources.v2
              .DataSourceV2Relation => r
        }.get
      val kStats = rel.computeStats().attributeStats
        .find(_._1.name == "k").map(_._2)
      assert(kStats.isDefined,
        "string column stats must flow to catalyst")
      val ndv = kStats.get.distinctCount
        .getOrElse(fail("string key must carry a distinctCount"))
      // HLL at lgK=9 ≈ 3–4 % RSE; accept a generous band
      assert(ndv >= BigInt(1800) && ndv <= BigInt(2200),
        s"unioned HLL NDV must be ≈2000, got $ndv")
      assert(kStats.get.nullCount.contains(BigInt(0)))
    }
    val off = withConf(false)(leafOrder())
    val on = withConf(true)(leafOrder())
    assert(off === Seq("big", "mid", "tiny"),
      s"CBO off must keep the written order, got $off")
    assert(on !== off,
      s"CBO on must REORDER the join from the string key's " +
        s"sketch-backed NDV — got $on both ways")
    assert(withConf(true)(s.sql(sql).count()) === 1000L)
    assert(s.sql(sql).count() === 1000L)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(base)
      org.apache.spark.sql.SparkSession.setActiveSession(base)
    }
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
