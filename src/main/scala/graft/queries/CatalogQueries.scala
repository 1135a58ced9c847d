package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.lake.TxTable

/** Round-12 catalog operators: NAME-addressed lake tables, the
  * reference deployment's default access path (its
  * spark-defaults.conf:9 routes `spark.sql.catalog.spark_catalog`
  * through DeltaCatalog, and etl/utils/base_table.py:49 addresses every
  * table as `database.name`). Each query administers a table entirely
  * through `spark.sql` over IDENTIFIERS — no path ever appears in the
  * administered statements — and emits final content the DuckDB oracle
  * reconstructs relationally.
  */
object CatalogQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private def scratch(name: String, dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_scratch/${name}_" +
      Integer.toHexString(dir.hashCode)

  private def wipe(s: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(s.sparkContext.hadoopConfiguration)
      .delete(p, true): Unit
  }

  /** Register (or re-point) a per-(query, dir) TxCatalog. Catalog
    * instances are cached by NAME for the session's life with their
    * warehouse fixed at first load, so the name embeds the dir hash and
    * re-runs wipe the warehouse instead of re-registering. */
  private def catalogFor(s: SparkSession, tag: String,
      dir: String): String = {
    val name = s"gcat_${tag}_" + Integer.toHexString(dir.hashCode)
    val wh = scratch(s"catalog_${tag}_wh", dir)
    wipe(s, wh)
    s.conf.set(s"spark.sql.catalog.$name", "graft.lake.catalog.TxCatalog")
    s.conf.set(s"spark.sql.catalog.$name.warehouse", wh)
    name
  }

  /** The full name-addressed administration cycle on the DSv2 catalog:
    * CREATE TABLE (partitioned) → two INSERT INTO slices → native
    * DSv2 DELETE → SELECT, all via `spark.sql` over `cat.ns.table`
    * identifiers. In-query REQUIREs pin time travel by name (VERSION AS
    * OF 1 sees exactly the first slice) and that the DELETE landed as
    * its own commit. Oracle = the surviving rows relationally.
    */
  val extCatalogNamedTable = Q(
    "ext_catalog_named_table",
    (s, dir) => {
      import s.implicits._
      val cat = catalogFor(s, "named", dir)
      t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
        .createOrReplaceTempView("cat_named_src")
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.gold")
      s.sql(s"CREATE TABLE $cat.gold.orders_t (o_orderkey BIGINT, " +
        "o_custkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE) " +
        "USING txlog PARTITIONED BY (o_orderstatus)")
      s.sql(s"INSERT INTO $cat.gold.orders_t SELECT o_orderkey, " +
        "o_custkey, o_orderstatus, o_totalprice FROM cat_named_src " +
        "WHERE o_orderkey % 2 = 0")
      s.sql(s"INSERT INTO $cat.gold.orders_t SELECT o_orderkey, " +
        "o_custkey, o_orderstatus, o_totalprice FROM cat_named_src " +
        "WHERE o_orderkey % 2 = 1")
      val evens = s.sql(
        s"SELECT count(*) AS c FROM $cat.gold.orders_t VERSION AS OF 1")
        .as[Long].head()
      val evensExpected = s.table("cat_named_src")
        .where($"o_orderkey" % 2 === 0).count()
      require(evens == evensExpected,
        s"VERSION AS OF 1 by name must see the first slice " +
          s"($evensExpected rows), got $evens")
      s.sql(s"DELETE FROM $cat.gold.orders_t WHERE o_totalprice < 50000")
      val vAfter = new TxTable(s,
        scratch("catalog_named_wh", dir) + "/gold/orders_t").version
      require(vAfter == 3L,
        s"create+2 inserts+delete must be commits 0..3, head at $vAfter")
      s.sql(s"SELECT o_orderkey, o_custkey, o_orderstatus, " +
        s"o_totalprice FROM $cat.gold.orders_t ORDER BY o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
           |FROM orders WHERE o_totalprice >= 50000
           |ORDER BY o_orderkey""".stripMargin))

  /** The reference's exact session shape — `spark_catalog` replaced by
    * the delegating lake catalog ([[graft.lake.catalog
    * .TxSessionCatalog]] = DeltaCatalog's design) — driven end-to-end:
    * bare `db.table` CREATE/INSERT/DELETE/SELECT plus time travel, on a
    * child session whose only difference is the one conf the reference
    * sets in spark-defaults. A plain-parquet table on the same session
    * pins the delegation path (non-txlog tables must pass through
    * untouched). Oracle = surviving lake rows joined against the
    * delegated table's content.
    */
  val extCatalogSessionDefault = Q(
    "ext_catalog_session_default",
    (s, dir) => {
      import s.implicits._
      val s2 = s.newSession()
      s2.conf.set("spark.sql.catalog.spark_catalog",
        "graft.lake.catalog.TxSessionCatalog")
      val loc = scratch("catalog_session_t", dir)
      wipe(s2, loc)
      Tables.load(s2, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .createOrReplaceTempView("cat_sess_src")
      s2.sql("CREATE DATABASE IF NOT EXISTS gcat_sess")
      s2.sql("DROP TABLE IF EXISTS gcat_sess.orders_t")
      s2.sql("DROP TABLE IF EXISTS gcat_sess.statuses")
      s2.sql("CREATE TABLE gcat_sess.orders_t (o_orderkey BIGINT, " +
        s"o_custkey BIGINT, o_totalprice DOUBLE) USING txlog " +
        s"LOCATION '$loc'")
      s2.sql("INSERT INTO gcat_sess.orders_t SELECT o_orderkey, " +
        "o_custkey, o_totalprice FROM cat_sess_src")
      s2.sql("DELETE FROM gcat_sess.orders_t WHERE o_totalprice >= " +
        "100000")
      // time travel by bare name: v1 (post-insert) sees everything
      val full = s2.sql(
        "SELECT count(*) AS c FROM gcat_sess.orders_t VERSION AS OF 1")
        .as[Long].head()
      require(full == s2.table("cat_sess_src").count(),
        "VERSION AS OF 1 by bare name must see the pre-delete table")
      // delegation: a plain parquet table through the SAME catalog
      // (external location — a managed one would leave its directory
      // behind across harness JVMs and refuse the re-create)
      val loc2 = scratch("catalog_session_statuses", dir)
      wipe(s2, loc2)
      s2.sql("CREATE TABLE gcat_sess.statuses USING parquet " +
        s"LOCATION '$loc2' AS SELECT 'kept' AS tag")
      s2.sql("SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, t.tag " +
        "FROM gcat_sess.orders_t o CROSS JOIN gcat_sess.statuses t " +
        "ORDER BY o.o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, 'kept' AS tag
           |FROM orders WHERE o_totalprice < 100000
           |ORDER BY o_orderkey""".stripMargin))

  /** Lake MAINTENANCE by identifier (the statements Delta routes
    * through its parser extension, here over catalog names instead of
    * quoted paths): UPDATE → MERGE → OPTIMIZE → VACUUM → DESCRIBE
    * HISTORY / DETAIL, each target a `cat.ns.table` name resolved
    * through the catalog registry. REQUIREs pin the operation ledger
    * (every maintenance op present, in order) and that OPTIMIZE
    * bin-packed the two insert commits' files. Oracle = final content.
    */
  val extCatalogMaintenanceIdent = Q(
    "ext_catalog_maintenance_ident",
    (s, dir) => {
      import s.implicits._
      val cat = catalogFor(s, "maint", dir)
      t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .createOrReplaceTempView("cat_maint_src")
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.m")
      s.sql(s"CREATE TABLE $cat.m.t (o_orderkey BIGINT, o_custkey " +
        "BIGINT, o_totalprice DOUBLE) USING txlog")
      s.sql(s"INSERT INTO $cat.m.t SELECT o_orderkey, o_custkey, " +
        "o_totalprice FROM cat_maint_src WHERE o_orderkey % 2 = 0")
      s.sql(s"INSERT INTO $cat.m.t SELECT o_orderkey, o_custkey, " +
        "o_totalprice FROM cat_maint_src WHERE o_orderkey % 2 = 1")
      def run(sql: String): DataFrame = graft.lake.LakeSql.run(s, sql)
      run(s"UPDATE $cat.m.t SET o_totalprice = 0.0 " +
        "WHERE o_orderkey % 5 = 0")
      s.table("cat_maint_src")
        .where($"o_orderkey" % 7 === 0)
        .select($"o_orderkey", $"o_custkey",
          ($"o_totalprice" * 2).as("o_totalprice"))
        .createOrReplaceTempView("cat_maint_upd")
      run(s"MERGE INTO $cat.m.t t USING cat_maint_upd s " +
        "ON t.o_orderkey = s.o_orderkey " +
        "WHEN MATCHED THEN UPDATE SET *")
      // a tiny append guarantees ≥2 undersized files, so the
      // identifier-target OPTIMIZE provably bin-packs (a no-op
      // OPTIMIZE commits nothing and would vanish from the ledger)
      s.sql(s"INSERT INTO $cat.m.t VALUES (CAST(90000001 AS BIGINT), " +
        "CAST(-1 AS BIGINT), CAST(5.5 AS DOUBLE))")
      run(s"OPTIMIZE $cat.m.t")
      run(s"VACUUM $cat.m.t RETAIN 1 VERSIONS")
      val ops = run(s"DESCRIBE HISTORY $cat.m.t")
        .orderBy($"version").select($"op").as[String].collect().toSeq
      require(ops == Seq("CREATE", "APPEND", "APPEND", "UPDATE",
        "MERGE_INTO", "APPEND", "OPTIMIZE"),
        s"maintenance ledger by name: $ops")
      val detailFiles = run(s"DESCRIBE DETAIL $cat.m.t")
        .select($"num_files").as[Long].head()
      require(detailFiles >= 1, "DESCRIBE DETAIL by name must see files")
      // ANALYZE by identifier: pure log arithmetic, zero data scan —
      // its row count must agree with the table's actual count
      val analyzed = run(s"ANALYZE TABLE $cat.m.t COMPUTE STATISTICS")
        .select($"rows", $"num_files", $"bytes")
        .as[(Long, Long, Long)].head()
      val actual = s.table(s"$cat.m.t").count()
      require(analyzed._1 == actual,
        s"ANALYZE rows (${analyzed._1}) must equal the table count " +
          s"($actual) — the log's stats are the truth")
      require(analyzed._2 == detailFiles && analyzed._3 > 0L,
        "ANALYZE must report the live file count and bytes")
      // SHOW PARTITIONS — both the vanilla Spark route (the DSv2
      // SupportsPartitionManagement face) and the LakeSql statement —
      // answered from log metadata alone
      s.sql(s"CREATE TABLE $cat.m.pt (k BIGINT, bucket STRING) " +
        "USING txlog PARTITIONED BY (bucket)")
      s.sql(s"INSERT INTO $cat.m.pt VALUES (1, 'a'), (2, 'b'), (3, 'a')")
      val sparkParts = s.sql(s"SHOW PARTITIONS $cat.m.pt")
        .as[String].collect().sorted.toSeq
      require(sparkParts == Seq("bucket=a", "bucket=b"),
        s"vanilla SHOW PARTITIONS by name: $sparkParts")
      val lakeParts = run(s"SHOW PARTITIONS $cat.m.pt")
        .as[String].collect().sorted.toSeq
      require(lakeParts == sparkParts,
        s"LakeSql SHOW PARTITIONS must agree: $lakeParts")
      val unpartRefused =
        try { run(s"SHOW PARTITIONS $cat.m.t").collect(); false }
        catch { case _: Exception => true }
      require(unpartRefused,
        "SHOW PARTITIONS on an unpartitioned table must refuse")
      s.sql(s"SELECT o_orderkey, o_custkey, o_totalprice FROM " +
        s"$cat.m.t ORDER BY o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
           |  CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
           |       WHEN o_orderkey % 5 = 0 THEN 0.0
           |       ELSE o_totalprice END AS o_totalprice
           |FROM orders
           |UNION ALL
           |SELECT CAST(90000001 AS BIGINT), CAST(-1 AS BIGINT),
           |       CAST(5.5 AS DOUBLE)
           |ORDER BY o_orderkey""".stripMargin))

  /** STREAMING BY TABLE NAME (`spark.readStream.table("cat.ns.t")`) —
    * the catalog resolution and the DSv2 streaming read composed: the
    * analyzer resolves the identifier through [[graft.lake.catalog
    * .TxCatalog]], the table's MICRO_BATCH_READ capability routes the
    * stream through [[graft.lake.TxMicroBatchStream]] (public API,
    * file-level planning from the log), and the feed is grown with
    * ordinary `INSERT INTO ... VALUES`-free SQL over the SAME name —
    * no path appears anywhere. This is the reference deployment's
    * shape (DeltaCatalog default + streaming reads of registered
    * tables). Content parity proves name-resolution hands the stream
    * the same log the path route reads.
    */
  val extStreamTableByName = Q(
    "ext_stream_table_by_name",
    (s, dir) => {
      import s.implicits._
      val cat = catalogFor(s, "stream", dir)
      t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .createOrReplaceTempView("stream_by_name_feed")
      s.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.str")
      s.sql(s"CREATE TABLE $cat.str.orders " +
        "(o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE) " +
        "USING txlog")
      s.sql(s"INSERT INTO $cat.str.orders " +
        "SELECT * FROM stream_by_name_feed WHERE o_orderkey % 3 = 0")
      val name = "stream_by_name_" + math.abs(dir.hashCode).toString
      val q = s.readStream.table(s"$cat.str.orders")
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        q.processAllAvailable()
        s.sql(s"INSERT INTO $cat.str.orders " +
          "SELECT * FROM stream_by_name_feed WHERE o_orderkey % 3 = 1")
        q.processAllAvailable()
        s.sql(s"INSERT INTO $cat.str.orders " +
          "SELECT * FROM stream_by_name_feed WHERE o_orderkey % 3 = 2")
        q.processAllAvailable()
        require(q.recentProgress.count(_.numInputRows > 0) >= 3,
          "each INSERT must arrive as its own micro-batch")
      } finally q.stop()
      s.table(name).orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  val all: Seq[Q] = Seq(extCatalogNamedTable, extCatalogSessionDefault,
    extCatalogMaintenanceIdent, extStreamTableByName)
}
