package graft.queries

import java.sql.Timestamp
import java.time.Instant
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.FixedClock
import graft.layers.{BronzeNode, EtlContext, Interface, Rainforest}
import graft.sources.{InMemorySource, ParquetSource, RainforestFromTpch}

/** Harness queries that run the REAL medallion pipeline (bronze → silver →
  * gold → interface) on the testdata via [[RainforestFromTpch]], then
  * return the resulting tables/reports. Each oracle re-derives the same
  * result in plain DuckDB SQL from the raw parquet — so these verify the
  * whole framework (template lifecycle, memoized lineage, partitioned
  * writes, latest-partition reads, DQ gate) end to end, not just the
  * final SELECT.
  *
  * The lake root lives under java.io.tmpdir, keyed by scale factor; the
  * clock is fixed so `etl_inserted` partitions are reproducible.
  */
object PipelineQueries {

  private val cache = new ConcurrentHashMap[String, Rainforest]()

  def rainforest(spark: SparkSession, sfDir: String): Rainforest =
    cache.computeIfAbsent(sfDir, _ => {
      val safe = sfDir.replaceAll("[^A-Za-z0-9]", "_")
      val base =
        s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_lake_tx/$safe"
      // txlog is the DEFAULT storage for the whole 27-node lineage, matching
      // the reference whose default format IS the transactional one
      // (spark/conf/spark-defaults.conf:14 sets delta as
      // spark.sql.sources.default): every silver/gold load lands as one
      // atomic partition-overwrite commit and every read is snapshot-
      // isolated log metadata. The plain-parquet write/read path keeps its
      // own oracle coverage via pipeline_pinned_partition_read (default
      // format, separate lake root).
      new Rainforest(EtlContext(
        spark, RainforestFromTpch(sfDir), base, dataFormat = "txlog",
        clock = FixedClock.default))
    })

  private val ts95 = "TIMESTAMP '1995-01-01 00:00:00'"

  /** Full flagship slice (SURVEY.md §7.2): bronze orders → silver
    * fact_orders → gold wide_orders (buggy J4 join) → daily_order_metrics
    * (A1 + DQ gate) → interface view → spark.sql read-back.
    */
  val dailyOrderReport = Q(
    "pipeline_daily_order_report",
    (s, dir) => {
      val rf = rainforest(s, dir)
      val metrics = rf.ctx.registry.runOnce(rf.dailyOrderMetrics)
      Interface.createDailyOrderReportView(metrics.data)
      Interface.dailyOrderReport(s)
        .select(col("Date").as("order_date"),
          col("Revenue").cast("double").as("revenue"),
          col("`Mean Revenue`").as("mean_revenue"))
        .orderBy("order_date")
    },
    Some("""SELECT CAST(o_orderdate AS DATE) AS order_date,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS mean_revenue
           |FROM orders JOIN supplier ON o_custkey = s_suppkey
           |WHERE s_acctbal >= 0
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** dim_buyer through the framework: J1 inner join + P2 prefix-rename +
    * schema-pin read contract. The oracle collapses the identity join
    * (buyer.user_id = appuser.user_id = c_custkey).
    */
  val dimBuyer = Q(
    "pipeline_dim_buyer",
    (s, dir) => {
      val rf = rainforest(s, dir)
      val ds = rf.ctx.registry.runOnce(rf.dimBuyer)
      ds.data.drop("etl_inserted").orderBy("user_id")
    },
    Some(s"""SELECT CAST(c_custkey AS INT) AS user_id,
            |       c_name AS username,
            |       c_name || '@rainforest.example' AS email,
            |       c_acctbal >= 0 AS is_active,
            |       $ts95 AS appuser_created_ts,
            |       CAST(c_custkey AS INT) AS appuser_last_updated_by,
            |       $ts95 AS appuser_last_updated_ts,
            |       CAST(c_custkey AS INT) AS buyer_id,
            |       $ts95 AS first_time_purchased_timestamp,
            |       $ts95 AS buyer_created_ts,
            |       CAST(c_custkey AS INT) AS buyer_last_updated_by,
            |       $ts95 AS buyer_last_updated_ts
            |FROM customer ORDER BY user_id""".stripMargin))

  /** dim_product through the framework: J3 double left join + three-way
    * prefix rename + aliasing read contract
    * (country→brand_country, type→manufacturer_type).
    */
  val dimProduct = Q(
    "pipeline_dim_product",
    (s, dir) => {
      val rf = rainforest(s, dir)
      val ds = rf.ctx.registry.runOnce(rf.dimProduct)
      ds.data.drop("etl_inserted")
        .withColumn("price", col("price").cast("double"))
        .orderBy("product_id")
    },
    Some("""SELECT p_partkey AS product_id,
           |       p_name AS product_name,
           |       p_type AS description,
           |       CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
           |       CAST(p_partkey % 50 + 1 AS INT) AS brand_id,
           |       CAST(p_partkey % 10 + 1 AS INT) AS manufacturer_id,
           |       'brand_' || CAST(p_partkey % 50 + 1 AS INT) AS brand_name,
           |       'country_' || CAST((p_partkey % 50 + 1) % 5 AS INT) AS brand_country,
           |       'manufacturer_' || CAST(p_partkey % 10 + 1 AS INT) AS manufacturer_name,
           |       'type_' || CAST((p_partkey % 10 + 1) % 3 AS INT) AS manufacturer_type
           |FROM part ORDER BY product_id""".stripMargin))

  /** wide_orders through the framework, including the reference's
    * buyer_id==seller_id join-key bug (J4) — the oracle reproduces the bug
    * faithfully (orders match sellers whose suppkey collides numerically
    * with the buyer's custkey).
    */
  val wideOrders = Q(
    "pipeline_wide_orders",
    (s, dir) => {
      val rf = rainforest(s, dir)
      val ds = rf.ctx.registry.runOnce(rf.wideOrders)
      ds.data.drop("etl_inserted")
        .withColumn("total_price", col("total_price").cast("double"))
        .withColumn("total_price_inr",
          col("total_price_inr").cast("double"))
        .orderBy("order_id")
    },
    Some(s"""WITH fo AS (
            |  SELECT o_orderkey AS order_id, o_custkey AS buyer_id,
            |         o_orderdate AS order_ts,
            |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
            |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) * 0.0116 AS total_price_usd,
            |         CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 86 AS DECIMAL(38,2)) AS DOUBLE) AS total_price_inr,
            |         o_orderdate AS created_ts
            |  FROM orders),
            |ds AS (
            |  SELECT CAST(s_suppkey + 500000 AS INT) AS user_id,
            |         s_name AS username,
            |         s_name || '@rainforest.example' AS email,
            |         s_acctbal >= 0 AS is_active,
            |         $ts95 AS appuser_created_ts,
            |         CAST(s_suppkey + 500000 AS INT) AS appuser_last_updated_by,
            |         $ts95 AS appuser_last_updated_ts,
            |         CAST(s_suppkey AS INT) AS seller_id,
            |         $ts95 AS first_time_sold_timestamp,
            |         $ts95 AS seller_created_ts,
            |         CAST(s_suppkey + 500000 AS INT) AS seller_last_updated_by,
            |         $ts95 AS seller_last_updated_ts
            |  FROM supplier)
            |SELECT fo.order_id, fo.buyer_id, fo.order_ts, fo.total_price,
            |       fo.total_price_usd, fo.total_price_inr, fo.created_ts,
            |       ds.user_id, ds.username, ds.email, ds.is_active,
            |       ds.appuser_created_ts, ds.appuser_last_updated_by,
            |       ds.appuser_last_updated_ts, ds.seller_id,
            |       ds.first_time_sold_timestamp, ds.seller_created_ts,
            |       ds.seller_last_updated_by, ds.seller_last_updated_ts
            |FROM fo LEFT JOIN ds ON fo.buyer_id = ds.seller_id
            |ORDER BY order_id""".stripMargin))

  /** Category report through the framework: J5/J6 + A3 collect_list +
    * G1 explode + A2 struct-keyed agg with a percentile_approx median
    * (reference semantics, bounded memory per group — rationale at the
    * [[graft.layers.Rainforest.dailyCategoryMetrics]] node). The struct
    * grouping key is unpacked for a stable comparable shape; the oracle
    * re-derives the whole lineage — order_item arithmetic, seller
    * is_active filter, p_type category ranking — in plain DuckDB SQL.
    * QUANTILE_DISC(0.5) is the median oracle: both engines return the
    * data element of rank ceil(n/2), exact and bit-identical as long as
    * sf0.01 group sizes stay below the sketch's compression threshold
    * (they are ~25 rows vs ~5000).
    */
  val dailyCategoryReport = Q(
    "pipeline_daily_category_report",
    (s, dir) => {
      val rf = rainforest(s, dir)
      val metrics = rf.ctx.registry.runOnce(rf.dailyCategoryMetrics)
      Interface.createDailyCategoryReportView(metrics.data)
      Interface.dailyCategoryReport(s)
        .select(col("Date").as("order_date"),
          col("`Product Category`.category_id").as("category_id"),
          col("`Product Category`.category_name").as("category_name"),
          col("`Mean Revenue`").as("mean_revenue"),
          col("`Median Revenue`").as("median_revenue"))
        .orderBy("order_date", "category_id")
    },
    Some("""WITH cat AS (
           |  SELECT p_type AS name,
           |         CAST(ROW_NUMBER() OVER (ORDER BY p_type) AS INT) AS category_id
           |  FROM (SELECT DISTINCT p_type FROM part)),
           |oi AS (
           |  SELECT l_partkey AS product_id, l_suppkey AS seller_id,
           |         CAST(l_extendedprice AS DECIMAL(18,2))
           |           - CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(18,4)) AS actual_price,
           |         CAST(l_shipdate AS DATE) AS order_date
           |  FROM lineitem),
           |pc AS (
           |  SELECT p.p_partkey AS product_id, c.category_id, c.name AS category_name
           |  FROM part p JOIN cat c ON p.p_type = c.name)
           |SELECT oi.order_date, pc.category_id, pc.category_name,
           |       CAST(SUM(oi.actual_price) AS DOUBLE) / COUNT(oi.actual_price) AS mean_revenue,
           |       QUANTILE_DISC(CAST(oi.actual_price AS DOUBLE), 0.5) AS median_revenue
           |FROM oi
           |JOIN supplier ON oi.seller_id = s_suppkey
           |JOIN pc ON oi.product_id = pc.product_id
           |WHERE s_acctbal >= 0
           |GROUP BY 1, 2, 3
           |ORDER BY order_date, category_id""".stripMargin))

  /** dim_seller through the framework (J2 + P2 on the supplier side,
    * user ids offset by 500000 per the adapter).
    */
  val dimSeller = Q(
    "pipeline_dim_seller",
    (s, dir) => {
      val rf = rainforest(s, dir)
      val ds = rf.ctx.registry.runOnce(rf.dimSeller)
      ds.data.drop("etl_inserted").orderBy("seller_id")
    },
    Some(s"""SELECT CAST(s_suppkey + 500000 AS INT) AS user_id,
            |       s_name AS username,
            |       s_name || '@rainforest.example' AS email,
            |       s_acctbal >= 0 AS is_active,
            |       $ts95 AS appuser_created_ts,
            |       CAST(s_suppkey + 500000 AS INT) AS appuser_last_updated_by,
            |       $ts95 AS appuser_last_updated_ts,
            |       CAST(s_suppkey AS INT) AS seller_id,
            |       $ts95 AS first_time_sold_timestamp,
            |       $ts95 AS seller_created_ts,
            |       CAST(s_suppkey + 500000 AS INT) AS seller_last_updated_by,
            |       $ts95 AS seller_last_updated_ts
            |FROM supplier ORDER BY seller_id""".stripMargin))

  /** brg_product_category through the framework: the N:M bridge with
    * category ids assigned by alphabetical rank of p_type (the adapter's
    * deterministic window) — reproduced in the oracle with DENSE_RANK.
    */
  val brgProductCategory = Q(
    "pipeline_brg_product_category",
    (s, dir) => {
      val rf = rainforest(s, dir)
      val ds = rf.ctx.registry.runOnce(rf.brgProductCategory)
      ds.data.drop("etl_inserted").orderBy("product_id")
    },
    Some(s"""SELECT p_partkey AS product_id,
            |       CAST(DENSE_RANK() OVER (ORDER BY p_type) AS INT) AS category_id,
            |       $ts95 AS created_ts,
            |       p_partkey AS last_updated_by,
            |       $ts95 AS last_updated_ts
            |FROM part ORDER BY product_id""".stripMargin))

  /** The wide_order_items OBT itself (J5/J6 + A3 array-of-struct
    * categories — reference etl/layers/gold/wide_order_items_gold.py:128).
    * The categories array-of-struct is serialized with to_json in the
    * compared output (raw array cells crash the driver's pandas sort);
    * the oracle rebuilds the identical JSON string — every product maps
    * to exactly one category (1 per distinct p_type), so the array is a
    * single-element literal on both sides. Decimals → DOUBLE as usual.
    */
  val wideOrderItems = Q(
    "pipeline_wide_order_items",
    (s, dir) => {
      val rf = rainforest(s, dir)
      val ds = rf.ctx.registry.runOnce(rf.wideOrderItems)
      ds.data.drop("etl_inserted")
        .withColumn("base_price", col("base_price").cast("double"))
        .withColumn("tax", col("tax").cast("double"))
        .withColumn("actual_price", col("actual_price").cast("double"))
        .withColumn("categories", to_json(col("categories")))
        .orderBy("order_item_id")
    },
    Some("""WITH cat AS (
           |  SELECT p_type AS name,
           |         CAST(ROW_NUMBER() OVER (ORDER BY p_type) AS INT) AS category_id
           |  FROM (SELECT DISTINCT p_type FROM part)),
           |pc AS (
           |  SELECT p.p_partkey AS product_id, c.category_id, c.name AS category_name
           |  FROM part p JOIN cat c ON p.p_type = c.name)
           |SELECT l_orderkey * 10 + l_linenumber AS order_item_id,
           |       l_orderkey AS order_id,
           |       l_partkey AS product_id,
           |       l_suppkey AS seller_id,
           |       CAST(l_quantity AS INT) AS quantity,
           |       CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS base_price,
           |       CAST(CAST(l_extendedprice AS DECIMAL(18,2))
           |            - CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(18,4)) AS DOUBLE) AS actual_price,
           |       CAST(l_shipdate AS TIMESTAMP) AS created_ts,
           |       CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_tax AS DECIMAL(4,2)) AS DECIMAL(18,4)) AS DOUBLE) AS tax,
           |       '[{"category_id":' || pc.category_id || ',"category_name":"' || pc.category_name || '"}]' AS categories,
           |       s_acctbal >= 0 AS is_active
           |FROM lineitem
           |JOIN pc ON l_partkey = pc.product_id
           |JOIN supplier ON l_suppkey = s_suppkey
           |ORDER BY order_item_id""".stripMargin))

  /** S4: partition-pinned consumption — `read(partitionValues)`
    * (reference: etl/layers/bronze/orders.py:143-146). Two loads under
    * different fixed clocks land as two `etl_inserted` partitions, the
    * newer one a strict SUBSET of the older; reading with the older
    * partition value pinned must return the full older load — proving
    * the pin selects by partition value, not recency (a latest-partition
    * read here would see 3 rows, not 5). Own lake root, distinct from
    * the shared rainforest lake; re-runs are idempotent (fixed clocks +
    * dynamic partition overwrite).
    */
  val pinnedPartitionRead = Q(
    "pipeline_pinned_partition_read",
    (s, dir) => {
      val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${System.getProperty("java.io.tmpdir", "/tmp")}" +
        s"/graft_lake_pinned/$safe"
      val older =
        FixedClock(Timestamp.from(Instant.parse("2026-02-01T00:00:00Z")))
      val newer =
        FixedClock(Timestamp.from(Instant.parse("2026-02-02T00:00:00Z")))
      def regionNode(clock: FixedClock, src: graft.sources.UpstreamSource) =
        // explicitly parquet: this query IS the plain-file path's oracle
        // coverage now that the context default is txlog
        new BronzeNode(EtlContext(s, src, base, dataFormat = "parquet",
          clock = clock),
          "region", "region", Seq("r_regionkey"),
          Seq("r_regionkey", "r_name"))
      regionNode(older, ParquetSource(dir)).run()
      val subset = s.read.parquet(s"$dir/region.parquet")
        .where(col("r_regionkey") < 3)
      val n2 = regionNode(newer, InMemorySource(Map("region" -> subset)))
      n2.run()
      n2.read(Map("etl_inserted" -> "2026-02-01 00:00:00"))
        .data.orderBy("r_regionkey")
    },
    Some("""SELECT r_regionkey, r_name,
           |       TIMESTAMP '2026-02-01 00:00:00' AS etl_inserted
           |FROM region ORDER BY r_regionkey""".stripMargin))

  /** O4 (dry-run mode) on the driver gate: the SAME flagship lineage
    * (bronze orders → fact_orders → wide_orders → daily_order_metrics,
    * DQ gate included) computed with `writeData = false` — every read()
    * serves the in-memory transform, nothing lands on disk (the
    * reference's test path, etl/layers/bronze/orders.py:133-142;
    * TableEtlSpec asserts the no-write half). The oracle re-derives the
    * report from the raw parquet, so a dry run must produce EXACTLY
    * what a written run reports. Fresh context per call — dry-run
    * results must not leak into (or read from) the shared written lake.
    */
  val dryRunReport = Q(
    "pipeline_dry_run_report",
    (s, dir) => {
      val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${System.getProperty("java.io.tmpdir", "/tmp")}" +
        s"/graft_lake_dry/$safe"
      val rf = new Rainforest(EtlContext(
        s, RainforestFromTpch(dir), base, writeData = false,
        clock = FixedClock.default))
      rf.ctx.registry.runOnce(rf.dailyOrderMetrics).data
        .select(col("order_date"),
          col("total_price_sum").cast("double").as("total_price_sum"),
          col("total_price_mean"))
        .orderBy("order_date")
    },
    Some("""SELECT CAST(o_orderdate AS DATE) AS order_date,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price_sum,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS total_price_mean
           |FROM orders JOIN supplier ON o_custkey = s_suppkey
           |WHERE s_acctbal >= 0
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** O3 with the reference's ACTUAL config surface: the DQ gate of the
    * flagship gold table driven from a runtime-loaded GE-style JSON suite
    * (etl/utils/base_table.py:155-167 +
    * etl/great_expectations/expectations/daily_order_metrics.json) instead
    * of compiled checks. Both directions proven in one query: the
    * reference's literal 100k bound (which TPC-H daily means exceed —
    * the same observation SURVEY.md records) REFUSES the load; the
    * steward then edits ONLY the JSON and the identical lineage passes,
    * whose output the oracle re-derives. No writes: the gate runs in
    * dry-run mode against its own suite dir.
    */
  val dqSuiteGate = Q(
    "pipeline_dq_suite_gate",
    (s, dir) => {
      import java.nio.file.{Files, Paths}
      val suiteDir = Files.createTempDirectory("graft_dq_suites")
      def writeSuite(maxValue: Double): Unit =
        Files.writeString(suiteDir.resolve("daily_order_metrics.json"),
          s"""{"expectation_suite_name": "daily_order_metrics",
             | "expectations": [
             |  {"expectation_type": "expect_column_values_to_be_unique",
             |   "kwargs": {"column": "order_date"}},
             |  {"expectation_type": "expect_column_max_to_be_between",
             |   "kwargs": {"column": "total_price_mean",
             |              "min_value": 0, "max_value": $maxValue,
             |              "strict_max": "True"}}
             |]}""".stripMargin)
      def metrics() = {
        val rf = new Rainforest(EtlContext(
          s, RainforestFromTpch(dir), basePath = "unused",
          writeData = false, clock = FixedClock.default,
          checkSuiteDir = Some(suiteDir.toString)))
        rf.ctx.registry.runOnce(rf.dailyOrderMetrics)
      }
      writeSuite(maxValue = 100000) // the reference suite's literal bound
      val refused =
        try { metrics(); false }
        catch { case _: graft.core.InvalidDataException => true }
      require(refused,
        "the file-loaded 100k bound must refuse TPC-H daily means")
      writeSuite(maxValue = 1000000) // steward edits the JSON, not the code
      val out = metrics().data
        .select(col("order_date"),
          col("total_price_sum").cast("double").as("total_price_sum"),
          col("total_price_mean"))
        .orderBy("order_date")
      Files.deleteIfExists(suiteDir.resolve("daily_order_metrics.json"))
      Files.deleteIfExists(suiteDir)
      out
    },
    Some("""SELECT CAST(o_orderdate AS DATE) AS order_date,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price_sum,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS total_price_mean
           |FROM orders JOIN supplier ON o_custkey = s_suppkey
           |WHERE s_acctbal >= 0
           |GROUP BY 1 ORDER BY 1""".stripMargin))

  /** The reference's checkpoint ORCHESTRATION layer on the driver gate
    * (etl/utils/base_table.py:177-196: `context.run_checkpoint(
    * checkpoint_name="data_quality_checkpoint", validations=[...])`):
    * the YAML config under great_expectations/checkpoints/ drives which
    * post-validation actions run (store result, store eval params,
    * update data docs), and the run returns per-expectation results the
    * caller gates on — it never throws on a failed expectation. Two
    * runs in one query: the repo's shipped suites (all pass), then a
    * steward-tightened suite at the reference's literal 100k bound
    * (which TPC-H daily means exceed — the max check must come back
    * success=false AS A RESULT, with the other actions still running).
    * The oracle recomputes every success boolean from the raw parquet;
    * REQUIREs pin the action side effects (stored JSONs, data docs).
    */
  val dqCheckpoint = Q(
    "pipeline_dq_checkpoint",
    (s, dir) => {
      import java.nio.file.{Files, Paths}
      import graft.checks.Checkpoint
      val cfg = Checkpoint.load(
        "great_expectations/checkpoints/data_quality_checkpoint.yml")
      require(cfg.actions.map(_.name) == Seq("store_validation_result",
        "store_evaluation_params", "update_data_docs"),
        s"checkpoint action order must follow the config: ${cfg.actions}")
      val root = Files.createTempDirectory("graft_ge_store")
      // dry-run lineage: bronze orders + gold daily metrics, no writes
      val rf = new Rainforest(EtlContext(
        s, RainforestFromTpch(dir), basePath = "unused",
        writeData = false, clock = FixedClock.default))
      val orders = rf.ctx.registry.runOnce(rf.orders).data
      val gold = rf.ctx.registry.runOnce(rf.dailyOrderMetrics).data
      val harness = Checkpoint.run(cfg,
        Seq(orders -> "orders", gold -> "daily_order_metrics"),
        "expectations", root)
      // steward tightens the bound to the reference's literal 100k in a
      // side suite dir: the checkpoint REPORTS the failure (and still
      // stores + publishes it), the caller decides
      val tight = Files.createTempDirectory("graft_ge_tight")
      Files.writeString(tight.resolve("daily_order_metrics.json"),
        """{"expectation_suite_name": "daily_order_metrics",
          | "expectations": [
          |  {"expectation_type": "expect_column_max_to_be_between",
          |   "kwargs": {"column": "total_price_mean",
          |              "min_value": 0, "max_value": 100000,
          |              "strict_max": "True"}}
          |]}""".stripMargin)
      val refBound = Checkpoint.run(cfg,
        Seq(gold -> "daily_order_metrics"), tight.toString, root)
      require(refBound.exists(!_.success),
        "the reference's 100k bound must fail on TPC-H daily means")
      // orchestration side effects, in the config's action order
      Seq("validations/orders.json",
        "validations/daily_order_metrics.json",
        "evaluation_parameters/daily_order_metrics.json",
        "data_docs/index.html", "data_docs/orders.html",
        "data_docs/daily_order_metrics.html").foreach { p =>
        require(Files.exists(root.resolve(p)), s"missing artifact $p")
      }
      val docs = Files.readString(
        root.resolve("data_docs/daily_order_metrics.html"))
      require(docs.contains("FAIL"),
        "data docs must publish the failed expectation")
      import s.implicits._
      val rows =
        harness.flatMap(r => r.results.map(e =>
          ("harness", r.suite, e.description, e.success))) ++
        refBound.flatMap(r => r.results.map(e =>
          ("reference_bound", r.suite, e.description, e.success)))
      rows.toDF("run_name", "suite_name", "expectation", "success")
        .orderBy("run_name", "suite_name", "expectation")
    },
    Some("""WITH gold AS (
           |  SELECT CAST(o_orderdate AS DATE) AS order_date,
           |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           |           / COUNT(o_totalprice) AS total_price_mean
           |  FROM orders JOIN supplier ON o_custkey = s_suppkey
           |  WHERE s_acctbal >= 0 GROUP BY 1)
           |SELECT * FROM (
           |  SELECT 'harness' AS run_name,
           |         'daily_order_metrics' AS suite_name,
           |         'max(total_price_mean) in (0.0, 1000000.0)' AS expectation,
           |         (MAX(total_price_mean) > 0.0
           |          AND MAX(total_price_mean) < 1000000.0) AS success
           |  FROM gold
           |  UNION ALL
           |  SELECT 'harness', 'daily_order_metrics', 'unique(order_date)',
           |         (COUNT(*) = COUNT(DISTINCT order_date)) FROM gold
           |  UNION ALL
           |  SELECT 'harness', 'orders', 'unique(order_id)',
           |         (COUNT(*) = COUNT(DISTINCT o_orderkey)) FROM orders
           |  UNION ALL
           |  SELECT 'reference_bound', 'daily_order_metrics',
           |         'max(total_price_mean) in (0.0, 100000.0)',
           |         (MAX(total_price_mean) > 0.0
           |          AND MAX(total_price_mean) < 100000.0) FROM gold
           |) ORDER BY run_name, suite_name, expectation""".stripMargin))

  val all: Seq[Q] = Seq(dailyOrderReport, dimBuyer, dimSeller, dimProduct,
    brgProductCategory, wideOrders, wideOrderItems, dailyCategoryReport,
    pinnedPartitionRead, dryRunReport, dqSuiteGate, dqCheckpoint)
}
