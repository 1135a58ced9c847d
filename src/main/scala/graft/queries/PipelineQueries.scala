package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.FixedClock
import graft.layers.{EtlContext, Interface, Rainforest}
import graft.sources.RainforestFromTpch

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
        s"${System.getProperty("java.io.tmpdir", "/tmp")}/graft_lake/$safe"
      new Rainforest(EtlContext(
        spark, RainforestFromTpch(sfDir), base, clock = FixedClock.default))
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
          col("Revenue").cast("decimal(38,2)").as("revenue"),
          col("`Mean Revenue`").as("mean_revenue"))
        .orderBy("order_date")
    },
    Some("""SELECT CAST(o_orderdate AS DATE) AS order_date,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS revenue,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_revenue
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
      ds.data.drop("etl_inserted").orderBy("product_id")
    },
    Some("""SELECT p_partkey AS product_id,
           |       p_name AS product_name,
           |       p_type AS description,
           |       CAST(p_retailprice AS DECIMAL(18,2)) AS price,
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
        .withColumn("total_price_inr",
          col("total_price_inr").cast("decimal(38,2)"))
        .orderBy("order_id")
    },
    Some(s"""WITH fo AS (
            |  SELECT o_orderkey AS order_id, o_custkey AS buyer_id,
            |         o_orderdate AS order_ts,
            |         CAST(o_totalprice AS DECIMAL(18,2)) AS total_price,
            |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) * 0.0116 AS total_price_usd,
            |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 86 AS DECIMAL(38,2)) AS total_price_inr,
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
    * G1 explode + A2 struct-keyed agg with percentile_approx median.
    * The struct grouping key is unpacked for a stable comparable shape.
    * No SQL oracle yet: median comes from percentile_approx (driver
    * records the weaker rows-only check).
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
    None)

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
    * categories). No SQL oracle: the categories column is an array of
    * structs whose cross-engine encoding is not hash-stable — the
    * category report downstream carries the oracle-checked semantics.
    */
  val wideOrderItems = Q(
    "pipeline_wide_order_items",
    (s, dir) => {
      val rf = rainforest(s, dir)
      val ds = rf.ctx.registry.runOnce(rf.wideOrderItems)
      ds.data.drop("etl_inserted").orderBy("order_item_id")
    },
    None)

  val all: Seq[Q] = Seq(dailyOrderReport, dimBuyer, dimSeller, dimProduct,
    brgProductCategory, wideOrders, wideOrderItems, dailyCategoryReport)
}
