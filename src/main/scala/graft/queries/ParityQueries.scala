package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Reference-parity capabilities (SURVEY.md §2) re-expressed over the
  * driver testdata star schema. Each entry cites the reference site whose
  * operator shape it reproduces (paths relative to /root/reference/).
  *
  * Determinism notes (why the code looks the way it does):
  *   - double aggregates go through `decimal` sums: decimal addition is
  *     exact and order-independent, so Spark's partition-order-dependent
  *     summation and DuckDB's sequential summation produce bit-identical
  *     results (SURVEY.md §7.5 "Decimal vs double drift").
  *   - `mean` is computed as exact-decimal-sum cast to double / count —
  *     both engines then divide identical doubles by identical longs.
  *   - every query ends in a total ORDER BY so row order is defined on
  *     both sides regardless of how the driver hashes.
  *   - final compared outputs carry NO decimal columns: the exact decimal
  *     is cast to DOUBLE in the last select of BOTH engines (decimal→
  *     nearest-double is the same correctly-rounded conversion in Spark
  *     and DuckDB, and the driver's hash is double-stable but not
  *     decimal-stable — CORRECTNESS_r01 showed every decimal output
  *     hash-failing with matching rows).
  */
object ParityQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Daily order report: revenue per day, total + mean.
    * Reference: etl/layers/gold/daily_order_metrics.py:97-106 (cast
    * order_ts→date, groupBy date, sum+mean total_price) + interface
    * rename etl/layers/interface/daily_order_report.py:18-24.
    */
  val q01DailyOrderMetrics = Q(
    "q01_daily_order_metrics",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "orders")
        .select(
          $"o_orderdate".cast("date").as("order_date"),
          $"o_totalprice".cast("decimal(18,2)").as("tp"))
        .groupBy($"order_date")
        .agg(
          sum($"tp").cast("double").as("total_price_sum"),
          (sum($"tp").cast("double") / count(lit(1))).as("total_price_mean"),
          count(lit(1)).as("n_orders"))
        .orderBy($"order_date")
    },
    Some("""SELECT CAST(o_orderdate AS DATE) AS order_date,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price_sum,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS total_price_mean,
           |       COUNT(*) AS n_orders
           |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin))

  /** Pricing summary over the order-items fact: grouped sums with derived
    * arithmetic columns. Reference operator shapes: P8 (col × literal,
    * etl/layers/silver/fact_orders_silver.py:99-108), P9 (col − col,
    * fact_order_items_silver.py:99-101), A1 (groupBy+sum/mean,
    * daily_order_metrics.py:103-106).
    */
  val q02PricingSummary = Q(
    "q02_pricing_summary",
    (s, dir) => {
      import s.implicits._
      t(s, dir, "lineitem")
        .select(
          $"l_returnflag", $"l_linestatus",
          $"l_quantity".cast("decimal(18,2)").as("qty"),
          $"l_extendedprice".cast("decimal(18,2)").as("price"),
          ($"l_extendedprice".cast("decimal(18,2)")
            * (lit(1) - $"l_discount".cast("decimal(4,2)")))
            .cast("decimal(30,4)").as("disc_price"),
          ($"l_extendedprice".cast("decimal(18,2)")
            * (lit(1) - $"l_discount".cast("decimal(4,2)"))
            * (lit(1) + $"l_tax".cast("decimal(4,2)")))
            .cast("decimal(30,6)").as("charge"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          sum($"qty").cast("double").as("sum_qty"),
          sum($"price").cast("double").as("sum_base_price"),
          sum($"disc_price").cast("double").as("sum_disc_price"),
          sum($"charge").cast("double").as("sum_charge"),
          (sum($"qty").cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    },
    Some("""SELECT l_returnflag, l_linestatus,
           |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(30,4))) AS DOUBLE) AS sum_disc_price,
           |       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
           |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           |       COUNT(*) AS count_order
           |FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin))

  /** Wide (OBT) orders: fact enriched with its dimension via left join +
    * explicit projection. Reference: etl/layers/gold/wide_orders_gold.py:
    * 101-160 (J4 left join + P1 schema-pin projection). The reference's
    * buyer_id==seller_id join-key bug (SURVEY.md §0) is replicated only in
    * the rainforest-parity unit tests, not here, where the oracle would be
    * nonsensical.
    */
  val q03WideOrders = Q(
    "q03_wide_orders",
    (s, dir) => {
      import s.implicits._
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .select(
          o("o_orderkey"), o("o_custkey"), o("o_orderstatus"),
          o("o_totalprice").cast("decimal(18,2)").cast("double")
            .as("o_totalprice"),
          c("c_name"), c("c_mktsegment"), c("c_nationkey"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus,
           |       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
           |       c_name, c_mktsegment, c_nationkey
           |FROM orders LEFT JOIN customer ON o_custkey = c_custkey
           |ORDER BY o_orderkey""".stripMargin))

  val all: Seq[Q] = Seq(q01DailyOrderMetrics, q02PricingSummary, q03WideOrders)
}
