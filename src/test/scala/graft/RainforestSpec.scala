package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.Row

import graft.core.FixedClock
import graft.layers.{EtlContext, Rainforest}
import graft.sources.InMemorySource

/** Silver/gold golden-row tests with hand-built upstream frames — the
  * reference's silver pytest pattern
  * (etl/test/unit_tests/silver/test_dim_buyer_silver.py:21-170,
  * test_fact_order_items_silver.py:26-116).
  */
class RainforestSpec extends SparkSpec {
  import spark.implicits._

  private val clock = FixedClock(Timestamp.valueOf("2026-01-01 00:00:00"))

  private def appuserDf = Seq(
    (1, "user_1", "email_1@example.com", true, "2025-01-01", 1, "2025-01-01"),
    (2, "user_2", "email_2@example.com", false, "2025-01-01", 2, "2025-01-01"))
    .toDF("user_id", "username", "email", "is_active", "created_ts",
      "last_updated_by", "last_updated_ts")

  private def buyerDf = Seq(
    (100, 1, "2025-01-01", "2025-01-02", 1, "2025-01-02"))
    .toDF("buyer_id", "user_id", "first_time_purchased_timestamp",
      "created_ts", "last_updated_by", "last_updated_ts")

  private def orderItemDf = Seq(
    (1, 100, 500, 10, 2, 100.0, 10.0, "2025-01-12"))
    .toDF("order_item_id", "order_id", "product_id", "seller_id",
      "quantity", "base_price", "tax", "created_ts")

  private def rf(tables: Map[String, org.apache.spark.sql.DataFrame]) = {
    val base = Files.createTempDirectory("graft_rf").toString
    new Rainforest(EtlContext(spark, InMemorySource(tables), base,
      writeData = false, clock = clock))
  }

  test("dim_buyer inner-joins appuser⋈buyer and prefix-renames common columns") {
    val r = rf(Map("appuser" -> appuserDf, "buyer" -> buyerDf))
    r.dimBuyer.run()
    val out = r.dimBuyer.read().data
    assert(out.columns.toSeq === Seq("user_id", "username", "email",
      "is_active", "appuser_created_ts", "appuser_last_updated_by",
      "appuser_last_updated_ts", "buyer_id",
      "first_time_purchased_timestamp", "buyer_created_ts",
      "buyer_last_updated_by", "buyer_last_updated_ts", "etl_inserted"))
    val rows = out.collect()
    assert(rows.length === 1) // user 2 has no buyer row — inner join
    val row = rows.head
    assert(row.getAs[Int]("user_id") === 1)
    assert(row.getAs[Int]("buyer_id") === 100)
    assert(row.getAs[String]("appuser_created_ts") === "2025-01-01")
    assert(row.getAs[String]("buyer_created_ts") === "2025-01-02")
  }

  test("fact_order_items derives actual_price = base_price − tax") {
    val r = rf(Map("order_item" -> orderItemDf))
    r.factOrderItems.run()
    val row = r.factOrderItems.read().data.collect().head
    assert(row.getAs[Double]("actual_price") === 90.0)
  }

  test("fact_orders derives usd/inr currency columns") {
    val orders = Seq((100, 10, "2024-01-01", 100.0, "2024-01-01"))
      .toDF("order_id", "buyer_id", "order_ts", "total_price", "created_ts")
    val r = rf(Map("orders" -> orders))
    r.factOrders.run()
    val row = r.factOrders.read().data.collect().head
    assert(row.getAs[Double]("total_price_usd") === 100.0 * 0.0116)
    assert(row.getAs[Double]("total_price_inr") === 8600.0)
  }

  test("wide_orders replicates the buyer_id==seller_id reference join") {
    val orders = Seq((100, 7, "2024-01-01", 100.0, "2024-01-01"))
      .toDF("order_id", "buyer_id", "order_ts", "total_price", "created_ts")
    val seller = Seq((7, 1, "2025-01-01", "2025-01-01", 1, "2025-01-01"))
      .toDF("seller_id", "user_id", "first_time_sold_timestamp",
        "created_ts", "last_updated_by", "last_updated_ts")
    val r = rf(Map("orders" -> orders, "appuser" -> appuserDf,
      "seller" -> seller))
    r.wideOrders.run()
    val row = r.wideOrders.read().data.collect().head
    // buyer_id 7 matched seller_id 7 (the reference bug's semantics)
    assert(row.getAs[Int]("seller_id") === 7)
    assert(row.getAs[Int]("user_id") === 1)
  }

  test("daily_order_metrics aggregates active orders per day with DQ gate") {
    val orders = Seq(
      (100, 7, "2024-01-01 10:00:00", 100.0, "2024-01-01"),
      (101, 7, "2024-01-01 15:00:00", 50.0, "2024-01-01"),
      (102, 8, "2024-01-02 09:00:00", 40.0, "2024-01-02"), // inactive seller
      (103, 9, "2024-01-03 09:00:00", 70.0, "2024-01-03")) // no seller match
      .toDF("order_id", "buyer_id", "order_ts", "total_price", "created_ts")
    val seller = Seq(
      (7, 1, "2025-01-01", "2025-01-01", 1, "2025-01-01"),
      (8, 2, "2025-01-01", "2025-01-01", 2, "2025-01-01"))
      .toDF("seller_id", "user_id", "first_time_sold_timestamp",
        "created_ts", "last_updated_by", "last_updated_ts")
    val r = rf(Map("orders" -> orders, "appuser" -> appuserDf,
      "seller" -> seller))
    r.dailyOrderMetrics.run()
    val rows = r.dailyOrderMetrics.read().data
      .orderBy("order_date").collect()
    // only buyer_id 7 survives: matched an ACTIVE seller via the buggy
    // buyer_id==seller_id join; 8 is inactive, 9 unmatched (null filter)
    assert(rows.length === 1)
    assert(rows.head.getAs[Double]("total_price_sum") === 150.0)
    assert(rows.head.getAs[Double]("total_price_mean") === 75.0)
  }

  test("daily_category_metrics explodes categories and groups by struct") {
    val r = rf(Map(
      "order_item" -> orderItemDf,
      "appuser" -> appuserDf,
      "seller" -> Seq((10, 1, "2025-01-01", "2025-01-01", 1, "2025-01-01"))
        .toDF("seller_id", "user_id", "first_time_sold_timestamp",
          "created_ts", "last_updated_by", "last_updated_ts"),
      "product" -> Seq((500, "p", "d", 10.0, 1, 1, "2025-01-01", 1,
        "2025-01-01"))
        .toDF("product_id", "name", "description", "price", "brand_id",
          "manufacturer_id", "created_ts", "last_updated_by",
          "last_updated_ts"),
      "brand" -> Seq((1, "b", "c", "2025-01-01", 1, "2025-01-01"))
        .toDF("brand_id", "name", "country", "created_ts",
          "last_updated_by", "last_updated_ts"),
      "manufacturer" -> Seq((1, "m", "t", "2025-01-01", 1, "2025-01-01"))
        .toDF("manufacturer_id", "name", "type", "created_ts",
          "last_updated_by", "last_updated_ts"),
      "product_category" -> Seq((500, 20, "2025-01-01", 1, "2025-01-01"))
        .toDF("product_id", "category_id", "created_ts",
          "last_updated_by", "last_updated_ts"),
      "category" -> Seq((20, "electronics", "2025-01-01", 1, "2025-01-01"))
        .toDF("category_id", "name", "created_ts", "last_updated_by",
          "last_updated_ts")))
    r.dailyCategoryMetrics.run()
    val rows = r.dailyCategoryMetrics.read().data.collect()
    assert(rows.length === 1)
    val row = rows.head
    assert(row.getAs[Row]("category").getAs[String]("category_name")
      === "electronics")
    assert(row.getAs[Double]("mean_actual_price") === 90.0)
  }
}
