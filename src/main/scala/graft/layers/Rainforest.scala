package graft.layers

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.checks.{MaxInRange, Unique}

/** The reference pipeline's 27 nodes (SURVEY.md §0 layer inventory),
  * rebuilt as one wired object graph per [[EtlContext]]. Column contracts
  * are the reference's read() projections; join/agg logic is the
  * reference's transform semantics. Reference bugs are replicated where
  * they define output (wide_orders buyer_id==seller_id join,
  * daily_category_metrics order_date from created_ts) and documented where
  * they would make the pipeline unrunnable (wide_order_items projecting
  * away is_active that daily_category_metrics filters on — we keep it).
  */
final class Rainforest(val ctx: EtlContext) {

  private val audit = Seq("created_ts", "last_updated_by", "last_updated_ts")

  // ---- bronze (13) — reference: etl/layers/bronze/*.py ----
  val appuser = new BronzeNode(ctx, "appuser", "appuser", Seq("user_id"),
    Seq("user_id", "username", "email", "is_active") ++ audit)
  val seller = new BronzeNode(ctx, "seller", "seller", Seq("seller_id"),
    Seq("seller_id", "user_id", "first_time_sold_timestamp") ++ audit)
  val buyer = new BronzeNode(ctx, "buyer", "buyer", Seq("buyer_id"),
    Seq("buyer_id", "user_id", "first_time_purchased_timestamp") ++ audit)
  val product = new BronzeNode(ctx, "product", "product", Seq("product_id"),
    Seq("product_id", "name", "description", "price", "brand_id",
      "manufacturer_id") ++ audit)
  val brand = new BronzeNode(ctx, "brand", "brand", Seq("brand_id"),
    Seq("brand_id", "name", "country") ++ audit)
  val manufacturer = new BronzeNode(ctx, "manufacturer", "manufacturer",
    Seq("manufacturer_id"),
    Seq("manufacturer_id", "name", "type") ++ audit)
  val category = new BronzeNode(ctx, "category", "category",
    Seq("category_id"), Seq("category_id", "name") ++ audit)
  val productCategory = new BronzeNode(ctx, "product_category",
    "product_category", Seq("product_id", "category_id"),
    Seq("product_id", "category_id") ++ audit)
  val sellerProduct = new BronzeNode(ctx, "seller_product", "seller_product",
    Seq("seller_id", "product_id"), Seq("seller_id", "product_id"))
  /** DQ parity: etl/great_expectations/expectations/orders.json — unique
    * order_id.
    */
  val orders = new BronzeNode(ctx, "orders", "orders", Seq("order_id"),
    Seq("order_id", "buyer_id", "order_ts", "total_price", "created_ts"),
    checks = Seq(Unique(Seq("order_id"))))
  val orderItem = new BronzeNode(ctx, "order_item", "order_item",
    Seq("order_item_id"),
    Seq("order_item_id", "order_id", "product_id", "seller_id", "quantity",
      "base_price", "tax", "created_ts"))
  val ratings = new BronzeNode(ctx, "ratings", "ratings", Seq("ratings_id"),
    Seq("ratings_id", "product_id", "rating") ++ audit)
  val clickstream = new BronzeNode(ctx, "clickstream", "clickstream",
    Seq("event_id"),
    Seq("event_id", "user_id", "event_type", "product_id", "order_id",
      "timestamp", "created_ts"))

  // ---- silver (8) — reference: etl/layers/silver/*.py ----

  /** appuser ⋈ role table on user_id with prefix-renamed common columns
    * (J1/J2 + P2 — etl/layers/silver/dim_buyer_silver.py:106-132).
    */
  private def dimUser(a: DataFrame, b: DataFrame, rolePrefix: String)
      : DataFrame = {
    val common = a.columns.toSet.intersect(b.columns.toSet)
    val ap = Transforms.prefixCommon(a, common, "appuser", Set("user_id"))
    val bp = Transforms.prefixCommon(b, common, rolePrefix, Set("user_id"))
    ap.join(bp, ap("user_id") === bp("user_id"), "inner")
      .drop(bp("user_id"))
  }

  val dimBuyer = new DerivedNode(ctx, "dim_buyer", "silver", Seq("buyer_id"),
    Seq(appuser, buyer),
    Seq("user_id", "username", "email", "is_active", "appuser_created_ts",
      "appuser_last_updated_by", "appuser_last_updated_ts", "buyer_id",
      "first_time_purchased_timestamp", "buyer_created_ts",
      "buyer_last_updated_by", "buyer_last_updated_ts", "etl_inserted"),
    Seq.empty,
    (_, up) => dimUser(up(0), up(1), "buyer"))

  val dimSeller = new DerivedNode(ctx, "dim_seller", "silver",
    Seq("seller_id"), Seq(appuser, seller),
    Seq("user_id", "username", "email", "is_active", "appuser_created_ts",
      "appuser_last_updated_by", "appuser_last_updated_ts", "seller_id",
      "first_time_sold_timestamp", "seller_created_ts",
      "seller_last_updated_by", "seller_last_updated_ts", "etl_inserted"),
    Seq.empty,
    (_, up) => dimUser(up(0), up(1), "seller"))

  /** product ⟕ brand ⟕ manufacturer with three-way-common prefix rename
    * (J3 — etl/layers/silver/dim_product_silver.py:114-158).
    */
  val dimProduct = new DerivedNode(ctx, "dim_product", "silver",
    Seq("product_id"), Seq(product, brand, manufacturer),
    Seq("product_id", "product_name", "description", "price", "brand_id",
      "manufacturer_id", "brand_name", "country as brand_country",
      "manufacturer_name", "type as manufacturer_type", "etl_inserted"),
    Seq.empty,
    (_, up) => {
      val Seq(p0, b0, m0) = up
      val common = p0.columns.toSet
        .intersect(b0.columns.toSet).intersect(m0.columns.toSet)
      val p = Transforms.prefixCommon(p0, common, "product", Set("brand_id"))
      val b = Transforms.prefixCommon(b0, common, "brand", Set("brand_id"))
      val m = Transforms
        .prefixCommon(m0, common, "manufacturer", Set("manufacturer_id"))
      p.join(b, p("brand_id") === b("brand_id"), "left")
        .drop(b("brand_id"))
        .join(m, p("manufacturer_id") === m("manufacturer_id"), "left")
        .drop(m("manufacturer_id"))
    })

  val dimCategory = new DerivedNode(ctx, "dim_category", "silver",
    Seq("category_id"), Seq(category),
    Seq("category_id", "name as category_name") ++ audit :+ "etl_inserted",
    Seq.empty,
    (_, up) => up.head.drop("etl_inserted"))

  /** Currency-derived columns (P8 —
    * etl/layers/silver/fact_orders_silver.py:99-108). DQ parity:
    * fact_orders.json — unique order_id.
    */
  val factOrders = new DerivedNode(ctx, "fact_orders", "silver",
    Seq("order_id"), Seq(orders),
    Seq("order_id", "buyer_id", "order_ts", "total_price", "total_price_usd",
      "total_price_inr", "created_ts", "etl_inserted"),
    Seq(Unique(Seq("order_id"))),
    (_, up) => up.head.drop("etl_inserted")
      .withColumn("total_price_usd", col("total_price") * lit(0.0116))
      .withColumn("total_price_inr", col("total_price") * lit(86)))

  /** actual_price = base_price − tax (P9 —
    * etl/layers/silver/fact_order_items_silver.py:99-101).
    */
  val factOrderItems = new DerivedNode(ctx, "fact_order_items", "silver",
    Seq("order_item_id"), Seq(orderItem),
    Seq("order_item_id", "order_id", "product_id", "seller_id", "quantity",
      "base_price", "tax", "actual_price", "created_ts", "etl_inserted"),
    Seq.empty,
    (_, up) => up.head.drop("etl_inserted")
      .withColumn("actual_price", col("base_price") - col("tax")))

  val brgProductCategory = new DerivedNode(ctx, "brg_product_category",
    "silver", Seq("product_id", "category_id"), Seq(productCategory),
    Seq("product_id", "category_id") ++ audit :+ "etl_inserted",
    Seq.empty,
    (_, up) => up.head.drop("etl_inserted"))

  /** True key is (seller_id, product_id); the reference declares
    * (product_id, category_id) — a copy-paste bug with no behavioral
    * effect (SURVEY.md §0). We use the true key.
    */
  val brgSellerProduct = new DerivedNode(ctx, "brg_seller_product",
    "silver", Seq("seller_id", "product_id"), Seq(sellerProduct),
    Seq("seller_id", "product_id", "etl_inserted"),
    Seq.empty,
    (_, up) => up.head.drop("etl_inserted"))

  // ---- gold (4) — reference: etl/layers/gold/*.py ----

  /** fact_orders ⟕ dim_seller ON buyer_id == seller_id — the reference's
    * J4 join-key bug, replicated because it defines reference output
    * (etl/layers/gold/wide_orders_gold.py:101-105).
    */
  val wideOrders = new DerivedNode(ctx, "wide_orders", "gold",
    Seq("order_id"), Seq(factOrders, dimSeller),
    Seq("order_id", "buyer_id", "order_ts", "total_price",
      "total_price_usd", "total_price_inr", "created_ts", "user_id",
      "username", "email", "is_active", "appuser_created_ts",
      "appuser_last_updated_by", "appuser_last_updated_ts", "seller_id",
      "first_time_sold_timestamp", "seller_created_ts",
      "seller_last_updated_by", "seller_last_updated_ts", "etl_inserted"),
    Seq.empty,
    (_, up) => {
      val Seq(fo, ds) = up
      fo.join(ds, fo("buyer_id") === ds("seller_id"), "left")
        .drop(fo("etl_inserted")).drop(ds("etl_inserted"))
    })

  /** Three left joins + the bridge pre-aggregated to product grain before
    * joining — a deliberate row-explosion-avoidance plan shape Catalyst
    * will not invent (SURVEY.md §4.1); J5/J6 + A3 + G2
    * (etl/layers/gold/wide_order_items_gold.py:110-134). `categories` is
    * array_sort-ed for deterministic output (collect_list order is
    * partition-dependent). Divergence: is_active stays in the contract —
    * the reference projects it away and then filters on it downstream,
    * which cannot run.
    */
  val wideOrderItems = new DerivedNode(ctx, "wide_order_items", "gold",
    Seq("order_item_id"),
    Seq(factOrderItems, dimProduct, dimSeller, brgProductCategory,
      dimCategory),
    Seq("order_item_id", "order_id", "product_id", "seller_id", "quantity",
      "base_price", "actual_price", "created_ts", "tax", "categories",
      "is_active", "etl_inserted"),
    Seq.empty,
    (_, up) => {
      val Seq(foi, dp, ds, pc, dc) = up
      val enriched = foi.join(dp, Seq("product_id"), "left")
        .join(ds, Seq("seller_id"), "left")
      val pcEnriched = pc.join(dc, Seq("category_id"))
        .drop(pc("etl_inserted")).drop(dc("etl_inserted"))
      val perProduct = pcEnriched.groupBy("product_id")
        .agg(array_sort(
          collect_list(struct(col("category_id"), col("category_name"))))
          .as("categories"))
      enriched.join(perProduct, Seq("product_id"), "left")
        .drop(foi("etl_inserted")).drop(dp("etl_inserted"))
        .drop(ds("etl_inserted"))
    })

  /** A1: daily revenue sum + mean over active wide orders, keyed by
    * order_ts-derived date (etl/layers/gold/daily_order_metrics.py:
    * 95-106). DQ parity: daily_order_metrics.json — unique order_date and
    * total_price_mean strictly inside (0, 100000).
    * Divergence: the mean is exact-decimal-sum ÷ count(total_price)
    * (double) instead of Spark's decimal `avg` — the non-null count
    * denominator matches `mean()`'s NULL-excluding semantics exactly,
    * and the decimal sum keeps it deterministic and reproducible
    * bit-for-bit across engines (SURVEY.md §7.5).
    */
  val dailyOrderMetrics = new DerivedNode(ctx, "daily_order_metrics", "gold",
    Seq("order_date"), Seq(wideOrders),
    Seq("order_date", "total_price_sum", "total_price_mean", "etl_inserted"),
    // Same rule shape as the reference's (0, 100000) strict max; the bound
    // is domain config — TPC-H o_totalprice daily means sit near 490k, so
    // the harness domain uses 1e6 (the reference value would block every
    // write, which is how this gate was verified to fire).
    Seq(Unique(Seq("order_date")),
      MaxInRange("total_price_mean", 0, 1000000, strict = true)),
    (_, up) => up.head
      .withColumn("order_date", col("order_ts").cast("date"))
      .filter(col("is_active"))
      .groupBy("order_date")
      .agg(sum("total_price").as("total_price_sum"),
        (sum("total_price").cast("double") / count(col("total_price")))
          .as("total_price_mean")))

  /** A2 + G1: per-day × category mean/median of actual_price, exploding
    * the categories array; order_date derives from created_ts — the
    * reference's divergence from daily_order_metrics, replicated
    * (etl/layers/gold/daily_category_metrics.py:109-131).
    * Median is `percentile_approx` at the default accuracy (10000), the
    * reference's own choice (daily_category_metrics.py:130) and the
    * bounded-memory one: the Greenwald-Khanna sketch holds O(accuracy)
    * samples per group, vs exact `percentile`'s ObjectHashAggregate
    * buffering EVERY value of the hottest (date, category) group — a
    * 100-TB executor-memory hazard. The sketch is exact while a group
    * stays under ~accuracy/2 values (no GK compression fires), returning
    * the element of rank ceil(n/2) — which is DuckDB QUANTILE_DISC's
    * 0.5 convention exactly, so the sf0.01 oracle stays hash-green; at
    * production scale the same code degrades gracefully to a ±1/accuracy
    * rank error instead of an OOM. Input cast to double so both engines
    * rank identical doubles. The mean denominator is the non-null count,
    * matching `mean()` NULL semantics.
    */
  val dailyCategoryMetrics = new DerivedNode(ctx, "daily_category_metrics",
    "gold", Seq("order_date", "category"), Seq(wideOrderItems),
    Seq("order_date", "category", "mean_actual_price",
      "median_actual_price", "etl_inserted"),
    Seq.empty,
    (_, up) => up.head
      .withColumn("order_date", col("created_ts").cast("date"))
      .filter(col("is_active"))
      .select(col("order_id"), col("order_date"), col("product_id"),
        col("actual_price"), explode(col("categories")).as("category"))
      .groupBy("order_date", "category")
      .agg((sum("actual_price").cast("double") / count(col("actual_price")))
          .as("mean_actual_price"),
        expr("percentile_approx(cast(actual_price as double), 0.5, 10000)")
          .as("median_actual_price")))

  val bronze: Seq[BronzeNode] = Seq(appuser, seller, buyer, product, brand,
    manufacturer, category, productCategory, sellerProduct, orders,
    orderItem, ratings, clickstream)
  val silver: Seq[DerivedNode] = Seq(dimBuyer, dimSeller, dimProduct,
    dimCategory, factOrders, factOrderItems, brgProductCategory,
    brgSellerProduct)
  val gold: Seq[DerivedNode] = Seq(wideOrders, wideOrderItems,
    dailyOrderMetrics, dailyCategoryMetrics)
}

/** Stakeholder report views (reference:
  * etl/layers/interface/daily_order_report.py:4-24,
  * daily_category_report.py:4-23 — rename + global temp view + spark.sql).
  */
object Interface {
  def createDailyOrderReportView(metrics: DataFrame): Unit =
    metrics.select(
      col("order_date").as("Date"),
      col("total_price_sum").as("Revenue"),
      col("total_price_mean").as("Mean Revenue"))
      .createOrReplaceGlobalTempView("daily_order_report")

  def createDailyCategoryReportView(metrics: DataFrame): Unit =
    metrics.select(
      col("order_date").as("Date"),
      col("category").as("Product Category"),
      col("mean_actual_price").as("Mean Revenue"),
      col("median_actual_price").as("Median Revenue"))
      .createOrReplaceGlobalTempView("daily_category_report")

  def dailyOrderReport(spark: SparkSession): DataFrame =
    spark.sql("select * from global_temp.daily_order_report")

  def dailyCategoryReport(spark: SparkSession): DataFrame =
    spark.sql("select * from global_temp.daily_category_report")
}
