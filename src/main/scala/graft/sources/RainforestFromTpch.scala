package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic mapping of the driver's TPC-H-ish testdata onto the
  * reference's 13 rainforest upstream tables (datagen/upstream-data.sql:
  * 6-136), so the full medallion pipeline runs end-to-end on real local
  * data (SURVEY.md §7.1 role mapping):
  *
  *   customer → buyer-side appuser/buyer; supplier → seller-side
  *   appuser/seller (user_id offset by 500000 to keep the id spaces
  *   disjoint); orders → orders; lineitem → order_item; part → product
  *   (+ brand/manufacturer derived by keyed modulo, category from
  *   p_type); events → clickstream.
  *
  * Monetary columns are cast DECIMAL(18,2) at this boundary — parity with
  * the reference's DECIMAL(10,2) JDBC schema and the precondition for
  * deterministic, oracle-matchable aggregation. `is_active` maps to
  * `acctbal >= 0` so the reference's active-user filters stay non-trivial.
  * Every derivation is pure column arithmetic — reproducible in plain SQL
  * for the DuckDB oracle.
  */
final case class RainforestFromTpch(dir: String) extends UpstreamSource {

  private def t(spark: SparkSession, n: String): DataFrame =
    graft.Tables.load(spark, dir, n)

  private val ts0 = lit(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))

  private def withAudit(df: DataFrame, byCol: String): DataFrame =
    df.withColumn("created_ts", ts0)
      .withColumn("last_updated_by", col(byCol))
      .withColumn("last_updated_ts", ts0)

  /** Supplier-side user ids live above 500000 (max custkey at sf1 is
    * 150k; the offset keeps the spaces disjoint for every testdata sf).
    */
  private val sellerUserOffset = 500000

  override def load(spark: SparkSession, table: String): DataFrame =
    table match {
      case "appuser" =>
        val buyers = t(spark, "customer").select(
          col("c_custkey").cast("int").as("user_id"),
          col("c_name").as("username"),
          concat(col("c_name"), lit("@rainforest.example")).as("email"),
          (col("c_acctbal") >= 0).as("is_active"))
        val sellers = t(spark, "supplier").select(
          (col("s_suppkey") + sellerUserOffset).cast("int").as("user_id"),
          col("s_name").as("username"),
          concat(col("s_name"), lit("@rainforest.example")).as("email"),
          (col("s_acctbal") >= 0).as("is_active"))
        withAudit(buyers.unionByName(sellers), "user_id")

      case "buyer" =>
        withAudit(
          t(spark, "customer").select(
            col("c_custkey").cast("int").as("buyer_id"),
            col("c_custkey").cast("int").as("user_id"),
            ts0.as("first_time_purchased_timestamp")),
          "user_id")

      case "seller" =>
        withAudit(
          t(spark, "supplier").select(
            col("s_suppkey").cast("int").as("seller_id"),
            (col("s_suppkey") + sellerUserOffset).cast("int").as("user_id"),
            ts0.as("first_time_sold_timestamp")),
          "user_id")

      case "orders" =>
        t(spark, "orders").select(
          col("o_orderkey").as("order_id"),
          col("o_custkey").as("buyer_id"),
          col("o_orderdate").as("order_ts"),
          col("o_totalprice").cast("decimal(18,2)").as("total_price"),
          col("o_orderdate").as("created_ts"))

      case "order_item" =>
        t(spark, "lineitem").select(
          (col("l_orderkey") * 10 + col("l_linenumber")).as("order_item_id"),
          col("l_orderkey").as("order_id"),
          col("l_partkey").as("product_id"),
          col("l_suppkey").as("seller_id"),
          col("l_quantity").cast("int").as("quantity"),
          col("l_extendedprice").cast("decimal(18,2)").as("base_price"),
          (col("l_extendedprice").cast("decimal(18,2)")
            * col("l_tax").cast("decimal(4,2)"))
            .cast("decimal(18,4)").as("tax"),
          col("l_shipdate").as("created_ts"))

      case "product" =>
        withAudit(
          t(spark, "part").select(
            col("p_partkey").as("product_id"),
            col("p_name").as("name"),
            col("p_type").as("description"),
            col("p_retailprice").cast("decimal(18,2)").as("price"),
            (col("p_partkey") % 50 + 1).cast("int").as("brand_id"),
            (col("p_partkey") % 10 + 1).cast("int").as("manufacturer_id")),
          "product_id")

      case "brand" =>
        withAudit(
          t(spark, "part")
            .select((col("p_partkey") % 50 + 1).cast("int").as("brand_id"))
            .distinct()
            .select(col("brand_id"),
              concat(lit("brand_"), col("brand_id")).as("name"),
              concat(lit("country_"), col("brand_id") % 5).as("country")),
          "brand_id")

      case "manufacturer" =>
        withAudit(
          t(spark, "part")
            .select(
              (col("p_partkey") % 10 + 1).cast("int").as("manufacturer_id"))
            .distinct()
            .select(col("manufacturer_id"),
              concat(lit("manufacturer_"), col("manufacturer_id"))
                .as("name"),
              concat(lit("type_"), col("manufacturer_id") % 3).as("type")),
          "manufacturer_id")

      case "category" =>
        // One category per distinct p_type; ids by alphabetical rank.
        // ~150 distinct types — the single-partition window is a few KB.
        withAudit(
          t(spark, "part").select(col("p_type").as("name")).distinct()
            .withColumn("category_id",
              row_number().over(Window.orderBy("name")))
            .select(col("category_id"), col("name")),
          "category_id")

      case "product_category" =>
        val cat = load(spark, "category")
          .select(col("category_id"), col("name"))
        withAudit(
          t(spark, "part")
            .select(col("p_partkey").as("product_id"),
              col("p_type").as("name"))
            .join(cat, Seq("name"))
            .select(col("product_id"), col("category_id")),
          "product_id")

      case "seller_product" =>
        t(spark, "lineitem")
          .select(col("l_suppkey").as("seller_id"),
            col("l_partkey").as("product_id"))
          .distinct()

      case "ratings" =>
        withAudit(
          t(spark, "part").select(
            col("p_partkey").as("ratings_id"),
            col("p_partkey").as("product_id"),
            ((col("p_partkey") % 40).cast("decimal(3,1)") / 10)
              .cast("decimal(3,2)").as("rating")),
          "ratings_id")

      case "clickstream" =>
        t(spark, "events").select(
          col("event_id"),
          col("user_id").cast("int").as("user_id"),
          col("event_type"),
          (col("event_id") % 200 + 1).cast("int").as("product_id"),
          lit(null).cast("int").as("order_id"),
          col("ts").as("timestamp"),
          col("ts").as("created_ts"))

      case other =>
        throw new IllegalArgumentException(s"no rainforest mapping: $other")
    }
}
