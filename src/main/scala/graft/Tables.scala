package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided testdata (TESTDATA.md): one parquet per
  * table under `/root/testdata/sf*`. Role mapping onto the reference's
  * rainforest star schema (SURVEY.md §7.1): orders→fact_orders,
  * lineitem→fact_order_items, customer→dim_buyer, supplier→dim_seller,
  * part→dim_product(+category via p_type), events→clickstream,
  * documents/embeddings→extension operators.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")
}
