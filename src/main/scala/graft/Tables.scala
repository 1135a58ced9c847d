package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

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

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 only reads as
    // a long (spark.sql.legacy.parquet.nanosAsLong — set in Verify/Bench/
    // test sessions). Normalize to TimestampType at µs precision; the
    // truncation (floor) matches DuckDB's CAST(ts_ns AS TIMESTAMP).
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
}
