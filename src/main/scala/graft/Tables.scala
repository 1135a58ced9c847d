package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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

  /** Parquet schema per (dir, table), inferred once per JVM: the driver
    * data is immutable, so re-running footer inference — a Spark job per
    * `spark.read.parquet` — for every one of the ~240 source loads a
    * bench pass makes is pure fixed cost (measured: 12 s of jobs plus
    * their planning gaps, round-14 event-log profile). Metadata only —
    * no row ever lives here. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.sql.types.StructType]()

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val path = s"$sfDir/$name.parquet"
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    val df = spark.read.schema(schema).parquet(path)
    // The driver has shipped events.ts under three parquet encodings across
    // rounds: TIMESTAMP(NANOS) (readable only as a long under
    // spark.sql.legacy.parquet.nanosAsLong, set in every session),
    // TIMESTAMP(MICROS, isAdjustedToUTC=false) (arrives as TIMESTAMP_NTZ),
    // and plain TIMESTAMP. Normalize all three to TimestampType at µs
    // precision so downstream ts consumers (unix_micros, windows, watermarks)
    // see one type. Sessions run UTC, so the NTZ cast is value-preserving;
    // the nanos truncation (floor) matches DuckDB's CAST(ts_ns AS TIMESTAMP).
    if (name == "events") df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
    else df
  }
}
