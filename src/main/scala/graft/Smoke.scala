package graft

import org.apache.spark.sql.SparkSession

/** Local stand-in for the driver's t1 smoke: SparkEntry.entry must return
  * >0 rows on sf0.001 (BASELINE.md gates). Exits nonzero on failure.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SessionTuning(SparkSession.builder())
      .master("local[4]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"smoke: entry rows = $n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
