package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: run ONE named SparkEntry query (args: name [sfDir]),
  * materialize it through the noop sink, print wall seconds. Same session
  * shape as [[Bench]]; a second run of the same query in-process shows
  * warm-cache time.
  */
object QueryOnce {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: QueryOnce <query_name> [sfDir]"))
    val sfDir =
      if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = math.min(Runtime.getRuntime.availableProcessors, 32)
    val spark = SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // JIT warmup
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
    for (pass <- 1 to 2) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[queryonce] $name pass $pass: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
