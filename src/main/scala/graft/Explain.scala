package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: dump `explain("formatted")` for every registered query
  * so scan pruning (ReadSchema/PushedFilters), join strategies
  * (BroadcastHashJoin vs SortMergeJoin), and WholeStageCodegen spans can be
  * reviewed. Usage: runMain graft.Explain <sfDir> <outFile> [namePrefix]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val out = args(1)
    val prefix = if (args.length > 2) args(2) else ""
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    val spark = SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.startsWith(prefix))
      .foreach { case (name, fn) =>
        sb.append(s"\n===== $name =====\n")
        try {
          val df = fn(spark, sfDir)
          sb.append(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } catch {
          case e: Throwable => sb.append(s"ERROR: ${e.getMessage}\n")
        }
      }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out),
      sb.toString)
    spark.stop()
  }
}
