package graft

import org.apache.spark.sql.SparkSession

import graft.core.FixedClock
import graft.layers.{EtlContext, Interface, Rainforest}
import graft.sources.RainforestFromTpch

/** Full-pipeline entry point — parity with the reference's run_etl.py:9-28
  * (run both gold metric pipelines, register the stakeholder views, query
  * them through spark.sql, print). Thanks to the RunRegistry the shared
  * lineage executes once, unlike the reference (SURVEY.md §3.4).
  *
  * Usage: runMain graft.RunEtl [sfDir] [lakeDir]
  */
object RunEtl {
  def main(args: Array[String]): Unit = {
    val sfDir =
      if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val lake =
      if (args.length > 1) args(1)
      else java.nio.file.Files.createTempDirectory("graft_lake").toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(Runtime.getRuntime.availableProcessors, 32).toString)
    // event-log parity with the reference deployment
    // (spark/conf/spark-defaults.conf:10-16)
    val eventDir = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir", "/tmp"), "graft_spark_events")
    java.nio.file.Files.createDirectories(eventDir)
    val spark = SessionTuning(SparkSession.builder())
      .master(s"local[$cpus]")
      .appName("graft-etl")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.compress", "true")
      .config("spark.eventLog.dir", eventDir.toUri.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // metrics sink parity (reference: spark/conf/metrics.properties →
    // Prometheus): run-level counters land in METRICS_REPORT.json at exit
    val metrics = graft.core.RunMetrics.install(spark)
    // live scrape surface (reference's PrometheusServlet mount), opt-in:
    // SPARK_GRAFT_METRICS_PORT=9091 serves /metrics/prometheus for the
    // run's lifetime; unset keeps the batch-artifact-only default
    val scrape = graft.core.MetricsHttp.fromEnv(spark, metrics)
    scrape.foreach(s => System.err.println(s"[run_etl] metrics at ${s.url}"))

    // the reference's runtime-loaded expectation suites: when the repo's
    // expectations/ dir is present, each node's DQ gate resolves
    // expectations/<table>.json at run time (etl/utils/base_table.py:155-167
    // workflow) — a steward edits a threshold there with no recompile;
    // tables without a suite file keep their compiled checks
    val suites = java.nio.file.Paths.get("expectations")
    val rf = new Rainforest(EtlContext(
      spark, RainforestFromTpch(sfDir), lake, clock = FixedClock.default,
      checkSuiteDir =
        if (java.nio.file.Files.isDirectory(suites)) Some(suites.toString)
        else None))

    // reference order: category metrics first, then order metrics
    // (run_etl.py:14-28); each read() then feeds its interface view
    graft.core.LineageTimings.clear()
    graft.core.LineageRunReport.clear()
    val tPipe0 = System.nanoTime()
    val category = rf.ctx.registry.runOnce(rf.dailyCategoryMetrics)
    Interface.createDailyCategoryReportView(category.data)
    Interface.dailyCategoryReport(spark).show()

    val order = rf.ctx.registry.runOnce(rf.dailyOrderMetrics)
    Interface.createDailyOrderReportView(order.data)
    Interface.dailyOrderReport(spark).show()

    try graft.core.RunMetrics.writeArtifact(metrics, "METRICS_REPORT.json",
      Seq("entry" -> "run_etl", "sf" -> sfDir,
        "event_log_dir" -> eventDir.toString)): Unit
    catch { case e: Exception =>
      System.err.println(s"[run_etl] metrics report write failed: $e") }
    // lineage artifact parity with Bench: node timings/rows/checks of
    // THIS run through the same shared writer (total = wall seconds of
    // the pipeline section — per-node times overlap under the
    // concurrent registry, so their sum is not a duration)
    try graft.core.LineageRunReport.writeArtifact("LINEAGE_REPORT.json",
      sfDir, (System.nanoTime() - tPipe0) / 1e9,
      eventDir.toString, graft.core.LineageTimings.snapshot,
      graft.core.LineageRunReport.snapshot)
    catch { case e: Exception =>
      System.err.println(s"[run_etl] lineage report write failed: $e") }
    scrape.foreach(_.stop())
    spark.stop()
  }
}
