package graft.core

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession

/** Prometheus pull-scrape endpoint over [[RunMetricsListener]] — the
  * live-transport half of the reference's metrics deployment
  * (spark/conf/metrics.properties wires
  * `org.apache.spark.metrics.sink.PrometheusServlet` at
  * `/metrics/prometheus`; docker-compose scrapes it). The repo's
  * end-of-run METRICS_REPORT.json is the batch-honest artifact; this
  * endpoint is the same counters served while the run is ALIVE, in
  * Prometheus text exposition format 0.0.4, for a scraper that polls a
  * long-lived ETL or streaming process.
  *
  * Scale posture: a scrape costs one O(1) snapshot of sixteen LongAdder
  * sums — no event-log replay, no status-store walk, no Spark job — so
  * a 15 s scrape interval costs the same whether the session has
  * processed 60k rows or 100 TB. Plain JDK `com.sun.net.httpserver`
  * (public API since Java 6), zero added dependencies, one daemon
  * thread.
  */
final class MetricsHttp private (
    server: HttpServer, val path: String) {

  /** The bound port (useful when started on an ephemeral port 0). */
  def port: Int = server.getAddress.getPort

  def url: String = s"http://localhost:$port$path"

  def stop(): Unit = server.stop(0)
}

object MetricsHttp {

  /** Prometheus metric metadata per snapshot counter. Cumulative
    * counters carry the conventional `_total` suffix; the per-task peak
    * is a gauge (it can only be compared, not rate()d).
    */
  private val meta: Map[String, (String, String, String)] = Map(
    "jobs" -> ("graft_jobs_total", "counter", "Spark jobs started"),
    "tasks" -> ("graft_tasks_total", "counter", "Tasks finished"),
    "failed_tasks" -> ("graft_failed_tasks_total", "counter",
      "Tasks finished unsuccessfully"),
    "input_bytes" -> ("graft_input_bytes_total", "counter",
      "Bytes read from input sources"),
    "input_records" -> ("graft_input_records_total", "counter",
      "Records read from input sources"),
    "output_bytes" -> ("graft_output_bytes_total", "counter",
      "Bytes written to output sinks"),
    "output_records" -> ("graft_output_records_total", "counter",
      "Records written to output sinks"),
    "shuffle_read_bytes" -> ("graft_shuffle_read_bytes_total", "counter",
      "Shuffle bytes read"),
    "shuffle_write_bytes" -> ("graft_shuffle_write_bytes_total", "counter",
      "Shuffle bytes written"),
    "shuffle_records_written" -> ("graft_shuffle_records_written_total",
      "counter", "Shuffle records written"),
    "memory_spill_bytes" -> ("graft_memory_spill_bytes_total", "counter",
      "Bytes spilled from memory"),
    "disk_spill_bytes" -> ("graft_disk_spill_bytes_total", "counter",
      "Bytes spilled to disk"),
    "gc_time_ms" -> ("graft_gc_time_ms_total", "counter",
      "JVM GC time across tasks, milliseconds"),
    "executor_cpu_time_ns" -> ("graft_executor_cpu_time_ns_total",
      "counter", "Executor CPU time, nanoseconds"),
    "executor_run_time_ms" -> ("graft_executor_run_time_ms_total",
      "counter", "Executor run time, milliseconds"),
    "peak_task_execution_memory_bytes" ->
      ("graft_peak_task_execution_memory_bytes", "gauge",
        "Max over finished tasks of peak unified-memory use"))

  /** Render the listener's snapshot as Prometheus text format 0.0.4. */
  def render(l: RunMetricsListener, appId: String): String = {
    val label = s"""{app_id="${appId.replace("\"", "")}"}"""
    val sb = new StringBuilder
    l.snapshot.foreach { case (key, value) =>
      val (name, typ, help) = meta.getOrElse(key,
        (s"graft_$key", "counter", key))
      sb.append(s"# HELP $name $help\n")
      sb.append(s"# TYPE $name $typ\n")
      sb.append(s"$name$label $value\n")
    }
    sb.result()
  }

  /** Start the endpoint. `port = 0` binds an ephemeral port (tests);
    * deployments pin one via `SPARK_GRAFT_METRICS_PORT`. Path matches
    * the reference's servlet path (`/metrics/prometheus`); scraping `/`
    * 404s like the real servlet mount.
    */
  def start(spark: SparkSession, l: RunMetricsListener,
      port: Int = 0, path: String = "/metrics/prometheus"): MetricsHttp = {
    val appId = spark.sparkContext.applicationId
    val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext(path, new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = render(l, appId).getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type",
          "text/plain; version=0.0.4; charset=utf-8")
        ex.sendResponseHeaders(200, body.length.toLong)
        val os = ex.getResponseBody
        try os.write(body) finally os.close()
      }
    })
    // one daemon thread: a scrape endpoint must never keep the JVM
    // alive past the run, and scrapes are tiny/serial
    server.setExecutor(java.util.concurrent.Executors.newSingleThreadExecutor(
      r => { val t = new Thread(r, "graft-metrics-http")
        t.setDaemon(true); t }))
    server.start()
    new MetricsHttp(server, path)
  }

  /** Env-gated start for the run mains: `SPARK_GRAFT_METRICS_PORT=9091`
    * serves scrapes for the run's lifetime; unset = no server (the
    * batch-artifact default).
    */
  def fromEnv(spark: SparkSession, l: RunMetricsListener)
      : Option[MetricsHttp] =
    sys.env.get("SPARK_GRAFT_METRICS_PORT").map(p =>
      start(spark, l, p.toInt))
}
