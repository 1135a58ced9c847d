package graft

import graft.core.RunMetrics

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("listener meters a shuffle job and the artifact carries the schema") {
    val l = RunMetrics.install(spark)
    // a real shuffle: groupBy over enough distinct keys that exchange
    // write/read bytes are nonzero
    (1L to 10000L).toDF("id")
      .groupBy(($"id" % 97).as("k")).count()
      .write.format("noop").mode("overwrite").save()
    RunMetrics.settle(l)
    val snap = l.snapshot.toMap
    assert(snap("jobs") >= 1)
    assert(snap("tasks") >= 1)
    assert(snap("failed_tasks") === 0)
    assert(snap("shuffle_write_bytes") > 0)
    assert(snap("shuffle_read_bytes") > 0)
    assert(snap("executor_run_time_ms") >= 0)

    val out = java.nio.file.Files
      .createTempDirectory("graft_metrics").resolve("m.json")
    val line = RunMetrics.writeArtifact(l, out.toString,
      Seq("entry" -> "spec", "sf" -> "none"))
    assert(java.nio.file.Files.exists(out))
    // schema pin: every counter key appears exactly once, context first
    val expectedKeys = Seq("entry", "sf", "jobs", "tasks", "failed_tasks",
      "input_bytes", "input_records", "output_bytes", "output_records",
      "shuffle_read_bytes", "shuffle_write_bytes",
      "shuffle_records_written", "memory_spill_bytes", "disk_spill_bytes",
      "gc_time_ms", "executor_cpu_time_ns", "executor_run_time_ms",
      "peak_task_execution_memory_bytes")
    expectedKeys.foreach { k =>
      assert(line.contains("\"" + k + "\":"), s"missing key $k in $line")
    }
    assert(line.startsWith("{") && line.endsWith("}"))
  }

  test("prometheus scrape endpoint serves the live counters in text " +
      "format 0.0.4") {
    val l = RunMetrics.install(spark)
    (1L to 5000L).toDF("id")
      .groupBy(($"id" % 31).as("k")).count()
      .write.format("noop").mode("overwrite").save()
    RunMetrics.settle(l)
    val srv = graft.core.MetricsHttp.start(spark, l) // ephemeral port
    try {
      assert(srv.port > 0)
      def get(url: String): (Int, String, String) = {
        val c = new java.net.URL(url).openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        c.setConnectTimeout(5000); c.setReadTimeout(5000)
        val code = c.getResponseCode
        val ct = Option(c.getContentType).getOrElse("")
        val body =
          if (code == 200)
            new String(c.getInputStream.readAllBytes(), "UTF-8")
          else ""
        c.disconnect()
        (code, ct, body)
      }
      val (code, ct, body) = get(srv.url)
      assert(code === 200)
      assert(ct.startsWith("text/plain"))
      assert(ct.contains("version=0.0.4"))
      // exposition-format shape: HELP + TYPE + sample per metric,
      // app_id label, and the values match the listener's snapshot
      val snap = l.snapshot.toMap
      val appId = spark.sparkContext.applicationId
      Seq("graft_jobs_total" -> "jobs",
        "graft_tasks_total" -> "tasks",
        "graft_shuffle_write_bytes_total" -> "shuffle_write_bytes",
        "graft_peak_task_execution_memory_bytes" ->
          "peak_task_execution_memory_bytes").foreach {
        case (metric, key) =>
          assert(body.contains(s"# TYPE $metric "), s"no TYPE for $metric")
          assert(body.contains(s"# HELP $metric "), s"no HELP for $metric")
          val sample =
            (metric + "\\{app_id=\"" + appId + "\"\\} (\\d+)").r
          val v = sample.findFirstMatchIn(body).map(_.group(1).toLong)
          assert(v.nonEmpty, s"no sample line for $metric in\n$body")
          assert(v.get >= snap(key),
            s"$metric serves ${v.get}, listener says ${snap(key)}")
      }
      assert(body.contains("# TYPE graft_peak_task_execution_memory_bytes" +
        " gauge"))
      // counters are LIVE, not a start-time copy: run another job, the
      // next scrape moves
      val tasksBefore = ("graft_tasks_total\\{[^}]*\\} (\\d+)").r
        .findFirstMatchIn(body).get.group(1).toLong
      spark.range(100000).selectExpr("sum(id)").collect(): Unit
      RunMetrics.settle(l)
      val (_, _, body2) = get(srv.url)
      val tasksAfter = ("graft_tasks_total\\{[^}]*\\} (\\d+)").r
        .findFirstMatchIn(body2).get.group(1).toLong
      assert(tasksAfter > tasksBefore)
      // servlet-mount semantics: only the configured path serves
      val (code404, _, _) = get(s"http://localhost:${srv.port}/nope")
      assert(code404 === 404)
    } finally srv.stop()
  }
}
