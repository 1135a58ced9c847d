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
}
