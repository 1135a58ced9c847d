package graft.core

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Run-level metrics: the parity surface for the reference's metrics
  * sink (its deployment wires `spark/conf/metrics.properties` to a
  * Prometheus scrape in docker-compose). Same counters, different
  * transport — a queryable JSON artifact written at end of run instead
  * of a scrape endpoint, which is the honest equivalent for a
  * batch/bench process with no long-lived server to scrape.
  *
  * One listener per SparkSession, registered up front; counters
  * aggregate executor task metrics AS TASKS FINISH, so `snapshot` is
  * O(1) driver metadata — no event-log replay, no status-store walk,
  * and the cost is identical whether the run touched 60k rows or
  * 100 TB (per-task listener work is a dozen long adds).
  */
final class RunMetricsListener extends SparkListener {
  private val jobs = new LongAdder
  private val tasks = new LongAdder
  private val failedTasks = new LongAdder
  private val inputBytes = new LongAdder
  private val inputRecords = new LongAdder
  private val outputBytes = new LongAdder
  private val outputRecords = new LongAdder
  private val shuffleReadBytes = new LongAdder
  private val shuffleWriteBytes = new LongAdder
  private val shuffleRecordsWritten = new LongAdder
  private val memorySpillBytes = new LongAdder
  private val diskSpillBytes = new LongAdder
  private val gcTimeMs = new LongAdder
  private val cpuTimeNs = new LongAdder
  private val runTimeMs = new LongAdder
  // max over finished tasks of the task's peak unified-memory use — the
  // per-task figure the Spark UI aggregates the same way; a cross-task
  // concurrent peak would need the executor's memory manager, which a
  // listener (by design) never sees
  private val peakTaskMemory = new java.util.concurrent.atomic.AtomicLong(0)

  override def onJobStart(e: SparkListenerJobStart): Unit = jobs.increment()

  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    tasks.increment()
    if (e.reason != org.apache.spark.Success) failedTasks.increment()
    val m = e.taskMetrics
    if (m != null) {
      inputBytes.add(m.inputMetrics.bytesRead)
      inputRecords.add(m.inputMetrics.recordsRead)
      outputBytes.add(m.outputMetrics.bytesWritten)
      outputRecords.add(m.outputMetrics.recordsWritten)
      shuffleReadBytes.add(m.shuffleReadMetrics.totalBytesRead)
      shuffleWriteBytes.add(m.shuffleWriteMetrics.bytesWritten)
      shuffleRecordsWritten.add(m.shuffleWriteMetrics.recordsWritten)
      memorySpillBytes.add(m.memoryBytesSpilled)
      diskSpillBytes.add(m.diskBytesSpilled)
      gcTimeMs.add(m.jvmGCTime)
      cpuTimeNs.add(m.executorCpuTime)
      runTimeMs.add(m.executorRunTime)
      peakTaskMemory.accumulateAndGet(m.peakExecutionMemory, Math.max(_, _))
    }
  }

  /** Counter snapshot, stable key order (it IS the artifact schema —
    * MetricsSpec pins these names).
    */
  def snapshot: Seq[(String, Long)] = Seq(
    "jobs" -> jobs.sum, "tasks" -> tasks.sum,
    "failed_tasks" -> failedTasks.sum,
    "input_bytes" -> inputBytes.sum, "input_records" -> inputRecords.sum,
    "output_bytes" -> outputBytes.sum,
    "output_records" -> outputRecords.sum,
    "shuffle_read_bytes" -> shuffleReadBytes.sum,
    "shuffle_write_bytes" -> shuffleWriteBytes.sum,
    "shuffle_records_written" -> shuffleRecordsWritten.sum,
    "memory_spill_bytes" -> memorySpillBytes.sum,
    "disk_spill_bytes" -> diskSpillBytes.sum,
    "gc_time_ms" -> gcTimeMs.sum,
    "executor_cpu_time_ns" -> cpuTimeNs.sum,
    "executor_run_time_ms" -> runTimeMs.sum,
    "peak_task_execution_memory_bytes" -> peakTaskMemory.get)
}

object RunMetrics {

  /** Register a fresh listener on the session; call before the work you
    * want metered.
    */
  def install(spark: SparkSession): RunMetricsListener = {
    val l = new RunMetricsListener
    spark.sparkContext.addSparkListener(l)
    l
  }

  /** The listener bus is asynchronous — task-end events can still be in
    * flight when the last action returns. Poll until the task counter
    * stops moving (two consecutive identical reads a beat apart) or the
    * deadline passes; for an artifact written once at end of run, a
    * bounded wait beats reaching into `private[spark]` bus internals.
    */
  def settle(l: RunMetricsListener, timeoutMs: Long = 10000): Unit = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var prev = -1L
    var cur = l.snapshot.toMap.apply("tasks")
    while (cur != prev && System.nanoTime() < deadline) {
      prev = cur
      Thread.sleep(100)
      cur = l.snapshot.toMap.apply("tasks")
    }
  }

  /** Write the artifact: one JSON object, counters plus caller context
    * (sf dir, entry point). Returns the JSON line for callers that also
    * want to print it.
    */
  def writeArtifact(l: RunMetricsListener, path: String,
      context: Seq[(String, String)]): String = {
    settle(l)
    def js(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    val fields = context.map { case (k, v) => s"${js(k)}:${js(v)}" } ++
      l.snapshot.map { case (k, v) => s"${js(k)}:$v" }
    val line = fields.mkString("{", ",", "}")
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      (line + "\n").getBytes("UTF-8"))
    line
  }
}
