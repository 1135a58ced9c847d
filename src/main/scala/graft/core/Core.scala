package graft.core

import java.sql.Timestamp
import java.time.Instant

import org.apache.spark.sql.DataFrame

/** Injectable clock. The reference stamps every transform with
  * `datetime.now()` (etl/layers/bronze/orders.py:103-105), which is the #1
  * reproducibility hazard (SURVEY.md §7.5); tests and Verify use
  * [[FixedClock]] so `etl_inserted` is deterministic.
  */
trait Clock { def now(): Timestamp }

object SystemClock extends Clock {
  override def now(): Timestamp = Timestamp.from(Instant.now())
}

final case class FixedClock(at: Timestamp) extends Clock {
  override def now(): Timestamp = at
}

object FixedClock {
  /** The canonical test instant, well after any testdata timestamp. */
  val default: FixedClock =
    FixedClock(Timestamp.from(Instant.parse("2026-01-01T00:00:00Z")))
}

/** Dataset-with-metadata, mirroring the reference's `ETLDataSet` dataclass
  * (etl/utils/base_table.py:29-50).
  */
final case class EtlDataSet(
    name: String,
    data: DataFrame,
    primaryKeys: Seq[String],
    storagePath: String,
    dataFormat: String,
    database: String,
    partitionKeys: Seq[String])

/** Raised when a table's data-quality checks fail
  * (reference: etl/utils/base_table.py:18-26,232-235).
  */
final class InvalidDataException(message: String)
    extends RuntimeException(message)

/** Session-scoped memoization of lineage execution. The reference's DAG walk
  * re-runs shared upstreams once per consumer (SURVEY.md §3.4 — e.g.
  * AppUserBronzeETL executes twice under the two gold pipelines); we run each
  * node exactly once per registry with identical semantics. At 100 TB a
  * duplicated bronze scan+write is hours of wasted cluster time, so this is a
  * scale fix, not a style fix.
  *
  * Execution is memoized as one Future per node, so INDEPENDENT lineage
  * branches run concurrently when a consumer extracts several upstreams
  * (see [[TableEtl.extractUpstream]]): the Spark scheduler interleaves
  * their jobs instead of idling between ~30 small sequential write jobs —
  * on a real cluster this is the difference between DAG-depth and
  * DAG-node-count wall-clock. The executor is an unbounded daemon pool:
  * lineage recursion means a node awaits its upstream's Future from
  * inside its own, so a bounded pool could deadlock; concurrency is
  * naturally capped by DAG width (≤ 13 here).
  */
final class RunRegistry {
  import java.util.concurrent.{ConcurrentHashMap, Executors}
  import scala.concurrent.{Await, ExecutionContext, Future}
  import scala.concurrent.duration.Duration

  private val ran = new ConcurrentHashMap[String, Future[Unit]]()
  private val read = new ConcurrentHashMap[String, EtlDataSet]()
  private implicit val ec: ExecutionContext =
    RunRegistry.sharedExecutionContext

  /** Run the node if it has not yet run in this registry, then read it
    * (memoized). Mirrors the reference's extract_upstream loop
    * (etl/layers/silver/dim_buyer_silver.py:75-87) minus the re-execution.
    * Concurrent callers of the same node share one execution and block
    * until it completes; failures (including DQ violations) rethrow to
    * every consumer.
    */
  def runOnce(node: TableEtl): EtlDataSet = {
    val f = ran.computeIfAbsent(node.name, _ => Future {
      val t0 = System.nanoTime()
      node.run()
      val sec = (System.nanoTime() - t0) / 1e9
      LineageTimings.record(node.name, sec)
      System.err.println(f"[graft] ran ${node.name}%-24s $sec%8.2fs")
    })
    Await.result(f, Duration.Inf)
    read.computeIfAbsent(node.name, _ => node.read())
  }

  /** Read-only variant for `runUpstream = false` consumers. */
  def readOnce(node: TableEtl): EtlDataSet =
    read.computeIfAbsent(node.name, _ => node.read())
}

/** Process-wide sink for per-node lineage execution times (wall-clock of
  * each TableEtl.run, as measured inside RunRegistry.runOnce). Bench
  * drains it into the benchmark JSON so pipeline-query timings are
  * attributable: the lineage build cost is reported per node, separately
  * from the report-query time.
  */
object LineageTimings {
  import java.util.concurrent.ConcurrentHashMap
  import scala.jdk.CollectionConverters._

  private val t = new ConcurrentHashMap[String, Double]()
  def record(name: String, sec: Double): Unit = t.put(name, sec)
  def clear(): Unit = t.clear()
  def snapshot: Map[String, Double] = t.asScala.toMap
}

/** One node's run outcome for the per-run lineage report artifact
  * (observability parity with the reference's event-log + history-server
  * surface, spark/conf/spark-defaults.conf:10-16): storage format, how
  * many DQ checks gated the load, the violation texts when the gate
  * fired, and the written row count when it is free driver metadata
  * (txlog tables carry per-file counts in the log; no extra Spark job
  * is ever spent on the report).
  */
final case class NodeRunInfo(
    format: String, checksEvaluated: Int, violations: Seq[String],
    rowsWritten: Option[Long])

/** Process-wide sink for [[NodeRunInfo]], keyed by node name.
  * [[graft.Bench]] joins it with [[LineageTimings]] into
  * `LINEAGE_REPORT.json` next to the bench output.
  */
object LineageRunReport {
  import java.util.concurrent.ConcurrentHashMap
  import scala.jdk.CollectionConverters._

  private val m = new ConcurrentHashMap[String, NodeRunInfo]()
  def record(name: String, info: NodeRunInfo): Unit = m.put(name, info)
  def clear(): Unit = m.clear()
  def snapshot: Map[String, NodeRunInfo] = m.asScala.toMap

  /** Write the per-run lineage artifact (node → seconds, rows, format,
    * checks, violations) — the run-observability surface the reference
    * deployment gets from its event-log + history-server setup, as a
    * queryable file. Shared by [[graft.Bench]] and [[graft.RunEtl]] so
    * both entry points report the same way.
    */
  def writeArtifact(path: String, sfDir: String, lineageTotalSec: Double,
      eventLogDir: String, lineage: Map[String, Double],
      info: Map[String, NodeRunInfo]): Unit = {
    def js(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
    } + "\""
    def f(v: Double): String =
      "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val nodes = (lineage.keySet ++ info.keySet).toSeq.sorted.map { n =>
      val i = info.get(n)
      val fields = Seq(
        lineage.get(n).map(s => s""""seconds":${f(s)}"""),
        i.map(x => s""""format":${js(x.format)}"""),
        i.flatMap(_.rowsWritten).map(r => s""""rows_written":$r"""),
        i.map(x => s""""checks_evaluated":${x.checksEvaluated}"""),
        i.map(x => s""""violations":${
          x.violations.map(js).mkString("[", ",", "]")}"""))
        .flatten.mkString(",")
      s"${js(n)}:{$fields}"
    }.mkString("{", ",", "}")
    val report =
      s"""{"sf":${js(sfDir)},"lineage_total_sec":${f(lineageTotalSec)},""" +
        s""""event_log_dir":${js(eventLogDir)},"nodes":$nodes}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      (report + "\n").getBytes("UTF-8")): Unit
  }
}

object RunRegistry {
  import java.util.concurrent.Executors

  /** Unbounded daemon-thread pool shared by all registries and by
    * [[TableEtl.extractUpstream]]'s fan-out (threads are reclaimed after
    * 60 s idle; daemon so the JVM exits cleanly). Unbounded because
    * lineage recursion blocks a thread per in-flight node — a bounded
    * pool could deadlock on a deep DAG.
    */
  private[graft] lazy val sharedExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-lineage")
        t.setDaemon(true)
        t
      }))
}
