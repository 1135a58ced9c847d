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
  */
final class RunRegistry {
  private val executed = scala.collection.mutable.Set[String]()
  private val read = scala.collection.mutable.Map[String, EtlDataSet]()

  /** Run the node if it has not yet run in this registry, then read it
    * (memoized). Mirrors the reference's extract_upstream loop
    * (etl/layers/silver/dim_buyer_silver.py:75-87) minus the re-execution.
    */
  def runOnce(node: TableEtl): EtlDataSet = synchronized {
    if (!executed.contains(node.name)) {
      val t0 = System.nanoTime()
      node.run()
      executed += node.name
      System.err.println(
        f"[graft] ran ${node.name}%-24s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    read.getOrElseUpdate(node.name, node.read())
  }

  /** Read-only variant for `runUpstream = false` consumers. */
  def readOnce(node: TableEtl): EtlDataSet = synchronized {
    read.getOrElseUpdate(node.name, node.read())
  }
}
