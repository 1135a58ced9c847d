package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Eager materialization point for frames feeding multiple consumers
  * (the build-the-index-once convention), with a selectable durability
  * posture:
  *
  *  - [[Mat.LocalCheckpoint]] (default — right for local[*] runs and
  *    the driver's single-JVM gate): `localCheckpoint(eager = true)`.
  *    Fastest, but stores NON-replicated blocks on executors AND
  *    truncates lineage — on a real cluster, losing one executor
  *    mid-query makes every downstream read unrecoverable (there is no
  *    lineage left to recompute the lost blocks from).
  *  - [[Mat.ReplicatedPersist]] (the 100 TB recommendation): eager
  *    `persist(MEMORY_AND_DISK_2)` — each block lives on two executors
  *    and the LINEAGE IS KEPT, so a lost executor degrades to a
  *    recompute, never a failed job. Costs one extra copy of the
  *    materialized frame; for multi-TB intermediates prefer a
  *    lake-backed reliable `checkpoint()` (requires a checkpoint dir on
  *    durable storage, which the local harness does not mount).
  *  - [[Mat.Off]]: pass-through, used by plan audits — an eager
  *    materialization both executes jobs at DataFrame-construction time
  *    and truncates the explained plan at the checkpoint, so with it on,
  *    PlanSpec's join-shape assertions would inspect only the
  *    post-checkpoint remnant (and its "planning only" contract would
  *    silently break).
  *
  * Both materializing modes are EAGER (the persist path forces a
  * count), so call sites may rely on "materialized before the next
  * statement runs" — the contract the CDC lake overwrite and the
  * schema-sidecar writers already assume of localCheckpoint.
  */
object Mat {
  sealed trait Mode
  case object LocalCheckpoint extends Mode
  case object ReplicatedPersist extends Mode
  case object Off extends Mode

  @volatile private[graft] var mode: Mode = LocalCheckpoint

  def apply(df: DataFrame): DataFrame = mode match {
    case LocalCheckpoint => df.localCheckpoint(true)
    case ReplicatedPersist =>
      val p = df.persist(StorageLevel.MEMORY_AND_DISK_2)
      p.count() // force: both modes share the eager contract
      p
    case Off => df
  }

  /** Run `body` with materialization off (plan-only inspection). */
  def withoutMaterialization[A](body: => A): A = withMode(Off)(body)

  /** Run `body` under `m` — e.g. `withMode(ReplicatedPersist)` in a
    * cluster session submit wrapper.
    */
  def withMode[A](m: Mode)(body: => A): A = {
    val prev = mode
    mode = m
    try body finally mode = prev
  }
}
