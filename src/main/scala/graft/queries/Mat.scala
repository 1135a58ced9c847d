package graft.queries

import org.apache.spark.sql.DataFrame

/** Eager materialization point for frames feeding multiple consumers
  * (the build-the-index-once convention). Kept behind a switch so plan
  * audits can disable it: an eager localCheckpoint truncates the
  * explained plan at the checkpoint AND executes jobs at
  * DataFrame-construction time — with it on, PlanSpec's join-shape
  * assertions would inspect only the post-checkpoint remnant (and its
  * "planning only" contract would silently break).
  */
object Mat {
  @volatile private[graft] var enabled: Boolean = true

  def apply(df: DataFrame): DataFrame =
    if (enabled) df.localCheckpoint(true) else df

  /** Run `body` with materialization off (plan-only inspection). */
  def withoutMaterialization[A](body: => A): A = {
    val prev = enabled
    enabled = false
    try body finally enabled = prev
  }
}
