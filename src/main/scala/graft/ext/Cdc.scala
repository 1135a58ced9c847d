package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC current-state materialization (the lakehouse MERGE shape): fold a
  * change stream of keyed upserts/deletes with sequence numbers into the
  * current table — last write per key wins, a winning delete drops the
  * row. One keyed window; at scale the snapshot and delta shuffle once
  * on the key and history is never rescanned. Ties on `seq` break
  * deterministically toward the UPSERT (op descending, 'U' > 'D'), so
  * replays are idempotent.
  */
object Cdc {

  /** `changes` must carry the key column, `seq` (long — higher wins) and
    * `op` ('U' upsert / 'D' delete); payload = every other column.
    * Returns the current state: one row per surviving key.
    */
  def currentState(changes: DataFrame, key: String): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col("seq").desc, col("op").desc)
    changes
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && col("op") =!= "D")
      .drop("__rn", "seq", "op")
  }
}
