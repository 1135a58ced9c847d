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

  /** Merge a CDC delta into an accumulated state table, RETAINING
    * tombstones: per key keep the (seq, op)-maximal row, deletes
    * included. Keeping tombstones in state is what makes incremental
    * merging insensitive to how the change stream is split into
    * batches — a delete must keep outranking any lower-seq update that
    * arrives in a LATER batch; dropping it (currentState semantics)
    * would resurrect the row. Read the current table by filtering
    * `op <> 'D'` at the end. One keyed window per merge; at scale this
    * is the lakehouse MERGE a streaming foreachBatch sink runs per
    * micro-batch.
    *
    * Tie semantics: at EQUAL seq the `op`-descending tiebreak ranks
    * 'U' over 'D' — an upsert and a delete sharing a commit sequence
    * resolve to the upsert (upsert-over-delete), identically here and
    * in the shared oracle SQL. This is a convention, not a law: real
    * CDC feeds that want delete-wins (or that guarantee strictly
    * ordered seq per key) should flip the tiebreak in BOTH places —
    * engine and oracle agree today, which is what the driver compare
    * actually pins.
    */
  def mergeState(state: DataFrame, delta: DataFrame, key: String)
      : DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(col("seq").desc, col("op").desc)
    state.unionByName(delta)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}
