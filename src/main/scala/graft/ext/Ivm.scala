package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.lake.TxTable

/** Incremental view maintenance of AGGREGATE state from a change feed.
  *
  * [[graft.lake.TxTable.applyChanges]] maintains keyed PROJECTIONS (a
  * feed row replaces the row with its key); a maintained aggregate needs
  * arithmetic instead of replacement: each feed slice folds into the
  * running (count, sum) per group as +1/+value for inserts and
  * −1/−value for deletes — an update's delete+insert pair thereby moves
  * a row between groups or adjusts its value without recomputing either
  * group from the base table. This is the standard delta-propagation
  * rule for distributive aggregates (count/sum, and avg = sum/count at
  * read time); min/max are NOT maintainable this way — a retraction of
  * the current extremum needs the base table — and are deliberately out
  * of scope.
  *
  * Scale posture: one slice fold costs a keyed aggregation of the slice
  * (small), a LEFT join of those delta groups against the state table
  * (only the touched groups are read — never the whole state), and one
  * applyChanges commit that rewrites only the state files containing
  * touched groups. Nothing scans the base table; the state table's size
  * is the GROUP cardinality, not the row count.
  */
object Ivm {

  /** Fold one change-feed slice (schema: key cols + `valueCol` +
    * `_change_type`) into a (count, sum) aggregate state table keyed by
    * `keyCols` with columns `countName` and `sumName`. `valueCol` must
    * be integral (long cents, token counts…): exact arithmetic is what
    * makes maintained state bit-identical to a batch recompute —
    * floating-point retraction would drift. Groups whose count reaches
    * zero are deleted from the state. Returns the state table's new
    * version.
    */
  def foldCountSum(state: TxTable, slice: DataFrame, keyCols: Seq[String],
      valueCol: String, countName: String, sumName: String): Long = {
    // a feed row of an unknown change type must fail loudly — sum()
    // would otherwise silently skip its null and desync the state. An
    // update's pre/postimage pair is a retraction + addition: together
    // they move a row between groups or adjust its value.
    val sgn = when(col("_change_type").isin("insert", "update_postimage"), 1L)
      .when(col("_change_type").isin("delete", "update_preimage"), -1L)
      .otherwise(raise_error(
        concat(lit("Ivm.foldCountSum: unknown _change_type "),
          col("_change_type"))))
    val delta = slice
      .groupBy(keyCols.map(col): _*)
      .agg(sum(sgn).as("_d_n"),
        sum(sgn * col(valueCol).cast("long")).as("_d_sum"))
    // only the touched groups: delta drives the join, state is probed
    val cur = state.read()
      .select((keyCols :+ countName :+ sumName).map(col): _*)
    val folded = delta.join(cur, keyCols, "left")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col(countName), lit(0L)) + col("_d_n")).as(countName),
        (coalesce(col(sumName), lit(0L)) + coalesce(col("_d_sum"), lit(0L)))
          .as(sumName)): _*)
    val changes = folded.withColumn("_change_type",
      when(col(countName) === 0L, lit("delete")).otherwise(lit("insert")))
    state.applyChanges(changes, keyCols)
  }
}
