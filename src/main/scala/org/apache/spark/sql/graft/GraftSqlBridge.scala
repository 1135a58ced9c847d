package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame}

/** The ONE `private[sql]` bridge this library uses, isolated in its own
  * `org.apache.spark.sql` subpackage — the same access route the
  * public Delta Lake connector takes (delta-io ships its whole source
  * under `org.apache.spark.sql.delta` for exactly this reason): the v1
  * streaming API forces `SparkSession.internalCreateDataFrame`
  * (`private[sql]`) on BOTH of its custom endpoints —
  *
  *   - a [[org.apache.spark.sql.execution.streaming.Source]] MUST
  *     return `getBatch` frames tagged `isStreaming = true`
  *     (MicroBatchExecution asserts it), and
  *   - a [[org.apache.spark.sql.execution.streaming.Sink]] receives an
  *     `addBatch` frame still CARRYING the streaming logical plan —
  *     any fresh action on it re-analyzes and refuses ("Queries with
  *     streaming sources must be executed with writeStream.start()");
  *     the already-planned incremental execution's `toRdd` re-wrapped
  *     as a batch frame is the one correct consumption (DeltaSink's
  *     route too).
  *
  * SCOPE (narrowed in round 12): the DEFAULT streaming paths are pure
  * public DSv2 and never touch this object — append-mode reads go
  * through [[graft.lake.TxMicroBatchStream]]
  * (`readStream.format("txlog")` / `readStream.table`), writes through
  * [[graft.lake.TxStreamingWrite]] (`writeStream.toTable` /
  * `format("txlog")`). The bridge remains ONLY behind the V1
  * `txlog-stream` faces, which exist for the semantics DSv2 file-level
  * planning cannot express: the CHANGE-FEED stream (mixed commits are
  * a relational diff, not a file read) and the DataFrame-path sink for
  * row-feature tables (constraints, generated/identity/default
  * columns, row tracking). Delta keeps the same V1 endpoints for the
  * same reasons. Nothing else in the repo reaches private API.
  */
object GraftSqlBridge {

  /** Re-tag a batch frame as a streaming micro-batch: same schema, same
    * distributed plan (`toRdd` is the batch plan's executor-side RDD —
    * rows never pass through the driver), `isStreaming = true`. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[ClassicDataFrame]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, classic.schema, isStreaming = true)
  }

  /** The sink-side twin: a Sink.addBatch frame re-wrapped as a PLAIN
    * batch frame over its own already-planned incremental execution —
    * no re-analysis, no double-read of the sources, rows stay
    * executor-side. */
  def asBatch(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[ClassicDataFrame]
    classic.sparkSession.internalCreateDataFrame(
      classic.queryExecution.toRdd, classic.schema, isStreaming = false)
  }
}
