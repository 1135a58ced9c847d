package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame}

/** The ONE `private[sql]` bridge this library uses, isolated in its own
  * `org.apache.spark.sql` subpackage — the same access route the
  * public Delta Lake connector takes (delta-io ships its whole source
  * under `org.apache.spark.sql.delta` for exactly this reason): a
  * custom v1 streaming [[org.apache.spark.sql.execution.streaming
  * .Source]] MUST return `getBatch` frames tagged `isStreaming = true`
  * (MicroBatchExecution asserts it), and the only constructor for such
  * a frame is `SparkSession.internalCreateDataFrame`, which is
  * `private[sql]`. Nothing else in the repo reaches private API.
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
}
