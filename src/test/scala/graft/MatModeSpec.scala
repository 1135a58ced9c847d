package graft

import org.apache.spark.storage.StorageLevel

import graft.queries.{ExtQueries, Mat}

/** The materialization point's durability modes ([[graft.queries.Mat]]):
  * same results under the local-run default (localCheckpoint) and the
  * cluster-durable posture (replicated persist with lineage kept), and
  * the durable mode really does carry 2× replication + lineage.
  */
class MatModeSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("a multi-reader query returns identical rows under both modes") {
    def rows() = ExtQueries.extDedupNgramJaccard.run(spark, dir)
      .collect().map(_.toSeq).toSeq
    val local = Mat.withMode(Mat.LocalCheckpoint)(rows())
    val durable = Mat.withMode(Mat.ReplicatedPersist)(rows())
    assert(local === durable)
  }

  test("ReplicatedPersist keeps lineage and asks for 2x replication") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val m = Mat.withMode(Mat.ReplicatedPersist)(Mat(df))
    try {
      assert(m.storageLevel === StorageLevel.MEMORY_AND_DISK_2,
        "durable mode must persist MEMORY_AND_DISK_2 (lineage retained, " +
          "blocks on two executors)")
      assert(m.collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    } finally m.unpersist()
    // and the default remains the eager local checkpoint
    val lc = Mat(df)
    assert(lc.queryExecution.analyzed.getClass.getSimpleName
      === "LogicalRDD",
      "localCheckpoint truncates lineage to an RDD scan — the documented " +
        "local-only trade")
  }
}
