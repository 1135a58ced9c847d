package graft.lake

import java.nio.file.Files

import graft.SparkSpec

/** [[TxStreamSink]] first-contact and idempotence-key semantics
  * (round-12 verdict item 3 + advice item 2):
  *
  *   - two queries racing first contact on the same NEW table root can
  *     no longer wipe each other — create-if-absent claims v0
  *     atomically, the loser attaches;
  *   - the idempotence key lives INSIDE the checkpoint directory, so a
  *     wiped checkpoint (a user reprocessing from scratch) gets a fresh
  *     key and its restarted batch 0 LANDS instead of silently no-oping
  *     against the dead incarnation's watermark;
  *   - with neither an explicit appId nor a sink-level
  *     checkpointLocation the sink refuses loudly;
  *   - a restarted stream over an additively-evolved source appends
  *     through the ordinary schema evolution (old rows null-filled).
  */
class TxStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"txsink_$tag").resolve("t").toString

  test("two sinks racing first contact: the loser attaches, the " +
      "winner's batch survives") {
    val root = fresh("race")
    val a = new TxStreamSink(spark, root, Nil, Some("appA"), None)
    val b = new TxStreamSink(spark, root, Nil, Some("appB"), None)
    a.addBatch(0L, spark.range(3).selectExpr("id AS k").toDF())
    // B's first contact sees an existing table — previously a
    // create()-wipe, now an attach
    b.addBatch(0L, spark.range(10, 12).selectExpr("id AS k").toDF())
    val tab = new TxTable(spark, root)
    assert(tab.read().as[Long].collect().sorted.toSeq ===
      Seq(0L, 1L, 2L, 10L, 11L))
    // each query idempotent under its OWN key: replays are no-ops
    a.addBatch(0L, spark.range(3).selectExpr("id AS k").toDF())
    b.addBatch(0L, spark.range(10, 12).selectExpr("id AS k").toDF())
    assert(tab.read().count() === 5)
  }

  test("wiped checkpoint = fresh idempotence key: restarted batch 0 " +
      "lands instead of silently dropping") {
    val root = fresh("wipe")
    val ckpt = Files.createTempDirectory("txsink_ckpt").toString
    val s1 = new TxStreamSink(spark, root, Nil, None, Some(ckpt))
    s1.addBatch(0L, spark.range(2).selectExpr("id AS k").toDF())
    // same checkpoint, new sink instance (query restart): replay no-ops
    val s2 = new TxStreamSink(spark, root, Nil, None, Some(ckpt))
    s2.addBatch(0L, spark.range(2).selectExpr("id AS k").toDF())
    assert(new TxTable(spark, root).read().count() === 2)
    // user wipes the checkpoint to reprocess: batchIds restart at 0 —
    // the fresh marker means the batch LANDS (the old path-derived key
    // silently dropped it)
    val p = new org.apache.hadoop.fs.Path(ckpt)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true)
    val s3 = new TxStreamSink(spark, root, Nil, None, Some(ckpt))
    s3.addBatch(0L, spark.range(100, 102).selectExpr("id AS k").toDF())
    assert(new TxTable(spark, root).read().count() === 4)
  }

  test("no appId and no sink-level checkpointLocation refuses loudly") {
    val root = fresh("nokey")
    val s = new TxStreamSink(spark, root, Nil, None, None)
    val e = intercept[RuntimeException](
      s.addBatch(0L, spark.range(1).selectExpr("id AS k").toDF()))
    assert(e.getMessage.contains("idempotence"))
  }

  test("restart with an additively-evolved schema appends through " +
      "ordinary evolution") {
    val root = fresh("evolve")
    val s1 = new TxStreamSink(spark, root, Nil, Some("app1"), None)
    s1.addBatch(0L, spark.range(2).selectExpr("id AS k").toDF())
    val s2 = new TxStreamSink(spark, root, Nil, Some("app1"), None)
    s2.addBatch(1L,
      spark.range(5, 6).selectExpr("id AS k", "'w' AS v").toDF())
    val rows = new TxTable(spark, root).read()
      .orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq === Seq((0L, null), (1L, null), (5L, "w")))
  }
}
