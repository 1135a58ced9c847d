package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[TxStreamingWrite]] — the DSv2 streaming sink (round-12 verdict
  * item 2, write half): executor-staged parquet committed atomically
  * under the (queryId, epochId) writer transaction, `writeStream
  * .toTable` by catalog name, partitioned routing byte-compatible
  * with DataFrame.write, restart exactly-once, and the row-feature
  * refusal line (constraint/generated/tracked tables stay on the V1
  * DataFrame sink).
  */
class TxStreamingWriteSpec extends SparkSpec {
  import spark.implicits._

  private def fresh(tag: String): String =
    Files.createTempDirectory(s"txsw_$tag").resolve("t").toString

  private def feed(n: Int, from: Long = 0L): DataFrame =
    spark.range(from, from + n).select(
      $"id".as("k"), concat(lit("v-"), $"id").as("v"))

  test("writeStream.toTable by name: exactly-once across a restart " +
      "from the same checkpoint") {
    spark.conf.set("spark.sql.catalog.swcat",
      "graft.lake.catalog.TxCatalog")
    val wh = Files.createTempDirectory("txsw_wh").toString
    spark.conf.set("spark.sql.catalog.swcat.warehouse", wh)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS swcat.s")
    spark.sql("CREATE TABLE swcat.s.sink (k BIGINT, v STRING) " +
      "USING txlog")
    val srcRoot = fresh("src")
    val ckpt = Files.createTempDirectory("txsw_ckpt").toString
    val src = new TxTable(spark, srcRoot)
    src.create(feed(5))
    def launch() = spark.readStream.format("txlog")
      .option("path", srcRoot).load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .toTable("swcat.s.sink")
    val q1 = launch()
    try q1.processAllAvailable() finally q1.stop()
    src.append(feed(3, from = 100L))
    val q2 = launch()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.sql("SELECT k FROM swcat.s.sink").as[Long]
      .collect().sorted
    assert(got.length === 8, s"exactly-once by name, got ${got.length}")
    // the commits carry the DSv2 writer transaction (queryId-keyed)
    val tab = new TxTable(spark, s"$wh/s/sink")
    assert(TxLog.snapshot(
      new org.apache.hadoop.fs.Path(s"$wh/s/sink").getFileSystem(
        spark.sparkContext.hadoopConfiguration),
      new org.apache.hadoop.fs.Path(s"$wh/s/sink")).txns
      .keys.exists(_.startsWith("dsv2:")))
    assert(tab.read().count() === 8)
  }

  test("partitioned streaming write: dynamic routing, Hive-escaped " +
      "dirs, stats on the adds, partition-pruned read-back") {
    val root = fresh("part")
    val tab = new TxTable(spark, root)
    tab.create(
      spark.range(0).select($"id".as("k"), lit("x").as("bucket"),
        ($"id" * 1.0).as("score")),
      partitionCols = Seq("bucket"))
    val srcRoot = fresh("partsrc")
    val src = new TxTable(spark, srcRoot)
    val rows = spark.range(8).select($"id".as("k"),
      when($"id" % 2 === 0, "ev=en/odd").otherwise("plain").as("bucket"),
      ($"id" * 2.5).as("score"))
    src.create(rows)
    val ckpt = Files.createTempDirectory("txsw_pck").toString
    val q = spark.readStream.format("txlog")
      .option("path", srcRoot).load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("txlog").option("path", root).start()
    try q.processAllAvailable() finally q.stop()
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val snap = TxLog.snapshot(fs, new org.apache.hadoop.fs.Path(root))
    // partition values parsed from escaped dirs, stats recorded
    assert(snap.adds.map(_.partitionValues("bucket")).toSet ===
      Set("ev=en/odd", "plain"))
    assert(snap.adds.forall(_.stats.contains("k")))
    assert(snap.adds.forall(_.bytes.exists(_ > 0L)))
    // pruned read-back equals the source relationally
    val back = tab.read().where($"bucket" === "ev=en/odd")
      .select($"k").as[Long].collect().sorted
    assert(back.toSeq === Seq(0L, 2L, 4L, 6L))
    assert(tab.read().count() === 8)
  }

  test("row-REWRITING feature tables refuse at query start, pointing " +
      "at the V1 sink") {
    val root = fresh("refuse")
    val tab = new TxTable(spark, root)
    tab.create(feed(1), generatedColumns = Map("v" -> "concat('v-', k)"))
    val srcRoot = fresh("refsrc")
    new TxTable(spark, srcRoot).create(feed(2))
    val ckpt = Files.createTempDirectory("txsw_rck").toString
    val e = intercept[Exception] {
      val q = spark.readStream.format("txlog")
        .option("path", srcRoot).load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("txlog").option("path", root).start()
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("txlog-stream")),
      s"must point at the V1 sink, got: ${msgs(e).mkString(" | ")}")
  }

  test("CHECK and NOT NULL enforce EXECUTOR-SIDE: clean batches land, " +
      "a violating row fails its epoch and nothing commits") {
    val root = fresh("enforce")
    val tab = new TxTable(spark, root)
    tab.create(feed(1))
    tab.addConstraint("k >= 0")
    tab.addNotNull("v")
    val srcRoot = fresh("ensrc")
    val src = new TxTable(spark, srcRoot)
    src.create(feed(3, from = 10L)) // k in [10,13): passes k >= 0
    val ckpt = Files.createTempDirectory("txsw_eck").toString
    val q = spark.readStream.format("txlog")
      .option("path", srcRoot).load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("txlog").option("path", root).start()
    try q.processAllAvailable() finally q.stop()
    assert(tab.read().count() === 4, "the clean batch must land")
    val vBefore = tab.history().count()
    // a violating batch: k = -5 breaks CHECK (k >= 0)
    src.append(spark.range(1).select((lit(-5L)).as("k"),
      lit("bad").as("v")))
    val q2 = spark.readStream.format("txlog")
      .option("path", srcRoot).load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("txlog").option("path", root).start()
    val e = intercept[Exception] {
      try q2.processAllAvailable() finally q2.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("violates CHECK")),
      s"expected a CHECK violation, got: ${msgs(e).mkString(" | ")}")
    assert(tab.read().count() === 4,
      "the violating epoch must not commit a single row")
    assert(tab.history().count() === vBefore,
      "no commit may land for the failed epoch")
    // NULL in a NOT NULL column refuses the same way
    val srcRoot2 = fresh("ensrc2")
    val src2 = new TxTable(spark, srcRoot2)
    src2.create(spark.range(1).select($"id".as("k"),
      lit(null).cast("string").as("v")))
    val ckpt2 = Files.createTempDirectory("txsw_eck2").toString
    val q3 = spark.readStream.format("txlog")
      .option("path", srcRoot2).load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt2)
      .format("txlog").option("path", root).start()
    val e2 = intercept[Exception] {
      try q3.processAllAvailable() finally q3.stop()
    }
    assert(msgs(e2).exists(_.contains("violates NOT NULL")),
      s"expected a NOT NULL violation, got: ${msgs(e2).mkString(" | ")}")
    assert(tab.read().count() === 4)
    // NULL PASSES a CHECK (SQL's rule) when the column is nullable:
    // k >= 0 over a null k admits the row
    val tab3root = fresh("nullpass")
    val tab3 = new TxTable(spark, tab3root)
    tab3.create(feed(1))
    tab3.addConstraint("k >= 0")
    val srcRoot3 = fresh("ensrc3")
    new TxTable(spark, srcRoot3).create(
      spark.range(1).select(lit(null).cast("bigint").as("k"),
        lit("ok").as("v")))
    val ckpt3 = Files.createTempDirectory("txsw_eck3").toString
    val q4 = spark.readStream.format("txlog")
      .option("path", srcRoot3).load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt3)
      .format("txlog").option("path", tab3root).start()
    try q4.processAllAvailable() finally q4.stop()
    assert(tab3.read().where($"v" === "ok").count() === 1,
      "a NULL check input must pass (SQL semantics, batch-path parity)")
  }

  test("Complete output mode refuses (append-only sink)") {
    val root = fresh("complete")
    new TxTable(spark, root).create(feed(1))
    val srcRoot = fresh("csrc")
    new TxTable(spark, srcRoot).create(feed(3))
    val ckpt = Files.createTempDirectory("txsw_cck").toString
    val e = intercept[Exception] {
      val q = spark.readStream.format("txlog")
        .option("path", srcRoot).load()
        .groupBy($"v").count()
        .writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .format("txlog").option("path", root).start()
      try q.processAllAvailable() finally q.stop()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(m => m.contains("Append") ||
      m.contains("Complete") || m.contains("complete")))
  }

  test("additive schema evolution mid-stream lands through the " +
      "staged-commit path") {
    val dst = fresh("evolve")
    new TxTable(spark, dst).create(feed(2))
    val srcRoot = fresh("evsrc")
    val src = new TxTable(spark, srcRoot)
    src.create(feed(2, from = 10L)
      .withColumn("extra", lit("wide")))
    val ckpt = Files.createTempDirectory("txsw_eck").toString
    val q = spark.readStream.format("txlog")
      .option("path", srcRoot).load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", ckpt)
      .format("txlog").option("path", dst).start()
    try q.processAllAvailable() finally q.stop()
    val out = new TxTable(spark, dst).read()
    assert(out.columns.toSeq === Seq("k", "v", "extra"))
    assert(out.where($"extra".isNull).count() === 2) // old rows null-fill
    assert(out.count() === 4)
  }
}
