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

  test("row-feature tables refuse at query start, pointing at the V1 " +
      "sink") {
    val root = fresh("refuse")
    val tab = new TxTable(spark, root)
    tab.create(feed(1))
    tab.addConstraint("k >= 0")
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
