package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.functions._

import graft.lake.{TxFileIndex, TxLog, TxTable}

/** The native-FileIndex read path ([[graft.lake.TxFileIndex]] — the
  * log serving Spark's planner directly, Delta's TahoeFileIndex
  * design): plan shape (ONE FileSourceScanExec over the log's files,
  * partition pruning inside the planner), log-stats file skipping
  * through the planner's own listFiles callback, plan-time costing
  * from logged file sizes (no filesystem RPCs), and content parity
  * with the legacy per-tuple union path on every layout that routes
  * natively.
  */
class TxFileIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"txfidx_$tag").resolve("tbl").toString

  private def docs(n: Int): DataFrame =
    spark.range(n.toLong).select(
      $"id",
      concat(lit("doc-"), $"id").as("text"),
      ($"id" % 3).cast("string").as("lang"),
      ($"id" * 10).as("score"))

  /** The single native scan node of a txlog-read plan. */
  private def scanOf(df: DataFrame): FileSourceScanExec = {
    val scans = df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    }
    assert(scans.length === 1,
      s"expected ONE native scan, got ${scans.length}")
    scans.head
  }

  test("snapshot read plans as ONE FileSourceScanExec over a TxFileIndex") {
    val tab = new TxTable(spark, freshRoot("one"))
    tab.create(docs(60), partitionCols = Seq("lang"))
    tab.append(docs(60).withColumn("id", $"id" + 100))
    val df = tab.read()
    val scan = scanOf(df)
    assert(scan.relation.location.isInstanceOf[TxFileIndex])
    // content parity: both commits' rows, partition values from the log
    assert(df.count() === 120)
    assert(df.where($"lang" === "2").count() === 40)
  }

  test("partition filters prune inside the planner, not after the scan") {
    val tab = new TxTable(spark, freshRoot("pp"))
    tab.create(docs(90), partitionCols = Seq("lang"))
    val pruned = tab.read().where($"lang" === "1")
    val scan = scanOf(pruned)
    // the partition predicate must land in the scan's partitionFilters
    assert(scan.partitionFilters.nonEmpty,
      "partition filter was not pushed into the scan")
    // and the scan must list strictly fewer files than the full table
    val fullFiles = scanOf(tab.read()).relation.location
      .listFiles(Nil, Nil).map(_.files.size).sum
    val scanned = scan.relation.location
      .listFiles(scan.partitionFilters, Nil).map(_.files.size).sum
    assert(scanned < fullFiles)
    assert(pruned.count() === 30)
  }

  test("log-stats skipping: a range predicate drops files at plan time") {
    val tab = new TxTable(spark, freshRoot("skip"))
    // 4 appends with disjoint id ranges → 4+ files with disjoint stats
    tab.create(docs(25))
    tab.append(docs(25).withColumn("id", $"id" + 1000))
    tab.append(docs(25).withColumn("id", $"id" + 2000))
    tab.append(docs(25).withColumn("id", $"id" + 3000))
    val df = tab.read().where($"id" >= 2000L && $"id" < 2025L)
    val scan = scanOf(df)
    val kept = scan.relation.location
      .listFiles(Nil, scan.dataFilters).map(_.files.size).sum
    val all = scan.relation.location.listFiles(Nil, Nil).map(_.files.size).sum
    assert(kept < all, s"stats skipping kept $kept of $all files")
    assert(df.count() === 25)
  }

  test("plan-time sizing comes from the log's recorded bytes (no RPC)") {
    val root = freshRoot("bytes")
    val tab = new TxTable(spark, root)
    tab.create(docs(50))
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snap = TxLog.snapshot(fs, new Path(root))
    // every add written by this code records its size
    assert(snap.adds.forall(_.bytes.isDefined))
    val idx = new TxFileIndex(spark, new Path(root), snap, snap.adds)
    val fromLog = idx.sizeInBytes
    val fromFs = snap.adds.map(a =>
      fs.getFileStatus(new Path(new Path(root), a.path)).getLen).sum
    assert(fromLog === fromFs)
  }

  test("native path parity with the legacy union path (time travel + evolution)") {
    val tab = new TxTable(spark, freshRoot("par"))
    tab.create(docs(40), partitionCols = Seq("lang"))
    tab.append(docs(40).withColumn("id", $"id" + 100)
      .withColumn("extra", lit(7L))) // additive evolution
    tab.deleteWhere($"score" > 300 && $"id" < 100)
    // head: evolved schema, nulls backfilled, delete applied
    val head = tab.read().orderBy("id")
    assert(head.columns.toSeq === Seq("id", "text", "lang", "score", "extra"))
    assert(head.where($"extra".isNull).count() === 31) // 40 - 9 deleted
    // v0 time travel still serves the pre-evolution schema natively
    val v0 = tab.read(asOf = Some(0L))
    assert(scanOf(v0).relation.location.isInstanceOf[TxFileIndex])
    assert(v0.count() === 40)
  }

  test("merge-on-read files stay OFF the native path; plain files stay on it") {
    val tab = new TxTable(spark, freshRoot("dv"))
    tab.create(docs(100))
    tab.deleteWhereMergeOnRead($"id" === 7L)
    val df = tab.read()
    // content first: the DV row is gone
    assert(df.count() === 99)
    assert(df.where($"id" === 7L).count() === 0)
    // the DV'd file reads through the anti-join path, so the plan is a
    // union — but it must still contain a native TxFileIndex scan for
    // the untouched plain files (pre-AQE plan: the join wraps the
    // executed plan in AdaptiveSparkPlanExec, which hides the scans
    // from a plain collect)
    val native = df.queryExecution.sparkPlan.collect {
      case s: FileSourceScanExec
        if s.relation.location.isInstanceOf[TxFileIndex] => s
    }
    assert(native.nonEmpty,
      "plain files of a partially-DV'd table must stay on the native path")
  }

  test("a query WHERE composes with skipping — no readBetween routing needed") {
    val tab = new TxTable(spark, freshRoot("comp"))
    tab.create(docs(25))
    tab.append(docs(25).withColumn("id", $"id" + 1000))
    tab.append(docs(25).withColumn("id", $"id" + 2000))
    // an ordinary .where on the snapshot read — the planner's
    // listFiles callback applies the same skipping readBetween does
    val q = tab.read().where($"id".between(1000L, 1024L))
      .agg(count(lit(1)).as("n"), sum($"score").as("s"))
    val viaBetween = tab.readBetween("id", 1000L, 1024L)
      .agg(count(lit(1)).as("n"), sum($"score").as("s"))
    assert(q.collect().toSeq === viaBetween.collect().toSeq)
  }
}
