package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.lake.TxTable

/** Round-6 ACID-lake operators: the [[graft.lake.TxLog]] transaction
  * log exercised end-to-end against the DuckDB oracle. Each query
  * scripts a deterministic commit history onto a scratch TxTable and
  * emits snapshot CONTENT — the oracle reconstructs the same state
  * relationally from the source table, proving create/append/delete/
  * partition-overwrite/time-travel land exactly the rows ACID semantics
  * promise. Concurrency, conflict retry, checkpoint resolution, vacuum
  * and stats-skipping internals are pinned in TxLogSpec (file-layout
  * behavior DuckDB cannot see).
  */
object LakeQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  /** Same convention as ProfileQueries.scratch: keyed by (query, input
    * dir), recreated per run via TxTable.create's root wipe. */
  private def scratch(name: String, dir: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_scratch/${name}_" +
      Integer.toHexString(dir.hashCode)

  // ---- 1. the full ACID write family ----

  /** create → append → copy-on-write delete → partition overwrite, then
    * one snapshot read. Final state: all orders with
    * o_totalprice ≥ 100000, and within the 1-URGENT partition the
    * status column rewritten to 'X' (the overwrite). Every mutation is
    * its own optimistic commit; the read resolves the log, not a
    * directory listing.
    */
  val extLakeAcid = Q(
    "ext_lake_acid",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
      val tab = new TxTable(s, scratch("lake_acid", dir))
      tab.create(orders.where($"o_orderkey" % 2 === 0),
        partitionCols = Seq("o_orderpriority"))
      tab.append(orders.where($"o_orderkey" % 2 === 1))
      tab.deleteWhere($"o_totalprice" < 100000.0)
      val urgent = tab.read()
        .where($"o_orderpriority" === "1-URGENT")
        .withColumn("o_orderstatus", lit("X"))
      tab.overwritePartition("o_orderpriority", "1-URGENT", urgent)
      tab.read()
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice", $"o_orderpriority")
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
           |       CASE WHEN o_orderpriority = '1-URGENT' THEN 'X'
           |            ELSE o_orderstatus END AS o_orderstatus,
           |       o_totalprice, o_orderpriority
           |FROM orders WHERE o_totalprice >= 100000
           |ORDER BY o_orderkey""".stripMargin))

  // ---- 2. time travel ----

  /** Three commits (create evens / append odds / delete cheap), then
    * per-priority totals read AT VERSION 1 (before the delete — the
    * full table) and at head, tagged and unioned: the old snapshot
    * stays exactly readable after later rewrites removed its files from
    * the live set.
    */
  val extLakeTimeTravel = Q(
    "ext_lake_time_travel",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
      val tab = new TxTable(s, scratch("lake_tt", dir))
      tab.create(orders.where($"o_orderkey" % 2 === 0))
      tab.append(orders.where($"o_orderkey" % 2 === 1))
      tab.deleteWhere($"o_totalprice" < 100000.0)
      def totals(df: DataFrame, tag: String): DataFrame =
        df.groupBy($"o_orderpriority")
          .agg(count(lit(1L)).as("n"),
            sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
              .as("revenue"))
          .withColumn("snap", lit(tag))
          .select($"snap", $"o_orderpriority", $"n", $"revenue")
      totals(tab.read(asOf = Some(1L)), "v1")
        .unionAll(totals(tab.read(), "head"))
        .orderBy($"snap", $"o_orderpriority")
    },
    Some("""WITH v1 AS (
           |  SELECT 'v1' AS snap, o_orderpriority, COUNT(*) AS n,
           |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |  FROM orders GROUP BY 2),
           |hd AS (
           |  SELECT 'head' AS snap, o_orderpriority, COUNT(*) AS n,
           |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |  FROM orders WHERE o_totalprice >= 100000 GROUP BY 2)
           |SELECT * FROM v1 UNION ALL SELECT * FROM hd
           |ORDER BY snap, o_orderpriority""".stripMargin))

  // ---- 3. concurrent appends ----

  /** Four writers land disjoint quarters of the orders table
    * CONCURRENTLY (a fixed 4-thread pool, all four racing for version
    * numbers): optimistic commits mean every writer wins SOME version
    * and the final content is the union regardless of arrival order —
    * the lost-update test. The oracle is simply the whole table.
    */
  val extLakeConcurrentAppend = Q(
    "ext_lake_concurrent_append",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
      val tab = new TxTable(s, scratch("lake_conc", dir))
      tab.create(orders.where($"o_orderkey" % 4 === 0))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        val fs = (1 to 3).map { q =>
          scala.concurrent.Future(tab.append(orders.where($"o_orderkey" % 4 === q)))
        }
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(fs),
          scala.concurrent.duration.Duration(300, "s"))
      } finally pool.shutdown()
      tab.read()
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  // ---- 4. MERGE (upsert) ----

  /** The lakehouse MERGE: the table starts as the even orders; the
    * source carries the odd orders (inserts) plus every key divisible
    * by 10 with status rewritten to 'M' (updates). After the merge the
    * table is ALL orders with exactly the %10 keys updated — matched
    * rows replaced, unmatched inserted, untouched files never
    * rewritten.
    */
  val extLakeMerge = Q(
    "ext_lake_merge",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
      val tab = new TxTable(s, scratch("lake_merge", dir))
      tab.create(orders.where($"o_orderkey" % 2 === 0))
      val source = orders.where($"o_orderkey" % 2 === 1)
        .unionAll(orders.where($"o_orderkey" % 10 === 0)
          .withColumn("o_orderstatus", lit("M")))
      tab.merge(source, Seq("o_orderkey"))
      tab.read()
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
           |       CASE WHEN o_orderkey % 10 = 0 THEN 'M'
           |            ELSE o_orderstatus END AS o_orderstatus,
           |       o_totalprice
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  // ---- 5. stats-based file skipping ----

  /** Range scan through [[TxTable.readBetween]]: the table is written
    * range-partitioned on o_orderkey so files carry disjoint key ranges,
    * and the read hands Spark ONLY the files whose logged min/max
    * overlap the window (TxLogSpec asserts the pruning count; here the
    * oracle proves the pruned read loses nothing).
    */
  val extLakeSkippingScan = Q(
    "ext_lake_skipping_scan",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
      val tab = new TxTable(s, scratch("lake_skip", dir))
      tab.create(orders.repartitionByRange(8, $"o_orderkey"))
      tab.readBetween("o_orderkey", 1000L, 3000L)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM orders WHERE o_orderkey BETWEEN 1000 AND 3000
           |ORDER BY o_orderkey""".stripMargin))

  /** The native-FileIndex read path end-to-end ([[graft.lake
    * .TxFileIndex]]): a partitioned lake table read with an ORDINARY
    * `.where` — no readBetween/readEquals routing — and the planner
    * itself prunes partitions (priority IN-list) and skips files by the
    * log's min/max stats (orderkey range over range-clustered files),
    * then aggregates. The query REQUIRES, structurally, that the scan
    * is one TxFileIndex relation and that the planner's own listing
    * under the scan's filters keeps strictly fewer files than the live
    * set — a silent fallback to read-everything breaks the run, not
    * just the timing. Content is oracle-checked as usual.
    */
  val extLakeNativeScan = Q(
    "ext_lake_native_scan",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
      val tab = new TxTable(s, scratch("lake_native", dir))
      tab.create(orders.repartitionByRange(8, $"o_orderkey"),
        partitionCols = Seq("o_orderpriority"))
      val read = tab.read()
        .where($"o_orderpriority".isin("1-URGENT", "2-HIGH") &&
          $"o_orderkey" <= 3000L)
      val scans = read.queryExecution.sparkPlan.collect {
        case sc: org.apache.spark.sql.execution.FileSourceScanExec => sc
      }
      require(scans.length == 1 &&
        scans.head.relation.location.isInstanceOf[graft.lake.TxFileIndex],
        "lake read must plan as ONE native TxFileIndex scan")
      val sc = scans.head
      val kept = sc.relation.location
        .listFiles(sc.partitionFilters, sc.dataFilters).map(_.files.size).sum
      val all = sc.relation.location.listFiles(Nil, Nil).map(_.files.size).sum
      require(kept < all,
        s"planner-side pruning kept $kept of $all files — nothing pruned")
      read.groupBy($"o_orderpriority")
        .agg(count(lit(1L)).as("n"),
          sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
            .as("revenue"))
        .orderBy($"o_orderpriority")
    },
    Some("""SELECT o_orderpriority, COUNT(*) AS n,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |FROM orders
           |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
           |  AND o_orderkey <= 3000
           |GROUP BY o_orderpriority
           |ORDER BY o_orderpriority""".stripMargin))

  /** MERGE with SCHEMA EVOLUTION (Delta's autoMerge):
    * the upsert feed arrives carrying a column the target lacks
    * (`o_orderpriority`) — `merge(schemaEvolution = true)` lands the
    * widened schema, the merged keys' rows and the untouched files'
    * null-backfill in ONE commit. Final state: every third order
    * enriched with its priority, everything else null there — a
    * leaked value (bad survivor alignment) or a dropped column breaks
    * the hash.
    */
  val extLakeMergeEvolution = Q(
    "ext_lake_merge_evolution",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
      val tab = new TxTable(s, scratch("lake_mev", dir))
      tab.create(orders
        .select($"o_orderkey", $"o_custkey", $"o_totalprice"))
      val enriched = orders.where($"o_orderkey" % 3 === 0)
        .select($"o_orderkey", $"o_custkey", $"o_totalprice",
          $"o_orderpriority")
      tab.merge(enriched, Seq("o_orderkey"), schemaEvolution = true)
      tab.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice,
           |       CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority
           |            ELSE NULL END AS o_orderpriority
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** The lake as a STREAMING SOURCE ([[graft.lake.TxStreamSource]] —
    * Delta's streaming-source design): `readStream` over a TxTable
    * tails the transaction log, commit versions are the offsets, and
    * each append commit's rows arrive as one micro-batch, exactly
    * once — lost-race orphan files under `data/` are invisible because
    * batches derive from the LOG, not a directory listing. The query
    * scripts create + three appends with drains between them (so the
    * feed really arrives as multiple micro-batches, pinned in
    * TxStreamSourceSpec) and compares the sink against the whole
    * table: a duplicated, dropped, or orphan-leaked row breaks the
    * hash.
    */
  val extStreamLakeSource = Q(
    "ext_stream_lake_source",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val tab = new TxTable(s, scratch("lake_src", dir))
      tab.create(orders.where($"o_orderkey" % 4 === 0))
      val name = "stream_lake_src_" + math.abs(dir.hashCode).toString
      val q = s.readStream.format("graft.lake.TxLogStreamProvider")
        .option("path", scratch("lake_src", dir)).load()
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        q.processAllAvailable() // batch 1: the CREATE commit's rows
        tab.append(orders.where($"o_orderkey" % 4 === 1))
        q.processAllAvailable() // batch 2: one append
        tab.append(orders.where($"o_orderkey" % 4 === 2))
        tab.append(orders.where($"o_orderkey" % 4 === 3))
        q.processAllAvailable() // batch 3: two appends, one version range
      } finally q.stop()
      s.table(name).orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** The DSv2 STREAMING READ ([[graft.lake.TxMicroBatchStream]] —
    * round-12 verdict item 2): the same commit-version tailing as
    * `ext_stream_lake_source`, but through the PUBLIC connector API —
    * `readStream.format("txlog")` resolves the lake table's
    * MICRO_BATCH_READ capability, each batch is planned as native
    * FilePartitions straight from the log, and executors read the
    * committed parquet through Spark's own vectorized reader. No
    * `private[sql]` bridge anywhere on this path. Offsets are
    * byte-compatible with the V1 source (TxMicroBatchSpec pins the
    * checkpoint handover); content parity with the oracle proves the
    * file-level planning delivers exactly the appended rows.
    */
  val extStreamDsv2Source = Q(
    "ext_stream_dsv2_source",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val root = scratch("dsv2_src", dir)
      val tab = new TxTable(s, root)
      tab.create(orders.where($"o_orderkey" % 4 === 0))
      val name = "stream_dsv2_src_" + math.abs(dir.hashCode).toString
      val q = s.readStream.format("txlog")
        .option("path", root).load()
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        q.processAllAvailable() // batch 1: the CREATE commit's rows
        tab.append(orders.where($"o_orderkey" % 4 === 1))
        q.processAllAvailable() // batch 2: one append
        tab.append(orders.where($"o_orderkey" % 4 === 2))
        tab.append(orders.where($"o_orderkey" % 4 === 3))
        q.processAllAvailable() // batch 3: two versions, one range
        require(q.recentProgress.count(_.numInputRows > 0) >= 3,
          "the drains must arrive as separate micro-batches")
      } finally q.stop()
      s.table(name).orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** ADMISSION CONTROL + Trigger.AvailableNow on the DSv2 stream
    * ([[graft.lake.TxMicroBatchStream]] as SupportsAdmissionControl /
    * SupportsTriggerAvailableNow): a five-version backlog drained
    * under `maxVersionsPerTrigger = 1` — the budget walk is pure log
    * metadata (Add counts, zero filesystem stats), AvailableNow pins
    * the backlog end at prepare time, the query PACES itself through
    * ≥5 batches (REQUIREd from query progress) and terminates on its
    * own. At scale this is the difference between a new stream over a
    * long-lived table planning its entire history as one unbounded
    * batch and a paced, memory-bounded backfill. Content parity with
    * the oracle proves pacing loses and duplicates nothing.
    */
  val extStreamDsv2Paced = Q(
    "ext_stream_dsv2_paced",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val root = scratch("dsv2_paced", dir)
      val tab = new TxTable(s, root)
      tab.create(orders.where($"o_orderkey" % 5 === 0))
      (1 to 4).foreach(i =>
        tab.append(orders.where($"o_orderkey" % 5 === i)))
      val name = "stream_dsv2_paced_" + math.abs(dir.hashCode).toString
      val q = s.readStream.format("txlog")
        .option("path", root)
        .option("maxVersionsPerTrigger", "1").load()
        .writeStream.outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("memory").queryName(name).start()
      // scale-invariant ceiling (round-11 lesson: REQUIREs must not
      // encode toy-scale expectations): the drain is 5 paced memory-
      // sink batches — seconds at sf0.1, ~6 min at sf10 (measured) —
      // so the bound only catches a HUNG stream, not a big corpus
      require(q.awaitTermination(1800000),
        "AvailableNow must drain the pinned backlog and terminate")
      require(q.recentProgress.count(_.numInputRows > 0) >= 5,
        "one version per trigger: the backlog must arrive as >= 5 " +
          "paced batches, not one catch-all")
      s.table(name).orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** DSv2 lake-to-lake: BOTH streaming endpoints on the public
    * connector API ([[graft.lake.TxMicroBatchStream]] source →
    * [[graft.lake.TxStreamingWrite]] sink). Executors stage each
    * micro-batch's parquet directly (rows never touch the driver); the
    * driver's commit turns the task-reported file list into Add
    * actions — stats and all, one aggregation over just the new
    * files — under the (queryId, epochId) writer transaction, so a
    * replayed epoch is a log-enforced no-op. The destination is
    * pre-created (schema fixed), the copy runs across a drain +
    * append + drain; a duplicated epoch, dropped commit, partial
    * batch, or stats-less add breaks the hash or the REQUIRE.
    */
  val extStreamDsv2Sink = Q(
    "ext_stream_dsv2_sink",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val srcRoot = scratch("dsv2_sink_src", dir)
      val dstRoot = scratch("dsv2_sink_dst", dir)
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_dsv2_sink_ckpt").toString
      val src = new TxTable(s, srcRoot)
      src.create(orders.where($"o_orderkey" % 2 === 0))
      val dst = new TxTable(s, dstRoot)
      dst.create(orders.limit(0)) // fixed schema, empty v0
      val q = s.readStream.format("txlog")
        .option("path", srcRoot).load()
        .writeStream.format("txlog")
        .option("path", dstRoot)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        src.append(orders.where($"o_orderkey" % 2 === 1))
        q.processAllAvailable()
      } finally q.stop()
      val fs = new org.apache.hadoop.fs.Path(dstRoot).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      val snap = graft.lake.TxLog.snapshot(fs,
        new org.apache.hadoop.fs.Path(dstRoot))
      require(snap.txns.keys.exists(_.startsWith("dsv2:")),
        "the destination's commits must carry the DSv2 " +
          "(queryId, epochId) writer transaction")
      require(snap.adds.forall(a =>
          a.stats.nonEmpty && a.bytes.exists(_ > 0L)),
        "executor-staged files must land with full stats/bytes — " +
          "file skipping on a streamed-into table must work like any " +
          "other")
      dst.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** The production composition: WATERMARKED WINDOWED AGGREGATION →
    * DSv2 LAKE SINK. A file-fed event stream folds into tumbling
    * 5-minute per-type windows (1-hour watermark, append mode — only
    * FINALIZED windows ever emit), and each emission lands as one
    * atomic txlog commit through [[graft.lake.TxStreamingWrite]] —
    * stateful streaming (Spark's own state store) fused with the
    * lake's exactly-once commit protocol, the events→aggregates→table
    * loop a training-data pipeline runs continuously. Rows go executor
    * state-store → executor parquet; the driver commits metadata. The
    * oracle reproduces the finalized-window set relationally
    * (time_bucket + the watermark cutoff).
    */
  val extStreamWindowLakeSink = Q(
    "ext_stream_window_lake_sink",
    (s, dir) => {
      import s.implicits._
      val root = scratch("window_lake_sink", dir)
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_wls_ckpt").toString
      // destination pre-created with the windowed schema (the DSv2
      // write's contract — the table IS the schema authority)
      val dst = new TxTable(s, root)
      dst.create(s.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("window_start",
            org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("window_end",
            org.apache.spark.sql.types.TimestampType),
          org.apache.spark.sql.types.StructField("event_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_events",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("sum_value",
            org.apache.spark.sql.types.DoubleType)))))
      val result = graft.streaming.StreamOps.runToLakeSink(
        s, ExtQueries.streamSourceDir(dir, "lakewindow"),
        ExtQueries.eventsStreamSchema(s, dir),
        df => graft.streaming.StreamOps.windowedEventCounts(
            ExtQueries.normalizeStreamTs(df), "5 minutes", "1 hour")
          .select(col("window.start").as("window_start"),
            col("window.end").as("window_end"),
            col("event_type"), col("n_events"),
            col("sum_value").cast("double").as("sum_value")),
        root, ckpt, statePartitions = Some(8))
      result.orderBy($"window_start", $"event_type")
    },
    Some("""WITH ev AS (
           |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, value
           |  FROM events),
           |wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM ev)
           |SELECT window_start, window_start + INTERVAL 5 MINUTE AS window_end,
           |       event_type, n_events, sum_value
           |FROM (
           |  SELECT time_bucket(INTERVAL 5 MINUTE, ts) AS window_start,
           |         event_type, COUNT(*) AS n_events,
           |         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
           |  FROM ev GROUP BY 1, 2)
           |WHERE window_start + INTERVAL 5 MINUTE <= (SELECT w FROM wm)
           |ORDER BY window_start, event_type""".stripMargin))

  /** Predicate-scoped atomic OVERWRITE ([[graft.lake.TxTable
    * .replaceWhere]], Delta's `replaceWhere`): the idempotent-backfill
    * primitive — one slice of the table is recomputed and replaced in
    * ONE commit (ledger REQUIREd: exactly one REPLACE_WHERE, never a
    * delete+append pair with a window where readers see neither), a
    * stray row outside the slice refuses with nothing committed, and
    * the V1 `option("replaceWhere")` write route lands a second slice.
    * The oracle reconstructs the final table relationally: survivors
    * verbatim, the 'O' slice re-priced ×2, the 'F' slice re-priced ×3 —
    * a leaked old row, a lost survivor, or an out-of-scope landing
    * breaks the hash.
    */
  val extLakeReplaceWhere = Q(
    "ext_lake_replace_where",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      val root = scratch("lake_rw", dir)
      val tab = new TxTable(s, root)
      tab.create(orders.repartition(4))
      // programmatic route: recompute and replace the 'O' slice
      tab.replaceWhere($"o_orderstatus" === "O",
        orders.where($"o_orderstatus" === "O")
          .withColumn("o_totalprice", $"o_totalprice" * 2))
      val ops1 = tab.history().orderBy($"version")
        .select($"op").as[String].collect().toSeq
      require(ops1 == Seq("CREATE", "REPLACE_WHERE"),
        s"replaceWhere must be ONE atomic commit, got $ops1")
      // a stray row outside the slice refuses, committing nothing
      val refused =
        try {
          tab.replaceWhere($"o_orderstatus" === "P",
            orders.limit(1).withColumn("o_orderstatus", lit("F")))
          false
        } catch { case _: IllegalArgumentException => true }
      require(refused, "out-of-scope rows must refuse")
      require(tab.history().count() == 2,
        "the refused replace must commit nothing")
      // V1 option route: re-price the 'F' slice through the writer API
      orders.where($"o_orderstatus" === "F")
        .withColumn("o_totalprice", $"o_totalprice" * 3)
        .write.format("txlog").mode("overwrite")
        .option("replaceWhere", "o_orderstatus = 'F'")
        .option("path", root).save()
      tab.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderstatus,
           |       CASE WHEN o_orderstatus = 'O' THEN o_totalprice * 2
           |            WHEN o_orderstatus = 'F' THEN o_totalprice * 3
           |            ELSE o_totalprice END AS o_totalprice
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** EXECUTOR-SIDE CONSTRAINTS on the DSv2 streaming write
    * ([[graft.lake.TxStreamingWrite]]): the destination carries a
    * CHECK and a NOT NULL; a clean backlog streams in (landing
    * REQUIREd), then two poisoned feeds — a NULL in the NOT NULL
    * column, a CHECK-violating value — each fail their epoch
    * executor-side with ZERO rows committed (count + commit-ledger
    * REQUIREd after each). The emitted rows are the destination, which
    * the oracle reconstructs as exactly the clean slice — enforcement
    * leaking a poisoned row (or refusing a clean one) breaks the hash.
    */
  val extStreamDsv2Constraint = Q(
    "ext_stream_dsv2_constraint",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val dstRoot = scratch("dsv2_cons_dst", dir)
      val dst = new TxTable(s, dstRoot)
      dst.create(orders.limit(0))
      dst.addConstraint("o_totalprice >= 0")
      dst.addNotNull("o_orderstatus")
      def streamIn(srcRoot: String): Unit = {
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft_dsv2_cons_ckpt").toString
        val q = s.readStream.format("txlog")
          .option("path", srcRoot).load()
          .writeStream.format("txlog")
          .option("path", dstRoot)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      def refusedWith(srcRoot: String, needle: String): Boolean =
        try { streamIn(srcRoot); false }
        catch { case e: Exception =>
          Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
            .take(8).exists(t => Option(t.getMessage)
              .exists(_.contains(needle)))
        }
      // clean backlog lands
      val cleanRoot = scratch("dsv2_cons_clean", dir)
      new TxTable(s, cleanRoot)
        .create(orders.where($"o_orderkey" % 2 === 0))
      streamIn(cleanRoot)
      val landed = dst.read().count()
      require(landed > 0, "the clean backlog must land")
      val commits = dst.history().count()
      // NULL in the NOT NULL column: epoch fails, nothing commits
      val nullRoot = scratch("dsv2_cons_null", dir)
      new TxTable(s, nullRoot).create(
        orders.where($"o_orderkey" % 2 === 1).limit(5)
          .withColumn("o_orderstatus",
            org.apache.spark.sql.functions.lit(null).cast("string")))
      require(refusedWith(nullRoot, "violates NOT NULL"),
        "a NULL in a NOT NULL column must fail the epoch executor-side")
      // CHECK violation: same contract
      val badRoot = scratch("dsv2_cons_bad", dir)
      new TxTable(s, badRoot).create(
        orders.where($"o_orderkey" % 2 === 1).limit(5)
          .withColumn("o_totalprice",
            -org.apache.spark.sql.functions.abs($"o_totalprice")))
      require(refusedWith(badRoot, "violates CHECK"),
        "a CHECK-violating row must fail the epoch executor-side")
      require(dst.read().count() == landed,
        "poisoned epochs must not land a single row")
      require(dst.history().count() == commits,
        "poisoned epochs must not claim a commit")
      dst.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
           |FROM orders WHERE o_orderkey % 2 = 0
           |ORDER BY o_orderkey""".stripMargin))

  /** ROW-REWRITING features on the DSv2 streaming write
    * ([[graft.lake.TxStreamingWrite]]): the destination carries a
    * GENERATED column that is also its PARTITION column, a DEFAULT
    * column the stream never supplies, and an IDENTITY column — all
    * applied EXECUTOR-side by one codegen'd append projection (the
    * identity start re-read from the logged watermark each epoch).
    * Two epochs stream in; REQUIREs pin identity uniqueness across
    * epochs, the post-commit watermark bump, and the generated
    * partition dirs on disk. The oracle reconstructs every
    * deterministic column (keys, generated value, default fill) — a
    * wrong generated value, missed default, or misrouted partition
    * breaks the hash; identity (engine-nondeterministic by nature) is
    * pinned by the REQUIREs instead.
    */
  val extStreamDsv2Rewrite = Q(
    "ext_stream_dsv2_rewrite",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val dstRoot = scratch("dsv2_rw_dst", dir)
      val dst = new TxTable(s, dstRoot)
      dst.create(orders.limit(0) // empty seed fixes the default's type
          .withColumn("status", org.apache.spark.sql.functions
            .lit("SEED")),
        partitionCols = Seq("bucket"),
        generatedColumns =
          Map("bucket" -> "CAST(o_orderkey % 4 AS STRING)"),
        identityColumns = Seq("sn"),
        defaultValues = Map("status" -> "'NEW'"))
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_dsv2_rw_ckpt").toString
      val srcRoot = scratch("dsv2_rw_src", dir)
      val src = new TxTable(s, srcRoot)
      src.create(orders.where($"o_orderkey" % 2 === 0))
      def drain(): Unit = {
        val q = s.readStream.format("txlog")
          .option("path", srcRoot).load()
          .writeStream.format("txlog")
          .option("path", dstRoot)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      drain()
      src.append(orders.where($"o_orderkey" % 2 === 1))
      drain() // second epoch: allocates past the bumped watermark
      val out = dst.read()
      val sns = out.select($"sn").as[Long].collect()
      require(sns.length == sns.distinct.length,
        "identity values must stay unique across epochs")
      val fs = new org.apache.hadoop.fs.Path(dstRoot).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      val meta = graft.lake.TxLog.snapshot(fs,
        new org.apache.hadoop.fs.Path(dstRoot)).meta
      require(meta.identities("sn") > sns.max,
        "each epoch's commit must bump the identity watermark")
      require(graft.lake.TxLog.snapshot(fs,
          new org.apache.hadoop.fs.Path(dstRoot)).adds
          .map(_.partitionValues("bucket")).toSet ==
        Set("0", "1", "2", "3"),
        "the GENERATED partition column must route real dirs")
      out.select($"o_orderkey", $"o_custkey", $"o_totalprice",
        $"bucket", $"status").orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice,
           |       CAST(o_orderkey % 4 AS VARCHAR) AS bucket,
           |       'NEW' AS status
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** ROW TRACKING on the DSv2 streaming sink
    * ([[graft.lake.TxStreamingWrite]], round-13 verdict item 4 — the
    * last feature that refused toward V1): `writeStream` onto a
    * row-tracked table allocates `_row_id`s per EPOCH from the logged
    * watermark (the identity-column pattern: the factory re-reads the
    * watermark each epoch, the commit's staged stats bump it), the ids
    * never enter the logical schema, and lineage holds — each streamed
    * commit's change-feed slice carries exactly the ids the live table
    * shows for its rows, keyed by `_commit_version`. Concrete id
    * values are layout-dependent, so REQUIREs pin global uniqueness,
    * seed-id stability, and the watermark bump; the hashed output
    * carries each streamed row's epoch (from the feed's commit
    * version) and its feed-vs-live id consistency.
    */
  val extStreamDsv2RowTracking = Q(
    "ext_stream_dsv2_row_tracking",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val dstRoot = scratch("dsv2_trk_dst", dir)
      val dst = new TxTable(s, dstRoot)
      dst.create(orders.where($"o_orderkey" % 7 === 0),
        enableRowTracking = true)                            // v0 seed
      val seedIds = dst.readWithRowIds().select($"_row_id")
        .as[Long].collect().toSet
      val srcRoot = scratch("dsv2_trk_src", dir)
      val src = new TxTable(s, srcRoot)
      src.create(orders.where($"o_orderkey" % 7 === 1))
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_dsv2_trk_ckpt").toString
      def drain(): Unit = {
        val q = s.readStream.format("txlog")
          .option("path", srcRoot).load()
          .writeStream.format("txlog")
          .option("path", dstRoot)
          .option("checkpointLocation", ckpt)
          .outputMode("append").start()
        try q.processAllAvailable() finally q.stop()
      }
      drain()
      val vEpoch1 = dst.version
      src.append(orders.where($"o_orderkey" % 7 === 2))
      drain() // second epoch: allocates past the bumped watermark
      val vEpoch2 = dst.version
      val live = dst.readWithRowIds()
        .select($"o_orderkey", $"_row_id".as("live_id"))
      val liveIds = live.select($"live_id").as[Long].collect()
      require(liveIds.length == liveIds.distinct.length,
        "row ids must stay unique across seed + streamed epochs")
      require(seedIds.subsetOf(liveIds.toSet),
        "streaming in must not disturb the seed rows' ids")
      val fs = new org.apache.hadoop.fs.Path(dstRoot).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      val meta = graft.lake.TxLog.snapshot(fs,
        new org.apache.hadoop.fs.Path(dstRoot)).meta
      require(meta.nextRowId > liveIds.max,
        "each epoch's commit must bump the row-id watermark")
      // commit-version lineage: the streamed commits' feed slices
      // carry the same ids the live table shows, per commit
      val feed = dst.readChanges(vEpoch1, vEpoch2, withRowIds = true)
        .where($"_change_type" === "insert")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice",
          $"_row_id".as("feed_id"), $"_commit_version")
      feed.join(live, Seq("o_orderkey"))
        .select($"o_orderkey", $"o_custkey", $"o_totalprice",
          when($"_commit_version" === vEpoch1, 1)
            .otherwise(2).as("epoch"),
          ($"feed_id" === $"live_id").as("id_consistent"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice,
           |       CASE WHEN o_orderkey % 7 = 1 THEN 1 ELSE 2 END AS epoch,
           |       TRUE AS id_consistent
           |FROM orders WHERE o_orderkey % 7 IN (1, 2)
           |ORDER BY o_orderkey""".stripMargin))

  /** The lake as a STREAMING SINK ([[graft.lake.TxStreamSink]] —
    * Delta's DeltaSink shape): a lake-to-lake copy wired PURELY
    * through formats (`readStream.format("txlog-stream")` →
    * `writeStream.format("txlog-stream")`), no foreachBatch — every
    * micro-batch lands as one atomic append commit under the
    * (appId, batchId) writer-transaction watermark, so replays are
    * log-enforced no-ops. The query scripts create + append with a
    * drain between, then compares the DESTINATION table against the
    * source's relational content: a duplicated batch (broken
    * watermark), dropped commit, or partial batch breaks the hash.
    */
  val extStreamLakeSink = Q(
    "ext_stream_lake_sink",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val srcRoot = scratch("lake_sink_src", dir)
      val dstRoot = scratch("lake_sink_dst", dir)
      val ckpt = java.nio.file.Files
        .createTempDirectory("graft_sink_ckpt").toString
      // the checkpoint is per-run but the scratch DESTINATION persists
      // across runs — wipe it so the sink's first batch creates fresh
      val dstP = new org.apache.hadoop.fs.Path(dstRoot)
      dstP.getFileSystem(s.sparkContext.hadoopConfiguration)
        .delete(dstP, true)
      val src = new TxTable(s, srcRoot)
      src.create(orders.where($"o_orderkey" % 2 === 0))
      val q = s.readStream.format("graft.lake.TxLogStreamProvider")
        .option("path", srcRoot).load()
        .writeStream.format("graft.lake.TxLogStreamProvider")
        .option("path", dstRoot)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        src.append(orders.where($"o_orderkey" % 2 === 1))
        q.processAllAvailable()
      } finally q.stop()
      new TxTable(s, dstRoot).read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** LAKE→LAKE STREAMING MEDALLION: bronze TxTable as the streaming
    * SOURCE ([[graft.lake.TxStreamSource]]), a per-customer running
    * aggregate maintained INCREMENTALLY in foreachBatch, MERGEd into a
    * silver TxTable under the batch-id writer transaction — the whole
    * production loop (stream the lake, fold the delta, commit
    * atomically, exactly-once across replays) in one oracle-checked
    * query. Each micro-batch costs one keyed aggregation of the BATCH
    * plus a merge touching only affected keys' files; the silver table
    * is never recomputed. Final silver must equal the batch aggregate
    * over all of bronze — a double-applied batch (broken idempotence),
    * missed version, or drifted decimal fold breaks the hash.
    */
  val extStreamLakeToLake = Q(
    "ext_stream_lake_to_lake",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val bronzeDir = scratch("l2l_bronze", dir)
      val silverDir = scratch("l2l_silver", dir)
      val bronze = new TxTable(s, bronzeDir)
      bronze.create(orders.where($"o_orderkey" % 4 === 0))
      val silver = new TxTable(s, silverDir)
      silver.create(s.createDataFrame(
        java.util.Collections.emptyList[Row](),
        StructType(Seq(
          StructField("o_custkey", LongType),
          StructField("n_orders", LongType),
          StructField("revenue", DecimalType(18, 2))))))
      val q = s.readStream.format("graft.lake.TxLogStreamProvider")
        .option("path", bronzeDir).load()
        .writeStream.outputMode("append")
        .foreachBatch { (batch: DataFrame, id: Long) =>
          val delta = batch.groupBy($"o_custkey")
            .agg(count(lit(1L)).as("d_n"),
              sum($"o_totalprice".cast("decimal(18,2)")).as("d_rev"))
          val merged = delta.join(silver.read(), Seq("o_custkey"), "left")
            .select($"o_custkey",
              ($"d_n" + coalesce($"n_orders", lit(0L))).as("n_orders"),
              ($"d_rev" + coalesce($"revenue",
                lit(0).cast("decimal(18,2)")))
                .cast("decimal(18,2)").as("revenue"))
          silver.merge(merged, Seq("o_custkey"),
            txn = Some(("l2l_silver", id)))
          ()
        }.start()
      try {
        q.processAllAvailable() // batch: the CREATE quarter
        bronze.append(orders.where($"o_orderkey" % 4 === 1))
        q.processAllAvailable()
        bronze.append(orders.where($"o_orderkey" % 4 === 2))
        bronze.append(orders.where($"o_orderkey" % 4 === 3))
        q.processAllAvailable()
      } finally q.stop()
      silver.read()
        .select($"o_custkey", $"n_orders",
          $"revenue".cast("double").as("revenue"))
        .orderBy($"o_custkey")
    },
    Some("""SELECT o_custkey, COUNT(*) AS n_orders,
           |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin))

  /** CHANGE-DATA-FEED STREAMING (Delta's `readChangeFeed`): the stream
    * source's CDF mode makes a table under DELETE/UPDATE streamable —
    * each micro-batch delivers the version range's row-level change
    * pairs (`_change_type`, `_commit_version`) instead of refusing the
    * rewrite. The scripted history covers all four source paths: an
    * uncaptured CREATE (file-level fallback), a captured append, an
    * UPDATE (update_preimage/update_postimage pair per matched row —
    * Delta's four change types), a copy-on-write DELETE — and on the
    * captured commits the
    * batch reads only `_change_data` files, never table data (the spec
    * pins that). The oracle reconstructs the exact feed, version tags
    * included: a survivor row leaking into a batch (the file-diff
    * failure mode capture exists to avoid), a lost pre-image, or a
    * misnumbered version breaks the hash.
    */
  val extStreamCdf = Q(
    "ext_stream_cdf",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val rootDir = scratch("stream_cdf", dir)
      val tab = new TxTable(s, rootDir)
      tab.create(orders.where($"o_orderkey" % 4 === 0))   // v0
      tab.enableChangeDataFeed()                          // v1
      val name = "stream_cdf_" + math.abs(dir.hashCode).toString
      val q = s.readStream.format("txlog")
        .option("path", rootDir)
        .option("readChangeFeed", "true").load()
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        q.processAllAvailable() // batch: v0 inserts (+ empty v1)
        tab.append(orders.where($"o_orderkey" % 4 === 1)) // v2
        q.processAllAvailable() // batch: captured append inserts
        tab.update($"o_orderkey" % 8 === 1,               // v3
          Map("o_orderstatus" -> lit("X")))
        tab.deleteWhere($"o_totalprice" < 50000.0)        // v4
        q.processAllAvailable() // batch: update pairs + delete rows
      } finally q.stop()
      s.table(name)
        .orderBy($"_commit_version", $"_change_type", $"o_orderkey")
    },
    Some("""WITH base AS (
           |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
           |  FROM orders
           |), feed AS (
           |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |         'insert' AS _change_type,
           |         CAST(0 AS BIGINT) AS _commit_version
           |  FROM base WHERE o_orderkey % 4 = 0
           |  UNION ALL
           |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |         'insert', CAST(2 AS BIGINT)
           |  FROM base WHERE o_orderkey % 4 = 1
           |  UNION ALL
           |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
           |         'update_preimage', CAST(3 AS BIGINT)
           |  FROM base WHERE o_orderkey % 8 = 1
           |  UNION ALL
           |  SELECT o_orderkey, o_custkey, 'X', o_totalprice,
           |         'update_postimage', CAST(3 AS BIGINT)
           |  FROM base WHERE o_orderkey % 8 = 1
           |  UNION ALL
           |  SELECT o_orderkey, o_custkey,
           |         CASE WHEN o_orderkey % 8 = 1 THEN 'X'
           |              ELSE o_orderstatus END,
           |         o_totalprice, 'delete', CAST(4 AS BIGINT)
           |  FROM base
           |  WHERE o_orderkey % 4 IN (0, 1) AND o_totalprice < 50000
           |)
           |SELECT * FROM feed
           |ORDER BY _commit_version, _change_type, o_orderkey""".stripMargin))

  /** CDF STREAM → applyChanges: the production replica loop. A
    * downstream TxTable is maintained PURELY from the upstream's
    * streamed change feed — foreachBatch folds each version's slice in
    * ascending order (applyChanges collapses a same-key delete+insert
    * pair to the insert, so cross-version slices must apply per
    * version), touching only files holding affected keys; the upstream
    * is never re-read and the replica never recomputed. After appends,
    * an update and a delete, the replica must equal the upstream's
    * final state exactly — a missed version, a survivor leak, or
    * deletes applied out of order breaks the hash. Re-applied slices
    * (a restart replay) are content-idempotent: keyed deletes of
    * absent keys and upserts of identical rows change nothing.
    */
  val extStreamCdfApply = Q(
    "ext_stream_cdf_apply",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val upDir = scratch("cdf_apply_up", dir)
      val downDir = scratch("cdf_apply_down", dir)
      val up = new TxTable(s, upDir)
      up.create(orders.where($"o_orderkey" % 4 === 0))    // v0
      up.enableChangeDataFeed()                           // v1
      val down = new TxTable(s, downDir)
      down.create(s.createDataFrame(
        java.util.Collections.emptyList[Row](),
        StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_custkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("o_totalprice", DoubleType)))))
      val q = s.readStream.format("txlog")
        .option("path", upDir).option("readChangeFeed", "true").load()
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val cached = batch.cache()
          try {
            val versions = cached.select($"_commit_version").distinct()
              .as[Long].collect().sorted
            versions.foreach { v =>
              down.applyChanges(
                cached.where($"_commit_version" === v),
                Seq("o_orderkey")): Unit
            }
          } finally { cached.unpersist(); () }
        }.start()
      try {
        q.processAllAvailable() // v0 inserts seed the replica
        up.append(orders.where($"o_orderkey" % 4 === 1))  // v2
        q.processAllAvailable()
        up.update($"o_orderkey" % 8 === 1,                // v3
          Map("o_orderstatus" -> lit("X")))
        up.deleteWhere($"o_totalprice" < 50000.0)         // v4
        q.processAllAvailable() // one batch, two versions, order matters
      } finally q.stop()
      down.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
           |       CASE WHEN o_orderkey % 8 = 1 THEN 'X'
           |            ELSE o_orderstatus END AS o_orderstatus,
           |       o_totalprice
           |FROM orders
           |WHERE o_orderkey % 4 IN (0, 1) AND o_totalprice >= 50000
           |ORDER BY o_orderkey""".stripMargin))

  /** GENERATED COLUMNS (Delta's GENERATED ALWAYS AS): `o_year` is
    * declared as `year(o_orderdate)` at CREATE and the table partitions
    * by it — the classic derived-date layout. Writers never supply it:
    * create and append both COMPUTE it, and a filter on the generated
    * column partition-prunes via the log's own values (asserted in the
    * query: the 1995 read plans a strict subset of live files). The
    * oracle re-derives the column relationally — a writer-side drift
    * between expression and stored value, or a pruned-away row, breaks
    * the hash. Validation/refusal behavior (a lying writer, UPDATE on
    * the source column) is GeneratedColumnsSpec's job.
    */
  val extLakeGeneratedCol = Q(
    "ext_lake_generated_col",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice",
          $"o_orderdate")
      val tab = new TxTable(s, scratch("lake_gencol", dir))
      tab.create(orders.where($"o_orderkey" % 2 === 0),
        partitionCols = Seq("o_year"),
        generatedColumns = Map("o_year" -> "year(o_orderdate)"))
      tab.append(orders.where($"o_orderkey" % 2 === 1))
      val fs = new org.apache.hadoop.fs.Path(scratch("lake_gencol", dir))
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val snap = graft.lake.TxLog.snapshot(fs,
        new org.apache.hadoop.fs.Path(scratch("lake_gencol", dir)))
      val kept = tab.candidateFiles(snap, "o_year", 1995, 1995)
      require(kept.nonEmpty && kept.size < snap.adds.size,
        s"generated-column partition pruning failed: " +
          s"kept ${kept.size}/${snap.adds.size}")
      tab.read().where($"o_year" === 1995).orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate,
           |       CAST(year(o_orderdate) AS INT) AS o_year
           |FROM orders
           |WHERE year(o_orderdate) = 1995
           |ORDER BY o_orderkey""".stripMargin))

  // ---- 6. streaming MERGE into the ACID table ----

  /** Streaming lakehouse ingestion: an upsert feed arrives as a file
    * stream (one micro-batch per file) and foreachBatch MERGEs each
    * batch into a TxTable — every micro-batch is one atomic commit, so
    * a reader mid-stream sees a consistent prefix of batches, never a
    * torn one (the property the parquet-overwrite variant
    * ext_stream_cdc_apply cannot give). Batch 0 carries keys ≡0 (mod
    * 3); batch 1 the ≡1 keys plus every %10 key re-statused 'U1';
    * batch 2 the ≡2 keys (minus %10 — those already upserted) plus
    * every %20 key as 'U2' —
    * later batches override earlier ones per key, so the final table
    * is the whole orders set with exactly the %10/%20 cascade applied.
    * Feed, table and checkpoint live under a per-invocation unique key
    * and are removed on the way out (result materialized first).
    */
  val extStreamLakeIngest = Q(
    "ext_stream_lake_ingest",
    (s, dir) => {
      import s.implicits._
      import org.apache.spark.sql.types._
      import scala.jdk.CollectionConverters._
      val key = java.util.UUID.randomUUID().toString.take(8)
      val tmp = System.getProperty("java.io.tmpdir", "/tmp")
      val feedDir = java.nio.file.Paths.get(tmp, "graft_lake_feed", key)
      val tabDir = java.nio.file.Paths.get(tmp, "graft_lake_ingest", key)
      val ckpt = java.nio.file.Paths.get(tmp, "graft_lake_ckpt", key)
      def rmTree(p: java.nio.file.Path): Unit =
        if (java.nio.file.Files.exists(p)) {
          val walk = java.nio.file.Files.walk(p)
          val paths =
            try walk.iterator().asScala.toSeq.reverse
            finally walk.close()
          paths.foreach(java.nio.file.Files.delete)
        }
      try {
        java.nio.file.Files.createDirectories(feedDir)
        val orders = t(s, dir, "orders")
          .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        val slices = Seq(
          orders.where($"o_orderkey" % 3 === 0),
          orders.where($"o_orderkey" % 3 === 1 && $"o_orderkey" % 10 =!= 0)
            .unionAll(orders.where($"o_orderkey" % 10 === 0)
              .withColumn("o_orderstatus", lit("U1"))),
          orders.where($"o_orderkey" % 3 === 2 && $"o_orderkey" % 10 =!= 0)
            .unionAll(orders.where($"o_orderkey" % 20 === 0)
              .withColumn("o_orderstatus", lit("U2"))))
        slices.zipWithIndex.foreach { case (slice, i) =>
          val stage = feedDir.resolve(s"_stage_$i")
          slice.coalesce(1).write.mode("overwrite").parquet(stage.toString)
          val listing = java.nio.file.Files.list(stage)
          val part =
            try listing.iterator().asScala
              .find(_.getFileName.toString.endsWith(".parquet"))
              .getOrElse(sys.error(s"no part file in $stage"))
            finally listing.close()
          java.nio.file.Files.move(part, feedDir.resolve(s"ups_$i.parquet"),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          rmTree(stage)
        }
        val tab = new TxTable(s, tabDir.toString)
        tab.create(orders.limit(0))
        val schema = StructType(Seq(
          StructField("o_orderkey", LongType),
          StructField("o_orderstatus", StringType),
          StructField("o_totalprice", DoubleType)))
        val stream = s.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(feedDir.toString)
        val q = stream.writeStream
          .option("checkpointLocation", ckpt.toString)
          .foreachBatch {
            (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                id: Long) =>
              // the batch id is the txn watermark: a micro-batch
              // replayed after checkpoint loss commits as a log-level
              // no-op instead of relying on merge's key-idempotence
              tab.merge(batch.toDF(), Seq("o_orderkey"),
                txn = Some(("stream_lake_ingest", id))); ()
          }
          .start()
        try q.processAllAvailable() finally q.stop()
        tab.read()
          .orderBy($"o_orderkey")
          .localCheckpoint(true)
      } finally {
        rmTree(feedDir); rmTree(tabDir); rmTree(ckpt)
      }
    },
    Some("""SELECT o_orderkey,
           |       CASE WHEN o_orderkey % 20 = 0 THEN 'U2'
           |            WHEN o_orderkey % 10 = 0 THEN 'U1'
           |            ELSE o_orderstatus END AS o_orderstatus,
           |       o_totalprice
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  // ---- 7. the medallion writing through the ACID lake ----

  /** The reference's tables actually live on Delta
    * (spark/conf/spark-defaults.conf:14); `EtlContext(dataFormat =
    * "txlog")` runs the SAME TableEtl lifecycle with the transaction
    * log as storage: first load creates the table, each later load is
    * one atomic partition-overwrite commit, the latest-load read comes
    * from log metadata (no directory listing) and a partition-pinned
    * read selects by value. Two region loads under different fixed
    * clocks (newer a strict subset), then the head read (must see ONLY
    * the newer 3-row load) unioned with the older-pinned read (the
    * full 5 rows) — recency and pinning both served by the log.
    */
  val pipelineLakeMedallion = Q(
    "pipeline_lake_medallion",
    (s, dir) => {
      import graft.core.FixedClock
      import graft.layers.{BronzeNode, EtlContext}
      import graft.sources.{InMemorySource, ParquetSource}
      import java.sql.Timestamp
      import java.time.Instant
      val safe = dir.replaceAll("[^A-Za-z0-9]", "_")
      val base = s"${System.getProperty("java.io.tmpdir", "/tmp")}" +
        s"/graft_lake_medallion/$safe"
      val older =
        FixedClock(Timestamp.from(Instant.parse("2026-03-01T00:00:00Z")))
      val newer =
        FixedClock(Timestamp.from(Instant.parse("2026-03-02T00:00:00Z")))
      def regionNode(clock: FixedClock, src: graft.sources.UpstreamSource) =
        new BronzeNode(
          EtlContext(s, src, base, dataFormat = "txlog", clock = clock),
          "region", "region", Seq("r_regionkey"),
          Seq("r_regionkey", "r_name"))
      regionNode(older, ParquetSource(dir)).run()
      val subset = s.read.parquet(s"$dir/region.parquet")
        .where(col("r_regionkey") < 3)
      val n2 = regionNode(newer, InMemorySource(Map("region" -> subset)))
      n2.run()
      val head = n2.read().data
        .withColumn("load_tag", lit("head"))
      val pinned = n2.read(Map("etl_inserted" -> "2026-03-01 00:00:00")).data
        .withColumn("load_tag", lit("pinned"))
      head.unionAll(pinned)
        .select(col("load_tag"), col("r_regionkey"), col("r_name"),
          col("etl_inserted"))
        .orderBy(col("load_tag"), col("r_regionkey"))
    },
    Some("""SELECT 'head' AS load_tag, r_regionkey, r_name,
           |       TIMESTAMP '2026-03-02 00:00:00' AS etl_inserted
           |FROM region WHERE r_regionkey < 3
           |UNION ALL
           |SELECT 'pinned', r_regionkey, r_name,
           |       TIMESTAMP '2026-03-01 00:00:00'
           |FROM region
           |ORDER BY load_tag, r_regionkey""".stripMargin))

  // ---- 8. OPTIMIZE (log-native small-file compaction) ----

  /** Four per-quarter appends land four small file sets; OPTIMIZE
    * bin-packs them in one atomic commit (readers undisturbed,
    * pre-optimize versions still travel). Content must be lossless —
    * the oracle is the whole table; the file-count drop and version
    * history are TxLogSpec's half (DuckDB cannot see the layout).
    */
  val extLakeOptimize = Q(
    "ext_lake_optimize",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val tab = new TxTable(s, scratch("lake_opt", dir))
      tab.create(orders.where($"o_orderkey" % 4 === 0))
      (1 to 3).foreach(q => tab.append(orders.where($"o_orderkey" % 4 === q)))
      tab.optimize()
      tab.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  // ---- 9. DESCRIBE HISTORY ----

  /** The table's commit history as data: operation sequence, each
    * writer's base (read) version, and the commit-stamped operation
    * metrics (Delta's operationMetrics) — from pure log metadata. The
    * scripted create→append→merge→delete sequence makes the expected
    * rows a literal table; both writes land as ONE file each
    * (repartition(1)) so the per-commit ROW totals and REMOVED-file
    * counts are layout-pinned too (added-FILE counts track write
    * parallelism and stay out of the oracle).
    */
  val extLakeHistory = Q(
    "ext_lake_history",
    (s, dir) => {
      import s.implicits._
      val region = t(s, dir, "region")
      val tab = new TxTable(s, scratch("lake_hist", dir))
      tab.create(region.where($"r_regionkey" < 3).repartition(1))
      tab.append(region.where($"r_regionkey" >= 3).repartition(1))
      tab.merge(region.where($"r_regionkey" === 0)
        .withColumn("r_name", lit("PATCHED")), Seq("r_regionkey"))
      tab.deleteWhere($"r_regionkey" === 4)
      // timestamp_ms is wall clock — real but non-reproducible, so the
      // oracle row keeps the deterministic ledger columns only
      tab.history().drop("timestamp_ms")
        .withColumn("rows_written",
          $"operation_metrics".getItem("numOutputRows"))
        .withColumn("files_removed",
          $"operation_metrics".getItem("numRemovedFiles"))
        .drop("operation_metrics")
        .orderBy($"version")
    },
    Some("""SELECT * FROM (VALUES
           |  (CAST(0 AS BIGINT), 'CREATE', CAST(-1 AS BIGINT),
           |   CAST(3 AS BIGINT), CAST(0 AS BIGINT)),
           |  (1, 'APPEND', 0, 2, 0),
           |  (2, 'MERGE', 1, 3, 1),
           |  (3, 'DELETE', 2, 1, 1))
           |AS t(version, op, read_version, rows_written, files_removed)
           |ORDER BY version""".stripMargin))

  // ---- 10. OPTIMIZE ZORDER BY ----

  /** OPTIMIZE ZORDER BY through the log: events land scattered (every
    * file spans the full user and day ranges — stats skip nothing),
    * one z-order optimize re-clusters along the (user_id, day) Morton
    * curve, and the single-user read is served by [[TxTable
    * .readBetween]] over the files whose logged min/max survive. The
    * oracle proves the pruned read loses no row; the 2-D pruning factor
    * itself is TxLogSpec's half.
    */
  val extLakeZorderScan = Q(
    "ext_lake_zorder_scan",
    (s, dir) => {
      import s.implicits._
      val ev = t(s, dir, "events")
        .withColumn("day", dayofmonth($"ts").cast("long"))
        .select($"event_id", $"user_id", $"day", $"value")
      val tab = new TxTable(s, scratch("lake_zorder", dir))
      tab.create(ev.repartition(8))
      tab.optimize(zorderBy = Some(("user_id", "day")), zPartitions = 8)
      tab.readBetween("user_id", 3L, 3L).orderBy($"event_id")
    },
    Some("""SELECT event_id, user_id,
           |       CAST(EXTRACT(day FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS day,
           |       value
           |FROM events WHERE user_id = 3 ORDER BY event_id""".stripMargin))

  // ---- 11. shallow CLONE ----

  /** Shallow clone + divergence: the clone is created zero-copy (its
    * log references the source's files), then a destructive delete runs
    * ON THE CLONE ONLY. Per-priority totals from both tables: the
    * source must still show the full corpus, the clone the filtered one
    * — proving copy-on-write isolation with no bytes duplicated (the
    * zero-data-files half is TxLogSpec's).
    */
  val extLakeClone = Q(
    "ext_lake_clone",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
      val tab = new TxTable(s, scratch("lake_clone_src", dir))
      tab.create(orders)
      val clone = tab.cloneTo(scratch("lake_clone_dst", dir))
      clone.deleteWhere($"o_totalprice" < 100000.0)
      def totals(df: DataFrame, tag: String): DataFrame =
        df.groupBy($"o_orderpriority")
          .agg(count(lit(1L)).as("n"),
            sum($"o_totalprice".cast("decimal(18,2)")).cast("double")
              .as("revenue"))
          .withColumn("snap", lit(tag))
          .select($"snap", $"o_orderpriority", $"n", $"revenue")
      totals(tab.read(), "src")
        .unionAll(totals(clone.read(), "clone"))
        .orderBy($"snap", $"o_orderpriority")
    },
    Some("""WITH src AS (
           |  SELECT 'src' AS snap, o_orderpriority, COUNT(*) AS n,
           |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |  FROM orders GROUP BY 2),
           |cl AS (
           |  SELECT 'clone' AS snap, o_orderpriority, COUNT(*) AS n,
           |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
           |  FROM orders WHERE o_totalprice >= 100000 GROUP BY 2)
           |SELECT * FROM src UNION ALL SELECT * FROM cl
           |ORDER BY snap, o_orderpriority""".stripMargin))

  // ---- 12. RESTORE ----

  /** RESTORE as the undo of a destructive rewrite: create evens,
    * append odds, delete everything cheap — then restore to the
    * pre-delete version. The table must read EXACTLY the full orders
    * again (the oracle), while the delete stays in history as its own
    * commit (TxLogSpec's half).
    */
  val extLakeRestore = Q(
    "ext_lake_restore",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val tab = new TxTable(s, scratch("lake_restore", dir))
      tab.create(orders.where($"o_orderkey" % 2 === 0))
      tab.append(orders.where($"o_orderkey" % 2 === 1))
      tab.deleteWhere($"o_totalprice" < 200000.0)
      tab.restore(1L)
      tab.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  // ---- 13. UPDATE ... SET ----

  /** Copy-on-write UPDATE (Delta's UPDATE ... SET): urgent orders above
    * 200k get re-statused 'E' and a 10% price cut IN PLACE — the SET
    * expression reads the old row, the match predicate is evaluated
    * before any assignment lands, and only files holding a matched row
    * are rewritten (that bound is TxLogSpec's half). Oracle = the same
    * CASE over the whole table; the untouched rows prove the rewrite
    * copied non-matching neighbours verbatim.
    */
  val extLakeUpdate = Q(
    "ext_lake_update",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
          $"o_orderpriority")
      val tab = new TxTable(s, scratch("lake_upd", dir))
      tab.create(orders.repartitionByRange(8, $"o_orderkey"))
      tab.update(
        $"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 200000.0,
        Map("o_orderstatus" -> lit("E"),
          "o_totalprice" -> ($"o_totalprice" * 0.9)))
      tab.read()
        .select($"o_orderkey", $"o_orderstatus",
          // compare in integer cents: ×0.9 (stored), ×100, +0.5, floor are
          // each ONE IEEE-double op → bit-identical across engines, unlike
          // ROUND(x,2) (Spark HALF_UPs via exact BigDecimal, DuckDB rounds
          // in double arithmetic — they disagree on half-cent boundaries)
          floor($"o_totalprice" * 100 + 0.5).cast("long").as("price_cents"),
          $"o_orderpriority")
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
           |       CASE WHEN o_orderpriority = '1-URGENT' AND o_totalprice > 200000
           |            THEN 'E' ELSE o_orderstatus END AS o_orderstatus,
           |       CAST(FLOOR((CASE WHEN o_orderpriority = '1-URGENT' AND o_totalprice > 200000
           |             THEN o_totalprice * 0.9 ELSE o_totalprice END) * 100 + 0.5) AS BIGINT) AS price_cents,
           |       o_orderpriority
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  // ---- 12. CHECK constraints ----

  /** Table-level CHECK constraint (Delta's ALTER TABLE ADD CONSTRAINT):
    * after `o_totalprice >= 0` is added, an append of negated prices is
    * REFUSED before a single file is committed — the table still reads
    * exactly its pre-attempt content — and the honest append then
    * lands. Oracle = the whole table: a leaked row from the refused
    * write (or a lost good row) breaks the hash.
    */
  val extLakeConstraint = Q(
    "ext_lake_constraint",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val tab = new TxTable(s, scratch("lake_chk", dir))
      tab.create(orders.where($"o_orderkey" % 2 === 0))
      tab.addConstraint("o_totalprice >= 0")
      val odds = orders.where($"o_orderkey" % 2 === 1)
      val refused =
        try { tab.append(odds.withColumn("o_totalprice", -$"o_totalprice")); false }
        catch { case _: IllegalArgumentException => true }
      require(refused, "the violating append must be refused")
      tab.append(odds)
      tab.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  // ---- 14. bounded log-replay depth ----

  /** Snapshot resolution must stay FLAT however long a table lives: a
    * 113-commit history (11× the checkpoint interval — one real CREATE,
    * then driver-side metadata commits, the cheap way to age a log) is
    * probed at the head, at a checkpoint version, just past one, mid-
    * epoch, and in the pre-checkpoint era. The observable is
    * [[graft.lake.TxLog.lastReplay]]: tail commits replayed is ≤ the
    * 10-commit checkpoint interval whenever a checkpoint precedes the
    * target — O(interval) resolution, never O(history) — and every
    * probe's snapshot still serves the table content (25 nation rows).
    * The oracle pins the replay ledger as literals: a missed checkpoint
    * or a full replay changes the emitted rows, a broken snapshot
    * changes n_rows.
    */
  val extLakeReplayDepth = Q(
    "ext_lake_replay_depth",
    (s, dir) => {
      import s.implicits._
      import org.apache.hadoop.fs.Path
      import graft.lake.TxLog
      val root = scratch("lake_replay", dir)
      val tab = new TxTable(s, root)
      tab.create(t(s, dir, "nation")
        .select($"n_nationkey", $"n_name", $"n_regionkey"))
      val rootPath = new Path(root)
      val fs = rootPath.getFileSystem(s.sparkContext.hadoopConfiguration)
      (1L to 113L).foreach { v =>
        val landed = TxLog.tryCommit(fs, rootPath, v,
          Seq(TxLog.LogEntry(info = Some(TxLog.Info("NOOP", v - 1)))))
        require(landed, s"scripted history commit $v must land")
      }
      val probes = Seq(9L, 57L, 105L, 110L, 113L).map { v =>
        val snap = TxLog.snapshot(fs, rootPath, Some(v))
        val (replayed, usedCkpt) = TxLog.lastReplay.get()
        require(v < TxLog.checkpointInterval
          || replayed <= TxLog.checkpointInterval,
          s"probe $v replayed $replayed commits — O(history), not O(interval)")
        val nRows = tab.read(asOf = Some(v)).count()
        (v, replayed, usedCkpt, nRows)
      }
      // LOG RETENTION on the same scripted history: everything behind
      // the keep-window's replay-floor checkpoint (v100) is reclaimed,
      // kept versions still resolve through it, the horizon refuses
      val cleaned = TxLog.cleanLog(fs, rootPath, keepVersions = 10)
      require(cleaned.contains(f"${0L}%020d.json") &&
        cleaned.exists(_.startsWith(f"${90L}%020d.checkpoint")),
        s"log retention must reclaim pre-floor commits + checkpoints")
      require(TxLog.earliestVersion(fs, rootPath) == 100L,
        "the replay-floor checkpoint's commit is the earliest retained")
      require(tab.read(asOf = Some(105L)).count() == probes.head._4,
        "kept versions must still resolve after log cleanup")
      val refused =
        try { TxLog.snapshot(fs, rootPath, Some(9L)); false }
        catch { case _: Exception => true }
      require(refused, "time travel behind the retention floor must refuse")
      probes.toDF("probe_version", "commits_replayed", "used_checkpoint",
        "n_rows").orderBy($"probe_version")
    },
    Some("""SELECT * FROM (VALUES
           |  (CAST(9 AS BIGINT),   CAST(10 AS BIGINT), false, (SELECT CAST(COUNT(*) AS BIGINT) FROM nation)),
           |  (CAST(57 AS BIGINT),  CAST(7 AS BIGINT),  true,  (SELECT CAST(COUNT(*) AS BIGINT) FROM nation)),
           |  (CAST(105 AS BIGINT), CAST(5 AS BIGINT),  true,  (SELECT CAST(COUNT(*) AS BIGINT) FROM nation)),
           |  (CAST(110 AS BIGINT), CAST(0 AS BIGINT),  true,  (SELECT CAST(COUNT(*) AS BIGINT) FROM nation)),
           |  (CAST(113 AS BIGINT), CAST(3 AS BIGINT),  true,  (SELECT CAST(COUNT(*) AS BIGINT) FROM nation))
           |) AS t(probe_version, commits_replayed, used_checkpoint, n_rows)
           |ORDER BY probe_version""".stripMargin))

  // ---- 15. change data feed ----

  /** [[graft.lake.TxTable.readChanges]] (Delta's `table_changes`) over a
    * scripted history: create (evens) → append (odds) → copy-on-write
    * DELETE (<100k) → copy-on-write UPDATE (>300k re-keyed to buyer −1).
    * The feed for versions 1..3 must show exactly: the appended rows as
    * v1 inserts, the deleted rows as v2 deletes, and each updated row as
    * its v3 update_preimage/update_postimage pair (Delta's four change
    * types — an update is distinguishable from a coincidental
    * delete+insert of the same key) — while every copy-on-write SURVIVOR
    * (rewritten verbatim alongside) cancels out of the diff. The oracle
    * reconstructs the same ledger relationally. o_totalprice passes
    * through untouched (bit-stable doubles); only the scripted columns
    * move.
    */
  val extLakeChangeFeed = Q(
    "ext_lake_change_feed",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val tab = new TxTable(s, scratch("lake_cdf", dir))
      // commit-time capture ON: the delete/update commits stage their
      // changed rows, and readChanges below reads ONLY those files
      tab.create(orders.where($"o_orderkey" % 2 === 0)
        .repartitionByRange(4, $"o_orderkey"), enableChangeDataFeed = true)
      tab.append(orders.where($"o_orderkey" % 2 === 1))
      tab.deleteWhere($"o_totalprice" < 100000.0)
      tab.update($"o_totalprice" > 300000.0, Map("o_custkey" -> lit(-1L)))
      tab.readChanges(1L, 3L)
        .orderBy($"_commit_version", $"_change_type", $"o_orderkey")
    },
    Some("""WITH base AS (
           |  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey,
           |         o_totalprice
           |  FROM orders),
           |del2 AS (SELECT * FROM base WHERE o_totalprice < 100000),
           |upd3 AS (SELECT * FROM base
           |         WHERE o_totalprice >= 100000 AND o_totalprice > 300000)
           |SELECT o_orderkey, o_custkey, o_totalprice,
           |       'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
           |FROM base WHERE o_orderkey % 2 = 1
           |UNION ALL
           |SELECT o_orderkey, o_custkey, o_totalprice, 'delete', 2 FROM del2
           |UNION ALL
           |SELECT o_orderkey, o_custkey, o_totalprice, 'update_preimage', 3
           |FROM upd3
           |UNION ALL
           |SELECT o_orderkey, CAST(-1 AS BIGINT), o_totalprice,
           |       'update_postimage', 3
           |FROM upd3
           |ORDER BY _commit_version, _change_type, o_orderkey""".stripMargin))

  /** Change feed by WALL-CLOCK range
    * ([[graft.lake.TxTable.readChangesBetweenTimestamps]] — Delta's
    * table_changes with timestamps, resolved through in-commit stamps):
    * the scripted create→append→delete→update history is sliced by the
    * commits' OWN stamps — `[ts1, ts2]` must emit exactly the v1
    * inserts and v2 deletes (the v3 update pairs excluded), which the
    * oracle reconstructs relationally. In-query REQUIREs pin the
    * head-only slice `[ts3, ts3]` to exactly the update pairs and that
    * an instant range holding no commit refuses loudly.
    */
  val extLakeCdfByTimestamp = Q(
    "ext_lake_cdf_by_timestamp",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val tab = new TxTable(s, scratch("lake_cdfts", dir))
      tab.create(orders.where($"o_orderkey" % 2 === 0)
        .repartitionByRange(4, $"o_orderkey"), enableChangeDataFeed = true)
      tab.append(orders.where($"o_orderkey" % 2 === 1))             // v1
      tab.deleteWhere($"o_totalprice" < 100000.0)                   // v2
      tab.update($"o_totalprice" > 300000.0,
        Map("o_custkey" -> lit(-1L)))                               // v3
      val ts1 = tab.commitTimestamp(1L).get
      val ts2 = tab.commitTimestamp(2L).get
      val ts3 = tab.commitTimestamp(3L).get
      val headTypes = tab.readChangesBetweenTimestamps(ts3, ts3)
        .select($"_change_type").distinct().as[String].collect().toSet
      require(headTypes == Set("update_preimage", "update_postimage"),
        s"[ts3, ts3] must hold exactly the update pairs, got $headTypes")
      val emptyRefused =
        try { tab.readChangesBetweenTimestamps(ts3 + 1000L, ts3 + 2000L)
              false }
        catch { case _: IllegalArgumentException => true }
      require(emptyRefused,
        "an instant range holding no commit must refuse")
      tab.readChangesBetweenTimestamps(ts1, ts2)
        .orderBy($"_commit_version", $"_change_type", $"o_orderkey")
    },
    Some("""WITH base AS (
           |  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS o_custkey,
           |         o_totalprice
           |  FROM orders),
           |del2 AS (SELECT * FROM base WHERE o_totalprice < 100000)
           |SELECT o_orderkey, o_custkey, o_totalprice,
           |       'insert' AS _change_type, CAST(1 AS BIGINT) AS _commit_version
           |FROM base WHERE o_orderkey % 2 = 1
           |UNION ALL
           |SELECT o_orderkey, o_custkey, o_totalprice, 'delete', 2 FROM del2
           |ORDER BY _commit_version, _change_type, o_orderkey""".stripMargin))

  /** `startingTimestamp` on the streaming source
    * ([[graft.lake.TxStreamSource]] — Delta's wall-clock stream start):
    * a four-commit backlog is streamed from v1's in-commit stamp, so
    * the sink must hold EXACTLY the three appends — v0's rows predate
    * the instant and never stream. In-query REQUIRE pins that a future
    * instant refuses loudly instead of silently idling
    * ([[graft.lake.TxTable.versionAtOrAfterTimestamp]]).
    */
  val extStreamLakeStartingTs = Q(
    "ext_stream_lake_starting_ts",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val root = scratch("lake_sts", dir)
      val tab = new TxTable(s, root)
      tab.create(orders.where($"o_orderkey" % 4 === 0))             // v0
      tab.append(orders.where($"o_orderkey" % 4 === 1))             // v1
      tab.append(orders.where($"o_orderkey" % 4 === 2))             // v2
      tab.append(orders.where($"o_orderkey" % 4 === 3))             // v3
      val refused =
        try { tab.versionAtOrAfterTimestamp(
                tab.commitTimestamp(3L).get + 3600L * 1000)
              false }
        catch { case _: IllegalArgumentException => true }
      require(refused, "a future startingTimestamp must refuse")
      val name = "stream_lake_sts_" + math.abs(dir.hashCode).toString
      val q = s.readStream.format("graft.lake.TxLogStreamProvider")
        .option("path", root)
        .option("startingTimestamp",
          tab.commitTimestamp(1L).get.toString).load()
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try q.processAllAvailable() finally q.stop()
      s.table(name).orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
           |FROM orders WHERE o_orderkey % 4 <> 0
           |ORDER BY o_orderkey""".stripMargin))

  // ---- 16. merge-on-read deletion vectors ----

  /** [[graft.lake.TxTable.deleteWhereMergeOnRead]] (Delta's deletion
    * vectors): a sparse delete (every 97th order) lands as log-only row
    * positions — the query REQUIRES that no data file changed — then a
    * bulk delete under a tiny per-file cap forces the copy-on-write
    * fallback in the same API. Final content = both deletes applied,
    * reconstructed relationally by the oracle; a row leaking back in
    * (bad vector read) or vanishing (bad position capture) breaks the
    * hash. Prices pass through untouched (bit-stable doubles).
    */
  val extLakeDeleteDv = Q(
    "ext_lake_delete_dv",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val tab = new TxTable(s, scratch("lake_dv", dir))
      tab.create(orders.repartitionByRange(8, $"o_orderkey"))
      val before = tab.read().inputFiles.toSet
      // the per-file position cap is a DENSITY knob, so pin the
      // vectors-only semantics with an explicit row-proportional cap —
      // at 100× data the same 1/97 predicate is ~100× positions per
      // file, and the DEFAULT cap's CoW fallback (its own REQUIRE
      // below) would otherwise fire here
      tab.deleteWhereMergeOnRead($"o_orderkey" % 97L === 0L,
        maxPositionsPerFile = Int.MaxValue)
      require(tab.read().inputFiles.toSet == before,
        "a sparse merge-on-read delete must not rewrite any data file")
      tab.deleteWhereMergeOnRead($"o_totalprice" > 450000.0,
        maxPositionsPerFile = 10)
      tab.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM orders
           |WHERE o_orderkey % 97 <> 0 AND o_totalprice <= 450000
           |ORDER BY o_orderkey""".stripMargin))

  // ---- 17. incremental view maintenance over the change feed ----

  /** The CDF consumption loop end-to-end: a silver PROJECTION of a bronze
    * lake table is maintained purely from [[graft.lake.TxTable
    * .readChanges]] slices — never recomputed. Bronze scripts create →
    * append → merge-on-read delete → in-place update; for each version
    * the silver table folds the transformed slice in via
    * [[graft.lake.TxTable.applyChanges]] (deletes drop keys, inserts
    * upsert, the update's pre/postimage pair is one keyed migration).
    * Final silver
    * content must equal the transform of final bronze, which is exactly
    * what the oracle computes relationally — a missed slice, a phantom
    * survivor, or a mis-collapsed update pair breaks the hash. Prices
    * compare in integer cents (IEEE-exact steps; see ext_lake_update).
    */
  val extLakeCdfIncremental = Q(
    "ext_lake_cdf_incremental",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      val bronze = new TxTable(s, scratch("lake_cdfi_bronze", dir))
      bronze.create(orders.where($"o_orderkey" % 2 === 0)
        .repartitionByRange(4, $"o_orderkey"),
        enableChangeDataFeed = true)                        // v0
      bronze.append(orders.where($"o_orderkey" % 2 === 1))  // v1
      bronze.deleteWhereMergeOnRead($"o_totalprice" < 100000.0) // v2
      bronze.update($"o_totalprice" > 400000.0,
        Map("o_orderstatus" -> lit("X")))                   // v3
      def xform(df: DataFrame): DataFrame = {
        val keep = Seq("_change_type", "_commit_version")
          .filter(df.columns.contains).map(col)
        df.select(Seq($"o_orderkey", $"o_orderstatus",
          floor($"o_totalprice" * 100 + 0.5).cast("long")
            .as("price_cents")) ++ keep: _*)
      }
      val silver = new TxTable(s, scratch("lake_cdfi_silver", dir))
      // seed from the v0 snapshot (a create's feed is trivially "every
      // row inserted" — diffing it against an empty set is wasted work),
      // then fold each later version's slice in
      silver.create(xform(bronze.read(asOf = Some(0L))))
      (1L to bronze.version).foreach { v =>
        silver.applyChanges(xform(bronze.readChanges(v, v)), Seq("o_orderkey"))
      }
      silver.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
           |       CASE WHEN o_totalprice > 400000 THEN 'X'
           |            ELSE o_orderstatus END AS o_orderstatus,
           |       CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
           |FROM orders WHERE o_totalprice >= 100000
           |ORDER BY o_orderkey""".stripMargin))

  // ---- 18. vacuum + schema evolution, driver-gated ----

  /** VACUUM under the oracle: a copy-on-write delete leaves the old
    * files as time-travel tombstones; vacuum(keepVersions=1) must
    * reclaim them (REQUIREd non-empty), the head read must be
    * byte-identical to before, and the vacuumed version must refuse
    * loudly (REQUIREd). Oracle = the relational delete result — a row
    * resurrected by a mis-scoped vacuum (live file deleted) breaks the
    * row count, a leaked tombstone breaks nothing here but fails the
    * reclaim REQUIRE.
    */
  val extLakeVacuum = Q(
    "ext_lake_vacuum",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val tab = new TxTable(s, scratch("lake_vac", dir))
      tab.create(orders.repartitionByRange(4, $"o_orderkey"))
      tab.deleteWhere($"o_totalprice" < 150000.0)
      // the retention guard (Delta's retentionDurationCheck): instant
      // reclaim must REFUSE until explicitly opted out — the age floor
      // is what shields files staged by in-flight commits. The check
      // conf is pinned on/off around each phase and restored exactly
      // (a hosting session may run with its own setting).
      val ckKey = graft.lake.TxLog.retentionDurationCheckKey
      val prevCk = s.conf.getOption(ckKey)
      def restoreCk(): Unit = prevCk match {
        case Some(v) => s.conf.set(ckKey, v)
        case None    => s.conf.unset(ckKey)
      }
      val guarded =
        try { s.conf.set(ckKey, "true")
              tab.vacuum(keepVersions = 1, minAgeMs = 0L); false }
        catch { case _: IllegalArgumentException => true }
      require(guarded, "sub-floor minAgeMs must refuse without the opt-out")
      val removed =
        try {
          s.conf.set(ckKey, "false")
          tab.vacuum(keepVersions = 1, minAgeMs = 0L)
        } finally restoreCk()
      require(removed.nonEmpty, "vacuum must reclaim the rewritten v0 files")
      val refused =
        try { tab.read(asOf = Some(0L)).count(); false }
        catch { case _: Exception => true }
      require(refused, "the vacuumed version must refuse to resolve")
      tab.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM orders WHERE o_totalprice >= 150000
           |ORDER BY o_orderkey""".stripMargin))

  /** Additive schema evolution under the oracle: an append carrying a NEW
    * column lands it in the same commit's metadata; the snapshot read
    * serves old files with nulls in the new column — Delta's mergeSchema
    * contract (reference writes with it, etl/utils/base_table.py:211-217).
    * Oracle = the same union with NULLs on the pre-evolution half.
    */
  val extLakeSchemaEvolution = Q(
    "ext_lake_schema_evolution",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val tab = new TxTable(s, scratch("lake_evo", dir))
      tab.create(orders.where($"o_orderkey" % 2 === 0))
      tab.append(orders.where($"o_orderkey" % 2 === 1)
        .withColumn("price_cents",
          floor($"o_totalprice" * 100 + 0.5).cast("long")))
      tab.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice,
           |       CASE WHEN o_orderkey % 2 = 1
           |            THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
           |       END AS price_cents
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** The SQL MAINTENANCE surface ([[graft.lake.LakeSql]], wired into
    * `spark.sql` by [[graft.functions.GraftExtensions]]'s injected
    * parser; driven here through the session-independent
    * `LakeSql.run`): a scripted create→append→delete history is then
    * administered ENTIRELY in SQL — OPTIMIZE bin-packs (REQUIREd
    * version), DESCRIBE HISTORY returns the full ledger (REQUIREd
    * operation sequence), RESTORE ... TO VERSION AS OF undoes the
    * delete, VACUUM ... RETAIN 1 VERSIONS reclaims the dead era's
    * files (REQUIREd non-empty). The emitted rows are the
    * SQL-restored table — a restore that missed a file, resurrected a
    * deleted row, or a vacuum that reclaimed a live file breaks the
    * relational oracle.
    */
  val extLakeSqlMaintenance = Q(
    "ext_lake_sql_maintenance",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val root = scratch("lake_sqlmaint", dir)
      val tab = new TxTable(s, root)
      tab.create(orders.where($"o_orderkey" % 2 === 0).repartition(2))
      tab.append(orders.where($"o_orderkey" % 2 === 1).repartition(2))
      tab.deleteWhere($"o_totalprice" < 150000.0)
      val vOpt = graft.lake.LakeSql.run(s, s"OPTIMIZE '$root'")
        .as[Long].head()
      require(vOpt == 3L, s"SQL OPTIMIZE must commit v3, got $vOpt")
      val ops = graft.lake.LakeSql.run(s, s"DESCRIBE HISTORY '$root'")
        .orderBy($"version").select($"op").as[String].collect().toSeq
      require(ops == Seq("CREATE", "APPEND", "DELETE", "OPTIMIZE"),
        s"SQL DESCRIBE HISTORY ledger mismatch: $ops")
      val vRest = graft.lake.LakeSql
        .run(s, s"RESTORE '$root' TO VERSION AS OF 1").as[Long].head()
      require(vRest == 4L, s"SQL RESTORE must commit v4, got $vRest")
      // RETAIN 0 HOURS under the retention guard must refuse; with the
      // explicit opt-out it reclaims instantly (the query owns the
      // table). Check conf pinned per phase and restored exactly.
      val ckKey = graft.lake.TxLog.retentionDurationCheckKey
      val prevCk = s.conf.getOption(ckKey)
      def restoreCk(): Unit = prevCk match {
        case Some(v) => s.conf.set(ckKey, v)
        case None    => s.conf.unset(ckKey)
      }
      val sqlGuarded =
        try {
          s.conf.set(ckKey, "true")
          graft.lake.LakeSql.run(s,
            s"VACUUM '$root' RETAIN 1 VERSIONS RETAIN 0 HOURS")
          false
        } catch { case _: IllegalArgumentException => true }
      require(sqlGuarded,
        "SQL VACUUM RETAIN 0 HOURS must refuse without the opt-out")
      val removed =
        try {
          s.conf.set(ckKey, "false")
          graft.lake.LakeSql.run(s,
            s"VACUUM '$root' RETAIN 1 VERSIONS RETAIN 0 HOURS")
            .as[String].collect()
        } finally restoreCk()
      require(removed.nonEmpty,
        "SQL VACUUM must reclaim the delete/optimize era's files")
      tab.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** TABLE PROPERTIES end-to-end ([[graft.lake.TxTable
    * .setTblProperties]], Delta's `Metadata.configuration` /
    * `delta.appendOnly` / `delta.deletedFileRetentionDuration`): the
    * governance loop a production table runs — SET `txlog.appendOnly`
    * freezes the table against row-removing mutations (REQUIREd: a
    * DELETE and an UPDATE both refuse, an append and an OPTIMIZE both
    * land), UNSET lifts it, a table-level `txlog.retention.hours = 0`
    * lets the DEFAULT vacuum (no RETAIN clause, no session conf)
    * reclaim the rewrite debris, and DESCRIBE DETAIL + the history
    * ledger pin every property commit. All through the SQL surface
    * over the quoted path. The emitted rows are the final state,
    * reconstructed relationally by the oracle — enforcement misfiring
    * on either side (a refused mutation landing, or the lifted gate
    * still refusing) breaks the hash or a REQUIRE.
    */
  val extLakeTblProperties = Q(
    "ext_lake_tblproperties",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val root = scratch("lake_props", dir)
      val tab = new TxTable(s, root)
      tab.create(orders.where($"o_orderkey" % 3 === 0).repartition(2)) // v0
      val vSet = graft.lake.LakeSql.run(s, s"ALTER '$root' " +
        "SET TBLPROPERTIES ('owner' = 'training-data', " +
        s"'${graft.lake.TxLog.propAppendOnly}' = 'true')").as[Long].head()
      require(vSet == 1L, s"SET TBLPROPERTIES must commit v1, got $vSet")
      // appends stay open under appendOnly
      tab.append(orders.where($"o_orderkey" % 3 === 1).repartition(2)) // v2
      // row-removing mutations refuse — BOTH the programmatic and the
      // SQL route hit the same gate
      val delRefused =
        try { tab.deleteWhere($"o_orderkey" % 5 === 0); false }
        catch { case e: IllegalArgumentException =>
          e.getMessage.contains("appendOnly") }
      require(delRefused, "DELETE on an appendOnly table must refuse")
      val updRefused =
        try {
          graft.lake.LakeSql.run(s,
            s"UPDATE '$root' SET o_custkey = 0 WHERE o_orderkey = 3")
          false
        } catch { case e: Exception =>
          // the gate's message may ride a wrapping layer's cause chain
          Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
            .take(5).exists(t => Option(t.getMessage)
              .exists(_.contains("appendOnly"))) }
      require(updRefused, "SQL UPDATE on an appendOnly table must refuse")
      // file-preserving maintenance is allowed
      tab.optimize()                                                 // v3
      // DESCRIBE DETAIL surfaces the configuration
      val props = graft.lake.LakeSql.run(s, s"DESCRIBE DETAIL '$root'")
        .select($"properties").collect().head.getMap[String, String](0)
      require(props.get("owner").contains("training-data") &&
          props.get(graft.lake.TxLog.propAppendOnly).contains("true"),
        s"DESCRIBE DETAIL must surface the set properties, got $props")
      // lift the freeze; opt the TABLE (not the session) into instant
      // retention — the persisted, auditable form of the vacuum opt-out
      graft.lake.LakeSql.run(s, s"ALTER '$root' UNSET TBLPROPERTIES " +
        s"('${graft.lake.TxLog.propAppendOnly}')")                   // v4
      graft.lake.LakeSql.run(s, s"ALTER '$root' SET TBLPROPERTIES " +
        s"('${graft.lake.TxLog.propRetentionHours}' = '0')")         // v5
      graft.lake.LakeSql.run(s,
        s"DELETE FROM '$root' WHERE o_orderkey % 5 = 0")             // v6
      // a bare VACUUM (no RETAIN HOURS, no session conf) honors the
      // table-level retention and reclaims the pre-delete rewrites
      val removed = graft.lake.LakeSql.run(s,
        s"VACUUM '$root' RETAIN 1 VERSIONS").as[String].collect()
      require(removed.nonEmpty,
        "table-level retention.hours=0 must let the default VACUUM " +
          "reclaim the delete era's rewritten files")
      val ops = tab.history().orderBy($"version")
        .select($"op").as[String].collect().toSeq
      require(ops == Seq("CREATE", "SET_TBLPROPERTIES", "APPEND",
          "OPTIMIZE", "UNSET_TBLPROPERTIES", "SET_TBLPROPERTIES",
          "DELETE"),
        s"property ledger mismatch: $ops")
      tab.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM orders
           |WHERE o_orderkey % 3 IN (0, 1) AND o_orderkey % 5 <> 0
           |ORDER BY o_orderkey""".stripMargin))

  /** SQL DML surface ([[graft.lake.LakeSql]] DELETE / UPDATE / MERGE
    * INTO): a scripted history is mutated ENTIRELY in SQL — DELETE
    * culls a key residue class, UPDATE shifts custkeys above a price
    * bar, and a three-clause MERGE (conditional DELETE, UPDATE from
    * the source, INSERT *) folds in a view mixing overlapping and
    * brand-new keys. In-query REQUIREs pin the committed versions and
    * the ledger op sequence; the emitted rows are the final table,
    * reconstructed relationally by the oracle — a clause misfiring,
    * matching the wrong rows, or the parser mangling an expression
    * breaks the hash. All arithmetic is int64 (IEEE-exact copies for
    * the double column), so the comparison is bit-exact.
    */
  val extLakeSqlDml = Q(
    "ext_lake_sql_dml",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val root = scratch("lake_sqldml", dir)
      val tab = new TxTable(s, root)
      tab.create(orders.repartition(4))                             // v0
      val vDel = graft.lake.LakeSql
        .run(s, s"DELETE FROM '$root' WHERE o_orderkey % 7 = 3")
        .as[Long].head()
      require(vDel == 1L, s"SQL DELETE must commit v1, got $vDel")
      val vUpd = graft.lake.LakeSql.run(s,
        s"UPDATE '$root' SET o_custkey = o_custkey + 1000000 " +
          "WHERE o_totalprice > 200000.0").as[Long].head()
      require(vUpd == 2L, s"SQL UPDATE must commit v2, got $vUpd")
      orders.where($"o_orderkey" % 5 === 0)
        .select($"o_orderkey", lit(-1L).as("o_custkey"), $"o_totalprice")
        .unionAll(orders.where($"o_orderkey" % 5 === 1)
          .select(($"o_orderkey" + 30000000L).as("o_orderkey"),
            $"o_custkey", $"o_totalprice"))
        .createOrReplaceTempView("lake_sqldml_src")
      val vM = graft.lake.LakeSql.run(s,
        s"""MERGE INTO '$root' AS t
           |USING lake_sqldml_src AS s
           |ON t.o_orderkey = s.o_orderkey
           |WHEN MATCHED AND t.o_totalprice < 100000.0 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET o_custkey = s.o_custkey
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin
          .replace('\n', ' ')).as[Long].head()
      require(vM == 3L, s"SQL MERGE must commit v3, got $vM")
      val ops = tab.history().orderBy($"version")
        .select($"op").as[String].collect().toSeq
      require(ops == Seq("CREATE", "DELETE", "UPDATE", "MERGE_INTO"),
        s"SQL DML ledger mismatch: $ops")
      tab.read().orderBy($"o_orderkey")
    },
    Some("""WITH after_del AS (
           |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders
           |  WHERE o_orderkey % 7 <> 3
           |), after_upd AS (
           |  SELECT o_orderkey,
           |         CASE WHEN o_totalprice > 200000.0
           |              THEN o_custkey + 1000000 ELSE o_custkey
           |         END AS o_custkey,
           |         o_totalprice
           |  FROM after_del
           |), src AS (
           |  SELECT o_orderkey, CAST(-1 AS BIGINT) AS o_custkey,
           |         o_totalprice
           |  FROM orders WHERE o_orderkey % 5 = 0
           |  UNION ALL
           |  SELECT o_orderkey + 30000000, o_custkey, o_totalprice
           |  FROM orders WHERE o_orderkey % 5 = 1
           |), kept AS (
           |  SELECT t.o_orderkey,
           |         CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_custkey
           |              ELSE t.o_custkey END AS o_custkey,
           |         t.o_totalprice
           |  FROM after_upd t LEFT JOIN src s
           |    ON t.o_orderkey = s.o_orderkey
           |  WHERE NOT (s.o_orderkey IS NOT NULL
           |             AND t.o_totalprice < 100000.0)
           |), ins AS (
           |  SELECT s.o_orderkey, s.o_custkey, s.o_totalprice FROM src s
           |  WHERE s.o_orderkey NOT IN
           |        (SELECT o_orderkey FROM after_upd)
           |)
           |SELECT * FROM kept UNION ALL SELECT * FROM ins
           |ORDER BY o_orderkey""".stripMargin))

  /** SQL READ surface ([[graft.lake.LakeSql.selectOverPaths]] — the
    * statement a Delta migrant runs first): a two-commit history is
    * read ENTIRELY in SQL, the head path LEFT-joined against its own
    * `VERSION AS OF 0` slice to flag which rows existed at v0. In-query
    * REQUIREs pin that `TIMESTAMP AS OF` (in-commit stamps, binary
    * searched) resolves the same v0 slice. Oracle = orders with the
    * even-key provenance flag — a path source resolving the wrong
    * version flips flags or row counts.
    */
  val extLakeSqlSelect = Q(
    "ext_lake_sql_select",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val root = scratch("lake_sqlsel", dir)
      val tab = new TxTable(s, root)
      tab.create(orders.where($"o_orderkey" % 2 === 0).repartition(2)) // v0
      tab.append(orders.where($"o_orderkey" % 2 === 1).repartition(2)) // v1
      val ts0 = tab.commitTimestamp(0L).get
      val v0Count = graft.lake.LakeSql.run(s,
        s"SELECT COUNT(*) AS c FROM '$root' VERSION AS OF 0")
        .as[Long].head()
      val ts0Count = graft.lake.LakeSql.run(s,
        s"SELECT COUNT(*) AS c FROM '$root' TIMESTAMP AS OF $ts0")
        .as[Long].head()
      require(v0Count > 0 && v0Count == ts0Count,
        s"TIMESTAMP AS OF $ts0 must resolve the v0 slice " +
          s"($v0Count rows), got $ts0Count")
      graft.lake.LakeSql.run(s,
        s"""SELECT h.o_orderkey, h.o_custkey, h.o_totalprice,
           |       v.o_orderkey IS NOT NULL AS in_v0
           |FROM '$root' h LEFT JOIN '$root' VERSION AS OF 0 v
           |  ON h.o_orderkey = v.o_orderkey
           |ORDER BY h.o_orderkey""".stripMargin.replace('\n', ' '))
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice,
           |       (o_orderkey % 2 = 0) AS in_v0
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** SQL DDL surface: CREATE TABLE AS SELECT → INSERT INTO (named
    * query and positional VALUES) → ALTER ADD COLUMN (metadata-only
    * evolution) → ALTER ADD CONSTRAINT, administered ENTIRELY in SQL —
    * the full ledger pinned via history, a CHECK-violating INSERT
    * REQUIREd to refuse, the final state read back through the SQL
    * path-SELECT. Oracle = orders plus the one manual row, note
    * null-filled on pre-evolution rows.
    */
  val extLakeSqlDdl = Q(
    "ext_lake_sql_ddl",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      orders.createOrReplaceTempView("lake_ddl_src")
      val root = scratch("lake_sqlddl", dir)
      def runV(sql: String): Long =
        graft.lake.LakeSql.run(s, sql).as[Long].head()
      val v0 = runV(s"CREATE TABLE '$root' AS SELECT o_orderkey, " +
        "o_custkey, o_totalprice FROM lake_ddl_src WHERE o_orderkey % 2 = 0")
      require(v0 == 0L, s"CTAS must commit v0, got $v0")
      val v1 = runV(s"INSERT INTO '$root' SELECT o_orderkey, o_custkey, " +
        "o_totalprice FROM lake_ddl_src WHERE o_orderkey % 2 = 1")
      require(v1 == 1L, s"INSERT must commit v1, got $v1")
      val v2 = runV(s"ALTER '$root' ADD COLUMN note string")
      require(v2 == 2L, s"ADD COLUMN must commit v2, got $v2")
      val v3 = runV(s"INSERT INTO '$root' VALUES " +
        "(CAST(30000001 AS BIGINT), CAST(-5 AS BIGINT), " +
        "CAST(42.5 AS DOUBLE), 'manual')")
      require(v3 == 3L, s"INSERT VALUES must commit v3, got $v3")
      val v4 = runV(s"ALTER '$root' ADD CONSTRAINT price_pos " +
        "CHECK (o_totalprice >= 0)")
      require(v4 == 4L, s"ADD CONSTRAINT must commit v4, got $v4")
      val refused =
        try {
          runV(s"INSERT INTO '$root' VALUES " +
            "(CAST(30000002 AS BIGINT), CAST(-6 AS BIGINT), " +
            "CAST(-1.0 AS DOUBLE), 'bad')")
          false
        } catch { case _: Exception => true }
      require(refused, "a CHECK-violating INSERT must refuse")
      val ops = new TxTable(s, root).history().orderBy($"version")
        .select($"op").as[String].collect().toSeq
      require(ops == Seq("CREATE", "APPEND", "ADD_COLUMN", "APPEND",
        "ADD_CONSTRAINT"), s"SQL DDL ledger mismatch: $ops")
      graft.lake.LakeSql.run(s, s"SELECT o_orderkey, o_custkey, " +
        s"o_totalprice, note FROM '$root' ORDER BY o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice,
           |       CAST(NULL AS VARCHAR) AS note
           |FROM orders
           |UNION ALL
           |SELECT CAST(30000001 AS BIGINT), CAST(-5 AS BIGINT),
           |       CAST(42.5 AS DOUBLE), 'manual'
           |ORDER BY o_orderkey""".stripMargin))

  /** REORG APPLY (PURGE) (Delta's REORG TABLE): a merge-on-read delete
    * leaves deletion vectors shadowing rows in place; the SQL PURGE
    * pass materializes them — in-query REQUIREs pin that afterwards NO
    * vector remains, that every clean file survived untouched (purge
    * must not become a full rewrite), and that every shadowed file was
    * replaced. The emitted rows are the purged table — resurrecting a
    * shadowed row or dropping a survivor breaks the relational oracle.
    */
  val extLakeReorgPurge = Q(
    "ext_lake_reorg_purge",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val root = scratch("lake_reorg", dir)
      val tab = new TxTable(s, root)
      tab.create(orders.repartitionByRange(4, $"o_orderkey"))     // v0
      // keys are dense 0..n-1 at every scale: shadow only the lower
      // half so the upper range-files stay clean at any SF
      val half = orders.count() / 2
      tab.deleteWhereMergeOnRead($"o_orderkey" % 10 === 0 &&
        $"o_orderkey" < lit(half))                                // v1
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val rootP = new org.apache.hadoop.fs.Path(root)
      val s1 = graft.lake.TxLog.snapshot(fs, rootP)
      val dvPaths = s1.adds.filter(_.hasDv).map(_.path).toSet
      val clean = s1.adds.filterNot(_.hasDv).map(_.path).toSet
      require(dvPaths.nonEmpty && clean.nonEmpty,
        "the range layout must leave both shadowed and clean files")
      val v = graft.lake.LakeSql
        .run(s, s"REORG TABLE '$root' APPLY (PURGE)").as[Long].head()
      require(v == 2L, s"PURGE must commit v2, got $v")
      val s2 = graft.lake.TxLog.snapshot(fs, rootP)
      require(s2.adds.forall(!_.hasDv), "no vector may survive PURGE")
      require(clean.subsetOf(s2.adds.map(_.path).toSet),
        "PURGE must not touch a clean file")
      require(s2.adds.map(_.path).toSet.intersect(dvPaths).isEmpty,
        "every shadowed file must be replaced")
      tab.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
           |WHERE NOT (o_orderkey % 10 = 0
           |           AND o_orderkey < (SELECT COUNT(*) // 2 FROM orders))
           |ORDER BY o_orderkey""".stripMargin))

  /** DEEP CLONE (Delta's CLONE without SHALLOW): every referenced byte
    * is copied distributed into the clone's directory, Adds carried
    * VERBATIM (stats, vectors — zero recompute). The query REQUIREs
    * the clone references only its own directory, then DELETES THE
    * ENTIRE SOURCE TABLE and reads the clone — a clone that still
    * leaned on a source byte, or a copy that dropped a deletion
    * vector (the source holds one), breaks rows against the oracle.
    */
  val extLakeCloneDeep = Q(
    "ext_lake_clone_deep",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val srcRoot = scratch("lake_deepclone_src", dir)
      val dstRoot = scratch("lake_deepclone_dst", dir)
      val src = new TxTable(s, srcRoot)
      src.create(orders.repartitionByRange(3, $"o_orderkey"))     // v0
      src.deleteWhereMergeOnRead($"o_orderkey" % 11 === 0)        // v1 DV
      val out = graft.lake.LakeSql
        .run(s, s"CLONE '$srcRoot' TO '$dstRoot' DEEP").as[Long].head()
      require(out == 1L, s"deep clone must report source v1, got $out")
      val fs = new org.apache.hadoop.fs.Path(dstRoot)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val snap = graft.lake.TxLog.snapshot(fs,
        new org.apache.hadoop.fs.Path(dstRoot))
      require(snap.adds.nonEmpty &&
        snap.adds.forall(a => !a.path.startsWith("/")),
        "a deep clone references only its own directory")
      require(snap.adds.exists(_.hasDv),
        "the source's deletion vector must carry into the clone")
      // the ultimate independence proof: the source is GONE
      fs.delete(new org.apache.hadoop.fs.Path(srcRoot), true)
      new TxTable(s, dstRoot).read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
           |WHERE o_orderkey % 11 <> 0
           |ORDER BY o_orderkey""".stripMargin))

  /** CONVERT (Delta's CONVERT TO DELTA): a "foreign" plain-parquet
    * directory — written by ordinary `df.write.partitionBy(...)`, no
    * log anywhere — is adopted IN PLACE as v0 of a transaction log.
    * In-query REQUIREs pin that not one data file was touched
    * (path+mtime identical), that every adopted Add carries partition
    * values, byte size and min/max stats (skipping works from the
    * first read), and that the checksum chain seeds at v0. A delete
    * then mutates the adopted files like any staged write; the emitted
    * rows are the post-delete table against the relational oracle.
    */
  val extLakeConvert = Q(
    "ext_lake_convert",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice",
          $"o_orderpriority")
      val root = scratch("lake_convert", dir)
      val rootP = new org.apache.hadoop.fs.Path(root)
      val fs = rootP.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(rootP)) fs.delete(rootP, true)
      orders.write.partitionBy("o_orderpriority").parquet(root)
      def files(): Map[String, Long] = {
        val out = Map.newBuilder[String, Long]
        val it = fs.listFiles(rootP, true)
        while (it.hasNext) {
          val f = it.next()
          if (f.getPath.getName.endsWith(".parquet") &&
              !f.getPath.toString.contains("_txlog"))
            out += f.getPath.toString -> f.getModificationTime
        }
        out.result()
      }
      val before = files()
      val tab = new TxTable(s, root)
      val v = graft.lake.LakeSql.run(s,
        s"CONVERT '$root' PARTITIONED BY (o_orderpriority)")
        .as[Long].head()
      require(v == 0L, s"CONVERT must commit v0, got $v")
      require(files() == before, "CONVERT must not rewrite a byte")
      val snap = graft.lake.TxLog.snapshot(fs, rootP)
      require(snap.adds.nonEmpty && snap.adds.forall(a =>
        a.partitionValues.contains("o_orderpriority") &&
          a.bytes.isDefined && a.stats.contains("o_orderkey")),
        "adopted files must carry partition values, sizes and stats")
      require(tab.verifyChecksum(),
        "convert must seed the checksum chain")
      tab.deleteWhere($"o_totalprice" < 100000.0)                 // v1
      tab.read()
        .select($"o_orderkey", $"o_custkey", $"o_totalprice",
          $"o_orderpriority")
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
           |FROM orders WHERE o_totalprice >= 100000
           |ORDER BY o_orderkey""".stripMargin))

  /** Per-commit CHECKSUMS (Delta's `.crc` VersionChecksum): a scripted
    * history covering every mutation shape — append, copy-on-write
    * delete, merge-on-read delete (a remove+re-add of the SAME path
    * with fewer live rows), update, restore — writes an incremental
    * checksum per commit; the query REQUIREs that EVERY version's
    * stored checksum matches its independently resolved snapshot
    * (count/rows/bytes). A remove that echoed wrong stats, a replay
    * that dropped a file, or a restore diff that missed a vector would
    * surface here before the relational oracle even runs.
    */
  val extLakeChecksum = Q(
    "ext_lake_checksum",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val root = scratch("lake_crc", dir)
      val tab = new TxTable(s, root)
      tab.create(orders.where($"o_orderkey" % 2 === 0)
        .repartitionByRange(2, $"o_orderkey"))                    // v0
      tab.append(orders.where($"o_orderkey" % 2 === 1))           // v1
      tab.deleteWhere($"o_totalprice" < 50000.0)                  // v2
      tab.deleteWhereMergeOnRead($"o_orderkey" % 97 === 0)        // v3
      tab.update($"o_totalprice" > 400000.0,
        Map("o_custkey" -> ($"o_custkey" + 1000000L)))            // v4
      tab.restore(2L)                                             // v5
      (0L to 5L).foreach { v =>
        require(tab.verifyChecksum(Some(v)),
          s"v$v must carry a checksum matching its resolved snapshot")
      }
      tab.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
           |WHERE o_totalprice >= 50000
           |ORDER BY o_orderkey""".stripMargin))

  /** TYPE WIDENING (Delta's typeWidening), BOTH routes: the explicit
    * DDL (`ALTER COLUMN ... TYPE`, smallint→int via
    * [[TxTable.widenColumnType]] — idempotent, narrowing refuses) and
    * write-time merge (an append carrying LONG keys past the int range
    * and DOUBLE prices widens both columns IN PLACE). In-query
    * REQUIREs pin that not one old file was rewritten and that both
    * protocol halves stamped the feature. The whole-table read then
    * mixes physically-narrow old files (upcast natively by the parquet
    * reader) with wide new ones; the oracle reconstructs the same
    * values relationally — DuckDB's REAL→DOUBLE widening is the same
    * IEEE-exact upcast, so a single drifted bit breaks the hash.
    */
  val extLakeTypeWidening = Q(
    "ext_lake_type_widening",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_totalprice")
      val tab = new TxTable(s, scratch("lake_widen", dir))
      tab.create(orders.where($"o_orderkey" % 2 === 0)
        .select($"o_orderkey".cast("int").as("o_orderkey"),
          $"o_totalprice".cast("float").as("price_f"),
          ($"o_orderkey" % 100).cast("smallint").as("o_qty")))
      val fs = new org.apache.hadoop.fs.Path(scratch("lake_widen", dir))
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val rootP = new org.apache.hadoop.fs.Path(scratch("lake_widen", dir))
      val before = graft.lake.TxLog.snapshot(fs, rootP)
        .adds.map(_.path).toSet
      // EXPLICIT DDL widening (ALTER COLUMN ... TYPE, not a merge):
      // smallint → int before any int data exists; idempotent repeat
      // commits nothing; a NARROWING attempt refuses
      val vDdl = tab.widenColumnType("o_qty", "int")
      require(tab.widenColumnType("o_qty", "int") == vDdl,
        "same-type ALTER COLUMN TYPE must be idempotent (no new commit)")
      val narrowRefused =
        try { tab.widenColumnType("o_orderkey", "smallint"); false }
        catch { case _: IllegalArgumentException => true }
      require(narrowRefused, "a NARROWING ALTER COLUMN TYPE must refuse")
      // merge-path widening in the same table: long keys + double
      // prices arrive; o_qty rides along already-wide
      tab.append(orders.where($"o_orderkey" % 2 === 1)
        .select(($"o_orderkey" + 10000000000L).as("o_orderkey"),
          $"o_totalprice".as("price_f"),
          ($"o_orderkey" % 100).cast("int").as("o_qty")))
      val snap = graft.lake.TxLog.snapshot(fs, rootP)
      require(before.subsetOf(snap.adds.map(_.path).toSet),
        "type widening must be metadata-only — no old file rewritten")
      require(snap.meta.schema("o_orderkey").dataType ==
        org.apache.spark.sql.types.LongType &&
        snap.meta.schema("price_f").dataType ==
        org.apache.spark.sql.types.DoubleType &&
        snap.meta.schema("o_qty").dataType ==
        org.apache.spark.sql.types.IntegerType,
        "all three columns must widen in place (two merge, one DDL)")
      require(snap.meta.features.contains("typeWidening") &&
        snap.meta.writerFeats.contains("typeWidening"),
        "typeWidening must stamp both protocol halves")
      tab.read().orderBy($"o_orderkey")
    },
    Some("""SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey,
           |       CAST(CAST(o_totalprice AS REAL) AS DOUBLE) AS price_f,
           |       CAST(o_orderkey % 100 AS INT) AS o_qty
           |FROM orders WHERE o_orderkey % 2 = 0
           |UNION ALL
           |SELECT o_orderkey + 10000000000,
           |       o_totalprice,
           |       CAST(o_orderkey % 100 AS INT)
           |FROM orders WHERE o_orderkey % 2 = 1
           |ORDER BY o_orderkey""".stripMargin))

  /** Column-mapping RENAME (Delta's RENAME COLUMN): o_totalprice becomes
    * price_usd in a METADATA-ONLY commit — the query REQUIREs that not
    * one data file changed — then an append arrives under the NEW
    * logical name and lands in the SAME physical parquet column the old
    * files carry. Head read (all rows, new spelling) unioned with the
    * v0 time-travel read (pre-rename rows under the OLD spelling, which
    * that version's own metadata still serves) — both reconstructed
    * relationally by the oracle. A rename that rewrote data, dropped
    * the mapping on read, or leaked the new name into history breaks
    * rows or schema.
    */
  val extLakeSchemaRename = Q(
    "ext_lake_schema_rename",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val tab = new TxTable(s, scratch("lake_rename", dir))
      tab.create(orders.where($"o_orderkey" % 2 === 0))     // v0
      val filesBefore = tab.read().inputFiles.toSet
      tab.renameColumn("o_totalprice", "price_usd")         // v1: metadata only
      require(tab.read().inputFiles.toSet == filesBefore,
        "RENAME COLUMN must not touch a single data file")
      tab.append(orders.where($"o_orderkey" % 2 === 1)      // v2: new name in,
        .withColumnRenamed("o_totalprice", "price_usd"))    //     same physical col
      tab.read()
        .select(lit("head").as("snap"), $"o_orderkey", $"o_custkey",
          $"price_usd")
        .unionAll(tab.read(asOf = Some(0L))
          .select(lit("v0").as("snap"), $"o_orderkey", $"o_custkey",
            $"o_totalprice".as("price_usd")))
        .orderBy($"snap", $"o_orderkey")
    },
    Some("""SELECT 'head' AS snap, o_orderkey, o_custkey,
           |       o_totalprice AS price_usd
           |FROM orders
           |UNION ALL
           |SELECT 'v0', o_orderkey, o_custkey, o_totalprice
           |FROM orders WHERE o_orderkey % 2 = 0
           |ORDER BY snap, o_orderkey""".stripMargin))

  /** Aggregate IVM ([[graft.ext.Ivm.foldCountSum]]): a per-status
    * (count, sum-of-cents) state table maintained purely from the change
    * feed across create → append → merge-on-read delete → update, where
    * the update REWRITES THE GROUP KEY itself (status → 'X') — rows
    * migrate between groups via the feed's delete+insert pair, the
    * hardest distributive-agg maintenance case. The state is never
    * recomputed from bronze after v0; the oracle computes the batch
    * aggregate of the FINAL bronze content relationally, so one missed
    * retraction, one double-applied insert, or one group left behind at
    * count 0 breaks the hash. Cents are exact longs — maintained state
    * must be bit-identical, not approximately equal.
    */
  val extLakeIvmAgg = Q(
    "ext_lake_ivm_agg",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus",
          floor($"o_totalprice" * 100 + 0.5).cast("long").as("price_cents"))
      val bronze = new TxTable(s, scratch("lake_ivma_bronze", dir))
      bronze.create(orders.where($"o_orderkey" % 2 === 0)
        .repartitionByRange(4, $"o_orderkey"),
        enableChangeDataFeed = true)                            // v0
      bronze.append(orders.where($"o_orderkey" % 2 === 1))      // v1
      bronze.deleteWhereMergeOnRead($"price_cents" < 10000000L) // v2
      bronze.update($"price_cents" > 40000000L,
        Map("o_orderstatus" -> lit("X")))                       // v3
      val state = new TxTable(s, scratch("lake_ivma_state", dir))
      state.create(bronze.read(asOf = Some(0L))
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum($"price_cents").as("sum_cents")))
      (1L to bronze.version).foreach { v =>
        graft.ext.Ivm.foldCountSum(state,
          bronze.readChanges(v, v)
            .select($"o_orderstatus", $"price_cents", $"_change_type"),
          Seq("o_orderstatus"), "price_cents", "n_orders", "sum_cents")
      }
      state.read().orderBy($"o_orderstatus")
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n_orders,
           |       CAST(SUM(cents) AS BIGINT) AS sum_cents
           |FROM (SELECT CASE WHEN cents > 40000000 THEN 'X'
           |                  ELSE o_orderstatus END AS o_orderstatus,
           |             cents
           |      FROM (SELECT o_orderstatus,
           |                   CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
           |                     AS cents
           |            FROM orders)
           |      WHERE cents >= 10000000)
           |GROUP BY o_orderstatus
           |ORDER BY o_orderstatus""".stripMargin))

  /** MIN/MAX IVM with bounded retraction
    * ([[graft.ext.Ivm.foldCountSumMinMax]]): the per-status state now
    * also maintains min/max cents through a DELETE-HEAVY history built
    * to retract extrema — v2 deletes every group's low end (min
    * retraction), v3 re-keys the high end to 'X' (the preimages retract
    * every group's max; the postimages build X's extrema delta-only),
    * v4 scatters deletes across the range (some hit extrema and
    * recompute, most stay delta-propagated). Retraction recomputes read
    * ONLY the affected groups through the stats/bloom-pruned multi-key
    * point read — never the whole bronze table. The oracle batch-
    * recomputes all five aggregates from final bronze content: one
    * stale extremum after any retraction breaks the hash.
    */
  val extLakeIvmMinMax = Q(
    "ext_lake_ivm_minmax",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus",
          floor($"o_totalprice" * 100 + 0.5).cast("long").as("price_cents"))
      val bronze = new TxTable(s, scratch("lake_ivmm_bronze", dir))
      bronze.create(orders.where($"o_orderkey" % 2 === 0)
        .repartitionByRange(4, $"o_orderkey"),
        enableChangeDataFeed = true)                            // v0
      bronze.append(orders.where($"o_orderkey" % 2 === 1))      // v1
      bronze.deleteWhereMergeOnRead($"price_cents" < 10000000L) // v2: minima
      bronze.update($"price_cents" > 40000000L,
        Map("o_orderstatus" -> lit("X")))                       // v3: maxima
      bronze.deleteWhere($"price_cents" % 7L === 0L)            // v4: scatter
      val state = new TxTable(s, scratch("lake_ivmm_state", dir))
      state.create(bronze.read(asOf = Some(0L))
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum($"price_cents").as("sum_cents"),
          min($"price_cents").as("min_cents"),
          max($"price_cents").as("max_cents")))
      (1L to bronze.version).foreach { v =>
        graft.ext.Ivm.foldCountSumMinMax(state, bronze, v,
          bronze.readChanges(v, v)
            .select($"o_orderstatus", $"price_cents", $"_change_type"),
          Seq("o_orderstatus"), "price_cents",
          "n_orders", "sum_cents", "min_cents", "max_cents")
      }
      state.read().orderBy($"o_orderstatus")
    },
    Some("""SELECT o_orderstatus, COUNT(*) AS n_orders,
           |       CAST(SUM(cents) AS BIGINT) AS sum_cents,
           |       CAST(MIN(cents) AS BIGINT) AS min_cents,
           |       CAST(MAX(cents) AS BIGINT) AS max_cents
           |FROM (SELECT CASE WHEN cents > 40000000 THEN 'X'
           |                  ELSE o_orderstatus END AS o_orderstatus,
           |             cents
           |      FROM (SELECT o_orderstatus,
           |                   CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
           |                     AS cents
           |            FROM orders)
           |      WHERE cents >= 10000000)
           |WHERE cents % 7 <> 0
           |GROUP BY o_orderstatus
           |ORDER BY o_orderstatus""".stripMargin))

  /** DESCRIBE DETAIL ([[graft.lake.TxTable.detail]]): the one-row
    * operational summary, resolved purely from log metadata — zero data
    * files opened. Scripted to exercise every surface at once: a
    * partitioned table on a GENERATED column with CDF on from birth, a
    * CHECK constraint, and a deletion-vector delete — so the head
    * detail must show the live/shadowed row split, both protocol
    * halves' stamps (reader: deletionVectors; writer: changeDataFeed +
    * checkConstraints + deletionVectors + generatedColumns), the
    * partition spec and the constraint count, while the v0 time-travel
    * detail shows the clean birth state. Nondeterministic fields
    * (location, file count/bytes — layout-dependent) are projected
    * away; everything else is oracle-pinned.
    */
  val extLakeDetail = Q(
    "ext_lake_detail",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice",
          $"o_orderdate")
      val tab = new TxTable(s, scratch("lake_detail", dir))
      tab.create(orders, partitionCols = Seq("o_year"),
        generatedColumns = Map("o_year" -> "year(o_orderdate)"),
        enableChangeDataFeed = true)                        // v0
      tab.addConstraint("o_totalprice >= 0")                // v1
      tab.deleteWhereMergeOnRead($"o_orderkey" % 97 === 0)  // v2: DVs
      def slim(d: DataFrame, snapName: String) =
        d.select(lit(snapName).as("snap"), $"version", $"num_rows",
          $"dv_shadowed_rows",
          array_join($"partition_columns", ",").as("partition_cols"),
          array_join($"reader_features", ",").as("reader_feats"),
          array_join($"writer_features", ",").as("writer_feats"),
          array_join(sort_array(map_keys($"generated_columns")), ",")
            .as("generated_cols"),
          $"cdf_enabled", $"num_constraints",
          // feed bytes are layout-dependent; the PRESENCE of staged
          // change data at each version is deterministic (v2's DV
          // delete captured, v0 clean)
          ($"cdf_feed_files" > 0).as("has_feed"))
      slim(tab.detail(), "head")
        .unionAll(slim(tab.detail(asOf = Some(0L)), "v0"))
        .orderBy($"snap")
    },
    Some("""SELECT 'head' AS snap, CAST(2 AS BIGINT) AS version,
           |       (SELECT COUNT(*) FROM orders WHERE o_orderkey % 97 <> 0)
           |         AS num_rows,
           |       (SELECT COUNT(*) FROM orders WHERE o_orderkey % 97 = 0)
           |         AS dv_shadowed_rows,
           |       'o_year' AS partition_cols,
           |       'deletionVectors' AS reader_feats,
           |       'changeDataFeed,checkConstraints,deletionVectors,generatedColumns'
           |         AS writer_feats,
           |       'o_year' AS generated_cols,
           |       TRUE AS cdf_enabled, CAST(1 AS BIGINT) AS num_constraints,
           |       TRUE AS has_feed
           |UNION ALL
           |SELECT 'v0', CAST(0 AS BIGINT),
           |       (SELECT COUNT(*) FROM orders), CAST(0 AS BIGINT),
           |       'o_year', '', 'changeDataFeed,generatedColumns', 'o_year',
           |       TRUE, CAST(0 AS BIGINT), FALSE
           |ORDER BY snap""".stripMargin))

  /** ROW TRACKING ([[graft.lake.TxTable.readWithRowIds]], Delta's row
    * tracking): every row's `_row_id` must survive an UPDATE (content
    * changes, identity doesn't), a global OPTIMIZE (files churn,
    * identity doesn't) and a DELETE's survivor rewrite. Concrete id
    * VALUES depend on physical partition layout, so the query proves
    * the invariants relationally: per surviving key, `id_stable` joins
    * the head id against the v0 id (one drifted id breaks the hash),
    * and an in-query REQUIRE pins global uniqueness. The post-update
    * status rides along so the rewrite is proven to be the real one.
    */
  val extLakeRowTracking = Q(
    "ext_lake_row_tracking",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      val tab = new TxTable(s, scratch("lake_rowtrack", dir))
      tab.create(orders.repartitionByRange(4, $"o_orderkey"),
        enableRowTracking = true)                           // v0
      tab.update($"o_totalprice" > 400000.0,
        Map("o_orderstatus" -> lit("X")))                   // v1: rewrite
      tab.optimize()                                        // v2: churn
      tab.deleteWhere($"o_orderkey" % 3 === 0)              // v3: survivors
      val v0 = tab.readWithRowIds(asOf = Some(0L))
        .select($"o_orderkey", $"_row_id".as("rid0"))
      val head = tab.readWithRowIds()
        .select($"o_orderkey", $"o_orderstatus", $"_row_id".as("rid"))
      val n = head.count()
      require(head.select($"rid").distinct().count() == n,
        "row ids must stay globally unique through the rewrites")
      head.join(v0, Seq("o_orderkey"))
        .select($"o_orderkey", $"o_orderstatus",
          ($"rid" === $"rid0").as("id_stable"))
        .orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey,
           |       CASE WHEN o_totalprice > 400000 THEN 'X'
           |            ELSE o_orderstatus END AS o_orderstatus,
           |       TRUE AS id_stable
           |FROM orders
           |WHERE o_orderkey % 3 <> 0
           |ORDER BY o_orderkey""".stripMargin))

  /** ROW IDS THROUGH THE CHANGE FEED ([[graft.lake.TxTable
    * .readChanges]]`(withRowIds)` + [[graft.lake.TxTable
    * .applyChangesById]], Delta's row-tracking × CDF integration): on a
    * tracked CDF table every captured image carries its stable
    * `_row_id`, so (a) an update's pre/postimage pair joins BY ID
    * ALONE — zero key assumptions — and (b) a replica maintains itself
    * from the feed with no key argument at all, storing the upstream's
    * identities verbatim. The query scripts update → optimize (pure
    * rewrite: REQUIREd empty feed) → delete, drives a keyless replica
    * over every version slice, REQUIREs replica ≡ upstream INCLUDING
    * ids, and emits the id-joined update pairs plus the deleted rows —
    * a broken id on either side of a pair breaks the join and the
    * hash.
    */
  val extLakeCdfRowIds = Q(
    "ext_lake_cdf_row_ids",
    (s, dir) => {
      import s.implicits._
      val region = t(s, dir, "region").select($"r_regionkey", $"r_name")
      val up = new TxTable(s, scratch("lake_cdf_rid", dir))
      up.create(region.repartition(3), enableChangeDataFeed = true,
        enableRowTracking = true)                              // v0
      val vUpd = up.update($"r_regionkey" % 2 === 0,
        Map("r_name" -> concat($"r_name", lit("_V2"))))        // v1
      val vOpt = up.optimize()                                 // v2: churn
      require(vOpt > vUpd, "optimize must have compacted something")
      val vDel = up.deleteWhere($"r_regionkey" === 1)          // v3
      require(up.readChanges(vOpt, vOpt).limit(1).count() == 0,
        "OPTIMIZE is a pure rewrite: its feed slice must be empty")
      // keyless replica: fold each version's id-carrying slice in
      val replica = new TxTable(s, scratch("lake_cdf_rid_rep", dir))
      replica.create(region.limit(0), enableRowTracking = true)
      (0L to up.version).foreach { v =>
        val slice = up.readChanges(v, v, withRowIds = true)
        if (slice.limit(1).count() > 0) replica.applyChangesById(slice)
      }
      val a = up.readWithRowIds()
        .select($"r_regionkey", $"r_name", $"_row_id")
      val b = replica.readWithRowIds()
        .select($"r_regionkey", $"r_name", $"_row_id")
      require(a.exceptAll(b).limit(1).count() == 0 &&
        b.exceptAll(a).limit(1).count() == 0,
        "keyless replica must equal the upstream INCLUDING row ids")
      val feed1 = up.readChanges(vUpd, vUpd, withRowIds = true)
      val pre = feed1.where($"_change_type" === "update_preimage")
        .select($"_row_id", $"r_regionkey", $"r_name".as("old_name"))
      val post = feed1.where($"_change_type" === "update_postimage")
        .select($"_row_id", $"r_name".as("new_name"))
      val pairs = pre.join(post, "_row_id")
        .select(lit("update").as("kind"), $"r_regionkey", $"old_name",
          $"new_name")
      val dels = up.readChanges(vDel, vDel, withRowIds = true)
        .where($"_change_type" === "delete")
        .select(lit("delete").as("kind"), $"r_regionkey",
          $"r_name".as("old_name"),
          lit(null).cast("string").as("new_name"))
      pairs.unionByName(dels).orderBy($"kind", $"r_regionkey")
    },
    Some("""SELECT 'delete' AS kind, r_regionkey, r_name AS old_name,
           |       CAST(NULL AS VARCHAR) AS new_name
           |FROM region WHERE r_regionkey = 1
           |UNION ALL
           |SELECT 'update', r_regionkey, r_name, r_name || '_V2'
           |FROM region WHERE r_regionkey % 2 = 0
           |ORDER BY kind, r_regionkey""".stripMargin))

  /** IDENTITY COLUMNS + DEFAULT VALUES ([[graft.lake.TxTable.create]]'s
    * `identityColumns`/`defaultValues` — Delta's GENERATED ALWAYS AS
    * IDENTITY and column DEFAULTs): `order_sn` is allocated by the
    * table (monotonic from the logged watermark; the create frame and
    * every append must NOT supply it), `status` defaults to 'NEW' when
    * an ingest frame lacks it and keeps explicit values otherwise.
    * Single-partition writes make the allocation contiguous, so the
    * REQUIREs pin uniqueness and the exact [1, n] range across three
    * commits; the oracle pins the per-status relational surface (a
    * null-filled default or a skipped allocation breaks either). Both
    * declarations stamp writer features; refusal behavior (explicit
    * identity, UPDATE/MERGE/RENAME/DROP) is TxIdentityDefaultSpec's.
    */
  val extLakeIdentityDefault = Q(
    "ext_lake_identity_default",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_totalprice")
      val tab = new TxTable(s, scratch("lake_ident", dir))
      tab.create(orders.where($"o_orderkey" % 3 === 0)
        .withColumn("status", lit("SEED")).coalesce(1),
        identityColumns = Seq("order_sn"),
        defaultValues = Map("status" -> "'NEW'"))                // v0
      tab.append(orders.where($"o_orderkey" % 3 === 1).coalesce(1)) // v1
      tab.append(orders.where($"o_orderkey" % 3 === 2)
        .withColumn("status", lit("EXPLICIT")).coalesce(1))      // v2
      val g = tab.read()
      val n = g.count()
      require(g.select($"order_sn").distinct().count() == n,
        "identity values must be unique across commits")
      val mm = g.agg(min($"order_sn"), max($"order_sn")).collect().head
      require(mm.getLong(0) == 1L && mm.getLong(1) == n,
        "single-partition writes must allocate contiguously from 1")
      g.groupBy($"status")
        .agg(count(lit(1)).as("n_rows"),
          sum($"o_orderkey").as("sum_key"))
        .orderBy($"status")
    },
    Some("""SELECT CASE WHEN o_orderkey % 3 = 0 THEN 'SEED'
           |            WHEN o_orderkey % 3 = 1 THEN 'NEW'
           |            ELSE 'EXPLICIT' END AS status,
           |       COUNT(*) AS n_rows,
           |       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
           |FROM orders GROUP BY 1 ORDER BY status""".stripMargin))

  /** DROP COLUMN + re-add under column mapping
    * ([[graft.lake.TxTable.dropColumn]]): o_custkey is dropped
    * metadata-only (the query REQUIREs no data file changed), then a
    * later append RE-ADDS a column with the same name carrying shifted
    * values — additive evolution maps it to a FRESH physical name, so
    * the pre-drop files must read NULL in it, never their old custkeys.
    * Resurrection is the bug this design exists to prevent: one leaked
    * original custkey on an even orderkey breaks the hash. v0 time
    * travel still serves the original column from its own metadata.
    */
  val extLakeSchemaDrop = Q(
    "ext_lake_schema_drop",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val tab = new TxTable(s, scratch("lake_drop", dir))
      tab.create(orders.where($"o_orderkey" % 2 === 0))       // v0
      val filesBefore = tab.read().inputFiles.toSet
      tab.dropColumn("o_custkey")                             // v1: metadata
      require(tab.read().inputFiles.toSet == filesBefore,
        "DROP COLUMN must not touch a single data file")
      require(!tab.read().columns.contains("o_custkey"),
        "dropped column leaked into the head schema")
      tab.append(orders.where($"o_orderkey" % 2 === 1)        // v2: re-add,
        .withColumn("o_custkey", $"o_custkey" + 555L))        // fresh physical
      tab.read()
        .select(lit("head").as("snap"), $"o_orderkey", $"o_custkey",
          $"o_totalprice")
        .unionAll(tab.read(asOf = Some(0L))
          .select(lit("v0").as("snap"), $"o_orderkey", $"o_custkey",
            $"o_totalprice"))
        .orderBy($"snap", $"o_orderkey")
    },
    Some("""SELECT 'head' AS snap, o_orderkey,
           |       CASE WHEN o_orderkey % 2 = 1 THEN o_custkey + 555 END
           |         AS o_custkey,
           |       o_totalprice
           |FROM orders
           |UNION ALL
           |SELECT 'v0', o_orderkey, o_custkey, o_totalprice
           |FROM orders WHERE o_orderkey % 2 = 0
           |ORDER BY snap, o_orderkey""".stripMargin))

  /** Bloom-index point lookups ([[graft.lake.TxTable.addBloomIndex]] /
    * [[graft.lake.TxTable.readEquals]]): the table is laid out
    * hash-random on a DIFFERENT column, so every file spans ~the whole
    * o_orderkey range and min/max stats prune nothing — the REQUIRE
    * pins that the bloom sidecars still skip files for a point key.
    * Three deterministic keys (min, max, first-past-midpoint — the same
    * scalars the oracle derives relationally) are looked up and
    * unioned; a false negative (bloom skipping a file that held the
    * key) loses a row and breaks the hash.
    */
  val extLakeBloomLookup = Q(
    "ext_lake_bloom_lookup",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val root = scratch("lake_bloom", dir)
      val tab = new TxTable(s, root)
      tab.create(orders.repartition(8, $"o_custkey"))
      tab.addBloomIndex("o_orderkey")
      val r0 = orders.agg(min($"o_orderkey"), max($"o_orderkey")).head
      val (k1, k2) = (r0.getLong(0), r0.getLong(1))
      val k3 = orders.where($"o_orderkey" >= (k1 + k2) / 2)
        .agg(min($"o_orderkey")).head.getLong(0)
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val snap = graft.lake.TxLog.snapshot(fs,
        new org.apache.hadoop.fs.Path(root))
      val kept = tab.bloomCandidateFiles(snap, "o_orderkey", k3)
      require(kept.size < snap.adds.size,
        s"bloom must skip files stats cannot: kept ${kept.size}/${snap.adds.size}")
      Seq(k1, k2, k3).distinct
        .map(k => tab.readEquals("o_orderkey", k))
        .reduce(_ unionAll _)
        .orderBy($"o_orderkey")
    },
    Some("""WITH b AS (SELECT MIN(o_orderkey) AS k1, MAX(o_orderkey) AS k2
           |           FROM orders),
           |m AS (SELECT MIN(o_orderkey) AS k3 FROM orders, b
           |      WHERE o_orderkey >= (b.k1 + b.k2) // 2)
           |SELECT o_orderkey, o_custkey, o_totalprice
           |FROM orders, b, m
           |WHERE o_orderkey IN (b.k1, b.k2, m.k3)
           |ORDER BY o_orderkey""".stripMargin))

  /** Conditional MERGE ([[graft.lake.TxTable.mergeInto]], Delta's full
    * clause surface) exercising every clause class at once, with clause
    * ORDER load-bearing: matched cheap orders DELETE (first clause
    * wins), remaining matched rows UPDATE (status 'M', price +1000),
    * high-value source-only rows INSERT under a condition, and NOT
    * MATCHED BY SOURCE rewrites expensive untouched orders to 'Z'. The
    * oracle reconstructs the exact same CASE cascade relationally — a
    * swapped clause order, a leaked conditional insert, or a by-source
    * row the scan missed each breaks the hash.
    */
  val extLakeMergeConditional = Q(
    "ext_lake_merge_conditional",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_orderstatus",
          $"o_totalprice")
      val tab = new TxTable(s, scratch("lake_mergec", dir))
      tab.create(orders.repartitionByRange(6, $"o_orderkey"))
      val source = orders.where($"o_orderkey" % 3 === 0)
        .unionAll(orders.where($"o_orderkey" % 5 === 0)
          .withColumn("o_orderkey", $"o_orderkey" + 100000000L))
      tab.mergeInto(source, Seq("o_orderkey"))
        .whenMatchedDelete(Some(col("t.o_totalprice") < 50000.0))
        .whenMatchedUpdate(Map(
          "o_orderstatus" -> lit("M"),
          "o_totalprice" -> (col("s.o_totalprice") + 1000.0)))
        .whenNotMatchedInsert(Some(col("s.o_totalprice") > 200000.0))
        .whenNotMatchedBySourceUpdate(
          Map("o_orderstatus" -> lit("Z")),
          Some(col("t.o_totalprice") > 400000.0))
        .execute()
      tab.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey,
           |       CASE WHEN o_orderkey % 3 = 0 THEN 'M'
           |            WHEN o_totalprice > 400000 THEN 'Z'
           |            ELSE o_orderstatus END AS o_orderstatus,
           |       CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice + 1000.0
           |            ELSE o_totalprice END AS o_totalprice
           |FROM orders
           |WHERE NOT (o_orderkey % 3 = 0 AND o_totalprice < 50000)
           |UNION ALL
           |SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
           |       o_totalprice
           |FROM orders
           |WHERE o_orderkey % 5 = 0 AND o_totalprice > 200000
           |ORDER BY o_orderkey""".stripMargin))

  /** TIMESTAMP AS OF over in-commit timestamps
    * ([[graft.lake.TxTable.readAsOfTimestamp]]): commits carry strictly
    * monotonic stamps (max(clock, prev+1), so even same-millisecond
    * commits order), and resolution picks the newest version at-or-
    * before the instant. The probe instants come from the log itself
    * (v1's own stamp; one tick before v2's), making the CONTENT
    * deterministic while the stamps are real wall clock: reading at
    * v1's stamp must see all rows — the v2 delete invisible — which is
    * exactly the oracle relation. Pre-first-commit instants REQUIREd
    * to refuse; a far-future instant resolves to head.
    */
  val extLakeTimeTravelTs = Q(
    "ext_lake_time_travel_ts",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      val tab = new TxTable(s, scratch("lake_ttts", dir))
      tab.create(orders.where($"o_orderkey" % 2 === 0))  // v0
      tab.append(orders.where($"o_orderkey" % 2 === 1))  // v1
      tab.deleteWhere($"o_totalprice" < 200000.0)        // v2
      val ts0 = tab.commitTimestamp(0L).get
      val ts1 = tab.commitTimestamp(1L).get
      val ts2 = tab.commitTimestamp(2L).get
      require(ts0 < ts1 && ts1 < ts2, "in-commit stamps must be monotonic")
      require(tab.versionAtTimestamp(ts1) == 1L)
      require(tab.versionAtTimestamp(ts2 - 1) == 1L,
        "one tick before v2 still resolves to v1")
      require(tab.versionAtTimestamp(ts2 + 3600000L) == 2L,
        "a future instant resolves to head")
      val refused =
        try { tab.versionAtTimestamp(ts0 - 1); false }
        catch { case _: IllegalArgumentException => true }
      require(refused, "a pre-first-commit instant must refuse")
      tab.readAsOfTimestamp(ts1).orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** Partition evolution ([[graft.lake.TxTable.repartitionBy]] —
    * Iceberg's metadata-only spec change, which Delta lacks): an
    * unpartitioned orders table evolves to PARTITION BY o_orderstatus
    * without touching a file (REQUIREd), the next append lands in the
    * new layout, and the mixed table must read whole — the status
    * column coming from file bytes for old files and directory values
    * for new ones. A value-pruned read must also prune BOTH layouts
    * (old by stats, new by directory values — REQUIREd to skip files).
    * repartitionRewrite then homogenizes (REQUIREd) with identical
    * content, which is what the oracle checks relationally: one row
    * lost in migration, or a status mis-attached from the wrong side
    * of the layout, breaks the hash.
    */
  val extLakePartitionEvolution = Q(
    "ext_lake_partition_evolution",
    (s, dir) => {
      import s.implicits._
      val orders = t(s, dir, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      val root = scratch("lake_pevo", dir)
      val tab = new TxTable(s, root)
      tab.create(orders.where($"o_orderkey" % 2 === 0)
        .repartitionByRange(4, $"o_orderkey"))            // v0: unpart.
      val before = tab.read().inputFiles.toSet
      tab.repartitionBy(Seq("o_orderstatus"))             // v1: metadata
      require(tab.read().inputFiles.toSet == before,
        "partition evolution must not touch a single data file")
      tab.append(orders.where($"o_orderkey" % 2 === 1))   // v2: new layout
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val snap = graft.lake.TxLog.snapshot(fs,
        new org.apache.hadoop.fs.Path(root))
      require(snap.adds.exists(_.partitionValues.contains("o_orderstatus"))
        && snap.adds.exists(!_.partitionValues.contains("o_orderstatus")),
        "both layouts must coexist before the rewrite")
      val kept = tab.candidateFiles(snap, "o_orderstatus", "F", "F")
      require(kept.size < snap.adds.size,
        s"value pruning must skip files in BOTH layouts: " +
          s"kept ${kept.size}/${snap.adds.size}")
      tab.repartitionRewrite()                            // v3: homogenize
      require(graft.lake.TxLog.snapshot(fs,
          new org.apache.hadoop.fs.Path(root))
        .adds.forall(_.partitionValues.keySet == Set("o_orderstatus")),
        "rewrite must leave one homogeneous layout")
      tab.read().orderBy($"o_orderkey")
    },
    Some("""SELECT o_orderkey, o_orderstatus, o_totalprice
           |FROM orders ORDER BY o_orderkey""".stripMargin))

  /** CLUSTER BY (Delta's liquid-clustering shape: [[graft.lake.TxTable
    * .create]]`(clusterBy)` + [[graft.lake.TxTable.optimize]]'s
    * automatic N-way Morton re-cluster): clustering columns are fixed
    * at CREATE and ride the log's Meta; the create frame lands
    * clustered, appends land as written (best-effort), and a plain
    * OPTIMIZE — no arguments — re-clusters every live file along the
    * stored columns' curve. The payoff is multi-dimensional file
    * skipping: in-query REQUIREs pin that a narrow range on EITHER
    * clustered column excludes files after OPTIMIZE, and that DESCRIBE
    * DETAIL reports the clustering spec; the emitted rows are the two
    * range reads themselves, oracle-checked against plain SQL.
    */
  val extLakeClusterBy = Q(
    "ext_lake_cluster_by",
    (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_partkey", $"l_linenumber", $"l_quantity")
      val tab = new TxTable(s, scratch("lake_cluster", dir))
      tab.create(li.where($"l_orderkey" % 2 === 0),
        clusterBy = Seq("l_orderkey", "l_partkey"))      // v0 clustered
      tab.append(li.where($"l_orderkey" % 2 =!= 0))      // v1 as-written
      tab.optimize()                                     // v2 re-cluster
      val clusterSpec = tab.detail()
        .select(array_join($"clustering_columns", ",")).as[String].head()
      require(clusterSpec == "l_orderkey,l_partkey",
        s"DESCRIBE DETAIL must report the clustering spec, got $clusterSpec")
      // a 1/8-of-range box on EITHER dimension must exclude files — the
      // observable multi-dim locality the curve exists for
      val fs = new org.apache.hadoop.fs.Path(scratch("lake_cluster", dir))
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      val snap = graft.lake.TxLog.snapshot(fs,
        new org.apache.hadoop.fs.Path(scratch("lake_cluster", dir)))
      // ZCube merging, pinned SCALE-INVARIANTLY: after OPTIMIZE every
      // live file is cube-stamped and AT MOST ONE undersized cube may
      // remain (the merge invariant — small passes must not accrete
      // tiny cubes). At gate scales the create-era cube is undersized,
      // so that collapses to exactly ONE cube; at 10×+ scales both
      // eras exceed minCubeRows and correctly stay separate cubes.
      require(snap.adds.forall(_.zcube.isDefined),
        "every live file must be cube-stamped after OPTIMIZE")
      val cubeRows = snap.adds.groupBy(_.zcube.get)
        .map { case (_, as) => as.map(_.rows).sum }
      require(cubeRows.count(_ < graft.ScaleConfig.minCubeRows) <= 1,
        s"small cubes accreted: ${cubeRows.toSeq.sorted} vs " +
          s"minCubeRows ${graft.ScaleConfig.minCubeRows}")
      if (snap.adds.map(_.rows).sum < graft.ScaleConfig.minCubeRows)
        require(cubeRows.size == 1,
          s"undersized cubes must merge into one, got ${cubeRows.size} " +
            s"cubes over ${snap.adds.size} files")
      val r = li.agg(min($"l_orderkey"), max($"l_orderkey"),
        min($"l_partkey"), max($"l_partkey")).as[(Long, Long, Long, Long)]
        .head()
      val (okLo, okHi) = (r._1, r._1 + (r._2 - r._1) / 8)
      val (pkLo, pkHi) = (r._3, r._3 + (r._4 - r._3) / 8)
      Seq("l_orderkey" -> (okLo, okHi), "l_partkey" -> (pkLo, pkHi))
        .foreach { case (c, (lo, hi)) =>
          require(tab.candidateFiles(snap, c, lo, hi).size < snap.adds.size,
            s"a narrow $c range must skip files on the clustered layout") }
      tab.readBetween("l_orderkey", okLo, okHi)
        .withColumn("dim", lit("l_orderkey"))
        .unionByName(tab.readBetween("l_partkey", pkLo, pkHi)
          .withColumn("dim", lit("l_partkey")))
        .orderBy($"dim", $"l_orderkey", $"l_partkey", $"l_linenumber")
    },
    Some("""WITH b AS (SELECT MIN(l_orderkey) AS oklo,
           |                  MIN(l_orderkey) + (MAX(l_orderkey) - MIN(l_orderkey)) // 8 AS okhi,
           |                  MIN(l_partkey) AS pklo,
           |                  MIN(l_partkey) + (MAX(l_partkey) - MIN(l_partkey)) // 8 AS pkhi
           |           FROM lineitem)
           |SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
           |       'l_orderkey' AS dim
           |FROM lineitem, b WHERE l_orderkey BETWEEN oklo AND okhi
           |UNION ALL
           |SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
           |       'l_partkey' AS dim
           |FROM lineitem, b WHERE l_partkey BETWEEN pklo AND pkhi
           |ORDER BY dim, l_orderkey, l_partkey, l_linenumber""".stripMargin))

  /** CLUSTER BY over a STRING key ([[graft.ext.ZOrderLayout]]'s
    * sortable-rank transform): string keys rank through the 7-byte
    * big-endian slice after the min/max-derived SHARED PREFIX (a
    * corpus of `Customer#000...`-style ids would otherwise rank
    * constant and get no locality). REQUIREs pin file pruning on BOTH
    * dimensions — a single-value l_returnflag box and a 1/8-range
    * l_orderkey box each skip files — phrased scale-invariantly. The
    * emitted rows are the string-box read-back; the oracle recomputes
    * the same box relationally.
    */
  val extLakeClusterByString = Q(
    "ext_lake_cluster_by_string",
    (s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem")
        .select($"l_orderkey", $"l_partkey", $"l_linenumber",
          $"l_returnflag", $"l_quantity")
      val root = scratch("lake_cluster_str", dir)
      val tab = new TxTable(s, root)
      tab.create(li.where($"l_orderkey" % 2 === 0),
        clusterBy = Seq("l_returnflag", "l_orderkey"))
      tab.append(li.where($"l_orderkey" % 2 =!= 0))
      tab.optimize()
      val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      val snap = graft.lake.TxLog.snapshot(fs,
        new org.apache.hadoop.fs.Path(root))
      val loFlag = li.agg(min($"l_returnflag")).as[String].head()
      require(tab.candidateFiles(snap, "l_returnflag", loFlag, loFlag)
          .size < snap.adds.size,
        "a single-value l_returnflag box must skip files on the " +
          "string-clustered layout")
      val ok = li.agg(min($"l_orderkey"), max($"l_orderkey"))
        .as[(Long, Long)].head()
      val (okLo, okHi) = (ok._1, ok._1 + (ok._2 - ok._1) / 8)
      require(tab.candidateFiles(snap, "l_orderkey", okLo, okHi).size
          < snap.adds.size,
        "a narrow l_orderkey box must skip files — the string key " +
          "must not monopolize the curve")
      tab.readBetween("l_returnflag", loFlag, loFlag)
        .select($"l_orderkey", $"l_partkey", $"l_linenumber",
          $"l_returnflag", $"l_quantity")
        .orderBy($"l_orderkey", $"l_partkey", $"l_linenumber")
    },
    Some("""WITH b AS (SELECT MIN(l_returnflag) AS lof FROM lineitem)
           |SELECT l.l_orderkey, l.l_partkey, l.l_linenumber,
           |       l.l_returnflag, l.l_quantity
           |FROM lineitem l, b
           |WHERE l.l_returnflag = b.lof
           |ORDER BY l.l_orderkey, l.l_partkey, l.l_linenumber""".stripMargin))

  val all: Seq[Q] = Seq(extLakeReplayDepth, extLakeChangeFeed,
    extLakeCdfByTimestamp, extStreamLakeStartingTs,
    extLakeDeleteDv, extLakeCdfIncremental, extLakeIvmAgg,
    extLakeIvmMinMax, extLakeVacuum,
    extLakeSchemaEvolution, extLakeSchemaRename, extLakeSchemaDrop,
    extLakeTypeWidening, extLakeSqlMaintenance, extLakeSqlDml,
    extLakeSqlSelect, extLakeSqlDdl, extLakeTblProperties,
    extLakeReorgPurge, extLakeChecksum, extLakeConvert,
    extLakeCloneDeep,
    extLakeAcid, extLakeTimeTravel, extLakeTimeTravelTs,
    extLakeConcurrentAppend, extLakeMerge, extLakeMergeConditional,
    extLakeMergeEvolution,
    extLakeSkippingScan, extLakeNativeScan, extStreamLakeSource,
    extStreamDsv2Source, extStreamDsv2Paced, extStreamDsv2Sink,
    extStreamDsv2Constraint, extStreamDsv2Rewrite,
    extStreamDsv2RowTracking,
    extStreamWindowLakeSink, extLakeReplaceWhere,
    extStreamLakeSink,
    extStreamLakeToLake, extStreamCdf, extStreamCdfApply,
    extLakeBloomLookup, extLakePartitionEvolution, extLakeGeneratedCol,
    extStreamLakeIngest, pipelineLakeMedallion,
    extLakeOptimize,
    extLakeHistory, extLakeDetail, extLakeRowTracking, extLakeCdfRowIds,
    extLakeIdentityDefault, extLakeZorderScan, extLakeClusterBy,
    extLakeClone, extLakeRestore, extLakeConstraint, extLakeUpdate,
    extLakeClusterByString)
}
