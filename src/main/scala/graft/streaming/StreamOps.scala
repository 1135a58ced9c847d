package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface (the reference has none — SURVEY.md §1.1
  * notes its clickstream is plain batch; these give the engine true
  * streaming semantics over the same events schema).
  */
object StreamOps {

  /** Tumbling- or sliding-window counts per event type with a watermark
    * for late data (`slide` < `window_` makes each event contribute to
    * window_/slide overlapping windows). `complete` output + memory sink
    * lets a static parquet batch drive the query to a deterministic
    * final state in tests/harness.
    */
  def windowedEventCounts(events: DataFrame, window_ : String = "5 minutes",
      watermark: String = "10 minutes",
      slide: Option[String] = None): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide.getOrElse(window_)),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).cast("decimal(38,6)")
          .as("sum_value"))

  final case class Event(user_id: Long, event_id: Long, ts: Timestamp)
  final case class SessionAgg(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long)
  final case class SessionState(
      start: Long, last: Long, n: Long, emitted: List[SessionAgg])

  /** Stateful sessionization (30-min inactivity gap) with
    * flatMapGroupsWithState — the streaming twin of
    * ExtQueries.extSessionize; state is one (start, last, count) triple
    * per user, emitted when a gap closes a session. All time arithmetic
    * is in MICROseconds (Spark's TimestampType precision) via
    * DateTimeUtils — `Timestamp.getTime` would truncate to millis and
    * silently diverge from the batch/SQL epoch_us semantics.
    */
  def sessionize(events: Dataset[Event], gapSeconds: Long = 1800)
      : Dataset[SessionAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = rows.toSeq
            .sortBy(e => (DateTimeUtils.fromJavaTimestamp(e.ts), e.event_id))
          var st = state.getOption.getOrElse(SessionState(-1, -1, 0, Nil))
          var out = List.empty[SessionAgg]
          sorted.foreach { e =>
            val t = DateTimeUtils.fromJavaTimestamp(e.ts)
            if (st.start < 0) st = SessionState(t, t, 1, Nil)
            else if (t - st.last > gapSeconds * 1000000L) {
              out ::= SessionAgg(user, DateTimeUtils.toJavaTimestamp(st.start),
                DateTimeUtils.toJavaTimestamp(st.last), st.n)
              st = SessionState(t, t, 1, Nil)
            } else st = st.copy(last = math.max(st.last, t), n = st.n + 1)
          }
          state.update(st)
          out.reverseIterator
      }
  }

  /** Streaming exact dedup: drop duplicate event_ids among rows whose
    * event times are within the watermark of each other — state stays
    * bounded by the watermark horizon instead of growing with the stream
    * (the streaming twin of the batch dedup family).
    */
  def dedupStream(events: DataFrame, watermark: String = "10 minutes")
      : DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join (click→purchase attribution): each
    * purchase event joined to the SAME user's click events in the
    * preceding `windowSeconds`. Both sides carry event-time watermarks
    * and the join condition bounds click_ts to a finite interval around
    * purchase_ts, so Spark can expire join state instead of buffering
    * both streams forever — the state-bounding requirement for
    * stream-stream joins at scale. Inner join, append mode.
    */
  def clickAttribution(events: DataFrame, watermark: String = "10 minutes",
      windowSeconds: Long = 1800): DataFrame =
    attributionJoin(events, watermark, windowSeconds, "inner")
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))

  /** The one definition of the attribution join's sides, watermarks and
    * interval condition — the inner/left-outer/full-outer variants must
    * never drift apart (their oracles replicate this condition and the
    * state-watermark bounds it implies).
    */
  private def attributionJoin(events: DataFrame, watermark: String,
      windowSeconds: Long, joinType: String): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", watermark)
    purchases.join(clicks,
      col("c_user") === col("user_id")
        && col("click_ts") <= col("purchase_ts")
        && col("click_ts") >= col("purchase_ts")
          - expr(s"INTERVAL $windowSeconds SECONDS"),
      joinType)
  }

  /** Stream-stream LEFT OUTER interval join: like [[clickAttribution]],
    * but purchases with NO click in the window are also emitted — with
    * null click columns — once the watermark proves no future click can
    * match (a click for purchase p arrives at ts ≤ p.ts, so p finalizes
    * when the click-side watermark passes p.ts). Purchases inside the
    * final watermark window stay unemitted when the stream ends: the
    * engine cannot rule out a later match, which is exactly the
    * correctness contract outer stream joins trade latency for.
    */
  def clickAttributionOuter(events: DataFrame,
      watermark: String = "10 minutes", windowSeconds: Long = 1800)
      : DataFrame =
    attributionJoin(events, watermark, windowSeconds, "leftOuter")
      .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))

  /** Stream-stream FULL OUTER interval join: both finalization bounds at
    * once — unmatched purchases emit at p.ts ≤ W (no future click with
    * ts > W can satisfy click_ts ≤ p.ts), and unmatched clicks emit at
    * c.ts ≤ W − window (a future purchase with ts > W could still match
    * any younger click, so the engine must buffer the extra margin the
    * interval condition implies). The asymmetry IS the semantics the
    * oracle checks.
    */
  def clickAttributionFullOuter(events: DataFrame,
      watermark: String = "10 minutes", windowSeconds: Long = 1800)
      : DataFrame =
    attributionJoin(events, watermark, windowSeconds, "fullOuter")
      .select(coalesce(col("user_id"), col("c_user")).as("user_id"),
        col("purchase_id"), col("purchase_ts"),
        col("click_id"), col("click_ts"))

  /** Stream-static enrichment join — the standard streaming lookup
    * shape: each micro-batch joins the bounded dimension (broadcast: the
    * static side is re-resolved per batch and never forces the stream
    * to shuffle), then aggregates per (segment, event type). At scale
    * the dimension rides along as a broadcast (or a state-store-backed
    * lookup when it outgrows one); the unbounded side streams through
    * untouched. Complete mode, decimal aggregation.
    */
  def enrichWithDim(events: DataFrame, dim: DataFrame): DataFrame =
    events
      .join(org.apache.spark.sql.functions.broadcast(dim),
        col("user_id") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"))

  /** Streaming front door to the medallion lake: foreachBatch lands each
    * micro-batch as its own `etl_batch` partition via DYNAMIC partition
    * overwrite — retrying a FAILED batch rewrites its own partition
    * instead of appending duplicates (the parquet-terms version of a
    * Delta MERGE-by-batch-id). The checkpoint is REQUIRED: it pins batch
    * ids and source offsets, so a restart resumes after the last
    * committed batch instead of re-reading the source — without it a
    * restart may re-chunk the input into different batch boundaries,
    * leaving the prior run's higher-numbered `etl_batch` partitions
    * behind as duplicates (partition-overwrite idempotence only covers a
    * batch replayed with the SAME id). StreamingSpec pins both the
    * same-id replay (checkpoint lost, single batch) and the
    * multi-batch resume property. Downstream TableEtl nodes read the
    * result like any bronze table.
    */
  def startLakeSink(stream: DataFrame, targetPath: String,
      queryName: String, checkpointLocation: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .queryName(queryName)
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointLocation)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], id: Long) =>
        batch.withColumn("etl_batch", lit(id))
          .write
          .mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("etl_batch")
          .parquet(targetPath)
      }
      .start()

  /** Drive a streaming query over a static parquet directory to
    * completion and return the final result table (test/harness helper).
    * Complete mode suits unbounded aggregations; Append suits
    * flatMapGroupsWithState/dedup surfaces.
    *
    * `statePartitions` sizes the STATEFUL shuffle for the bounded feed:
    * a stateful operator commits one state store per shuffle partition
    * per micro-batch (a stream-stream join commits four), so running a
    * small test feed at the session's scale-sized partition count pays
    * 32×(stores) file commits per batch for near-empty stores. The
    * partition count is locked into the query at start; the session
    * conf is restored afterwards (results are partition-independent —
    * every streaming oracle re-verifies under this setting).
    *
    * NOT safe for CONCURRENT streaming queries on one SparkSession: the
    * conf set/restore races, and the loser could start (or finish the
    * restore) under the other query's partition count. Fine under the
    * repo's solo-run discipline; concurrent use would need a cloned
    * session (`spark.newSession()`) per query instead.
    */
  /** Like [[runToCompletion]], but drains the source in explicit STAGES:
    * each `stage()` callback mutates the source directory (drops the next
    * file in), then the query drains to idle before the next stage runs.
    * This pins the micro-batch schedule deterministically — late-data
    * scenarios need the watermark to be committed BETWEEN two files,
    * which a single drain of a pre-populated directory cannot guarantee
    * (the initial listing lands as one batch under watermark 0). The
    * no-data micro-batch Spark runs when a watermark advances (on by
    * default) finalizes closed windows between stages.
    */
  def runStaged(spark: SparkSession, sourceDir: String,
      schema: org.apache.spark.sql.types.StructType,
      transform: DataFrame => DataFrame, queryName: String,
      mode: OutputMode = OutputMode.Complete,
      statePartitions: Option[Int] = None,
      stages: Seq[() => Unit] = Seq.empty): DataFrame = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    statePartitions.foreach(n => spark.conf.set(key, n.toString))
    try {
      val stream = spark.readStream.schema(schema).parquet(sourceDir)
      val q = transform(stream).writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(queryName)
        .start()
      try stages.foreach { stage => stage(); q.processAllAvailable() }
      finally q.stop()
    } finally spark.conf.set(key, prev)
    spark.table(queryName)
  }

  /** Drive a streaming query over a static parquet directory through an
    * APPEND-mode parquet FILE sink — the production pattern the memory
    * sink merely simulates — then read the committed result back.
    * Exactly-once comes from the sink's own `_spark_metadata` commit
    * log: a reader sees only files of fully committed micro-batches,
    * and a replayed batch overwrites its slot in the log instead of
    * duplicating rows. Nothing passes through the driver — rows go
    * executor → parquet, so the path scales with executor count, not
    * driver memory. Only watermark-finalized rows are ever written
    * (append semantics), so the on-disk table equals the append-mode
    * emission set the memory-sink harness observes.
    */
  def runToFileSink(spark: SparkSession, sourceDir: String,
      schema: org.apache.spark.sql.types.StructType,
      transform: DataFrame => DataFrame,
      outDir: String, checkpointDir: String,
      statePartitions: Option[Int] = None): DataFrame = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    statePartitions.foreach(n => spark.conf.set(key, n.toString))
    try {
      val stream = spark.readStream.schema(schema).parquet(sourceDir)
      val q = transform(stream).writeStream
        .outputMode(OutputMode.Append)
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", checkpointDir)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    } finally spark.conf.set(key, prev)
    spark.read.parquet(outDir)
  }

  /** [[runToFileSink]]'s LAKE twin: the append-mode stream lands in a
    * txlog table through the DSv2 streaming write
    * ([[graft.lake.TxStreamingWrite]]) — each micro-batch one atomic
    * commit under the (queryId, epochId) writer transaction, rows
    * executor-staged, stats on every add. The destination table must
    * exist (its schema is the contract); the committed table content
    * is read back through the ordinary snapshot read. */
  def runToLakeSink(spark: SparkSession, sourceDir: String,
      schema: org.apache.spark.sql.types.StructType,
      transform: DataFrame => DataFrame,
      tableRoot: String, checkpointDir: String,
      statePartitions: Option[Int] = None): DataFrame = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    statePartitions.foreach(n => spark.conf.set(key, n.toString))
    try {
      val stream = spark.readStream.schema(schema).parquet(sourceDir)
      val q = transform(stream).writeStream
        .outputMode(OutputMode.Append)
        .format("txlog")
        .option("path", tableRoot)
        .option("checkpointLocation", checkpointDir)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    } finally spark.conf.set(key, prev)
    spark.read.format("txlog").load(tableRoot)
  }

  /** Checkpoint RESTART RECOVERY: run `transform` as TWO consecutive
    * query incarnations over the SAME checkpoint and append-mode
    * parquet sink — the first drains `stagesBeforeRestart` and STOPS
    * (the planned-restart/crash moment), the second starts cold from
    * the checkpoint and drains `stagesAfterRestart`. Everything a
    * production restart relies on is exercised for real:
    *
    *   - source offsets: the file-source's seen-files log lives in the
    *     checkpoint, so incarnation 2 never re-reads incarnation 1's
    *     files (re-reading would double-count every recovered window),
    *   - operator state + watermark: unclosed windows and the committed
    *     watermark are restored from the state store, so a window
    *     SPANNING the restart combines rows from both incarnations —
    *     the part recovery-by-offsets-alone cannot get right,
    *   - sink idempotence: `_spark_metadata` makes a replayed batch
    *     overwrite its slot, never duplicate it.
    *
    * Returns the committed sink content; equality with the single-run
    * emission set is exactly the exactly-once claim.
    */
  def runWithRestart(spark: SparkSession, sourceDir: String,
      schema: org.apache.spark.sql.types.StructType,
      transform: DataFrame => DataFrame,
      outDir: String, checkpointDir: String,
      statePartitions: Option[Int] = None,
      stagesBeforeRestart: Seq[() => Unit] = Seq.empty,
      stagesAfterRestart: Seq[() => Unit] = Seq.empty): DataFrame = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    statePartitions.foreach(n => spark.conf.set(key, n.toString))
    try {
      def launch() = transform(
        spark.readStream.schema(schema).parquet(sourceDir))
        .writeStream
        .outputMode(OutputMode.Append)
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", checkpointDir)
        .start()
      val q1 = launch()
      try stagesBeforeRestart.foreach { st => st(); q1.processAllAvailable() }
      finally q1.stop()
      val q2 = launch()
      try stagesAfterRestart.foreach { st => st(); q2.processAllAvailable() }
      finally q2.stop()
    } finally spark.conf.set(key, prev)
    spark.read.parquet(outDir)
  }

  def runToCompletion(spark: SparkSession, sourceDir: String,
      schema: org.apache.spark.sql.types.StructType,
      transform: DataFrame => DataFrame, queryName: String,
      mode: OutputMode = OutputMode.Complete,
      statePartitions: Option[Int] = None,
      readOptions: Map[String, String] = Map.empty): DataFrame = {
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    statePartitions.foreach(n => spark.conf.set(key, n.toString))
    try {
      val stream = spark.readStream.options(readOptions)
        .schema(schema).parquet(sourceDir)
      val q = transform(stream).writeStream
        .outputMode(mode)
        .format("memory")
        .queryName(queryName)
        .start()
      try q.processAllAvailable()
      finally q.stop()
    } finally spark.conf.set(key, prev)
    spark.table(queryName)
  }
}
