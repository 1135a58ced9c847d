package graft.lake

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{
  LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{
  DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** The txlog table as a Structured Streaming SOURCE (Delta's streaming
  * source design): commit versions are the offsets, and each
  * micro-batch is the rows APPENDED by versions `(start, end]` — a
  * `readStream` over the lake tails the transaction log instead of a
  * directory listing, so
  *
  *   - exactly-once falls out of the offset contract: a version's rows
  *     are delivered once, replays after a restart re-plan the same
  *     version range from the checkpointed offset, and lost-race
  *     orphan files (never committed) are never seen — the property a
  *     plain file-stream over the data directory cannot give,
  *   - batches read through [[TxTable]]'s own read path (column
  *     mapping, partition values from the log, native FileIndex scan),
  *     executor-side — the driver handles O(files) metadata per batch,
  *     never rows,
  *   - non-append commits REFUSE by default, exactly like Delta
  *     ("Detected a data update..."): a delete/update under a
  *     downstream that saw the old rows would silently diverge;
  *     `ignoreChanges=true` opts into Delta's relaxed mode (rewritten
  *     files re-emit their surviving rows — documented at-least-once
  *     for touched files, the same caveat Delta documents).
  *
  * Offsets serialize as the plain version number; schema is pinned at
  * source creation (the range-head rule readChanges uses) and later
  * additive evolution null-fills.
  *
  * `readChangeFeed = true` is Delta's CDF streaming mode: each
  * micro-batch is [[TxTable.readChanges]] over the version range —
  * rows tagged `_change_type` / `_commit_version` — so DELETE, UPDATE
  * and MERGE commits STREAM as their row-level change pairs instead of
  * refusing. The downstream sees the exact delta to apply (a CDC
  * `applyChanges` loop closes the circle), and on a CDF-enabled table
  * each batch reads only the commits' staged `_change_data` files —
  * never a table data file. Pure rewrites (OPTIMIZE) stream nothing,
  * same as the append mode skips them.
  */
final class TxStreamSource(spark: SparkSession, rootStr: String,
    startingVersion: Long, ignoreChanges: Boolean,
    readChangeFeed: Boolean = false,
    maxVersionsPerTrigger: Option[Long] = None,
    withRowIds: Boolean = false) extends Source {

  maxVersionsPerTrigger.foreach(n =>
    require(n >= 1L, s"maxVersionsPerTrigger must be >= 1, got $n"))
  require(!withRowIds || readChangeFeed,
    "withRowIds streams the id-carrying CHANGE FEED — set " +
      "readChangeFeed=true too")

  private val root = new Path(rootStr)
  private val fs =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val tab = new TxTable(spark, rootStr)

  override val schema: StructType =
    TxStreamSource.sourceSchema(
      TxLog.snapshot(fs, root).meta.schema, readChangeFeed, withRowIds)

  /** Rate-limit watermark: the highest version exposed through
    * getOffset/getBatch in this process. Delta's maxFilesPerTrigger
    * concern on version terms — without a cap, a NEW stream over a
    * long-lived table plans its entire backlog as ONE micro-batch
    * (at scale: an unbounded first batch instead of a paced
    * backfill). getBatch advances it on recovery replay too, so a
    * restarted stream paces from its checkpoint, never behind it. */
  @volatile private var highWater: Long = startingVersion - 1L

  /** Highest version this source has OBSERVED committed (not capped by
    * the trigger limit like [[highWater]]) — the floor that keeps
    * [[getOffset]]'s per-trigger log probe O(new commits) instead of
    * O(history) ([[TxLog.latestVersionFrom]]). */
  @volatile private var lastSeen: Long = -1L

  override def getOffset: Option[Offset] = {
    val v = TxLog.latestVersionFrom(fs, root, lastSeen)
    if (v >= 0) lastSeen = v
    if (v < 0) None
    else {
      val capped = maxVersionsPerTrigger match {
        case Some(n) => math.min(v, highWater + n)
        case None => v
      }
      if (capped > highWater) highWater = capped
      Some(LongOffset(highWater))
    }
  }

  private def ver(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => s.json.trim.toLong
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val from = start.map(ver(_) + 1L).getOrElse(startingVersion)
    val to = ver(end)
    if (to > highWater) highWater = to // recovery replay seeds the pace
    if (readChangeFeed) {
      // project onto the schema pinned at source creation (additive
      // evolution mid-stream otherwise widens the batch and trips the
      // sink's schema check) — same null-fill rule as the append path
      val batch =
        if (from > to)
          spark.createDataFrame(
            java.util.Collections.emptyList[org.apache.spark.sql.Row](),
            schema)
        else {
          val df = tab.readChanges(from, to, withRowIds = withRowIds)
          df.select(schema.fieldNames.map { n =>
            if (df.columns.contains(n)) col(n)
            else lit(null).cast(schema(n).dataType).as(n)
          }.toIndexedSeq: _*)
        }
      return org.apache.spark.sql.graft.GraftSqlBridge
        .asStreamingBatch(batch)
    }
    val frames = (from to to).flatMap { v =>
      val entries = TxLog.commitEntries(fs, root, v)
      val removed = entries.flatMap(_.remove)
      val added = entries.flatMap(_.add)
      val op = entries.flatMap(_.info).headOption.map(_.op).getOrElse("?")
      // pure rewrites (Delta's dataChange=false commits) change no
      // logical row: table maintenance must never break a downstream
      // stream, so these SKIP instead of refusing — same rule the
      // change feed applies
      val pureRewrite = TxStreamSource.pureRewriteOps(op)
      if (removed.nonEmpty && !pureRewrite && !ignoreChanges) {
        sys.error(s"TxStreamSource at $root: commit $v ($op) rewrites " +
          "or removes data files — a streaming read of a non-append " +
          "table diverges silently. Use ignoreChanges=true to accept " +
          "re-emitted rows (at-least-once for touched files), or feed " +
          "downstream from readChanges instead.")
      }
      if (added.isEmpty || pureRewrite) None
      else Some(tab.readCommitAdds(v))
    }
    val batch =
      if (frames.isEmpty)
        spark.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          schema)
      else
        frames.map(df => df.select(schema.fieldNames.map { n =>
          if (df.columns.contains(n)) col(n)
          else lit(null).cast(schema(n).dataType).as(n)
        }.toIndexedSeq: _*)).reduce(_ unionAll _)
    org.apache.spark.sql.graft.GraftSqlBridge.asStreamingBatch(batch)
  }

  override def stop(): Unit = ()

  override def toString: String = s"TxStreamSource[$rootStr]"
}

object TxStreamSource {
  /** Source schemas are nullable like any resolved file-source schema
    * (`asNullable` itself is `private[sql]`). */
  private[lake] def nullable(st: StructType): StructType =
    StructType(st.fields.map(_.copy(nullable = true)))

  /** The stream's resolved schema: the table schema, plus the change
    * feed's `_change_type`/`_commit_version` tags in CDF mode (the
    * exact columns [[TxTable.readChanges]] emits), plus `_row_id` when
    * the id-carrying feed was requested (row-tracked tables only). */
  private[lake] def sourceSchema(table: StructType,
      readChangeFeed: Boolean, withRowIds: Boolean = false): StructType = {
    val base = nullable(table)
    if (!readChangeFeed) base
    else StructType(base.fields ++
      (if (withRowIds)
        Seq(org.apache.spark.sql.types.StructField("_row_id",
          org.apache.spark.sql.types.LongType, nullable = true))
      else Nil) :+
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = true) :+
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = true))
  }

  /** Operations whose commits move bytes but change no logical row —
    * skipped by the stream like Delta's dataChange=false adds. */
  private[lake] val pureRewriteOps: Set[String] =
    Set("OPTIMIZE", "REPARTITION_REWRITE", "ADD_BLOOM_INDEX")
}

/** The txlog table as a Structured Streaming SINK (Delta's DeltaSink
  * shape): every micro-batch lands as ONE atomic append commit under
  * the writer-transaction watermark (appId, batchId), so a replayed
  * batch after a restart is a log-enforced NO-OP — exactly-once
  * without sink-layout conventions. A missing table is created on
  * first batch with the stream's schema (and the writeStream's
  * partitionBy columns); later batches evolve additively like any
  * append. Append mode only: Complete/Update would need a
  * rewrite-the-table commit the log models as RESTORE/overwrite,
  * not a streaming sink — refuse loudly rather than diverge.
  *
  * The batch frame crosses into the append through
  * [[org.apache.spark.sql.graft.GraftSqlBridge.asBatch]] (the
  * micro-batch's already-planned incremental execution re-wrapped as a
  * batch frame): a fresh action on `data` itself re-analyzes the
  * STREAMING logical plan and refuses, and `data.write` would re-plan
  * and double-read the sources — the classic V1-sink bug.
  */
final class TxStreamSink(spark: SparkSession, rootStr: String,
    partitionCols: Seq[String], explicitAppId: Option[String],
    checkpointLoc: Option[String]) extends Sink {

  /** The writer-transaction idempotence key. Resolution order:
    *
    *   1. an explicit `appId` sink option — the caller owns replays;
    *   2. a UUID MARKER FILE inside the query's checkpoint directory
    *      (`<checkpointLocation>/_txlog_sink_id`, created atomically on
    *      first contact): the key then lives and DIES with the
    *      checkpoint — a user who wipes the checkpoint to reprocess
    *      gets a fresh appId, so the restarted batch 0 lands instead of
    *      silently no-opping against the dead incarnation's watermark
    *      (keying on the checkpoint PATH STRING had exactly that bug);
    *   3. no checkpointLocation in the sink options (conf-level default
    *      checkpoint dir) — REFUSE loudly: two such queries would share
    *      whatever fallback key existed and drop each other's batches.
    */
  private lazy val appId: String = explicitAppId.getOrElse {
    val loc = checkpointLoc.getOrElse(sys.error(
      s"txlog-stream sink at $rootStr: cannot derive an idempotence " +
        "key — pass .option(\"checkpointLocation\", dir) on the " +
        "writeStream (the key is stored inside it) or an explicit " +
        ".option(\"appId\", key). A session-default checkpoint dir is " +
        "not visible to the sink, and a shared fallback key would " +
        "silently drop batches across queries."))
    val marker = new Path(loc, "_txlog_sink_id")
    val mfs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readMarker(): String = {
      val in = mfs.open(marker)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
      finally in.close()
    }
    if (mfs.exists(marker)) readMarker()
    else {
      mfs.mkdirs(marker.getParent)
      val fresh = java.util.UUID.randomUUID.toString
      try {
        val out = mfs.create(marker, false) // atomic no-overwrite claim
        try out.write(fresh.getBytes("UTF-8")) finally out.close()
        fresh
      } catch { case _: java.io.IOException => readMarker() }
    }
  }

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val batch = org.apache.spark.sql.graft.GraftSqlBridge.asBatch(data)
    val tab = new TxTable(spark, rootStr)
    val root = new Path(rootStr)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (TxLog.latestVersion(fs, root) < 0) {
      // first contact: claim an EMPTY v0 atomically ([[TxTable
      // .createIfAbsent]] — never a delete+recreate, so two queries
      // racing first contact on the same new root cannot wipe each
      // other's committed batches; the loser simply attaches)
      tab.createIfAbsent(data.schema, partitionCols): Unit
    }
    tab.appendIdempotent(batch, appId, batchId): Unit
  }

  override def toString: String = s"TxStreamSink[$rootStr]"
}

/** `spark.readStream.format("graft.lake.TxLogStreamProvider")
  * .option("path", tableRoot).load()`. Options: `startingVersion`
  * (default 0 — the CREATE commit's rows included),
  * `startingTimestamp` (wall-clock millis, mutually exclusive with
  * `startingVersion` — resolves to the first commit stamped at or
  * after the instant via [[TxTable.versionAtOrAfterTimestamp]];
  * refuses a future instant or one behind the retention horizon),
  * `ignoreChanges`
  * (default false), `readChangeFeed` (default false — stream the
  * change feed instead of appended rows; mutating commits stream their
  * delete/insert pairs instead of refusing), `maxVersionsPerTrigger`
  * (unset = unbounded — at most this many commit versions per
  * micro-batch, so a backfill over a long history paces itself instead
  * of planning the whole backlog as one batch), `withRowIds` (default
  * false; requires `readChangeFeed` and a row-tracked table — each
  * change row carries its stable `_row_id`, so a downstream
  * [[TxTable.applyChangesById]] loop replicates with no key
  * argument). */
class TxLogStreamProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "txlog-stream"

  /** Sink options: `path` (the table root), `appId` (an explicit
    * idempotence key — otherwise the key is a UUID stored INSIDE the
    * query's checkpoint directory, so it survives restarts and dies
    * with a wiped checkpoint; with neither appId nor a sink-level
    * checkpointLocation the sink refuses — see [[TxStreamSink.appId]]).
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"txlog-stream sink supports Append output only, got $outputMode " +
        "(Complete/Update need a table rewrite — use foreachBatch with " +
        "merge/applyChanges for update semantics)")
    new TxStreamSink(sqlContext.sparkSession, pathOf(parameters),
      partitionColumns, parameters.get("appId"),
      parameters.get("checkpointLocation"))
  }

  /** Target resolution: `path` (the table root) or `table` (a catalog
    * identifier — a registered [[graft.lake.catalog.TxCatalog]] name
    * or a session-catalog `USING txlog` entry, the same resolution the
    * SQL surface uses). The `table` form is how a BY-NAME consumer
    * reaches the V1-only faces — CDF streaming
    * (`option("readChangeFeed", true)`) and the row-feature-table
    * sink — which the DSv2 `readStream.table()` route deliberately
    * refuses toward here. */
  private def pathOf(parameters: Map[String, String]): String =
    parameters.get("path")
      .orElse(parameters.get("table").map(id =>
        LakeSql.identPath(id).getOrElse(sys.error(
          s"txlog-stream: '$id' does not resolve to a lake table " +
            "through any registered catalog"))))
      .getOrElse(sys.error(
        "txlog-stream needs .option(\"path\", <tableRoot>) or " +
          ".option(\"table\", <catalog identifier>)"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val root = new Path(pathOf(parameters))
    val fs = root.getFileSystem(
      sqlContext.sparkSession.sparkContext.hadoopConfiguration)
    (shortName(), TxStreamSource.sourceSchema(
      TxLog.snapshot(fs, root).meta.schema,
      parameters.get("readChangeFeed").exists(_.toBoolean),
      parameters.get("withRowIds").exists(_.toBoolean)))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new TxStreamSource(sqlContext.sparkSession, pathOf(parameters),
      startingVersion =
        (parameters.get("startingVersion"),
          parameters.get("startingTimestamp")) match {
          case (Some(_), Some(_)) => sys.error(
            "txlog-stream: set either startingVersion or " +
              "startingTimestamp, not both")
          case (Some(v), None) => v.toLong
          case (None, Some(ts)) =>
            // wall-clock start (Delta's startingTimestamp): the first
            // commit stamped at or after the instant, resolved ONCE at
            // source creation by the in-commit-timestamp binary search
            new TxTable(sqlContext.sparkSession, pathOf(parameters))
              .versionAtOrAfterTimestamp(ts.toLong)
          case (None, None) => 0L
        },
      ignoreChanges = parameters.get("ignoreChanges")
        .exists(_.toBoolean),
      readChangeFeed = parameters.get("readChangeFeed")
        .exists(_.toBoolean),
      maxVersionsPerTrigger = parameters.get("maxVersionsPerTrigger")
        .map(_.toLong),
      withRowIds = parameters.get("withRowIds").exists(_.toBoolean))
}
