package graft.lake

import scala.collection.mutable

import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{Job, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  BoundReference, Cast, UnsafeProjection}
import org.apache.spark.sql.connector.write.{
  DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{
  StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.OutputWriterFactory
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.util.SerializableConfiguration

import TxLog.Txn

/** The txlog table as a DataSource V2 STREAMING WRITE — the public
  * connector-API sink (`writeStream.toTable("cat.ns.t")` /
  * `writeStream.format("txlog")`): executor tasks land micro-batch
  * rows as immutable parquet under the ordinary `data/<uuid>/` staging
  * convention — rows never touch the driver — and the driver's
  * `commit(epochId)` turns the reported file list into Add actions
  * (stats + bloom sidecars via [[TxTable.stagedAdds]], one distributed
  * aggregation over just the new files) and claims one atomic commit
  * under the `(queryId, epochId)` writer-transaction watermark.
  * Exactly-once falls out of the log: a replayed epoch is a no-op, an
  * aborted epoch's staged files are never referenced (vacuum reclaims
  * them, like any lost-race staging), and the idempotence key is the
  * STREAMING QUERY ID Spark persists in the checkpoint — stable across
  * restarts, never shared across queries (the exact contract the V1
  * sink derives from its checkpoint-dir marker).
  *
  * Scope: CHECK / NOT NULL constraints ENFORCE here, executor-side —
  * they validate rows without rewriting them, so each expression is
  * ANALYZER-resolved against the stream schema once at query start
  * (function resolution + type coercion; an unresolvable constraint
  * fails `.start()`) and compiled to a codegen predicate per task; a
  * violating row fails its task and the epoch never commits.
  *
  * Row-REWRITING features ride the same executor-side compile:
  * GENERATED / DEFAULT columns the stream omits are analyzer-resolved
  * value expressions appended by ONE codegen projection per task
  * (rows never widen on the driver), a generated column the stream
  * SUPPLIES is validated per row against its expression (null-safe
  * equality — the batch path's rule), and IDENTITY columns allocate
  * per EPOCH from the logged watermark: Spark wraps every micro-batch
  * in its own `MicroBatchWrite`, so [[createStreamingWriterFactory]]
  * runs on the driver once per epoch, re-reads the watermark, and
  * ships `Literal(start) + MonotonicallyIncreasingID()` — the exact
  * allocation the batch path uses — whose staged max then bumps the
  * watermark inside the same commit
  * ([[TxTable.commitStagedAppend]]'s identity bump, read from the
  * files' own stats). ROW TRACKING rides the same per-epoch
  * allocation: `_row_id` is appended physically (never evolving into
  * the logical schema), its staged max bumps `rowIdWatermark` in the
  * same commit, and the change feed stays consistent because the
  * sink's commits are insert-only — the inserted rows' ids live in
  * the data files the feed reads. Nothing refuses toward V1 anymore.
  */
final class TxStreamingWrite(rootStr: String, partitionCols: Seq[String],
    streamSchema: StructType, queryId: String) extends StreamingWrite {

  private def spark: SparkSession = SparkSession.active

  /** Resolve a value expression through the FULL analyzer against an
    * empty frame of the stream schema (function resolution + implicit
    * casts — what the batch path's expr() gets), bound to stream
    * ordinals. Failure refuses at `.start()`, not the Nth batch. */
  private def resolveOnStream(sql: String, what: String)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    val probe = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      streamSchema)
    val analyzed =
      try probe.selectExpr(sql).queryExecution.analyzed
      catch { case e: Exception => sys.error(
        s"txlog DSv2 streaming write to $rootStr: $what ($sql) does " +
          s"not analyze against the stream schema (" +
          s"${streamSchema.fieldNames.mkString(", ")}): ${e.getMessage}") }
    val proj = analyzed.collectFirst {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project => p
    }.getOrElse(sys.error(s"$what ($sql): no Project in analyzed plan"))
    val value = proj.projectList.head match {
      case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child
      case e => e
    }
    org.apache.spark.sql.catalyst.expressions.BindReferences
      .bindReference(value,
        org.apache.spark.sql.catalyst.expressions.AttributeSeq(
          proj.child.output))
  }

  // resolved ONCE at query start, driver-side: physical mapping and
  // gate refusals (failure locality: a refused table fails .start(),
  // not the Nth micro-batch)
  private val (physSchema, partCols, checkRows, notNullOrdinals,
      appendedCols) = {
    val tx = new TxTable(spark, rootStr)
    val metaOpt =
      if (tx.exists) {
        val root = new Path(rootStr)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        Some(TxLog.snapshot(fs, root).meta)
      } else None
    metaOpt.foreach { m =>
      if (m.tracksRows)
        require(!streamSchema.fieldNames.contains("_row_id"),
          "the table tracks rows — `_row_id` is engine-allocated, " +
            "the stream must not supply it")
      m.identities.keys.foreach(c =>
        require(!streamSchema.fieldNames.contains(c),
          s"identity column $c is GENERATED ALWAYS — the stream " +
            "must not supply it"))
    }
    // columns the table REWRITES onto incoming rows that the stream
    // omits: generated / default columns become analyzer-resolved
    // value expressions (Some(expr)); identity columns get their
    // per-epoch watermark expression later (None — see
    // createStreamingWriterFactory). Appended in table-schema order
    // after the stream's own fields → the AUGMENTED schema every
    // downstream piece (partition routing, physical write schema,
    // validators) is computed over.
    val appended: Seq[(String, DataType,
        Option[org.apache.spark.sql.catalyst.expressions.Expression])] =
      metaOpt.toSeq.flatMap { m =>
        m.schema.fields.toSeq
          .filterNot(f => streamSchema.fieldNames.contains(f.name))
          .flatMap { f =>
            if (m.generated.contains(f.name))
              Some((f.name, f.dataType, Some(resolveOnStream(
                s"CAST((${m.generated(f.name)}) AS ${f.dataType.sql})",
                s"generated column ${f.name}"))))
            else if (m.identities.contains(f.name))
              Some((f.name, f.dataType, None))
            else if (m.defaults.contains(f.name))
              Some((f.name, f.dataType, Some(resolveOnStream(
                s"CAST((${m.defaults(f.name)}) AS ${f.dataType.sql})",
                s"default for column ${f.name}"))))
            else None // plain absent column: ordinary null-fill
          }
      } ++
        // ROW TRACKING rides the identity-column pattern: `_row_id` is
        // a per-epoch watermark allocation (None marker — the factory
        // re-reads `nextRowId` each epoch), physically written like
        // any column but NEVER part of the logical schema (commit()
        // strips it from the evolve schema; stagedAdds still computes
        // its stats so the watermark bump reads the staged max). The
        // change feed stays consistent: the sink's commits are
        // insert-only, and insert rows' ids live in the data files the
        // diff-based feed reads.
        metaOpt.filter(_.tracksRows).map(_ =>
          ("_row_id", org.apache.spark.sql.types.LongType: DataType,
            Option.empty[
              org.apache.spark.sql.catalyst.expressions.Expression]))
    val augSchema = StructType(streamSchema.fields ++
      appended.map { case (n, dt, _) =>
        org.apache.spark.sql.types.StructField(n, dt, nullable = true) })
    // CHECK / NOT NULL are pure VALIDATION (no row rewriting), so the
    // DSv2 sink enforces them EXECUTOR-SIDE instead of refusing toward
    // V1: each constraint is resolved through the FULL ANALYZER
    // against an empty frame of the stream schema — the exact
    // analysis the batch path's expr(sql) gets, so function calls
    // resolve and implicit type coercion runs (a name-only bind would
    // leave UnresolvedFunction / uncoerced literal comparisons that
    // throw in every task) — then the resolved attributes bind to
    // stream ordinals. Analysis or bind failure refuses at .start()
    // (failure locality), not the Nth batch. NULL passes a CHECK
    // (SQL's rule, the batch path's semantics); a violating row fails
    // its task — the epoch never commits, staged files are
    // vacuum-reclaimable orphans, exactly the abort contract every
    // other failure has.
    // validators bind against the AUGMENTED schema (a CHECK may
    // reference a generated column the projection appends)
    def bindPredicate(sql: String, what: String)
        : org.apache.spark.sql.catalyst.expressions.Expression = {
      val probe = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](),
        augSchema)
      val analyzed =
        try probe.where(org.apache.spark.sql.functions.expr(sql))
          .queryExecution.analyzed
        catch { case e: Exception => sys.error(
          s"txlog DSv2 streaming write to $rootStr: $what ($sql) " +
            s"does not analyze against the stream schema (" +
            s"${augSchema.fieldNames.mkString(", ")}): ${e.getMessage}") }
      val filter = analyzed.collectFirst {
        case fl: org.apache.spark.sql.catalyst.plans.logical.Filter => fl
      }.getOrElse(sys.error(s"$what ($sql): analyzed plan has no Filter"))
      // the probe is a LocalRelation in augmented-schema order, so the
      // child's output attributes ARE the joined-row ordinals
      org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(filter.condition,
          org.apache.spark.sql.catalyst.expressions.AttributeSeq(
            filter.child.output))
    }
    val checks: Seq[(String, org.apache.spark.sql.catalyst.expressions
        .Expression)] =
      metaOpt.map(_.checkExprs.map { sql =>
        (sql, org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
          bindPredicate(sql, "CHECK"),
          org.apache.spark.sql.catalyst.expressions.Literal(true)))
          : org.apache.spark.sql.catalyst.expressions.Expression)
      }).getOrElse(Nil)
    // a generated column the stream SUPPLIES is validated per row
    // (null-safe equality against its expression — the batch path's
    // applyGenerated rule: a writer can never land a row where the
    // derived key lies about the row)
    val genValidators: Seq[(String,
        org.apache.spark.sql.catalyst.expressions.Expression)] =
      metaOpt.toSeq.flatMap { m =>
        m.generated.toSeq.sortBy(_._1)
          .filter { case (c, _) => streamSchema.fieldNames.contains(c) }
          .map { case (c, e) =>
            val dt = m.schema(c).dataType
            (s"generated column $c must equal ($e)",
              bindPredicate(s"`$c` <=> CAST(($e) AS ${dt.sql})",
                s"generated column $c"))
          }
      }
    val requiredOrds: Seq[(String, Int)] =
      metaOpt.map(_.requiredCols.map { c =>
        val idx = augSchema.fieldNames.indexOf(c)
        require(idx >= 0,
          s"stream omits NOT NULL column $c — refused at query start")
        (c, idx)
      }).getOrElse(Nil)
    val parts = metaOpt.map(_.partitionCols.toSeq).getOrElse(partitionCols)
    parts.foreach(c => require(augSchema.fieldNames.contains(c),
      s"partition column $c is not in the stream schema " +
        s"(${augSchema.fieldNames.mkString(", ")})"))
    val phys = StructType(augSchema.fields
      .filterNot(f => parts.contains(f.name))
      .map(f => f.copy(
        name = metaOpt.map(_.physicalOf(f.name)).getOrElse(f.name),
        nullable = true)))
    (phys, parts, (checks ++ genValidators).toArray,
      requiredOrds.toArray, appended)
  }

  /** The staged data's LOGICAL schema: the stream's own columns plus
    * the appended generated/identity/default ones — what the commit
    * evolves/validates against and computes stats over. */
  private val augLogical = StructType(streamSchema.fields ++
    appendedCols.map { case (n, dt, _) =>
      org.apache.spark.sql.types.StructField(n, dt, nullable = true) })

  /** Per-query staging root under the table's own data/ convention —
    * an aborted query's files are orphans vacuum reclaims. */
  private val stageRel =
    "data/" + java.util.UUID.randomUUID.toString.take(8)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat().prepareWrite(
      spark, job, Map.empty[String, String], physSchema)
    // identity starts re-read HERE — Spark calls this once per epoch
    // (each micro-batch gets its own MicroBatchWrite), so every epoch
    // allocates past the watermark the previous commit bumped
    val identityStarts: Map[String, Long] =
      if (appendedCols.exists(_._3.isEmpty)) {
        val root = new Path(rootStr)
        val fs = root.getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val m = TxLog.snapshot(fs, root).meta
        m.identities ++
          (if (m.tracksRows) Map("_row_id" -> m.nextRowId)
          else Map.empty[String, Long])
      } else Map.empty
    val appendExprs = appendedCols.map {
      case (_, _, Some(e)) => e
      case (n, dt, None) =>
        val alloc: org.apache.spark.sql.catalyst.expressions.Expression =
          org.apache.spark.sql.catalyst.expressions.Add(
            org.apache.spark.sql.catalyst.expressions.Literal(
              identityStarts.getOrElse(n, 1L)),
            org.apache.spark.sql.catalyst.expressions
              .MonotonicallyIncreasingID())
        if (dt == org.apache.spark.sql.types.LongType) alloc
        else Cast(alloc, dt)
    }.toArray
    val augFields = augLogical.fields
    val partIdx = partCols.map(c => augLogical.fieldIndex(c)).toArray
    val partTypes = partCols.map(c =>
      augFields(augLogical.fieldIndex(c)).dataType).toArray
    val dataIdx = augFields.zipWithIndex
      .filterNot { case (f, _) => partCols.contains(f.name) }
      .map(_._2)
    val dataTypes = dataIdx.map(i => augFields(i).dataType)
    TxStreamWriterFactory(
      new Path(rootStr, stageRel).toString, factory,
      new SerializableConfiguration(job.getConfiguration),
      physSchema, partCols.toArray, partIdx, partTypes,
      dataIdx, dataTypes,
      spark.sessionState.conf.sessionLocalTimeZone,
      checkRows, notNullOrdinals,
      TxStreamingWrite.maxOpenWriters(spark),
      appendExprs)
  }

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.flatMap {
      case m: TxStreamCommitMessage => m.files
      case other => sys.error(s"unexpected commit message $other")
    }
    val tx = new TxTable(spark, rootStr)
    if (!tx.exists)
      tx.createIfAbsent(streamSchema, partCols): Unit
    val root = new Path(rootStr)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = TxLog.snapshot(fs, root).meta
    val adds =
      if (files.isEmpty) Vector.empty
      else tx.stagedAdds(
        files.map(rel => new Path(root, rel).toString).toIndexedSeq,
        meta, augLogical.fieldNames.toSet)
    // `_row_id` is physical-only: present in the staged files (and in
    // the stats set above, so the watermark bump sees the staged max)
    // but never in the schema the commit evolves against
    val logical = StructType(
      augLogical.fields.filterNot(_.name == "_row_id"))
    // empty batches still advance the watermark: a replay of this
    // epoch after a restart must no-op even if it held no rows
    tx.commitStagedAppend(logical, adds,
      Txn(s"dsv2:$queryId", epochId)): Unit
  }

  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val root = new Path(rootStr)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    messages.foreach {
      case m: TxStreamCommitMessage =>
        m.files.foreach(rel =>
          scala.util.Try(fs.delete(new Path(root, rel), false)): Unit)
      case _ => ()
    }
  }

  override def toString: String = s"TxStreamingWrite[$rootStr]"
}

object TxStreamingWrite {
  /** Cap on parquet writers a task holds open at once across dynamic
    * partition fragments. Each open writer pins a row-group buffer
    * (~128 MB default page budget), so an epoch spanning many
    * partition values — a date-partitioned backfill, a watermark
    * burst — would otherwise grow per-task memory with the number of
    * DISTINCT fragments it sees: the executor-OOM shape Spark's own
    * `FileFormatWriter` guards with a sorted single-writer fallback.
    * Here the guard is LRU rotation: past the cap the least-recently-
    * written fragment's file is closed; a later row for it opens a
    * fresh file in the same directory (multiple files per partition
    * dir is the normal landed shape, so content is unchanged — the
    * cost of unsorted input is file COUNT, never memory). */
  val maxOpenWritersKey = "spark.graft.lake.streamMaxOpenWriters"
  val maxOpenWritersDefault = 32

  def maxOpenWriters(spark: SparkSession): Int =
    spark.conf.getOption(maxOpenWritersKey)
      .flatMap(v => scala.util.Try(v.toInt).toOption)
      .filter(_ > 0)
      .getOrElse(maxOpenWritersDefault)
}

/** Files one task landed, root-relative (partition dirs included). */
final case class TxStreamCommitMessage(files: Seq[String])
    extends WriterCommitMessage

final case class TxStreamWriterFactory(stageAbs: String,
    writers: OutputWriterFactory, conf: SerializableConfiguration,
    physSchema: StructType, partCols: Array[String],
    partIdx: Array[Int], partTypes: Array[DataType],
    dataIdx: Array[Int], dataTypes: Array[DataType],
    zoneId: String,
    checks: Array[(String,
      org.apache.spark.sql.catalyst.expressions.Expression)] =
      Array.empty,
    notNull: Array[(String, Int)] = Array.empty,
    maxOpenWriters: Int = TxStreamingWrite.maxOpenWritersDefault,
    appendExprs: Array[
      org.apache.spark.sql.catalyst.expressions.Expression] =
      Array.empty)
    extends StreamingDataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] =
    new TxStreamDataWriter(this, partitionId, taskId, epochId)
}

/** One task's writer: routes rows to per-partition-directory parquet
  * files through Spark's own [[OutputWriterFactory]] (vectorized
  * parquet write support, physical column names), Hive-escaped
  * `col=value` directory fragments, `__HIVE_DEFAULT_PARTITION__` for
  * nulls — byte-compatible with what `DataFrame.write.partitionBy`
  * lands, so the log's partition-value parsing and the FileIndex read
  * path treat both writers' files identically. */
final class TxStreamDataWriter(f: TxStreamWriterFactory,
    partitionId: Int, taskId: Long, epochId: Long)
    extends DataWriter[InternalRow] {

  private val ctx = new TaskAttemptContextImpl(
    new org.apache.hadoop.conf.Configuration(f.conf.value),
    new TaskAttemptID(new TaskID(
      new org.apache.hadoop.mapreduce.JobID(
        "graftstream", (epochId % Int.MaxValue).toInt),
      TaskType.MAP, partitionId), (taskId % Int.MaxValue).toInt))

  private val ext = f.writers.getFileExtension(ctx)

  private lazy val dataProj = UnsafeProjection.create(
    f.dataIdx.toIndexedSeq.zip(f.dataTypes.toIndexedSeq).map {
      case (i, dt) => BoundReference(i, dt, nullable = true)
    })

  // partition values rendered as strings with Catalyst's own Cast —
  // the spelling DataFrame.write's dynamic partitioning uses
  private lazy val partProj = UnsafeProjection.create(
    f.partIdx.toIndexedSeq.zip(f.partTypes.toIndexedSeq).map {
      case (i, dt) =>
        Cast(BoundReference(i, dt, nullable = true), StringType,
          Some(f.zoneId))
    })

  // Open writers, least-recently-WRITTEN first (re-inserted on every
  // access so the head is always the coldest fragment). Bounded at
  // f.maxOpenWriters: each open parquet writer pins a row-group
  // buffer, so an unbounded map is executor-OOM when one epoch spans
  // many partition values. Closed files accumulate in `landed` — the
  // commit message (and abort's delete list) covers rotated files
  // exactly like still-open ones.
  private val open = mutable.LinkedHashMap[String,
    (org.apache.spark.sql.execution.datasources.OutputWriter, String)]()
  private val landed = mutable.ArrayBuffer[String]()
  private var fileSeq = 0
  // consecutive rows overwhelmingly share a fragment (unpartitioned
  // tables always; partitioned ones arrive run-length-clustered), so
  // the hot path is a string compare, not an LRU map touch per row
  private var lastFrag: String = null
  private var lastWriter
      : org.apache.spark.sql.execution.datasources.OutputWriter = null

  private def dirFragment(row: InternalRow): String = {
    if (f.partCols.isEmpty) return ""
    val rendered = partProj(row)
    f.partCols.indices.map { i =>
      val v =
        if (rendered.isNullAt(i)) "__HIVE_DEFAULT_PARTITION__"
        else TxStreamDataWriter.escape(rendered.getUTF8String(i).toString)
      s"${f.partCols(i)}=$v"
    }.mkString("/")
  }

  // constraint predicates compiled ONCE per task from the bound
  // expressions the driver resolved at query start: NOT NULL is a
  // null probe at a fixed ordinal, CHECK a codegen'd predicate whose
  // NULL result passes (SQL's rule — the driver wrapped each in
  // COALESCE(expr, true), so eval() == false IS a violation)
  private lazy val checkPreds = f.checks.map { case (sql, e) =>
    val p = org.apache.spark.sql.catalyst.expressions.Predicate.create(e)
    p.initialize(partitionId)
    (sql, p)
  }

  private def validate(row: InternalRow): Unit = {
    var i = 0
    while (i < f.notNull.length) {
      if (row.isNullAt(f.notNull(i)._2))
        sys.error(s"streaming write violates NOT NULL " +
          s"(${f.notNull(i)._1}) — batch refused, nothing committed")
      i += 1
    }
    var j = 0
    while (j < checkPreds.length) {
      if (!checkPreds(j)._2.eval(row))
        sys.error(s"streaming write violates CHECK " +
          s"(${checkPreds(j)._1}) — batch refused, nothing committed")
      j += 1
    }
  }

  // generated/default/identity columns appended by ONE codegen
  // projection; the JoinedRow presents (stream ++ appended) under the
  // augmented ordinals every other piece was bound to. Initialized
  // per task: MonotonicallyIncreasingID (identity allocation) embeds
  // the partition ordinal
  private lazy val appendProj = {
    val p = UnsafeProjection.create(f.appendExprs.toIndexedSeq)
    p.initialize(partitionId)
    p
  }
  private val joined =
    new org.apache.spark.sql.catalyst.expressions.JoinedRow

  override def write(row0: InternalRow): Unit = {
    val row =
      if (f.appendExprs.isEmpty) row0
      else joined(row0, appendProj(row0))
    validate(row)
    val frag = dirFragment(row)
    if (frag == lastFrag) { lastWriter.write(dataProj(row)); return }
    val w = open.remove(frag) match {
      case Some(entry) => // touch: re-insert at the tail (most recent)
        open.put(frag, entry): Unit
        entry._1
      case None =>
        if (open.size >= f.maxOpenWriters) {
          // the hot-path shortcut above skips the LRU touch, so a long
          // run on one fragment can leave the HOTTEST fragment at the
          // cold end — re-insert it at the tail before picking the
          // victim, so the memoized writer is never the one rotated
          // (rotating it costs an avoidable extra file)
          if (lastFrag != null && open.size > 1)
            open.remove(lastFrag).foreach(e => open.put(lastFrag, e): Unit)
          // rotate out the coldest fragment's writer; its file is done
          val (coldFrag, (cw, cAbs)) = open.head
          cw.close()
          landed += cAbs
          open.remove(coldFrag): Unit
          if (coldFrag == lastFrag) { lastFrag = null; lastWriter = null }
        }
        val name = f"part-$partitionId%05d-$taskId-$fileSeq$ext"
        fileSeq += 1
        val dir = if (frag.isEmpty) f.stageAbs else s"${f.stageAbs}/$frag"
        val abs = s"$dir/$name"
        val nw = f.writers.newInstance(abs, f.physSchema, ctx)
        open.put(frag, (nw, abs)): Unit
        nw
    }
    lastFrag = frag
    lastWriter = w
    w.write(dataProj(row))
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach { case (w, abs) =>
      w.close()
      landed += abs
    }
    open.clear()
    val stageRoot = new Path(f.stageAbs).getParent.getParent // table root
    val rootPrefix = stageRoot.toUri.getPath.stripSuffix("/") + "/"
    TxStreamCommitMessage(landed.map { abs =>
      val p = new Path(abs).toUri.getPath
      if (p.startsWith(rootPrefix)) p.stripPrefix(rootPrefix) else p
    }.toSeq)
  }

  override def abort(): Unit = {
    open.values.foreach { case (w, abs) =>
      scala.util.Try(w.close()): Unit
      landed += abs
    }
    open.clear()
    landed.foreach { abs =>
      val p = new Path(abs)
      scala.util.Try(
        p.getFileSystem(f.conf.value).delete(p, false)): Unit
    }
  }

  override def close(): Unit = ()
}

object TxStreamDataWriter {
  /** Hive's escapePathName (the inverse of [[TxTable]]'s unescape and
    * the spelling Spark's own dynamic-partition writes use): control
    * chars and filesystem-hostile specials become %XX. */
  private val needsEscape: Char => Boolean = c =>
    c < 0x20 || "\"#%'*/:=?\\{[]^".indexOf(c.toInt) >= 0

  def escape(s: String): String =
    if (!s.exists(needsEscape)) s
    else {
      val sb = new java.lang.StringBuilder(s.length + 8)
      s.foreach { c =>
        if (needsEscape(c)) sb.append(f"%%${c.toInt}%02X")
        else sb.append(c)
      }
      sb.toString
    }
}
