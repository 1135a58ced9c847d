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
  * name-bound against the stream schema once at query start (an
  * unbindable constraint fails `.start()`) and compiled to a codegen
  * predicate per task; a violating row fails its task and the epoch
  * never commits. Features that must REWRITE rows on the way in —
  * GENERATED / IDENTITY / DEFAULT columns, row tracking — still
  * refuse at query start (before any file is staged) and point at the
  * V1 `txlog-stream` sink, which routes every batch through the full
  * DataFrame append path. Delta draws the same line: its DSv2 sink
  * checks invariants in the writer and delegates row-rewriting
  * features to the transactional write command.
  */
final class TxStreamingWrite(rootStr: String, partitionCols: Seq[String],
    streamSchema: StructType, queryId: String) extends StreamingWrite {

  private def spark: SparkSession = SparkSession.active

  // resolved ONCE at query start, driver-side: physical mapping and
  // gate refusals (failure locality: a refused table fails .start(),
  // not the Nth micro-batch)
  private val (physSchema, partCols, checkRows, notNullOrdinals) = {
    val tx = new TxTable(spark, rootStr)
    val metaOpt =
      if (tx.exists) {
        val root = new Path(rootStr)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        Some(TxLog.snapshot(fs, root).meta)
      } else None
    metaOpt.foreach { m =>
      def refuse(what: String): Nothing = sys.error(
        s"txlog DSv2 streaming write to $rootStr: the table has " +
          s"$what, which must be applied per ROW on the way in — " +
          "use the V1 sink (writeStream.format(\"txlog-stream\")) " +
          "or foreachBatch, which route through the full DataFrame " +
          "append path")
      if (m.generated.nonEmpty) refuse("generated columns")
      if (m.identities.nonEmpty) refuse("identity columns")
      if (m.defaultValues.exists(_.nonEmpty)) refuse("column defaults")
      if (m.tracksRows) refuse("row tracking")
    }
    // CHECK / NOT NULL are pure VALIDATION (no row rewriting), so the
    // DSv2 sink enforces them EXECUTOR-SIDE instead of refusing toward
    // V1: each constraint expression is parsed and name-bound against
    // the stream schema ONCE here (failure locality — an unbindable
    // constraint fails .start(), not the Nth batch), shipped bound,
    // and compiled to a codegen predicate per task. NULL passes a
    // CHECK (SQL's rule, the batch path's semantics); a violating row
    // fails its task — the epoch never commits, staged files are
    // vacuum-reclaimable orphans, exactly the abort contract every
    // other failure has.
    val checks: Seq[(String, org.apache.spark.sql.catalyst.expressions
        .Expression)] =
      metaOpt.map(_.checkExprs.map { sql =>
        val parsed = spark.sessionState.sqlParser.parseExpression(sql)
        val bound = parsed.transformUp {
          case a: org.apache.spark.sql.catalyst.analysis
              .UnresolvedAttribute =>
            val name = a.nameParts.mkString(".")
            val idx = streamSchema.fields.indexWhere(
              _.name.equalsIgnoreCase(name))
            require(idx >= 0,
              s"CHECK ($sql) references $name, which is not in the " +
                s"stream schema (${streamSchema.fieldNames
                  .mkString(", ")})")
            BoundReference(idx, streamSchema.fields(idx).dataType,
              nullable = true)
        }
        (sql, org.apache.spark.sql.catalyst.expressions.Coalesce(Seq(
          bound,
          org.apache.spark.sql.catalyst.expressions.Literal(true)))
          : org.apache.spark.sql.catalyst.expressions.Expression)
      }).getOrElse(Nil)
    val requiredOrds: Seq[(String, Int)] =
      metaOpt.map(_.requiredCols.map { c =>
        val idx = streamSchema.fieldNames.indexOf(c)
        require(idx >= 0,
          s"stream omits NOT NULL column $c — refused at query start")
        (c, idx)
      }).getOrElse(Nil)
    val parts = metaOpt.map(_.partitionCols.toSeq).getOrElse(partitionCols)
    parts.foreach(c => require(streamSchema.fieldNames.contains(c),
      s"partition column $c is not in the stream schema " +
        s"(${streamSchema.fieldNames.mkString(", ")})"))
    val phys = StructType(streamSchema.fields
      .filterNot(f => parts.contains(f.name))
      .map(f => f.copy(
        name = metaOpt.map(_.physicalOf(f.name)).getOrElse(f.name),
        nullable = true)))
    (phys, parts, checks.toArray, requiredOrds.toArray)
  }

  /** Per-query staging root under the table's own data/ convention —
    * an aborted query's files are orphans vacuum reclaims. */
  private val stageRel =
    "data/" + java.util.UUID.randomUUID.toString.take(8)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory = {
    val job = Job.getInstance(spark.sessionState.newHadoopConf())
    val factory = new ParquetFileFormat().prepareWrite(
      spark, job, Map.empty[String, String], physSchema)
    val partIdx = partCols.map(c => streamSchema.fieldIndex(c)).toArray
    val partTypes = partCols.map(c =>
      streamSchema(streamSchema.fieldIndex(c)).dataType).toArray
    val dataIdx = streamSchema.fields.zipWithIndex
      .filterNot { case (f, _) => partCols.contains(f.name) }
      .map(_._2)
    val dataTypes = dataIdx.map(i => streamSchema.fields(i).dataType)
    TxStreamWriterFactory(
      new Path(rootStr, stageRel).toString, factory,
      new SerializableConfiguration(job.getConfiguration),
      physSchema, partCols.toArray, partIdx, partTypes,
      dataIdx, dataTypes,
      spark.sessionState.conf.sessionLocalTimeZone,
      checkRows, notNullOrdinals)
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
        meta, streamSchema.fieldNames.toSet)
    // empty batches still advance the watermark: a replay of this
    // epoch after a restart must no-op even if it held no rows
    tx.commitStagedAppend(streamSchema, adds,
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
    notNull: Array[(String, Int)] = Array.empty)
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

  private val open = mutable.LinkedHashMap[String,
    (org.apache.spark.sql.execution.datasources.OutputWriter, String)]()
  private var fileSeq = 0

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

  override def write(row: InternalRow): Unit = {
    validate(row)
    val frag = dirFragment(row)
    val w = open.getOrElseUpdate(frag, {
      val name = f"part-$partitionId%05d-$taskId-$fileSeq$ext"
      fileSeq += 1
      val dir = if (frag.isEmpty) f.stageAbs else s"${f.stageAbs}/$frag"
      val abs = s"$dir/$name"
      (f.writers.newInstance(abs, f.physSchema, ctx), abs)
    })._1
    w.write(dataProj(row))
  }

  override def commit(): WriterCommitMessage = {
    open.values.foreach(_._1.close())
    val stageRoot = new Path(f.stageAbs).getParent.getParent // table root
    val rootPrefix = stageRoot.toUri.getPath.stripSuffix("/") + "/"
    TxStreamCommitMessage(open.values.map { case (_, abs) =>
      val p = new Path(abs).toUri.getPath
      if (p.startsWith(rootPrefix)) p.stripPrefix(rootPrefix) else p
    }.toSeq)
  }

  override def abort(): Unit = {
    open.values.foreach { case (w, abs) =>
      scala.util.Try(w.close()): Unit
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
