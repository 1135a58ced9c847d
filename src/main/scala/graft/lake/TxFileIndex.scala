package graft.lake

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, BoundReference, Cast, EqualNullSafe, EqualTo, Expression,
  GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal,
  Predicate}
import org.apache.spark.sql.execution.datasources.{
  FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import TxLog.{Add, Snapshot, Stat}

/** The txlog read path as a native Spark [[FileIndex]] — Delta's
  * TahoeFileIndex design: the transaction log (not a directory listing)
  * serves Spark's planner the live file set, each file's partition
  * values, and per-file min/max stats, so the whole table reads as ONE
  * `HadoopFsRelation` scan with
  *
  *   - PARTITION PRUNING at plan time: Catalyst hands
  *     [[listFiles]] its partition filters and only matching partition
  *     tuples' files enter the scan (visible as the scan's "partition
  *     filters" / shrinking "files read"),
  *   - LOG-STATS FILE SKIPPING: data filters of shape `col op literal`
  *     drop every file whose recorded [min,max] cannot satisfy them —
  *     Spark never even opens the excluded footers (the same decision
  *     [[TxTable.candidateFiles]] makes, now inside the planner's own
  *     callback, composing with whatever the query's WHERE clause is
  *     instead of requiring the caller to route through `readBetween`),
  *   - and everything the native parquet source already does
  *     downstream: footer row-group pruning on the surviving files,
  *     column pruning, vectorized decode, whole-stage codegen — ONE
  *     scan node instead of a union of per-partition-tuple frames.
  *
  * File sizes come from the log ([[TxLog.Add.bytes]], recorded at
  * write time from `_metadata.file_size`): planning a 100 TB table
  * costs zero filesystem RPCs — only legacy entries written before the
  * field existed fall back to one `getFileStatus` each.
  *
  * Scope: serves the files it is given (the caller decides the
  * snapshot and, for merge-on-read, keeps deletion-vectored files on
  * the anti-join path — a DV'd file's physical rows are NOT all live,
  * which a bare parquet scan cannot know).
  */
final class TxFileIndex(spark: SparkSession, root: Path, snap: Snapshot,
    adds: Seq[Add]) extends FileIndex {

  // nullable like every file-source schema (DataSource.resolveRelation
  // applies asNullable): the declared schema may say required, but a
  // merge can land a NULL key and a default partition a NULL value —
  // a required-typed vectorized read would corrupt them to zeros
  private val partCols: Seq[StructField] =
    snap.meta.partitionCols.flatMap(c => snap.meta.schema.find(_.name == c))
      .map(_.copy(nullable = true))

  override val partitionSchema: StructType = StructType(partCols)

  override def rootPaths: Seq[Path] = Seq(root)

  override def refresh(): Unit = ()

  override lazy val sizeInBytes: Long = statuses.map(_._2.getLen).sum

  // rendered in the empty-authority form Spark's own listings print
  // (`file:///x`) — a Hadoop Path cannot carry that spelling, so the
  // strings are built directly; Dataset.inputFiles then compares stable
  // across the native and per-file read paths
  override def inputFiles: Array[String] =
    statuses.map { case (_, st) =>
      val u = st.getPath.toUri
      u.getScheme + "://" + Option(u.getAuthority).getOrElse("") + u.getPath
    }.toArray

  // (add, status) per live file — resolved once; Add.bytes makes this
  // metadata-only (no RPC) for every file written since the field exists
  private lazy val statuses: Seq[(Add, FileStatus)] = adds.map { a =>
    val raw = new Path(root, a.path)
    val fs = raw.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualified (scheme-carrying) paths, like every Spark file listing —
    // pure path arithmetic, not an RPC
    val p = fs.makeQualified(raw)
    val st = a.bytes match {
      case Some(len) => new FileStatus(len, false, 1, len, 0L, p)
      case None => fs.getFileStatus(p)
    }
    a -> st
  }

  /** A partition tuple's values as an InternalRow under
    * [[partitionSchema]] — decoded from the log's string values with
    * Catalyst's own Cast (null for missing / default-partition keys;
    * files from an OLDER partition layout simply lack the key and read
    * the column from their bytes instead — those files are listed under
    * a null tuple and never partition-prune, which is conservative). */
  private def tupleRow(pv: Map[String, String]): InternalRow =
    InternalRow.fromSeq(partCols.map { f =>
      pv.get(f.name).filterNot(_ == "__HIVE_DEFAULT_PARTITION__") match {
        case Some(v) =>
          Cast(Literal(org.apache.spark.unsafe.types.UTF8String.fromString(v),
            StringType), f.dataType,
            Some(spark.sessionState.conf.sessionLocalTimeZone)).eval(null)
        case None => null
      }
    })

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val statKept =
      if (dataFilters.isEmpty) statuses
      else statuses.filter { case (a, _) => mayMatch(a, dataFilters) }
    val grouped = statKept
      .groupBy { case (a, _) =>
        partCols.map(f => a.partitionValues.get(f.name)) }
      .toSeq.sortBy(_._1.toString)
      .map { case (_, group) =>
        PartitionDirectory(tupleRow(group.head._1.partitionValues),
          group.map(_._2).toArray)
      }
    if (partitionFilters.isEmpty) grouped
    else {
      // bind the filters' attribute references to partition-schema
      // ordinals by name (InMemoryFileIndex's own pruning pattern)
      val bound = partitionFilters.map(_.transform {
        case a: Attribute =>
          val i = partCols.indexWhere(f =>
            spark.sessionState.analyzer.resolver(f.name, a.name))
          require(i >= 0, s"partition filter on unknown column ${a.name}")
          BoundReference(i, partCols(i).dataType, nullable = true)
      }).reduce(org.apache.spark.sql.catalyst.expressions.And)
      val pred = Predicate.create(bound)
      pred.initialize(0)
      grouped.filter(d => pred.eval(d.values))
    }
  }

  /** Conservative file-level evaluation of a data filter against the
    * log's min/max stats: true = the file MAY hold a matching row
    * (missing stats, unsupported shapes, and non-literal operands all
    * keep the file). Stats are keyed by PHYSICAL column name — which is
    * exactly what the relation's attributes carry, since the scan
    * schema is the physical one. */
  private def mayMatch(a: Add, filters: Seq[Expression]): Boolean =
    filters.forall(f => mayMatchOne(a, f))

  private def statOf(a: Add, attr: Attribute): Option[Stat] =
    a.stats.get(attr.name)

  private def rangeMay(st: Stat, lo: Option[Any], hi: Option[Any],
      loStrict: Boolean, hiStrict: Boolean): Boolean = {
    def cmp(x: String, v: Any): Int = st.kind match {
      case "l" => java.lang.Long.compare(x.toLong, v match {
        case n: Number => n.longValue(); case s => s.toString.toLong })
      case "d" => java.lang.Double.compare(x.toDouble, v match {
        case n: Number => n.doubleValue(); case s => s.toString.toDouble })
      case _ => x.compareTo(v.toString)
    }
    val okLo = lo.forall(v =>
      if (loStrict) cmp(st.max, v) > 0 else cmp(st.max, v) >= 0)
    val okHi = hi.forall(v =>
      if (hiStrict) cmp(st.min, v) < 0 else cmp(st.min, v) <= 0)
    okLo && okHi
  }

  private def lit(e: Expression): Option[Any] = e match {
    case Literal(v, _) if v != null => Some(v match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case d: org.apache.spark.sql.types.Decimal => d.toBigDecimal
      case x => x
    })
    case _ => None
  }

  private def mayMatchOne(a: Add, f: Expression): Boolean = f match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      mayMatchOne(a, l) && mayMatchOne(a, r)
    case EqualTo(attr: Attribute, v) => statOf(a, attr) match {
      case Some(st) => lit(v).forall(x =>
        rangeMay(st, Some(x), Some(x), loStrict = false, hiStrict = false))
      case None => true
    }
    case EqualTo(v, attr: Attribute) => mayMatchOne(a, EqualTo(attr, v))
    case EqualNullSafe(attr: Attribute, v) =>
      mayMatchOne(a, EqualTo(attr, v))
    case GreaterThan(attr: Attribute, v) => statOf(a, attr) match {
      case Some(st) =>
        lit(v).forall(x => rangeMay(st, Some(x), None, loStrict = true, hiStrict = false))
      case None => true
    }
    case GreaterThanOrEqual(attr: Attribute, v) => statOf(a, attr) match {
      case Some(st) =>
        lit(v).forall(x => rangeMay(st, Some(x), None, loStrict = false, hiStrict = false))
      case None => true
    }
    case LessThan(attr: Attribute, v) => statOf(a, attr) match {
      case Some(st) =>
        lit(v).forall(x => rangeMay(st, None, Some(x), loStrict = false, hiStrict = true))
      case None => true
    }
    case LessThanOrEqual(attr: Attribute, v) => statOf(a, attr) match {
      case Some(st) =>
        lit(v).forall(x => rangeMay(st, None, Some(x), loStrict = false, hiStrict = false))
      case None => true
    }
    // literal-on-the-left comparisons flip
    case GreaterThan(v, attr: Attribute) => mayMatchOne(a, LessThan(attr, v))
    case GreaterThanOrEqual(v, attr: Attribute) =>
      mayMatchOne(a, LessThanOrEqual(attr, v))
    case LessThan(v, attr: Attribute) => mayMatchOne(a, GreaterThan(attr, v))
    case LessThanOrEqual(v, attr: Attribute) =>
      mayMatchOne(a, GreaterThanOrEqual(attr, v))
    case In(attr: Attribute, vs) if vs.forall(lit(_).isDefined) =>
      statOf(a, attr) match {
        case Some(st) => vs.exists(v => lit(v).forall(x =>
          rangeMay(st, Some(x), Some(x), loStrict = false, hiStrict = false)))
        case None => true
      }
    case _ => true // OR / IsNull / functions / subqueries: keep the file
  }
}

object TxFileIndex {

  /** One native scan over `adds` (physical-name parquet files) at
    * `snap`'s schema, logical names restored on top. Partition columns
    * come from the log's values through the relation's own partition
    * handling; files from an older partition LAYOUT (after a partition
    * evolution) are excluded by the caller — their partition column is
    * data bytes, not a directory value. */
  def scan(spark: SparkSession, root: Path, snap: Snapshot,
      adds: Seq[Add]): DataFrame = {
    val meta = snap.meta
    val pset = meta.partitionCols.toSet
    // scan schema under PHYSICAL names (partition cols identity-mapped
    // — rename refuses them), nullable like any resolved file-source
    // schema — files can legitimately hold NULLs the declared schema
    // calls required (null merge keys, evolution backfill)
    val dataSchema = StructType(
      meta.schema.fields.filterNot(f => pset.contains(f.name))
        .map(f => f.copy(name = meta.physicalOf(f.name), nullable = true)))
    val index = new TxFileIndex(spark, root, snap, adds)
    val relation = HadoopFsRelation(
      location = index,
      partitionSchema = index.partitionSchema,
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat(),
      options = Map.empty)(spark)
    // public wrapping route (Dataset.ofRows is private[sql]); wraps the
    // relation in a LogicalRelation internally
    val df = spark.baseRelationToDataFrame(relation)
    // logical labels + the table's declared column order
    df.select(meta.schema.fieldNames.map(n =>
      col(meta.physicalOf(n)).as(n)).toIndexedSeq: _*)
  }
}
