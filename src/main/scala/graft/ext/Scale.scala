package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale techniques as first-class utilities: skew-salted joins and
  * bucketed co-located joins. Neither changes results — only the physical
  * distribution of work — so both are property-tested against the plain
  * join.
  */
object SkewJoin {

  /** Salted inner equi-join for a skewed key: the big (skewed) side
    * scatters each row into one of `salt` sub-keys; the small side is
    * replicated `salt` times; the join key becomes (key, salt), so a hot
    * key's rows spread over `salt` reducers instead of one straggler.
    * (AQE's skew-join split handles sort-merge skew automatically; explicit
    * salting remains necessary for skewed *aggregations* and pre-AQE
    * engines, and makes the technique testable here.)
    */
  def saltedInnerJoin(
      big: DataFrame, small: DataFrame, key: String, salt: Int)
      : DataFrame = {
    // any per-row varying value works as scatter input; the row id is
    // deterministic for a fixed partition layout
    val bigSalted = big.withColumn(
      "__salt", pmod(hash(monotonically_increasing_id()), lit(salt)))
    val saltsDf = small.sparkSession.range(salt.toLong)
      .select(col("id").cast("int").as("__salt"))
    val smallReplicated = small.crossJoin(saltsDf)
    bigSalted
      .join(smallReplicated, Seq(key, "__salt"), "inner")
      .drop("__salt")
  }
}

/** Pure range join (no equi key) without the nested-loop cross product
  * Spark would otherwise plan: discretize the range dimension into
  * fixed-width bins, explode each right-side interval to the bins it
  * covers, hash-join on the bin, and apply the exact predicate after.
  * The shuffle is keyed by bin — the cross product never materializes.
  * floor-division monotonicity guarantees no qualifying pair is missed;
  * the exact filter removes bin-only false positives, so results equal
  * the naive theta join bit-for-bit.
  */
object RangeJoin {
  def binned(
      left: DataFrame, leftVal: String,
      right: DataFrame, loCol: String, hiCol: String,
      binWidth: Double): DataFrame = {
    val lb = left.withColumn(
      "__bin", floor(col(leftVal) / binWidth).cast("long"))
    val rb = right.withColumn(
      "__bin", explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        floor(col(hiCol) / binWidth).cast("long"))))
    lb.join(rb, Seq("__bin"))
      .where(col(leftVal) >= col(loCol) && col(leftVal) <= col(hiCol))
      .drop("__bin")
  }
}

/** Data-layout technique: range-partitioned, sorted-within-partition
  * parquet. Each output file then covers a NARROW key range, so parquet's
  * per-row-group min/max statistics let a selective filter skip whole
  * files/row groups — at 100 TB the difference between scanning the
  * corpus and scanning the slice. Results are layout-independent (the
  * same rows come back); LayoutSpec asserts the locality property
  * directly: a narrow filter touches a bounded number of files under
  * this layout but ~all files under hash layout.
  */
object RangeLayout {

  def writeRangeLayout(df: DataFrame, path: String, sortCol: String,
      partitions: Int): Unit =
    df.repartitionByRange(partitions, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  /** Distinct files actually supplying rows for the given filter —
    * the observable form of file-level pruning/locality.
    */
  def filesTouched(spark: SparkSession, path: String, predicate: String)
      : Long =
    spark.read.parquet(path).where(predicate)
      .select(input_file_name()).distinct().count()
}

/** Multi-dimensional data layout: order rows along a Morton (Z-order)
  * curve over TWO key columns before writing. A single-column range
  * layout gives file-level min/max pruning on that column only; the
  * interleaved-bit curve keeps BOTH dimensions locally clustered, so a
  * selective filter on EITHER column skips most files (~√F of F files
  * touched, vs F under the orthogonal single-column layout) — the
  * standard lakehouse OPTIMIZE ZORDER BY trade.
  */
object ZOrderLayout {

  /** Interleave the low `bits` bits of two non-negative ints:
    * result bit 2i = a's bit i, bit 2i+1 = b's bit i. Pure codegen'd
    * arithmetic — no UDF.
    */
  def mortonCode(a: Column, b: Column, bits: Int): Column =
    mortonCodeN(Seq(a, b), bits)

  /** N-column Morton interleave: output bit `n*i + j` is column j's
    * bit i — the 2-column code generalized to any dimension count.
    * Pure codegen'd arithmetic, no UDF. `n * bits` must fit a long. */
  def mortonCodeN(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1 && n * bits <= 62,
      s"morton interleave of $n columns x $bits bits overflows a long")
    (for { i <- 0 until bits; (c, j) <- cols.zipWithIndex } yield
      shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), n * i + j))
      .reduce(_ bitwiseOR _)
  }

  /** Range-partition + sort by the Morton code of (ca, cb), then drop
    * the helper column on write. Both columns are first min-max scaled
    * onto the common [0, 2^bits) grid — interleaving RAW values would let
    * the wider-ranged column dominate the curve's high bits and starve
    * the narrower one of locality (a 5-bit day interleaved with an 8-bit
    * user id gets no say in which file a row lands in). The min/max
    * pre-pass is one cheap agg; at 100 TB it reads column stats, not data.
    */
  /** The reusable half of [[writeZOrder]]: the frame re-clustered along
    * the curve (range-partitioned + sorted by the scaled Morton code,
    * helper column dropped). Returns `df` unchanged on empty/all-null
    * key columns. Consumed by the dir-based writer below and by the
    * ACID table's OPTIMIZE ZORDER ([[graft.lake.TxTable.optimize]]).
    */
  def zOrdered(df: DataFrame, ca: String, cb: String,
      bits: Int, partitions: Int): DataFrame =
    zOrderedN(df, Seq(ca, cb), bits, partitions)

  /** The set of types [[zOrderedN]] can place on the curve. */
  def clusterable(dt: org.apache.spark.sql.types.DataType): Boolean =
    dt match {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.StringType => true
      case org.apache.spark.sql.types.DateType => true
      case org.apache.spark.sql.types.TimestampType => true
      case _ => false
    }

  /** A string's 56-bit big-endian rank over the 7 UTF-8 bytes after
    * `skip` (zero-padded) — numeric order equals lexicographic UTF-8
    * byte order beyond the skipped shared prefix, which is exactly the
    * order Spark's string comparisons and parquet min/max stats use. */
  private[graft] def stringRankOf(s: String, skip: Int): Long = {
    val b = s.getBytes("UTF-8")
    var v = 0L
    var i = 0
    while (i < 7) {
      v = (v << 8) |
        (if (skip + i < b.length) b(skip + i) & 0xffL else 0L)
      i += 1
    }
    v
  }

  /** Length of the UTF-8 byte prefix `lo` and `hi` share — every value
    * between them (lexicographically) shares it too, so the rank can
    * skip it. Without this a corpus of `Customer#000...`-style keys
    * would rank CONSTANT (all information past byte 7) and get no
    * locality at all. */
  private def sharedPrefixLen(lo: String, hi: String): Int = {
    val a = lo.getBytes("UTF-8"); val b = hi.getBytes("UTF-8")
    var i = 0
    while (i < a.length && i < b.length && a(i) == b(i)) i += 1
    i
  }

  /** [[zOrdered]] over any number of key columns (Delta's multi-column
    * OPTIMIZE ZORDER / clustering keys): each column's sortable LONG
    * rank (numerics as-is, dates/timestamps as epoch counts, strings
    * as the 7-byte big-endian slice after the corpus's shared prefix)
    * min-max scales onto the common [0, 2^bits) grid, the N-way Morton
    * code clusters them, and file-level min/max stats prune on EVERY
    * dimension (string keys prune on their stored min/max strings —
    * the byte rank preserves that order). Rank BOUNDS derive on the
    * driver from the one min/max agg — strings never need a second
    * scan. Returns `df` unchanged if any key column is empty /
    * all-null (no range to scale onto). */
  def zOrderedN(df: DataFrame, cs: Seq[String], bits: Int,
      partitions: Int): DataFrame = {
    require(cs.nonEmpty, "zOrderedN needs at least one column")
    val aggs = cs.flatMap(c => Seq(min(col(c)), max(col(c))))
    val r = df.agg(aggs.head, aggs.tail: _*).first()
    if (cs.indices.exists(j => r.isNullAt(2 * j))) return df
    // (rank column, driver-known rank lo, rank hi) per key
    val ranks: Seq[(Column, Long, Long)] = cs.zipWithIndex.map {
      case (c, j) =>
        df.schema(c).dataType match {
          case _: org.apache.spark.sql.types.NumericType =>
            (col(c), r.getAs[Number](2 * j).longValue,
              r.getAs[Number](2 * j + 1).longValue)
          case org.apache.spark.sql.types.StringType =>
            val (lo, hi) = (r.getString(2 * j), r.getString(2 * j + 1))
            val skip = sharedPrefixLen(lo, hi)
            val rk = expr(s"CAST(conv(hex(rpad(substring(" +
              s"CAST(`$c` AS BINARY), ${skip + 1}, 7), 7, x'00')), " +
              "16, 10) AS BIGINT)")
            (rk, stringRankOf(lo, skip), stringRankOf(hi, skip))
          case org.apache.spark.sql.types.DateType =>
            (col(c).cast("int"),
              r.getAs[java.sql.Date](2 * j).toLocalDate.toEpochDay,
              r.getAs[java.sql.Date](2 * j + 1).toLocalDate.toEpochDay)
          case org.apache.spark.sql.types.TimestampType =>
            // cast(ts AS LONG) floors to SECONDS — bounds must match
            (col(c).cast("long"),
              math.floorDiv(
                r.getAs[java.sql.Timestamp](2 * j).getTime, 1000L),
              math.floorDiv(
                r.getAs[java.sql.Timestamp](2 * j + 1).getTime, 1000L))
          case other => throw new IllegalArgumentException(
            s"ZORDER/CLUSTER BY: $c (${other.simpleString}) has no " +
              "sortable rank — numeric, string, date, and timestamp " +
              "columns cluster")
        }
    }
    // multiply-first spreads a NARROW range across the whole grid (the
    // interleave-balance point of scaling); a range wide enough for
    // the multiply to overflow a long (56-bit string ranks, epoch
    // micros) divides by a driver-computed bucket step instead
    def scaled(rk: Column, lo: Long, hi: Long): Column = {
      val span = math.max(hi - lo + 1, 1L)
      val buckets = 1L << bits
      if (span <= (Long.MaxValue >> (bits + 1)))
        ((rk - lit(lo)).cast("long") * lit(buckets) / lit(span))
          .cast("long")
      else {
        val step = math.max((span + buckets - 1) / buckets, 1L)
        // least() IGNORES nulls, so an unguarded least(rank/step, max)
        // would map a NULL key to the TOP grid cell instead of
        // propagating NULL like the multiply-first branch does —
        // inconsistent clustering for NULL-keyed rows (layout only;
        // pruning stats come from real data either way)
        when(rk.isNull, lit(null).cast("long"))
          .otherwise(least((rk - lit(lo)).cast("long") / lit(step),
            lit(buckets - 1)).cast("long"))
      }
    }
    df.withColumn("__z", mortonCodeN(
        ranks.map { case (rk, lo, hi) => scaled(rk, lo, hi) },
        bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  def writeZOrder(df: DataFrame, path: String, ca: String, cb: String,
      bits: Int, partitions: Int): Unit =
    zOrdered(df, ca, cb, bits, partitions)
      .write.mode("overwrite").parquet(path)
}

object Bucketing {

  /** Persist a table bucketed (and sorted) by the join key. Two tables
    * bucketed the same way join with ZERO shuffle — at 100 TB this turns
    * every fact⋈fact join on the bucket key from a full network shuffle
    * into a local merge.
    */
  def writeBucketed(
      df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    // a managed-table location can survive a previous session whose
    // in-memory catalog is gone; saveAsTable then refuses with
    // LOCATION_ALREADY_EXISTS even in overwrite mode. Drop both halves —
    // catalog entry AND stale directory — before writing. The location
    // comes from the catalog when the table is registered; for the
    // dead-session case it is derived the way the session catalog does
    // (warehouse/<table> in `default`, warehouse/<db>.db/<table>
    // elsewhere), honoring a qualified `db.tbl` name.
    val spark = df.sparkSession
    val loc: org.apache.hadoop.fs.Path =
      if (spark.catalog.tableExists(table)) {
        val desc = spark.sql(s"DESCRIBE TABLE EXTENDED $table")
          .where(org.apache.spark.sql.functions.col("col_name")
            .isin("Location", "Type"))
          .collect().map(r => r.getString(0) -> r.getString(1)).toMap
        // the drop below recursively deletes the location — that is only
        // ever safe for a location the catalog OWNS. An EXTERNAL table's
        // location is user data; destroying it on a name collision would
        // be silent data loss, so refuse loudly instead.
        if (desc.get("Type").exists(_.trim.equalsIgnoreCase("EXTERNAL")))
          throw new IllegalArgumentException(
            s"writeBucketed: refusing to overwrite EXTERNAL table " +
              s"$table at ${desc.getOrElse("Location", "<unknown>")} — " +
              "its location is user data, not a managed layout; drop it " +
              "explicitly first")
        // a view / oddly-formatted catalog row can lack a Location line;
        // fail with the actual problem, not a bare NoSuchElementException
        val locStr = desc.getOrElse("Location", throw new
          IllegalArgumentException(
            s"writeBucketed: cannot determine the storage location of " +
              s"existing table $table (no Location in DESCRIBE TABLE " +
              "EXTENDED — is it a view?) — refusing to overwrite"))
        new org.apache.hadoop.fs.Path(new java.net.URI(locStr))
      } else {
        val (db, tbl) = table.split('.') match {
          case Array(d, t) => (d, t)
          case _ => (spark.catalog.currentDatabase, table)
        }
        val wh = new org.apache.hadoop.fs.Path(
          spark.conf.get("spark.sql.warehouse.dir"))
        if (db == "default") new org.apache.hadoop.fs.Path(wh, tbl)
        else new org.apache.hadoop.fs.Path(wh, s"$db.db/$tbl")
      }
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key. */
  def bucketedJoin(
      spark: SparkSession, left: String, right: String, key: String)
      : DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** True when the executed plan contains no shuffle exchange. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
