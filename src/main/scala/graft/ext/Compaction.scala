package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction (the OPTIMIZE/bin-packing maintenance job every
  * production lake needs): rewrite a partitioned table so each partition
  * holds few well-sized files instead of many fragments.
  *
  * Scale posture: the rewrite is `REBALANCE` + `maxRecordsPerFile` — AQE
  * coalesces fragment partitions to the advisory size and splits skewed
  * ones, so file sizes converge on the target from BOTH directions. At
  * 100 TB a real deployment would drive this selectively from file-count
  * metadata (compact only partitions whose small-file count crosses a
  * threshold) — the per-partition rewrite below is exactly that inner
  * step, and partition pruning keeps the read side bounded.
  */
object Compaction {

  final case class Stats(filesBefore: Int, filesAfter: Int,
      bytesBefore: Long, bytesAfter: Long)

  /** Recursive count/size of data files under `dir` (hidden files and
    * _metadata sidecars excluded).
    */
  def dataFiles(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) Seq.empty
    else {
      val it = fs.listFiles(root, true)
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
      while (it.hasNext) {
        val f = it.next()
        val n = f.getPath.getName
        if (!n.startsWith("_") && !n.startsWith(".") && !n.endsWith(".crc"))
          buf += ((f.getPath.toString, f.getLen))
      }
      buf.toSeq
    }
  }

  /** Rewrite `inDir` (a possibly-fragmented partitioned table) into
    * `outDir` with size-targeted files, preserving partitioning and
    * every row. Returns before/after file statistics.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Stats = {
    val before = dataFiles(spark, inDir)
    val df = spark.read.parquet(inDir)
    // rebalance ON the partition columns: an unkeyed rebalance spreads
    // each partitionBy value across many tasks, and the write then emits
    // one file per (task, value) — re-fragmenting what it claims to
    // bin-pack once AQE keeps more than one rebalanced partition
    val rebalanced =
      if (partitionCols.nonEmpty)
        df.hint("rebalance",
          partitionCols.map(org.apache.spark.sql.functions.col): _*)
      else df.hint("rebalance")
    val writer = rebalanced.write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(outDir)
    val after = dataFiles(spark, outDir)
    Stats(before.size, after.size, before.map(_._2).sum, after.map(_._2).sum)
  }
}
