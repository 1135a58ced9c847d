package graft.ext

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

import graft.core.LoadPartitions

/** Load retention — the lake's GC: every run of a [[graft.core.TableEtl]]
  * node appends an `etl_inserted=<ts>` load partition (dynamic overwrite
  * keeps history for reproducibility and load-pinned reads), so without
  * expiry a daily table accretes forever. Expiry is pure metadata work —
  * one directory listing + directory deletes, no Spark job, cost
  * independent of data volume — exactly the VACUUM/retention shape a
  * 100 TB lake needs. The null-load directory and non-timestamp names are
  * never touched (same filter as the latest-load read, so retention can
  * never delete what a read could still select as "latest").
  */
object Retention {

  /** Delete all but the newest `keep` load partitions under `tablePath`.
    * Returns the decoded values of the deleted loads (oldest first).
    */
  def expireLoads(spark: SparkSession, tablePath: String,
      keep: Int, key: String = "etl_inserted"): Seq[String] = {
    require(keep >= 1, "retention must keep at least the latest load")
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val loads = LoadPartitions.timestampDirs(fs, root, key)
    val expired = loads.dropRight(keep)
    expired.foreach { case (dir, _) => fs.delete(dir, true) }
    expired.map(_._2)
  }
}
