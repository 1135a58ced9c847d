package graft

import org.apache.spark.sql.SparkSession

/** Engine-level session tuning shared by the entry points (Bench,
  * Verify) and the test harness — settings that change NO query result,
  * only how the local engine pays for I/O metadata (measured round 14,
  * OPTIMIZATION_r14.md):
  *
  *   - `fs.file.impl` → [[graft.hadoop.NioLocalFileSystem]]: Hadoop's
  *     local FS without NativeIO forks a `chmod` subprocess per created
  *     file/dir (2.6–30 ms each); the NIO subclass does it in-process.
  *     Also drops the ChecksumFileSystem `.crc` sibling each write
  *     otherwise pays (the lake format carries its own checksums).
  *   - `fs.AbstractFileSystem.file.impl` → the FileContext twin, used by
  *     streaming checkpoint commits (`readlink` fork per rename
  *     otherwise).
  *   - streaming checkpoint file checksums OFF: Spark 4.1 writes + reads
  *     back a sidecar checksum per checkpoint file (offsets/commits/
  *     state deltas); on a single-host bench the doubled small-file
  *     traffic costs ~10 % of every streaming query and protects
  *     against nothing the OS page cache doesn't. Production on object
  *     stores can re-enable it; results are identical either way.
  *   - whole-stage-codegen class cache raised 100 → 4096 entries
  *     (`spark.sql.codegen.cache.maxEntries`, static conf): the cache
  *     is keyed by generated SOURCE, and this engine re-generates
  *     identical source constantly — every commit's stats pass (same
  *     table schema), every IVM fold (same fold plan per version),
  *     every micro-batch (same streaming plan per trigger) — while a
  *     driver running ~190 distinct queries holds far more than 100
  *     distinct stages, so the default LRU thrashed and re-paid Janino
  *     compilation (~10–50 ms/stage) on nearly every action. Measured
  *     on the commit-heavy lake family, back-to-back same host:
  *     57.7 s → 51.9 s (−10 %). Not a local-mode tune: any long-lived
  *     driver — a streaming job re-planning each trigger, a 100 TB
  *     batch DAG of repeated operator shapes — pays the same
  *     recompilation; the cost is bounded driver metaspace
  *     (~tens of KB per cached class). Generated-class caching cannot
  *     change results, only compile counts.
  *
  * Scheme-specific: HDFS/S3A deployments never load the local-FS
  * classes, so nothing here changes the 100 TB posture — it removes
  * subprocess overhead that only exists on plain-jars local disks.
  */
object SessionTuning {
  val settings: Seq[(String, String)] = Seq(
    "spark.hadoop.fs.file.impl" -> "graft.hadoop.NioLocalFileSystem",
    "spark.hadoop.fs.AbstractFileSystem.file.impl" ->
      "graft.hadoop.NioLocalFs",
    "spark.sql.streaming.checkpoint.fileChecksum.enabled" -> "false",
    // overridable (static conf, so it must land before the first
    // SparkContext): SPARK_GRAFT_CODEGEN_CACHE=100 reproduces the
    // Spark default for A/B measurement
    "spark.sql.codegen.cache.maxEntries" ->
      sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "4096"),
  )

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    settings.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
