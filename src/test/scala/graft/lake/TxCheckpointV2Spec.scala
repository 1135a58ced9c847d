package graft.lake

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** V2 (SIDECAR) checkpoints — the published shape (Delta PROTOCOL.md
  * "V2 Checkpoints") re-expressed over the txlog: the periodic full
  * checkpoint of a LARGE table becomes a small manifest (meta + txns +
  * sidecar refs) plus ONE tail-sized incremental sidecar; unchanged
  * sidecars are re-referenced, a later generation's add OVERRIDES and
  * its remove TOMBSTONES, and the chain folds back to a single fresh
  * sidecar at the generation cap. Checkpoint WRITE bytes become ∝
  * interval churn instead of live-set size — the last O(live) write on
  * the commit path of a 100 TB table.
  */
class TxCheckpointV2Spec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(tag: String): String =
    Files.createTempDirectory(s"txv2_$tag").resolve("tbl").toString

  private def docs(n: Int): org.apache.spark.sql.DataFrame =
    spark.range(n).select($"id", concat(lit("doc-"), $"id").as("text"))

  private def fsOf(root: String) = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def sidecarNames(root: String): Seq[String] = {
    val p = new Path(root, "_txlog/_sidecars")
    val fs = fsOf(root)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).map(_.getPath.getName).toSeq.sorted
  }

  private def sidecarEntryCount(root: String, name: String): Long =
    spark.read.parquet(s"$root/_txlog/_sidecars/$name").count()

  test("incremental sidecars: write ∝ tail churn, unchanged sidecars " +
      "re-referenced, tombstones retract, fold-back at the cap, " +
      "replay equality across ALL checkpoint formats") {
    val root = freshRoot("incr")
    val tab = new TxTable(spark, root)
    spark.conf.set(TxLog.checkpointParquetMinEntriesKey, "1")
    spark.conf.set(TxLog.fullCheckpointMultipleKey, "1")
    spark.conf.set(TxLog.checkpointV2MaxSidecarsKey, "3")
    try {
      val ids = scala.collection.mutable.Set[Long]()
      tab.create(docs(40).repartition(4)) // v0: 4 files
      ids ++= (0L until 40L)
      def appendShift(i: Int): Unit = {
        tab.append(docs(1).withColumn("id", $"id" + i * 100L))
        ids += i * 100L
      }
      def deleteId(id: Long): Unit = {
        tab.deleteWhere($"id" === id)
        ids -= id
      }
      def checkContent(tag: String): Unit =
        assert(tab.read().select($"id").as[Long].collect().sorted.toSeq
          === ids.toSeq.sorted, s"content mismatch at $tag")

      (1 to 10).foreach(appendShift) // v10: first ckpt (driver fold)
      (11 to 14).foreach(appendShift)
      deleteId(300L) // v15: a remove the NEXT checkpoint must reflect
      (16 to 20).foreach(appendShift) // v20: first V2 (fold-back)
      assert(TxLog.lastCheckpointWrite.get()._1 === "v2-full",
        s"v20 must write the first V2 chain, got " +
          s"${TxLog.lastCheckpointWrite.get()}")
      val gen1 = sidecarNames(root)
      assert(gen1.size === 1, s"one fresh sidecar expected, got $gen1")
      checkContent("v20")

      (21 to 24).foreach(appendShift)
      deleteId(400L) // the incremental sidecar must TOMBSTONE this
      (26 to 30).foreach(appendShift) // v30: incremental
      assert(TxLog.lastCheckpointWrite.get()._1 === "v2-incremental",
        s"v30 must extend the chain, got " +
          s"${TxLog.lastCheckpointWrite.get()}")
      val gen2 = sidecarNames(root)
      assert(gen2.size === 2, s"chain of two expected, got $gen2")
      assert(gen2.contains(gen1.head),
        "the unchanged generation-1 sidecar must be re-referenced, " +
          "not rewritten")
      // write ∝ churn: the new sidecar holds the interval's net
      // entries (≤ 10 commits' adds + rewrites + tombstones), nowhere
      // near the ~55-file live set
      val newSidecar = (gen2.toSet -- gen1.toSet).head
      val incEntries = sidecarEntryCount(root, newSidecar)
      assert(incEntries <= 25L,
        s"incremental sidecar must be churn-bounded, got $incEntries")
      val liveAtV20 = TxLog.snapshot(fsOf(root), new Path(root),
        Some(20L)).adds.size.toLong
      assert(sidecarEntryCount(root, gen1.head) === liveAtV20,
        "the base sidecar carries exactly v20's live set")
      assert(incEntries < liveAtV20,
        "the incremental write must be smaller than the live set")
      checkContent("v30")
      // deleted ids must NOT resurrect through the chain
      assert(tab.read().where($"id".isin(300L, 400L)).count() === 0L)

      (31 to 40).foreach(appendShift) // v40: incremental (3 gens, at cap)
      assert(sidecarNames(root).size === 3)
      (41 to 50).foreach(appendShift) // v50: cap reached → fold-back
      assert(TxLog.lastCheckpointWrite.get()._1 === "v2-full",
        s"the cap must fold the chain back, got " +
          s"${TxLog.lastCheckpointWrite.get()}")
      checkContent("v50")

      // replay equality across formats: each floor resolves through a
      // DIFFERENT checkpoint shape (classic parquet at v10, v2-full at
      // v20, v2-incremental chain at v30/v40, fresh fold-back at v50)
      val fs = fsOf(root)
      Seq(15L, 25L, 35L, 45L).foreach { v =>
        val snap = TxLog.snapshot(fs, new Path(root), Some(v))
        assert(snap.version === v)
        assert(snap.adds.nonEmpty)
      }
      assert(TxLog.snapshot(fs, new Path(root), Some(25L)).adds
        .forall(a => fs.exists(new Path(root, a.path))),
        "a v2-resolved snapshot must reference only real files")

      // the DISTRIBUTED read path (window fold over the chain) agrees
      spark.conf.set(TxLog.driverSnapshotMaxFilesKey, "1")
      try checkContent("distributed fold")
      finally spark.conf.unset(TxLog.driverSnapshotMaxFilesKey)

      // log retention: manifests behind the floor go, and with them
      // the sidecars ONLY they referenced; the fresh chain survives
      val before = sidecarNames(root)
      val doomed = TxLog.cleanLog(fs, new Path(root), 1)
      assert(doomed.exists(_.startsWith("_sidecars/")),
        s"orphaned sidecar generations must reclaim, got $doomed")
      val after = sidecarNames(root)
      assert(after.size < before.size)
      checkContent("post-cleanLog")
    } finally {
      spark.conf.unset(TxLog.checkpointParquetMinEntriesKey)
      spark.conf.unset(TxLog.fullCheckpointMultipleKey)
      spark.conf.unset(TxLog.checkpointV2MaxSidecarsKey)
    }
  }

  test("manifest checkpoints are feature-gated: the stamped meta " +
      "refuses a reader without v2Checkpoints") {
    val root = freshRoot("gate")
    val tab = new TxTable(spark, root)
    spark.conf.set(TxLog.checkpointParquetMinEntriesKey, "1")
    spark.conf.set(TxLog.fullCheckpointMultipleKey, "1")
    try {
      tab.create(docs(20).repartition(4))
      (1 to 20).foreach(i =>
        tab.append(docs(1).withColumn("id", $"id" + i * 100L)))
      assert(sidecarNames(root).nonEmpty, "a V2 chain must exist")
      // the manifest's own meta carries the gate: an older client
      // pointed here by _last_checkpoint deserializes the manifest
      // WITHOUT the sidecar field (meta/txns, zero adds) and must
      // refuse on the feature instead of silently reconstructing a
      // truncated live set
      val snap = TxLog.snapshot(fsOf(root), new Path(root))
      assert(snap.meta.features.contains("v2Checkpoints"),
        s"manifest meta must stamp the gate, got ${snap.meta.features}")
      assert(TxLog.supportedReaderFeatures.contains("v2Checkpoints"))
      assert(snap.adds.size === 24)
      // pre-checkpoint time travel replays unstamped JSON metas: no
      // gate, classic reads stay open to old clients
      assert(!TxLog.snapshot(fsOf(root), new Path(root), Some(5L))
        .meta.features.contains("v2Checkpoints"))
    } finally {
      spark.conf.unset(TxLog.checkpointParquetMinEntriesKey)
      spark.conf.unset(TxLog.fullCheckpointMultipleKey)
    }
  }

  test("fold-back at the cap racing 4 concurrent appenders: replay " +
      "equality, no lost or resurrected rows") {
    // the round-13 concern: checkpoint fold-back (the writer reading
    // the PREVIOUS chain while claiming the next version) racing
    // optimistic commits was spec'd only for classic parquet
    val root = freshRoot("race")
    val tab = new TxTable(spark, root)
    spark.conf.set(TxLog.checkpointParquetMinEntriesKey, "1")
    spark.conf.set(TxLog.fullCheckpointMultipleKey, "1")
    spark.conf.set(TxLog.checkpointV2MaxSidecarsKey, "2")
    try {
      tab.create(docs(10).repartition(2))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        // 4 writers × 12 appends with maxSidecars=2 and interval 10:
        // every 10th commit checkpoints (alternating incremental /
        // fold-back), so several checkpoint writes race live commits
        val writers = (0 until 4).map { w =>
          scala.concurrent.Future {
            val mine = new TxTable(spark, root)
            (0 until 12).foreach { i =>
              mine.append(docs(1)
                .withColumn("id", $"id" + lit(1000L * (w + 1) + i)))
            }
          }
        }
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(writers),
          scala.concurrent.duration.Duration(300, "s"))
      } finally pool.shutdown()
      val expected = (0L until 10L) ++
        (for (w <- 0 until 4; i <- 0 until 12)
          yield 1000L * (w + 1) + i)
      assert(tab.read().select($"id").as[Long].collect().sorted.toSeq
        === expected.sorted,
        "every racing append must land exactly once through the " +
          "checkpointed fold")
      // replay equality at every checkpointed floor: counts strictly
      // grow by the interval's appends, and each snapshot resolves
      val fs = fsOf(root)
      val latest = tab.version
      val counts = (0L to latest by 10L).map { v =>
        TxLog.snapshot(fs, new Path(root), Some(v)).adds
          .map(_.rows).sum
      }
      assert(counts === counts.sorted,
        s"version-floor row counts must be monotonic, got $counts")
      assert(counts.last <= expected.size.toLong)
      assert(TxLog.snapshot(fs, new Path(root)).adds
        .map(_.rows).sum === expected.size.toLong)
    } finally {
      spark.conf.unset(TxLog.checkpointParquetMinEntriesKey)
      spark.conf.unset(TxLog.fullCheckpointMultipleKey)
      spark.conf.unset(TxLog.checkpointV2MaxSidecarsKey)
    }
  }
}
