package graft

import java.nio.file.Files

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path, RawLocalFileSystem}

import graft.lake.{LogStore, TxLog}

/** A local filesystem masquerading as an object store: scheme "mocks3"
  * and a rename that — like S3's copy+delete — NEVER refuses an
  * existing destination. The raw primitives on this store silently
  * lose a racing commit; [[graft.lake.LogStore]] must therefore refuse
  * it by default and win the race only through a registered claim.
  */
class MockS3FileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mocks3"
  override def getUri: java.net.URI = java.net.URI.create("mocks3:///")
  override def rename(src: Path, dst: Path): Boolean = {
    // last-writer-wins, the object-store PUT semantics
    if (exists(dst)) delete(dst, false)
    super.rename(src, dst)
  }
}

/** The per-scheme commit-claim contract ([[graft.lake.LogStore]]): the
  * multi-writer ACID guarantee holds exactly where an atomic claim
  * exists, and is REFUSED — not silently raced — where none does.
  * Driven through a simulated non-atomic store, per the known Delta S3
  * problem (solved there with conditional PUT / DynamoDB coordination).
  */
class TxLogStoreSpec extends SparkSpec {

  private def mockFs(extra: (String, String)*): MockS3FileSystem = {
    val conf = new Configuration(spark.sparkContext.hadoopConfiguration)
    extra.foreach { case (k, v) => conf.set(k, v) }
    val fs = new MockS3FileSystem
    fs.initialize(java.net.URI.create("mocks3:///"), conf)
    fs
  }

  private def freshRoot(tag: String): Path =
    new Path(Files.createTempDirectory(s"logstore_$tag")
      .resolve("tbl").toString)

  private def entriesFor(op: String): Seq[TxLog.LogEntry] = Seq(
    TxLog.LogEntry(meta = Some(TxLog.Meta(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType))).json, Nil))),
    TxLog.LogEntry(info = Some(TxLog.Info(op, -1L))))

  test("the simulated store's raw primitives double-claim: both writers' renames succeed") {
    val fs = mockFs()
    val root = freshRoot("raw")
    fs.mkdirs(root)
    val dst = new Path(root, "00000000000000000000.json")
    val t1 = new Path(root, "tmp1")
    val t2 = new Path(root, "tmp2")
    Seq(t1 -> "writer-one", t2 -> "writer-two").foreach { case (p, s) =>
      val out = fs.create(p, true)
      try out.write(s.getBytes("UTF-8")) finally out.close()
    }
    // both writers pass the exists check before either renames...
    assert(!fs.exists(dst) && !fs.exists(dst))
    assert(fs.rename(t1, dst))
    // ...and the SECOND rename succeeds too — writer one's commit is gone
    assert(fs.rename(t2, dst))
    val in = fs.open(dst)
    val buf = new Array[Byte](64)
    val n = in.read(buf); in.close()
    assert(new String(buf, 0, n, "UTF-8") === "writer-two")
  }

  test("commits on a scheme with no atomic claim refuse loudly by default") {
    val fs = mockFs()
    val root = freshRoot("refuse")
    val err = intercept[IllegalStateException] {
      TxLog.tryCommit(fs, root, 0L, entriesFor("CREATE"))
    }
    assert(err.getMessage.contains("no atomic commit claim"))
    assert(err.getMessage.contains("mocks3"))
    // nothing was published
    assert(TxLog.latestVersion(fs, root) === -1L)
  }

  test("a registered claim makes a double-claim impossible: 8 racing writers, 1 winner") {
    LogStore.register("mocks3", LogStore.SingleDriverClaim)
    try {
      val fs = mockFs()
      val root = freshRoot("race")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        val barrier = new java.util.concurrent.CyclicBarrier(8)
        val wins = scala.concurrent.Await.result(
          scala.concurrent.Future.sequence((0 until 8).map { i =>
            scala.concurrent.Future {
              barrier.await()
              TxLog.tryCommit(fs, root, 0L, entriesFor(s"CREATE_$i"))
            }
          }),
          scala.concurrent.duration.Duration(60, "s"))
        assert(wins.count(identity) === 1,
          s"expected exactly one winning claim, got $wins")
        assert(TxLog.latestVersion(fs, root) === 0L)
        // the winner's content survived intact (exactly one op line)
        val ops = TxLog.commitInfo(fs, root, 0L).map(_.op).toSeq
        assert(ops.size === 1 && ops.head.startsWith("CREATE_"))
      } finally pool.shutdown()
    } finally LogStore.unregister("mocks3")
  }

  test("CoordinatedClaim: two independent claim instances (two 'JVMs') " +
      "racing through the non-atomic store — exactly one winner") {
    val fs = mockFs()
    val root = freshRoot("coord")
    fs.mkdirs(root)
    val coordDir = new Path(Files.createTempDirectory("coord_lock").toString)
    val coordFs = coordDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // two SEPARATE instances: no shared JVM state may decide the race —
    // only the coordinator directory's atomic primitive does
    val claimA = new LogStore.CoordinatedClaim(coordFs, coordDir)
    val claimB = new LogStore.CoordinatedClaim(coordFs, coordDir)
    val dst = new Path(root, "00000000000000000000.json")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutorService(pool)
      val barrier = new java.util.concurrent.CyclicBarrier(8)
      val wins = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence((0 until 8).map { i =>
          scala.concurrent.Future {
            val tmp = new Path(root, s"tmp_$i")
            val out = fs.create(tmp, true)
            try out.write(s"writer-$i".getBytes("UTF-8"))
            finally out.close()
            barrier.await()
            (if (i % 2 == 0) claimA else claimB).claim(fs, tmp, dst)
          }
        }),
        scala.concurrent.duration.Duration(60, "s"))
      assert(wins.count(identity) === 1,
        s"expected exactly one winning coordinated claim, got $wins")
      val winner = wins.indexOf(true)
      val in = fs.open(dst)
      val buf = new Array[Byte](64)
      val n = in.read(buf); in.close()
      assert(new String(buf, 0, n, "UTF-8") === s"writer-$winner",
        "the winner's content must survive intact — no overwrite")
    } finally pool.shutdown()
  }

  test("CoordinatedClaim registered for the scheme: full tryCommit race, " +
      "one winner, losers retry cleanly") {
    val coordDir = new Path(Files.createTempDirectory("coord_lock2").toString)
    val coordFs = coordDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    LogStore.register("mocks3",
      new LogStore.CoordinatedClaim(coordFs, coordDir))
    try {
      val fs = mockFs()
      val root = freshRoot("coordrace")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        implicit val ec: scala.concurrent.ExecutionContext =
          scala.concurrent.ExecutionContext.fromExecutorService(pool)
        val barrier = new java.util.concurrent.CyclicBarrier(8)
        val wins = scala.concurrent.Await.result(
          scala.concurrent.Future.sequence((0 until 8).map { i =>
            scala.concurrent.Future {
              barrier.await()
              TxLog.tryCommit(fs, root, 0L, entriesFor(s"CREATE_$i"))
            }
          }),
          scala.concurrent.duration.Duration(60, "s"))
        assert(wins.count(identity) === 1,
          s"expected exactly one winning claim, got $wins")
        assert(TxLog.latestVersion(fs, root) === 0L)
        val ops = TxLog.commitInfo(fs, root, 0L).map(_.op).toSeq
        assert(ops.size === 1 && ops.head.startsWith("CREATE_"))
        // and the NEXT version claims cleanly (fresh marker per dst)
        assert(TxLog.tryCommit(fs, root, 1L, entriesFor("APPEND")))
        assert(TxLog.latestVersion(fs, root) === 1L)
      } finally pool.shutdown()
    } finally LogStore.unregister("mocks3")
  }

  test("CoordinatedClaim: a destructive re-create voids the dead " +
      "incarnation's markers, other tables' markers survive") {
    val coordDir = new Path(Files.createTempDirectory("coord_lock3").toString)
    val coordFs = coordDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val claim = new LogStore.CoordinatedClaim(coordFs, coordDir)
    LogStore.register("mocks3", claim)
    try {
      val fs = mockFs()
      val root = freshRoot("recreate")
      val other = freshRoot("bystander")
      assert(TxLog.tryCommit(fs, root, 0L, entriesFor("CREATE")))
      assert(TxLog.tryCommit(fs, root, 1L, entriesFor("APPEND")))
      assert(TxLog.tryCommit(fs, other, 0L, entriesFor("CREATE")))
      // the first incarnation's markers refuse a blind re-claim
      assert(!TxLog.tryCommit(fs, root, 0L, entriesFor("CREATE2")))
      // a destructive re-create (delete + invalidate, TxTable.create's
      // sequence) claims v0 and v1 cleanly again
      fs.delete(root, true)
      claim.invalidateTable(new Path(root, "_txlog"))
      assert(TxLog.tryCommit(fs, root, 0L, entriesFor("CREATE2")))
      assert(TxLog.tryCommit(fs, root, 1L, entriesFor("APPEND2")))
      // the bystander table's claim state is untouched: its v0 still
      // refuses, its next version still claims
      assert(!TxLog.tryCommit(fs, other, 0L, entriesFor("DUPE")))
      assert(TxLog.tryCommit(fs, other, 1L, entriesFor("APPEND")))
    } finally LogStore.unregister("mocks3")
  }

  test("CoordinatedClaim: a crashed winner's commit is COMPLETED by the " +
      "next claimer from the marker-recorded staged tmp") {
    val fs = mockFs()
    val root = freshRoot("crashed")
    fs.mkdirs(root)
    val coordDir = new Path(Files.createTempDirectory("coord_lock4").toString)
    val coordFs = coordDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    // a claim whose data-store PUT dies AFTER winning the marker — the
    // incomplete-entry window (Delta's S3DynamoDBLogStore problem)
    class CrashingClaim extends LogStore.CoordinatedClaim(
        coordFs, coordDir, recoveryGraceMs = 0L) {
      override protected def publish(fs: org.apache.hadoop.fs.FileSystem,
          tmp: Path, dst: Path): Boolean =
        throw new RuntimeException("simulated crash: marker claimed, PUT never ran")
    }
    val dst = new Path(root, "00000000000000000000.json")
    val tmpW = new Path(root, "tmp_winner")
    val outW = fs.create(tmpW, true)
    try outW.write("winner-payload".getBytes("UTF-8")) finally outW.close()
    intercept[RuntimeException] { new CrashingClaim().claim(fs, tmpW, dst) }
    // the stuck state: version claimed, commit unpublished
    assert(!fs.exists(dst))
    // a healthy claimer (zero grace) arrives with ITS OWN payload: it
    // loses the marker — and completes the crashed winner's commit
    val healthy = new LogStore.CoordinatedClaim(coordFs, coordDir, 0L)
    val tmpL = new Path(root, "tmp_loser")
    val outL = fs.create(tmpL, true)
    try outL.write("loser-payload".getBytes("UTF-8")) finally outL.close()
    assert(!healthy.claim(fs, tmpL, dst),
      "the recoverer must NOT win the version it recovered")
    val in = fs.open(dst)
    val buf = new Array[Byte](64)
    val n = in.read(buf); in.close()
    assert(new String(buf, 0, n, "UTF-8") === "winner-payload",
      "recovery completes the CRASHED WINNER's payload, never the recoverer's")
    // the recoverer's normal retry at the next version claims cleanly
    val dst1 = new Path(root, "00000000000000000001.json")
    assert(healthy.claim(fs, tmpL, dst1))
    val in1 = fs.open(dst1)
    val n1 = in1.read(buf); in1.close()
    assert(new String(buf, 0, n1, "UTF-8") === "loser-payload")
  }

  test("CoordinatedClaim: recovery respects the grace window — a fresh " +
      "marker is treated as a live winner, not a crash") {
    val fs = mockFs()
    val root = freshRoot("grace")
    fs.mkdirs(root)
    val coordDir = new Path(Files.createTempDirectory("coord_lock5").toString)
    val coordFs = coordDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    class CrashingClaim extends LogStore.CoordinatedClaim(
        coordFs, coordDir, recoveryGraceMs = 3600000L) {
      override protected def publish(fs: org.apache.hadoop.fs.FileSystem,
          tmp: Path, dst: Path): Boolean =
        throw new RuntimeException("simulated crash")
    }
    val dst = new Path(root, "00000000000000000000.json")
    val tmpW = new Path(root, "tmp_winner")
    val outW = fs.create(tmpW, true)
    try outW.write("winner-payload".getBytes("UTF-8")) finally outW.close()
    intercept[RuntimeException] { new CrashingClaim().claim(fs, tmpW, dst) }
    // one-hour grace: the marker is seconds old, so the loser must NOT
    // touch it — the winner could still be mid-PUT
    val healthy = new LogStore.CoordinatedClaim(coordFs, coordDir, 3600000L)
    val tmpL = new Path(root, "tmp_loser")
    val outL = fs.create(tmpL, true)
    try outL.write("loser-payload".getBytes("UTF-8")) finally outL.close()
    assert(!healthy.claim(fs, tmpL, dst))
    assert(!fs.exists(dst),
      "inside the grace window the version stays unpublished — no premature recovery")
  }

  test("CoordinatedClaim: stale tickets (claimer died pre-marker) are " +
      "swept; markers and fresh tickets survive") {
    val coordDir = new Path(Files.createTempDirectory("coord_lock6").toString)
    val coordFs = coordDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val claim = new LogStore.CoordinatedClaim(coordFs, coordDir, 0L)
    val fs = mockFs()
    val root = freshRoot("sweep")
    fs.mkdirs(root)
    val tmp = new Path(root, "tmp_w")
    val out = fs.create(tmp, true)
    try out.write("w".getBytes("UTF-8")) finally out.close()
    assert(claim.claim(fs, tmp, new Path(root, "00000000000000000000.json")))
    // a ticket from a claimer that died before the marker claim
    val stale = new Path(coordDir, ".claim-deadbeef")
    val o2 = coordFs.create(stale, true)
    try o2.write("x".getBytes("UTF-8")) finally o2.close()
    coordFs.setTimes(stale, System.currentTimeMillis() - 7200000L, -1)
    val fresh = new Path(coordDir, ".claim-fresh")
    val o3 = coordFs.create(fresh, true)
    try o3.write("y".getBytes("UTF-8")) finally o3.close()
    claim.sweepStaleTickets()
    assert(!coordFs.exists(stale), "aged orphan ticket must be reclaimed")
    assert(coordFs.exists(fresh), "a fresh ticket may belong to a live claimer")
    assert(coordFs.listStatus(coordDir).exists(_.getPath.getName
      .endsWith(".lock")), "markers are claim state and must survive")
  }

  test("vacuum during a crashed-winner recovery window: the retention " +
      "age guard shields the completing commit's staged files; the " +
      "opt-out demonstrably does not") {
    import org.apache.spark.sql.functions._
    import graft.lake.TxTable
    import spark.implicits._
    def docs(n: Int, from: Long = 0L) =
      spark.range(from, from + n).select($"id",
        concat(lit("doc-"), $"id").as("text"))
    val coordDir = new Path(Files.createTempDirectory("coord_vac").toString)
    val coordFs = coordDir.getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    class CrashingClaim extends LogStore.CoordinatedClaim(
        coordFs, coordDir, recoveryGraceMs = 0L) {
      override protected def publish(fs: org.apache.hadoop.fs.FileSystem,
          tmp: Path, dst: Path): Boolean =
        throw new RuntimeException("simulated crash: marker won, PUT never ran")
    }
    // build the crash window on a REAL table: v1's payload staged (data
    // files on disk, commit json recorded in the marker) but the
    // version claim unpublished
    def crashWindow(tag: String): (TxTable, org.apache.hadoop.fs.FileSystem,
        Path, Path) = {
      val rootStr = Files.createTempDirectory(s"vacrec_$tag")
        .resolve("tbl").toString
      val tab = new TxTable(spark, rootStr)
      tab.create(docs(20))                 // v0
      tab.append(docs(10, from = 100L))    // v1 (to be "crashed")
      val root = new Path(rootStr)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val commit1 = new Path(root, f"_txlog/${1L}%020d.json")
      val staged = new Path(root, "_txlog/.recovery_staged_tmp")
      org.apache.hadoop.fs.FileUtil.copy(fs, commit1, fs, staged,
        false, true, fs.getConf)
      fs.delete(commit1, false)
      // the crashing winner claims the marker for v1 and dies pre-PUT
      intercept[RuntimeException](
        new CrashingClaim().claim(fs, staged, commit1))
      assert(!fs.exists(commit1), "crash window: v1 unpublished")
      assert(TxLog.latestVersion(fs, root) === 0L)
      (tab, fs, root, commit1)
    }
    def recover(fs: org.apache.hadoop.fs.FileSystem, root: Path,
        commit1: Path): Unit = {
      val healthy = new LogStore.CoordinatedClaim(coordFs, coordDir, 0L)
      val tmpL = new Path(root, "_txlog/.loser_tmp")
      val out = fs.create(tmpL, true)
      try out.write("loser".getBytes("UTF-8")) finally out.close()
      assert(!healthy.claim(fs, tmpL, commit1),
        "the recoverer completes, never wins")
      assert(fs.exists(commit1), "recovery must publish the crashed commit")
    }

    // 1) GUARDED vacuum mid-window: v1's staged data files are
    //    unreferenced by any resolvable snapshot, but YOUNG — the
    //    default age floor keeps them; recovery then lands a fully
    //    intact commit
    val (tabA, fsA, rootA, commit1A) = crashWindow("guarded")
    assert(tabA.vacuum(keepVersions = 5).isEmpty,
      "the age guard must shield the in-flight commit's staged files")
    recover(fsA, rootA, commit1A)
    assert(tabA.version === 1L)
    assert(tabA.verifyChecksum(),
      "post-recovery table must verify against its stored checksum")
    assert(tabA.read().count() === 30L)

    // 2) the OPT-OUT mid-window reclaims those same staged files — the
    //    exact corruption the floor exists to prevent: recovery then
    //    lands a commit referencing missing data
    val (tabB, fsB, rootB, commit1B) = crashWindow("optout")
    assert(tabB.vacuum(keepVersions = 5, minAgeMs = 0L).nonEmpty,
      "opt-out vacuum sees the staged files as unreferenced garbage")
    recover(fsB, rootB, commit1B)
    intercept[Exception] { tabB.read().count() } // data files are gone
  }

  test("explicit single-writer acknowledgment unlocks plain rename commits") {
    val fs = mockFs(LogStore.unsafeSingleWriterKey -> "true")
    val root = freshRoot("single")
    assert(TxLog.tryCommit(fs, root, 0L, entriesFor("CREATE")))
    // a second claim of the same version still loses (the exists check
    // holds within one writer's sequential commits)
    assert(!TxLog.tryCommit(fs, root, 0L, entriesFor("DUPE")))
    assert(TxLog.latestVersion(fs, root) === 0L)
  }

  test("hdfs-like schemes keep the rename claim; file keeps the hard link") {
    val conf = spark.sparkContext.hadoopConfiguration
    val localFs = new Path(freshRoot("claims"), "x")
      .getFileSystem(conf)
    assert(LogStore.claimFor(localFs) eq LogStore.HardLinkClaim)
  }
}
