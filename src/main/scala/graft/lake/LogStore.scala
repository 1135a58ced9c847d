package graft.lake

import java.nio.file.{FileAlreadyExistsException, Files, Paths}

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.{FileSystem, Path}

/** How a transaction-log commit file is ATOMICALLY claimed, per
  * filesystem scheme — the part of [[TxLog]]'s multi-writer ACID
  * guarantee that genuinely depends on the store (Delta's LogStore
  * abstraction, delta-io PROTOCOL.md + the delta-storage module's
  * per-store implementations, re-expressed):
  *
  *   - `file://` — POSIX `link(2)` is atomic and fails if the target
  *     exists: the perfect claim primitive, zero extra state.
  *   - HDFS-like stores — `rename` REFUSES an existing destination
  *     atomically inside the NameNode, so exists-check + rename is
  *     sound (the exists check is just an early exit; the rename alone
  *     decides the race).
  *   - S3-like object stores — rename is copy+delete and NOTHING
  *     refuses an existing key, so exists+rename is a silent
  *     last-writer-wins race: two writers can both pass the check and
  *     the second PUT overwrites the first COMMIT. A sound claim needs
  *     store-side conditional semantics (S3 `If-None-Match: *`, which
  *     MinIO also honors) or an external coordinator (Delta's
  *     S3DynamoDBLogStore). This sandbox has no object-store client to
  *     implement one against, so the deployment REGISTERS its claim via
  *     [[LogStore.register]]; with none registered, commits on such a
  *     scheme REFUSE LOUDLY instead of silently racing — unless the
  *     caller explicitly accepts single-writer operation via the
  *     `graft.txlog.unsafeSingleWriter` Hadoop conf flag (Delta's own
  *     S3 single-cluster caveat, made opt-in instead of default).
  *
  * [[SingleDriverClaim]] ships as a reference registration: a JVM-global
  * mutex around exists+rename — exactly Delta's S3SingleDriverLogStore
  * contract (correct iff every writer to the table shares one JVM).
  */
object LogStore {

  /** Atomically publish `tmp` as `dst` iff `dst` does not exist.
    * Returns true iff THIS call created `dst`; exactly one concurrent
    * claimer of the same `dst` may ever see true. `tmp` may be left
    * behind on either outcome — the caller cleans up.
    */
  trait Claim {
    def claim(fs: FileSystem, tmp: Path, dst: Path): Boolean

    /** Void any claim state held for commits under `logDir` — called by
      * a DESTRUCTIVE table re-create (which deletes the whole table
      * directory first), so a coordinator-backed claim does not keep
      * refusing versions the dead incarnation once claimed. No-op for
      * claims whose only state is the dst file itself. NOT a recovery
      * path for a crashed winner (that stays operational triage — an
      * automatic reclaim would race the pre-PUT winner). */
    def invalidateTable(logDir: Path): Unit = ()
  }

  /** POSIX hard link: atomic, fails-if-exists, local filesystems. */
  object HardLinkClaim extends Claim {
    def claim(fs: FileSystem, tmp: Path, dst: Path): Boolean = {
      val t = Paths.get(tmp.toUri.getPath)
      val d = Paths.get(dst.toUri.getPath)
      try { Files.createLink(d, t); true }
      catch { case _: FileAlreadyExistsException => false }
    }
  }

  /** Exists-check + rename — sound ONLY where rename atomically refuses
    * an existing destination (HDFS's NameNode contract). The exists
    * check is an optimization; the rename decides the race.
    */
  object RenameClaim extends Claim {
    def claim(fs: FileSystem, tmp: Path, dst: Path): Boolean =
      !fs.exists(dst) && fs.rename(tmp, dst)
  }

  /** JVM-global mutex + exists + rename: Delta's S3SingleDriverLogStore
    * contract — a correct claim for a non-atomic store IF AND ONLY IF
    * every writer to the table runs in this one JVM (one Spark driver).
    * Cross-JVM writers still race; that deployment needs a store-side
    * conditional PUT or a coordinator registration instead.
    */
  object SingleDriverClaim extends Claim {
    private val mutex = new Object
    def claim(fs: FileSystem, tmp: Path, dst: Path): Boolean =
      mutex.synchronized { !fs.exists(dst) && fs.rename(tmp, dst) }
  }

  /** CROSS-PROCESS claim via an external COORDINATOR filesystem — the
    * S3DynamoDBLogStore shape with a lock-table DIRECTORY instead of a
    * DynamoDB table: to publish `dst` on a store whose own primitives
    * cannot refuse an existing key, a writer first claims a marker file
    * (named by the SHA-256 of dst's URI) in `coordDir` through the
    * coordinator's OWN atomic claim ([[claimFor]]: hard link on POSIX,
    * no-overwrite rename on HDFS) — exactly one claimer across any
    * number of JVMs/processes ever wins the marker, and ONLY the winner
    * PUTs tmp → dst, so the non-atomic store's last-writer-wins rename
    * is never racing anyone. Deployment: point every writer at the same
    * coordinator directory (a shared POSIX or HDFS mount), e.g.
    * `LogStore.register("s3a", new LogStore.CoordinatedClaim(lockFs,
    * lockDir))`.
    *
    * Crashed-winner RECOVERY (Delta's incomplete-entry problem, solved
    * there with entry-complete flags + fixDeltaLog): a winner that dies
    * between marker claim and data-store PUT leaves the version
    * claimed-but-unpublished. The marker's content records BOTH the dst
    * URI and the winner's staged tmp URI, so a later claimer of the
    * same version that loses the marker, finds `dst` absent and the
    * marker older than `recoveryGraceMs`, COMPLETES the crashed commit
    * by copying the recorded tmp → dst. Completion is race-free against
    * a merely-slow winner because the winner's own publish is a
    * copy-with-overwrite of the SAME tmp — both writers land identical
    * bytes. The recoverer still returns false: the version belongs to
    * the original winner's payload, and the recoverer's own commit
    * retries at the next version (exactly the optimistic-concurrency
    * path a plain lost claim takes). Only when the staged tmp itself is
    * gone with dst absent does the marker stay for operator triage —
    * the payload is unrecoverable and fabricating a commit would be
    * worse than refusing.
    */
  class CoordinatedClaim(coordFs: FileSystem, coordDir: Path,
      recoveryGraceMs: Long = 30000L)
      extends Claim {
    // marker = sha(parent dir URI) + "-" + commit file name: claims of
    // one table share an enumerable prefix, so a destructive re-create
    // can void the dead incarnation's markers (invalidateTable) without
    // being able to touch any other table's
    private def tableKey(dir: Path): String =
      java.security.MessageDigest.getInstance("SHA-256")
        .digest(dir.toUri.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString

    def claim(fs: FileSystem, tmp: Path, dst: Path): Boolean = {
      coordFs.mkdirs(coordDir)
      val marker = new Path(coordDir,
        tableKey(dst.getParent) + "-" + dst.getName + ".lock")
      val ticket = new Path(coordDir,
        s".claim-${java.util.UUID.randomUUID}")
      val out = coordFs.create(ticket, true)
      try out.write(
        (dst.toUri.toString + "\n" + tmp.toUri.toString).getBytes("UTF-8"))
      finally out.close()
      val won =
        try claimFor(coordFs).claim(coordFs, ticket, marker)
        finally {
          if (coordFs.exists(ticket)) coordFs.delete(ticket, false): Unit
        }
      // single winner: the data-store PUT races nobody but a RECOVERER
      // completing this same commit — and that writes identical bytes
      if (won) publish(fs, tmp, dst)
      else { maybeRecover(fs, marker, dst); false }
    }

    /** The winner's data-store PUT: a COPY with overwrite, not a
      * rename — idempotent against a concurrent recovery completing
      * this same commit from the recorded tmp. Overridable only so a
      * spec can simulate a crash in the marker→PUT window. */
    protected def publish(fs: FileSystem, tmp: Path, dst: Path): Boolean =
      org.apache.hadoop.fs.FileUtil.copy(fs, tmp, fs, dst,
        false /* keep tmp: the claim contract says the caller cleans */,
        true /* overwrite: identical-bytes race with a recoverer */,
        fs.getConf)

    /** Losing-side recovery: if the marker's winner never published and
      * the marker is past the grace window, complete its commit from
      * the staged tmp the marker records. */
    private def maybeRecover(fs: FileSystem, marker: Path,
        dst: Path): Unit = {
      if (fs.exists(dst)) return // published: nothing to recover
      val age =
        try System.currentTimeMillis() -
          coordFs.getFileStatus(marker).getModificationTime
        catch { case _: java.io.FileNotFoundException => return }
      if (age < recoveryGraceMs) return // winner may still be mid-PUT
      val content = {
        val in = coordFs.open(marker)
        try {
          val bos = new java.io.ByteArrayOutputStream()
          val buf = new Array[Byte](8192)
          var n = in.read(buf)
          while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
          new String(bos.toByteArray, "UTF-8")
        } finally in.close()
      }
      val lines = content.split('\n')
      if (lines.length < 2) return // pre-recovery marker: operator triage
      val staged = new Path(new java.net.URI(lines(1).trim))
      if (fs.exists(staged))
        org.apache.hadoop.fs.FileUtil.copy(fs, staged, fs, dst,
          false, true, fs.getConf): Unit
      // staged tmp gone with dst absent: unrecoverable — leave the
      // marker for operator triage rather than fabricate a commit
    }

    override def invalidateTable(logDir: Path): Unit = {
      if (!coordFs.exists(coordDir)) return
      val prefix = tableKey(logDir) + "-"
      coordFs.listStatus(coordDir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix) && n.endsWith(".lock"))
          coordFs.delete(st.getPath, false): Unit
      }
      sweepStaleTickets()
    }

    /** Maintenance: reclaim `.claim-*` TICKETS orphaned by claimers
      * that died before reaching the marker claim (their `finally`
      * never ran). Tickets hold no claim state — the marker does — so
      * any ticket past the grace window is garbage. O(coordinator
      * listing); run it from table maintenance (vacuum), not per
      * commit. */
    def sweepStaleTickets(): Unit = {
      if (!coordFs.exists(coordDir)) return
      val cutoff = System.currentTimeMillis() -
        math.max(recoveryGraceMs, 60000L)
      coordFs.listStatus(coordDir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(".claim-") && st.getModificationTime < cutoff)
          coordFs.delete(st.getPath, false): Unit
      }
    }
  }

  /** Schemes where [[RenameClaim]] is known sound: HDFS and its proxies
    * implement rename-refuses-existing atomically server-side. */
  private val renameAtomicSchemes = Set("hdfs", "viewfs", "webhdfs", "swebhdfs")

  private val registry = TrieMap[String, Claim]()

  /** Wire the claim for an object-store scheme (e.g. a conditional-PUT
    * client for "s3a") — the deployment-time hook. */
  def register(scheme: String, claim: Claim): Unit = registry.put(scheme, claim)

  def unregister(scheme: String): Unit = registry.remove(scheme)

  /** Hadoop conf flag acknowledging exactly-one-writer operation on a
    * store with no atomic claim: commits then use plain exists+rename,
    * which a single writer cannot race with itself. */
  val unsafeSingleWriterKey = "graft.txlog.unsafeSingleWriter"

  /** The claim for this filesystem — or a loud refusal when the scheme
    * has no atomic primitive, no registration, and no explicit
    * single-writer acknowledgment. Refusing here is the difference
    * between an error at commit time and a silently lost commit at
    * 2 a.m. on the production bucket.
    */
  def claimFor(fs: FileSystem): Claim = fs.getScheme match {
    case "file" => HardLinkClaim
    case s if registry.contains(s) => registry(s)
    case s if renameAtomicSchemes(s) => RenameClaim
    case s if fs.getConf != null &&
        fs.getConf.getBoolean(unsafeSingleWriterKey, false) => RenameClaim
    case s => throw new IllegalStateException(
      s"no atomic commit claim for scheme '$s': rename does not refuse " +
        "an existing key on object stores, so concurrent writers would " +
        "silently overwrite each other's commits. Register a " +
        "conditional-PUT/coordinator claim via LogStore.register(" +
        s"\"$s\", ...), or — for a guaranteed single writer — set " +
        s"$unsafeSingleWriterKey=true in the Hadoop conf")
  }
}
