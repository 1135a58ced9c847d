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
    * Caveat (Delta's incomplete-entry problem, documented there too): a
    * winner that crashes between marker and PUT leaves the version
    * claimed-but-unpublished; readers fail loudly on the missing commit
    * and an operator removes the orphaned marker after verifying `dst`
    * is absent. Delta's DynamoDB store automates that recovery with
    * entry-complete flags; a lock-dir deployment handles it
    * operationally. The marker's CONTENT records the dst URI it locks,
    * for exactly that triage.
    */
  final class CoordinatedClaim(coordFs: FileSystem, coordDir: Path)
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
      try out.write(dst.toUri.toString.getBytes("UTF-8"))
      finally out.close()
      val won =
        try claimFor(coordFs).claim(coordFs, ticket, marker)
        finally {
          if (coordFs.exists(ticket)) coordFs.delete(ticket, false): Unit
        }
      // single winner: the data-store PUT races nobody, plain rename
      // (or write) is now sound even where the store cannot refuse keys
      won && fs.rename(tmp, dst)
    }

    override def invalidateTable(logDir: Path): Unit = {
      if (!coordFs.exists(coordDir)) return
      val prefix = tableKey(logDir) + "-"
      coordFs.listStatus(coordDir).foreach { st =>
        val n = st.getPath.getName
        if (n.startsWith(prefix) && n.endsWith(".lock"))
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
