package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}

/** The COMMIT-PUBLISH seam of the transaction log: everything the
  * protocol needs from storage is one primitive —
  *
  *   publish a fully-written staging file at `dst` IFF `dst` does not
  *   exist, atomically; exactly one of N racing writers wins.
  *
  * [[graft.core.TxTable]]'s correctness (serialized versions, no lost
  * commits) reduces to this primitive, so it is pluggable per
  * deployment substrate — the reason Delta ships `LogStore`
  * implementations per cloud (the reference runs S3A + Delta,
  * resources/spark.py:62-67, where plain rename is copy+delete and
  * NOT atomic):
  *
  *  - [[LogStore.HardLink]] — POSIX `link(2)`: hard-link the staging
  *    file onto `dst`. Atomic AND cross-process on any local/NFS
  *    filesystem, and `dst` appears fully written (the staging file
  *    is complete before the link). The default for `file:` roots.
  *  - [[LogStore.Rename]] — `exists + rename`, serialized per-root
  *    within the JVM. Sound on HDFS (rename is atomic
  *    fail-if-exists); on local filesystems it is safe only within
  *    one JVM (posix rename replaces), which is why `file:` roots
  *    default to HardLink instead.
  *  - [[LogStore.ConditionalPut]] — `create(dst, overwrite=false)`
  *    streaming the bytes directly: the shape of object-store
  *    conditional writes (S3 `If-None-Match`, GCS preconditions,
  *    ABFS ETag). Atomic where the store's create-exclusive is (HDFS;
  *    S3A with conditional-create enabled). Caveat shared with
  *    Delta's S3 store: a writer crashing mid-stream can leave a
  *    truncated `dst` — pair with checksummed parse + retention.
  *  - [[LogStore.LockFile]] — acquire `<dst>.lock` by
  *    create-exclusive (writer id + timestamp), publish via copy,
  *    release; locks older than `staleLockMs` are BROKEN and
  *    re-acquired (fencing for crashed writers). For stores with an
  *    atomic create-exclusive but non-atomic rename AND no
  *    conditional put.
  *
  * Selection: the `graft.logStore` TABLE property (values `hardlink`,
  * `rename`, `conditionalput`, `lockfile`) wins, else scheme default
  * (`file:` → HardLink, everything else → Rename).
  */
private[graft] sealed trait LogStore {
  /** Publish `tmp` (fully written) at `dst` iff absent. True = this
    * writer won version `dst`; false = lost the race (caller deletes
    * `tmp` and retries against the new latest). Implementations must
    * guarantee AT MOST ONE winner per `dst` across racing writers
    * in their supported deployment (see class docs). */
  def putIfAbsent(fs: FileSystem, tmp: Path, dst: Path, lockKey: String): Boolean
}

private[graft] object LogStore {

  /** POSIX hard-link claim: `link(tmp, dst)` is atomic-fail-if-exists
    * at the syscall level, across processes, and publishes a COMPLETE
    * file. Local (`file:`) roots only. */
  case object HardLink extends LogStore {
    def putIfAbsent(fs: FileSystem, tmp: Path, dst: Path, lockKey: String)
        : Boolean =
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(dst.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        fs.delete(tmp, false)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: UnsupportedOperationException =>
          // filesystem without hard links (some mounts): fall back to
          // the JVM-serialized rename claim
          Rename.putIfAbsent(fs, tmp, dst, lockKey)
      }
  }

  /** `exists + rename`, serialized per root within this JVM. HDFS
    * rename is atomic fail-if-exists; local rename REPLACES, so local
    * roots should use [[HardLink]] (the default picks it). */
  case object Rename extends LogStore {
    private val locks =
      new java.util.concurrent.ConcurrentHashMap[String, Object]()
    def putIfAbsent(fs: FileSystem, tmp: Path, dst: Path, lockKey: String)
        : Boolean =
      locks.computeIfAbsent(lockKey, _ => new Object).synchronized {
        !fs.exists(dst) && fs.rename(tmp, dst)
      }
  }

  /** Direct create-exclusive streaming write — the conditional-put
    * (S3 If-None-Match) shape. */
  case object ConditionalPut extends LogStore {
    def putIfAbsent(fs: FileSystem, tmp: Path, dst: Path, lockKey: String)
        : Boolean = {
      val bytes = {
        val in = fs.open(tmp)
        try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
      }
      val won =
        try {
          val out = fs.create(dst, false) // fail-if-exists = the precondition
          try out.write(bytes) finally out.close()
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case _: java.io.IOException if fs.exists(dst) => false
        }
      if (won || fs.exists(dst)) { fs.delete(tmp, false); () }
      won
    }
  }

  /** Lock-file protocol with stale-lock fencing: claim `<dst>.lock`
    * by create-exclusive, re-check `dst`, copy, release. A lock older
    * than [[staleLockMs]] is broken (its writer is presumed dead) —
    * the fencing every external-lock commit protocol needs. */
  final case class LockFile(staleLockMs: Long = 60000L) extends LogStore {
    def putIfAbsent(fs: FileSystem, tmp: Path, dst: Path, lockKey: String)
        : Boolean = {
      val lock = new Path(dst.getParent, s".${dst.getName}.lock")
      var attempts = 0
      while (attempts < 100) {
        attempts += 1
        val acquired =
          try {
            val out = fs.create(lock, false)
            try out.write(
              s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}"
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
            finally out.close()
            true
          } catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
            case _: java.io.IOException => false
          }
        if (acquired) {
          try {
            if (fs.exists(dst)) return false
            // copy (NOT rename — the substrate this store exists for
            // has no atomic rename); the lock serializes writers, so
            // no reader can race a half-written LATEST version past
            // the version-claim protocol
            org.apache.hadoop.fs.FileUtil.copy(fs, tmp, fs, dst,
              true /* delete tmp */, fs.getConf)
            return true
          } finally { fs.delete(lock, false); () }
        }
        // lock held: stale → break it (fencing), else back off + retry
        try {
          val st = fs.getFileStatus(lock)
          if (System.currentTimeMillis() - st.getModificationTime > staleLockMs) {
            fs.delete(lock, false); ()
          } else Thread.sleep(20L)
        } catch { case _: java.io.IOException => () } // lock vanished: retry
      }
      sys.error(s"LockFile store: could not acquire $lock after $attempts attempts")
    }
  }

  /** Store for a table root: explicit property wins, else scheme
    * default. */
  def forRoot(fs: FileSystem, root: Path, property: Option[String]): LogStore =
    property.map(_.trim.toLowerCase(java.util.Locale.ROOT)) match {
      case Some("hardlink")       => HardLink
      case Some("rename")         => Rename
      case Some("conditionalput") => ConditionalPut
      case Some("lockfile")       => LockFile()
      case Some(other) =>
        sys.error(s"unknown graft.logStore '$other' — use hardlink | " +
          "rename | conditionalput | lockfile")
      case None =>
        if (fs.getScheme == "file") HardLink else Rename
    }
}
