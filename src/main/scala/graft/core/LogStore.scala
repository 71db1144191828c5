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
        // filesystem without hard links: providers that don't
        // implement createLink throw UnsupportedOperationException;
        // mounts where link(2) itself fails (FUSE/overlay/VFAT,
        // protected_hardlinks EPERM) surface as FileSystemException —
        // both fall back to the JVM-serialized rename claim.
        // (FileAlreadyExistsException IS a FileSystemException, so its
        // case must stay first.)
        case _: UnsupportedOperationException |
             _: java.nio.file.FileSystemException =>
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
    * (S3 If-None-Match) shape. A failure to CREATE is a lost race; a
    * failure to WRITE after we created (disk full, stream error) is
    * OUR failure — the partial dst is deleted and the error
    * propagates, never misreported as "version taken" (which would
    * leave a truncated manifest poisoning every future replay). */
  case object ConditionalPut extends LogStore {
    def putIfAbsent(fs: FileSystem, tmp: Path, dst: Path, lockKey: String)
        : Boolean = {
      val bytes = {
        val in = fs.open(tmp)
        try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
      }
      val created =
        try Some(fs.create(dst, false)) // fail-if-exists = the precondition
        catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => None
          case _: java.io.IOException if fs.exists(dst) => None
        }
      created match {
        case None =>
          fs.delete(tmp, false); false // lost the precondition race
        case Some(out) =>
          try { out.write(bytes); out.close() }
          catch {
            // substrates that CLAIM AT CLOSE (buffered whole-object
            // puts — real object stores) surface the lost race here:
            // dst belongs to the winner, never delete it
            case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
              try out.close() catch { case _: java.io.IOException => () }
              fs.delete(tmp, false)
              return false
            case e: java.io.IOException =>
              try out.close() catch { case _: java.io.IOException => () }
              // before cleaning up, PROVE the partial dst is ours: on
              // claim-at-close stores a lost race can surface as a
              // generic IOException, and deleting then would destroy
              // the WINNER's published manifest. Read dst back:
              //   == our bytes         → the put actually landed: won
              //   a strict prefix      → our truncated write: clean up
              //   anything else        → another writer's commit: lost
              val back =
                try {
                  val in = fs.open(dst)
                  try Some(org.apache.commons.io.IOUtils.toByteArray(in))
                  finally in.close()
                } catch { case _: java.io.IOException => None }
              back match {
                case Some(b) if java.util.Arrays.equals(b, bytes) =>
                  fs.delete(tmp, false)
                  return true
                case Some(b) if b.length < bytes.length &&
                    java.util.Arrays.equals(b,
                      java.util.Arrays.copyOfRange(bytes, 0, b.length)) =>
                  fs.delete(dst, false) // demonstrably our partial write
                  throw e
                case Some(_) =>
                  fs.delete(tmp, false)
                  return false // the racing winner's file — untouched
                case None =>
                  throw e // nothing published; propagate the failure
              }
          }
          fs.delete(tmp, false)
          true
      }
    }
  }

  /** Lock-file protocol with stale-lock breaking: claim `<dst>.lock`
    * by create-exclusive (a unique token inside), re-verify ownership,
    * publish, verify again, release-if-still-ours. A lock older than
    * [[staleLockMs]] is broken (its writer is presumed dead).
    *
    * Honesty about fencing: breaking by age is NOT true fencing — a
    * writer paused longer than `staleLockMs` (GC, NFS stall) can race
    * the breaker. The ownership re-checks around the publish shrink
    * that window to the copy itself, and the post-publish verify
    * (dst content == our bytes, re-read) demotes a stolen publish to
    * a LOST race instead of a double win; the residual assumption —
    * `staleLockMs` exceeds any real pause — is the standard
    * external-lock caveat (a store-enforced epoch/conditional-put is
    * the airtight primitive; use [[ConditionalPut]] where one exists). */
  final case class LockFile(staleLockMs: Long = 60000L) extends LogStore {
    def putIfAbsent(fs: FileSystem, tmp: Path, dst: Path, lockKey: String)
        : Boolean = {
      val lock = new Path(dst.getParent, s".${dst.getName}.lock")
      val token = java.util.UUID.randomUUID().toString
      def lockHolder(): Option[String] =
        try {
          val in = fs.open(lock)
          try Some(org.apache.commons.io.IOUtils.toString(in,
            java.nio.charset.StandardCharsets.UTF_8))
          finally in.close()
        } catch { case _: java.io.IOException => None }
      def releaseIfOurs(): Unit =
        if (lockHolder().contains(token)) { fs.delete(lock, false); () }
      val bytes = {
        val in = fs.open(tmp)
        try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
      }
      // bound the acquire loop by ELAPSED TIME relative to staleLockMs,
      // not a fixed attempt count: a crashed writer's lock only ages
      // out after staleLockMs, so the loop must be able to wait that
      // long (plus margin) before declaring the lock unbreakable
      val started = System.currentTimeMillis()
      val deadline = started + staleLockMs + math.max(staleLockMs / 2, 5000L)
      var attempts = 0
      var sleepMs = 20L
      while (System.currentTimeMillis() < deadline) {
        attempts += 1
        val acquired =
          try {
            val out = fs.create(lock, false)
            try out.write(token.getBytes(
              java.nio.charset.StandardCharsets.UTF_8))
            finally out.close()
            true
          } catch {
            case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
            case _: java.io.IOException => false
          }
        if (acquired) {
          try {
            if (fs.exists(dst)) return false
            // ownership could have been broken between create and
            // here (we may have paused): verify before publishing
            if (!lockHolder().contains(token)) return false
            val out = fs.create(dst, true) // whole-object put
            try out.write(bytes) finally out.close()
            // stolen mid-publish? the content check decides: if the
            // surviving dst is not OUR bytes, we lost, not won
            val back =
              try {
                val in = fs.open(dst)
                try org.apache.commons.io.IOUtils.toByteArray(in)
                finally in.close()
              } catch { case _: java.io.IOException => Array.empty[Byte] }
            if (!java.util.Arrays.equals(back, bytes)) return false
            fs.delete(tmp, false)
            return true
          } finally releaseIfOurs()
        }
        // lock held: stale → break it, else back off + retry
        try {
          val st = fs.getFileStatus(lock)
          if (System.currentTimeMillis() - st.getModificationTime > staleLockMs) {
            fs.delete(lock, false); ()
          } else {
            Thread.sleep(sleepMs)
            sleepMs = math.min(sleepMs * 2, 500L) // back off, capped
          }
        } catch { case _: java.io.IOException => () } // lock vanished: retry
      }
      sys.error(s"LockFile store: could not acquire $lock after $attempts " +
        s"attempts over ${System.currentTimeMillis() - started} ms " +
        s"(staleLockMs=$staleLockMs)")
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
