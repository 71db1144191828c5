package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Minimal transactional table on plain parquet — the capability the
  * reference gets from Delta (ascii-hydra `resources/spark.py:65-69`:
  * ACID overwrite + `schema.autoMerge`; `pipes/utils.py:85-89`:
  * vacuum/retention), re-expressed as a commit log over parquet
  * files, since no transactional-format jars ship in this
  * environment and the protocol itself is the interesting part.
  *
  * Layout:
  * {{{
  *   table/
  *     _graft_log/00000000000000000000.json   // manifest per snapshot
  *     _graft_log/00000000000000000001.json
  *     data/<writeId>/part-*.parquet          // immutable data files
  * }}}
  *
  * A manifest is the COMPLETE file listing of one snapshot plus the
  * snapshot's schema (DDL). All correctness flows from three rules:
  *
  *   1. **Data files are immutable and write-once.** Every write lands
  *      in a fresh `data/<writeId>/` dir; no commit ever mutates or
  *      deletes a file another snapshot references (only [[vacuum]]
  *      deletes, and only unreferenced files).
  *   2. **Readers never list the directory.** A read resolves the
  *      latest committed manifest and pins its file list — so a
  *      concurrent overwrite/append/compact is invisible until its
  *      manifest lands (snapshot isolation), and a crashed write (data
  *      files without a manifest) is invisible forever.
  *   3. **Commits are put-if-absent on the next version number.** The
  *      manifest is fully written to a `.tmp-*` file first, then
  *      renamed to `N.json` only if `N.json` does not exist — a torn
  *      JSON can never carry a live version name, and two writers
  *      racing for version N serialize: the loser re-reads the new
  *      latest snapshot and retries against N+1 (optimistic
  *      concurrency). On HDFS the rename IS atomic fail-if-exists; on
  *      a local posix FS the exists-check narrows the race to the test
  *      harness's single JVM; an object store deployment would back
  *      this with a conditional put / commit service, which is exactly
  *      the LogStore seam transactional formats define.
  *
  * 100 TB posture: query planning reads ONE small JSON (the manifest)
  * instead of listing millions of objects (O(files) listing, eventual
  * consistency, and per-request latency are the object-store killers);
  * time travel and snapshot isolation come for free from immutability;
  * [[compact]] is just another committed snapshot, so maintenance
  * never blocks readers. A production-hardened variant would shard the
  * file listing into manifest files grouped by partition (manifest
  * lists), checkpoint the log, and track per-file column stats for
  * data skipping — noted, out of scope.
  *
  * Schema evolution ([[append]] with `mergeSchemas`): appending a
  * frame with NEW columns widens the snapshot schema (new fields
  * nullable); old files simply lack the column and the parquet reader
  * null-backfills, because every read passes the snapshot schema
  * explicitly. Dropping/retyping existing columns is refused — silent
  * coercion is how corpora rot.
  */
final class TxTable private (spark: SparkSession, root: Path, fs: FileSystem) {
  import TxTable._

  private def logDir  = new Path(root, LogDirName)
  private def dataDir = new Path(root, "data")

  // ---- snapshot resolution ------------------------------------------------

  /** Committed versions, ascending (expired snapshots excluded). */
  def versions: Seq[Long] =
    if (!fs.exists(logDir)) Nil
    else fs.listStatus(logDir).toSeq
      .flatMap(st => versionOf(st.getPath.getName))
      .sorted

  def latestVersion: Option[Long] = versions.lastOption

  private def manifestPath(v: Long) = new Path(logDir, f"$v%020d.json")

  private def manifest(v: Long): Manifest = {
    val p = manifestPath(v)
    require(fs.exists(p), s"snapshot $v of $root does not exist (expired?)")
    val in = fs.open(p)
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    Manifest.fromJson(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
  }

  // ---- reads --------------------------------------------------------------

  /** Latest committed snapshot. The returned frame pins the snapshot's
    * file list — a later overwrite does not change what it reads
    * (snapshot isolation), because overwrites add files, never remove
    * them. */
  def read(): DataFrame =
    readVersion(latestVersion.getOrElse(
      sys.error(s"$root has no committed snapshots")))

  /** Time travel: read snapshot `v` exactly as committed. */
  def readVersion(v: Long): DataFrame = {
    val m = manifest(v)
    val schema = StructType.fromDDL(m.schemaDdl)
    if (m.files.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema)
      .parquet(m.files.map(f => new Path(root, f).toString): _*)
  }

  // ---- writes -------------------------------------------------------------

  /** Replace the table contents atomically. Readers of older snapshots
    * are unaffected until [[expireSnapshots]] + [[vacuum]]. */
  def overwrite(df: DataFrame): Long = {
    val (files, schema) = writeDataFiles(df)
    commit { latest =>
      latest.foreach(m => requireCompatible(
        StructType.fromDDL(m.schemaDdl), schema, allowNew = true))
      (OpOverwrite, files, mergedDdl(latest, schema))
    }
  }

  /** Append rows; NEW columns widen the schema (nullable), existing
    * columns must keep their types. */
  def append(df: DataFrame): Long = {
    val (files, schema) = writeDataFiles(df)
    commit { latest =>
      latest.foreach(m => requireCompatible(
        StructType.fromDDL(m.schemaDdl), schema, allowNew = true))
      (OpAppend, latest.map(_.files).getOrElse(Nil) ++ files,
        mergedDdl(latest, schema))
    }
  }

  /** Rewrite the current snapshot into ~`targetFileBytes` files and
    * commit the rewrite as a new snapshot — the transactional twin of
    * [[ParquetIOManager.compact]]'s rename swap: here there is no
    * swap window at all, readers flip manifests or keep the old one. */
  def compact(targetFileBytes: Long = 128L * 1024 * 1024): Long = {
    val v = latestVersion.getOrElse(sys.error(s"$root: nothing to compact"))
    val m = manifest(v)
    val bytes = m.files.map(f => fs.getFileStatus(new Path(root, f)).getLen).sum
    val n = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val (files, schema) = writeDataFiles(readVersion(v).repartition(n))
    commit { latest =>
      require(latest.exists(_.version == m.version),
        s"concurrent commit during compact of $root — rerun compact")
      (OpCompact, files, schemaDdlOf(schema))
    }
  }

  /** Commit history, oldest first — the DESCRIBE HISTORY surface
    * (version, operation, file count) a transactional table owes its
    * operators; reads only the (small) manifests. */
  def history(): Seq[(Long, String, Int)] =
    versions.map { v =>
      val m = manifest(v)
      (m.version, m.operation, m.files.size)
    }

  // ---- maintenance --------------------------------------------------------

  /** Drop manifests older than the `keepLast` most recent (always
    * keeps the latest). Time travel to an expired version then fails;
    * its files become vacuumable if nothing else references them. */
  def expireSnapshots(keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "must keep at least the latest snapshot")
    val vs = versions
    val drop = vs.dropRight(keepLast)
    drop.foreach(v => fs.delete(manifestPath(v), false))
    drop
  }

  /** Delete every file under `data/` referenced by NO live manifest,
    * plus stale `.tmp-*` manifests — debris from crashed writes and
    * expired snapshots. `minAgeMs` protects in-flight writers (a
    * writer's data files exist before its commit): only files older
    * than the horizon die. Tests pass 0; production keeps the
    * default (the Delta-vacuum retention discipline,
    * `pipes/utils.py:85-89`). Returns deleted paths. */
  def vacuum(minAgeMs: Long = 7L * 24 * 3600 * 1000): Seq[String] = {
    val live: Set[String] = versions.flatMap(v => manifest(v).files).toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    val deleted = scala.collection.mutable.ArrayBuffer.empty[String]
    def sweep(dir: Path): Unit =
      if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
        if (st.isDirectory) {
          sweep(st.getPath)
          // the retention horizon protects in-flight writers' freshly
          // created (momentarily empty) write dirs exactly like files
          if (st.getModificationTime < cutoff &&
              fs.listStatus(st.getPath).isEmpty) {
            fs.delete(st.getPath, false); ()
          }
        } else {
          val rel = relativize(st.getPath)
          if (!live.contains(rel) && st.getModificationTime < cutoff) {
            fs.delete(st.getPath, false)
            deleted += rel
          }
        }
      }
    sweep(dataDir)
    if (fs.exists(logDir)) fs.listStatus(logDir).foreach { st =>
      if (st.getPath.getName.startsWith(".tmp-") &&
          st.getModificationTime < cutoff) {
        fs.delete(st.getPath, false)
        deleted += relativize(st.getPath)
      }
    }
    deleted.toSeq
  }

  // ---- internals ----------------------------------------------------------

  /** Land `df` as immutable parquet files in a fresh write dir;
    * returns (root-relative paths, written schema). Uncommitted on
    * crash: no manifest references the dir, vacuum reclaims it. */
  private def writeDataFiles(df: DataFrame): (Seq[String], StructType) = {
    val writeId = java.util.UUID.randomUUID().toString.take(12)
    val dst = new Path(dataDir, s"w-$writeId")
    df.write.parquet(dst.toString)
    val files = fs.listStatus(dst).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(st => relativize(st.getPath)).sorted
    (files, df.schema)
  }

  private def relativize(p: Path): String =
    p.toUri.getPath.stripPrefix(root.toUri.getPath).stripPrefix("/")

  /** Optimistic-concurrency commit loop: compose the next manifest
    * against the CURRENT latest snapshot, try to claim version N;
    * on collision re-read and retry. `compose` returns
    * (operation, files, schemaDdl). */
  private def commit(
      compose: Option[Manifest] => (String, Seq[String], String)): Long = {
    fs.mkdirs(logDir)
    var attempts = 0
    while (true) {
      val latest = latestVersion.map(manifest)
      val v = latest.map(_.version + 1).getOrElse(0L)
      val (op, files, ddl) = compose(latest)
      val m = Manifest(v, op, ddl, files)
      val tmp = new Path(logDir, s".tmp-${java.util.UUID.randomUUID()}.json")
      val out = fs.create(tmp, false)
      try out.write(m.toJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      val dst = manifestPath(v)
      // exists+rename is NOT atomic on RawLocalFileSystem (its rename
      // is File.renameTo, which silently replaces an existing
      // destination on posix) — serialize the publish step JVM-wide
      // per table root so two local writers can never both claim
      // version N. HDFS rename is atomic fail-if-exists anyway; an
      // object-store deployment still needs the conditional-put
      // LogStore seam documented above.
      val won = publishLock(fs.makeQualified(root).toString).synchronized {
        !fs.exists(dst) && fs.rename(tmp, dst)
      }
      if (won) return v
      fs.delete(tmp, false) // lost the race: retry against the new latest
      attempts += 1
      require(attempts < 50, s"commit to $root: lost ${attempts} races, giving up")
    }
    sys.error("unreachable")
  }

  private def schemaDdlOf(s: StructType): String = s.toDDL

  private def mergedDdl(latest: Option[Manifest], incoming: StructType): String =
    latest match {
      case None    => schemaDdlOf(incoming)
      case Some(m) =>
        schemaDdlOf(mergeSchemas(StructType.fromDDL(m.schemaDdl), incoming))
    }
}

object TxTable {
  private val LogDirName = "_graft_log"

  /** One lock object per canonical table root — serializes the
    * exists+rename publish within this JVM (see commit()). */
  private val publishLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def publishLock(canonicalRoot: String): Object =
    publishLocks.computeIfAbsent(canonicalRoot, _ => new Object)
  private val OpOverwrite = "overwrite"
  private val OpAppend = "append"
  private val OpCompact = "compact"

  def apply(spark: SparkSession, path: String): TxTable = {
    val root = new Path(path)
    new TxTable(spark, root,
      root.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  /** True iff `path` carries a TxTable commit log. */
  def isTable(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path, LogDirName)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def versionOf(name: String): Option[Long] =
    if (name.endsWith(".json") && !name.startsWith("."))
      name.stripSuffix(".json").toLongOption
    else None

  /** Evolution rule: every existing column keeps its exact type
    * (drops are fine for append — missing columns null-backfill the
    * NEW files symmetric to old files lacking NEW columns); columns
    * the table has never seen are appended as nullable. */
  private[core] def mergeSchemas(current: StructType,
      incoming: StructType): StructType = {
    requireCompatible(current, incoming, allowNew = true)
    val known = current.fieldNames.toSet
    val added = incoming.fields.filterNot(f => known.contains(f.name))
      .map(_.copy(nullable = true))
    StructType(current.fields ++ added)
  }

  private def requireCompatible(current: StructType, incoming: StructType,
      allowNew: Boolean): Unit = {
    val cur = current.fields.map(f => f.name -> f.dataType).toMap
    incoming.fields.foreach { f =>
      cur.get(f.name) match {
        case Some(t) =>
          require(t == f.dataType,
            s"column ${f.name}: type ${f.dataType} incompatible with table's $t " +
              "(schema evolution adds columns, never retypes)")
        case None =>
          require(allowNew, s"column ${f.name} not in table schema")
      }
    }
  }

  /** Snapshot manifest — the complete state of one version. JSON via
    * Jackson (ships with Spark). */
  private[core] final case class Manifest(version: Long, operation: String,
      schemaDdl: String, files: Seq[String]) {
    def toJson: String = {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = om.createObjectNode()
      node.put("version", version)
      node.put("operation", operation)
      node.put("schema_ddl", schemaDdl)
      val arr = node.putArray("files")
      files.foreach(arr.add)
      node.put("num_files", files.size)
      om.writerWithDefaultPrettyPrinter().writeValueAsString(node)
    }
  }

  private[core] object Manifest {
    def fromJson(json: String): Manifest = {
      val om = new com.fasterxml.jackson.databind.ObjectMapper()
      val n = om.readTree(json)
      val files = (0 until n.get("files").size())
        .map(i => n.get("files").get(i).asText())
      Manifest(n.get("version").asLong(), n.get("operation").asText(),
        n.get("schema_ddl").asText(), files)
    }
  }
}
