package graft.core

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

/** Read-only parser for the OPEN Delta Lake transaction-log protocol
  * (the published `_delta_log` format: JSON commits + parquet
  * checkpoints) — the reference's actual storage substrate is Delta on
  * S3A (reference resources/spark.py:65-67, resources/emr.py:73-78,
  * pipes/utils.py:85-89), so a migrating user's first table is a
  * `_delta_log` directory. This module reconstructs the ACTIVE
  * snapshot (schema, partition columns, live data files with their
  * per-file stats) from the log alone, with zero dependency on
  * delta-spark jars:
  *
  *   - `_last_checkpoint` names the newest checkpoint; its parquet
  *     part(s) carry the compacted action state (add/remove/metaData/
  *     protocol rows);
  *   - JSON commits AFTER the checkpoint replay on top, one action
  *     per line (`add` / `remove` / `metaData` / `protocol` /
  *     `commitInfo`), last-writer-wins per file path;
  *   - `remove` actions are tombstones for vacuum — a removed path
  *     simply leaves the live set.
  *
  * READER V2/V3 support (the 2024+ Databricks default write path —
  * without it a migrating user's first modern table refuses on day
  * one):
  *
  *   - **Deletion vectors**: an `add` may carry a `deletionVector`
  *     descriptor; the marked row indexes (decoded by
  *     [[DeltaDv]] from the published roaring-bitmap sidecar format)
  *     are EXCLUDED from every read — merge-on-read, same shape as
  *     this engine's own native DV path (`_metadata.row_index`
  *     anti-join; TxTable x12/x15).
  *   - **Column mapping, `name` mode** (what `ALTER TABLE RENAME
  *     COLUMN` turns on): parquet files carry frozen PHYSICAL names
  *     (`delta.columnMapping.physicalName` in the schema's field
  *     metadata); scans read physical and surface logical, and the
  *     log's physically-keyed partition values / stats are translated
  *     at parse time. `id` mode (resolution by parquet field id)
  *     still refuses loudly — a narrowed, named refusal.
  *   - **V2 checkpoints** (the newer DBR default): a UUID-named
  *     manifest `NNN.checkpoint.<uuid>.{parquet|json}` carrying
  *     `checkpointMetadata` + protocol/metaData, with the file
  *     actions inline or in `sidecar`-referenced parquet files under
  *     `_delta_log/_sidecars/`. Both manifest formats parse; absolute
  *     /external sidecar paths refuse by name.
  *   - Reader version 3 tables are accepted iff every `readerFeatures`
  *     entry is implemented here (`deletionVectors`, `columnMapping`,
  *     `timestampNtz`, `v2Checkpoint`); anything else — future
  *     features — refuses with the feature named, never a wrong read.
  *
  * Scale note: snapshot state is driver-materialized, O(live files) —
  * the same cost class as this engine's own manifest (and as Delta's
  * own driver-side state reconstruction). Checkpoint parquet is read
  * through Spark, so million-file checkpoints parse distributed and
  * only the collected add-list lands on the driver. DV bitmaps are
  * decoded lazily at READ time (not snapshot time) and are
  * deleted-row-sized. */
object DeltaLog {

  /** One live data file: root-relative DECODED path, partition values
    * keyed by LOGICAL column name (None = null partition value),
    * size/mtime from the add action, stats translated to the
    * manifest's string encoding and LOGICAL keys (only where sound —
    * see [[statsOf]]), and the optional deletion-vector descriptor.
    * `rows = -1` when the add carried no stats. `rawPath` is the
    * log's own (possibly URL-encoded) spelling — the remove/re-add
    * identity key. */
  final case class DeltaAdd(path: String, partition: Map[String, Option[String]],
      bytes: Long, mtimeMs: Long, rows: Long,
      min: Map[String, String], max: Map[String, String],
      nulls: Map[String, Long], dv: Option[DeltaDv.Descriptor] = None)

  /** The reconstructed active state of a Delta table. `schema` and
    * `partitionCols` are LOGICAL; `colMap` (logical → physical, empty
    * without column mapping) names the parquet-file columns. */
  final case class DeltaSnapshot(root: String, version: Long,
      schema: StructType, partitionCols: Seq[String],
      configuration: Map[String, String], adds: Seq[DeltaAdd],
      colMap: Map[String, String] = Map.empty,
      cmMode: String = "none") {
    def physName(c: String): String = colMap.getOrElse(c, c)
    /** Scan schema: the NON-partition fields under their PHYSICAL
      * names (what the data files actually store). Under `id`-mode
      * column mapping each field additionally carries the
      * `parquet.field.id` Spark metadata key (from
      * `delta.columnMapping.id`), so a field-id-enabled parquet scan
      * resolves by ID — file column NAMES are not trustworthy in id
      * mode (an Iceberg-converted table's files keep their original
      * names across renames). */
    def dataSchema: StructType = {
      val p = partitionCols.toSet
      StructType(schema.fields.filterNot(f => p.contains(f.name)).map { f =>
        val renamed = f.copy(name = physName(f.name))
        if (cmMode != "id") renamed
        else renamed.copy(metadata =
          new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata)
            .putLong("parquet.field.id",
              f.metadata.getLong("delta.columnMapping.id"))
            .build())
      })
    }
  }

  private val LogDir = "_delta_log"
  private val PhysNameKey = "delta.columnMapping.physicalName"

  /** Reader features this module implements; any OTHER feature on a
    * reader-v3 table refuses with its name. `timestampNtz` is pure
    * schema surface (Spark's TimestampNTZType round-trips through
    * `DataType.fromJson`). */
  private val SupportedReaderFeatures =
    Set("deletionVectors", "columnMapping", "timestampNtz", "v2Checkpoint")

  /** True iff `path` carries a Delta transaction log. */
  def isDeltaTable(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path, LogDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Reconstruct the latest snapshot — or, with `atVersion`, the
    * PINNED snapshot as of that version (the streaming batch-0
    * contract: crash-replay of the initial batch must see the same
    * rows; a checkpoint NEWER than the pin is ignored and the JSON
    * commits must then cover 0..atVersion or the call refuses).
    * Throws with a NAMED reason on any unsupported protocol feature
    * (never a wrong read). */
  def snapshot(spark: SparkSession, rootStr: String,
      atVersion: Option[Long] = None): DeltaSnapshot = {
    val root = new Path(rootStr)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(root, LogDir)
    require(fs.exists(logDir), s"$rootStr is not a Delta table (no $LogDir)")
    val om = new ObjectMapper()

    // ---- checkpoint base state -------------------------------------
    val lastCp = new Path(logDir, "_last_checkpoint")
    val (cpVersion, cpParts): (Long, Int) =
      if (fs.exists(lastCp)) {
        val n = om.readTree(readBytes(fs, lastCp))
        val v = n.get("version").asLong()
        if (atVersion.exists(_ < v)) (-1L, 0) // pinned BEFORE the checkpoint
        else (v, Option(n.get("parts")).map(_.asInt()).getOrElse(1))
      } else (-1L, 0)

    var meta: Option[JsonNode] = None
    var protocol: Option[JsonNode] = None
    // keyed by the log's RAW path spelling (remove/re-add identity)
    val live = scala.collection.mutable.LinkedHashMap[String, DeltaAdd]()

    // absorb protocol/metaData/add actions from checkpoint-shaped
    // parquet files (classic parts, a v2 manifest, or v2 sidecars —
    // the action schema is identical across all three)
    def absorbParquet(cp: org.apache.spark.sql.DataFrame): Unit = {
      val cols = cp.columns.toSet
      // adds: distributed parse, only the live-file list is collected
      if (cols.contains("add")) {
        import org.apache.spark.sql.functions.{col, to_json}
        val addCols = cp.select("add.*").columns.toSet
        val hasStats = addCols.contains("stats")
        // checkpoint adds carry their DV descriptors too — parse them
        // exactly like the JSON path (an ignored checkpoint DV would
        // silently resurrect deleted rows)
        val hasDv = addCols.contains("deletionVector")
        val rows = cp.where(col("add").isNotNull).select(
          Seq(col("add.path"), col("add.partitionValues"),
            col("add.size"), col("add.modificationTime")) ++
          (if (hasStats) Seq(col("add.stats")) else Nil) ++
          (if (hasDv) Seq(to_json(col("add.deletionVector"))) else Nil): _*)
          .collect()
        rows.foreach { r =>
          val path = r.getString(0)
          val pv = Option(r.getMap[String, String](1))
            .map(_.toMap.map { case (k, v) => k -> Option(v) })
            .getOrElse(Map.empty[String, Option[String]])
          val stats = if (hasStats && !r.isNullAt(4))
            Option(r.getString(4)) else None
          val dvIdx = if (hasStats) 5 else 4
          val dv = if (hasDv && !r.isNullAt(dvIdx))
            Some(parseDv(om.readTree(r.getString(dvIdx)), rootStr)) else None
          live(path) = mkAdd(om, path, pv, r.getLong(2), r.getLong(3), stats, dv)
        }
      }
      if (cols.contains("metaData")) {
        import org.apache.spark.sql.functions.{col, to_json}
        cp.where(col("metaData").isNotNull)
          .select(to_json(col("metaData"))).collect()
          .foreach(r => meta = Some(om.readTree(r.getString(0))))
      }
      if (cols.contains("protocol")) {
        import org.apache.spark.sql.functions.{col, to_json}
        cp.where(col("protocol").isNotNull)
          .select(to_json(col("protocol"))).collect()
          .foreach(r => protocol = Some(om.readTree(r.getString(0))))
      }
    }
    // v2 sidecar path → file under _delta_log/_sidecars/ (the spec's
    // layout); absolute/external sidecars refuse rather than misread
    def sidecarFile(p: String): Path = {
      require(!p.startsWith("/") && !p.contains("://"),
        s"$rootStr: v2 checkpoint sidecar references EXTERNAL file $p — " +
          "refusing rather than misread")
      new Path(new Path(logDir, "_sidecars"), p)
    }

    if (cpVersion >= 0) {
      val classicFiles =
        if (cpParts <= 1)
          Seq(new Path(logDir, f"$cpVersion%020d.checkpoint.parquet"))
        else (1 to cpParts).map(i => new Path(logDir,
          f"$cpVersion%020d.checkpoint.$i%010d.$cpParts%010d.parquet"))
      if (classicFiles.forall(fs.exists)) {
        absorbParquet(spark.read.parquet(classicFiles.map(_.toString): _*))
      } else {
        // ---- V2 checkpoint (the 2024+ DBR default write path): a
        // UUID-named manifest `NNN.checkpoint.<uuid>.{parquet|json}`
        // carrying checkpointMetadata/protocol/metaData + either the
        // file actions inline or `sidecar` references to parquet files
        // under `_delta_log/_sidecars/` that hold them ----------------
        val v2Pat =
          (f"$cpVersion%020d" + "\\.checkpoint\\.[A-Za-z0-9_-]+\\.(parquet|json)").r
        val manifests = fs.listStatus(logDir).map(_.getPath)
          .filter(p => v2Pat.pattern.matcher(p.getName).matches).sortBy(_.getName)
        require(manifests.nonEmpty,
          s"$rootStr: _last_checkpoint names version $cpVersion but no " +
            "classic or v2 checkpoint file exists — corrupt log")
        // multiple UUID manifests of one version are each complete —
        // any one serves; pick deterministically
        val mf = manifests.head
        val sidecarPaths = scala.collection.mutable.ArrayBuffer[String]()
        if (mf.getName.endsWith(".json")) {
          val text = new String(readBytes(fs, mf),
            java.nio.charset.StandardCharsets.UTF_8)
          text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
            val n = om.readTree(line)
            Option(n.get("checkpointMetadata")).foreach { cm =>
              require(cm.get("version").asLong() == cpVersion,
                s"$rootStr: v2 checkpoint manifest $mf declares version " +
                  s"${cm.get("version").asLong()} ≠ $cpVersion — corrupt log")
            }
            if (n.has("metaData")) meta = Some(n.get("metaData"))
            if (n.has("protocol")) protocol = Some(n.get("protocol"))
            if (n.has("sidecar"))
              sidecarPaths += n.get("sidecar").get("path").asText()
            if (n.has("add")) {
              val a = n.get("add")
              val dv = Option(a.get("deletionVector")).filterNot(_.isNull)
                .map(parseDv(_, rootStr))
              val path = a.get("path").asText()
              val pv = Option(a.get("partitionValues")).map { m =>
                m.fields().asScala.map { e =>
                  e.getKey -> (if (e.getValue.isNull) None
                               else Some(e.getValue.asText()))
                }.toMap
              }.getOrElse(Map.empty[String, Option[String]])
              live(path) = mkAdd(om, path, pv, a.get("size").asLong(),
                Option(a.get("modificationTime")).map(_.asLong()).getOrElse(0L),
                Option(a.get("stats")).filterNot(_.isNull).map(_.asText()), dv)
            }
            // checkpoint `remove` rows are vacuum tombstones, not state
          }
        } else {
          val cp = spark.read.parquet(mf.toString)
          if (cp.columns.contains("sidecar")) {
            import org.apache.spark.sql.functions.col
            cp.where(col("sidecar").isNotNull).select(col("sidecar.path"))
              .collect().foreach(r => sidecarPaths += r.getString(0))
          }
          if (cp.columns.contains("checkpointMetadata")) {
            import org.apache.spark.sql.functions.col
            cp.where(col("checkpointMetadata").isNotNull)
              .select(col("checkpointMetadata.version")).collect()
              .foreach(r => require(r.getLong(0) == cpVersion,
                s"$rootStr: v2 checkpoint manifest $mf declares version " +
                  s"${r.getLong(0)} ≠ $cpVersion — corrupt log"))
          }
          absorbParquet(cp)
        }
        if (sidecarPaths.nonEmpty) {
          val files = sidecarPaths.toSeq.map(sidecarFile)
          files.foreach(p => require(fs.exists(p),
            s"$rootStr: v2 checkpoint names missing sidecar $p — corrupt log"))
          absorbParquet(spark.read.parquet(files.map(_.toString): _*))
        }
      }
    }

    // ---- JSON commits after the checkpoint ---------------------------
    val commitName = """(\d{20})\.json""".r
    val commits = fs.listStatus(logDir).iterator
      .map(_.getPath.getName)
      .flatMap {
        case commitName(v) => Some(v.toLong)
        case _             => None
      }
      .filter(v => v > cpVersion && atVersion.forall(v <= _)).toSeq.sorted
    atVersion.foreach(v => require(
      commits.lastOption.contains(v) || cpVersion == v,
      s"$rootStr: pinned version $v is not present in the log " +
        s"(have ${commits.lastOption.orNull}) — cleaned or never committed"))
    require(cpVersion >= 0 || commits.headOption.contains(0L),
      s"$rootStr: Delta log starts at version ${commits.headOption.getOrElse(-1L)} " +
        "with no checkpoint — truncated log")
    // a checkpointed log must continue CONTIGUOUSLY from the
    // checkpoint: a stale _last_checkpoint over partially-cleaned
    // commits (cp+1..k gone, later ones present) would otherwise
    // replay later actions on a stale base — a silently wrong file set
    require(cpVersion < 0 || commits.isEmpty || commits.head == cpVersion + 1,
      s"$rootStr: first post-checkpoint commit ${commits.headOption.orNull} " +
        s"is not checkpoint version $cpVersion + 1 — stale checkpoint over " +
        "a cleaned log; refusing rather than replay on a stale base")
    commits.zip(commits.drop(1)).foreach { case (a, b) =>
      require(b == a + 1, s"$rootStr: Delta log gap between versions $a and $b")
    }
    require(cpVersion >= 0 || commits.nonEmpty,
      s"$rootStr: Delta log holds no commits")

    commits.foreach { v =>
      val text = new String(readBytes(fs, new Path(logDir, f"$v%020d.json")),
        java.nio.charset.StandardCharsets.UTF_8)
      // reconciliation is order-independent WITHIN a version (the
      // spec: an add and a remove of the same path in one commit —
      // the DV re-add shape — resolve to the ADD whatever order the
      // writer serialized them in): collect per commit, removes
      // first, adds second
      val commitRemoves = scala.collection.mutable.ArrayBuffer[String]()
      val commitAdds = scala.collection.mutable.ArrayBuffer[DeltaAdd]()
      text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
        val n = om.readTree(line)
        if (n.has("metaData")) meta = Some(n.get("metaData"))
        if (n.has("protocol")) protocol = Some(n.get("protocol"))
        if (n.has("remove"))
          commitRemoves += n.get("remove").get("path").asText()
        if (n.has("add")) {
          val a = n.get("add")
          val dv = Option(a.get("deletionVector")).filterNot(_.isNull)
            .map(parseDv(_, rootStr))
          val path = a.get("path").asText()
          val pv = Option(a.get("partitionValues")).map { m =>
            m.fields().asScala.map { e =>
              e.getKey -> (if (e.getValue.isNull) None
                           else Some(e.getValue.asText()))
            }.toMap
          }.getOrElse(Map.empty[String, Option[String]])
          commitAdds += mkAdd(om, path, pv, a.get("size").asLong(),
            Option(a.get("modificationTime")).map(_.asLong()).getOrElse(0L),
            Option(a.get("stats")).filterNot(_.isNull).map(_.asText()), dv)
        }
      }
      commitRemoves.foreach { p => live.remove(p); () }
      commitAdds.foreach(a => live(a.path) = a)
    }

    // ---- protocol / metadata gate ------------------------------------
    val md = meta.getOrElse(sys.error(
      s"$rootStr: Delta log carries no metaData action — corrupt log"))
    protocol.foreach { p =>
      val r = Option(p.get("minReaderVersion")).map(_.asInt()).getOrElse(1)
      require(r <= 3,
        s"$rootStr: Delta minReaderVersion $r exceeds 3 — refusing rather " +
          "than misread a future protocol")
      if (r == 3) {
        val feats = Option(p.get("readerFeatures"))
          .map(_.elements().asScala.map(_.asText()).toSet)
          .getOrElse(Set.empty[String])
        val unsupported = feats -- SupportedReaderFeatures
        require(unsupported.isEmpty,
          s"$rootStr: Delta readerFeatures ${unsupported.mkString(", ")} " +
            "not implemented — refusing rather than misread")
      }
    }
    val pm = parseMetaData(md, rootStr)
    val conf = pm.configuration
    val cmMode = pm.cmMode
    val schema = pm.schema
    val colMap = pm.colMap
    val partCols = pm.partitionCols
    live.keys.foreach { p =>
      require(!p.startsWith("/") && !p.contains("://"),
        s"$rootStr: Delta add references EXTERNAL file $p (shallow clone?) " +
          "— zero-copy convert requires table-rooted files")
    }
    // with column mapping, the log keys partition values and stats by
    // PHYSICAL name (per the protocol) — surface LOGICAL keys
    val physToLogical = colMap.map(_.swap)
    def logicalKeys(a: DeltaAdd): DeltaAdd =
      if (colMap.isEmpty) a
      else a.copy(
        partition = a.partition.flatMap { case (k, v) =>
          physToLogical.get(k).map(_ -> v) },
        min = a.min.flatMap { case (k, v) => physToLogical.get(k).map(_ -> v) },
        max = a.max.flatMap { case (k, v) => physToLogical.get(k).map(_ -> v) },
        nulls = a.nulls.flatMap { case (k, v) =>
          physToLogical.get(k).map(_ -> v) })
    DeltaSnapshot(rootStr, commits.lastOption.getOrElse(cpVersion),
      schema, partCols, conf, live.values.map(logicalKeys).toSeq.sortBy(_.path),
      colMap, cmMode)
  }

  /** One parsed Delta `metaData` action — schema, mapping, layout,
    * configuration, with every protocol/consistency refusal the
    * snapshot path enforces (shared by [[snapshot]] and the window
    * parser so a tail-consumed metaData change cannot be validated
    * more weakly than a snapshot-read one). */
  final case class ParsedMeta(schema: StructType,
      colMap: Map[String, String], cmMode: String,
      partitionCols: Seq[String], configuration: Map[String, String])

  private[core] def parseMetaData(md: JsonNode, rootStr: String): ParsedMeta = {
    val conf = Option(md.get("configuration")).map { c =>
      c.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty[String, String])
    val cmMode = conf.getOrElse("delta.columnMapping.mode", "none")
    require(cmMode == "none" || cmMode == "name" || cmMode == "id",
      s"$rootStr: Delta column mapping mode '$cmMode' unsupported — " +
        "implemented modes are none | name (physical-name resolution) | " +
        "id (parquet field-id resolution); refusing rather than misread")
    Option(md.get("format")).flatMap(f => Option(f.get("provider")))
      .map(_.asText()).foreach(p => require(p == "parquet",
        s"$rootStr: Delta format provider '$p' — only parquet is supported"))
    val schema = DataType.fromJson(md.get("schemaString").asText())
      .asInstanceOf[StructType]
    val colMap: Map[String, String] =
      if (cmMode == "none") Map.empty
      else schema.fields.map { f =>
        require(f.metadata.contains(PhysNameKey),
          s"$rootStr: column mapping enabled but field '${f.name}' has no " +
            s"$PhysNameKey — corrupt metadata")
        // id mode scans resolve by field id — every field must carry
        // one (physicalName still keys the log's partitionValues/stats)
        if (cmMode == "id") require(
          f.metadata.contains("delta.columnMapping.id"),
          s"$rootStr: id-mode column mapping but field '${f.name}' has " +
            "no delta.columnMapping.id — corrupt metadata")
        f.name -> f.metadata.getString(PhysNameKey)
      }.toMap
    require(colMap.values.toSet.size == colMap.size,
      s"$rootStr: duplicate physical column names in the mapping")
    // nested structs under column mapping would need per-level
    // physical names — refuse rather than read the top level only
    if (colMap.nonEmpty) schema.fields.foreach { f =>
      require(!f.dataType.isInstanceOf[StructType],
        s"$rootStr: column mapping over nested struct '${f.name}' not " +
          "implemented — refusing rather than misread nested fields")
    }
    val partCols = Option(md.get("partitionColumns"))
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
    ParsedMeta(schema, colMap, cmMode, partCols, conf)
  }

  private def parseDv(n: JsonNode, rootStr: String): DeltaDv.Descriptor = {
    def str(k: String) = Option(n.get(k)).filterNot(_.isNull).map(_.asText())
      .getOrElse(sys.error(s"$rootStr: deletionVector missing $k"))
    DeltaDv.Descriptor(
      storageType = str("storageType"),
      pathOrInlineDv = str("pathOrInlineDv"),
      offset = Option(n.get("offset")).filterNot(_.isNull).map(_.asInt()),
      sizeInBytes = Option(n.get("sizeInBytes")).filterNot(_.isNull)
        .map(_.asInt()).getOrElse(sys.error(
          s"$rootStr: deletionVector missing sizeInBytes")),
      cardinality = Option(n.get("cardinality")).filterNot(_.isNull)
        .map(_.asLong()).getOrElse(sys.error(
          s"$rootStr: deletionVector missing cardinality")))
  }

  /** Decode one add action: percent-decoded path + stats translated
    * into the manifest's string encoding. */
  private def mkAdd(om: ObjectMapper, rawPath: String,
      pv: Map[String, Option[String]], size: Long, mtime: Long,
      statsJson: Option[String], dv: Option[DeltaDv.Descriptor]): DeltaAdd = {
    val decoded =
      try new java.net.URI(rawPath).getPath
      catch { case _: java.net.URISyntaxException => rawPath }
    val (rows, mins, maxs, nulls) = statsJson match {
      case None => (-1L, Map.empty[String, String], Map.empty[String, String],
        Map.empty[String, Long])
      case Some(s) =>
        try {
          val n = om.readTree(s)
          val r = Option(n.get("numRecords")).map(_.asLong()).getOrElse(-1L)
          def strMap(key: String): Map[String, String] =
            Option(n.get(key)).map { m =>
              m.fields().asScala.flatMap { e =>
                // only primitive stats translate (struct columns nest)
                if (e.getValue.isValueNode && !e.getValue.isNull)
                  Some(e.getKey -> e.getValue.asText())
                else None
              }.toMap
            }.getOrElse(Map.empty)
          val nc = Option(n.get("nullCount")).map { m =>
            m.fields().asScala.flatMap { e =>
              if (e.getValue.isNumber) Some(e.getKey -> e.getValue.asLong())
              else None
            }.toMap
          }.getOrElse(Map.empty[String, Long])
          (r, strMap("minValues"), strMap("maxValues"), nc)
        } catch { case _: Exception =>
          (-1L, Map.empty[String, String], Map.empty[String, String],
            Map.empty[String, Long])
        }
    }
    DeltaAdd(decoded, pv, size, mtime, rows, mins, maxs, nulls, dv)
  }

  private def readBytes(fs: FileSystem, p: Path): Array[Byte] = {
    val in = fs.open(p)
    try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
  }

  /** Batch read of the ACTIVE snapshot — the engine's
    * `spark.read.format("delta-log").load(dir)` substance. Partition
    * columns are NOT stored in Delta data files; they re-enter the
    * frame through ONE broadcast join of (file path → partition
    * values) against `_metadata.file_path` — a single scan whatever
    * the partition count, no per-partition unions (the shape that
    * survives 10⁴ partitions). Deletion-vector'd files additionally
    * anti-join a broadcast (file, row_index) set — merge-on-read,
    * deleted-row-sized. Column-mapped tables scan under PHYSICAL
    * names and surface logical ones. `filters` prunes the add list
    * BEFORE planning where a partition-column filter allows (EqualTo /
    * In / IsNull on canonically-serialized types), the Delta
    * partition-pruning behavior.
    *
    * Join-key encoding: `_metadata.file_path` is the file's
    * URL-ENCODED URI (Spark's SparkPath), so the build side keys by
    * `Path.toUri.toString` — the same encoding — never the decoded
    * `Path.toString` (a space/%/# in a real path would silently drop
    * the whole file from an inner join keyed on mixed encodings).
    * And because a silently-dropped file is the worst failure mode a
    * reader can have, the join is LEFT with a per-row guard: a scan
    * row whose file matches no build-side entry RAISES (encoding
    * drift named in the error) instead of disappearing. */
  private[graft] def buildDf(spark0: SparkSession, snap: DeltaSnapshot,
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
    // id-mode column mapping resolves scan columns by parquet FIELD
    // ID — a session conf, not a per-scan option — so the whole frame
    // is built on a PRIVATE conf-pinned session (the loopSession
    // discipline: nothing leaks into concurrently-planned queries,
    // and executing the returned frame, whose plans capture this
    // session, keeps the conf). `ignoreMissingParquetFieldId` stays
    // at its strict default: a data file WITHOUT ids fails loudly
    // instead of silently returning nulls.
    val spark =
      if (snap.cmMode != "id") spark0
      else {
        val s2 = spark0.newSession()
        s2.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        s2
      }
    val root = new Path(snap.root)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val pSet = snap.partitionCols.toSet
    // canonical string serialization matches Delta's partitionValues
    // exactly for these types, so string equality is sound pruning
    val prunable = snap.schema.fields.filter(f => pSet.contains(f.name) &&
      (f.dataType match {
        case org.apache.spark.sql.types.StringType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.BooleanType |
             org.apache.spark.sql.types.DateType => true
        case _ => false
      })).map(_.name).toSet
    def keep(a: DeltaAdd): Boolean = filters.forall {
      case org.apache.spark.sql.sources.EqualTo(c, v) if prunable(c) =>
        a.partition.get(c).forall(_.contains(String.valueOf(v)))
      case org.apache.spark.sql.sources.In(c, vs) if prunable(c) =>
        a.partition.get(c).forall(pv =>
          pv.exists(s => vs.exists(v => String.valueOf(v) == s)))
      case org.apache.spark.sql.sources.IsNull(c) if prunable(c) =>
        a.partition.get(c).forall(_.isEmpty)
      case org.apache.spark.sql.sources.IsNotNull(c) if prunable(c) =>
        a.partition.get(c).forall(_.nonEmpty)
      case _ => true // residual filters re-apply above the scan
    }
    val adds = snap.adds.filter(keep)
    if (adds.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(snap.schema.fields.map(_.copy(nullable = true)).toSeq))
    val qualified = adds.map(a => fs.makeQualified(new Path(root, a.path)))
    // scan input: decoded Path strings (the form the reader lists);
    // join keys: Spark's own `_metadata.file_path` spelling
    val scanPaths = qualified.map(_.toString)
    val uriKeys = adds.zip(qualified.map(UriKeys.sparkPathKey))
    val scan0 = spark.read.schema(snap.dataSchema)
      .parquet(scanPaths: _*)
    // final projection: physical → logical names
    def logicalCols = snap.schema.fieldNames.map(n =>
      if (pSet.contains(n)) col(n) else col(snap.physName(n)).as(n))
    val anyDv = adds.exists(_.dv.isDefined)
    if (snap.partitionCols.isEmpty && !anyDv)
      return scan0.select(logicalCols: _*) // plain table: no joins at all
    // ---- ONE broadcast per-file dim: join-verified marker +
    //      partition values --------------------------------------------
    val fileCol = "__delta_file"
    val okCol = "__delta_ok"
    val pvSchema = StructType(
      Seq(org.apache.spark.sql.types.StructField(fileCol,
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField(okCol,
          org.apache.spark.sql.types.BooleanType, nullable = false)) ++
      snap.partitionCols.map(c => org.apache.spark.sql.types.StructField(
        s"__pv_$c", org.apache.spark.sql.types.StringType)))
    val pvRows = uriKeys.map { case (a, key) =>
      org.apache.spark.sql.Row.fromSeq(
        key +: true +: snap.partitionCols.map(c =>
          a.partition.get(c).flatten.orNull))
    }
    val pvDf = spark.createDataFrame(
      spark.sparkContext.parallelize(pvRows, 1), pvSchema)
    // metadata columns resolve only directly above the scan — capture
    // BOTH (file for the dim join, row position for the DV anti-join)
    // before any join hides them
    val tagged =
      if (anyDv)
        scan0.withColumn(fileCol, col("_metadata.file_path"))
          .withColumn("__delta_pos", col("_metadata.row_index"))
      else scan0.withColumn(fileCol, col("_metadata.file_path"))
    val joined = tagged
      .join(broadcast(pvDf), Seq(fileCol), "left")
      // the loud guard: a scan row whose file matched no log entry
      // means the two path encodings drifted — raise, never drop
      .filter(org.apache.spark.sql.functions.when(col(okCol).isNull,
          org.apache.spark.sql.functions.raise_error(
            org.apache.spark.sql.functions.concat(
              lit(s"delta-log ${snap.root}: scan row from file "),
              col(fileCol),
              lit(" matched no log entry — path-encoding drift; refusing" +
                " rather than drop rows"))))
        .otherwise(lit(true)))
      .drop(okCol)
    // ---- merge-on-read: deletion-vector'd rows leave here -----------
    val dved = uriKeys.filter(_._1.dv.isDefined)
    val undeleted =
      if (dved.isEmpty) joined
      else {
        val deleted: Seq[(String, Long)] = dved.flatMap { case (a, key) =>
          DeltaDv.readPositions(fs, root, a.dv.get).map(key -> _)
        }
        val dvDf = spark.createDataFrame(
          spark.sparkContext.parallelize(
            deleted.map(t => org.apache.spark.sql.Row(t._1, t._2)), 1),
          StructType(Seq(
            org.apache.spark.sql.types.StructField(fileCol,
              org.apache.spark.sql.types.StringType, nullable = false),
            org.apache.spark.sql.types.StructField("__delta_pos",
              org.apache.spark.sql.types.LongType, nullable = false))))
        joined
          .join(broadcast(dvDf), Seq(fileCol, "__delta_pos"), "left_anti")
      }
    val typed = snap.partitionCols.foldLeft(undeleted) { (df, c) =>
      val dt = snap.schema(c).dataType
      df.withColumn(c, col(s"__pv_$c").cast(dt)).drop(s"__pv_$c")
    }.drop(fileCol, "__delta_pos")
    typed.select(logicalCols: _*)
  }

  /** Plain read of the active snapshot (no pushed filters). */
  def read(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    buildDf(spark, snapshot(spark, path), Nil)

  /** Newest committed version visible in the log (JSON commits ∪ the
    * `_last_checkpoint` pointer) — the streaming source's offset
    * probe: one directory listing, no state reconstruction. */
  def latestVersion(spark: SparkSession, rootStr: String): Option[Long] = {
    val logDir = new Path(new Path(rootStr), LogDir)
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(logDir)) return None
    val commitName = """(\d{20})\.json""".r
    val om = new ObjectMapper()
    val fromJson = fs.listStatus(logDir).iterator.map(_.getPath.getName)
      .flatMap { case commitName(v) => Some(v.toLong); case _ => None }
      .maxOption
    val lastCp = new Path(logDir, "_last_checkpoint")
    val fromCp = if (fs.exists(lastCp))
      Some(om.readTree(readBytes(fs, lastCp)).get("version").asLong())
    else None
    (fromJson.toSeq ++ fromCp.toSeq).maxOption
  }

  /** Net effect of the commits (from, to] on the file set: the final
    * `add` per path (a re-add supersedes earlier actions on that
    * path), the paths whose FINAL action is `remove`, and every path
    * that appeared as an add anywhere in the window (so a consumer
    * can tell a drop of a pre-window file from an add-then-remove
    * that nets to nothing). `metaIdxByPath` records, per surviving
    * add, how many of `metas` had been seen by its commit (same-commit
    * metaData counts — Delta's ADD COLUMN ships the widened metaData
    * and the first widened file together): the consumer can verify
    * each add against the schema that actually GOVERNED it instead of
    * the anchor's. */
  final case class WindowDelta(adds: Seq[DeltaAdd], removedPaths: Seq[String],
      addedAnywhere: Set[String], metas: Seq[ParsedMeta] = Nil,
      metaIdxByPath: Map[String, Int] = Map.empty)

  /** The `add` actions of commits (from, to] — the streaming TAIL
    * parser, sound ONLY for append-shaped commits: a `remove` action
    * (rewrite/delete/compaction), a `metaData` or `protocol` change,
    * or a deletion-vector'd add inside the window REFUSES with the
    * standard change-feed reset signal (the consumer restarts from a
    * snapshot — exactly [[TxTable.changesSince]]'s contract). A
    * consumer that CAN represent file drops (a table follower, not a
    * row stream) uses [[actionsInWindow]] instead.
    * Partition/stat keys are translated to LOGICAL names per the
    * given snapshot's mapping. */
  def addsInWindow(spark: SparkSession, snap: DeltaSnapshot,
      from: Long, to: Long): Seq[DeltaAdd] =
    parseWindow(spark, snap, from, to, allowRemoves = false).adds

  /** The net file-set delta of commits (from, to] — [[addsInWindow]]
    * with `remove` actions TRANSLATED instead of refused (a follower
    * applies them as metadata-only manifest drops) and
    * deletion-vector'd adds PARSED instead of refused (a follower
    * translates the DV to its native sidecar — the upstream
    * merge-on-read DELETE/UPDATE shape) and `metaData` actions PARSED
    * into the result (the consumer decides whether the change is an
    * adoptable widening — [[TxTable.followDelta]]'s additive-evolution
    * rule — or a reset). Protocol changes within this reader's
    * capabilities pass as pure metadata (the upstream's first DV
    * commit upgrades to table features — a follower must survive
    * that); unsupported features still refuse. */
  def actionsInWindow(spark: SparkSession, snap: DeltaSnapshot,
      from: Long, to: Long): WindowDelta =
    parseWindow(spark, snap, from, to, allowRemoves = true,
      allowDvAdds = true, allowMetaData = true)

  private def parseWindow(spark: SparkSession, snap: DeltaSnapshot,
      from: Long, to: Long, allowRemoves: Boolean,
      allowDvAdds: Boolean = false,
      allowMetaData: Boolean = false): WindowDelta = {
    require(to > from, s"${snap.root}: empty window ($from, $to]")
    val root = new Path(snap.root)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(root, LogDir)
    val om = new ObjectMapper()
    val physToLogical = snap.colMap.map(_.swap)
    // final action per path, in first-appearance order (deterministic
    // output layout); None = removed
    val state = scala.collection.mutable.LinkedHashMap[String, Option[DeltaAdd]]()
    val addedAnywhere = Set.newBuilder[String]
    val metas = scala.collection.mutable.ArrayBuffer[ParsedMeta]()
    val metaIdx = scala.collection.mutable.HashMap[String, Int]()
    def decode(rawPath: String): String =
      try new java.net.URI(rawPath).getPath
      catch { case _: java.net.URISyntaxException => rawPath }
    ((from + 1) to to).foreach { v =>
      val p = new Path(logDir, f"$v%020d.json")
      require(fs.exists(p),
        s"${snap.root}: commit $v aged out of the log — the incremental " +
          "window is gone; restart the stream from a fresh snapshot")
      val text = new String(readBytes(fs, p),
        java.nio.charset.StandardCharsets.UTF_8)
      // Delta reconciliation is order-independent WITHIN a version:
      // an add and a remove of the same path in one commit (the DV
      // re-add shape — remove the old entry, add it back with a DV)
      // resolve to the add whatever order the writer serialized them
      // in. Collect per-commit, apply removes first, adds second.
      val commitRemoves = scala.collection.mutable.ArrayBuffer[String]()
      val commitAdds = scala.collection.mutable.ArrayBuffer[DeltaAdd]()
      text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
        val n = om.readTree(line)
        if (n.has("remove")) {
          require(allowRemoves,
            s"${snap.root}: commit $v REMOVES files — not append-shaped; " +
              "an incremental read cannot represent a rewrite: restart " +
              "the stream from a fresh snapshot")
          // the remove's DV descriptor (if any) only describes the
          // departing file — the whole-file drop supersedes it
          commitRemoves += decode(n.get("remove").get("path").asText())
        }
        if (n.has("metaData")) {
          require(allowMetaData,
            s"${snap.root}: commit $v changes table metadata — restart " +
              "the stream from a fresh snapshot")
          metas += parseMetaData(n.get("metaData"), snap.root)
        }
        // a protocol change that stays within this module's reader
        // capabilities is a pure capability bump (e.g. the upstream's
        // first DV commit upgrading to table features) — metadata
        // only, nothing for a file-set delta to carry; anything this
        // reader could MISREAD refuses with the reset signal
        if (n.has("protocol")) {
          val p = n.get("protocol")
          val r = Option(p.get("minReaderVersion")).map(_.asInt()).getOrElse(1)
          val unsupported =
            if (r != 3) Set.empty[String]
            else Option(p.get("readerFeatures")).filterNot(_.isNull)
              .map(_.elements().asScala.map(_.asText()).toSet)
              .getOrElse(Set.empty[String]) -- SupportedReaderFeatures
          require(r <= 3 && unsupported.isEmpty,
            s"${snap.root}: commit $v upgrades the protocol past this " +
              s"reader (minReaderVersion $r" +
              (if (unsupported.nonEmpty)
                 s", features ${unsupported.mkString(", ")}" else "") +
              ") — restart the stream from a fresh snapshot")
        }
        if (n.has("add")) {
          val a = n.get("add")
          val dvNode = Option(a.get("deletionVector")).filterNot(_.isNull)
          require(dvNode.isEmpty || allowDvAdds,
            s"${snap.root}: commit $v adds a DELETION-VECTOR'd file — a " +
              "merge-on-read rewrite, not an append; restart the stream " +
              "from a fresh snapshot")
          val path = a.get("path").asText()
          val pv = Option(a.get("partitionValues")).map { m =>
            m.fields().asScala.map { e =>
              e.getKey -> (if (e.getValue.isNull) None
                           else Some(e.getValue.asText()))
            }.toMap
          }.getOrElse(Map.empty[String, Option[String]])
          val add = mkAdd(om, path, pv, a.get("size").asLong(),
            Option(a.get("modificationTime")).map(_.asLong()).getOrElse(0L),
            Option(a.get("stats")).filterNot(_.isNull).map(_.asText()),
            dvNode.map(parseDv(_, snap.root)))
          val mapped = if (snap.colMap.isEmpty) add
          else add.copy(partition = add.partition.flatMap { case (k, vv) =>
            physToLogical.get(k).map(_ -> vv) })
          commitAdds += mapped
        }
      }
      commitRemoves.foreach(p => state(p) = None)
      commitAdds.foreach { a =>
        state(a.path) = Some(a)
        addedAnywhere += a.path
        metaIdx(a.path) = metas.length
      }
    }
    WindowDelta(
      adds = state.valuesIterator.flatten.toSeq,
      removedPaths = state.collect { case (p, None) => p }.toSeq,
      addedAnywhere = addedAnywhere.result(),
      metas = metas.toSeq,
      metaIdxByPath = metaIdx.toMap)
  }
}
