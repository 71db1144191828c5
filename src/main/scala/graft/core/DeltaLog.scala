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
  * UNSUPPORTED protocol features refuse LOUDLY rather than risk a
  * wrong read: reader version ≥ 2 (column mapping / deletion vectors
  * live behind it), any `add` carrying a `deletionVector`, column-
  * mapping table configuration, and absolute/external file paths
  * (shallow clones). What IS supported — plain parquet tables with or
  * without hive partitioning, checkpointed or not — covers the
  * overwhelming majority of real Delta tables.
  *
  * Scale note: snapshot state is driver-materialized, O(live files) —
  * the same cost class as this engine's own manifest (and as Delta's
  * own driver-side state reconstruction). Checkpoint parquet is read
  * through Spark, so million-file checkpoints parse distributed and
  * only the collected add-list lands on the driver. */
object DeltaLog {

  /** One live data file: root-relative DECODED path, partition values
    * (None = null partition value), size/mtime from the add action,
    * and stats translated to the manifest's string encoding (only
    * where sound — see [[statsOf]]). `rows = -1` when the add carried
    * no stats. */
  final case class DeltaAdd(path: String, partition: Map[String, Option[String]],
      bytes: Long, mtimeMs: Long, rows: Long,
      min: Map[String, String], max: Map[String, String],
      nulls: Map[String, Long])

  /** The reconstructed active state of a Delta table. */
  final case class DeltaSnapshot(root: String, version: Long,
      schema: StructType, partitionCols: Seq[String],
      configuration: Map[String, String], adds: Seq[DeltaAdd]) {
    def dataSchema: StructType = {
      val p = partitionCols.toSet
      StructType(schema.fields.filterNot(f => p.contains(f.name)))
    }
  }

  private val LogDir = "_delta_log"

  /** True iff `path` carries a Delta transaction log. */
  def isDeltaTable(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path, LogDir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Reconstruct the latest snapshot. Throws with a NAMED reason on
    * any unsupported protocol feature (never a wrong read). */
  def snapshot(spark: SparkSession, rootStr: String): DeltaSnapshot = {
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
        (n.get("version").asLong(),
          Option(n.get("parts")).map(_.asInt()).getOrElse(1))
      } else (-1L, 0)

    var meta: Option[JsonNode] = None
    var protocol: Option[JsonNode] = None
    val live = scala.collection.mutable.LinkedHashMap[String, DeltaAdd]()

    if (cpVersion >= 0) {
      val cpFiles =
        if (cpParts <= 1)
          Seq(new Path(logDir, f"$cpVersion%020d.checkpoint.parquet"))
        else (1 to cpParts).map(i => new Path(logDir,
          f"$cpVersion%020d.checkpoint.$i%010d.$cpParts%010d.parquet"))
      cpFiles.foreach(p => require(fs.exists(p),
        s"$rootStr: _last_checkpoint names missing $p — corrupt log"))
      val cp = spark.read.parquet(cpFiles.map(_.toString): _*)
      val cols = cp.columns.toSet
      // adds: distributed parse, only the live-file list is collected
      if (cols.contains("add")) {
        import org.apache.spark.sql.functions.col
        val hasStats = cp.select("add.*").columns.contains("stats")
        val rows = cp.where(col("add").isNotNull).select(
          Seq(col("add.path"), col("add.partitionValues"),
            col("add.size"), col("add.modificationTime")) ++
          (if (hasStats) Seq(col("add.stats")) else Nil): _*).collect()
        rows.foreach { r =>
          val path = r.getString(0)
          val pv = Option(r.getMap[String, String](1))
            .map(_.toMap.map { case (k, v) => k -> Option(v) })
            .getOrElse(Map.empty[String, Option[String]])
          val stats = if (hasStats && !r.isNullAt(4))
            Option(r.getString(4)) else None
          live(path) = mkAdd(om, path, pv, r.getLong(2), r.getLong(3), stats)
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

    // ---- JSON commits after the checkpoint ---------------------------
    val commitName = """(\d{20})\.json""".r
    val commits = fs.listStatus(logDir).iterator
      .map(_.getPath.getName)
      .flatMap {
        case commitName(v) => Some(v.toLong)
        case _             => None
      }
      .filter(_ > cpVersion).toSeq.sorted
    require(cpVersion >= 0 || commits.headOption.contains(0L),
      s"$rootStr: Delta log starts at version ${commits.headOption.getOrElse(-1L)} " +
        "with no checkpoint — truncated log")
    commits.zip(commits.drop(1)).foreach { case (a, b) =>
      require(b == a + 1, s"$rootStr: Delta log gap between versions $a and $b")
    }
    require(cpVersion >= 0 || commits.nonEmpty,
      s"$rootStr: Delta log holds no commits")

    commits.foreach { v =>
      val text = new String(readBytes(fs, new Path(logDir, f"$v%020d.json")),
        java.nio.charset.StandardCharsets.UTF_8)
      text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
        val n = om.readTree(line)
        if (n.has("metaData")) meta = Some(n.get("metaData"))
        if (n.has("protocol")) protocol = Some(n.get("protocol"))
        if (n.has("remove")) { live.remove(n.get("remove").get("path").asText()); () }
        if (n.has("add")) {
          val a = n.get("add")
          require(!a.has("deletionVector") || a.get("deletionVector").isNull,
            s"$rootStr: Delta table uses DELETION VECTORS (version $v) — " +
              "unsupported; run `REORG TABLE ... APPLY (PURGE)` on the " +
              "source to materialize deletes, then convert")
          val path = a.get("path").asText()
          val pv = Option(a.get("partitionValues")).map { m =>
            m.fields().asScala.map { e =>
              e.getKey -> (if (e.getValue.isNull) None
                           else Some(e.getValue.asText()))
            }.toMap
          }.getOrElse(Map.empty[String, Option[String]])
          live(path) = mkAdd(om, path, pv, a.get("size").asLong(),
            Option(a.get("modificationTime")).map(_.asLong()).getOrElse(0L),
            Option(a.get("stats")).filterNot(_.isNull).map(_.asText()))
        }
      }
    }

    // ---- protocol / metadata gate ------------------------------------
    val md = meta.getOrElse(sys.error(
      s"$rootStr: Delta log carries no metaData action — corrupt log"))
    protocol.foreach { p =>
      val r = Option(p.get("minReaderVersion")).map(_.asInt()).getOrElse(1)
      require(r <= 1,
        s"$rootStr: Delta minReaderVersion $r — reader v2+ gates column " +
          "mapping / deletion vectors / v2 checkpoints, which this " +
          "converter does not implement; refusing rather than misread")
    }
    val conf = Option(md.get("configuration")).map { c =>
      c.fields().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty[String, String])
    conf.get("delta.columnMapping.mode").filterNot(_ == "none").foreach { m =>
      sys.error(s"$rootStr: Delta column mapping mode '$m' unsupported — " +
        "physical parquet names differ from logical; refusing rather than misread")
    }
    Option(md.get("format")).flatMap(f => Option(f.get("provider")))
      .map(_.asText()).foreach(p => require(p == "parquet",
        s"$rootStr: Delta format provider '$p' — only parquet is supported"))
    val schema = DataType.fromJson(md.get("schemaString").asText())
      .asInstanceOf[StructType]
    val partCols = Option(md.get("partitionColumns"))
      .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
    live.keys.foreach { p =>
      require(!p.startsWith("/") && !p.contains("://"),
        s"$rootStr: Delta add references EXTERNAL file $p (shallow clone?) " +
          "— zero-copy convert requires table-rooted files")
    }
    DeltaSnapshot(rootStr, commits.lastOption.getOrElse(cpVersion),
      schema, partCols, conf, live.values.toSeq.sortBy(_.path))
  }

  /** Decode one add action: percent-decoded path + stats translated
    * into the manifest's string encoding. */
  private def mkAdd(om: ObjectMapper, rawPath: String,
      pv: Map[String, Option[String]], size: Long, mtime: Long,
      statsJson: Option[String]): DeltaAdd = {
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
    DeltaAdd(decoded, pv, size, mtime, rows, mins, maxs, nulls)
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
    * survives 10⁴ partitions). `filters` prunes the add list BEFORE
    * planning where a partition-column filter allows (EqualTo /
    * In / IsNull on canonically-serialized types), the Delta
    * partition-pruning behavior. */
  private[graft] def buildDf(spark: SparkSession, snap: DeltaSnapshot,
      filters: Seq[org.apache.spark.sql.sources.Filter])
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit}
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
    val qualified = adds.map(a =>
      fs.makeQualified(new Path(root, a.path)).toString)
    val scan = spark.read.schema(snap.dataSchema)
      .parquet(qualified: _*)
    if (snap.partitionCols.isEmpty)
      return scan.select(snap.schema.fieldNames.map(col): _*)
    // (file → partition values) as a broadcast dim: one row per live
    // file, string-typed, cast to the declared partition types
    val fileCol = "__delta_file"
    val pvSchema = StructType(
      org.apache.spark.sql.types.StructField(fileCol,
        org.apache.spark.sql.types.StringType, nullable = false) +:
      snap.partitionCols.map(c => org.apache.spark.sql.types.StructField(
        s"__pv_$c", org.apache.spark.sql.types.StringType)))
    val pvRows = adds.zip(qualified).map { case (a, q) =>
      org.apache.spark.sql.Row.fromSeq(
        q +: snap.partitionCols.map(c => a.partition.get(c).flatten.orNull))
    }
    val pvDf = spark.createDataFrame(
      spark.sparkContext.parallelize(pvRows, 1), pvSchema)
    val typed = snap.partitionCols.foldLeft(
      scan.withColumn(fileCol, col("_metadata.file_path"))
        .join(broadcast(pvDf), fileCol)) { (df, c) =>
      val dt = snap.schema(c).dataType
      df.withColumn(c, col(s"__pv_$c").cast(dt)).drop(s"__pv_$c")
    }.drop(fileCol)
    typed.select(snap.schema.fieldNames.map(col): _*)
  }

  /** Plain read of the active snapshot (no pushed filters). */
  def read(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame =
    buildDf(spark, snapshot(spark, path), Nil)
}
