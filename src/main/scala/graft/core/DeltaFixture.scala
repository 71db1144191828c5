package graft.core

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{LongType, MapType, StringType, StructField, StructType}

/** Hand-written Delta Lake table generator — the [[DeltaLog]] reader's
  * test substrate. Writes REAL parquet data files plus a `_delta_log`
  * authored directly against the published protocol (JSON actions,
  * optional parquet checkpoint + `_last_checkpoint`), with zero
  * delta-spark dependency — exactly what the interop must parse, and
  * nothing this repo's own writer produced (so the gate can't pass by
  * accidental format symmetry). */
private[graft] object DeltaFixture {

  /** One written data file: root-relative path + the facts an `add`
    * action records. */
  final case class DataFile(relPath: String, bytes: Long, mtimeMs: Long,
      rows: Long)

  /** Write `df` as ONE parquet file at `root/relPath`. */
  def writeData(spark: SparkSession, df: DataFrame, rootStr: String,
      relPath: String): DataFile = {
    val root = new Path(rootStr)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(root, s".fx-${java.util.UUID.randomUUID()}")
    df.coalesce(1).write.parquet(tmp.toString)
    val part = fs.listStatus(tmp)
      .find(st => st.getPath.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no parquet part under $tmp"))
    val dst = new Path(root, relPath)
    fs.mkdirs(dst.getParent)
    require(fs.rename(part.getPath, dst), s"rename to $dst failed")
    fs.delete(tmp, true)
    val st = fs.getFileStatus(dst)
    val rows = spark.read.parquet(dst.toString).count()
    DataFile(relPath, st.getLen, st.getModificationTime, rows)
  }

  def protocolJson(minReader: Int = 1, minWriter: Int = 2): String =
    s"""{"protocol":{"minReaderVersion":$minReader,"minWriterVersion":$minWriter}}"""

  def metaDataJson(schema: StructType, partitionCols: Seq[String] = Nil,
      config: Map[String, String] = Map.empty): String = {
    val om = new ObjectMapper()
    val n = om.createObjectNode()
    val m = n.putObject("metaData")
    m.put("id", java.util.UUID.randomUUID().toString)
    val fmt = m.putObject("format")
    fmt.put("provider", "parquet"); fmt.putObject("options")
    m.put("schemaString", schema.json)
    val pc = m.putArray("partitionColumns")
    partitionCols.foreach(pc.add)
    val cfg = m.putObject("configuration")
    config.foreach { case (k, v) => cfg.put(k, v) }
    m.put("createdTime", 1700000000000L)
    om.writeValueAsString(n)
  }

  def addJson(f: DataFile, partitionValues: Map[String, String] = Map.empty,
      stats: Option[String] = None, deletionVector: Boolean = false): String = {
    val om = new ObjectMapper()
    val n = om.createObjectNode()
    val a = n.putObject("add")
    a.put("path", f.relPath)
    val pv = a.putObject("partitionValues")
    partitionValues.foreach { case (k, v) => pv.put(k, v) }
    a.put("size", f.bytes)
    a.put("modificationTime", f.mtimeMs)
    a.put("dataChange", true)
    stats.foreach(s => a.put("stats", s))
    if (deletionVector) {
      val dv = a.putObject("deletionVector")
      dv.put("storageType", "u"); dv.put("pathOrInlineDv", "ab^-aqEH.-t@S}K{")
      dv.put("offset", 1); dv.put("sizeInBytes", 36); dv.put("cardinality", 2L)
    }
    om.writeValueAsString(n)
  }

  def removeJson(relPath: String): String = {
    val om = new ObjectMapper()
    val n = om.createObjectNode()
    val r = n.putObject("remove")
    r.put("path", relPath)
    r.put("deletionTimestamp", 1700000001000L)
    r.put("dataChange", true)
    om.writeValueAsString(n)
  }

  /** Publish one JSON commit (one action per line, the protocol's
    * layout). */
  def commit(spark: SparkSession, rootStr: String, version: Long,
      actions: Seq[String]): Unit = {
    val logDir = new Path(rootStr, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(logDir)
    val out = fs.create(new Path(logDir, f"$version%020d.json"), true)
    try out.write((actions.mkString("\n") + "\n").getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Write a parquet CHECKPOINT of the given state at `version` plus
    * the `_last_checkpoint` pointer — the compacted-log shape the
    * reader must handle ([[DeltaLog.snapshot]]'s base-state path). */
  def checkpoint(spark: SparkSession, rootStr: String, version: Long,
      schema: StructType, partitionCols: Seq[String],
      adds: Seq[(DataFile, Map[String, String], Option[String])]): Unit = {
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", org.apache.spark.sql.types.BooleanType),
      StructField("stats", StringType)))
    val metaType = StructType(Seq(
      StructField("id", StringType),
      StructField("format", StructType(Seq(
        StructField("provider", StringType)))),
      StructField("schemaString", StringType),
      StructField("partitionColumns",
        org.apache.spark.sql.types.ArrayType(StringType)),
      StructField("configuration", MapType(StringType, StringType))))
    val protoType = StructType(Seq(
      StructField("minReaderVersion", org.apache.spark.sql.types.IntegerType),
      StructField("minWriterVersion", org.apache.spark.sql.types.IntegerType)))
    val cpSchema = StructType(Seq(
      StructField("add", addType), StructField("metaData", metaType),
      StructField("protocol", protoType)))
    val rows =
      Row(null, Row(java.util.UUID.randomUUID().toString, Row("parquet"),
        schema.json, partitionCols, Map.empty[String, String]), null) +:
      Row(null, null, Row(1, 2)) +:
      adds.map { case (f, pv, stats) =>
        Row(Row(f.relPath, pv, f.bytes, f.mtimeMs, true, stats.orNull),
          null, null)
      }
    val logDir = new Path(rootStr, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(rootStr, s".cpfx-${java.util.UUID.randomUUID()}")
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), cpSchema)
      .coalesce(1).write.parquet(tmp.toString)
    val part = fs.listStatus(tmp)
      .find(st => st.getPath.getName.endsWith(".parquet")).get
    val dst = new Path(logDir, f"$version%020d.checkpoint.parquet")
    fs.mkdirs(logDir)
    require(fs.rename(part.getPath, dst), s"rename to $dst failed")
    fs.delete(tmp, true)
    val lp = fs.create(new Path(logDir, "_last_checkpoint"), true)
    try lp.write(
      s"""{"version":$version,"size":${rows.size}}""".getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
    finally lp.close()
  }

  /** Delta's per-file stats JSON for simple numeric columns. */
  def statsJson(numRecords: Long, min: Map[String, Any] = Map.empty,
      max: Map[String, Any] = Map.empty,
      nulls: Map[String, Long] = Map.empty): String = {
    val om = new ObjectMapper()
    val n = om.createObjectNode()
    n.put("numRecords", numRecords)
    def put(o: com.fasterxml.jackson.databind.node.ObjectNode,
        k: String, v: Any): Unit = v match {
      case i: Int    => o.put(k, i); ()
      case l: Long   => o.put(k, l); ()
      case d: Double => o.put(k, d); ()
      case s: String => o.put(k, s); ()
      case other     => o.put(k, String.valueOf(other)); ()
    }
    val mn = n.putObject("minValues"); min.foreach { case (k, v) => put(mn, k, v) }
    val mx = n.putObject("maxValues"); max.foreach { case (k, v) => put(mx, k, v) }
    val nc = n.putObject("nullCount"); nulls.foreach { case (k, v) => nc.put(k, v); () }
    om.writeValueAsString(n)
  }
}
