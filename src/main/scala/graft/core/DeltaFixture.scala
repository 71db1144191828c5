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

  def protocolJson(minReader: Int = 1, minWriter: Int = 2,
      readerFeatures: Seq[String] = Nil,
      writerFeatures: Seq[String] = Nil): String = {
    val om = new ObjectMapper()
    val n = om.createObjectNode()
    val p = n.putObject("protocol")
    p.put("minReaderVersion", minReader)
    p.put("minWriterVersion", minWriter)
    if (readerFeatures.nonEmpty) {
      val a = p.putArray("readerFeatures"); readerFeatures.foreach(a.add)
    }
    if (writerFeatures.nonEmpty) {
      val a = p.putArray("writerFeatures"); writerFeatures.foreach(a.add)
    }
    om.writeValueAsString(n)
  }

  /** Schema with `name`-mode column-mapping metadata: each field gets
    * the given PHYSICAL name (+ a stable field id) in its metadata —
    * the shape `ALTER TABLE ... RENAME COLUMN` leaves behind. */
  def mappedSchema(fields: Seq[(String, org.apache.spark.sql.types.DataType,
      String)]): StructType =
    StructType(fields.zipWithIndex.map { case ((logical, dt, physical), i) =>
      StructField(logical, dt, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("delta.columnMapping.id", i + 1L)
          .putString("delta.columnMapping.physicalName", physical)
          .build())
    })

  /** Schema with `id`-mode column-mapping metadata: each field gets
    * a field id AND a physical name — the Iceberg-convert/UniForm
    * shape, where data-file column NAMES are untrustworthy and only
    * the parquet field ids resolve. */
  def idMappedSchema(fields: Seq[(String, org.apache.spark.sql.types.DataType,
      String, Long)]): StructType =
    StructType(fields.map { case (logical, dt, physical, id) =>
      StructField(logical, dt, nullable = true,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("delta.columnMapping.id", id)
          .putString("delta.columnMapping.physicalName", physical)
          .build())
    })

  /** Write `df` as ONE parquet file whose columns are RENAMED to
    * `names` and carry the given parquet FIELD IDS — the id-mode data
    * file: resolvable only by id (the names deliberately match
    * nothing in the table metadata). */
  def writeDataWithFieldIds(spark: SparkSession, df: DataFrame,
      rootStr: String, relPath: String, names: Seq[String],
      ids: Seq[Long]): DataFile = {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    val renamed = df.toDF(names: _*)
    val schema = StructType(renamed.schema.fields.zip(ids).map {
      case (f, id) => f.copy(metadata =
        new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata).putLong("parquet.field.id", id).build())
    })
    writeData(s2, s2.createDataFrame(renamed.rdd, schema), rootStr, relPath)
  }

  /** Write a REAL protocol-conformant deletion-vector file for the
    * given deleted row indexes and return its `u`-storage descriptor
    * (uuid-derived name under the table root). */
  def writeDv(spark: SparkSession, rootStr: String,
      positions: Seq[Long]): DeltaDv.Descriptor = {
    val root = new Path(rootStr)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val blob = DeltaDv.serializeBitmaps(positions)
    val (d, file) = DeltaDv.uDescriptor(root, "", java.util.UUID.randomUUID(),
      offset = 1, sizeInBytes = blob.length, cardinality = positions.size.toLong)
    val offsets = DeltaDv.writeFile(fs, file, Seq(blob))
    require(offsets == Seq(1), s"unexpected DV offsets $offsets")
    d
  }

  /** Inline (`i`-storage) descriptor for the given deleted rows. */
  def inlineDv(positions: Seq[Long]): DeltaDv.Descriptor = {
    val blob = DeltaDv.serializeBitmaps(positions)
    DeltaDv.Descriptor("i", DeltaDv.z85Encode(blob), None, blob.length,
      positions.size.toLong)
  }

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
      stats: Option[String] = None,
      deletionVector: Option[DeltaDv.Descriptor] = None): String = {
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
    deletionVector.foreach { d =>
      val dv = a.putObject("deletionVector")
      dv.put("storageType", d.storageType)
      dv.put("pathOrInlineDv", d.pathOrInlineDv)
      d.offset.foreach(o => dv.put("offset", o))
      dv.put("sizeInBytes", d.sizeInBytes)
      dv.put("cardinality", d.cardinality)
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
      adds: Seq[(DataFile, Map[String, String], Option[String])],
      dvFor: Map[String, DeltaDv.Descriptor] = Map.empty,
      protocol: (Int, Int) = (1, 2)): Unit = {
    val dvType = StructType(Seq(
      StructField("storageType", StringType),
      StructField("pathOrInlineDv", StringType),
      StructField("offset", org.apache.spark.sql.types.IntegerType),
      StructField("sizeInBytes", org.apache.spark.sql.types.IntegerType),
      StructField("cardinality", LongType)))
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", org.apache.spark.sql.types.BooleanType),
      StructField("stats", StringType)) ++
      (if (dvFor.nonEmpty) Seq(StructField("deletionVector", dvType)) else Nil))
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
      Row(null, null, Row(protocol._1, protocol._2)) +:
      adds.map { case (f, pv, stats) =>
        val base = Seq(f.relPath, pv, f.bytes, f.mtimeMs, true, stats.orNull)
        val withDv =
          if (dvFor.isEmpty) base
          else base :+ dvFor.get(f.relPath).map(d =>
            Row(d.storageType, d.pathOrInlineDv, d.offset.map(Int.box).orNull,
              d.sizeInBytes, d.cardinality)).orNull
        Row(Row.fromSeq(withDv), null, null)
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

  /** Write a V2 CHECKPOINT at `version` (the UUID-manifest layout
    * newer DBR writers emit): `NNN.checkpoint.<uuid>.{parquet|json}`
    * carrying `checkpointMetadata` + protocol (reader 3,
    * `v2Checkpoint` feature) + metaData, with the add actions either
    * in ONE sidecar parquet under `_delta_log/_sidecars/`
    * (`sidecar = true`) or inline in the manifest; plus the
    * `_last_checkpoint` pointer. */
  def checkpointV2(spark: SparkSession, rootStr: String, version: Long,
      schema: StructType, partitionCols: Seq[String],
      adds: Seq[(DataFile, Map[String, String], Option[String])],
      manifestFormat: String = "parquet", sidecar: Boolean = true): Unit = {
    require(manifestFormat == "parquet" || manifestFormat == "json")
    val logDir = new Path(rootStr, "_delta_log")
    val fs = logDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(logDir)
    val uuid = java.util.UUID.randomUUID().toString
    val addType = StructType(Seq(
      StructField("path", StringType),
      StructField("partitionValues", MapType(StringType, StringType)),
      StructField("size", LongType),
      StructField("modificationTime", LongType),
      StructField("dataChange", org.apache.spark.sql.types.BooleanType),
      StructField("stats", StringType)))
    def addStructs = adds.map { case (f, pv, stats) =>
      Row(f.relPath, pv, f.bytes, f.mtimeMs, true, stats.orNull) }
    val sidecarName = s"$uuid.parquet"
    val sidecarDir = new Path(logDir, "_sidecars")
    if (sidecar) {
      val tmp = new Path(rootStr, s".scfx-$uuid")
      spark.createDataFrame(
        spark.sparkContext.parallelize(addStructs.map(Row(_)), 1),
        StructType(Seq(StructField("add", addType))))
        .coalesce(1).write.parquet(tmp.toString)
      val part = fs.listStatus(tmp)
        .find(_.getPath.getName.endsWith(".parquet")).get
      fs.mkdirs(sidecarDir)
      require(fs.rename(part.getPath, new Path(sidecarDir, sidecarName)),
        "sidecar rename failed")
      fs.delete(tmp, true)
    }
    val mfName = f"$version%020d.checkpoint.$uuid.$manifestFormat"
    if (manifestFormat == "json") {
      val om = new ObjectMapper()
      val cm = {
        val n = om.createObjectNode()
        n.putObject("checkpointMetadata").put("version", version)
        om.writeValueAsString(n)
      }
      val sc =
        if (!sidecar) Nil
        else {
          val st = fs.getFileStatus(new Path(sidecarDir, sidecarName))
          val n = om.createObjectNode()
          val s = n.putObject("sidecar")
          s.put("path", sidecarName)
          s.put("sizeInBytes", st.getLen)
          s.put("modificationTime", st.getModificationTime)
          Seq(om.writeValueAsString(n))
        }
      val inline =
        if (sidecar) Nil
        else adds.map { case (f, pv, stats) => addJson(f, pv, stats) }
      val lines = Seq(cm,
        protocolJson(minReader = 3, minWriter = 7,
          readerFeatures = Seq("v2Checkpoint")),
        metaDataJson(schema, partitionCols)) ++ sc ++ inline
      val out = fs.create(new Path(logDir, mfName), true)
      try out.write((lines.mkString("\n") + "\n").getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } else {
      val cmType = StructType(Seq(StructField("version", LongType)))
      val protoType = StructType(Seq(
        StructField("minReaderVersion", org.apache.spark.sql.types.IntegerType),
        StructField("minWriterVersion", org.apache.spark.sql.types.IntegerType),
        StructField("readerFeatures",
          org.apache.spark.sql.types.ArrayType(StringType)),
        StructField("writerFeatures",
          org.apache.spark.sql.types.ArrayType(StringType))))
      val metaType = StructType(Seq(
        StructField("id", StringType),
        StructField("format", StructType(Seq(
          StructField("provider", StringType)))),
        StructField("schemaString", StringType),
        StructField("partitionColumns",
          org.apache.spark.sql.types.ArrayType(StringType)),
        StructField("configuration", MapType(StringType, StringType))))
      val scType = StructType(Seq(
        StructField("path", StringType),
        StructField("sizeInBytes", LongType),
        StructField("modificationTime", LongType)))
      val mfSchema = StructType(Seq(
        StructField("checkpointMetadata", cmType),
        StructField("protocol", protoType),
        StructField("metaData", metaType),
        StructField("sidecar", scType),
        StructField("add", addType)))
      def r5(cm: Row = null, proto: Row = null, md: Row = null,
          sc: Row = null, add: Row = null) = Row(cm, proto, md, sc, add)
      val scRow =
        if (!sidecar) Nil
        else {
          val st = fs.getFileStatus(new Path(sidecarDir, sidecarName))
          Seq(r5(sc = Row(sidecarName, st.getLen, st.getModificationTime)))
        }
      val rows = Seq(
        r5(cm = Row(version)),
        r5(proto = Row(3, 7, Seq("v2Checkpoint"), Seq.empty[String])),
        r5(md = Row(java.util.UUID.randomUUID().toString, Row("parquet"),
          schema.json, partitionCols, Map.empty[String, String]))) ++
        scRow ++
        (if (sidecar) Nil else addStructs.map(a => r5(add = a)))
      val tmp = new Path(rootStr, s".mfx-$uuid")
      spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), mfSchema)
        .coalesce(1).write.parquet(tmp.toString)
      val part = fs.listStatus(tmp)
        .find(_.getPath.getName.endsWith(".parquet")).get
      require(fs.rename(part.getPath, new Path(logDir, mfName)),
        s"rename to $mfName failed")
      fs.delete(tmp, true)
    }
    val lp = fs.create(new Path(logDir, "_last_checkpoint"), true)
    try lp.write(
      s"""{"version":$version,"size":${adds.size + 3}}""".getBytes(
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
