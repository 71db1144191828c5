package org.apache.spark.sql.graft

import org.apache.hadoop.fs.FileStatus
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}
import org.apache.spark.sql.connector.read.{HasPartitionKey, InputPartition, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.execution.datasources.parquet.ParquetOptions
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetPartitionReaderFactory
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types.StructType
import org.apache.spark.util.SerializableConfiguration

/** A parquet split group that also CARRIES its bucket id — the
  * storage-partitioned-join handshake: `BatchScanExec` reads the key
  * through [[HasPartitionKey]], groups same-key partitions, and when
  * both join sides report compatible `KeyGroupedPartitioning` the
  * planner co-locates bucket-to-bucket with ZERO shuffle. Extending
  * Spark's own [[FilePartition]] means the stock parquet reader
  * factory consumes these unchanged. */
final class KeyedFilePartition(index0: Int, files0: Array[PartitionedFile],
    bucketId: Int) extends FilePartition(index0, files0) with HasPartitionKey {
  private val key = new GenericInternalRow(Array[Any](bucketId))
  override def partitionKey(): InternalRow = key
}

/** Public re-export of Spark's `private[sql]`
  * [[org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback]]:
  * the engine's V2 catalog table implements this so STREAMING reads
  * (`spark.readStream.table`) fall back to the V1 txtable source —
  * the same package-placement seam Delta uses for its streaming
  * fallback. */
trait V1StreamFallback
    extends org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

/** A single-file split carrying that file's DELETED row positions —
  * the merge-on-read surface of the V2 catalog path: the reader asks
  * parquet for its row-index column and drops listed positions before
  * anything downstream sees them. One file per partition so position
  * sets attribute unambiguously. */
sealed class DvFilePartition(index0: Int, file0: PartitionedFile,
    val positions: Array[Long]) extends FilePartition(index0, Array(file0))

/** [[DvFilePartition]] that also carries its bucket id — DV-bearing
  * bucketed snapshots keep storage-partitioned joins (same-key
  * partitions group, one file each). */
final class KeyedDvFilePartition(index0: Int, file0: PartitionedFile,
    positions0: Array[Long], bucketId: Int)
    extends DvFilePartition(index0, file0, positions0) with HasPartitionKey {
  private val key = new GenericInternalRow(Array[Any](bucketId))
  override def partitionKey(): InternalRow = key
}

/** A single-file split for ROW-ID reads (the `SupportsDelta` scan of
  * native UPDATE/MERGE/complex-DELETE): carries the file's manifest
  * entry path (what the commit's deletion-vector bookkeeping keys on)
  * and its already-deleted positions (excluded — re-deleting a DV'd
  * row must be a no-op, mirroring the seam's discovery scan). */
final class RowIdFilePartition(index0: Int, file0: PartitionedFile,
    val entryPath: String, val positions: Array[Long])
    extends FilePartition(index0, Array(file0))

/** The `private[sql]` seam for the DataSource-V2 catalog
  * ([[graft.sources.GraftCatalog]]): file-split planning and the
  * parquet reader factory reuse Spark's OWN file-source machinery —
  * vectorized decode, row-group filter pushdown, column pruning — so
  * the catalog path adds table resolution and partitioning metadata
  * without re-implementing any IO. Placement under
  * `org.apache.spark.sql` follows the [[StreamShims]] discipline. */
object V2Shims {

  private def pf(st: FileStatus, start: Long, len: Long): PartitionedFile =
    PartitionedFile(InternalRow.empty, SparkPath.fromPath(st.getPath),
      start, len, Array.empty, st.getModificationTime, st.getLen)

  /** One whole-file row-id partition (the native row-level-operation
    * scan shape): entry path + already-deleted positions. */
  def rowIdPartition(index: Int, st: FileStatus, entryPath: String,
      positions: Array[Long]): InputPartition =
    new RowIdFilePartition(index, pf(st, 0L, st.getLen), entryPath, positions)

  /** One whole-file DV partition (keyed when `bucketId` is set). */
  def dvPartition(index: Int, st: FileStatus, positions: Array[Long],
      bucketId: Option[Int]): InputPartition = bucketId match {
    case Some(b) =>
      new KeyedDvFilePartition(index, pf(st, 0L, st.getLen), positions, b)
    case None => new DvFilePartition(index, pf(st, 0L, st.getLen), positions)
  }

  /** Plain (non-bucketed) splits, packed exactly like Spark's file
    * sources: files carve at `maxSplitBytes` (maxPartitionBytes
    * bounded below by bytes/defaultParallelism with open-cost
    * padding) and bin-pack largest-first — the parallelism/task-count
    * balance `FileSourceScanExec` ships with. */
  def packedPartitions(spark: SparkSession,
      statuses: Seq[FileStatus]): Array[InputPartition] = {
    val session = spark.asInstanceOf[ClassicSession]
    val conf = session.sessionState.conf
    val openCost = conf.filesOpenCostInBytes
    val totalBytes = statuses.map(_.getLen + openCost).sum
    val bytesPerCore =
      totalBytes / math.max(1, session.sparkContext.defaultParallelism)
    val maxSplit = math.min(conf.filesMaxPartitionBytes,
      math.max(openCost, bytesPerCore))
    val splits = statuses.flatMap { st =>
      (0L until st.getLen by math.max(1L, maxSplit)).map { off =>
        pf(st, off, math.min(maxSplit, st.getLen - off))
      }
    }.sortBy(-_.length)
    FilePartition.getFilePartitions(session, splits, maxSplit)
      .toArray[InputPartition]
  }

  /** One keyed partition per present bucket, whole files (a bucket's
    * rows must stay in ONE input partition for the key grouping to be
    * sound — the same per-bucket task shape Spark's bucketed hive
    * scan uses). */
  def bucketPartitions(byBucket: Seq[(Int, Seq[FileStatus])])
      : Array[InputPartition] =
    byBucket.sortBy(_._1).zipWithIndex.map { case ((b, sts), i) =>
      new KeyedFilePartition(i,
        sts.map(st => pf(st, 0L, st.getLen)).toArray, b): InputPartition
    }.toArray

  /** Spark's own vectorized parquet reader factory over a manifest-
    * decided file list: row-group/page pushdown from the scan's
    * pushed filters, column pruning from `readSchema`, vectorized or
    * row decode per the session conf — identical execution to a
    * native parquet scan; only the PLANNING (which files, which
    * buckets) is the commit log's. */
  def parquetReaderFactory(spark: SparkSession, dataSchema: StructType,
      readSchema: StructType, pushed: Array[Filter],
      forceRowBased: Boolean = false): PartitionReaderFactory = {
    val session = spark.asInstanceOf[ClassicSession]
    val sqlConf =
      if (!forceRowBased) session.sessionState.conf
      else {
        // the parquet-mr row path carries the row-index generator the
        // DV filter needs; the vectorized reader's column check
        // rejects the generated column in this construction
        val c = session.sessionState.conf.clone()
        c.setConf(org.apache.spark.sql.internal.SQLConf
          .PARQUET_VECTORIZED_READER_ENABLED, false)
        c
      }
    // the hadoop-conf handshake ParquetScan.createReaderFactory
    // performs for its own factory: read-support class + requested
    // schema + the parquet semantics flags the readers consult
    // task-side (without READ_SUPPORT_CLASS the non-vectorized path
    // NPEs; without the requested schema pruning breaks)
    val hconf = session.sessionState.newHadoopConf()
    hconf.set(org.apache.parquet.hadoop.ParquetInputFormat.READ_SUPPORT_CLASS,
      classOf[org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport].getName)
    hconf.set(
      org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport.SPARK_ROW_REQUESTED_SCHEMA,
      readSchema.json)
    hconf.set(
      org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport.SPARK_ROW_SCHEMA,
      readSchema.json)
    org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
      .setSchema(readSchema, hconf)
    val S = org.apache.spark.sql.internal.SQLConf
    hconf.set(S.SESSION_LOCAL_TIMEZONE.key, sqlConf.sessionLocalTimeZone)
    hconf.setBoolean(S.NESTED_SCHEMA_PRUNING_ENABLED.key,
      sqlConf.nestedSchemaPruningEnabled)
    hconf.setBoolean(S.CASE_SENSITIVE.key, sqlConf.caseSensitiveAnalysis)
    hconf.setBoolean(S.PARQUET_BINARY_AS_STRING.key,
      sqlConf.isParquetBinaryAsString)
    hconf.setBoolean(S.PARQUET_INT96_AS_TIMESTAMP.key,
      sqlConf.isParquetINT96AsTimestamp)
    hconf.setBoolean(S.LEGACY_PARQUET_NANOS_AS_LONG.key,
      sqlConf.legacyParquetNanosAsLong)
    val bc = session.sparkContext.broadcast(new SerializableConfiguration(hconf))
    ParquetPartitionReaderFactory(sqlConf, bc, dataSchema, readSchema,
      StructType(Nil), pushed, None,
      new ParquetOptions(Map.empty[String, String], sqlConf))
  }

  /** Metadata-column names served by the graft V2 catalog table —
    * the `SupportsDelta.rowId()` pair: the row's manifest entry path
    * and its physical parquet row index. Iceberg's `_file`/`_pos`
    * shape (underscored to stay clear of user columns). */
  val FileMetaCol = "__graft_file"
  val PosMetaCol = "__graft_pos"

  /** [[parquetReaderFactory]] for ROW-ID reads — the scan under the
    * native row-level operations (`WriteDelta`): reads with parquet's
    * row-index generator column, drops positions already deleted by
    * the file's deletion vector, and serves the requested schema
    * where [[FileMetaCol]]/[[PosMetaCol]] columns materialize from the
    * partition's entry path / the generated index. Row-based (the
    * same trade the DV reader makes); row-level ops read only the
    * zone-map candidate files, so the cost is O(candidate bytes). */
  def rowIdParquetReaderFactory(spark: SparkSession, dataSchema: StructType,
      required: StructType, pushed: Array[Filter]): PartitionReaderFactory = {
    import org.apache.spark.sql.catalyst.expressions.{BoundReference, Literal, UnsafeProjection}
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    val dataFields = required.fields.filter(f =>
      f.name != FileMetaCol && f.name != PosMetaCol)
    val innerSchema = StructType(dataFields :+
      org.apache.spark.sql.types.StructField(
        ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
        org.apache.spark.sql.types.LongType, nullable = false))
    val inner = parquetReaderFactory(spark, dataSchema, innerSchema, pushed,
      forceRowBased = true)
    val idxPos = dataFields.length // the generated row-index slot
    val dataIdx = dataFields.map(_.name).zipWithIndex.toMap
    new PartitionReaderFactory {
      override def supportColumnarReads(p: InputPartition): Boolean = false
      override def createReader(p: InputPartition)
          : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
        val rp = p.asInstanceOf[RowIdFilePartition]
        val innerReader = inner.createReader(
          FilePartition(rp.index, rp.files))
        val positions = rp.positions
        val out = UnsafeProjection.create(required.fields.map { f =>
          val e: org.apache.spark.sql.catalyst.expressions.Expression =
            f.name match {
              case FileMetaCol => Literal(
                org.apache.spark.unsafe.types.UTF8String.fromString(rp.entryPath),
                org.apache.spark.sql.types.StringType)
              case PosMetaCol => BoundReference(idxPos,
                org.apache.spark.sql.types.LongType, nullable = false)
              case n => BoundReference(dataIdx(n),
                f.dataType, nullable = true)
            }
          e
        }.toIndexedSeq)
        new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean = {
            while (innerReader.next()) {
              val r = innerReader.get()
              if (positions.length == 0 ||
                  java.util.Arrays.binarySearch(positions, r.getLong(idxPos)) < 0) {
                cur = out(r)
                return true
              }
            }
            false
          }
          override def get(): InternalRow = cur
          override def close(): Unit = innerReader.close()
        }
      }
    }
  }

  /** Hadoop conf prepared for EXECUTOR-SIDE parquet writes of
    * `InternalRow`s in `schema` — the handshake Spark's own
    * `ParquetUtils.prepareWrite` performs (write-support class, row
    * schema, timestamp/legacy semantics, compression), packaged
    * driver-side so [[taskParquetWriter]] can open files inside a
    * `DeltaWriter` with byte-identical parquet semantics to the
    * driver's `df.write.parquet`. */
  def parquetWriteConf(spark: SparkSession, schema: StructType)
      : SerializableConfiguration = {
    import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
    import org.apache.spark.sql.internal.SQLConf
    val session = spark.asInstanceOf[ClassicSession]
    val sqlConf = session.sessionState.conf
    val hconf = session.sessionState.newHadoopConf()
    org.apache.parquet.hadoop.ParquetOutputFormat.setWriteSupportClass(
      new org.apache.hadoop.mapreduce.Job(hconf),
      classOf[ParquetWriteSupport])
    hconf.set(org.apache.parquet.hadoop.ParquetOutputFormat.WRITE_SUPPORT_CLASS,
      classOf[ParquetWriteSupport].getName)
    ParquetWriteSupport.setSchema(schema, hconf)
    hconf.set(SQLConf.SESSION_LOCAL_TIMEZONE.key, sqlConf.sessionLocalTimeZone)
    hconf.set(SQLConf.PARQUET_WRITE_LEGACY_FORMAT.key,
      sqlConf.writeLegacyParquetFormat.toString)
    hconf.set(SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE.key,
      sqlConf.parquetOutputTimestampType.toString)
    hconf.set(SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED.key,
      sqlConf.parquetFieldIdWriteEnabled.toString)
    hconf.set(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE.key,
      sqlConf.getConf(SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE).toString)
    hconf.set(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED.key,
      sqlConf.getConf(SQLConf.PARQUET_INFER_TIMESTAMP_NTZ_ENABLED).toString)
    hconf.set(SQLConf.CASE_SENSITIVE.key,
      sqlConf.caseSensitiveAnalysis.toString)
    hconf.set(org.apache.parquet.hadoop.ParquetOutputFormat.COMPRESSION,
      new ParquetOptions(Map.empty[String, String], sqlConf).compressionCodecClassName)
    new SerializableConfiguration(hconf)
  }

  /** Open one parquet file at `path` for [[InternalRow]]s under the
    * conf [[parquetWriteConf]] built — Spark's own
    * [[org.apache.spark.sql.execution.datasources.parquet.ParquetOutputWriter]]
    * behind a fabricated task-attempt context (the writer only reads
    * conf through it). */
  def taskParquetWriter(conf: SerializableConfiguration, path: String,
      partitionId: Int, taskId: Long)
      : org.apache.spark.sql.execution.datasources.OutputWriter = {
    import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
    import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
    val attempt = new TaskAttemptID(
      new TaskID(new JobID("graft-delta", 0), TaskType.MAP, partitionId),
      (taskId % Int.MaxValue).toInt)
    val context = new TaskAttemptContextImpl(conf.value, attempt)
    new org.apache.spark.sql.execution.datasources.parquet.ParquetOutputWriter(
      path, context)
  }

  /** [[parquetReaderFactory]] for DV-bearing snapshots: the read
    * schema is widened with parquet's row-index generator column
    * (populated by the readers themselves, row-group skipping
    * accounted for), each [[DvFilePartition]]'s listed positions are
    * dropped with a binary search per row, and a codegen'd projection
    * strips the index column — downstream sees exactly the live rows
    * in the visible schema. Row-based reads only (filtering a
    * columnar batch would mean rebuilding it); DV-bearing snapshots
    * are the post-DELETE tail of a table's life, compacted away by
    * REORG/OPTIMIZE. */
  def dvParquetReaderFactory(spark: SparkSession, dataSchema: StructType,
      readSchema: StructType, pushed: Array[Filter]): PartitionReaderFactory = {
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    // the TEMPORARY column name is the readers' trigger: a field so
    // named is generated (row-group skipping accounted for), never
    // looked up in the file
    val withIdx = StructType(readSchema.fields :+
      org.apache.spark.sql.types.StructField(
        ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME,
        org.apache.spark.sql.types.LongType, nullable = false))
    val inner = parquetReaderFactory(spark, dataSchema, withIdx, pushed,
      forceRowBased = true)
    val n = readSchema.length
    val types = readSchema.fields.map(_.dataType)
    new PartitionReaderFactory {
      override def supportColumnarReads(p: InputPartition): Boolean = false
      override def createReader(p: InputPartition)
          : org.apache.spark.sql.connector.read.PartitionReader[InternalRow] = {
        val (fp, positions) = p match {
          case d: DvFilePartition => (FilePartition(d.index, d.files), d.positions)
          case f: FilePartition   => (f, Array.empty[Long])
        }
        val innerReader = inner.createReader(fp)
        val strip = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(types.zipWithIndex.map { case (dt, i) =>
            org.apache.spark.sql.catalyst.expressions
              .BoundReference(i, dt, nullable = true)
          }.toIndexedSeq)
        new org.apache.spark.sql.connector.read.PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean = {
            while (innerReader.next()) {
              val r = innerReader.get()
              if (positions.length == 0 ||
                  java.util.Arrays.binarySearch(positions, r.getLong(n)) < 0) {
                cur = strip(r)
                return true
              }
            }
            false
          }
          override def get(): InternalRow = cur
          override def close(): Unit = innerReader.close()
        }
      }
    }
  }
}
