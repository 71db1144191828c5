package graft.sources

import org.apache.spark.sql.SQLContext
import org.apache.spark.sql.graft.StreamShims
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.StructType

import graft.core.DeltaLog

/** READ-ONLY batch source over a Delta Lake table's transaction log —
  * `spark.read.format("delta-log").load(dir)` — so a user migrating
  * from the reference's Delta-on-S3A substrate can query their
  * existing tables before (or without) converting them
  * ([[graft.core.TxTable.convertFromDelta]] is the zero-copy
  * conversion; this is the zero-commitment read).
  *
  * The relation rebuilds its frame PER QUERY from the pushed filters:
  * partition-column predicates prune the live-file list before any
  * plan exists (Delta's partition pruning), partition values re-enter
  * through one broadcast (file → values) join, and every filter is
  * reported unhandled so Spark re-applies residuals above the scan —
  * correctness never depends on the pruning's coverage. Writes refuse:
  * this engine never mutates a foreign log (convert first, then the
  * graft log owns the table). */
final class DeltaLogSourceProvider extends RelationProvider
    with org.apache.spark.sql.sources.StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "delta-log"

  private def pathOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      sys.error("delta-log source requires .load(path)"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = pathOf(parameters)
    val spark = sqlContext.sparkSession
    // parse ONCE at relation creation: schema errors and unsupported
    // protocol features surface at analysis, not mid-query
    val snap = DeltaLog.snapshot(spark, path)
    StreamShims.dataFrameRelation(StructType(snap.schema.fields.map(_.copy(nullable = true)).toSeq), spark,
      filters => DeltaLog.buildDf(spark, snap, filters))
  }

  // ---- STREAMING source: tail a Delta table's commits --------------
  // `spark.readStream.format("delta-log").load(dir)` — the incremental
  // consumer a migrating user already runs against Delta (the
  // reference's asset-feeds-asset chains), without delta-spark jars:
  // batch 0 is the pinned FULL SNAPSHOT at the then-latest version
  // (deterministic crash-replay), later batches are the adds of the
  // commit window (s, e] — append-shaped only; a remove/metadata/
  // protocol/DV action in the window fails the stream with the
  // standard reset signal instead of silently skipping or rescanning.
  // Restart never rescans: the recovered offset seeds the next window
  // (the [[graft.sources.TxTableSource]] version-window discipline).

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val snap = DeltaLog.snapshot(sqlContext.sparkSession, pathOf(parameters))
    (shortName(),
      StructType(snap.schema.fields.map(_.copy(nullable = true)).toSeq))
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution.streaming.Source = {
    val spark = sqlContext.sparkSession
    val path = pathOf(parameters)
    val snap = DeltaLog.snapshot(spark, path)
    // id-mode tables stream too: every microbatch frame is built by
    // DeltaLog.buildDf, which pins the field-id scan conf on a PRIVATE
    // session — the batch's logical plan captures that session's
    // HadoopFsRelation, and a file scan resolves its hadoop conf from
    // the RELATION's session, so the conf rides the plan into the
    // stream's IncrementalExecution no matter which session runs the
    // query (spec'd over a fixture whose file column names are
    // deliberately useless — only the field ids resolve)
    new DeltaLogStreamSource(spark, path, snap,
      StructType(snap.schema.fields.map(_.copy(nullable = true)).toSeq))
  }
}

/** V1 microbatch source over a `_delta_log` (see the provider note).
  * Offsets are Delta VERSIONS: `LongOffset(v)` = "all commits ≤ v
  * consumed". The snapshot parsed at stream start supplies schema /
  * partition columns / column mapping for every window; any in-window
  * change to those REFUSES (reset signal) before a row is served. */
final class DeltaLogStreamSource(spark: org.apache.spark.sql.SparkSession,
    path: String, startSnap: graft.core.DeltaLog.DeltaSnapshot,
    override val schema: StructType)
    extends org.apache.spark.sql.execution.streaming.Source {
  import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1}
  import org.apache.spark.sql.execution.streaming.runtime.LongOffset

  private def versionOf(o: OffsetV1): Long = o match {
    case LongOffset(v) => v
    case other => other.json.toLong
  }

  override def getOffset: Option[OffsetV1] =
    DeltaLog.latestVersion(spark, path).map(LongOffset(_))

  override def getBatch(start: Option[OffsetV1], end: OffsetV1):
      org.apache.spark.sql.DataFrame = {
    val endV = versionOf(end)
    val batch = start.map(versionOf) match {
      case None =>
        // batch 0: the pinned snapshot AT the offset version — replay
        // after a crash sees the same rows whatever raced in since
        DeltaLog.buildDf(spark,
          DeltaLog.snapshot(spark, path, atVersion = Some(endV)), Nil)
      case Some(s) =>
        val adds = DeltaLog.addsInWindow(spark, startSnap, s, endV)
        DeltaLog.buildDf(spark, startSnap.copy(adds = adds), Nil)
    }
    val ordered = batch.select(
      schema.fieldNames.map(org.apache.spark.sql.functions.col).toIndexedSeq: _*)
    // a DV'd or partitioned snapshot plans as scan ⋈ broadcast joins —
    // wrap as ONE streaming leaf (the TxTableSource discipline);
    // plain scans just get their leaves flagged
    if (startSnap.adds.exists(_.dv.isDefined) ||
        startSnap.partitionCols.nonEmpty)
      StreamShims.asStreamingBatch(ordered)
    else StreamShims.markStreaming(ordered)
  }

  override def commit(end: OffsetV1): Unit = ()
  override def stop(): Unit = ()
  override def toString: String = s"DeltaLogStreamSource[$path]"
}
