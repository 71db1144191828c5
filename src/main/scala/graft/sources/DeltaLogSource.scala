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
    with DataSourceRegister {

  override def shortName(): String = "delta-log"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val path = parameters.getOrElse("path",
      sys.error("delta-log source requires .load(path)"))
    val spark = sqlContext.sparkSession
    // parse ONCE at relation creation: schema errors and unsupported
    // protocol features surface at analysis, not mid-query
    val snap = DeltaLog.snapshot(spark, path)
    StreamShims.dataFrameRelation(StructType(snap.schema.fields.map(_.copy(nullable = true)).toSeq), spark,
      filters => DeltaLog.buildDf(spark, snap, filters))
  }
}
