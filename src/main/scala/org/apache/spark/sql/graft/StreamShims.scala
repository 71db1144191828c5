package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** The one compatibility seam the TxTable streaming source needs from
  * Spark's `private[sql]` surface: a V1 [[org.apache.spark.sql.execution.streaming.Source]]'s
  * `getBatch` must hand MicroBatchExecution a DataFrame whose leaves
  * report `isStreaming = true` (the engine asserts it — "did not have
  * isStreaming=true" — before grafting the batch plan into the
  * streaming plan), but every public way to read parquet builds a
  * batch-marked `LogicalRelation`.
  *
  * This object lives under `org.apache.spark.sql` purely to reach
  * `Dataset.ofRows` — the same package-placement discipline Spark
  * connector libraries (Delta's `org.apache.spark.sql.delta`) use for
  * their V1 streaming sources. Nothing else in the repo imports from
  * here except [[graft.sources.TxTableSourceProvider]].
  */
object StreamShims {

  /** Build the BATCH relation for a TxTable snapshot / change window:
    * a real parquet `HadoopFsRelation` over the window's leaf files
    * with the commit log's schema — so `spark.read.format("txtable")`
    * keeps every parquet optimization (filter pushdown, column
    * pruning, vectorized read); the TxTable layer only decides WHICH
    * files, exactly like its DataFrame readers. */
  def batchParquetRelation(df: DataFrame): org.apache.spark.sql.sources.BaseRelation = {
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    org.apache.spark.sql.execution.datasources.DataSource(spark,
      className = "parquet",
      paths = df.inputFiles.toIndexedSeq,
      userSpecifiedSchema = Some(df.schema))
      .resolveRelation(checkFilesExist = false)
  }

  /** The same batch relation wrapped as a LOGICAL plan node — what
    * the SQL parser extension splices in for `txtable.`dir``
    * identifiers ([[graft.sources.TxSqlParser]]). */
  def batchLogicalPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    LogicalRelation(batchParquetRelation(df))

  /** Parquet relation whose file listing comes from a TRANSACTIONAL
    * MANIFEST instead of the filesystem: `files` carries the
    * commit-log-recorded statuses (no directory listing at planning
    * time — the O(1)-metadata-ops contract at 10⁶ files), and `prune`
    * applies zone-map file skipping to the scan's pushed data filters
    * before any IO. Everything downstream — split planning, filter
    * pushdown into row groups, column pruning, vectorized decode — is
    * the stock parquet source operating on the pruned list. */
  def manifestScanRelation(spark: org.apache.spark.sql.SparkSession,
      root: org.apache.hadoop.fs.Path,
      dataSchema: org.apache.spark.sql.types.StructType,
      files: Seq[org.apache.hadoop.fs.FileStatus],
      prune: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        Seq[org.apache.hadoop.fs.FileStatus],
      exactRowCount: Option[Long] = None,
      exactMinMax: Map[String, (Any, Any)] = Map.empty)
      : org.apache.spark.sql.sources.BaseRelation =
    org.apache.spark.sql.execution.datasources.HadoopFsRelation(
      new ManifestFileIndex(root, files, prune, exactRowCount, exactMinMax),
      partitionSchema = org.apache.spark.sql.types.StructType(Nil),
      // nullable like every Spark file source: schema evolution means
      // old files may lack a column the manifest schema declares NOT
      // NULL — reads null-backfill them, so claiming non-nullability
      // would let the optimizer fold IsNull checks wrongly
      dataSchema = dataSchema.asNullable,
      bucketSpec = None,
      fileFormat =
        new org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat,
      options = Map.empty)(spark)

  def relationPlan(r: org.apache.spark.sql.sources.BaseRelation)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    LogicalRelation(r)

  /** [[relationPlan]] carrying the commit log's EXACT row count as
    * CBO statistics: a V1 `BaseRelation` can only report bytes, so
    * without this a txtable relation gets no `rowCount` and joins
    * against named txtables miss CBO reorder/broadcast decisions
    * unless the user separately ANALYZEs a catalog copy. The stats
    * ride a minimal `CatalogTable` (the only stats channel
    * `LogicalRelation.computeStats` consults); manifest counts are
    * exact, not estimates — strictly better than ANALYZE output. */
  def relationPlanWithStats(r: org.apache.spark.sql.sources.BaseRelation,
      location: String, rowCount: Option[Long],
      colStats: Map[String, (String, String, Option[Long], Option[Long])] =
        Map.empty)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan = {
    val lr = LogicalRelation(r)
    rowCount match {
      case None => lr
      case Some(n) =>
        import org.apache.spark.sql.catalyst.catalog._
        val cstats = colStats.map { case (name, (mn, mx, nulls, ndv)) =>
          name -> CatalogColumnStat(
            distinctCount = ndv.map(BigInt(_)), min = Some(mn), max = Some(mx),
            nullCount = nulls.map(BigInt(_)))
        }
        val ct = CatalogTable(
          identifier = org.apache.spark.sql.catalyst.TableIdentifier(
            location, Some("txtable")),
          tableType = CatalogTableType.EXTERNAL,
          storage = CatalogStorageFormat.empty,
          schema = r.schema,
          provider = Some("txtable"),
          stats = Some(CatalogStatistics(
            sizeInBytes = BigInt(r.sizeInBytes), rowCount = Some(BigInt(n)),
            colStats = cstats)))
        lr.copy(catalogTable = Some(ct))
    }
  }

  /** The inverse seam for the SINK side: a `Sink.addBatch` frame is
    * streaming-flagged and refuses `.write`, so rewrap its planned
    * execution as a batch frame over the same `InternalRow` RDD — the
    * standard V1 sink discipline (Delta's sink does exactly this). */
  def asBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }

  /** Wrap a parsed catalyst [[org.apache.spark.sql.catalyst.expressions.Expression]]
    * as a user-facing [[org.apache.spark.sql.Column]] — what the SQL
    * DML verbs ([[graft.sources.TxSqlParser]]) need to hand a parsed
    * WHERE / SET expression to the TxTable Scala API. Resolution
    * happens when the receiving DataFrame analyzes, exactly like
    * `functions.expr`. */
  def columnOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column = ExpressionUtils.column(e)

  /** The inverse: a Column's catalyst expression — what the clause-
    * merge engine needs to rewrite source-namespace attribute
    * references before resolution. */
  def exprOf(c: org.apache.spark.sql.Column)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    ExpressionUtils.expression(c)

  /** Parse a SQL expression string to its catalyst tree NOW (the
    * `functions.expr` Column defers parsing to analysis, so its tree
    * cannot be inspected for referenced attributes). */
  def parseExpression(spark: org.apache.spark.sql.SparkSession, sql: String)
      : org.apache.spark.sql.catalyst.expressions.Expression =
    spark.asInstanceOf[ClassicSession].sessionState.sqlParser.parseExpression(sql)

  /** A DataFrame's ANALYZED plan — what a table-valued function
    * builder must return (the analyzer wraps it; handing it the
    * un-analyzed plan would re-resolve relations out of scope). */
  def analyzedPlan(df: DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** A (possibly unresolved) logical plan as a DataFrame — resolves
    * the USING side of `MERGE INTO txtable` (a view name or subquery)
    * through the session's own analyzer. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Rebind a DataFrame's ALREADY-ANALYZED plan to another session —
    * the isolation seam for operators that must pin session-wide SQL
    * confs (AQE off, co-partition rules) for the lifetime of an
    * iterative loop: the loop runs on `session` (a private
    * `newSession()` sharing the SparkContext, cache manager, and
    * catalog), so the pinning can never leak into — or be clobbered
    * by — concurrent queries on the caller's session. The analyzed
    * plan (not the raw logical one) carries already-resolved relations
    * and temp-view expansions, so nothing session-scoped needs
    * re-resolution. */
  def rebind(session: org.apache.spark.sql.SparkSession, df: DataFrame): DataFrame =
    Dataset.ofRows(session.asInstanceOf[ClassicSession], df.queryExecution.analyzed)

  /** Re-root `df`'s analyzed plan with its scan leaves marked
    * streaming. Only the leaves need the flag (`LogicalPlan.isStreaming`
    * is an any-child fold), so projections/filters/unions stacked by
    * the TxTable readers — shadow-column drops, change-feed unions,
    * `_commit_version` literals — survive untouched. Covers the two
    * leaf shapes TxTable reads produce: `LogicalRelation` (parquet
    * scans) and `LogicalRDD` (the empty-snapshot frame). */
  def markStreaming(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    val plan = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
      case r: LogicalRDD if !r.isStreaming        =>
        r.copy(isStreaming = true)(spark, None, None)
    }
    Dataset.ofRows(spark, plan)
  }

  /** A batch DataFrame as a SINGLE streaming-flagged leaf: the plan
    * executes as ordinary batch and its `InternalRow` RDD is rewrapped
    * under one streaming `LogicalRDD`. For getBatch frames whose plan
    * is NOT pure scan leaves — a deletion-vector snapshot read is a
    * parquet scan ⋈ anti-join — where [[markStreaming]] would flag
    * BOTH relations and turn the DV lookup into a stream-stream join. */
  def asStreamingBatch(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[ClassicSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }

  /** COMPLETE V1 `Filter` → `Column` translation (cf. the deliberately
    * conservative `TxTable.sourcesToCatalyst`, which extracts only
    * zone-map-usable constraints): every shape Spark pushes — including
    * Or / Not / null tests / string predicates — converts, so a V2
    * `SupportsDelete.deleteWhere` can hand the exact pushed condition
    * to the transactional delete. `None` only for shapes with no
    * Column equivalent (nested V2 predicates Spark failed to convert
    * to V1 — the caller must then reject via `canDeleteWhere`). */
  def columnOfFilter(f: org.apache.spark.sql.sources.Filter)
      : Option[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.{functions => F}
    import org.apache.spark.sql.sources
    f match {
      case sources.EqualTo(a, v)            => Some(F.col(a) === F.lit(v))
      case sources.EqualNullSafe(a, v)      => Some(F.col(a) <=> F.lit(v))
      case sources.GreaterThan(a, v)        => Some(F.col(a) > F.lit(v))
      case sources.GreaterThanOrEqual(a, v) => Some(F.col(a) >= F.lit(v))
      case sources.LessThan(a, v)           => Some(F.col(a) < F.lit(v))
      case sources.LessThanOrEqual(a, v)    => Some(F.col(a) <= F.lit(v))
      case sources.In(a, vs)                => Some(F.col(a).isin(vs.toIndexedSeq: _*))
      case sources.IsNull(a)                => Some(F.col(a).isNull)
      case sources.IsNotNull(a)             => Some(F.col(a).isNotNull)
      case sources.StringStartsWith(a, v)   => Some(F.col(a).startsWith(v))
      case sources.StringEndsWith(a, v)     => Some(F.col(a).endsWith(v))
      case sources.StringContains(a, v)     => Some(F.col(a).contains(v))
      case sources.AlwaysTrue()             => Some(F.lit(true))
      case sources.AlwaysFalse()            => Some(F.lit(false))
      case sources.And(l, r) =>
        for (lc <- columnOfFilter(l); rc <- columnOfFilter(r)) yield lc && rc
      case sources.Or(l, r) =>
        for (lc <- columnOfFilter(l); rc <- columnOfFilter(r)) yield lc || rc
      case sources.Not(c)                   => columnOfFilter(c).map(!_)
      case _                                => None
    }
  }

  /** A DataFrame exposed as a V1 [[org.apache.spark.sql.sources.BaseRelation]]
    * — the batch-format read path for snapshots that can NOT be served
    * as a bare parquet file list (deletion-vector snapshots: the live
    * rows are scan-minus-DV, a row-level anti-join no `FileIndex` can
    * express). Column pruning and the translatable pushed filters are
    * forwarded INTO the DataFrame, so parquet pushdown/pruning still
    * happen inside the inner plan; untranslatable filters are left to
    * Spark (every filter is reported unhandled — re-application above
    * the scan is harmless and keeps correctness independent of the
    * translation's coverage). */
  def dataFrameRelation(df0: DataFrame): org.apache.spark.sql.sources.BaseRelation =
    dataFrameRelation(df0.schema, df0.sparkSession, _ => df0)

  /** The filter-driven variant: `build` constructs the DataFrame PER
    * QUERY from the pushed filters, so the caller can prune its file
    * list (zone maps / blooms) before the plan exists. */
  def dataFrameRelation(relSchema: org.apache.spark.sql.types.StructType,
      session: org.apache.spark.sql.SparkSession,
      build: Seq[org.apache.spark.sql.sources.Filter] => DataFrame)
      : org.apache.spark.sql.sources.BaseRelation =
    new org.apache.spark.sql.sources.BaseRelation
      with org.apache.spark.sql.sources.PrunedFilteredScan {
    import org.apache.spark.sql.{functions => F}
    import org.apache.spark.sql.sources
    private val spark = session.asInstanceOf[ClassicSession]
    override def sqlContext: org.apache.spark.sql.SQLContext = spark.sqlContext
    override def schema: org.apache.spark.sql.types.StructType = relSchema
    override def needConversion: Boolean = false
    override def unhandledFilters(filters: Array[sources.Filter]): Array[sources.Filter] =
      filters
    private def columnOfFilter(f: sources.Filter): Option[org.apache.spark.sql.Column] =
      StreamShims.columnOfFilter(f)
    override def buildScan(requiredColumns: Array[String],
        filters: Array[sources.Filter]): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] = {
      val df0 = build(filters.toSeq)
      val filtered = filters.flatMap(columnOfFilter)
        .foldLeft(df0)((d, c) => d.where(c))
      // exactly the requested columns — an empty request (count(*))
      // must produce zero-width rows, not full ones
      val pruned = filtered.select(
        requiredColumns.toIndexedSeq.map(filtered.col): _*)
      pruned.queryExecution.toRdd
        .asInstanceOf[org.apache.spark.rdd.RDD[org.apache.spark.sql.Row]]
    }
  }
}

/** [[org.apache.spark.sql.execution.datasources.FileIndex]] over a
  * transactional manifest's file list. `listFiles` never touches the
  * filesystem — statuses were captured at commit time — and hands the
  * scan's pushed data filters to `prune` for zone-map file skipping.
  * Partitioning is empty by design: layout columns live IN the data
  * (the shadow-duplication discipline), so partition values prune as
  * ordinary per-file stats (min = max = value) through the same
  * callback, and no partition-discovery pass ever runs. */
final class ManifestFileIndex(root: org.apache.hadoop.fs.Path,
    files: Seq[org.apache.hadoop.fs.FileStatus],
    prune: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
      Seq[org.apache.hadoop.fs.FileStatus],
    /** Exact live row count from the commit log, when every entry
      * recorded one and no deletion vector hides rows — what lets an
      * optimizer rule answer a bare `count(*)` without any scan
      * ([[graft.plans.MetadataCountRule]]). */
    val exactRowCount: Option[Long] = None,
    /** Exact global (min, max) per numeric column whose stats every
      * entry carries — the zone maps ARE the answer for a bare
      * global min/max (nulls never contribute to either side, and a
      * stat-less all-null file blocks the fold). */
    val exactMinMax: Map[String, (Any, Any)] = Map.empty)
    extends org.apache.spark.sql.execution.datasources.FileIndex {
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.execution.datasources.PartitionDirectory

  override def rootPaths: Seq[org.apache.hadoop.fs.Path] = Seq(root)

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    Seq(PartitionDirectory(
      org.apache.spark.sql.catalyst.InternalRow.empty,
      prune(dataFilters).toArray))

  override def inputFiles: Array[String] =
    files.map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = files.map(_.getLen).sum

  override def partitionSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Nil)
}
