package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Parquet IO manager — single Spark-native path replacing the
  * reference's dual pandas/PySpark manager
  * (ascii-hydra `resources/parquet_io_manager.py:37-96`): gzip
  * parquet, overwrite semantics, optional Hive partitioning, and
  * row-count metadata on every write.
  *
  * Row counts come from Spark's write metrics (a listener on the
  * executed write), not a re-read — the reference re-reads the whole
  * output to count (`parquet_io_manager.py:58-62`), which at 100 TB
  * would double the IO of every materialization.
  */
final class ParquetIOManager(spark: SparkSession,
    compression: String = "gzip") {

  def read(path: String): DataFrame = spark.read.parquet(path)

  /** Union-schema read over a dir whose files were appended across
    * schema versions (a corpus that grew a column mid-ingest — the
    * plain-parquet twin of Delta's `schema.autoMerge`, ascii-hydra
    * `resources/spark.py:68-69`; [[TxTable.append]] is the
    * transactional path). `mergeSchema` makes the scan reconcile ALL
    * footers instead of sampling one, so old files null-backfill new
    * columns. Off by default engine-wide because footer
    * reconciliation reads every footer up front — at 100 TB that is
    * a planning-time cost you opt into per table, not a session
    * default. */
  def readMergedSchema(path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Add rows to an existing parquet dir, tolerating schema growth:
    * new columns are allowed (readers use [[readMergedSchema]]),
    * existing columns must keep their types — the same
    * evolution-not-retyping rule [[TxTable]] enforces, applied to the
    * append-only layout. */
  def append(df: DataFrame, path: String): WriteResult = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hPath)) {
      val cur = readMergedSchema(path).schema
        .fields.map(f => f.name -> f.dataType).toMap
      df.schema.fields.foreach { f =>
        cur.get(f.name).foreach(t => require(t == f.dataType,
          s"column ${f.name}: type ${f.dataType} incompatible with $t"))
      }
    }
    import org.apache.spark.sql.functions.{count, lit}
    val obs = org.apache.spark.sql.Observation()
    df.observe(obs, count(lit(1)).as("rows")).write
      .option("compression", compression)
      .mode(SaveMode.Append).parquet(path)
    WriteResult(path, obs.get("rows").asInstanceOf[Long])
  }

  /** Delimited/JSON-lines sources for interchange with external
    * producers (the parquet path above is the performance path —
    * these exist for ingest/egress edges). Schemas are explicit:
    * inference means a full extra pass at 100 TB. */
  def readCsv(path: String, schema: String, header: Boolean = true,
      delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def readJsonLines(path: String, schema: String): DataFrame =
    spark.read.schema(schema).json(path)

  /** Delimited ingest with BAD-RECORD CAPTURE — the CSV twin of
    * [[readJsonLinesWithRejects]] (same text-scan + `from_csv`
    * construction, same (good, rejects) contract). Headerless raw
    * feeds only — a header line would land in rejects by design,
    * which is also how you notice one you didn't expect. */
  def readCsvWithRejects(path: String, schema: String,
      delimiter: String = ","): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, from_csv}
    val parsed = spark.read.textFile(path).toDF("raw_line")
      .select(col("raw_line"),
        from_csv(col("raw_line"),
          org.apache.spark.sql.types.StructType.fromDDL(
            s"$schema, _corrupt_record STRING"),
          Map("mode" -> "PERMISSIVE", "sep" -> delimiter,
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("j"))
    (parsed.where(col("j._corrupt_record").isNull).select(col("j.*"))
       .drop("_corrupt_record"),
      parsed.where(col("j._corrupt_record").isNotNull).select("raw_line"))
  }

  /** JSON-lines ingest with BAD-RECORD CAPTURE — the posture a 100 TB
    * raw-ingest edge needs: a malformed line must neither kill the
    * job (FAILFAST) nor vanish silently (DROPMALFORMED). Read as text
    * and parse with `from_json` in PERMISSIVE mode: a bad line yields
    * a struct whose corrupt-record field carries the raw text, so the
    * pipeline can route rejects to a quarantine sink and count them —
    * no second pass, and no SPARK-21610 restriction (querying only
    * the corrupt column of a raw JSON scan is disallowed; a text scan
    * is not). Returns (good, rejects) derived from one scan
    * definition. */
  def readJsonLinesWithRejects(path: String, schema: String)
      : (DataFrame, DataFrame) = {
    import org.apache.spark.sql.functions.{col, from_json}
    val parsed = spark.read.textFile(path).toDF("raw_line")
      .select(col("raw_line"),
        from_json(col("raw_line"), s"$schema, _corrupt_record STRING",
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("j"))
    (parsed.where(col("j._corrupt_record").isNull).select(col("j.*"))
       .drop("_corrupt_record"),
      parsed.where(col("j._corrupt_record").isNotNull).select("raw_line"))
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): WriteResult =
    countingWrite(df, path)(_.option("header", header.toString)
      .option("compression", compression).csv(path))

  def writeJsonLines(df: DataFrame, path: String): WriteResult =
    countingWrite(df, path)(_.option("compression", compression).json(path))

  /** The one row-count-observing overwrite path every sink format
    * shares. */
  private def countingWrite(df: DataFrame, path: String)(
      sink: org.apache.spark.sql.DataFrameWriter[org.apache.spark.sql.Row] => Unit)
      : WriteResult = {
    import org.apache.spark.sql.functions.{count, lit}
    val obs = org.apache.spark.sql.Observation()
    sink(df.observe(obs, count(lit(1)).as("rows")).write
      .mode(SaveMode.Overwrite))
    WriteResult(path, obs.get("rows").asInstanceOf[Long])
  }

  /** Read a partitioned layout with pruning-friendly semantics:
    * always via basePath so partition columns survive, filters pushed
    * as partition predicates. */
  def readPartitioned(basePath: String, partitionFilters: (String, String)*): DataFrame = {
    val df = spark.read.option("basePath", basePath).parquet(basePath)
    partitionFilters.foldLeft(df) { case (d, (col, value)) =>
      if (value == "all") d else d.where(d(col) === value)
    }
  }

  /** Small-file compaction: rewrite a parquet dir into
    * ceil(bytes/target) files. Small-file floods (per-microbatch
    * streaming sinks, over-parallel writes) are the classic 100 TB
    * operational debt — NameNode/file-listing pressure and
    * footer-per-file read overhead. Sizing comes from the actual
    * on-disk bytes via the filesystem listing, not a guess.
    *
    * Swap protocol: the rewrite lands in a SIBLING temp dir (never a
    * child — a trailing-slash path must not put tmp inside the
    * source), then source → `.old`, tmp → source, delete `.old`; at
    * every crash point at least one complete copy exists, and a
    * leftover `.old`/`.tmp` dir is recoverable by hand. Refuses
    * Hive-partitioned layouts (a flat rewrite would collapse the
    * `col=` dirs and break partition pruning — compact those one
    * partition at a time). */
  def compact(path: String, targetFileBytes: Long = 128L * 1024 * 1024): WriteResult = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val partitioned = fs.listStatus(hPath)
      .exists(st => st.isDirectory && st.getPath.getName.contains("="))
    require(!partitioned,
      s"$path is Hive-partitioned: compact per-partition, not the root")
    val bytes = fs.getContentSummary(hPath).getLength
    val files = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(
      hPath.getParent, hPath.getName + "._compact_tmp")
    val old = new org.apache.hadoop.fs.Path(
      hPath.getParent, hPath.getName + "._compact_old")
    fs.delete(tmp, true); fs.delete(old, true)
    val r = write(read(hPath.toString).repartition(files), tmp.toString)
    require(fs.rename(hPath, old), s"rename $hPath -> $old failed")
    require(fs.rename(tmp, hPath), s"rename $tmp -> $hPath failed")
    fs.delete(old, true)
    WriteResult(hPath.toString, r.rowCount)
  }

  /** Crash recovery for [[compact]]'s swap protocol — every
    * interruption point leaves at least one complete copy, and this
    * makes the directory canonical again:
    *   - source + `._compact_tmp`  → crash before the swap: the source
    *     is authoritative, the (possibly incomplete) tmp is dropped;
    *   - `._compact_old` + `._compact_tmp`, no source → crash between
    *     the two renames: tmp is the COMPLETE rewrite (it was fully
    *     written before any rename) → promote tmp, drop old;
    *   - source + `._compact_old` → crash after the swap: drop old;
    *   - `._compact_old` only, no source → roll back old → source.
    * Returns the actions taken (empty = nothing to recover). */
  def recoverCompact(path: String): Seq[String] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(
      hPath.getParent, hPath.getName + "._compact_tmp")
    val old = new org.apache.hadoop.fs.Path(
      hPath.getParent, hPath.getName + "._compact_old")
    val actions = scala.collection.mutable.ArrayBuffer.empty[String]
    if (!fs.exists(hPath) && fs.exists(tmp) && fs.exists(old)) {
      require(fs.rename(tmp, hPath), s"promote $tmp -> $hPath failed")
      actions += s"promoted $tmp"
    } else if (!fs.exists(hPath) && fs.exists(old)) {
      require(fs.rename(old, hPath), s"rollback $old -> $hPath failed")
      actions += s"rolled back $old"
    }
    if (fs.exists(hPath) && fs.exists(tmp)) {
      fs.delete(tmp, true); actions += s"dropped incomplete $tmp"
    }
    if (fs.exists(hPath) && fs.exists(old)) {
      fs.delete(old, true); actions += s"dropped superseded $old"
    }
    actions.toSeq
  }

  /** Orphan-file GC for a parquet dir — the maintenance pass the
    * reference schedules via Delta vacuum (`pipes/utils.py:85-89`),
    * re-expressed for plain parquet layouts: writer debris that no
    * successful write references. Orphan classes (each deterministic,
    * never touching committed data):
    *   - `_temporary/` — a crashed Spark write attempt's staging dir
    *     (a successful commit always removes it), at any nesting
    *     depth (dynamic-partition writes stage per-partition);
    *   - interrupted [[compact]] swap state, completed via
    *     [[recoverCompact]].
    * (Checksum `.crc` shadows are managed by Hadoop's
    * ChecksumFileSystem itself — it hides them from listings and
    * drops them on rename/delete, so they are not a GC concern at
    * this layer.) Returns the paths removed. */
  def gcOrphans(path: String): Seq[String] = {
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val removed = scala.collection.mutable.ArrayBuffer.empty[String]
    removed ++= recoverCompact(path)
    def sweep(dir: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(dir).foreach { st =>
        if (st.isDirectory && st.getPath.getName == "_temporary") {
          fs.delete(st.getPath, true); removed += st.getPath.toString
        } else if (st.isDirectory) sweep(st.getPath)
      }
    if (fs.exists(hPath)) sweep(hPath)
    removed.toSeq
  }

  /** Age-based retention sweep over a Hive-partitioned layout: drop
    * every `col=value` partition with value strictly below `cutoff`
    * (values compare lexically — ISO dates/hours sort correctly).
    * The caller supplies the cutoff, not a clock: retention decisions
    * must be reproducible and testable. At 100 TB this plus
    * [[gcOrphans]] is the vacuum/retention pair Delta tables get from
    * `VACUUM`/`logRetentionDuration`. Returns dropped partitions. */
  def retentionSweep(basePath: String, partitionCol: String,
      cutoff: String): Seq[String] = {
    val hPath = new org.apache.hadoop.fs.Path(basePath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(hPath)) return Nil // nothing to retain or drop
    val prefix = partitionCol + "="
    fs.listStatus(hPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .filter(st => st.getPath.getName.stripPrefix(prefix) < cutoff)
      .map { st => fs.delete(st.getPath, true); st.getPath.toString }
  }

  /** Overwrite-write with row-count metadata. `partitionBy` uses
    * dynamic partition overwrite, pinned per-write (overrides session
    * conf) so replacing only touched partitions does not depend on
    * the caller having applied [[SparkConfPolicy]]. The count rides
    * the write as an `observe` metric — zero extra passes. */
  def write(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil): WriteResult =
    countingWrite(df, path) { w =>
      val c = w.option("compression", compression)
      (if (partitionBy.nonEmpty)
         c.partitionBy(partitionBy: _*)
           .option("partitionOverwriteMode", "dynamic")
       else c).parquet(path)
    }
}

final case class WriteResult(path: String, rowCount: Long)

/** Bucketed-table layout — the co-located-join path for repeated
  * large⋈large joins on a stable key (the 100 TB answer when neither
  * side broadcasts): both sides pre-hashed into the same bucket
  * count on the join key at WRITE time, so every subsequent join on
  * that key runs shuffle-free (SortMergeJoin directly over the
  * bucket files). Bucketing requires the table catalog
  * (`saveAsTable`), unlike the path-based IO above. */
object BucketedTables {
  import org.apache.spark.sql.{DataFrame, SaveMode}

  def write(df: DataFrame, table: String, buckets: Int,
      bucketCol: String, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // a managed table's location can outlive the in-memory catalog
    // that created it (previous JVM) — saveAsTable then refuses with
    // LOCATION_ALREADY_EXISTS; clear the orphaned husk first
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }
}
