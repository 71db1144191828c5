package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.core.TxTable
import graft.sources.{TxTableSource, TxTableSourceProvider}
import graft.streaming.EventsStream

/** The TxTable Structured Streaming SOURCE: microbatch = table-version
  * window, offsets checkpointed by the engine, restart resumes from
  * the commit log without rescanning the table. */
class TxTableSourceSpec extends SparkSpec {

  private val fmt = classOf[TxTableSourceProvider].getName

  private def freshTable(name: String): (TxTable, String) = {
    val dir = EventsStream.scratchDir(name) + "/t"
    (TxTable(spark, dir), dir)
  }

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"name_$i", i * 10.0)).toDF("id", "name", "score")
  }

  /** Drain all available versions into a parquet sink; returns total
    * input rows the ENGINE reported for this run (what the source
    * actually served, not what the sink holds). */
  private def drain(dir: String, out: String,
      options: Map[String, String] = Map.empty): Long = {
    val reader = spark.readStream.format(fmt)
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(dir)
      .writeStream.format("parquet")
      .option("path", s"$out/rows")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.map(_.numInputRows).sum
  }

  test("initial snapshot, then restart consumes ONLY the appended versions") {
    val (t, dir) = freshTable("txsrc_resume")
    t.overwrite(df(0 until 10))  // v0
    t.append(df(10 until 15))    // v1
    val out = EventsStream.scratchDir("txsrc_resume_out")
    assert(drain(dir, out) == 15, "batch 0 = full snapshot at latest version")
    // no new commits: a re-run with the same checkpoint moves nothing
    assert(drain(dir, out) == 0)
    t.append(df(15 until 18))    // v2
    t.append(df(18 until 20))    // v3
    // restart: the offset log resumes at v1 — the two new versions'
    // files are read, the 15 already-consumed rows are NOT rescanned
    assert(drain(dir, out) == 5)
    val sunk = spark.read.parquet(s"$out/rows")
    assert(sunk.count() == 20)
    assert(sunk.select(sum("id")).head.getLong(0) == (0 until 20).sum)
  }

  test("sinceVersion skips the snapshot; maxVersionsPerTrigger bounds each batch") {
    val (t, dir) = freshTable("txsrc_since")
    t.overwrite(df(0 until 100)) // v0: NOT served
    (1 to 4).foreach(k => t.append(df(100 * k until 100 * k + 10))) // v1..v4
    val out = EventsStream.scratchDir("txsrc_since_out")
    val reader = spark.readStream.format(fmt)
      .option(TxTableSource.OptSinceVersion, "0")
      .option(TxTableSource.OptMaxVersions, "1")
    val q = reader.load(dir)
      .writeStream.format("parquet")
      .option("path", s"$out/rows")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val progress = q.recentProgress.filter(_.numInputRows > 0)
    assert(progress.map(_.numInputRows).sum == 40, "appends after v0 only")
    assert(progress.length == 4, "one version per microbatch under the cap")
    assert(spark.read.parquet(s"$out/rows").count() == 40)
  }

  test("restart with sinceVersion + rate cap resumes FROM THE CHECKPOINT, not sinceVersion") {
    val (t, dir) = freshTable("txsrc_restart_cap")
    t.overwrite(df(0 until 5))                                   // v0
    (1 to 3).foreach(k => t.append(df(10 * k until 10 * k + 2))) // v1..v3
    val out = EventsStream.scratchDir("txsrc_restart_cap_out")
    val opts = Map(TxTableSource.OptSinceVersion -> "0",
      TxTableSource.OptMaxVersions -> "1")
    assert(drain(dir, out, opts) == 6)
    t.append(df(100 until 103))                                  // v4
    t.append(df(200 until 202))                                  // v5
    // a fresh source instance has no in-memory state: the engine's
    // start offset must outrank sinceVersion, or rate-limiting would
    // plan an offset behind the checkpoint and the stream would stall
    assert(drain(dir, out, opts) == 5, "restart must serve exactly v4..v5")
    assert(spark.read.parquet(s"$out/rows").count() == 11)
  }

  test("append-mode stream fails with the reset signal on a rewrite") {
    import spark.implicits._
    val (t, dir) = freshTable("txsrc_reset")
    t.overwriteBucketed(df(0 until 10), Seq("id"), nBuckets = 2) // v0
    t.append(df(10 until 12))                                    // v1
    val out = EventsStream.scratchDir("txsrc_reset_out")
    assert(drain(dir, out, Map(TxTableSource.OptSinceVersion -> "0")) == 2)
    t.deleteKeys(Seq(3L).toDF("id"))                             // v2: rewrite
    val e = intercept[StreamingQueryException] {
      drain(dir, out, Map(TxTableSource.OptSinceVersion -> "0"))
    }
    assert(e.getMessage.contains("reset the change-feed consumer"))
  }

  test("changeFeed mode streams row-level changes across a merge") {
    import spark.implicits._
    val (_, dir) = freshTable("txsrc_cdf")
    val t = TxTable(spark, dir, changeDataFeed = true)
    t.overwriteBucketed(df(0 until 10), Seq("id"), nBuckets = 2) // v0
    t.append(df(10 until 12))                                    // v1
    t.upsert(Seq((0L, "name_0", 999.0)).toDF("id", "name", "score")) // v2
    t.deleteKeys(Seq(5L).toDF("id"))                             // v3
    val out = EventsStream.scratchDir("txsrc_cdf_out")
    val q = spark.readStream.format(fmt)
      .option(TxTableSource.OptSinceVersion, "0")
      .option(TxTableSource.OptChangeFeed, "true")
      .load(dir)
      .writeStream.format("parquet")
      .option("path", s"$out/rows")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val sunk = spark.read.parquet(s"$out/rows")
    // v1: 2 inserts; v2: pre+post image of id 0; v3: delete of id 5
    assert(sunk.count() == 5)
    val byType = sunk.groupBy(TxTable.ChangeTypeCol).count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("insert" -> 2L, "update_preimage" -> 1L,
      "update_postimage" -> 1L, "delete" -> 1L))
    assert(sunk.where(col(TxTable.ChangeTypeCol) === "update_postimage")
      .select("score").as[Double].head() == 999.0)
    assert(sunk.where(col(TxTable.ChangeTypeCol) === "delete")
      .select("id").as[Long].head() == 5L)
  }

  test("changeFeed without sinceVersion: initial snapshot as inserts, then CDC") {
    import spark.implicits._
    val (_, dir) = freshTable("txsrc_cdf_snap")
    val t = TxTable(spark, dir, changeDataFeed = true)
    t.overwriteBucketed(df(0 until 10), Seq("id"), nBuckets = 2) // v0
    t.append(df(10 until 12))                                    // v1
    val out = EventsStream.scratchDir("txsrc_cdf_snap_out")
    def run(): Unit = {
      val q = spark.readStream.format(fmt)
        .option(TxTableSource.OptChangeFeed, "true")
        .load(dir)
        .writeStream.format("parquet")
        .option("path", s"$out/rows")
        .option("checkpointLocation", s"$out/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    val snap = spark.read.parquet(s"$out/rows")
    // batch 0: the FULL snapshot at v1, every row an insert AT v1
    assert(snap.count() == 12)
    assert(snap.groupBy(TxTable.ChangeTypeCol).count()
      .as[(String, Long)].collect().toMap == Map("insert" -> 12L))
    assert(snap.select(TxTable.CommitVersionCol).distinct()
      .as[Long].collect().toSeq == Seq(1L))
    // later commits stream as ROW-LEVEL changes on the next run
    t.upsert(Seq((0L, "name_0", 999.0)).toDF("id", "name", "score")) // v2
    t.deleteKeys(Seq(5L).toDF("id"))                                 // v3
    run()
    val all = spark.read.parquet(s"$out/rows")
    val byType = all.groupBy(TxTable.ChangeTypeCol).count()
      .as[(String, Long)].collect().toMap
    assert(byType == Map("insert" -> 12L, "update_preimage" -> 1L,
      "update_postimage" -> 1L, "delete" -> 1L), s"got $byType")
    // snapshot ⊕ changes reconstructs the live table exactly
    val reconstructed = all
      .where(col(TxTable.ChangeTypeCol).isin("insert", "update_postimage"))
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("id")
          .orderBy(col(TxTable.CommitVersionCol).desc)))
      .where(col("rk") === 1).drop("rk")
      .join(all.where(col(TxTable.ChangeTypeCol) === "delete")
        .select("id"), Seq("id"), "left_anti")
      .select("id", "name", "score")
    assert(reconstructed.exceptAll(t.read()).isEmpty &&
      t.read().exceptAll(reconstructed).isEmpty,
      "snapshot + CDC must reconstruct the live table")
  }

  test("batch read: default latest, versionAsOf time travel, sinceVersion window") {
    val (t, dir) = freshTable("txsrc_batch")
    t.overwrite(df(0 until 10))   // v0
    t.append(df(10 until 15))     // v1
    t.overwrite(df(100 until 103)) // v2
    val latest = spark.read.format(fmt).load(dir)
    assert(latest.count() == 3)
    val v1 = spark.read.format(fmt)
      .option(TxTableSource.OptVersionAsOf, "1").load(dir)
    assert(v1.count() == 15)
    assert(v1.agg(max("id")).head.getLong(0) == 14)
    val changes = spark.read.format("txtable")
      .option(TxTableSource.OptSinceVersion, "0")
      .option(TxTableSource.OptVersionAsOf, "1")
    intercept[Exception](changes.load(dir)) // exclusive options
  }

  test("batch read over bucketed and partitioned layouts: plumbing columns never leak") {
    import spark.implicits._
    val (tb, dirB) = freshTable("txsrc_batch_bucketed")
    tb.overwriteBucketed(df(0 until 50), Seq("id"), nBuckets = 4)
    tb.upsert(Seq((0L, "name_0", 999.0)).toDF("id", "name", "score"))
    val b = spark.read.format(fmt).load(dirB)
    assert(b.columns.toSeq == Seq("id", "name", "score"))
    assert(b.count() == 50)
    assert(b.where(col("id") === 0).select("score").as[Double].head() == 999.0)
    val (tp, dirP) = freshTable("txsrc_batch_part")
    tp.overwrite((0 until 30).map(i => (i.toLong, s"p${i % 3}", i * 1.0))
      .toDF("id", "part", "value"), partitionBy = Seq("part"))
    val p = spark.read.format(fmt).load(dirP)
    assert(p.columns.toSeq == Seq("id", "part", "value"))
    assert(p.where(col("part") === "p1").count() == 10)
  }

  test("timestamp time travel: versionAt, reader option, SQL TIMESTAMP AS OF") {
    val (t, dir) = freshTable("txsrc_ts")
    t.overwrite(df(0 until 5))  // v0
    Thread.sleep(30)
    val between = System.currentTimeMillis()
    Thread.sleep(30)
    t.append(df(5 until 8))     // v1
    assert(t.versionAt(between).contains(0L))
    assert(t.versionAt(System.currentTimeMillis()).contains(1L))
    assert(t.versionAt(0L).isEmpty, "before the oldest retained commit")
    assert(t.readTimestamp(between).count() == 5)
    val viaOpt = spark.read.format(fmt)
      .option(TxTableSource.OptTimestampAsOf, between.toString).load(dir)
    assert(viaOpt.count() == 5)
    val ts = new java.sql.Timestamp(between).toString
    val viaSql = spark.sql(
      s"SELECT count(*) AS n FROM txtable.`$dir` TIMESTAMP AS OF '$ts'")
    assert(viaSql.head.getLong(0) == 5)
    val e = intercept[Exception](t.readTimestamp(0L))
    assert(e.getMessage.contains("expired history"))
  }

  test("batch write surface: SaveModes map onto the commit log") {
    import spark.implicits._
    val dir = EventsStream.scratchDir("txsrc_write") + "/t"
    df(0 until 10).write.format(fmt).save(dir)            // default ErrorIfExists
    val t = TxTable(spark, dir)
    assert(t.read().count() == 10)
    intercept[Exception](df(0 until 2).write.format(fmt).save(dir))
    df(10 until 15).write.format(fmt).mode("append").save(dir)
    assert(t.read().count() == 15 && t.versions == Seq(0L, 1L))
    df(100 until 102).write.format(fmt).mode("ignore").save(dir)
    assert(t.read().count() == 15, "Ignore on an existing table is a no-op")
    df(100 until 102).write.format(fmt).mode("overwrite").save(dir)
    assert(t.read().count() == 2)
    assert(t.readVersion(1).count() == 15, "old snapshots stay time-travelable")
    // bucketed overwrite through options enables upserts
    val bdir = EventsStream.scratchDir("txsrc_write_b") + "/t"
    df(0 until 20).write.format(fmt)
      .option(TxTableSource.OptBucketBy, "id")
      .option(TxTableSource.OptBuckets, "4").save(bdir)
    val tb = TxTable(spark, bdir)
    tb.upsert(Seq((0L, "name_0", 999.0)).toDF("id", "name", "score"))
    assert(tb.read().where($"id" === 0).select("score").as[Double].head() == 999.0)
  }

  test("streaming sink: writeStream.format('txtable') commits exactly-once") {
    import spark.implicits._
    val src = EventsStream.scratchDir("txsrc_sink_src")
    df(0 until 12).repartition(4).write.parquet(s"$src/files")
    val dir = EventsStream.scratchDir("txsrc_sink") + "/t"
    val ckpt = EventsStream.scratchDir("txsrc_sink_ckpt")
    def run(): Unit = {
      val q = spark.readStream
        .schema("id LONG, name STRING, score DOUBLE")
        .option("maxFilesPerTrigger", 2)
        .parquet(s"$src/files")
        .writeStream.format("txtable")
        .option("path", dir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    run()
    val t = TxTable(spark, dir)
    assert(t.read().count() == 12)
    val versions = t.versions.size
    assert(versions == 2, s"2 microbatches of 2 files over 4 files, got $versions")
    // re-run with the same checkpoint: no new data, no new commits
    run()
    assert(t.versions.size == versions && t.read().count() == 12)
    // and the sink round-trips through the SOURCE: end-to-end pipeline
    val out = spark.read.format(fmt).load(dir)
    assert(out.select(sum("id")).head.getLong(0) == (0 until 12).sum)
  }

  test("streaming sink Update mode: per-batch MERGE keeps latest state per key") {
    import spark.implicits._
    val src = EventsStream.scratchDir("txsrc_upd_src")
    // 4 files arriving 1 per trigger; later files revise earlier keys
    (0 until 4).foreach { f =>
      (0 until 6).map(k => (k.toLong, f.toLong, (f * 10 + k).toDouble))
        .toDF("key", "round", "value")
        .repartition(1).write.parquet(s"$src/files/f$f")
    }
    val dir = EventsStream.scratchDir("txsrc_upd") + "/t"
    val q = spark.readStream
      .schema("key LONG, round LONG, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$src/files/*")
      .groupBy("key").agg(max(struct($"round", $"value")).as("m"))
      .select($"key", $"m.round".as("round"), $"m.value".as("value"))
      .writeStream.format("txtable")
      .outputMode("update")
      .partitionBy("key")
      .option("path", dir)
      .option("checkpointLocation", EventsStream.scratchDir("txsrc_upd_ckpt"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val t = TxTable(spark, dir)
    val state = t.read()
    assert(state.count() == 6, "one row per key after merges")
    assert(state.where($"round" =!= 3).count() == 0,
      "every key must carry the LAST revision")
    assert(state.select(sum("value")).head.getDouble(0) ==
      (0 until 6).map(k => 30.0 + k).sum)
    assert(t.versions.size >= 2, "later batches merged, not overwrote")
  }

  test("batch read keeps parquet pushdown: filters reach the scan") {
    val (t, dir) = freshTable("txsrc_pushdown")
    t.overwrite(df(0 until 100))
    val q = spark.read.format(fmt).load(dir)
      .where(col("id") > 90).select("id", "score")
    assert(q.count() == 9)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)]"),
      s"filter did not reach the parquet scan:\n$physical")
    assert(physical.contains("ReadSchema: struct<id:bigint,score:double>"),
      s"column pruning did not reach the scan:\n$physical")
  }

  /** Files the executed plan's parquet scan ACTUALLY selected (the
    * post-pruning listing), unwrapping AQE. Run the frame first. */
  private def filesScanned(q: DataFrame): Long = {
    q.collect()
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
        : org.apache.spark.sql.execution.SparkPlan = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    val scans = unwrap(q.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty, "no parquet scan in the plan")
    scans.map(_.metrics("numFiles").value).sum
  }

  test("DESCRIBE DETAIL summarizes location, version, files, DV rows, " +
      "layout, and properties") {
    import spark.implicits._
    val (t, dir) = freshTable("txsql_detail")
    t.overwriteBucketed(df(0 until 100), bucketCols = Seq("id"), nBuckets = 4)
    val t2 = graft.core.TxTable(spark, dir, deletionVectors = true)
    t2.setProperties(Map("team" -> "ingest"))
    t2.deleteWhere(col("id") < 10L)
    val d = spark.sql(s"DESCRIBE DETAIL txtable.`$dir`").head()
    assert(d.getString(0) == dir)
    assert(d.getLong(1) == t.versions.last)
    assert(d.getLong(2) == t.fileEntries(t.versions.last).size.toLong)
    assert(d.getLong(3) > 0, "size_bytes from the manifest")
    assert(d.getLong(4) == 10L, "vectored rows surface")
    assert(d.getString(5) == "id")
    assert(d.getString(6).contains("team=ingest"))
  }

  test("bloom filters skip equality probes on shuffled layouts where " +
      "zone maps cannot") {
    import spark.implicits._
    import graft.core.TxTable
    val (t, dir) = freshTable("txsrc_bloom")
    // hash-shuffled ingest: every file's [min,max] spans the whole id
    // domain, so range stats prune NOTHING on an equality probe
    val data = (0 until 4000).map(i => (i.toLong, i * 1.0))
      .toDF("id", "score").repartition(8)
    t.overwrite(data)
    val noBloom = spark.read.format(fmt).load(dir)
      .where(col("id") === 1234L)
    assert(noBloom.count() == 1)
    assert(filesScanned(noBloom) == 8,
      "without blooms the shuffled layout defeats zone maps")
    // designate the column, rewrite: the compaction pass builds the
    // per-file filters (small target bytes keep several files)
    t.setProperties(Map(TxTable.PropBloomColumns -> "id"))
    t.compact(targetFileBytes = 8192)
    val nFiles = t.fileEntries(t.versions.last).size
    assert(nFiles >= 4, s"compact should leave several files, got $nFiles")
    assert(t.fileEntries(t.versions.last).forall(_.bloom.contains("id")))
    val probe = spark.read.format(fmt).load(dir).where(col("id") === 1234L)
    assert(probe.count() == 1)
    assert(filesScanned(probe) <= 2,
      s"bloom must isolate the probe to ~1 of $nFiles files")
    // absent key: typically zero files touched, always zero rows
    val miss = spark.read.format(fmt).load(dir).where(col("id") === 999999L)
    assert(miss.count() == 0)
    assert(filesScanned(miss) <= 1)
    // SQL seam goes through the same candidate filter
    val sqlProbe = spark.sql(
      s"SELECT count(*) AS n FROM txtable.`$dir` WHERE id = 2000")
    assert(sqlProbe.head.getLong(0) == 1)
    // IN-list probes skip through the same filters (both the In and
    // the optimizer's InSet shape — a long list converts)
    val inProbe = spark.read.format(fmt).load(dir)
      .where(col("id").isin(10L, 2000L, 3999L))
    assert(inProbe.count() == 3)
    assert(filesScanned(inProbe) <= 4,
      "a 3-value IN should touch at most value-count + FP files")
    val inMiss = spark.read.format(fmt).load(dir)
      .where(col("id").isin((100000L until 100040L): _*))
    assert(inMiss.count() == 0)
    assert(filesScanned(inMiss) <= 1, "an all-absent IN list skips everything")
    // correctness unharmed: full scan still serves everything
    assert(spark.read.format(fmt).load(dir).count() == 4000)
    // predicate DML planning shares the candidate test: a MoR-style
    // delete of one key only discovers in bloom-kept files
    t.deleteWhere(col("id") === 1234L)
    assert(spark.read.format(fmt).load(dir).count() == 3999)
    // the DV snapshot's per-query relation still file-prunes: the
    // pushed equality translates back to a catalyst constraint and
    // the bloom isolates the probe before the anti-join plan exists
    val tblSchema = new org.apache.spark.sql.types.StructType()
      .add("id", org.apache.spark.sql.types.LongType)
      .add("score", org.apache.spark.sql.types.DoubleType)
    val exprs = t.sourcesToCatalyst(tblSchema,
      Seq(org.apache.spark.sql.sources.EqualTo("id", 2000L)))
    assert(exprs.size == 1)
    val kept = t.fileEntries(t.versions.last)
      .filter(t.candidateFilter(tblSchema, exprs))
    assert(kept.size <= 2,
      s"bloom pruning must survive the DV snapshot — kept ${kept.size}")
    // and the DV-relation read stays correct under pushed filters
    val dvProbe = spark.read.format(fmt).load(dir)
      .where(col("id") === 2000L)
    assert(dvProbe.count() == 1)
    assert(spark.read.format(fmt).load(dir)
      .where(col("id").isin(10L, 1234L, 2000L)).count() == 2,
      "the vectored row stays deleted through the pruned relation")
  }

  test("format and SQL reads skip files via manifest zone maps; " +
      "statuses ride the commit log") {
    val (t, dir) = freshTable("txsrc_skip")
    // four commits, one file each, disjoint id ranges: deterministic
    // per-file [min,max]
    t.overwrite(df(0 until 1000).coalesce(1))
    t.append(df(1000 until 2000).coalesce(1))
    t.append(df(2000 until 3000).coalesce(1))
    t.append(df(3000 until 4000).coalesce(1))
    // commit-time statuses: size/mtime recorded per entry, matching disk
    val entries = t.fileEntries(3)
    assert(entries.size == 4)
    entries.foreach { e =>
      val f = new java.io.File(s"$dir/${e.path}")
      assert(e.bytes == f.length(), s"${e.path}: manifest bytes ${e.bytes}")
      assert(e.mtimeMs == f.lastModified(), s"${e.path}: manifest mtime")
    }
    // format read: an interior range touches exactly one file of four
    val one = spark.read.format(fmt).load(dir)
      .where(col("id") >= 1200L && col("id") <= 1300L)
    assert(filesScanned(one) == 1, "zone maps must isolate the one file")
    assert(one.count() == 101)
    // SQL seam: an open range touches the two top files
    val two = spark.sql(s"SELECT id, score FROM txtable.`$dir` WHERE id >= 2500")
    assert(filesScanned(two) == 2)
    assert(two.count() == 1500)
    // unconstrained read scans everything — pruning never drops files
    // a predicate didn't exclude
    assert(filesScanned(spark.read.format(fmt).load(dir)) == 4)
    // a non-extractable predicate keeps all files but stays correct
    val odd = spark.sql(
      s"SELECT count(*) AS n FROM txtable.`$dir` WHERE id % 2 = 1")
    assert(odd.head().getLong(0) == 2000L)
  }

  test("manifest-planned scans work on bucketed, partitioned, and " +
      "legacy (no recorded sizes) tables") {
    import spark.implicits._
    // bucketed: __bucket stays internal, skipping still applies
    val (tb, bdir) = freshTable("txsrc_skip_bkt")
    tb.overwriteBucketed(df(0 until 100), bucketCols = Seq("id"), nBuckets = 4)
    val b = spark.read.format(fmt).load(bdir)
    assert(!b.columns.contains("__bucket"))
    assert(b.count() == 100)
    // partitioned: the layout column is a data column with
    // min = max = value stats, so equality on it prunes to the
    // partition's files through the SAME zone-map path
    val (tp, pdir) = freshTable("txsrc_skip_part")
    tp.overwrite((0 until 90).map(i =>
        (i.toLong, Seq("click", "view", "purchase")(i % 3), i * 1.0))
      .toDF("id", "event_type", "value").coalesce(1),
      partitionBy = Seq("event_type"))
    val clicks = spark.read.format(fmt).load(pdir)
      .where(col("event_type") === "click")
    assert(filesScanned(clicks) == 1, "partition-value stats must prune")
    assert(clicks.count() == 30)
    // legacy manifests (entries without bytes/mtime): the reader falls
    // back to getFileStatus per file — copy the table, strip the
    // recorded sizes out of every log JSON, read through the format
    val (tl, ldir) = freshTable("txsrc_skip_legacy")
    tl.overwrite(df(0 until 50).coalesce(1))
    tl.append(df(50 until 60).coalesce(1))
    val legacyDir = EventsStream.scratchDir("txsrc_skip_legacy_copy") + "/t"
    def copyAll(src: java.io.File, dst: java.io.File): Unit = {
      if (src.isDirectory) {
        dst.mkdirs()
        src.listFiles().foreach(c => copyAll(c, new java.io.File(dst, c.getName)))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath)
    }
    copyAll(new java.io.File(ldir), new java.io.File(legacyDir))
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    // hadoop's LocalFileSystem wrote .crc sidecars alongside the log
    // JSONs — they'd fail the checksum after the edit below
    walk(new java.io.File(legacyDir)).filter(_.getName.endsWith(".crc"))
      .foreach(_.delete())
    walk(new java.io.File(legacyDir)).filter(_.getName.endsWith(".json"))
      .foreach { f =>
        val stripped = scala.io.Source.fromFile(f).getLines()
          .filterNot(l => l.contains("\"bytes\"") || l.contains("\"mtime\""))
          .mkString("\n")
        java.nio.file.Files.writeString(f.toPath, stripped)
      }
    val legacy = spark.read.format(fmt).load(legacyDir)
    assert(legacy.count() == 60)
    assert(legacy.select(sum("id")).head.getLong(0) == (0 until 60).sum)
  }

  test("SQL entry point: SELECT ... FROM txtable.`dir` [VERSION AS OF n]") {
    val (t, dir) = freshTable("txsrc_sql")
    t.overwrite(df(0 until 20))  // v0
    t.append(df(20 until 25))    // v1
    t.overwrite(df(0 until 3))   // v2
    val out = spark.sql(
      s"SELECT count(*) AS n, sum(id) AS s FROM txtable.`$dir` WHERE id >= 1")
    assert(out.head() == org.apache.spark.sql.Row(2L, 3L))
    val tt = spark.sql(
      s"SELECT count(*) AS n FROM txtable.`$dir` VERSION AS OF 1")
    assert(tt.head().getLong(0) == 25L)
    // joins against ordinary relations work — it's a plain relation
    import spark.implicits._
    Seq((1L, "x"), (2L, "y")).toDF("id", "tag").createOrReplaceTempView("tags")
    val j = spark.sql(
      s"SELECT t.id, g.tag FROM txtable.`$dir` t JOIN tags g USING (id) ORDER BY id")
    assert(j.count() == 2)
    // INSERT routes onto the commit log (by-position append commit)
    val ins = spark.sql(s"INSERT INTO txtable.`$dir` VALUES (9, 'x', 1.0)")
    assert(ins.head().getString(0) == "append")
    assert(spark.sql(s"SELECT count(*) AS n FROM txtable.`$dir`")
      .head().getLong(0) == 4L)
    // the audit verb: newest commit first
    val h = spark.sql(s"DESCRIBE HISTORY txtable.`$dir`")
    assert(h.columns.toSeq == Seq("version", "operation", "n_files",
      "added_files", "added_bytes"))
    // per-commit write cost from the delta: the one-row INSERT (v3)
    // added exactly its own file, never the table's listing
    assert(h.where(col("version") === 3)
      .select("added_files").head.getInt(0) == 1)
    assert(h.select(min("added_bytes")).head.getLong(0) > 0)
    assert(h.select("version", "operation").as[(Long, String)].collect().toSeq
      .take(4) == Seq((3L, "append"), (2L, "overwrite"), (1L, "append"),
        (0L, "overwrite")))
  }

  test("SQL DML verbs: DELETE / UPDATE / MERGE INTO route onto the commit log") {
    import spark.implicits._
    val (t, dir) = freshTable("txsql_dml")
    t.overwriteBucketed(df(0 until 100), bucketCols = Seq("id"), nBuckets = 8)
    // DELETE FROM ... WHERE — one-row result with the committed version
    val del = spark.sql(s"DELETE FROM txtable.`$dir` WHERE id >= 90")
    assert(del.columns.toSeq == Seq("operation", "version"))
    assert(del.head() == org.apache.spark.sql.Row("delete", 1L))
    assert(t.read().count() == 90)
    // UPDATE ... SET (expression RHS, multiple columns) ... WHERE
    spark.sql(
      s"UPDATE txtable.`$dir` SET score = score * 2, name = 'X' WHERE id < 3")
    val r = t.read().where(col("id") === 2L).head()
    assert(r.getString(1) == "X" && r.getDouble(2) == 40.0)
    assert(t.read().where(col("name") === "X").count() == 3)
    // MERGE INTO canonical upsert via a temp view source
    df(95 until 105).withColumn("name", lit("M"))
      .createOrReplaceTempView("mergesrc")
    spark.sql(
      s"""MERGE INTO txtable.`$dir` t USING mergesrc s ON t.id = s.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(t.read().count() == 100) // 90 + 10 (95..99 were deleted above)
    assert(t.read().where(col("name") === "M").count() == 10)
    // full clause grammar: conditional DELETE + arithmetic UPDATE +
    // explicit-assignment INSERT in one statement
    df(98 until 108).withColumn("kill", col("id") % 2 === 0)
      .createOrReplaceTempView("clausesrc")
    spark.sql(
      s"""MERGE INTO txtable.`$dir` t USING clausesrc s ON t.id = s.id
         |WHEN MATCHED AND s.kill THEN DELETE
         |WHEN MATCHED THEN UPDATE SET score = t.score + s.score
         |WHEN NOT MATCHED AND NOT s.kill THEN
         |  INSERT (id, name, score) VALUES (s.id, 'C', s.score * 10)""".stripMargin)
    // matched 98..104 (7 rows): evens 98,100,102,104 delete; odds
    // 99,101,103 double their score; unmatched 105..107: odds 105,107
    // insert as 'C', 106 filtered by the insert condition
    assert(t.read().where(col("id").isin(98L, 100L, 102L, 104L)).count() == 0)
    assert(t.read().where(col("id") === 99L).head.getDouble(2) ==
      99 * 10.0 * 2)
    assert(t.read().where(col("name") === "C").count() == 2)
    assert(t.read().where(col("id") === 106L).count() == 0)
    assert(t.read().where(col("id") === 105L).head.getDouble(2) ==
      105 * 10.0 * 10)
    // WHEN NOT MATCHED BY SOURCE prunes rows absent from the source
    spark.sql(
      s"""MERGE INTO txtable.`$dir` t USING clausesrc s ON t.id = s.id
         |WHEN NOT MATCHED BY SOURCE AND t.id < 5 THEN DELETE""".stripMargin)
    assert(t.read().where(col("id") < 5L).count() == 0)
    assert(t.read().where(col("id") === 10L).count() == 1)
    // ON not covering the bucket keys still refuses
    val badKeys = intercept[Exception](spark.sql(
      s"""MERGE INTO txtable.`$dir` t USING mergesrc s ON t.name = s.name
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(badKeys.getMessage.contains("bucket key"))
    // non-txtable DML still parses to Spark's own plan (and fails
    // resolution the standard way, not through our seam)
    intercept[Exception](spark.sql("DELETE FROM nosuch_table WHERE 1=1"))
  }

  test("SQL maintenance verbs: OPTIMIZE [ZORDER BY] / VACUUM / RESTORE") {
    val (t, dir) = freshTable("txsql_maint")
    t.overwrite(df(0 until 50).repartition(6))            // v0, many files
    t.overwrite(df(0 until 40).repartition(6))            // v1
    // OPTIMIZE = compact commit
    val opt = spark.sql(s"OPTIMIZE txtable.`$dir`")
    assert(opt.head() == org.apache.spark.sql.Row("optimize", 2L))
    assert(t.history().last._2 == "compact")
    assert(t.read().count() == 40)
    // OPTIMIZE ZORDER BY = clustering rewrite
    spark.sql(s"OPTIMIZE txtable.`$dir` ZORDER BY (id, score)")
    assert(t.history().last._2 == "compact")
    assert(t.read().count() == 40)
    // RESTORE ... VERSION AS OF rewinds content as a new commit
    val res = spark.sql(s"RESTORE TABLE txtable.`$dir` TO VERSION AS OF 0")
    assert(res.columns.toSeq == Seq("operation", "version"))
    assert(t.read().count() == 50)
    assert(t.history().last._2 == "restore")
    // EXPIRE SNAPSHOTS ... KEEP 1 drops every older log entry
    val nBefore = t.history().length
    val exp = spark.sql(s"EXPIRE SNAPSHOTS txtable.`$dir` KEEP 1")
    assert(exp.columns.toSeq ==
      Seq("location", "versions_expired", "oldest", "newest"))
    assert(exp.head().getLong(1) == nBefore - 1,
      "all but the latest version expire")
    assert(t.history().length == 1)
    // VACUUM RETAIN 0 HOURS sweeps the expired versions' files
    val vac = spark.sql(s"VACUUM txtable.`$dir` RETAIN 0 HOURS")
    assert(vac.columns.toSeq == Seq("location", "files_deleted"))
    assert(vac.head().getLong(1) > 0L)
    assert(t.read().count() == 50, "restored snapshot intact after vacuum")
  }

  test("short name 'txtable' resolves through DataSourceRegister") {
    val (t, dir) = freshTable("txsrc_short")
    t.overwrite(df(0 until 4))
    val out = EventsStream.scratchDir("txsrc_short_out")
    val q = spark.readStream.format("txtable").load(dir)
      .writeStream.format("parquet")
      .option("path", s"$out/rows")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.read.parquet(s"$out/rows").count() == 4)
  }

  test("SQL INSERT INTO: by-position, column-list with NULL fill, OVERWRITE, guards") {
    import spark.implicits._
    val (t, dir) = freshTable("txsql_insert")
    t.overwrite(df(0 until 5))
    // by position: columns align to the table schema in order
    spark.sql(s"INSERT INTO txtable.`$dir` SELECT 100, 'hundred', 5.5")
    assert(t.read().count() == 6)
    assert(t.read().where($"id" === 100L).head.getAs[String]("name") == "hundred")
    // column list: named columns assign, the rest NULL-fill
    spark.sql(s"INSERT INTO txtable.`$dir` (id, score) VALUES (200, 7.5)")
    val r200 = t.read().where($"id" === 200L).head
    assert(r200.getAs[Double]("score") == 7.5 && r200.isNullAt(1))
    // arity mismatch refuses loudly
    val bad = intercept[Exception](
      spark.sql(s"INSERT INTO txtable.`$dir` VALUES (1, 'x')"))
    assert(bad.getMessage.contains("by position"))
    // INSERT OVERWRITE replaces the snapshot; history stays
    spark.sql(s"INSERT OVERWRITE txtable.`$dir` SELECT 1, 'only', 0.0")
    assert(t.read().count() == 1)
    assert(t.readVersion(t.latestVersion.get - 1).count() == 7)
  }

  test("SQL INSERT OVERWRITE preserves a hive-partitioned layout") {
    import spark.implicits._
    val (t, dir) = freshTable("txsql_insover_pt")
    t.overwrite((0 until 20).map(i => (s"p${i % 2}", i.toLong)).toDF("pt", "v"),
      partitionBy = Seq("pt"))
    spark.sql(s"INSERT OVERWRITE txtable.`$dir` SELECT 'p9', 99")
    assert(t.read().count() == 1)
    // the layout survived: the new snapshot still prunes by partition
    assert(t.readWhere(p => p.get("pt").contains("p9")).count() == 1)
    assert(t.readWhere(p => p.get("pt").contains("p0")).count() == 0)
  }

  test("SQL CTAS creates a commit-logged table; IF NOT EXISTS is a no-op on a live one") {
    import spark.implicits._
    val dir = EventsStream.scratchDir("txsql_ctas") + "/t"
    val res = spark.sql(
      s"CREATE TABLE txtable.`$dir` AS SELECT id, id * 2 AS dbl FROM range(10)")
    assert(res.head().getString(0) == "createtable")
    val t = TxTable(spark, dir)
    assert(t.read().count() == 10)
    assert(t.read().agg(org.apache.spark.sql.functions.sum($"dbl"))
      .head.getLong(0) == 90L)
    // a second CREATE refuses; IF NOT EXISTS no-ops
    val dup = intercept[Exception](spark.sql(
      s"CREATE TABLE txtable.`$dir` AS SELECT 1 AS x"))
    assert(dup.getMessage.contains("already"))
    spark.sql(s"CREATE TABLE IF NOT EXISTS txtable.`$dir` AS SELECT 1 AS x")
    assert(t.read().count() == 10, "IF NOT EXISTS must not overwrite")
    // partitioned CTAS lays out hive dirs
    val dir2 = EventsStream.scratchDir("txsql_ctas_pt") + "/t"
    spark.sql(s"CREATE TABLE txtable.`$dir2` PARTITIONED BY (par) AS " +
      "SELECT id, CAST(id % 3 AS STRING) AS par FROM range(30)")
    val t2 = TxTable(spark, dir2)
    assert(t2.read().count() == 30)
    assert(t2.readWhere(p => p.get("par").contains("1")).count() == 10)
  }

  test("null-count stats skip files on IS NULL / IS NOT NULL, and " +
      "all-null files on any comparison") {
    import spark.implicits._
    val (t, dir) = freshTable("txsrc_nulls")
    // three one-file appends: all-null note, no-null note, mixed
    t.overwrite((0 until 100).map(i => (i.toLong, null: String))
      .toDF("id", "note").coalesce(1))
    t.append((100 until 200).map(i => (i.toLong, s"n$i"))
      .toDF("id", "note").coalesce(1))
    t.append((200 until 300).map(i =>
        (i.toLong, if (i % 2 == 0) s"n$i" else null))
      .toDF("id", "note").coalesce(1))
    val r = spark.read.format(fmt).load(dir)
    assert(filesScanned(r) == 3, "unconstrained scan reads all files")
    // IS NULL: the no-null file (zero recorded nulls) skips
    val isNull = r.where(col("note").isNull)
    assert(isNull.count() == 150)
    assert(filesScanned(r.where(col("note").isNull)) == 2,
      "a zero-null file must skip an IS NULL scan")
    // IS NOT NULL: the all-null file skips
    assert(filesScanned(r.where(col("note").isNotNull)) == 2,
      "an all-null file must skip an IS NOT NULL scan")
    // any comparison implies IsNotNull -> the all-null file skips too
    assert(filesScanned(r.where(col("note") > "n")) == 2,
      "a comparison's implicit IsNotNull must skip the all-null file")
    assert(r.where(col("note").isNotNull).count() == 150)
    // legacy entries without null counts stay readable and unpruned
    val plain = graft.core.TxTable(spark, dir, statsOnWrite = false)
    plain.append((300 until 310).map(i => (i.toLong, null: String))
      .toDF("id", "note").coalesce(1))
    val r2 = spark.read.format(fmt).load(dir)
    assert(filesScanned(r2.where(col("note").isNotNull)) == 3,
      "entries without null counts must be kept")
    assert(r2.where(col("note").isNull).count() == 160)
  }

  test("SHOW PARTITIONS and VACUUM DRY RUN") {
    import spark.implicits._
    val (t, dir) = freshTable("txsql_showpart")
    def part(ids: Range, p: String) =
      ids.map(i => (i.toLong, p)).toDF("id", "grp")
    t.overwrite(part(0 until 30, "a"), partitionBy = Seq("grp"))
    t.append(part(100 until 110, "b"))
    val parts = spark.sql(s"SHOW PARTITIONS txtable.`$dir`").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(parts.keySet == Set("grp=a", "grp=b"))
    assert(parts("grp=a")._2 == 30 && parts("grp=b")._2 == 10,
      "per-partition row totals from the manifest")
    // orphan a file, then DRY RUN: reported but NOT deleted
    t.overwrite(part(0 until 5, "a"), partitionBy = Seq("grp"))
    t.expireSnapshots(keepLast = 1)
    val dry = spark.sql(
      s"VACUUM txtable.`$dir` RETAIN 0 HOURS DRY RUN").head().getLong(1)
    assert(dry > 0, "dry run reports deletable files")
    assert(t.read().count() == 5)
    val wet = spark.sql(s"VACUUM txtable.`$dir` RETAIN 0 HOURS").head().getLong(1)
    assert(wet == dry, "dry run predicted exactly the real sweep")
    assert(spark.sql(
      s"VACUUM txtable.`$dir` RETAIN 0 HOURS DRY RUN").head().getLong(1) == 0)
    assert(t.read().count() == 5)
  }

  test("SQL INSERT INTO ... REPLACE WHERE recomputes the predicate slice atomically") {
    import spark.implicits._
    val (t, dir) = freshTable("txsql_replw")
    t.overwrite(Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "b", 3.0))
      .toDF("id", "grp", "v"), partitionBy = Seq("grp"))
    spark.sql(
      s"""INSERT INTO txtable.`$dir` REPLACE WHERE grp = 'a'
         |SELECT * FROM VALUES (10L, 'a', 10.0), (11L, 'a', 11.0)
         |AS src(id, grp, v)""".stripMargin).collect()
    val r = t.read()
    assert(r.where(col("grp") === "a").select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == Seq(10L, 11L))
    assert(r.where(col("grp") === "b").count() == 1)
    assert(t.history().last._2 == "replace")
    // offender through SQL refuses too
    val e = intercept[Exception](spark.sql(
      s"""INSERT INTO txtable.`$dir` REPLACE WHERE grp = 'a'
         |SELECT * FROM VALUES (99L, 'zzz', 0.0) AS src(id, grp, v)"""
        .stripMargin).collect())
    assert(e.getMessage.contains("satisfy"))
  }

  test("SQL CONVERT TO TXTABLE imports a bare parquet dir") {
    import spark.implicits._
    val dir = EventsStream.scratchDir("txsql_convert")
    (0 until 30).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
      .repartition(2).write.mode("overwrite").parquet(dir)
    val r = spark.sql(s"CONVERT TO TXTABLE parquet.`$dir`").head()
    assert(r.getString(0) == "convert" && r.getLong(1) == 0L)
    assert(spark.sql(s"SELECT count(*) AS n FROM txtable.`$dir`")
      .head().getLong(0) == 30)
    spark.sql(s"DELETE FROM txtable.`$dir` WHERE id < 10")
    assert(spark.read.format(fmt).load(dir).count() == 20)
  }

  test("count(*) answers from the manifest: zero files scanned") {
    import spark.implicits._
    val (t, dir) = freshTable("txsrc_metacount")
    t.overwrite(df(0 until 500).repartition(4))
    t.append(df(500 until 520))
    def scansIn(q: DataFrame): Int = {
      q.collect()
      // recurse through AQE wrappers: a materialized stage's plan is
      // NOT among its children, so a plain collect misses scans under
      // exchanges
      def allScans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          allScans(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          allScans(s.plan)
        case s: org.apache.spark.sql.execution.FileSourceScanExec => Seq(s)
        case other => other.children.flatMap(allScans)
      }
      allScans(q.queryExecution.executedPlan).size
    }
    val bare = spark.sql(s"SELECT count(*) AS n FROM txtable.`$dir`")
    assert(bare.head().getLong(0) == 520)
    assert(scansIn(bare) == 0, "bare count(*) must fold to the manifest")
    // a filter keeps the scan (and stays correct)
    val filtered = spark.sql(
      s"SELECT count(*) AS n FROM txtable.`$dir` WHERE id < 100")
    assert(filtered.head().getLong(0) == 100)
    assert(scansIn(filtered) == 1)
    // count(col) must see nulls -> scans
    t.append(Seq((9999L, null.asInstanceOf[String], 0.0))
      .toDF("id", "name", "score"))
    val countCol = spark.sql(s"SELECT count(name) AS n FROM txtable.`$dir`")
    assert(countCol.head().getLong(0) == 520)
    assert(scansIn(countCol) == 1)
    assert(spark.sql(s"SELECT count(*) AS n FROM txtable.`$dir`")
      .head().getLong(0) == 521)
    // global min/max over a numeric column folds too (zone maps ARE
    // the answer), including mixed with count(*)
    val mm = spark.sql(
      s"SELECT min(id) AS lo, max(id) AS hi, count(*) AS n FROM txtable.`$dir`")
    assert(mm.head() == org.apache.spark.sql.Row(0L, 9999L, 521L))
    assert(scansIn(mm) == 0, "min/max/count must fold to the manifest")
    // min over a STRING never folds (max stats truncation-dropped)
    val sm = spark.sql(s"SELECT min(name) AS lo FROM txtable.`$dir`")
    assert(sm.head().getString(0) == "name_0")
    assert(scansIn(sm) == 1)
    // a DV snapshot hides rows the manifest totals cannot see -> the
    // relation carries no exact count, and the result stays correct
    val dv = TxTable(spark, dir, deletionVectors = true)
    dv.deleteWhere(col("id") < 10L)
    assert(spark.sql(s"SELECT count(*) AS n FROM txtable.`$dir`")
      .head().getLong(0) == 511)
    assert(spark.sql(s"SELECT min(id) AS lo FROM txtable.`$dir`")
      .head().getLong(0) == 10L, "post-DV min must come from a scan")
  }
}
