package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{DeltaFixture, DeltaLog, Tables, TxTable}
import graft.streaming.EventsStream

/** Delta Lake interop ([[graft.core.DeltaLog]]): the open `_delta_log`
  * protocol parses (JSON commits, removes, checkpoints), reads inject
  * partition values and prune on them, CONVERT FROM DELTA publishes a
  * zero-copy snapshot with the full transactional surface behind it,
  * and unsupported protocol features refuse loudly instead of
  * misreading. */
class DeltaInteropSpec extends SparkSpec {

  private def scratch(tag: String): String =
    EventsStream.scratchDir(s"delta_$tag") + "/t"

  private lazy val orders = Tables.orders(spark, sf)
    .select("o_orderkey", "o_totalprice", "o_orderpriority")

  /** Unpartitioned fixture: commit 0 adds A+B, commit 1 removes B and
    * adds C. Active = A (key%3==0) + C (key%3==2). */
  private def unpartitioned(dir: String): Unit = {
    val a = DeltaFixture.writeData(spark,
      orders.where(col("o_orderkey") % 3 === 0), dir, "part-a.parquet")
    val b = DeltaFixture.writeData(spark,
      orders.where(col("o_orderkey") % 3 === 1), dir, "part-b.parquet")
    val c = DeltaFixture.writeData(spark,
      orders.where(col("o_orderkey") % 3 === 2), dir, "part-c.parquet")
    DeltaFixture.commit(spark, dir, 0, Seq(
      DeltaFixture.protocolJson(),
      DeltaFixture.metaDataJson(orders.schema),
      DeltaFixture.addJson(a, stats = Some(DeltaFixture.statsJson(a.rows))),
      DeltaFixture.addJson(b, stats = Some(DeltaFixture.statsJson(b.rows)))))
    DeltaFixture.commit(spark, dir, 1, Seq(
      DeltaFixture.removeJson(b.relPath),
      DeltaFixture.addJson(c, stats = Some(DeltaFixture.statsJson(c.rows)))))
  }

  test("snapshot replay: adds accumulate, removes tombstone, metadata parses") {
    val dir = scratch("basic")
    unpartitioned(dir)
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.version == 1)
    assert(snap.adds.map(_.path) == Seq("part-a.parquet", "part-c.parquet"))
    assert(snap.partitionCols.isEmpty)
    assert(snap.schema.fieldNames.toSeq ==
      Seq("o_orderkey", "o_totalprice", "o_orderpriority"))
    assert(snap.adds.forall(_.rows > 0), "stats numRecords must carry")
    assert(snap.adds.forall(_.bytes > 0))
    // the read equals the expected row set exactly
    val got = DeltaLog.read(spark, dir)
    val want = orders.where(col("o_orderkey") % 3 =!= 1)
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("checkpointed log: base state from parquet, JSON commits replay on top; aged-out JSON tolerated") {
    val dir = scratch("checkpoint")
    val a = DeltaFixture.writeData(spark,
      orders.where(col("o_orderkey") % 3 === 0), dir, "part-a.parquet")
    val b = DeltaFixture.writeData(spark,
      orders.where(col("o_orderkey") % 3 === 1), dir, "part-b.parquet")
    val c = DeltaFixture.writeData(spark,
      orders.where(col("o_orderkey") % 3 === 2), dir, "part-c.parquet")
    DeltaFixture.commit(spark, dir, 0, Seq(
      DeltaFixture.protocolJson(), DeltaFixture.metaDataJson(orders.schema),
      DeltaFixture.addJson(a), DeltaFixture.addJson(b)))
    DeltaFixture.commit(spark, dir, 1, Seq(DeltaFixture.removeJson(b.relPath)))
    // checkpoint at v1 compacts to {a}; commit 2 adds c on top
    DeltaFixture.checkpoint(spark, dir, 1, orders.schema, Nil,
      Seq((a, Map.empty[String, String],
        Some(DeltaFixture.statsJson(a.rows)))))
    DeltaFixture.commit(spark, dir, 2, Seq(DeltaFixture.addJson(c)))
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.version == 2)
    assert(snap.adds.map(_.path) == Seq("part-a.parquet", "part-c.parquet"))
    // Delta retention deletes old JSON commits once checkpointed —
    // the reader must not need them
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_delta_log/00000000000000000000.json"), false)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_delta_log/00000000000000000001.json"), false)
    val snap2 = DeltaLog.snapshot(spark, dir)
    assert(snap2.adds.map(_.path) == Seq("part-a.parquet", "part-c.parquet"))
    assert(DeltaLog.read(spark, dir).count() ==
      orders.where(col("o_orderkey") % 3 =!= 1).count())
  }

  test("partitioned delta: values injected TYPED from the log, one broadcast join, pruning cuts the file list") {
    val dir = scratch("partitioned")
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderpriority", StringType)))
    val prios = orders.select("o_orderpriority").distinct()
      .collect().map(_.getString(0)).sorted
    val files = prios.map { p =>
      val df = orders.where(col("o_orderpriority") === p)
        .drop("o_orderpriority") // Delta does NOT store partition cols in data
      val f = DeltaFixture.writeData(spark, df, dir,
        s"o_orderpriority=${p.replace(' ', '_')}/part-0.parquet")
      (f, p)
    }
    DeltaFixture.commit(spark, dir, 0,
      DeltaFixture.protocolJson() +:
      DeltaFixture.metaDataJson(schema, Seq("o_orderpriority")) +:
      files.map { case (f, p) =>
        DeltaFixture.addJson(f, Map("o_orderpriority" -> p)) }.toSeq)
    val snap = DeltaLog.snapshot(spark, dir)
    assert(snap.partitionCols == Seq("o_orderpriority"))
    val got = DeltaLog.read(spark, dir)
    assert(got.schema.fieldNames.toSeq == schema.fieldNames.toSeq)
    // full equality including the injected partition column
    assert(got.exceptAll(orders).isEmpty && orders.exceptAll(got).isEmpty)
    // partition pruning: an EqualTo filter reads ONE file, not five
    val pruned = DeltaLog.buildDf(spark, snap,
      Seq(org.apache.spark.sql.sources.EqualTo("o_orderpriority", prios.head)))
    assert(pruned.inputFiles.length == 1,
      s"expected 1 pruned file, got ${pruned.inputFiles.length}")
    // the format front door: filters prune through the relation too
    val rel = spark.read.format("delta-log").load(dir)
      .where(col("o_orderpriority") === prios.head)
    assert(rel.count() ==
      orders.where(col("o_orderpriority") === prios.head).count())
  }

  test("CONVERT FROM DELTA: zero-copy snapshot, then the FULL transactional surface") {
    val dir = scratch("convert")
    unpartitioned(dir)
    val dataFilesBefore = {
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .map(st => (st.getPath.getName, st.getModificationTime)).toMap
    }
    val t = TxTable.convertFromDelta(spark, dir)
    val want = orders.where(col("o_orderkey") % 3 =!= 1)
    assert(t.read().count() == want.count())
    assert(t.read().exceptAll(want).isEmpty)
    // zero copy: the delta data files are untouched (same mtimes)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    dataFilesBefore.foreach { case (name, mtime) =>
      assert(fs.getFileStatus(
        new org.apache.hadoop.fs.Path(dir, name)).getModificationTime == mtime,
        s"$name was rewritten by convert")
    }
    // stats carried: numRecords answers the zone-map surface
    // (rows recorded per entry → exact count path stays available)
    // and the transactional verbs work from v0 on
    val v0 = t.latestVersion.get
    t.append(orders.where(col("o_orderkey") % 3 === 1).limit(10))
    assert(t.read().count() == want.count() + 10)
    t.deleteWhere(col("o_totalprice") < 0) // no-op delete commits fine
    assert(t.readVersion(v0).count() == want.count(), "time travel to v0")
    // the delta log is still there, untouched, for delta readers
    assert(DeltaLog.isDeltaTable(spark, dir))
    assert(DeltaLog.read(spark, dir).count() == want.count())
  }

  test("unsupported protocol features refuse LOUDLY, never misread") {
    // deletion vectors
    val dv = scratch("dv")
    val f1 = DeltaFixture.writeData(spark, orders.limit(50), dv, "p.parquet")
    DeltaFixture.commit(spark, dv, 0, Seq(
      DeltaFixture.protocolJson(), DeltaFixture.metaDataJson(orders.schema),
      DeltaFixture.addJson(f1, deletionVector = true)))
    val e1 = intercept[Exception] { DeltaLog.snapshot(spark, dv) }
    assert(e1.getMessage.contains("DELETION VECTORS"), e1.getMessage)

    // reader version 2 (column mapping era)
    val rv = scratch("rv2")
    val f2 = DeltaFixture.writeData(spark, orders.limit(50), rv, "p.parquet")
    DeltaFixture.commit(spark, rv, 0, Seq(
      DeltaFixture.protocolJson(minReader = 2),
      DeltaFixture.metaDataJson(orders.schema), DeltaFixture.addJson(f2)))
    val e2 = intercept[Exception] { DeltaLog.snapshot(spark, rv) }
    assert(e2.getMessage.contains("minReaderVersion"), e2.getMessage)

    // column mapping configuration
    val cm = scratch("cmap")
    val f3 = DeltaFixture.writeData(spark, orders.limit(50), cm, "p.parquet")
    DeltaFixture.commit(spark, cm, 0, Seq(
      DeltaFixture.protocolJson(),
      DeltaFixture.metaDataJson(orders.schema,
        config = Map("delta.columnMapping.mode" -> "name")),
      DeltaFixture.addJson(f3)))
    val e3 = intercept[Exception] { DeltaLog.snapshot(spark, cm) }
    assert(e3.getMessage.contains("column mapping"), e3.getMessage)

    // log gap = corrupt
    val gap = scratch("gap")
    val f4 = DeltaFixture.writeData(spark, orders.limit(50), gap, "p.parquet")
    DeltaFixture.commit(spark, gap, 0, Seq(
      DeltaFixture.protocolJson(), DeltaFixture.metaDataJson(orders.schema),
      DeltaFixture.addJson(f4)))
    DeltaFixture.commit(spark, gap, 2, Seq(DeltaFixture.addJson(f4)))
    val e4 = intercept[Exception] { DeltaLog.snapshot(spark, gap) }
    assert(e4.getMessage.contains("gap"), e4.getMessage)

    // partitioned zero-copy convert refuses toward the copy path
    val pc = scratch("pconv")
    val f5 = DeltaFixture.writeData(spark,
      orders.drop("o_orderpriority"), pc, "pr=HIGH/p.parquet")
    DeltaFixture.commit(spark, pc, 0, Seq(
      DeltaFixture.protocolJson(),
      DeltaFixture.metaDataJson(orders.schema, Seq("o_orderpriority")),
      DeltaFixture.addJson(f5, Map("o_orderpriority" -> "HIGH"))))
    val e5 = intercept[Exception] { TxTable.convertFromDelta(spark, pc) }
    assert(e5.getMessage.contains("partition"), e5.getMessage)
  }
}
