package graft

import org.apache.spark.sql.functions._

import graft.core.TxTable
import graft.streaming.EventsStream

/** The DataSource-V2 catalog (`spark.sql.catalog.graft`): catalog
  * enumeration (SHOW TABLES / DESCRIBE), reads with pushdown, writes,
  * time travel — and the flagship guarantee: a join of two co-bucketed
  * txtables on their bucket keys plans as a storage-partitioned join
  * with ZERO shuffle on either side. */
class GraftCatalogSpec extends SparkSpec {

  private def df(ids: Range, tag: String) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"${tag}_$i", i * 1.5)).toDF("id", "name", "score")
  }

  private def dir(tag: String) = EventsStream.scratchDir(s"v2cat_$tag") + "/t"

  test("SHOW TABLES / DESCRIBE TABLE enumerate graft tables") {
    val d = dir("enum")
    TxTable(spark, d).overwrite(df(0 until 20, "e"))
    spark.sql("DROP TABLE IF EXISTS v2_enum")
    spark.sql(s"CREATE TABLE v2_enum USING txtable LOCATION '$d'")
    val listed = spark.sql("SHOW TABLES IN graft")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(listed.contains(("default", "v2_enum")),
      s"SHOW TABLES IN graft missing v2_enum: ${listed.toSeq}")
    val desc = spark.sql("DESCRIBE TABLE graft.default.v2_enum")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(desc.toMap.get("id").contains("bigint"))
    assert(desc.toMap.get("score").contains("double"))
    spark.sql("DROP TABLE v2_enum")
  }

  test("SELECT through the catalog: rows, pruning, zone-map file skip") {
    val d = dir("read")
    val t = TxTable(spark, d)
    t.overwrite(df(0 until 500, "r"))
    t.append(df(500 until 1000, "r"))
    spark.sql("DROP TABLE IF EXISTS v2_read")
    spark.sql(s"CREATE TABLE v2_read USING txtable LOCATION '$d'")
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.v2_read")
      .head.getLong(0) == 1000)
    // predicate result correctness (file skip is a perf property; the
    // rows must match regardless)
    assert(spark.sql(
      "SELECT sum(id) AS s FROM graft.default.v2_read WHERE id >= 990")
      .head.getLong(0) == (990L until 1000L).sum)
    // column pruning reaches the scan: only the requested column reads
    val plan = spark.sql("SELECT name FROM graft.default.v2_read")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BatchScan"), plan)
    spark.sql("DROP TABLE v2_read")
  }

  test("bucketed txtable join plans with ZERO shuffle (storage-partitioned join)") {
    val (da, db) = (dir("spj_a"), dir("spj_b"))
    TxTable(spark, da).overwriteBucketed(df(0 until 400, "a"), Seq("id"), 8)
    TxTable(spark, db).overwriteBucketed(df(100 until 600, "b"), Seq("id"), 8)
    spark.sql("DROP TABLE IF EXISTS v2_spj_a")
    spark.sql("DROP TABLE IF EXISTS v2_spj_b")
    spark.sql(s"CREATE TABLE v2_spj_a USING txtable LOCATION '$da'")
    spark.sql(s"CREATE TABLE v2_spj_b USING txtable LOCATION '$db'")
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.sql(
        "SELECT a.id, a.score, b.score AS score_b " +
          "FROM graft.default.v2_spj_a a JOIN graft.default.v2_spj_b b " +
          "ON a.id = b.id")
      val rows = j.collect()
      assert(rows.length == 300) // ids 100..399 overlap
      assert(rows.map(_.getLong(0)).sorted.toSeq == (100L until 400L).toSeq)
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed txtable join should be storage-partitioned (no shuffle):\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
    spark.sql("DROP TABLE v2_spj_a")
    spark.sql("DROP TABLE v2_spj_b")
  }

  test("aggregation on the bucket key over a bucketed txtable plans " +
      "with ZERO shuffle (KeyGroupedPartitioning satisfies the distribution)") {
    val d = dir("spj_agg")
    TxTable(spark, d).overwriteBucketed(df(0 until 500, "g"), Seq("id"), 8)
    spark.sql("DROP TABLE IF EXISTS v2_spj_agg")
    spark.sql(s"CREATE TABLE v2_spj_agg USING txtable LOCATION '$d'")
    val q = spark.sql(
      "SELECT id, sum(score) AS s FROM graft.default.v2_spj_agg GROUP BY id")
    assert(q.count() == 500)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucket-key aggregation should reuse the storage partitioning:\n$plan")
    spark.sql("DROP TABLE v2_spj_agg")
  }

  test("storage-partitioned join survives a filtered side with MISSING " +
      "buckets (pushPartValues alignment)") {
    val (da, db) = (dir("spjp_a"), dir("spjp_b"))
    TxTable(spark, da).overwriteBucketed(df(0 until 300, "a"), Seq("id"), 8)
    TxTable(spark, db).overwriteBucketed(df(0 until 300, "b"), Seq("id"), 8)
    Seq("v2_spjp_a", "v2_spjp_b").foreach(n =>
      spark.sql(s"DROP TABLE IF EXISTS $n"))
    spark.sql(s"CREATE TABLE v2_spjp_a USING txtable LOCATION '$da'")
    spark.sql(s"CREATE TABLE v2_spjp_b USING txtable LOCATION '$db'")
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // id < 40 zone-map-prunes most of b's bucket files: the two
      // sides report DIFFERENT bucket-value sets, which
      // pushPartValues aligns instead of falling back to a shuffle
      val j = spark.sql(
        "SELECT a.id FROM graft.default.v2_spjp_a a JOIN " +
          "(SELECT * FROM graft.default.v2_spjp_b WHERE id < 40) b " +
          "ON a.id = b.id")
      assert(j.collect().map(_.getLong(0)).sorted.toSeq == (0L until 40L))
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
    Seq("v2_spjp_a", "v2_spjp_b").foreach(n => spark.sql(s"DROP TABLE $n"))
  }

  test("deletion-vector snapshots read merge-on-read through the catalog") {
    val d = dir("dv")
    val t = TxTable(spark, d, deletionVectors = true)
    t.overwrite(df(0 until 100, "d"))
    t.deleteWhere(col("id") % 10 === 0)   // 10 rows die via a DV
    assert(t.fileEntries(t.latestVersion.get).exists(_.dvPath.isDefined),
      "precondition: the delete must have produced a deletion vector")
    spark.sql("DROP TABLE IF EXISTS v2_dv")
    spark.sql(s"CREATE TABLE v2_dv USING txtable LOCATION '$d'")
    // counts, rows, and filters all see only the live rows
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.v2_dv")
      .head.getLong(0) == 90)
    val ids = spark.sql("SELECT id FROM graft.default.v2_dv ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids == (0L until 100L).filter(_ % 10 != 0))
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.default.v2_dv WHERE id < 25")
      .head.getLong(0) == 22) // 1..24 minus 10,20 (0 deleted too)
    // time travel to the pre-delete snapshot still serves all rows
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.default.v2_dv VERSION AS OF 0")
      .head.getLong(0) == 100)
    spark.sql("DROP TABLE v2_dv")
  }

  test("storage-partitioned join survives a DELETE (DV) on one side") {
    val (da, db) = (dir("spjdv_a"), dir("spjdv_b"))
    val ta = TxTable(spark, da, deletionVectors = true)
    ta.overwriteBucketed(df(0 until 200, "a"), Seq("id"), 8)
    ta.deleteWhere(col("id") % 4 === 0) // DVs inside a bucketed layout
    assert(ta.fileEntries(ta.latestVersion.get).exists(_.dvPath.isDefined))
    TxTable(spark, db).overwriteBucketed(df(0 until 200, "b"), Seq("id"), 8)
    Seq("v2_spjdv_a", "v2_spjdv_b").foreach(n =>
      spark.sql(s"DROP TABLE IF EXISTS $n"))
    spark.sql(s"CREATE TABLE v2_spjdv_a USING txtable LOCATION '$da'")
    spark.sql(s"CREATE TABLE v2_spjdv_b USING txtable LOCATION '$db'")
    val before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val j = spark.sql("SELECT a.id FROM graft.default.v2_spjdv_a a " +
        "JOIN graft.default.v2_spjdv_b b ON a.id = b.id")
      assert(j.collect().map(_.getLong(0)).sorted.toSeq ==
        (0L until 200L).filter(_ % 4 != 0))
      assert(!j.queryExecution.executedPlan.toString.contains("Exchange"),
        "DV-bearing bucketed join must stay storage-partitioned")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", before)
    Seq("v2_spjdv_a", "v2_spjdv_b").foreach(n => spark.sql(s"DROP TABLE $n"))
  }

  test("the served bucket function reproduces the writer's bucket ids exactly") {
    // SPJ soundness rests on this: the function the catalog hands the
    // planner must agree with the ids the layout writer recorded —
    // for every type and value, not just the fixtures
    import spark.implicits._
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.sql.connector.catalog.functions.ScalarFunction
    import org.apache.spark.sql.types._
    val rnd = new scala.util.Random(42)
    val n = 16
    def bind(dt: DataType) = graft.sources.GraftBucketFunction
      .bind(StructType(Seq(StructField("_0", IntegerType),
        StructField("_1", dt))))
      .asInstanceOf[ScalarFunction[java.lang.Integer]]
    // longs (the graph/state key shape)
    val longs = Seq.fill(300)(rnd.nextLong()) ++
      Seq(0L, -1L, Long.MaxValue, Long.MinValue)
    val refL = longs.toDF("k")
      .select(col("k"), pmod(hash(col("k")), lit(n)).as("b")).collect()
    val bL = bind(LongType)
    refL.foreach { r =>
      assert(bL.produceResult(
        new GenericInternalRow(Array[Any](n, r.getLong(0)))) == r.getInt(1),
        s"long key ${r.getLong(0)}")
    }
    // strings (doc-id shapes)
    val strs = Seq.fill(300)(
      rnd.alphanumeric.take(rnd.nextInt(20)).mkString) :+ ""
    val refS = strs.distinct.toDF("k")
      .select(col("k"), pmod(hash(col("k")), lit(n)).as("b")).collect()
    val bS = bind(StringType)
    refS.foreach { r =>
      assert(bS.produceResult(new GenericInternalRow(Array[Any](n,
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)))))
        == r.getInt(1), s"string key '${r.getString(0)}'")
    }
  }

  test("readStream.table('graft.default.t') streams through the V1 fallback") {
    val d = dir("stream")
    val t = TxTable(spark, d)
    t.overwrite(df(0 until 40, "s"))   // v0: initial snapshot
    t.append(df(100 until 120, "s"))   // v1: appended window
    spark.sql("DROP TABLE IF EXISTS v2_stream")
    spark.sql(s"CREATE TABLE v2_stream USING txtable LOCATION '$d'")
    val out = EventsStream.scratchDir("v2cat_stream_out")
    val q = spark.readStream.table("graft.default.v2_stream")
      .writeStream
      .format("parquet")
      .option("path", s"$out/out")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val sunk = spark.read.parquet(s"$out/out")
    assert(sunk.count() == 60, "initial snapshot + appended window")
    assert(sunk.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      ((0L until 40L) ++ (100L until 120L)))
    spark.sql("DROP TABLE v2_stream")
  }

  test("column-mapped snapshots (RENAME COLUMN) read through the catalog") {
    val d = dir("colmap")
    val t = TxTable(spark, d)
    t.overwrite(df(0 until 60, "c"))
    // metadata-only rename freezes the physical name; data files on
    // disk still carry 'score'
    t.renameColumn("score", "points")
    spark.sql("DROP TABLE IF EXISTS v2_colmap")
    spark.sql(s"CREATE TABLE v2_colmap USING txtable LOCATION '$d'")
    val desc = spark.sql("DESCRIBE TABLE graft.default.v2_colmap")
      .collect().map(_.getString(0))
    assert(desc.contains("points") && !desc.contains("score"),
      s"logical schema must surface the rename: ${desc.toSeq}")
    // reads, filters on the renamed column, and aggregates all work
    assert(spark.sql(
      "SELECT sum(points) AS s FROM graft.default.v2_colmap")
      .head.getDouble(0) == (0 until 60).map(_ * 1.5).sum)
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.default.v2_colmap WHERE points > 60")
      .head.getLong(0) == (0 until 60).count(_ * 1.5 > 60))
    // appends through the rename land physically renamed too
    spark.sql("INSERT INTO graft.default.v2_colmap VALUES (100, 'x', 9.0)")
    assert(spark.sql(
      "SELECT points FROM graft.default.v2_colmap WHERE id = 100")
      .head.getDouble(0) == 9.0)
    spark.sql("DROP TABLE v2_colmap")
  }

  test("USE graft / spark.table / DataFrameWriterV2 all resolve") {
    val d = dir("api")
    TxTable(spark, d).overwrite(df(0 until 30, "u"))
    spark.sql("DROP TABLE IF EXISTS v2_api")
    spark.sql(s"CREATE TABLE v2_api USING txtable LOCATION '$d'")
    // catalog-qualified through the session API
    assert(spark.table("graft.default.v2_api").count() == 30)
    // USE graft: unqualified names resolve in the catalog
    spark.sql("USE graft")
    try assert(spark.sql("SELECT count(*) AS n FROM default.v2_api")
      .head.getLong(0) == 30)
    finally spark.sql("USE spark_catalog")
    // DataFrameWriterV2 append through the V1 fallback seam
    df(100 until 110, "u").writeTo("graft.default.v2_api").append()
    assert(spark.table("graft.default.v2_api").count() == 40)
    spark.sql("DROP TABLE v2_api")
  }

  test("INSERT INTO / INSERT OVERWRITE through the catalog commit to the log") {
    val d = dir("write")
    TxTable(spark, d).overwrite(df(0 until 10, "w"))
    spark.sql("DROP TABLE IF EXISTS v2_write")
    spark.sql(s"CREATE TABLE v2_write USING txtable LOCATION '$d'")
    spark.sql("INSERT INTO graft.default.v2_write VALUES (100, 'x', 0.5)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.v2_write")
      .head.getLong(0) == 11)
    spark.sql("INSERT OVERWRITE graft.default.v2_write VALUES (7, 'only', 1.0)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.v2_write")
      .head.getLong(0) == 1)
    // the log recorded both commits: time travel sees the 11-row state
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.default.v2_write VERSION AS OF 1")
      .head.getLong(0) == 11)
    spark.sql("DROP TABLE v2_write")
  }

  test("plain append/overwrite plan NATIVELY (no InsertableRelation): " +
      "task writers, layout-clustered, one manifest commit") {
    val d = dir("nativew")
    TxTable(spark, d).overwriteBucketed(df(0 until 40, "n"), Seq("id"), 4)
    spark.sql("DROP TABLE IF EXISTS v2_nativew")
    spark.sql(s"CREATE TABLE v2_nativew USING txtable LOCATION '$d'")
    // the physical plan is Spark's native AppendData over our
    // BatchWrite — the V1 fallback would print AppendDataExecV1
    val ap = spark.sql(
      "EXPLAIN INSERT INTO graft.default.v2_nativew VALUES (100, 'x', 0.5)")
      .head.getString(0)
    assert(ap.contains("AppendData") && !ap.contains("AppendDataExecV1"),
      s"append must plan the native V2 write:\n$ap")
    spark.sql(
      "INSERT INTO graft.default.v2_nativew VALUES (100, 'x', 0.5), (101, 'y', 1.5)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.v2_nativew")
      .head.getLong(0) == 42)
    // layout respected: the appended rows landed in bucket dirs and
    // the bucket function agrees with the layout writer (the rows are
    // findable through a bucket-pruned read)
    val t = TxTable(spark, d)
    val hist = t.history()
    assert(hist.last._2 == "append", s"history: ${hist.takeRight(2)}")
    // native full overwrite
    val ow = spark.sql(
      "EXPLAIN INSERT OVERWRITE graft.default.v2_nativew VALUES (7, 'only', 1.0)")
      .head.getString(0)
    assert(ow.contains("OverwriteByExpression") &&
      !ow.contains("OverwriteByExpressionExecV1"),
      s"overwrite must plan the native V2 write:\n$ow")
    spark.sql("INSERT OVERWRITE graft.default.v2_nativew VALUES (7, 'only', 1.0)")
    assert(spark.sql("SELECT id, name FROM graft.default.v2_nativew")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((7L, "only")))
    assert(TxTable(spark, d).history().last._2 == "overwrite")
    // time travel across the native commits
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.default.v2_nativew VERSION AS OF 1")
      .head.getLong(0) == 42)
    spark.sql("DROP TABLE v2_nativew")
  }

  test("native append into a hive-partitioned table routes rows into " +
      "partition dirs (manifest partition values, pruning intact)") {
    import spark.implicits._
    val d = dir("nativep")
    val src = (0 until 30).map(i => (i.toLong, s"g${i % 3}", i * 1.0))
      .toDF("id", "grp", "v")
    TxTable(spark, d).overwrite(src, partitionBy = Seq("grp"))
    spark.sql("DROP TABLE IF EXISTS v2_nativep")
    spark.sql(s"CREATE TABLE v2_nativep USING txtable LOCATION '$d'")
    spark.sql("INSERT INTO graft.default.v2_nativep VALUES " +
      "(100, 'g1', 9.0), (101, 'g9', 9.0)")
    val t = TxTable(spark, d)
    assert(t.history().last._2 == "append")
    // the appended rows carry manifest partition values: a partition-
    // pruned read finds exactly them without touching other dirs
    val g9 = t.readWhere(p => p.get("grp").contains("g9"))
    assert(g9.select("id").collect().map(_.getLong(0)).toSeq == Seq(101L))
    assert(t.read().count() == 32)
    spark.sql("DROP TABLE v2_nativep")
  }

  test("INSERT OVERWRITE under dynamic partitionOverwriteMode replaces " +
      "touched partitions only (flat table = full overwrite)") {
    import spark.implicits._
    val before = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      // hive-partitioned: only the partitions in the data are replaced
      val dp = dir("dynpart")
      TxTable(spark, dp).overwrite(
        Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0))
          .toDF("id", "p", "v"),
        partitionBy = Seq("p"))
      spark.sql("DROP TABLE IF EXISTS v2_dyn")
      spark.sql(s"CREATE TABLE v2_dyn USING txtable LOCATION '$dp'")
      spark.sql(
        "INSERT OVERWRITE graft.default.v2_dyn VALUES (9, 'b', 9.0)")
      val rows = spark.sql(
        "SELECT id, p FROM graft.default.v2_dyn ORDER BY id")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((1L, "a"), (3L, "c"), (9L, "b")),
        s"dynamic overwrite must replace only partition b: $rows")
      spark.sql("DROP TABLE v2_dyn")
      // flat table: dynamic mode degenerates to a full overwrite
      val df0 = dir("dynflat")
      TxTable(spark, df0).overwrite(df(0 until 5, "f"))
      spark.sql("DROP TABLE IF EXISTS v2_dynflat")
      spark.sql(s"CREATE TABLE v2_dynflat USING txtable LOCATION '$df0'")
      spark.sql(
        "INSERT OVERWRITE graft.default.v2_dynflat VALUES (7, 'only', 1.0)")
      assert(spark.sql("SELECT count(*) AS n FROM graft.default.v2_dynflat")
        .head.getLong(0) == 1)
      spark.sql("DROP TABLE v2_dynflat")
    } finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", before)
  }

  test("CREATE TABLE via the catalog with a bucket transform; rename; drop") {
    // purge any residue from an aborted prior run (shared registry)
    Seq("v2_ddl", "v2_ddl2", "graft.default.v2_ddl2")
      .foreach(graft.core.TxCatalog(spark).drop)
    spark.sql("DROP TABLE IF EXISTS graft.default.v2_ddl")
    spark.sql("CREATE TABLE graft.default.v2_ddl (id BIGINT, v DOUBLE) " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO graft.default.v2_ddl VALUES (1, 1.0), (2, 2.0)")
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.v2_ddl")
      .head.getLong(0) == 2)
    // the created table really is bucket-laid-out in the commit log
    val loc = graft.core.TxCatalog(spark).lookup("v2_ddl").get
    assert(TxTable(spark, loc).bucketKeys.contains(Seq("id")))
    spark.sql("ALTER TABLE graft.default.v2_ddl RENAME TO graft.default.v2_ddl2")
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.v2_ddl2")
      .head.getLong(0) == 2)
    spark.sql("DROP TABLE graft.default.v2_ddl2")
    assert(graft.core.TxCatalog(spark).lookup("v2_ddl2").isEmpty)
  }

  test("metadata tables: .history/.files/.partitions are SELECT-able relations") {
    import spark.implicits._
    val d = dir("meta")
    val t = TxTable(spark, d, deletionVectors = true)
    t.overwrite(df(0 until 100, "m").withColumn("part",
      (col("id") % 2).cast("string")), partitionBy = Seq("part"))
    t.append(df(100 until 150, "m").withColumn("part", lit("9")))
    t.deleteWhere(col("id") === 7L)
    spark.sql("DROP TABLE IF EXISTS v2_meta")
    spark.sql(s"CREATE TABLE v2_meta USING txtable LOCATION '$d'")
    // history: one row per commit, composable SQL (filter + agg)
    val hist = spark.sql(
      "SELECT version, operation FROM graft.default.v2_meta.history ORDER BY version")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(hist.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(hist.head._2 == "overwrite")
    // files: per-file rows with partition string, rows, dv accounting
    val files = spark.sql(
      """SELECT partition, sum(rows) AS r, sum(dv_rows) AS dv, count(*) AS n
        |FROM graft.default.v2_meta.files GROUP BY 1 ORDER BY 1""".stripMargin)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(files.map(_._1).toSeq == Seq("part=0", "part=1", "part=9"))
    assert(files.map(_._2).sum == 150)     // raw rows incl. DV-hidden
    assert(files.map(_._3).sum == 1)       // the one deleted position
    // partitions: live-row accounting nets out the DV
    val parts = spark.sql(
      "SELECT partition, rows FROM graft.default.v2_meta.partitions ORDER BY 1")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(parts.toMap == Map("part=0" -> 50L, "part=1" -> 49L, "part=9" -> 50L))
    // VERSION AS OF pins .files to that snapshot's manifest
    val v0files = spark.sql(
      "SELECT sum(rows) AS r FROM graft.default.v2_meta.files VERSION AS OF 0")
      .head.getLong(0)
    assert(v0files == 100)
    // joins compose: history x files is just SQL
    assert(spark.sql(
      """SELECT count(*) FROM graft.default.v2_meta.history h
        |CROSS JOIN (SELECT count(*) AS n FROM graft.default.v2_meta.files) f
        |""".stripMargin).head.getLong(0) == 3)
    spark.sql("DROP TABLE v2_meta")
  }

  test("writeStream.toTable on a graft table: exactly-once txn-tagged appends") {
    import spark.implicits._
    val d = dir("totable")
    TxTable(spark, s"$d/t").overwrite(Seq((1L, "a")).toDF("id", "v"))
    spark.sql("DROP TABLE IF EXISTS v2_totable")
    spark.sql(s"CREATE TABLE v2_totable USING txtable LOCATION '$d/t'")
    Seq((2L, "b"), (3L, "c")).toDF("id", "v")
      .write.mode("overwrite").parquet(s"$d/src")
    def runOnce(): Unit = {
      val q = spark.readStream.schema("id LONG, v STRING").parquet(s"$d/src")
        // format("txtable") is REQUIRED: toTable's V1-fallback path
        // compares the writer's source against the table provider
        .writeStream.format("txtable")
        .option("checkpointLocation", s"$d/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("graft.default.v2_totable")
      q.awaitTermination()
    }
    runOnce()
    assert(spark.sql("SELECT count(*) FROM graft.default.v2_totable")
      .head.getLong(0) == 3)
    // restart against the same checkpoint: offsets committed, no dupes
    runOnce()
    assert(spark.sql("SELECT count(*) FROM graft.default.v2_totable")
      .head.getLong(0) == 3)
    spark.sql("DROP TABLE v2_totable")
  }

  test("V2 ALTER TABLE: add/rename/drop column and NOT NULL through the catalog") {
    import spark.implicits._
    val d = dir("alter")
    TxTable(spark, d).overwrite(df(0 until 20, "a"))
    spark.sql("DROP TABLE IF EXISTS v2_alter")
    spark.sql(s"CREATE TABLE v2_alter USING txtable LOCATION '$d'")
    spark.sql("ALTER TABLE graft.default.v2_alter ADD COLUMN tag STRING")
    assert(spark.table("graft.default.v2_alter").columns.contains("tag"))
    spark.sql("ALTER TABLE graft.default.v2_alter RENAME COLUMN name TO label")
    val cols = spark.table("graft.default.v2_alter").columns.toSeq
    assert(cols.contains("label") && !cols.contains("name"))
    // rename is pure metadata: the data still reads through
    assert(spark.sql(
      "SELECT count(*) FROM graft.default.v2_alter WHERE label LIKE 'a_%'")
      .head.getLong(0) == 20)
    spark.sql("ALTER TABLE graft.default.v2_alter DROP COLUMN tag")
    assert(!spark.table("graft.default.v2_alter").columns.contains("tag"))
    spark.sql("ALTER TABLE graft.default.v2_alter ALTER COLUMN score SET NOT NULL")
    val err = intercept[Exception] {
      TxTable(spark, d).append(
        Seq((99L, "x", None: Option[Double]))
          .toDF("id", "label", "score"))
    }
    assert(err.getMessage != null)
    spark.sql("ALTER TABLE graft.default.v2_alter ALTER COLUMN score DROP NOT NULL")
    spark.sql("DROP TABLE v2_alter")
  }

  test("native V2 DELETE: pushed filters → DV merge-on-read; untranslatable rejects") {
    val d = dir("ndel")
    val t = TxTable(spark, d, deletionVectors = true)
    t.overwrite(df(0 until 1000, "d"))
    spark.sql("DROP TABLE IF EXISTS v2_ndel")
    spark.sql(s"CREATE TABLE v2_ndel USING txtable LOCATION '$d'")
    val v0 = t.latestVersion.get
    // the catalog-qualified spelling is NOT intercepted by the parser
    // seam — it runs Spark's own DeleteFromTable resolution into
    // SupportsDelete.deleteWhere (pushed Or of comparisons)
    spark.sql("DELETE FROM graft.default.v2_ndel " +
      "WHERE id < 100 OR name = 'd_500'")
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.v2_ndel")
      .head.getLong(0) == 899)
    // merge-on-read: the delete committed a NEW version without
    // rewriting data files — the base parquet of v0 is still live
    assert(t.latestVersion.get > v0)
    assert(TxTable(spark, d).read().count() == 899)
    // a condition Spark cannot push as a source filter (id % 7 = 0)
    // no longer rejects: it routes through the row-level WriteDelta
    // path (SupportsDelta — see GraftRowLevelSpec), still merge-on-read
    val e = spark.sql(
      "EXPLAIN DELETE FROM graft.default.v2_ndel WHERE id % 7 = 0")
      .head.getString(0)
    assert(e.contains("WriteDelta"),
      s"untranslatable DELETE should take the row-level path:\n$e")
    spark.sql("DELETE FROM graft.default.v2_ndel WHERE id % 7 = 0")
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.v2_ndel")
      .head.getLong(0) ==
      (100 until 1000).count(i => i != 500 && i % 7 != 0))
    spark.sql("DROP TABLE v2_ndel")
  }

  test("TRUNCATE TABLE through the catalog: empty, schema kept, re-insertable") {
    val d = dir("trunc")
    TxTable(spark, d).overwrite(df(0 until 50, "t"))
    spark.sql("DROP TABLE IF EXISTS v2_trunc")
    spark.sql(s"CREATE TABLE v2_trunc USING txtable LOCATION '$d'")
    spark.sql("TRUNCATE TABLE graft.default.v2_trunc")
    assert(spark.sql("SELECT count(*) AS n FROM graft.default.v2_trunc")
      .head.getLong(0) == 0)
    // schema survived the truncate — an insert lands on the same shape
    spark.sql("INSERT INTO graft.default.v2_trunc VALUES (7, 'back', 7.5)")
    val r = spark.sql(
      "SELECT id, name, score FROM graft.default.v2_trunc").head
    assert((r.getLong(0), r.getString(1), r.getDouble(2)) == ((7L, "back", 7.5)))
    spark.sql("DROP TABLE v2_trunc")
  }

  test("catalog-qualified UPDATE and MERGE route onto the transactional API") {
    import spark.implicits._
    val d = dir("dml")
    TxTable(spark, d).overwrite(df(0 until 100, "u"))
    spark.sql("DROP TABLE IF EXISTS v2_dml")
    spark.sql(s"CREATE TABLE v2_dml USING txtable LOCATION '$d'")
    spark.sql("UPDATE graft.default.v2_dml SET score = score * 2 WHERE id < 10")
    assert(spark.sql(
      "SELECT CAST(round(sum(score), 1) AS DOUBLE) AS s " +
        "FROM graft.default.v2_dml WHERE id < 10")
      .head.getDouble(0) == (0 until 10).map(_ * 3.0).sum)
    Seq((5L, "merged", 100.0), (200L, "new", 1.0))
      .toDF("id", "name", "score").createOrReplaceTempView("v2_dml_src")
    spark.sql("""MERGE INTO graft.default.v2_dml t USING v2_dml_src s
                |ON t.id = s.id
                |WHEN MATCHED THEN UPDATE SET score = s.score
                |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(
      "SELECT score FROM graft.default.v2_dml WHERE id = 5")
      .head.getDouble(0) == 100.0)
    assert(spark.sql(
      "SELECT count(*) AS n FROM graft.default.v2_dml WHERE id = 200")
      .head.getLong(0) == 1)
    spark.sql("DROP TABLE v2_dml")
  }
}
