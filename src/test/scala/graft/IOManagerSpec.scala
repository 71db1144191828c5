package graft

import org.apache.spark.sql.functions._
import graft.core.{ParquetIOManager, Tables}

/** IO manager: partitioned writes (reference B9) land in Hive layout,
  * reads through basePath prune partitions at plan level. */
class IOManagerSpec extends SparkSpec {

  test("partitionBy write -> hive dirs, dynamic overwrite, pruned read") {
    val io = new ParquetIOManager(spark)
    val dir = java.nio.file.Files.createTempDirectory("iomgr").toString
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    val res = io.write(li, s"$dir/li", partitionBy = Seq("l_returnflag"))
    assert(res.rowCount == li.count())
    val parts = new java.io.File(s"$dir/li").listFiles()
      .filter(_.getName.startsWith("l_returnflag=")).map(_.getName).sorted
    assert(parts.length == 3, parts.mkString(","))
    // pruned read: only one partition's files reach the scan
    val pruned = io.readPartitioned(s"$dir/li", "l_returnflag" -> "R")
    assert(pruned.count() ==
      li.where(col("l_returnflag") === "R").count())
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      "partition filter missing:\n" + plan.take(800))
    // 'all' wildcard semantics: no filter applied
    assert(io.readPartitioned(s"$dir/li", "l_returnflag" -> "all").count()
      == li.count())
    // dynamic partition overwrite replaces only the touched partition
    // (conf restored after — a leaked session-wide dynamic mode
    // changes INSERT OVERWRITE semantics for every later spec)
    val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      val onlyR = li.where(col("l_returnflag") === "R").limit(10)
      io.write(onlyR, s"$dir/li", partitionBy = Seq("l_returnflag"))
      val after = io.read(s"$dir/li")
      assert(after.where(col("l_returnflag") === "R").count() == 10)
      assert(after.where(col("l_returnflag") =!= "R").count() ==
        li.where(col("l_returnflag") =!= "R").count())
    } finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
  }

  test("append with schema growth: mergeSchema read null-backfills old files") {
    import spark.implicits._
    val io = new ParquetIOManager(spark)
    val dir = graft.streaming.EventsStream.scratchDir("io_evolve") + "/t"
    io.append((0 until 10).map(i => (i.toLong, s"n$i")).toDF("id", "name"), dir)
    io.append((10 until 15).map(i => (i.toLong, s"n$i", i * 1.5))
      .toDF("id", "name", "score"), dir)
    val r = io.readMergedSchema(dir)
    assert(r.schema.fieldNames.sorted.toSeq == Seq("id", "name", "score"))
    assert(r.count() == 15)
    assert(r.where(col("score").isNull).count() == 10)
    // retyping an existing column refuses, not coerces
    intercept[IllegalArgumentException](io.append(
      Seq(("x", "y")).toDF("id", "name"), dir))
    // a plain single-footer read of the same dir may miss the new
    // column — the merged read is the documented evolved-read surface
    assert(io.readMergedSchema(dir).where(col("score") > 20).count() ==
      (14 to 14).count(i => i * 1.5 > 20))
  }

  test("compact rewrites a small-file flood into sized files, data intact") {
    val io = new ParquetIOManager(spark)
    val dir = java.nio.file.Files.createTempDirectory("compact").toString
    val src = Tables.events(spark, sf).select("event_id", "user_id", "value")
    src.repartition(32).write.mode("overwrite").parquet(s"$dir/ev")
    def parquetFiles = new java.io.File(s"$dir/ev").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles == 32)
    val r = io.compact(s"$dir/ev", targetFileBytes = 1L * 1024 * 1024)
    assert(r.rowCount == src.count())
    assert(parquetFiles < 32, s"still $parquetFiles files")
    val back = io.read(s"$dir/ev")
    assert(back.exceptAll(src).count() == 0 && src.exceptAll(back).count() == 0)
  }

  test("csv/json-lines round-trip preserves rows and schema") {
    val io = new ParquetIOManager(spark)
    val dir = java.nio.file.Files.createTempDirectory("iofmt").toString
    val src = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    val schema = "o_orderkey LONG, o_custkey LONG, o_totalprice DOUBLE, " +
      "o_orderpriority STRING"
    val w1 = io.writeCsv(src, s"$dir/csv")
    assert(w1.rowCount == src.count())
    val csvBack = io.readCsv(s"$dir/csv", schema)
    assert(csvBack.count() == src.count())
    assert(csvBack.exceptAll(src).count() == 0)
    val w2 = io.writeJsonLines(src, s"$dir/json")
    assert(w2.rowCount == src.count())
    val jsonBack = io.readJsonLines(s"$dir/json", schema)
    assert(jsonBack.exceptAll(src).count() == 0 &&
      src.exceptAll(jsonBack).count() == 0)
  }

  test("json ingest with bad-record capture: rejects quarantined, good rows typed") {
    val io = new ParquetIOManager(spark)
    val dir = java.nio.file.Files.createTempDirectory("iobad").toString
    val lines = Seq(
      """{"id": 1, "name": "alpha", "score": 0.5}""",
      """{"id": 2, "name": "beta", "score": 1.5}""",
      """{"id": 3, "name":""", // truncated mid-object
      """not json at all""",
      """{"id": 4, "name": "delta", "score": 2.0}""")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "data.jsonl"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val (good, rejects) = io.readJsonLinesWithRejects(
      s"$dir/data.jsonl", "id LONG, name STRING, score DOUBLE")
    assert(good.count() == 3)
    assert(good.columns.toSeq == Seq("id", "name", "score"))
    assert(good.select("id").collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(1L, 2L, 4L))
    val raw = rejects.collect().map(_.getString(0)).toSet
    assert(raw == Set("""{"id": 3, "name":""", "not json at all"))
  }

  test("csv ingest with bad-record capture") {
    val io = new ParquetIOManager(spark)
    val dir = java.nio.file.Files.createTempDirectory("iobadcsv").toString
    val lines = Seq("1,alpha,0.5", "2,beta,not_a_number", "3,gamma,2.0")
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "data.csv"),
      String.join("\n", lines: _*).getBytes("UTF-8"))
    val (good, rejects) = io.readCsvWithRejects(
      s"$dir/data.csv", "id LONG, name STRING, score DOUBLE")
    assert(good.count() == 2)
    assert(rejects.collect().map(_.getString(0)).toSeq ==
      Seq("2,beta,not_a_number"))
  }

  test("bucketed tables: join on the bucket key plans without a shuffle") {
    import graft.core.BucketedTables
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_extendedprice")
    val ord = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice")
    BucketedTables.write(li, "bt_lineitem", buckets = 8, "l_orderkey",
      sortCols = Seq("l_orderkey"))
    BucketedTables.write(ord, "bt_orders", buckets = 8, "o_orderkey",
      sortCols = Seq("o_orderkey"))
    try {
      // force the large-large path (no broadcast) to expose the shuffle
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bt_lineitem")
        .join(spark.table("bt_orders"),
          col("l_orderkey") === col("o_orderkey"))
      assert(joined.count() == li.count()) // every lineitem has its order
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      // co-located: bucket layout replaces both shuffle exchanges
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join still shuffles:\n" + plan.take(1200))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS bt_lineitem")
      spark.sql("DROP TABLE IF EXISTS bt_orders")
    }
  }

  test("resize keeps schema and shrinks only large images") {
    // real-PNG fixture images are 16..63 × 16..47 (encoder arithmetic),
    // so 24 leaves both shrink candidates and pass-throughs
    val maxDim = 24
    val media = graft.ops.Multimodal.syntheticMedia(spark, Tables.documents(spark, sf))
    val decoded = graft.ops.Multimodal.decodeImages(media)
    val resized = graft.ops.Multimodal.resizeImages(decoded, maxDim = maxDim)
    val img = resized.toDF().where(col("kind") === "image")
    assert(img.where(greatest(col("meta.width"), col("meta.height")) > maxDim)
      .count() == 0)
    // every shrunk image lands exactly on the target max dim with
    // positive dims (aspect can collapse to 1 px for extreme ratios)
    val shrunk = decoded.toDF().as("a").where(col("a.kind") === "image")
      .where(greatest(col("a.meta.width"), col("a.meta.height")) > maxDim)
      .join(resized.toDF().as("b"), "media_id")
    assert(shrunk.where(
      greatest(col("b.meta.width"), col("b.meta.height")) =!= maxDim).count() == 0)
    assert(shrunk.where(least(col("b.meta.width"), col("b.meta.height")) < 1)
      .count() == 0)
    assert(shrunk.count() > 0)
    // small images pass through byte-identical (the early-exit)
    val small = decoded.toDF().as("a")
      .where(col("a.kind") === "image" &&
        greatest(col("a.meta.width"), col("a.meta.height")) <= maxDim)
      .join(resized.toDF().as("b"), "media_id")
      .where(md5(col("a.bytes")) =!= md5(col("b.bytes")))
    assert(small.count() == 0)
  }
}
