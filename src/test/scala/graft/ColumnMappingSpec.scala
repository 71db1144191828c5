package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}
import graft.core.TxTable
import graft.streaming.EventsStream

/** Column mapping on TxTable — ALTER TABLE RENAME/DROP/ADD COLUMN as
  * METADATA-ONLY commits: physical parquet names are frozen at column
  * birth, the log header carries the logical→physical map, and a
  * dropped column's physical name is retired so re-adding the logical
  * name can never resurrect stale bytes (the Delta column-mapping
  * discipline). */
class ColumnMappingSpec extends SparkSpec {

  private def freshTable(name: String): (TxTable, String) = {
    val dir = EventsStream.scratchDir(name) + "/t"
    (TxTable(spark, dir), dir)
  }

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"name_$i", i * 10.0)).toDF("id", "name", "score")
  }

  /** (path, length) of every data file — the byte-identity probe. */
  private def dataFiles(dir: String): Set[(String, Long)] = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    walk(new java.io.File(dir, "data"))
      .filter(_.getName.endsWith(".parquet"))
      .map(f => f.getAbsolutePath -> f.length()).toSet
  }

  test("rename is metadata-only: zero data rewritten, values read back under the new name") {
    val (t, dir) = freshTable("cm_rename")
    t.overwrite(df(0 until 20))
    val before = dataFiles(dir)
    t.renameColumn("score", "points")
    assert(dataFiles(dir) == before, "rename must not touch data files")
    val r = t.read()
    assert(r.columns.toSeq == Seq("id", "name", "points"))
    assert(r.agg(sum("points")).head.getDouble(0) == (0 until 20).map(_ * 10.0).sum)
    // the old name is gone
    assertThrows[org.apache.spark.sql.AnalysisException] {
      t.read().select("score").collect()
    }
  }

  test("zone-map pruning keeps working on the renamed column (stats stay physical)") {
    val (t, _) = freshTable("cm_prune")
    // 4 disjoint id-ranges → 4 files with tight [min,max]
    t.overwrite(df(0 until 400).repartitionByRange(4, col("id")))
    t.renameColumn("id", "doc_id")
    val all = t.read().inputFiles.length
    assert(all == 4)
    val pruned = t.readWhereRange("doc_id", 150L, 160L)
    assert(pruned.inputFiles.length < all,
      s"expected file-level pruning on the renamed column, scanned ${pruned.inputFiles.length}/$all")
    assert(pruned.count() == 11)
    assert(pruned.agg(min("doc_id")).head.getLong(0) == 150L)
  }

  test("predicate DML binds logical names: deleteWhere/updateWhere on a renamed column") {
    val (t, _) = freshTable("cm_dml")
    t.overwrite(df(0 until 100).repartitionByRange(4, col("id")))
    t.renameColumn("score", "points")
    t.deleteWhere(col("points") >= 900.0) // ids 90..99
    assert(t.read().count() == 90)
    t.updateWhere(col("points") < 50.0, Map("points" -> lit(-1.0)))
    assert(t.read().where(col("points") === -1.0).count() == 5)
    assert(t.read().agg(max("points")).head.getDouble(0) == 890.0)
  }

  test("drop + re-add: stale bytes never resurrect; appends fill the fresh column") {
    val (t, _) = freshTable("cm_drop")
    t.overwrite(df(0 until 10))
    t.dropColumn("score")
    assert(t.read().columns.toSeq == Seq("id", "name"))
    t.addColumn("score", DoubleType)
    // all-NULL: the re-added column has a FRESH physical name, so the
    // old files' score bytes are unreachable
    assert(t.read().where(col("score").isNotNull).count() == 0)
    t.append(df(10 until 15))
    val r = t.read()
    assert(r.count() == 15)
    assert(r.where(col("score").isNotNull).count() == 5)
    assert(r.agg(sum("score")).head.getDouble(0) == (10 until 15).map(_ * 10.0).sum)
  }

  test("append-widening refuses a column name whose physical slot is taken") {
    val (t, _) = freshTable("cm_widen")
    t.overwrite(df(0 until 10))
    t.dropColumn("score")
    import spark.implicits._
    val widened = (0 until 3).map(i => (100L + i, s"w_$i", 1.5)).toDF("id", "name", "score")
    val e = intercept[IllegalArgumentException] { t.append(widened) }
    assert(e.getMessage.contains("ADD COLUMN"),
      s"refusal should point at ALTER TABLE ADD COLUMN — got ${e.getMessage}")
  }

  test("layout columns refuse rename/drop; name collisions refuse") {
    import spark.implicits._
    val (t, _) = freshTable("cm_guard")
    t.overwrite((0 until 10).map(i => (i % 3, i.toLong, s"d_$i")).toDF("pt", "id", "v"),
      partitionBy = Seq("pt"))
    assert(intercept[IllegalArgumentException] {
      t.renameColumn("pt", "pt2")
    }.getMessage.contains("layout"))
    assert(intercept[IllegalArgumentException] {
      t.dropColumn("pt")
    }.getMessage.contains("layout"))
    assert(intercept[IllegalArgumentException] {
      t.renameColumn("id", "v")
    }.getMessage.contains("already has"))
    val (tb, _) = freshTable("cm_guard_b")
    tb.overwriteBucketed(df(0 until 10), Seq("id"), 4)
    assert(intercept[IllegalArgumentException] {
      tb.renameColumn("id", "key")
    }.getMessage.contains("layout"))
  }

  test("time travel reads each version under its own names; restore rewinds the mapping") {
    val (t, _) = freshTable("cm_tt")
    t.overwrite(df(0 until 10))          // v0
    val vRename = t.renameColumn("score", "points") // v1
    t.append(df(10 until 12).withColumnRenamed("score", "points")) // v2
    assert(t.readVersion(0).columns.toSeq == Seq("id", "name", "score"))
    assert(t.readVersion(vRename).columns.toSeq == Seq("id", "name", "points"))
    val vRestore = t.restore(0)
    assert(t.read().columns.toSeq == Seq("id", "name", "score"))
    assert(t.read().count() == 10)
    // the undone rename stays time-travelable
    assert(t.readVersion(2).columns.toSeq == Seq("id", "name", "points"))
    assert(vRestore > vRename)
  }

  test("mapping survives cold log reconstruction and checkpoints") {
    val (t, _) = freshTable("cm_cold")
    t.overwrite(df(0 until 10))
    t.renameColumn("name", "title")
    // push past a checkpoint boundary (interval = 10); appends speak
    // the CURRENT logical names
    (0 until 12).foreach(i => t.append(
      df(100 + i until 101 + i).withColumnRenamed("name", "title")))
    t.invalidateCachedState()
    val r = t.read()
    assert(r.columns.toSeq == Seq("id", "title", "score"))
    assert(r.where(col("title").startsWith("name_")).count() == 22)
  }

  test("copy-on-write upsert works after renaming a non-key column") {
    val (t, _) = freshTable("cm_merge")
    t.overwriteBucketed(df(0 until 50), Seq("id"), 8)
    t.renameColumn("score", "points")
    import spark.implicits._
    val src = Seq((7L, "merged", 777.0), (999L, "new", 1.0))
      .toDF("id", "name", "points")
    t.upsert(src)
    val r = t.read()
    assert(r.count() == 51)
    assert(r.where(col("id") === 7L).head.getAs[Double]("points") == 777.0)
    assert(r.where(col("id") === 999L).count() == 1)
  }

  test("change feeds reset across an alter commit (frame shape changed)") {
    val (t, _) = freshTable("cm_feed")
    t.overwrite(df(0 until 10))
    val v = t.append(df(10 until 12))
    t.renameColumn("score", "points")
    val e = intercept[RuntimeException] { t.changesSince(v).count() }
    assert(e.getMessage.contains("reset"))
  }

  test("CDF merge after a rename serves logical names in the change feed") {
    val (t, _) = freshTable("cm_cdf")
    val cdf = TxTable(spark, t.location, changeDataFeed = true)
    cdf.overwriteBucketed(df(0 until 20), Seq("id"), 4)
    cdf.renameColumn("score", "points")
    val vBefore = cdf.latestVersion.get
    import spark.implicits._
    cdf.upsert(Seq((3L, "upd", 333.0)).toDF("id", "name", "points"))
    val feed = cdf.changeFeed(vBefore)
    assert(feed.columns.contains("points") && !feed.columns.contains("score"))
    val post = feed.where(col(TxTable.ChangeTypeCol) === "update_postimage")
    assert(post.count() == 1 && post.head.getAs[Double]("points") == 333.0)
  }

  test("SQL verbs: ALTER TABLE RENAME/DROP/ADD COLUMN route through the mapping API") {
    val (t, dir) = freshTable("cm_sql")
    t.overwrite(df(0 until 10))
    spark.sql(s"ALTER TABLE txtable.`$dir` RENAME COLUMN score TO points")
    spark.sql(s"ALTER TABLE txtable.`$dir` DROP COLUMN name")
    spark.sql(s"ALTER TABLE txtable.`$dir` ADD COLUMN tag STRING")
    val r = spark.sql(s"SELECT id, points, tag FROM txtable.`$dir` WHERE points >= 50.0")
    assert(r.count() == 5)
    assert(r.schema("tag").dataType == StringType)
    assert(t.read().columns.toSeq == Seq("id", "points", "tag"))
  }

  test("format reads surface logical names with pushed filters intact") {
    val (t, dir) = freshTable("cm_fmt")
    t.overwrite(df(0 until 100).repartitionByRange(4, col("id")))
    t.renameColumn("id", "doc_id")
    val r = spark.read.format("txtable").load(dir).where(col("doc_id") < 10L)
    assert(r.count() == 10)
    assert(r.columns.toSeq == Seq("doc_id", "name", "score"))
    // time travel to the pre-rename snapshot keeps the old name
    val v0 = spark.read.format("txtable").option("versionAsOf", 0).load(dir)
    assert(v0.columns.toSeq == Seq("id", "name", "score"))
  }

  test("schemaAutoMerge refuses a retired physical name instead of resurrecting") {
    import spark.implicits._
    val dir = graft.streaming.EventsStream.scratchDir("cm_automerge") + "/t"
    val t = graft.core.TxTable(spark, dir)
    t.overwriteBucketed(
      (0 until 20).map(i => (i.toLong, i * 1.0, s"t$i")).toDF("id", "v", "tag"),
      bucketCols = Seq("id"), nBuckets = 4)
    t.dropColumn("tag") // physical name 'tag' retires with stale bytes on disk
    t.setProperties(Map("graft.schemaAutoMerge" -> "true"))
    val e = intercept[IllegalArgumentException] {
      t.upsert(Seq((1L, 10.0, "fresh")).toDF("id", "v", "tag"))
    }
    assert(e.getMessage.contains("ADD COLUMN"),
      s"must refuse the retired name loudly, got: ${e.getMessage}")
    // the sanctioned route works: ADD COLUMN assigns a fresh physical
    // name, then the automerge upsert lands with no resurrection
    t.addColumn("tag", org.apache.spark.sql.types.StringType)
    t.upsert(Seq((1L, 10.0, "fresh")).toDF("id", "v", "tag"))
    val r = t.read()
    assert(r.where(col("id") === 1L).head().getAs[String]("tag") == "fresh")
    assert(r.where(col("id") =!= 1L && col("tag").isNotNull).count() == 0,
      "dropped column's stale bytes must not resurrect")
  }
}
