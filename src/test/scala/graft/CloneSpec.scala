package graft

import org.apache.spark.sql.functions._
import graft.core.TxTable
import graft.streaming.EventsStream

/** Shallow clone — a zero-copy metadata commit referencing the
  * source's data files by absolute path; the clone evolves
  * independently in its own log/data dir. */
class CloneSpec extends SparkSpec {

  private def freshTable(name: String): (TxTable, String) = {
    val dir = EventsStream.scratchDir(name) + "/t"
    (TxTable(spark, dir), dir)
  }

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"name_$i", i * 10.0)).toDF("id", "name", "score")
  }

  private def dataFileCount(dir: String): Int = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).toSeq.flatMap(walk)
      else Seq(f)
    val d = new java.io.File(dir, "data")
    if (!d.exists()) 0 else walk(d).count(_.getName.endsWith(".parquet"))
  }

  test("clone is zero-copy: no data files land, reads equal the source snapshot") {
    val (src, _) = freshTable("cl_src")
    src.overwrite(df(0 until 100).repartitionByRange(4, col("id")))
    val cloneDir = EventsStream.scratchDir("cl_dst") + "/t"
    val v = src.cloneTo(cloneDir)
    assert(v == 0L)
    val c = TxTable(spark, cloneDir)
    assert(dataFileCount(cloneDir) == 0, "shallow clone must copy no data")
    assert(c.read().count() == 100)
    assert(c.read().exceptAll(src.read()).count() == 0)
    // stats carried: range pruning works on the clone immediately
    val pruned = c.readWhereRange("id", 10L, 15L)
    assert(pruned.inputFiles.length < c.read().inputFiles.length)
    assert(pruned.count() == 6)
  }

  test("clone evolves independently of the source (and vice versa)") {
    import spark.implicits._
    val (src, _) = freshTable("cl_indep")
    src.overwrite(df(0 until 50))
    val cloneDir = EventsStream.scratchDir("cl_indep_dst") + "/t"
    src.cloneTo(cloneDir)
    val c = TxTable(spark, cloneDir)
    // clone-side append lands in the CLONE's data dir only
    c.append(df(100 until 110))
    assert(c.read().count() == 60)
    assert(src.read().count() == 50, "source untouched by clone writes")
    assert(dataFileCount(cloneDir) > 0)
    // clone-side delete rewrites clone-local copies; source untouched
    c.deleteWhere($"id" < 10L)
    assert(c.read().count() == 50)
    assert(src.read().count() == 50)
    // source-side overwrite is invisible to the clone (snapshot pin)
    src.overwrite(df(0 until 1))
    assert(c.read().count() == 50)
    // clone vacuum sweeps only clone-local orphans, never source files
    c.expireSnapshots(keepLast = 1)
    c.vacuum(minAgeMs = 0)
    assert(c.read().count() == 50)
    assert(src.readVersion(0).count() == 50, "source files survive clone vacuum")
  }

  test("clone carries properties, constraints, and column mapping") {
    val (src, _) = freshTable("cl_meta")
    src.overwrite(df(0 until 10))
    src.renameColumn("score", "points")
    src.addCheckConstraint("pts_nonneg", "points >= 0")
    val cloneDir = EventsStream.scratchDir("cl_meta_dst") + "/t"
    src.cloneTo(cloneDir)
    val c = TxTable(spark, cloneDir)
    assert(c.read().columns.toSeq == Seq("id", "name", "points"))
    assert(c.constraints == Map("pts_nonneg" -> "points >= 0"))
    import spark.implicits._
    val e = intercept[Exception] {
      c.append(Seq((99L, "bad", -1.0)).toDF("id", "name", "points"))
    }
    assert(e.getMessage.contains("pts_nonneg"))
    // cloning into a live table refuses
    assert(intercept[IllegalArgumentException] {
      src.cloneTo(cloneDir)
    }.getMessage.contains("already"))
  }

  test("SQL: CREATE TABLE ... SHALLOW CLONE") {
    val (src, srcDir) = freshTable("cl_sql")
    src.overwrite(df(0 until 20))
    val cloneDir = EventsStream.scratchDir("cl_sql_dst") + "/t"
    val r = spark.sql(
      s"CREATE TABLE txtable.`$cloneDir` SHALLOW CLONE txtable.`$srcDir`")
    assert(r.head().getString(0) == "clone")
    assert(spark.sql(s"SELECT count(*) AS n FROM txtable.`$cloneDir`")
      .head().getLong(0) == 20L)
  }

  test("DEEP CLONE copies every live file; no lifetime coupling to the source") {
    import spark.implicits._
    val src0 = EventsStream.scratchDir("clone_deep_src") + "/t"
    val s = graft.core.TxTable(spark, src0)
    s.overwrite((0 until 50).map(i => (i.toLong, i * 1.0)).toDF("id", "v"))
    val dst = EventsStream.scratchDir("clone_deep_dst") + "/t"
    spark.sql(s"CREATE TABLE txtable.`$dst` DEEP CLONE txtable.`$src0`")
    val c = graft.core.TxTable(spark, dst)
    assert(c.read().count() == 50)
    // every entry lives under the CLONE's root (no absolute source refs)
    assert(c.fileEntries(c.latestVersion.get).forall(f =>
      !f.path.startsWith("/") || f.path.startsWith(dst)))
    // the source can die entirely; the deep clone keeps serving
    s.overwrite(Seq((999L, 0.0)).toDF("id", "v"))
    s.expireSnapshots(keepLast = 1)
    s.vacuum(0)
    assert(c.read().count() == 50, "deep clone survives source vacuum")
    // RESTORE ... TIMESTAMP AS OF resolves through the publish clock
    c.append(Seq((100L, 1.0)).toDF("id", "v"))
    val ts = new java.sql.Timestamp(System.currentTimeMillis() + 60000)
    spark.sql(
      s"RESTORE TABLE txtable.`$dst` TO TIMESTAMP AS OF '$ts'").collect()
    assert(c.read().count() == 51, "at-or-after-latest timestamp = latest")
  }
}
