package graft

import org.apache.spark.sql.functions._
import graft.core.TxTable
import graft.streaming.EventsStream

/** TxTable: commit-log transactions on plain parquet — snapshot
  * isolation, time travel, optimistic concurrency, crash-mid-commit
  * invisibility, schema evolution, vacuum + snapshot expiry,
  * compaction-as-commit. */
class TxTableSpec extends SparkSpec {

  private def freshTable(name: String): (TxTable, String) = {
    val dir = EventsStream.scratchDir(name) + "/t"
    (TxTable(spark, dir), dir)
  }

  private def df(ids: Range) = {
    import spark.implicits._
    ids.map(i => (i.toLong, s"name_$i", i * 10.0)).toDF("id", "name", "score")
  }

  test("overwrite + time travel: every committed snapshot stays readable") {
    val (t, _) = freshTable("tx_tt")
    val v0 = t.overwrite(df(0 until 10))
    val v1 = t.overwrite(df(100 until 105))
    assert(v0 == 0 && v1 == 1)
    assert(t.read().count() == 5)
    assert(t.readVersion(0).count() == 10)
    assert(t.readVersion(0).agg(sum("id")).head.getLong(0) == 45)
    assert(t.versions == Seq(0L, 1L))
  }

  test("append accumulates; reads are snapshot-isolated across a commit") {
    val (t, _) = freshTable("tx_iso")
    t.overwrite(df(0 until 10))
    t.append(df(10 until 15))
    val pinned = t.read() // resolves version 1's file list NOW
    assert(pinned.count() == 15)
    t.overwrite(df(500 until 501))
    // the pinned frame re-evaluates against its pinned files, not the
    // new snapshot: immutable data files + manifest-pinned reads
    assert(pinned.count() == 15)
    assert(pinned.agg(max("id")).head.getLong(0) == 14)
    assert(t.read().count() == 1)
  }

  test("crash mid-commit is invisible: data files + tmp manifest, no version") {
    val (t, dir) = freshTable("tx_crash")
    t.overwrite(df(0 until 10))
    // simulate a writer that crashed after landing data files and the
    // tmp manifest but BEFORE the rename that makes the commit live
    df(900 until 950).write.parquet(s"$dir/data/w-crashed")
    val tmp = new java.io.File(s"$dir/_graft_log/.tmp-crashed.json")
    java.nio.file.Files.write(tmp.toPath, "{\"version\":99".getBytes) // torn JSON
    assert(t.versions == Seq(0L), "crashed write must not surface a version")
    assert(t.read().count() == 10, "reader sees only the committed snapshot")
    // recovery IS vacuum: the orphan files and the tmp manifest die,
    // committed files survive
    val deleted = t.vacuum(minAgeMs = 0)
    assert(deleted.exists(_.contains("w-crashed")))
    assert(deleted.exists(_.contains(".tmp-crashed")))
    assert(t.read().count() == 10)
    val next = t.append(df(10 until 12)) // table still writable
    assert(next == 1 && t.read().count() == 12)
  }

  test("optimistic concurrency: losing the race retries onto the next version") {
    val (t, dir) = freshTable("tx_race")
    t.overwrite(df(0 until 5))
    // a second writer claims version 1 out from under this handle
    val other = TxTable(spark, dir)
    other.append(df(5 until 8))
    // this append composes against whatever is latest AT COMMIT time:
    // it must land at version 2 with the racer's rows in its lineage
    val v = t.append(df(8 until 10))
    assert(v == 2)
    assert(t.read().count() == 10)
    assert(t.read().agg(countDistinct("id")).head.getLong(0) == 10)
  }

  test("schema evolution: new column widens, old files null-backfill, pushdown survives") {
    import spark.implicits._
    val (t, _) = freshTable("tx_evolve")
    t.overwrite(df(0 until 10)) // id, name, score
    val wide = (10 until 20).map(i => (i.toLong, s"name_$i", i * 10.0, s"en"))
      .toDF("id", "name", "score", "lang")
    t.append(wide)
    val r = t.read()
    assert(r.schema.fieldNames.toSeq == Seq("id", "name", "score", "lang"))
    assert(r.count() == 20)
    assert(r.where(col("lang").isNull).count() == 10) // v1 files backfilled
    assert(r.where(col("lang") === "en").count() == 10)
    // pushdown/pruning must survive the explicit union schema
    val plan = r.where(col("id") > 15).select("id", "lang")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,15)]"),
      s"filter not pushed to parquet:\n$plan")
    // retyping an existing column must refuse, not coerce
    val bad = (0 until 3).map(i => (s"$i", s"x", 0.0)).toDF("id", "name", "score")
    intercept[IllegalArgumentException](t.append(bad))
  }

  test("appending a SUBSET of columns null-backfills the new files") {
    import spark.implicits._
    val (t, _) = freshTable("tx_subset")
    t.overwrite(df(0 until 5))
    t.append((5 until 8).map(i => (i.toLong, s"name_$i")).toDF("id", "name"))
    val r = t.read()
    assert(r.count() == 8)
    assert(r.where(col("score").isNull).count() == 3)
  }

  test("compact rewrites as a new snapshot; history intact until expiry+vacuum") {
    val (t, dir) = freshTable("tx_compact")
    t.overwrite(df(0 until 1000).repartition(16)) // 16 small files
    t.append(df(1000 until 1100).repartition(8))
    val before = t.read()
    val vCompact = t.compact()
    assert(t.read().count() == 1100)
    assert(t.read().exceptAll(before).count() == 0)
    // compacted snapshot has fewer, larger files
    val dataFiles = (v: Long) => t.readVersion(v).inputFiles.length
    assert(dataFiles(vCompact) < dataFiles(vCompact - 1))
    // pre-compact version still time-travels
    assert(t.readVersion(vCompact - 1).count() == 1100)
    // expire everything but the compacted snapshot, vacuum the rest
    val expired = t.expireSnapshots(keepLast = 1)
    assert(expired == Seq(0L, 1L))
    val deleted = t.vacuum(minAgeMs = 0)
    assert(deleted.nonEmpty, "expired snapshots' files must be reclaimed")
    assert(t.read().count() == 1100, "live snapshot untouched by vacuum")
    intercept[IllegalArgumentException](t.readVersion(0))
  }

  test("8 threads appending concurrently: all commits land, no rows lost") {
    val (t, dir) = freshTable("tx_threads")
    t.overwrite(df(0 until 1))
    val threads = (0 until 8).map { i =>
      new Thread(() => {
        // every thread its own handle, like independent writers
        TxTable(spark, dir).append(df(100 * (i + 1) until 100 * (i + 1) + 10))
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(t.versions == (0L to 8L), s"lost commits: ${t.versions}")
    // every writer's rows present exactly once in the final snapshot
    assert(t.read().count() == 1 + 8 * 10)
    assert(t.read().agg(countDistinct("id")).head.getLong(0) == 81)
    val h = t.history()
    assert(h.count(_._2 == "append") == 8)
  }

  test("history lists every commit with operation and file count") {
    val (t, _) = freshTable("tx_hist")
    t.overwrite(df(0 until 10).repartition(2))
    t.append(df(10 until 12).repartition(1))
    t.compact()
    val h = t.history()
    assert(h.map(x => (x._1, x._2)) ==
      Seq((0L, "overwrite"), (1L, "append"), (2L, "compact")))
    assert(h(1)._3 == h(0)._3 + 1) // append adds its files to v0's
  }

  test("vacuum retention: young unreferenced files survive the sweep") {
    val (t, dir) = freshTable("tx_retention")
    t.overwrite(df(0 until 5))
    df(900 until 910).write.parquet(s"$dir/data/w-inflight")
    // an in-flight writer's files are younger than any sane horizon:
    // the default-retention vacuum must NOT eat them
    assert(t.vacuum().isEmpty)
    assert(spark.read.parquet(s"$dir/data/w-inflight").count() == 10)
  }
}
