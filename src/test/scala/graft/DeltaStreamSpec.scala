package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.core.{DeltaFixture, Tables}
import graft.streaming.EventsStream

/** `spark.readStream.format("delta-log")` — tailing a Delta table's
  * JSON commits as microbatches: batch 0 = pinned full snapshot,
  * later batches = the commit window's adds, restart resumes from the
  * checkpoint WITHOUT rescanning, and non-append commits fail the
  * stream with the reset signal. */
class DeltaStreamSpec extends SparkSpec {

  private lazy val orders = Tables.orders(spark, sf)
    .select("o_orderkey", "o_totalprice", "o_orderpriority")

  private def drain(dir: String, out: String): Long = {
    val q = spark.readStream.format("delta-log").load(dir)
      .writeStream.format("parquet")
      .option("path", s"$out/rows")
      .option("checkpointLocation", s"$out/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    q.recentProgress.map(_.numInputRows).sum
  }

  test("snapshot batch, then restart consumes ONLY appended commits; " +
      "batch read ≡ stream total") {
    val dir = EventsStream.scratchDir("dstream") + "/t"
    val fx = DeltaFixture
    val a = fx.writeData(spark, orders.where(col("o_orderkey") % 3 === 0),
      dir, "part-a.parquet")
    val b = fx.writeData(spark, orders.where(col("o_orderkey") % 3 === 1),
      dir, "part-b.parquet")
    fx.commit(spark, dir, 0, Seq(fx.protocolJson(),
      fx.metaDataJson(orders.schema), fx.addJson(a)))
    fx.commit(spark, dir, 1, Seq(fx.addJson(b)))
    val out = EventsStream.scratchDir("dstream_out")
    val nA = a.rows; val nB = b.rows
    assert(drain(dir, out) == nA + nB, "batch 0 = snapshot at latest")
    // nothing new: the checkpointed offset moves nothing
    assert(drain(dir, out) == 0)
    // two appended commits: ONLY their files are served
    val c = fx.writeData(spark, orders.where(col("o_orderkey") % 3 === 2),
      dir, "part-c.parquet")
    fx.commit(spark, dir, 2, Seq(fx.addJson(c)))
    val d = fx.writeData(spark, orders.limit(0), dir, "part-d.parquet")
    fx.commit(spark, dir, 3, Seq(fx.addJson(d)))
    assert(drain(dir, out) == c.rows)
    // stream total ≡ the batch read of the same table
    val sunk = spark.read.parquet(s"$out/rows")
    assert(sunk.count() == graft.core.DeltaLog.read(spark, dir).count())
    assert(sunk.exceptAll(orders).isEmpty && orders.exceptAll(sunk).isEmpty)
  }

  test("a REMOVE inside the tail window fails the stream with the " +
      "reset signal, never silently skips") {
    val dir = EventsStream.scratchDir("dstream_rm") + "/t"
    val fx = DeltaFixture
    val a = fx.writeData(spark, orders.limit(50), dir, "part-a.parquet")
    fx.commit(spark, dir, 0, Seq(fx.protocolJson(),
      fx.metaDataJson(orders.schema), fx.addJson(a)))
    val out = EventsStream.scratchDir("dstream_rm_out")
    assert(drain(dir, out) == 50)
    val b = fx.writeData(spark, orders.limit(10), dir, "part-b.parquet")
    fx.commit(spark, dir, 1, Seq(fx.removeJson(a.relPath), fx.addJson(b)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(dir, out)
    }
    assert(e.getCause.getMessage.contains("restart the stream"),
      e.getCause.getMessage)
  }

  test("partitioned delta streams: snapshot injects partition values, " +
      "tail commits carry theirs from the log") {
    val dir = EventsStream.scratchDir("dstream_part") + "/t"
    val fx = DeltaFixture
    val schema = orders.schema
    val prios = orders.select("o_orderpriority").distinct()
      .collect().map(_.getString(0)).sorted
    val f0 = fx.writeData(spark,
      orders.where(col("o_orderpriority") === prios.head).drop("o_orderpriority"),
      dir, "p=0/f.parquet")
    fx.commit(spark, dir, 0, Seq(fx.protocolJson(),
      fx.metaDataJson(schema, Seq("o_orderpriority")),
      fx.addJson(f0, Map("o_orderpriority" -> prios.head))))
    val out = EventsStream.scratchDir("dstream_part_out")
    assert(drain(dir, out) == f0.rows)
    val f1 = fx.writeData(spark,
      orders.where(col("o_orderpriority") === prios.last).drop("o_orderpriority"),
      dir, "p=1/f.parquet")
    fx.commit(spark, dir, 1, Seq(
      fx.addJson(f1, Map("o_orderpriority" -> prios.last))))
    assert(drain(dir, out) == f1.rows)
    val sunk = spark.read.parquet(s"$out/rows")
    val want = orders.where(col("o_orderpriority").isin(prios.head, prios.last))
    assert(sunk.exceptAll(want).isEmpty && want.exceptAll(sunk).isEmpty,
      "partition values intact in BOTH the snapshot and the tail batches")
  }
}
