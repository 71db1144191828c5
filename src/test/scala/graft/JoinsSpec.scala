package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.Joins
import graft.streaming.EventsStream

/** Salted/bucketed join utilities + sessionization batch/stream
  * consistency. */
class JoinsSpec extends SparkSpec {

  test("salted join == plain join (inner + left)") {
    val orders = Tables.orders(spark, sf)
    val customer = Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = orders.join(customer, Seq("o_custkey"))
      .select("o_orderkey", "c_name")
    val salted = Joins.saltedJoin(orders, customer, "o_custkey", salts = 7)
      .select("o_orderkey", "c_name")
    assert(plain.exceptAll(salted).count() == 0)
    assert(salted.exceptAll(plain).count() == 0)
    val leftPlain = orders.join(customer, Seq("o_custkey"), "left")
    val leftSalted = Joins.saltedJoin(orders, customer, "o_custkey", 5, "left")
    assert(leftPlain.count() == leftSalted.count())
    // right-preserving joins would duplicate unmatched right rows
    // `salts` times — rejected up front
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(orders, customer, "o_custkey", 5, "right_outer")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(orders, customer, "o_custkey", 5, "full")
    }
  }

  test("bucketed range join == nested-loop range join") {
    val points = Tables.orders(spark, sf)
      .select(col("o_orderkey"), (col("o_totalprice")).cast("long").as("p"))
    val intervals = spark.range(20).select(
      (col("id") * 25000).as("lo"), (col("id") * 25000 + 30000).as("hi"),
      col("id").as("interval_id"))
    val nested = points.join(intervals,
      col("p") >= col("lo") && col("p") <= col("hi"))
      .select("o_orderkey", "interval_id")
    val bucketed = Joins.bucketedRangeJoin(points, "p", intervals, "lo", "hi",
      bucketWidth = 30000)
      .select("o_orderkey", "interval_id")
    assert(nested.exceptAll(bucketed).count() == 0)
    assert(bucketed.exceptAll(nested).count() == 0)
    assert(nested.count() > 0)
  }

  test("batch sessionization agrees with streaming closed sessions") {
    import spark.implicits._
    val batch = EventsStream.sessionizeBatch(Tables.events(spark, sf))
    // streaming run over the same fixture: every emitted (closed)
    // session must appear identically in the batch result
    val streamIn = EventsStream.readEventsStream(spark, sf)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value")).as[EventsStream.Event]
    val streamed = EventsStream.runAvailableNow(spark,
      EventsStream.sessionize(streamIn).toDF(), "sessions_consistency")
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
    val missing = streamed.exceptAll(
      batch.select("user_id", "session_start", "session_end", "n_events"))
    assert(missing.count() == 0)
    assert(batch.count() >= streamed.count())
  }
}
