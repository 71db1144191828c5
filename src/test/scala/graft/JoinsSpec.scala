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

  test("as-of join: latest right at-or-before left, nulls when none") {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, 10L), // matches r at t=10 (exactly-equal tie → ≤)
      (2L, 100L, 25L), // matches r at t=20 (latest ≤ 25)
      (3L, 100L, 5L),  // before any right row → null
      (4L, 200L, 50L)  // key with no right rows → null
    ).toDF("l_id", "k", "t")
    val right = Seq(
      (11L, 100L, 10L, "a"),
      (12L, 100L, 20L, "b"),
      (13L, 100L, 30L, "c")
    ).toDF("r_id", "k", "rt", "payload")
    val out = Joins.asOfJoin(left, right, "k", "t", "rt",
      Seq("r_id" -> "r_id", "payload" -> "payload"), "r_id")
      .orderBy("l_id").collect()
    assert(out.map(r => (r.getLong(0),
      Option(r.get(3)), Option(r.get(4)))).toSeq == Seq(
      (1L, Some(11L), Some("a")),
      (2L, Some(12L), Some("b")),
      (3L, None, None),
      (4L, None, None)))
    // left row count always preserved (left-outer)
    assert(Joins.asOfJoin(left, right, "k", "t", "rt",
      Seq("r_id" -> "r_id"), "r_id").count() == left.count())
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
