package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming over the `events` table — the genuinely new
  * execution surface vs the reference (which has no streaming; SURVEY
  * §1.1): the same tumbling-window aggregation as the batch Q20, plus
  * stateful sessionization.
  *
  * Design: the *transformations* are defined against an input
  * `DataFrame` that may be batch or streaming — one definition, two
  * runners — which is exactly Spark's unified-API contract. Tests
  * assert stream(availableNow) ≡ batch on the fixture.
  *
  * Scale: windowed aggregation state is keyed by (window), partial
  * aggregation happens before the shuffle, and the watermark bounds
  * state size; sessionization state is keyed by user_id and evicted
  * via processing-time-free event-time timeout.
  */
object EventsStream {

  /** Streaming twin of [[graft.core.Tables.events]]. File streaming
    * sources need a declared schema, and the events fixture's `ts`
    * physical type has varied across fixture generations
    * (TIMESTAMP(NANOS) → long under nanosAsLong; current fixtures are
    * plain micros → TimestampType) — so take the schema from ONE batch
    * footer read of the same file and normalize `ts` exactly the way
    * the batch reader does. */
  def readEventsStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // the shipped fixture is a single FILE in a dir of other tables
    // (stream the dir with a glob filter — the file source needs a
    // directory path); a Spark-written fixture (MakeScaled's 10×
    // point) is a DIRECTORY of part files — stream it directly, the
    // glob would match nothing
    val evPath = new org.apache.hadoop.fs.Path(s"$dir/events.parquet")
    val isDir = evPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .getFileStatus(evPath).isDirectory
    val raw =
      if (isDir) spark.readStream.schema(schema).parquet(evPath.toString)
      else spark.readStream
        .schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(dir)
    if (schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
    else raw
  }

  /** Tumbling 1-hour window counts/sums with a 1-hour watermark —
    * the streaming twin of Relational.q20TimeBucket. Works unchanged
    * on a batch DataFrame (watermark is a no-op there). */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("window.start").as("window_start"), col("n_events"),
        col("sum_value"))

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class SessionState(start: Long, end: Long, nEvents: Long, sumValue: Double)
  final case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  /** Timestamp ⇄ microseconds without precision loss
    * (`Timestamp.getTime` alone is millis — it silently drops the
    * microsecond part the fixtures carry). */
  private def tsMicros(t: java.sql.Timestamp): Long =
    t.getTime / 1000 * 1000000L + t.getNanos / 1000
  private def microsTs(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(us / 1000)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  /** Event-time sessionization with a `gap` inactivity timeout via
    * `flatMapGroupsWithState` — the custom-state surface
    * (KeyValueGroupedDataset). Emits a session when the watermark
    * passes its end + gap. State tracks microseconds so emitted
    * sessions are bit-identical to the batch formulation
    * ([[sessionizeBatch]]). */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(UserSession(userId, microsTs(s.start),
              microsTs(s.end), s.nEvents, s.sumValue))
          } else {
            // merge the micro-batch's rows into the open session;
            // close-and-emit any session the new rows have out-gapped
            val sorted = rows.toSeq.sortBy(e => tsMicros(e.ts))
            var open = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[UserSession]
            sorted.foreach { e =>
              val t = tsMicros(e.ts)
              open match {
                case Some(s) if t - s.end <= gapUs =>
                  open = Some(SessionState(s.start, math.max(s.end, t),
                    s.nEvents + 1, s.sumValue + e.value))
                case Some(s) =>
                  closed += UserSession(userId, microsTs(s.start),
                    microsTs(s.end), s.nEvents, s.sumValue)
                  open = Some(SessionState(t, t, 1, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              // timeout API is millisecond-based; round up so the
              // session never times out early
              state.setTimeoutTimestamp((s.end + gapUs) / 1000 + 1)
            }
            closed.iterator
          }
      }
  }

  /** The SAME sessionization on Spark 4's arbitrary-stateful-processing
    * v2 surface (`transformWithState`): a [[StatefulProcessor]] with an
    * explicit [[org.apache.spark.sql.streaming.ValueState]] and
    * event-time TIMERS instead of `flatMapGroupsWithState`'s implicit
    * single-slot state + timeout. What the v2 API buys at scale:
    * multiple named state variables per key (value/list/map), per-state
    * TTL, and timer multiplexing — the shape long-running production
    * pipelines migrate to; requires the RocksDB state store (set by
    * [[withStatePartitions]]). Session semantics are bit-identical to
    * [[sessionize]]/[[sessionizeBatch]] (micros arithmetic, same gap
    * rule), gated against the same relational oracle (s13). */
  def sessionizeTws(events: Dataset[Event], gapMinutes: Int = 30): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.TimeMode
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapUs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** v2 stateful sessionizer: one ValueState slot holding the open
    * session, one registered event-time timer at its close instant.
    * Updating the open session MOVES the timer (delete + re-register)
    * so at most one timer per key is live; a defensive staleness check
    * in the expiry handler keeps correctness independent of that
    * invariant. */
  private final class SessionProcessor(gapUs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, Event, UserSession] {
    import org.apache.spark.sql.streaming.{ExpiredTimerInfo, TimerValues, TTLConfig, ValueState}

    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      state = getHandle.getValueState[SessionState]("session",
        org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)

    /** Timer instant for an open session: ms-rounded UP so the session
      * never closes early (the [[sessionize]] rule). */
    private def timerOf(s: SessionState): Long = (s.end + gapUs) / 1000 + 1

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[UserSession] = {
      val sorted = rows.toSeq.sortBy(e => tsMicros(e.ts))
      var open = if (state.exists()) Some(state.get()) else None
      open.foreach(s => getHandle.deleteTimer(timerOf(s)))
      val closed = scala.collection.mutable.ArrayBuffer.empty[UserSession]
      sorted.foreach { e =>
        val t = tsMicros(e.ts)
        open match {
          case Some(s) if t - s.end <= gapUs =>
            open = Some(SessionState(s.start, math.max(s.end, t),
              s.nEvents + 1, s.sumValue + e.value))
          case Some(s) =>
            closed += UserSession(userId, microsTs(s.start),
              microsTs(s.end), s.nEvents, s.sumValue)
            open = Some(SessionState(t, t, 1, e.value))
          case None =>
            open = Some(SessionState(t, t, 1, e.value))
        }
      }
      open match {
        case Some(s) => state.update(s); getHandle.registerTimer(timerOf(s))
        case None    => state.clear()
      }
      closed.iterator
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[UserSession] = {
      if (state.exists()) {
        val s = state.get()
        // stale-timer guard: only close if THIS timer is the session's
        if (timerOf(s) <= expired.getExpiryTimeInMs) {
          state.clear()
          Iterator(UserSession(userId, microsTs(s.start),
            microsTs(s.end), s.nEvents, s.sumValue))
        } else Iterator.empty
      } else Iterator.empty
    }
  }

  /** Batch sessionization — same session semantics as [[sessionize]]
    * expressed relationally (lag-gap flag → running session index →
    * group), so it is SQL-oracle-checkable and serves as the batch
    * twin of the stateful streaming path. Sum in exact decimal (the
    * fixture's value column is 2dp). */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val order = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val gapS = gapMinutes * 60L
    events
      // fractional-second gap compare (ts carries sub-second parts;
      // unix_timestamp truncates and could flip boundary decisions
      // vs the ns-precise oracle)
      .withColumn("new_sess",
        when(col("ts").cast("double") -
          lag(col("ts"), 1).over(order).cast("double") > gapS, 1)
          .otherwise(0))
      .withColumn("sess_id", sum(col("new_sess")).over(
        order.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_id")
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double")
          .as("sum_value"))
      .drop("sess_id")
      .orderBy("user_id", "session_start")
  }

  /** Duplicate-tolerant ingest: at-least-once sources (replayed
    * files, Kafka/Kinesis redelivery) deduplicated on event_id with
    * watermark-bounded state — `dropDuplicatesWithinWatermark` keeps
    * a key's state only until the watermark passes it, so state size
    * tracks the event-time window, not the stream length (the
    * unbounded-state hazard of plain `dropDuplicates` at 100 TB).
    * Emits rows in append mode as they arrive (dedup holds state, not
    * rows).
    *
    * Contract: duplicates are dropped only while their key's state is
    * live — a replay arriving after the watermark has advanced past
    * its event time + the delay re-emits. That is the standard
    * watermark-dedup tradeoff: bounded state buys you dedup within
    * the lateness horizon, not exactly-once over arbitrary replays
    * (size the watermark to the source's redelivery window; a
    * downstream [[graft.ops.Dedup.exactDedup]] pass catches the
    * stragglers). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream interval join: each purchase joined to the same
    * user's clicks within the trailing `windowMinutes` — the
    * two-sided-state streaming surface (both sides buffer rows until
    * the watermark passes the join window, so state is bounded by
    * event-time width, not stream length). Inner join; the time-range
    * predicate is what lets Spark evict state. */
  def purchaseClickJoin(purchases: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 60): DataFrame = {
    val p = purchases.withWatermark("ts", s"$windowMinutes minutes")
      .select(col("event_id").as("purchase_id"),
        col("user_id"), col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", s"$windowMinutes minutes")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("c_ts") <= col("p_ts"))
      .select("purchase_id", "click_id", "user_id")
  }

  /** S12 — watermarked stream-stream LEFT OUTER interval join: the
    * attribution funnel every events pipeline builds — every purchase
    * emits, joined to same-user clicks in the trailing window, and a
    * purchase with NO click emits a null-click row once the watermark
    * closes its window (the engine can only then prove no match will
    * arrive). Same bounded two-sided state as the inner form
    * ([[purchaseClickJoin]]); the null emissions are the part the
    * inner join cannot express.
    *
    * Operational contract (the production gotcha): unmatched rows are
    * emitted by the WATERMARK, so a drained/quiesced stream withholds
    * its tail until new events advance it — pipelines that drain (or
    * backfill with availableNow) append a far-future heartbeat per
    * side ([[stageEventsWithSentinel]]) and filter it downstream. */
  def purchaseClickLeftJoin(purchases: DataFrame, clicks: DataFrame,
      windowMinutes: Int = 60): DataFrame = {
    val p = purchases.withWatermark("ts", s"$windowMinutes minutes")
      .select(col("event_id").as("purchase_id"),
        col("user_id"), col("ts").as("p_ts"))
    val c = clicks.withWatermark("ts", s"$windowMinutes minutes")
      .select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("ts").as("c_ts"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("c_ts") <= col("p_ts"),
      "left_outer")
      .select("purchase_id", "click_id", "user_id")
  }

  /** Sentinel user id for the watermark heartbeat — callers filter
    * `user_id === SentinelUser` out of join output. */
  val SentinelUser: Long = -999999L

  /** Stage the events fixture into `stagedDir` plus ONE far-future
    * sentinel row per join side (purchase + click, user
    * [[SentinelUser]], ts = max + 2 days): the watermark heartbeat
    * that lets a drained outer join flush its unmatched tail — null
    * emissions fire only when the watermark passes a purchase's
    * window, and with availableNow the watermark stops at the last
    * real event otherwise. Returns the staged path to `readStream`. */
  def stageEventsWithSentinel(spark: SparkSession, fixtureDir: String,
      stagedDir: String): String = GateTimers.timed("stage") {
    val ev = graft.core.Tables.events(spark, fixtureDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val maxTs = ev.agg(max(col("ts"))).head.getTimestamp(0)
    val far = new java.sql.Timestamp(maxTs.getTime + 48L * 3600 * 1000)
    val sentinels = Seq("purchase", "click").zipWithIndex.map {
      case (tpe, i) => (-1L - i, far, SentinelUser, tpe, 0.0)
    }
    import spark.implicits._
    ev.unionByName(sentinels
        .toDF("event_id", "ts", "user_id", "event_type", "value"))
      .write.mode("overwrite").parquet(stagedDir)
    stagedDir
  }

  /** S5 — stream-static join: the live stream enriched/filtered
    * against a BATCH-computed dimension (here: the high-value-user
    * set). Stream-static inner joins are STATELESS — every
    * micro-batch hash-joins the static side (broadcast: it's
    * dimension-sized), no watermark, no state store — which is why
    * this is the default enrichment shape at 100 TB stream volume;
    * the stream-stream form ([[purchaseClickJoin]]) is reserved for
    * when both sides move. */
  def streamStaticEnrich(stream: DataFrame, staticDim: DataFrame): DataFrame =
    stream.join(
      org.apache.spark.sql.functions.broadcast(staticDim), Seq("user_id"))

  /** Drain a streaming DataFrame to a parquet sink with the
    * availableNow trigger and read the result back — the production
    * shape for high-volume streams (distributed write, nothing
    * driver-bound; the memory-sink variant below is for small
    * aggregated outputs only). */
  def runAvailableNowToParquet(spark: SparkSession, streaming: DataFrame,
      dir: String): DataFrame =
    withStatePartitions(spark, rocksDb = needsRocksDb(streaming)) {
    // the drain (microbatch scheduling, state-store commits/fsyncs,
    // watermark advance) is the variance-dominated phase of every
    // streaming gate — timed separately so bench deltas attribute
    GateTimers.timed("drain") {
      val q = streaming.writeStream
        .format("parquet")
        .option("path", s"$dir/out")
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      assertStateWithinBound(spark, q)
    }
    spark.read.parquet(s"$dir/out")
  }

  /** foreachBatch keyed upsert — the "merge into latest-per-key
    * table" pattern on PLAIN parquet (no table format): each batch
    * rewrites the whole keyed state, O(table) per microbatch — kept
    * as the format-free baseline and as the contrast case the Stress
    * harness measures; the SCALE path is [[runForeachBatchUpsertTx]],
    * whose copy-on-write merge rewrites only touched buckets.
    * Each microbatch:
    *   1. reduces the batch to its latest row per user_id (hash
    *      aggregate with map-side partials — max_by over the
    *      (ts, event_id) ordering struct, event_id unique ⇒
    *      deterministic under any file-to-batch assignment);
    *   2. unions the current state table and re-reduces (state is
    *      one row per key, so the merge input is |keys| + |batch|
    *      rows — bounded, never the full history);
    *   3. writes the merged state to a NEW versioned dir and flips
    *      the pointer only after the write commits — a crash
    *      mid-write leaves the previous version intact (the swap
    *      discipline of [[graft.core.IOManager.compact]]).
    * Restart safety: foreachBatch replays the last uncommitted batch
    * with the SAME batchId after a crash; the merge is idempotent
    * (latest-per-key of a superset is unchanged) and the rewrite
    * targets the same versioned dir, so replays converge. The
    * previous-state pointer is derived FROM DISK inside each batch
    * (highest committed `state_k`, k < batchId) — never from driver
    * memory — so a restarted JVM whose checkpoint skips the already-
    * committed batches merges against the last committed state, not
    * against nothing (round-3 ADVICE: the @volatile-var pointer lost
    * all prior state on restart). The upsert is associative/
    * commutative across batches, so the final state equals the
    * batch-global latest — StreamingSpec pins that (including a
    * simulated restart), the s7 oracle gates it.
    *
    * DEPRECATED in favor of [[runForeachBatchUpsertTx]]: this path
    * rewrites the WHOLE state table every batch — O(state) bytes per
    * commit (the Stress table measures ×12 bytes under ×64 state) —
    * where the TxTable merge rewrites only touched buckets. The gate
    * is retained as the scaling CONTRAST baseline for that table;
    * new pipelines should not copy this shape. */
  @deprecated("O(state) rewrite per batch — use runForeachBatchUpsertTx " +
    "(copy-on-write merge, O(touched buckets))", "round-6")
  def runForeachBatchUpsert(spark: SparkSession, events: DataFrame,
      workDir: String): DataFrame = withStatePartitions(spark) {
    val q = events.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val asState = batch.select(col("user_id"),
          col("event_id").as("last_event_id"), col("ts").as("last_ts"),
          col("value").as("last_value"))
        val merged = latestStateDir(spark, workDir, below = Some(batchId)) match {
          case Some(p) => latest(spark.read.parquet(p).unionByName(asState))
          case None    => latest(asState)
        }
        val dst = s"$workDir/state_$batchId"
        merged.write.mode("overwrite").parquet(dst)
        ()
      }
      .option("checkpointLocation", s"$workDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    GateTimers.timed("drain") { q.awaitTermination() }
    spark.read.parquet(latestStateDir(spark, workDir, below = None).getOrElse(
      sys.error("foreachBatch upsert ran zero microbatches")))
  }

  /** Latest-per-key reduction shared by the upsert sinks: max_by over
    * the (ts, event_id) ordering struct — hash aggregate with
    * map-side partials, event_id unique ⇒ deterministic under any
    * file-to-batch assignment. */
  private def latest(df: DataFrame): DataFrame =
    df.groupBy("user_id")
      .agg(max_by(
        struct(col("last_event_id"), col("last_ts"), col("last_value")),
        struct(col("last_ts"), col("last_event_id"))).as("m"))
      .select(col("user_id"), col("m.last_event_id").as("last_event_id"),
        col("m.last_ts").as("last_ts"), col("m.last_value").as("last_value"))

  /** The same keyed upsert expressed ON [[graft.core.TxTable]] — the
    * "batch body is a MERGE INTO" shape, now literally a copy-on-write
    * merge. The state table is hash-bucketed by user_id; each
    * microbatch:
    *   1. reduces the batch to its latest row per user_id;
    *   2. MERGEs it into the table — only the buckets containing the
    *     batch's keys are read and rewritten, untouched buckets are
    *     carried by reference (TxTableSpec pins byte-identity), so
    *     per-batch cost is O(batch + touched buckets), never O(table)
    *     — the round-4 full-state-rewrite scale-killer removed;
    *   3. tags the commit with (appId, batchId): a replayed batch
    *     (crash after commit, before checkpoint) sees its own tag via
    *     lastTxn and NO-OPS — exactly-once by protocol, not by value
    *     idempotence (StreamingSpec replays a batch and pins zero new
    *     versions);
    *   - restart recovery is the commit log itself: a resumed driver's
    *     first batch merges against the last committed snapshot;
    *   - the snapshot history IS the batch lineage: time travel to
    *     version k reproduces the table as of microbatch k, and
    *     vacuum/expireSnapshots bound its storage. */
  def runForeachBatchUpsertTx(spark: SparkSession, events: DataFrame,
      tableDir: String, nBuckets: Int = 16): DataFrame =
    withStatePartitions(spark) {
      // stats off: a per-microbatch min/max scan is the wrong trade
      // at streaming rates; compact through a stats-on handle later
      // if the state table needs zone maps. Copy-on-write upsert by
      // choice: at this fixture scale (buckets ≈ batch) CoW's single
      // write job beats the merge-on-read upsert's extra per-commit
      // jobs (measured 3.1 s vs 3.9 s warm) — open the table with
      // deletionVectors=true when buckets ≫ batch and the rewrite
      // bytes, not the job constants, dominate
      val t = graft.core.TxTable(spark, tableDir, statsOnWrite = false)
      val q = events.writeStream
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          upsertBatchTx(t, batch, batchId, nBuckets)
        }
        .option("checkpointLocation", s"$tableDir/_ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      GateTimers.timed("drain") { q.awaitTermination() }
      t.read()
    }

  /** One microbatch of the TxTable upsert — factored out so the spec
    * can replay a batch against a live table and assert the
    * exactly-once no-op. Exactly-once contract: Structured Streaming
    * replays at most the LAST uncommitted batch, so the only
    * legitimate duplicate is batchId == lastTxn — that no-ops. A
    * batchId BELOW lastTxn means the checkpoint was reset against a
    * live table (a fresh stream restarts at 0); silently no-op'ing
    * every batch up to lastTxn would discard the new stream's data,
    * so fail loudly instead (resume by pointing the new stream at a
    * new table / new txn app id — the Delta txnAppId discipline). */
  private[graft] def upsertBatchTx(t: graft.core.TxTable, batch: Dataset[Row],
      batchId: Long, nBuckets: Int): Unit = {
    val last = t.lastTxn(UpsertAppId)
    if (last.contains(batchId)) return // crash-after-commit replay: committed
    last.foreach(l => require(batchId > l,
      s"batchId $batchId < last committed $l for app $UpsertAppId — " +
        "checkpoint reset against a live table; use a fresh table dir " +
        "or txn app id instead of silently dropping batches"))
    val asState = latest(batch.select(col("user_id"),
      col("event_id").as("last_event_id"), col("ts").as("last_ts"),
      col("value").as("last_value")))
    if (t.latestVersion.isEmpty)
      t.overwriteBucketed(asState, Seq("user_id"), nBuckets,
        txn = Some(UpsertAppId -> batchId))
    else
      // sourceIsPinned: a foreachBatch microbatch is offset-pinned
      // and `latest` tie-breaks on the unique event_id, so the merge
      // may re-evaluate it instead of paying a localCheckpoint write
      // per commit (the fixed ~0.4 s/batch the round-5 audit flagged).
      // touchAllBuckets: an events microbatch spans the user keyspace,
      // so bucket discovery would find the full range anyway — skip
      // the discovery job and its planning gap (correct superset plan)
      t.merge(asState, txn = Some(UpsertAppId -> batchId),
          sourceIsPinned = true, touchAllBuckets = true) { (existing, src) =>
        latest(existing.unionByName(src))
      }
    ()
  }

  private[graft] val UpsertAppId = "graft_upsert_tx"

  /** S16 — streaming dedup-on-ingest with the dedup state IN THE SINK
    * TABLE, not the state store. The naive spelling — stateful
    * `dropDuplicates("event_id")` — keeps every key EVER SEEN in the
    * streaming state store forever: at ingest scale the store grows
    * without bound until the job dies (the exact hazard [[dedupStream]]
    * documents and s3 avoids). The watermark spelling bounds state by
    * an event-time horizon but re-admits replays older than it. This
    * spelling has NO stateful streaming operator at all: each
    * microbatch is reduced to its distinct keys (a batch-scoped
    * aggregate — memory ∝ batch) and MERGEd insert-if-absent into an
    * event_id-bucketed [[graft.core.TxTable]]; the not-matched
    * anti-join probes only the buckets the batch's keys hash into, so
    * per-batch cost is O(batch + touched buckets) and the key history
    * lives where it already had to live — in the sink. Exactly-once
    * across restarts by the (appId, batchId) txn tag, the
    * [[upsertBatchTx]] discipline: a replayed batch sees its own tag
    * and no-ops, so not even a crash duplicates a key. */
  def runDedupIngestTx(spark: SparkSession, events: DataFrame,
      tableDir: String, nBuckets: Option[Int] = None,
      expectedKeys: Option[Long] = None,
      avgRowBytes: Int = 64): DataFrame =
    withStatePartitions(spark) {
      require(nBuckets.isEmpty || expectedKeys.isEmpty,
        "specify nBuckets OR expectedKeys, not both — an explicit bucket " +
          "count silently overriding the sizing discipline is how a " +
          "mis-sized sink ships")
      val buckets = expectedKeys
        .map(dedupIngestBuckets(_, avgRowBytes))
        .orElse(nBuckets)
        .getOrElse(16) // fixture-scale default; size from the corpus at scale
      val t = graft.core.TxTable(spark, tableDir, statsOnWrite = false)
      val q = events.writeStream
        .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
          dedupIngestBatchTx(t, batch, batchId, buckets)
        }
        .option("checkpointLocation", s"$tableDir/_ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      GateTimers.timed("drain") { q.awaitTermination() }
      t.read()
    }

  /** Bucket count for a dedup-ingest sink expected to hold
    * `expectedKeys` keys — the srpAutoSize discipline applied to the
    * sink: buckets ∝ corpus ÷ target bucket bytes, so a bucket stays
    * ~`targetBucketBytes` however large the corpus grows and the
    * per-batch copy-on-write rewrite cost stays
    * O(batch keys × bucket bytes) — FLAT in sink size — instead of
    * growing with the table as a fixed count fills (round-14 probe:
    * ~1.4× per-batch growth across a 4× sink at nBuckets=16).
    * `expectedKeys` only matters at TABLE BIRTH (the bucket layout is
    * fixed at the first commit; later calls inherit it) — when the
    * estimate was wrong, [[rebucketDedupIngest]] is the migration. */
  def dedupIngestBuckets(expectedKeys: Long, avgRowBytes: Int = 64,
      targetBucketBytes: Long = 128L << 20): Int = {
    require(expectedKeys > 0 && avgRowBytes > 0 && targetBucketBytes > 0,
      s"dedupIngestBuckets: positive sizes required, got keys=" +
        s"$expectedKeys rowBytes=$avgRowBytes target=$targetBucketBytes")
    val n = math.ceil(
      expectedKeys.toDouble * avgRowBytes / targetBucketBytes)
    math.max(1, math.min(1 << 20, n).toInt)
  }

  /** OPTIMIZE migration for a dedup-ingest sink whose bucket count no
    * longer matches its size (the expectedKeys estimate was wrong, or
    * the corpus outgrew it): ONE O(table) bucketed rewrite under the
    * SAME exactly-once txn anchor, so the suspended stream resumes
    * against the new layout without replaying or dropping a batch.
    * Run it between stream runs — never concurrently with ingest (the
    * commit race would refuse one side, but the loser's work is
    * wasted). */
  def rebucketDedupIngest(spark: SparkSession, tableDir: String,
      newBuckets: Int): Unit = {
    val t = graft.core.TxTable(spark, tableDir, statsOnWrite = false)
    val last = t.lastTxn(DedupIngestAppId).getOrElse(sys.error(
      s"$tableDir carries no $DedupIngestAppId txn tag — not a " +
        "dedup-ingest sink; refusing to rewrite an unrelated table"))
    t.overwriteBucketed(t.read(), Seq("event_id"), newBuckets,
      txn = Some(DedupIngestAppId -> last))
    ()
  }

  /** One dedup-ingest microbatch — factored out so the spec can
    * replay a batch against a live table and assert the exactly-once
    * no-op (same contract as [[upsertBatchTx]]). */
  private[graft] def dedupIngestBatchTx(t: graft.core.TxTable,
      batch: Dataset[Row], batchId: Long, nBuckets: Int): Unit = {
    val last = t.lastTxn(DedupIngestAppId)
    if (last.contains(batchId)) return // crash-after-commit replay
    last.foreach(l => require(batchId > l,
      s"batchId $batchId < last committed $l for app $DedupIngestAppId — " +
        "checkpoint reset against a live table; use a fresh table dir " +
        "or txn app id instead of silently dropping batches"))
    // redelivery can land INSIDE one batch too: reduce batch-locally
    // first. max over the payload struct, not dropDuplicates — the
    // surviving row is deterministic under any file-to-batch split
    // (redelivered rows are identical, so max picks that row; a
    // genuinely conflicting payload resolves stably, not by partition
    // order)
    val payload = batch.columns.filterNot(_ == "event_id").toSeq
    val deduped = batch.groupBy("event_id")
      .agg(max(struct(payload.map(col): _*)).as("__p"))
      .select(col("event_id") +: payload.map(c => col(s"__p.$c").as(c)): _*)
    if (t.latestVersion.isEmpty)
      t.overwriteBucketed(deduped, Seq("event_id"), nBuckets,
        txn = Some(DedupIngestAppId -> batchId))
    else
      // insert-if-absent MERGE: matched keys (already ingested — the
      // cross-batch redelivery) fall through untouched, new keys
      // insert; only buckets holding the batch's keys are read
      t.mergeClauses(deduped,
        Map("event_id" -> graft.core.TxTable.srcCol("event_id")),
        notMatched = Seq(graft.core.TxTable.MergeInsert(None,
          payload.map(c => c -> graft.core.TxTable.srcCol(c)).toMap)),
        txn = Some(DedupIngestAppId -> batchId))
    ()
  }

  private[graft] val DedupIngestAppId = "graft_dedup_ingest_tx"

  /** Highest committed `state_<k>` dir under `workDir` (restricted to
    * k < below when merging inside batch `below`: a crash AFTER
    * writing state_N but BEFORE the checkpoint commit leaves state_N
    * on disk and replays batch N — merging N's rows against state_N−1
    * and overwriting state_N converges; merging against state_N
    * itself would read and overwrite the same files). */
  private def latestStateDir(spark: SparkSession, workDir: String,
      below: Option[Long]): Option[String] = {
    val base = new org.apache.hadoop.fs.Path(workDir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) None
    else fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case s if s.startsWith("state_") =>
          s.stripPrefix("state_").toLongOption.map(_ -> st.getPath.toString)
        case _ => None
      })
      .filter { case (k, _) => below.forall(k < _) }
      .sortBy(_._1).lastOption.map(_._2)
  }

  /** Scratch dir for gate/bench runs of the parquet-sink path,
    * deleted on JVM exit (the read-back is lazy, so deletion can't
    * happen inline — repeated bench/dev invocations must not
    * accumulate full copies of the stream under /tmp). */
  def scratchDir(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(); ()
      }
      rm(p.toFile)
    }
    p.toString
  }

  /** Drain a streaming DataFrame through an in-memory sink with the
    * availableNow trigger (bounded run over the fixture) and return
    * the materialized result. */
  def runAvailableNow(spark: SparkSession, streaming: DataFrame,
      queryName: String, outputMode: OutputMode = OutputMode.Append): DataFrame =
    withStatePartitions(spark, rocksDb = needsRocksDb(streaming)) {
      GateTimers.timed("drain") {
        val q = streaming.writeStream
          .format("memory")
          .queryName(queryName)
          .outputMode(outputMode)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        assertStateWithinBound(spark, q)
      }
      spark.table(queryName)
    }

  /** Memory-backed state bound: max state rows per partition
    * (AVERAGE — per-partition counts aren't surfaced in progress)
    * before [[assertStateWithinBound]] refuses. 4 M rows ≈ hundreds
    * of MB of HDFSBackedStateStoreProvider heap per partition (the
    * provider holds the whole key→value map on-heap, plus retained
    * versions) — past it the memory-backed default is no longer a
    * safe choice and the engine says so by name instead of letting
    * the NEXT batch OOM an executor. Override with
    * `spark.graft.maxStateRowsPerPartition`. */
  private val DefaultMaxStateRowsPerPartition = 4L * 1000 * 1000

  /** Post-drain state-size guard (round-16; VERDICT-r15 #2): the
    * round-15 provider match made memory-backed the DEFAULT for
    * watermark/window-bounded state — correct for the operators'
    * bounds, but "watermark-bounded" still means O(keys-in-window ×
    * partitions) heap, and a deployment whose key space outgrows that
    * would OOM silently. This applies the engine's refuse-by-name
    * discipline to STATE SIZE: when the drain ran memory-backed and
    * the observed state rows per partition exceed the documented
    * bound, fail loudly naming the number, the bound, and both
    * escapes (RocksDB provider / explicit bound raise). Post-hoc by
    * construction (progress exists only after batches run) — the
    * guard protects the NEXT run and converts a latent executor OOM
    * into a named refusal. No-op for stateless streams and for the
    * RocksDB provider (spill-capable by design). */
  private def assertStateWithinBound(spark: SparkSession,
      q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    val memoryBacked = spark.conf
      .getOption("spark.sql.streaming.stateStore.providerClass")
      .forall(_.contains("HDFSBackedStateStoreProvider"))
    if (!memoryBacked) return
    val bound = spark.conf.getOption("spark.graft.maxStateRowsPerPartition")
      .map(_.toLong).getOrElse(DefaultMaxStateRowsPerPartition)
    val nParts = math.max(1,
      spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val maxRows = q.recentProgress.iterator
      .flatMap(p => Option(p.stateOperators).iterator.flatten)
      .map(_.numRowsTotal).foldLeft(0L)(math.max)
    val perPartition = (maxRows + nParts - 1) / nParts
    if (perPartition > bound)
      throw new IllegalStateException(
        s"graft state-size guard: ~$perPartition state rows per " +
          s"partition ($maxRows total over $nParts partitions) exceeds " +
          s"spark.graft.maxStateRowsPerPartition=$bound with the " +
          "memory-backed state provider — this key space no longer " +
          "plausibly fits executor heap; set " +
          "SPARK_GRAFT_STATE_PROVIDER=rocksdb (spill-capable) or raise " +
          "the bound explicitly")
  }

  /** True iff the streaming plan contains a transformWithState
    * operator — the one stateful surface that REQUIRES the RocksDB
    * provider; every other runner here carries watermark/window-
    * bounded state (each operator's scaladoc documents its bound). */
  private def needsRocksDb(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collect {
      case p if p.nodeName.startsWith("TransformWithState") => p
    }.nonEmpty

  /** Bounded gate/bench runs: stateful streaming cost here is
    * dominated by per-partition state-store commits (× shuffle
    * partitions × microbatches), not data — run the stream with a
    * small fixed state-partition count and a state provider matched
    * to the STATE BOUND. Round-15 re-measure (after round-14's
    * changelog checkpointing): for the watermark/window-bounded state
    * these runners carry, the memory-backed default provider drains
    * consistently faster AND steadier than RocksDB (same gate set
    * 14.0 s vs 30.9 s; s12 drain 2.7 s vs 15.4 s — RocksDB's
    * per-commit native fsync pattern also read 11 % hypervisor steal
    * where the memory-backed arm read 0.4 %, twice reproduced), so
    * RocksDB is now opt-in: forced where the API requires it
    * (transformWithState — `rocksDb`), or chosen globally via
    * SPARK_GRAFT_STATE_PROVIDER=rocksdb for deployments whose key
    * space outgrows executor memory (the 100 TB unbounded-key case;
    * that choice is a deployment's state-size call, not the
    * operators'). A production deployment sizes the partition count
    * to the real key cardinality; neither knob affects results, and
    * each streaming query pins its partition count at first start
    * (offset log), so this stays per-query. */
  private def withStatePartitions[A](spark: SparkSession, n: Int = 8,
      rocksDb: Boolean = false)(f: => A): A = {
    // normalize + validate: a deployment that typos "RocksDB"/"rocks"
    // must NOT silently get the memory-backed store it believes it
    // opted out of (round-15 ADVICE) — unknown values fail fast
    val provider = (if (rocksDb) "rocksdb"
      else sys.env.getOrElse("SPARK_GRAFT_STATE_PROVIDER", "hdfs")
        .toLowerCase(java.util.Locale.ROOT)) match {
      case "rocksdb" =>
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      case "hdfs" =>
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
      case other => throw new IllegalArgumentException(
        s"SPARK_GRAFT_STATE_PROVIDER must be 'rocksdb' or 'hdfs', got '$other'")
    }
    val confs = Seq(
      "spark.sql.shuffle.partitions" -> n.toString,
      // microbatch bodies are small fixed-shape plans with no joins:
      // AQE buys nothing and costs a re-optimization + an extra stage
      // job per shuffle per batch — measurable against the per-batch
      // constant (batch results are identical either way)
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.streaming.stateStore.providerClass" -> provider,
      // snapshot upload every N commits instead of a full snapshot
      // per commit — the changelog is the per-batch unit of work
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" ->
        "true")
      // measured-then-reverted (round 16): disabling
      // rocksdb.trackTotalNumberOfRows (a read-before-write per put)
      // A/B'd flat on the s13 drain — 3.13/3.42 s tracked vs
      // 3.29/3.65 s untracked in matched-steal windows; at this
      // session-state size the put-path is not the floor. Keep
      // Spark's default (the metric is useful) until a state size
      // where the A/B wins.
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
