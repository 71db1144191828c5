package graft

import java.time.{Duration, Instant}

import org.apache.hadoop.fs.FileSystem

import graft.core.Orchestrator._
import graft.core.{PipelineStep, RunContext, StepReport, StepResult, TxTable}
import graft.streaming.EventsStream

/** The trigger daemon: schedules catch up one tick per missed window,
  * sensors cursor (restart-safe, never re-fire), txtable sensors
  * react to commits, backfills request exactly the missing keys, and
  * daemon ticks are idempotent against the ledger. */
class OrchestratorSpec extends SparkSpec {

  private def stateDir(tag: String): String =
    EventsStream.scratchDir(s"orch_$tag")

  private def countingJob(runs: scala.collection.mutable.ArrayBuffer[Option[String]])
      : Option[String] => Seq[StepReport] = { pk =>
    runs += pk
    Seq(StepReport("job", ok = true, 0.0, StepResult(), None))
  }

  test("IntervalSchedule: first poll arms without firing; late daemon catches up one request per missed window") {
    val dir = stateDir("sched")
    val sched = new IntervalSchedule("daily", Duration.ofDays(1),
      new CursorStore(dir, "daily"))
    val t0 = Instant.parse("2026-03-10T05:00:00Z")
    assert(sched.poll(t0).isEmpty, "fresh schedule must not replay history")
    // 10 minutes later, same window: nothing due
    assert(sched.poll(t0.plusSeconds(600)).isEmpty)
    // daemon down for 3 days: exactly 3 requests, one per window,
    // keyed by each window's START date
    val due = sched.poll(Instant.parse("2026-03-13T01:00:00Z"))
    assert(due.map(_.partitionKey) ==
      Seq(Some("2026-03-10"), Some("2026-03-11"), Some("2026-03-12")), due)
    // and the cursor advanced: re-poll fires nothing
    assert(sched.poll(Instant.parse("2026-03-13T02:00:00Z")).isEmpty)
  }

  test("sub-daily schedules key by window-start instant — the ledger never collapses a day's windows") {
    val dir = stateDir("hourly")
    val sched = new IntervalSchedule("hourly", Duration.ofHours(1),
      new CursorStore(dir, "hourly"))
    sched.poll(Instant.parse("2026-03-10T00:10:00Z")) // arm
    val due = sched.poll(Instant.parse("2026-03-10T03:10:00Z"))
    val keys = due.flatMap(_.partitionKey)
    assert(keys.size == 3 && keys.distinct.size == 3,
      s"3 hourly windows need 3 DISTINCT keys: $keys")
    assert(keys.forall(_.contains("T")), s"sub-daily keys carry the time: $keys")
  }

  test("NewFileSensor: cursors on mtime+names, restart-safe, no re-fire") {
    val dir = stateDir("files")
    val watched = s"$dir/incoming"
    val fs = FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
    new java.io.File(watched).mkdirs()
    def drop(name: String, mtime: Long): Unit = {
      val f = new java.io.File(watched, name)
      java.nio.file.Files.write(f.toPath, "x".getBytes)
      f.setLastModified(mtime); ()
    }
    val now = Instant.now()
    val s1 = new NewFileSensor("ingest", watched, fs, new CursorStore(dir, "f"))
    drop("a.parquet", 1000000L)
    assert(s1.poll(now).size == 1, "existing file on first poll fires once")
    assert(s1.poll(now).isEmpty, "no new files, no fire")
    // two files sharing the cursor-boundary mtime: the name set
    // disambiguates — only the genuinely new one fires
    drop("b.parquet", 1000000L)
    assert(s1.poll(now).size == 1)
    assert(s1.poll(now).isEmpty)
    // RESTART: a new sensor instance over the same cursor store must
    // not re-fire anything
    val s2 = new NewFileSensor("ingest", watched, fs, new CursorStore(dir, "f"))
    assert(s2.poll(now).isEmpty, "cursor must survive restarts")
    drop("c.parquet", 2000000L)
    assert(s2.poll(now).size == 1)
  }

  test("TxTableSensor: arms at current version, fires once per advance") {
    import spark.implicits._
    val dir = stateDir("txsense")
    val loc = s"$dir/t"
    val t = TxTable(spark, loc)
    t.overwrite(Seq((1L, "a")).toDF("k", "v"))
    val sensor = new TxTableSensor("downstream", loc, spark,
      new CursorStore(dir, "tx"))
    val now = Instant.now()
    assert(sensor.poll(now).isEmpty, "first poll arms, no replay")
    t.append(Seq((2L, "b")).toDF("k", "v"))
    t.append(Seq((3L, "c")).toDF("k", "v"))
    val fired = sensor.poll(now)
    assert(fired.size == 1 && fired.head.reason.contains("v0 -> v2"), fired)
    assert(sensor.poll(now).isEmpty, "no commit, no fire")
  }

  test("Backfill requests exactly the keys the ledger lacks; resumes after failures") {
    val dir = stateDir("backfill")
    val ledger = new MaterializationLedger(dir)
    ledger.record("asset", Some("2026-01-02"), ok = true, 0.1, "done earlier")
    ledger.record("asset", Some("2026-01-03"), ok = false, 0.1, "failed earlier")
    val keys = Seq("2026-01-01", "2026-01-02", "2026-01-03")
    val req = Backfill.missing(ledger, "asset", keys)
    assert(req.map(_.partitionKey.get) == Seq("2026-01-01", "2026-01-03"),
      s"done keys drop, FAILED keys retry: $req")
  }

  test("Daemon.tick: executes requests through jobs, records the ledger, idempotent re-ticks") {
    val dir = stateDir("daemon")
    val ledger = new MaterializationLedger(dir)
    val runs = scala.collection.mutable.ArrayBuffer.empty[Option[String]]
    val sched = new IntervalSchedule("daily", Duration.ofDays(1),
      new CursorStore(dir, "d"))
    val daemon = new Daemon(Seq(sched), Map("daily" -> countingJob(runs)),
      ledger)
    val t0 = Instant.parse("2026-05-01T00:30:00Z")
    daemon.tick(t0) // arms
    val out = daemon.tick(Instant.parse("2026-05-03T00:30:00Z"))
    assert(out.size == 2 && out.forall(_._2), out)
    assert(runs.flatten.toSeq == Seq("2026-05-01", "2026-05-02"))
    // a backfill overlapping already-done partitions re-runs nothing
    val out2 = daemon.tick(Instant.parse("2026-05-03T00:31:00Z"),
      extra = Backfill.missing(ledger, "daily",
        Seq("2026-05-01", "2026-05-02")))
    assert(out2.isEmpty, s"ledger-done partitions must not re-run: $out2")
    assert(runs.size == 2)
  }

  test("Daemon.tick: one throwing trigger is isolated; a throwing job's cause lands in the ledger") {
    val dir = stateDir("isolate")
    val ledger = new MaterializationLedger(dir)
    val runs = scala.collection.mutable.ArrayBuffer.empty[Option[String]]
    val broken = new Trigger {
      val name = "sensor_broken"
      def poll(now: Instant): Seq[RunRequest] =
        throw new java.io.IOException("directory deleted under the sensor")
    }
    val sched = new IntervalSchedule("daily", Duration.ofDays(1),
      new CursorStore(dir, "d"))
    val boom = new Trigger {
      val name = "sensor_boom"
      def poll(now: Instant): Seq[RunRequest] =
        Seq(RunRequest("explodes", Some("k1"), "fire the failing job"))
    }
    val daemon = new Daemon(Seq(broken, sched, boom),
      Map("daily" -> countingJob(runs),
        "explodes" -> (_ => throw new IllegalStateException("schema drift"))),
      ledger)
    val t0 = Instant.parse("2026-05-01T00:30:00Z")
    daemon.tick(t0) // arms the schedule DESPITE the broken sensor
    val out = daemon.tick(Instant.parse("2026-05-02T00:30:00Z"))
    // the healthy schedule fired and succeeded; the failing job ran,
    // failed, and its exception is recorded in the ledger reason
    assert(out.exists { case (r, ok) => r.job == "daily" && ok }, out)
    assert(out.exists { case (r, ok) => r.job == "explodes" && !ok }, out)
    assert(runs.flatten.toSeq == Seq("2026-05-01"))
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "ledger.jsonl"))
    assert(lines.stream().anyMatch(l => l.contains("schema drift")),
      s"the job's failure cause must be ledgered: $lines")
  }

  test("Daemon drives the real partitioned asset end-to-end (EventsWindow)") {
    val dir = stateDir("asset")
    val ledger = new MaterializationLedger(dir)
    // the events fixture's date range: pick one real day so the step
    // materializes rows
    val day = graft.core.Tables.events(spark, sf)
      .selectExpr("CAST(min(to_date(ts)) AS STRING)").head.getString(0)
    val job: Option[String] => Seq[StepReport] = { pk =>
      graft.steps.EventsWindow.run(spark, sf, s"$dir/state", pk.get)
    }
    val daemon = new Daemon(Nil, Map("events_window" -> job), ledger)
    val out = daemon.tick(Instant.now(),
      extra = Backfill.missing(ledger, "events_window", Seq(day)))
    assert(out.size == 1 && out.head._2, out)
    assert(ledger.isDone("events_window", Some(day)))
    // second tick: the ledger makes the same backfill a no-op
    assert(daemon.tick(Instant.now(),
      extra = Backfill.missing(ledger, "events_window", Seq(day))).isEmpty)
  }
}
