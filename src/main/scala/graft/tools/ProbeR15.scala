package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{DeltaFixture, Sessions, Tables, TxTable}
import graft.streaming.{EventsStream, GateTimers}

/** Round-15 scale probes — measured numbers, not assertions. Not a
  * gate.
  *
  *   1. s16auto — per-batch dedup-ingest cost vs SINK SIZE under
  *      auto-sized buckets ([[EventsStream.dedupIngestBuckets]])
  *      versus the old fixed 16: seed a sink at 1× and 10× the
  *      fixture corpus, then run five SMALL fixed-size batches
  *      against each and report the mean per-batch wall time. The
  *      contract: auto-sized bucket bytes stay ~flat, so small-batch
  *      cost stays ~flat in sink size; fixed-16 bucket bytes grow
  *      with the sink, so each touched bucket's rewrite does too.
  *   2. follow — followDelta at cadence (the r14 mirror got its
  *      250-commit probe; the follower now gets one): 250 upstream
  *      commits with mixed window shapes (appends, every 10th a CoW
  *      remove+re-add, every 25th a DV'd re-add, one additive
  *      widening at commit 125), followed one commit per call;
  *      per-follow cost must stay ∝ window, never table — reported
  *      as segment means.
  *   3. s13 — same-JVM A/B of the s13 gate with the stage/drain/other
  *      phase split, adjudicating the r14 3.27↔7.48 s cross-run
  *      delta: two back-to-back runs in ONE JVM show the same-code
  *      spread and WHICH phase carries it.
  *
  * Usage: tools/run.sh graft.tools.ProbeR15 [SF_DIR] [section...]
  * (sections: s16auto follow s13; default all). Record steal_pct
  * next to any number you quote (memory: graft-benching-discipline).
  */
object ProbeR15 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sections =
      if (args.length <= 1) Set("s16auto", "follow", "s13")
      else args.drop(1).toSet
    val spark = Sessions.local()
    if (sections("s16auto")) probeS16Auto(spark, d)
    if (sections("follow")) probeFollowCadence(spark, d)
    if (sections("s13")) probeS13(spark, d)
  }

  private def secs(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  /** Small-batch ingest cost vs sink scale, auto-sized vs fixed-16.
    * Batches are the SAME absolute size at every scale (the
    * production regime: batch ≪ corpus), keys disjoint from the seed
    * so every batch really inserts. Auto-sizing uses a deliberately
    * small target bucket (1 MiB) so the fixture-scale sink still gets
    * a multi-bucket layout worth measuring. */
  private def probeS16Auto(spark: SparkSession, d: String): Unit = {
    val e = Tables.events(spark, d).select("event_id", "event_type", "value")
    val n1 = e.count()
    val batchRows = math.max(1000L, n1 / 100)
    for (scale <- Seq(1, 10)) {
      val seed =
        if (scale == 1) e
        else e.crossJoin(spark.range(scale).select(col("id").as("__r")))
          .select((col("event_id") * scale + col("__r")).as("event_id"),
            col("event_type"), col("value"))
      val nSeed = n1 * scale
      for ((mode, buckets) <- Seq(
          ("fixed16", 16),
          ("auto", EventsStream.dedupIngestBuckets(nSeed,
            targetBucketBytes = 1L << 20)))) {
        val dir = EventsStream.scratchDir(s"r15_s16_${scale}x_$mode") + "/t"
        val t = TxTable(spark, dir, statsOnWrite = false)
        val tSeed = secs {
          EventsStream.dedupIngestBatchTx(t, seed, batchId = 0L, buckets)
        }
        val times = (1 to 5).map { i =>
          // fresh keys above the seed range; same size every batch
          val batch = spark.range(batchRows)
            .select((col("id") + nSeed * scale + i * batchRows * 10)
              .as("event_id"),
              lit("probe").as("event_type"), lit(1.0).as("value"))
          secs {
            EventsStream.dedupIngestBatchTx(t, batch, i.toLong, buckets)
          }
        }
        println(f"[probe-r15] s16auto scale=${scale}x mode=$mode " +
          f"buckets=$buckets seedRows=$nSeed seed=$tSeed%.2fs " +
          f"batch(${batchRows} rows) mean=${times.sum / times.size}%.2fs " +
          f"per-batch=[${times.map(x => f"$x%.2f").mkString(", ")}]")
      }
    }
    println("[probe-r15] s16auto contract: auto mean ~flat 1x→10x " +
      "(bucket bytes pinned); fixed16 mean grows with the sink")
  }

  /** 250 mixed-shape upstream commits, one follow per commit. */
  private def probeFollowCadence(spark: SparkSession, d: String): Unit = {
    val dir = EventsStream.scratchDir("r15_follow") + "/t"
    val o = Tables.orders(spark, d)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
      .limit(2000).cache()
    o.count()
    val fx = DeltaFixture
    val slice = (i: Int) => o.where(col("o_orderkey") % 50 === i % 50)
    val f0 = fx.writeData(spark, slice(0), dir, "part-0.parquet")
    fx.commit(spark, dir, 0, Seq(fx.protocolJson(),
      fx.metaDataJson(o.schema), fx.addJson(f0)))
    val t = TxTable(spark, dir)
    t.followDelta()
    var widened: Option[org.apache.spark.sql.types.StructType] = None
    val times = (1 to 250).map { v =>
      val name = s"part-$v.parquet"
      val lines: Seq[String] =
        if (v == 125) {
          // additive widening + a file carrying the new column
          val w = org.apache.spark.sql.types.StructType(o.schema.fields :+
            org.apache.spark.sql.types.StructField("o_note",
              org.apache.spark.sql.types.StringType, nullable = true))
          widened = Some(w)
          val f = fx.writeData(spark, slice(v)
            .withColumn("o_note", lit(s"n$v")), dir, name)
          Seq(fx.metaDataJson(w), fx.addJson(f))
        } else if (v % 25 == 0) {
          // DV'd re-add of the previous commit's file
          val prev = s"part-${v - 1}.parquet"
          val pos = spark.read.parquet(s"$dir/$prev")
            .select(col("_metadata.row_index")).limit(3)
            .collect().map(_.getLong(0)).toSeq.sorted
          val dv = fx.writeDv(spark, dir, pos)
          val pf = fx.DataFile(prev,
            new java.io.File(s"$dir/$prev").length(),
            new java.io.File(s"$dir/$prev").lastModified(),
            spark.read.parquet(s"$dir/$prev").count())
          Seq(fx.removeJson(prev), fx.addJson(pf, deletionVector = Some(dv)))
        } else if (v % 10 == 0) {
          // CoW rewrite: drop the previous file, add a replacement
          val prev = s"part-${v - 1}.parquet"
          val f = fx.writeData(spark, widened.fold(slice(v))(_ =>
            slice(v).withColumn("o_note", lit(null: String))), dir, name)
          Seq(fx.removeJson(prev), fx.addJson(f))
        } else {
          val f = fx.writeData(spark, widened.fold(slice(v))(_ =>
            slice(v).withColumn("o_note", lit(null: String))), dir, name)
          Seq(fx.addJson(f))
        }
      fx.commit(spark, dir, v.toLong, lines)
      secs { t.followDelta(); () }
    }
    def seg(a: Int, b: Int): Double =
      times.slice(a, b).sum / (b - a)
    println(f"[probe-r15] follow cadence 250 commits: per-follow s " +
      f"seg1-50=${seg(0, 50)}%.3f seg51-100=${seg(50, 100)}%.3f " +
      f"seg101-150=${seg(100, 150)}%.3f seg151-200=${seg(150, 200)}%.3f " +
      f"seg201-250=${seg(200, 250)}%.3f (contract: ∝ window, flat " +
      f"across segments; manifest rows grow 50× over the run)")
    println(s"[probe-r15] follow final graft versions=" +
      s"${t.versions.size} rows=${t.read().count()}")
  }

  /** Two same-JVM runs of the s13 gate with the phase split. */
  private def probeS13(spark: SparkSession, d: String): Unit = {
    try graft.core.Tables.registerCatalog(spark, d)
    catch { case _: Throwable => () }
    val fn = graft.SparkEntry.queries("s13_tws_sessionize")
    for (i <- 1 to 2) {
      GateTimers.reset()
      val t = secs {
        fn(spark, d).write.format("noop").mode("overwrite").save()
      }
      val ph = GateTimers.snapshot()
      val phStr = ph.map { case (k, v) => f"$k=$v%.2f" }.mkString(" ")
      println(f"[probe-r15] s13 run$i total=$t%.2fs $phStr " +
        f"other=${t - ph.values.sum}%.2f")
    }
    println("[probe-r15] s13 contract: same-JVM spread is the " +
      "attribution baseline — cross-run artifact deltas beyond it are " +
      "box state (steal/fsync), localized by the drain phase")
  }
}
