package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables, TxTable}

/** Round-14 scale probes for the round-13 surfaces (VERDICT item 7) —
  * measured numbers, not assertions. Not a gate.
  *
  *   1. t23 chunking at 1× / 100×: the gate claims a MAP-ONLY pass
  *      (no shuffle before the gate's ordering) — time the operator
  *      through the noop sink at both points and lint the pre-order
  *      plan for Exchange nodes.
  *   2. s16 dedup-on-ingest per-batch cost: 20 fixed-size batches
  *      (each overlapping its predecessor — at-least-once redelivery)
  *      merged insert-if-absent into the growing sink table; per-batch
  *      wall time reported so the cost ∝ batch + touched-buckets
  *      contract (and its growth as fixed-bucket sizes fill) is a
  *      measured curve.
  *   3. Mirror checkpoint cadence at 250 commits: 250 single-file
  *      appends each tail-published by mirrorToDelta with retention 0;
  *      segment timings + final log-file census show replay stays
  *      bounded by the checkpoint interval.
  *
  * Usage: tools/run.sh graft.tools.ProbeR14 [SF_DIR] [section...]
  * (sections: t23 s16 mirror; default all). Record steal_pct next to
  * any number you quote (memory: graft-benching-discipline). */
object ProbeR14 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sections =
      if (args.length <= 1) Set("t23", "s16", "mirror") else args.drop(1).toSet
    val spark = Sessions.local()
    if (sections("t23")) probeT23(spark, d)
    if (sections("s16")) probeS16(spark, d)
    if (sections("mirror")) probeMirror(spark, d)
  }

  private def ms[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[probe-r14] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    r
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** 100× documents by suffixed replication (the MakeScaled linear
    * discipline: disjoint ids, content varied per replica so chunk
    * hashes differ) materialized to parquet, so the probe times the
    * operator over a real scan, not the generator. */
  private def probeT23(spark: SparkSession, d: String): Unit = {
    val docs = Tables.documents(spark, d)
    val n1 = docs.count()
    val scaled = "/tmp/graft_r14_docs100x"
    ms("t23 build 100x fixture") {
      docs.crossJoin(
          spark.range(100).select(col("id").as("__rep")))
        .select((col("doc_id") * 100 + col("__rep")).as("doc_id"),
          concat(col("text"), lit(" rep"), col("__rep")).as("text"))
        .write.mode("overwrite").parquet(scaled)
    }
    val plan = graft.ops.Corpus.chunkDocuments(docs)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    println(s"[probe-r14] t23 plan Exchange nodes (the map-only claim " +
      s"allows exactly the gate's final orderBy range exchange): " +
      s"$exchanges")
    val out1 = ms("t23 1x chunk+hash (noop)") {
      val c = graft.ops.Corpus.chunkDocuments(docs); noop(c); c.count()
    }
    val big = spark.read.parquet(scaled)
    val out100 = ms("t23 100x chunk+hash (noop)") {
      val c = graft.ops.Corpus.chunkDocuments(big); noop(c); c.count()
    }
    println(f"[probe-r14] t23 docs 1x=$n1 100x=${n1 * 100} " +
      f"chunks 1x=$out1 100x=$out100 " +
      f"(output ratio ${out100.toDouble / out1}%.1f)")
  }

  /** dedup-on-ingest: 20 batches of ~|events|/20 rows each, every
    * batch redelivering ~half of its predecessor — per-batch wall time
    * is the contract curve. */
  private def probeS16(spark: SparkSession, d: String): Unit = {
    val e = Tables.events(spark, d).select("event_id", "event_type", "value")
    val nTotal = e.count()
    val dir = graft.streaming.EventsStream.scratchDir("graft_r14_s16") + "/t"
    val t = TxTable(spark, dir, statsOnWrite = false)
    val nB = 20
    val times = (0 until nB).map { i =>
      // batch i = slice i plus the SECOND half of slice i-1 (redelivery)
      val slice = e.where(pmod(col("event_id"), lit(nB)) === i)
      val redeliver =
        if (i == 0) slice.limit(0)
        else e.where(pmod(col("event_id"), lit(nB)) === (i - 1) &&
          col("event_id") % 2 === 0)
      val batch = slice.unionByName(redeliver)
      val t0 = System.nanoTime()
      graft.streaming.EventsStream.dedupIngestBatchTx(
        t, batch, batchId = i.toLong, nBuckets = 16)
      (System.nanoTime() - t0) / 1e9
    }
    val got = t.read().count()
    val dup = t.read().groupBy("event_id").count()
      .where(col("count") > 1).count()
    println(f"[probe-r14] s16 batches=$nB rows=$got (exact=$nTotal) " +
      f"dups=$dup per-batch s: first=${times.head}%.2f " +
      f"b5=${times(4)}%.2f b10=${times(9)}%.2f b15=${times(14)}%.2f " +
      f"last=${times.last}%.2f (growth last/first " +
      f"${times.last / times.head}%.2f; contract: cost ∝ batch + " +
      f"touched buckets — fixed 16 buckets all touched here, so the " +
      f"curve shows the bucket-fill trend; size nBuckets ∝ corpus " +
      f"at scale)")
  }

  /** 250 mirrored commits: per-segment timing + log census. */
  private def probeMirror(spark: SparkSession, d: String): Unit = {
    import org.apache.hadoop.fs.Path
    val dir = graft.streaming.EventsStream.scratchDir("graft_r14_mirror") + "/t"
    val o = Tables.orders(spark, d)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
    val t = TxTable(spark, dir, statsOnWrite = false)
    t.overwrite(o.where(col("o_orderkey") % 977 === 0))
    t.setProperties(Map(TxTable.PropMirrorLogRetention -> "0"))
    t.mirrorToDelta()
    val segTimes = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to 250).foreach { i =>
      t.append(o.where(col("o_orderkey") % 977 === (i % 977)))
      val t0 = System.nanoTime()
      t.mirrorToDelta()
      segTimes += (System.nanoTime() - t0) / 1e9
    }
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(dir, "_delta_log")
    val names = fs.listStatus(logDir).map(_.getPath.getName)
    val nJson = names.count(_.endsWith(".json"))
    val nCp = names.count(_.contains(".checkpoint."))
    def seg(a: Int, b: Int): Double = segTimes.slice(a, b).sum / (b - a)
    println(f"[probe-r14] mirror commits=250 mean mirror s/commit: " +
      f"c1-50=${seg(0, 50)}%.3f c100-150=${seg(99, 149)}%.3f " +
      f"c200-250=${seg(199, 249)}%.3f; final log: json=$nJson " +
      f"checkpoints=$nCp (retention 0 → replay bounded by the " +
      f"10-commit interval)")
    val viaDelta = graft.core.DeltaLog.read(spark, dir)
    val same = viaDelta.exceptAll(t.read()).isEmpty &&
      t.read().exceptAll(viaDelta).isEmpty
    println(s"[probe-r14] mirror delta-read == table read: $same")
  }
}
