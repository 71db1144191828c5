package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}

/** Dev profiler for the s8 microbatch constant: replays the s8 gate's
  * batches by hand with per-phase timers. Not a gate. */
object ProfileS8 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    val jobStarts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobStarts.put(js.jobId, System.nanoTime()); ()
        }
        override def onJobEnd(
            je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
          val t0 = jobStarts.remove(je.jobId)
          println(f"[job] ${je.jobId}: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
        }
      })
    if (args.contains("v2"))
      spark.sparkContext.hadoopConfiguration.set(
        "mapreduce.fileoutputcommitter.algorithm.version", "2")
    if (args.contains("qe"))
      spark.listenerManager.register(
        new org.apache.spark.sql.util.QueryExecutionListener {
          override def onSuccess(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              durationNs: Long): Unit = {
            val phases = qe.tracker.phases.map { case (k, v) =>
              s"$k=${v.endTimeMs - v.startTimeMs}ms" }.mkString(" ")
            println(f"[qe] $funcName ${durationNs / 1e6}%.0f ms | $phases")
          }
          override def onFailure(funcName: String,
              qe: org.apache.spark.sql.execution.QueryExecution,
              exception: Exception): Unit = ()
        })
    def ms[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $name: ${(System.nanoTime() - t0) / 1e6}%.0f ms")
      r
    }
    val src = graft.streaming.EventsStream.scratchDir("prof_s8_src")
    Tables.events(spark, d).select("event_id", "ts", "user_id", "value")
      .repartition(8).write.mode("overwrite").parquet(s"$src/files")
    if (args.contains("noaqe")) {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      println("[prof] AQE off")
    }
    if (args.contains("p8")) {
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      println("[prof] shuffle=8")
    }
    val files = spark.read.parquet(s"$src/files").inputFiles.sorted.grouped(2).toSeq
    val dir = graft.streaming.EventsStream.scratchDir("prof_s8") + "/t"
    val t = graft.core.TxTable(spark, dir, statsOnWrite = false)
    files.zipWithIndex.foreach { case (fs2, i) =>
      val batch = ms(s"b$i read")(spark.read
        .schema("event_id LONG, ts TIMESTAMP, user_id LONG, value DOUBLE")
        .parquet(fs2: _*))
      val asState = batch.select(col("user_id"),
        col("event_id").as("last_event_id"), col("ts").as("last_ts"),
        col("value").as("last_value"))
        .groupBy("user_id")
        .agg(max_by(struct(col("last_event_id"), col("last_ts"), col("last_value")),
          struct(col("last_ts"), col("last_event_id"))).as("m"))
        .select(col("user_id"), col("m.last_event_id").as("last_event_id"),
          col("m.last_ts").as("last_ts"), col("m.last_value").as("last_value"))
      val asState2 = if (args.contains("cache")) asState.cache() else asState
      ms(s"b$i lastTxn")(t.lastTxn("prof"))
      if (t.latestVersion.isEmpty)
        ms(s"b$i overwrite")(t.overwriteBucketed(asState2, Seq("user_id"),
          args.find(_.startsWith("b=")).map(_.drop(2).toInt).getOrElse(16)))
      else
        ms(s"b$i merge")(t.merge(asState2, sourceIsPinned = true,
            touchAllBuckets = args.contains("touchall")) { (ex, s2) =>
          ex.unionByName(s2)
            .groupBy("user_id")
            .agg(max_by(struct(col("last_event_id"), col("last_ts"), col("last_value")),
              struct(col("last_ts"), col("last_event_id"))).as("m"))
            .select(col("user_id"), col("m.last_event_id").as("last_event_id"),
              col("m.last_ts").as("last_ts"), col("m.last_value").as("last_value"))
        })
      if (args.contains("cache")) { asState2.unpersist(); () }
      ()
    }
    println("[prof] total done")
    spark.stop()
  }
}
