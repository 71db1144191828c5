package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import graft.core.Tables
import graft.ops.Dedup
import graft.streaming.EventsStream

/** Persisted MinHash signature index + incremental probe: probing a
  * new batch must find exactly the full-recompute pairs that involve
  * a new doc, reading only partition-pruned posting buckets. */
class IncrementalDedupSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf)
  private def oldBatch = docs.where(col("doc_id") % 10 =!= 0)
  private def newBatch = docs.where(col("doc_id") % 10 === 0)

  test("incremental probe == full recompute restricted to new-doc pairs") {
    val dir = EventsStream.scratchDir("sigidx_equiv")
    val idx = Dedup.buildSignatureIndex(oldBatch, dir)
    val incremental = Dedup.probeSignatureIndex(spark, idx, newBatch)
    val full = Dedup.minHashLshPairs(docs)
      .where(col("doc_a") % 10 === 0 || col("doc_b") % 10 === 0)
    assert(incremental.exceptAll(full).count() == 0,
      "incremental found pairs the full recompute did not")
    assert(full.exceptAll(incremental).count() == 0,
      "incremental missed pairs the full recompute found")
  }

  test("probe scan is partition-pruned to the probed buckets") {
    val dir = EventsStream.scratchDir("sigidx_prune")
    val idx = Dedup.buildSignatureIndex(oldBatch, dir)
    // a TINY probe (3 docs) so its band hashes land in few buckets
    val tiny = newBatch.orderBy("doc_id").limit(3)
    val result = Dedup.probeSignatureIndex(spark, idx, tiny)
    result.collect()
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec        => allScans(q.plan)
      case s: FileSourceScanExec    => Seq(s)
      case other                    => other.children.flatMap(allScans)
    }
    val sigScans = allScans(result.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("sigs")))
    assert(sigScans.nonEmpty, "no index scan in probe plan")
    val scan = sigScans.head
    assert(scan.partitionFilters.mkString(";").contains("bucket"),
      s"no bucket partition filter: ${scan.partitionFilters}")
    val total = spark.read.parquet(s"$dir/sigs")
      .select("bucket").distinct().count()
    val read = scan.metrics("numPartitions").value
    assert(read < total, s"probe read all $total buckets (no pruning)")
  }

  test("planted near-dup across the batch boundary is found") {
    import spark.implicits._
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon"
    val olds = Seq((1L, base), (2L, "completely different words " +
      "entirely unrelated content nothing shared here at all okay"))
      .toDF("doc_id", "text")
    val news = Seq((10L, base + " phi"), // near-dup of doc 1
      (11L, "another brand new document with its own fresh tokens " +
        "sharing nothing with anything else whatsoever")).toDF("doc_id", "text")
    val dir = EventsStream.scratchDir("sigidx_planted")
    val idx = Dedup.buildSignatureIndex(olds, dir)
    val pairs = Dedup.probeSignatureIndex(spark, idx, news).collect()
    assert(pairs.length == 1)
    assert(pairs(0).getLong(0) == 1L && pairs(0).getLong(1) == 10L)
    assert(pairs(0).getDouble(2) > 0.9)
  }
}
