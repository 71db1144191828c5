package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.core.Tables
import graft.ops.Similarity

/** The persisted IVF index: inverted lists written partitioned by
  * centroid_id, probes pruned to matching partitions at scan time,
  * assignment/probing via the CentroidIndex argmax kernels (no
  * corpus × k row explosion anywhere). */
class IvfIndexSpec extends SparkSpec {

  private def emb = Tables.embeddings(spark, sf)
  private def centroids = emb.where(col("vec_id") % 40 === 0)
    .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
  private def queries = emb.where(col("vec_id") % 100 === 0)
    .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

  test("kernel assignment matches the max_by spelling it replaced") {
    val idx = Similarity.centroidIndex(centroids)
    val kernel = Similarity.assignCentroids(emb, idx)
      .select("vec_id", "centroid_id")
    // reference spelling: corpus × centroids cross join + argmax with
    // (cdist desc, centroid_id asc) tie-break
    val reference = emb.as("c")
      .join(broadcast(centroids), lit(true))
      .select(col("vec_id"), col("centroid_id"),
        Similarity.cosine(col("cv"), col("c.embedding")).as("cdist"))
      .groupBy("vec_id")
      .agg(max_by(col("centroid_id"),
        struct(col("cdist"), -col("centroid_id"))).as("centroid_id"))
    assert(kernel.orderBy("vec_id").collect().toSeq ==
      reference.orderBy("vec_id").collect().toSeq)
  }

  test("persisted-index search returns exactly the inline c7 result") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val idx = Similarity.buildIvfIndex(emb, centroids, dir)
    val persisted =
      Similarity.annTopKIvfFromIndex(spark, dir, queries, idx).collect().toSeq
    val inline = Similarity.annTopKIvf(emb).collect().toSeq
    assert(persisted == inline)
    assert(persisted.nonEmpty)
    // one data file per inverted list: the pre-write repartition on
    // the partition key must prevent the tasks × k small-file flood
    val root = new java.io.File(dir)
    val listDirs = root.listFiles().filter(_.getName.startsWith("centroid_id="))
    assert(listDirs.nonEmpty)
    val maxFiles = listDirs.map(
      _.listFiles().count(_.getName.endsWith(".parquet"))).max
    assert(maxFiles == 1, s"a centroid list has $maxFiles files")
  }

  test("probes prune partitions: scan reads only probed centroid lists") {
    val dir = java.nio.file.Files.createTempDirectory("ivfidx2").toString
    val idx = Similarity.buildIvfIndex(emb, centroids, dir)
    val result = Similarity.annTopKIvfFromIndex(spark, dir, queries, idx,
      nProbe = 2)
    result.collect() // materialize so AQE finalizes the plan
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allScans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(allScans)
    }
    val scans = allScans(result.queryExecution.executedPlan)
    val indexScan = scans.find(_.metadata.get("Location")
      .exists(_.contains("ivfidx2")))
    assert(indexScan.isDefined, s"no index scan found in:\n${scans.map(_.metadata)}")
    val partitionFilters = indexScan.get.partitionFilters.mkString(";")
    assert(partitionFilters.contains("centroid_id"),
      s"no centroid_id partition filter: $partitionFilters")
    // with nProbe=2 the probed set must be a strict subset of all lists
    val totalLists = spark.read.parquet(dir)
      .select("centroid_id").distinct().count()
    val probed = queries.select(
        explode(graft.functions.GraftFunctions.nearestCentroids(
          col("qv"), idx, 2)).as("c")).distinct().count()
    assert(probed < totalLists,
      s"probe set ($probed) does not prune ($totalLists lists)")
  }

  test("c7 plan has no nested-loop join and no corpus-wide explosion") {
    val plan = Similarity.annTopKIvf(emb).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("incremental index append: rolling ingest matches the full rebuild") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ivfinc").toString
    // build on the "old" 80%, then append the 20% batch
    val old = emb.where(col("vec_id") % 5 =!= 0)
    val batch = emb.where(col("vec_id") % 5 === 0)
    val idx = Similarity.buildIvfIndex(old, centroids, dir)
    Similarity.appendToIvfIndex(batch, idx, dir)
    val incremental =
      Similarity.annTopKIvfFromIndex(spark, dir, queries, idx)
        .collect().toSeq
    // identical to an index built over the WHOLE corpus in one shot
    val dir2 = java.nio.file.Files.createTempDirectory("ivffull").toString
    val idx2 = Similarity.buildIvfIndex(emb, centroids, dir2)
    val full = Similarity.annTopKIvfFromIndex(spark, dir2, queries, idx2)
      .collect().toSeq
    assert(incremental == full)
    assert(incremental.nonEmpty)
  }
}
