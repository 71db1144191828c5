package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Similarity

/** ANN recall/latency trade-off harness — one committed table instead
  * of numbers scattered across specs: exact (c6) vs IVF (c7),
  * persisted IVF (c10), PQ (c13) and persisted IVF-PQ (c15) at
  * nProbe ∈ {2, 6, 12}, each row = (variant, nProbe, recall@10 vs
  * exact, warm seconds). Run:
  *
  *   SPARK_GRAFT_CPUS=8 tools/run.sh graft.tools.AnnBench /root/testdata/sf0.1
  *
  * Timing uses the noop sink (the Bench discipline — `.count()` lies
  * under pruning); warm = best of two after a cold pass. Recall@10 =
  * |approx ∩ exact| / |exact| over all queries (global, the spec
  * convention). */
object AnnBench {
  private def time(df: => DataFrame): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // cold / plan warm-up
    math.min(once(), once())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val k = 10

    val exactDf = Similarity.annTopK(emb, k = k, queryStride = 100)
      .select("query_id", "neighbor_id").cache()
    val nExact = exactDf.count()
    val tExact = time(Similarity.annTopK(emb, k = k, queryStride = 100))

    def recall(approx: DataFrame): Double =
      approx.select("query_id", "neighbor_id")
        .intersect(exactDf).count().toDouble / nExact

    val queries = emb.where(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))

    // persisted indexes built once (ingest-time cost, reported apart)
    val scratch = graft.streaming.EventsStream.scratchDir("ann_bench")
    val centroids = emb.where(col("vec_id") % 40 === 0)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
    val tBuildIvf0 = System.nanoTime()
    val idx = Similarity.buildIvfIndex(emb, centroids, s"$scratch/ivf")
    val tBuildIvf = (System.nanoTime() - tBuildIvf0) / 1e9
    val tBuildPq0 = System.nanoTime()
    val (idx2, cb) = Similarity.buildIvfPqIndex(emb, centroids,
      s"$scratch/ivfpq")
    val tBuildPq = (System.nanoTime() - tBuildPq0) / 1e9

    val rows = scala.collection.mutable.ArrayBuffer.empty[
      (String, Int, Double, Double)]
    rows += (("exact (c6)", 0, 1.0, tExact))
    for (np <- Seq(2, 6, 12)) {
      rows += (("ivf inline (c7)", np,
        recall(Similarity.annTopKIvf(emb, k, 100, 40, np)),
        time(Similarity.annTopKIvf(emb, k, 100, 40, np))))
      rows += (("ivf persisted (c10)", np,
        recall(Similarity.annTopKIvfFromIndex(spark, s"$scratch/ivf",
          queries, idx, k, np)),
        time(Similarity.annTopKIvfFromIndex(spark, s"$scratch/ivf",
          queries, idx, k, np))))
      rows += (("ivf-pq persisted (c15)", np,
        recall(Similarity.annTopKIvfPqFromIndex(spark, s"$scratch/ivfpq",
          queries, idx2, cb, emb, k, np)),
        time(Similarity.annTopKIvfPqFromIndex(spark, s"$scratch/ivfpq",
          queries, idx2, cb, emb, k, np))))
    }
    rows += (("pq flat (c13)", 0,
      recall(Similarity.annTopKPq(emb, k, 100)),
      time(Similarity.annTopKPq(emb, k, 100))))

    println(s"\n## ANN recall/latency at $sfDir (k=$k, queries=stride-100, " +
      s"centroids=stride-40; build: ivf ${f"$tBuildIvf%.1f"}s, " +
      s"ivfpq ${f"$tBuildPq%.1f"}s)\n")
    println("| variant | nProbe | recall@10 | warm s |")
    println("|---|---|---|---|")
    rows.foreach { case (v, np, r, t) =>
      val nps = if (np == 0) "—" else np.toString
      println(f"| $v | $nps | $r%.3f | $t%.2f |")
    }
    val json = rows.map { case (v, np, r, t) =>
      s"""{"variant":"$v","nProbe":$np,"recall":$r,"warm_sec":$t}"""
    }.mkString("[", ",", "]")
    println(s"\nANNBENCH_JSON $json")
    spark.stop()
  }
}
