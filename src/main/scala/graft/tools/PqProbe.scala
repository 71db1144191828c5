package graft.tools

import graft.core.{Sessions, Tables}
import graft.ops.Similarity
import org.apache.spark.sql.functions._

/** Dev-only PQ recall probe (not part of the driver contract):
  * `tools/run.sh graft.tools.PqProbe SF_DIR [m ksub iters refine]`
  * prints candidate-stage and post-refine recall of [[Similarity
  * .annTopKPq]] against the exact [[Similarity.annTopK]] baseline. */
object PqProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val m = args.lift(1).map(_.toInt).getOrElse(8)
    val ksub = args.lift(2).map(_.toInt).getOrElse(16)
    val iters = args.lift(3).map(_.toInt).getOrElse(3)
    val refine = args.lift(4).map(_.toInt).getOrElse(4)
    val nProbe = args.lift(5).map(_.toInt)
    val spark = Sessions.local()
    val emb = Tables.embeddings(spark, d)
    val exact = Similarity.annTopK(emb)
    val t0 = System.nanoTime()
    // 6th arg = nProbe switches to the persisted IVF-PQ path
    val approx = nProbe match {
      case None => Similarity.annTopKPq(emb, m = m, ksub = ksub,
        iters = iters, refine = refine)
      case Some(np) =>
        val dir = java.nio.file.Files.createTempDirectory("ivfpq").toString
        val centroids = emb.where(col("vec_id") % 40 === 0)
          .select(col("vec_id").as("centroid_id"), col("embedding").as("cv"))
        val (idx, cb) = Similarity.buildIvfPqIndex(emb, centroids, dir,
          m = m, ksub = ksub, iters = iters)
        val queries = emb.where(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
        Similarity.annTopKIvfPqFromIndex(spark, dir, queries, idx, cb, emb,
          nProbe = np, refine = refine)
    }
    val hits = exact.select("query_id", "neighbor_id")
      .join(approx.select(col("query_id"), col("neighbor_id"),
        lit(1).as("hit")), Seq("query_id", "neighbor_id"), "left")
      .agg(count(lit(1)).as("total"),
        sum(coalesce(col("hit"), lit(0))).as("hits"))
      .head()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[pq] m=$m ksub=$ksub iters=$iters refine=$refine: " +
      f"recall=${hits.getLong(1).toDouble / hits.getLong(0)}%.3f " +
      f"(${hits.getLong(1)}/${hits.getLong(0)}) in $secs%.1f s")
    spark.stop()
  }
}
