package graft.tools

import org.apache.spark.sql.functions._
import graft.core.{Sessions, Tables}
import graft.ops.Dedup

/** Scale-stress harness (dev tool, not a gate): documents replicated
  * Nx with re-keyed ids — every replica is an exact duplicate of the
  * base corpus, i.e. worst-case mass duplication — timing the dedup
  * family's growth curve. The LSH/banded paths should grow
  * near-linearly (bucketed candidate generation + df-caps); anything
  * quadratic in replicas is a regression.
  * Usage: tools/run.sh graft.tools.Stress [SF_DIR] [factors...] */
object Stress {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factors = if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1, 2, 4)
    val spark = Sessions.local()
    val base = Tables.documents(spark, d).select("doc_id", "text").cache()
    val n = base.count()
    def corpus(f: Int) = (1 until f).foldLeft(base) { (acc, i) =>
      acc.unionAll(base.select((col("doc_id") + i * 10000000L).as("doc_id"),
        col("text")))
    }
    def time(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[stress] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (f <- factors) {
      val c = corpus(f).cache(); c.count()
      println(s"[stress] === factor $f (${n * f} docs, every doc x$f) ===")
      time(s"c1_exact x$f", Dedup.exactDedup(c))
      time(s"c2_lsh   x$f", Dedup.minHashLshPairs(c))
      time(s"c3_simhash x$f", Dedup.simHashPairs(c))
      // transitive closure under mass duplication: every base doc's
      // replicas form one clique → the pair graph is the worst case
      // for the component loop (df-caps bound the clique fan-out)
      time(s"c11_clusters x$f", Dedup.dupClusters(Dedup.minHashLshPairs(c)))
      c.unpersist()
    }
    spark.stop()
  }
}
