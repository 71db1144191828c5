package graft.tools

import graft.core.{Sessions, Tables}

/** Dev-only measurement for the c18/c4 scale claim (round-12 VERDICT
  * "what's wrong" #1): the standard MakeScaled fixture replicates
  * documents/embeddings VERBATIM, so true near-dup pairs grow
  * QUADRATICALLY and any timing of the near-dup operators on it
  * conflates operator scaling with output scaling. This probe runs
  * c18 (wide-SRP) and c4 (n-gram Jaccard) on the OUTPUT-LINEAR
  * fixtures (`MakeScaled ... linear`), reporting output-pair counts
  * (must scale ~n×: the fixture check) and warm wall times (the
  * operator's own scaling — the measured number that replaces the
  * round-12 attribution). Candidate mass is read from the observe()d
  * drop counters' complement implicitly: a bucket-bound plan's time
  * follows output, a saturating one doesn't. Not a gate.
  *
  * Usage: tools/run.sh graft.tools.ProbeNearDup DIR1 [DIR2 ...]
  * e.g.   tools/run.sh graft.tools.ProbeNearDup /root/testdata/sf0.1 \
  *          /tmp/graft_lin10 /tmp/graft_lin100 */
object ProbeNearDup {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_lin10", "/tmp/graft_lin100")
    val spark = Sessions.local()
    def timed(f: => Long): (Long, Double) = {
      f // warm-up: caches, codegen, shuffle files
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }
    dirs.foreach { d =>
      val emb = Tables.embeddings(spark, d)
      val docs = Tables.documents(spark, d)
      val (c18n, c18t) = timed(
        graft.ops.Similarity.srpNearDupPairsWide(emb).count())
      val (c4n, c4t) = timed(
        graft.ops.Dedup.ngramJaccardPairs(docs).count())
      println(f"[probe-neardup] dir=$d c18_pairs=$c18n c18_warm=$c18t%.1f s " +
        f"c4_pairs=$c4n c4_warm=$c4t%.1f s")
      // ---- c4 staged attribution: where does the time go? ---------
      import org.apache.spark.sql.functions._
      val n = 3; val threshold = 0.8
      val withSh = docs
        .where(size(split(col("text"), " ")) >= n)
        .select(col("doc_id"),
          graft.ops.Dedup.hashedShingles(col("text"), n).as("sh"))
      val prefixLen = (size(col("sh")) -
        ceil(size(col("sh")) * lit(threshold)) + 1).cast("int")
      val pref0 = withSh.select(col("doc_id"),
        explode(slice(col("sh"), lit(1), prefixLen)).as("s"))
      val (shRows, shT) = timed(withSh.agg(sum(size(col("sh"))))
        .head.getLong(0))
      val (prefRows, prefT) = timed(pref0.count())
      val (distinctS, distT) = timed(
        pref0.select("s").distinct().count())
      val (bucketRows, bktT) = timed(pref0.groupBy("s")
        .agg(count(lit(1)).as("c")).where(col("c") > 1).count())
      println(f"[probe-neardup-c4] dir=$d shingle_rows=$shRows " +
        f"(${shT}%.1f s) prefix_rows=$prefRows (${prefT}%.1f s) " +
        f"distinct_shingles=$distinctS (${distT}%.1f s) " +
        f"multi_buckets=$bucketRows (${bktT}%.1f s)")
    }
    spark.stop()
  }
}
