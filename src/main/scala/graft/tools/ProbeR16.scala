package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Round-16 inner-plan snapshots: the g6/c4 rewrites materialize their
  * results through eager localCheckpoints, so the GATE plan collapses
  * to `Scan ExistingRDD` and the evidence the round is about — the
  * pair-emission shape — lives in subplans. This dumps the formatted
  * plans of those subtrees (built exactly as the operators build
  * them, minus the final checkpoint) to `plans/r16/<name>_inner_<suffix>.txt`.
  *
  * Usage: tools/run.sh graft.tools.ProbeR16 SF_DIR OUT_DIR SUFFIX
  */
object ProbeR16 {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ProbeR16 SF_DIR OUT_DIR SUFFIX")
    val Array(sfDir, outDir, suffix) = args
    Files.createDirectories(Paths.get(outDir))
    val spark = Sessions.local()
    def dump(name: String, df: DataFrame): Unit = {
      df.queryExecution.toRdd.count()
      Files.writeString(Paths.get(outDir, s"${name}_inner_$suffix.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println(s"[probe-r16] $name -> $outDir/${name}_inner_$suffix.txt")
    }
    // g6's weighted co-occurrence projection: the pair-emission
    // subplan (posting-list kernel path after round 16; self-join
    // before), built over the pinned incidence exactly as
    // coProjection builds it — AQE off like the census session so
    // the shape matches the operator's.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val inc0 = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_suppkey")
      .join(broadcast(Tables.orders(spark, sfDir)
        .select("o_orderkey", "o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("left"),
        col("l_suppkey").cast("long").as("right"))
    val inc = inc0.repartition(n, col("left"))
      .dropDuplicates("left", "right")
      .sortWithinPartitions("left")
      .localCheckpoint(true)
    val keep = inc.groupBy("left").agg(count(lit(1)).as("d"))
      .where(col("d") <= 10000).select("left")
    val pruned = inc.join(keep, Seq("left"), "left_semi")
    dump("g6_copaircounts",
      graft.steps.GraphOps.coPairCounts(pruned, rightIntegral = true))
    // the join spelling over the same pinned input — the pre-round-16
    // shape, kept as the non-integral-rights path
    dump("g6_copaircounts_joinspelling",
      graft.steps.GraphOps.coPairCounts(pruned, rightIntegral = false))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    // c4's candidate+verify pipeline WITHOUT the df-cap (the uncapped
    // arm has no checkpoint, so the full pair-emission plan shows:
    // shingle kernel, posting aggregation, sortedLongs + pairsFrom
    // generates, verify joins)
    dump("c4_uncapped_pipeline",
      graft.ops.Dedup.ngramJaccardPairs(
        Tables.documents(spark, sfDir), maxDocFreq = None))
    spark.stop()
  }
}
