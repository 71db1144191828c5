package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Same-JVM A/B of the round-16 pair-emission kernels against the
  * spellings they replaced — the ProbeIds discipline: box-level A/Bs
  * this round kept drawing asymmetric hypervisor-steal windows
  * (identical binaries measured ±25 %), so the decisive comparison
  * interleaves both spellings in ONE JVM over the SAME pinned input,
  * several rounds, noop-sink timed.
  *
  * Usage: tools/run.sh graft.tools.ProbePairs [SF_DIR] [ROUNDS]
  */
object ProbePairs {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = Sessions.local()
    def time(name: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[probe-pairs] $name: $s%.2f s")
      s
    }

    // ——— g6: packed-kernel vs join-spelling pair counts over the
    // SAME pinned incidence (both paths live in coPairCounts) ———
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    val n = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val inc = Tables.lineitem(spark, d).select("l_orderkey", "l_suppkey")
      .join(broadcast(Tables.orders(spark, d)
        .select("o_orderkey", "o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("left"),
        col("l_suppkey").cast("long").as("right"))
      .repartition(n, col("left"))
      .dropDuplicates("left", "right")
      .sortWithinPartitions("left")
      .localCheckpoint(true)
    val keep = inc.groupBy("left").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") <= 10000).select("left")
    val pruned = inc.join(keep, Seq("left"), "left_semi")
    var kSum = 0.0; var jSum = 0.0
    for (r <- 1 to rounds) {
      jSum += time(s"g6 join-spelling r$r")(
        graft.steps.GraphOps.coPairCounts(pruned, rightIntegral = false))
      kSum += time(s"g6 packed-kernel r$r")(
        graft.steps.GraphOps.coPairCounts(pruned, rightIntegral = true))
    }
    println(f"[probe-pairs] g6 SUMMARY join=${jSum / rounds}%.2f s " +
      f"kernel=${kSum / rounds}%.2f s (${jSum / kSum}%.2fx)")
    spark.conf.set("spark.sql.adaptive.enabled", "true")

    // ——— bucket pair emission: bucketPairs kernel vs the interpreted
    // HOF, over the REAL c4 prefix-posting buckets, pinned once ———
    val docs = Tables.documents(spark, d)
    val nGram = 3; val threshold = 0.8
    val withSh = docs
      .where(size(split(col("text"), " ")) >= nGram)
      .select(col("doc_id"),
        graft.ops.Dedup.hashedShingles(col("text"), nGram).as("sh"))
    val prefixLen =
      (size(col("sh")) - ceil(size(col("sh")) * lit(threshold)) + 1).cast("int")
    val buckets = withSh
      .select(col("doc_id"), explode(slice(col("sh"), lit(1), prefixLen)).as("s"))
      .groupBy("s").agg(collect_list(col("doc_id")).as("ids"))
      .where(size(col("ids")) > 1)
      .localCheckpoint(true)
    def kernelPairs: DataFrame = buckets
      .select(explode(graft.functions.GraftFunctions
        .bucketPairs(col("ids"))).as("p"))
      .select(col("p.a").as("doc_a"), col("p.b").as("doc_b"))
      .distinct()
    def hofPairs: DataFrame = buckets
      .select(explode(flatten(transform(col("ids"), (x, i) =>
        transform(slice(col("ids"), i + lit(2), size(col("ids")) - i - 1),
          y => struct(least(x, y).as("doc_a"), greatest(x, y).as("doc_b"))))))
        .as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()
    var bkSum = 0.0; var bhSum = 0.0
    for (r <- 1 to rounds) {
      bhSum += time(s"c4-buckets HOF r$r")(hofPairs)
      bkSum += time(s"c4-buckets kernel r$r")(kernelPairs)
    }
    println(f"[probe-pairs] buckets SUMMARY hof=${bhSum / rounds}%.2f s " +
      f"kernel=${bkSum / rounds}%.2f s (${bhSum / bkSum}%.2fx)")
    spark.stop()
  }
}
