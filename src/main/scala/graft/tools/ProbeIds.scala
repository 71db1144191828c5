package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Same-JVM A/B for the round-15 long-node-id question: run the g4/g5
  * loop bodies over STRING ("c…"/"s…") vs packed LONG (2k / 2k+1) node
  * ids, interleaved A B A B so box drift hits both arms, and print
  * per-rep walls. Not a gate.
  * Usage: tools/run.sh graft.tools.ProbeIds [SF_DIR] [reps]
  */
object ProbeIds {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = Sessions.local()
    val base = Tables.lineitem(spark, d).select("l_orderkey", "l_suppkey")
      .join(broadcast(Tables.orders(spark, d).select("o_orderkey", "o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
    val stringE = base.select(concat(lit("c"), col("o_custkey")).as("src"),
      concat(lit("s"), col("l_suppkey")).as("dst"))
    val longE = base.select((col("o_custkey") * 2).as("src"),
      (col("l_suppkey") * 2 + 1).as("dst"))
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[ids] $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm both arms once (JIT, footers) before the measured reps
    graft.steps.GraphOps.pageRank(stringE, 1).write
      .format("noop").mode("overwrite").save()
    graft.steps.GraphOps.pageRank(longE, 1).write
      .format("noop").mode("overwrite").save()
    for (r <- 1 to reps) {
      time(s"g5 string rep$r") { graft.steps.GraphOps.pageRank(stringE, 5)
        .write.format("noop").mode("overwrite").save() }
      time(s"g5 long   rep$r") { graft.steps.GraphOps.pageRank(longE, 5)
        .write.format("noop").mode("overwrite").save() }
      time(s"g4 string rep$r") { graft.steps.GraphOps.kCorePeel(stringE, 10, 6)
        .write.format("noop").mode("overwrite").save() }
      time(s"g4 long   rep$r") { graft.steps.GraphOps.kCorePeel(longE, 10, 6)
        .write.format("noop").mode("overwrite").save() }
    }
    spark.stop()
  }
}
