package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Dev-only staged diagnostic for the g4 100× probe: times each phase
  * of the k-core input build separately to locate the memory wall
  * (edge rollup with the hinted orders broadcast vs shuffled, the
  * symmetric-closure distinct, one peel round). Not a gate. */
object ProbeG4 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = Sessions.local()
    def ms[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val li = Tables.lineitem(spark, d)
    val o = Tables.orders(spark, d)
    println(s"[probe] lineitem=${ms("count li")(li.count())} orders=${ms("count o")(o.count())}")
    if (!args.contains("noB")) {
      val n = ms("edges WITH broadcast hint")(
        graft.steps.GraphOps.edges(li, o).count())
      println(s"[probe] edges=$n")
    }
    val edgesNoHint = li
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
      .join(o.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey").as("custkey"), col("l_suppkey").as("suppkey"))
      .agg(count(lit(1)).as("n_transactions"))
    val en = ms("edges NO hint")(edgesNoHint.count())
    println(s"[probe] edges(nohint)=$en")
    val ed = edgesNoHint
      .select(concat(lit("c"), col("custkey")).as("src"),
        concat(lit("s"), col("suppkey")).as("dst"))
    val closure = ms("closure distinct + ckpt")(
      ed.select(col("src"), col("dst"))
        .unionAll(ed.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .localCheckpoint(true))
    println(s"[probe] closure rows=${ms("closure count")(closure.count())}")
    val keep = closure.groupBy("src").agg(count(lit(1)).as("deg"))
      .where(col("deg") >= 2).select("src")
    val r1 = ms("one peel round")(
      closure.join(keep, Seq("src"), "left_semi")
        .join(keep.withColumnRenamed("src", "dst"), Seq("dst"), "left_semi")
        .localCheckpoint(true))
    println(s"[probe] after round1=${r1.count()}")
    spark.stop()
  }
}
