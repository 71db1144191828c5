package graft.tools

import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Dev-only measurement for the g6 residual (round-11 VERDICT "what's
  * wrong" #2): counts the census's intermediates — incidence pairs,
  * the weighted projection, the WEDGE-JOIN output, and closed
  * triangles — at a given fixture dir, so the "g6's 10× residual is
  * wedge-OUTPUT growth (data-, not shuffle-bound)" attribution is a
  * measured number instead of an assertion. Run at sf0.1 and at the
  * 10× dir; compare. Not a gate. */
object ProbeG6 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.local()
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    def ms[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe-g6] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val inc = Tables.lineitem(spark, d).select("l_orderkey", "l_suppkey")
      .join(broadcast(Tables.orders(spark, d)
        .select("o_orderkey", "o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("left"), col("l_suppkey").as("right"))
    val nInc = ms("incidence distinct")(
      inc.select(col("left"), col("right")).distinct().count())
    val co = ms("projection build")(
      graft.steps.GraphOps.coProjection(inc, 10000, 8))
    val nCo = co.count()
    val wedges = co.alias("ab")
      .join(co.alias("bc"), col("ab.b") === col("bc.a"))
    val nWedge = ms("wedge join count")(wedges.count())
    val nTri = ms("closed triangles")(
      wedges.select(col("ab.a").as("ta"), col("ab.b").as("tb"),
          col("bc.b").as("tc"))
        .join(co.alias("ac"),
          col("ta") === col("ac.a") && col("tc") === col("ac.b"),
          "left_semi")
        .count())
    println(s"[probe-g6] dir=$d incidence=$nInc co_pairs=$nCo " +
      s"wedges=$nWedge triangles=$nTri")
  }
}
