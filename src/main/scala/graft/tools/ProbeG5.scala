package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Sessions, Tables}

/** Dev-only A/B diagnostic for the g5 PageRank loop: runs BOTH loop
  * shapes — "fat" (outdeg carried on every edge; the pre-round-12
  * formulation) and "slim" (bare 2-col closure + pinned node-sized
  * outdeg; the round-12 formulation) — on the same box, same session,
  * with per-round wall times and the round-1 executed plan, so a
  * regression in either shape is attributable to a plan node instead
  * of box noise. Not a gate. Usage:
  *   tools/run.sh graft.tools.ProbeG5 [SF_DIR] [fat|slim|both]
  */
object ProbeG5 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/graft_sf1")
    val which = args.drop(1).headOption.getOrElse("both")
    val parent = Sessions.local()
    def ms[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[g5probe] $name: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      r
    }
    val edges = ms("edges build")(graft.steps.GraphOps
      .edges(Tables.lineitem(parent, d), Tables.orders(parent, d))
      .select(concat(lit("c"), col("custkey")).as("src"),
        concat(lit("s"), col("suppkey")).as("dst"))
      .localCheckpoint(true))
    println(s"[g5probe] edges=${edges.count()}")

    def damp(sdf: DataFrame): DataFrame = sdf.select(col("node"),
      (lit(150000L) + expr(
        "(s div 1000000) * 850000 + ((s % 1000000) * 850000) div 1000000"
      )).as("pr"))

    def loop(tag: String, slim: Boolean): Unit = {
      val spark = parent.newSession()
      spark.conf.set("spark.sql.shuffle.partitions",
        parent.conf.get("spark.sql.shuffle.partitions"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val in = org.apache.spark.sql.graft.StreamShims.rebind(spark, edges)
      val n0 = spark.conf.get("spark.sql.shuffle.partitions").toInt
      val iterCkpt = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
      var e = ms(s"$tag closure")(in.select(col("src"), col("dst"))
        .unionAll(in.select(col("dst").as("src"), col("src").as("dst")))
        .distinct()
        .repartition(n0, col("src"))
        .sortWithinPartitions("src")
        .localCheckpoint(true, iterCkpt))
      e = graft.core.Parallelism.resizeCheckpoint(
        e, n0, col("src"), iterCkpt, sorted = true)
      val n = e.rdd.getNumPartitions
      if (n != n0) spark.conf.set("spark.sql.shuffle.partitions", n)
      println(s"[g5probe] $tag parts=$n bytes=" +
        graft.core.Parallelism.persistedBytes(e).getOrElse(-1L))
      if (slim) {
        val outdeg = ms(s"$tag outdeg")(e.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("outdeg")).localCheckpoint(true))
        var pr = outdeg.select(col("node"), lit(1000000L).as("pr"))
          .localCheckpoint(true)
        for (i <- 1 to 5) {
          val share = pr.join(outdeg, "node")
            .select(col("node"), expr("pr div outdeg").as("c"))
          val round = e.join(share, e("src") === share("node"))
            .select(col("dst"), col("c"))
            .groupBy(col("dst").as("node")).agg(sum(col("c")).as("s"))
          val next = ms(s"$tag round $i")(damp(round).localCheckpoint(true))
          if (i == 1) println(next.queryExecution.executedPlan.toString
            .linesIterator.map(l => s"[plan-$tag] $l").mkString("\n"))
          pr.unpersist(); pr = next
        }
        println(s"[g5probe] $tag checksum=" +
          pr.agg(sum(col("pr"))).head.getLong(0))
        e.unpersist(blocking = true); outdeg.unpersist(blocking = true)
        pr.unpersist(blocking = true)
      } else {
        var withDeg = ms(s"$tag withDeg")(e
          .join(e.groupBy("src").agg(count(lit(1)).as("outdeg")), "src")
          .repartition(n, col("src"))
          .sortWithinPartitions("src")
          .localCheckpoint(true, iterCkpt))
        var pr = e.select(col("src").as("node")).distinct()
          .withColumn("pr", lit(1000000L))
          .repartition(n, col("node"))
          .localCheckpoint(true)
        for (i <- 1 to 5) {
          val round = withDeg
            .join(pr, withDeg("src") === pr("node"))
            .select(col("dst"), expr("pr div outdeg").as("c"))
            .groupBy(col("dst").as("node")).agg(sum(col("c")).as("s"))
          val next = ms(s"$tag round $i")(damp(round).localCheckpoint(true))
          if (i == 1) println(next.queryExecution.executedPlan.toString
            .linesIterator.map(l => s"[plan-$tag] $l").mkString("\n"))
          pr.unpersist(); pr = next
        }
        println(s"[g5probe] $tag checksum=" +
          pr.agg(sum(col("pr"))).head.getLong(0))
        withDeg.unpersist(blocking = true); pr.unpersist(blocking = true)
      }
    }
    if (which == "fat" || which == "both") loop("fat", slim = false)
    if (which == "slim" || which == "both") loop("slim", slim = true)
    parent.stop()
  }
}
