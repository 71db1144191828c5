package graft.tools

import graft.core.{Sessions, Tables}

/** Dev-only timing scratch (not part of the driver contract):
  * `tools/run.sh graft.tools.Scratch SF_DIR name…` times the named
  * SparkEntry queries (all if none given). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val only = args.drop(1).toSet
    val spark = Sessions.local()
    graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        val rows = fn(spark, d).count()
        println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      }
    spark.stop()
  }
}
