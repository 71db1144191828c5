package graft.tools

import graft.core.Sessions
import graft.steps.GraphPipeline

/** Run the interfirm-graph pipeline (nodes → edges → graph →
  * graph_aggr) against a fixture dir, materializing each asset as
  * parquet under the state dir; prints JSON-line step reports. */
object RunGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val stateDir = args.lift(1).getOrElse("/tmp/graft_graph_state")
    val spark = Sessions.local()
    val reports = GraphPipeline.run(spark, sfDir, stateDir)
    reports.foreach { r =>
      val md = r.result.metadata.map { case (k, v) => s""""$k":"$v"""" }
        .mkString("{", ",", "}")
      println(s"""{"step":"${r.step}","ok":${r.ok},"seconds":${f"${r.seconds}%.2f"},"metadata":$md}""")
    }
    spark.stop()
    if (reports.exists(!_.ok)) sys.exit(1)
  }
}
