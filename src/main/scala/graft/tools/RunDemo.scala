package graft.tools

import graft.core.Sessions
import graft.steps.DemoPipeline

/** Run the ported demo pipeline (Step1 → Step2) against a local state
  * dir and print the step reports as JSON lines — the engine's analog
  * of the reference's Pipes materialization messages. */
object RunDemo {
  def main(args: Array[String]): Unit = {
    val stateDir = args.headOption.getOrElse("/tmp/graft_demo_state")
    val spark = Sessions.local()
    val reports = DemoPipeline.run(spark, stateDir)
    reports.foreach { r =>
      val md = r.result.metadata.map { case (k, v) => s""""$k":"$v"""" }
        .mkString("{", ",", "}")
      println(s"""{"step":"${r.step}","ok":${r.ok},"seconds":${f"${r.seconds}%.2f"},"metadata":$md,"error":${r.error.map(e => "\"" + e.replace("\"", "'") + "\"").getOrElse("null")}}""")
    }
    spark.stop()
    if (reports.exists(!_.ok)) sys.exit(1)
  }
}
