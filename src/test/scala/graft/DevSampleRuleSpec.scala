package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.plans.DevSampleRule

/** The injected dev-sampling rule: inert by default, samples leaf
  * scans when enabled, deterministic, never compounds. */
class DevSampleRuleSpec extends SparkSpec {

  private def withFraction[A](f: Double)(body: => A): A = {
    spark.conf.set(DevSampleRule.fractionKey, f.toString)
    try body finally spark.conf.unset(DevSampleRule.fractionKey)
  }

  test("inert without the conf; samples scans with it") {
    val full = Tables.lineitem(spark, sf).count()
    val sampled = withFraction(0.1) {
      val df = Tables.lineitem(spark, sf)
      assert(df.queryExecution.optimizedPlan.toString.contains("Sample"))
      df.count()
    }
    assert(Tables.lineitem(spark, sf).count() == full) // conf unset → full again
    assert(sampled > 0 && sampled < full / 2,
      s"sampled=$sampled full=$full")
    // deterministic across runs
    assert(withFraction(0.1)(Tables.lineitem(spark, sf).count()) == sampled)
  }

  test("does not compound through optimizer rewrites (joins, pruning)") {
    withFraction(0.5) {
      val df = Relationalish()
      val plan = df.queryExecution.optimizedPlan.toString
      // exactly one Sample per base relation, not per optimizer pass
      assert("Sample".r.findAllIn(plan).size == 2, plan.take(600))
    }
  }

  private def Relationalish() = {
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
    val c = Tables.customer(spark, sf).select("c_custkey")
    o.join(c, col("o_custkey") === col("c_custkey")).groupBy("c_custkey").count()
  }
}
