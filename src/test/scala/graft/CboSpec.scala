package graft

/** CBO statistics feeding: catalog tables + ANALYZE give the
  * optimizer real row/column stats, and the un-hinted star join
  * (q34) must find the broadcast-star plan from them — the last gap
  * between "plans with my hints" and "plans the optimizer finds"
  * (the reference's cbo.joinReorder tuning presumes exactly this). */
class CboSpec extends SparkSpec {

  test("catalog registration feeds row and column statistics to the optimizer") {
    graft.core.Tables.registerCatalog(spark, sf)
    val st = spark.table("graft.lineitem").queryExecution.optimizedPlan.stats
    assert(st.rowCount.isDefined && st.rowCount.get > 0,
      s"no rowCount statistic on graft.lineitem: $st")
    assert(st.attributeStats.nonEmpty,
      "no column-level statistics on graft.lineitem")
    assert(st.attributeStats.exists(_._2.histogram.isDefined),
      "no equi-height histograms on graft.lineitem (selectivity path)")
    // registration is cached per (session, dir): second call is a no-op
    graft.core.Tables.registerCatalog(spark, sf)
  }

  test("hint-free star join broadcasts every dimension from stats alone") {
    val q = graft.ops.Relational.q34CboStarUnhinted(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("un-hinted CBO plan returns exactly the hinted q07 result") {
    val unhinted = graft.ops.Relational.q34CboStarUnhinted(spark, sf).collect().toSeq
    val hinted = graft.ops.Relational.q07StarJoin(spark, sf).collect().toSeq
    assert(unhinted == hinted)
  }
}
