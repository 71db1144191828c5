package graft

import graft.ops.Relational
import graft.core.Tables

/** Operator sanity + physical-plan assertions at sf0.001. Value-level
  * correctness is the driver's DuckDB gate (t2); here we pin the
  * *plans* — broadcast where intended, pushdown reaching the scan —
  * because those are the properties that decide 100 TB behavior. */
class OperatorSpec extends SparkSpec {

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("every declared query returns rows (except possibly anti join)") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
      if (name != "q09_anti_join") assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q01 projection prunes columns at the scan") {
    val plan = physicalPlan(Relational.q01ScanProject(spark, sf))
    assert(plan.contains("ReadSchema"))
    // only the three projected columns reach the reader
    val read = plan.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_extendedprice"))
  }

  test("q02 predicates are pushed to parquet") {
    val plan = physicalPlan(Relational.q02Filter(spark, sf))
    assert(plan.contains("PushedFilters: ["))
    assert(plan.contains("LessThan(l_shipdate") || plan.contains("l_shipdate)"))
  }

  test("q06/q07 use broadcast joins for dimensions") {
    assert(physicalPlan(Relational.q06BroadcastJoin(spark, sf))
      .contains("BroadcastHashJoin"))
    val star = physicalPlan(Relational.q07StarJoin(spark, sf))
    // customer/nation/region all broadcast; no shuffle of lineitem for them
    assert("BroadcastHashJoin".r.findAllIn(star).size >= 3)
  }

  test("q13 top-k plans as TakeOrderedAndProject (no global sort)") {
    val plan = physicalPlan(Relational.q13TopK(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"))
  }

  test("q05 aggregates partially before the shuffle") {
    val plan = physicalPlan(Relational.q05GroupbyAgg(spark, sf))
    assert("HashAggregate".r.findAllIn(plan).size >= 2) // partial + final
  }

  test("oracle coverage: every query has an oracle or a documented rows-only") {
    val rowsOnly = Set("q18_approx_distinct", "c3_simhash_neardup", "c7_ann_ivf",
      "c8_srp_neardup", "m1_media_features")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == rowsOnly, s"unexpected rows-only: ${missing -- rowsOnly}")
    // and no orphan oracles
    assert((SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet).isEmpty)
  }

  test("q20 batch time bucket covers all events") {
    val total = Relational.q20TimeBucket(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
  }
}
