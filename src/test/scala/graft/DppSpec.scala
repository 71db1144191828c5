package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import graft.steps.PartitionedEvents

/** Dynamic partition pruning: the fact scan must carry a
  * DynamicPruningExpression in its PartitionFilters and physically
  * skip non-matching `event_date=` partitions — in BOTH plan shapes
  * (broadcast-reuse and subquery). */
class DppSpec extends SparkSpec {

  /** The events-by-date fact scan of an executed plan (AQE-aware:
    * the final plan hides inside AdaptiveSparkPlanExec/stages). */
  private def factScan(df: DataFrame): FileSourceScanExec = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
      case q: QueryStageExec        => allScans(q.plan)
      case s: FileSourceScanExec    => Seq(s)
      case other                    => other.children.flatMap(allScans)
    }
    val scans = allScans(df.queryExecution.executedPlan)
      .filter(_.metadata.get("Location").exists(_.contains("events_by_date")))
    assert(scans.nonEmpty, "no events_by_date scan in plan")
    scans.head
  }

  private def withConf[A](pairs: (String, String)*)(f: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def assertPruned(q: DataFrame): Unit = {
    val expected = graft.core.Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
      .where(dayofweek(col("event_date")) === 2)
      .select(col("event_date")).distinct().count()
    q.collect() // execute THIS QueryExecution so its scan metrics fill
    val scan = factScan(q)
    assert(scan.partitionFilters.exists(
      _.find(_.isInstanceOf[
        org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression
      ]).isDefined),
      s"no DynamicPruningExpression in partition filters: " +
        scan.partitionFilters.mkString("; "))
    // physical proof: partitions actually read < partitions on disk
    val readParts = scan.metrics("numPartitions").value
    val totalParts = graft.core.Tables.events(spark, sf)
      .select(to_date(col("ts"))).distinct().count()
    assert(readParts == expected,
      s"read $readParts partitions, expected only the $expected Mondays")
    assert(readParts < totalParts,
      s"no pruning: read all $totalParts partitions")
  }

  test("DPP via broadcast reuse (default shape): scan reads only Mondays") {
    assertPruned(PartitionedEvents.mondayActivity(spark, sf))
  }

  test("DPP via subquery (broadcast disabled): scan still prunes") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      // without a broadcast to reuse, DPP must be allowed to run the
      // dim as its own subquery (off by default because it re-executes
      // the dim side; at 100 TB re-running a dim scan to skip 99% of
      // a fact scan is the right trade)
      "spark.sql.optimizer.dynamicPartitionPruning.reuseBroadcastOnly" -> "false"
    ) {
      assertPruned(PartitionedEvents.mondayActivity(spark, sf))
    }
  }

  test("pruned result equals the unpruned join") {
    val pruned = PartitionedEvents.mondayActivity(spark, sf)
    val unpruned = graft.core.Tables.events(spark, sf)
      .withColumn("event_date", to_date(col("ts")))
      .where(dayofweek(col("event_date")) === 2)
      .groupBy(col("event_date").cast("string").as("event_date"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double")
          .as("sum_value"))
    assert(pruned.exceptAll(unpruned).count() == 0)
    assert(unpruned.exceptAll(pruned).count() == 0)
    assert(pruned.count() > 0)
  }
}
