package graft.steps

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dynamic partition pruning over the `event_date=` Hive layout — the
  * runtime half of the partition story the reference's layout
  * presumes (ascii-hydra `pipes/utils.py:56-62` partitions every
  * fact by date so date-dimension joins touch only matching days).
  * Static pruning (a literal `event_date = X` predicate) is proved by
  * PartitionedAssetSpec; THIS path proves the join-driven case: the
  * set of live dates is only known at runtime (it comes out of a
  * filtered dimension), so Catalyst must inject a
  * `DynamicPruningExpression` into the fact scan's PartitionFilters —
  * at 100 TB the difference between scanning 7 partitions and
  * scanning 2,500.
  *
  * Two plan shapes, both asserted in DppSpec:
  *   - broadcast dim (the default): DPP reuses the broadcast
  *     exchange's result as an IN-set on the partition column;
  *   - no broadcast (`reuseBroadcastOnly=false`): DPP runs the dim
  *     side as a scalar subquery feeding the same partition filter —
  *     the shape a large dim forces on a real cluster.
  */
object PartitionedEvents {

  /** Hive-partitioned `event_date=` tree for the events fixture,
    * written once per (JVM, sfDir) — repeated gate/bench invocations
    * re-read the same layout (the layout is an ingest-time asset; its
    * write cost must not ride every query, same discipline as
    * Tables.registerCatalog). */
  def layout(s: SparkSession, d: String): String = cache.synchronized {
    cache.getOrElseUpdate((d), {
      val dir = graft.streaming.EventsStream.scratchDir("graft_events_by_date")
      val base = s"$dir/events_by_date"
      new graft.core.ParquetIOManager(s).write(
        graft.core.Tables.events(s, d)
          .withColumn("event_date", to_date(col("ts"))),
        base, partitionBy = Seq("event_date"))
      base
    })
  }
  private val cache = scala.collection.mutable.Map.empty[String, String]

  /** The partitioned fact, read through basePath so `event_date`
    * survives as a partition column. */
  def fact(s: SparkSession, d: String): DataFrame = {
    val base = layout(s, d)
    s.read.option("basePath", base).parquet(base)
  }

  /** A date dimension DERIVED at runtime (distinct event dates +
    * day-of-week), filtered to Mondays — the filter lives on a dim
    * attribute, not the partition column, so only DPP can prune. */
  def mondayDim(s: SparkSession, d: String): DataFrame =
    graft.core.Tables.events(s, d)
      .select(to_date(col("ts")).as("event_date"))
      .distinct()
      .withColumn("weekday", dayofweek(col("event_date"))) // 1=Sun … 7=Sat
      .where(col("weekday") === 2) // Mondays

  /** Gated query: per-Monday event counts/sums where the Monday set
    * flows from the dim join at runtime. The fact scan must read only
    * the matching `event_date=` partitions. */
  def mondayActivity(s: SparkSession, d: String): DataFrame =
    fact(s, d)
      .join(mondayDim(s, d).select("event_date"), Seq("event_date"))
      .groupBy(col("event_date").cast("string").as("event_date"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 2).cast("double")
          .as("sum_value"))
      .orderBy("event_date")
}
