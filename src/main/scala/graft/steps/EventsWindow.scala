package graft.steps

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._

/** Time-partitioned asset — the reference's partitions_def flow run
  * end-to-end (ascii-hydra `pipes/spark_pipes_factory.py:102,286-293`:
  * partition_key threaded into job extras;
  * `resources/parquet_io_manager.py:83-91`: time-window output path).
  *
  * [[RunContext.partitionKey]] (an ISO date) selects one day of
  * events; the step materializes BOTH layouts the reference supports:
  *   - the `{base}/{key}/{start}_{end}.parquet` time-window file
  *     ([[PathResolver.timeWindowPath]]), and
  *   - a Hive-partitioned `event_date=` tree written with dynamic
  *     partition overwrite, so re-running a day replaces only that
  *     day's partition and a read back through
  *     [[ParquetIOManager.readPartitioned]] prunes to it.
  */
object EventsWindow {

  final class EventsWindowStep(sfDir: String) extends PipelineStep {
    val name = "events_window"
    def execute(ctx: RunContext): StepResult = {
      val key = ctx.partitionKey.getOrElse(throw new PipesException(
        s"$name is time-partitioned: RunContext.partitionKey required"))
      val day = java.time.LocalDate.parse(key)
      val start = day.atStartOfDay
      val end = start.plusDays(1)
      // window bounds evaluate in the SESSION timezone (UTC), same as
      // to_date below — a java.sql.Timestamp literal would bind the
      // JVM default zone and make the two layouts disagree off-UTC
      val ev = Tables.events(ctx.spark, sfDir)
        .where(col("ts") >= to_timestamp(lit(key)) &&
          col("ts") < to_timestamp(lit(day.plusDays(1).toString)))
      val windowed = ctx.io.write(ev, ctx.paths.timeWindowPath(name, start, end))
      val partitioned = ctx.io.write(
        ev.withColumn("event_date", to_date(col("ts"))),
        ctx.paths.assetPath("events_by_date"),
        partitionBy = Seq("event_date"))
      StepResult(Map(
        "rows" -> windowed.rowCount.toString,
        "partition_key" -> key,
        "window_path" -> windowed.path,
        "partitioned_path" -> partitioned.path))
    }
  }

  def run(spark: SparkSession, sfDir: String, stateDir: String,
      partitionKey: String): Seq[StepReport] = {
    val paths = PathResolver(ExecutionMode.SmallDevSampleLocal,
      localStateDir = stateDir)
    val ctx = RunContext(spark, ExecutionMode.SmallDevSampleLocal, Engine.Local,
      Some(partitionKey), paths, new ParquetIOManager(spark))
    new PipelineRunner(Seq(new EventsWindowStep(sfDir))).run(ctx)
  }
}
