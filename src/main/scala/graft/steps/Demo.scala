package graft.steps

import org.apache.spark.sql.functions._
import graft.core._

/** Port of the reference demo pipeline (ascii-hydra
  * `pipeline_example/step_1.py:12-53`, `step_2.py:10-43`) onto the
  * graft step framework — seeded so reruns are deterministic where
  * the original used an unseeded RNG.
  */

/** Step 1: synthesize 100 rows `(id:int, random_text:str(15),
  * value:int∈[1,100])`, write parquet (overwrite). The synthesis is
  * distributed (`spark.range` + seeded hash-derived columns), not a
  * driver-side list like the original — same schema and statistics,
  * but the pattern survives a num_rows with nine more zeros. */
final class Step1(numRows: Long = 100, seed: Long = 42L) extends PipelineStep {
  val name = "step1"

  /** 15-char seeded alphanumeric: 15 base-62 digits from xxhash64
    * draws (two 64-bit draws per char position would be overkill; one
    * draw per char keeps it uniform over 62 symbols). */
  private val alphabet = lit(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789")

  def execute(ctx: RunContext): StepResult = {
    val start = java.time.Instant.now.toString
    val chars = (0 until 15).map { p =>
      substring(alphabet,
        (pmod(xxhash64(lit(seed), col("id"), lit(p)), lit(62)) + 1).cast("int"),
        lit(1))
    }
    val df = ctx.spark.range(numRows).select(
      col("id").cast("int").as("id"),
      concat(chars: _*).as("random_text"),
      (pmod(xxhash64(lit(seed + 1), col("id")), lit(100)) + 1)
        .cast("int").as("value"))
    df.show(10)
    val res = ctx.io.write(df, ctx.paths.assetPath("random_data"))
    StepResult(
      metadata = Map(
        "time_start" -> start,
        "time_end" -> java.time.Instant.now.toString,
        "rows_written" -> res.rowCount.toString),
      dataVersion = Some("1.0"))
  }
}

/** Step 2: read step 1's output, derive text_length, aggregate
  * avg(text_length) / avg(value) / distinct-text count — one job
  * computing all three (the original runs three separate actions over
  * the same scan; at scale that's three reads). */
final class Step2 extends PipelineStep {
  val name = "step2"
  override val deps: Seq[String] = Seq("step1")

  def execute(ctx: RunContext): StepResult = {
    val start = java.time.Instant.now.toString
    val df = ctx.io.read(ctx.paths.assetPath("random_data"))
    df.show(10)
    val row = df.agg(
      avg(length(col("random_text"))).as("avg_text_length"),
      countDistinct(col("random_text")).as("num_distinct_texts"),
      avg(col("value")).as("avg_value")).collect()(0)
    StepResult(
      metadata = Map(
        "time_start" -> start,
        "time_end" -> java.time.Instant.now.toString,
        "num_distinct_texts" -> row.getAs[Long]("num_distinct_texts").toString,
        "avg_text_length" -> row.getAs[Double]("avg_text_length").toString,
        "avg_value" -> row.getAs[Double]("avg_value").toString),
      dataVersion = Some("1.0"))
  }
}

/** Demo pipeline entry: run both steps locally against a temp root. */
object DemoPipeline {
  def run(spark: org.apache.spark.sql.SparkSession, stateDir: String): Seq[StepReport] = {
    val paths = PathResolver(ExecutionMode.SmallDevSampleLocal,
      localStateDir = stateDir)
    val ctx = RunContext(spark, ExecutionMode.SmallDevSampleLocal, Engine.Local,
      partitionKey = None, paths, new ParquetIOManager(spark))
    new PipelineRunner(Seq(new Step1(), new Step2())).run(ctx)
  }
}
