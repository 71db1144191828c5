package graft.core

import org.apache.spark.sql.SparkSession

/** Engine/mode/library config model — the reference's API surface
  * (ascii-hydra `src/.../pipes/__init__.py:6-41`) as sealed Scala
  * types, so invalid combinations fail at compile time instead of at
  * cluster-submit time.
  */
sealed abstract class Engine(val value: String)
object Engine {
  case object Local extends Engine("spark-local")
  case object Databricks extends Engine("databricks")
  case object Emr extends Engine("emr")
  val all: Seq[Engine] = Seq(Local, Databricks, Emr)

  /** `get_engine_by_value` (`pipes/__init__.py:30-34`). */
  def fromValue(v: String): Engine =
    all.find(_.value == v).getOrElse(
      throw new IllegalArgumentException(s"No matching Engine for value: $v"))
}

sealed abstract class ExecutionMode(val value: String)
object ExecutionMode {
  case object Full extends ExecutionMode("full")
  case object SmallDevSampleS3 extends ExecutionMode("small_dev_sample_s3")
  /** Local sample mode must pair with [[Engine.Local]]
    * (`pipes/__init__.py:37-41`). */
  case object SmallDevSampleLocal extends ExecutionMode("small_dev_sample_local")
  val all: Seq[ExecutionMode] = Seq(Full, SmallDevSampleS3, SmallDevSampleLocal)
  def fromValue(v: String): ExecutionMode =
    all.find(_.value == v).getOrElse(
      throw new IllegalArgumentException(s"No matching ExecutionMode: $v"))

  /** The one cross-field rule the reference documents. */
  def validate(mode: ExecutionMode, engine: Engine): Unit =
    require(mode != SmallDevSampleLocal || engine == Engine.Local,
      s"ExecutionMode ${mode.value} requires Engine ${Engine.Local.value}")
}

sealed abstract class LibraryKind(val value: String)
object LibraryKind {
  case object Pypi extends LibraryKind("pypi")
  case object Wheel extends LibraryKind("whl")
}

/** (`pipes/__init__.py:11-21`): for Pypi, name + optional version
  * constraint; for Wheel, the artifact path. */
final case class LibraryConfig(kind: LibraryKind, nameId: String,
    version: Option[String] = None)

/** Per-run config (`spark_pipes_factory.py:300-307`): spot bid as a
  * percent of on-demand in (1, 100], optional engine override. */
final case class BaseConfig(
    spotBidPricePercent: Double = 60.0,
    overrideDefaultEngine: Option[String] = None) {
  require(spotBidPricePercent > 1.0 && spotBidPricePercent <= 100.0,
    s"spotBidPricePercent must be in (1, 100], got $spotBidPricePercent")
  def engineOverride: Option[Engine] = overrideDefaultEngine.map(Engine.fromValue)
}

/** Workload-sizing + write-policy knobs — the reference's
  * `configure_spark` (`pipes/utils.py:74-103`) with its bug fixed:
  * there, `partitionDiscovery_parallelism` silently overwrote
  * `spark.sql.shuffle.partitions`; here partition-discovery
  * parallelism sets its own key.
  */
final case class SparkConfPolicy(
    compressionCodec: String = "gzip",
    maxPartitionBytes: Long = 50L * 1024 * 1024,
    defaultParallelism: Option[Int] = None,
    shufflePartitions: Option[Int] = None,
    partitionDiscoveryParallelism: Option[Int] = None) {

  def settings(mode: ExecutionMode): Seq[(String, String)] = {
    val base = Seq(
      "spark.sql.parquet.compression.codec" -> compressionCodec,
      // many small splits: keeps 1000 executors busy on S3-throughput-
      // bound scans (the reference's Common Crawl tuning)
      "spark.sql.files.maxPartitionBytes" -> maxPartitionBytes.toString,
      "spark.sql.sources.partitionOverwriteMode" -> "dynamic")
    // Full-mode-only parallelism overrides (dev modes keep defaults).
    val full =
      if (mode != ExecutionMode.Full) Seq.empty
      else Seq(
        defaultParallelism.map("spark.default.parallelism" -> _.toString),
        shufflePartitions.map("spark.sql.shuffle.partitions" -> _.toString),
        partitionDiscoveryParallelism
          .map("spark.sql.sources.parallelPartitionDiscovery.parallelism" -> _.toString)
      ).flatten
    base ++ full
  }

  def apply(spark: SparkSession, mode: ExecutionMode): Unit =
    settings(mode).foreach { case (k, v) => spark.conf.set(k, v) }
}

/** Mode-based dataset sampling — the reference's A19 surface
  * (`pipes/spark_pipes.py:21`: "pipelines may apply a sampling
  * function"; realized there as pre-sampled input roots per
  * [[ExecutionMode]]). Here both forms exist: path switching via
  * [[PathResolver]], and an explicit seeded sample for when only the
  * full input exists. */
object Sampling {
  def fractionFor(mode: ExecutionMode): Option[Double] = mode match {
    case ExecutionMode.Full => None
    case ExecutionMode.SmallDevSampleS3 | ExecutionMode.SmallDevSampleLocal =>
      Some(0.01)
  }

  def forMode(df: org.apache.spark.sql.DataFrame, mode: ExecutionMode,
      seed: Long = 42L): org.apache.spark.sql.DataFrame =
    fractionFor(mode).map(f => df.sample(withReplacement = false, f, seed))
      .getOrElse(df)
}

// Parallelism (the `calculate_parallelism` port plus the measured
// partition-sizing policy the iterative loops share) lives in
// core/Parallelism.scala.
