package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory — the Scala analog of the reference's local dev
  * Spark conf (ascii-hydra `src/.../resources/spark.py:17-75`) +
  * `configure_spark` (`src/.../pipes/utils.py:74-103`).
  *
  * The same policy set the reference tunes for its Common Crawl
  * workload, minus PySpark-only knobs (Arrow transfer) and with the
  * shuffle-partition count sized for the actual runtime instead of a
  * fixed 200/50: locally = cores, on a cluster = set via
  * [[ConfigPolicy.parallelism]].
  */
object Sessions {
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // AQE family — the reference enables these for its production
      // workload (resources/spark.py:37-41): runtime re-plan, skew-join
      // splitting, CBO join reorder.
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.cbo.enabled", "true")
      .config("spark.sql.cbo.joinReorder.enabled", "true")
      // The fixtures' events table uses parquet TIMESTAMP(NANOS);
      // read as long and convert (see Tables.withEventTs).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Custom codegen kernels as SQL functions (graft_cosine, ...).
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")

  /** Local session sized from env (driver runs local[32]). */
  def local(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
