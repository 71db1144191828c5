package graft.core

import java.nio.file.{Paths => JPaths}

/** Deterministic IO-path policy — the part of the reference's data
  * model encoded in path strings:
  * roots per execution mode (ascii-hydra `spark_script_abc.py:32-67`),
  * Hive-partitioned inputs (`pipes/utils.py:56-62`), and
  * time-windowed outputs (`resources/parquet_io_manager.py:83-91`).
  *
  * Bucket names are caller-supplied config, never constants: the same
  * pipeline binds to dev/sample/full roots by [[ExecutionMode]] alone.
  */
final case class PathResolver(
    mode: ExecutionMode,
    sampleBucket: String = "graft-sample",
    seedBucket: String = "graft-seeds",
    devResultsBucket: String = "graft-dev-results",
    resultsBucket: String = "graft-results",
    localReferenceData: String = "reference-data",
    localStateDir: String = "z_state/graft_dev_pipeline") {

  private def localUri(p: String): String =
    JPaths.get(p).toAbsolutePath.normalize.toUri.toString.stripSuffix("/")

  /** Seed-node root (`get_base_path_seeds`). */
  def baseSeeds: String = mode match {
    case ExecutionMode.SmallDevSampleS3 => s"s3a://$sampleBucket/graft_seeds"
    case ExecutionMode.SmallDevSampleLocal =>
      localUri(s"$localReferenceData/graft_seeds")
    case ExecutionMode.Full => s"s3a://$seedBucket/graft_seeds"
  }

  /** Pipeline IO root (`get_base_path_IO`). */
  def baseIO: String = mode match {
    case ExecutionMode.SmallDevSampleS3 => s"s3a://$devResultsBucket"
    case ExecutionMode.SmallDevSampleLocal => localUri(localStateDir)
    case ExecutionMode.Full => s"s3a://$resultsBucket"
  }

  /** Raw-corpus root (`get_base_path_commoncrawl`). */
  def baseCorpus: String = mode match {
    case ExecutionMode.SmallDevSampleS3 => s"s3a://$sampleBucket/"
    case ExecutionMode.SmallDevSampleLocal =>
      localUri(s"$localReferenceData/pipeline_sample_data/corpus")
    case ExecutionMode.Full => s"s3a://commoncrawl/"
  }

  /** Hive-partitioned input path (`get_input_path`,
    * `pipes/utils.py:56-62`): `lang == "all"` selects every language
    * partition. Prefer reading with `basePath` + a partition-column
    * filter so Catalyst prunes instead of the glob — this string form
    * is kept for layout parity and externally-driven readers. */
  def inputPath(ioNodes: String, partSeed: String, partCrawl: String,
      lang: String): String = {
    val l = if (lang == "all") "*" else lang
    s"$ioNodes/seed_nodes=$partSeed/crawl_id=$partCrawl/main_language=$l"
  }

  /** Time-window output path
    * (`parquet_io_manager.py:83-91`): `{base}/{key}/{start}_{end}.parquet`,
    * timestamps rendered `yyyyMMddHHmmss`. */
  def timeWindowPath(assetKey: String, startTs: java.time.LocalDateTime,
      endTs: java.time.LocalDateTime): String = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyyMMddHHmmss")
    s"$baseIO/$assetKey/${fmt.format(startTs)}_${fmt.format(endTs)}.parquet"
  }

  /** Un-partitioned asset path (`parquet_io_manager.py:93-96`). */
  def assetPath(assetKey: String*): String =
    (baseIO +: assetKey).mkString("/") + ".parquet"
}

/** The ONE spelling of a file's URI that matches Spark's
  * `_metadata.file_path` / `input_file_name` exactly — the join-key
  * normalization every (file → metadata) broadcast dim in this repo
  * must use. Spark renders a scan file as a URL-ENCODED URI with a
  * NULL authority when there is none (`file:/tmp/a%20b`), while
  * `Path.toString` is DECODED and `Path.toUri.toString` renders an
  * EMPTY authority as `file:///` — so neither raw form joins safely
  * against the metadata column. Rebuilding through the multi-arg
  * `java.net.URI` constructor (which quotes `%`, spaces, `#`, …)
  * reproduces Spark's form for local, HDFS, and object-store URIs. */
private[graft] object UriKeys {
  def sparkPathKey(p: org.apache.hadoop.fs.Path): String = {
    val u = p.toUri
    val auth = Option(u.getAuthority).filter(_.nonEmpty).orNull
    new java.net.URI(u.getScheme, auth, u.getPath, null, null).toString
  }
}
