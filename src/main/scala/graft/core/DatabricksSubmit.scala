package graft.core

/** Databricks submit model — pure builders for the SubmitTask /
  * new_cluster shapes the reference sends to
  * `WorkspaceClient.jobs.submit` (ascii-hydra
  * `pipes/databricks.py:130-230`, `pipes/spark_pipes_factory.py:
  * 36-73,229-269`, `resources/databricks.py:33-49`), completing the
  * three-engine config story next to [[FleetConfig]] (EMR) and the
  * local subprocess path. No cloud calls: the builders produce the
  * exact dict the SDK would serialize; a live adapter submits it.
  */
object DatabricksSubmit {

  /** `dev_databricks_cluster_config` (`resources/databricks.py:33-49`)
    * defaults, jar-flavored for a Scala engine. */
  final case class Autoscale(minWorkers: Int = 1, maxWorkers: Int = 3)

  final case class AwsAttributes(
      firstOnDemand: Int = 1,
      availability: String = "SPOT_WITH_FALLBACK",
      zoneId: String = "us-east-1d",
      instanceProfileArn: Option[String] = None,
      spotBidPricePercent: Int = 100)

  final case class NewCluster(
      autoscale: Autoscale = Autoscale(),
      sparkVersion: String = "14.2.x-scala2.12",
      aws: AwsAttributes = AwsAttributes(),
      nodeTypeId: String = "m6id.2xlarge",
      driverNodeTypeId: String = "md-fleet.xlarge",
      enableElasticDisk: Boolean = true,
      sparkEnvVars: Map[String, String] = Map.empty)

  /** Library entries (`get_libs_dict`,
    * `spark_pipes_factory.py:36-52`): PyPI-style registry packages
    * keep `name[constraint]`; built artifacts resolve to a bucket
    * URI. */
  sealed trait LibraryEntry
  final case class RegistryLib(packageStr: String) extends LibraryEntry
  final case class ArtifactLib(uri: String) extends LibraryEntry

  def libsDict(cfg: Seq[LibraryConfig], bucket: String): Seq[LibraryEntry] =
    cfg.map {
      case LibraryConfig(LibraryKind.Pypi, name, version) =>
        RegistryLib(name + version.getOrElse(""))
      case LibraryConfig(LibraryKind.Wheel, nameId, _) =>
        ArtifactLib(s"s3://$bucket/$nameId")
    }

  /** `generate_uploaded_script_paths`
    * (`spark_pipes_factory.py:61-73`): strip the local dir and
    * extension, re-root under `{prefix}/{deployment}/`. The reference
    * notes (and accepts) the parallel-run overwrite race; path shape
    * kept for that fidelity. */
  def uploadedScriptPath(localPath: String, deployment: String,
      prefix: String = "dbfs:/external_pipes", ext: String = "jar"): String = {
    val base = localPath.split('/').last
    val stem = base.lastIndexOf('.') match {
      case -1 => base
      case i => base.substring(0, i)
    }
    s"$prefix/$deployment/$stem.$ext"
  }

  /** The env-injection merge (`databricks.py:196-212`): existing
    * cluster vars < caller env < pipes bootstrap vars < tracking var —
    * later sources win, and the tracking key is always present (empty
    * default), matching the ASCII_WANDB handling. */
  def withEnv(c: NewCluster,
      env: Map[String, String],
      bootstrapEnv: Map[String, String],
      trackingKey: String = "GRAFT_TRACKING",
      processEnv: Map[String, String] = sys.env): NewCluster =
    c.copy(sparkEnvVars = c.sparkEnvVars ++ env ++ bootstrapEnv +
      (trackingKey -> processEnv.getOrElse(trackingKey, "")))

  /** Run-config spot-bid override (`spark_pipes_factory.py:240-247`):
    * BaseConfig's spot_bid_price_percent replaces the cluster's. */
  def withSpotBid(c: NewCluster, bid: Option[Double]): NewCluster =
    bid.fold(c)(b => c.copy(aws = c.aws.copy(spotBidPricePercent = b.toInt)))

  /** `_process_submit_args` (`databricks.py:130-153`): submit kwargs
    * are whitelisted by type; anything else is a TypeError. The typed
    * settings are modeled as [[SubmitSetting]]s. */
  sealed trait SubmitSetting
  final case class EmailNotifications(onFailure: Seq[String]) extends SubmitSetting
  final case class QueueSettings(enabled: Boolean) extends SubmitSetting
  final case class TimeoutSeconds(seconds: Int) extends SubmitSetting

  def processSubmitArgs(args: Map[String, Any]): Map[String, Any] =
    args.map {
      case (k, v: SubmitSetting) => k -> v
      case (k, v: Int) => k -> v
      case (k, v: Seq[_]) => k -> v
      case (k, v) => throw new IllegalArgumentException(
        s"Unexpected type for submit_arg $k: ${v.getClass.getName}")
    }

  /** The task the factory builds (`spark_pipes_factory.py:248-258`):
    * one task keyed "dagster-launched" running the uploaded script on
    * a fresh cluster with the resolved libraries. */
  final case class SubmitTask(
      taskKey: String,
      newCluster: NewCluster,
      libraries: Seq[LibraryEntry],
      scriptPath: String)

  def buildTask(cluster: NewCluster, libraries: Seq[LibraryConfig],
      additionalLibraries: Seq[LibraryConfig], bucket: String,
      uploadedScript: String, spotBidOverride: Option[Double],
      taskKey: String = "graft-launched"): SubmitTask =
    SubmitTask(taskKey,
      withSpotBid(cluster, spotBidOverride),
      libsDict(libraries ++ additionalLibraries, bucket),
      uploadedScript)

  /** Job naming (`handle_shared_parameters`,
    * `spark_pipes_factory.py:283-295`) — note the reference's
    * different field orders with/without a partition key, kept. */
  def jobName(assetName: String, deployment: String, mode: ExecutionMode,
      partitionKey: Option[String]): String =
    partitionKey match {
      case Some(pk) => s"${assetName}_${deployment}_${mode.value}_$pk"
      case None => s"${assetName}_${mode.value}_$deployment"
    }
}
