package graft.core

/** EMR job preparation — pure builders for the reference's
  * `prepare_emr_job` flow (ascii-hydra `pipes/emr.py:73-240`):
  * bootstrap-script generation, job-config adjustment (fleets vs
  * groups), `spark.yarn.appMasterEnv` injection, and the extras
  * threading. Jar-flavored where the reference is wheel-flavored
  * (Scala engine): built artifacts land in `/usr/lib/spark/jars`,
  * registry libraries accumulate as `--packages` coordinates.
  */
object EmrSubmit {

  /** One `Configurations` entry (EMR classification). */
  final case class SparkClassification(
      classification: String,
      properties: Map[String, String])

  final case class BootstrapAction(name: String, scriptPath: String)

  final case class EmrInstances(
      instanceGroups: Option[Seq[String]] = None,
      instanceFleets: Option[Seq[FleetConfig.Fleet]] = None,
      ec2SubnetId: Option[String] = None,
      ec2SubnetIds: Option[Seq[String]] = None)

  final case class EmrJobConfig(
      name: String,
      configurations: Seq[SparkClassification] = Nil,
      instances: EmrInstances = EmrInstances(),
      managedScalingUnitType: Option[String] = None,
      bootstrapActions: Seq[BootstrapAction] = Nil)

  /** `create_bootstrap_script` (`emr.py:73-116`): the generated shell
    * script + its destination key under
    * `external_pipes/{deployment}/`. Returns (content, s3Uri).
    * Structure kept from the reference: header, package-manager prep
    * only when libraries are present, then one block per library —
    * artifacts are copied from the bucket and installed (here: into
    * the Spark jars dir), registry libs accumulate coordinates for
    * `spark.jars.packages`. */
  def bootstrapScript(
      libraries: Seq[LibraryConfig],
      bucket: String,
      deployment: String,
      outputFile: String = "bootstrap.sh"): (String, String) = {
    val sb = new StringBuilder("#!/bin/bash\n")
    if (libraries.nonEmpty) {
      sb.append("sudo yum update -y\n")
      libraries.foreach {
        case LibraryConfig(LibraryKind.Wheel, nameId, _) =>
          val name = Artifacts.libraryFromPath(nameId)
          val path = Artifacts.libraryToCloudPaths(name, "s3", deployment)
          sb.append(s"aws s3 cp s3://$bucket/$path /tmp \n")
          sb.append(s"sudo cp /tmp/$name-0.0.0-assembly.jar /usr/lib/spark/jars/ \n")
        case LibraryConfig(LibraryKind.Pypi, name, version) =>
          sb.append(s"echo '$name${version.getOrElse("")}'" +
            " >> /home/hadoop/extra_packages.txt \n")
      }
    }
    val destination = s"external_pipes/$deployment/$outputFile"
    (sb.toString, s"s3://$bucket/$destination")
  }

  /** `modify_env_var` (`emr.py:118-131`): inject
    * `spark.yarn.appMasterEnv.{key}` into every `spark-defaults`
    * classification. Reference fidelity: configs with other
    * classifications are untouched, and a config with NO
    * spark-defaults entry is returned unchanged (the reference loop
    * simply finds nothing). */
  def modifyEnvVar(config: EmrJobConfig, key: String, value: String): EmrJobConfig =
    config.copy(configurations = config.configurations.map { c =>
      if (c.classification == "spark-defaults")
        c.copy(properties = c.properties +
          (s"spark.yarn.appMasterEnv.$key" -> value))
      else c
    })

  /** `extract_filename_without_extension` + the bootstrap-name scheme
    * (`emr.py:133-138,160-163`). */
  def bootstrapScriptName(localFilePath: String): String = {
    val base = localFilePath.split('/').last
    val stem = base.lastIndexOf('.') match {
      case -1 => base
      case i => base.substring(0, i)
    }
    s"${stem}_bootstrap.sh"
  }

  /** `prepare_emr_job` (`emr.py:140-173`): when libraries ship, the
    * job config gains a single "Install custom packages" bootstrap
    * action pointing at the uploaded script; extras gain the final
    * job/step configs. Upload side effects are the caller's (routes
    * from [[CloudUpload.route]]); this builds the resulting config. */
  def prepareEmrJob(
      emrJobConfig: EmrJobConfig,
      stepConfig: Map[String, String],
      extras: Map[String, Any],
      bootstrapScriptUri: Option[String]): (Map[String, Any], EmrJobConfig) = {
    val withBootstrap = bootstrapScriptUri match {
      case Some(uri) => emrJobConfig.copy(bootstrapActions =
        Seq(BootstrapAction("Install custom packages", uri)))
      case None => emrJobConfig
    }
    val outExtras = extras +
      ("emr_job_config" -> withBootstrap) + ("step_config" -> stepConfig)
    (outExtras, withBootstrap)
  }

  /** `adjust_emr_job_config` (`emr.py:175-198`): no groups and no
    * fleets → fleets come from the [[FleetConfig]] build (managed
    * scaling switches to InstanceFleetUnits, subnet id cleared);
    * explicit instance groups → subnet id list cleared; fleets with
    * nothing to build from → error. */
  def adjustEmrJobConfig(config: EmrJobConfig,
      fleets: Option[Seq[FleetConfig.Fleet]]): EmrJobConfig =
    (config.instances.instanceGroups, config.instances.instanceFleets) match {
      case (None, None) =>
        fleets match {
          case Some(f) => config.copy(
            instances = config.instances.copy(
              instanceFleets = Some(f), ec2SubnetId = Some("")),
            managedScalingUnitType = Some("InstanceFleetUnits"))
          case None => throw new IllegalArgumentException(
            "No instance groups or fleets defined, and fleet_config is None.")
        }
      case (Some(_), _) =>
        config.copy(instances = config.instances.copy(ec2SubnetIds = Some(Nil)))
      case _ => config
    }

  /** `submit_emr_job`'s env injection (`emr.py:200-234`): the two
    * pipes bootstrap vars plus the always-present tracking var
    * (empty default) land in spark-defaults appMasterEnv. */
  def withBootstrapEnv(config: EmrJobConfig,
      bootstrapEnv: Map[String, String],
      trackingKey: String = "GRAFT_TRACKING",
      processEnv: Map[String, String] = sys.env): EmrJobConfig = {
    val all = bootstrapEnv + (trackingKey -> processEnv.getOrElse(trackingKey, ""))
    all.foldLeft(config) { case (c, (k, v)) => modifyEnvVar(c, k, v) }
  }
}
