package graft.core

/** Library-artifact path policy + deployment-environment resolution —
  * the reference's driver-side utilities (ascii-hydra
  * `pipes/utils.py:11-25`, `resources/utils.py`) with the same path
  * shapes, carrying jar artifacts instead of wheels (Scala engine).
  * Pure functions, reference-test parity in CoreSpec.
  */
object Artifacts {

  /** `get_dagster_deployment_environment`: env-var keyed deployment
    * name with a default. */
  def deploymentEnvironment(
      env: Map[String, String] = sys.env,
      deploymentKey: String = "GRAFT_DEPLOYMENT",
      defaultValue: String = "dev"): String =
    env.getOrElse(deploymentKey, defaultValue)

  /** `library_to_cloud_paths` (`pipes/utils.py:11-21`): where a
    * packaged library lands per filesystem. The reference pins wheel
    * version 0.0.0 (with a TODO about parallel-run races); kept as a
    * fixed artifact version for the same reason — path stability. */
  def libraryToCloudPaths(libName: String, filesystem: String = "s3",
      deployment: String = "dev", version: String = "0.0.0"): String =
    filesystem match {
      case "dbfs" => s"dbfs:/customlibs/$deployment/$libName-$version-assembly.jar"
      case "without" => s"customlibs/$deployment/$libName"
      case _ => s"customlibs/$deployment/$libName-$version-assembly.jar"
    }

  /** `library_from_dbfs_paths` (`pipes/utils.py:24-25`): recover the
    * library name from an artifact path. */
  def libraryFromPath(path: String): String =
    path.split("/").last.split("-").head

  final case class BuildResult(artifactPath: String, artifactName: String)

  /** `package_library` (`pipes/utils.py:28-53`), jar-flavored: clear
    * the output dirs, invoke the build tool in the library dir, pick
    * the produced artifact. The build runner and artifact listing are
    * injected so the state machine tests with fakes (the reference
    * mocks subprocess the same way, `test_utils.py:64-108`); the
    * default runner shells out to `sbt assembly`.
    *
    * Failure semantics kept: a failing build surfaces as
    * [[PipesException]]; a successful build that produced no artifact
    * is the reference's FileNotFoundError. */
  def packageLibrary(
      libPath: String,
      runBuild: String => Int = defaultSbtAssembly,
      listArtifacts: String => Seq[String] = defaultListJars,
      cleanDir: String => Unit = defaultCleanDir): BuildResult = {
    cleanDir(s"$libPath/dist")
    cleanDir(s"$libPath/build")
    val rc = runBuild(libPath)
    if (rc != 0) throw new PipesException(s"artifact build failed: exit $rc")
    listArtifacts(s"$libPath/dist").sorted.headOption match {
      case Some(p) => BuildResult(p, p.split('/').last)
      case None => throw new java.io.FileNotFoundException(
        "No artifact file found in the dist directory.")
    }
  }

  private def defaultSbtAssembly(cwd: String): Int =
    new ProcessBuilder("sbt", "-batch", "assembly")
      .directory(new java.io.File(cwd)).inheritIO().start().waitFor()

  private def defaultListJars(dist: String): Seq[String] = {
    val d = new java.io.File(dist)
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".jar")).map(_.getPath).toSeq
  }

  private def defaultCleanDir(dir: String): Unit = {
    val d = new java.io.File(dir)
    if (d.exists()) Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.isFile).foreach(_.delete())
    else d.mkdirs()
  }
}

/** Model-cache directory policy (ascii-hydra `models/defaults.py:
  * 1-28`): when the shared model volume exists, route the model
  * libraries' caches under it; otherwise no-op. Pure — returns the
  * env assignments (the JVM can't mutate its own environment); the
  * launcher exports them before any model library loads, which is
  * the reference's ordering constraint too. */
object ModelCache {
  def cacheEnv(cacheDirBase: String = "/data/models",
      exists: String => Boolean = p => new java.io.File(p).isDirectory,
      mkdirs: String => Unit = p => { new java.io.File(p).mkdirs(); () })
      : Map[String, String] =
    if (!exists(cacheDirBase)) Map.empty
    else {
      val hf = s"$cacheDirBase/hf"
      val datasets = s"$hf/datasets"
      val models = s"$hf/models"
      Seq(hf, datasets, models).foreach(mkdirs)
      Map("HF_HOME" -> cacheDirBase, "HF_DATASETS_CACHE" -> datasets,
        "TRANSFORMERS_CACHE" -> models)
    }
}

/** EMR instance-fleet config model — the output side of
  * [[InstanceSelection]] (`instance_config.py:372-557` builds
  * master/core/task fleets from filtered+priced candidates). Pure
  * builders over the selection results; no cloud calls. */
object FleetConfig {
  import InstanceSelection._

  final case class EbsConfig(volumeType: String = "gp3", sizeGB: Int = 64,
      volumesPerInstance: Int = 1)
  final case class InstanceTypeConfig(
      instanceType: String,
      weightedCapacity: Int,
      bidPriceAsPercentageOfOnDemand: Option[Double],
      ebs: Option[EbsConfig])
  /** Spot launch behavior (`instance_config.py:240-253`): the
    * reference pins capacity-optimized allocation with a 5-minute
    * switch-to-on-demand timeout (spot starvation must not stall the
    * pipeline). */
  final case class SpotSpec(
      allocationStrategy: String = "capacity-optimized",
      timeoutAction: String = "SWITCH_TO_ON_DEMAND",
      timeoutDurationMinutes: Int = 5)

  /** On-demand launch spec — lowest-price is the only valid strategy
    * (the reference hardcodes it with that comment); present only
    * when a capacity-reservation preference is set. */
  final case class OnDemandSpec(
      allocationStrategy: String = "lowest-price",
      capacityReservationPreference: String = "open")

  final case class LaunchSpecifications(
      spot: SpotSpec = SpotSpec(),
      onDemand: Option[OnDemandSpec] = None)

  /** Resize behavior (`instance_config.py:264-274`). */
  final case class ResizeSpecifications(
      onDemandTimeoutMinutes: Int, spotTimeoutMinutes: Int)

  final case class Fleet(
      role: String, // MASTER | CORE | TASK
      targetOnDemandCapacity: Int,
      targetSpotCapacity: Int,
      configs: Seq[InstanceTypeConfig],
      launch: LaunchSpecifications = LaunchSpecifications(),
      resize: Option[ResizeSpecifications] = None)

  /** Weighted capacity = vCPU (the reference weights by instance
    * size so managed scaling counts cores, not boxes). */
  def typeConfig(i: InstanceType, bidPercent: Option[Double],
      ebs: Option[EbsConfig]): InstanceTypeConfig =
    InstanceTypeConfig(i.name, math.max(1, i.vcpu), bidPercent, ebs)

  /** Master: single on-demand node from the top candidate; core/task:
    * spot fleets over the n cheapest candidates with a bid percent —
    * the `adjust_emr_job_config` shape. */
  def build(masterCandidates: Seq[InstanceType],
      workerCandidates: Seq[InstanceType],
      bidPercent: Double,
      coreUnits: Int,
      taskUnits: Int,
      ebs: Option[EbsConfig] = Some(EbsConfig()),
      timeoutDurationMinutes: Int = 10,
      reservationPreference: Boolean = false): Seq[Fleet] = {
    require(masterCandidates.nonEmpty && workerCandidates.nonEmpty,
      "no candidate instances after filtering")
    require(bidPercent > 1.0 && bidPercent <= 100.0,
      s"bid percent $bidPercent out of (1,100]")
    val launch = LaunchSpecifications(
      onDemand = if (reservationPreference) Some(OnDemandSpec()) else None)
    val resize = Some(ResizeSpecifications(
      timeoutDurationMinutes, timeoutDurationMinutes))
    Seq(
      Fleet("MASTER", 1, 0,
        Seq(typeConfig(masterCandidates.head, None, ebs)), launch, resize),
      Fleet("CORE", 0, coreUnits,
        workerCandidates.map(typeConfig(_, Some(bidPercent), ebs)),
        launch, resize),
      Fleet("TASK", 0, taskUnits,
        workerCandidates.map(typeConfig(_, Some(bidPercent), ebs)),
        launch, resize))
  }
}
