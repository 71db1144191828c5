package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.EmrSubmit._

/** EMR job-preparation builders vs the reference's shapes
  * (`pipes/emr.py:73-240`) + artifact packaging
  * (`pipes/utils.py:28-53`, semantics from `test_utils.py:64-108`). */
class EmrSubmitSpec extends AnyFunSuite {

  test("bootstrap script: header, artifact copy, registry coords, s3 dest") {
    val (content, uri) = bootstrapScript(
      Seq(
        LibraryConfig(LibraryKind.Wheel, "customlibs/dev/graft-0.0.0-assembly.jar"),
        LibraryConfig(LibraryKind.Pypi, "org.rogach::scallop", Some(":5.1.0"))),
      bucket = "pipeline-bucket", deployment = "dev",
      outputFile = "entry_bootstrap.sh")
    assert(content.startsWith("#!/bin/bash\n"))
    assert(content.contains("sudo yum update -y"))
    assert(content.contains(
      "aws s3 cp s3://pipeline-bucket/customlibs/dev/graft-0.0.0-assembly.jar /tmp"))
    assert(content.contains("sudo cp /tmp/graft-0.0.0-assembly.jar /usr/lib/spark/jars/"))
    assert(content.contains("echo 'org.rogach::scallop:5.1.0'"))
    assert(uri == "s3://pipeline-bucket/external_pipes/dev/entry_bootstrap.sh")
    // no libraries → bare header, no package-manager prep
    val (bare, _) = bootstrapScript(Nil, "b", "dev")
    assert(bare == "#!/bin/bash\n")
  }

  test("bootstrap script name derives from the uploaded entry file") {
    assert(bootstrapScriptName("/jobs/graft_entry.scala") == "graft_entry_bootstrap.sh")
    assert(bootstrapScriptName("entry.py") == "entry_bootstrap.sh")
  }

  test("modifyEnvVar touches only spark-defaults classifications") {
    val cfg = EmrJobConfig("j", configurations = Seq(
      SparkClassification("spark-defaults", Map("spark.executor.memory" -> "4g")),
      SparkClassification("yarn-site", Map("x" -> "y"))))
    val out = modifyEnvVar(cfg, "DAGSTER_PIPES_CONTEXT", "ctx")
    assert(out.configurations.head.properties ==
      Map("spark.executor.memory" -> "4g",
        "spark.yarn.appMasterEnv.DAGSTER_PIPES_CONTEXT" -> "ctx"))
    assert(out.configurations(1).properties == Map("x" -> "y"))
    // no spark-defaults entry → unchanged (reference loop no-op)
    val none = EmrJobConfig("j",
      configurations = Seq(SparkClassification("yarn-site", Map.empty)))
    assert(modifyEnvVar(none, "K", "V") == none)
  }

  test("prepareEmrJob: bootstrap action + extras threading") {
    val cfg = EmrJobConfig("j")
    val (extras, out) = prepareEmrJob(cfg, Map("step" -> "s1"),
      Map("engine" -> "emr"), Some("s3://b/external_pipes/dev/e_bootstrap.sh"))
    assert(out.bootstrapActions ==
      Seq(BootstrapAction("Install custom packages",
        "s3://b/external_pipes/dev/e_bootstrap.sh")))
    assert(extras("emr_job_config") == out)
    assert(extras("step_config") == Map("step" -> "s1"))
    assert(extras("engine") == "emr")
    // no libraries shipped → config passes through without actions
    val (_, plain) = prepareEmrJob(cfg, Map.empty, Map.empty, None)
    assert(plain.bootstrapActions.isEmpty)
  }

  test("adjustEmrJobConfig: fleets injected, groups clear subnets, else error") {
    val fleets = FleetConfig.build(
      Seq(InstanceSelection.InstanceType("m6id.xlarge", 16, 4, 237,
        "GENERAL_CURRENT_GEN", Some(0.23))),
      Seq(InstanceSelection.InstanceType("m6id.2xlarge", 32, 8, 474,
        "GENERAL_CURRENT_GEN", Some(0.47))),
      bidPercent = 60.0, coreUnits = 4, taskUnits = 8)
    val bare = EmrJobConfig("j")
    val adjusted = adjustEmrJobConfig(bare, Some(fleets))
    assert(adjusted.instances.instanceFleets.contains(fleets))
    assert(adjusted.managedScalingUnitType.contains("InstanceFleetUnits"))
    assert(adjusted.instances.ec2SubnetId.contains(""))
    val grouped = EmrJobConfig("j",
      instances = EmrInstances(instanceGroups = Some(Seq("g1"))))
    assert(adjustEmrJobConfig(grouped, None).instances.ec2SubnetIds
      .contains(Nil))
    intercept[IllegalArgumentException] { adjustEmrJobConfig(bare, None) }
  }

  test("withBootstrapEnv injects pipes vars + always-present tracking var") {
    val cfg = EmrJobConfig("j", configurations =
      Seq(SparkClassification("spark-defaults", Map.empty)))
    val out = withBootstrapEnv(cfg,
      Map("DAGSTER_PIPES_CONTEXT" -> "c", "DAGSTER_PIPES_MESSAGES" -> "m"),
      processEnv = Map.empty)
    val props = out.configurations.head.properties
    assert(props("spark.yarn.appMasterEnv.DAGSTER_PIPES_CONTEXT") == "c")
    assert(props("spark.yarn.appMasterEnv.DAGSTER_PIPES_MESSAGES") == "m")
    assert(props("spark.yarn.appMasterEnv.GRAFT_TRACKING") == "")
  }

  test("packageLibrary: clean, build, pick artifact; failure semantics kept") {
    val tmp = java.nio.file.Files.createTempDirectory("pkg").toString
    val dist = new java.io.File(s"$tmp/dist")
    // stale artifact that the clean step must remove
    dist.mkdirs()
    new java.io.File(dist, "stale.jar").createNewFile()
    var cleaned = List.empty[String]
    val built = Artifacts.packageLibrary(tmp,
      runBuild = cwd => {
        new java.io.File(s"$cwd/dist/graft-0.0.0-assembly.jar").createNewFile()
        0
      },
      listArtifacts = d => new java.io.File(d).listFiles()
        .filter(_.getName.endsWith(".jar")).map(_.getPath).toSeq,
      cleanDir = d => {
        cleaned ::= d
        Option(new java.io.File(d).listFiles()).getOrElse(Array.empty)
          .foreach(_.delete())
      })
    assert(built.artifactName == "graft-0.0.0-assembly.jar")
    assert(cleaned.toSet == Set(s"$tmp/dist", s"$tmp/build"))
    // build tool failure
    intercept[PipesException] {
      Artifacts.packageLibrary(tmp, _ => 1, _ => Nil, _ => ())
    }
    // successful build, no artifact → FileNotFound (reference parity)
    intercept[java.io.FileNotFoundException] {
      Artifacts.packageLibrary(tmp, _ => 0, _ => Nil, _ => ())
    }
  }
}
