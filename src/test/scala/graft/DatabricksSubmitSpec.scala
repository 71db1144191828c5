package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.DatabricksSubmit._

/** Submit-config builders vs the reference's shapes
  * (`databricks.py:130-230`, `spark_pipes_factory.py:36-73,229-269`). */
class DatabricksSubmitSpec extends AnyFunSuite {

  test("libs dict: registry packages keep constraints, artifacts get bucket URIs") {
    val libs = libsDict(Seq(
      LibraryConfig(LibraryKind.Pypi, "scallop", Some(">=4.0")),
      LibraryConfig(LibraryKind.Pypi, "upickle"),
      LibraryConfig(LibraryKind.Wheel, "customlibs/dev/graft-0.0.0-assembly.jar")),
      bucket = "pipeline-bucket")
    assert(libs == Seq(
      RegistryLib("scallop>=4.0"),
      RegistryLib("upickle"),
      ArtifactLib("s3://pipeline-bucket/customlibs/dev/graft-0.0.0-assembly.jar")))
  }

  test("uploaded script path re-roots under prefix/deployment") {
    assert(uploadedScriptPath("/home/me/jobs/graft_entry.scala", "dev",
      "dbfs:/external_pipes") == "dbfs:/external_pipes/dev/graft_entry.jar")
    assert(uploadedScriptPath("script.py", "prod", "dbfs:/external_pipes", "py")
      == "dbfs:/external_pipes/prod/script.py")
  }

  test("env injection: bootstrap wins over caller env wins over cluster") {
    val c = NewCluster(sparkEnvVars = Map("A" -> "cluster", "B" -> "cluster"))
    val out = withEnv(c,
      env = Map("B" -> "env", "C" -> "env"),
      bootstrapEnv = Map("C" -> "bootstrap", "D" -> "bootstrap"),
      processEnv = Map("GRAFT_TRACKING" -> "wb-123"))
    assert(out.sparkEnvVars == Map("A" -> "cluster", "B" -> "env",
      "C" -> "bootstrap", "D" -> "bootstrap", "GRAFT_TRACKING" -> "wb-123"))
    // tracking key always present, empty default (ASCII_WANDB handling)
    assert(withEnv(c, Map.empty, Map.empty, processEnv = Map.empty)
      .sparkEnvVars("GRAFT_TRACKING") == "")
  }

  test("spot bid override replaces the cluster default only when set") {
    val c = NewCluster()
    assert(c.aws.spotBidPricePercent == 100)
    assert(withSpotBid(c, Some(60.0)).aws.spotBidPricePercent == 60)
    assert(withSpotBid(c, None).aws.spotBidPricePercent == 100)
  }

  test("submit args are whitelisted by type; unknown types rejected") {
    val ok = processSubmitArgs(Map(
      "timeout_seconds" -> 3600,
      "access_control_list" -> Seq("u1", "u2"),
      "email_notifications" -> EmailNotifications(Seq("oncall@example.com"))))
    assert(ok.size == 3)
    intercept[IllegalArgumentException] {
      processSubmitArgs(Map("bad" -> new Object))
    }
  }

  test("buildTask assembles cluster+libs+script like handle_databricks") {
    val t = buildTask(
      cluster = NewCluster(),
      libraries = Seq(LibraryConfig(LibraryKind.Pypi, "upickle")),
      additionalLibraries = Seq(
        LibraryConfig(LibraryKind.Wheel, "customlibs/dev/extra.jar")),
      bucket = "b",
      uploadedScript = "dbfs:/external_pipes/dev/entry.jar",
      spotBidOverride = Some(55.0))
    assert(t.taskKey == "graft-launched")
    assert(t.newCluster.aws.spotBidPricePercent == 55)
    assert(t.libraries ==
      Seq(RegistryLib("upickle"), ArtifactLib("s3://b/customlibs/dev/extra.jar")))
    assert(t.scriptPath == "dbfs:/external_pipes/dev/entry.jar")
    // defaults match dev_databricks_cluster_config
    assert(t.newCluster.sparkVersion == "14.2.x-scala2.12")
    assert(t.newCluster.autoscale == Autoscale(1, 3))
    assert(t.newCluster.aws.availability == "SPOT_WITH_FALLBACK")
  }

  test("job name field order differs with/without partition key (fidelity)") {
    assert(jobName("nodes", "dev", ExecutionMode.Full, Some("2024-01-02")) ==
      "nodes_dev_full_2024-01-02")
    assert(jobName("nodes", "dev", ExecutionMode.Full, None) ==
      "nodes_full_dev")
  }
}
