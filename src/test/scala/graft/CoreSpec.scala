package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

/** Pure-function units: ports of the reference's test cases
  * (ascii-hydra `ascii_library_tests/test_utils.py`,
  * `test_cloud_client.py` semantics) plus framework invariants. */
class CoreSpec extends AnyFunSuite {

  // calculate_parallelism fixed points (test_utils.py:169-182)
  test("parallelism policy clamps to [200, 90000]") {
    assert(Parallelism.calculate(360000) == 90000)
    assert(Parallelism.calculate(90000) == 90000)
    assert(Parallelism.calculate(1000) == 250)
    assert(Parallelism.calculate(10) == 200)
    assert(Parallelism.calculate(0) == 200)
  }

  test("engine/mode lookup and validation") {
    assert(Engine.fromValue("emr") == Engine.Emr)
    intercept[IllegalArgumentException](Engine.fromValue("nope"))
    ExecutionMode.validate(ExecutionMode.SmallDevSampleLocal, Engine.Local)
    intercept[IllegalArgumentException](
      ExecutionMode.validate(ExecutionMode.SmallDevSampleLocal, Engine.Emr))
    assert(ExecutionMode.fromValue("full") == ExecutionMode.Full)
  }

  test("BaseConfig spot bid bounds (1,100]") {
    intercept[IllegalArgumentException](BaseConfig(spotBidPricePercent = 0.5))
    intercept[IllegalArgumentException](BaseConfig(spotBidPricePercent = 101))
    assert(BaseConfig(spotBidPricePercent = 100).engineOverride.isEmpty)
    assert(BaseConfig(overrideDefaultEngine = Some("databricks")).engineOverride
      .contains(Engine.Databricks))
  }

  test("SparkConfPolicy: full-mode-only overrides, discovery key split") {
    val p = SparkConfPolicy(shufflePartitions = Some(1234),
      partitionDiscoveryParallelism = Some(77))
    val dev = p.settings(ExecutionMode.SmallDevSampleLocal).toMap
    assert(!dev.contains("spark.sql.shuffle.partitions"))
    val full = p.settings(ExecutionMode.Full).toMap
    assert(full("spark.sql.shuffle.partitions") == "1234")
    // the reference bug: discovery parallelism must NOT clobber
    // shuffle partitions
    assert(full("spark.sql.sources.parallelPartitionDiscovery.parallelism") == "77")
    assert(full("spark.sql.files.maxPartitionBytes") == (50L * 1024 * 1024).toString)
  }

  test("path resolver: hive input paths incl. 'all' wildcard") {
    val r = PathResolver(ExecutionMode.Full)
    assert(r.inputPath("s3a://b/nodes", "s1", "c1", "en")
      == "s3a://b/nodes/seed_nodes=s1/crawl_id=c1/main_language=en")
    assert(r.inputPath("s3a://b/nodes", "s1", "c1", "all")
      == "s3a://b/nodes/seed_nodes=s1/crawl_id=c1/main_language=*")
    assert(r.baseSeeds == "s3a://graft-seeds/graft_seeds")
    assert(PathResolver(ExecutionMode.SmallDevSampleLocal).baseIO
      .startsWith("file:///"))
  }

  test("time-window output path format") {
    val r = PathResolver(ExecutionMode.Full)
    val t0 = java.time.LocalDateTime.of(2024, 1, 2, 3, 4, 5)
    val t1 = java.time.LocalDateTime.of(2024, 1, 3, 3, 4, 5)
    assert(r.timeWindowPath("edges", t0, t1)
      == "s3a://graft-results/edges/20240102030405_20240103030405.parquet")
  }

  test("runner topo-orders by deps and rejects cycles/unknowns") {
    def step(n: String, d: String*): PipelineStep = new PipelineStep {
      val name = n; override val deps = d.toSeq
      def execute(ctx: RunContext) = StepResult()
    }
    val r = new PipelineRunner(Seq(step("c", "b"), step("b", "a"), step("a")))
    assert(r.order.map(_.name) == Seq("a", "b", "c"))
    intercept[IllegalArgumentException](
      new PipelineRunner(Seq(step("a", "b"), step("b", "a"))).order)
    intercept[IllegalArgumentException](
      new PipelineRunner(Seq(step("a", "ghost"))).order)
    intercept[IllegalArgumentException](
      new PipelineRunner(Seq(step("a"), step("a"))))
  }

  test("cloud poll classification: EMR + Databricks terminal states") {
    import Submission._
    assert(classifyEmr("RUNNING", "") == Continue)
    assert(classifyEmr("TERMINATED", "Steps completed") == Succeeded)
    assert(classifyEmr("TERMINATING", "Steps completed") == Succeeded)
    assert(classifyEmr("TERMINATED", "Step failed") == Failed("Step failed"))
    assert(classifyEmr("TERMINATING", "Internal error") ==
      Failed("Internal error"))
    assert(classifyEmr("TERMINATED_WITH_ERRORS", "boom") == Failed("boom"))
    assert(classifyDatabricks("RUNNING", "") == Continue)
    assert(classifyDatabricks("TERMINATED", "SUCCESS") == Succeeded)
    assert(classifyDatabricks("TERMINATING", "SUCCESS") == Succeeded)
    assert(classifyDatabricks("TERMINATED", "FAILED")
      .isInstanceOf[Failed])
    assert(classifyDatabricks("SKIPPED", "") ==
      Failed("terminal state: Unknown reason"))
    assert(classifyDatabricks("INTERNAL_ERROR", "CRASHED").isInstanceOf[Failed])
  }

  test("instance selection: filters, suffix order, cheapest sort") {
    import InstanceSelection._
    val cat = Seq(
      InstanceType("m6id.2xlarge", 32, 8, 474, "GENERAL_CURRENT_GEN", Some(0.4745)),
      InstanceType("m6id.xlarge", 16, 4, 237, "GENERAL_CURRENT_GEN", Some(0.2373)),
      InstanceType("r5.2xlarge", 64, 8, 0, "HI_MEM_CURRENT_GEN", Some(0.504)),
      InstanceType("c5.9xlarge", 72, 36, 0, "COMPUTE_CURRENT_GEN", Some(1.53)),
      InstanceType("m5.large", 8, 2, 0, "GENERAL_CURRENT_GEN", None))
    assert(InstanceType("m6id.2xlarge", 0, 0, 0, "").prefix == "m6id")
    assert(InstanceType("m6id.2xlarge", 0, 0, 0, "").suffix == "2xlarge")
    // >= numeric filter
    assert(filterInstances(cat, Criteria(memoryGB = Some(32))).map(_.name)
      == Seq("m6id.2xlarge", "r5.2xlarge", "c5.9xlarge"))
    // suffix order is the enum's declared order: 9xlarge admits 6/8xlarge
    // but NOT 3/4xlarge (declared after it)
    assert(suffixIndex("9xlarge") < suffixIndex("3xlarge"))
    assert(filterInstances(cat, Criteria(maxSuffix = Some("2xlarge"))).map(_.name)
      == Seq("m6id.2xlarge", "m6id.xlarge", "r5.2xlarge", "m5.large"))
    // unknown suffix → filter is a no-op (reference behavior)
    assert(filterInstances(cat, Criteria(maxSuffix = Some("42xlarge"))).size == 5)
    // cheapest: by price, ties broken by bigger box; unpriced dropped
    val tie = Seq(
      InstanceType("a.xlarge", 16, 4, 0, "G", Some(0.5)),
      InstanceType("b.xlarge", 32, 8, 0, "G", Some(0.5)),
      InstanceType("c.xlarge", 8, 2, 0, "G", Some(0.3)),
      InstanceType("d.xlarge", 8, 2, 0, "G", None))
    assert(cheapest(tie, 3).map(_.name) == Seq("c.xlarge", "b.xlarge", "a.xlarge"))
    assert(spotBid(1.0, 60) == 0.6)
    intercept[IllegalArgumentException](spotBid(1.0, 0.5))
  }

  // ports of test_utils.py library-path cases
  test("artifact paths: cloud path shapes and name recovery") {
    import Artifacts._
    assert(libraryToCloudPaths("random_lib", "dbfs")
      == "dbfs:/customlibs/dev/random_lib-0.0.0-assembly.jar")
    assert(libraryToCloudPaths("random_lib", "s3")
      == "customlibs/dev/random_lib-0.0.0-assembly.jar")
    assert(libraryToCloudPaths("random_lib", "without")
      == "customlibs/dev/random_lib")
    assert(libraryFromPath("dbfs:/customlibs/test/mylib-0.0.0-assembly.jar")
      == "mylib")
    assert(deploymentEnvironment(Map.empty) == "dev")
    assert(deploymentEnvironment(Map("GRAFT_DEPLOYMENT" -> "production"))
      == "production")
    assert(deploymentEnvironment(Map("CUSTOM" -> "staging"),
      deploymentKey = "CUSTOM") == "staging")
    assert(deploymentEnvironment(Map.empty, defaultValue = "testing")
      == "testing")
  }

  test("fleet config: master on-demand, workers spot with vcpu weights") {
    import InstanceSelection._
    import FleetConfig._
    val workers = Seq(
      InstanceType("m6id.xlarge", 16, 4, 237, "GENERAL_CURRENT_GEN", Some(0.23)),
      InstanceType("m6id.2xlarge", 32, 8, 474, "GENERAL_CURRENT_GEN", Some(0.47)))
    val fleets = build(workers.take(1), workers, bidPercent = 10.0,
      coreUnits = 10, taskUnits = 8)
    assert(fleets.map(_.role) == Seq("MASTER", "CORE", "TASK"))
    val master = fleets.head
    assert(master.targetOnDemandCapacity == 1 && master.targetSpotCapacity == 0)
    assert(master.configs.head.bidPriceAsPercentageOfOnDemand.isEmpty)
    val core = fleets(1)
    assert(core.targetSpotCapacity == 10)
    assert(core.configs.map(_.weightedCapacity) == Seq(4, 8))
    assert(core.configs.forall(_.bidPriceAsPercentageOfOnDemand.contains(10.0)))
    // launch/resize specs: capacity-optimized spot with 5-min
    // switch-to-on-demand, resize timeouts threaded, on-demand spec
    // only under a reservation preference
    assert(core.launch.spot ==
      SpotSpec("capacity-optimized", "SWITCH_TO_ON_DEMAND", 5))
    assert(core.launch.onDemand.isEmpty)
    assert(core.resize.contains(ResizeSpecifications(10, 10)))
    val reserved = build(workers.take(1), workers, 10.0, 1, 1,
      timeoutDurationMinutes = 7, reservationPreference = true)
    assert(reserved.head.launch.onDemand.contains(OnDemandSpec()))
    assert(reserved.head.resize.contains(ResizeSpecifications(7, 7)))
    intercept[IllegalArgumentException](
      build(Nil, workers, 10.0, 1, 1))
    intercept[IllegalArgumentException](
      build(workers, workers, 0.5, 1, 1))
  }

  test("library config paths model") {
    val lc = LibraryConfig(LibraryKind.Wheel, "s3://bucket/lib.whl")
    assert(lc.version.isEmpty)
    assert(LibraryConfig(LibraryKind.Pypi, "pandas", Some(">=2.0")).kind
      == LibraryKind.Pypi)
  }

  test("model cache env: routed under base when present, noop otherwise") {
    val made = scala.collection.mutable.ArrayBuffer.empty[String]
    val env = ModelCache.cacheEnv("/vol/models", _ == "/vol/models", made += _)
    assert(env == Map(
      "HF_HOME" -> "/vol/models",
      "HF_DATASETS_CACHE" -> "/vol/models/hf/datasets",
      "TRANSFORMERS_CACHE" -> "/vol/models/hf/models"))
    assert(made.toSeq == Seq("/vol/models/hf", "/vol/models/hf/datasets",
      "/vol/models/hf/models"))
    assert(ModelCache.cacheEnv("/nope", _ => false, _ => ()).isEmpty)
  }
}
