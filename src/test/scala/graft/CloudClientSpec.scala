package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.CloudRetry._

/** The cloud-client state machines against fakes — mirroring the
  * semantics the reference pins in `test_cloud_client.py:33-970`
  * (retry exhaustion, transient-only retry, backoff schedule, poll
  * loop, terminal handling, upload routing, cost tagging). */
class CloudClientSpec extends AnyFunSuite {

  private val p = RetryPolicy()

  test("backoff follows tenacity wait_exponential(multiplier=1, max=60)") {
    assert(Seq(1, 2, 3, 4, 5, 6, 7).map(backoff(p, _)) ==
      Seq(1.0, 2.0, 4.0, 8.0, 16.0, 32.0, 60.0))
    assert(backoff(p, 20) == 60.0) // stays capped
  }

  test("stop bounds: 10 attempts OR 20 s elapsed, whichever first") {
    assert(!shouldStop(p, 9, 0.0))
    assert(shouldStop(p, 10, 0.0))
    assert(!shouldStop(p, 1, 19.9))
    assert(shouldStop(p, 1, 20.0))
  }

  test("retryCall: transient errors retry then succeed; sleeps follow backoff") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Double]
    var calls = 0
    val out = retryCall[String](p, transientOnly, sleeps += _, () => 0.0)(() => {
      calls += 1
      if (calls < 4) throw new TransientCloudError("flaky")
      "ok"
    })
    assert(out == "ok" && calls == 4)
    assert(sleeps.toSeq == Seq(1.0, 2.0, 4.0))
  }

  test("retryCall: non-transient errors propagate immediately") {
    var calls = 0
    val e = intercept[IllegalArgumentException] {
      retryCall[Unit](p, transientOnly, _ => (), () => 0.0)(() => {
        calls += 1
        throw new IllegalArgumentException("fatal")
      })
    }
    assert(e.getMessage == "fatal" && calls == 1)
  }

  test("retryCall: attempt exhaustion surfaces RetriesExhausted with cause") {
    var calls = 0
    val e = intercept[RetriesExhausted] {
      retryCall[Unit](p, transientOnly, _ => (), () => 0.0)(() => {
        calls += 1
        throw new TransientCloudError("always down")
      })
    }
    assert(e.attempts == 10 && calls == 10)
    assert(e.last.getMessage == "always down")
  }

  test("retryCall: delay bound stops before the attempt bound") {
    // fake clock: each attempt advances 7 s → stop after attempt 3+
    var now = 0.0
    var calls = 0
    val e = intercept[RetriesExhausted] {
      retryCall[Unit](p, transientOnly, _ => (), () => { now += 7.0; now })(
        () => { calls += 1; throw new TransientCloudError("down") })
    }
    assert(calls < 10)
  }

  test("pollTillSuccess: polls through Continue, counts, fails loudly") {
    val states = Iterator("STARTING", "RUNNING", "RUNNING", "TERMINATED")
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Double]
    val n = CloudPoller.pollTillSuccess(
      () => Submission.classifyEmr(states.next(), "Steps completed"),
      intervalSeconds = 5.0, sleep = sleeps += _)
    assert(n == 4)
    assert(sleeps.toSeq == Seq(5.0, 5.0, 5.0)) // no sleep after terminal
    val bad = Iterator("RUNNING", "TERMINATED_WITH_ERRORS")
    intercept[PipesException] {
      CloudPoller.pollTillSuccess(
        () => Submission.classifyEmr(bad.next(), "bootstrap failure"),
        sleep = _ => ())
    }
  }

  test("state tracker reports only transitions (reference log dedup)") {
    val t = new CloudPoller.StateTracker
    assert(t.observe("PENDING"))
    assert(!t.observe("PENDING"))
    assert(t.observe("RUNNING"))
    assert(t.lastObserved.contains("RUNNING"))
  }

  test("upload routing: EMR→S3 always; DBR scripts→DBFS, artifacts→S3") {
    import CloudUpload._
    assert(route("", "lib.jar", "customlibs/dev/lib.jar", "b") ==
      Right(S3Upload("b", "customlibs/dev/lib.jar")))
    assert(route("", "script.py", "k", "b") == Right(S3Upload("b", "k")))
    assert(route("dbfs", "job.py", "dbfs:/customlibs/dev/job.py", "b") ==
      Right(DbfsPut("dbfs:/customlibs/dev/job.py")))
    assert(route("dbfs", "Job.scala", "p", "b") == Right(DbfsPut("p")))
    assert(route("dbfs", "lib.whl", "k", "b") == Right(S3Upload("b", "k")))
    assert(route("dbfs", "lib.jar", "k", "b") == Right(S3Upload("b", "k")))
    assert(route("dbfs", "data.csv", "k", "b").isLeft)
    assert(route("hdfs", "lib.jar", "k", "b").isLeft)
  }

  test("dbfs payload is whole-file base64") {
    assert(CloudUpload.dbfsPayload("hello graft".getBytes("UTF-8")) ==
      java.util.Base64.getEncoder.encodeToString("hello graft".getBytes("UTF-8")))
  }

  test("upload error classification: three known kinds, unknown swallowed") {
    import CloudUpload._
    assert(classifyUploadError(new java.io.FileNotFoundException("x"))
      .contains("The file was not found"))
    assert(classifyUploadError(new IllegalStateException("no credentials found"))
      .contains("Credentials not available"))
    assert(classifyUploadError(new CloudClientError("403"))
      .contains("Client error while uploading"))
    assert(classifyUploadError(new RuntimeException("???")).isEmpty)
  }

  test("cost tagging: every ARN tagged with jobId/engine/executionMode") {
    val tagged = scala.collection.mutable.Map.empty[String, Map[String, String]]
    val client = new CostTagging.TaggingClient {
      def resourceArns(jobId: String): Seq[String] =
        if (jobId == "42") Seq("arn:a", "arn:b") else Nil
      def tag(arn: String, tags: Map[String, String]): Unit = tagged(arn) = tags
    }
    val n = CostTagging.tagJobResources(client, "42", Engine.Databricks,
      ExecutionMode.Full)
    assert(n == 2)
    assert(tagged("arn:a") == Map("jobId" -> "42", "engine" -> "databricks",
      "executionMode" -> "full"))
    // a job with no tagged resources is a no-op, not an error
    assert(CostTagging.tagJobResources(client, "7", Engine.Databricks,
      ExecutionMode.Full) == 0)
  }
}
