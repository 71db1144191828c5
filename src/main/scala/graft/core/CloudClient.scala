package graft.core

/** Cloud-client machinery as pure state machines — the reference's
  * most-tested surface (ascii-hydra `pipes/cloud_client.py:87-291`,
  * ~40 tests in `ascii_library_tests/test_cloud_client.py:33-970`)
  * re-expressed with injected clock/sleep so every branch runs
  * against fakes. The live REST adapters are out of scope here (zero
  * egress); they would wrap client errors into
  * [[CloudRetry.TransientCloudError]] and feed states into
  * [[Submission]]'s classifiers.
  */
object CloudRetry {

  /** The tenacity policy on every reference poll
    * (`cloud_client.py:87-92,121-126`):
    * `stop_after_delay(20) | stop_after_attempt(10)`,
    * `wait_exponential(multiplier=1, max=60)`. */
  final case class RetryPolicy(
      maxAttempts: Int = 10,
      maxDelaySeconds: Double = 20.0,
      multiplier: Double = 1.0,
      expBase: Double = 2.0,
      maxWaitSeconds: Double = 60.0)

  /** Wait before the retry that follows attempt `n` (1-based):
    * multiplier · base^(n−1), capped — 1, 2, 4, 8, … ≤ 60 under the
    * default policy (tenacity `wait_exponential` semantics). */
  def backoff(p: RetryPolicy, attempt: Int): Double =
    math.min(p.multiplier * math.pow(p.expBase, (attempt - 1).toDouble),
      p.maxWaitSeconds)

  /** `stop_after_delay(20) | stop_after_attempt(10)`: either bound
    * ends the retry loop. */
  def shouldStop(p: RetryPolicy, attempts: Int, elapsedSeconds: Double): Boolean =
    attempts >= p.maxAttempts || elapsedSeconds >= p.maxDelaySeconds

  /** The reference's retryable-exception whitelist, as a marker type
    * an adapter wraps ConnectTimeout/ReadTimeout/ResponseStreaming/
    * Connection (EMR) or DatabricksError (DBR) into. */
  final class TransientCloudError(msg: String, cause: Throwable = null)
      extends RuntimeException(msg, cause)

  val transientOnly: Throwable => Boolean =
    _.isInstanceOf[TransientCloudError]

  final class RetriesExhausted(val attempts: Int, val last: Throwable)
      extends RuntimeException(
        s"retries exhausted after $attempts attempts", last)

  /** Run `f` under the policy: non-transient errors propagate
    * immediately; transient ones retry with exponential backoff until
    * a stop bound, then surface as [[RetriesExhausted]] carrying the
    * last error. `onRetry(attempt, waitSeconds)` is the reference's
    * `after_retry` logging hook. */
  def retryCall[A](
      p: RetryPolicy = RetryPolicy(),
      isTransient: Throwable => Boolean = transientOnly,
      sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong),
      clock: () => Double = () => System.nanoTime() / 1e9,
      onRetry: (Int, Double) => Unit = (_, _) => ())(f: () => A): A = {
    val t0 = clock()
    var attempt = 1
    while (true) {
      try return f()
      catch {
        case e: Throwable if isTransient(e) =>
          if (shouldStop(p, attempt, clock() - t0))
            throw new RetriesExhausted(attempt, e)
          val w = backoff(p, attempt)
          onRetry(attempt, w)
          sleep(w)
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** `_poll_till_success` (`cloud_client.py:152-166`) with the
  * observed-state-transition dedup (`cloud_client.py:105-111`). */
object CloudPoller {
  import Submission._

  /** Deduplicates state-transition reporting: the reference logs a
    * state only when it differs from `last_observed_state`. */
  final class StateTracker {
    private var last: Option[String] = None
    def observe(state: String): Boolean = {
      val changed = !last.contains(state)
      last = Some(state)
      changed
    }
    def lastObserved: Option[String] = last
  }

  /** Poll until terminal: Continue → sleep(interval) and poll again;
    * Succeeded → return the number of polls; Failed → PipesException
    * (the reference's CustomPipesException). `sleep` injected for
    * tests. */
  def pollTillSuccess(
      poll: () => Poll,
      intervalSeconds: Double = 5.0,
      sleep: Double => Unit = s => Thread.sleep((s * 1000).toLong)): Int = {
    var polls = 0
    while (true) {
      polls += 1
      poll() match {
        case Succeeded => return polls
        case Failed(reason) => throw new PipesException(reason)
        case Continue => sleep(intervalSeconds)
      }
    }
    polls
  }
}

/** Upload routing + payload model (`cloud_client.py:217-291`). */
object CloudUpload {

  sealed trait Route
  /** `s3_client.upload_file(local, bucket, key)`. */
  final case class S3Upload(bucket: String, key: String) extends Route
  /** `dbfs.put(path, base64, overwrite=True)`. */
  final case class DbfsPut(path: String, overwrite: Boolean = true) extends Route

  private def ext(f: String): String =
    f.split('.').lastOption.getOrElse("")

  /** `_upload_file_to_cloud` dispatch (`cloud_client.py:246-266`):
    * EMR (empty filesystem) → S3 always; Databricks → script sources
    * via DBFS base64 put, built artifacts via S3 (the reference's
    * .py-vs-.whl split, carried to .scala-vs-.jar for this engine);
    * anything else is the reference's TypeError → Left. */
  def route(filesystem: String, localFile: String, cloudPath: String,
      bucket: String): Either[String, Route] =
    (filesystem, ext(localFile)) match {
      case ("", _) => Right(S3Upload(bucket, cloudPath))
      case ("dbfs", "py") | ("dbfs", "scala") => Right(DbfsPut(cloudPath))
      case ("dbfs", "whl") | ("dbfs", "jar") => Right(S3Upload(bucket, cloudPath))
      case (fs, e) => Left(s"no upload route for filesystem=$fs ext=.$e")
    }

  /** DBFS put payload: whole file, base64 (`cloud_client.py:283-291`). */
  def dbfsPayload(bytes: Array[Byte]): String =
    java.util.Base64.getEncoder.encodeToString(bytes)

  /** `handle_exep` (`cloud_client.py:268-278`): the three known
    * upload-error kinds log-and-rethrow; anything else is swallowed
    * (reference fidelity — its final `elif` has no `else`, pinned by
    * `test_handle_exep_unknown_error`). Returns the log message for
    * known kinds, None → swallow. */
  def classifyUploadError(e: Throwable): Option[String] = e match {
    case _: java.io.FileNotFoundException => Some("The file was not found")
    case e: IllegalStateException if e.getMessage != null &&
        e.getMessage.contains("credentials") => Some("Credentials not available")
    case _: CloudClientError => Some("Client error while uploading")
    case _ => None
  }

  /** Marker for provider client errors (boto `ClientError` analog). */
  final class CloudClientError(msg: String) extends RuntimeException(msg)
}

/** Post-termination cost tagging (`cloud_client.py:182-205`): every
  * resource ARN carrying the job id gets jobId/engine/executionMode
  * tags before success/failure is decided. */
object CostTagging {

  trait TaggingClient {
    def resourceArns(jobId: String): Seq[String]
    def tag(arn: String, tags: Map[String, String]): Unit
  }

  def tags(jobId: String, engine: Engine, mode: ExecutionMode): Map[String, String] =
    Map("jobId" -> jobId, "engine" -> engine.value,
      "executionMode" -> mode.value)

  /** Tags every matching resource; returns how many were tagged
    * (0 when the job left no tagged resources — reference skips the
    * loop body, `cloud_client.py:196-205`). */
  def tagJobResources(client: TaggingClient, jobId: String,
      engine: Engine, mode: ExecutionMode): Int = {
    val arns = client.resourceArns(jobId)
    val t = tags(jobId, engine, mode)
    arns.foreach(client.tag(_, t))
    arns.size
  }
}
