package graft.streaming

/** Per-run phase timers for the gated queries, so the bench artifact
  * can ATTRIBUTE a streaming gate's time instead of bundling fixture
  * staging + watermark drain + the verify read into one number
  * (round-14 finding: s4 read 3.55 s vs 12.97 s across two runs of
  * identical code — scheduler jitter multiplied through the bundle
  * with nothing in-band to say which phase moved).
  *
  * Zero-coordination design: the harness ([[graft.Bench]]) resets
  * before each timed run and snapshots after, so phases need no gate
  * name — the harness's loop variable is the identity. Phases nest
  * additively (two staged fixtures both land in "stage"); anything
  * untimed is the harness-derived "other" (the verify read over the
  * sink, plan time, ad-hoc setup). Outside a harness the timers are
  * inert — `timed` still runs its body, the accumulator just grows
  * until the next reset. */
object GateTimers {
  private val acc = scala.collection.mutable.LinkedHashMap[String, Double]()

  /** Run `f`, adding its wall time to `phase`. */
  def timed[T](phase: String)(f: => T): T = {
    val t0 = System.nanoTime()
    try f
    finally acc.synchronized {
      acc(phase) = acc.getOrElse(phase, 0.0) + (System.nanoTime() - t0) / 1e9
      ()
    }
  }

  def reset(): Unit = acc.synchronized { acc.clear() }

  def snapshot(): Map[String, Double] =
    acc.synchronized { acc.toMap }
}
