package graft.streaming

/** R11 — session auto-resume (sdk/src/session/read.rs:26-80 +
  * sdk/src/retry.rs): re-establish a broken session with capped
  * exponential backoff, resetting the retry state once a run has been
  * healthy for a while (the SDK resets after data flows). For
  * Structured Streaming the `attempt` closure starts a query from its
  * checkpoint and awaits termination — the checkpointed offsets make
  * every resume continue exactly after the last committed batch
  * (no gaps, no duplicates; see GraftSourceSpec / e2e_r9_resume).
  */
object AutoResume {

  /** Run `attempt` until it returns normally. On exception: retry
    * after a backoff that doubles from `initialBackoffMs` up to
    * `maxBackoffMs`; an attempt that lived at least `resetAfterMs`
    * resets the backoff ladder. After `maxRetries` consecutive
    * failures the last exception is rethrown. Returns the backoff
    * sequence actually used (for observability and specs).
    */
  def run(attempt: () => Unit,
          maxRetries: Int = 5,
          initialBackoffMs: Long = 100,
          maxBackoffMs: Long = 5000,
          resetAfterMs: Long = 30000,
          clock: () => Long = () => System.currentTimeMillis(),
          sleeper: Long => Unit = Thread.sleep): Seq[Long] = {
    val backoffs = Seq.newBuilder[Long]
    var consecutive = 0
    var backoff = initialBackoffMs
    var done = false
    while (!done) {
      val t0 = clock()
      try {
        attempt()
        done = true
      } catch {
        case e: Throwable =>
          if (clock() - t0 >= resetAfterMs) {
            // healthy for a while before dying: fresh retry budget
            consecutive = 0
            backoff = initialBackoffMs
          }
          consecutive += 1
          if (consecutive > maxRetries) throw e
          backoffs += backoff
          sleeper(backoff)
          backoff = math.min(backoff * 2, maxBackoffMs)
      }
    }
    backoffs.result()
  }
}
