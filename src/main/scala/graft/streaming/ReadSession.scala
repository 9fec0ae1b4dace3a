package graft.streaming

import graft.log.StreamStore
import graft.model._

/** R8 — the read-session liveness state machine around the data plane
  * (lite/src/backend/read.rs:183-240; wait-budget tests
  * read.rs:603-928). The DSv2 source (GraftStreamSource) delivers the
  * records; this layer supplies the serving-side contract:
  *
  *  - **catch-up**: while behind the tail, emit re-chunked batches
  *    (≤1000 records / ≤1 MiB) with exact count/bytes/until
  *    accounting;
  *  - **follow**: once caught up, emit a heartbeat and poll the tail;
  *  - **wait budget**: armed when the session FIRST reaches the tail
  *    (`arm_wait_deadline_if_unset`, read.rs:329-333), reset ONLY by a
  *    delivered batch (`on_batch` → `reset_wait_deadline`,
  *    read.rs:344-361) — heartbeats never extend it
  *    (read_wait_is_not_extended_by_heartbeats, read.rs:603-680);
  *  - **heartbeats**: every 5–15 s (randomized, read.rs:383-391),
  *    carrying the current tail;
  *  - a record denied by the session limit or the `until` bound closes
  *    the session (allowed_count < count ⇒ break 'session).
  *
  * The session is poll-driven with an injectable clock so the exact
  * reference test matrix runs deterministically (the analog of tokio's
  * start_paused virtual time). A serving loop calls `poll()` and sleeps
  * briefly on `Idle`; a lagged follower needs no special path —
  * catch-up IS the fallback (FOLLOWER_MAX_LAG is inherent to reading
  * from durable files rather than a bounded broadcast buffer).
  */
final class ReadSession(store: StreamStore, basin: String, stream: String,
                        startSeq: Long,
                        limit: ReadLimit = ReadLimit(),
                        until: Option[Long] = None,
                        waitMs: Option[Long] = None,
                        clock: () => Long = () => System.currentTimeMillis(),
                        heartbeatMs: () => Long = () =>
                          5000L + scala.util.Random.nextLong(10000L),
                        /** client-supplied key for encrypted streams
                          * (s2-encryption-key): the reference threads it
                          * into EVERY read mode, sessions included
                          * (extract.rs EventStream/S2s arms). */
                        cipher: Option[Array[Byte]] = None) {

  sealed trait Event
  object Event {
    final case class Batch(records: Seq[SequencedRecord],
                           tail: StreamPosition) extends Event
    final case class Heartbeat(tail: StreamPosition) extends Event
    /** At tail with nothing due — caller should sleep briefly. */
    case object Idle extends Event
    final case class Closed(reason: String) extends Event
  }

  private var nextSeq: Long = startSeq
  private var remCount: Long = limit.count.getOrElse(Long.MaxValue)
  private var remBytes: Long = limit.bytes.getOrElse(Long.MaxValue)
  private var waitDeadline: Option[Long] = None
  private var nextHeartbeatAt: Option[Long] = None
  private var done: Option[String] = None

  private def armWaitDeadlineIfUnset(): Unit =
    if (waitDeadline.isEmpty) resetWaitDeadline()
  private def resetWaitDeadline(): Unit =
    waitDeadline = waitMs.map(clock() + _)

  private def close(reason: String): Event = {
    done = Some(reason)
    Event.Closed(reason)
  }

  /** Advance the state machine one step. Never blocks. */
  def poll(): Event = {
    if (done.isDefined) return Event.Closed(done.get)
    if (remCount <= 0 || remBytes < 8) return close("limit_exhausted")
    val m = store.manifest(basin, stream)
    val tail = StreamPosition(m.tailSeq, m.tailTs)
    // a trim may have dropped the range we were about to read; skip
    // forward like the reference's catch-up scan (which simply finds
    // no keys below the trim point)
    if (m.trimPoint > nextSeq && m.trimPoint != Long.MaxValue)
      nextSeq = m.trimPoint

    if (nextSeq < tail.seqNum) {
      // catch-up: one re-chunked batch with session-limit accounting
      val chunk = ReadLimit(
        count = Some(math.min(remCount, Caps.MaxBatchRecords.toLong)),
        bytes = Some(math.min(remBytes, Caps.MaxBatchMeteredBytes)))
      store.readBatch(basin, stream,
        ReadSpec(ReadStart(ReadFrom.SeqNum(nextSeq)),
          ReadEnd(chunk, until)), cipher = cipher) match {
        case Left(e) => close(e)
        case Right(records) if records.isEmpty =>
          // Disambiguate: denied by the session limit / until bound,
          // or simply no visible record in [nextSeq, tail) (a
          // retention-masked prefix)? A masked prefix must be skipped
          // like the reference's catch-up scan over missing keys,
          // not treated as a close.
          store.readBatch(basin, stream,
            ReadSpec(ReadStart(ReadFrom.SeqNum(nextSeq)),
              ReadEnd(ReadLimit(count = Some(1)))), cipher = cipher) match {
            case Right(probe) if probe.isEmpty =>
              nextSeq = tail.seqNum // nothing visible below tail: follow
              poll()
            case _ =>
              // a visible record exists but limit/until denies it:
              // allowed_count == 0 ⇒ session ends without a batch
              // (read.rs:810+: bytes limit smaller than first record)
              close("until_or_limit")
          }
        case Right(records) =>
          nextSeq = records.last.seqNum + 1
          remCount -= records.size
          remBytes -= records.iterator
            .map(r => EnvelopeRecord(r.headers, r.body).meteredSize).sum
          resetWaitDeadline() // ONLY batches reset the budget
          Event.Batch(records, tail)
      }
    } else {
      // at tail: arm wait budget once, then heartbeat cadence
      armWaitDeadlineIfUnset()
      if (waitDeadline.exists(clock() >= _)) close("wait_expired")
      else nextHeartbeatAt match {
        case None =>
          // entering follow mode emits an immediate heartbeat
          // (read.rs:194: yield Heartbeat right after arming)
          nextHeartbeatAt = Some(clock() + heartbeatMs())
          Event.Heartbeat(tail)
        case Some(at) if clock() >= at =>
          nextHeartbeatAt = Some(clock() + heartbeatMs())
          Event.Heartbeat(tail)
        case _ => Event.Idle
      }
    }
  }
}
