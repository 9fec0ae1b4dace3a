package graft.log

import java.util.concurrent.{Executors, TimeUnit}
import scala.concurrent.{ExecutionContext, Future, Promise}

import graft.model._

/** A10 — high-level per-record producer (sdk/src/producer.rs), the
  * piece that turns "a stream of records" into capped, pipelined
  * batches with flow control:
  *
  *  - **permits (A11)**: every record reserves its metered size from a
  *    `maxUnackedBytes` budget (default 5 MiB, min 1 MiB —
  *    producer.rs:64-97) BEFORE being staged; the permit is released
  *    when its batch's ack (or failure) lands, so unacked bytes are
  *    hard-bounded — the reference's admission semaphore
  *    (streamer.rs:815-838) expressed client-side;
  *  - **batching (A9)**: staged records flush at 1000 records / 1 MiB
  *    metered or after the linger window (5 ms default,
  *    batching.rs:28-35); `match_seq_num` auto-increments across
  *    batches; the fencing token rides on every batch;
  *  - **per-record acks**: each submit resolves to the record's own
  *    seq_num plus the containing batch's ack (IndexedAppendAck,
  *    producer.rs:53-60);
  *  - **terminal errors**: a failed batch poisons the underlying
  *    AppendSession (A8) and fails every pending and future submit
  *    (RecordSubmitTicket's terminal_err, producer.rs:30-49).
  */
final class Producer(store: StreamStore, basin: String, stream: String,
                     maxUnackedBytes: Long = 5L * 1024 * 1024,
                     lingerMs: Long = 5L,
                     maxRecords: Int = Caps.MaxBatchRecords,
                     maxBatchBytes: Long = Caps.MaxBatchMeteredBytes,
                     fencingToken: Option[String] = None,
                     initialMatchSeqNum: Option[Long] = None,
                     nowMs: Option[Long] = None,
                     maxRetries: Int = 3,
                     retryBackoffMs: Long = 10,
                     /** A13: key material for a cipher-configured
                       * basin; threads through the session to every
                       * batch append. */
                     cipher: Option[Array[Byte]] = None) {

  require(maxUnackedBytes >= 1024 * 1024,
    "max_unacked_bytes must be at least 1 MiB") // producer.rs:92-95

  final case class IndexedAppendAck(seqNum: Long, batch: AppendAck)

  sealed trait ProducerError
  object ProducerError {
    final case class Oversize(size: Long) extends ProducerError
    final case class Terminal(cause: String) extends ProducerError
  }

  private implicit val ec: ExecutionContext = ExecutionContext.global
  // retries happen inside the session (ordered, sdk/src/retry.rs);
  // only a retry-exhausted or non-retryable failure poisons
  private[log] val session =
    new AppendSession(store, basin, stream, nowMs, cipher,
      maxRetries = maxRetries, retryBackoffMs = retryBackoffMs)
  private val lock = new Object
  private var staged =
    Vector.empty[(Record, Promise[Either[ProducerError, IndexedAppendAck]])]
  private var stagedBytes = 0L
  private var emittedRecords = 0L
  private var inFlightBytes = 0L
  private var highWater = 0L
  private var outstanding = 0L // unacked batches
  @volatile private var terminal: Option[String] = None

  private val linger = Executors.newSingleThreadScheduledExecutor(r => {
    val t = new Thread(r, s"graft-producer-linger-$basin-$stream")
    t.setDaemon(true)
    t
  })
  linger.scheduleAtFixedRate(() => flush(), lingerMs, lingerMs, TimeUnit.MILLISECONDS)

  /** Reserve capacity, stage, and return the record's ack future.
    * Blocks while `maxUnackedBytes` is exhausted (flow control).
    */
  def submit(r: Record): Future[Either[ProducerError, IndexedAppendAck]] = {
    val p = Promise[Either[ProducerError, IndexedAppendAck]]()
    val sz = r.meteredSize
    // a record that can never fit the batch cap OR the permit budget
    // must fail fast — blocking on a permit that can never be granted
    // would hang the caller forever
    if (sz > math.min(maxBatchBytes, maxUnackedBytes)) {
      p.success(Left(ProducerError.Oversize(sz)))
      return p.future
    }
    val t0 = System.nanoTime()
    lock.synchronized {
      while (terminal.isEmpty && inFlightBytes + sz > maxUnackedBytes)
        lock.wait(50)
      terminal match {
        case Some(e) => p.success(Left(ProducerError.Terminal(e)))
        case None =>
          ServerMetrics.appendPermitLatency.observe((System.nanoTime() - t0) / 1e9)
          inFlightBytes += sz
          highWater = math.max(highWater, inFlightBytes)
          if (staged.size >= maxRecords || stagedBytes + sz > maxBatchBytes)
            flushLocked()
          staged :+= ((r, p))
          stagedBytes += sz
      }
    }
    p.future
  }

  /** Unacked metered bytes never exceeded this (for flow-control specs). */
  def highWaterBytes: Long = lock.synchronized(highWater)

  def flush(): Unit = lock.synchronized(flushLocked())

  private def flushLocked(): Unit = if (staged.nonEmpty && terminal.isEmpty) {
    val batch = staged
    val bytes = stagedBytes
    staged = Vector.empty
    stagedBytes = 0L
    val msn = initialMatchSeqNum.map(_ + emittedRecords)
    emittedRecords += batch.size
    outstanding += 1
    session.submit(AppendInput(batch.map(_._1), msn, fencingToken)).onComplete { res =>
      lock.synchronized {
        inFlightBytes -= bytes
        outstanding -= 1
        lock.notifyAll()
      }
      val outcome: Either[String, AppendAck] = res match {
        case scala.util.Success(Right(ack)) => Right(ack)
        case scala.util.Success(Left(e)) => Left(e.toString)
        case scala.util.Failure(t) => Left(s"session: ${t.getMessage}")
      }
      outcome match {
        case Right(ack) =>
          batch.zipWithIndex.foreach { case ((_, p), i) =>
            p.success(Right(IndexedAppendAck(ack.start.seqNum + i, ack)))
          }
        case Left(err) =>
          val msg = err.toString
          lock.synchronized {
            if (terminal.isEmpty) terminal = Some(msg)
            // fail anything staged after the failing batch, too — and
            // release their permits (they will never flush, so nothing
            // else would ever return those bytes)
            val orphans = staged
            staged = Vector.empty
            inFlightBytes -= stagedBytes
            stagedBytes = 0L
            lock.notifyAll()
            orphans.foreach(_._2.success(Left(ProducerError.Terminal(msg))))
          }
          batch.foreach(_._2.success(Left(ProducerError.Terminal(msg))))
      }
    }
  }

  /** Flush staged records and wait for every outstanding ack. */
  def close(): Unit = {
    lock.synchronized {
      flushLocked()
      while (outstanding > 0) lock.wait(50)
    }
    linger.shutdown()
    session.close()
  }
}
