package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.model.{TimestampingMode, Timestamping}

/** A8/A2/A3 in continuous mode: the streaming analog of the reference's
  * one-actor-per-stream sequencer (streamer.rs:333-366).
  *
  * `flatMapGroupsWithState` keyed by (basin, stream) holds exactly the
  * reference's streamer state — (tailSeq, maxTimestamp) — and assigns
  * contiguous positions to arriving records. Spark guarantees all rows
  * of one key in one task per micro-batch, and state carries across
  * batches, so per-stream total order holds under arbitrary
  * parallelism across streams — the same "single writer per stream,
  * parallel across streams" contract the actor gives, but elastic.
  *
  * The micro-batch epoch IS the append-session ordering barrier
  * (A8, append.rs:45-93): batch N+1's records are sequenced only after
  * batch N's are durably committed by the sink, so acks can never
  * reorder past a failure.
  */
object Sequencer {

  case class RawAppend(basin: String, stream: String, arrival: Long,
                       tsClient: Option[Long], body: Array[Byte])

  case class SequencedOut(basin: String, stream: String, seqNum: Long,
                          timestamp: Long, body: Array[Byte])

  case class SeqState(tailSeq: Long, maxTs: Long)

  /** Sequence a stream of raw appends. `initialTails` seeds state from
    * store manifests (recovery, core.rs:101-212); `nowMs` is the
    * arrival clock (injectable for determinism).
    */
  def sequence(raw: Dataset[RawAppend],
               ts: Timestamping = Timestamping(),
               initialTails: Map[(String, String), (Long, Long)] = Map.empty,
               nowMs: () => Long = () => System.currentTimeMillis())
      : Dataset[SequencedOut] = {
    implicit val outEnc = Encoders.product[SequencedOut]
    implicit val stateEnc = Encoders.product[SeqState]
    implicit val keyEnc = Encoders.product[(String, String)]

    raw.groupByKey(r => (r.basin, r.stream))
      .flatMapGroupsWithState[SeqState, SequencedOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case ((basin, stream), rows, state: GroupState[SeqState]) =>
          val init = state.getOption.getOrElse {
            val (s0, t0) = initialTails.getOrElse((basin, stream), (0L, 0L))
            SeqState(s0, t0)
          }
          val now = nowMs()
          var seq = init.tailSeq
          var maxTs = init.maxTs
          // Arrival order within the micro-batch defines assignment
          // order. The group is materialized to sort it (Spark's state
          // API exposes no secondary sort), so executor memory bounds
          // the per-(stream × trigger) volume — size triggers with
          // source admission (maxOffsetsPerTrigger / maxFilesPerTrigger)
          // exactly like the reference bounds in-flight append bytes
          // via its admission semaphore (streamer.rs:815-838).
          val out = rows.toSeq.sortBy(_.arrival).map { r =>
            var t = ts.mode match {
              case TimestampingMode.ClientPrefer => r.tsClient.getOrElse(now)
              case TimestampingMode.ClientRequire =>
                r.tsClient.getOrElse(
                  throw new IllegalArgumentException("timestamp required"))
              case TimestampingMode.Arrival => now
            }
            if (!ts.uncapped && t > now) t = now
            if (t < maxTs) t = maxTs else maxTs = t
            val o = SequencedOut(basin, stream, seq, t, r.body)
            seq += 1
            o
          }
          state.update(SeqState(seq, maxTs))
          out.iterator
      }
  }
}
