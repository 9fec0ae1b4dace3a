package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.log.StreamStore

/** A8 end-to-end: continuous ingestion from any streaming source into
  * the durable store.
  *
  * Each micro-batch goes through StreamStore.ingest (distributed
  * sequencing + atomic manifest commits). The micro-batch epoch IS the
  * append-session contract (append.rs:45-93): batch N+1 is sequenced
  * only after batch N's manifests are committed, so positions never
  * reorder across a failure, and a restart resumes from the last
  * committed epoch via the checkpoint.
  *
  * Input schema: basin, stream, ts_client (nullable LONG ms), headers
  * (nullable ARRAY<STRUCT<name BINARY, value BINARY>>), body BINARY,
  * arrival LONG (ordering key within the batch).
  */
object StreamIngest {

  /** `cipher`: key material for basins whose `stream_cipher` is
    * configured (A13) — resolution and executor-side encryption are
    * StreamStore.ingest's; plaintext basins ignore it.
    */
  def start(store: StreamStore, raw: DataFrame,
            checkpointLocation: String,
            trigger: Trigger = Trigger.ProcessingTime("1 second"),
            cipher: Option[Array[Byte]] = None): StreamingQuery =
    raw.writeStream
      .option("checkpointLocation", checkpointLocation)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        // epoch id makes replayed micro-batches idempotent per stream
        if (!batch.isEmpty) {
          store.ingest(batch, epochId = Some(epochId), cipher = cipher); ()
        }
      }
      .start()
}
